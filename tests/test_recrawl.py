"""Recrawl scheduling: interval mapping, NTZ-frame due check, requeue."""

from pyspark.sql import functions as F

from new_ent_crawler_spark.operators import frontier as FR
from new_ent_crawler_spark.operators import recrawl as RC


def _sched(spark, rows, now):
    from datetime import datetime
    rows = [(u, datetime.fromisoformat(ts), cf) for u, ts, cf in rows]
    df = spark.createDataFrame(
        rows, "url string, lastmod_ts timestamp_ntz, changefreq string")
    return {r["url"]: r for r in
            RC.revisit_schedule(df, now=now).collect()}


def test_revisit_schedule_mapping_and_due(spark):
    got = _sched(spark, [
        ("u/always", "2024-01-10 00:00:00", "always"),
        ("u/hourly", "2024-01-10 00:00:00", "HOURLY"),   # case-insensitive
        ("u/weekly-due", "2024-01-10 00:00:00", "weekly"),
        ("u/weekly-not", "2024-01-19 00:00:01", "weekly"),
        ("u/never", "2020-01-01 00:00:00", "never"),
        ("u/unknown", "2023-11-01 00:00:00", "made-up"),  # -> monthly
    ], now="2024-01-20 00:00:00")
    assert got["u/always"]["interval_s"] == 0 and got["u/always"]["is_due"]
    assert got["u/hourly"]["interval_s"] == 3600
    assert got["u/weekly-due"]["is_due"]
    assert not got["u/weekly-not"]["is_due"]
    n = got["u/never"]
    assert n["interval_s"] is None and n["next_due"] is None
    assert n["is_due"] is False  # never due, not NULL
    assert got["u/unknown"]["interval_s"] == 2592000


def test_requeue_due_resets_only_terminal_rows(spark):
    seeds = spark.createDataFrame(
        [("https://h/a", "h", 0, "k", 1),
         ("https://h/b", "h", 1, "k", 1),
         ("https://h/c", "h", 2, "k", 1)],
        "seed_url string, host string, seed_id long, keyword string, "
        "priority int")
    fr = FR.init_frontier(seeds)
    # a: fetched (FOUND, 2 attempts); b: in flight; c: pending
    fr = fr.withColumn(
        "status",
        F.when(F.col("url") == "https://h/a", FR.STATUS_FOUND)
        .when(F.col("url") == "https://h/b", FR.STATUS_IN_FLIGHT)
        .otherwise(F.col("status"))).withColumn(
        "crawler_count",
        F.when(F.col("url") == "https://h/a", 2)
        .otherwise(F.col("crawler_count")))
    sched = spark.createDataFrame(
        [("https://h/a", True), ("https://h/b", True),
         ("https://h/c", True)], "url string, is_due boolean")
    out = {r["url"]: r for r in
           RC.requeue_due(fr, sched, wave=9).collect()}
    a = out["https://h/a"]
    assert (a["status"], a["crawler_count"], a["enqueue_wave"]) == (
        FR.STATUS_PENDING, 0, 9)
    # in-flight and pending rows are untouched (no double-queue)
    assert out["https://h/b"]["status"] == FR.STATUS_IN_FLIGHT
    assert out["https://h/c"]["enqueue_wave"] == 0
    # schema preserved
    assert set(out["https://h/a"].asDict()) == set(FR.FRONTIER_COLS)


def test_null_lastmod_is_due_unless_never(spark):
    """lastmod is optional per sitemaps.org — unknown age must mean 'due
    now', not 'never recrawl'; only changefreq 'never' opts out."""
    df = spark.createDataFrame(
        [("u/nullmod", None, "hourly"), ("u/nullnever", None, "never")],
        "url string, lastmod_ts timestamp_ntz, changefreq string")
    from new_ent_crawler_spark.operators import recrawl as RC2
    out = {r["url"]: r for r in
           RC2.revisit_schedule(df, now="2024-01-20 00:00:00").collect()}
    assert out["u/nullmod"]["is_due"] is True
    assert out["u/nullnever"]["is_due"] is False
