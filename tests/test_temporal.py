"""As-of join and range join: tie semantics, strict mode, physical plan."""

import datetime as dt

from pyspark.sql import functions as F

from new_ent_crawler_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 10, _ts("2024-01-01T10:00:00")),
         (2, 10, _ts("2024-01-01T12:00:00")),
         (3, 20, _ts("2024-01-01T09:00:00")),   # before any right row
         (4, 30, _ts("2024-01-01T10:00:00"))],  # exact tie with right ts
        "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(100, 10, _ts("2024-01-01T09:30:00"), 1.0),
         (101, 10, _ts("2024-01-01T11:00:00"), 2.0),
         (102, 20, _ts("2024-01-01T09:30:00"), 3.0),
         (103, 30, _ts("2024-01-01T10:00:00"), 4.0),
         (104, 30, _ts("2024-01-01T10:00:00"), 5.0)],  # equal-ts tie
        "r_id long, user_id long, r_ts timestamp, payload double")
    return left, right


def test_asof_non_strict_includes_equal_ts_and_breaks_ties(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", left_ts="ts",
                    right_ts="r_ts", payload_cols=["r_id", "payload"],
                    tiebreak="r_id")
    got = {r.event_id: (r.r_id, r.payload) for r in out.collect()}
    assert got == {
        1: (100, 1.0),   # 09:30 <= 10:00
        2: (101, 2.0),   # most recent of the two
        4: (104, 5.0),   # equal ts counts; max r_id wins the tie
    }                    # event 3 dropped: no right row at or before


def test_asof_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", left_ts="ts",
                    right_ts="r_ts", payload_cols=["r_id"],
                    tiebreak="r_id", strict=True)
    got = {r.event_id: r.r_id for r in out.collect()}
    assert got == {1: 100, 2: 101}  # event 4's only candidate is equal-ts


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user_id", left_ts="ts",
                    right_ts="r_ts", payload_cols=["r_id"], tiebreak="r_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union+window construction: one exchange for the key partition, no join
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


def test_range_join_broadcasts_intervals(spark):
    facts = spark.range(1000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v"))
    intervals = spark.createDataFrame(
        [("a", 0, 50), ("b", 50, 100)], "tier string, lo int, hi int")
    out = range_join(facts, intervals, "v")
    counts = {r.tier: r.n for r in
              out.groupBy("tier").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a": 500, "b": 500}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_asof_matches_pandas_merge_asof(spark):
    """Seeded randomized cross-check against pandas merge_asof (backward,
    allow_exact_matches) — an independent reference implementation."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    base = pd.Timestamp("2024-01-01")
    left_pd = pd.DataFrame({
        "event_id": np.arange(n_l),
        "user_id": rng.integers(0, 12, n_l),
        "ts": base + pd.to_timedelta(
            rng.choice(10**6, n_l, replace=False), unit="s"),
    })
    right_pd = pd.DataFrame({
        "r_id": np.arange(n_r),
        "user_id": rng.integers(0, 12, n_r),
        "r_ts": base + pd.to_timedelta(
            rng.choice(10**6, n_r, replace=False), unit="s"),
        "payload": rng.normal(size=n_r).round(6),
    })
    want = pd.merge_asof(
        left_pd.sort_values("ts"), right_pd.sort_values("r_ts"),
        left_on="ts", right_on="r_ts", by="user_id",
        direction="backward", allow_exact_matches=True)
    want = want[want["r_id"].notna()]
    expected = {int(r.event_id): (int(r.r_id), float(r.payload))
                for r in want.itertuples()}

    out = asof_join(spark.createDataFrame(left_pd),
                    spark.createDataFrame(right_pd),
                    on="user_id", left_ts="ts", right_ts="r_ts",
                    payload_cols=["r_id", "payload"], tiebreak="r_id")
    got = {r.event_id: (r.r_id, round(r.payload, 6)) for r in out.collect()}
    assert got == expected
