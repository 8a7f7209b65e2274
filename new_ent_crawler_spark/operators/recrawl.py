"""Recrawl scheduling: change-frequency-driven revisit of fetched pages.

The reference crawls each registry page once (status FOUND is terminal,
worker/worker.py:240-242); an open web crawl revisits — and the sitemap
protocol's ``changefreq``/``lastmod`` (sources/sitemap.py) is the
first-party change-rate signal.  This module turns that signal into
frontier work:

* :func:`revisit_schedule` — pure JVM expressions mapping changefreq to a
  revisit interval, computing ``next_due`` and ``is_due`` against a
  deterministic ``now`` (callers pass the wave's clock; nothing here reads
  wall time, so plans stay replayable).
* :func:`requeue_due` — turn due rows back into pending frontier rows
  (status reset, crawler_count cleared, the recrawl wave recorded in
  ``enqueue_wave`` so the FIFO tiebreak stays total).

``never`` maps to NULL interval ⇒ never due; unknown/absent changefreq
falls back to ``default_freq`` (the protocol says consumers may treat the
field as a hint — a crawl that trusted it blindly would never revisit
pages whose sitemap lies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# sitemaps.org changefreq -> revisit interval, seconds
CHANGEFREQ_SECONDS = {
    "always": 0,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
    # "never": no revisit (NULL interval)
}


def interval_seconds(freq_col, default_freq: str = "monthly") -> Column:
    """changefreq string -> interval seconds (NULL for 'never', the
    ``default_freq`` interval for unknown/absent values)."""
    c = F.lower(F.col(freq_col) if isinstance(freq_col, str) else freq_col)
    expr = F.when(c == "never", F.lit(None).cast("long"))
    for name, secs in CHANGEFREQ_SECONDS.items():
        expr = expr.when(c == name, F.lit(secs).cast("long"))
    return expr.otherwise(
        F.lit(CHANGEFREQ_SECONDS[default_freq]).cast("long"))


def revisit_schedule(df: DataFrame, now: str,
                     freq_col: str = "changefreq",
                     lastmod_col: str = "lastmod_ts",
                     default_freq: str = "monthly") -> DataFrame:
    """Add ``interval_s``, ``next_due`` (timestamp), ``is_due`` (boolean,
    false for 'never') columns.  ``now`` is an ISO timestamp string —
    the caller's deterministic clock, compared in the timestamp's own
    (NTZ) frame so session timezone never shifts the schedule."""
    iv = interval_seconds(freq_col, default_freq)
    next_due = F.timestamp_add("SECOND", iv, F.col(lastmod_col))
    # compare in the lastmod column's OWN timestamp frame (NTZ stays NTZ):
    # a bare to_timestamp literal is session-zoned and would shift the
    # schedule under a different session timezone
    now_ts = F.to_timestamp(F.lit(now)).cast(
        df.schema[lastmod_col].dataType)
    return (df
            .withColumn("interval_s", iv)
            .withColumn("next_due", next_due)
            .withColumn(
                "is_due",
                # 'never' (NULL interval) -> never due; a NULL lastmod with
                # a revisit-able frequency -> due NOW (lastmod is optional
                # per sitemaps.org and commonly absent — treating unknown
                # age as never-due would silently exempt those pages from
                # recrawl forever)
                F.when(iv.isNull(), F.lit(False))
                .when(F.col(lastmod_col).isNull(), F.lit(True))
                .otherwise(next_due <= now_ts)))


def requeue_due(frontier: DataFrame, schedule: DataFrame, wave: int,
                url_col: str = "url") -> DataFrame:
    """Reset due, already-fetched frontier rows to pending for ``wave``.

    ``schedule`` carries (url, is_due); the join is a broadcast when the
    due set is small (the common case — AQE decides), and only rows in a
    terminal fetched state (status >= FOUND) are eligible, so in-flight
    and pending rows are never double-queued."""
    from .frontier import STATUS_FOUND, STATUS_PENDING
    due = (schedule.filter(F.col("is_due"))
           .select(F.col(url_col).alias("_rq_url")).distinct())
    # materialize eligibility BEFORE mutating: the status reset below
    # would otherwise flip the predicate mid-chain (each withColumn
    # re-evaluates column expressions against the updated frame)
    hit = (frontier.join(due, frontier[url_col] == due["_rq_url"], "left")
           .withColumn("_rq", F.col("_rq_url").isNotNull()
                       & (F.col("status") >= STATUS_FOUND))
           .drop("_rq_url"))
    eligible = F.col("_rq")
    return (hit
            .withColumn("status", F.when(eligible,
                                         F.lit(STATUS_PENDING))
                        .otherwise(F.col("status")))
            .withColumn("crawler_count", F.when(eligible, F.lit(0))
                        .otherwise(F.col("crawler_count")))
            .withColumn("enqueue_wave", F.when(eligible,
                                               F.lit(int(wave)).cast("long"))
                        .otherwise(F.col("enqueue_wave")))
            .drop("_rq"))
