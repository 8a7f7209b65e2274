"""Temporal join operators: as-of join and range join.

Spark has no built-in as-of join (pandas ``merge_asof`` semantics).  The
scalable implementation here is the *union + window* construction:

    1. tag left rows (probe) and right rows (reference) and union them,
    2. sort within each key partition by (ts, side) — reference rows sort
       before probe rows at equal ts, so ``r.ts <= l.ts`` includes ties,
    3. carry the latest reference payload forward with
       ``last(payload, ignorenulls=True)`` over rows unbounded-preceding,
    4. keep only probe rows.

Cost: ONE shuffle of (left ∪ right) on the key — no per-row range probe, no
O(|L|·|R|) key-group blowup, and no driver-side loop, so it survives 100 TB
inputs as long as single keys fit a partition (skewed keys can be pre-split
by time-bucketing the key).  This replaces the reference crawler's
"most-recent state wins" lookups (REPLACE-INTO last-writer semantics,
utils/MysqlDBHelper.py:22-31) generalized to event time.

The range join broadcasts a small bucket/interval dim and lets Catalyst turn
``point >= lo AND point < hi`` into a BroadcastNestedLoopJoin over the tiny
side — the right physical plan when |intervals| is dim-sized.  (For
interval×interval at scale you'd bucketize both sides first; not needed
here.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              payload_cols: list[str] | None = None,
              tiebreak: str | None = None,
              strict: bool = False) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (or ``<`` when ``strict``) on the same key.

    Deterministic: ties on ``right_ts`` are broken by ``tiebreak`` (highest
    wins).  Left rows with no prior right row are dropped (inner as-of).
    Result = left columns + ``payload_cols`` from right.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns
                        if c not in (on, right_ts)]
    left_cols = [c for c in left.columns if c != on]
    payload_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}"
        for c in payload_cols) + ">"

    # non-strict: reference rows sort BEFORE probe rows at equal ts, so the
    # carried last() includes r.ts == l.ts; strict flips the tie order.
    probe_side, ref_side = (0, 1) if strict else (1, 0)
    lhs = left.select(
        F.col(on), F.col(left_ts).alias("_ats"),
        F.lit(probe_side).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(None).cast(payload_type).alias("_payload"),
        *[F.col(c) for c in left_cols])
    rhs = right.select(
        F.col(on), F.col(right_ts).alias("_ats"),
        F.lit(ref_side).alias("_side"),
        (F.col(tiebreak) if tiebreak else F.lit(None))
        .cast("long").alias("_tb"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols])

    w = (Window.partitionBy(on)
         .orderBy(F.col("_ats").asc(), F.col("_side").asc(),
                  F.col("_tb").asc_nulls_first())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = lhs.unionByName(rhs).withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w))
    return (carried.filter(F.col("_side") == probe_side)
            .filter(F.col("_match").isNotNull())
            .select(on, *left_cols,
                    *[F.col("_match")[c].alias(c) for c in payload_cols]))


def range_join(facts: DataFrame, intervals: DataFrame, point_col: str,
               lo_col: str = "lo", hi_col: str = "hi") -> DataFrame:
    """Join fact rows into half-open interval buckets ``[lo, hi)`` from a
    dim-sized intervals table.  Broadcasts the intervals so the physical
    plan is a broadcast nested-loop over a handful of rows per fact — no
    shuffle of the fact side at all."""
    cond = (F.col(point_col) >= F.col(lo_col)) & \
           (F.col(point_col) < F.col(hi_col))
    return facts.join(F.broadcast(intervals), cond, "inner")
