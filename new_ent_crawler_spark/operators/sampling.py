"""Deterministic stratified sampling for training-data pipelines.

``stratified_topk`` draws an exact, reproducible k-per-group sample by
ranking rows on a cryptographic hash of their id — equivalent to a uniform
shuffle that every engine can replay (the DuckDB oracle reproduces it with
the same ``md5`` order).  The naive plan — one row_number window partitioned
by the group column — serializes each group through a single reducer, which
at 100 TB with a handful of language groups means a handful of tasks doing
all the work.  This uses the same salted two-phase top-K shape as the
frontier dequeue (operators/frontier.py): a per-(group, salt) partial top-K
prunes each group to ``salt_buckets * k`` candidates with full parallelism,
then the exact top-K runs on the tiny survivor set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sample_order_key(id_col) -> Column:
    """Portable deterministic shuffle key: md5 of the id's string form."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(c.cast("string"))


def stratified_topk(df: DataFrame, group_col: str, id_col: str, k: int,
                    salt_buckets: int = 16) -> DataFrame:
    """Exact deterministic k-per-group sample; adds ``rnk`` (1..k).

    Phase 1 ranks within (group, salt) — parallelism ``groups x
    salt_buckets`` regardless of group skew — and keeps only per-bucket
    top-k, a superset of the global per-group top-k because every
    candidate's bucket rank is a lower bound on its group rank.  Phase 2
    ranks the <= salt_buckets*k survivors per group exactly.
    """
    key = sample_order_key(id_col)
    salted = df.withColumn("_sk", key).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                        F.lit(salt_buckets)))
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_sk", id_col)
    pruned = (salted.withColumn("_r1", F.row_number().over(w1))
              .filter(F.col("_r1") <= k))
    w2 = Window.partitionBy(group_col).orderBy("_sk", id_col)
    return (pruned.withColumn("rnk", F.row_number().over(w2))
            .filter(F.col("rnk") <= k)
            .drop("_sk", "_salt", "_r1"))
