"""Distributed global ranking: exact NTILE / row_number over a total order
without a single-partition window.

Spark's ``Window.orderBy(...)`` with no ``partitionBy`` funnels every row
through ONE task — correct at test scale, a stall at 100 TB.  The classic
two-phase plan (the same shape Spark's own ``sortWithinPartitions`` +
range-exchange uses for global ORDER BY) restores parallelism:

1. ``repartitionByRange`` on the order key — a sampled range exchange puts
   partition *i*'s keys strictly before partition *i+1*'s (partition count
   scales with the data; each task holds ~one range slice).
2. per-partition local ``row_number`` (a window PARTITIONED by
   ``spark_partition_id()`` — parallel, no global shuffle).
3. one tiny driver collect of the P per-partition counts -> cumulative
   offsets, broadcast-joined back: ``global_rn = offset[pid] + local_rn``.
4. NTILE's remainder rule applied as a closed-form expression on
   ``global_rn`` (first ``total % n`` buckets get one extra row).

The only driver data is P integers (one per partition), so the plan works
unchanged on a 1000-executor cluster.  Ties: the caller's order columns
must form a total order (append a unique key, as SQL NTILE determinism
requires anyway); range partitioning never splits work on driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PID = "_ntile_pid"
LRN = "_ntile_lrn"
OFF = "_ntile_off"


def _with_global_rn(df: DataFrame, order_cols: list[str],
                    num_partitions: int | None = None
                    ) -> tuple[DataFrame, int]:
    """df + a ``global_rn`` column: 1-based rank in the total order given
    by ``order_cols`` (must be tie-free), computed range-parallel."""
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn(PID, F.spark_partition_id())
    w = Window.partitionBy(PID).orderBy(*[F.col(c) for c in order_cols])
    # persist pins the SAMPLED range boundaries: the counts job below and
    # the caller's output job must see the same pid->range assignment (a
    # re-run of the range exchange may re-sample different boundaries)
    local = ranged.withColumn(LRN, F.row_number().over(w)).persist()
    # P rows to the driver — partition counts only, never data
    counts = {r[0]: r[1] for r in
              local.groupBy(PID).count().collect()}
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets, f"{PID} int, {OFF} long")
    out = (local.join(F.broadcast(off_df), PID)
           .withColumn("global_rn", F.col(OFF) + F.col(LRN))
           .drop(PID, LRN, OFF))
    return out, acc


def with_global_cumsum(df: DataFrame, order_cols: list[str],
                       value_col: str,
                       num_partitions: int | None = None
                       ) -> tuple[DataFrame, int]:
    """df + ``global_cum``: the INCLUSIVE running sum of ``value_col`` in
    the total order given by ``order_cols`` (must be tie-free), computed
    with the same range-parallel plan as :func:`_with_global_rn` —
    ``SUM(v) OVER (ORDER BY ...)`` without the SinglePartition window:

    1. range exchange on the order key,
    2. per-partition local running sum (window PARTITIONED by
       ``spark_partition_id()``),
    3. one driver collect of P per-partition TOTALS -> cumulative offsets
       broadcast back (P longs, never data).

    Returns ``(df_with_global_cum, grand_total)``.  The backbone of
    token-budget training-shard packing (operators/sharding.py)."""
    spark = df.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_part, *[F.col(c) for c in order_cols])
    ranged = ranged.withColumn(PID, F.spark_partition_id())
    w = (Window.partitionBy(PID)
         .orderBy(*[F.col(c) for c in order_cols])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    # persist pins the SAMPLED range boundaries (see _with_global_rn)
    local = ranged.withColumn(
        LRN, F.sum(F.col(value_col)).over(w)).persist()
    sums = {r[0]: r[1] for r in
            local.groupBy(PID).agg(
                F.sum(F.col(value_col)).alias("s")).collect()}
    offsets, acc = [], 0
    for pid in sorted(sums):
        offsets.append((pid, acc))
        acc += int(sums[pid] or 0)
    off_df = spark.createDataFrame(offsets, f"{PID} int, {OFF} long")
    out = (local.join(F.broadcast(off_df), PID)
           .withColumn("global_cum",
                       (F.col(OFF) + F.col(LRN)).cast("long"))
           .drop(PID, LRN, OFF))
    return out, acc


def distributed_ntile(df: DataFrame, n: int, order_cols: list[str],
                      num_partitions: int | None = None) -> DataFrame:
    """Exact SQL ``NTILE(n) OVER (ORDER BY order_cols)`` as a range-parallel
    plan; adds column ``quartile``-style bucket as ``tile``.

    SQL remainder rule: with ``total = q*n + r``, buckets ``1..r`` hold
    ``q+1`` rows, buckets ``r+1..n`` hold ``q`` rows.
    """
    out, total = _with_global_rn(df, order_cols, num_partitions)
    q, r = divmod(total, n)
    big = (q + 1) * r  # rows living in the first r (larger) buckets
    tile = (F.when(F.col("global_rn") <= big,
                   F.ceil(F.col("global_rn") / F.lit(q + 1)))
            .otherwise(F.lit(r) + F.ceil((F.col("global_rn") - big)
                                         / F.lit(max(q, 1)))))
    return out.withColumn("tile", tile.cast("int")).drop("global_rn")
