"""Per-partition lineage rows (north_rule): the distributed analogue of the
reference's ``crawler_log`` row per keyword (utils/MysqlDBHelper.py:108-119).

Schema: (wave_id, stage, partition_id, urls_in, urls_out, dedup_hits, ts).
``parse`` rows count fetched URLs and emitted out-links per task partition;
``dedup`` rows count candidate vs surviving URLs (hits = pruned)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_lineage(parsed: DataFrame, wave_id: int) -> DataFrame:
    return (parsed
            .groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("urls_in"),
                 F.sum(F.coalesce(F.size("links"), F.lit(0))).alias("urls_out"))
            .select(F.lit(wave_id).cast("long").alias("wave_id"),
                    F.lit("parse").alias("stage"),
                    "partition_id",
                    F.col("urls_in").cast("long"),
                    F.col("urls_out").cast("long"),
                    F.lit(0).cast("long").alias("dedup_hits"),
                    F.current_timestamp().alias("ts")))


def dedup_lineage(spark, wave_id: int, candidates: int, survivors: int) -> DataFrame:
    # spark.range + literals instead of createDataFrame: a local-python
    # relation unioned into a distributed plan costs seconds per wave in
    # Arrow conversion; this stays entirely JVM-side
    return spark.range(1).select(
        F.lit(wave_id).cast("long").alias("wave_id"),
        F.lit("dedup").alias("stage"),
        F.lit(-1).cast("int").alias("partition_id"),
        F.lit(candidates).cast("long").alias("urls_in"),
        F.lit(survivors).cast("long").alias("urls_out"),
        F.lit(candidates - survivors).cast("long").alias("dedup_hits"),
        F.current_timestamp().alias("ts"))
