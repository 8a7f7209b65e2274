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
    return spark.createDataFrame(
        [(wave_id, "dedup", -1, candidates, survivors,
          candidates - survivors)],
        "wave_id long, stage string, partition_id int, urls_in long, "
        "urls_out long, dedup_hits long",
    ).withColumn("ts", F.current_timestamp())
