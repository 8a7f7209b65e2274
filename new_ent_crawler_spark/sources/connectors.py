"""Multi-format table connectors with pinned schemas.

The reference's I/O surface is MySQL tables + Redis queues
(utils/MysqlDBHelper.py, utils/RedisDBHelper.py); this engine's equivalents
are columnar lake tables.  This module is the one place format choice
lives: every reader pins an explicit schema (never infer on 100 TB — a
schema-inference pass is a full extra scan of the data for csv/json) and
every writer goes through one function so partitioning and mode policy are
uniform.

Formats: parquet (default; only one with predicate pushdown + column
pruning), orc (same properties), json (lines), csv (header).  Text-based
formats exist for interchange, not for the hot path — write-side
partitioning still applies so downstream readers prune directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

READ_FORMATS = ("parquet", "orc", "json", "csv")


def read_table(spark: SparkSession, path: str, fmt: str = "parquet",
               schema: str | None = None) -> DataFrame:
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("json", "csv"):
        raise ValueError(f"{fmt} requires an explicit schema "
                         "(inference is a full extra scan at scale)")
    if fmt == "csv":
        reader = reader.option("header", "true")
    return reader.load(path)


def write_table(df: DataFrame, path: str, fmt: str = "parquet",
                mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    if fmt not in READ_FORMATS:
        raise ValueError(f"unsupported format: {fmt}")
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)
