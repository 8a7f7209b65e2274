"""applyInPandasWithState seen-set: state must survive across micro-batches."""

import os

from pyspark.sql import functions as F

from new_ent_crawler_spark.streaming.stateful import streaming_seen_filter


def test_streaming_seen_filter_dedups_across_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    chk = str(tmp_path / "chk")

    batch1 = spark.createDataFrame(
        [("h1", "http://h1/a"), ("h1", "http://h1/b"), ("h2", "http://h2/x")],
        "host string, url string")
    batch2 = spark.createDataFrame(
        [("h1", "http://h1/b"), ("h1", "http://h1/c"), ("h2", "http://h2/x")],
        "host string, url string")
    # two files -> two micro-batches via maxFilesPerTrigger=1
    batch1.coalesce(1).write.parquet(str(src / "f1.parquet"))
    batch2.coalesce(1).write.parquet(str(src / "f2.parquet"))

    stream = (spark.readStream.schema("host string, url string")
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src) + "/*")
              .withColumn("url_hash", F.xxhash64("url")))
    out = streaming_seen_filter(stream)
    q = (out.writeStream.format("memory").queryName("seen_out")
         .option("checkpointLocation", chk)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    rows = spark.sql("SELECT host, url FROM seen_out").collect()
    got = sorted((r.host, r.url) for r in rows)
    # every url exactly once, even though b and x repeat across batches
    assert got == [("h1", "http://h1/a"), ("h1", "http://h1/b"),
                   ("h1", "http://h1/c"), ("h2", "http://h2/x")]
