"""Training-shard packing gates: the range-parallel global cumsum must
equal the single-partition window, packing invariants must hold, and the
writer must produce one partition dir per shard with a matching manifest."""

import contextlib
import io
import json
import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from new_ent_crawler_spark.operators import sharding as SH
from new_ent_crawler_spark.operators.ranking import with_global_cumsum

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def test_global_cumsum_matches_single_partition_window(spark):
    d = _docs(spark).select("doc_id", SH.whitespace_tokens("text")
                            .alias("v"))
    got, total = with_global_cumsum(d, ["doc_id"], "v", num_partitions=7)
    w = (Window.orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = d.withColumn("global_cum", F.sum("v").over(w))
    assert got.select("doc_id", "global_cum").exceptAll(
        want.select("doc_id", "global_cum")).count() == 0
    assert want.exceptAll(got.select(*want.columns)).count() == 0
    assert total == d.agg(F.sum("v")).first()[0]


def test_shard_packing_invariants(spark):
    target = 500
    a = SH.shard_assignments(_docs(spark), target).persist()
    rows = a.select("doc_id", "n_tokens", "shard_id") \
            .orderBy("doc_id").collect()
    # deterministic replay of the rule
    cum = 0
    for r in rows:
        assert r.shard_id == cum // target
        cum += r.n_tokens
    # contiguity: shards are runs of consecutive doc_ids
    seen = []
    for r in rows:
        if not seen or r.shard_id != seen[-1]:
            seen.append(r.shard_id)
    assert seen == sorted(set(seen))
    # bound: every shard holds <= target + its one spilling document
    max_doc = max(r.n_tokens for r in rows)
    per = {}
    for r in rows:
        per[r.shard_id] = per.get(r.shard_id, 0) + r.n_tokens
    assert all(v <= target + max_doc for v in per.values())
    # every shard except the last crosses its bucket boundary
    assert all(v >= target - max_doc for s, v in per.items()
               if s != max(per))
    a.unpersist()


def test_shard_plan_has_no_single_partition_window(spark):
    df = SH.shard_summary(_docs(spark), 500)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    plan = buf.getvalue()
    assert "rangepartitioning" in plan.lower()
    assert "SinglePartition" not in plan


def test_write_training_shards_manifest_matches(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = SH.write_training_shards(_docs(spark), out,
                                        target_tokens=500)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_id="))
    assert len(dirs) == manifest["n_shards"] > 1
    on_disk = json.load(open(os.path.join(out, "_manifest.json")))
    assert on_disk == manifest
    back = spark.read.parquet(out)
    per = {r.shard_id: (r.n, r.t) for r in
           back.groupBy("shard_id")
           .agg(F.count("*").alias("n"), F.sum("n_tokens").alias("t"))
           .collect()}
    for s in manifest["shards"]:
        assert per[s["shard_id"]] == (s["n_docs"], s["sum_tokens"])
    assert manifest["total_docs"] == _docs(spark).count()
