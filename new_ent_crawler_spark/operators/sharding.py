"""Training-shard export: deterministic token-budget packing of a corpus.

LLM training pipelines consume a corpus as size-bounded shards laid out in
a stable order (so a run can be resumed/replayed and two exports of the
same snapshot are identical).  This module packs documents into contiguous
token-budget buckets and writes them as one partition directory per shard
with a manifest — the export-side sibling of the WARC/CDX ingest sinks.

Packing rule (SQL-expressible, scale-safe): documents are laid out in a
tie-free total order (``order_cols``, e.g. ``doc_id`` or a SURT key) and a
document whose tokens start at running offset ``cum_before`` lands in

    shard_id = floor(cum_before / target_tokens)

i.e. shards are token-offset buckets.  Properties:

* deterministic — depends only on the order and token counts, never on
  partitioning or execution;
* contiguous — a shard is one run of consecutive documents;
* bounded — a shard's token total never exceeds ``target_tokens`` plus its
  last (spilling) document, so ``<= target + max_doc_tokens``;
* sparse ids are possible: a single document larger than the target spans
  several bucket offsets, leaving the intervening ids empty (the manifest
  records only non-empty shards).

The running offset is a global window sum — computed range-parallel via
:func:`operators.ranking.with_global_cumsum` (one range exchange + a
P-integer offset broadcast), NEVER a SinglePartition window, so the plan
is unchanged on a 1000-executor cluster.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from new_ent_crawler_spark.operators.ranking import with_global_cumsum

TOK = "n_tokens"


def whitespace_tokens(col) -> Column:
    """Whitespace token count, identical to the oracled text_token_count
    query (split on single spaces, drop empties)."""
    return F.size(F.filter(F.split(col, " "),
                           lambda x: F.length(x) > 0)).cast("long")


def shard_assignments(docs: DataFrame, target_tokens: int,
                      order_cols: list[str] | tuple = ("doc_id",),
                      tokens_col: str | None = None,
                      num_partitions: int | None = None) -> DataFrame:
    """Input rows + ``n_tokens`` + ``shard_id`` (long).  ``tokens_col``
    None counts whitespace tokens of ``text``; pass a precomputed column
    name to shard by a real tokenizer's counts instead."""
    if target_tokens <= 0:
        raise ValueError("target_tokens must be positive")
    d = docs.withColumn(TOK, F.col(tokens_col).cast("long")
                        if tokens_col else whitespace_tokens("text"))
    out, _total = with_global_cumsum(d, list(order_cols), TOK,
                                     num_partitions)
    return out.withColumn(
        "shard_id",
        F.floor((F.col("global_cum") - F.col(TOK))
                / F.lit(target_tokens)).cast("long")).drop("global_cum")


def shard_summary(docs: DataFrame, target_tokens: int,
                  order_cols: list[str] | tuple = ("doc_id",),
                  tokens_col: str | None = None) -> DataFrame:
    """(shard_id, n_docs, sum_tokens) per non-empty shard — the manifest
    as a DataFrame (and the DuckDB-oracled query surface)."""
    a = shard_assignments(docs, target_tokens, order_cols, tokens_col)
    return (a.groupBy("shard_id")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(TOK).cast("long").alias("sum_tokens")))


def write_training_shards(docs: DataFrame, path: str, target_tokens: int,
                          order_cols: list[str] | tuple = ("doc_id",),
                          tokens_col: str | None = None) -> dict:
    """Write the corpus as ``shard_id=K/`` parquet partition directories
    plus ``_manifest.json`` — per-shard doc/token counts and the packing
    parameters; underscore-prefixed so dataset readers skip it, like
    ``_SUCCESS``.  One shuffle by shard_id co-locates each shard into one
    task's writer so a shard is one file set; shards are independent, so
    the write parallelizes across shards — at 100 TB this is the same
    plan with more shards, never a driver-side loop."""
    a = shard_assignments(docs, target_tokens, order_cols,
                          tokens_col).persist()
    (a.repartition("shard_id")
     .sortWithinPartitions(*[F.col(c) for c in order_cols])
     .write.mode("overwrite").partitionBy("shard_id").parquet(path))
    # manifest counts from the SAME assignment pass (persisted), one row
    # per shard to the driver — bounded by shard count, never data
    rows = sorted(
        (r.asDict() for r in
         a.groupBy("shard_id")
         .agg(F.count("*").alias("n_docs"),
              F.sum(TOK).cast("long").alias("sum_tokens")).collect()),
        key=lambda r: r["shard_id"])
    a.unpersist()
    manifest = {"target_tokens": target_tokens,
                "order_cols": list(order_cols),
                "n_shards": len(rows),
                "total_docs": int(sum(r["n_docs"] for r in rows)),
                "total_tokens": int(sum(r["sum_tokens"] for r in rows)),
                "shards": rows}
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest
