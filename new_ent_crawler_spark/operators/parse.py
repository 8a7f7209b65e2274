"""Fetch+parse stage: the engine's single Arrow UDF family.

Per ``BASELINE.json.input_hint`` everything runs as vectorized pandas/Arrow
UDFs — no per-row Python UDFs in the plan.  One ``mapInPandas`` stage owns
all byte-level extraction (SURVEY.md §2.10): it consumes Arrow batches of
(claimed frontier row ⋈ pages.html) and emits per-URL

* ``status``  — listing found/not_found/error codes (worker/worker.py:206)
  or done/error for detail pages,
* ``text``    — the extracted text whose bytes are judged against the golden
  ``pages.text`` column (oracle ``extract_url_text``),
* ``links``   — discovered out-links with page-type scores and the company
  key propagated down the crawl tree (oracle ``discover_links``).

The "fetch" itself is the join against the ``pages`` table upstream of this
stage (the table *is* the web, SURVEY.md §2.1); a NULL html means the fetch
failed -> status error, no links.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..oracle import urlspec as U
from . import frontier as FR

PARSED_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("host", T.StringType(), True),
    T.StructField("company", T.StringType(), True),
    T.StructField("seed_id", T.LongType(), True),
    T.StructField("keyword", T.StringType(), True),
    T.StructField("depth", T.IntegerType(), True),
    T.StructField("priority", T.IntegerType(), True),
    T.StructField("page_type_score", T.IntegerType(), True),
    T.StructField("enqueue_wave", T.LongType(), True),
    T.StructField("status", T.IntegerType(), True),
    T.StructField("blocked", T.BooleanType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("links", T.ArrayType(T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("score", T.IntegerType(), False),
        T.StructField("company", T.StringType(), True),
    ])), True),
])


def _parse_one(url, host, company, html_bytes):
    """(status, text, links, blocked) for one fetched page."""
    if html_bytes is None:
        return FR.STATUS_ERROR, None, [], False
    content = bytes(html_bytes).decode("utf-8")
    kind, _ = U.classify(url)
    # block/ban detector (worker/worker.py:196) -> host cool-down instead of
    # the reference's ADSL redial
    from ..oracle import extract as X0
    if X0.BLOCK_MARKER in content or X0.INVALID_LINK_MARKER in content:
        return FR.STATUS_ERROR, None, [], True
    text = U.extract_url_text(url, content)

    status = FR.STATUS_FOUND
    if kind == "listing":
        from ..oracle import extract as X
        r = X.parse_listing(content)
        if r is None:
            status = FR.STATUS_ERROR
        elif r == "not_found":
            status = FR.STATUS_NOT_FOUND

    links = []
    for rel, score in U.discover_links(url, content):
        absolute = U.canonicalize(rel, host)
        # company key propagation: a listing's out-link IS the company main
        # page; everything below inherits the parent's company
        link_company = absolute if kind == "listing" else company
        links.append({"url": absolute, "score": score,
                      "company": link_company})
    return status, text, links, False


def parse_pages(fetched: DataFrame) -> DataFrame:
    """mapInPandas fetch+parse over (frontier row ⋈ html)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            statuses, texts, links_col, blocked_col = [], [], [], []
            for url, host, company, html in zip(
                    pdf["url"], pdf["host"], pdf["company"], pdf["html"]):
                s, t, l, blk = _parse_one(url, host, company, html)
                statuses.append(s)
                texts.append(t)
                links_col.append(l)
                blocked_col.append(blk)
            out = pdf[["url", "host", "company", "seed_id", "keyword",
                       "depth", "priority", "page_type_score",
                       "enqueue_wave"]].copy()
            out["status"] = pd.Series(statuses, dtype="int32")
            out["blocked"] = pd.Series(blocked_col, dtype="bool")
            out["text"] = texts
            out["links"] = links_col
            yield out

    return fetched.mapInPandas(run, schema=PARSED_SCHEMA)


def discovered_links(parsed: DataFrame, wave_id: int) -> DataFrame:
    """Explode out-links into candidate frontier rows (pre-dedup).

    Inherits priority/seed/keyword from the parent, depth+1, and derives the
    host from the canonical URL — all JVM-side expressions.
    """
    link = F.explode("links").alias("link")
    cand = (parsed
            .select("seed_id", "keyword", "priority", "depth", link)
            .select(
                F.col("link.url").alias("url"),
                F.regexp_extract("link.url", r"^https?://([^/]*)", 1).alias("host"),
                F.col("link.company").alias("company"),
                "seed_id", "keyword",
                (F.col("depth") + 1).cast("int").alias("depth"),
                F.col("link.score").alias("page_type_score"),
                "priority",
                F.lit(FR.STATUS_PENDING).alias("status"),
                F.lit(0).alias("crawler_count"),
                F.lit(wave_id).cast("long").alias("enqueue_wave"),
            ))
    # the same URL may be discovered by several parents in one wave: keep the
    # highest-priority / shallowest claim (deterministic)
    from pyspark.sql import Window
    w = Window.partitionBy("url").orderBy(
        F.col("priority").desc(), F.col("depth").asc(),
        F.col("page_type_score").desc(), F.col("seed_id").asc())
    return (cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
