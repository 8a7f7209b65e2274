"""sitemaps.org XML source: seed a crawl frontier from sitemap files.

The reference seeds its frontier from a MySQL keyword poll
(utils/MysqlDBHelper.py:122-128); an open web crawl's equivalent
first-party seed list is the host's ``sitemap.xml`` — advertised by
robots.txt ``Sitemap:`` lines — so this source closes the loop
robots→sitemap→frontier.

Layout follows ``sources/warc.py``: Spark's ``binaryFile`` source gives one
row per file and file-level parallelism (sitemaps cap at 50k URLs / 50 MB
per file by spec, so a file is the natural unit), and each file parses in
an Arrow ``mapInPandas`` stage with stdlib ``xml.etree`` — no per-row
Python touches individual URLs.  Handles both document kinds from the
protocol: ``<urlset>`` (url + optional lastmod/changefreq/priority) and
``<sitemapindex>`` (pointers to child sitemaps — emitted with
``kind='sitemap'`` so the caller can schedule the children as fetches,
which on a real crawl is itself a crawl action).  gzip payloads
(``sitemap.xml.gz``) decode transparently; malformed XML yields zero rows
for that file rather than failing the scan (a broken sitemap must not
kill a 10^5-host seed job).

``robots_sitemap_urls`` extracts ``Sitemap:`` directives from robots.txt
bodies — case-insensitive key per the de-facto standard — as a plain
column expression.  ``seeds_from_sitemap`` adapts parsed URL rows to the
frontier's seed schema (priority from the sitemap's 0.0-1.0 priority,
host via functions/url.py's canonical host key).
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

SITEMAP_SCHEMA = ("kind string, url string, lastmod string, "
                  "changefreq string, priority double, source_file string")


def parse_sitemap_bytes(payload: bytes):
    """Yield ``(kind, url, lastmod, changefreq, priority)`` tuples from one
    sitemap document (``kind`` is ``'url'`` for urlset entries,
    ``'sitemap'`` for sitemapindex children).  Pure stdlib; accepts gzip
    payloads and documents with or without the sitemaps.org namespace."""
    if payload[:2] == b"\x1f\x8b":
        with gzip.GzipFile(fileobj=io.BytesIO(payload)) as gz:
            payload = gz.read()
    root = ElementTree.fromstring(payload)

    def _find(el, tag):
        node = el.find(_NS + tag)
        if node is None:
            node = el.find(tag)  # namespace-less producers exist
        return node.text.strip() if node is not None and node.text else None

    tag = root.tag.removeprefix(_NS)
    if tag == "urlset":
        kind, child_tag = "url", "url"
    elif tag == "sitemapindex":
        kind, child_tag = "sitemap", "sitemap"
    else:
        raise ValueError(f"not a sitemap document: <{root.tag}>")
    for el in list(root.iter(_NS + child_tag)) + list(root.iter(child_tag)):
        loc = _find(el, "loc")
        if not loc:
            continue
        prio = _find(el, "priority")
        try:
            prio_f = float(prio) if prio is not None else None
        except ValueError:
            prio_f = None  # '<priority>high</priority>' exists in the wild
        yield (kind, loc, _find(el, "lastmod"), _find(el, "changefreq"),
               prio_f)


def read_sitemaps(spark: SparkSession, path: str) -> DataFrame:
    """DataFrame of sitemap entries from a directory/glob of sitemap XML
    (optionally .gz) files: ``kind/url/lastmod/changefreq/priority/
    source_file``.  ``kind='sitemap'`` rows are child-sitemap pointers
    from index files; filter on ``kind='url'`` for page seeds."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["kind", "url", "lastmod", "changefreq", "priority",
                "source_file"]
        for pdf in batches:
            rows = []
            for path_, blob in zip(pdf["path"], pdf["content"]):
                try:
                    # materialize BEFORE appending: a mid-generator error
                    # must yield zero rows for the file, never a partial
                    # prefix that looks complete
                    tups = list(parse_sitemap_bytes(bytes(blob)))
                except (ElementTree.ParseError, ValueError, OSError,
                        EOFError, zlib.error):
                    continue  # a broken sitemap never kills the seed job
                rows.extend(tup + (path_,) for tup in tups)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(parse, SITEMAP_SCHEMA)


def robots_sitemap_urls(robots_body_col):
    """Column expression: array of ``Sitemap:`` URLs advertised in a
    robots.txt body (case-insensitive key, de-facto standard).  Pure JVM
    regexp — usable straight off the politeness robots scan."""
    from pyspark.sql import functions as F
    c = (F.col(robots_body_col)
         if isinstance(robots_body_col, str) else robots_body_col)
    # CRLF line endings are the norm for web-served robots.txt, and '#'
    # opens a comment anywhere on a line — both must be stripped or the
    # extracted URL carries a trailing '\r' / ' # comment' and never
    # matches a fetched child sitemap (parity with robots.py's parser)
    lines = F.transform(F.split(c, "\r?\n"),
                        lambda ln: F.regexp_replace(ln, "#.*$", ""))
    maps = F.filter(lines, lambda ln: ln.rlike(r"(?i)^\s*sitemap\s*:"))
    return F.transform(
        maps, lambda ln: F.trim(F.regexp_replace(ln, r"(?i)^\s*sitemap\s*:",
                                                 "")))


def seeds_from_sitemap(entries: DataFrame, default_priority: int = 1,
                       keyword: str = "") -> DataFrame:
    """Adapt ``read_sitemaps`` URL rows to the frontier seed schema
    (seed_url, host, seed_id, keyword, priority) consumed by
    operators/frontier.py::init_frontier.  Sitemap priority (0.0-1.0,
    default 0.5 per spec) maps to the frontier's integer priority lanes:
    >= 0.5 rides the high lane (default_priority + 1).  seed_id numbers
    rows deterministically by url so re-runs seed identically."""
    from pyspark.sql import functions as F

    from ..functions.url import url_host
    from ..operators.ranking import _with_global_rn

    # dedup on url ALONE (the same url can appear in two sitemaps with
    # different priorities — (url, prio) distinct would double-seed it and
    # tie _with_global_rn's url order key); the max priority wins so the
    # more eager advertisement decides the lane
    urls = (entries.filter(F.col("kind") == "url")
            .groupBy("url")
            .agg(F.max(F.coalesce("priority", F.lit(0.5))).alias("prio")))
    numbered, _ = _with_global_rn(urls, ["url"])
    return numbered.select(
        F.col("url").alias("seed_url"),
        url_host("url").alias("host"),
        (F.col("global_rn") - 1).cast("long").alias("seed_id"),
        F.lit(keyword).alias("keyword"),
        F.when(F.col("prio") >= 0.5, F.lit(default_priority + 1))
        .otherwise(F.lit(default_priority)).cast("int").alias("priority"))
