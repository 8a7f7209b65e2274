"""CDX index builder — Common-Crawl-style URL index over the pages table.

Common Crawl publishes a CDXJ index next to every WARC segment: one line
per capture, ``<SURT> <14-digit UTC timestamp> {json payload}``, globally
sorted by (SURT, timestamp) so a range scan answers "all captures of
``*.example.com``" without touching page bytes.  This module builds the
same artifact Spark-first:

* the index row set is pure JVM expressions (``surt_key``, ``date_format``,
  ``sha2``, ``length``) — no Python in the plan;
* the global (surt, ts) order is produced with ``repartitionByRange`` +
  ``sortWithinPartitions`` — a single range-exchange, each output file
  covers a disjoint SURT range (the property CDX range queries rely on),
  NOT a single-partition global sort;
* prefix lookup is a ``startswith`` filter: with the index stored sorted
  by SURT, parquet row-group min/max stats prune every non-overlapping
  range (same mechanism as the wave engine's claimed-range fetch scan).

Digest is hex SHA-256 (Spark ``sha2``; mirrored by DuckDB ``sha256`` in
the oracle) rather than Common Crawl's base32 SHA-1 — Spark exposes no
base32 codec JVM-side and the digest's job here (capture identity /
dedup key) only needs a stable collision-resistant hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from new_ent_crawler_spark.functions.url import surt_key

CDX_COLUMNS = ["surt", "ts14", "url", "digest", "length"]


def build_cdx(pages: DataFrame, url_col: str = "url",
              ts_col: str = "warc_ts", body_col: str = "html",
              utc_from_tz: str | None = "Asia/Shanghai",
              keep_cols: list[str] | None = None) -> DataFrame:
    """CDX rows (surt, ts14, url, digest, length) from a pages table.

    ``utc_from_tz``: session timezone the stored instants render in; CDX
    timestamps are UTC by spec, so instants are shifted before formatting.
    Pass ``None`` for naive (TIMESTAMP_NTZ) inputs that are already the
    wall-clock you want indexed.  ``keep_cols`` carries extra identity
    columns through (e.g. a capture id).  ``length`` is bytes for binary
    bodies, characters for string bodies (both engines agree either way).
    """
    ts = F.col(ts_col)
    if utc_from_tz is not None:
        ts = F.to_utc_timestamp(ts, utc_from_tz)
    return pages.select(
        *(keep_cols or []),
        surt_key(url_col).alias("surt"),
        F.date_format(ts, "yyyyMMddHHmmss").alias("ts14"),
        F.col(url_col).alias("url"),
        F.sha2(F.col(body_col), 256).alias("digest"),
        F.length(body_col).cast("bigint").alias("length"),
    ).where(F.col("surt").isNotNull())


def write_cdx(cdx: DataFrame, path: str, num_files: int | None = None):
    """Persist the index range-sorted by (surt, ts14).

    One range exchange; each parquet file owns a disjoint SURT range and
    carries min/max footer stats on ``surt``, so a prefix lookup reading
    the stored index scans only overlapping files/row-groups.
    """
    part = cdx.repartitionByRange(*(
        [num_files] if num_files else []), "surt", "ts14")
    part.sortWithinPartitions("surt", "ts14").write.mode("overwrite") \
        .parquet(path)


def cdx_prefix_lookup(cdx: DataFrame, surt_prefix: str) -> DataFrame:
    """All captures whose SURT starts with ``surt_prefix`` — e.g.
    ``com,example,`` = the whole registered domain.  The startswith
    predicate pushes to the parquet scan as a (>=, <) stat filter on a
    sorted index, pruning non-overlapping row groups."""
    return cdx.where(F.col("surt").startswith(surt_prefix))


def classify_revisits(new_cdx: DataFrame, prev_cdx: DataFrame) -> DataFrame:
    """Classify a recrawl's captures against the previous index — the
    WARC ``revisit`` record decision (ISO 28500 §6.7.2: a capture whose
    payload digest equals an earlier capture's is stored as a reference,
    not a second body copy; Common Crawl's dedup works exactly this way).

    Per new capture: ``new`` (url never seen), ``revisit`` (digest equals
    the url's LATEST previous capture), or ``changed``.  "Latest" is the
    max (ts14, digest) pair — encoded as one string since ts14 is
    fixed-width, so one map-side-combinable ``max`` replaces a window
    sort.  Output adds ``status`` and ``prev_ts14`` (the referenced
    capture for revisit records).

    Scale shape: one hash aggregate over the previous index + one join
    on url; both sides are CDX-sorted on SURT, so at 100 TB the prev
    aggregate reads only (url, ts14, digest) columns and AQE picks the
    join strategy (the previous-latest dim is |urls|, not |captures|).
    """
    latest = prev_cdx.groupBy("url").agg(
        F.max(F.concat("ts14", F.lit("|"), "digest")).alias("_td"))
    prev = latest.select(
        "url",
        F.substring_index("_td", "|", 1).alias("prev_ts14"),
        F.substring_index("_td", "|", -1).alias("_prev_digest"))
    out = new_cdx.join(prev, "url", "left")
    status = (F.when(F.col("_prev_digest").isNull(), "new")
              .when(F.col("digest") == F.col("_prev_digest"), "revisit")
              .otherwise("changed"))
    return out.withColumn("status", status) \
        .withColumn("prev_ts14",
                    F.when(status == "revisit", F.col("prev_ts14"))) \
        .drop("_prev_digest")


def to_cdxj_lines(cdx: DataFrame) -> DataFrame:
    """Render the classic one-line-per-capture CDXJ text form (a single
    ``value`` string column, writable with ``df.write.text``)."""
    payload = F.to_json(F.struct("url", "digest", "length"))
    return cdx.select(
        F.concat_ws(" ", "surt", "ts14", payload).alias("value"))
