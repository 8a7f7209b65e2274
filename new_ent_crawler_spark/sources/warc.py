"""WARC (ISO 28500) source: read Common-Crawl-style archives into the
``pages`` schema (url, warc_ts, html, text, lang).

Production Common Crawl ships ~1 GB ``.warc.gz`` segment files; Spark's
``binaryFile`` source gives one row per file and file-level parallelism —
the natural unit, since WARC members are not splittable mid-record.  Each
file is parsed JVM-adjacent in an Arrow ``mapInPandas`` stage (batch = a
few files), so no per-row Python ever touches individual pages; the parse
walks records by declared Content-Length (never regex over the whole blob).

Only ``WARC-Type: response`` records become pages; the HTTP envelope is
stripped to the entity body.  gzip *whole-file* compression is handled
(``.warc.gz`` written as one stream or as concatenated members — zlib
consumes multi-member streams); per-record gzip members also decode, as
each record parse consumes exactly one member.

Writer included for tests/fixtures: ``write_warc`` emits a spec-compliant
single-stream WARC so the reader round-trips deterministically.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = ("url string, warc_ts timestamp, html binary, "
                "text string, lang string")

_CRLF = b"\r\n"


def _split_http(payload: bytes) -> bytes:
    """Strip an HTTP response envelope if present, returning the body."""
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep != -1:
            return payload[sep + 4:]
    return payload


def _decompress(blob: bytes) -> bytes:
    if blob[:2] == b"\x1f\x8b":
        out, stream = [], io.BytesIO(blob)
        # concatenated gzip members (the common crawl layout)
        while True:
            start = stream.tell()
            try:
                with gzip.GzipFile(fileobj=stream) as gz:
                    out.append(gz.read())
            except (OSError, EOFError):
                break
            if stream.tell() == start:
                break
            if stream.read(1) == b"":
                break
            stream.seek(-1, 1)
        return b"".join(out)
    return blob


def parse_warc_bytes(blob: bytes) -> Iterator[dict]:
    """Walk WARC records by header + Content-Length; yield response pages."""
    data = _decompress(blob)
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record blank lines
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n or not data[pos:pos + 5] == b"WARC/":
            break
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end == -1:
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        length = int(headers.get("content-length", "0"))
        body = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        if headers.get("warc-type") == "response":
            yield {
                "url": headers.get("warc-target-uri", ""),
                "warc_date": headers.get("warc-date", ""),
                "html": _split_http(body),
            }


def read_warc(spark: SparkSession, path: str,
              lang_default: str = "") -> DataFrame:
    """``pages`` DataFrame from a directory/glob of .warc / .warc.gz files."""
    import pyspark.sql.functions as F

    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf["content"]:
                for rec in parse_warc_bytes(bytes(blob)):
                    rows.append((rec["url"], rec["warc_date"], rec["html"]))
            yield pd.DataFrame(rows, columns=["url", "warc_date", "html"])

    raw = files.mapInPandas(parse, "url string, warc_date string, html binary")
    return raw.select(
        "url",
        # WARC-Date is UTC (ISO 28500); XXX parses the Z offset so the
        # stored instant is correct regardless of session timezone
        F.to_timestamp("warc_date", "yyyy-MM-dd'T'HH:mm:ssXXX")
        .alias("warc_ts"),
        "html",
        F.decode("html", "utf-8").alias("text"),
        F.lit(lang_default).alias("lang"))


def _warc_record(url: str, warc_date: str, body: bytes) -> bytes:
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: response\r\n"
           f"WARC-Target-URI: {url}\r\n"
           f"WARC-Date: {warc_date}\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode()
    return hdr + body + _CRLF * 2


def write_warc_df(pages: DataFrame, out_dir: str,
                  num_segments: int | None = None,
                  compress: bool = True,
                  session_tz: str = "Asia/Shanghai") -> DataFrame:
    """Distributed WARC sink: pages DataFrame → ``segment-NNNNN.warc[.gz]``
    files, one per partition, plus a returned manifest DataFrame
    (segment path, n_records, n_bytes).

    Spark-first shape: rows are range-partitioned by url (each segment
    owns a contiguous, deterministic URL range — the layout Common
    Crawl's per-segment CDX assumes) and serialized executor-side in an
    Arrow ``mapInPandas`` stage; each task streams its partition into ONE
    archive file and yields a single manifest row, so the driver never
    sees page bytes.  WARC-Date is rendered JVM-side in UTC (ISO 28500)
    from the session-timezone instants, so :func:`read_warc` round-trips
    the exact stored instant.

    At 100 TB the segment count is input-driven (``num_segments`` ≈
    total bytes / 1 GB, the Common Crawl segment size); the range
    exchange is the sink's only shuffle.
    """
    import os

    import pyspark.sql.functions as F

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    rows = pages.select(
        "url",
        F.date_format(F.to_utc_timestamp("warc_ts", session_tz),
                      "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_date"),
        "html")
    rows = (rows.repartitionByRange(num_segments, "url")
            if num_segments else rows.repartitionByRange("url"))
    rows = rows.sortWithinPartitions("url")

    def write_segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"segment-{pid:05d}{ext}")
        n, raw_bytes = 0, 0
        # level 6: gzip's default speed/ratio tradeoff; stdlib gzip.open
        # defaults to 9, which costs ~2x cpu for ~1% on html
        opener = ((lambda p, m: gzip.open(p, m, compresslevel=6))
                  if compress else open)
        sink = None
        for pdf in batches:
            if len(pdf) and sink is None:
                sink = opener(path, "wb")
            for url, wdate, html in zip(pdf["url"], pdf["warc_date"],
                                        pdf["html"]):
                rec = _warc_record(url, wdate, bytes(html))
                sink.write(rec)
                n += 1
                raw_bytes += len(rec)
        if sink is not None:
            sink.close()
            yield pd.DataFrame([(path, n, raw_bytes)],
                               columns=["segment", "n_records", "n_bytes"])

    manifest = rows.mapInPandas(
        write_segment, "segment string, n_records long, n_bytes long")
    # materialize (runs the writes) and hand back the tiny manifest
    return manifest.localCheckpoint(eager=True)


def write_warc(pages: list[dict], path: str, compress: bool = False) -> None:
    """Test/fixture writer: pages = [{url, warc_date, html: bytes}]."""
    out = io.BytesIO()
    for p in pages:
        body = p["html"]
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Target-URI: {p['url']}\r\n"
               f"WARC-Date: {p['warc_date']}\r\n"
               f"Content-Length: {len(body)}\r\n\r\n").encode()
        out.write(hdr)
        out.write(body)
        out.write(_CRLF * 2)
    blob = out.getvalue()
    if compress:
        blob = gzip.compress(blob)
    with open(path, "wb") as f:
        f.write(blob)
