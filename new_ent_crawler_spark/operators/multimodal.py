"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The ``pages.html`` column is already a binary payload; the same pattern
extends to image/audio/video columns in a training-data lake: store bytes as
``binary`` with a typed metadata struct, run decode/feature-extraction as
Arrow-batched ``mapInPandas`` stages.  The Spark-side plumbing here (schemas,
batching, partition sizing) is real and tested; the codec calls are stubbed
deterministically because no image/audio libraries ship in this container —
each stub raises ``NotImplementedError`` unless ``deterministic_fake=True``,
which derives stable pseudo-features from the md5 of the payload so the
distributed pipeline is exercisable end to end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    d = hashlib.md5(payload).digest()
    return [d[i % 16] / 255.0 for i in range(dim)]


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Real decode would use PIL/opencv; not available in this container."""
    raise NotImplementedError("image codecs are not shipped in this sandbox")


def extract_features(media: DataFrame, dim: int = 8,
                     deterministic_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    Batch shape matters at scale: payloads are large, so
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory
    per batch; partition sizing should target payload bytes, not row counts.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    out_rows.append((mid, 0, None, None))
                    continue
                b = bytes(payload)
                if deterministic_fake:
                    feat = _fake_feature(b, dim)
                else:
                    feat = decode_image(b)  # NotImplementedError by design
                out_rows.append((mid, len(b),
                                 hashlib.md5(b).hexdigest(), feat))
            yield pd.DataFrame(out_rows, columns=["media_id", "n_bytes",
                                                  "digest", "feature"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA)


def decode_audio(payload: bytes):  # pragma: no cover - stub
    raise NotImplementedError("audio codecs are not shipped in this sandbox")


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])


def resize_images(media: DataFrame, width: int, height: int,
                  deterministic_fake: bool = True) -> DataFrame:
    """Resize plumbing: payload in -> payload out with new dimensions.

    The real kernel would be PIL/opencv inside the same batch loop; the
    deterministic fake emits a payload whose bytes depend on (digest, w, h)
    so downstream stages (storage sizing, dedup on resized bytes) are
    exercisable.  Rows with NULL payloads pass through as NULL — the same
    null-contract as the fetch join."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((mid, None, None, None))
                    continue
                b = bytes(payload)
                if deterministic_fake:
                    seed = hashlib.md5(b + f":{width}x{height}".encode())
                    out = (seed.digest() * ((width * height) // 16 + 1))
                    out = out[:width * height]
                else:
                    out = decode_image(b)  # NotImplementedError by design
                rows.append((mid, out, width, height))
            yield pd.DataFrame(rows, columns=["media_id", "payload",
                                              "width", "height"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_no", T.IntegerType(), False),
    T.StructField("ts_ms", T.LongType(), True),
    T.StructField("frame", T.BinaryType(), True),
])


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8,
                  deterministic_fake: bool = True) -> DataFrame:
    """Frame sampling: one video row fans out to <= max_frames frame rows
    (an unnest the engine expresses as mapInPandas yielding multiple rows
    per input).  Frame count derives from meta.duration_ms; the decode of
    each frame is the stubbed codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"],
                                          pdf["meta"]):
                if payload is None:
                    continue
                dur = (meta or {}).get("duration_ms") or 0
                n = min(max_frames, max(1, int(dur // every_ms)))
                b = bytes(payload)
                for i in range(n):
                    if deterministic_fake:
                        frame = hashlib.md5(b + f":frame{i}".encode()).digest()
                    else:
                        frame = decode_image(b)
                    rows.append((mid, i, i * every_ms, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no",
                                              "ts_ms", "frame"])

    return media.select("media_id", "payload", "meta").mapInPandas(
        run, schema=FRAME_SCHEMA)


def pages_as_media(pages: DataFrame) -> DataFrame:
    """View the crawl's pages table through the media schema (html bytes as
    the opaque payload) — demonstrates the plumbing on real data."""
    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.col("html").alias("payload"),
        F.struct(F.lit("text/html").alias("mime"),
                 F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(None).cast("long").alias("duration_ms")).alias("meta"))
