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
