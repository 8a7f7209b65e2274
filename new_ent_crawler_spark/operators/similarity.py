"""Similarity search over ``embeddings(vec_id, embedding array<float>,
label)``.

Two paths:

* brute-force cosine top-k — correctness baseline.  The dot product is a
  JVM-side ``aggregate(zip_with(...))`` expression (whole-stage codegen, no
  Python), the query vector a literal/broadcast.
* LSH-bucketed ANN (random-hyperplane signatures) — the scale path: each
  vector hashes to a small bucket key; only same-bucket candidates are
  scored, so the candidate set is ~n/2^bits per probe instead of n.

Hyperplanes are derived deterministically from md5 of (plane, dim) — no RNG
state to ship, reproducible across runs and engines.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0),
                       lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(vec_col, query: list[float]):
    q = F.array(*[F.lit(float(v)) for v in query])
    qn = math.sqrt(sum(v * v for v in query)) or 1.0
    a = F.transform(vec_col, lambda v: v.cast("double"))
    return _dot(a, q) / (_norm(a) * F.lit(qn))


def brute_force_topk(embeddings: DataFrame, query: list[float],
                     k: int = 10, id_col="vec_id",
                     vec_col="embedding") -> DataFrame:
    """Exact cosine top-k.  orderBy+limit compiles to TakeOrderedAndProject
    — a per-partition heap then a k-row merge, not a full sort."""
    sim = cosine_similarity_col(F.col(vec_col), query)
    return (embeddings
            .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-gaussian hyperplane from md5 bytes."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{plane}:{d}".encode()).digest()
        u = int.from_bytes(h[:8], "little") / 2 ** 64  # U(0,1)
        v = int.from_bytes(h[8:], "little") / 2 ** 64
        # Box-Muller
        out.append(math.sqrt(-2 * math.log(u + 1e-12))
                   * math.cos(2 * math.pi * v))
    return out


def rhp_signature_col(vec_col, dim: int, bits: int = 8):
    """Random-hyperplane LSH signature as an int bucket key."""
    acc = F.lit(0)
    a = F.transform(vec_col, lambda v: v.cast("double"))
    for b in range(bits):
        plane = F.array(*[F.lit(v) for v in _hyperplane(b, dim)])
        acc = acc + F.when(_dot(a, plane) >= 0, F.lit(2 ** b)).otherwise(0)
    return acc


def lsh_topk(embeddings: DataFrame, query: list[float], k: int = 10,
             bits: int = 8, id_col="vec_id", vec_col="embedding",
             multiprobe_hamming: int = 1) -> DataFrame:
    """ANN top-k: score only vectors whose bucket is within
    ``multiprobe_hamming`` bit flips of the query's bucket."""
    dim = len(query)
    bucketed = embeddings.withColumn(
        "bucket", rhp_signature_col(F.col(vec_col), dim, bits))

    qsig = 0
    for b in range(bits):
        plane = _hyperplane(b, dim)
        if sum(p * v for p, v in zip(plane, query)) >= 0:
            qsig += 2 ** b
    probes = {qsig}
    if multiprobe_hamming >= 1:
        probes |= {qsig ^ (1 << b) for b in range(bits)}
    cand = bucketed.filter(F.col("bucket").isin(list(probes)))
    sim = cosine_similarity_col(F.col(vec_col), query)
    return (cand.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def pairwise_topk_by_label(embeddings: DataFrame, k: int = 5,
                           id_col="vec_id", vec_col="embedding",
                           label_col="label") -> DataFrame:
    """Per-label centroid similarity: for each label, the k vectors closest
    to the label centroid — a groupBy agg + self-join, no n² blowup."""
    from pyspark.sql import Window
    dim_probe = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = dim_probe["d"]
    cent = (embeddings
            .groupBy(label_col)
            .agg(*[F.avg(F.col(vec_col)[i]).alias(f"c{i}") for i in range(dim)]))
    cent = cent.select(label_col,
                       F.array(*[F.col(f"c{i}") for i in range(dim)])
                       .alias("centroid"))
    joined = embeddings.join(F.broadcast(cent), label_col)
    a = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    sim = _dot(a, F.col("centroid")) / (_norm(a) * _norm(F.col("centroid")))
    w = Window.partitionBy(label_col).orderBy(F.col("sim").desc(), id_col)
    return (joined.select(label_col, F.col(id_col),
                          F.round(sim, 6).alias("sim"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k))
