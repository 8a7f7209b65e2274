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


def ivf_centroids(embeddings: DataFrame, n_centroids: int = 16,
                  id_col="vec_id", vec_col="embedding",
                  lloyd_iters: int = 1) -> list[list[float]]:
    """Coarse-quantizer centroids for an IVF index.

    Seeds are the ``n_centroids`` lowest-id vectors (deterministic — no RNG
    state), optionally refined by ``lloyd_iters`` k-means steps.  The mean
    per (cluster, dimension) is computed distributed via posexplode +
    groupBy; only the C x dim means (KBs) ever reach the driver, so this
    scales to any corpus size.  At 100 TB you'd train on a sampled slice
    (``df.sample``) — the assignment path below is unchanged.
    """
    seeds = [
        [float(v) for v in r[0]]
        for r in embeddings.orderBy(id_col).limit(n_centroids)
        .select(vec_col).collect()]
    if not seeds:
        raise ValueError("ivf_centroids: embeddings table is empty")
    # corpora smaller than n_centroids yield fewer seeds; clamp so the
    # Lloyd refinement below never indexes past the actual centroid list
    n_centroids = len(seeds)
    cents = seeds
    for _ in range(lloyd_iters):
        assigned = embeddings.withColumn(
            "cluster", nearest_centroid_col(F.col(vec_col), cents))
        means = (assigned
                 .select("cluster", F.posexplode(
                     F.transform(F.col(vec_col),
                                 lambda v: v.cast("double")))
                     .alias("pos", "val"))
                 .groupBy("cluster", "pos")
                 .agg(F.avg("val").alias("m"))
                 .collect())
        by_cluster: dict[int, dict[int, float]] = {}
        for r in means:
            by_cluster.setdefault(r.cluster, {})[r.pos] = r.m
        dim = len(cents[0])
        cents = [
            [by_cluster.get(c, {}).get(d, cents[c][d]) for d in range(dim)]
            for c in range(n_centroids)]
    return cents


def nearest_centroid_col(vec_col, centroids: list[list[float]]):
    """Index of the max-dot-product centroid, JVM-side: the C dot products
    are an array expression; argmax = array_position(array_max)."""
    a = F.transform(vec_col, lambda v: v.cast("double"))
    dots = F.array(*[
        _dot(a, F.array(*[F.lit(float(v)) for v in c])) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_topk(embeddings: DataFrame, query: list[float], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             id_col="vec_id", vec_col="embedding",
             centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF ANN top-k: score only vectors assigned to the ``nprobe``
    centroids nearest the query.  Candidate set ~ nprobe/C of the corpus;
    with the inverted lists written out partitioned by cluster
    (``write_table(..., partition_by=['cluster'])``) the probe prunes to
    nprobe partitions at the parquet scan."""
    if centroids is None:
        centroids = ivf_centroids(embeddings, n_centroids,
                                  id_col=id_col, vec_col=vec_col)
    qdots = [sum(c[d] * query[d] for d in range(len(query)))
             for c in centroids]
    probe = sorted(range(len(centroids)),
                   key=lambda i: -qdots[i])[:nprobe]
    cand = (embeddings
            .withColumn("cluster",
                        nearest_centroid_col(F.col(vec_col), centroids))
            .filter(F.col("cluster").isin(probe)))
    sim = cosine_similarity_col(F.col(vec_col), query)
    return (cand.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def exact_pair_topk(embeddings: DataFrame, k: int = 20, n_blocks: int = 4,
                    quant: int = 1000, id_col="vec_id",
                    vec_col="embedding") -> DataFrame:
    """Exact global top-k most-similar pairs by integer-quantized dot
    product — the sharded brute-force plan (how FAISS/ScaNN shard exact
    search), replacing the naive self-join.

    The n²/2 pair space decomposes into B(B+1)/2 block pairs: vectors
    shard by ``vec_id % B``; each block pair scores its cross product
    with ONE numpy GEMM inside an Arrow batch and keeps only its local
    top-k under the total order (dot desc, id_a, id_b).  Exactness:
    every unordered pair lands in exactly one block pair (same-block
    pairs keep ``id_a < id_b``; cross-block pairs appear once because
    blocks join with ``blk_a <= blk_b`` and are emitted min-id-first),
    and a pair in the global top-k is necessarily in its block pair's
    local top-k under the same order.  Scale shape: the shuffle carries
    O(n·B) vector copies and B²·k candidate rows instead of n²/2 scored
    pairs through a sort, and per-pair work is a vectorized matmul
    instead of a per-row expression fold.  At 100 TB, size B so one
    block (~n/B rows × dim) fits an executor's Arrow batch; quantized
    int64 dot products are exact (no float accumulation drift)."""
    import numpy as np
    import pandas as pd

    q = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col,
                    lambda x: F.round(x.cast("double") * quant)).alias("v"),
        (F.col(id_col) % n_blocks).cast("int").alias("blk"))
    packed = q.groupBy("blk").agg(
        F.collect_list(F.struct("vec_id", "v")).alias("vecs"))
    pa, pb = packed.alias("pa"), packed.alias("pb")
    pairs = (pa.join(F.broadcast(pb), F.col("pa.blk") <= F.col("pb.blk"))
             .select(F.col("pa.blk").alias("blk_a"),
                     F.col("pa.vecs").alias("vecs_a"),
                     F.col("pb.blk").alias("blk_b"),
                     F.col("pb.vecs").alias("vecs_b"))
             # one GEMM task per block pair
             .repartition(n_blocks * (n_blocks + 1) // 2))

    def score(batches):
        for pdf in batches:
            rows = []
            for ba, va, bb, vb in zip(pdf["blk_a"], pdf["vecs_a"],
                                      pdf["blk_b"], pdf["vecs_b"]):
                ids_a = np.array([r["vec_id"] for r in va], np.int64)
                mat_a = np.array([r["v"] for r in va],
                                 np.float64).astype(np.int64)
                ids_b = np.array([r["vec_id"] for r in vb], np.int64)
                mat_b = np.array([r["v"] for r in vb],
                                 np.float64).astype(np.int64)
                g = mat_a @ mat_b.T
                if ba == bb:
                    ii, jj = np.nonzero(ids_a[:, None] < ids_b[None, :])
                else:
                    ii, jj = np.nonzero(np.ones(g.shape, bool))
                if not len(ii):
                    continue
                dots = g[ii, jj]
                lo = np.minimum(ids_a[ii], ids_b[jj])
                hi = np.maximum(ids_a[ii], ids_b[jj])
                # local top-k under the SAME total order as the final sort
                order = np.lexsort((hi, lo, -dots))[:k]
                rows.extend(zip(lo[order].tolist(), hi[order].tolist(),
                                dots[order].tolist()))
            yield (pd.DataFrame(rows, columns=["id_a", "id_b", "dot"])
                   .astype("int64"))  # typed even when a batch is empty

    out = pairs.mapInPandas(score, schema="id_a long, id_b long, dot long")
    return out.orderBy(F.col("dot").desc(), "id_a", "id_b").limit(k)
