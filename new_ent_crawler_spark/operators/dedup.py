"""URL-seen set: partition-local Bloom filters merged via treeAggregate,
pruning an exact left_anti join.

The reference delegates dedup to ``REPLACE INTO ... md5(key)``
(utils/MysqlDBHelper.py:22-31); the north_rule makes the seen set explicit.
Correctness rule (SURVEY.md §4): Bloom filters have false positives, so the
Bloom is a *pruning pre-filter only* —

* Bloom-negative candidates are **definitely new** → skip the anti-join.
* Bloom-positive candidates are *possibly seen* → exact ``left_anti`` join
  against the frontier decides.

At 10^10 URLs the Bloom is built from per-partition counts and merged with
``treeAggregate(depth=...)`` so raw URL sets never hit the driver; only the
bit array does (≈1.2 GB at 10^10 keys / 1% fpp — broadcast-able).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BloomFilter:
    """Bitarray Bloom over md5-derived hash pairs (Kirsch-Mitzenmacher
    double hashing).  Deterministic across driver and executors.

    The md5 is computed JVM-side (``F.md5``) wherever a DataFrame is in
    hand; the Python side only turns hex into uint64 pairs and does the bit
    arithmetic — fully numpy-vectorized (``add_many_hex`` /
    ``might_contain_many_hex``), so no per-row Python in the hot path.
    All index arithmetic wraps at 2^64 (numpy uint64 semantics) in both the
    scalar and vectorized paths, keeping them bit-identical."""

    _MASK = (1 << 64) - 1

    def __init__(self, n_bits: int, n_hashes: int):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, expected: int, fpp: float = 0.01) -> "BloomFilter":
        expected = max(expected, 64)
        n_bits = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
        n_hashes = max(1, int(round(n_bits / expected * math.log(2))))
        return cls(n_bits, min(n_hashes, 12))

    @staticmethod
    def _hex_pairs(hexes) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized hex -> (h1, h2|1) uint64 arrays: one fromhex over the
        concatenated digests, one frombuffer — no per-row parsing."""
        raw = bytes.fromhex("".join(hexes))
        u = np.frombuffer(raw, dtype="<u8").reshape(-1, 2)
        return u[:, 0].copy(), (u[:, 1] | np.uint64(1))

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        ks = np.arange(self.n_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            mixed = h1[:, None] + ks[None, :] * h2[:, None]  # wraps at 2^64
        return (mixed % np.uint64(self.n_bits)).astype(np.int64)

    def add_many_hex(self, hexes) -> None:
        if len(hexes) == 0:
            return
        pos = self._positions(*self._hex_pairs(hexes)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3,
                         np.uint8(1) << (pos & 7).astype(np.uint8))

    def might_contain_many_hex(self, hexes) -> np.ndarray:
        if len(hexes) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(*self._hex_pairs(hexes))
        hit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1)

    # -- scalar string API (driver-side convenience, tests) ----------------

    @staticmethod
    def _hex(key: str) -> str:
        return hashlib.md5(key.encode("utf-8")).hexdigest()

    def add(self, key: str):
        self.add_many_hex([self._hex(key)])

    def might_contain(self, key: str) -> bool:
        return bool(self.might_contain_many_hex([self._hex(key)])[0])

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        return self


def build_bloom(urls: DataFrame, expected: int | None = None,
                fpp: float = 0.01, depth: int = 3) -> BloomFilter:
    """Partition-local Blooms merged via treeReduce (north_rule).  md5 runs
    JVM-side; each partition builds its Bloom with one vectorized pass."""
    if expected is None:
        expected = urls.count()
    proto = BloomFilter.sized(expected, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes
    hexes = urls.select(F.md5(F.col("url")).alias("h"))

    def part_bloom(rows):
        bf = BloomFilter(n_bits, n_hashes)
        bf.add_many_hex([r[0] for r in rows])
        yield bf

    rdd = hexes.rdd.mapPartitions(part_bloom)
    if rdd.isEmpty():
        return proto
    return rdd.treeReduce(lambda a, b: a.merge(b), depth=depth)


def filter_new_urls(candidates: DataFrame, seen_urls: DataFrame,
                    bloom: BloomFilter | None,
                    seen_count: int | None = None,
                    broadcast_below: int = 4_000_000) -> DataFrame:
    """Candidates not yet in the seen set.

    ``candidates`` and ``seen_urls`` must both expose a ``url`` column.  With
    a Bloom, only the possibly-seen slice pays the anti-join shuffle; the
    definitely-new slice flows straight through.

    ``seen_count`` (if the caller already knows it — the wave engine gets
    the frontier size for free from its head job) gates a broadcast hint on
    the SEEN side of the exact anti-join: below ``broadcast_below`` rows
    (~a few hundred MB of url strings at the cap) the anti-join becomes a
    map-side broadcast probe and the per-wave shuffle of the whole seen set
    disappears.  Above it — the 10^10-frontier regime — the hint is
    withheld and the join shuffles as before (where an Iceberg seen table
    bucketed by url would prune instead).  Under the broadcast the Bloom
    pre-filter is skipped entirely (a map-side hash probe is cheaper than
    the Bloom's Python round trip).  Exactness is never traded: the Bloom
    only ever routes rows, the broadcast only changes the join strategy.
    """
    if seen_count is not None and seen_count < broadcast_below:
        # When the exact anti-join is already a map-side broadcast probe,
        # the Bloom pre-filter is strictly redundant work: every candidate
        # pays a Python/Arrow round trip to decide whether to skip a JVM
        # hash probe that costs less than the round trip.  Skip the tagging
        # and anti-join everything — the result is identical (the Bloom
        # only ever routed rows).  At 10^10-frontier scale seen_count blows
        # the gate, the hint is withheld, and the Bloom prune pays for
        # itself by shrinking the shuffled slice — that path is unchanged.
        return candidates.join(F.broadcast(seen_urls.select("url")),
                               "url", "left_anti")
    if bloom is None:
        return candidates.join(seen_urls.select("url"), "url", "left_anti")

    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def maybe_seen(hexes: pd.Series) -> pd.Series:
        f = b.value
        return pd.Series(f.might_contain_many_hex(hexes.to_list()))

    tagged = candidates.withColumn(
        "_maybe_seen", maybe_seen(F.md5(F.col("url"))))
    definitely_new = tagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
    suspects = tagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
    confirmed_new = suspects.join(seen_urls.select("url"), "url", "left_anti")
    return definitely_new.unionByName(confirmed_new)


def dedup_last_writer_wins(df: DataFrame, key_cols, order_col) -> DataFrame:
    """REPLACE INTO semantics: one row per key, newest ``order_col`` wins
    (utils/MysqlDBHelper.py:22-31 -> SURVEY.md §2.4)."""
    from pyspark.sql import Window
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc(), "url")
    return (df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
