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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class BloomFilter:
    """Plain bitarray Bloom over md5-derived hash pairs (Kirsch-Mitzenmacher
    double hashing).  Deterministic across driver and executors."""

    def __init__(self, n_bits: int, n_hashes: int):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = bytearray((n_bits + 7) // 8)

    @classmethod
    def sized(cls, expected: int, fpp: float = 0.01) -> "BloomFilter":
        expected = max(expected, 64)
        n_bits = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
        n_hashes = max(1, int(round(n_bits / expected * math.log(2))))
        return cls(n_bits, min(n_hashes, 12))

    def _hash_pair(self, key: str):
        d = hashlib.md5(key.encode("utf-8")).digest()
        return (int.from_bytes(d[:8], "little"),
                int.from_bytes(d[8:], "little") | 1)

    def add(self, key: str):
        h1, h2 = self._hash_pair(key)
        for i in range(self.n_hashes):
            bit = (h1 + i * h2) % self.n_bits
            self.bits[bit >> 3] |= 1 << (bit & 7)

    def might_contain(self, key: str) -> bool:
        h1, h2 = self._hash_pair(key)
        for i in range(self.n_hashes):
            bit = (h1 + i * h2) % self.n_bits
            if not (self.bits[bit >> 3] >> (bit & 7)) & 1:
                return False
        return True

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits
        self.bits = bytearray(a | b for a, b in zip(self.bits, other.bits))
        return self


def build_bloom(urls: DataFrame, expected: int | None = None,
                fpp: float = 0.01, depth: int = 3) -> BloomFilter:
    """treeAggregate partition-local Blooms into one (north_rule)."""
    if expected is None:
        expected = urls.count()
    proto = BloomFilter.sized(expected, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes

    def seq_op(acc: BloomFilter, row):
        acc.add(row[0])
        return acc

    def comb_op(a: BloomFilter, b: BloomFilter):
        return a.merge(b)

    return urls.rdd.treeAggregate(
        BloomFilter(n_bits, n_hashes), seq_op, comb_op, depth=depth)


def filter_new_urls(candidates: DataFrame, seen_urls: DataFrame,
                    bloom: BloomFilter | None) -> DataFrame:
    """Candidates not yet in the seen set.

    ``candidates`` and ``seen_urls`` must both expose a ``url`` column.  With
    a Bloom, only the possibly-seen slice pays the anti-join shuffle; the
    definitely-new slice flows straight through.
    """
    if bloom is None:
        return candidates.join(seen_urls.select("url"), "url", "left_anti")

    spark = candidates.sparkSession
    b = spark.sparkContext.broadcast(bloom)

    @F.pandas_udf("boolean")
    def maybe_seen(urls: pd.Series) -> pd.Series:
        f = b.value
        return urls.map(f.might_contain)

    tagged = candidates.withColumn("_maybe_seen", maybe_seen(F.col("url")))
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
