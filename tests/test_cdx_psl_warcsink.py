"""CDX index builder, public-suffix registered domains, distributed WARC
sink — the Common-Crawl artifact surface around the crawl engine."""

import datetime
import gzip
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from new_ent_crawler_spark.functions import psl
from new_ent_crawler_spark.sources import cdx as cdxmod
from new_ent_crawler_spark.sources.warc import read_warc, write_warc_df


# ---------------------------------------------------------------------------
# public-suffix registered domain
# ---------------------------------------------------------------------------

PSL_CASES = [
    # host, public_suffix, registered_domain (publicsuffix.org algorithm
    # over the built-in rules subset)
    ("example.com", "com", "example.com"),
    ("a.b.example.com", "com", "example.com"),
    ("example.co.uk", "co.uk", "example.co.uk"),
    ("www.example.co.uk", "co.uk", "example.co.uk"),
    ("co.uk", "co.uk", None),                  # host IS a public suffix
    ("com", "com", None),
    ("example.nosuchtld", "nosuchtld", "example.nosuchtld"),  # implicit *
    ("nosuchtld", "nosuchtld", None),
    # wildcard *.kawasaki.jp: any one label under kawasaki.jp is a suffix
    ("foo.kawasaki.jp", "foo.kawasaki.jp", None),
    ("bar.foo.kawasaki.jp", "foo.kawasaki.jp", "bar.foo.kawasaki.jp"),
    # exception !city.kawasaki.jp beats the wildcard
    ("city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    ("x.city.kawasaki.jp", "kawasaki.jp", "city.kawasaki.jp"),
    # the spec's ck pair
    ("www.ck", "ck", "www.ck"),                # exception !www.ck
    ("foo.www.ck", "ck", "www.ck"),
    ("other.ck", "other.ck", None),            # wildcard *.ck
    ("shop.other.ck", "other.ck", "shop.other.ck"),
    # private-section style rule
    ("user.github.io", "github.io", "user.github.io"),
    ("deep.user.github.io", "github.io", "user.github.io"),
]


def test_registered_domain_cases(spark):
    df = spark.createDataFrame([(h,) for h, _, _ in PSL_CASES],
                               "host string")
    got = {r["host"]: (r["public_suffix"], r["registered_domain"])
           for r in psl.with_registered_domain(df).collect()}
    for host, ps, rd in PSL_CASES:
        assert got[host] == (ps, rd), host


def test_registered_domain_normalizes_case_and_fqdn_dot(spark):
    df = spark.createDataFrame(
        [("WWW.Example.COM",), ("example.co.uk.",)], "host string")
    got = {r["host"]: r["registered_domain"]
           for r in psl.with_registered_domain(df).collect()}
    assert got == {"WWW.Example.COM": "example.com",
                   "example.co.uk.": "example.co.uk"}


def test_registered_domain_preserves_rows_and_nulls(spark):
    df = spark.createDataFrame(
        [("a.com", 1), (None, 2), ("", 3), ("a.com", 4)],
        "host string, k int")
    out = psl.with_registered_domain(df).orderBy("k").collect()
    assert [r["k"] for r in out] == [1, 2, 3, 4]
    assert out[0]["registered_domain"] == "a.com"
    assert out[1]["registered_domain"] is None
    assert out[2]["registered_domain"] is None


def test_rules_join_is_broadcast(spark):
    df = spark.createDataFrame([("x.co.uk",)], "host string")
    plan = psl.with_registered_domain(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_domain_budgets_share_bucket(spark):
    """Open-web politeness: subdomains of one registered domain share one
    token bucket; the most-restrictive crawl_delay wins; a bare public
    suffix keeps its own bucket."""
    from new_ent_crawler_spark.operators.politeness import domain_budgets
    robots = spark.createDataFrame(
        [("a.example.com", 1.0), ("b.example.com", 4.0),
         ("example.com", 2.0), ("co.uk", 1.0)],
        "host string, crawl_delay double")
    budgets, host_map = domain_budgets(robots, per_wave_k=8)
    b = {r["host"]: r for r in budgets.collect()}
    assert set(b) == {"example.com", "co.uk"}
    # max(1,4,2)=4 → refill 8/4=2; bare suffix keeps its own: 8/1=8
    assert b["example.com"]["refill_rate"] == 2.0
    assert b["co.uk"]["refill_rate"] == 8.0
    m = {r["host"]: r["bucket"] for r in host_map.collect()}
    assert m == {"a.example.com": "example.com",
                 "b.example.com": "example.com",
                 "example.com": "example.com", "co.uk": "co.uk"}


# ---------------------------------------------------------------------------
# CDX index
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def pages_df(spark):
    base = datetime.datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        Row(url=f"https://h{i % 3}.example.com/p/{i}",
            warc_ts=base + datetime.timedelta(minutes=i),
            html=f"<html>page {i}</html>".encode(),
            text=f"page {i}", lang="en")
        for i in range(30)
    ]
    return spark.createDataFrame(rows)


def test_build_cdx_shape_and_digest(spark, pages_df):
    import hashlib
    got = {r["url"]: r for r in cdxmod.build_cdx(pages_df).collect()}
    assert len(got) == 30
    r = got["https://h1.example.com/p/1"]
    assert r["surt"] == "com,example,h1)/p/1"
    # createDataFrame converts naive python datetimes in the HOST tz (UTC
    # in this sandbox), so the stored instant is 12:01 UTC; the CDX
    # timestamp renders that instant as UTC regardless of the session's
    # Asia/Shanghai display timezone
    assert r["ts14"] == "20260301120100"
    assert r["digest"] == hashlib.sha256(b"<html>page 1</html>").hexdigest()
    assert r["length"] == len(b"<html>page 1</html>")


def test_cdx_write_sorted_and_prefix_pruned(spark, pages_df, tmp_path):
    path = str(tmp_path / "cdx")
    cdxmod.write_cdx(cdxmod.build_cdx(pages_df), path, num_files=4)
    stored = spark.read.parquet(path)
    hits = cdxmod.cdx_prefix_lookup(stored, "com,example,h1)/").collect()
    assert len(hits) == 10
    assert all(h["surt"].startswith("com,example,h1)/") for h in hits)
    # each file owns a disjoint surt range (range-partitioned layout)
    import pyarrow.parquet as pq
    ranges = []
    for f in sorted(os.listdir(path)):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(path, f), columns=["surt"])
            if t.num_rows:
                col = t.column("surt").to_pylist()
                assert col == sorted(col)  # sorted within file
                ranges.append((col[0], col[-1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo


def test_classify_revisits(spark):
    """new / revisit / changed per capture; prev_ts14 references the
    LATEST previous capture and only on revisit rows."""
    prev = spark.createDataFrame(
        [("u1", "20260101000000", "d1"),
         ("u1", "20260102000000", "d2"),   # latest u1 capture
         ("u2", "20260101000000", "dx")],
        "url string, ts14 string, digest string")
    new = spark.createDataFrame(
        [("u1", "20260301000000", "d2"),   # == latest prev -> revisit
         ("u1", "20260301000001", "d1"),   # == OLDER prev -> changed
         ("u2", "20260301000000", "dy"),   # differs -> changed
         ("u3", "20260301000000", "dz")],  # never seen -> new
        "url string, ts14 string, digest string")
    got = {(r["url"], r["ts14"]): (r["status"], r["prev_ts14"])
           for r in cdxmod.classify_revisits(new, prev).collect()}
    assert got[("u1", "20260301000000")] == ("revisit", "20260102000000")
    assert got[("u1", "20260301000001")] == ("changed", None)
    assert got[("u2", "20260301000000")] == ("changed", None)
    assert got[("u3", "20260301000000")] == ("new", None)


def test_cdxj_lines_render(spark, pages_df):
    line = cdxmod.to_cdxj_lines(cdxmod.build_cdx(pages_df)) \
        .orderBy("value").first()["value"]
    surt, ts14, payload = line.split(" ", 2)
    assert surt.startswith("com,example,h0)/")
    assert len(ts14) == 14 and ts14.isdigit()
    import json
    d = json.loads(payload)
    assert set(d) == {"url", "digest", "length"}


# ---------------------------------------------------------------------------
# distributed WARC sink
# ---------------------------------------------------------------------------

def test_warc_sink_roundtrip(spark, pages_df, tmp_path):
    out = str(tmp_path / "warcs")
    manifest = write_warc_df(pages_df, out, num_segments=3).collect()
    assert sum(m["n_records"] for m in manifest) == 30
    assert 1 <= len(manifest) <= 3
    for m in manifest:
        assert m["segment"].endswith(".warc.gz")
        assert os.path.getsize(m["segment"]) > 0

    back = read_warc(spark, out + "/*.warc.gz")
    orig = {r["url"]: r for r in pages_df.collect()}
    got = {r["url"]: r for r in back.collect()}
    assert set(got) == set(orig)
    for url, r in got.items():
        assert bytes(r["html"]) == bytes(orig[url]["html"])
        assert r["warc_ts"] == orig[url]["warc_ts"]  # instant round-trips


def test_warc_sink_segments_are_url_ranges(spark, pages_df, tmp_path):
    """Range partitioning: each segment owns a contiguous URL range."""
    out = str(tmp_path / "warcs2")
    write_warc_df(pages_df, out, num_segments=3, compress=False).collect()
    from new_ent_crawler_spark.sources.warc import parse_warc_bytes
    ranges = []
    for f in sorted(os.listdir(out)):
        urls = [rec["url"] for rec in parse_warc_bytes(
            open(os.path.join(out, f), "rb").read())]
        assert urls == sorted(urls)
        ranges.append((urls[0], urls[-1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo


def test_warc_sink_empty_partitions_write_nothing(spark, tmp_path):
    pages = spark.createDataFrame(
        [Row(url="https://a.com/x",
             warc_ts=datetime.datetime(2026, 1, 1, 0, 0, 0),
             html=b"<html>x</html>", text="x", lang="en")])
    out = str(tmp_path / "warcs3")
    manifest = write_warc_df(pages, out, num_segments=8).collect()
    assert sum(m["n_records"] for m in manifest) == 1
    files = [f for f in os.listdir(out) if f.endswith(".warc.gz")]
    assert len(files) == len(manifest)  # no empty segment files
