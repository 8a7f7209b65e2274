"""WARC source round-trip + multi-format connector round-trips."""

import pytest
from pyspark.sql import functions as F

from new_ent_crawler_spark.sources import connectors, warc


PAGES = [
    {"url": "http://h1.example/a", "warc_date": "2024-01-05T10:00:00Z",
     "html": b"<html><body>alpha \xe4\xbc\x81\xe4\xb8\x9a</body></html>"},
    {"url": "http://h1.example/b", "warc_date": "2024-01-05T10:01:00Z",
     "html": (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
              b"<html><body>beta</body></html>")},
    {"url": "http://h2.example/c", "warc_date": "2024-01-06T09:30:00Z",
     "html": b"<html><body>gamma</body></html>"},
]


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip(spark, tmp_path, compress):
    ext = "warc.gz" if compress else "warc"
    warc.write_warc(PAGES[:2], str(tmp_path / f"seg1.{ext}"),
                    compress=compress)
    warc.write_warc(PAGES[2:], str(tmp_path / f"seg2.{ext}"),
                    compress=compress)
    df = warc.read_warc(spark, str(tmp_path) + f"/*.{ext}") \
        .withColumn("epoch_s", F.unix_timestamp("warc_ts"))
    rows = {r.url: r for r in df.collect()}
    assert len(rows) == 3
    # http envelope stripped, raw body kept byte-exact (incl. utf-8 CJK)
    assert bytes(rows["http://h1.example/a"].html) == PAGES[0]["html"]
    assert bytes(rows["http://h1.example/b"].html) \
        == b"<html><body>beta</body></html>"
    assert rows["http://h1.example/a"].text.endswith("企业</body></html>")
    # 2024-01-06T09:30:00Z as an absolute instant, tz-independent
    assert rows["http://h2.example/c"].epoch_s == 1704533400


def test_warc_record_walk_ignores_non_response(tmp_path):
    blob = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\n"
            b"meta\r\n\r\n"
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: http://x/\r\n"
            b"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: 2\r\n\r\n"
            b"ok\r\n\r\n")
    recs = list(warc.parse_warc_bytes(blob))
    assert len(recs) == 1 and recs[0]["url"] == "http://x/"
    assert recs[0]["html"] == b"ok"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_connector_roundtrip(spark, tmp_path, fmt):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)],
        "id long, grp string, v double")
    path = str(tmp_path / fmt)
    connectors.write_table(df, path, fmt=fmt, partition_by=["grp"])
    back = connectors.read_table(
        spark, path, fmt=fmt, schema="id long, v double, grp string")
    got = sorted((r.id, r.grp, float(r.v)) for r in back.collect())
    assert got == [(1, "a", 1.5), (2, "b", 2.5), (3, "a", 3.5)]


def test_connector_refuses_schemaless_text_formats(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        connectors.read_table(spark, str(tmp_path), fmt="json")


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(100).withColumn(
        "grp", (F.col("id") % 4).cast("string"))
    path = str(tmp_path / "p")
    connectors.write_table(df, path, partition_by=["grp"])
    back = connectors.read_table(spark, path).filter("grp = '1'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert back.count() == 25
    # partition filter reaches the scan: only one of 4 dirs read
    assert "PartitionFilters: [isnotnull(grp" in plan, plan


# -- sitemap source ----------------------------------------------------------

_SM_NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

_SITEMAP_A = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {_SM_NS}>
  <url><loc>https://a.example/page1</loc><lastmod>2026-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.9</priority></url>
  <url><loc>https://a.example/page2</loc><priority>0.2</priority></url>
  <url><loc>https://a.example/page3</loc></url>
</urlset>"""

# namespace-less producer (common in the wild)
_SITEMAP_B = """<?xml version="1.0"?>
<urlset>
  <url><loc>https://b.example/only</loc></url>
</urlset>"""

_SITEMAP_IDX = f"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex {_SM_NS}>
  <sitemap><loc>https://a.example/sitemap-a.xml</loc>
           <lastmod>2026-02-03</lastmod></sitemap>
  <sitemap><loc>https://b.example/sitemap-b.xml.gz</loc></sitemap>
</sitemapindex>"""


def _write_sitemaps(tmp_path):
    import gzip as _gz
    (tmp_path / "a.xml").write_text(_SITEMAP_A)
    (tmp_path / "b.xml.gz").write_bytes(_gz.compress(_SITEMAP_B.encode()))
    (tmp_path / "idx.xml").write_text(_SITEMAP_IDX)
    (tmp_path / "broken.xml").write_text("<urlset><url><loc>unclosed")
    (tmp_path / "notsm.xml").write_text("<rss></rss>")


def test_sitemap_read(spark, tmp_path):
    from new_ent_crawler_spark.sources import sitemap as SM
    _write_sitemaps(tmp_path)
    df = SM.read_sitemaps(spark, str(tmp_path) + "/*.xml*")
    rows = {(r["kind"], r["url"]): r for r in df.collect()}
    # 4 url rows (3 namespaced + 1 gz namespace-less) + 2 index pointers;
    # broken/non-sitemap files contribute nothing
    assert len(rows) == 6
    a1 = rows[("url", "https://a.example/page1")]
    assert (a1["lastmod"], a1["changefreq"], a1["priority"]) == (
        "2026-01-02", "daily", 0.9)
    assert rows[("url", "https://a.example/page3")]["priority"] is None
    assert ("url", "https://b.example/only") in rows
    idx = rows[("sitemap", "https://a.example/sitemap-a.xml")]
    assert idx["lastmod"] == "2026-02-03"


def test_sitemap_seeds_feed_frontier(spark, tmp_path):
    from new_ent_crawler_spark.operators import frontier as FR
    from new_ent_crawler_spark.sources import sitemap as SM
    _write_sitemaps(tmp_path)
    entries = SM.read_sitemaps(spark, str(tmp_path) + "/*.xml*")
    seeds = SM.seeds_from_sitemap(entries, default_priority=1)
    got = {r["seed_url"]: r for r in seeds.collect()}
    assert len(got) == 4  # index pointers are not page seeds
    assert got["https://a.example/page1"]["priority"] == 2   # 0.9 lane
    assert got["https://a.example/page2"]["priority"] == 1   # 0.2 lane
    assert got["https://a.example/page3"]["priority"] == 2   # 0.5 default
    assert got["https://b.example/only"]["host"] == "b.example"
    # deterministic ids: re-read numbers identically
    again = {r["seed_url"]: r["seed_id"] for r in
             SM.seeds_from_sitemap(entries).collect()}
    assert all(got[u]["seed_id"] == again[u] for u in got)
    # and the frontier accepts the schema
    fr = FR.init_frontier(seeds)
    assert fr.count() == 4
    assert {r["status"] for r in fr.select("status").collect()} == {0}


def test_robots_sitemap_directive(spark):
    from new_ent_crawler_spark.sources.sitemap import robots_sitemap_urls
    body = ("User-agent: *\nDisallow: /private\n"
            "Sitemap: https://h.example/sitemap.xml\n"
            "sitemap:https://h.example/other.xml.gz\n"
            "# Sitemap: commented out is still matched-free\n")
    df = spark.createDataFrame([(body,), ("User-agent: *\n",)],
                               "robots string")
    got = [r[0] for r in df.select(robots_sitemap_urls("robots")).collect()]
    assert got[0] == ["https://h.example/sitemap.xml",
                      "https://h.example/other.xml.gz"]
    assert got[1] == []


def test_sitemap_bad_gzip_and_bad_priority_tolerated(spark, tmp_path):
    import gzip as _gz
    from new_ent_crawler_spark.sources import sitemap as SM
    # bit-flipped deflate body: zlib.error must skip the file, not the job
    blob = bytearray(_gz.compress(_SITEMAP_B.encode()))
    blob[len(blob) // 2] ^= 0xFF
    (tmp_path / "corrupt.xml.gz").write_bytes(bytes(blob))
    # a non-numeric priority must not drop the file's other urls
    (tmp_path / "badprio.xml").write_text(
        f"""<urlset {_SM_NS}>
        <url><loc>https://c.example/1</loc></url>
        <url><loc>https://c.example/2</loc><priority>high</priority></url>
        <url><loc>https://c.example/3</loc></url>
        </urlset>""")
    df = SM.read_sitemaps(spark, str(tmp_path) + "/*.xml*")
    urls = {r["url"]: r["priority"] for r in df.collect()}
    assert set(urls) == {"https://c.example/1", "https://c.example/2",
                         "https://c.example/3"}
    assert urls["https://c.example/2"] is None


def test_sitemap_duplicate_url_seeds_once(spark):
    from new_ent_crawler_spark.sources import sitemap as SM
    entries = spark.createDataFrame(
        [("url", "https://h/p", None, None, 0.2, "a.xml"),
         ("url", "https://h/p", None, None, 0.8, "b.xml"),
         ("url", "https://h/q", None, None, None, "a.xml")],
        "kind string, url string, lastmod string, changefreq string, "
        "priority double, source_file string")
    seeds = {r["seed_url"]: r for r in
             SM.seeds_from_sitemap(entries, default_priority=1).collect()}
    assert len(seeds) == 2  # one row per url, never a double-seed
    assert seeds["https://h/p"]["priority"] == 2  # max priority wins
    assert seeds["https://h/q"]["priority"] == 2  # spec default 0.5


def test_robots_sitemap_directive_crlf_and_comments(spark):
    from new_ent_crawler_spark.sources.sitemap import robots_sitemap_urls
    body = ("User-agent: *\r\nSitemap: https://h/s.xml\r\n"
            "Sitemap: https://h/t.xml # primary\r\n")
    got = spark.createDataFrame([(body,)], "robots string").select(
        robots_sitemap_urls("robots")).collect()[0][0]
    assert got == ["https://h/s.xml", "https://h/t.xml"]
