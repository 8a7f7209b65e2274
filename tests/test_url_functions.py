"""functions/url.py — canonicalization edge cases and plan shape."""

from pyspark.sql import functions as F

from new_ent_crawler_spark.functions import url as U


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in
            df.select(U.canonicalize_url("url")).collect()]


def test_canonicalize_cases(spark):
    got = _canon(spark, [
        "HTTP://Host1.Example.COM:80/a/b?b=2&a=1#frag",
        "https://h.com:443",
        "https://h.com?",
        "https://h.com/x?z=1&y=2&x=3",
        "ftp://X.Y:21/a",          # non-default scheme: port kept
        "  https://h.com/x  ",     # surrounding whitespace
        "notaurl",                 # malformed -> trimmed raw
        "http://h.com:8080/a",     # non-default port kept
    ])
    assert got == [
        "http://host1.example.com/a/b?a=1&b=2",
        "https://h.com/",
        "https://h.com/",
        "https://h.com/x?x=3&y=2&z=1",
        "ftp://x.y:21/a",
        "https://h.com/x",
        "notaurl",
        "http://h.com:8080/a",
    ]


def test_canonicalize_idempotent(spark):
    urls = ["HTTP://A.B:80/p?c=3&a=1#z", "https://h.com", "weird stuff"]
    once = _canon(spark, urls)
    twice = _canon(spark, once)
    assert once == twice


def test_surt_key(spark):
    df = spark.createDataFrame(
        [("https://Sub.Example.COM:443/a/b?z=1&a=2",),
         ("http://h.com",),
         ("http://h.com:8080/x",),   # port dropped from the sort key
         ("notaurl",)], "url string")
    got = [r[0] for r in df.select(U.surt_key("url")).collect()]
    assert got == ["com,example,sub)/a/b?a=2&z=1",
                   "com,h)/",
                   "com,h)/x",
                   None]   # non-URLs must not pollute the key space
    # SURT keys sort a domain's pages contiguously
    assert (sorted(["com,example,sub)/a", "com,example,sub)/b",
                    "com,other)/x"])[:2]
            == ["com,example,sub)/a", "com,example,sub)/b"])


def test_url_host(spark):
    df = spark.createDataFrame(
        [("HTTP://Host1.Example.COM:8080/a?q=1",), ("notaurl",)],
        "url string")
    got = [r[0] for r in df.select(U.url_host("url")).collect()]
    assert got == ["host1.example.com", ""]


def test_canonicalize_stays_jvm_side(spark):
    """No Python in the plan: the canonicalizer must whole-stage-codegen."""
    df = spark.range(100).select(
        F.concat(F.lit("https://h"), (F.col("id") % 5).cast("string"),
                 F.lit(".com/p?b=2&a=1")).alias("url"))
    txt = df.select(U.canonicalize_url("url"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in txt and "BatchEval" not in txt


def test_userinfo_stripped_from_host_and_surt(spark):
    df = spark.createDataFrame(
        [("https://user:pw@Example.COM:443/x?b=2&a=1",)], "url string")
    row = df.select(U.url_host("url").alias("h"),
                    U.surt_key("url").alias("s")).collect()[0]
    # credentials must not split politeness buckets or dodge robots lookups
    assert row["h"] == "example.com"
    assert row["s"] == "com,example)/x?a=1&b=2"
