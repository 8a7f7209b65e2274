"""robots.txt parser (RFC 9309 semantics) and the politeness bridge."""

from pyspark.sql import functions as F

from new_ent_crawler_spark.sources import robots as RB

BODY = """
# corp registry robots
User-agent: SlowBot
User-agent: OtherBot
Disallow: /
Crawl-delay: 10

User-agent: *
Disallow: /private/
Disallow: /*.php$
Allow: /private/public-report
Crawl-delay: 2

Sitemap: https://h.example/sitemap.xml
"""


def test_group_selection_longest_agent_match():
    star = RB.parse_robots_txt(BODY, agent="MyCrawler/1.0")
    assert star["disallow"] == ["/private/", "/*.php$"]
    assert star["crawl_delay"] == 2.0
    slow = RB.parse_robots_txt(BODY, agent="slowbot/2.1")
    assert slow["disallow"] == ["/"] and slow["crawl_delay"] == 10.0
    # sitemaps are group-independent
    assert star["sitemaps"] == slow["sitemaps"] == [
        "https://h.example/sitemap.xml"]


def test_longest_match_wins_and_allow_breaks_ties():
    allow, dis = ["/private/public-report"], ["/private/", "/*.php$"]
    assert RB.is_allowed("/", allow, dis)
    assert not RB.is_allowed("/private/x", allow, dis)
    assert RB.is_allowed("/private/public-report-2026", allow, dis)
    assert not RB.is_allowed("/index.php", allow, dis)
    assert RB.is_allowed("/index.php5", allow, dis)  # $ anchors the end
    # octet-length tie: Allow wins (RFC 9309 §2.2.2)
    assert RB.is_allowed("/page", ["/page"], ["/page"])
    # no matching rule -> allowed
    assert RB.is_allowed("/other", allow, dis)


def test_wildcard_spans():
    assert not RB.is_allowed("/a/deep/tmp/file", [], ["/a/*/tmp/"])
    assert RB.is_allowed("/a/tmpfile", [], ["/a/*/tmp/"])


def test_malformed_lines_skipped():
    r = RB.parse_robots_txt(
        "Disallow: /orphan\nUser-agent: *\nnonsense line\n"
        "Crawl-delay: soon\nDisallow: /ok\n")
    # rules before any User-agent group are dropped; bad delay ignored
    assert r["disallow"] == ["/ok"] and r["crawl_delay"] is None


def test_rules_from_bodies_feeds_politeness(spark):
    from new_ent_crawler_spark.operators.politeness import init_budgets
    df = spark.createDataFrame(
        [("h1.example", BODY), ("h2.example", ""), ("h3.example", None)],
        "host string, body string")
    rules = RB.rules_from_bodies(df)
    got = {r["host"]: r for r in rules.collect()}
    assert got["h1.example"]["crawl_delay"] == 2.0
    assert got["h1.example"]["disallow"] == ["/private/", "/*.php$"]
    assert got["h2.example"]["disallow"] == []
    assert got["h3.example"]["crawl_delay"] is None
    budgets = {r["host"]: r["refill_rate"]
               for r in init_budgets(rules, per_wave_k=10).collect()}
    assert budgets["h1.example"] == 5.0   # 10 / delay 2
    assert budgets["h2.example"] == 10.0  # no delay -> full rate


def test_filter_allowed(spark):
    rules = RB.rules_from_bodies(spark.createDataFrame(
        [("h1.example", BODY)], "host string, body string"))
    urls = spark.createDataFrame(
        [("https://h1.example/private/x", 1),
         ("https://h1.example/private/public-report", 2),
         ("https://h1.example/ok.html", 3),
         ("https://h1.example/run.php", 4),
         ("https://norules.example/private/x", 5)],
        "url string, tag int")
    got = sorted(r["tag"] for r in RB.filter_allowed(urls, rules).collect())
    # disallowed: /private/x (rule /private/), /run.php ($-anchored);
    # allowed: the Allow override, a plain page, and the no-robots host
    assert got == [2, 3, 5]
    # schema and columns survive the round trip
    assert RB.filter_allowed(urls, rules).columns == ["url", "tag"]


def test_groups_with_same_agent_merge():
    """RFC 9309 §2.2.1: multiple matching groups MUST merge (CDN/plugin
    concatenation commonly produces several 'User-agent: *' groups)."""
    body = ("User-agent: *\nDisallow: /a\nCrawl-delay: 3\n\n"
            "User-agent: *\nDisallow: /b\nCrawl-delay: 7\n")
    r = RB.parse_robots_txt(body)
    assert r["disallow"] == ["/a", "/b"]
    assert r["crawl_delay"] == 7.0  # most conservative across groups
    assert not RB.is_allowed("/b/x", r["allow"], r["disallow"])
    # a more specific group is NOT merged with the * fallback
    body2 = ("User-agent: specialbot\nDisallow: /s\n\n"
             "User-agent: *\nDisallow: /g\n")
    assert RB.parse_robots_txt(body2, "SpecialBot")["disallow"] == ["/s"]
