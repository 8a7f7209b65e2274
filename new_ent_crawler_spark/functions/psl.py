"""Public-suffix registered-domain extraction (publicsuffix.org algorithm).

A web-scale crawl buckets politeness, dedup scopes, and link-graph
aggregation by *registrable domain* (``example.co.uk``), not by raw host —
otherwise every subdomain of a large site gets its own politeness budget
and the link graph fragments.  The reference crawler never needs this (it
crawls one government registry domain, utils/Config.py), but a
Common-Crawl-style frontier does; Common Crawl itself publishes per-
registered-domain rollups keyed exactly this way.

Algorithm (the published publicsuffix.org/list spec):

* a rule matches a host if the host's trailing labels equal the rule's
  labels, with ``*`` matching exactly one label;
* if any *exception* rule (``!city.kawasaki.jp``) matches, the public
  suffix is that rule minus its leftmost label;
* otherwise the prevailing rule is the matching rule with the MOST
  labels (wildcard rules count the ``*``); no match → the implicit
  ``*`` rule (public suffix = rightmost label);
* registered domain = public suffix + one more label; NULL when the
  host IS a public suffix (nothing registrable).

Spark-first plan shape: hosts are split into label arrays, the trailing
k-label suffixes (k ≤ max rule depth) are exploded, and a **broadcast**
join against the tiny rules dim finds matches — one narrow shuffle for
the per-host argmax, no Python anywhere.  The rules table here is a
deterministic built-in subset of the PSL (the full list is ~15k rules;
swapping in the full file is a data change, not a code change).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Built-in PSL subset: representative ICANN rules plus the spec's own
# wildcard/exception teaching examples (kawasaki.jp, ck).  Format is the
# published PSL line format.
PSL_RULES = [
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "dev", "app", "info", "biz", "xyz",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "jp", "co.jp", "ne.jp", "or.jp", "ac.jp",
    "*.kawasaki.jp", "!city.kawasaki.jp",
    "cn", "com.cn", "org.cn", "gov.cn",
    "au", "com.au", "org.au",
    "de", "fr", "nl", "ru", "br", "com.br",
    "*.ck", "!www.ck",
    # private-section style rules (same algorithm)
    "github.io", "blogspot.com", "s3.amazonaws.com",
]

MAX_RULE_LABELS = max(r.lstrip("!").count(".") + 1 for r in PSL_RULES)


def parse_rules(rules: list[str] | None = None) -> list[tuple]:
    """(match_key, key_labels, is_wildcard, is_exception) per rule.

    ``match_key`` is the rule with any leading ``!`` or ``*.`` stripped —
    the literal trailing-label string a host suffix must equal.  For a
    wildcard rule the ``*`` consumes one EXTRA host label beyond the key.
    """
    out = []
    for r in rules if rules is not None else PSL_RULES:
        is_exc = r.startswith("!")
        body = r[1:] if is_exc else r
        is_wild = body.startswith("*.")
        key = body[2:] if is_wild else body
        out.append((key, key.count(".") + 1, is_wild, is_exc))
    return out


def rules_df(spark: SparkSession, rules: list[str] | None = None) -> DataFrame:
    return spark.createDataFrame(
        parse_rules(rules),
        "key string, keyn int, is_wild boolean, is_exc boolean")


def with_registered_domain(df: DataFrame, host_col: str = "host",
                           rules: list[str] | None = None) -> DataFrame:
    """Add ``public_suffix`` and ``registered_domain`` columns.

    Plan: project (host, labels, n) → explode trailing suffixes of depth
    1..min(n, max_rule_depth) → broadcast-join the rules dim → per-host
    aggregate picking exception > longest normal/wildcard > implicit ``*``.
    Distinct hosts only are pushed through the explode+join, then joined
    back (broadcast-eligible when the host dim is small; at crawl scale
    the host dim is ≪ the page count so this is the cheap side).
    """
    spark = df.sparkSession
    rdim = F.broadcast(rules_df(spark, rules))
    k_max = (max(r[1] for r in parse_rules(rules)) + 1
             if rules is not None else MAX_RULE_LABELS + 1)

    hosts = df.select(F.col(host_col).alias("_h")).where(
        F.col("_h").isNotNull() & (F.col("_h") != "")).distinct()
    # normalize the matching key the way the PSL spec expects hostnames:
    # case-insensitive labels, FQDN trailing dot ignored (the output
    # public_suffix/registered_domain columns are in normalized form)
    norm = F.lower(F.regexp_replace("_h", r"\.+$", ""))
    lab = hosts.select(
        "_h", F.split(norm, r"\.").alias("ls")
    ).select("_h", "ls", F.size("ls").alias("n"))

    # trailing k-label suffix strings, k = 1..min(n, k_max); slice() with a
    # negative start takes the LAST k elements
    cand = lab.select(
        "_h", "ls", "n",
        F.explode(F.sequence(F.lit(1), F.least("n", F.lit(k_max))))
        .alias("k"),
    ).select(
        "_h", "n", "k",
        F.array_join(F.slice("ls", F.col("k") * -1, F.col("k")), ".")
        .alias("suf"))

    m = cand.join(rdim, cand.suf == rdim.key, "left")
    ps = m.groupBy("_h", "n").agg(
        F.max(F.when(F.col("is_exc"), F.col("keyn") - 1)).alias("exc_ps"),
        F.max(
            F.when(~F.col("is_exc") & ~F.col("is_wild"), F.col("keyn"))
            .when(~F.col("is_exc") & F.col("is_wild")
                  & (F.col("n") >= F.col("keyn") + 1), F.col("keyn") + 1)
        ).alias("norm_ps"),
    ).select(
        "_h", "n",
        F.coalesce("exc_ps", "norm_ps", F.lit(1)).alias("psn"))

    res = ps.join(lab.select("_h", "ls"), "_h").select(
        "_h",
        F.array_join(F.slice("ls", F.col("psn") * -1, F.col("psn")), ".")
        .alias("public_suffix"),
        F.when(F.col("n") > F.col("psn"),
               F.array_join(F.slice("ls", (F.col("psn") + 1) * -1,
                                    F.col("psn") + 1), "."))
        .alias("registered_domain"))

    # join-back strategy is left to Catalyst/AQE: at test scale the host
    # dim broadcasts itself; at 10^8-host web scale it exceeds broadcast
    # size and AQE plans a shuffled hash join on the host key instead
    return df.join(res, df[host_col] == res._h, "left").drop("_h")
