"""robots.txt parsing (RFC 9309 semantics) → the engine's politeness tables.

The wave engine consumes a pre-parsed robots table ``(host, disallow,
crawl_delay)`` (synth/webgen.py:10; operators/politeness.py::init_budgets);
this module is the missing bridge from FETCHED robots.txt bytes to that
table, so a crawl can bootstrap politeness from the live web instead of a
curated table:

* :func:`parse_robots_txt` — group-based parse: consecutive ``User-agent``
  lines open a group; ALL groups matching the agent at the most-specific
  level (longest case-insensitive product-token match, ``*`` as fallback)
  are MERGED per RFC 9309 §2.2.1, with the most conservative Crawl-delay
  winning.  Extracts Allow/Disallow rules, Crawl-delay (de-facto
  extension), and Sitemap lines (which are group-independent).
* :func:`is_allowed` — longest-match-wins between Allow and Disallow with
  RFC wildcard semantics (``*`` any-span, ``$`` end anchor); Allow wins
  length ties; no match ⇒ allowed.
* :func:`rules_from_bodies` — Arrow ``mapInPandas`` over ``(host, body)``
  rows producing the politeness schema ``(host, allow, disallow,
  crawl_delay)`` — O(hosts) rows, the table the north_star broadcasts per
  executor.
* :func:`filter_allowed` — prune a URL frame against those rules: rules
  broadcast-join by host (O(hosts) ≪ O(urls)), then one vectorized Arrow
  stage applies the longest-match check per URL.  URLs for hosts with no
  robots row pass (no robots.txt ⇒ no restrictions).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = ("host string, allow array<string>, disallow array<string>, "
                "crawl_delay double")


def parse_robots_txt(body: str, agent: str = "*") -> dict:
    """Parse one robots.txt body for ``agent``.

    Returns ``{"allow": [...], "disallow": [...], "crawl_delay":
    float|None, "sitemaps": [...]}``.  Group selection: the longest
    case-insensitive ``User-agent`` substring match of ``agent`` sets the
    specificity level (``*`` = fallback level), and every group AT that
    level merges (RFC 9309 §2.2.1 MUST-merge).  Unparseable lines are
    skipped (robots.txt in the wild is full of them)."""
    agent_l = agent.lower()
    groups: list[dict] = []  # {agents: [..], allow: [], disallow: [], cd}
    cur: dict | None = None
    in_agent_run = False
    sitemaps: list[str] = []
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)
            continue
        if key == "user-agent":
            if not in_agent_run:
                cur = {"agents": [], "allow": [], "disallow": [],
                       "crawl_delay": None}
                groups.append(cur)
                in_agent_run = True
            cur["agents"].append(val.lower())
            continue
        in_agent_run = False
        if cur is None:
            continue  # rules before any User-agent line: no group, skipped
        if key == "allow":
            if val:
                cur["allow"].append(val)
        elif key == "disallow":
            if val:
                cur["disallow"].append(val)
        elif key == "crawl-delay":
            try:
                cur["crawl_delay"] = float(val)
            except ValueError:
                pass

    def match_len(g) -> int:
        best = -1
        for a in g["agents"]:
            if a == "*":
                best = max(best, 0)
            elif a and a in agent_l:
                best = max(best, len(a))
        return best

    # RFC 9309 §2.2.1: when multiple groups match the agent at the same
    # (most-specific) level, their rules MUST be merged — real robots.txt
    # files often carry several groups for the same token (CDN/plugin
    # concatenation), and taking only one would drop live Disallow rules
    best_len = max((match_len(g) for g in groups), default=-1)
    if best_len < 0:
        return {"allow": [], "disallow": [], "crawl_delay": None,
                "sitemaps": sitemaps}
    allow: list[str] = []
    disallow: list[str] = []
    crawl_delay = None
    for g in groups:
        if match_len(g) != best_len:
            continue
        allow += g["allow"]
        disallow += g["disallow"]
        if g["crawl_delay"] is not None:
            # most conservative politeness wins across merged groups
            crawl_delay = (g["crawl_delay"] if crawl_delay is None
                           else max(crawl_delay, g["crawl_delay"]))
    return {"allow": allow, "disallow": disallow,
            "crawl_delay": crawl_delay, "sitemaps": sitemaps}


def _rule_regex(rule: str) -> re.Pattern:
    """RFC 9309 rule → anchored regex: ``*`` spans anything, a trailing
    ``$`` anchors the end, everything else is literal."""
    anchored = rule.endswith("$")
    if anchored:
        rule = rule[:-1]
    pat = ".*".join(re.escape(part) for part in rule.split("*"))
    return re.compile("^" + pat + ("$" if anchored else ""))


def is_allowed(path: str, allow: list, disallow: list) -> bool:
    """Longest-match-wins across both rule lists; Allow wins ties; no
    matching rule ⇒ allowed (RFC 9309 §2.2.2)."""
    best_len, verdict = -1, True
    for rules, verd in ((allow, True), (disallow, False)):
        for r in rules:
            if not r:
                continue
            if _rule_regex(r).match(path):
                # '$'-anchored rules count the anchor toward specificity,
                # matching the RFC's octet-length precedence
                ln = len(r)
                if ln > best_len or (ln == best_len and verd):
                    best_len, verdict = ln, verd
    return verdict


def rules_from_bodies(robots_txt: DataFrame, agent: str = "*") -> DataFrame:
    """``(host, body)`` rows → the politeness rules table
    ``(host, allow, disallow, crawl_delay)``.  One Arrow stage; O(hosts)
    output, broadcastable.  Feed ``.drop("allow")`` straight to
    operators/politeness.py::init_budgets (which wants host+crawl_delay)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf["host"], pdf["body"]):
                r = parse_robots_txt(body or "", agent)
                rows.append((host, r["allow"], r["disallow"],
                             r["crawl_delay"]))
            yield pd.DataFrame(rows, columns=["host", "allow", "disallow",
                                              "crawl_delay"])

    return robots_txt.select("host", "body").mapInPandas(run, RULES_SCHEMA)


def filter_allowed(urls: DataFrame, rules: DataFrame,
                   url_col: str = "url") -> DataFrame:
    """Drop URLs a host's robots rules disallow.

    The rules frame is O(hosts) — broadcast-joined on host — and the
    longest-match check runs once per URL in a vectorized Arrow stage.
    URLs whose host has no rules row (left join ⇒ nulls) pass through:
    absent robots.txt means no restrictions."""
    from ..functions.url import url_host

    in_cols = urls.columns
    with_host = urls.withColumn("_rb_host", url_host(F.col(url_col)))
    joined = with_host.join(
        F.broadcast(rules.select(F.col("host").alias("_rb_host"),
                                 F.col("allow").alias("_rb_allow"),
                                 F.col("disallow").alias("_rb_dis"))),
        "_rb_host", "left")

    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in joined.schema.fields if not f.name.startswith("_rb_"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # precompile each distinct rule once per worker: re's global
        # 512-pattern cache thrashes when the broadcast rules exceed it,
        # turning the hot loop into repeated sre compilation
        compiled: dict[str, re.Pattern] = {}

        def rx(rule: str) -> re.Pattern:
            pat = compiled.get(rule)
            if pat is None:
                pat = compiled[rule] = _rule_regex(rule)
            return pat

        def allowed(path, al, dis) -> bool:
            best_len, verdict = -1, True
            for rules, verd in ((al, True), (dis, False)):
                for r in rules:
                    if r and rx(r).match(path):
                        ln = len(r)
                        if ln > best_len or (ln == best_len and verd):
                            best_len, verdict = ln, verd
            return verdict

        for pdf in batches:
            keep = []
            for i, (u, al, dis) in enumerate(zip(
                    pdf[url_col], pdf["_rb_allow"], pdf["_rb_dis"])):
                if dis is None or len(dis) == 0:
                    keep.append(i)
                    continue
                m = re.match(r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", str(u))
                path = str(u)[m.end():] or "/" if m else str(u)
                if allowed(path, list(al or []), list(dis)):
                    keep.append(i)
            yield pdf.iloc[keep].drop(
                columns=[c for c in pdf.columns if c.startswith("_rb_")])

    return joined.mapInPandas(run, out_schema).select(*in_cols)
