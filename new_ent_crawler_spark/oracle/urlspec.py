"""URL grammar of the simulated registry web + per-URL extraction dispatch.

The engine's unit of work is a URL.  This module is the single source of
truth for three pure functions shared by the synthetic-web generator, the
single-threaded reference simulator, and the Spark Arrow UDFs:

* ``classify(url)``        -> (kind, detail) page classification
* ``extract_url_text``     -> the golden extracted text for one page (the
                              byte-identity invariant per BASELINE.json
                              ``input_hint``)
* ``discover_links``       -> out-links (pagination pages, section endpoints,
                              mortgage/report children) with page-type scores

URL layout (all company detail URLs are host-relative, mirroring the
reference where section links are harvested from ``var xxxUrl = "/..."``
script variables, parser/DetaiParser.py:1039-1053):

    http://{host}/search/{seed_id}.html                  search listing
    http://{host}/company/{cid}.html                     company main page
    /corp-query-entprise-info-{slug}-{cid}.html          section endpoint
    /corp-query-entprise-info-{slug}-{cid}.html?start=N  pagination page
    /corp-query-entprise-info-{child-stem}{id}.html      mortgage/report child
"""

from __future__ import annotations

import json
import re

from . import entities as E
from . import extract as X

# page-type scores: listing before detail (BASELINE.json north_star; the
# reference fetches the listing at worker/worker.py:190 before the detail
# crawl at :225).
SCORE_LISTING = 3
SCORE_MAIN = 2
SCORE_SECTION = 1
SCORE_CHILD = 0

# Section endpoints harvested from the main page, in the order the reference
# requests them (parser/DetaiParser.py:94-183).  var name -> (slug, kind,
# model, modelname for graph page-sizing).
SECTIONS = {
    "alterInfoUrl": ("alterInfo", "extract", E.BUS_CHANGE, ""),
    "entBusExcepUrl": ("entBusExcep", "extract", E.BUS_ABNORMAL, ""),
    "insPunishmentinfoUrl": ("insPunishmentinfo", "extract", E.ENT_PUNISH, ""),
    "anCheYearInfo": ("anCheYearInfo", "report_head", E.REP_HEAD, ""),
    "shareholderUrl": ("shareholder", "invest_bus", None, ""),
    "keyPersonUrl": ("keyPerson", "graph", E.BUS_MEMBER, "bus主要人员信息"),
    "branchUrl": ("branch", "graph", E.BUS_BRANCH, "bus分支机构信息"),
    "mortRegInfoUrl": ("mortRegInfo", "mortgage", E.BUS_MORTGAGE, ""),
    "stakQualitInfoUrl": ("stakQualitInfo", "extract", E.BUS_PLEDGE, ""),
    "spotCheckInfoUrl": ("spotCheckInfo", "extract", E.BUS_SPOT_CHECK, ""),
    "punishmentDetailInfoUrl": ("punishmentDetailInfo", "extract", E.BUS_PUNISH, ""),
    "otherLicenceDetailInfoUrl": ("otherLicenceDetailInfo", "extract", E.BUS_LICENCE, ""),
    "insInvinfoUrl": ("insInvinfo", "invest_ent", None, ""),
    "insAlterstockinfoUrl": ("insAlterstockinfo", "extract", E.ENT_STOCK_CHANGE, ""),
    "insLicenceinfoUrl": ("insLicenceinfo", "extract", E.ENT_LICENCE, ""),
    "insProPledgeRegInfoUrl": ("insProPledgeRegInfo", "extract", E.ENT_ITEL_PLEDGE, ""),
}

_SLUG_TO_SECTION = {slug: (kind, model, modelname)
                    for slug, kind, model, modelname in SECTIONS.values()}

# Report children: stem key -> extraction recipe
# (parser/DetaiParser.py:288-337).
REPORT_CHILDREN = {
    "annBaseUrl": ("report_base", None, ""),
    "sponsorUrl": ("invest_rep", None, ""),
    "forGuaranteeinfoUrl": ("extract", E.REP_GUARANTEE, ""),
    "alterUrl": ("extract", E.REP_CHANGE, ""),
    "webSiteInfoUrl": ("graph", E.REP_WEBSITE, "rep网站或网店信息"),
    "forInvestmentUrl": ("graph", E.REP_INVEST_ENT, "rep对外投资信息"),
    "alterStockInfoUrl": ("extract", E.REP_STOCK_CHANGE, ""),
    "vAnnualReportSfcBranchUrl": ("graph", E.REP_BRANCH, "rep分支机构信息"),
    "annulLicenceUrl": ("extract", E.REP_LICENCE, ""),
}

MORT_CHILD_BUCKETS = {v: k for k, v in E.MORTGAGE_URL_STEMS.items()}


def split_url(url):
    """absolute-or-relative url -> (host, path, query)."""
    rest = url.split("://", 1)[-1] if "://" in url else url
    if "://" in url:
        slash = rest.find("/")
        host, pathq = (rest, "/") if slash < 0 else (rest[:slash], rest[slash:])
    else:
        host, pathq = "", rest
    path, _, query = pathq.partition("?")
    return host, path, query


def canonicalize(url, host=""):
    """Canonical absolute form ``http://host/path[?query]`` (lowercased host,
    no fragment, no trailing default port)."""
    url = url.split("#", 1)[0]
    h, path, query = split_url(url)
    h = (h or host).lower().rstrip(".").removesuffix(":80")
    return "http://" + h + path + ("?" + query if query else "")


def classify(url):
    """-> (kind, detail) where kind in {listing, main, section, mort_child,
    report_child, other}."""
    _, path, query = split_url(url)
    if path.startswith("/search/"):
        return "listing", None
    if path.startswith("/company/"):
        return "main", None
    for stem, bucket in MORT_CHILD_BUCKETS.items():
        if path.startswith(stem):
            return "mort_child", bucket
    for key, stem in E.REPORT_URL_STEMS.items():
        if path.startswith(stem):
            return "report_child", key
    m = re.match(r"/corp-query-entprise-info-([A-Za-z]+)-", path)
    if m and m.group(1) in _SLUG_TO_SECTION:
        return "section", m.group(1)
    return "other", None


def page_type_score(url):
    kind, detail = classify(url)
    if kind == "listing":
        return SCORE_LISTING
    if kind == "main":
        return SCORE_MAIN
    if kind == "section" and "start=" not in split_url(url)[2]:
        return SCORE_SECTION
    return SCORE_CHILD


def analyze(url, content):
    """Single-pass page analysis: (extracted_text, links).

    Parses the payload once and derives both the golden per-URL text and the
    out-links — the hot path of the engine's Arrow parse stage.  Equivalent
    to (``extract_url_text(url, content)``, ``discover_links(url, content)``)
    by construction (tested in tests/test_oracle.py).
    """
    return extract_url_text(url, content), discover_links(url, content)


def _section_rows(kind, model, data):
    if kind in ("extract", "mortgage", "graph"):
        return [X.map_row(model, m) for m in data]
    if kind == "report_head":
        return [X.map_row(E.REP_HEAD, m) for m in data]
    if kind == "invest_bus":
        return [X.map_investor_row("bus", m) for m in data]
    if kind == "invest_ent":
        return [X.map_investor_row("ent", m) for m in data]
    if kind == "invest_rep":
        return [X.map_investor_row("rep", m) for m in data]
    raise ValueError(kind)


def extract_url_text(url, content):
    """Golden per-URL extracted text: what the reference parser extracts from
    this single document, serialized with ``json.dumps`` defaults (matching
    the reference's sink serialization, utils/MysqlDBHelper.py:34-44)."""
    kind, detail = classify(url)
    if kind == "listing":
        return json.dumps(X.parse_listing(content))
    if kind == "main":
        return json.dumps({"base": X.get_bus_base_info(content),
                           "urls": X.get_urls(content)})
    if kind == "mort_child":
        try:
            data = json.loads(content).get("data")
        except Exception:
            return json.dumps(None)
        mapper = {"mortgagers": X.map_mortgager_row, "pawns": X.map_pawn_row,
                  "obligee": X.map_obligee_row}[detail]
        return json.dumps([mapper(m) for m in (data or [])])
    if kind == "report_child":
        rkind, model, _ = REPORT_CHILDREN[detail]
        if rkind == "report_base":
            try:
                message = json.loads(content)
            except Exception:
                return json.dumps(None)
            if isinstance(message, dict) and len(message) > 0:
                general = {f: message.get(E.REP_BASE.get(f)) for f in E.REP_BASE}
                operation = {f: message.get(E.REP_OPERATION.get(f))
                             for f in E.REP_OPERATION}
                return json.dumps({"general": general, "operation": operation})
            return json.dumps(None)
        if rkind == "invest_rep":
            rkind_tag = "invest_rep"
        data, _tp = X.parse_envelope(content)
        if data is None:
            return json.dumps(None)
        return json.dumps(_section_rows(rkind, model, data))
    if kind == "section":
        skind, model, _ = _SLUG_TO_SECTION[detail]
        if skind == "report_head":
            try:
                message = json.loads(content)
            except Exception:
                return json.dumps(None)
            if not isinstance(message, list):
                return json.dumps(None)
            return json.dumps(_section_rows("report_head", None, message))
        data, _tp = X.parse_envelope(content)
        if data is None:
            return json.dumps(None)
        return json.dumps(_section_rows(skind, model, data))
    return json.dumps(None)


def _pagination_starts(kind, modelname, total_page):
    """start= values for pages 2..totalPage, replicating each loop's stride
    (extract/invest/mortgage: 5, parser/DetaiParser.py:773; graph: per
    section name with the stuck-start quirk, parser/DetaiParser.py:875-882).
    """
    if total_page is None or not isinstance(total_page, int) or total_page <= 1:
        return []
    starts = []
    for count in range(1, total_page):
        if kind == "graph":
            if "成员" in modelname:
                starts.append(count * 16)
            elif "分支" in modelname or "投资" in modelname:
                starts.append(count * 9)
            elif "网站" in modelname:
                starts.append(count * 8)
            else:
                starts.append(0)
        else:
            starts.append(count * 5)
    return starts


def discover_links(url, content):
    """Out-links of one fetched page as (relative_or_absolute_url, score)
    pairs, deduplicated, in discovery order.

    Mirrors the reference's crawl tree: listing -> first detail URL
    (parser/ListParser.py:23-24); main -> 16 section endpoints
    (parser/DetaiParser.py:94-183, requiring >=10 vars per :90-92); section
    page -> pagination pages plus mortgage children keyed ``morReg_Id``
    (:601-660) and report children keyed ``anCheId`` (:288-337).
    """
    kind, detail = classify(url)
    out = []
    seen = set()

    def add(u, score):
        if u not in seen:
            seen.add(u)
            out.append((u, score))

    if kind == "listing":
        r = X.parse_listing(content)
        if isinstance(r, list):
            add(r[0], SCORE_MAIN)
        return out

    if kind == "main":
        urls = X.get_urls(content)
        if urls is None or len(urls) < 10:
            return out
        for var in SECTIONS:
            u = urls.get(var)
            if u:
                add(u, SCORE_SECTION)
        return out

    _, path, query = split_url(url)
    base = path  # host-relative page-1 url

    if kind == "section":
        skind, model, modelname = _SLUG_TO_SECTION[detail]
        if skind == "report_head":
            try:
                message = json.loads(content)
            except Exception:
                return out
            if isinstance(message, list):
                for tmsg in message:
                    an_che_id = tmsg.get("anCheId")
                    if an_che_id is not None:
                        for key, stem in E.REPORT_URL_STEMS.items():
                            add(stem + an_che_id + ".html", SCORE_CHILD)
            return out
        data, total_page = X.parse_envelope(content)
        if data is None:
            return out
        if not query:  # pagination fan-out only from page 1
            for start in _pagination_starts(
                    "graph" if skind == "graph" else "paged", modelname, total_page):
                if start > 0:
                    add(base + "?start=" + str(start), SCORE_CHILD)
        if skind == "mortgage" and isinstance(data, list):
            for tmsg in data:
                mort_id = tmsg.get("morReg_Id")
                if mort_id is not None:
                    for stem in E.MORTGAGE_URL_STEMS.values():
                        add(stem + str(mort_id) + ".html", SCORE_CHILD)
        return out

    if kind == "report_child":
        rkind, model, modelname = REPORT_CHILDREN[detail]
        if rkind in ("extract", "graph", "invest_rep") and not query:
            data, total_page = X.parse_envelope(content)
            if data is None:
                return out
            for start in _pagination_starts(
                    "graph" if rkind == "graph" else "paged", modelname, total_page):
                if start > 0:
                    add(base + "?start=" + str(start), SCORE_CHILD)
        return out

    return out
