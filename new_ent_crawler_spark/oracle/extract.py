"""Pure extraction oracle: reference-equivalent parsing of registry pages.

These functions define the byte-identity contract for the engine: every page
in the synthetic ``pages`` table carries a golden ``text`` column computed by
this module, and the Spark engine's Arrow UDFs must reproduce it byte for
byte.  Behaviour replicates the reference parser including its quirks
(citations are to ``/root/reference/new_ent/crawler/``):

* ``remove_html`` keeps only the span-strip — the div-strip result is
  discarded (parser/DetaiParser.py:1339-1346, the second ``re.sub`` is
  applied to the original string).
* ``"term"`` fields joined with ``-`` go through ``str()`` so missing pairs
  yield the literal ``"None-None"`` (parser/DetaiParser.py:760-762).
* ``graphExtract`` pagination only advances ``start`` for section names
  containing 成员/分支/投资/网站; the member section name does not contain
  成员, so page 1 is re-read ``totalPage`` times and its rows duplicated
  (parser/DetaiParser.py:875-882).
* the enterprise-investor ``aubDetails`` loop reuses the last ``subDetails``
  element for every act row (parser/DetaiParser.py:463-472).
* ``EntityTimeFormat`` swallows errors for ``-``-joined values only in the
  generic branch (parser/DetaiParser.py:1107-1119), making a second pass over
  already-formatted rows a no-op.

No live HTTP: callers provide ``fetch(url) -> str | None`` resolving against
the simulated web (the ``pages`` table).

The reference uses lxml; lxml is unavailable here, so the two HTML walks
(listing anchors, ``<dl>`` base info) are regex/stdlib re-implementations that
are text-equivalent on the gsxt-style page shapes this engine consumes.

Parser-variant scope note: the reference ships a second detail parser,
``parser/DetailParser1.py``, whose ``<dl>`` base-info walk resolves label
collisions through an elif chain (DetailParser1.py:1071-1123) instead of
``DetaiParser.py``'s first-match precedence.  Only the DetaiParser
semantics are modeled here, deliberately: ``worker/worker.py:225``
instantiates ``DetaiParser`` — it is the authoritative production path —
and the variant is dead code in the reference's own pipeline (SURVEY.md
§2.8).  The variant was reviewed and excluded, not overlooked.
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timedelta, timezone

from . import entities as E

# Pinned zone replacing the reference's ``time.localtime`` (host-tz dependent,
# parser/DetaiParser.py:1056-1063); the reference ran in CST.
_CST = timezone(timedelta(hours=8))

NOT_FOUND_MARKER = '查询到<span class="search_result_span1">0</span>条信息'
BLOCK_MARKER = "由于您操作过于频繁"  # worker/worker.py:196
INVALID_LINK_MARKER = "invalidLink"

_ANCHOR_RE = re.compile(
    r"""<a\s[^>]*class=['"]search_list_item db['"][^>]*href=['"]([^'"]*)['"]""")
_VAR_URL_RE = re.compile(r'var.*"/.*?"')
_DL_RE = re.compile(r"<dl\b[^>]*>(.*?)</dl>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_NUM_RE = re.compile(r"[0-9]")
_CJK_RE = re.compile(r"[一-龥]")
_SPAN_RE = re.compile(r"<span.*?span>")


# --------------------------------------------------------------------------
# scalar formatters
# --------------------------------------------------------------------------

def remove_html(s):
    """Span-only tag strip (replicates the discarded-div-strip bug,
    parser/DetaiParser.py:1339-1346)."""
    if s is None:
        return None
    return _SPAN_RE.sub("", s)


def get_num_from_str(s):
    """Digit-only extraction (parser/DetaiParser.py:1321-1328)."""
    if s is None:
        return None
    return "".join(_NUM_RE.findall(s))


def get_font_from_str(s):
    """CJK-only extraction (parser/DetaiParser.py:1330-1337)."""
    if s is None:
        return None
    return "".join(_CJK_RE.findall(s))


def timestamp_format(ts):
    """ms-epoch (13 chars) -> ``YYYY-MM-DD`` in CST; CJK dates -> dashed;
    anything else -> None (parser/DetaiParser.py:1056-1069)."""
    if len(str(ts)) == 13:
        secs = float(ts) / 1000.0
        return datetime.fromtimestamp(secs, tz=_CST).strftime("%Y-%m-%d")
    elif ts is not None and "年" in str(ts):
        return str(ts).replace("年", "-").replace("月", "-").replace("日", "")
    else:
        return None


_GENERIC_TIME_FIELDS = ("date", "from", "to", "term", "debt_term",
                        "guar_term", "remove_date")
_BUS_BASE_TIME_FIELDS = ("op_from", "op_to", "date_reg", "date_approved",
                         "date_canceled", "date_revoked")


def entity_time_format(datas, type_=None):
    """Per-entity date sweep (parser/DetaiParser.py:1071-1146)."""
    if datas is None:
        return None
    if isinstance(datas, dict):
        if type_ == "busBase":
            for f in _BUS_BASE_TIME_FIELDS:
                datas[f] = timestamp_format(datas.get(f))
        return datas
    for data in datas:
        if type_ is None:
            for t in _GENERIC_TIME_FIELDS:
                if data.get(t) is not None:
                    tt = data.get(t)
                    if "-" in str(tt):
                        parts = str(tt).split("-")
                        try:
                            data[t] = (timestamp_format(parts[0].strip())
                                       + timestamp_format(parts[1].strip()))
                        except Exception:
                            pass
                    else:
                        data[t] = timestamp_format(tt)
        elif type_ == "invester":
            for bucket in ("subs", "acts"):
                entries = data.get(bucket)
                if entries is not None:
                    for entry in entries:
                        entry["date"] = timestamp_format(entry.get("date"))
        elif type_ == "busMort":
            data["reg_at"] = timestamp_format(data.get("reg_at"))
            if data.get("debt_term") is not None:
                tt = data.get("debt_term")
                if "-" in tt:
                    parts = str(tt).split("-")
                    data["debt_term"] = (timestamp_format(parts[0])
                                         + timestamp_format(parts[1]))
                else:
                    data["debt_term"] = timestamp_format(tt)
            obligee = data.get("obligee")
            if obligee is not None and obligee.get("debt_term") is not None:
                tt = obligee.get("debt_term")
                if "-" in tt:
                    parts = str(tt).split("-")
                    obligee["debt_term"] = (timestamp_format(parts[0])
                                            + timestamp_format(parts[1]))
                else:
                    obligee["debt_term"] = timestamp_format(tt)
    return datas


_STATE_LABELS = {
    None: ("state", {1: "有效", 2: "无效"}),
    "spotcheck": ("type", {1: "抽查", 2: "检查"}),
    "web": ("type", {1: "网站", 2: "网店"}),
}


def entity_state_format(datas, type_=None):
    """Enum -> CJK label decode (parser/DetaiParser.py:1148-1184)."""
    if datas is None:
        return None
    if isinstance(datas, dict):
        return datas
    field, labels = _STATE_LABELS[type_]
    for data in datas:
        if data.get(field) is not None:
            data[field] = labels.get(data.get(field), "")
    return datas


# Position image -> title decode (parser/DetaiParser.py:1236-1259).  The
# reference matches eleven hard-coded base64 ``<img>`` literals; this engine's
# synthetic web uses short deterministic stand-in data URIs for the same
# eleven titles (the real literals are production assets, not re-shipped
# here).  Unknown values pass through unchanged, exactly like the reference's
# ``else`` branch.
POSITION_TITLES = ("监事", "经理", "总经理", "执行董事", "董事", "董事长",
                   "监事会主席", "副总经理", "董事兼总经理", "负责人", "副董事长")
POSITION_IMG_MAP = {
    '<img src="data:image/png;base64,POS{:02d}=="/>'.format(i): title
    for i, title in enumerate(POSITION_TITLES)
}


def format_members(members):
    """CJK-only names + position-image decode
    (parser/DetaiParser.py:1276-1306)."""
    if members is not None and len(members) > 0 and isinstance(members, list):
        for temp in members:
            temp["name"] = get_font_from_str(temp.get("name"))
            duty = temp.get("position")
            temp["position"] = POSITION_IMG_MAP.get(duty, duty)
    return members


def format_change(changes):
    """Span-strip over change rows (parser/DetaiParser.py:1308-1319)."""
    if changes is not None and len(changes) > 0 and isinstance(changes, list):
        for temp in changes:
            temp["item"] = remove_html(temp.get("item"))
            temp["before"] = remove_html(temp.get("before"))
            temp["after"] = remove_html(temp.get("after"))
    return changes


# --------------------------------------------------------------------------
# page-level parsers
# --------------------------------------------------------------------------

def parse_listing(content=""):
    """First search-result href | "not_found" | None
    (parser/ListParser.py:14-26)."""
    if content is None or len(content) == 0:
        return None
    if NOT_FOUND_MARKER in content:
        return "not_found"
    m = _ANCHOR_RE.search(content)
    if m is not None:
        return [m.group(1)]
    return None


def get_bus_base_info(htmltext):
    """18-field base info from the main page's ``<dl>`` blocks with synonym
    keys and first-match precedence (parser/DetaiParser.py:888-978)."""
    item_one = {}
    for block in _DL_RE.findall(htmltext):
        info = _TAG_RE.sub(" ", block).split()
        if not info:
            continue
        if len(info) == 1:
            item_one[info[0][:-1]] = ""
        else:
            item_one[info[0][:-1]] = info[1]

    def first(pred, default=""):
        for k, v in item_one.items():
            if pred(k):
                return v
        return default

    item = {}
    item["reg_no"] = item_one.get("注册号")
    item["credit_code"] = item_one.get("统一社会信用代码")
    item["name"] = first(lambda k: "企业名称" in k or "名称" in k)
    item["type"] = item_one.get("类型")
    item["state"] = item_one.get("登记状态")
    item["formation"] = item_one.get("组成形式")
    item["leg_rep"] = first(lambda k: "经营者" in k or "人" in k or "首席代表" in k)
    item["reg_capi"] = first(
        lambda k: "注册资本" in k or "出资总额" in k or "注册资金" in k)
    item["reg_org"] = item_one.get("登记机关")
    item["scope"] = first(lambda k: "范围" in k)
    item["address"] = first(lambda k: "住所" in k or "场所" in k)
    item["op_from"] = first(lambda k: "期限自" in k)
    item["op_to"] = first(lambda k: "期限至" in k)
    item["date_reg"] = first(lambda k: "成立日期" in k or "注册日期" in k)
    item["date_approved"] = item_one.get("核准日期")
    item["date_canceled"] = item_one.get("注销日期")
    item["reason_canceled"] = first(
        lambda k: "注销理由" in k or "注销原因" in k or "注销凭证" in k)
    item["date_revoked"] = item_one.get("吊销日期")
    item["reason_revoked"] = first(
        lambda k: "吊销原因" in k or "吊销凭证" in k or "吊销理由" in k)
    return item


def get_urls(content):
    """Harvest ``var xxxUrl = "/..."`` section links from the main page
    (parser/DetaiParser.py:1039-1053)."""
    result = {}
    for hit in _VAR_URL_RE.findall(str(content)):
        parts = hit.split("=")
        if len(parts) == 2:
            key = parts[0].replace("var", "").strip()
            val = parts[1].replace('"', "").strip()
            result[key] = val
    return result if result else None


def map_row(model, tmsg):
    """Generic projection through a mapping dict with ``-``-joined term
    fields (parser/DetaiParser.py:757-765)."""
    temp = {}
    for field in model:
        src = model.get(field)
        if "term" in field and "-" in str(src):
            a, b = src.split("-")
            temp[field] = str(tmsg.get(a)) + "-" + str(tmsg.get(b))
        else:
            temp[field] = tmsg.get(src)
    return temp


def parse_envelope(text):
    """Decode a section payload into (rows, total_page).

    ``{totalPage, data: [...]}`` or a bare list; ``total_page`` is 1 when no
    ``data`` envelope, else the payload's totalPage (possibly None)
    (parser/DetaiParser.py:746-755)."""
    if text is None or "[" not in text:
        return None, None
    try:
        message1 = json.loads(text)
    except Exception:
        return None, None
    total_page = 1
    message = message1
    if isinstance(message1, dict) and message1.get("data") is not None:
        total_page = message1.get("totalPage")
        message = message1.get("data")
    return message, total_page


def _pagination_done(total_page, count):
    """Shared loop exit rule (parser/DetaiParser.py:766-775)."""
    if total_page is None:
        return True
    if total_page in (0, 1):
        return True
    return total_page > 1 and count >= total_page


def _page_url(url, start):
    return url if start == 0 else url + "?start=" + str(start)


def extract_section(model, url, fetch):
    """Paginated projection of one section endpoint, page size 5
    (parser/DetaiParser.py:678-779).  Returns list of rows or None."""
    if url is None or len(url) == 0:
        return None
    item = []
    count = 1
    start = 0
    while True:
        message, total_page = parse_envelope(fetch(_page_url(url, start)))
        if message is None:
            return None
        if isinstance(message, list) and len(message) > 0:
            for tmsg in message:
                item.append(map_row(model, tmsg))
        if _pagination_done(total_page, count):
            break
        start = count * 5
        count = count + 1
    return item if item else None


def graph_extract_section(model, url, fetch, modelname=""):
    """Variant with section-dependent page sizes; ``start`` only advances for
    成员/分支/投资/网站 names, so other multi-page sections re-read page 1
    (parser/DetaiParser.py:781-886)."""
    if url is None or len(url) == 0:
        return None
    item = []
    count = 1
    start = 0
    while True:
        message, total_page = parse_envelope(fetch(_page_url(url, start)))
        if message is None:
            return None
        if isinstance(message, list) and len(message) > 0:
            for tmsg in message:
                item.append(map_row(model, tmsg))
        if _pagination_done(total_page, count):
            break
        if "成员" in modelname:
            start = count * 16
        elif "分支" in modelname or "投资" in modelname:
            start = count * 9
        elif "网站" in modelname:
            start = count * 8
        count = count + 1
    return item if item else None


def map_investor_row(kind, tmsg):
    """Investor row mapping; three shapes for bus/ent/rep
    (parser/DetaiParser.py:344-550)."""
    if kind == "bus":
        return {
            "type": remove_html(tmsg.get("invType_CN")),
            "name": remove_html(tmsg.get("inv")),
            "cert_type": remove_html(tmsg.get("cerType_CN")),
            "cert_no": get_num_from_str(tmsg.get("bLicNo")),
            "sub_capi": tmsg.get("liSubConAm"),
            "act_capi": tmsg.get("liAcConAm"),
        }
    if kind == "ent":
        temp = map_row(E.ENT_INVESTOR, tmsg)
        sub_details = tmsg.get("subDetails")
        tsub = None
        if sub_details is not None and len(sub_details) > 0:
            subs = []
            for tsub in sub_details:
                subs.append({"type": tsub.get("subConForm_CN"),
                             "capi": tsub.get("subConAmStr"),
                             "date": tsub.get("currency")})
            temp["subs"] = subs
        aub_details = tmsg.get("aubDetails")
        if aub_details is not None and len(sub_details) > 0:
            # Reference reuses the *last subDetails element* for every act
            # row (parser/DetaiParser.py:463-472) — replicated.
            acts = []
            for _tact in aub_details:
                acts.append({"type": tsub.get("acConFormName"),
                             "capi": tsub.get("acConAmStr"),
                             "date": tsub.get("conDate")})
            temp["acts"] = acts
        return temp
    # rep
    temp = map_row(E.REP_INVESTOR, tmsg)
    temp["subs"] = [{"type": tmsg.get("subConFormName"),
                     "capi": tmsg.get("liSubConAm"),
                     "date": tmsg.get("subConDate")}]
    temp["acts"] = [{"type": tmsg.get("acConForm_CN"),
                     "capi": tmsg.get("liAcConAm"),
                     "date": tmsg.get("acConDate")}]
    return temp


def get_investors(kind, url, fetch):
    """Paginated investor section (page size 5)
    (parser/DetaiParser.py:344-550)."""
    if url is None or len(url) == 0:
        return None
    item = []
    count = 1
    start = 0
    while True:
        text = fetch(_page_url(url, start))
        if text is None:
            return None
        try:
            message1 = json.loads(text)
        except Exception:
            return None
        total_page = message1.get("totalPage") if isinstance(message1, dict) else None
        message = message1
        if isinstance(message1, dict) and message1.get("data") is not None:
            message = message1.get("data")
        if len(message) > 0:
            for tmsg in message:
                item.append(map_investor_row(kind, tmsg))
        if _pagination_done(total_page, count):
            break
        start = count * 5
        count = count + 1
    return item if item else None


def map_mortgager_row(tmsg):
    return {"name": tmsg.get("more"), "cert_type": tmsg.get("bLicType_CN"),
            "cert_no": tmsg.get("bLicNo"), "address": tmsg.get("")}


def map_pawn_row(tmsg):
    return {"name": tmsg.get("guaName"), "owner": tmsg.get("own"),
            "status": tmsg.get("guaDes"), "remark": tmsg.get("remark")}


def map_obligee_row(tmsg):
    return {"kind": tmsg.get("priClaSecKind_CN"),
            "amount": tmsg.get("priClaSecAm"),
            "scope": tmsg.get("warCov"),
            "debt_term": tmsg.get("pefPerForm-pefPerTo"),
            "remark": tmsg.get("remark")}


def get_mortgages(url, fetch, domain_url=""):
    """Mortgage rows with three child fan-outs keyed by ``morReg_Id``
    (parser/DetaiParser.py:553-675)."""
    if url is None or len(url) == 0:
        return None
    item = []
    count = 1
    start = 0
    while True:
        message, total_page = parse_envelope(fetch(_page_url(url, start)))
        if message is None:
            return None
        if isinstance(message, list) and len(message) > 0:
            for tmsg in message:
                temp = map_row(E.BUS_MORTGAGE, tmsg)
                mort_id = tmsg.get("morReg_Id")
                for bucket, stem in (("mortgagers", E.MORTGAGE_URL_STEMS["mortgagers"]),
                                     ("pawns", E.MORTGAGE_URL_STEMS["pawns"]),
                                     ("obligee", E.MORTGAGE_URL_STEMS["obligee"])):
                    child_text = fetch(stem + str(mort_id) + ".html")
                    try:
                        child = json.loads(child_text).get("data")
                    except Exception:
                        return None
                    if len(child) > 0:
                        if bucket == "mortgagers":
                            temp["mortgagers"] = [map_mortgager_row(c) for c in child]
                        elif bucket == "pawns":
                            temp["pawns"] = [map_pawn_row(c) for c in child]
                        else:
                            # last child row wins (DetaiParser.py:652-660)
                            for c in child:
                                temp["obligee"] = map_obligee_row(c)
                item.append(temp)
        if _pagination_done(total_page, count):
            break
        start = count * 5
        count = count + 1
    return item if item else None


def get_report_base(url, fetch):
    """Annual-report base payload -> (general, operation)
    (parser/DetaiParser.py:980-1015)."""
    text = fetch(url)
    if text is None:
        return None, None
    try:
        message = json.loads(text)
    except Exception:
        return None, None
    if isinstance(message, dict) and len(message) > 0:
        general = {f: message.get(E.REP_BASE.get(f)) for f in E.REP_BASE}
        operation = {f: message.get(E.REP_OPERATION.get(f))
                     for f in E.REP_OPERATION}
        return general, operation
    return None, None


def get_reports(url, fetch):
    """Annual-report tree: head list (bare JSON array) then nine child
    endpoints per year keyed by ``anCheId``
    (parser/DetaiParser.py:213-341)."""
    if url is None or len(url) == 0:
        return None
    text = fetch(url)
    if text is None:
        return None
    try:
        message = json.loads(text)
    except Exception:
        return None
    if not isinstance(message, list):
        return None

    def child_url(tmsg, key):
        an_che_id = tmsg.get("anCheId")
        if an_che_id is None:
            return None
        return E.REPORT_URL_STEMS[key] + an_che_id + ".html"

    reports = []
    for tmsg in message:
        report = {}
        report["year"] = tmsg.get("anCheYear")
        report["date"] = tmsg.get("anCheDate")
        report["from"] = tmsg.get("annRepFrom")

        u = child_url(tmsg, "annBaseUrl")
        if u:
            general, operation = get_report_base(u, fetch)
            report["general"] = entity_time_format(general)
            report["operation"] = entity_time_format(operation)
        u = child_url(tmsg, "sponsorUrl")
        if u:
            investors = get_investors("rep", u, fetch)
            report["investors"] = entity_time_format(investors, "invester")
        u = child_url(tmsg, "forGuaranteeinfoUrl")
        if u:
            guarantees = extract_section(E.REP_GUARANTEE, u, fetch)
            report["guarantees"] = entity_time_format(guarantees)
        u = child_url(tmsg, "alterUrl")
        if u:
            changes = extract_section(E.REP_CHANGE, u, fetch)
            report["changes"] = entity_time_format(changes)
        u = child_url(tmsg, "webSiteInfoUrl")
        if u:
            websites = graph_extract_section(E.REP_WEBSITE, u, fetch, "rep网站或网店信息")
            websites = entity_state_format(websites, "web")
            report["websites"] = entity_time_format(websites)
        u = child_url(tmsg, "forInvestmentUrl")
        if u:
            inv_ents = graph_extract_section(E.REP_INVEST_ENT, u, fetch, "rep对外投资信息")
            report["inv_ents"] = entity_time_format(inv_ents)
        u = child_url(tmsg, "alterStockInfoUrl")
        if u:
            stock_changes = extract_section(E.REP_STOCK_CHANGE, u, fetch)
            report["stock_changes"] = entity_time_format(stock_changes)
        u = child_url(tmsg, "vAnnualReportSfcBranchUrl")
        if u:
            branchs = graph_extract_section(E.REP_BRANCH, u, fetch, "rep分支机构信息")
            report["branchs"] = entity_time_format(branchs)
        u = child_url(tmsg, "annulLicenceUrl")
        if u:
            licenses = extract_section(E.REP_LICENCE, u, fetch)
            licenses = entity_state_format(licenses)
            report["licenses"] = entity_time_format(licenses)

        if report.get("year") is not None:
            reports.append(report)
    return reports


# --------------------------------------------------------------------------
# full company assembly (InfoV2)
# --------------------------------------------------------------------------

def assemble_company(main_url, fetch):
    """Replay the detail crawl for one company main page, producing the
    nested InfoV2 record (parser/DetaiParser.py:26-211).

    ``fetch`` resolves host-relative URLs against the simulated web.  Returns
    None when the main page is missing, yields <10 section vars, or extracts
    no company name — the reference's skip conditions
    (parser/DetaiParser.py:78-92,205-206).
    """
    html_text = fetch(main_url)
    if html_text is None:
        return None
    base = get_bus_base_info(html_text)
    urls = get_urls(html_text)
    if urls is None or len(urls) < 10:
        return None

    changes = format_change(extract_section(E.BUS_CHANGE, urls.get("alterInfoUrl"), fetch))
    abnormals = extract_section(E.BUS_ABNORMAL, urls.get("entBusExcepUrl"), fetch)
    # ent-punish extraction is fetched then overwritten by bus-punish below,
    # exactly like the reference (DetaiParser.py:103 vs :138).
    extract_section(E.ENT_PUNISH, urls.get("insPunishmentinfoUrl"), fetch)
    reports = get_reports(urls.get("anCheYearInfo"), fetch)
    bus_investors = get_investors("bus", urls.get("shareholderUrl"), fetch)
    members = format_members(graph_extract_section(
        E.BUS_MEMBER, urls.get("keyPersonUrl"), fetch, "bus主要人员信息"))
    branchs = graph_extract_section(
        E.BUS_BRANCH, urls.get("branchUrl"), fetch, "bus分支机构信息")
    mortgages = entity_state_format(get_mortgages(urls.get("mortRegInfoUrl"), fetch))
    pledges = entity_state_format(extract_section(
        E.BUS_PLEDGE, urls.get("stakQualitInfoUrl"), fetch))
    spot_checks = entity_state_format(extract_section(
        E.BUS_SPOT_CHECK, urls.get("spotCheckInfoUrl"), fetch), "spotcheck")
    punishs = extract_section(E.BUS_PUNISH, urls.get("punishmentDetailInfoUrl"), fetch)
    licenses = entity_state_format(extract_section(
        E.BUS_LICENCE, urls.get("otherLicenceDetailInfoUrl"), fetch))

    business = {}
    business["base"] = entity_time_format(base, "busBase")
    business["investors"] = entity_time_format(bus_investors, "invester")
    business["members"] = entity_time_format(members)
    business["branchs"] = entity_time_format(branchs)
    business["changes"] = entity_time_format(changes)
    business["mortgages"] = entity_time_format(mortgages, "busMort")
    business["pledges"] = entity_time_format(pledges)
    business["spot_checks"] = entity_time_format(spot_checks)
    business["licenses"] = entity_time_format(licenses)
    business["punishs"] = entity_time_format(punishs)
    business["abnormals"] = entity_time_format(abnormals)

    ent_investors = get_investors("ent", urls.get("insInvinfoUrl"), fetch)
    stock_changes = extract_section(
        E.ENT_STOCK_CHANGE, urls.get("insAlterstockinfoUrl"), fetch)
    ent_licenses = entity_state_format(extract_section(
        E.ENT_LICENCE, urls.get("insLicenceinfoUrl"), fetch))
    intells = entity_state_format(extract_section(
        E.ENT_ITEL_PLEDGE, urls.get("insProPledgeRegInfoUrl"), fetch))

    enterprise = {}
    enterprise["reports"] = entity_time_format(reports)
    enterprise["investors"] = entity_time_format(ent_investors, "invester")
    enterprise["stock_changes"] = entity_time_format(stock_changes)
    enterprise["licenses"] = entity_time_format(ent_licenses)
    enterprise["intells"] = entity_time_format(intells)
    # Second format pass over the same list object, like the reference's
    # shared ``punishs`` variable (DetaiParser.py:154,192) — a no-op thanks
    # to the swallowed split error.
    enterprise["punishs"] = entity_time_format(punishs)

    if base.get("name") is None:
        return None
    return {"business": business, "enterprise": enterprise, "main_url": main_url}
