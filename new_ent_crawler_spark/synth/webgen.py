"""Deterministic synthetic registry web (seed=42, no external data).

Produces the engine's input tables per ``BASELINE.json.input_hint`` /
FIXTURES.md §A:

* ``pages(url string, warc_ts timestamp, html binary, text string,
  lang string)`` — the simulated web; ``text`` is the golden per-URL
  extraction computed by the oracle (byte-identity target).
* ``seeds(keyword string, host string, priority int, seed_id long)``
* ``robots(host string, disallow array<string>, crawl_delay double)``

Page shapes mirror gsxt.gov.cn as consumed by the reference parser
(/root/reference/new_ent/crawler/parser/): search listings with
``search_list_item db`` anchors and the zero-results marker, company main
pages with ``<dl>`` base-info blocks plus >=10 ``var xxxUrl = "/..."``
script links, and ~15 paginated JSON section endpoints per company with the
``totalPage``/``data`` envelope, page strides 5/16/9/8, mortgage children
keyed ``morReg_Id`` and report children keyed ``anCheId``.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import random
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from ..oracle import entities as E
from ..oracle import extract as X
from ..oracle import urlspec as U

_CST = timezone(timedelta(hours=8))
_WARC_BASE = datetime(2018, 1, 5, tzinfo=_CST)

_CJK_BANK = "华泰丰宏顺兴隆昌瑞祥安达信永和谐嘉盛高科星辰天地宇"
_ORG_SUFFIX = ("有限公司", "有限责任公司", "股份有限公司", "商贸中心", "经营部")

# epoch-ms range 2015-01-01 .. 2017-12-01 (always 13 digits)
_TS_LO, _TS_HI = 1420070400000, 1512086400000


def _cjk(rnd: random.Random, lo=2, hi=6) -> str:
    return "".join(rnd.choice(_CJK_BANK) for _ in range(rnd.randint(lo, hi)))


def _epoch_ms(rnd: random.Random) -> int:
    return rnd.randrange(_TS_LO, _TS_HI)


def _cjk_date(rnd: random.Random) -> str:
    return "%d年%d月%d日" % (rnd.randint(2010, 2017), rnd.randint(1, 12),
                           rnd.randint(1, 28))


def _date_value(rnd: random.Random):
    r = rnd.random()
    if r < 0.6:
        return _epoch_ms(rnd)
    if r < 0.85:
        return _cjk_date(rnd)
    return None


def _money(rnd: random.Random) -> str:
    return "%d万元" % rnd.randint(10, 99999)


def _maybe_span(rnd: random.Random, s: str) -> str:
    return '<span class="tip">%s</span>%s' % (_cjk(rnd, 1, 2), s) \
        if rnd.random() < 0.25 else s


_DATEISH = ("Date", "date", "time", "abntime", "valFrom", "valTo",
            "equPleDate", "insDate", "canDate", "remDate", "pleRegPerFrom",
            "pleRegPerTo", "pefPerForm", "pefPerTo", "subConDate",
            "acConDate", "conDate", "currency", "altDate")
_ENUMISH = ("type", "status")
_MONEYISH = ("Am", "Sum", "sum", "totEqu", "fundam", "Inc", "Gro",
             "netInc", "impAm")


def _field_value(rnd: random.Random, src: str):
    """Heuristic value for one source JSON field."""
    if src == "":
        return None
    if any(k in src for k in _DATEISH):
        return _date_value(rnd)
    if src in _ENUMISH:
        return rnd.choice([1, 1, 2, 3])
    if "No" in src or src.endswith("no"):
        return "%s证%d号" % (_cjk(rnd, 1, 2), rnd.randint(10000, 999999))
    if any(k in src for k in _MONEYISH):
        return _money(rnd)
    if src.endswith("_CN"):
        return _maybe_span(rnd, _cjk(rnd))
    if rnd.random() < 0.1:
        return None
    return _cjk(rnd, 2, 5)


def _rows_for_model(rnd: random.Random, model: dict, n: int) -> list:
    rows = []
    srcs = set()
    for src in model.values():
        if "-" in str(src) and src not in ("",):
            srcs.update(src.split("-"))
        elif src:
            srcs.add(src)
    for _ in range(n):
        rows.append({s: _field_value(rnd, s) for s in sorted(srcs)})
    return rows


def _paged_payloads(rows, page_size, total_page):
    """Split rows into envelope payloads keyed by start offset."""
    pages = {}
    for k in range(total_page):
        chunk = rows[k * page_size:(k + 1) * page_size]
        pages[k * page_size] = json.dumps(
            {"totalPage": total_page, "data": chunk})
    return pages


_FILLER_BLOB = None


def _filler_blob() -> str:
    """1 MiB deterministic alphanumeric blob (safe: cannot contain HTML tags,
    anchors, ``var``+url patterns, or the zero-results marker)."""
    global _FILLER_BLOB
    if _FILLER_BLOB is None:
        rnd = random.Random("filler:42")
        chars = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 "
        _FILLER_BLOB = "".join(rnd.choices(chars, k=1 << 20))
    return _FILLER_BLOB


def _filler(url: str, n_bytes: int) -> str:
    if n_bytes <= 0:
        return ""
    blob = _filler_blob()
    off = int(hashlib.md5(("f:" + url).encode()).hexdigest()[:8], 16)         % (len(blob) - n_bytes - 1)
    return blob[off:off + n_bytes]


class _Web:
    """Accumulates pages; ``filler_kb`` pads pages to Common-Crawl-realistic
    sizes (HTML gets the full pad as a boilerplate paragraph, JSON payloads
    half of it as a ``_noise`` member) without changing what the reference
    parser extracts."""

    def __init__(self, filler_kb: int = 0):
        self.pages = {}  # absolute url -> html text
        self.filler_kb = filler_kb

    def put(self, host, rel_or_abs, content):
        url = U.canonicalize(rel_or_abs, host)
        if self.filler_kb > 0:
            if content.lstrip().startswith(("{", "[")):
                pad = _filler(url, self.filler_kb * 512)
                if content.startswith("{") and content != "{}":
                    content = '{"_noise": "%s", %s' % (pad, content[1:])
                elif content.startswith("[") and content != "[]":
                    content = '[{"_noise": "%s"}, %s' % (pad, content[1:])
            else:
                pad = "<p class=\"boilerplate\">%s</p>" % _filler(
                    url, self.filler_kb * 1024)
                content = content.replace("</body>", pad + "</body>")                     if "</body>" in content else content + pad
        self.pages[url] = content


def _gen_company(web: _Web, host: str, cid: str, name: str,
                 rnd: random.Random, broken_vars: bool):
    domain = "http://" + host
    main_rel = "/company/%s.html" % cid

    # ---- section endpoints -------------------------------------------------
    section_urls = {}
    for var, (slug, kind, model, modelname) in U.SECTIONS.items():
        section_urls[var] = "/corp-query-entprise-info-%s-%s.html" % (slug, cid)

    # ---- main page ---------------------------------------------------------
    dl_fields = [
        ("统一社会信用代码：", "91%s" % "".join(rnd.choice("0123456789ABCDEF")
                                        for _ in range(16))),
        ("注册号：", "%s" % rnd.randrange(10 ** 14, 10 ** 15)),
        ("企业名称：", name),
        ("类型：", rnd.choice(["有限责任公司", "个体工商户", "股份有限公司"])),
        ("登记状态：", rnd.choice(["存续", "在业", "注销"])),
        ("法定代表人：", _cjk(rnd, 2, 3)),
        ("注册资本：", _money(rnd)),
        ("登记机关：", _cjk(rnd, 3, 5) + "市场监督管理局"),
        ("经营范围：", _cjk(rnd, 4, 8)),
        ("住所：", _cjk(rnd, 4, 8) + "路%d号" % rnd.randint(1, 999)),
        ("营业期限自：", str(_epoch_ms(rnd))),
        ("营业期限至：", str(_epoch_ms(rnd))),
        ("成立日期：", _cjk_date(rnd)),
        ("核准日期：", _cjk_date(rnd)),
    ]
    if rnd.random() < 0.15:
        dl_fields.append(("组成形式：", "个人经营"))
    if rnd.random() < 0.1:
        dl_fields.append(("注销日期：", ""))  # key-only <dl> (empty value path)
    rnd.shuffle(dl_fields)

    dls = "\n".join(
        "<dl><dt>%s</dt><dd>%s</dd></dl>" % (k, v) for k, v in dl_fields)
    n_vars = 8 if broken_vars else 16
    var_lines = "\n".join(
        'var %s = "%s";' % (var, section_urls[var])
        for var in list(U.SECTIONS)[:n_vars])
    noise = 'var tracker = "/js/t.js?v=1";\nvar broken = = "/x/y.html";'
    main_html = ("<html><head><title>%s - 企业信用信息</title></head><body>"
                 "<div class=\"overview\">%s</div>\n<script>\n%s\n%s\n</script>"
                 "</body></html>") % (name, dls, var_lines, noise)
    web.put(host, main_rel, main_html)

    if broken_vars:
        return main_rel  # detail crawl aborts (<10 vars, DetaiParser.py:90)

    # ---- plain paginated sections ------------------------------------------
    multi_ok = {"alterInfo": 5, "stakQualitInfo": 5, "otherLicenceDetail": 5}
    for var, (slug, kind, model, modelname) in U.SECTIONS.items():
        rel = section_urls[var]
        if kind == "extract":
            n = rnd.choice([0, 0, 1, 1, 2, 2, 3, 7, 12])
            rows = _rows_for_model(rnd, model, n)
            total = max(1, math.ceil(n / 5))
            for start, payload in _paged_payloads(rows, 5, total).items():
                web.put(host, rel + ("?start=%d" % start if start else ""), payload)
        elif kind == "graph":
            page = 16 if "成员" in modelname else 9
            n = rnd.choice([0, 1, 2, 3, 2 * page - 3])
            rows = _rows_for_model(rnd, model, n)
            total = max(1, math.ceil(n / page))
            if "成员" in modelname and total > 1:
                # stuck-start section: only page 1 exists; reference re-reads
                # it totalPage times (DetaiParser.py:875-882)
                web.put(host, rel, json.dumps(
                    {"totalPage": total, "data": rows[:page]}))
            else:
                for start, payload in _paged_payloads(rows, page, total).items():
                    web.put(host, rel + ("?start=%d" % start if start else ""),
                            payload)
        elif kind in ("invest_bus", "invest_ent"):
            n = rnd.choice([0, 1, 1, 2, 3, 8])
            srcs = (["invType_CN", "inv", "cerType_CN", "bLicNo",
                     "liSubConAm", "liAcConAm"] if kind == "invest_bus"
                    else ["inv", "subSum", "aubSum"])
            rows = []
            for _ in range(n):
                row = {s: _field_value(rnd, s) for s in srcs}
                if kind == "invest_ent" and rnd.random() < 0.7:
                    nsub = rnd.randint(1, 3)
                    row["subDetails"] = [
                        {"subConForm_CN": _cjk(rnd, 2, 3),
                         "subConAmStr": _money(rnd),
                         "currency": _date_value(rnd)} for _ in range(nsub)]
                    if rnd.random() < 0.5:
                        row["aubDetails"] = [
                            {"acConFormName": _cjk(rnd, 2, 3),
                             "acConAmStr": _money(rnd),
                             "conDate": _date_value(rnd)}
                            for _ in range(rnd.randint(1, 2))]
                rows.append(row)
            total = max(1, math.ceil(n / 5))
            for start, payload in _paged_payloads(rows, 5, total).items():
                web.put(host, rel + ("?start=%d" % start if start else ""), payload)
        elif kind == "mortgage":
            n = rnd.choice([0, 0, 0, 1, 2])
            rows = _rows_for_model(rnd, model, n)
            for k, row in enumerate(rows):
                mort_id = "M%s%d" % (cid, k)
                row["morReg_Id"] = mort_id
                web.put(host, E.MORTGAGE_URL_STEMS["mortgagers"] + mort_id + ".html",
                        json.dumps({"data": [
                            {"more": _cjk(rnd), "bLicType_CN": _cjk(rnd, 2, 3),
                             "bLicNo": "%d" % rnd.randint(10 ** 8, 10 ** 9)}
                            for _ in range(rnd.randint(1, 2))]}))
                web.put(host, E.MORTGAGE_URL_STEMS["pawns"] + mort_id + ".html",
                        json.dumps({"data": [
                            {"guaName": _cjk(rnd), "own": _cjk(rnd, 2, 3),
                             "guaDes": _cjk(rnd, 3, 6), "remark": _cjk(rnd, 0, 2)}
                            for _ in range(rnd.randint(0, 2))]}))
                web.put(host, E.MORTGAGE_URL_STEMS["obligee"] + mort_id + ".html",
                        json.dumps({"data": [
                            {"priClaSecKind_CN": _cjk(rnd, 2, 3),
                             "priClaSecAm": _money(rnd), "warCov": _cjk(rnd),
                             "pefPerForm-pefPerTo":
                                 "%d-%d" % (_epoch_ms(rnd), _epoch_ms(rnd))
                                 if rnd.random() < 0.7 else None,
                             "remark": None}]}))
            total = max(1, math.ceil(n / 5))
            for start, payload in _paged_payloads(rows, 5, total).items():
                web.put(host, rel + ("?start=%d" % start if start else ""), payload)
        elif kind == "report_head":
            years = rnd.choice([0, 1, 1, 2, 3])
            heads = []
            for y in range(years):
                year = str(2013 + y)
                an_che_id = "A%s%s" % (cid, year)
                heads.append({"anCheYear": year, "anCheDate": _epoch_ms(rnd),
                              "annRepFrom": rnd.choice([1, 2]),
                              "anCheId": an_che_id})
                _gen_report_children(web, host, an_che_id, rnd)
            web.put(host, rel, json.dumps(heads))

    return main_rel


def _gen_report_children(web: _Web, host: str, an_che_id: str,
                         rnd: random.Random):
    for key, stem in E.REPORT_URL_STEMS.items():
        rel = stem + an_che_id + ".html"
        rkind, model, modelname = U.REPORT_CHILDREN[key]
        if rkind == "report_base":
            srcs = sorted({s for s in list(E.REP_BASE.values())
                           + list(E.REP_OPERATION.values()) if s})
            web.put(host, rel, json.dumps(
                {s: _field_value(rnd, s) for s in srcs}))
        elif rkind == "invest_rep":
            n = rnd.choice([0, 1, 2])
            srcs = ["invName", "liSubConAm", "liAcConAm", "subConFormName",
                    "subConDate", "acConForm_CN", "acConDate"]
            rows = [{s: _field_value(rnd, s) for s in srcs} for _ in range(n)]
            web.put(host, rel, json.dumps({"totalPage": 1, "data": rows}))
        else:
            page = {"": 5, "rep网站或网店信息": 8, "rep对外投资信息": 9,
                    "rep分支机构信息": 9}[modelname]
            n = rnd.choice([0, 0, 1, 2, page + 1])
            rows = _rows_for_model(rnd, model, n)
            total = max(1, math.ceil(n / page))
            for start, payload in _paged_payloads(rows, page, total).items():
                web.put(host, rel + ("?start=%d" % start if start else ""),
                        payload)


def _listing_html(name: str, cid: str, outcome: str, rnd: random.Random) -> str:
    if outcome == "not_found":
        body = X.NOT_FOUND_MARKER
    elif outcome == "empty":
        body = "查询到<span class=\"search_result_span1\">3</span>条信息<p>加载失败</p>"
    else:
        anchors = ['<a class="search_list_item db" href="/company/%s.html">%s</a>'
                   % (cid, name)]
        if rnd.random() < 0.3:
            anchors.append(
                '<a class="search_list_item db" href="/company/%s0.html">%s分公司</a>'
                % (cid, name))
        body = ("查询到<span class=\"search_result_span1\">%d</span>条信息\n"
                % len(anchors)) + "\n".join(anchors)
    return "<html><body><div class='search'>%s</div></body></html>" % body


_EXTRACT_SRC: list | None = None  # fork-COW buffer for _extract_texts


def _extract_at(i: int) -> str:
    url, content = _EXTRACT_SRC[i]
    return U.extract_url_text(url, content)


def _extract_texts(items: list, procs: int) -> list:
    """Golden-text extraction for a batch of (url, html) pairs.  For large
    batches, fan out over a fork Pool: workers index into the parent's
    buffer via copy-on-write instead of pickling ~GBs of html."""
    if procs <= 1 or len(items) < 2000:
        return [U.extract_url_text(u, c) for u, c in items]
    global _EXTRACT_SRC
    import multiprocessing as mp
    try:
        ctx = mp.get_context("fork")
    except ValueError:  # platform without fork
        return [U.extract_url_text(u, c) for u, c in items]
    _EXTRACT_SRC = items
    try:
        with ctx.Pool(procs) as pool:
            return pool.map(_extract_at, range(len(items)), chunksize=128)
    finally:
        _EXTRACT_SRC = None


def _flush_pages(writer, out_path: str, web: "_Web", row_group_size: int,
                 extract_procs: int):
    """Append ``web.pages`` (url-sorted) to the parquet writer and clear the
    dict.  Streaming per host bounds generator memory at O(one host) instead
    of O(web) — at Common-Crawl-realistic page sizes the whole web does not
    fit in RAM — and writing slice-by-slice keeps every arrow array well
    under the 32-bit binary-offset limit."""
    if not web.pages:
        return writer, 0
    items = [(u, web.pages[u]) for u in sorted(web.pages)]
    texts = _extract_texts(items, extract_procs)
    for lo in range(0, len(items), row_group_size):
        chunk = items[lo:lo + row_group_size]
        urls = [u for u, _ in chunk]
        hs = [int(hashlib.md5(u.encode()).hexdigest()[:8], 16) for u in urls]
        tbl = pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(
                [_WARC_BASE + timedelta(seconds=h % 10_000_000) for h in hs],
                pa.timestamp("us", tz="UTC")),
            "html": pa.array([c.encode("utf-8") for _, c in chunk],
                             pa.binary()),
            "text": pa.array(texts[lo:lo + row_group_size], pa.string()),
            "lang": pa.array(
                ["zh" if "gsxt" in u else ("zh" if h % 3 else "en")
                 for u, h in zip(urls, hs)], pa.string()),
        })
        if writer is None:
            writer = pq.ParquetWriter(out_path, tbl.schema,
                                      compression="zstd")
        writer.write_table(tbl, row_group_size=row_group_size)
    n = len(items)
    web.pages.clear()
    return writer, n


def generate(out_dir: str, n_hosts: int = 8, companies_per_host: int = 4,
             seed: int = 42, skew_host_factor: int = 1,
             p_not_found: float = 0.08, p_empty: float = 0.04,
             p_broken_vars: float = 0.03, p_missing_section: float = 0.0,
             filler_kb: int = 0, row_group_size: int | None = None,
             extract_procs: int | None = None):
    """Generate pages/seeds/robots parquet under ``out_dir``.

    ``skew_host_factor`` > 1 multiplies host 0's company count (the
    registry-domain skew test, FIXTURES.md §A1).

    row_group_size matters enormously: pyarrow's default (1M rows) makes
    one multi-GB row group, and a parquet row group is the unit of
    parallel scan — a single group means every Spark scan of the table
    runs ONE task no matter how many executors exist (it silently
    serialized the per-wave fetch probe and capped crawl scaling in r01).
    The default targets ~25 MB compressed per group regardless of
    ``filler_kb`` so the bench legs always scan many more splits than
    cores.  zstd matches the engine's own table writes and models
    compressed web-archive storage (CPU-bound decode on scan).
    """
    os.makedirs(out_dir, exist_ok=True)
    if row_group_size is None:
        row_group_size = max(256, (4096 * 24) // max(24, filler_kb))
    if extract_procs is None:
        extract_procs = min(16, os.cpu_count() or 1)
    pages_path = os.path.join(out_dir, "pages.parquet")
    # p_missing_section needs the whole web before the drop pass; those
    # webs are small test fixtures, so they skip per-host streaming
    stream = p_missing_section <= 0
    writer, n_pages = None, 0
    web = _Web(filler_kb=filler_kb)
    seeds = []
    seed_id = 0
    # host index zero-padded to the width of n_hosts (min 2, so output is
    # byte-identical to prior corpora for <=100 hosts): the streaming flush
    # reproduces the global url-sorted row order only if host names sort
    # lexicographically in generation order — with a fixed %02d, 'r100'
    # would sort before 'r99' and the wave engine's row-group min/max
    # fetch pruning would degrade (stats stay valid; pruning weakens)
    hw = max(2, len(str(n_hosts - 1)))
    for i in range(n_hosts):
        host = "r%0*d.gsxt.example" % (hw, i)
        n_comp = companies_per_host * (skew_host_factor if i == 0 else 1)
        for j in range(n_comp):
            rnd = random.Random("%d:%d:%d" % (seed, i, j))
            cid = "%02d%06d" % (i, j)
            name = _cjk(rnd, 2, 4) + rnd.choice(_ORG_SUFFIX)
            r = rnd.random()
            outcome = ("not_found" if r < p_not_found
                       else "empty" if r < p_not_found + p_empty
                       else "found")
            listing_rel = "/search/%d.html" % seed_id
            web.put(host, listing_rel, _listing_html(name, cid, outcome, rnd))
            if outcome == "found":
                _gen_company(web, host, cid, name, rnd,
                             broken_vars=rnd.random() < p_broken_vars)
            seeds.append({"keyword": name, "host": host,
                          "priority": 1 if rnd.random() < 0.2 else 0,
                          "seed_id": seed_id,
                          "seed_url": U.canonicalize(listing_rel, host)})
            seed_id += 1
        # hosts are generated in ascending name order and every page URL
        # starts with its host, so per-host url-sorted flushes reproduce
        # the exact global url-sorted row order of the non-streamed path
        if stream:
            writer, n = _flush_pages(writer, pages_path, web,
                                     row_group_size, extract_procs)
            n_pages += n

    if p_missing_section > 0:
        drop_rnd = random.Random("%d:drop" % seed)
        keep = {}
        for url, content in web.pages.items():
            if ("/corp-query-" in url and "?" not in url
                    and drop_rnd.random() < p_missing_section):
                continue
            keep[url] = content
        web.pages = keep

    writer, n = _flush_pages(writer, pages_path, web, row_group_size,
                             extract_procs)
    n_pages += n
    if writer is not None:
        writer.close()
    else:  # degenerate zero-page web: still write the (empty) table
        pq.write_table(pa.table({
            "url": pa.array([], pa.string()),
            "warc_ts": pa.array([], pa.timestamp("us", tz="UTC")),
            "html": pa.array([], pa.binary()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        }), pages_path)

    seeds_tbl = pa.table({
        "keyword": pa.array([s["keyword"] for s in seeds], pa.string()),
        "host": pa.array([s["host"] for s in seeds], pa.string()),
        "priority": pa.array([s["priority"] for s in seeds], pa.int32()),
        "seed_id": pa.array([s["seed_id"] for s in seeds], pa.int64()),
        "seed_url": pa.array([s["seed_url"] for s in seeds], pa.string()),
    })
    pq.write_table(seeds_tbl, os.path.join(out_dir, "seeds.parquet"))

    hosts = ["r%0*d.gsxt.example" % (hw, i) for i in range(n_hosts)]
    robots = pa.table({
        "host": pa.array(hosts, pa.string()),
        "disallow": pa.array([["/private/", "/admin/"] for _ in hosts],
                             pa.list_(pa.string())),
        "crawl_delay": pa.array([1.0 + (i % 3) / 4.0 for i in range(n_hosts)],
                                pa.float64()),
    })
    pq.write_table(robots, os.path.join(out_dir, "robots.parquet"))
    return {"pages": n_pages, "seeds": len(seeds), "hosts": n_hosts}


def load_fetch(out_dir: str):
    """url -> html text dict + fetch closure for the oracle/simulator."""
    t = pq.read_table(os.path.join(out_dir, "pages.parquet"),
                      columns=["url", "html"])
    pages = {u: h.decode("utf-8")
             for u, h in zip(t.column("url").to_pylist(),
                             t.column("html").to_pylist())}
    return pages
