"""Sink-row serialization: InfoV2 -> wide rows with JSON-string columns.

Replicates the reference's MySQL sink layout (utils/MysqlDBHelper.py:20-106)
including its quirks: ``REPLACE INTO`` keyed by ``md5(credit_code or
reg_no)``; nested sections stored as ``json.dumps`` strings with default
separators and ASCII escaping; the report sink reading the non-existent
``invents``/``stockchanges`` keys (MysqlDBHelper.py:85,88) so those columns
are always ``"null"``; ``enterprise_info.changes`` likewise ``"null"``
because the parser never sets it.

``create_time`` is wall-clock in the reference (MysqlDBHelper.py:28); here it
is supplied by the caller derived from ``warc_ts`` for determinism
(SURVEY.md §4 determinism notes).
"""

from __future__ import annotations

import hashlib
import json


def md5_key(value) -> str:
    """md5 hex of str(value) (utils/MysqlDBHelper.py:148-152)."""
    m = hashlib.md5()
    m.update(str(value).encode("utf8"))
    return m.hexdigest()


def company_md5(base: dict) -> str:
    credit = base.get("credit_code")
    return md5_key(credit) if credit is not None else md5_key(base.get("reg_no"))


_BUSINESS_SECTIONS = ("investors", "changes", "members", "branchs",
                      "licenses", "mortgages", "pledges", "punishs",
                      "abnormals", "spot_checks")
_ENTERPRISE_SECTIONS = ("investors", "changes", "stock_changes", "licenses",
                        "intells", "punishs")
_REPORT_SECTIONS = ("general", "operation", "websites", "licenses",
                    "branchs", "invents", "guarantees", "investors",
                    "stockchanges", "changes")


def build_sink_records(infov2: dict, province: str, create_time: str) -> dict:
    """One InfoV2 -> {business, enterprise, reports: [...], main_url}
    flat dicts mirroring the four REPLACE INTO statements."""
    business = infov2.get("business")
    enterprise = infov2.get("enterprise")
    base = business.get("base")
    md5 = company_md5(base)

    bus_row = {
        "province": province,
        "create_time": create_time,
        "name": base.get("name"),
        "md5": md5,
        "type": base.get("type"),
        "regno": base.get("reg_no"),
        "base": json.dumps(base),
    }
    for sec in _BUSINESS_SECTIONS:
        bus_row[sec] = json.dumps(business.get(sec))

    ent_row = {"province": province, "create_time": create_time, "md5": md5}
    for sec in _ENTERPRISE_SECTIONS:
        ent_row[sec] = json.dumps(enterprise.get(sec))

    report_rows = []
    for rep in (enterprise.get("reports") or []):
        row = {
            "province": province,
            "create_time": create_time,
            "year": rep.get("year"),
            "md5": md5,
            "date": rep.get("date"),
            "from": rep.get("from"),
        }
        for sec in _REPORT_SECTIONS:
            row[sec] = json.dumps(rep.get(sec))
        report_rows.append(row)

    main_row = {
        "md5": md5,
        "company_name": base.get("name"),
        "main_url": infov2.get("main_url"),
        "province": province,
        "create_time": create_time,
    }
    return {"business": bus_row, "enterprise": ent_row,
            "reports": report_rows, "main_url": main_row}
