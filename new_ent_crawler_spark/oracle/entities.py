"""Field-mapping schemas for the registry extraction layer.

Each mapping sends a canonical output field -> source JSON field of the
section endpoint payload.  Empty string means "field exists in the output
schema but is not populated from the payload" (it surfaces as ``None``).

Semantics mirror the reference mapping dicts (see
``/root/reference/new_ent/crawler/parser/Entity.py:16-647``), including the
deliberate quirks that the byte-identity invariant requires:

* ``busChange`` swaps before/after (``before`` <- ``altAf``, ``after`` <-
  ``altBe``; reference Entity.py:446-447).
* ``*_term`` fields whose source contains ``-`` are two source fields joined
  with a literal ``-`` (``str(a) + "-" + str(b)``, producing ``"None-None"``
  when both are absent; reference DetaiParser.py:760-762).
* ``reChange.item`` maps from the (misspelled) source key ``alitem``
  (reference Entity.py:267).
"""

# -- business publicity sections (工商公示) --------------------------------

BUS_CHANGE = {  # 变更信息 (Entity.py:444-450; before/after intentionally swapped)
    "item": "altItem_CN",
    "before": "altAf",
    "after": "altBe",
    "date": "altDate",
}

BUS_ABNORMAL = {  # 经营异常名录 (Entity.py:427-433)
    "add_cause": "speCause_CN",
    "add_date": "abntime",
    "dec_org": "decOrg_CN",
    "remove_cause": "remExcpRes_CN",
    "remove_date": "remDate",
}

BUS_MEMBER = {  # 主要人员 (Entity.py:460-463)
    "name": "name",
    "position": "position_CN",
}

BUS_INVESTOR = {  # 股东及出资 (Entity.py:481-490)
    "type": "invType_CN",
    "name": "inv",
    "cert_type": "cerType_CN",
    "cert_no": "bLicNo",
    "sub_capi": "liSubConAm",
    "act_capi": "liAcConAm",
    "subs": "",
    "acts": "",
}

BUS_PLEDGE = {  # 股权出质登记 (Entity.py:512-521)
    "no": "equityNo",
    "pledgor": "pledgor",
    "pledgor_no": "pledBLicNo",
    "equity_amount": "impAm",
    "pledgee": "impOrg",
    "pledgee_no": "impOrgBLicNo",
    "date": "equPleDate",
    "state": "type",
}

BUS_PUNISH = {  # 行政处罚 (bus) (Entity.py:538-549)
    "no": "penDecNo",
    "name": "",
    "reg_no": "",
    "leg_rep": "",
    "type": "",
    "content": "penContent",
    "dec_org": "penAuth_CN",
    "date": "penDecIssDate",
    "detail": "",
    "remark": "",
}

BUS_LICENCE = {  # 行政许可 (bus) (Entity.py:563-571)
    "no": "licNo",
    "name": "licName_CN",
    "from": "valFrom",
    "to": "valTo",
    "org": "licAnth",
    "content": "licItem",
    "state": "status",
}

BUS_SPOT_CHECK = {  # 抽查检查 (Entity.py:388-393)
    "check_org": "insAuth_CN",
    "type": "insType_CN",
    "date": "insDate",
    "result": "insRes_CN",
}

BUS_MORTGAGE = {  # 动产抵押登记 (Entity.py:618-632)
    "no": "morRegCNo",
    "reg_org": "regOrg_CN",
    "reg_at": "canDate",
    "debut_type": "type_CN",
    "debt_amount": "priClaSecAm",
    "debt_term": "",
    "secure_scope": "",
    "state": "",
    "remark": "",
    "obligee": "",
    "mortgagers": "",
    "pawns": "",
    "alters": "",
}

BUS_BRANCH = {  # 分支机构 (Entity.py:642-647)
    "name": "brName",
    "reg_no": "regNo",
    "reg_org": "regOrg_CN",
    "unisc_id": "uniscId",
}

BUS_ITEL_PLEDGE = {  # 知识产权出质 (bus) (Entity.py:407-415)
    "no": "tmRegNo",
    "name": "tmName",
    "kind": "kinds",
    "pledgor": "pledgor",
    "pledgee": "impOrg",
    "term": "pleRegPerFrom-pleRegPerTo",
    "state": "type",
}

# -- enterprise publicity sections (企业公示) -------------------------------

ENT_INVESTOR = {  # Entity.py:48-57
    "type": "",
    "name": "inv",
    "cert_type": "",
    "cert_no": "",
    "sub_capi": "subSum",
    "act_capi": "aubSum",
    "subs": "",
    "acts": "",
}

ENT_STOCK_CHANGE = {  # Entity.py:68-73
    "stockholder": "inv",
    "before": "transAmPrBf",
    "after": "transAmPrAf",
    "date": "altDate",
}

ENT_LICENCE = {  # Entity.py:87-95
    "no": "licNo",
    "name": "licName_CN",
    "from": "valFrom",
    "to": "valTo",
    "org": "licAnth",
    "content": "licItem",
    "state": "status",
}

ENT_ITEL_PLEDGE = {  # Entity.py:109-117
    "no": "tmRegNo",
    "name": "tmName",
    "kind": "kinds",
    "pledgor": "pledgor",
    "pledgee": "impOrg",
    "term": "pleRegPerFrom-pleRegPerTo",
    "state": "type",
}

ENT_PUNISH = {  # Entity.py:134-145
    "no": "penDecNo",
    "name": "entName",
    "reg_no": "uniscId",
    "leg_rep": "",
    "type": "penType_CN",
    "content": "penContent",
    "dec_org": "judAuth",
    "date": "penDecIssDate",
    "detail": "",
    "remark": "remark",
}

# -- annual report sections (年报) ------------------------------------------

REP_HEAD = {  # Entity.py:16-20 (assembled field-by-field at DetaiParser.py:275-279)
    "year": "anCheYear",
    "date": "anCheDate",
    "from": "annRepFrom",
}

REP_BASE = {  # GeneralInfo (Entity.py:173-195)
    "reg_no": "regNo",
    "credit_code": "uniscId",
    "name": "entName",
    "type": "entType",
    "state": "busSt_CN",
    "telphone": "tel",
    "postcode": "postalCode",
    "email": "email",
    "address": "addr",
    "employ_num": "colEmplNum",
    "leg_rep": "",
    "women_num": "womemPNum",
    "holding_situation": "",
    "capi": "totEqu",
    "depend_ent": "dependentEntName",
    "is_stock": "",
    "is_website": "",
    "is_invest": "",
    "is_guar": "",
    "main_activity": "mainBusiAct",
    "relation": "",
}

REP_OPERATION = {  # OperationInfo (Entity.py:352-363)
    "total_asset": "assGro",
    "total_tax": "ratGro",
    "total_debt": "liaGro",
    "main_income": "vendInc",
    "total_turnover": "maiBusInc",
    "profit": "proGro",
    "net_profit": "netInc",
    "total_equity": "totEqu",
    "financial_loan": "",
    "fund_subsidy": "",
}

REP_INVESTOR = {  # Entity.py:224-233 (note mixed-case keys preserved)
    "Type": "",
    "name": "invName",
    "CertType": "",
    "CertNo": "",
    "sub_capi": "liSubConAm",
    "act_capi": "liAcConAm",
    "subs": "",
    "acts": "",
}

REP_GUARANTEE = {  # Entity.py:247-255
    "creditor": "more",
    "debtor": "mortgagor",
    "debt_kind": "priClaSecKind",
    "debt_amount": "priClaSecAm",
    "debt_term": "pefPerForm-pefPerTo",
    "guar_term": "guaranperiod",
    "guar_type": "gaType",
}

REP_CHANGE = {  # Entity.py:266-271 ("alitem" misspelling preserved)
    "item": "alitem",
    "before": "altBe",
    "after": "altAf",
    "date": "altDate",
}

REP_WEBSITE = {  # Entity.py:281-285
    "name": "webSitName",
    "type": "webType",
    "url": "domain",
}

REP_INVEST_ENT = {  # Entity.py:294-297
    "name": "entName",
    "reg_no": "uniscId",
}

REP_STOCK_CHANGE = {  # Entity.py:308-313
    "stockholder": "inv",
    "before": "transAmPr",
    "after": "transAmAft",
    "date": "altDate",
}

REP_BRANCH = {  # Entity.py:373-377
    "name": "brName",
    "reg_no": "uniscId",
    "reg_org": "",
}

REP_LICENCE = {  # Entity.py:327-335
    "no": "",
    "name": "licName_CN",
    "from": "",
    "to": "valTo",
    "org": "",
    "content": "",
    "state": "",
}

# Annual-report child endpoint URL stems keyed by anCheId
# (reference DetaiParser.py:1019-1029).
REPORT_URL_STEMS = {
    "annBaseUrl": "/corp-query-entprise-info-annualReportBaseinfo-",
    "sponsorUrl": "/corp-query-entprise-info-sponsor-",
    "forGuaranteeinfoUrl": "/corp-query-entprise-info-forGuaranteeinfo-",
    "alterUrl": "/corp-query-entprise-info-annualAlter-",
    "webSiteInfoUrl": "/corp-query-entprise-info-webSiteInfo-",
    "forInvestmentUrl": "/corp-query-entprise-info-forInvestment-",
    "alterStockInfoUrl": "/corp-query-entprise-info-vAnnualReportAlterstockinfo-",
    "vAnnualReportSfcBranchUrl": "/corp-query-entprise-info-vAnnualReportBranchProduction-",
    "annulLicenceUrl": "/corp-query-entprise-info-annualLicence-",
}

# Mortgage child endpoint URL stems keyed by morReg_Id
# (reference DetaiParser.py:565-567).
MORTGAGE_URL_STEMS = {
    "mortgagers": "/corp-query-entprise-info-mortregpersoninfo-",
    "pawns": "/corp-query-entprise-info-mortGuaranteeInfo-",
    "obligee": "/corp-query-entprise-info-mortCreditorRightInfo-",
}
