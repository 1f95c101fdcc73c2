"""Pipeline-semantics queries (FIXTURES.md §3 P1–P10).

Each query body is a dialect-templated SQL string over the prelude CTEs in
operators/domain.py (feed → gate → identity → dictionaries); the Spark and
DuckDB renderings come from the same template, so the oracle is generated,
not hand-duplicated. Virtual-attribute queries additionally run the rule SQL
through the ExprCompiler's two emitters (functions/expr_compiler.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from zg_etl_spark.functions import search_keywords as SK
from zg_etl_spark.functions.expr_compiler import (
    DuckEmitter,
    SparkEmitter,
    parse,
    returns_boolean,
)
from zg_etl_spark.operators import registries as R
from zg_etl_spark.operators.domain import (
    DUCK,
    SPARK,
    Dialect,
    duck_pipeline_sql,
    spark_pipeline_df,
)

QUERIES: dict = {}
ORACLE: dict = {}


def _register(name: str, body_fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark_pipeline_df(spark, sf_dir, body_fn(SPARK))

    QUERIES[name] = run
    ORACLE[name] = duck_pipeline_sql(body_fn(DUCK))


# ---------------------------------------------------------------------------
# P0 envelope derivation parity (the spine everything else rides on)
# ---------------------------------------------------------------------------
def _p0(d: Dialect) -> str:
    return """
SELECT event_id, app_id, ak, owner, pl, pl_id, sdk, dt, did, cuid, event_name,
       ct, seq, sid, ip, ip_long, ua, k, dur, debug, ref, utm_source
FROM enveloped"""


_register("p0_envelope", _p0)


# ---------------------------------------------------------------------------
# P1 gate: error/ok distribution by code (G3/G4/G7 semantics)
# ---------------------------------------------------------------------------
def _p1(d: Dialect) -> str:
    return """
SELECT app_id, error_code, COUNT(*) AS n, COUNT(DISTINCT did) AS n_devices
FROM gated GROUP BY app_id, error_code"""


_register("p1_gate_errors", _p1)


# ---------------------------------------------------------------------------
# P2 identity: device / user id assignment (I2, I4)
# ---------------------------------------------------------------------------
def _p2(d: Dialect) -> str:
    return """
SELECT d.app_id, d.n_devices, d.min_zg_did, d.max_zg_did,
       u.n_users, u.min_zg_uid, u.max_zg_uid
FROM (SELECT app_id, COUNT(*) AS n_devices, MIN(zg_did) AS min_zg_did,
             MAX(zg_did) AS max_zg_did
      FROM did_ids GROUP BY app_id) d
LEFT JOIN (SELECT app_id, COUNT(*) AS n_users, MIN(zg_uid) AS min_zg_uid,
                  MAX(zg_uid) AS max_zg_uid
           FROM uid_ids GROUP BY app_id) u ON u.app_id = d.app_id"""


_register("p2_identity_mappings", _p2)


# ---------------------------------------------------------------------------
# P3 zgid binding invariants (I5, OneIdService.java:420-435): identified
# devices adopt the user's zgid; a cuid never maps to two zgids
# ---------------------------------------------------------------------------
def _p3(d: Dialect) -> str:
    if d.name == "spark":
        # per-cuid distinct-zgid count via a collect_set window instead of
        # the aggregate + self-join (guide §2.4): one scan + one exchange
        # by (app_id, bound_cuid) replaces two scans, the aggregate
        # exchange and the left-outer SMJ. NULL-cuid rows get a NULL count
        # (the join form's unmatched rows), which MAX ignores identically.
        # Proven by the unchanged DuckDB oracle (join form).
        return """
SELECT app_id,
       COUNT(*) AS n_devices,
       COUNT(bound_cuid) AS n_bound_devices,
       COUNT(*) - COUNT(bound_cuid) AS n_anon_devices,
       COUNT(DISTINCT zg_id) AS n_zgids,
       MAX(zgids_per_cuid) AS max_zgids_per_cuid
FROM (
  SELECT app_id, bound_cuid, zg_id,
         CASE WHEN bound_cuid IS NOT NULL THEN
           CAST(size(collect_set(zg_id) OVER (
             PARTITION BY app_id, bound_cuid)) AS BIGINT)
         END AS zgids_per_cuid
  FROM device_zgid
) z
GROUP BY app_id"""
    return """
SELECT z.app_id,
       COUNT(*) AS n_devices,
       COUNT(z.bound_cuid) AS n_bound_devices,
       COUNT(*) - COUNT(z.bound_cuid) AS n_anon_devices,
       COUNT(DISTINCT z.zg_id) AS n_zgids,
       MAX(c.zgids_per_cuid) AS max_zgids_per_cuid
FROM device_zgid z
LEFT JOIN (SELECT app_id, bound_cuid, COUNT(DISTINCT zg_id) AS zgids_per_cuid
           FROM device_zgid WHERE bound_cuid IS NOT NULL
           GROUP BY app_id, bound_cuid) c
       ON c.app_id = z.app_id AND c.bound_cuid = z.bound_cuid
GROUP BY z.app_id"""


_register("p3_zgid_binding", _p3)


# ---------------------------------------------------------------------------
# P4 dictionaries: event dict + attr dict incl. cus{n} allocation (M1, M2)
# ---------------------------------------------------------------------------
def _p4(d: Dialect) -> str:
    # event_dict_eff = the dictionary after preseed/auto-create/cap
    # gating — what a real deployment's MySQL `event` table would contain
    return """
SELECT e.app_id, e.owner, e.event_name, e.zg_eid,
       a.attr_name, a.attr_id, a.column_name, CAST(a.prop_type AS INT) AS prop_type
FROM event_dict_eff e
JOIN attr_dict a ON a.zg_eid = e.zg_eid AND a.owner = e.owner"""


_register("p4_dictionaries", _p4)


# ---------------------------------------------------------------------------
# P5 virtual attributes: rules compiled by the expression engine (V1-V4).
# Event-scope rules apply to dt evt/abp; user-scope rules to dt usr behind
# the isAllProp field-presence gate (VirtualPropertyOperator.java:157-203);
# boolean results become 1/0 per convertValue (:231-235) for BOTH scopes.
# ---------------------------------------------------------------------------
_VA_FIELDS = {"k", "value", "event_type", "pl", "cuid", "sid"}


def _va_resolver_for(d: Dialect):
    """Field resolution for virtual-attribute rules: envelope fields
    resolve to their columns, and any "_"-prefixed key resolves through
    the custom property bag — the reference's evaluator walks the
    record's whole custom map, not a closed field set
    (VirtualAttributeExpressionEvaluator.java:38-75). Bag values are
    STRING-typed like the reference's Map<String,String>, so numeric
    contexts coerce via TRY_CAST — NULL on an unparsable value, the
    batch rendering of parseDouble-throws-to-errData (same convention as
    the compiler's divide)."""
    from zg_etl_spark.operators.domain import custom_attrs

    bag = {name: val for name, val, _ in custom_attrs(d)}

    def resolve(name: str, hint: str) -> str:
        if name in _VA_FIELDS:
            return name
        if name in bag:
            expr = f"({bag[name]})"
            if hint == "number":
                return f"TRY_CAST({expr} AS DOUBLE)"
            return expr
        raise ValueError(f"unknown virtual-attr field {name}")

    return resolve


def _va_frag(d: Dialect, rule_sql: str, now_literal: str | None = None) -> str:
    # now_literal: test seam — the p5 rule fuzz pins the engines' clock
    # to its ports' NOW constant so now()-bearing random rules compare
    # deterministically (production keeps the live current_timestamp)
    resolver = _va_resolver_for(d)
    emitter = (SparkEmitter(resolver, now_literal) if d.name == "spark"
               else DuckEmitter(resolver, now_literal))
    ast = parse(rule_sql)
    frag = emitter.emit(ast)
    if returns_boolean(ast):
        # convertValue (VirtualPropertyOperator.java:231-235) maps a
        # Boolean result to 1/0 — but only a RESULT: a throw during
        # evaluation is an errData row, so a NULL fragment must stay
        # NULL (CAST preserves it; CASE..ELSE 0 would invent a 0)
        frag = f"CAST({frag} AS INT)"
    return frag


def _is_all_prop(d: Dialect, table_fields: str) -> str:
    """isAllProp: every listed field (last dotted segment) present —
    presence of a bag field = its resolved expression is non-NULL. An
    empty field list (the reference allows ungated rules) gates nothing —
    emit a literal TRUE so the generated conjunction stays well-formed."""
    resolve = _va_resolver_for(d)
    fields = [f.strip().split(".")[-1] for f in table_fields.split(",") if f.strip()]
    if not fields:
        return "1 = 1"
    return " AND ".join(f"{resolve(f, 'any')} IS NOT NULL" for f in fields)


def _p5(d: Dialect) -> str:
    cols = []
    for app_id, event_name, out_name, rule_sql in R.VIRTUAL_ATTR_RULES:
        cond = f"dt IN ('evt', 'abp') AND event_type = '{event_name}'"
        if app_id:
            cond += f" AND app_id = {app_id}"
        cols.append(f"CASE WHEN {cond} THEN ({_va_frag(d, rule_sql)}) END AS {out_name}")
    for app_id, out_name, rule_sql, table_fields in R.VIRTUAL_USER_PROP_RULES:
        cond = f"dt = 'usr' AND {_is_all_prop(d, table_fields)}"
        if app_id:
            cond += f" AND app_id = {app_id}"
        cols.append(f"CASE WHEN {cond} THEN ({_va_frag(d, rule_sql)}) END AS {out_name}")
    col_sql = ",\n       ".join(cols)
    return f"""
SELECT event_id, app_id, dt, event_type,
       {col_sql}
FROM resolved WHERE dt IN ('evt', 'abp', 'usr')"""


_register("p5_virtual_attrs", _p5)


# ---------------------------------------------------------------------------
# P6 virtual events: rule-driven 1→N fan-out (V5) — derived rows get owner
# zg_vtl / dt vtl with provenance (VirtualEventOperator.java:260-326)
# ---------------------------------------------------------------------------
def _p6(d: Dialect) -> str:
    # provenance view over the SAME rule table / join / match predicate
    # the spine fan-out uses (operators/domain.py vtl_rules_values,
    # VTL_JOIN_ON, vtl_match_any — one definition, no drift): filters are
    # an equality-AND over an ARBITRARY-length pair list
    # (VirtualEventOperator.java:216-254 iterates the rule's whole map);
    # the match stays a map-side predicate on the broadcast rules join,
    # no extra shuffle at any filter count
    from zg_etl_spark.operators.domain import (
        VTL_JOIN_ON,
        vtl_match_any,
        vtl_rules_values,
    )

    return f"""
SELECT app_id, 'zg_vtl' AS owner, 'vtl' AS dt, virtual_name,
       virtual_alias, event_owner, event_name_src, event_dt_src,
       COUNT(*) AS n
FROM (
  SELECT r.app_id, v.virtual_name, v.alias AS virtual_alias,
         r.owner AS event_owner, r.event_name AS event_name_src,
         r.dt AS event_dt_src
  FROM resolved r
  JOIN {vtl_rules_values()}
       AS v(rule_id, rule_app, src_event, virtual_name, alias)
    ON {VTL_JOIN_ON}
  WHERE {vtl_match_any(d)}
) x
GROUP BY app_id, virtual_name, virtual_alias, event_owner,
         event_name_src, event_dt_src"""


_register("p6_virtual_events", _p6)


# ---------------------------------------------------------------------------
# P7 enrichment: geo range join + REAL UA parse + search keyword + UTM
# fallback (E1-E4; fallback semantics EventAttrTransfer.java:301-338).
# UA enrichment is the p33 parser (functions/ua_parser.py CASE chains,
# UserAgentParser.java:29-280) inlined into the projection — JVM-side
# whole-stage codegen over the raw UA string, no rules-table join at all
# (the reference parses arbitrary UAs in the pipeline,
# UserAgentEnrichOperator.java:66-147). A NULL UA yields NULL fields.
# ---------------------------------------------------------------------------
_PRIVATE_IP = (
    "(ip_long = 0 OR (ip_long BETWEEN 167772160 AND 184549375)"
    " OR (ip_long BETWEEN 2886729728 AND 2887778303)"
    " OR (ip_long BETWEEN 3232235520 AND 3232301055)"
    " OR (ip_long BETWEEN 2130706432 AND 2147483647))"
)


def _p7(d: Dialect) -> str:
    # full 8-engine table + the first-in-URL param walk + cleanKeyword
    # (SearchKeywordParser.java:36-163). search_term is the DW-enriched
    # $utm_term (parse: extract → decodeMultiCharset → cleanKeyword) —
    # the decode runs SQL-side over the closed fixture escape alphabet
    # exactly as in p8; the general multi-charset form stays the UDF.
    # utm_medium_f/utm_source_f preview the wide-table transfer's E4
    # derivation (EventAttrTransfer.java:300-338): the engine test is
    # isSearchEngine's 7-host contains over the referrer domain (toutiao
    # and yahoo referrers take the 引荐 lane), and a given UTM family
    # passes medium through as-given ($utm_medium is absent from this
    # wire fixture, so the given lane's medium is NULL).
    from zg_etl_spark.functions import ua_parser as UP
    from zg_etl_spark.operators.domain import geo_garbled, ua_real_case

    term_dec = (
        f"CASE WHEN instr(term_raw, '%E4%B8%AD') > 0 "
        f"OR instr(term_raw, '%E6%96%87') > 0 "
        f"OR {d.rlike('term_raw', '[一-龥]')} "
        f"THEN {SK.decode_layer_sql('term_raw', True)} "
        f"ELSE term_raw END"
    )
    family_given = ("(utm_source IS NOT NULL OR utm_campaign IS NOT NULL"
                    " OR utm_content IS NOT NULL)")
    website = "regexp_extract(ref, 'https?://([^/]+)', 1)"
    ua = "r.ua_real"
    gg = geo_garbled(d, "g.country", "g.province", "g.city")
    return f"""
SELECT event_id, app_id, country, province, city, os, browser, device_type,
       search_engine,
       NULLIF({SK.clean_keyword(d, term_dec)}, '') AS search_term,
       CASE WHEN {family_given} THEN CAST(NULL AS {d.strtype})
            WHEN {SK.is_search_engine_website(d, website)} THEN '搜索自然流量'
            WHEN ref IS NOT NULL THEN '引荐' END AS utm_medium_f,
       COALESCE(utm_source,
                CASE WHEN ref IS NOT NULL THEN {website} END)
           AS utm_source_f
FROM (
  SELECT r.event_id, r.app_id, r.ref, r.utm_source, r.utm_campaign,
         r.utm_content,
         CASE WHEN {gg} THEN NULL ELSE g.country END AS country,
         CASE WHEN {gg} THEN NULL ELSE g.province END AS province,
         CASE WHEN {gg} THEN NULL ELSE g.city END AS city,
         CASE WHEN {ua} IS NOT NULL THEN {UP.os_family(d, ua)} END AS os,
         CASE WHEN {ua} IS NOT NULL THEN {UP.browser(d, ua)} END AS browser,
         CASE WHEN {ua} IS NOT NULL THEN {UP.device_type(d, ua)} END
             AS device_type,
         {SK.engine_case(d, 'r.ref')} AS search_engine,
         {SK.term_case(d, 'r.ref', SK.engine_case(d, 'r.ref'))} AS term_raw
  FROM (SELECT *, {_PRIVATE_IP} AS is_private,
               {ua_real_case(d)} AS ua_real FROM resolved) r
  LEFT JOIN ip_ranges g
         ON NOT r.is_private AND r.ip_long BETWEEN g.ip_lo AND g.ip_hi
) x"""


_register("p7_enrichment", _p7)


# ---------------------------------------------------------------------------
# P8 wide event table: time buckets + ids + map-side cus/type pivot
# (R3 semantics, EventAttrTransfer.java:94-365; basic fill :233-350;
# st/se rewrite :360-365; sanitizers :497-534; pivot :162-228).
#
# Scale shape: the fact scans ONCE and every join is against a
# broadcast-sized side (event_dict, attr_map, ip_ranges) — cus{n}
# values are derived from the row's OWN fields via the pivoted dictionary
# (attr_map), so there is NO fact-grain groupBy(seq) + self-join (the
# previous formulation shuffled the melted fact twice on a high-cardinality
# key; at 100 TB those two Exchanges dominate the stage). UA enrichment is
# the p33 regex parser inlined as codegen CASE chains over the raw UA
# string (UserAgentParser.java:29-280) — no rules table, no join.
# ---------------------------------------------------------------------------
def _cus_value(d: Dialect, name_expr: str) -> str:
    """Value of the custom attr occupying a physical column, derived from
    the event row's own fields — same value table as attrs_melted."""
    from zg_etl_spark.operators.domain import custom_attrs

    whens = " ".join(
        f"WHEN '{name}' THEN {val}" for name, val, _ in custom_attrs(d, q="e.")
    )
    return f"CASE {name_expr} {whens} END"


def _cus_cols(d: Dialect) -> str:
    """cus1..cusN / type1..typeN at the configured physical width
    (ZG_CUS_N ~ EventAttrRow.configure, AllJob.java:41-42) — columns
    beyond the allocated dictionary stay NULL, like the reference's
    fixed-width Doris layout."""
    from zg_etl_spark.operators.domain import ZG_CUS_N

    return ",\n       ".join(
        f"{_cus_value(d, f'am.a{i}')} AS cus{i}, am.t{i} AS type{i}"
        for i in range(1, ZG_CUS_N + 1)
    )


def _p8(d: Dialect) -> str:
    from zg_etl_spark.functions import ua_parser as UP
    from zg_etl_spark.operators.domain import geo_garbled, ua_real_case

    ts_ct = d.ts("e.ct")
    dref = d.date_sub(f"CAST({ts_ct} AS DATE)", 1)
    private_ip = _PRIVATE_IP.replace("ip_long", "e.ip_long")
    gg = geo_garbled(d, "g.country", "g.province", "g.city")
    website = "regexp_extract(e.ref, 'https?://([^/]+)', 1)"
    ua = "e.ua_real"
    # --- the reference's wide-table UTM lane (EventAttrTransfer.java:
    # 300-338): $utm_term arrives DW-enriched (SearchKeywordParser.parse:
    # extract → decodeMultiCharset → cleanKeyword); when the UTM family
    # (source/medium/campaign/content) is all empty the transfer derives
    # medium/source itself — the engine test being isSearchEngine's
    # 7-host contains over $referrer_domain (NOT SearchKeywordParser's
    # regexes: toutiao/yahoo referrers take the 引荐 lane) — and, when
    # the enriched term is ALSO empty, falls back to getUtmTermFromRef
    # (the second parser in functions/search_keywords.py). When the
    # family IS given, every column passes through as-given ($utm_medium
    # is absent from this wire fixture, so the given lane's medium is
    # NULL). decodeMultiCharset runs SQL-side over the closed fixture
    # escape alphabet (containsChinese ⇔ a CJK escape or literal CJK);
    # the general multi-charset form stays the documented UDF.
    term_raw = SK.term_case(d, "ref", SK.engine_case(d, "ref"))
    term_dec = (
        f"CASE WHEN instr(e.term_raw, '%E4%B8%AD') > 0 "
        f"OR instr(e.term_raw, '%E6%96%87') > 0 "
        f"OR {d.rlike('e.term_raw', '[一-龥]')} "
        f"THEN {SK.decode_layer_sql('e.term_raw', True)} "
        f"ELSE e.term_raw END"
    )
    # EventAttrTransfer.java:309-310 checks FOUR fields (source, medium,
    # campaign, content); the wire fixture carries no medium column, so
    # the modeled check has three. Guard the coupling at plan-build time:
    # if `resolved` ever grows a utm_medium column this must gain
    # `e.utm_medium IS NOT NULL` — fail loudly instead of diverging
    # silently.
    from zg_etl_spark.operators.domain import RESOLVED_COLS
    assert "utm_medium" not in RESOLVED_COLS, (
        "resolved now carries utm_medium: add it to family_given "
        "(EventAttrTransfer's 4-field all-empty check) before building p8"
    )
    family_given = ("(e.utm_source IS NOT NULL OR e.utm_campaign IS NOT NULL"
                    " OR e.utm_content IS NOT NULL)")
    term_full = (
        f"COALESCE(NULLIF({SK.clean_keyword(d, term_dec)}, ''), "
        f"CASE WHEN NOT {family_given} "
        f"THEN {SK.utm_term_fallback(d, 'e.ref')} END)"
    )
    # the BROADCAST hint is a comment to DuckDB, a join-strategy pin to
    # Spark: checkpointed dict views carry no stats, so without it the
    # planner falls back to SortMergeJoin (two fact shuffles)
    #
    # uuid: synthesized vtl rows inherit their source row's seq, but the
    # reference regenerates $uuid for every synthesized row
    # (VirtualEventOperator.java:305-315 "产生的虚拟事件重新生成uuid") —
    # the deterministic batch stand-in salts the hash with the virtual
    # name, unique per (source row, rule) since rule names are distinct
    #
    # time buckets (JVM fixture mode 'ea', getTimeComponents + the
    # hour+"0"+mill composite, EventAttrTransfer.java:244-246,374-386):
    # begin_time_id uses FLOOR-mod — Calendar.MILLISECOND is 0..999 even
    # for negative epoch ms where SQL's % goes negative. begin_date is
    # idiv (truncating): Java's Timestamp.valueOf(format(ct)).getTime()/
    # 1000 floors for negative ct, but isExpiredTime gates every row to
    # a recent window first, so ct < 0 never reaches this SELECT (in the
    # reference or here) — positive-domain idiv is exact
    cols = (
        "event_id, app_id, zg_id, zg_did, zg_uid, sid, dt, seq, ct, pl_id, "
        "net, cr, ua, url, ref, cn, vn, ip_long, ip, utm_source, dur, "
        "business, event_type, k, pl, value, utm_campaign, utm_content"
    )
    return f"""
SELECT /*+ BROADCAST(am), BROADCAST(g) */
       e.event_id, e.app_id, e.zg_id, e.zg_did, e.zg_uid,
       COALESCE(e.sid, -1) AS zg_sid,
       e.zg_eid,
       md5({d.s('e.seq')} || CASE WHEN e.dt = 'vtl'
                                  THEN '|' || e.event_name_t
                                  ELSE '' END) AS uuid,
       CASE e.dt WHEN 'ss' THEN 'st' WHEN 'se' THEN 'se'
                 ELSE {d.clean('e.event_name_t', 256)} END AS event_name,
       CAST({d.fmt(ts_ct, 'yyyyMMdd')} AS INT) AS begin_day_id,
       {d.idiv('e.ct', '1000')} AS begin_date,
       CAST(CAST({d.fmt(ts_ct, 'HH')} AS INT) * 10000
            + (e.ct % 1000 + 1000) % 1000 AS INT) AS begin_time_id,
       CAST({d.yw_java(dref)} AS INT) AS yw,
       CAST(e.pl_id AS INT) AS platform,
       {d.net('e.net')} AS network,
       {d.int_len('e.cr')} AS mccmnc,
       {d.clean('e.ua_real', 256)} AS useragent,
       {d.clean(website, 1088)} AS website,
       {d.clean('e.url', 1088)} AS current_url,
       {d.clean('e.ref', 1088)} AS referrer_url,
       {d.clean('e.cn', 256)} AS channel,
       {d.clean('e.vn', 256)} AS app_version,
       e.ip_long,
       {d.clean('e.ip', 256)} AS ip_str,
       CASE WHEN {private_ip} OR {gg} THEN NULL ELSE g.country END AS country,
       CASE WHEN {private_ip} OR {gg} THEN NULL ELSE g.province END AS area,
       CASE WHEN {private_ip} OR {gg} THEN NULL ELSE g.city END AS city,
       CASE WHEN {ua} IS NOT NULL THEN {UP.os_family(d, ua)} END AS os,
       {UP.os_version(d, ua)} AS ov,
       CASE WHEN {ua} IS NOT NULL THEN {UP.browser(d, ua)} END AS bs,
       {UP.browser_major(d, ua)} AS bv,
       CASE WHEN {ua} IS NOT NULL THEN {UP.device_type(d, ua)} END
           AS device_type,
       e.search_engine,
       CASE WHEN {family_given} THEN CAST(NULL AS {d.strtype})
            WHEN {SK.is_search_engine_website(d, website)} THEN '搜索自然流量'
            WHEN e.ref IS NOT NULL THEN '引荐' END AS utm_medium,
       {d.clean(f"COALESCE(e.utm_source, CASE WHEN e.ref IS NOT NULL THEN {website} END)", 256)}
           AS utm_source_f,
       {d.clean(term_full, 256)} AS utm_term,
       {d.clean('e.utm_campaign', 256)} AS utm_campaign,
       {d.clean('e.utm_content', 256)} AS utm_content,
       CASE WHEN e.dur BETWEEN 0 AND 86400000 THEN e.dur
            ELSE CAST(0 AS BIGINT) END AS duration,
       {d.clean('e.business', 256)} AS attr1,
       CAST(NULL AS {d.strtype}) AS attr2,
       CAST(NULL AS {d.strtype}) AS attr3,
       CAST(NULL AS {d.strtype}) AS attr4,
       {d.s('e.zg_id')} || '_' || {d.s('COALESCE(e.sid, -1)')} AS attr5,
       {_cus_cols(d)}
FROM (
  SELECT {cols}, owner_e, event_name_t, zg_eid,
         {SK.engine_case(d, 'ref')} AS search_engine,
         {term_raw} AS term_raw,
         {ua_real_case(d)} AS ua_real
  FROM events_dicted WHERE event_error_code = 0
  UNION ALL
  SELECT {cols}, owner AS owner_e,
         CAST(NULL AS {d.strtype}) AS event_name_t,
         CAST(CASE dt WHEN 'ss' THEN -1 ELSE -2 END AS BIGINT) AS zg_eid,
         {SK.engine_case(d, 'ref')} AS search_engine,
         {term_raw} AS term_raw,
         {ua_real_case(d)} AS ua_real
  FROM resolved WHERE dt IN ('ss', 'se')
) e
LEFT JOIN attr_map am ON am.zg_eid = e.zg_eid AND am.owner = e.owner_e
LEFT JOIN ip_ranges g ON e.ip_long BETWEEN g.ip_lo AND g.ip_hi"""


_register("p8_wide_table", _p8)


# ---------------------------------------------------------------------------
# P9 user-property EAV rows incl. synthetic app_user_id(-1)
# (R6, UserPropertyTransfer.java:48-164)
# ---------------------------------------------------------------------------
def _p9(d: Dialect) -> str:
    # transfer gate (UserPropertyTransfer.java:55-59): rows ship only for
    # IDENTIFIED users (zg_uid present); property names lose the "_"
    # prefix (propKey.substring(1), :126)
    return f"""
SELECT app_id, zg_id, property_name, property_value,
       CAST(property_data_type AS INT) AS property_data_type,
       CAST(property_id AS BIGINT) AS property_id
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY app_id, zg_id, property_name
                               ORDER BY seq DESC) AS rn
  FROM (
    SELECT app_id, zg_id, seq, 'k' AS property_name,
           {d.s('k')} AS property_value, 2 AS property_data_type,
           1 AS property_id
    FROM resolved WHERE dt = 'usr' AND zg_uid IS NOT NULL
    UNION ALL
    SELECT app_id, zg_id, seq, 'app_user_id', cuid, 1, -1
    FROM resolved WHERE dt = 'usr' AND cuid IS NOT NULL
  ) z
) y WHERE rn = 1"""


_register("p9_user_properties", _p9)


# ---------------------------------------------------------------------------
# P10 upsert grain: b_user — UNIQUE KEY(device_id, zg_id) keep-latest
# (schema.sql:1-24; MERGE-on-write emulated as row_number dedup)
# ---------------------------------------------------------------------------
def b_user_rows_sql(d: Dialect) -> str:
    """The b_user row grain (UserTransfer.java:38-90 + schema.sql:1-24):
    NUMERIC zg_did/zg_uid ids (the table's BIGINT device_id/user_id
    columns — NOT the raw did/cuid strings), begin_date = ct seconds,
    and rows whose tz is out of the ±48 h validity range are SKIPPED
    entirely (timestampToDateString:94-96 returns \\N → transfer null).
    Single source for p10/w1/w3/w6/w7/s8 and the independent store
    replay."""
    return f"""
SELECT app_id, zg_did AS device_id, zg_id, zg_uid AS user_id,
       {d.idiv('ct', '1000')} AS begin_date, CAST(pl_id AS INT) AS platform,
       seq
FROM resolved WHERE abs(tzoff) <= 172800000"""


def _p10(d: Dialect) -> str:
    return f"""
SELECT app_id, device_id, zg_id, user_id, begin_date, platform
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY app_id, device_id, zg_id
                               ORDER BY seq DESC) AS rn
  FROM ({b_user_rows_sql(d)}) r
) x WHERE rn = 1"""


_register("p10_b_user_upsert", _p10)


# ---------------------------------------------------------------------------
# P11 b_device: keep-latest per device, UNIQUE KEY(device_id) merge-on-write,
# full 22-column layout (R5, transfer/DeviceTransfer.java:30-133;
# schema.sql:26-66): resolution split replicates Java
# `split("[^0-9]")` + trailing-empty removal + parts.length>=2 gate
# (:118-133); brand pinned to Apple on iOS (:78-81); phone/mac/device_type/
# attr2-5 wired to NULL exactly as the reference writes \\N; tz offsets
# beyond ±48h invalidate last_update_date (:135-146)
# ---------------------------------------------------------------------------
def _p11(d: Dialect) -> str:
    # parts.length >= 2 after Java trailing-empty removal ⟺ a digit
    # occurs somewhere after the first non-digit
    has_two = d.rlike("rs", "[^0-9].*[0-9]")
    h_px = "regexp_extract(rs, '^([0-9]*)', 1)"
    v_px = "regexp_extract(rs, '^[0-9]*[^0-9]([0-9]*)', 1)"
    return f"""
SELECT app_id, device_id, device_md5, platform, device_type,
       horizontal_pixel, vertical_pixel, device_brand, device_model,
       resolution, phone, imei, mac, is_prison_break, is_crack,
       language, timezone, attr1, attr2, attr3, attr4, attr5,
       last_update_date
FROM (
  SELECT app_id, zg_did AS device_id,
         {d.clean('did', 256)} AS device_md5,
         CAST(pl_id AS INT) AS platform,
         CAST(NULL AS {d.strtype}) AS device_type,
         CASE WHEN rs IS NOT NULL AND {has_two} THEN {h_px} END
             AS horizontal_pixel,
         CASE WHEN rs IS NOT NULL AND {has_two} THEN {v_px} END
             AS vertical_pixel,
         CASE WHEN pl = 'ios' THEN 'Apple'
              ELSE {d.clean('br', 256)} END AS device_brand,
         {d.clean('dv', 256)} AS device_model,
         {d.clean('rs', 256)} AS resolution,
         CAST(NULL AS {d.strtype}) AS phone,
         {d.clean('imei', 256)} AS imei,
         CAST(NULL AS {d.strtype}) AS mac,
         jail AS is_prison_break,
         crack AS is_crack,
         {d.clean('lang', 256)} AS language,
         {d.clean(d.s('tzoff'), 256)} AS timezone,
         {d.clean('zs', 256)} AS attr1,
         CAST(NULL AS {d.strtype}) AS attr2,
         CAST(NULL AS {d.strtype}) AS attr3,
         CAST(NULL AS {d.strtype}) AS attr4,
         CAST(NULL AS {d.strtype}) AS attr5,
         CASE WHEN abs(tzoff) > 172800000 THEN CAST(NULL AS BIGINT)
              ELSE {d.idiv('ct', '1000')} END AS last_update_date,
         ROW_NUMBER() OVER (PARTITION BY app_id, did ORDER BY seq DESC) AS rn
  FROM resolved WHERE dt = 'pl'
) x WHERE rn = 1"""


_register("p11_b_device_upsert", _p11)


# ---------------------------------------------------------------------------
# P12 ID-mapping archive: the 5 dwd_id_* streams the identity stage emits
# (S6/R7, archive/ArchiveKafkaService.java:17-120, main/IdArchiveJob.java:79-95,
# sql/id_archive_tables.sql:9-94)
# ---------------------------------------------------------------------------
def _p12(d: Dialect) -> str:
    # the five mapping tables' key→value directions follow
    # id_archive_tables.sql's 对照关系 exactly: DEVICE deviceMd5→zgDeviceId,
    # USER cuid→zgUserId, DEVICE_ZGID zgDeviceId→zgId, USER_ZGID
    # zgUserId→zgId, ZGID_USER zgId→zgUserId (reverse map)
    return f"""
SELECT archive_type, app_id, map_key, map_id FROM (
  SELECT 'device' AS archive_type, app_id, did AS map_key, zg_did AS map_id
  FROM did_ids
  UNION ALL
  SELECT 'user', app_id, cuid, zg_uid FROM uid_ids
  UNION ALL
  SELECT 'device_zgid', app_id, {d.s('zg_did')}, zg_id FROM device_zgid
  UNION ALL
  SELECT 'user_zgid', app_id, {d.s('zg_uid')}, 300000 + zg_uid FROM uid_ids
  UNION ALL
  SELECT 'zgid_user', app_id, {d.s('(300000 + zg_uid)')}, zg_uid FROM uid_ids
) u"""


_register("p12_id_archive", _p12)


# ---------------------------------------------------------------------------
# P13 per-user visit aggregates: the t_user_detail_sum grain the product
# queries (A5, sql/1.sql:396-657 — visit_times/duration/first-last visit)
# ---------------------------------------------------------------------------
def _p13(d: Dialect) -> str:
    day_id = f"CAST({d.fmt(d.ts('ct'), 'yyyyMMdd')} AS INT)"
    return f"""
SELECT app_id, zg_id,
       COUNT(*) AS n_events,
       COUNT(DISTINCT sid) AS n_sessions,
       CAST(SUM(CASE WHEN dur BETWEEN 0 AND 86400000 THEN dur ELSE 0 END)
            AS BIGINT) AS total_duration,
       MIN(ct) AS first_visit_ms,
       MAX(ct) AS last_visit_ms,
       COUNT(DISTINCT {day_id}) AS n_active_days
FROM resolved
WHERE dt IN ('evt', 'abp', 'mkt')
GROUP BY app_id, zg_id"""


_register("p13_user_visit_stats", _p13)


# ---------------------------------------------------------------------------
# P14 first-touch attribution: first platform/channel/event per user
# (f_user_join first_* columns, sql/1.sql:396-657)
# ---------------------------------------------------------------------------
def _p14(d: Dialect) -> str:
    day_id = f"CAST({d.fmt(d.ts('ct'), 'yyyyMMdd')} AS INT)"
    return f"""
SELECT app_id, zg_id, first_platform, first_utm, first_event, first_day
FROM (
  SELECT app_id, zg_id, pl AS first_platform,
         COALESCE(utm_source, '(none)') AS first_utm,
         COALESCE(event_name, '(none)') AS first_event,
         {day_id} AS first_day,
         ROW_NUMBER() OVER (PARTITION BY app_id, zg_id ORDER BY seq) AS rn
  FROM resolved WHERE dt IN ('evt', 'abp', 'mkt')
) x WHERE rn = 1"""


_register("p14_first_touch", _p14)


# ---------------------------------------------------------------------------
# P15 cohort retention: users first active on day d0 still active at
# d0 + offset (the t_user_active workload; epoch-day buckets keep both
# engines integer-exact)
# ---------------------------------------------------------------------------
def _p15(d: Dialect) -> str:
    day_num = d.idiv("ct", "86400000")
    if d.name == "spark":
        # cohort-day via an unbounded MIN window instead of the
        # aggregate + self-join (guide §2.4): every activity row HAS a
        # cohort row (cohort is derived from activity, inner join ≡
        # window over the same partition), so d0-per-row is identical and
        # the aggregate + SMJ + their exchanges drop out of the plan.
        # Proven by the unchanged DuckDB oracle (join form) at
        # sf0.001/sf0.01.
        return f"""
WITH activity AS (
  SELECT DISTINCT app_id, zg_id, {day_num} AS day_num
  FROM resolved WHERE dt IN ('evt', 'abp')
),
w AS (
  SELECT app_id, zg_id, day_num,
         MIN(day_num) OVER (PARTITION BY app_id, zg_id) AS d0
  FROM activity
)
SELECT app_id, d0 AS cohort_day,
       CAST(day_num - d0 AS INT) AS day_offset,
       COUNT(DISTINCT zg_id) AS n_users
FROM w
GROUP BY app_id, d0, day_num - d0"""
    return f"""
WITH activity AS (
  SELECT DISTINCT app_id, zg_id, {day_num} AS day_num
  FROM resolved WHERE dt IN ('evt', 'abp')
),
cohort AS (
  SELECT app_id, zg_id, MIN(day_num) AS d0 FROM activity GROUP BY app_id, zg_id
)
SELECT a.app_id, c.d0 AS cohort_day,
       CAST(a.day_num - c.d0 AS INT) AS day_offset,
       COUNT(DISTINCT a.zg_id) AS n_users
FROM activity a
JOIN cohort c ON c.app_id = a.app_id AND c.zg_id = a.zg_id
GROUP BY a.app_id, c.d0, a.day_num - c.d0"""


_register("p15_retention_cohort", _p15)


# ---------------------------------------------------------------------------
# P16 event funnel: view → click → purchase per user, ordered by time
# (the product-analytics flagship; step N counts require step N-1's
# timestamp — expressed as successive min-over joins, shuffle-keyed on
# (app_id, zg_id) throughout so all three steps co-partition)
# ---------------------------------------------------------------------------
def _p16(d: Dialect) -> str:
    if d.name == "spark":
        # Single-pass form (guide §2.4: remove shuffles outright): the
        # successive min-over joins re-keyed the SAME (app_id, zg_id)
        # grain three times — 3 scans of e, 5 joins, 6 exchanges. Three
        # stacked unbounded MIN windows over one partitioning compute
        # t1→t2→t3 in ONE pass (one exchange + one shared sort), and the
        # per-user rollup reuses that partitioning exchange-free. A step-N
        # timestamp is NULL exactly when the join form has no row (CASE
        # comparison against a NULL prior step is NULL), so COUNT(tN)
        # equals the join form's COUNT(sN.tN) — proven by the unchanged
        # DuckDB oracle (rows + schema + value hash at sf0.001/sf0.01).
        return """
WITH e AS (
  SELECT app_id, zg_id, event_type, ct FROM resolved
  WHERE dt IN ('evt', 'abp') AND event_type IN ('view', 'click', 'purchase')
),
w1 AS (
  SELECT app_id, zg_id, event_type, ct,
         MIN(CASE WHEN event_type = 'view' THEN ct END)
             OVER (PARTITION BY app_id, zg_id) AS t1
  FROM e
),
w2 AS (
  SELECT app_id, zg_id, event_type, ct, t1,
         MIN(CASE WHEN event_type = 'click' AND ct >= t1 THEN ct END)
             OVER (PARTITION BY app_id, zg_id) AS t2
  FROM w1
),
w3 AS (
  SELECT app_id, zg_id, t1, t2,
         MIN(CASE WHEN event_type = 'purchase' AND ct >= t2 THEN ct END)
             OVER (PARTITION BY app_id, zg_id) AS t3
  FROM w2
),
per_user AS (
  SELECT app_id, zg_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
  FROM w3 GROUP BY app_id, zg_id
)
SELECT app_id,
       COUNT(t1) AS step_view,
       COUNT(t2) AS step_click,
       COUNT(t3) AS step_purchase
FROM per_user WHERE t1 IS NOT NULL
GROUP BY app_id"""
    return """
WITH e AS (
  SELECT app_id, zg_id, event_type, ct FROM resolved
  WHERE dt IN ('evt', 'abp') AND event_type IN ('view', 'click', 'purchase')
),
s1 AS (
  SELECT app_id, zg_id, MIN(ct) AS t1 FROM e
  WHERE event_type = 'view' GROUP BY app_id, zg_id
),
s2 AS (
  SELECT e.app_id, e.zg_id, MIN(e.ct) AS t2
  FROM e JOIN s1 ON s1.app_id = e.app_id AND s1.zg_id = e.zg_id
  WHERE e.event_type = 'click' AND e.ct >= s1.t1
  GROUP BY e.app_id, e.zg_id
),
s3 AS (
  SELECT e.app_id, e.zg_id, MIN(e.ct) AS t3
  FROM e JOIN s2 ON s2.app_id = e.app_id AND s2.zg_id = e.zg_id
  WHERE e.event_type = 'purchase' AND e.ct >= s2.t2
  GROUP BY e.app_id, e.zg_id
)
SELECT s1.app_id,
       COUNT(*) AS step_view,
       COUNT(s2.t2) AS step_click,
       COUNT(s3.t3) AS step_purchase
FROM s1
LEFT JOIN s2 ON s2.app_id = s1.app_id AND s2.zg_id = s1.zg_id
LEFT JOIN s3 ON s3.app_id = s1.app_id AND s3.zg_id = s1.zg_id
GROUP BY s1.app_id"""


_register("p16_funnel", _p16)


# ---------------------------------------------------------------------------
# P17 user-property dictionary get-or-create + annotated EAV rows
# (M3, UserPropAsyncOperator.java:112-260 — the $zg_upid#/$zg_uptp# pattern
# becomes prop_id/prop_type join-result columns; built-in app_user_id = -1,
# UserPropertyTransfer.java:30-33,151-164)
# ---------------------------------------------------------------------------
def _p17(d: Dialect) -> str:
    return """
SELECT app_id, zg_id, property_name, property_value, property_id,
       CAST(property_data_type AS INT) AS property_data_type
FROM (
  SELECT /*+ BROADCAST(dct) */
         m.app_id, m.zg_id, substring(m.prop_name, 2) AS property_name,
         m.prop_value AS property_value, dct.prop_id AS property_id,
         dct.prop_type AS property_data_type,
         ROW_NUMBER() OVER (PARTITION BY m.app_id, m.zg_id, m.prop_name
                            ORDER BY m.seq DESC) AS rn
  FROM usr_props_melted m
  JOIN user_prop_dict dct ON dct.app_id = m.app_id AND dct.owner = m.owner
                         AND dct.prop_name = m.prop_name
  WHERE m.zg_uid IS NOT NULL
  UNION ALL
  SELECT app_id, zg_id, 'app_user_id', cuid, -1, 1,
         ROW_NUMBER() OVER (PARTITION BY app_id, zg_id ORDER BY seq DESC)
  FROM resolved WHERE dt = 'usr' AND cuid IS NOT NULL
) x WHERE rn = 1"""


_register("p17_user_prop_dict", _p17)


# ---------------------------------------------------------------------------
# P18 device properties: LOOKUP-ONLY dictionary join — unknown props drop
# silently (M4, DevicePropertyOperator.java:46-152)
# ---------------------------------------------------------------------------
def _p18(d: Dialect) -> str:
    return """
SELECT app_id, did, prop_name, prop_value, dp_id, CAST(dp_type AS INT) AS dp_type
FROM (
  SELECT m.app_id, m.did, m.prop_name, m.prop_value, dct.dp_id, dct.dp_type,
         ROW_NUMBER() OVER (PARTITION BY m.app_id, m.did, m.prop_name
                            ORDER BY m.seq DESC) AS rn
  FROM dev_props_melted m
  JOIN device_prop_dict dct ON dct.dp_name = m.prop_name
) x WHERE rn = 1"""


_register("p18_device_props", _p18)


# ---------------------------------------------------------------------------
# P19 event processing high-water marks (A4, EventAsyncOperator.java:180-244:
# max processing time per event id)
# ---------------------------------------------------------------------------
def _p19(d: Dialect) -> str:
    return """
SELECT dct.zg_eid, dct.event_name, COUNT(*) AS n_events,
       MAX(e.ct) AS high_water_ms
FROM events_typed e
JOIN event_dict dct ON dct.app_id = e.app_id AND dct.owner = e.owner_e
                   AND dct.event_name = e.event_name_t
GROUP BY dct.zg_eid, dct.event_name"""


_register("p19_event_highwater", _p19)


# ---------------------------------------------------------------------------
# W1 upsert writer end-to-end: the b_user table written via the real sink
# (sinks.upsert_table) in two seq-split batches — merge-on-write must land
# exactly where the single-shot p10 dedup lands, so it shares p10's oracle.
# ---------------------------------------------------------------------------
def _w1_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from zg_etl_spark.sinks import upsert_table

    rows = spark_pipeline_df(spark, sf_dir, b_user_rows_sql(SPARK))
    mid = rows.selectExpr("percentile_approx(seq, 0.5) AS m").first().m
    work = tempfile.mkdtemp(prefix="zg_w1_")
    path = os.path.join(work, "b_user")
    try:
        for part in (rows.filter(rows.seq <= mid), rows.filter(rows.seq > mid)):
            upsert_table(
                spark, part, path,
                keys=["app_id", "device_id", "zg_id"], order_col="seq",
                partition_cols=["app_id"],
            )
        return (
            spark.read.parquet(path)
            .select("app_id", "device_id", "zg_id", "user_id", "begin_date", "platform")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["w1_upsert_writer"] = _w1_run
ORACLE["w1_upsert_writer"] = duck_pipeline_sql(_p10(DUCK))


# ---------------------------------------------------------------------------
# W2 bucketed co-located join: lineitem and orders written bucketed on the
# join key (the Spark analog of Doris's colocated tables / the pre-keyed
# Kafka partitioning the reference relies on), then joined with NO exchange
# on either side — the fact-to-fact join strategy at 100 TB, where neither
# side broadcasts and a repeated shuffle of the big fact is the bottleneck.
# tests/test_plan_quality.py asserts the plan has exactly one Exchange (the
# final group-by), none under the join.
# ---------------------------------------------------------------------------
_W2_BUCKETS = 8


def w2_joined(spark: SparkSession, sf_dir: str, tag: str):
    """Build the bucketed tables and return (joined_df, cleanup_fn)."""
    import shutil
    import tempfile

    from zg_etl_spark.sources.tables import load_table

    work = tempfile.mkdtemp(prefix="zg_w2_")
    names = {}
    # materialize only the columns this derived layout serves — column
    # pruning applies to writes too (a 100 TB bucketed projection of 2
    # columns is ~10× cheaper than carrying all 16 through the shuffle-free
    # layout)
    cols = {
        "lineitem": ["l_orderkey", "l_extendedprice"],
        "orders": ["o_orderkey", "o_orderpriority"],
    }
    # sequential on purpose: bucketBy goes through saveAsTable, and
    # concurrent DDL against the embedded Derby metastore hits lock
    # waits that cost far more than the overlap saves (measured 21 s
    # vs 2.5 s on a contended run)
    for tbl, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        name = f"w2_{tbl}_{tag}"
        (
            load_table(spark, sf_dir, tbl)
            .select(*cols[tbl])
            .write.mode("overwrite")
            .bucketBy(_W2_BUCKETS, key)
            .sortBy(key)
            .option("path", f"{work}/{name}")
            .saveAsTable(name)
        )
        names[tbl] = name

    def cleanup() -> None:
        for name in names.values():
            spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(work, ignore_errors=True)

    joined = spark.sql(
        f"""
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM {names['lineitem']} l JOIN {names['orders']} o
  ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority"""
    )
    return joined, cleanup


# the bucketed layout is written ONCE per (session, sf_dir) and queried
# many times — exactly a deployment's pre-bucketed table lifecycle; only
# the first w2 run pays the build (tables dropped at process exit)
_W2_MEMO: dict = {}


def _w2_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import uuid as _uuid

    from zg_etl_spark.session import session_key

    # no broadcast: the point is the co-located big-big join path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        key = (session_key(spark), sf_dir)
        if key not in _W2_MEMO:
            joined, cleanup = w2_joined(spark, sf_dir, _uuid.uuid4().hex[:8])
            atexit.register(cleanup)
            _W2_MEMO[key] = joined
        # the join itself re-executes per call (that is the measured
        # work); only the bucketed-table build is amortized
        return _W2_MEMO[key].localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


QUERIES["w2_bucketed_join"] = _w2_run
ORACLE["w2_bucketed_join"] = """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority"""


# ---------------------------------------------------------------------------
# P20 as-of join: each event picks up the most recent user-property value
# at-or-before its timestamp — the batch restatement of the reference's
# read-current-KV-state-at-event-time semantics (OneIdService-style
# lookups). Spark has no native ASOF JOIN; operators/asof.py implements
# the single-shuffle union + window forward-fill merge. The oracle is
# DuckDB's NATIVE `ASOF LEFT JOIN` — two entirely different formulations
# that must agree row-for-row.
# ---------------------------------------------------------------------------
_P20_UPDATES = """
SELECT app_id, zg_did, ct, value AS last_usr_value FROM (
  SELECT app_id, zg_did, ct, value,
         ROW_NUMBER() OVER (PARTITION BY app_id, zg_did, ct
                            ORDER BY seq DESC) AS rn
  FROM resolved WHERE dt = 'usr') x WHERE rn = 1"""
_P20_EVENTS = "SELECT app_id, zg_did, event_id, ct FROM resolved WHERE dt = 'evt'"


def _p20_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zg_etl_spark.operators.asof import asof_join

    events = spark_pipeline_df(spark, sf_dir, _P20_EVENTS)
    updates = spark_pipeline_df(spark, sf_dir, _P20_UPDATES)
    return asof_join(
        events,
        updates,
        on=["app_id", "zg_did"],
        left_ts="ct",
        right_ts="ct",
        value_cols=["last_usr_value"],
    )


QUERIES["p20_asof_props"] = _p20_run
ORACLE["p20_asof_props"] = duck_pipeline_sql(f"""
SELECT e.app_id, e.zg_did, e.event_id, e.ct, u.last_usr_value
FROM ({_P20_EVENTS}) e
ASOF LEFT JOIN ({_P20_UPDATES}) u
  ON e.app_id = u.app_id AND e.zg_did = u.zg_did AND e.ct >= u.ct""")


# ---------------------------------------------------------------------------
# P21 sink success counters (A3: per-table commit-callback counts,
# DwJob.java:299-310, common/sink/CommitSuccessCallback.java) — the rows
# ROUTED to each of the four analytical sinks, pre-merge (stream-load rows,
# not post-upsert cardinality; the upsert grains are p8-p11). Four counts
# over the already-materialized pipeline spine, unioned — no extra scan of
# the source.
# ---------------------------------------------------------------------------
def _p21(d: Dialect) -> str:
    return """
SELECT 'b_user_event_attr' AS sink_table, COUNT(*) AS n_rows FROM events_typed
UNION ALL
SELECT 'b_user', COUNT(*) FROM resolved
UNION ALL
SELECT 'b_device', COUNT(*) FROM resolved WHERE dt = 'pl'
UNION ALL
SELECT 'b_user_property',
       COUNT(*) + COUNT(CASE WHEN cuid IS NOT NULL THEN 1 END)
FROM resolved WHERE dt = 'usr'"""


_register("p21_sink_counts", _p21)


# ---------------------------------------------------------------------------
# P22 interval (range) join: attribute gate-rejected events (errors + the
# debug side channel — rows that never enter the session-building stream,
# GateProcessFunction.java:46-97) to the device's active session window —
# sessions derived from resolved events (LAG+cumsum, 1 h gap), points
# mapped to zg_did via did_ids. Spark path is the bucket-decomposition
# range join (operators/interval_join.py — one equi-shuffle, no nested
# loop); the oracle is DuckDB's native inequality join.
# ---------------------------------------------------------------------------
_P22_GAP_MS = 3_600_000

_P22_SESSIONS = f"""
SELECT app_id, zg_did, MIN(ct) AS session_start, MAX(ct) AS session_end,
       MIN(ct) - {_P22_GAP_MS} AS win_lo, MAX(ct) + {_P22_GAP_MS} AS win_hi
FROM (
  SELECT app_id, zg_did, ct,
         SUM(brk) OVER (PARTITION BY app_id, zg_did ORDER BY ct
                        ROWS UNBOUNDED PRECEDING) AS sess_idx
  FROM (
    SELECT app_id, zg_did, ct,
           CASE WHEN ct - LAG(ct) OVER (PARTITION BY app_id, zg_did
                                        ORDER BY ct) > {_P22_GAP_MS}
                THEN 1 ELSE 0 END AS brk
    FROM resolved) m) a
GROUP BY app_id, zg_did, sess_idx"""

_P22_ERRORS = """
SELECT g.app_id, d.zg_did, g.event_id AS err_event_id, g.ct AS err_ct,
       g.error_code, g.debug
FROM gated g JOIN did_ids d ON d.app_id = g.app_id AND d.did = g.did
WHERE g.error_code <> 0 OR g.debug = 1"""


def _p22_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from zg_etl_spark.operators.interval_join import interval_join

    errors = spark_pipeline_df(spark, sf_dir, _P22_ERRORS)
    sessions = spark_pipeline_df(spark, sf_dir, _P22_SESSIONS)
    # attribution window = session ± gap (most sessions in the synthetic
    # feed are single events, i.e. zero-length intervals; the widened
    # window is the meaningful grain AND exercises overlapping intervals —
    # a point inside two adjacent windows matches both, per join semantics)
    return interval_join(
        errors,
        sessions,
        on=["app_id", "zg_did"],
        ts_col="err_ct",
        start_col="win_lo",
        end_col="win_hi",
        bucket_width=_P22_GAP_MS,
    )


QUERIES["p22_session_attribution"] = _p22_run
ORACLE["p22_session_attribution"] = duck_pipeline_sql(f"""
, p22_sess AS ({_P22_SESSIONS}),
p22_err AS ({_P22_ERRORS})
SELECT e.app_id, e.zg_did, e.err_event_id, e.err_ct, e.error_code, e.debug,
       s.session_start, s.session_end, s.win_lo, s.win_hi
FROM p22_err e JOIN p22_sess s
  ON s.app_id = e.app_id AND s.zg_did = e.zg_did
 AND e.err_ct BETWEEN s.win_lo AND s.win_hi""")


# ---------------------------------------------------------------------------
# P23 ad-conversion click matching (AdvAsyncOperator.java:60-130): stored
# ad clicks (Redis ``adtfad:{click_id}:rawdata``) are consumed EXACTLY ONCE
# by the first conversion event referencing the click id — subsequent
# conversions find the key deleted. Batch form: earliest-conversion-wins
# claim (min seq per click) joined to the click store; unclaimed clicks
# survive with NULL claim columns (= the store's remaining keys), so one
# relation captures both the emitted conversions and the post-run store.
# Scale: the claim dedup is one groupBy on (app_id, click_id); the store
# join is an equi-join on the same key — no per-event KV round-trips.
# ---------------------------------------------------------------------------
def _p23_claims(d: Dialect) -> str:
    """Earliest conversion per (app_id, click_id). Spark: RANK window —
    one exchange replaces the MIN-aggregate exchange + join re-exchange +
    second pass over p23_conv (guide §2.4); RANK (not ROW_NUMBER) so a
    seq tie emits every tied row, exactly the rows seq = MIN(seq) joins
    back. DuckDB keeps the aggregate + self-join form, so the unchanged
    oracle proves the rewrite emits identical rows."""
    if d.name == "spark":
        return """
  SELECT app_id, click_id, event_id, ct FROM (
    SELECT app_id, click_id, event_id, ct,
           RANK() OVER (PARTITION BY app_id, click_id ORDER BY seq) AS rk
    FROM p23_conv
  ) r WHERE rk = 1"""
    return """
  SELECT f.app_id, f.click_id, v.event_id, v.ct
  FROM (SELECT app_id, click_id, MIN(seq) AS claim_seq
        FROM p23_conv GROUP BY app_id, click_id) f
  JOIN p23_conv v ON v.app_id = f.app_id AND v.click_id = f.click_id
                 AND v.seq = f.claim_seq"""


def _p23(d: Dialect) -> str:
    clicks = (
        f"{R.values_sql(R.AD_CLICKS, [])} "
        f"AS s({', '.join(R.AD_CLICK_COLS)})"
    )
    return f"""
WITH p23_conv AS (
  SELECT app_id, 'ck_' || {d.s('(k % 50)')} AS click_id, event_id, seq, ct
  FROM gate_ok WHERE utm_source = 'adwords' AND k IS NOT NULL
),
p23_claims AS ({_p23_claims(d)})
SELECT s.ad_app_id AS app_id, s.ad_click_id AS click_id,
       s.ad_campaign AS campaign,
       c.event_id AS claim_event_id, c.ct AS claim_ct,
       CASE WHEN c.event_id IS NULL THEN 1 ELSE 0 END AS still_in_store
FROM {clicks}
LEFT JOIN p23_claims c
  ON c.app_id = s.ad_app_id AND c.click_id = s.ad_click_id"""


_register("p23_ad_conversion", _p23)


# ---------------------------------------------------------------------------
# P24 first-data-seen (I1 side effect, SetAppIdAndBusinessOperator.java:
# 92-145,194-269): the INSERT IGNORE app/app_create_notice + per-(app,
# platform) hasData flag, as a batch relation — first event time and first
# device per (app_id, pl), anti-join-free (MIN/arg-min in one groupBy).
# ---------------------------------------------------------------------------
def _p24(d: Dialect) -> str:
    return """
SELECT app_id, pl, MIN(seq) AS first_seq, MIN(ct) AS first_ct,
       COUNT(*) AS n_events,
       MIN(CASE WHEN seq = first_seq THEN did END) AS first_did
FROM (
  SELECT app_id, pl, seq, ct, did,
         MIN(seq) OVER (PARTITION BY app_id, pl) AS first_seq
  FROM gate_ok) x
GROUP BY app_id, pl"""


_register("p24_app_first_seen", _p24)


# ---------------------------------------------------------------------------
# W3 stream-load-compat CSV round-trip: the b_user relation exported in the
# reference's stream-load wire shape (tab-separated, nulls as \\N —
# EventAttrRow.java:49, EventAttrTransfer.java:32) and read back typed.
# The read-back rows must equal the p10 relation exactly, proving the
# \\N null convention and the type round-trip are lossless — the compat
# contract a Doris-side consumer of our export relies on.
# ---------------------------------------------------------------------------
def _w3_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from zg_etl_spark.sinks import NULL_TOKEN, export_stream_load_csv

    rows = spark_pipeline_df(spark, sf_dir, _p10(SPARK))
    work = tempfile.mkdtemp(prefix="zg_w3_")
    path = os.path.join(work, "b_user_csv")
    try:
        export_stream_load_csv(rows, path)
        schema = (
            "app_id BIGINT, device_id BIGINT, zg_id BIGINT, user_id BIGINT, "
            "begin_date BIGINT, platform INT"
        )
        return (
            spark.read.schema(schema)
            .option("sep", "\t")
            .option("nullValue", NULL_TOKEN)
            .csv(path)
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["w3_compat_csv_roundtrip"] = _w3_run
ORACLE["w3_compat_csv_roundtrip"] = duck_pipeline_sql(_p10(DUCK))


# ---------------------------------------------------------------------------
# P25 multi-granularity time rollup (the hypertable/continuous-aggregate
# shape serving the t_*/f_* time-series tables, sql/1.sql:396-657): event
# counts + device reach at HOUR, DAY, and WEEK grain in ONE pass — GROUPING
# SETS over three derived buckets expands each row once per grain inside a
# single Expand + shuffle, instead of three scans/aggregations. grain_id
# disambiguates levels via the shared grouping_id bit encoding
# (aggregated-away columns set their bit: 3=hour grain, 5=day, 6=week).
# ---------------------------------------------------------------------------
def _p25(d: Dialect) -> str:
    hour = d.idiv("ct", str(3_600_000))
    day = d.idiv("ct", str(86_400_000))
    week = d.idiv("ct", str(7 * 86_400_000))
    return f"""
SELECT app_id, hour_b, day_b, week_b,
       CAST(GROUPING_ID(app_id, hour_b, day_b, week_b) AS BIGINT) AS grain_id,
       COUNT(*) AS n_events, COUNT(DISTINCT did) AS n_devices
FROM (
  SELECT app_id, did,
         {hour} AS hour_b, {day} AS day_b, {week} AS week_b
  FROM gate_ok) b
GROUP BY GROUPING SETS ((app_id, hour_b), (app_id, day_b), (app_id, week_b))"""


_register("p25_time_rollup", _p25)


# ---------------------------------------------------------------------------
# W4 dynamic partition overwrite: the RANGE(begin_day_id)-partition rewrite
# path (schema.sql:342-388) — write the day-partitioned event counts, then
# re-write ONLY the latest day's partition with corrected rows; untouched
# days must survive byte-identical (a 100 TB backfill rewrites days, not
# the table). The read-back equals the day-level counts where the latest
# day carries the corrected (doubled) values — stated in the oracle.
# ---------------------------------------------------------------------------
_W4_DAYS = f"""
SELECT app_id, {DUCK.idiv('ct', '86400000')} AS day_id, COUNT(*) AS n
FROM gate_ok GROUP BY app_id, {DUCK.idiv('ct', '86400000')}"""


def _w4_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from zg_etl_spark.sinks import write_partitioned

    days = spark_pipeline_df(
        spark,
        sf_dir,
        f"""
SELECT app_id, {SPARK.idiv('ct', '86400000')} AS day_id, COUNT(*) AS n
FROM gate_ok GROUP BY app_id, {SPARK.idiv('ct', '86400000')}""",
    ).localCheckpoint(eager=True)
    work = tempfile.mkdtemp(prefix="zg_w4_")
    path = os.path.join(work, "day_counts")
    try:
        write_partitioned(days, path, ["day_id"], mode="overwrite", dynamic=False)
        # the "correction" batch: latest day only, counts doubled — dynamic
        # overwrite must replace exactly that partition
        from pyspark.sql import functions as F

        latest = days.agg(F.max("day_id").alias("m")).first().m
        corrected = (
            days.filter(F.col("day_id") == latest)
            .withColumn("n", F.col("n") * 2)
        )
        write_partitioned(corrected, path, ["day_id"], mode="overwrite", dynamic=True)
        return (
            spark.read.parquet(path)
            .select("app_id", "day_id", "n")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["w4_partition_overwrite"] = _w4_run
ORACLE["w4_partition_overwrite"] = duck_pipeline_sql(f"""
, w4_days AS ({_W4_DAYS}),
w4_latest AS (SELECT MAX(day_id) AS m FROM w4_days)
SELECT app_id, day_id,
       CASE WHEN day_id = (SELECT m FROM w4_latest) THEN n * 2 ELSE n END AS n
FROM w4_days""")


# ---------------------------------------------------------------------------
# P26 error detail docs (A2, GateProcessFunction.java:136-180 +
# IdResultProcessFunction.java:194-309): alongside the error COUNTERS (p1),
# the DQ channel carries md5-keyed detail documents — one per distinct
# error shape — so repeated identical failures dedup to one doc with a
# count. md5 is engine-portable, so the fingerprints hash-match.
# ---------------------------------------------------------------------------
def _p26(d: Dialect) -> str:
    return """
SELECT app_id, error_code,
       md5(CONCAT_WS('|', CAST(app_id AS STRING), CAST(error_code AS STRING),
                     COALESCE(event_name, ''), COALESCE(sdk, ''),
                     COALESCE(pl, ''))) AS detail_fp,
       COUNT(*) AS n_occurrences,
       MIN(seq) AS first_seq
FROM gated WHERE error_code <> 0
GROUP BY app_id, error_code, event_name, sdk, pl""".replace(
        "AS STRING", "AS STRING" if d.name == "spark" else "AS VARCHAR"
    )


_register("p26_error_details", _p26)


# ---------------------------------------------------------------------------
# P27 per-user lifetime profile — the t_user_detail / f_user_all shape
# (sql/1.sql:467-510, 590-641): first/last visit, span, visit_times,
# duration, is_registered, first/current version + channel, first-visit
# utm set, first website/referrer — in ONE aggregation pass via
# min_by/max_by (arg-min/arg-max on the unique seq — no self-join, no
# window over the full history, one shuffle on zg_id). Nullable sources
# wrap in COALESCE('') so both engines' arg-extrema see the same value.
# ---------------------------------------------------------------------------
def _p27(d: Dialect) -> str:
    fn_min = "MIN_BY" if d.name == "spark" else "ARG_MIN"
    fn_max = "MAX_BY" if d.name == "spark" else "ARG_MAX"
    website = "regexp_extract(COALESCE(ref, ''), 'https?://([^/]+)', 1)"
    return f"""
SELECT app_id, zg_id,
       MIN(ct) AS first_visit_ct, MAX(ct) AS last_visit_ct,
       MAX(ct) - MIN(ct) AS lifetime_ms,
       COUNT(*) AS n_events,
       COUNT(DISTINCT sid) AS visit_times,
       CAST(SUM(CASE WHEN dur BETWEEN 0 AND 86400000 THEN dur ELSE 0 END)
            AS BIGINT) AS duration,
       CAST(MAX(CASE WHEN cuid IS NOT NULL THEN 1 ELSE 0 END) AS INT)
           AS is_registered,
       {fn_min}(COALESCE(vn, ''), seq) AS first_version,
       {fn_max}(COALESCE(vn, ''), seq) AS current_app_version,
       {fn_min}(COALESCE(cn, ''), seq) AS first_channel,
       {fn_max}(COALESCE(cn, ''), seq) AS current_app_channel,
       {fn_min}(COALESCE(utm_source, ''), seq) AS utm_source_f,
       {fn_min}(COALESCE(utm_campaign, ''), seq) AS utm_campaign_f,
       {fn_min}(COALESCE(utm_content, ''), seq) AS utm_content_f,
       {fn_min}({website}, seq) AS first_website,
       {fn_min}(COALESCE(ref, ''), seq) AS first_referrer_url,
       {fn_max}(COALESCE(ref, ''), seq) AS current_ref,
       {fn_min}(pl, seq) AS first_platform,
       {fn_max}(pl, seq) AS current_platform
FROM resolved
GROUP BY app_id, zg_id"""


_register("p27_user_profile", _p27)


# ---------------------------------------------------------------------------
# P28 gate coverage: per (ak, business, error_code) accounting — exercises
# the filter.aks silent drop (ak_drop never appears), AK_NONE vs schema vs
# blacklist attribution order, and the business whitelist normalization
# (biz_x survives only for company 12; everything else resets to '')
# (GateFlatMapFunction.java:102-213, CheckJSONSchemaUtil.java:55-78)
# ---------------------------------------------------------------------------
def _p28(d: Dialect) -> str:
    return """
SELECT ak, business, error_code, COUNT(*) AS n
FROM gated GROUP BY ak, business, error_code"""


_register("p28_gate_business", _p28)


# ---------------------------------------------------------------------------
# P29 dictionary governance: per-app event-resolution outcomes — exercises
# the event blacklist (1020102, EventAsyncOperator.java:317-332), the
# auto-create-disabled app with a preseeded dictionary (1020103), and the
# per-app event cap (1020104); n_events counts the distinct names behind
# each outcome
# ---------------------------------------------------------------------------
def _p29(d: Dialect) -> str:
    return """
SELECT app_id, event_error_code, COUNT(*) AS n,
       COUNT(DISTINCT event_name_t) AS n_events
FROM events_dicted GROUP BY app_id, event_error_code"""


_register("p29_event_resolution", _p29)


# ---------------------------------------------------------------------------
# P30 search-keyword extraction: the full 8-engine table with the
# first-in-URL param-name walk and cleanKeyword — one row per (engine,
# raw keyword) over every referrer in the batch. Covers the baidu
# wd/word/kw name set, case-insensitive param match (?Q=), percent-encoded and
# double-encoded values kept RAW (the reference stores non-Chinese
# keywords undecoded — UrlDecoder.java:48-71), quote stripping, and
# engine-without-keyword rows (SearchKeywordParser.java:36-163)
# ---------------------------------------------------------------------------
def _p30(d: Dialect) -> str:
    term = SK.clean_keyword(d, SK.term_case(d, "ref", "search_engine"))
    return f"""
SELECT search_engine, keyword, COUNT(*) AS n,
       COUNT(DISTINCT app_id) AS n_apps
FROM (
  SELECT app_id, search_engine, {term} AS keyword
  FROM (SELECT app_id, ref, {SK.engine_case(d, 'ref')} AS search_engine
        FROM resolved WHERE ref IS NOT NULL) r
) x
GROUP BY search_engine, keyword"""


_register("p30_search_keywords", _p30)


# ---------------------------------------------------------------------------
# P31 ad conversion attribution (AdvJob's gate-side chain): each `evt` row
# is attributed to the LATEST prior ad touch of the same (app, zgid) — the
# reference's `adtfuser:{app}:{zgid}` max-ct lookup + `adtfdata` payload
# (AdvConvertEventFlatMapFunction.java:188-211) — then matched against the
# ads_link_event rules: conversion event + attribution window
# (`ct - touch_ct <= window*1000`, :211) + frequency 0=first/1=every
# (:289-300, the `frequencyKey` first-send gate). Touches are the batch's
# own `mkt` sub-records (dt='mkt' — marketing/ad touch rows), lid = k % 5.
# Per-event UTM overrides (AdvAddUtmFlatMapFunction.java:108-155) join in
# as utm_source_adv. The rule-level matchJson property predicates are
# deployment config and not modeled.
#
# Scale shape: the latest-touch lookup is NOT a pair join (that fans out
# O(conversions × touches-per-user)) — touches and conversions union into
# one (app, zgid)-partitioned stream and the touch forward-fills via
# last_value IGNORE NULLS: ONE shuffle total, rows ∝ events. Touches at
# the same ct sort before conversions (inclusive `touch_ct <= ct`), and
# among equal-ct touches the highest seq wins — the exact tie-break of
# the reference's max-ct Redis lookup. Rules/overrides broadcast.
# ---------------------------------------------------------------------------
def _p31(d: Dialect) -> str:
    rules = R.values_sql(R.ADS_LINK_RULES, R.ADS_LINK_COLS)
    utm = R.values_sql(R.UTM_OVERRIDES, R.UTM_OVERRIDE_COLS)
    w = (
        "(PARTITION BY app_id, zg_id ORDER BY ct, is_touch DESC, seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    t_lid = d.last_ignore_nulls("CASE WHEN is_touch = 1 THEN lid END", w)
    t_ct = d.last_ignore_nulls("CASE WHEN is_touch = 1 THEN ct END", w)
    return f"""
SELECT app_id, event_name, lid, frequency, utm_source_adv,
       COUNT(*) AS n_conversions, COUNT(DISTINCT zg_id) AS n_users
FROM (
  SELECT m.*, u.u_source AS utm_source_adv,
         CASE WHEN m.frequency = 0
              THEN ROW_NUMBER() OVER (
                     PARTITION BY m.app_id, m.event_name, m.lid, m.zg_id
                     ORDER BY m.ct, m.seq)
              ELSE 1 END AS conv_rank
  FROM (
    SELECT c.app_id, c.event_name, c.zg_id, c.ct, c.seq, c.lid,
           l.frequency
    FROM (
      SELECT app_id, zg_id, ct, seq, event_name, is_touch,
             {t_lid} AS lid, {t_ct} AS touch_ct
      FROM (
        SELECT app_id, zg_id, ct, seq, event_name, 0 AS is_touch,
               CAST(NULL AS BIGINT) AS lid
        FROM resolved WHERE dt = 'evt'
        UNION ALL
        SELECT app_id, zg_id, ct, seq, CAST(NULL AS {d.strtype}), 1, k % 5
        FROM resolved WHERE dt = 'mkt' AND k IS NOT NULL
      ) s
    ) c
    JOIN {rules} AS l(r_lid, conv_event, window_sec, frequency)
      ON l.r_lid = c.lid AND l.conv_event = c.event_name
    WHERE c.is_touch = 0 AND c.ct - c.touch_ct <= l.window_sec * 1000
  ) m
  LEFT JOIN {utm} AS u(u_event, u_source, u_medium, u_campaign)
         ON u.u_event = m.event_name
) x
WHERE conv_rank = 1 OR frequency = 1
GROUP BY app_id, event_name, lid, frequency, utm_source_adv"""


_register("p31_adv_attribution", _p31)


# ---------------------------------------------------------------------------
# P32 synthesized sub-records (I6, IdResultProcessFunction.java:29-192):
# after the ID stages every message's data[] gains (a) one `zgid` record
# per distinct ($zg_did,$zg_uid,$zg_zgid) composite, (b) one `pl` record
# carrying $zg_did + $dv='zhuge.io', (c) one `usr` record per distinct
# $cuid — this query is the router's post-I6 input: original sub-records
# UNION ALL the synthesized ones (each batch row is a 1-sub-record
# message, so the per-message composite/cuid dedup is per-row). The
# fan-out is a union of narrow projections of the SAME scan — Spark
# reuses the exchange; no extra shuffle.
# ---------------------------------------------------------------------------
def _p32(d: Dialect) -> str:
    null_s = f"CAST(NULL AS {d.strtype})"
    return f"""
SELECT dt, app_id, COUNT(*) AS n_records,
       COUNT(DISTINCT zg_id) AS n_zgids,
       COUNT(cuid) AS n_with_cuid,
       CAST(SUM(CASE WHEN dv_syn = 'zhuge.io' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_zhuge_marker
FROM (
  SELECT dt, app_id, zg_id, cuid, dv AS dv_syn FROM resolved
  UNION ALL
  SELECT 'zgid' AS dt, app_id, zg_id, cuid, {null_s} AS dv_syn FROM resolved
  UNION ALL
  SELECT 'pl' AS dt, app_id, zg_id, {null_s} AS cuid,
         'zhuge.io' AS dv_syn FROM resolved
  UNION ALL
  SELECT 'usr' AS dt, app_id, zg_id, cuid, {null_s} AS dv_syn
  FROM resolved WHERE cuid IS NOT NULL
) x
GROUP BY dt, app_id"""


_register("p32_synthesized_records", _p32)


# ---------------------------------------------------------------------------
# P33 User-Agent parsing (E2, UserAgentParser.java:29-280): a REAL parser
# over raw UA strings — ordered regex tables (Edge before Chrome before
# Safari, iPad before iPhone, tablet = Android minus Mobile token), major
# browser version only, iOS 16_6 → 16.6 normalization, UNKNOWN defaults.
# Runs JVM-side as CASE/regexp chains (functions/ua_parser.py), no UDF;
# the same table renders the DuckDB oracle.
# ---------------------------------------------------------------------------
def _p33(d: Dialect) -> str:
    from zg_etl_spark.functions import ua_parser as UP
    from zg_etl_spark.operators.domain import ua_real_case

    return f"""
SELECT os_family, os_version, browser, browser_major, device_type, brand,
       COUNT(*) AS n, COUNT(DISTINCT app_id) AS n_apps
FROM (
  SELECT app_id,
         {UP.os_family(d, 'ua_real')} AS os_family,
         {UP.os_version(d, 'ua_real')} AS os_version,
         {UP.browser(d, 'ua_real')} AS browser,
         {UP.browser_major(d, 'ua_real')} AS browser_major,
         {UP.device_type(d, 'ua_real')} AS device_type,
         {UP.brand(d, 'ua_real')} AS brand
  FROM (SELECT app_id, {ua_real_case(d)} AS ua_real FROM resolved) r0
  WHERE ua_real IS NOT NULL
) x
GROUP BY os_family, os_version, browser, browser_major, device_type, brand"""


_register("p33_ua_parse", _p33)


# ---------------------------------------------------------------------------
# P34 t_user_duration (sql/1.sql:430-447): per (zg_id, day, period) visit
# duration + times, with yearweek/yearmonth buckets — the remaining A5
# aggregate table. `period` is the within-day slot the product rolls
# sessions into (morning/afternoon/evening from the event hour). One
# map-side-combined groupBy on (zg_id, day) grain.
# ---------------------------------------------------------------------------
def _p34(d: Dialect) -> str:
    ts_ct = d.ts("ct")
    day_id = f"CAST({d.fmt(ts_ct, 'yyyyMMdd')} AS INT)"
    hour = f"CAST({d.fmt(ts_ct, 'HH')} AS INT)"
    dref = d.date_sub(f"CAST({ts_ct} AS DATE)", 1)
    return f"""
SELECT zg_id, day_id, period,
       CAST(SUM(CASE WHEN dur BETWEEN 0 AND 86400000 THEN dur ELSE 0 END)
            AS BIGINT) AS duration,
       CAST(COUNT(*) AS INT) AS times,
       yearweek, yearmonth, platform
FROM (
  SELECT zg_id, {day_id} AS day_id,
         CASE WHEN {hour} < 6 THEN 'night'
              WHEN {hour} < 12 THEN 'morning'
              WHEN {hour} < 18 THEN 'afternoon'
              ELSE 'evening' END AS period,
         dur,
         CAST({d.yw_java(dref)} AS INT) AS yearweek,
         CAST({d.fmt(ts_ct, 'yyyyMM')} AS INT) AS yearmonth,
         CAST(pl_id AS INT) AS platform
  FROM resolved WHERE dt IN ('evt', 'abp', 'mkt')
) x
GROUP BY zg_id, day_id, period, yearweek, yearmonth, platform"""


_register("p34_user_duration", _p34)


# ---------------------------------------------------------------------------
# P35 b_user_anonymous view (sql/1.sql:643-654): per zgid, the max bound
# user id and the 匿名/实名 (anonymous/identified) classification over the
# b_user mapping rows.
# ---------------------------------------------------------------------------
def _p35(d: Dialect) -> str:
    # one groupBy, no self-join: attaching every bound_cuid row of the
    # (app, zgid) group to every device row and then taking MAX(cuid) is
    # exactly MAX(bound_cuid) over the group's own rows — the join only
    # added a shuffle and a devices×bindings fan-out
    return """
SELECT app_id, zg_id, MAX(bound_cuid) AS user_id,
       CASE WHEN MAX(bound_cuid) IS NULL THEN '匿名' ELSE '实名' END AS is_anonymous
FROM device_zgid
GROUP BY app_id, zg_id"""


_register("p35_user_anonymous", _p35)


# ---------------------------------------------------------------------------
# P36 event↔platform sets (EventAsyncOperator.java:420-497): the
# idempotent `event_platform(event_id, platform)` relation — INSERT
# IGNORE on every observed pair — plus the per-event platform count.
# A DISTINCT over two low-cardinality columns: map-side partial dedup,
# one tiny shuffle.
# ---------------------------------------------------------------------------
def _p36(d: Dialect) -> str:
    return """
SELECT zg_eid, CAST(pl_id AS INT) AS platform,
       COUNT(*) AS n_observations
FROM events_dicted WHERE event_error_code = 0
GROUP BY zg_eid, pl_id"""


_register("p36_event_platforms", _p36)


# ---------------------------------------------------------------------------
# P37 per-user per-day per-event detail rollup — the t_user_detail_sum
# column family (sql/1.sql:396-657): event counts, summed duration, and
# the first/last event time inside each (user, day, event) cell. One
# map-side-combined groupBy on the natural (app_id, zg_id) shuffle key;
# day comes from the same begin_day_id bucketing as the wide table.
# ---------------------------------------------------------------------------
def _p37(d: Dialect) -> str:
    day_id = f"CAST({d.fmt(d.ts('ct'), 'yyyyMMdd')} AS INT)"
    return f"""
SELECT app_id, zg_id, {day_id} AS day_id, event_name,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN dur BETWEEN 0 AND 86400000 THEN dur
                     ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS total_duration,
       MIN(ct) AS first_ct, MAX(ct) AS last_ct
FROM resolved
WHERE dt IN ('evt', 'abp') AND event_name IS NOT NULL
GROUP BY app_id, zg_id, {day_id}, event_name"""


_register("p37_user_detail_sum", _p37)


# ---------------------------------------------------------------------------
# P38 per-user first/follow ad source — AdvLidAndUserFirstEndFlatMapFunction
# (operator/gate/AdvLidAndUserFirstEndFlatMapFunction.java:57-61): the
# `_首次广告来源` (first ad source) and `_后续投放链接` (follow link)
# user properties it maintains from the max-ct touch store. The stored
# encoding is "first::latest" (:296-304): `first` is STICKY — the
# lid,lname of the user's first-ever touch, carried forward as
# split("::")[0] on every update — and the follow slot holds the LATEST
# touch but only when it DIFFERS from the first
# (`!lastLidLname.equals(thisLidLname)` — a latest touch equal to the
# first collapses the value back to just "first", erasing any
# intermediate different touches; the usr property is only written when
# folLname is non-empty, :503-508). fol_lid is therefore
# latest-if-different-else-NULL, not a plain "last". Our lname is a
# function of lid, so the lid,lname string equality reduces to lid
# equality. One (app_id, zg_id) shuffle serves both windows and the
# final aggregate.
# ---------------------------------------------------------------------------
def _p38(d: Dialect) -> str:
    return """
SELECT app_id, zg_id, first_lid, last_lid,
       CASE WHEN last_lid <> first_lid THEN last_lid END AS fol_lid,
       n_touches
FROM (
  SELECT app_id, zg_id,
         MAX(CASE WHEN rf = 1 THEN lid END) AS first_lid,
         MAX(CASE WHEN rl = 1 THEN lid END) AS last_lid,
         MAX(n_touches) AS n_touches
  FROM (
    SELECT app_id, zg_id, lid,
           ROW_NUMBER() OVER (PARTITION BY app_id, zg_id
                              ORDER BY ct, seq) AS rf,
           ROW_NUMBER() OVER (PARTITION BY app_id, zg_id
                              ORDER BY ct DESC, seq DESC) AS rl,
           COUNT(*) OVER (PARTITION BY app_id, zg_id) AS n_touches
    FROM (SELECT app_id, zg_id, ct, seq, k % 5 AS lid
          FROM resolved WHERE dt = 'mkt' AND k IS NOT NULL) t
  ) w
  WHERE rf = 1 OR rl = 1
  GROUP BY app_id, zg_id
) g"""


_register("p38_adv_user_sources", _p38)


# ---------------------------------------------------------------------------
# P41 ad channel-metadata annotation (AdvLidAndUserFirstEndFlatMapFunction
# .java:387-470 addUserProAndEventPro): for advertising-whitelisted apps
# (registries.ADVERTISING_APPS ~ the `advertisingMap` ak gate, :402), every
# evt row with a prior ad touch gains the touch's channel props — the lid
# (`_广告分析链接ID`), the channel-type id + display name
# (`_广告渠道ID`/`_广告渠道名称`, name table :585-605), and `type$id`
# composite strings for account/campaign/adgroup (`props.put(CHANNEL_…,
# channelType + "$" + id)`, :452-470) — each behind the reference's
# zero/empty gate (an id of 0 adds no prop). Touch payloads derive
# deterministically from the touch's k (the p31 fixture convention).
#
# Scale shape: same forward-fill spine as p31 — touches and conversions
# union into ONE (app_id, zg_id)-partitioned window pass (no pair join,
# rows ∝ events); the name mapping is a codegen CASE, no join at all.
# ---------------------------------------------------------------------------
def _p41(d: Dialect) -> str:
    apps = ", ".join(str(a) for a in R.ADVERTISING_APPS)
    names = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in R.CHANNEL_TYPE_NAMES
    )
    w = (
        "(PARTITION BY app_id, zg_id ORDER BY ct, is_touch DESC, seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    tk = d.last_ignore_nulls("CASE WHEN is_touch = 1 THEN k END", w)
    ctype = (
        "CASE touch_k % 12 "
        + " ".join(
            f"WHEN {i} THEN '{k}'"
            for i, (k, _) in enumerate(R.CHANNEL_TYPE_NAMES)
        )
        + " END"
    )

    def comp(modulus: int) -> str:
        return (
            f"CASE WHEN touch_k % {modulus} <> 0 THEN "
            f"concat({ctype}, '$', CAST(touch_k % {modulus} AS {d.strtype}))"
            " END"
        )

    return f"""
SELECT channel_type, channel_name, lid,
       COUNT(*) AS n_conversions,
       COUNT(DISTINCT zg_id) AS n_users,
       COUNT(DISTINCT account_prop) AS n_accounts,
       COUNT(campaign_prop) AS n_campaign_annotated,
       COUNT(adgroup_prop) AS n_adgroup_annotated,
       MAX(account_prop) AS sample_account_prop
FROM (
  SELECT zg_id, touch_k % 5 AS lid,
         {ctype} AS channel_type,
         CASE {ctype} {names} ELSE '' END AS channel_name,
         {comp(11)} AS account_prop,
         {comp(13)} AS campaign_prop,
         {comp(17)} AS adgroup_prop
  FROM (
    SELECT app_id, zg_id, ct, seq, is_touch, {tk} AS touch_k
    FROM (
      SELECT app_id, zg_id, ct, seq, 0 AS is_touch, CAST(NULL AS BIGINT) AS k
      FROM resolved WHERE dt = 'evt' AND app_id IN ({apps})
      UNION ALL
      SELECT app_id, zg_id, ct, seq, 1, k
      FROM resolved WHERE dt = 'mkt' AND k IS NOT NULL
        AND app_id IN ({apps})
    ) s
  ) f
  WHERE is_touch = 0 AND touch_k IS NOT NULL
) a
GROUP BY channel_type, channel_name, lid"""


_register("p41_adv_channel_props", _p41)


# ---------------------------------------------------------------------------
# P42 ad click → device matching cascade (AdvLidAndUserFirstEndFlatMap
# Function.java:1247-1357 setAppIpUaKeys + processDeviceId): app session
# starts (dt='ss') probe the click store through THREE key tiers, first
# hit wins — (1) exact device id, normalized per processDeviceId
# (32-char ids pass through as already-md5'd, everything else is md5'd,
# :1352-1356); (2) fuzzy ip + ToolUtil.uaAnalysis(ua) name:version
# (:1288-1290); (3) iOS only, ip + version alone (:1292-1297, the
# reference reads $os — modeled here via the envelope pl, our bags carry
# no $os). The fuzzy store is ONE namespace holding the single key each
# click WROTE — 'ip + uaAnalysis', downgraded to ':version' for Baidu
# channels 1/4 iPhone clicks (setIpUaMaps :260-273; channel = 1+k%7
# fixture convention), and the WRITE is gated on a non-empty ip
# (StringUtils.isNotEmpty(ip) :275-279 — the probe side builds its key
# unconditionally, like the reference) — so the ip+version probe finds
# ONLY downgraded clicks and requires a non-empty parsed version.
# Clicks are the
# batch's own mkt rows (p31's touch convention); a click carries an
# exact key only when k % 3 = 0, so every tier is populated. The store
# keeps the LATEST click per key (max ct, seq tie-break) — the redis
# max-ct overwrite semantics.
#
# Scale shape: the three stores are per-key ROW_NUMBER aggregates of the
# click stream (rows ∝ clicks ≪ events — at 100 TB they'd be the
# materialized click tables, built once); the probe side is three
# broadcast-able equi-joins, no inequality join, no fan-out (stores are
# 1 row per key). uaAnalysis is codegen regexp_extract, no UDF.
# ---------------------------------------------------------------------------
def _p42_keyed_sql(d: Dialect) -> str:
    """p42's UA-parsed advertising-apps slice. Only the mkt (click) and
    ss (session-start) rows feed the stores/probes, so the slice filters
    to those dt values at the scan."""
    from zg_etl_spark.functions import ua_parser as UP
    from zg_etl_spark.operators.domain import ua_real_case

    apps = ", ".join(str(a) for a in R.ADVERTISING_APPS)
    return f"""
  SELECT app_id, dt, did, ip, k, ct, seq, zg_id, pl,
         {UP.ua_analysis_name(d, 'ua_real')} AS ua_name,
         {UP.ua_analysis_version(d, 'ua_real')} AS ua_ver,
         CASE WHEN instr(ua_real, 'iPhone') > 0 THEN 1 ELSE 0 END
             AS ua_iphone
  FROM (
    SELECT r.app_id, r.dt, r.did, r.ip, r.k, r.ct, r.seq, r.zg_id, r.pl,
           {ua_real_case(d, 'r.')} AS ua_real
    FROM resolved r WHERE r.app_id IN ({apps}) AND r.dt IN ('mkt', 'ss')
  ) s"""


def _p42_body(d: Dialect, keyed: str) -> str:
    """Everything downstream of the keyed slice, referencing it as
    ``keyed``. The Spark runner points ``keyed`` at a materialized view
    (the UA regex parse would otherwise re-run per CTE reference —
    measured 3 subset parses after column pruning); the DuckDB oracle
    inlines it, proving the materialization changes nothing."""
    norm_id = (
        "CASE WHEN length(did) = 32 THEN did ELSE md5(did) END"
    )
    store = (
        "SELECT app_id, {keys}, lid FROM (\n"
        "    SELECT app_id, {keys}, lid,\n"
        "           ROW_NUMBER() OVER (PARTITION BY app_id, {keys}\n"
        "                              ORDER BY ct DESC, seq DESC) AS rn\n"
        "    FROM clicks{where}) t WHERE rn = 1"
    )
    return f"""clicks AS (
  SELECT app_id, ip, ua_name, ua_ver, k % 5 AS lid, ct, seq,
         CASE WHEN (1 + k % 7) IN (1, 4) AND ua_iphone = 1
                   AND ua_ver <> '' THEN ':' || ua_ver
              ELSE ua_name || ':' || ua_ver END AS ua_proc,
         CASE WHEN k % 3 = 0 AND did IS NOT NULL AND did <> ''
              THEN {norm_id} END AS exact_key
  FROM {keyed} WHERE dt = 'mkt' AND k IS NOT NULL
), exact_store AS (
  {store.format(keys="exact_key", where=" WHERE exact_key IS NOT NULL")}
), fz_store AS (
  {store.format(keys="ip, ua_proc",
                where=" WHERE ip IS NOT NULL AND ip <> ''")}
), ss AS (
  SELECT app_id, zg_id, ip, ua_name, ua_ver,
         CASE WHEN pl = 'ios' THEN 1 ELSE 0 END AS is_ios,
         CASE WHEN did IS NOT NULL AND did <> '' THEN {norm_id} END
             AS probe_key
  FROM {keyed} WHERE dt = 'ss'
)
SELECT match_tier, lid,
       COUNT(*) AS n_sessions, COUNT(DISTINCT zg_id) AS n_users
FROM (
  SELECT /*+ BROADCAST(e, u, v) */ s.zg_id,
         COALESCE(e.lid, u.lid,
                  CASE WHEN s.is_ios = 1 THEN v.lid END) AS lid,
         CASE WHEN e.lid IS NOT NULL THEN 'exact'
              WHEN u.lid IS NOT NULL THEN 'ipua'
              WHEN s.is_ios = 1 AND v.lid IS NOT NULL THEN 'ipver'
              ELSE 'none' END AS match_tier
  FROM ss s
  LEFT JOIN exact_store e
         ON e.app_id = s.app_id AND e.exact_key = s.probe_key
  LEFT JOIN fz_store u
         ON u.app_id = s.app_id AND u.ip = s.ip
        AND u.ua_proc = s.ua_name || ':' || s.ua_ver
  LEFT JOIN fz_store v
         ON s.ua_ver <> '' AND v.app_id = s.app_id AND v.ip = s.ip
        AND v.ua_proc = ':' || s.ua_ver
) x
GROUP BY match_tier, lid"""


_P42_VIEW_MEMO: dict = {}


def _p42_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the UA-parsed keyed slice once per (session, sf_dir) —
    the _shared_view discipline — then run the body against the view."""
    from zg_etl_spark.operators.domain import ensure_pipeline_views
    from zg_etl_spark.session import session_key

    ensure_pipeline_views(spark, sf_dir)
    key = session_key(spark)
    if _P42_VIEW_MEMO.get(key) != sf_dir:
        df = spark.sql(_p42_keyed_sql(SPARK)).localCheckpoint(eager=True)
        df.createOrReplaceTempView("p42_keyed")
        _P42_VIEW_MEMO[key] = sf_dir
    return spark.sql("WITH " + _p42_body(SPARK, "p42_keyed"))


QUERIES["p42_adv_click_match"] = _p42_run
ORACLE["p42_adv_click_match"] = duck_pipeline_sql(
    f"WITH keyed AS ({_p42_keyed_sql(DUCK)}),\n{_p42_body(DUCK, 'keyed')}"
)


# ---------------------------------------------------------------------------
# P43 match_json conversion gates (AdvConvertEventFlatMapFunction.java:
# 228-236 + OperatorUtil.compareProValue/compareValue,
# util/OperatorUtil.java:22-308): the per-rule property predicate that
# gates ad-conversion send-back, compiled engine-side by
# functions/match_json.py. p31 models the window/frequency machinery;
# this query isolates the predicate DSL itself — per rule, how many evt
# rows pass, against the label-resolved bag value (`_label` lookup,
# String.valueOf shaping: absent key '', null entry the string 'null').
#
# Scale shape: ONE scan of the evt rows; every rule's predicate is a
# codegen CASE over the row's own columns (conditional SUMs — no join,
# no per-row interpreter, no shuffle beyond the final 9-group agg).
# ---------------------------------------------------------------------------
def _p43(d: Dialect) -> str:
    from zg_etl_spark.functions.match_json import match_predicate, value_str
    from zg_etl_spark.operators.domain import custom_attrs

    bag = {name: val for name, val, _ in custom_attrs(d, q="")}
    # the '$'-prefixed builtin bag compareProValue also probes
    # (OperatorUtil.java:88-91): $eid = event name. Resolution order is
    # the reference's — '_'+label first, '$'+label OVERRIDES when the
    # key exists (statically known per label in the modeled bags)
    builtin = {"$eid": "event_name"}
    agg_cols = []
    for rule_id, label, mj in R.ADS_MATCH_RULES:
        raw = builtin.get("$" + label, bag.get("_" + label))
        v = value_str(d, raw) if raw is not None else "''"  # absent key
        pred = match_predicate(d, mj, v, now_ms="now_ref")
        agg_cols.append(
            f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS match_{rule_id}"
        )
    cols = ",\n       ".join(agg_cols)
    return f"""
SELECT COUNT(*) AS n_evaluated,
       {cols}
FROM resolved WHERE dt = 'evt'"""


_register("p43_adv_match_json", _p43)


# ---------------------------------------------------------------------------
# P44 Apple Search Ads attribution normalization (AdvLidAndUserFirstEnd
# FlatMapFunction.java:959-1044 appleAdDataTransfer + :929-954
# appleASAFeildsMap): the `$apple_ad` payload arrives in TWO wire
# formats — legacy `iad-org-id=123;iad-campaign-id=456;…` key=value
# (quotes stripped, each value trimmed, Long.parseLong failures leave
# the field unset → 0 downstream) and JSON with the same `iad-*` keys —
# dispatched on contains('='). appleASAFeildsMap then adds the fixed
# identity (lname 苹果ASA, lid -2, channel_type 5) and falls back
# adId→creativeSetId when adId is 0 (creativeSetId is never produced by
# appleAdDataTransfer itself, so the fallback yields 0 here — kept
# faithful). Payloads are synthesized per ss row (fixture convention):
# format 0 legacy k=v with adId 0, format 1 JSON, format 2 k=v with
# quoted + malformed-numeric values, format 3 empty.
#
# Scale shape: map-only scan of the ss rows (regexp_extract /
# get_json_object inside codegen, no UDF, no join), one 3-group agg.
# ---------------------------------------------------------------------------
def _p44(d: Dialect) -> str:
    long_re = "^[+-]?[0-9]+$"

    def long0(v: str) -> str:
        # Long.parseLong-gated; absent/garbage → getLongValue's 0
        return (
            f"COALESCE(CASE WHEN {d.rlike(f'({v})', long_re)} "
            f"THEN TRY_CAST({v} AS BIGINT) END, 0)"
        )

    def kv(key: str) -> str:
        # segment whose key CONTAINS `key` (the Java key.contains), value
        # up to ';', quotes removed, trimmed — :966-984
        pat = f"[^;=]*{key}[^;=]*=([^;]*)"
        return f"trim(replace(regexp_extract(payload, {d.re_lit(pat)}, 1), '\"', ''))"

    def js(key: str) -> str:
        return d.json_str_key("payload", key)

    def field(key: str) -> str:
        return (
            f"CASE fmt WHEN 'kv' THEN {long0(kv(key))} "
            f"WHEN 'json' THEN {long0(js(key))} ELSE 0 END"
        )

    s = d.s
    payload = f"""CASE user_id % 4
    WHEN 0 THEN concat('iad-org-id=10', {s('(user_id % 10)')},
        ';iad-campaign-id=2', {s('(user_id % 7)')},
        ';iad-adgroup-id=3;iad-ad-id=0;iad-keyword-id=77',
        ';iad-click-date=2024-01-0', {s('(1 + user_id % 9)')})
    WHEN 1 THEN concat('{{"iad-org-id": 5', {s('(user_id % 10)')},
        ', "iad-campaign-id": ', {s('(user_id % 13)')},
        ', "iad-adgroup-id": 8, "iad-ad-id": ', {s('(user_id % 3)')},
        ', "iad-keyword-id": 9, "iad-click-date": "2024-01-1',
        {s('(user_id % 9)')}, '"}}')
    WHEN 2 THEN concat('iad-org-id="9', {s('(user_id % 5)')},
        '" ;iad-campaign-id=abc;iad-ad-id=4', {s('(user_id % 3)')})
    ELSE '' END"""
    ad_id = field("iad-ad-id")
    creative = "0"  # appleAdDataTransfer never emits creativeSetId
    return f"""
SELECT fmt, MAX(lname) AS lname, MAX(lid) AS lid,
       MAX(channel_type) AS channel_type,
       COUNT(*) AS n_rows,
       CAST(SUM(org_id) AS BIGINT) AS sum_org,
       CAST(SUM(campaign_id) AS BIGINT) AS sum_campaign,
       CAST(SUM(adgroup_id) AS BIGINT) AS sum_adgroup,
       CAST(SUM(keyword_id) AS BIGINT) AS sum_keyword,
       CAST(SUM(channel_ad_id) AS BIGINT) AS sum_channel_ad,
       CAST(SUM(CASE WHEN channel_ad_id = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_adid_zero,
       COUNT(DISTINCT click_date) AS n_click_dates
FROM (
  SELECT fmt,
         '苹果ASA' AS lname, '-2' AS lid, '5' AS channel_type,
         {field("iad-org-id")} AS org_id,
         {field("iad-campaign-id")} AS campaign_id,
         {field("iad-adgroup-id")} AS adgroup_id,
         {field("iad-keyword-id")} AS keyword_id,
         CASE WHEN {ad_id} = 0 THEN {creative} ELSE {ad_id} END
             AS channel_ad_id,
         CASE fmt WHEN 'kv' THEN {kv("iad-click-date")}
              WHEN 'json' THEN {js("iad-click-date")} END AS click_date
  FROM (
    SELECT CASE WHEN payload IS NULL OR trim(payload) = '' THEN 'empty'
                WHEN instr(payload, '=') > 0 THEN 'kv'
                ELSE 'json' END AS fmt,
           payload
    FROM (SELECT {payload} AS payload FROM resolved WHERE dt = 'ss') r
  ) f
) x
GROUP BY fmt"""


_register("p44_apple_asa", _p44)


# ---------------------------------------------------------------------------
# P39 Baidu eqid extraction (service/BaiduKeywordService.java:130-159):
# modern Baidu referrers carry an opaque `eqid` instead of the keyword —
# host must end `.baidu.com`, param length ≥ 32; the keyword itself comes
# from the signed Baidu API behind a 3-tier cache (deployment-external,
# like the crypto private keys — the extraction and routing ARE the
# engine's job). Applies to dt ∈ {evt, ss, se, abp} only
# (KEYWORD_DT_TYPES, :42). keyword_source routes each referrer:
# 'param' (wd/word present) / 'api_lookup_required' (eqid) / 'none'.
# ---------------------------------------------------------------------------
def _p39(d: Dialect) -> str:
    term = SK.clean_keyword(d, SK.term_case(d, "ref", "search_engine"))
    host = "regexp_extract(ref, 'https?://([^/]+)', 1)"
    raw_eqid = "regexp_extract(ref, '[?&]eqid=([^&#]+)', 1)"
    eqid = (
        f"CASE WHEN {host} LIKE '%.baidu.com' AND length({raw_eqid}) >= 32 "
        f"THEN {raw_eqid} END"
    )
    return f"""
SELECT keyword_source, COUNT(*) AS n,
       COUNT(DISTINCT eqid) AS n_eqids,
       COUNT(DISTINCT keyword) AS n_keywords
FROM (
  SELECT CASE WHEN keyword IS NOT NULL THEN 'param'
              WHEN eqid IS NOT NULL THEN 'api_lookup_required'
              ELSE 'none' END AS keyword_source,
         eqid, keyword
  FROM (
    SELECT ref, {eqid} AS eqid, {term} AS keyword
    FROM (SELECT ref, {SK.engine_case(d, 'ref')} AS search_engine
          FROM resolved
          WHERE dt IN ('evt', 'ss', 'se', 'abp') AND ref IS NOT NULL) r
  ) x
) c
GROUP BY keyword_source"""


_register("p39_baidu_eqid", _p39)


# ---------------------------------------------------------------------------
# P40 salted skew-safe counters: the gate success/error counter shapes
# (GateProcessFunction.java:106-124) computed through the SALTED two-stage
# aggregate from operators/skew.py — the rewrite a 1000-executor cluster
# needs when one app produces half the events and AQE can't split a
# hash-aggregate's hot reducer. The contract IS result equality: the
# oracle is the plain one-stage GROUP BY, so the driver hash proves the
# salt pre-aggregation is algebraically invisible.
# ---------------------------------------------------------------------------
def _p40_run(spark, sf_dir: str):
    from pyspark.sql import functions as F

    from zg_etl_spark.operators.skew import salted_agg

    gate_ok = spark_pipeline_df(
        spark, sf_dir, "SELECT app_id, event_type, dur FROM gate_ok"
    )
    return salted_agg(
        gate_ok,
        keys=["app_id", "event_type"],
        aggs={
            "n_events": F.count(F.lit(1)),
            "total_dur": F.sum(F.coalesce(F.col("dur"), F.lit(0))),
        },
    ).selectExpr(
        "app_id", "event_type",
        "CAST(n_events AS BIGINT) AS n_events",
        "CAST(total_dur AS BIGINT) AS total_dur",
    )


QUERIES["p40_salted_counters"] = _p40_run
ORACLE["p40_salted_counters"] = duck_pipeline_sql("""
SELECT app_id, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(COALESCE(dur, 0)) AS BIGINT) AS total_dur
FROM gate_ok GROUP BY app_id, event_type""")


# ---------------------------------------------------------------------------
# W5 small-file compaction: the maintenance rewrite every long-lived
# 100 TB table needs — streaming micro-batches and parallel writers leave
# day partitions fragmented into many tiny files (here: 8 writer tasks ×
# day), and scan cost degrades with file count, not bytes. Compaction
# repartitions BY the partition column so each day's rows land in one
# task → one right-sized file per day (at real scale: hash(day, bucket)
# for multi-file targets), rewriting data layout without changing a row.
# The declared result is the per-day count read back from the COMPACTED
# table — the oracle proves row-identity; tests/test_plan_quality.py
# asserts the file counts actually collapsed.
# ---------------------------------------------------------------------------
def _w5_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import os
    import shutil
    import tempfile

    days = spark_pipeline_df(
        spark,
        sf_dir,
        f"SELECT app_id, did, seq, {SPARK.idiv('ct', '86400000')} AS day_id "
        "FROM gate_ok",
    )
    work = tempfile.mkdtemp(prefix="zg_w5_")
    frag, compact = os.path.join(work, "frag"), os.path.join(work, "compact")
    try:
        # fragmented layout: 8 writer tasks each touch every day
        days.repartition(8).write.partitionBy("day_id").parquet(frag)
        fragmented = spark.read.parquet(frag)
        fragmented.repartition("day_id").write.partitionBy("day_id").parquet(
            compact
        )
        n_frag = len(glob.glob(os.path.join(frag, "day_id=*/part-*")))
        n_compact = len(glob.glob(os.path.join(compact, "day_id=*/part-*")))
        n_days = len(glob.glob(os.path.join(compact, "day_id=*")))
        # assert only what compaction GUARANTEES: one file per day. The
        # n_frag > n_days comparison is data-dependent (single-row days at
        # a tiny/skewed SF may never fragment) — a declared query must not
        # crash on layouts that happened to arrive compact, so the
        # no-actual-fragmentation case is a no-op, not a failure.
        if n_compact != n_days:
            raise AssertionError(
                f"compaction did not collapse files: {n_frag} -> {n_compact} "
                f"over {n_days} days"
            )
        out = (
            spark.read.parquet(compact)
            .groupBy("day_id")
            .count()
            .selectExpr("CAST(day_id AS BIGINT) AS day_id", "count AS n_rows")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return out


QUERIES["w5_compaction"] = _w5_run
ORACLE["w5_compaction"] = duck_pipeline_sql(f"""
SELECT {DUCK.idiv('ct', '86400000')} AS day_id, COUNT(*) AS n_rows
FROM gate_ok GROUP BY {DUCK.idiv('ct', '86400000')}""")


# ---------------------------------------------------------------------------
# W6 delete-sign upsert end-to-end: the reference's Doris rows carry
# __DORIS_DELETE_SIGN__ (EventAttrRow.java:51-53; DorisSinkFactory.java:60
# wires the hidden column) so a replayed compat stream can REMOVE keys, not
# just insert/update them. Three batches against the real sink:
#   1. first half of the b_user rows (by seq)
#   2. second half PLUS delete markers (newest seq) for every key with
#      zg_id % 7 = 0 — including keys whose only rows live in batch 1,
#      proving the delete reaches EXISTING on-disk rows
#   3. re-inserts (newer still) for the zg_id % 14 = 0 subset — a delete
#      followed by a later write must resurrect the key
# The read-back must equal the single-shot p10 dedup minus the deleted
# slice plus the resurrected subset — pure relational oracle, row-identity.
# ---------------------------------------------------------------------------
def _w6_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from zg_etl_spark.sinks import upsert_table

    base = spark_pipeline_df(
        spark, sf_dir, b_user_rows_sql(SPARK)
    ).localCheckpoint(eager=True)  # three batches + markers reuse the spine scan
    stats = base.selectExpr(
        "percentile_approx(seq, 0.5) AS m", "max(seq) AS mx"
    ).first()
    mid, maxseq = stats.m, stats.mx
    live = base.withColumn("_ds", F.lit(False))
    dels = (
        base.filter(F.col("zg_id") % 7 == 0)
        .select("app_id", "device_id", "zg_id")
        .distinct()
        .selectExpr(
            "app_id", "device_id", "zg_id",
            "CAST(NULL AS BIGINT) AS user_id",
            "CAST(NULL AS BIGINT) AS begin_date",
            "CAST(NULL AS INT) AS platform",
            f"CAST({maxseq} + 1 AS BIGINT) AS seq",
            "TRUE AS _ds",
        )
    )
    # resurrect: the key's ORIGINAL rows re-sent newer than the delete —
    # +const preserves the per-key ordering, so keep-latest lands on the
    # same winner p10 picks
    reins = (
        live.filter(F.col("zg_id") % 14 == 0)
        .withColumn("seq", F.col("seq") + F.lit(maxseq + 2))
    )
    work = tempfile.mkdtemp(prefix="zg_w6_")
    path = os.path.join(work, "b_user_ds")
    try:
        for batch in (
            live.filter(F.col("seq") <= mid),
            live.filter(F.col("seq") > mid).unionByName(dels),
            reins,
        ):
            upsert_table(
                spark, batch, path,
                keys=["app_id", "device_id", "zg_id"], order_col="seq",
                partition_cols=["app_id"], delete_col="_ds",
            )
        return (
            spark.read.parquet(path)
            .select("app_id", "device_id", "zg_id", "user_id",
                    "begin_date", "platform")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["w6_delete_sign"] = _w6_run
ORACLE["w6_delete_sign"] = duck_pipeline_sql(
    f"SELECT * FROM ({_p10(DUCK)}) t WHERE zg_id % 7 <> 0 OR zg_id % 14 = 0"
)


# ---------------------------------------------------------------------------
# W7 schema-evolution upsert: a long-lived 100 TB table outlives its schema —
# the reference ALTERs its Doris tables to add columns and newly-loaded rows
# carry them while old rows read back NULL (stream-load with missing columns
# = \N fill, EventAttrRow.java:49). Batch 1 writes the base schema; batch 2
# upserts rows that CARRY A NEW COLUMN (vip_level). unionByName with
# allowMissingColumns is the merge: existing rows surface NULL for the new
# column, and the keep-latest winner decides per key whether its row is
# pre- or post-evolution. Deterministic even/odd seq split so the oracle
# can state the winner's schema generation exactly.
# ---------------------------------------------------------------------------
def _w7_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from zg_etl_spark.sinks import upsert_table

    base = spark_pipeline_df(
        spark, sf_dir, b_user_rows_sql(SPARK)
    ).localCheckpoint(eager=True)
    b1 = base.filter(F.col("seq") % 2 == 0)
    b2 = base.filter(F.col("seq") % 2 == 1).withColumn(
        "vip_level", F.col("zg_id") % 5
    )
    work = tempfile.mkdtemp(prefix="zg_w7_")
    path = os.path.join(work, "b_user_evo")
    try:
        for batch in (b1, b2):
            upsert_table(
                spark, batch, path,
                keys=["app_id", "device_id", "zg_id"], order_col="seq",
                partition_cols=["app_id"],
            )
        return (
            spark.read.parquet(path)
            .select("app_id", "device_id", "zg_id", "user_id",
                    "begin_date", "platform", "vip_level")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["w7_schema_evolution"] = _w7_run
ORACLE["w7_schema_evolution"] = duck_pipeline_sql(f"""
SELECT app_id, device_id, zg_id, user_id, begin_date, platform,
       CASE WHEN seq % 2 = 1 THEN zg_id % 5 END AS vip_level
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY app_id, device_id, zg_id
                               ORDER BY seq DESC) AS rn
  FROM ({b_user_rows_sql(DUCK)}) r
) x WHERE rn = 1""")


# ---------------------------------------------------------------------------
# W8 retention sweep: Doris RANGE tables expire day partitions by policy
# (dynamic_partition.start in schema.sql) — dropped, never scanned. The
# query writes the day-partitioned gate relation, sweeps everything older
# than (max day − 3), and returns the surviving per-day counts; the oracle
# states the same retention window relationally. The sweep itself is
# O(partitions) directory work, the shape that stays constant-cost at
# 100 TB.
# ---------------------------------------------------------------------------
def _w8_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from zg_etl_spark.sinks import drop_expired_partitions, write_partitioned

    days = spark_pipeline_df(
        spark,
        sf_dir,
        f"SELECT app_id, did, seq, {SPARK.idiv('ct', '86400000')} AS day_id "
        "FROM gate_ok",
    )
    work = tempfile.mkdtemp(prefix="zg_w8_")
    path = os.path.join(work, "events_by_day")
    try:
        write_partitioned(days, path, ["day_id"], dynamic=False)
        max_day = days.agg(F.max("day_id")).first()[0]  # single-scalar collect
        drop_expired_partitions(spark, path, "day_id", int(max_day) - 3)
        return (
            spark.read.parquet(path)
            .groupBy("day_id")
            .count()
            .selectExpr("CAST(day_id AS BIGINT) AS day_id", "count AS n_rows")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["w8_retention_sweep"] = _w8_run
ORACLE["w8_retention_sweep"] = duck_pipeline_sql(f"""
SELECT {DUCK.idiv('ct', '86400000')} AS day_id, COUNT(*) AS n_rows
FROM gate_ok
WHERE {DUCK.idiv('ct', '86400000')}
      >= (SELECT MAX({DUCK.idiv('ct', '86400000')}) FROM gate_ok) - 3
GROUP BY {DUCK.idiv('ct', '86400000')}""")


# ---------------------------------------------------------------------------
# W9 partial-column upsert (partition-scoped): the reference's b_device /
# b_user_property sinks run Doris partial_columns stream-load mode
# (DorisSinkFactory.java:60,96,137) — matched keys take the incoming
# values for the carried column subset and KEEP every other column.
# Three batches against an app_id-partitioned b_device slice: (1) seed
# with the full column set (even-seq observations), (2) partial update
# carrying ONLY language/timezone/last_update_date (odd-seq) — matched
# devices keep their batch-1 device_model, new devices insert it NULL,
# (3) delete-sign lane removing device_id % 5 = 0 whole rows
# (EventAttrRow.java:51-53). The merge is partition-scoped: only the
# touched app partitions are read and rewritten (plan-pinned in
# tests/test_decode_sinks.py).
# ---------------------------------------------------------------------------
def _w9_obs_sql(d: Dialect) -> str:
    # the b_device column subset the partial mode exercises
    # (schema.sql:26-66 grain; values per DeviceTransfer.java:30-146)
    return f"""
SELECT app_id, zg_did AS device_id,
       {d.clean('dv', 256)} AS device_model,
       {d.clean('lang', 256)} AS language,
       {d.clean(d.s('tzoff'), 256)} AS timezone,
       {d.idiv('ct', '1000')} AS last_update_date,
       seq
FROM resolved WHERE dt = 'pl'"""


def _w9_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from zg_etl_spark.sinks import partial_upsert_table

    obs = spark_pipeline_df(spark, sf_dir, _w9_obs_sql(SPARK)).localCheckpoint(
        eager=True
    )
    seed = obs.filter(F.col("seq") % 2 == 0)
    part = obs.filter(F.col("seq") % 2 == 1).drop("device_model")
    dels = (
        obs.filter(F.col("device_id") % 5 == 0)
        .select("app_id", "device_id")
        .distinct()
        .selectExpr(
            "app_id", "device_id",
            "CAST(NULL AS STRING) AS language",
            "CAST(NULL AS STRING) AS timezone",
            "CAST(NULL AS BIGINT) AS last_update_date",
            "CAST(9000000000000000000 AS BIGINT) AS seq",  # newer than any
            "TRUE AS _ds",
        )
    )
    work = tempfile.mkdtemp(prefix="zg_w9_")
    path = os.path.join(work, "b_device_partial")
    try:
        partial_upsert_table(
            spark, seed, path, keys=["app_id", "device_id"], order_col="seq",
            update_cols=["device_model", "language", "timezone",
                         "last_update_date"],
            partition_cols=["app_id"],
        )
        partial_upsert_table(
            spark, part, path, keys=["app_id", "device_id"], order_col="seq",
            update_cols=["language", "timezone", "last_update_date"],
            partition_cols=["app_id"],
        )
        partial_upsert_table(
            spark, dels, path, keys=["app_id", "device_id"], order_col="seq",
            update_cols=["language", "timezone", "last_update_date"],
            delete_col="_ds", partition_cols=["app_id"],
        )
        return (
            spark.read.parquet(path)
            .select("app_id", "device_id", "device_model", "language",
                    "timezone", "last_update_date")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


QUERIES["w9_partial_upsert"] = _w9_run
ORACLE["w9_partial_upsert"] = duck_pipeline_sql(f"""
WITH w9_obs AS ({_w9_obs_sql(DUCK)}),
w9_b1 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY app_id, device_id
                                 ORDER BY seq DESC) AS rn
    FROM w9_obs WHERE seq % 2 = 0) x WHERE rn = 1),
w9_b2 AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY app_id, device_id
                                 ORDER BY seq DESC) AS rn
    FROM w9_obs WHERE seq % 2 = 1) x WHERE rn = 1)
SELECT COALESCE(b1.app_id, b2.app_id) AS app_id,
       COALESCE(b1.device_id, b2.device_id) AS device_id,
       b1.device_model AS device_model,
       CASE WHEN b2.device_id IS NOT NULL THEN b2.language
            ELSE b1.language END AS language,
       CASE WHEN b2.device_id IS NOT NULL THEN b2.timezone
            ELSE b1.timezone END AS timezone,
       CASE WHEN b2.device_id IS NOT NULL THEN b2.last_update_date
            ELSE b1.last_update_date END AS last_update_date
FROM w9_b1 b1
FULL OUTER JOIN w9_b2 b2
  ON b1.app_id = b2.app_id AND b1.device_id = b2.device_id
WHERE COALESCE(b1.device_id, b2.device_id) % 5 <> 0""")


# ---------------------------------------------------------------------------
# P45 device classification (util/DevicePropertyParser.java:1-331): the
# reference's standalone device-property parser — brand normalization
# (exact map then contains-scan then capitalize, :140-160), model
# standardization (trim, collapse whitespace, strip non-[a-zA-Z0-9 +-],
# :165-176), category (foldable > flagship keywords > Apple PRO/MAX/SE >
# Redmi K/NOTE > Mid-range, :181-219; note the keyword "X" makes ANY
# model containing an X a Flagship, and the Chinese keywords can never
# fire on the already-stripped standard model), price range (:224-248),
# 5G regex on the RAW model (:253-259), foldable scan on the RAW model
# (:264-276 — so a 折叠 model is foldable=true yet classified from the
# stripped model), release-year 20[12]\d extraction (:281-297), and the
# null/blank-brand defaults path (:88-92, :316-330) where is5G/foldable
# stay false and release_year stays null.
#
# DELIBERATE DEVIATION: the reference's contains-scan iterates a
# java.util.HashMap, so an input matching two keys (e.g. "genuine redmi
# device" matches both "redmi" and "mi") resolves nondeterministically;
# we scan longest-key-first (ties: lexicographic) so the intuitive
# longest match wins deterministically.
# ---------------------------------------------------------------------------
_BRAND_MAP = [
    ("huawei", "Huawei"), ("honor", "Honor"), ("荣耀", "Honor"),
    ("xiaomi", "Xiaomi"), ("mi", "Xiaomi"), ("redmi", "Redmi"),
    ("红米", "Redmi"), ("oppo", "OPPO"), ("realme", "Realme"),
    ("oneplus", "OnePlus"), ("vivo", "Vivo"), ("iqoo", "iQOO"),
    ("apple", "Apple"), ("iphone", "Apple"), ("samsung", "Samsung"),
    ("meizu", "Meizu"), ("魅族", "Meizu"), ("lenovo", "Lenovo"),
    ("联想", "Lenovo"), ("zte", "ZTE"), ("中兴", "ZTE"),
    ("nubia", "Nubia"), ("努比亚", "Nubia"), ("黑鲨", "BlackShark"),
    ("黑莓", "BlackBerry"),
]

# The fuzzy contains-scan iterates BRAND_MAPPING.entrySet()
# (DevicePropertyParser.java:149-154) — HashMap order, NOT source order.
# String.hashCode is spec-fixed and the insertion sequence is fixed in
# the static initializer, but HashMap ITERATION order also depends on
# implementation internals (hash spreading, table sizing) that are
# OpenJDK-stable, not spec-guaranteed — so the order below is pinned
# EMPIRICALLY: captured by reflecting the reference class compiled and
# run on this JDK (round 10, refkw fixture mode 'dp'), with the
# fixture's collision cells ('huawei honor' → Honor, since 'honor'
# scans 19th-vs-2nd before 'huawei') as the regression tripwire — a
# future JDK changing the order fails the fixture and forces a
# re-capture rather than a silent drift. Order matters only on
# multi-key inputs: 'redmi…' strings are safe ('redmi' scans before
# 'mi').
_BRAND_SCAN_ORDER = [
    "xiaomi", "honor", "oneplus", "联想", "apple", "samsung", "oppo",
    "nubia", "redmi", "vivo", "mi", "红米", "meizu", "黑鲨", "zte",
    "荣耀", "iphone", "中兴", "huawei", "黑莓", "realme", "努比亚",
    "iqoo", "魅族", "lenovo",
]
assert sorted(_BRAND_SCAN_ORDER) == sorted(k for k, _ in _BRAND_MAP)

_FLAGSHIP_KW = ["PRO", "ULTRA", "MAX", "PLUS", "MATE", "FIND", "X",
                "PRO+", "GT", "ACE", "旗舰", "折叠"]
_FOLDABLE_KW = ["FOLD", "FLIP", "MIX FOLD", "MATE X", "折叠"]

# The 18 (brand, model) fixtures: every parser path — exact/fuzzy/
# capitalize brand, each category branch, the raw-vs-standard model
# split (5G + foldable on raw), the year extraction, and both default
# paths (null brand, blank brand). SQL NULL spelled as None.
_P45_CASES = [
    ("huawei", "HUAWEI Mate 40 Pro 5G"),
    ("荣耀", "Magic Vs 折叠"),
    ("REDMI ", "Note 11"),
    ("Redmi", "K50 Pro+"),
    ("my-xiaomi-phone", "Mi Mix Fold 2021"),
    ("iphone", "SE 2022"),
    ("apple", "iPhone 13 mini"),
    ("Sony", "Xperia 1 III"),
    (None, "Galaxy S23"),
    ("   ", "P40 Pro"),
    ("unknown brand", "5g全网通 2019"),
    ("genuine redmi device", "K40"),
    ("vivo", "iQOO Neo5"),
    ("oneplus", "Ace 2V"),
    ("samsung", "Galaxy Z Flip4"),
    ("中兴", "Axon 30 Ultra"),
    ("黑鲨", "4S Pro"),
    ("apple", None),
]


def _sql_str(v, d: Dialect = None) -> str:
    if v is None:
        return f"CAST(NULL AS {d.strtype})"
    return "'" + v.replace("'", "''") + "'"


def _p45(d: Dialect) -> str:
    n = len(_P45_CASES)
    spine = "(VALUES " + ", ".join(f"({i})" for i in range(n)) + ")"
    brand = "CASE cid " + " ".join(
        f"WHEN {i} THEN {_sql_str(b, d)}" for i, (b, _) in enumerate(_P45_CASES)
    ) + " END"
    model = "CASE cid " + " ".join(
        f"WHEN {i} THEN {_sql_str(m, d)}" for i, (_, m) in enumerate(_P45_CASES)
    ) + " END"

    bl = "lower(trim(brand))"
    exact = "CASE " + bl + " " + " ".join(
        f"WHEN {_sql_str(k)} THEN {_sql_str(v)}" for k, v in _BRAND_MAP
    ) + " END"
    brand_of = dict(_BRAND_MAP)
    fuzzy = "CASE " + " ".join(
        f"WHEN instr({bl}, {_sql_str(k)}) > 0 THEN {_sql_str(brand_of[k])}"
        for k in _BRAND_SCAN_ORDER
    ) + " END"
    capitalized = ("upper(substr(brand, 1, 1)) || lower(substr(brand, 2))")
    std_brand = f"COALESCE({exact}, {fuzzy}, {capitalized})"

    collapsed = d.re_replace_all("trim(model)", r"\s+", " ")
    std_model = d.re_replace_all(collapsed, r"[^a-zA-Z0-9\s+\-]", "")
    std_model = f"CASE WHEN model IS NULL THEN '' ELSE {std_model} END"

    um = "upper(std_model)"
    foldable_std = " OR ".join(
        f"instr({um}, {_sql_str(k)}) > 0" for k in _FOLDABLE_KW)
    flagship = " OR ".join(
        f"instr({um}, {_sql_str(k)}) > 0" for k in _FLAGSHIP_KW)
    category = f"""CASE
      WHEN std_model = '' THEN 'UNKNOWN'
      WHEN {foldable_std} THEN 'Foldable'
      WHEN {flagship} THEN 'Flagship'
      WHEN std_brand = 'Apple' THEN
        CASE WHEN instr({um}, 'PRO') > 0 OR instr({um}, 'MAX') > 0
                THEN 'Flagship'
             WHEN instr({um}, 'SE') > 0 THEN 'Entry-level'
             ELSE 'Mid-range' END
      WHEN std_brand = 'Redmi' THEN
        CASE WHEN instr({um}, 'K') > 0 OR instr({um}, 'NOTE') > 0
                THEN 'Mid-range' ELSE 'Entry-level' END
      ELSE 'Mid-range' END"""
    price = """CASE
      WHEN category IN ('Foldable', 'Flagship') THEN 'Premium'
      WHEN category = 'Entry-level' THEN 'Budget'
      WHEN std_brand = 'Apple' THEN 'Premium'
      WHEN std_brand IN ('Redmi', 'Realme') THEN 'Budget'
      ELSE 'Mid' END"""

    is5g = ("CASE WHEN model IS NOT NULL AND "
            + d.rlike("model", "(?i)(5G|全网通)") + " THEN 1 ELSE 0 END")
    raw_um = "upper(model)"
    fold_raw = " OR ".join(
        f"instr({raw_um}, {_sql_str(k)}) > 0" for k in _FOLDABLE_KW)
    is_fold = f"CASE WHEN model IS NOT NULL AND ({fold_raw}) THEN 1 ELSE 0 END"
    year = ("CASE WHEN " + d.rlike("std_model", r"20[12][0-9]")
            + " THEN regexp_extract(std_model, '(20[12][0-9])', 1) "
              "ELSE '' END")

    blank = "brand IS NULL OR trim(brand) = ''"
    return f"""
SELECT cid, brand, model,
       CASE WHEN {blank} THEN 'UNKNOWN' ELSE std_brand END AS std_brand,
       CASE WHEN {blank} THEN '' ELSE std_model END AS std_model,
       CASE WHEN {blank} THEN 'UNKNOWN' ELSE category END AS category,
       CASE WHEN {blank} THEN 'UNKNOWN' ELSE {price} END AS price_range,
       CASE WHEN {blank} THEN 0 ELSE is_5g END AS is_5g,
       CASE WHEN {blank} THEN 0 ELSE is_foldable END AS is_foldable,
       CASE WHEN {blank} THEN CAST(NULL AS {d.strtype}) ELSE {year} END
           AS release_year,
       n_events
FROM (
  SELECT cid, brand, model, std_brand, std_model, {category} AS category,
         {is5g} AS is_5g, {is_fold} AS is_foldable, n_events
  FROM (
    SELECT cid, brand, model, {std_brand} AS std_brand,
           {std_model} AS std_model, n_events
    FROM (
      SELECT t.cid, {brand} AS brand, {model} AS model,
             COALESCE(c.n_events, 0) AS n_events
      FROM {spine} AS t(cid)
      LEFT JOIN (SELECT CAST(user_id % {n} AS INT) AS ccid,
                        COUNT(*) AS n_events
                 FROM events GROUP BY user_id % {n}) c ON c.ccid = t.cid
    ) i
  ) s
) t"""


_register("p45_device_classify", _p45)


# ---------------------------------------------------------------------------
# P46 dimension mappings (util/Dims.java:1-256 = util/DimUtils.java —
# byte-identical twins in the reference; resources/dim.json holds the key
# tables): the dim-id lookups the jobs don't already exercise via pl_id —
# gender/jail/pirate (dim.json:29-44, case-insensitive, miss → 0),
# network-class derivation Dims.net(sdk,net,mnet,radio) (:151-199) with
# the reference's QUIRK that sdk==3 (js per dim.json:11) routes through
# the iOS radio rules while sdk==2 (ios) falls to 0, the Android
# net/mnet table (MNet.getNetworkClass :225-250: 1/2/4/7/11→2G,
# 3/5/6/8/9/10/12/14/15→3G, 13→4G, else 0; wifi→4), carrier (6-digit
# gate, :57-62), phone (keep last 11 chars, all-digits gate else null,
# :76-87), sdkv validity ^v(\d+\.)*\d+ (:94-99), compareVersion vs
# v1.6.0 (:101-115 — iterates ONLY sdkv1's parts, so v1.6 vs v1.6.0
# compares equal), getSdkV (:117-123; strip leading v, non-numeric → 0 —
# FormatUtil.toDouble modeled as TRY_CAST), newSessionId (:141-147 —
# NumberFormat with max/min 9 integer digits = low-order 9 digits of did,
# zero-padded), timestamp source select (:131-138: js uses server ts),
# and birthday yyyy/MM/dd → yyyyMMdd (:68-70; strict-format contract).
# ---------------------------------------------------------------------------
def _p46(d: Dialect) -> str:
    n = 24
    spine = "(VALUES " + ", ".join(f"({i})" for i in range(n)) + ")"
    null_s = f"CAST(NULL AS {d.strtype})"

    # --- synthesized inputs, one combination per cid ---
    sdk_code = """CASE cid % 8 WHEN 0 THEN 'and' WHEN 1 THEN 'ios'
        WHEN 2 THEN 'js' WHEN 3 THEN 'WXA' WHEN 4 THEN 'server'
        WHEN 5 THEN 'harmonyos' WHEN 6 THEN 'none' ELSE 'martian' END"""
    net_in = "CASE cid % 5 WHEN 0 THEN 1 WHEN 1 THEN 0 WHEN 2 THEN 4 WHEN 3 THEN 9 ELSE -1 END"
    mnet_in = "cid % 17"
    radio_in = """CASE cid % 9 WHEN 0 THEN '' WHEN 1 THEN 'gprs'
        WHEN 2 THEN 'CDMA1X' WHEN 3 THEN 'EDGE' WHEN 4 THEN 'HSDPA'
        WHEN 5 THEN 'WCDMA' WHEN 6 THEN 'CDMAEVDO-REVA' WHEN 7 THEN 'LTE'
        ELSE 'NR' END"""
    cr_in = f"""CASE cid % 5 WHEN 0 THEN '4600' || {d.s('(cid % 10)')} || '1'
        WHEN 1 THEN 'mnc?' WHEN 2 THEN {null_s}
        WHEN 3 THEN '46000011' ELSE '46001' END"""
    phone_in = f"""CASE cid % 5 WHEN 0 THEN '13812345678'
        WHEN 1 THEN '+8613812345678' WHEN 2 THEN 'abc'
        WHEN 3 THEN '1381234' ELSE {null_s} END"""
    gender_in = f"""CASE cid % 7 WHEN 0 THEN 'M' WHEN 1 THEN 'female'
        WHEN 2 THEN '男' WHEN 3 THEN '女' WHEN 4 THEN 'x'
        WHEN 5 THEN '' ELSE {null_s} END"""
    flag_in = f"""CASE cid % 4 WHEN 0 THEN '1' WHEN 1 THEN '0'
        WHEN 2 THEN '' ELSE {null_s} END"""
    sdkv_in = f"""CASE cid % 8 WHEN 0 THEN 'v1.6.2' WHEN 1 THEN 'v2.0'
        WHEN 2 THEN 'v1.6' WHEN 3 THEN '1.6.0' WHEN 4 THEN 'v'
        WHEN 5 THEN 'vx.1' WHEN 6 THEN 'v1.6.0.4' ELSE {null_s} END"""
    did_in = "CASE WHEN cid % 3 = 0 THEN CAST(cid AS BIGINT) + 2000000123 ELSE CAST(cid AS BIGINT) * 97 + 5 END"

    # --- Dims semantics ---
    sdk_id = """CASE lower(sdk_code) WHEN 'and' THEN 1 WHEN 'ios' THEN 2
        WHEN 'js' THEN 3 WHEN 'wxa' THEN 4 WHEN 'server' THEN 5
        WHEN 'harmonyos' THEN 6 ELSE 0 END"""
    # MNet.getNetworkClass over mnet_in
    android_mobile = """CASE WHEN mnet_in IN (1, 2, 4, 7, 11) THEN 1
        WHEN mnet_in IN (3, 5, 6, 8, 9, 10, 12, 14, 15) THEN 2
        WHEN mnet_in = 13 THEN 3 ELSE 0 END"""
    android = f"""CASE WHEN net_in = 1 THEN 4
        WHEN net_in = 0 THEN {android_mobile} ELSE 0 END"""
    radio_u = "upper(trim(COALESCE(radio_in, '')))"
    ios = f"""CASE WHEN net_in = 1 THEN
          CASE WHEN {radio_u} IN ('', 'GPRS', 'CDMA1X', 'EDGE') THEN 1
               WHEN {radio_u} IN ('HSDPA', 'HSUPA', 'WCDMA', 'EHRPD')
                    OR {radio_u} LIKE 'CDMAEVDO%' THEN 2
               WHEN {radio_u} = 'LTE' THEN 3
               ELSE 1 END
        WHEN net_in = 4 THEN 4 ELSE 0 END"""
    net_class = f"""CASE WHEN sdk_id = 1 THEN {android}
        WHEN sdk_id = 3 THEN {ios} ELSE 0 END"""
    carrier = f"""CASE WHEN cr_in IS NOT NULL AND {d.rlike('cr_in', '^[0-9]{6}$')}
        THEN CAST(cr_in AS INT) ELSE 0 END"""
    last11 = ("CASE WHEN length(phone_in) > 11 "
              "THEN substr(phone_in, length(phone_in) - 10) "
              "ELSE phone_in END")
    phone = f"""CASE WHEN phone_in IS NULL THEN {null_s}
        WHEN {d.rlike(f'({last11})', '^[0-9]+$')} THEN {last11}
        ELSE {null_s} END"""
    gender_id = """CASE lower(COALESCE(gender_in, '~'))
        WHEN 'n' THEN 0 WHEN 'none' THEN 0 WHEN '未知' THEN 0
        WHEN 'm' THEN 1 WHEN 'male' THEN 1 WHEN '男' THEN 1
        WHEN 'f' THEN 2 WHEN 'female' THEN 2 WHEN '女' THEN 2
        ELSE 0 END"""
    flag_id = ("CASE COALESCE(flag_in, '~') WHEN '1' THEN 1 "
               "WHEN '0' THEN 2 ELSE 0 END")
    sdkv_valid = (f"CASE WHEN sdkv_in IS NOT NULL AND "
                  + d.rlike("sdkv_in", r"^v([0-9]+\.)*[0-9]+$")
                  + " THEN 1 ELSE 0 END")
    # compareVersion(sdkv_in, 'v1.6.0') for valid inputs: compare part 1,
    # then part 2, then part 3 — ONLY over sdkv_in's own parts (a missing
    # trailing part means "stop equal", the reference's asymmetric loop)
    p1 = "TRY_CAST(regexp_extract(sdkv_num_body, '^([0-9]+)', 1) AS INT)"
    p2 = r"regexp_extract(sdkv_num_body, '^[0-9]+\.([0-9]+)', 1)"
    p3 = r"regexp_extract(sdkv_num_body, '^[0-9]+\.[0-9]+\.([0-9]+)', 1)"
    p4 = r"regexp_extract(sdkv_num_body, '^[0-9]+\.[0-9]+\.[0-9]+\.([0-9]+)', 1)"
    sdkv_cmp = f"""CASE WHEN sdkv_valid = 0 THEN CAST(NULL AS INT)
        WHEN {p1} <> 1 THEN CASE WHEN {p1} > 1 THEN 1 ELSE -1 END
        WHEN {p2} = '' THEN 0
        WHEN TRY_CAST({p2} AS INT) <> 6
            THEN CASE WHEN TRY_CAST({p2} AS INT) > 6 THEN 1 ELSE -1 END
        WHEN {p3} = '' THEN 0
        WHEN TRY_CAST({p3} AS INT) <> 0
            THEN CASE WHEN TRY_CAST({p3} AS INT) > 0 THEN 1 ELSE -1 END
        WHEN {p4} <> '' THEN 1
        ELSE 0 END"""
    sdkv_num = """CASE WHEN sdkv_in IS NULL OR length(sdkv_in) = 1 THEN 0.0
        ELSE COALESCE(TRY_CAST(sdkv_num_body AS DOUBLE), 0.0) END"""
    session_id = ("sid_in || lpad(CAST(did_in % 1000000000 AS "
                  + d.strtype + "), 9, '0')")
    ts_used = "CASE WHEN sdk_id = 3 THEN sts_in ELSE ts_in END"
    bday = f"""CASE WHEN {d.rlike('bday_in', '^[0-9]{4}/[0-9]{2}/[0-9]{2}$')}
        THEN replace(bday_in, '/', '') ELSE {null_s} END"""

    return f"""
SELECT x.cid, sdk_code, sdk_id, net_in, mnet_in, radio_in, net_class,
       cr_in, carrier, phone_in, phone, gender_in, gender_id,
       flag_in, jail_id, pirate_id, sdkv_in, sdkv_valid, sdkv_cmp,
       CAST(sdkv_num AS DOUBLE) AS sdkv_num, session_id, ts_used, bday,
       COALESCE(ev.n_events, 0) AS n_events
FROM (
  SELECT cid, sdk_code, sdk_id, net_in, mnet_in, radio_in,
         {net_class} AS net_class,
         cr_in, {carrier} AS carrier,
         phone_in, {phone} AS phone,
         gender_in, {gender_id} AS gender_id,
         flag_in, {flag_id} AS jail_id, {flag_id} AS pirate_id,
         sdkv_in, sdkv_valid, {sdkv_cmp} AS sdkv_cmp,
         {sdkv_num} AS sdkv_num,
         {session_id} AS session_id,
         {ts_used} AS ts_used,
         {bday} AS bday
  FROM (
    SELECT cid, sdk_code, {sdk_id} AS sdk_id, net_in, mnet_in, radio_in,
           cr_in, phone_in, gender_in, flag_in, sdkv_in,
           {sdkv_valid} AS sdkv_valid,
           CASE WHEN sdkv_in IS NULL THEN '' ELSE substr(sdkv_in, 2) END
               AS sdkv_num_body,
           did_in, sid_in, sts_in, ts_in, bday_in
    FROM (
      SELECT cid, {sdk_code} AS sdk_code, {net_in} AS net_in,
             {mnet_in} AS mnet_in, {radio_in} AS radio_in,
             {cr_in} AS cr_in, {phone_in} AS phone_in,
             {gender_in} AS gender_in, {flag_in} AS flag_in,
             {sdkv_in} AS sdkv_in, {did_in} AS did_in,
             'sess' || {d.s('cid')} || '-' AS sid_in,
             CAST(1700000000000 AS BIGINT) + cid AS sts_in,
             CAST(1700000100000 AS BIGINT) + cid AS ts_in,
             CASE WHEN cid % 2 = 0 THEN '199' || {d.s('(cid % 10)')} || '/05/06'
                  ELSE 'garbage' END AS bday_in
      FROM {spine} AS t(cid)
    ) i
  ) s
) x
LEFT JOIN (SELECT CAST(user_id % {n} AS INT) AS ecid, COUNT(*) AS n_events
           FROM events GROUP BY user_id % {n}) ev ON ev.ecid = x.cid"""


_register("p46_dims_mapping", _p46)


# ---------------------------------------------------------------------------
# P47 adv CDC click routing (operator/adv/AdvProcessFunction.java:34-215,
# the AdvJob main's only operator): each wire message routes on
# `tableName` — `toufang_convert_event` rows map field-for-field into
# ToufangConvertEventRow (:61-90), `toufang_ad_click` rows build a
# ToufangAdClickRow via jsonToAdClickRowData (:92-174) with TWO key
# shapes, dispatched on which key the payload carries:
#   (a) `value_ad_data` (zgid-matched ad info): key_ad_data
#       "adtfdata:{appId}:{zgid}:{ct}" is split on ':' with Java's
#       trailing-empty-segment drop — appId/zgid/click_time fall back to
#       " " when the split is short (:132-136) — lid comes from INSIDE
#       the nested value_ad_data object (:153), key_type "appid_zgid";
#   (b) `ip_ua_key` (ip/ua- or muid-keyed click): key_ip_data =
#       "{ip_ua_key}:{click_time}", key_muid_data = "{muid_key}:
#       {click_time}" where muid_key takes the FIRST non-empty of
#       channel_click_id_key > muid_key > idfa_key > imei_key >
#       android_id_key > oaid_key else " " (:181-208, the corrected
#       priority chain), ad_data = the whole data JSON, key_type
#       "appid_muid_or_ip";
#   neither key → the row is dropped (:170-173); unknown tableName rows
#   produce nothing. Every empty-or-missing string field lands as a
#   single space, the reference's isEmpty → " " padding. update_time is
#   System.currentTimeMillis() (:135,:168) and is not modeled (the only
#   nondeterministic field). ad_data's raw JSON text is reported as a
#   presence flag, not compared byte-wise (fastjson2 vs our builders
#   would differ only in key order/whitespace).
#
# Scale shape: map-only JSON extraction over the event stream (codegen
# get_json_object, no UDF, no join beyond the 12-group agg) — the wire
# payload is synthesized per events row (p44's fixture convention),
# cid = user_id % 12 picks one routing case per row; a constant seed row
# per cid keeps all 12 cases present at every SF regardless of the
# corpus's user_id residue coverage.
# ---------------------------------------------------------------------------
def _p47(d: Dialect) -> str:
    null_s = f"CAST(NULL AS {d.strtype})"

    if d.name == "spark":
        # Parse each payload ONCE with from_json into a typed struct and
        # read fields from it (guide §1.2/§4.1): the get_json_object form
        # re-parsed the same JSON string per extraction — ~28 parses per
        # row. Codegen subexpression elimination evaluates the single
        # from_json per row; every j() below is a GetStructField on it.
        # Field semantics match get_json_object for these payloads:
        # missing key → NULL, string values verbatim, JSON numbers read
        # into STRING fields as their literal text (parity re-proven
        # against the unchanged DuckDB oracle).
        def j(path: str) -> str:
            return f"pj.data.{path}"

    else:

        def j(path: str) -> str:
            return d.json_str("payload", f"$.data.{path}")

    def blank(v: str) -> str:
        # StringUtils.isEmpty(v) ? " " : v  (missing key extracts NULL)
        return f"CASE WHEN {v} IS NULL OR {v} = '' THEN ' ' ELSE {v} END"

    # Java split(":") drops trailing empty segments; segment i exists
    # iff the rtrimmed string still has >= i colons.
    kd = "regexp_replace(COALESCE(" + j("key_ad_data") + ", ''), ':+$', '')"
    ncol = f"length({kd}) - length(replace({kd}, ':', ''))"
    seg1 = f"regexp_extract({kd}, '^[^:]*:([^:]*)', 1)"
    seg2 = f"regexp_extract({kd}, '^[^:]*:[^:]*:([^:]*)', 1)"
    seg3 = f"regexp_extract({kd}, '^[^:]*:[^:]*:[^:]*:([^:]*)', 1)"
    a_app = f"CASE WHEN {ncol} >= 1 THEN {seg1} ELSE ' ' END"
    a_zgid = f"CASE WHEN {ncol} >= 2 THEN {seg2} ELSE ' ' END"
    a_ct = f"CASE WHEN {ncol} >= 3 THEN {seg3} ELSE ' ' END"

    muid_key = ("COALESCE(" + ", ".join(
        f"NULLIF({j(k)}, '')"
        for k in ("channel_click_id_key", "muid_key", "idfa_key",
                  "imei_key", "android_id_key", "oaid_key")) + ", ' ')")
    b_ct = blank(j("click_time"))
    b_ipua = blank(j("ip_ua_key"))

    s = d.s
    payload = f"""CASE cid
    WHEN 0 THEN concat('{{"tableName":"toufang_convert_event","data":{{',
        '"zg_appid":10', {s('(user_id % 2)')},
        ',"zg_id":9001,"lid":7,"channel_id":3,"zg_eid":55,',
        '"event_time":1700000001000,"channel_adgroup_id":"ag1",',
        '"channel_adgroup_name":"n1","click_time":1699999000000,',
        '"event_name":"buy","channel_event":"purchase",',
        '"match_json":"","frequency":1,"utm_campaign":"c",',
        '"utm_source":"s","utm_medium":"m","utm_term":"t",',
        '"utm_content":"cc"}}}}')
    WHEN 1 THEN '{{"tableName":"toufang_ad_click","data":{{"key_ad_data":"adtfdata:101:9001:1699990000000","key_ad_time":"1699990000000","value_ad_time":"1699990011111","value_ad_data":{{"lid":"42"}},"key_ad_lid":"42","value_ad_lid":"43","other_key":"ok1"}}}}'
    WHEN 2 THEN '{{"tableName":"toufang_ad_click","data":{{"key_ad_data":"adtfdata:202","value_ad_data":{{"lid":""}}}}}}'
    WHEN 3 THEN '{{"tableName":"toufang_ad_click","data":{{"key_ad_data":"","value_ad_data":{{"lid":"5"}},"key_ad_lid":"","other_key":"ok3"}}}}'
    WHEN 4 THEN '{{"tableName":"toufang_ad_click","data":{{"ip_ua_key":"1.2.3.4|chrome:99","click_time":"1699991111111","channel_click_id_key":"adtfad:101:cck9","muid_key":"adtfad:101:m4","zg_appid":"101","lid":"7","is_delete":"0","other_key":"okB"}}}}'
    WHEN 5 THEN '{{"tableName":"toufang_ad_click","data":{{"ip_ua_key":"5.6.7.8|safari:17","click_time":"1699992222222","channel_click_id_key":"","muid_key":"adtfad:102:m5","zg_appid":"102","lid":"8"}}}}'
    WHEN 6 THEN '{{"tableName":"toufang_ad_click","data":{{"ip_ua_key":"9.9.9.9|edge:120","click_time":"1699993333333","idfa_key":"adtfad:103:idfa6","zg_appid":"103"}}}}'
    WHEN 7 THEN '{{"tableName":"toufang_ad_click","data":{{"ip_ua_key":"8.8.8.8|firefox:121","click_time":"1699994444444","imei_key":"adtfad:104:imei7","zg_appid":"104","is_delete":"1"}}}}'
    WHEN 8 THEN '{{"tableName":"toufang_ad_click","data":{{"ip_ua_key":"7.7.7.7|opera:105","click_time":"1699995555555","android_id_key":"adtfad:105:aid8","zg_appid":"105"}}}}'
    WHEN 9 THEN '{{"tableName":"toufang_ad_click","data":{{"ip_ua_key":"6.6.6.6|uc:13","click_time":"1699996666666","oaid_key":"adtfad:106:oaid9","zg_appid":"106","lid":"9"}}}}'
    WHEN 10 THEN '{{"tableName":"toufang_ad_click","data":{{"ip_ua_key":"","click_time":"","zg_appid":""}}}}'
    ELSE '{{"tableName":"toufang_ad_click","data":{{"other_key":"neither"}}}}'
    END"""

    return f"""
SELECT cid, lane, COUNT(*) AS n_rows,
       MAX(zg_appid_s) AS zg_appid_s, MAX(zgid_s) AS zgid_s,
       MAX(click_time_s) AS click_time_s,
       MAX(key_ip_data) AS key_ip_data, MAX(key_muid_data) AS key_muid_data,
       MAX(key_ad_data) AS key_ad_data, MAX(other_key) AS other_key,
       MAX(is_delete) AS is_delete, MAX(key_ad_time) AS key_ad_time,
       MAX(value_ad_time) AS value_ad_time,
       MAX(key_ad_lid) AS key_ad_lid, MAX(value_ad_lid) AS value_ad_lid,
       MAX(lid) AS lid, MAX(has_ad_data) AS has_ad_data,
       MAX(conv_event_name) AS conv_event_name,
       CAST(MAX(conv_zg_eid) AS BIGINT) AS conv_zg_eid,
       CAST(MAX(conv_frequency) AS BIGINT) AS conv_frequency,
       MAX(conv_utm_source) AS conv_utm_source
FROM (
  SELECT cid,
         CASE WHEN tbl = 'toufang_convert_event' THEN 'convert'
              WHEN tbl = 'toufang_ad_click' AND has_vad = 1
                   THEN 'appid_zgid'
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN 'appid_muid_or_ip'
              ELSE 'dropped' END AS lane,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1 THEN {a_app}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN {blank(j("zg_appid"))} END AS zg_appid_s,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1 THEN {a_zgid}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN ' ' END AS zgid_s,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1 THEN {a_ct}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN {b_ct} END AS click_time_s,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1 THEN ' '
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN {b_ipua} || ':' || {b_ct} END AS key_ip_data,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1 THEN ' '
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN {muid_key} || ':' || {b_ct} END AS key_muid_data,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1
                   THEN {blank(j("key_ad_data"))}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN ' ' END AS key_ad_data,
         CASE WHEN tbl = 'toufang_ad_click' AND (has_vad = 1 OR has_ipua = 1)
                   THEN {blank(j("other_key"))} END AS other_key,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1 THEN ' '
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN {blank(j("is_delete"))} END AS is_delete,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1
                   THEN {blank(j("key_ad_time"))}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN ' ' END AS key_ad_time,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1
                   THEN {blank(j("value_ad_time"))}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN ' ' END AS value_ad_time,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1
                   THEN {blank(j("key_ad_lid"))}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN ' ' END AS key_ad_lid,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1
                   THEN {blank(j("value_ad_lid"))}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN ' ' END AS value_ad_lid,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1
                   THEN {blank(j("value_ad_data.lid"))}
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN {blank(j("lid"))} END AS lid,
         CASE WHEN tbl = 'toufang_ad_click' AND has_vad = 1 THEN 0
              WHEN tbl = 'toufang_ad_click' AND has_ipua = 1
                   THEN 1 END AS has_ad_data,
         CASE WHEN tbl = 'toufang_convert_event'
                   THEN {j("event_name")} END AS conv_event_name,
         CASE WHEN tbl = 'toufang_convert_event'
                   THEN CAST({j("zg_eid")} AS INT) END AS conv_zg_eid,
         CASE WHEN tbl = 'toufang_convert_event'
                   THEN CAST({j("frequency")} AS INT) END AS conv_frequency,
         CASE WHEN tbl = 'toufang_convert_event'
                   THEN {j("utm_source")} END AS conv_utm_source
  FROM (
    {_p47_parsed(d, payload)}
  ) f
) x
GROUP BY cid, lane"""


_P47_JSON_SCHEMA = (
    "tableName STRING, data STRUCT<"
    "key_ad_data: STRING, key_ad_time: STRING, value_ad_time: STRING, "
    "value_ad_data: STRUCT<lid: STRING>, key_ad_lid: STRING, "
    "value_ad_lid: STRING, other_key: STRING, ip_ua_key: STRING, "
    "click_time: STRING, channel_click_id_key: STRING, muid_key: STRING, "
    "idfa_key: STRING, imei_key: STRING, android_id_key: STRING, "
    "oaid_key: STRING, zg_appid: STRING, lid: STRING, is_delete: STRING, "
    "event_name: STRING, zg_eid: STRING, frequency: STRING, "
    "utm_source: STRING>"
)


def _p47_parsed(d: Dialect, payload: str) -> str:
    """The cid → payload → (tbl, has_vad, has_ipua) derivation. Spark
    parses once into a struct column `pj`; DuckDB keeps per-field
    json_extract_string (its parser caches per row already)."""
    base = f"""SELECT cid, user_id, {payload} AS payload
      FROM (SELECT CAST(user_id % 12 AS INT) AS cid, user_id FROM events
            UNION ALL
            SELECT CAST(t.cid AS INT) AS cid,
                   CAST(t.cid AS BIGINT) AS user_id
            FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8),
                         (9), (10), (11)) AS t(cid)) b"""
    if d.name == "spark":
        return f"""SELECT cid, pj,
           pj.tableName AS tbl,
           CASE WHEN pj.data.value_ad_data IS NOT NULL
                THEN 1 ELSE 0 END AS has_vad,
           CASE WHEN pj.data.ip_ua_key IS NOT NULL
                THEN 1 ELSE 0 END AS has_ipua
    FROM (
      SELECT cid, from_json(payload, '{_P47_JSON_SCHEMA}') AS pj
      FROM ({base}) r0
    ) r"""
    return f"""SELECT cid, payload,
           {d.json_str("payload", "$.tableName")} AS tbl,
           CASE WHEN {d.json_str("payload", "$.data.value_ad_data")}
                     IS NOT NULL THEN 1 ELSE 0 END AS has_vad,
           CASE WHEN {d.json_str("payload", "$.data.ip_ua_key")}
                     IS NOT NULL THEN 1 ELSE 0 END AS has_ipua
    FROM (
      {base}
    ) r"""


_register("p47_adv_cdc_route", _p47)


# ---------------------------------------------------------------------------
# P48 adv click-store key build (AdvSaveAppAdDataFlatMapFunction.java:
# 199-444, the click-INGEST side of the store p42 probes): each `adtf`
# click record from an advertising app (sdk "zg_adtoufang", lid != 0,
# :219-246) derives
#   * a FUZZY key "adtfad:{appId}:{ip}{uaProcess}" when ip is non-empty
#     (:269-273), where uaProcess = ToolUtil.uaAnalysis(ua) and Baidu
#     channels 1/4 downgrade iPhone UAs to ":{version}" (ip+version
#     match, :260-268 — iPads parse as iPhone so the name is dropped);
#   * EXACT keys via setMuidProcess (:332-444): each of muid /
#     android_id / oaid / idfa / imei is blanked when the RAW value sits
#     in the origin excludes {"","0","NULL","null","(null)"} or the five
#     pinned lowercase excluded md5s, else passes through when already
#     32 chars or is md5'd, then lowercased (:342-398) — note an
#     UPPERCASE excluded md5 survives the case-sensitive exclude check
#     and lowercases INTO the excluded value, kept faithful; Tencent-web
#     clicks (channel_type 3, push_type 20, non-empty channel_click_id)
#     write ONLY "adtfad:{appId}:{channel_click_id}" (:400-407), every
#     other click one key per non-empty normalized id (:408-443).
# putAd / the ip-ua branch keep the LATEST ct per key (>= overwrite,
# :287-296,:315-330), with 10-digit click_time strings scaled s→ms
# (:251-254) — modeled as MAX(ct_ms) per key. The arr[1]-throw on a
# 1-element uaProcess split (:263-266) is UNREACHABLE in the reference:
# a matched version group is +-quantified (never empty) and the
# version-less Opera alternative renders the literal 'null' via Java
# string concat (ToolUtil.java:171-177, see ua_analysis_version), so
# "iPhone:<empty>" cannot occur; a no-match uaProcess ":" splits to a
# 0-length array and is kept as-is (:264 guard). lid == 0 rows produce
# nothing (:245).
#
# Scale shape: map-only normalization over the click stream (md5 /
# regexp inside codegen, no UDF) + one 16-group agg standing in for the
# per-key latest-click reduce — at 100 TB the same shape partial-
# aggregates map-side before one shuffle on the store key.
# ---------------------------------------------------------------------------
def _p48(d: Dialect) -> str:
    from zg_etl_spark.functions import ua_parser as UP

    null_s = f"CAST(NULL AS {d.strtype})"
    ORIGIN_EX = "('', '0', 'NULL', 'null', '(null)')"
    MD5_EX = ("('cfcd208495d565ef66e7dff9f98764da', "
              "'6c3e226b4d4795d518ab341b0824ec29', "
              "'37a6259cc0c1dae299a7866489dff0bd', "
              "'d41d8cd98f00b204e9800998ecf8427e', "
              "'a4d2f177eb466a7d08f8f2b340b77129')")

    def norm(v: str) -> str:
        return (f"CASE WHEN {v} IN {ORIGIN_EX} OR {v} IN {MD5_EX} THEN '' "
                f"WHEN length({v}) = 32 THEN lower({v}) "
                f"ELSE lower(md5({v})) END")

    def key_of(nv: str) -> str:
        return (f"CASE WHEN lane = 'multi' AND {nv} <> '' "
                f"THEN 'adtfad:' || app_id_s || ':' || {nv} END")

    ua_android = ("Mozilla/5.0 (Linux; Android 13; Pixel 7) "
                  "AppleWebKit/537.36")
    ua_iphone = ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) "
                 "AppleWebKit/605.1.15")

    def pick(name: str, vals: list) -> str:
        return ("CASE cid " + " ".join(
            f"WHEN {i} THEN '{v}'" for i, v in enumerate(vals)
        ) + f" END AS {name}")

    n = 16
    # constant seed row per cid UNION'd under the events-derived volume:
    # case coverage must NOT depend on which user_id residues a given SF
    # happens to contain (at sf0.001 residue 15 is absent from events) —
    # the seed guarantees all 16 cases at every SF, events rows scale the
    # MAX/COUNT reduces with data size.
    seed = "(VALUES " + ", ".join(f"({i})" for i in range(n)) + ")"
    spine = ", ".join([
        pick("channel_type", ["2", "3", "3", "3", "1", "4", "1", "2",
                              "2", "2", "4", "2", "3", "2", "1", "2"]),
        pick("push_type", ["10", "20", "10", "20", "10", "10", "10", "10",
                           "10", "10", "10", "10", "20", "10", "10", "10"]),
        pick("cck", ["", "cck-abc", "cck-xyz", "", "", "", "", "",
                     "", "", "", "", "cck-12", "", "", ""]),
        pick("muid", ["device0", "m1", "ABCDEF0123456789ABCDEF0123456789",
                      "", "m4", "", "m6", "0", "", "", "m10", "m11", "",
                      "", "", ""]),
        pick("android_id", ["aid0", "", "", "", "", "", "NULL", "null",
                            "", "", "", "", "", "", "", ""]),
        pick("oaid", ["oaid0", "", "", "oa3", "", "", "(null)", "NULL",
                      "", "", "", "", "", "0123456789abcdef0123456789abcdef",
                      "", ""]),
        pick("idfa", ["IDFA0", "", "", "", "0", "", "", "", "", "", "",
                      "", "", "d41d8cd98f00b204e9800998ecf8427e",
                      "ID14", ""]),
        pick("imei", ["imei0", "", "", "", "", "IM5", "", "",
                      "cfcd208495d565ef66e7dff9f98764da",
                      "CFCD208495D565EF66E7DFF9F98764DA", "", "", "",
                      "", "im14", ""]),
        pick("ip", ["1.2.3.4", "2.3.4.5", "3.4.5.6", "4.5.6.7", "5.6.7.8",
                    "", "6.7.8.9", "7.8.9.1", "8.9.1.2", "1.1.1.1",
                    "9.9.9.9", "2.2.2.2", "", "3.3.3.3", "4.4.4.4",
                    "5.5.5.5"]),
        pick("ua", [ua_android, ua_android, ua_android, ua_android,
                    ua_iphone, ua_iphone, ua_android, ua_android,
                    ua_android, ua_android, "iPhone weird", ua_android,
                    ua_android, ua_android, ua_android, ua_android]),
    ])
    lid = "CASE WHEN cid = 8 THEN 0 ELSE 1 + cid END"
    # ms-scale everywhere except cids 11/14, which exercise the 10-digit
    # seconds heuristic; both vary within a cid so MAX() is a real reduce
    ct_str = (f"CASE WHEN cid IN (11, 14) "
              f"THEN '17000' || lpad({d.s('(user_id % 100000)')}, 5, '0') "
              f"ELSE '17000000' || lpad({d.s('(user_id % 100000)')}, 5, '0')"
              f" END")

    ua_name = UP.ua_analysis_name(d, "ua")
    ua_ver = UP.ua_analysis_version(d, "ua")
    ua_proc = (
        f"CASE WHEN channel_type IN ('1', '4') AND instr(ua, 'iPhone') > 0 "
        f"AND {ua_name} <> '' AND {ua_ver} <> '' "
        f"THEN ':' || {ua_ver} "
        f"ELSE {ua_name} || ':' || {ua_ver} END"
    )

    return f"""
SELECT cid, lane,
       MAX(cck_key) AS cck_key, MAX(muid_key) AS muid_key,
       MAX(idfa_key) AS idfa_key, MAX(imei_key) AS imei_key,
       MAX(android_id_key) AS android_id_key, MAX(oaid_key) AS oaid_key,
       MAX(ip_ua_key) AS ip_ua_key,
       COUNT(*) AS n_clicks, MAX(ct_ms) AS store_max_ct
FROM (
  SELECT cid, lane,
         CASE WHEN lane = 'tencent_web'
              THEN 'adtfad:' || app_id_s || ':' || cck END AS cck_key,
         {key_of("muid_n")} AS muid_key,
         {key_of("idfa_n")} AS idfa_key,
         {key_of("imei_n")} AS imei_key,
         {key_of("aid_n")} AS android_id_key,
         {key_of("oaid_n")} AS oaid_key,
         CASE WHEN lane <> 'skipped_lid0' AND ip <> ''
              THEN 'adtfad:' || app_id_s || ':' || ip || ua_proc
         END AS ip_ua_key,
         CASE WHEN lane = 'skipped_lid0' THEN CAST(NULL AS BIGINT)
              ELSE ct_ms END AS ct_ms
  FROM (
    SELECT cid, ip, cck,
           CASE WHEN lid = 0 THEN 'skipped_lid0'
                WHEN channel_type = '3' AND push_type = '20'
                     AND cck <> '' THEN 'tencent_web'
                ELSE 'multi' END AS lane,
           {d.s("(100 + cid % 3)")} AS app_id_s,
           {norm("muid")} AS muid_n, {norm("android_id")} AS aid_n,
           {norm("oaid")} AS oaid_n, {norm("idfa")} AS idfa_n,
           {norm("imei")} AS imei_n,
           {ua_proc} AS ua_proc,
           CASE WHEN length(ct_str) = 10
                THEN CAST(ct_str AS BIGINT) * 1000
                ELSE CAST(ct_str AS BIGINT) END AS ct_ms
    FROM (
      SELECT cid, {spine}, {lid} AS lid, {ct_str} AS ct_str
      FROM (SELECT CAST(user_id % {n} AS INT) AS cid, user_id
            FROM events
            UNION ALL
            SELECT CAST(t.cid AS INT) AS cid,
                   CAST(t.cid AS BIGINT) AS user_id
            FROM {seed} AS t(cid)) e
    ) i
  ) s
) x
GROUP BY cid, lane"""


_register("p48_adv_click_keys", _p48)


# ---------------------------------------------------------------------------
# P49 deep-conversion multi-event gate + callback envelope
# (AdvConvertEventFlatMapFunction.java:142-380, the 深度回传 lane p31's
# simple lane sits in front of): a dt='evt' row of an advertising app
# converts for deep rule (zg_eid, lid) only if
#   1. it attributes to a latest prior ad touch and sits inside the
#      rule's window (ct >= maxCt, ct - maxCt <= window*1000, :211 —
#      p31's gate);
#   2. every member of the rule's comma-split eventIds has a LIVE
#      status key `ad:convert:status:{eid}:{lid}` (:247-275). The key is
#      GLOBAL — no zgid, no app — set with TTL = the member's own
#      windowTime whenever a member event passes gate 1, and the
#      processing event sets its own key BEFORE the check (:251-253), so
#      it always counts itself. Single-member rules send immediately
#      (:274-275).
# On send the row emits the toufang_convert_event record AND a
# ConvertMessageV2 callback envelope to toufang_ad_user (:221,:360-374):
# event_type = the rule's channelEvent, action_time = String(ct),
# callback_url with the null/"null" → "" repair (:283-286), and
# setFields(adMessageJson) pulling callback / ados / muid / click_time
# off the stored ad payload with ""-defaults (ConvertMessageV2.java:
# 116-137). Deep rules here use frequency=every and empty matchJson —
# the first-send gate and the property gate are p31's and p43's modeled
# surfaces; the ad payload fields are synthesized from the touch's k
# (fixture convention; lid = k % 5 as in p31).
#
# Scale shape: NO conversion×evidence pair join — the status-key
# timeline is global per (lid, member-event), so aliveness is a
# last_value-IGNORE-NULLS forward fill over the lid-partitioned
# qualifying stream (one filled column per group member), mirroring how
# p31 replaced the touch pair join. Two shuffles total: (app, zgid) for
# touch attribution, lid for the key timeline; rules broadcast.
# ---------------------------------------------------------------------------
# (lid, conv_event, window_sec, channel_event); lids 1/3 require
# {purchase, click} (the eventIds CSV), lid 2 is single-member
P49_DEEP_RULES = [
    (1, "purchase", 86400, "ch_purchase"),
    (1, "click", 43200, "ch_click"),
    (3, "purchase", 14400, "chd_purchase"),
    (3, "click", 28800, "chd_click"),
    (2, "click", 86400, "ch_click_solo"),
]
P49_MULTI_LIDS = (1, 3)


def p49_candidates_sql(d: Dialect) -> str:
    """The deep-lane candidate relation `q`: advertising-app evt rows
    attributed to their latest prior touch, rule-joined and window-gated
    — shared by p49's batch gate and s10's streaming gate so the two
    formulations cannot drift."""
    deep_rules = R.values_sql(
        P49_DEEP_RULES,
        ["dr_lid", "dr_event", "dr_window", "dr_channel_event"])
    multi = "r.dr_lid IN (" + ", ".join(str(x) for x in P49_MULTI_LIDS) + ")"
    w_attr = (
        "(PARTITION BY app_id, zg_id ORDER BY ct, is_touch DESC, seq "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    t_lid = d.last_ignore_nulls("CASE WHEN is_touch = 1 THEN lid END", w_attr)
    t_ct = d.last_ignore_nulls("CASE WHEN is_touch = 1 THEN ct END", w_attr)
    t_k = d.last_ignore_nulls("CASE WHEN is_touch = 1 THEN k END", w_attr)
    apps = ", ".join(str(a) for a in R.ADVERTISING_APPS)
    return f"""
      SELECT c.app_id, c.zg_id, c.ct, c.seq, c.event_name, c.lid,
             c.touch_ct, c.touch_k,
             r.dr_channel_event AS event_type,
             {multi} AS is_multi,
             pw.dr_window AS purchase_window,
             cw.dr_window AS click_window
      FROM (
        SELECT app_id, zg_id, ct, seq, event_name,
               {t_lid} AS lid, {t_ct} AS touch_ct, {t_k} AS touch_k
        FROM (
          SELECT app_id, zg_id, ct, seq, event_name, 0 AS is_touch,
                 CAST(NULL AS BIGINT) AS lid, CAST(NULL AS BIGINT) AS k
          FROM resolved WHERE dt = 'evt' AND app_id IN ({apps})
          UNION ALL
          SELECT app_id, zg_id, ct, seq, CAST(NULL AS {d.strtype}), 1,
                 k % 5, k
          FROM resolved WHERE dt = 'mkt' AND k IS NOT NULL
            AND app_id IN ({apps})
        ) u
      ) c
      JOIN {deep_rules}
           AS r(dr_lid, dr_event, dr_window, dr_channel_event)
        ON r.dr_lid = c.lid AND r.dr_event = c.event_name
      LEFT JOIN {deep_rules}
           AS pw(dr_lid, dr_event, dr_window, dr_channel_event)
        ON pw.dr_lid = c.lid AND pw.dr_event = 'purchase'
      LEFT JOIN {deep_rules}
           AS cw(dr_lid, dr_event, dr_window, dr_channel_event)
        ON cw.dr_lid = c.lid AND cw.dr_event = 'click'
      WHERE c.ct - c.touch_ct <= r.dr_window * 1000"""


def p49_final_sql(d: Dialect, gated: str) -> str:
    """ConvertMessageV2 envelope projection + the per-rule aggregate over
    `gated` — any relation carrying the candidate columns plus `sent`."""
    s = d.s
    return f"""
SELECT app_id, lid, event_name, event_type,
       COUNT(*) AS n_candidates,
       CAST(SUM(sent) AS BIGINT) AS n_sent,
       CAST(SUM(1 - sent) AS BIGINT) AS n_blocked,
       CAST(SUM(CASE WHEN sent = 1 THEN ados END) AS BIGINT) AS sum_ados,
       CAST(SUM(CASE WHEN sent = 1 AND muid <> '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_muid_set,
       CAST(SUM(CASE WHEN sent = 1 AND callback_url <> '' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cb_url_set,
       MIN(CASE WHEN sent = 1 THEN action_time END) AS min_action_time,
       MAX(CASE WHEN sent = 1 THEN action_time END) AS max_action_time,
       CAST(SUM(CASE WHEN sent = 1 THEN click_time END) AS BIGINT)
           AS sum_click_time
FROM (
  SELECT app_id, lid, event_name, event_type, sent,
         CAST(touch_k % 3 AS INT) AS ados,
         CASE WHEN touch_k % 2 = 0 THEN 'mu' || {s("touch_k")}
              ELSE '' END AS muid,
         CASE WHEN touch_k % 3 = 0 THEN 'http://cb/' || {s("touch_k")}
              ELSE '' END AS callback_url,
         {s("ct")} AS action_time,
         touch_ct AS click_time
  FROM ({gated}) i
) g
GROUP BY app_id, lid, event_name, event_type"""


def _p49(d: Dialect) -> str:
    # The Redis key is {zgEid}:{lid}; zg_eids are per-app dictionary ids,
    # so keys never collide across apps — the timeline partitions on
    # (app_id, lid) with event_name standing in for the app-scoped eid.
    w_key = ("(PARTITION BY app_id, lid ORDER BY ct, seq "
             "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    last_p = d.last_ignore_nulls(
        "CASE WHEN event_name = 'purchase' THEN ct END", w_key)
    last_c = d.last_ignore_nulls(
        "CASE WHEN event_name = 'click' THEN ct END", w_key)
    gated = f"""
  SELECT f.*,
         CASE WHEN NOT is_multi THEN 1
              WHEN last_purchase_ct IS NOT NULL
                   AND ct - last_purchase_ct <= purchase_window * 1000
                   AND last_click_ct IS NOT NULL
                   AND ct - last_click_ct <= click_window * 1000
              THEN 1 ELSE 0 END AS sent
  FROM (
    SELECT q.*,
           {last_p} AS last_purchase_ct,
           {last_c} AS last_click_ct
    FROM ({p49_candidates_sql(d)}) q
  ) f"""
    return p49_final_sql(d, gated)


_register("p49_adv_deep_convert", _p49)


# ---------------------------------------------------------------------------
# P50 match_json userProp gates (OperatorUtil.compareProValue,
# pipeline util/OperatorUtil.java:22-98 — the USER-property category p43's
# eventProp coverage leaves out): rules with propCategory "userProp"
# resolve their tested value from user state, not the event bag —
#   * attrId > 0 → the user's property value from b_user_property
#     (:71-78), here the LATEST write per (app, zgid, property) of the
#     user-prop EAV (b_user_property is merge-on-write);
#   * attrId = 0 + dimensionSub visit_times/duration → the
#     f_user_detail_sum aggregates (:34-43);
#   * attrId = 0 + dimensionSub is_anonymous → 实名 iff b_user holds a
#     user_id for the (device, zgid) binding, else 匿名 (:44-58) — here
#     a user with any cuid-bearing row;
#   * any other column → f_user_detail (:59-67), same lookup shape.
# An EMPTY lookup falls through to `return false` (:78,:96) — it never
# reaches handleNullValue, unlike the eventProp path; `is null` on a
# missing user property is still FALSE. The 3-arg compareValue overload
# with the 业务 label special case (:100-131) has no caller in the
# reference and is not modeled. Typed compares reuse the p43 compiler
# (functions/match_json.py). The deep-conversion gate evaluates per
# conversion EVENT but the value depends only on (app, zgid), so
# n_events_pass = SUM(visit_times) over passing users — no second scan.
#
# Scale shape: one evt-grain aggregation to user state, one user-prop
# pivot (FILTERed max_by — single pass over the EAV), one broadcast-size
# single-row reduce. No per-row interpreter; every rule is codegen CASE.
# ---------------------------------------------------------------------------
def _p50(d: Dialect) -> str:
    from zg_etl_spark.functions.match_json import match_predicate

    apps = ", ".join(str(a) for a in R.ADVERTISING_APPS)
    # (rule_id, value_expr, matchJson) — values are ResultSet strings
    rules = [
        ("plname_eq_ios", "plname",
         {"type": 1, "operator": "equal", "values": ["ios"]}),
        ("plname_contains_o", "plname",
         {"type": 1, "operator": "contains", "values": ["o"]}),
        ("visits_gt_20", d.s("visit_times"),
         {"type": 2, "operator": "gt", "values": ["20"]}),
        ("duration_le_1g", d.s("duration"),
         {"type": 2, "operator": "le", "values": ["1000000000"]}),
        ("anon_eq_realname", "anon_state",
         {"type": 1, "operator": "equal", "values": ["实名"]}),
        ("missing_prop_isnull", "noprop",
         {"type": 1, "operator": "is null", "values": []}),
    ]
    cols = []
    for rule_id, v, mj in rules:
        pred = match_predicate(d, mj, v)
        # compareProValue: empty lookup -> false BEFORE compareValue
        gated = f"({v} IS NOT NULL AND {v} <> '' AND {pred})"
        cols.append(
            f"CAST(SUM(CASE WHEN {gated} THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS u_{rule_id},\n       "
            f"CAST(SUM(CASE WHEN {gated} THEN visit_times ELSE 0 END)"
            f" AS BIGINT) AS e_{rule_id}"
        )
    sel = ",\n       ".join(cols)
    return f"""
WITH ustate AS (
  SELECT app_id, zg_id,
         COUNT(*) AS visit_times,
         SUM(COALESCE(dur, 0)) AS duration,
         CASE WHEN MAX(CASE WHEN cuid IS NOT NULL THEN 1 ELSE 0 END) = 1
              THEN '实名' ELSE '匿名' END AS anon_state
  FROM resolved
  WHERE dt = 'evt' AND app_id IN ({apps})
  GROUP BY app_id, zg_id
),
uprop AS (
  SELECT app_id, zg_id,
         max_by(prop_value, seq) FILTER (WHERE prop_name = '_plname')
             AS plname,
         max_by(prop_value, seq) FILTER (WHERE prop_name = '_nosuch')
             AS noprop
  FROM usr_props_melted
  WHERE app_id IN ({apps})
  GROUP BY app_id, zg_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(visit_times) AS BIGINT) AS n_events,
       {sel}
FROM ustate u
LEFT JOIN uprop p ON p.app_id = u.app_id AND p.zg_id = u.zg_id"""


_register("p50_match_json_userprop", _p50)


# ---------------------------------------------------------------------------
# P51 web landing-URL ad lane (AdvLidAndUserFirstEndFlatMapFunction.java:
# 755-925 processWebAndAppleASA + ToolUtil.urlParseToMap :101-135 +
# dateUsStrToTimestamp :45-70): web-side ad touches arrive as a
# $landing_url whose QUERY params identify the click —
#   * the gate is webAd.contains("lid") — a SUBSTRING test, so a URL
#     with only `valid=1` still parses (:785-787);
#   * urlParseToMap URL-DECODES FIRST, then splits on '?', '&', '=' —
#     so a %26 inside a value splits into a bogus pair (the classic
#     decode-before-split defect, kept faithful), a '=' -less pair is
#     skipped entirely, `k=` keeps key with value '' (Java split
#     trailing-empty drop), and a bare '=' part aborts the WHOLE map
#     (keyValueArr[0] on the empty split throws; catch returns a new
#     map — JVM-pinned, out of this closed fixture's alphabet);
#   * channel_type 3 (Tencent web) probes the click store by qz_gdt
#     (priority) else gdt_vid (:819-827) — the store is Redis state;
#     modeled against the empty store, so the probe key is derived and
#     the row yields NO touch (the unmatched lane :884-889);
#   * every other channel with a `lid` key becomes the (app, zgid)
#     latest-ct ad touch: AdvMessage.setFieldsWithout ''-defaults,
#     callback_url = the RAW landing url for non-Tencent (:906-908),
#     token = baidu_token when present (:911-913);
#   * Apple ASA ($channel_type 5) maps through appleASAFeildsMap (p44's
#     surface; the modern JSON wire here, the legacy iad-kv one in p44)
#     and OVERRIDES ct with clickDate via dateUsStrToTimestamp — strict
#     "yyyy-MM-dd'T'HH:mm[:ss]'Z'" UTC by length>17, unparseable → 0 →
#     no override (:806-811).
# The SQL percent-decode covers the closed fixture alphabet (%26, '+');
# the independent oracle runs Python's full unquote_plus on the same
# fixtures to pin equivalence on this domain.
#
# Scale shape: map-only regexp/JSON extraction over the evt scan + one
# 10-group agg standing in for the per-(app, zgid) max-ct reduce.
# ---------------------------------------------------------------------------
def _p51(d: Dialect) -> str:
    null_s = f"CAST(NULL AS {d.strtype})"

    def qval(key: str) -> str:
        # urlParseToMap puts over a plain split("=") walk (live-JVM-
        # pinned, tests/tools/gen_refkw_fixture.py modes um/dt): the
        # value is the segment between the FIRST and SECOND '='
        # ('k=a=b' stores 'a', not 'a=b'), and a repeated key keeps the
        # LAST occurrence (map.put overwrites) — the greedy .* prefix
        # forces the rightmost match
        return (f"regexp_extract(query, "
                f"{d.re_lit(f'(?s).*(^|&){key}=([^&=]*)')}, 2)")

    def qhas(key: str) -> str:
        return d.rlike("query", f"(^|&){key}=")

    s = d.s
    web_ad = f"""CASE cid
    WHEN 0 THEN 'https://x.cn/l?lid=11&lname=bdsearch&channel_type=4&baidu_token=tok' || {s('(user_id % 7)')} || '&utm_source=bd'
    WHEN 1 THEN 'https://x.cn/l?lid=12&lname=a%26b&channel_type=1'
    WHEN 2 THEN 'https://x.cn/l?lid=13&lname=&channel_type=2'
    WHEN 3 THEN 'https://x.cn/l?valid=1&channel_type=2'
    WHEN 4 THEN 'https://x.cn/l?lid=15&channel_type=3&qz_gdt=QZ15&gdt_vid=GV15'
    WHEN 5 THEN 'https://x.cn/l?lid=16&channel_type=3&gdt_vid=GV16'
    ELSE '' END"""
    apple_ad = """CASE cid
    WHEN 6 THEN '{"orgId":9,"campaignId":8,"adGroupId":7,"adId":0,"creativeSetId":55,"keywordId":3,"clickDate":"2023-01-04T08:11:23Z"}'
    WHEN 7 THEN '{"orgId":4,"campaignId":2,"adGroupId":1,"adId":77,"keywordId":5,"clickDate":"2023-01-04T08:11Z"}'
    WHEN 8 THEN '{"orgId":6,"campaignId":3,"adGroupId":2,"adId":9,"keywordId":1,"clickDate":"not-a-date"}'
    ELSE '{}' END"""
    apple_channel = "CASE WHEN cid IN (6, 7, 8) THEN 5 ELSE -1 END"

    # URLDecoder.decode over the closed fixture escape alphabet
    decoded = "replace(replace(web_ad, '+', ' '), '%26', '&')"
    q_pat = r"^[^?]*\?([^?]*)"
    query = f"regexp_extract({decoded}, {d.re_lit(q_pat)}, 1)"

    def aj(key: str) -> str:
        return f"COALESCE(CAST({d.json_str('apple_ad', '$.' + key)} AS BIGINT), 0)"

    click_raw = d.json_str("apple_ad", "$.clickDate")
    click_ms = (f"CASE WHEN length({click_raw}) > 17 "
                f"THEN {d.utc_str_ms(click_raw, True)} "
                f"ELSE {d.utc_str_ms(click_raw, False)} END")

    return f"""
SELECT cid, lane,
       MAX(lid) AS lid, MAX(lname) AS lname, MAX(token) AS token,
       MAX(cb_is_url) AS cb_is_url, MAX(probe_key) AS probe_key,
       MAX(channel_ad_id) AS channel_ad_id,
       COUNT(*) AS n_rows, MAX(ct_eff) AS store_max_ct,
       CAST(MAX(ct_overridden) AS BIGINT) AS ct_overridden
FROM (
  SELECT cid,
         CASE WHEN is_apple THEN 'touch'
              WHEN NOT has_admap THEN 'no_ad'
              WHEN channel_type = 3 AND probe_raw IS NOT NULL
                   THEN 'tencent_probe'
              WHEN channel_type = 3 THEN 'no_ad'
              WHEN NOT has_lid THEN 'parsed_no_lid'
              ELSE 'touch' END AS lane,
         CASE WHEN is_apple THEN '-2'
              WHEN has_admap AND channel_type <> 3 AND has_lid
                   THEN web_lid END AS lid,
         CASE WHEN is_apple THEN '苹果ASA'
              WHEN has_admap AND channel_type <> 3 AND has_lid
                   THEN web_lname END AS lname,
         CASE WHEN is_apple THEN ''
              WHEN has_admap AND channel_type <> 3 AND has_lid
                   THEN COALESCE(web_token, '') END AS token,
         CASE WHEN is_apple THEN 0
              WHEN has_admap AND channel_type <> 3 AND has_lid
                   THEN 1 END AS cb_is_url,
         CASE WHEN NOT is_apple AND channel_type = 3
                   AND probe_raw IS NOT NULL
              THEN 'adtfad:' || {s('app_id')} || ':' || probe_raw
         END AS probe_key,
         CASE WHEN is_apple THEN apple_ad_id END AS channel_ad_id,
         CASE WHEN is_apple AND click_ms IS NOT NULL AND click_ms > 0
              THEN click_ms ELSE ct END AS ct_eff,
         CASE WHEN is_apple AND click_ms IS NOT NULL AND click_ms > 0
              THEN 1 ELSE 0 END AS ct_overridden
  FROM (
    SELECT cid, app_id, ct,
           apple_channel = 5 AS is_apple,
           instr(web_ad, 'lid') > 0 AND query <> '' AS has_admap,
           TRY_CAST({qval("channel_type")} AS INT) AS channel_type,
           CASE WHEN {qhas("lid")} THEN TRUE ELSE FALSE END AS has_lid,
           {qval("lid")} AS web_lid,
           {qval("lname")} AS web_lname,
           CASE WHEN {qhas("baidu_token")} THEN {qval("baidu_token")}
           END AS web_token,
           CASE WHEN {qhas("qz_gdt")} THEN {qval("qz_gdt")}
                WHEN {qhas("gdt_vid")} THEN {qval("gdt_vid")}
           END AS probe_raw,
           CASE WHEN {aj("adId")} = 0 THEN {s(aj("creativeSetId"))}
                ELSE {s(aj("adId"))} END AS apple_ad_id,
           {click_ms} AS click_ms,
           apple_ad
    FROM (
      SELECT cid, app_id, ct, user_id, web_ad, apple_ad,
             {apple_channel} AS apple_channel,
             {query} AS query
      FROM (
        SELECT cid, app_id, ct, user_id,
               {web_ad} AS web_ad, {apple_ad} AS apple_ad
        FROM (
          SELECT CAST(user_id % 10 AS INT) AS cid, app_id, ct, user_id
          FROM resolved WHERE dt = 'evt' AND app_id IN (1, 2)
          UNION ALL
          -- constant seed row per cid: lane coverage must not depend on
          -- which user_id residues the SF's evt rows for apps 1/2 happen
          -- to contain (sf0.001 covers only 5 of the 10)
          SELECT CAST(t.cid AS INT) AS cid, 1 + t.cid % 2 AS app_id,
                 CAST(1700000000000 + t.cid AS BIGINT) AS ct,
                 CAST(t.cid AS BIGINT) AS user_id
          FROM (VALUES (0), (1), (2), (3), (4), (5), (6), (7), (8),
                       (9)) AS t(cid)
        ) b
      ) r
    ) x
  ) y
) z
GROUP BY cid, lane"""


_register("p51_web_ad_lane", _p51)


# ---------------------------------------------------------------------------
# P52 app-ss probe priority (AdvLidAndUserFirstEndFlatMapFunction.java:
# 1044-1245 processAppSS — the per-OS refinement of p42's 3-tier
# cascade): a session-start row probes the click stores with
#   * iOS: ONE exact key — idfa (:1086-1097);
#   * Android: oaid > android_id > imei with a PRESENCE short-circuit
#     (:1099-1137, `hasAndroidDevice`) — an oaid store hit wins even
#     when the android_id store holds a NEWER click; ALL exact keys
#     live in one 'adtfad:{app}:{md5}' namespace regardless of which id
#     field wrote them (setMuidProcess :408-443 writes, :1090-1137
#     probes the same prefix), so the store is keyed by the normalized
#     value alone — one melted exact_store here, not four;
#   * fuzzy only when no exact hit: the store holds ONE key per click —
#     'ip + uaAnalysis(click ua)', DOWNGRADED to ':version' for Baidu
#     channels 1/4 iPhone clicks at WRITE time (setIpUaMaps,
#     AdvSaveAppAdDataFlatMapFunction.java:260-273) — and the session
#     probes that single namespace twice: ip+uaAnalysis(session ua)
#     always, and on iOS ALSO ip+':version' (which can only find
#     downgraded clicks), the NEWER of the two hits winning (strict >,
#     :1140-1166) — not a tier, a max — the refinement p42's first-hit
#     tiers deliberately flatten; the ':version' probe requires a
#     non-empty parsed version (the :1153-1156 split-length gate);
#   * every id goes through processDeviceId (32-char pass-through else
#     md5, :1341-1358) on BOTH sides.
# The reference also CONSUMES a matched click via the del-key set
# (:1178-1210) — a batch-sequential first-prober-wins matching whose
# CDC delete lane p47 models (`is_delete`); the store here is
# unconsumed, each ss sees the full store (documented deviation: the
# set-based form of consumption is a greedy time-ordered bipartite
# matching, inherently sequential).
#
# Scale shape: identical to p42 — per-key ROW_NUMBER click stores
# (rows ∝ clicks; the fuzzy store is ONE namespace keyed by the click's
# written ua_proc form), 6 broadcastable equi-joins on the probe side,
# no inequality join; the priority/newer-of logic is all codegen CASE.
#
# Data note: the fuzzy tiers join on ENVELOPE-derived (ip, ua), and at
# small SFs clicks and sessions simply never collide (sf0.001 had zero
# ipua cases; the ipver-strictly-newer branch fired at no SF), so the
# constant P52_FIXTURES stream below is UNION'd into `keyed`: it makes
# exact_idfa, ipua, AND the newer-of ipver branch each fire at every SF
# by construction, while the real rows keep scaling the store volume.
# The independent Python port replays the same fixture rows through its
# own tier logic — shared input, not shared derivation.
# ---------------------------------------------------------------------------
# (app_id, dt, user_id, ip, k, ct, seq, zg_id, pl, ua_real); k values
# picked by residue so C1/C2/C3 enter NO exact store (k % {3,4,2} != 0),
# the S-row user_ids NULL-out every exact probe (u % {3,4,5,2} = 1),
# except the exact pair C4/S3 where 24 % 23 = 1 = 30 % 29 makes the
# md5'd idfa keys collide on purpose. C2 (k=11 → channel 5) stores the
# full 'iPhone:17.2' fuzzy key; C3 (k=31 → channel 4, Baidu + iPhone
# UA) stores the DOWNGRADED ':17.2' key, so S2's ipua hit (C2) is
# out-newered by C3 through the version-only probe — the iOS max
# branch over the single-namespace store.
P52_UA_ANDROID = ("Mozilla/5.0 (Linux; Android 13; Pixel 7) "
                  "AppleWebKit/537.36")
P52_UA_IPHONE = ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_2 like Mac OS X) "
                 "AppleWebKit/605.1.15")
P52_FIXTURES = [
    (1, "mkt", 9000001, "203.0.113.7", 7, 1699990000000, -101,
     8800001, "android", P52_UA_ANDROID),
    (1, "ss", 21, "203.0.113.7", None, 1699990005000, -102,
     8800011, "android", P52_UA_ANDROID),
    (1, "mkt", 9000002, "203.0.113.9", 11, 1699990001000, -103,
     8800002, "ios", P52_UA_IPHONE),
    (1, "mkt", 9000003, "203.0.113.9", 31, 1699990002000, -104,
     8800003, "ios", P52_UA_IPHONE),
    (1, "ss", 1, "203.0.113.9", None, 1699990006000, -105,
     8800012, "ios", P52_UA_IPHONE),
    (1, "mkt", 9000004, "203.0.113.11", 24, 1699990003000, -106,
     8800004, "ios", P52_UA_IPHONE),
    (1, "ss", 30, "203.0.113.12", None, 1699990007000, -107,
     8800013, "ios", P52_UA_IPHONE),
]


def _p52_kid(d: Dialect, prefix: str, src: str, mod: int) -> str:
    """processDeviceId'd fixture device id (32-char md5 passes through)."""
    return f"md5('{prefix}_' || {d.s(f'({src} % {mod})')})"


def p52_keyed_sql(d: Dialect) -> str:
    """The advertising-app mkt/ss stream with parsed UA fields and the
    constant P52_FIXTURES rows — shared by p52's snapshot probe and
    p54's consuming replay so the two read the same store."""
    from zg_etl_spark.functions import ua_parser as UP
    from zg_etl_spark.operators.domain import ua_real_case

    apps = ", ".join(str(a) for a in R.ADVERTISING_APPS)
    return f"""
  SELECT app_id, dt, user_id, ip, k, ct, seq, zg_id, pl,
         {UP.ua_analysis_name(d, 'ua_real')} AS ua_name,
         {UP.ua_analysis_version(d, 'ua_real')} AS ua_ver,
         CASE WHEN instr(ua_real, 'iPhone') > 0 THEN 1 ELSE 0 END
             AS ua_iphone
  FROM (
    SELECT r.app_id, r.dt, r.user_id, r.ip, r.k, r.ct, r.seq, r.zg_id,
           r.pl, {ua_real_case(d, 'r.')} AS ua_real
    FROM resolved r WHERE r.app_id IN ({apps})
    UNION ALL
    SELECT f.app_id, f.dt, f.user_id, f.ip, f.k, f.ct, f.seq, f.zg_id,
           f.pl, f.ua_real
    FROM {R.values_sql(P52_FIXTURES, [])}
         AS f(app_id, dt, user_id, ip, k, ct, seq, zg_id, pl, ua_real)
  ) s"""


def p52_clicks_sql(d: Dialect, src: str = "keyed") -> str:
    """The click records with their exact store keys and the SINGLE
    fuzzy-key form the store actually holds (FROM keyed): setIpUaMaps
    writes ONE key 'ip + uaAnalysis(ua)' per click, DOWNGRADED to
    ':version' for Baidu channels 1/4 when the raw UA contains
    'iPhone' (AdvSaveAppAdDataFlatMapFunction.java:260-273 — iPads
    parse as iPhone sessions, so Baidu web clicks drop the name).
    channel = 1 + k % 7 (fixture convention; 7 is coprime with the
    exact-key residues so the channel doesn't bias store membership)."""
    kid = lambda p, s, m: _p52_kid(d, p, s, m)
    return f"""
  SELECT app_id, ip, ua_name, ua_ver, k, k % 5 AS lid, ct, seq,
         1 + k % 7 AS ch,
         CASE WHEN (1 + k % 7) IN (1, 4) AND ua_iphone = 1
                   AND ua_ver <> '' THEN ':' || ua_ver
              ELSE ua_name || ':' || ua_ver END AS ua_proc,
         CASE WHEN k % 3 = 0 THEN {kid("idfa", "k", 23)} END AS idfa_key,
         CASE WHEN k % 4 = 0 THEN {kid("oaid", "k", 19)} END AS oaid_key,
         CASE WHEN k % 5 = 0 THEN {kid("aid", "k", 17)} END AS aid_key,
         CASE WHEN k % 2 = 0 THEN {kid("imei", "k", 13)} END AS imei_key
  FROM {src} WHERE dt = 'mkt' AND k IS NOT NULL"""


def p52_ss_sql(d: Dialect, src: str = "keyed") -> str:
    """The session-start probes (FROM keyed); ct/seq ride along for
    p54's arrival-order replay, p52's snapshot ignores them."""
    kid = lambda p, s, m: _p52_kid(d, p, s, m)
    return f"""
  SELECT app_id, zg_id, ip, ua_name, ua_ver, ct, seq,
         CASE WHEN pl = 'ios' THEN 1 ELSE 0 END AS is_ios,
         CASE WHEN user_id % 3 <> 1 THEN {kid("idfa", "user_id", 29)} END
             AS p_idfa,
         CASE WHEN user_id % 4 <> 1 THEN {kid("oaid", "user_id", 23)} END
             AS p_oaid,
         CASE WHEN user_id % 5 <> 1 THEN {kid("aid", "user_id", 21)} END
             AS p_aid,
         CASE WHEN user_id % 2 <> 1 THEN {kid("imei", "user_id", 15)} END
             AS p_imei
  FROM {src} WHERE dt = 'ss'"""


def _p52(d: Dialect, keyed_src: str | None = None) -> str:
    store = (
        "SELECT app_id, {keys}, lid, ct FROM (\n"
        "    SELECT app_id, {keys}, lid, ct,\n"
        "           ROW_NUMBER() OVER (PARTITION BY app_id, {keys}\n"
        "                              ORDER BY ct DESC, seq DESC) AS rn\n"
        "    FROM clicks{where}) t WHERE rn = 1"
    )

    if d.name == "spark":
        # ONE pass over clicks: the 4-way UNION ALL re-evaluated the
        # whole clicks lineage (keyed's UA-regex parse over resolved)
        # per key column — Spark inlines WITH-CTEs per reference.
        # explode(filter(array(...))) emits exactly the same multiset
        # (one row per non-null key column) from a single scan
        # (guide §2.4: remove redundant passes). DuckDB materializes
        # CTEs, so its UNION ALL form stays — and stays the oracle.
        exact_entries = """
  SELECT app_id, mkey, lid, ct, seq
  FROM (SELECT app_id, lid, ct, seq,
               explode(filter(array(idfa_key, oaid_key, aid_key,
                                    imei_key), x -> x IS NOT NULL))
                   AS mkey
        FROM clicks) e"""
    else:
        exact_entries = """
  SELECT app_id, idfa_key AS mkey, lid, ct, seq FROM clicks
  WHERE idfa_key IS NOT NULL
  UNION ALL
  SELECT app_id, oaid_key, lid, ct, seq FROM clicks
  WHERE oaid_key IS NOT NULL
  UNION ALL
  SELECT app_id, aid_key, lid, ct, seq FROM clicks
  WHERE aid_key IS NOT NULL
  UNION ALL
  SELECT app_id, imei_key, lid, ct, seq FROM clicks
  WHERE imei_key IS NOT NULL"""

    # keyed_src: the Spark runner materializes the UA-parsed keyed slice
    # once per (session, sf_dir) and passes its view name — the inlined
    # keyed CTE otherwise re-runs the UA regex parse per reference
    # (clicks + ss subtrees). The DuckDB oracle always inlines (DuckDB
    # materializes CTEs itself), proving the view changes nothing.
    keyed_cte = "" if keyed_src else f"keyed AS ({p52_keyed_sql(d)}\n), "
    return f"""
WITH {keyed_cte}clicks AS ({p52_clicks_sql(d, keyed_src or 'keyed')}
), exact_entries AS ({exact_entries}
), exact_store AS (
  SELECT app_id, mkey, lid, ct FROM (
    SELECT app_id, mkey, lid, ct,
           ROW_NUMBER() OVER (PARTITION BY app_id, mkey
                              ORDER BY ct DESC, seq DESC) AS rn
    FROM exact_entries) t WHERE rn = 1
), fz_store AS (
  {store.format(keys="ip, ua_proc",
                where=" WHERE ip IS NOT NULL AND ip <> ''")}
), ss AS ({p52_ss_sql(d, keyed_src or 'keyed')}
)
SELECT match_tier, lid,
       COUNT(*) AS n_sessions, COUNT(DISTINCT zg_id) AS n_users
FROM (
  SELECT /*+ BROADCAST(i, o, a, m, u, v) */ s.zg_id,
         CASE
           WHEN s.is_ios = 1 AND i.lid IS NOT NULL THEN 'exact_idfa'
           WHEN s.is_ios = 0 AND o.lid IS NOT NULL THEN 'exact_oaid'
           WHEN s.is_ios = 0 AND a.lid IS NOT NULL THEN 'exact_aid'
           WHEN s.is_ios = 0 AND m.lid IS NOT NULL THEN 'exact_imei'
           WHEN s.is_ios = 1 AND v.lid IS NOT NULL
                AND (u.lid IS NULL OR v.ct > u.ct) THEN 'ipver'
           WHEN u.lid IS NOT NULL THEN 'ipua'
           ELSE 'none' END AS match_tier,
         CASE
           WHEN s.is_ios = 1 AND i.lid IS NOT NULL THEN i.lid
           WHEN s.is_ios = 0 AND o.lid IS NOT NULL THEN o.lid
           WHEN s.is_ios = 0 AND a.lid IS NOT NULL THEN a.lid
           WHEN s.is_ios = 0 AND m.lid IS NOT NULL THEN m.lid
           WHEN s.is_ios = 1 AND v.lid IS NOT NULL
                AND (u.lid IS NULL OR v.ct > u.ct) THEN v.lid
           WHEN u.lid IS NOT NULL THEN u.lid
         END AS lid
  FROM ss s
  LEFT JOIN exact_store i
         ON s.is_ios = 1 AND i.app_id = s.app_id AND i.mkey = s.p_idfa
  LEFT JOIN exact_store o
         ON s.is_ios = 0 AND o.app_id = s.app_id AND o.mkey = s.p_oaid
  LEFT JOIN exact_store a
         ON s.is_ios = 0 AND a.app_id = s.app_id AND a.mkey = s.p_aid
  LEFT JOIN exact_store m
         ON s.is_ios = 0 AND m.app_id = s.app_id AND m.mkey = s.p_imei
  LEFT JOIN fz_store u
         ON u.app_id = s.app_id AND u.ip = s.ip
        AND u.ua_proc = s.ua_name || ':' || s.ua_ver
  LEFT JOIN fz_store v
         ON s.is_ios = 1 AND s.ua_ver <> '' AND v.app_id = s.app_id
        AND v.ip = s.ip AND v.ua_proc = ':' || s.ua_ver
) x
GROUP BY match_tier, lid"""


_P52_VIEW_MEMO: dict = {}


def _p52_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the UA-parsed keyed slice once per (session, sf_dir)
    (the _shared_view discipline; p54's consume-side build keeps its own
    independent memo of the same SQL — no lifecycle coupling), then run
    the snapshot body against the view."""
    from zg_etl_spark.operators.domain import ensure_pipeline_views
    from zg_etl_spark.session import session_key

    ensure_pipeline_views(spark, sf_dir)
    key = session_key(spark)
    if _P52_VIEW_MEMO.get(key) != sf_dir:
        df = spark.sql(p52_keyed_sql(SPARK)).localCheckpoint(eager=True)
        df.createOrReplaceTempView("p52_keyed")
        _P52_VIEW_MEMO[key] = sf_dir
    return spark.sql(_p52(SPARK, keyed_src="p52_keyed"))


QUERIES["p52_adv_ss_priority"] = _p52_run
ORACLE["p52_adv_ss_priority"] = duck_pipeline_sql(_p52(DUCK))


# ---------------------------------------------------------------------------
# P53 IPv6 geo lookup (the AwdbReader lane): IpDatabaseLoader.find(String)
# (IpDatabaseLoader.java:213-259) parses the ip with InetAddress.getByName
# and dispatches — Inet6Address → AwdbReader.get() (AwdbReader.java:55-90,
# [country, province, city]; the v6 record carries province/city as direct
# fields where v4 uses multiAreas[0] — a db-format detail, both flatten to
# the same triple), Inet4Address → the memory-mapped v4 range db, parse
# failure → ("","",""). Java maps the ::ffff:a.b.c.d textual form to an
# Inet4Address, so v4-MAPPED ipv6 text routes to the V4 database — the
# fixture pins that. The geo columns model this loader capability (what
# the enableIpv6 flag exists for, IpEnrichOperator.java:95-101).
#
# Two operator-side verdicts ride along as flags, because the shipped DW
# operator (IpEnrichOperator.java:121-231) consults them BEFORE/AFTER the
# loader:
#   * dw_private — isPrivateIp (:190-231) splits on '.' (Java split
#     DROPS trailing empty strings, so '1.2.3.4.' still has 4 parts) and
#     returns true unless exactly 4 parts with
#     Integer.parseInt-parseable parts[0]/parts[1] (sign accepted, any
#     digit count, int32 overflow throws → private) outside the private
#     blocks. Consequence kept faithful: EVERY colon-form ip
#     (including ::ffff: v4-mapped text) is "private" to the DW lane and
#     gets \N geo — the awdb lookup only serves callers without that
#     guard; '999.1.1.1' is NOT private (parts parse, 999 matches no
#     block) yet fails InetAddress → loader ("","","").
#   * dw_valid — isValidGeoResult (:236-258) rejects the whole triple
#     when any field carries control chars / U+FFFD (v6 slice 15's
#     garbled city exercises it, same convention as v4 range 31).
#
# Closed fixture alphabet (same convention as p51's percent-decode):
# IPv4-COMPATIBLE '::a.b.c.d' (non-ffff) and zoned 'fe80::1%eth0' forms
# are excluded — InetAddress accepts them, the fixtures never mint them.
#
# Scale shape: the '::' expansion and hex normalization are pure codegen
# string ops on the scan (no UDF); both range tables are broadcast-sized
# registry relations; fixed-width lowercase hex compares lexicographically
# exactly like the 128-bit address integer, so the v6 lookup is a plain
# string BETWEEN — no 128-bit arithmetic, no overflow, one 16-group agg.
# ---------------------------------------------------------------------------
def ipv6_hex32_sql(d: Dialect, inner: str, passthru: str) -> str:
    """P53's '::'-expansion + fixed-width-hex normalization lane
    (AwdbReader's textual-address handling re-expressed as pure codegen
    string ops). `inner` is a relation yielding `low` — the lowercased
    ip text — plus `passthru` columns; the result yields passthru +
    low + hex32, where hex32 is the 32-hex-digit address key (NULL for
    anything that is not a valid colon-form IPv6 text). Factored out of
    _p53 so tests/test_ipv6_fuzz.py can drive the EXACT production
    expression over arbitrary generated strings in both dialects."""
    pt = (passthru + ", ") if passthru else ""
    hexg = "[0-9a-f]{1,4}"
    g8_re = "^(" + "):(".join([hexg] * 8) + ")$"

    def cnt(x: str, ch: str) -> str:
        return f"(length({x}) - length(replace({x}, '{ch}', '')))"

    groups = ", ".join(
        f"lpad(regexp_extract(fullip, {d.re_lit(g8_re)}, {i}), 4, '0')"
        for i in range(1, 9)
    )
    return f"""
        SELECT {pt}low,
               CASE WHEN {d.rlike('fullip', g8_re)}
                    THEN concat({groups}) END AS hex32
        FROM (
          SELECT {pt}low,
                 CASE
                   WHEN instr(low, ':::') > 0 THEN CAST(NULL AS {d.strtype})
                   WHEN instr(low, '::') = 0 THEN low
                   WHEN {cnt("replace(low, '::', '|')", '|')} <> 1 THEN
                     CAST(NULL AS {d.strtype})
                   WHEN 8 - n_l - n_r < 1 THEN CAST(NULL AS {d.strtype})
                   ELSE CASE WHEN left_p = '' THEN '' ELSE left_p || ':' END
                        || repeat('0:', 8 - n_l - n_r - 1) || '0'
                        || CASE WHEN right_p = '' THEN ''
                                ELSE ':' || right_p END
                 END AS fullip
          FROM (
            SELECT {pt}low, left_p, right_p,
                   CASE WHEN left_p = '' THEN 0
                        ELSE {cnt('left_p', ':')} + 1 END AS n_l,
                   CASE WHEN right_p = '' THEN 0
                        ELSE {cnt('right_p', ':')} + 1 END AS n_r
            FROM (
              SELECT {pt}low,
                     CASE WHEN instr(low, '::') > 0
                          THEN substr(low, 1, instr(low, '::') - 1)
                          ELSE '' END AS left_p,
                     CASE WHEN instr(low, '::') > 0
                          THEN substr(low, instr(low, '::') + 2)
                          ELSE '' END AS right_p
              FROM ({inner}) v6i
            ) v6a
          ) v6b
        ) v6c"""


def dw_private_sql(d: Dialect, col: str) -> str:
    """IpEnrichOperator.isPrivateIp (IpEnrichOperator.java:190-231) as
    pure codegen SQL over the raw ip text, Java quirks included:
    ``ip.split("\\\\.")`` DROPS trailing empty strings — so '1.2.3.4.'
    has 4 parts and can be PUBLIC — only parts[0]/parts[1] are ever
    parsed, and ``Integer.parseInt`` accepts an optional sign and any
    digit count ('-0' → 0 → private; '0000000010' → 10 → private) but
    throws on int32 overflow (→ private). Closed alphabet: ASCII digits
    only (Java's Character.digit also accepts Unicode decimal digits —
    the fixtures and fuzz corpus never mint them). Factored out of _p53
    so tests can drive the EXACT production expression over arbitrary
    generated strings in both dialects; `col` yields the ip text."""

    def cnt(x: str, ch: str) -> str:
        return f"(length({x}) - length(replace({x}, '{ch}', '')))"

    # trailing dots produce exactly the trailing empty strings Java
    # drops, so stripping them makes parts == dot-count + 1
    trimmed = f"regexp_replace({col}, {d.re_lit(r'[.]+$')}, '')"
    seg1 = f"regexp_extract({col}, {d.re_lit(r'^([^.]*)[.]')}, 1)"
    seg2 = f"regexp_extract({col}, {d.re_lit(r'^[^.]*[.]([^.]*)[.]')}, 1)"
    v1 = f"TRY_CAST({seg1} AS BIGINT)"
    v2 = f"TRY_CAST({seg2} AS BIGINT)"
    return f"""CASE
      WHEN {cnt(trimmed, '.')} <> 3 THEN 1
      WHEN NOT {d.rlike(seg1, '^[+-]?[0-9]+$')}
        OR NOT {d.rlike(seg2, '^[+-]?[0-9]+$')} THEN 1
      WHEN {v1} IS NULL OR {v1} NOT BETWEEN -2147483648 AND 2147483647
        OR {v2} IS NULL OR {v2} NOT BETWEEN -2147483648 AND 2147483647
        THEN 1
      WHEN {v1} IN (10, 127, 0) THEN 1
      WHEN {v1} = 172 AND {v2} BETWEEN 16 AND 31 THEN 1
      WHEN {v1} = 192 AND {v2} = 168 THEN 1
      ELSE 0 END"""


def _p53(d: Dialect) -> str:
    from zg_etl_spark.operators.domain import geo_garbled

    s = d.s
    n = 18
    seed = "(VALUES " + ", ".join(f"({i})" for i in range(n)) + ")"
    ip_str = f"""CASE cid
    WHEN 0 THEN '2001:db8:3::' || {s('(1 + user_id % 9)')}
    WHEN 1 THEN '2001:db8:5::1'
    WHEN 2 THEN '2001:0db8:0007:0000:0000:0000:0000:0001'
    WHEN 3 THEN '::1'
    WHEN 4 THEN '2001:DB8:A::F'
    WHEN 5 THEN '::ffff:8.8.8.8'
    WHEN 6 THEN '::ffff:10.0.0.1'
    WHEN 7 THEN 'gggg::1'
    WHEN 8 THEN '1:2:3:4:5:6:7:8:9'
    WHEN 9 THEN '1::2::3'
    WHEN 10 THEN '8.8.4.4'
    WHEN 11 THEN ''
    WHEN 12 THEN '2001:db8:f::ff'
    WHEN 13 THEN 'fe80::1'
    WHEN 14 THEN '999.1.1.1'
    WHEN 15 THEN '172.20.1.1'
    WHEN 16 THEN '1.2.3.4.'
    ELSE '-1.2.3.4' END"""

    quad_re = r"^[0-9]{1,3}(\.[0-9]{1,3}){3}$"
    mapped_re = r"^::ffff:[0-9]{1,3}(\.[0-9]{1,3}){3}$"
    oct_re = r"^([0-9]+)\.([0-9]+)\.([0-9]+)\.([0-9]+)$"

    def cnt(x: str, ch: str) -> str:
        return f"(length({x}) - length(replace({x}, '{ch}', '')))"

    octs = ", ".join(
        f"TRY_CAST(regexp_extract(quad, {d.re_lit(oct_re)}, {i}) AS BIGINT)"
        f" AS o{i}"
        for i in range(1, 5)
    )
    quad_valid = " AND ".join(
        f"o{i} IS NOT NULL AND o{i} <= 255" for i in range(1, 5))

    # isPrivateIp, ported on the RAW string (split('.') quirks and all)
    dw_private = dw_private_sql(d, "low")

    gg4 = geo_garbled(d, "g4.country", "g4.province", "g4.city")
    gg6 = geo_garbled(d, "g6.country", "g6.province", "g6.city")

    inner_low = f"""
                SELECT cid, low, {octs}
                FROM (
                  SELECT cid,
                         CASE WHEN {d.rlike('low0', quad_re)} THEN low0
                              WHEN {d.rlike('low0', mapped_re)}
                              THEN substr(low0, 8)
                         END AS quad,
                         low0 AS low
                  FROM (
                    SELECT cid, lower({ip_str}) AS low0
                    FROM (SELECT CAST(user_id % {n} AS INT) AS cid, user_id
                          FROM events
                          UNION ALL
                          SELECT CAST(t.cid AS INT) AS cid,
                                 CAST(t.cid AS BIGINT) AS user_id
                          FROM {seed} AS t(cid)) e
                  ) e0
                ) e1"""
    hex_block = ipv6_hex32_sql(d, inner_low, "cid, o1, o2, o3, o4")

    return f"""
SELECT cid, lane,
       MAX(country) AS country, MAX(province) AS province,
       MAX(city) AS city,
       CAST(MAX(dw_private) AS INT) AS dw_private,
       CAST(MIN(dw_valid) AS INT) AS dw_valid,
       COUNT(*) AS n_rows
FROM (
  SELECT x.cid, x.lane,
         CASE WHEN x.lane = 'v4' THEN COALESCE(g4.country, '')
              WHEN x.lane = 'v6' THEN COALESCE(g6.country, '')
              ELSE '' END AS country,
         CASE WHEN x.lane = 'v4' THEN COALESCE(g4.province, '')
              WHEN x.lane = 'v6' THEN COALESCE(g6.province, '')
              ELSE '' END AS province,
         CASE WHEN x.lane = 'v4' THEN COALESCE(g4.city, '')
              WHEN x.lane = 'v6' THEN COALESCE(g6.city, '')
              ELSE '' END AS city,
         CASE WHEN x.lane = 'skip' THEN CAST(NULL AS INT)
              ELSE x.dw_private END AS dw_private,
         CASE WHEN x.lane = 'skip' THEN CAST(NULL AS INT)
              WHEN x.lane = 'v4' AND {gg4} THEN 0
              WHEN x.lane = 'v6' AND {gg6} THEN 0
              ELSE 1 END AS dw_valid
  FROM (
    SELECT cid, low, lane, hex32, dw_private,
           CASE WHEN lane = 'v4'
                THEN ((o1 * 256 + o2) * 256 + o3) * 256 + o4 END AS quad_long
    FROM (
      SELECT cid, low, o1, o2, o3, o4, hex32, {dw_private} AS dw_private,
             CASE WHEN low IN ('', 'null', '0.0.0.0') THEN 'skip'
                  WHEN {quad_valid} THEN 'v4'
                  WHEN hex32 IS NOT NULL THEN 'v6'
                  ELSE 'invalid' END AS lane
      FROM ({hex_block}
      ) e6
    ) e7
  ) x
  LEFT JOIN ip_ranges g4
         ON x.quad_long IS NOT NULL
        AND x.quad_long BETWEEN g4.ip_lo AND g4.ip_hi
  LEFT JOIN ipv6_ranges g6
         ON x.hex32 IS NOT NULL
        AND x.hex32 BETWEEN g6.v6_lo AND g6.v6_hi
) y
GROUP BY cid, lane"""


_register("p53_ipv6_geo", _p53)


# ---------------------------------------------------------------------------
# P55 Tencent-web click match (AdvLidAndUserFirstEndFlatMapFunction.java
# :819-889, the store-HIT half of the channel-3 lane p51 derives probe
# keys for): a web ad row whose admap carries qz_gdt (preferred) or
# gdt_vid probes the click store at 'adtfad:{appId}:{value}' — the keys
# p48's Tencent-web ingest writes from channel_click_id. On a hit the
# STORED click's payload REPLACES the web admap (lid/lname/utm come from
# the click, :840-843), the conversion row is emitted, and the claimed
# click's channel_click_id_key AND ip_ua_key join the del-set
# (:846-860); on a miss the raw message is PARKED in Redis under
# 'adtfad:{value}:rawdata' with the tengxunWebExpireTime TTL (:884-889)
# — note the parked key carries NO appId, a faithful quirk (two apps
# probing the same click id overwrite each other's parked payload; the
# output's parked_key column makes the collision visible).
#
# Batch-order note: unlike processAppSS (p54), this lane reads Redis
# LIVE (syncGet :830-834) while the del-set only executes at batch end
# (:746-748) — so WITHIN a batch every probe sees the store and two
# conversions can claim the same click; consumption is only cross-batch.
# Under the corpus-as-one-batch convention that makes the match a plain
# snapshot JOIN — no sequential replay needed — and the del-set columns
# are what the NEXT batch's store would lose.
#
# Store and probes both ride the p52 shared CTEs: Tencent clicks are
# ch = 3 (k % 7 = 2) with channel_click_id 'cck_' || k % 9; web probes
# carry pid = user_id % 11 → 'cck_' || pid (pid 9 misses: the store
# only writes cck_0..8; pid 10 has no qz_gdt/gdt_vid at all). Constant
# seed rows keep all 9 store keys and all 11 probe cases present at
# every SF (both apps), per the SF-invariance idiom.
#
# Scale shape: one broadcastable per-key store build + one equi-join +
# an 11×2-group agg; everything else is codegen string concat.
# ---------------------------------------------------------------------------
def _p55(d: Dialect) -> str:
    apps = ", ".join(str(a) for a in R.ADVERTISING_APPS)
    s = d.s
    click_seed = R.values_sql(
        [(a, i, f"198.51.100.{i}", 1699980000000 + i, -(200 + 10 * a + i))
         for a in R.ADVERTISING_APPS for i in range(9)],
        [])
    probe_seed = R.values_sql(
        [(a, i) for a in R.ADVERTISING_APPS for i in range(11)], [])
    return f"""
WITH keyed AS ({p52_keyed_sql(d)}
), clicks AS ({p52_clicks_sql(d)}
), tx_clicks AS (
  SELECT app_id, 'cck_' || {s('(k % 9)')} AS cck, k % 5 AS lid,
         ip, ua_proc, ct, seq
  FROM clicks WHERE ch = 3
  UNION ALL
  SELECT t.app_id, 'cck_' || {s('t.i')}, CAST(t.i % 5 AS BIGINT),
         t.ip, 'Android:13', CAST(t.ct AS BIGINT), CAST(t.seq AS BIGINT)
  FROM {click_seed} AS t(app_id, i, ip, ct, seq)
), cck_store AS (
  SELECT app_id, cck, lid, ip, ua_proc, ct FROM (
    SELECT app_id, cck, lid, ip, ua_proc, ct,
           ROW_NUMBER() OVER (PARTITION BY app_id, cck
                              ORDER BY ct DESC, seq DESC) AS rn
    FROM tx_clicks) t WHERE rn = 1
), probes AS (
  SELECT app_id, CAST(user_id % 11 AS INT) AS pid
  FROM resolved WHERE dt = 'evt' AND app_id IN ({apps})
  UNION ALL
  SELECT t.app_id, CAST(t.pid AS INT)
  FROM {probe_seed} AS t(app_id, pid)
)
SELECT app_id, pid, lane,
       MAX(lid) AS lid, MAX(del_cck_key) AS del_cck_key,
       MAX(del_ipua_key) AS del_ipua_key, MAX(parked_key) AS parked_key,
       COUNT(*) AS n_rows, MAX(store_ct) AS store_ct
FROM (
  SELECT p.app_id, p.pid,
         CASE WHEN p.pid = 10 THEN 'no_probe'
              WHEN c.cck IS NOT NULL THEN 'hit'
              ELSE 'miss_parked' END AS lane,
         c.lid,
         CASE WHEN c.cck IS NOT NULL
              THEN 'adtfad:' || {s('p.app_id')} || ':' || c.cck
         END AS del_cck_key,
         CASE WHEN c.cck IS NOT NULL
              THEN 'adtfad:' || {s('p.app_id')} || ':' || c.ip || c.ua_proc
         END AS del_ipua_key,
         CASE WHEN p.pid <> 10 AND c.cck IS NULL
              THEN 'adtfad:cck_' || {s('p.pid')} || ':rawdata'
         END AS parked_key,
         c.ct AS store_ct
  FROM probes p
  LEFT JOIN cck_store c
         ON p.pid <> 10 AND c.app_id = p.app_id
        AND c.cck = 'cck_' || {s('p.pid')}
) x
GROUP BY app_id, pid, lane"""


_register("p55_tencent_web_match", _p55)


# ---------------------------------------------------------------------------
# P56 path analysis: per-session event→next-event transition counts — the
# third member of the product-analytics trio (funnel p16, retention p15,
# paths here). The reference's product serves this over the wide event
# table's session grain (b_user_event_attr UNIQUE KEY(zg_id, session_id,
# uuid, event_id, begin_day_id), sql/schema.sql:96-398; session/time
# columns filled by transfer/EventAttrTransfer.java:233-350); relationally
# it is one LEAD window over the session-ordered stream plus one
# aggregation. A session's last event emits a terminal '(exit)' edge so
# per-node outflow equals the node's visit count (Sankey invariant).
#
# Scale shape: the window partitions on (app_id, zg_id, sid) — the wide
# table's own key, so at 100 TB the sort is per-session-sized (bounded,
# skew-free) on the shuffle the table layout already implies; the
# transition aggregate is a map-side-combined groupBy on the app-level
# key. (ct, seq) is a total order within a session (seq is the unique
# per-record feed sequence), so LEAD is deterministic.
# ---------------------------------------------------------------------------
def _p56(d: Dialect) -> str:
    # a session INSTANCE is (zg_id, sid) — the wide table's key prefix;
    # bare sid values may collide across users
    sess = f"{d.s('zg_id')} || ':' || {d.s('sid')}"
    return f"""
WITH path_events AS (
  SELECT app_id, zg_id, sid, event_name, ct, seq
  FROM resolved
  WHERE dt IN ('evt', 'abp') AND sid IS NOT NULL AND event_name IS NOT NULL
),
steps AS (
  SELECT app_id, zg_id, sid, event_name AS from_event,
         LEAD(event_name) OVER (
           PARTITION BY app_id, zg_id, sid ORDER BY ct, seq) AS to_event
  FROM path_events
)
SELECT app_id, from_event,
       COALESCE(to_event, '(exit)') AS to_event,
       COUNT(*) AS n_transitions,
       COUNT(DISTINCT zg_id) AS n_users,
       COUNT(DISTINCT {sess}) AS n_sessions
FROM steps
GROUP BY app_id, from_event, COALESCE(to_event, '(exit)')"""


_register("p56_event_paths", _p56)


# ---------------------------------------------------------------------------
# W10 — the scale-profile ID mode as a declared, oracle-checked query.
#
# The deterministic profile assigns zg_did/zg_uid with per-app
# DENSE_RANK over first-seen order (did_ids/uid_ids above) — faithful to
# the reference's dense Snowflake+HSETNX assignment
# (common/util/SnowflakeIdGenerator.java:21-90, OneIdService.java:
# 337-358) but serialized per app at 100 TB (one sorted window per hot
# app). The scale profile (operators/scale_ids.py) replaces it with
# xxhash64(namespace, app_id, key): map-side, shuffle-free, stable
# across batches with NO mapping store.
#
# Equivalence contract made hash-checkable: hash IDs are a pure function
# of (app_id, key), so the partition of events they induce can only
# MERGE natural-key groups (collision), never split them. Therefore
# per app: count(distinct hash_id) == count(distinct key) ⇔ the hash
# assignment is a bijection ⇔ every relational aggregate grouped by
# hash id equals the same aggregate grouped by the natural key. The
# query emits both counts from the Spark side (hash ids actually
# computed); the oracle emits the natural-key count for BOTH columns —
# the driver's value hash goes green iff the bijection holds on the
# data. tests/test_skew_scale.py additionally pins the join-back 1:1
# pairing against the dense_rank namespace and the per-device event
# multiset equality.
# ---------------------------------------------------------------------------
def _w10_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from zg_etl_spark.operators.scale_ids import (
        with_hash_device_ids,
        with_hash_user_ids,
    )

    g = spark_pipeline_df(
        spark, sf_dir, "SELECT app_id, did, cuid FROM gate_ok")
    h = with_hash_user_ids(with_hash_device_ids(g))
    return h.groupBy("app_id").agg(
        F.countDistinct("did").alias("n_dev"),
        F.countDistinct("zg_did").alias("n_dev_hash"),
        F.countDistinct("cuid").alias("n_usr"),
        F.countDistinct("zg_uid").alias("n_usr_hash"),
        F.count(F.lit(1)).alias("n_events"),
    )


QUERIES["w10_scale_ids"] = _w10_run
ORACLE["w10_scale_ids"] = duck_pipeline_sql("""
SELECT app_id,
       COUNT(DISTINCT did)  AS n_dev,
       COUNT(DISTINCT did)  AS n_dev_hash,
       COUNT(DISTINCT cuid) AS n_usr,
       COUNT(DISTINCT cuid) AS n_usr_hash,
       COUNT(*)             AS n_events
FROM gate_ok
GROUP BY app_id""")
