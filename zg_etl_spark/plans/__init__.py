"""Declared analytical queries — the engine's query surface.

Each module contributes:
    QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
    ORACLE:  dict[str, str]   # DuckDB SQL equivalents (omit → rows-only check)

Ordering matters: the driver's CORRECTNESS verify covers the FIRST 50
entries of the merged dict (insertion order).  Rounds 1-2 verified
q1-q19 / p0-p26 / w1-w4 (all green); the l/s/g queries and p27+ had
never had a driver row.  ``_WINDOW`` therefore front-loads the
never-verified queries plus the pipeline queries whose implementation
changed this round; the twice-green remainder rotates behind them.
"""

from zg_etl_spark.plans import (
    consume, gate_queries, llm, pipeline, relational, streaming_queries)

# Round-7 window: CORRECTNESS_r06 landed 50/50 green on the round-6
# composition, so that block rotates behind. The window now front-loads,
# in priority order:
#   1. p53 (IPv6 geo, new) and p54 (click-consumption sequential replay,
#      new — rows-only check, no SQL oracle by design);
#   2. the queries whose OUTPUT changed with the SF-invariant fixture
#      seeding (constant seed rows / the P52_FIXTURES stream): p47, p48,
#      p51, p52 — their r6 rows attest the unseeded spines;
#   3. l16 (broadcast hint dropped from the per-round edge join — same
#      values, different plan; re-attest the formulation);
#   4. the stale-attestation band, oldest first: the r2-era q-suite
#      (q1-q10, q12-q19) and w2, then the r3-era p27/p28/p30-p35 and
#      l1-l11;
#   5. p55 (Tencent-web click match, new) and p42 (its fuzzy store
#      became the faithful single-namespace
#      form with the Baidu-iPhone downgraded key — output changed),
#      plus three r5-era refreshers: p39, s2, s6.
# The remainder (the r5/r6-green band: q11, q20, p0-p26, p29, p36, p38,
# p41-p46, p49/p50, l12-l37, s1/s3-s5/s7-s10, g1-g4, w1/w3-w9) stays in
# the tail, covered by the local sf0.01 parity rehearsal; after this
# rotation nothing attested is older than r5.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "p53_ipv6_geo",
    "p54_click_consumption",
    "p47_adv_cdc_route",
    "p48_adv_click_keys",
    "p51_web_ad_lane",
    "p52_adv_ss_priority",
    "l16_dedup_groups",
    "q1_pricing_summary",
    "q2_orders_customer_join",
    "q3_revenue_by_nation",
    "q4_nation_region",
    "q5_semi_anti",
    "q6_hash_agg",
    "q7_rollup",
    "q8_window_topk",
    "q9_top_parts",
    "q10_set_ops",
    "q12_scalar_functions",
    "q13_cube",
    "q14_grouping_sets",
    "q15_percentiles",
    "q16_window_frames",
    "q17_supplier_revenue",
    "q18_correlated_subquery",
    "q19_not_in_null_aware",
    "w2_bucketed_join",
    "p27_user_profile",
    "p28_gate_business",
    "p30_search_keywords",
    "p31_adv_attribution",
    "p32_synthesized_records",
    "p33_ua_parse",
    "p34_user_duration",
    "p35_user_anonymous",
    "l1_text_stats",
    "l2_lang_id",
    "l3_dedup_exact",
    "l4_ngram_jaccard",
    "l5_minhash_signatures",
    "l6_lsh_candidates",
    "l7_simhash",
    "l8_ann_bruteforce",
    "l9_ann_ivf",
    "l10_multimodal_binary",
    "l11_embedding_neardup",
    "p55_tencent_web_match",
    "p39_baidu_eqid",
    "p42_adv_click_match",
    "s2_streaming_sessions",
    "s6_streaming_dedup",
]

_MODULES = (llm, streaming_queries, gate_queries, pipeline, relational, consume)


def _ordered(attr):
    merged = {}
    for m in _MODULES:
        merged.update(getattr(m, attr))
    out = {k: merged[k] for k in _WINDOW if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def all_queries():
    return _ordered("QUERIES")


def all_oracles():
    return _ordered("ORACLE")
