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

# Round-10 window: CORRECTNESS_r09 landed 50/50 hash-green on the
# round-9 composition, so that block rotates behind. After r9 the
# OLDEST driver rows are the 39 round-7-attested queries; the window
# front-loads, in priority order:
#   1. the queries whose OUTPUT changed this round: p8/p7 — the wide
#      table's getUtmTermFromRef fallback moved to exact java.net.URI
#      semantics (fragment-before-query → null, URISyntaxException
#      gate, getHost() server-parse rules, the second URLDecoder
#      layer's throw channel), pinned against the reference class
#      executed on this JDK (refkw_jvm_fixture mode 'ut') — and p5
#      (bind_one lambda names moved from a global counter to nesting
#      depth: same plans, reproducible SQL text);
#   2. the whole r7 band: l1-l10, p27/p28/p30-p33/p35/p39/p51,
#      q1-q10/q12-q19, s2, w2;
#   3. picks from the next-oldest (r8) band: the gate crypto lanes
#      g2/g3, the spine identity relations p1/p2/p3/p9, and the two
#      BENCH_r09 outlier re-reads l30/l31 (21.2 s / 6.8 s in the
#      throttled driver pass; 1.2 s / 1.5 s in the round-10 opening
#      A/B — re-attest alongside the standalone numbers).
# The remainder (the r8/r9-green band) stays in the tail, covered by
# the local sf0.01 parity rehearsal; after this rotation nothing
# attested is older than round 8.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "p8_wide_table",
    "p7_enrichment",
    "p5_virtual_attrs",
    "p30_search_keywords",
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
    "p27_user_profile",
    "p28_gate_business",
    "p31_adv_attribution",
    "p32_synthesized_records",
    "p33_ua_parse",
    "p35_user_anonymous",
    "p39_baidu_eqid",
    "p51_web_ad_lane",
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
    "s2_streaming_sessions",
    "w2_bucketed_join",
    "g2_wire_crypto",
    "g3_rsa_unwrap",
    "p1_gate_errors",
    "p2_identity_mappings",
    "p3_zgid_binding",
    "p9_user_properties",
    "l30_dup_span_fraction",
    "l31_candidate_verify",
    # behind the 50-query cut — stay listed so a future rotation is a
    # reorder, not a rediscovery
    "p0_envelope",
    "p6_virtual_events",
    "p4_dictionaries",
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
