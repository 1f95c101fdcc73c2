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

# Round-8 window: CORRECTNESS_r07 landed 49 hash-green + p54 rows-only
# on the round-7 composition, so that block rotates behind. The window
# now front-loads, in priority order:
#   1. p54c_candidates (new — the driver-hashable half of p54's replay:
#      its candidate-resolution joins under a full DuckDB value oracle)
#      and w10_scale_ids (new — the xxhash64 scale-profile ID mode as a
#      bijection-checking query);
#   2. the queries whose OUTPUT changed with the round-7 advisory fixes
#      (ip-gated fuzzy click-store writes; two new p53 fixture cids for
#      the trailing-dot / signed-octet isPrivateIp paths): p42, p52,
#      p53 — their r7 rows attest the pre-fix output;
#   3. the stale-attestation band, oldest first (everything last green
#      in round 5): q11/q20, p1-p3/p5/p7/p9-p18/p20/p22-p26, p37/p40,
#      w1/w4-w8, g2/g3, l28-l37, s7/s8.
# The remainder (the r6/r7-green band) stays in the tail, covered by
# the local sf0.01 parity rehearsal; after this rotation nothing
# attested is older than round 6.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "p54c_candidates",
    "w10_scale_ids",
    "p42_adv_click_match",
    "p52_adv_ss_priority",
    "p53_ipv6_geo",
    "q11_approx_distinct",
    "q20_gapfill_locf",
    "p1_gate_errors",
    "p2_identity_mappings",
    "p3_zgid_binding",
    "p5_virtual_attrs",
    "p7_enrichment",
    "p9_user_properties",
    "p10_b_user_upsert",
    "p11_b_device_upsert",
    "p12_id_archive",
    "p13_user_visit_stats",
    "p14_first_touch",
    "p15_retention_cohort",
    "p16_funnel",
    "p17_user_prop_dict",
    "p18_device_props",
    "p20_asof_props",
    "p22_session_attribution",
    "p23_ad_conversion",
    "p24_app_first_seen",
    "p25_time_rollup",
    "p26_error_details",
    "p37_user_detail_sum",
    "p40_salted_counters",
    "w1_upsert_writer",
    "w4_partition_overwrite",
    "w5_compaction",
    "w6_delete_sign",
    "w7_schema_evolution",
    "w8_retention_sweep",
    "g2_wire_crypto",
    "g3_rsa_unwrap",
    "l28_source_mixture",
    "l29_semantic_dedup",
    "l30_dup_span_fraction",
    "l31_candidate_verify",
    "l32_vocab_coverage",
    "l33_lm_quality_score",
    "l34_source_overlap",
    "l35_incremental_dedup",
    "l36_sequence_packing",
    "l37_pq_ann",
    "s7_stream_stream_join",
    "s8_stream_upsert_delete",
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
