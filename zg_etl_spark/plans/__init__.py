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

# Round-11 window: CORRECTNESS_r10 landed 50/50 hash-green on the
# round-10 composition, so that block rotates behind. After r10 the
# OLDEST driver rows are the 40 round-8-attested queries; the window
# front-loads, in priority order:
#   1. the queries whose OUTPUT changed during round 10 AFTER their
#      last driver attestation (the r10 window was set before these
#      fixes landed): p45 — the DevicePropertyParser fuzzy brand scan
#      moved to the reference HashMap's iteration order (JVM fixture
#      mode 'dp') — and g1 — the zlib wire lane's UTF-8 decode moved
#      to the JDK's exact malformed-length rules (surrogate triple =
#      ONE U+FFFD);
#   2. the whole 40-query r8 band: l28-l37 (minus the r10-re-attested
#      l30/l31), p10-p18/p20/p22-p26, p37/p40/p42/p52/p53/p54c,
#      q11/q20, s7/s8, w1/w4-w8/w10;
#   3. picks from the next-oldest (r9) band: the spine relations
#      p0/p4/p6, the zgid streaming lane s5, the dedup connected
#      components l16, and the two documented JVM-boundary queries
#      p43/p46 (this round's fastjson2 probe targets their surface —
#      re-attest them on whatever the probe concludes).
# The remainder (the r9/r10-green band) stays in the tail, covered by
# the local sf0.01 parity rehearsal; after this rotation nothing
# attested is older than round 9.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "p45_device_classify",
    "g1_wire_roundtrip",
    "l28_source_mixture",
    "l29_semantic_dedup",
    "l32_vocab_coverage",
    "l33_lm_quality_score",
    "l34_source_overlap",
    "l35_incremental_dedup",
    "l36_sequence_packing",
    "l37_pq_ann",
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
    "p42_adv_click_match",
    "p52_adv_ss_priority",
    "p53_ipv6_geo",
    "p54c_candidates",
    "q11_approx_distinct",
    "q20_gapfill_locf",
    "s7_stream_stream_join",
    "s8_stream_upsert_delete",
    "w1_upsert_writer",
    "w4_partition_overwrite",
    "w5_compaction",
    "w6_delete_sign",
    "w7_schema_evolution",
    "w8_retention_sweep",
    "w10_scale_ids",
    "p0_envelope",
    "p4_dictionaries",
    "p6_virtual_events",
    "s5_streaming_zgid",
    "l16_dedup_groups",
    "p43_adv_match_json",
    "p46_dims_mapping",
    "p54d_replay_rollup",
    # behind the 50-query cut — stay listed so a future rotation is a
    # reorder, not a rediscovery
    "p8_wide_table",
    "p7_enrichment",
    "p5_virtual_attrs",
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
