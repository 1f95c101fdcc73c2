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

from zg_etl_spark.plans import gate_queries, llm, pipeline, relational, streaming_queries

# Round-4 window: CORRECTNESS_r03 landed 50/50 green, so the l1-l27 /
# s1-s5 / g1-g2 / p27-p36 / p0 / p4 block rotates behind. The window now
# front-loads, in priority order:
#   1. the 16 queries that have NEVER had a driver row across r1-r3
#      (q11 — failed r1/r2 with no_oracle, fixed, never re-windowed —
#      p37-p40, s6-s7, w5, l28-l35) plus the new w6 (delete-sign upsert);
#   2. the queries whose implementation CHANGED in round 4, so their
#      previous green rows attest a superseded formulation: s6
#      (watermark-bounded dedup), p6 (arbitrary-N filters), p5 (custom-bag
#      fields), p7/p8 (inlined UA parser), w1/w4/w6 (sink rework);
#   3. the r2-era band whose spine changed in round 3 and whose rows are
#      therefore stale attestations: p11, p13-p26 (minus p21, which
#      yields to the archive-fix p12), p1-p3, p9, p10, p12;
#   4. queries whose round-4 rework/addition displaced the remaining
#      stale-era candidates (w2's r2 row attests its unchanged TPC-H
#      formulation exactly, so it yields its slot): s2 (foreachBatch
#      changelog store), l36 (sequence packing), s8 (streaming
#      delete-sign sink), g2 (reference-faithful wire transports), g3
#      (real RSA key-unwrap), w7 (schema evolution), w8 (retention
#      sweep).
# The remainder (l1-l27, s1/s3-s5, g1, p0, p4, p21, p27-p36, w2, w3,
# the q-suite except q11) stays in the tail, covered by
# the local sf0.01 parity rehearsal; p21/w3's stale-era rows are the
# first candidates for the round-5 window.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "q11_approx_distinct",
    "p37_user_detail_sum",
    "p38_adv_user_sources",
    "p39_baidu_eqid",
    "p40_salted_counters",
    "s6_streaming_dedup",
    "s7_stream_stream_join",
    "w5_compaction",
    "w6_delete_sign",
    "l28_source_mixture",
    "l29_semantic_dedup",
    "l30_dup_span_fraction",
    "l31_candidate_verify",
    "l32_vocab_coverage",
    "l33_lm_quality_score",
    "l34_source_overlap",
    "l35_incremental_dedup",
    "p5_virtual_attrs",
    "p6_virtual_events",
    "p7_enrichment",
    "p8_wide_table",
    "p11_b_device_upsert",
    "w1_upsert_writer",
    "w4_partition_overwrite",
    "p13_user_visit_stats",
    "p14_first_touch",
    "p15_retention_cohort",
    "p16_funnel",
    "p17_user_prop_dict",
    "p18_device_props",
    "p19_event_highwater",
    "p20_asof_props",
    "p12_id_archive",
    "p22_session_attribution",
    "p23_ad_conversion",
    "p24_app_first_seen",
    "p25_time_rollup",
    "p26_error_details",
    "p1_gate_errors",
    "p2_identity_mappings",
    "p3_zgid_binding",
    "p9_user_properties",
    "p10_b_user_upsert",
    "s2_streaming_sessions",
    "l36_sequence_packing",
    "s8_stream_upsert_delete",
    "g2_wire_crypto",
    "g3_rsa_unwrap",
    "w7_schema_evolution",
    "w8_retention_sweep",
]

_MODULES = (llm, streaming_queries, gate_queries, pipeline, relational)


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
