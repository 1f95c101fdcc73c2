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

# Round-12 window: CORRECTNESS_r11 landed 50/50 hash-green on the
# round-11 composition, so that block rotates behind. The window
# front-loads, in priority order (the round-11 verdict's explicit
# rotation instruction):
#   1. p54_click_consumption — the only query that has NEVER had a
#      driver row (its full DuckDB oracle landed mid-r11, its
#      memoized+exploded form in r11), plus the three r11 rewrites
#      whose NEW form has only local parity evidence: q10 (set-op
#      counts in one scan), p3 (collect_set window), and l10 (the
#      multimodal family whose extract_features path r11 vectorized
#      and r12 re-narrowed to uint8);
#   2. the whole 39-query r9-attested band — the oldest driver rows
#      after r11's full-green window: g4, l11-l15/l17-l27 (includes
#      the rewritten-op l15/l17/l23 and this round's ANN/CC targets
#      l11/l14), p19/p21/p29/p34/p36/p38/p41/p44/p47-p50/p55/p56
#      (includes the r11 from_json rewrite p47), s1/s3/s4/s6/s9/s10,
#      w3/w9;
#   3. seven r11-attested queries whose implementation round 12
#      touches again: the staged-commit sinks w1/w4/w5/w6, the spine
#      p0, the CC iteration l16, and the sessions lane s2.
# The remainder (the r10/r11-green band) stays in the tail, covered by
# the local sf0.01 parity rehearsal; after this rotation nothing
# attested is older than round 10.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "p54_click_consumption",
    "q10_set_ops",
    "p3_zgid_binding",
    "l10_multimodal_binary",
    "g4_sm2_unwrap",
    "l11_embedding_neardup",
    "l12_tokens_fingerprint",
    "l13_curation",
    "l14_ann_pandas",
    "l15_multimodal_features",
    "l17_resize_features",
    "l18_split_sample",
    "l19_tfidf_terms",
    "l20_chunking",
    "l21_bigram_stats",
    "l22_stratified_sample",
    "l23_frame_sample",
    "l24_pii_scrub",
    "l25_decontaminate",
    "l26_repetition_filter",
    "l27_dedup_keep_list",
    "p19_event_highwater",
    "p21_sink_counts",
    "p29_event_resolution",
    "p34_user_duration",
    "p36_event_platforms",
    "p38_adv_user_sources",
    "p41_adv_channel_props",
    "p44_apple_asa",
    "p47_adv_cdc_route",
    "p48_adv_click_keys",
    "p49_adv_deep_convert",
    "p50_match_json_userprop",
    "p55_tencent_web_match",
    "p56_event_paths",
    "s1_streaming_identity",
    "s3_streaming_counts",
    "s4_streaming_route",
    "s6_streaming_dedup",
    "s9_stream_partial_upsert",
    "s10_streaming_deep_convert",
    "w3_compat_csv_roundtrip",
    "w9_partial_upsert",
    "w1_upsert_writer",
    "w4_partition_overwrite",
    "w5_compaction",
    "w6_delete_sign",
    "p0_envelope",
    "l16_dedup_groups",
    "s2_streaming_sessions",
    # behind the 50-query cut — stay listed so a future rotation is a
    # reorder, not a rediscovery
    "p45_device_classify",
    "g1_wire_roundtrip",
    "p54c_candidates",
    "p54d_replay_rollup",
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
