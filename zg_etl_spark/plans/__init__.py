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

# Round-6 window: CORRECTNESS_r05 landed 50/50 green on the round-4/5
# composition, so that block rotates behind. The window now front-loads,
# in priority order:
#   1. l37 (PQ ANN — the ONLY query that has never had a driver row;
#      2 rounds overdue) and w9 (partition-scoped partial-column upsert,
#      new this round);
#   2. the queries whose OUTPUT changed with the round-6 vtl fan-out
#      spine integration (synthesized rows now register in the event
#      dictionary, count against the cap, and reach the wide table):
#      p4, p6 (refactored onto the shared helpers), p8, p19, p21, p29,
#      p36, s4 — p21 and w3 also carried the last stale r2-era rows;
#   3. g4 (real SM2 key-unwrap via the pure-Python GB/T 32918
#      implementation) and s9 (streaming partial-column sink) — new this
#      round, displacing p34/p33;
#   4. q20 (time-bucket gap-fill + LOCF), p41 (ad channel-metadata
#      annotation), p42 (ad click→device matching cascade), p43
#      (match_json conversion gates), p44 (Apple ASA normalization),
#      p45 (DevicePropertyParser device classification), p46 (Dims.java
#      dimension mappings), p47 (AdvProcessFunction CDC click routing),
#      p48 (click-store key build), p49 (deep-conversion multi-event
#      gate + callback envelope), p50 (match_json userProp gates), p51
#      (web landing-URL ad lane), p52 (app-ss probe priority), s10
#      (streaming deep-conversion TTL'd status-key gate) — new this
#      round — and p38 (gained the first::latest follow-collapse
#      semantics, so its r5 row attests the OLD formulation) and p7
#      (geo garbled-result guard changed its formulation this round,
#      displacing p27's r3-green row); together displacing
#      p31/p30/p32/p28/l1-l11's r3-green rows;
#   5. the r3-era stale-attestation band, oldest first: l12-l27,
#      s1/s3/s5, g1, p0.
# The remainder (p33, p34, p35, w2, l1-l11, the q-suite except q11, and the freshly-green
# r5 window: q11, p37/p39/p40, s2, s6-s8, w1, w4-w8, g2-g3, l28-l36,
# p1-p3, p5, p9-p18, p20, p22-p26) stays in the tail, covered by the
# local sf0.01 parity rehearsal; p33/p34/p35/w2/l1-l11/q-suite are the
# first candidates for the round-7 window (their green rows are
# r2/r3-era).
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "l37_pq_ann",
    "w9_partial_upsert",
    "w3_compat_csv_roundtrip",
    "p4_dictionaries",
    "p6_virtual_events",
    "p8_wide_table",
    "p19_event_highwater",
    "p21_sink_counts",
    "p29_event_resolution",
    "p36_event_platforms",
    "s4_streaming_route",
    "p44_apple_asa",
    "p45_device_classify",
    "p46_dims_mapping",
    "p47_adv_cdc_route",
    "p48_adv_click_keys",
    "p49_adv_deep_convert",
    "p50_match_json_userprop",
    "p51_web_ad_lane",
    "p52_adv_ss_priority",
    "s10_streaming_deep_convert",
    "p38_adv_user_sources",
    "l12_tokens_fingerprint",
    "l13_curation",
    "l14_ann_pandas",
    "l15_multimodal_features",
    "l16_dedup_groups",
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
    "s1_streaming_identity",
    "s3_streaming_counts",
    "s5_streaming_zgid",
    "g1_wire_roundtrip",
    "p0_envelope",
    "p7_enrichment",
    "p43_adv_match_json",
    "p41_adv_channel_props",
    "q20_gapfill_locf",
    "p42_adv_click_match",
    "s9_stream_partial_upsert",
    "g4_sm2_unwrap",
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
