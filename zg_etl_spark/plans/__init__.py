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

# Round-9 window: CORRECTNESS_r08 landed 50/50 hash-green on the round-8
# composition, so that block rotates behind. After r8 the OLDEST driver
# rows are the 41 round-6-attested queries; the window front-loads, in
# priority order:
#   1. the spine's most load-bearing relations first (p8 wide table, p6
#      virtual events — two rounds stale), then the rest of the r6 band:
#      g1/g4, l12-l15/l17-l27, p0/p4, p19/p21/p29/p36/p38/p41/p43-p46/
#      p49/p50, s1/s3-s5/s9/s10, w3/w9;
#   2. picks from the next-oldest (r7) band: the three bench watch
#      items (l16/s6/l11 — re-attest alongside their standalone A/B),
#      the adv lanes p47/p48/p51/p55 — plus the queries whose OUTPUT
#      changed this round and the query NEW this round:
#      p56 (new: path analysis — a brand-new query needs its FIRST
#      driver row), and p7 (output changed: the wide-table UTM lane was
#      reworked to EventAttrTransfer's exact semantics — isSearchEngine
#      host set, given-family medium passthrough, closed-alphabet
#      decodeMultiCharset, getUtmTermFromRef fallback; p8 shares the
#      change and is already in the window) and p34 (output changed:
#      yw/yearweek moved from ISO-8601 weeks to the reference's actual
#      SimpleDateFormat("YYYYww") Sunday-start/min-1 rules, pinned
#      against a JVM-generated fixture). w2, s2 and p51 yield their
#      slots: all r7-attested, plan-stable, locally parity-checked
#      every round (p51 additionally carries its own Java-port tests).
# The remainder (the r7/r8-green band) stays in the tail, covered by
# the local sf0.01 parity rehearsal; after this rotation nothing
# attested is older than round 7.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
_WINDOW = [
    "p8_wide_table",
    "p6_virtual_events",
    "p0_envelope",
    "p4_dictionaries",
    "g1_wire_roundtrip",
    "g4_sm2_unwrap",
    "p19_event_highwater",
    "p21_sink_counts",
    "p29_event_resolution",
    "p36_event_platforms",
    "p38_adv_user_sources",
    "p41_adv_channel_props",
    "p43_adv_match_json",
    "p44_apple_asa",
    "p45_device_classify",
    "p46_dims_mapping",
    "p49_adv_deep_convert",
    "p50_match_json_userprop",
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
    "s1_streaming_identity",
    "s3_streaming_counts",
    "s4_streaming_route",
    "s5_streaming_zgid",
    "s9_stream_partial_upsert",
    "s10_streaming_deep_convert",
    "w3_compat_csv_roundtrip",
    "w9_partial_upsert",
    "l16_dedup_groups",
    "l11_embedding_neardup",
    "s6_streaming_dedup",
    "p47_adv_cdc_route",
    "p48_adv_click_keys",
    "p34_user_duration",
    "p55_tencent_web_match",
    "p56_event_paths",
    "p7_enrichment",
    # behind the 50-query cut — stay listed so a future rotation is a
    # reorder, not a rediscovery
    "s2_streaming_sessions",
    "w2_bucketed_join",
    "p51_web_ad_lane",
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
