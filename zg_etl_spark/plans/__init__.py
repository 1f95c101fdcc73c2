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

# First-50 priority: 27 llm + 5 streaming + g1/g2 (g2 closes the last
# never-driver-verified component, the G2 crypto path) + p27..p36 = 44
# never-driver-verified, then the pipeline queries whose semantics
# changed this round (feed gained ref/device/ua fields; p5-p8 reworked).
# p11/w1 land just past the cut: their changed forms stay locally
# verified (test_oracle_parity at sf0.01) and their components hold
# green r2 driver rows. The twice-green remainder rotates behind.
#
# EXPLICIT, not module-unpacked: a query added to llm/streaming/gate
# must be slotted here deliberately — unpacking whole modules let any
# new entry silently displace the intended 50th query.
#
# Round-4 rotation plan: once CORRECTNESS_r03 lands green, rotate in
# the still-unverified round-3 additions (p37-p39, s6-s7, l28-l33) plus
# the reworked p11/w1, and rotate the r3-verified l/s/g block behind —
# the q-suite (three times green by then) stays in the tail.
_WINDOW = [
    "l1_text_stats", "l2_lang_id", "l3_dedup_exact", "l4_ngram_jaccard",
    "l5_minhash_signatures", "l6_lsh_candidates", "l16_dedup_groups",
    "l7_simhash", "l8_ann_bruteforce", "l9_ann_ivf", "l11_embedding_neardup",
    "l12_tokens_fingerprint", "l13_curation", "l14_ann_pandas",
    "l15_multimodal_features", "l17_resize_features", "l10_multimodal_binary",
    "l18_split_sample", "l19_tfidf_terms", "l20_chunking", "l21_bigram_stats",
    "l22_stratified_sample", "l23_frame_sample", "l24_pii_scrub",
    "l25_decontaminate", "l26_repetition_filter", "l27_dedup_keep_list",
    "s1_streaming_identity", "s2_streaming_sessions", "s3_streaming_counts",
    "s4_streaming_route", "s5_streaming_zgid",
    "g1_wire_roundtrip", "g2_wire_crypto",
    "p27_user_profile",
    "p28_gate_business",
    "p29_event_resolution",
    "p30_search_keywords",
    "p31_adv_attribution",
    "p32_synthesized_records",
    "p33_ua_parse",
    "p34_user_duration",
    "p35_user_anonymous",
    "p36_event_platforms",
    "p0_envelope",
    "p4_dictionaries",
    "p5_virtual_attrs",
    "p6_virtual_events",
    "p7_enrichment",
    "p8_wide_table",
    "p11_b_device_upsert",
    "w1_upsert_writer",
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
