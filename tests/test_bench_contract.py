"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-4 composition: the 16 queries that had never had a driver row
    by round 3 (q11, p37-p40, s6-s7, w5, l28-l35), every query whose
    implementation changed or was added in round 4 (p5-p8, w1, w4,
    w6-w8, s2, s6, s8, g2, g3, l36), and the stale-attestation r2-era
    band (p1-p3, p9-p26 pipeline queries); registering a new query must
    never silently displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["q11_", "w5_", "w6_", "w7_", "w8_", "s6_", "s7_",
                     "s2_", "s8_", "g2_", "g3_"]
    want_prefixes += [f"p{i}_" for i in range(37, 41)]
    want_prefixes += [f"l{i}_" for i in range(28, 37)]
    want_prefixes += ["p5_", "p6_", "p7_", "p8_", "w1_", "w4_"]
    # p21 yields its slot to p12, whose archive key directions changed in
    # round 4 (p21's formulation is the stale-era band's simplest member;
    # it stays locally verified and is a round-5 rotation candidate)
    want_prefixes += [f"p{i}_" for i in range(13, 27) if i != 21]
    want_prefixes += ["p1_", "p2_", "p3_", "p9_", "p10_", "p11_", "p12_"]
    for prefix in want_prefixes:
        assert any(q.startswith(prefix) for q in first50), (
            f"{prefix}* fell out of the driver's 50-query window"
        )


def test_bench_line_fits_driver_capture_window():
    from bench import _short_keys

    queries = plans.all_queries()
    per = {name: 999.99 for name in queries}  # worst-case value widths
    short = _short_keys(per)
    assert len(short) == len(per), "short-id collision would fall back to long names"
    line = json.dumps(
        {
            "metric": "declared_query_suite_wall",
            "value": 9999.999,
            "unit": "sec",
            "sf": 0.1,
            "warm_suite_sec": 9999.999,
            "streaming_warm_sec": 9999.99,
            "duckdb_oracle_suite_sec": 9999.999,
            "spark_over_duckdb_ratio": 99.99,
            "warm_ratio": 99.99,
            "warm_batch_ratio": 99.99,
            "driver_python_peak_mb": 99999,
            "queries": {k: round(v, 2) for k, v in short.items()},
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1900, (
        f"bench line {len(line)} chars would overflow the driver's "
        f"2000-char capture window"
    )


def test_driver_window_is_the_planned_rotation():
    """The driver's CORRECTNESS file covers the FIRST 50 entries of
    all_queries(); round 4 pins that window to the never-driver-verified
    set (all 16 of them — VERDICT r3 flagged that the previous rotation
    plan omitted q11/p40/w5/l34/l35), the round-4 reworks, and the
    stale-attestation r2-era band. A later registry edit must not
    silently displace them — rotation is a DELIBERATE _WINDOW change,
    not a side effect."""
    from zg_etl_spark import plans

    first50 = list(plans.all_queries())[:50]
    assert first50 == plans._WINDOW[:50]
    # every window name resolves (a typo'd name would silently shrink
    # the verified set and promote a tail query into the window)
    merged = plans.all_queries()
    missing = [n for n in plans._WINDOW if n not in merged]
    assert not missing, missing
    # ALL 16 never-driver-verified queries are inside the cut
    never_verified = [
        "q11_approx_distinct", "p37_user_detail_sum", "p38_adv_user_sources",
        "p39_baidu_eqid", "p40_salted_counters", "s6_streaming_dedup",
        "s7_stream_stream_join", "w5_compaction",
        "l28_source_mixture", "l29_semantic_dedup", "l30_dup_span_fraction",
        "l31_candidate_verify", "l32_vocab_coverage", "l33_lm_quality_score",
        "l34_source_overlap", "l35_incremental_dedup",
    ]
    for name in never_verified + ["w6_delete_sign", "w7_schema_evolution",
                                  "w8_retention_sweep", "g3_rsa_unwrap",
                                  "s2_streaming_sessions",
                                  "l36_sequence_packing",
                                  "s8_stream_upsert_delete"]:
        assert name in first50, f"{name} missing from the driver window"
    # the r3-green block rotated BEHIND the cut (still locally verified
    # by the sf0.01 parity rehearsal)
    for name in ("l1_text_stats", "s1_streaming_identity", "g1_wire_roundtrip",
                 "p0_envelope", "p27_user_profile", "w2_bucketed_join"):
        assert name in merged and name not in first50, name
