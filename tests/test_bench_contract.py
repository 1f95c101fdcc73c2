"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-10 composition: the output-changed queries first (p8/p7 —
    getUtmTermFromRef moved to exact java.net.URI semantics — and p5 —
    depth-derived bind_one lambda names), then the whole 39-query
    round-7-attested band (the oldest driver rows after r9's full-green
    window), then picks from the next-oldest r8 band (gate crypto
    g2/g3, spine identity p1/p2/p3/p9, and the BENCH_r09 outlier
    re-reads l30/l31); registering a new query must never silently
    displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["g2_", "g3_", "w2_", "s2_"]
    want_prefixes += [f"p{i}_" for i in (1, 2, 3, 5, 7, 8, 9, 27, 28,
                                         30, 31, 32, 33, 35, 39, 51)]
    want_prefixes += [f"l{i}_" for i in (*range(1, 11), 30, 31)]
    want_prefixes += [f"q{i}_" for i in (*range(1, 11), *range(12, 20))]
    for prefix in want_prefixes:
        assert any(q.startswith(prefix) for q in first50), (
            f"{prefix}* fell out of the driver's 50-query window"
        )


def test_bench_line_fits_driver_capture_window():
    from bench import _short_keys

    queries = plans.all_queries()
    # worst-case emitted width: bench saturates per-query values at 99.9
    per = {name: 99.9 for name in queries}
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
            "queries": {k: min(round(v, 1), 99.9) for k, v in short.items()},
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1900, (
        f"bench line {len(line)} chars would overflow the driver's "
        f"2000-char capture window"
    )


def test_driver_window_is_the_planned_rotation():
    """The driver's CORRECTNESS file covers the FIRST 50 entries of
    all_queries(); round 10 pins that window to the output-changed
    p8/p7/p5, the whole 39-query r7-attested band (the oldest rows
    after r9's full-green window), and nine r8-band picks. A later
    registry edit must not silently displace them — rotation is a
    DELIBERATE _WINDOW change, not a side effect."""
    from zg_etl_spark import plans

    first50 = list(plans.all_queries())[:50]
    assert first50 == plans._WINDOW[:50]
    # every window name resolves (a typo'd name would silently shrink
    # the verified set and promote a tail query into the window)
    merged = plans.all_queries()
    missing = [n for n in plans._WINDOW if n not in merged]
    assert not missing, missing
    must_have = [
        "p8_wide_table", "p7_enrichment", "p5_virtual_attrs",
        "p30_search_keywords", "l1_text_stats", "l10_multimodal_binary",
        "p51_web_ad_lane", "q1_pricing_summary",
        "q19_not_in_null_aware", "s2_streaming_sessions",
        "w2_bucketed_join", "g2_wire_crypto", "g3_rsa_unwrap",
        "p1_gate_errors", "p2_identity_mappings", "p3_zgid_binding",
        "p9_user_properties", "l30_dup_span_fraction",
        "l31_candidate_verify",
    ]
    for name in must_have:
        assert name in first50, f"{name} missing from the driver window"
    # rotated/kept BEHIND the cut (still locally verified by the sf0.01
    # parity rehearsal): the r8/r9-green band that yielded its slots to
    # this round's rotation
    for name in ("p54_click_consumption", "p54c_candidates",
                 "p0_envelope", "p6_virtual_events", "p4_dictionaries",
                 "g1_wire_roundtrip", "g4_sm2_unwrap",
                 "p56_event_paths", "p34_user_duration",
                 "l16_dedup_groups", "l11_embedding_neardup",
                 "s1_streaming_identity", "s6_streaming_dedup",
                 "w10_scale_ids", "p42_adv_click_match",
                 "p53_ipv6_geo", "q11_approx_distinct",
                 "l28_source_mixture", "l37_pq_ann",
                 "s7_stream_stream_join", "w1_upsert_writer"):
        assert name in merged and name not in first50, name
