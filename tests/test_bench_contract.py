"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-9 composition: the 41-query round-6-attested band (the oldest
    driver rows after r8's full-green window — spine relations p8/p6
    first), plus picks from the next-oldest r7 band (the l16/s6/l11
    bench watch items, the adv lanes p47/p48/p55), the query NEW this
    round (p56), and the output-changed p7 (wide-table UTM lane rework;
    p8 shares it and is already windowed) and p34 (yw moved to the
    reference's Sunday-start/min-1 week rules) — s2/w2/p51 yield their
    slots, staying r7-attested and locally parity-checked; registering
    a new query must never silently displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["g1_", "g4_", "w3_", "w9_", "p56_", "p7_"]
    want_prefixes += [f"p{i}_" for i in (0, 4, 6, 8, 19, 21, 29, 36, 38,
                                         41, 43, 44, 45, 46, 49, 50)]
    want_prefixes += [f"p{i}_" for i in (47, 48, 55, 34)]
    want_prefixes += [f"l{i}_" for i in (*range(12, 28), 11)]
    want_prefixes += [f"s{i}_" for i in (1, 3, 4, 5, 6, 9, 10)]
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
    all_queries(); round 9 pins that window to the 41-query r6-attested
    band (the oldest rows after r8's full-green window) plus nine picks
    from the r7 band. A later registry edit must not silently displace
    them — rotation is a DELIBERATE _WINDOW change, not a side effect."""
    from zg_etl_spark import plans

    first50 = list(plans.all_queries())[:50]
    assert first50 == plans._WINDOW[:50]
    # every window name resolves (a typo'd name would silently shrink
    # the verified set and promote a tail query into the window)
    merged = plans.all_queries()
    missing = [n for n in plans._WINDOW if n not in merged]
    assert not missing, missing
    must_have = [
        "p8_wide_table", "p6_virtual_events", "p0_envelope",
        "p4_dictionaries", "g1_wire_roundtrip", "g4_sm2_unwrap",
        "l12_tokens_fingerprint", "l27_dedup_keep_list",
        "l16_dedup_groups", "l11_embedding_neardup",
        "s1_streaming_identity", "s6_streaming_dedup",
        "s10_streaming_deep_convert", "p47_adv_cdc_route",
        "p55_tencent_web_match", "w3_compat_csv_roundtrip",
        "w9_partial_upsert", "p56_event_paths", "p7_enrichment",
        "p34_user_duration",
    ]
    for name in must_have:
        assert name in first50, f"{name} missing from the driver window"
    # rotated/kept BEHIND the cut (still locally verified by the sf0.01
    # parity rehearsal): the r7/r8-green band that yielded its slots to
    # this round's rotation
    for name in ("p54_click_consumption", "p54c_candidates",
                 "w2_bucketed_join", "s2_streaming_sessions",
                 "p51_web_ad_lane",
                 "w10_scale_ids", "p42_adv_click_match",
                 "p52_adv_ss_priority", "p53_ipv6_geo",
                 "q1_pricing_summary", "q11_approx_distinct",
                 "p33_ua_parse", "l1_text_stats", "l28_source_mixture",
                 "l37_pq_ann", "s7_stream_stream_join",
                 "g2_wire_crypto", "w1_upsert_writer",
                 "p5_virtual_attrs"):
        assert name in merged and name not in first50, name
