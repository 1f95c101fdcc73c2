"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-11 composition: the queries whose output changed in round 10
    after their last driver row first (p45 — fuzzy brand scan moved to
    the fixture-pinned HashMap order — and g1 — JDK-exact UTF-8
    malformed-length rules), then the whole 40-query round-8-attested
    band (the oldest driver rows after r10's full-green window), then
    picks from the next-oldest r9 band (spine p0/p4/p6, streaming zgid
    s5, dedup components l16, and the JVM-boundary pair p43/p46 that
    this round's fastjson2 probe targets) plus the round's new
    p54d_replay_rollup; registering a new query must never silently
    displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["g1_", "s5_", "s7_", "s8_", "q11_", "q20_"]
    want_prefixes += [f"p{i}_" for i in (0, 4, 6, *range(10, 19), 20,
                                         *range(22, 27), 37, 40, 42, 43,
                                         45, 46, 52, 53)]
    want_prefixes += ["p54c_"]
    want_prefixes += [f"l{i}_" for i in (16, 28, 29, *range(32, 38))]
    want_prefixes += [f"w{i}_" for i in (1, *range(4, 9), 10)]
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
    all_queries(); round 11 pins that window to the output-changed
    p45/g1, the whole 40-query r8-attested band (the oldest rows
    after r10's full-green window), and seven r9-band picks plus the
    new p54d. A later registry edit must not silently displace them —
    rotation is a DELIBERATE _WINDOW change, not a side effect."""
    from zg_etl_spark import plans

    first50 = list(plans.all_queries())[:50]
    assert first50 == [n for n in plans._WINDOW if n in plans.all_queries()][:50]
    # every window name resolves (a typo'd name would silently shrink
    # the verified set and promote a tail query into the window) —
    # p54d_replay_rollup is allowed to be pending until it lands
    merged = plans.all_queries()
    missing = [n for n in plans._WINDOW
               if n not in merged and n != "p54d_replay_rollup"]
    assert not missing, missing
    must_have = [
        "p45_device_classify", "g1_wire_roundtrip",
        "l28_source_mixture", "l33_lm_quality_score", "l37_pq_ann",
        "p10_b_user_upsert", "p17_user_prop_dict", "p20_asof_props",
        "p26_error_details", "p40_salted_counters", "p54c_candidates",
        "q11_approx_distinct", "q20_gapfill_locf",
        "s7_stream_stream_join", "s8_stream_upsert_delete",
        "w1_upsert_writer", "w10_scale_ids",
        "p0_envelope", "p4_dictionaries", "p6_virtual_events",
        "s5_streaming_zgid", "l16_dedup_groups",
        "p43_adv_match_json", "p46_dims_mapping",
    ]
    for name in must_have:
        assert name in first50, f"{name} missing from the driver window"
    # rotated/kept BEHIND the cut (still locally verified by the sf0.01
    # parity rehearsal): the r9/r10-green band that yielded its slots
    # to this round's rotation
    for name in ("p54_click_consumption", "p8_wide_table",
                 "p7_enrichment", "p5_virtual_attrs",
                 "p30_search_keywords", "l1_text_stats",
                 "l30_dup_span_fraction", "l31_candidate_verify",
                 "g2_wire_crypto", "g3_rsa_unwrap",
                 "q1_pricing_summary", "s2_streaming_sessions",
                 "w2_bucketed_join", "p51_web_ad_lane",
                 "p56_event_paths", "p34_user_duration",
                 "l11_embedding_neardup", "s1_streaming_identity",
                 "s6_streaming_dedup", "g4_sm2_unwrap"):
        assert name in merged and name not in first50, name
