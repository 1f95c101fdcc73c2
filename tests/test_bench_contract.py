"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-12 composition: p54 (the one query that never had a driver
    row) and the r11 rewrites whose new form was never driver-attested
    (q10, p3, l10) first, then the whole 39-query round-9-attested band
    (the oldest driver rows after r11's full-green window), then the
    seven r11-attested queries round 12's changes touch again (staged
    sinks w1/w4/w5/w6, spine p0, CC l16, sessions s2); registering a
    new query must never silently displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["p54_", "q10_", "p3_", "g4_", "s2_"]
    want_prefixes += [f"l{i}_" for i in (10, *range(11, 28))]
    want_prefixes += [f"p{i}_" for i in (0, 19, 21, 29, 34, 36, 38, 41,
                                         44, 47, 48, 49, 50, 55, 56)]
    want_prefixes += [f"s{i}_" for i in (1, 3, 4, 6, 9, 10)]
    want_prefixes += [f"w{i}_" for i in (1, 3, 4, 5, 6, 9)]
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
    all_queries(); round 12 pins that window to the never-attested p54,
    the r11 rewrites without a driver row on their new form (q10, p3,
    l10), the whole 39-query r9-attested band (the oldest rows after
    r11's full-green window), and the seven r11-attested queries this
    round's changes touch again. A later registry edit must not
    silently displace them — rotation is a DELIBERATE _WINDOW change,
    not a side effect."""
    from zg_etl_spark import plans

    first50 = list(plans.all_queries())[:50]
    assert first50 == [n for n in plans._WINDOW if n in plans.all_queries()][:50]
    # every window name resolves (a typo'd name would silently shrink
    # the verified set and promote a tail query into the window)
    merged = plans.all_queries()
    missing = [n for n in plans._WINDOW if n not in merged]
    assert not missing, missing
    must_have = [
        "p54_click_consumption", "q10_set_ops", "p3_zgid_binding",
        "l10_multimodal_binary", "l15_multimodal_features",
        "l17_resize_features", "l23_frame_sample",
        "l11_embedding_neardup", "l14_ann_pandas",
        "p47_adv_cdc_route", "p44_apple_asa", "p56_event_paths",
        "s1_streaming_identity", "s4_streaming_route",
        "s10_streaming_deep_convert", "w3_compat_csv_roundtrip",
        "w9_partial_upsert",
        "w1_upsert_writer", "w4_partition_overwrite", "w5_compaction",
        "w6_delete_sign", "p0_envelope", "l16_dedup_groups",
        "s2_streaming_sessions",
    ]
    for name in must_have:
        assert name in first50, f"{name} missing from the driver window"
    # rotated/kept BEHIND the cut (still locally verified by the sf0.01
    # parity rehearsal): the r10/r11-green band that yielded its slots
    # to this round's rotation
    for name in ("p45_device_classify", "g1_wire_roundtrip",
                 "p54c_candidates", "p54d_replay_rollup",
                 "l28_source_mixture", "l37_pq_ann",
                 "p10_b_user_upsert", "p17_user_prop_dict",
                 "p42_adv_click_match", "p52_adv_ss_priority",
                 "q11_approx_distinct", "q20_gapfill_locf",
                 "s5_streaming_zgid", "s7_stream_stream_join",
                 "s8_stream_upsert_delete", "w7_schema_evolution",
                 "w8_retention_sweep", "w10_scale_ids",
                 "p8_wide_table", "p7_enrichment", "p5_virtual_attrs",
                 "p43_adv_match_json", "p46_dims_mapping",
                 "w2_bucketed_join", "q1_pricing_summary",
                 "l1_text_stats", "g2_wire_crypto"):
        assert name in merged and name not in first50, name
