"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-8 composition: p54c (the driver-hashable half of p54, new) and
    w10 (scale-profile hash-ID bijection, new), the three queries whose
    output changed with the round-7 advisory fixes (p42, p52, p53 —
    ip-gated fuzzy store writes + new isPrivateIp fixture cids), and the
    r5-era stale band (q11/q20, p1-p3/p5/p7/p9-p18/p20/p22-p26, p37/p40,
    w1/w4-w8, g2/g3, l28-l37, s7/s8); registering a new query must never
    silently displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["p54c_", "w10_", "p42_", "p52_", "p53_",
                     "q11_", "q20_", "p37_", "p40_", "g2_", "g3_",
                     "s7_", "s8_"]
    want_prefixes += [f"p{i}_" for i in (1, 2, 3, 5, 7)]
    want_prefixes += [f"p{i}_" for i in range(9, 19) if i != 19]
    want_prefixes += [f"p{i}_" for i in (20, 22, 23, 24, 25, 26)]
    want_prefixes += [f"w{i}_" for i in (1, 4, 5, 6, 7, 8)]
    want_prefixes += [f"l{i}_" for i in range(28, 38)]
    for prefix in want_prefixes:
        assert any(q.startswith(prefix) for q in first50), (
            f"{prefix}* fell out of the driver's 50-query window"
        )


def test_bench_line_fits_driver_capture_window():
    from bench import _short_keys

    queries = plans.all_queries()
    per = {name: 999.9 for name in queries}  # worst-case 1-decimal widths
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
            "queries": {k: round(v, 1) for k, v in short.items()},
        },
        separators=(",", ":"),
    )
    assert len(line) <= 1900, (
        f"bench line {len(line)} chars would overflow the driver's "
        f"2000-char capture window"
    )


def test_driver_window_is_the_planned_rotation():
    """The driver's CORRECTNESS file covers the FIRST 50 entries of
    all_queries(); round 8 pins that window to the two new queries
    (p54c_candidates/w10_scale_ids), the three advisory-fix reworks
    whose round-7 green rows attest the OLD output (p42/p52/p53), and
    the r5-era stale band. A later registry edit must not silently
    displace them — rotation is a DELIBERATE _WINDOW change, not a side
    effect."""
    from zg_etl_spark import plans

    first50 = list(plans.all_queries())[:50]
    assert first50 == plans._WINDOW[:50]
    # every window name resolves (a typo'd name would silently shrink
    # the verified set and promote a tail query into the window)
    merged = plans.all_queries()
    missing = [n for n in plans._WINDOW if n not in merged]
    assert not missing, missing
    must_have = [
        "p54c_candidates", "w10_scale_ids", "p42_adv_click_match",
        "p52_adv_ss_priority", "p53_ipv6_geo", "q11_approx_distinct",
        "q20_gapfill_locf", "p37_user_detail_sum", "w1_upsert_writer",
        "g2_wire_crypto", "l28_source_mixture", "l37_pq_ann",
        "s7_stream_stream_join",
    ]
    for name in must_have:
        assert name in first50, f"{name} missing from the driver window"
    # rotated/kept BEHIND the cut (still locally verified by the sf0.01
    # parity rehearsal): the r6/r7-green band that yielded its slots to
    # this round's rotation
    for name in ("p54_click_consumption", "p47_adv_cdc_route",
                 "p48_adv_click_keys", "p51_web_ad_lane",
                 "p55_tencent_web_match", "l16_dedup_groups",
                 "q1_pricing_summary", "w2_bucketed_join",
                 "p33_ua_parse", "l1_text_stats", "s2_streaming_sessions",
                 "p45_device_classify", "p49_adv_deep_convert"):
        assert name in merged and name not in first50, name
