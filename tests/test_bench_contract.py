"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-7 composition: p53 (IPv6 geo, new), p54 (click-consumption
    sequential replay, new), the fixture-seeding reworks whose output
    changed (p47, p48, p51, p52), l16 (edge-join formulation changed),
    the r2-era q-suite (q1-q10, q12-q19) + w2 and the r3-era
    p27/p28/p30-p35 + l1-l11 stale bands, and five r5-era refreshers
    (p39, s2, s6) plus p55 (Tencent-web click match, new) and p42
    (fuzzy store formulation changed);
    registering a new query must never
    silently displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["p53_", "p54_", "p47_", "p48_", "p51_", "p52_",
                     "l16_", "w2_", "p27_", "p28_", "p30_", "p31_",
                     "p32_", "p33_", "p34_", "p35_",
                     "p55_", "p39_", "p42_", "s2_", "s6_"]
    want_prefixes += [f"q{i}_" for i in range(1, 20) if i != 11]
    want_prefixes += [f"l{i}_" for i in range(1, 12)]
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
    all_queries(); round 7 pins that window to the two new queries
    (p53/p54), the four seeded-spine reworks whose pre-round-7 green
    rows attest the OLD output (p47/p48/p51/p52), l16's reworked
    formulation, and the r2/r3-era stale band. A later registry edit
    must not silently displace them — rotation is a DELIBERATE _WINDOW
    change, not a side effect."""
    from zg_etl_spark import plans

    first50 = list(plans.all_queries())[:50]
    assert first50 == plans._WINDOW[:50]
    # every window name resolves (a typo'd name would silently shrink
    # the verified set and promote a tail query into the window)
    merged = plans.all_queries()
    missing = [n for n in plans._WINDOW if n not in merged]
    assert not missing, missing
    must_have = [
        "p53_ipv6_geo", "p54_click_consumption", "p47_adv_cdc_route",
        "p48_adv_click_keys", "p51_web_ad_lane", "p52_adv_ss_priority",
        "l16_dedup_groups", "w2_bucketed_join", "q1_pricing_summary",
        "p33_ua_parse", "l1_text_stats",
    ]
    for name in must_have:
        assert name in first50, f"{name} missing from the driver window"
    # rotated/kept BEHIND the cut (still locally verified by the sf0.01
    # parity rehearsal): the r5/r6-green band that yielded its slots to
    # this round's rotation
    for name in ("q11_approx_distinct", "q20_gapfill_locf",
                 "l37_pq_ann", "w9_partial_upsert", "p4_dictionaries",
                 "p8_wide_table", "s4_streaming_route", "g4_sm2_unwrap",
                 "p45_device_classify", "p49_adv_deep_convert"):
        assert name in merged and name not in first50, name
