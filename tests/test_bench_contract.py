"""The driver records only the LAST 2000 characters of bench.py stdout
and parses them as JSON (BENCH_r01/r02 both came back parsed:null when
the line overflowed). Pin the emitted-line budget against the live
query registry so adding queries can't silently re-break the capture."""

from __future__ import annotations

import json

from zg_etl_spark import plans


def test_correctness_window_composition():
    """The driver verifies exactly the FIRST 50 of all_queries(). Pin the
    round-6 composition: l37 (the only never-driver-verified query) and
    w9 (new partition-scoped partial upsert), every query whose OUTPUT
    changed with the vtl fan-out spine integration (p4, p6, p8, p19,
    p21, p29, p36, s4 — p21/w3 also held the last stale r2-era rows),
    g4 (real SM2 key-unwrap), s9 (streaming partial-column sink) and
    q20 (gap-fill + LOCF), p41 (ad channel props), p42 (ad click match
    cascade), p43 (match_json gates), p44 (Apple ASA normalization),
    p45 (DevicePropertyParser classification), p46 (Dims.java dim
    mappings), p47 (adv CDC click routing), p48 (click-store key
    build), p49 (deep-conversion multi-event gate), p50 (match_json
    userProp gates), p51 (web landing-URL ad lane), p52 (app-ss probe
    priority), s10 (streaming deep-conversion gate) — all new — p38
    (follow-collapse semantics changed its formulation), p7
    (garbled-geo guard changed its formulation), and the r3-era
    stale-attestation band (l12-l27, s1/s3/s5, g1, p0 —
    p31/p30/p32/p28/l1-l11/p27's r3-green rows were displaced by
    q20/p41-p52/s10/p38/p7); registering a new query must never
    silently displace one of these."""
    first50 = list(plans.all_queries())[:50]
    assert len(set(first50)) == 50
    want_prefixes = ["l37_", "w9_", "w3_", "g4_", "s9_", "q20_", "p7_",
                     "p41_", "p42_", "p43_", "p44_", "p45_", "p46_",
                     "p47_", "p48_", "p49_", "p50_", "p51_", "p52_",
                     "s10_", "p38_",
                     "p4_", "p6_", "p8_", "p19_", "p21_", "p29_", "p36_",
                     "s4_", "s1_", "s3_", "s5_", "g1_", "p0_"]
    want_prefixes += [f"l{i}_" for i in range(12, 28)]
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
    all_queries(); round 6 pins that window to l37 (the sole
    never-driver-verified query), w9 (new), the vtl-spine reworks
    (p4/p6/p8/p19/p21/p29/p36/s4 — their pre-round-6 green rows attest a
    spine WITHOUT virtual events), and the r3-era stale band. A later
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
    # the never-verified query, the new query, and every vtl-touched
    # query are inside the cut
    must_have = [
        "l37_pq_ann", "w9_partial_upsert", "w3_compat_csv_roundtrip",
        "g4_sm2_unwrap", "s9_stream_partial_upsert",
        "p4_dictionaries", "p6_virtual_events", "p8_wide_table",
        "p19_event_highwater", "p21_sink_counts", "p29_event_resolution",
        "p36_event_platforms", "s4_streaming_route",
    ]
    for name in must_have:
        assert name in first50, f"{name} missing from the driver window"
    # rotated/kept BEHIND the cut (still locally verified by the sf0.01
    # parity rehearsal): the freshly-green r5 window (q11, p37, w5, l28,
    # s6, ...) plus the r2/r3-era stragglers that yielded their slots to
    # this round's new queries (p33/p34 → g4/s9, p35/w2/q-suite never
    # fit) — the stragglers are the FIRST round-7 rotation candidates
    for name in ("q11_approx_distinct", "p37_user_detail_sum",
                 "w5_compaction", "l28_source_mixture",
                 "s6_streaming_dedup", "w2_bucketed_join",
                 "p33_ua_parse", "p34_user_duration",
                 "p35_user_anonymous"):
        assert name in merged and name not in first50, name
