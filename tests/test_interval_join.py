"""Interval (range) join operator semantics (operators/interval_join.py):
inclusive bounds, per-key isolation, overlapping-interval fan-out,
left_outer null-fill, no nested-loop join in the plan. The p22 query
additionally cross-checks the formulation against DuckDB's native
inequality join at sf0.01 (tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from zg_etl_spark.operators.interval_join import interval_join

POINTS = [
    # (k, ts, pid)
    ("a", 50, 1),    # before any interval -> no match
    ("a", 100, 2),   # at interval start -> inclusive
    ("a", 150, 3),   # inside iv1 AND iv2 (overlap) -> two rows
    ("a", 200, 4),   # at iv1 end -> inclusive
    ("a", 999, 5),   # far outside, same bucket count guard
    ("b", 150, 6),   # other key: a's intervals invisible
]
INTERVALS = [
    # (k, lo, hi, iv_id)
    ("a", 100, 200, "iv1"),
    ("a", 140, 160, "iv2"),
    ("b", 140, 160, "bv"),
    ("c", 0, 1000, "cv"),  # key with no points
]


def _frames(spark):
    pts = spark.createDataFrame(POINTS, "k string, ts long, pid long")
    ivs = spark.createDataFrame(
        INTERVALS, "k string, lo long, hi long, iv_id string"
    )
    return pts, ivs


@pytest.mark.parametrize("width", [7, 100, 5000])
def test_interval_semantics_any_width(spark, width):
    """Matches are width-independent: the bucket grain only affects the
    false-hit rate, never the result set."""
    pts, ivs = _frames(spark)
    rows = interval_join(
        pts, ivs, on=["k"], ts_col="ts", start_col="lo", end_col="hi",
        bucket_width=width,
    ).collect()
    got = sorted((r.pid, r.iv_id) for r in rows)
    assert got == [(2, "iv1"), (3, "iv1"), (3, "iv2"), (4, "iv1"), (6, "bv")]


def test_interval_left_outer(spark):
    pts, ivs = _frames(spark)
    rows = interval_join(
        pts, ivs, on=["k"], ts_col="ts", start_col="lo", end_col="hi",
        bucket_width=100, how="left_outer",
    ).collect()
    by_pid: dict = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r.iv_id)
    assert sorted(by_pid[3]) == ["iv1", "iv2"]
    assert by_pid[1] == [None]          # unmatched point kept, once
    assert by_pid[5] == [None]
    assert len(rows) == 7               # 5 matches + 2 null-filled


def test_interval_left_outer_null_payload(spark):
    """A MATCHED point carrying a NULL payload column must not re-emit as
    unmatched: the anti-join must be null-safe (plain equality treats
    NULL = NULL as unknown, so the null row leaked through as a duplicate
    'unmatched' copy)."""
    pts = spark.createDataFrame(
        [("a", 150, None), ("a", 50, None)], "k string, ts long, pid long"
    )
    _, ivs = _frames(spark)
    rows = interval_join(
        pts, ivs, on=["k"], ts_col="ts", start_col="lo", end_col="hi",
        bucket_width=100, how="left_outer",
    ).collect()
    got = sorted((r.ts, r.iv_id or "") for r in rows)
    # ts=150 matches iv1+iv2 (and ONLY those — no null-filled duplicate);
    # ts=50 is genuinely unmatched and appears once
    assert got == [(50, ""), (150, "iv1"), (150, "iv2")]


def test_interval_rejects_collision(spark):
    pts, _ = _frames(spark)
    with pytest.raises(ValueError, match="collision"):
        interval_join(pts, pts, on=["k"], ts_col="ts", start_col="ts",
                      end_col="ts", bucket_width=10)


def test_interval_no_nested_loop_plan(spark):
    """The bucket decomposition must produce an equi-join (hash/sort-merge),
    never the BroadcastNestedLoopJoin a raw BETWEEN join degrades to."""
    pts, ivs = _frames(spark)
    out = interval_join(pts, ivs, on=["k"], ts_col="ts", start_col="lo",
                        end_col="hi", bucket_width=100)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_interval_randomized_vs_reference(spark):
    """Seeded random points/intervals (boundary-heavy: widths 0..3 buckets,
    shared endpoints, duplicate keys) against a driver-side reference —
    the fixture cases above are hand-picked; this sweeps the space."""
    import random

    rng = random.Random(42)
    pts = [
        (f"k{rng.randrange(5)}", rng.randrange(0, 400), i)
        for i in range(300)
    ]
    ivs = []
    for j in range(120):
        lo = rng.randrange(0, 400)
        ivs.append(
            (f"k{rng.randrange(5)}", lo, lo + rng.randrange(0, 150), f"iv{j}")
        )
    expected = sorted(
        (pid, iv_id)
        for (pk, ts, pid) in pts
        for (ik, lo, hi, iv_id) in ivs
        if pk == ik and lo <= ts <= hi
    )
    out = interval_join(
        spark.createDataFrame(pts, "k string, ts long, pid long"),
        spark.createDataFrame(ivs, "k string, lo long, hi long, iv_id string"),
        on=["k"], ts_col="ts", start_col="lo", end_col="hi", bucket_width=50,
    ).collect()
    assert sorted((r.pid, r.iv_id) for r in out) == expected
