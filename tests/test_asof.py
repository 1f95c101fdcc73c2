"""as-of join operator semantics (operators/asof.py): inclusive <=,
per-key isolation, no-match nulls, deterministic tiebreak. The p20 query
additionally cross-checks the whole formulation against DuckDB's native
ASOF JOIN at sf0.01 (tests/test_oracle_parity.py)."""

from __future__ import annotations

import pytest

from zg_etl_spark.operators.asof import asof_join

EVENTS = [
    # (k, ts, event_id)
    ("a", 100, 1),   # before any update -> null
    ("a", 200, 2),   # exactly at update ts -> inclusive
    ("a", 250, 3),   # between updates -> v1
    ("a", 300, 4),   # at second update -> v2
    ("b", 500, 5),   # other key: only sees b's updates
]
UPDATES = [
    # (k, ts, val, seq)
    ("a", 200, "v1", 10),
    ("a", 300, "v2", 11),
    ("b", 400, "bv", 12),
    ("c", 100, "cv", 13),  # key with no events
]


@pytest.fixture(scope="module")
def joined(spark):
    left = spark.createDataFrame(EVENTS, "k string, ts long, event_id long")
    right = spark.createDataFrame(
        UPDATES, "k string, uts long, val string, seq long"
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="uts",
        value_cols=["val"], right_tiebreak="seq",
    ).collect()
    return {r.event_id: r.val for r in rows}


def test_asof_semantics(joined):
    assert joined == {1: None, 2: "v1", 3: "v1", 4: "v2", 5: "bv"}


def test_asof_tiebreak(spark):
    left = spark.createDataFrame([("a", 200, 1)], "k string, ts long, event_id long")
    right = spark.createDataFrame(
        [("a", 200, "first", 1), ("a", 200, "second", 2)],
        "k string, uts long, val string, seq long",
    )
    rows = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="uts",
        value_cols=["val"], right_tiebreak="seq",
    ).collect()
    assert rows[0].val == "second"  # largest tiebreak wins


def test_asof_rejects_column_collision(spark):
    df = spark.createDataFrame([("a", 1, "x")], "k string, ts long, val string")
    with pytest.raises(ValueError, match="collide"):
        asof_join(df, df, on=["k"], left_ts="ts", right_ts="ts",
                  value_cols=["val"])


def test_asof_single_shuffle_plan(spark):
    """The merge formulation must shuffle each side once on the key and
    never expand to a pair join — no Join node at all in the plan."""
    left = spark.createDataFrame(EVENTS, "k string, ts long, event_id long")
    right = spark.createDataFrame(
        UPDATES, "k string, uts long, val string, seq long"
    )
    out = asof_join(left, right, on=["k"], left_ts="ts", right_ts="uts",
                    value_cols=["val"])
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_asof_randomized_vs_pandas_merge_asof(spark):
    """Seeded random events/updates (duplicate timestamps, tie seqs,
    unmatched keys) against pandas.merge_asof — an INDEPENDENT, widely
    exercised as-of implementation. Our highest-seq tiebreak is applied
    as a pre-dedup (keep max seq per (k, ts)); merge_asof then supplies
    the inclusive backward-match semantics."""
    import random

    import pandas as pd

    rng = random.Random(7)
    events = [
        (f"k{rng.randrange(6)}", rng.randrange(0, 300), i)
        for i in range(400)
    ]
    # seq = j (globally unique): a duplicate (k, uts, seq) with distinct
    # vals would make the engine's last-over-window winner genuinely
    # nondeterministic while pandas keeps insertion order — unique seqs
    # keep the tiebreak well-defined on both sides by construction
    updates = [
        (f"k{rng.randrange(8)}", rng.randrange(0, 300), f"v{j}", j)
        for j in range(150)
    ]

    out = asof_join(
        spark.createDataFrame(events, "k string, ts long, event_id long"),
        spark.createDataFrame(updates, "k string, uts long, val string, seq long"),
        on=["k"], left_ts="ts", right_ts="uts",
        value_cols=["val"], right_tiebreak="seq",
    ).collect()
    actual = {r.event_id: r.val for r in out}

    upd = pd.DataFrame(updates, columns=["k", "uts", "val", "seq"])
    upd = (
        upd.sort_values(["k", "uts", "seq"])
        .groupby(["k", "uts"], as_index=False)
        .last()  # highest seq per (k, ts) — our operator's tiebreak
        .sort_values("uts")
    )
    ev = pd.DataFrame(events, columns=["k", "ts", "event_id"]).sort_values("ts")
    merged = pd.merge_asof(
        ev, upd.rename(columns={"uts": "ts"}), on="ts", by="k",
        direction="backward", allow_exact_matches=True,
    )
    expected = {
        int(r.event_id): (None if pd.isna(r.val) else r.val)
        for r in merged.itertuples(index=False)
    }
    assert actual == expected
