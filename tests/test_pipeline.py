"""Spine-structure pins for the batch pipeline stages (operators/domain.py).

The vtl fan-out branch (`_vtl_fanout_select`) projects RESOLVED_COLS by
name on both UNION ALL branches of `events_typed`, so the union cannot
positionally misalign — PROVIDED the list itself matches the live
`resolved` view. These tests pin that, plus the end-to-end facts the
fan-out integration promises: synthesized rows register in the event
dictionary (EventAsyncOperator.java:190 includes 'vtl' in the dt filter)
and land in the wide table with fresh uuids (VirtualEventOperator.java:
305-315 regenerates $uuid per synthesized row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from zg_etl_spark.operators.domain import (
    RESOLVED_COLS,
    ensure_pipeline_views,
)


def test_resolved_cols_pin(spark, sf_dir):
    """RESOLVED_COLS must equal the live `resolved` view's columns,
    order-sensitively — the guarantee the fan-out UNION rides on."""
    ensure_pipeline_views(spark, sf_dir)
    assert spark.table("resolved").columns == RESOLVED_COLS


def test_events_typed_contains_vtl_rows(spark, sf_dir):
    """The fan-out rows are IN the spine (not a side relation): dt='vtl'
    rows exist, carry owner zg_vtl, and their count equals the p6
    provenance relation's total."""
    ensure_pipeline_views(spark, sf_dir)
    vtl = spark.table("events_typed").filter(F.col("dt") == "vtl")
    n_vtl = vtl.count()
    assert n_vtl > 0
    assert vtl.filter(F.col("owner") != "zg_vtl").count() == 0
    # p6 models the same fan-out as a provenance rollup — its row total
    # must equal the spine's vtl row count (same rules, join, predicate)
    from zg_etl_spark.plans.pipeline import QUERIES

    p6_total = (
        QUERIES["p6_virtual_events"](spark, sf_dir)
        .agg(F.sum("n").alias("n"))
        .collect()[0]["n"]
    )
    assert n_vtl == p6_total


def test_vtl_rows_reach_dictionary_and_wide_table(spark, sf_dir):
    """Synthesized events get dictionary ids (owner zg_vtl) and appear in
    the wide table; their uuids are fresh — never colliding with the
    source row's uuid despite sharing its seq."""
    ensure_pipeline_views(spark, sf_dir)
    dict_vtl = spark.sql(
        "SELECT COUNT(*) AS n FROM event_dict WHERE owner = 'zg_vtl'"
    ).collect()[0]["n"]
    assert dict_vtl > 0

    from zg_etl_spark.plans.pipeline import QUERIES

    wide = QUERIES["p8_wide_table"](spark, sf_dir).select("uuid", "event_name")
    assert wide.count() == wide.select("uuid").distinct().count()
    vtl_names = {
        r["event_name"]
        for r in spark.sql(
            "SELECT DISTINCT event_name FROM event_dict WHERE owner='zg_vtl'"
        ).collect()
    }
    wide_names = {r["event_name"] for r in wide.select("event_name").distinct().collect()}
    # at least one virtual event survives dictionary gating into the wide
    # table (cap/blacklist may drop some, never all, on the fixtures)
    assert vtl_names & wide_names
