"""Every declared query must match its DuckDB oracle — the local mirror of
the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from zg_etl_spark import plans
from zg_etl_spark.oracle import compare

ALL = plans.all_queries()
ORACLES = plans.all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, ALL[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


def test_every_query_has_an_oracle():
    """Since round 11 there are NO rows-only queries: p54 (the one
    holdout — 'order-dependent replay is not SQL-expressible') gained
    a recursive-CTE DuckDB oracle. A new query registering without an
    ORACLE entry silently downgrades the driver's check to rows-only;
    make that a deliberate, visible decision instead."""
    assert sorted(set(ALL) - set(ORACLES)) == []


def test_type_family_arrays_and_decimals():
    """DuckDB LIST types (BIGINT[] / LIST(...)) must map to the same
    'array' family as Spark array<...>, and dialect dispatch must not
    depend on dict identity."""
    from zg_etl_spark.oracle import _duck_family, _spark_family

    assert _duck_family("BIGINT[]") == "array"
    assert _duck_family("LIST(VARCHAR)") == "array"
    assert _spark_family("array<bigint>") == "array"
    assert _duck_family("DECIMAL(38,6)") == _spark_family("decimal(38,6)") == "decimal"
    assert _duck_family("HUGEINT") == "other:HUGEINT"  # still a mismatch vs bigint


def test_session_key_is_application_id(spark):
    """Memo keys must survive id() reuse after GC — applicationId is
    unique per SparkContext lifetime."""
    from zg_etl_spark.session import session_key

    assert session_key(spark) == spark.sparkContext.applicationId
    assert isinstance(session_key(spark), str)
