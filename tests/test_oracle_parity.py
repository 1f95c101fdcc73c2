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


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = ALL[name](spark, sf_dir)
    assert df.count() >= 0
