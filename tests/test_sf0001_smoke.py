"""Every declared query must RUN at a SECOND scale factor — the parity
suite proves values at conftest's SF_ORACLE; this proves no query
crashes or degenerates at a different scale (empty LSH candidate sets,
single-row sources, splits with no straddling pair, sub-window
documents). The smoke SF is chosen as the complement of SF_ORACLE so the
two suites never silently collapse onto the same data. Row counts are
only sanity-bounded: correctness lives in the parity suite."""

from __future__ import annotations

import pytest

from conftest import SF_ORACLE

from zg_etl_spark import plans

ALL = plans.all_queries()
SF = (
    "/root/testdata/sf0.01"
    if SF_ORACLE.rstrip("/").endswith("sf0.001")
    else "/root/testdata/sf0.001"
)


@pytest.mark.parametrize("name", sorted(ALL))
def test_runs_at_other_sf(spark, name):
    n = ALL[name](spark, SF).count()
    assert n >= 0
