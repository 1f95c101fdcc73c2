"""Every declared query must RUN at sf0.001 — the parity suite proves
values at sf0.01; this proves no query crashes or degenerates at a
different scale (empty LSH candidate sets, single-row sources, splits
with no straddling pair, sub-window documents). Row counts are only
sanity-bounded: correctness lives in the parity suite."""

from __future__ import annotations

import pytest

from zg_etl_spark import plans

ALL = plans.all_queries()
SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(ALL))
def test_runs_at_sf0001(spark, name):
    n = ALL[name](spark, SF).count()
    assert n >= 0
