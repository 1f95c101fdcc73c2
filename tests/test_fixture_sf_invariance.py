"""Guard against SF-dependent fixture spines.

The p4x family synthesizes its case matrix from `user_id % N` residues.
When the residues come FROM the data (events / resolved), case coverage
silently depends on which residues a scale factor happens to contain —
at sf0.001 p48 lost cid 15, p51 covered 5 of 10 lanes, and p52 had zero
fuzzy ip+ua collisions, while the dual-rendered DuckDB oracle (same
spine) stayed green: the engine and its oracle failed together.  Every
fixture-spine query now UNIONs a constant seed relation under the
data-derived volume rows, making the case set a compile-time constant.

This test pins that property permanently: each fixture-spine query must
return the IDENTICAL case-key set at sf0.001 and sf0.01.  A new
`user_id % N` spine added without a seed fails here on the spot.
"""
from __future__ import annotations

import pytest

from zg_etl_spark import plans

# ~6 min two-SF sweep: run with --runslow when a fixture-spine query's
# seed relation or case matrix changes
pytestmark = pytest.mark.slow

ALL = plans.all_queries()

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"

# query -> (case-key column, expected case count); the expected count is
# the compile-time size of the seed relation, so a missing case fails
# even if BOTH SFs drop it identically.
SPINE_QUERIES = {
    "p45_device_classify": ("cid", 18),
    "p46_dims_mapping": ("cid", 24),
    "p47_adv_cdc_route": ("cid", 12),
    "p48_adv_click_keys": ("cid", 16),
    "p51_web_ad_lane": ("cid", 10),
    "p53_ipv6_geo": ("cid", 18),
    "p55_tencent_web_match": ("pid", 11),  # per app; pid set compared
}


@pytest.mark.parametrize("name", sorted(SPINE_QUERIES))
def test_case_set_is_sf_invariant(spark, name):
    col, expected = SPINE_QUERIES[name]
    sets = {sf: {getattr(r, col) for r in ALL[name](spark, sf).collect()}
            for sf in (SF_A, SF_B)}
    assert sets[SF_A] == sets[SF_B], (name, sets)
    if expected is not None:
        assert len(sets[SF_A]) == expected, (name, sorted(sets[SF_A]))


@pytest.mark.parametrize("sf", [SF_A, SF_B])
def test_p54_consumption_reroutes_at_every_sf(spark, sf):
    """p54's fixtures ride p52's (same candidate resolution), but its
    output is the consumption-REROUTED tier set: 'none' must be present
    (a session whose only candidates were claimed earlier), and at least
    one (tier, lid) cell must differ from p52's snapshot probe — the
    sequential del-set must actually consume, at EVERY SF.  Generalizes
    the within-one-SF diff check in test_independent_oracles."""
    p52 = {(r.match_tier, r.lid): r.n_sessions
           for r in ALL["p52_adv_ss_priority"](spark, sf).collect()}
    p54 = {(r.match_tier, r.lid): r.n_sessions
           for r in ALL["p54_click_consumption"](spark, sf).collect()}
    tiers54 = {t for t, _ in p54}
    assert "none" in tiers54, (sf, tiers54)
    changed = {k for k in set(p52) | set(p54) if p52.get(k) != p54.get(k)}
    assert changed, (sf, "consumption rerouted nothing — fixture too thin")


def test_p52_required_tiers_at_every_sf(spark):
    # p52 groups by (match_tier, lid) so its row count legitimately
    # varies with data; the invariant is that the fixture-guaranteed
    # tiers are present at every SF.
    for sf in (SF_A, SF_B):
        tiers = {r.match_tier for r in
                 ALL["p52_adv_ss_priority"](spark, sf).collect()}
        assert "ipua" in tiers, (sf, tiers)
        assert "ipver" in tiers, (sf, tiers)
        assert any(t.startswith("exact_") for t in tiers), (sf, tiers)
