from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("ZG_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (multi-minute fixture sweeps / scale "
             "rehearsals), normally skipped so the default suite finishes "
             "inside a CI window",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: multi-minute sweep/rehearsal — skipped unless --runslow or "
        "ZG_RUN_SLOW=1; run the slow set before shipping changes to the "
        "surfaces they sweep (expr compiler, JVM fixtures, sink scaling)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("ZG_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow sweep — enable with --runslow or ZG_RUN_SLOW=1"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from zg_etl_spark.session import get_spark

    # the suite shares ONE JVM across ~600 tests; the fresh-seed sweeps
    # (test_deep_sweep and friends) leave the heap near the bench
    # default's ceiling, and the giant-projection expr fixtures then
    # OOM in-suite while passing standalone (round 10: seed-10 trees
    # pushed test_date_compositions over at 16g). The bench default
    # stays 16g — that G1 tradeoff was measured (session.py) — only
    # the suite session gets headroom.
    os.environ.setdefault("SPARK_DRIVER_MEM", "28g")
    s = get_spark("zg-etl-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE
