from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("ZG_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from zg_etl_spark.session import get_spark

    s = get_spark("zg-etl-tests", cpus=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_ORACLE
