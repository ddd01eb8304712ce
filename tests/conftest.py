from __future__ import annotations

import os

import pytest

SF_DIR = os.environ.get("HZ_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("HZ_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from hz_csv2parquet_spark.session import get_spark

    s = get_spark(app="hz-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
