from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from privacy_cdc_lakehouse_spark.session import session_builder

    # Tests run on TINY fixtures: a 32-core master with 32 shuffle
    # partitions spends the whole suite scheduling near-empty tasks
    # (every drift_report/window stage = 32 task launches for <1000
    # rows). 8/8 measured ~35% faster suite wall-clock with identical
    # results; env-overridable for other boxes. bench.py and the
    # driver contract are untouched (they build their own sessions
    # from $SPARK_GRAFT_CPUS).
    cores = os.environ.get("SPARK_GRAFT_TEST_CORES", "8")
    s = (
        session_builder(
            "tests",
            master=f"local[{cores}]",
            shuffle_partitions=int(cores),
        ).getOrCreate()
    )
    s.sparkContext.setLogLevel("WARN")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
