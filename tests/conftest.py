from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from vectordbfaiss_spark.session import get_spark

    s = get_spark(
        app_name="vectordbfaiss-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()
