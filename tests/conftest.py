from __future__ import annotations

import pytest

from prometheus_pulsar_remote_write_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # local[4]: tiny unit-test rows would otherwise fan out to 32 partitions
    # and pay 32 Python-worker forks per pandas-UDF stage (~15-30s/job).
    # Scale behavior is exercised by bench.py on local[32] at sf0.1.
    spark = get_spark(
        app_name="engine-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield spark
    spark.stop()
