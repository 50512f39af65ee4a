from __future__ import annotations

import os
import sys

import pytest

# google.protobuf alias shim (tests/_shims): lets the Spark-4
# transformWithState path run where protobuf isn't pip-installed but the
# image ships the Cloud SDK's vendored pure-python runtime. Must be on
# sys.path BEFORE any pyspark streaming import, and on PYTHONPATH before
# the JVM starts so forked python workers inherit it.
_SHIMS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_shims")
try:
    import google.protobuf  # noqa: F401  (real install wins if present)
except ImportError:
    if os.path.isdir(os.path.join(_SHIMS, "google", "protobuf")):
        sys.path.insert(0, _SHIMS)
        os.environ["PYTHONPATH"] = _SHIMS + os.pathsep + os.environ.get(
            "PYTHONPATH", ""
        )

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
