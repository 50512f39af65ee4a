"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship produce-pipeline query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
SURVEY.md §2 (see prometheus_pulsar_remote_write_spark/plans/).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from prometheus_pulsar_remote_write_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(catalog.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(catalog.ORACLES)
