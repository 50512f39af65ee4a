"""Operator-level tests for the distributed two-phase global ordering
primitive (operators/ranking.py): exact equality with the
single-partition window functions it replaces, on data engineered to
cross partition boundaries mid-tie."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.operators.ranking import (
    attach_global_order,
    ntile_from_rank,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """731 rows with heavy ties on the primary key (v has only 7 distinct
    values) so range partitions split tie runs, plus a unique tiebreak id
    -- the shape where a wrong offset or tie-split shows immediately."""
    return spark.range(0, 731).select(
        F.col("id"),
        (F.col("id") % 7).alias("v"),
        ((F.col("id") * 37) % 731).alias("w"),
    )


def test_rank_and_cumsum_match_single_partition_window(spark, skewed):
    order = [F.asc("v"), F.desc("w"), F.asc("id")]
    got, stats = attach_global_order(
        skewed, order, rank_col="rk", cum_cols={"cw": "w"}, num_partitions=13
    )
    assert stats["n_rows"] == 731
    assert stats["totals"]["cw"] == skewed.agg(F.sum("w")).collect()[0][0]

    w = Window.orderBy(*order)
    expected = skewed.select(
        "id",
        F.row_number().over(w).alias("rk"),
        F.sum("w").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cw"),
    )
    mismatches = (
        got.select("id", "rk", "cw")
        .join(expected, "id")
        .where(
            (got["rk"] != expected["rk"]) | (got["cw"] != expected["cw"])
        )
        .count()
    )
    assert mismatches == 0


@pytest.mark.parametrize("n,buckets", [(731, 5), (7, 10), (100, 4), (3, 3)])
def test_ntile_from_rank_matches_sql_ntile(spark, n, buckets):
    df = spark.range(0, n).select(((F.col("id") * 97) % n).alias("k"), "id")
    order = [F.asc("k"), F.asc("id")]
    ranked, stats = attach_global_order(df, order, rank_col="rk", num_partitions=6)
    assert stats["n_rows"] == n
    got = ranked.select("id", ntile_from_rank("rk", n, buckets).alias("nt"))
    expected = df.select(
        "id", F.ntile(buckets).over(Window.orderBy(*order)).alias("nt")
    )
    bad = got.join(expected, "id").where(got["nt"] != expected["nt"]).count()
    assert bad == 0


def test_empty_and_single_row_inputs(spark):
    empty = spark.range(0).select(F.col("id"), F.col("id").alias("w"))
    got, stats = attach_global_order(
        empty, [F.asc("id")], rank_col="rk", cum_cols={"cw": "w"}
    )
    assert stats == {"n_rows": 0, "totals": {"cw": 0}}
    assert got.count() == 0

    one = spark.range(5, 6).select(F.col("id"), F.lit(42).alias("w"))
    got, stats = attach_global_order(
        one, [F.asc("id")], rank_col="rk", cum_cols={"cw": "w"}
    )
    row = got.collect()[0]
    assert (row["rk"], row["cw"]) == (1, 42)
    assert stats == {"n_rows": 1, "totals": {"cw": 42}}
