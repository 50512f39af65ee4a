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


def test_ntile_formula_matches_sql_semantics_exhaustively():
    """The integer ntile recovery must implement SQL ntile semantics for
    EVERY (n_rows, buckets, rank): first n%b buckets take ceil(n/b)
    rows, the rest floor(n/b). Checked as pure arithmetic against the
    reference model over an exhaustive small grid -- no Spark jobs, so
    the whole space up to 60x12 runs in milliseconds."""

    def reference_ntile(rk: int, n: int, b: int) -> int:
        q, r = divmod(n, b)
        sizes = [q + 1] * r + [q] * (b - r)
        acc = 0
        for bucket, size in enumerate(sizes, start=1):
            acc += size
            if rk <= acc:
                return bucket
        raise AssertionError("rank beyond n_rows")

    def formula(rk: int, n: int, b: int) -> int:
        # mirrors ntile_from_rank's integer arithmetic exactly
        q, r = divmod(max(n, 0), b)
        if q == 0:
            return rk
        big = r * (q + 1)
        if rk <= big:
            return (rk + q) // (q + 1)
        return r + ((rk - big + q - 1) // q)

    for n in range(1, 61):
        for b in range(1, 13):
            for rk in range(1, n + 1):
                assert formula(rk, n, b) == reference_ntile(rk, n, b), (
                    f"n={n} b={b} rk={rk}"
                )
