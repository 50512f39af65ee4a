"""as-of / range join operator semantics (tie-breaking, left-join nulls,
band losslessness)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.operators.asof import asof_join, range_join


def _ts(s: int) -> datetime:
    return datetime(2024, 1, 1, 0, 0, s)


def test_asof_backward_inclusive_and_ties(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "u", _ts(5))],
        "id int, k string, t timestamp",
    )
    right = spark.createDataFrame(
        [(100, "u", _ts(10)), (200, "u", _ts(15))],
        "rid int, k string, rt timestamp",
    )
    out = {
        r.id: r.rid
        for r in asof_join(
            left, right, on=["k"], left_time="t", right_time="rt",
            right_cols=["rid"], how="inner",
        ).collect()
    }
    # t=10 matches rt=10 (inclusive), t=20 matches rt=15, t=5 has no match
    assert out == {1: 100, 2: 200}


def test_asof_left_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "u", _ts(1))], "id int, k string, t timestamp")
    right = spark.createDataFrame(
        [(9, "u", _ts(30))], "rid int, k string, rt timestamp"
    )
    rows = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt",
        right_cols=["rid"], how="left",
    ).collect()
    assert len(rows) == 1 and rows[0].rid is None


def test_asof_keys_do_not_leak(spark):
    """A right row must never match a left row of a different key."""
    left = spark.createDataFrame([(1, "a", _ts(50))], "id int, k string, t timestamp")
    right = spark.createDataFrame(
        [(7, "b", _ts(10))], "rid int, k string, rt timestamp"
    )
    assert (
        asof_join(
            left, right, on=["k"], left_time="t", right_time="rt",
            right_cols=["rid"], how="inner",
        ).count()
        == 0
    )


def test_range_join_matches_inequality_join(spark):
    """The banded plan must equal the naive inequality join exactly."""
    left = spark.createDataFrame(
        [(i, "u", _ts(i)) for i in range(0, 50, 7)], "lid int, k string, lt timestamp"
    )
    right = spark.createDataFrame(
        [(100 + i, "u", _ts(i)) for i in range(0, 50, 3)],
        "rid int, k string, rt timestamp",
    )
    banded = {
        (r.lid, r.rid)
        for r in range_join(
            left, right, on=["k"], left_time="lt", right_time="rt",
            lower_s=0, upper_s=10,
        ).collect()
    }
    naive = {
        (r.lid, r.rid)
        for r in left.join(right, "k")
        .filter(
            (F.unix_timestamp("rt") - F.unix_timestamp("lt")).between(0, 10)
        )
        .collect()
    }
    assert banded == naive and banded
