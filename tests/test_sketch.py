"""HLL sketch operator properties (operators/sketch.py).

Accuracy bounds are the standard HLL guarantees (1.04/sqrt(256) ~ 6.5%
relative error at one sigma; the asserts allow ~3 sigma), and the
merge test checks the property that makes the sketch usable at scale:
register tables combine with a plain max, so per-partition /
per-day sketches re-aggregate without touching raw data.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_pulsar_remote_write_spark.operators.sketch import (
    LC_TABLE,
    M,
    hll_distinct,
    hll_estimate,
    hll_registers,
)


def _ids(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )


def test_hll_large_range_accuracy(spark):
    n = 5000
    est = hll_distinct(_ids(spark, n), ["g"], "v").collect()[0]
    assert abs(est["est_distinct"] - n) / n < 0.20


def test_hll_linear_counting_small(spark):
    n = 20
    est = hll_distinct(_ids(spark, n), ["g"], "v").collect()[0]
    assert abs(est["est_distinct"] - n) <= 3


def test_hll_duplicates_do_not_change_estimate(spark):
    once = hll_distinct(_ids(spark, 1000), ["g"], "v").collect()[0]
    tripled = hll_distinct(
        _ids(spark, 1000).unionAll(_ids(spark, 1000)).unionAll(_ids(spark, 1000)),
        ["g"],
        "v",
    ).collect()[0]
    assert once["est_distinct"] == tripled["est_distinct"]
    assert once["buckets_set"] == tripled["buckets_set"]


def test_hll_registers_merge_with_max(spark):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) -- the re-aggregation
    property: max per bucket over the union of register tables."""
    a, b = _ids(spark, 1500), _ids(spark, 1500, offset=1000)  # overlapping
    whole = hll_distinct(a.unionAll(b), ["g"], "v").collect()[0]
    merged_regs = (
        hll_registers(a, ["g"], "v")
        .unionAll(hll_registers(b, ["g"], "v"))
        .groupBy("g", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    merged = hll_estimate(merged_regs, ["g"]).collect()[0]
    assert merged["est_distinct"] == whole["est_distinct"]
    assert merged["buckets_set"] == whole["buckets_set"]


def test_lc_table_shape():
    assert len(LC_TABLE) == M
    assert LC_TABLE[0] > LC_TABLE[1] > LC_TABLE[-2] > LC_TABLE[-1] == 0


def test_cms_overestimates_never_under(spark):
    """CMS guarantee: est_n >= exact_n for every probed value."""
    from prometheus_pulsar_remote_write_spark.operators.sketch import (
        cms_estimate,
        cms_table,
    )

    vals = spark.range(20000).select((F.col("id") % 500).alias("v"))
    table = cms_table(vals, "v")
    exact = vals.groupBy("v").agg(F.count("*").alias("exact_n"))
    est = cms_estimate(table, exact, "v").collect()
    assert len(est) == 500
    assert all(r["est_n"] >= r["exact_n"] for r in est)
    # with 500 keys in 4x1024 counters, most estimates should be exact
    assert sum(1 for r in est if r["est_n"] == r["exact_n"]) >= 400

    # a probe value the sketch never saw still gets an estimate (0 when its
    # buckets hold no counters), not a silently-dropped row
    unseen = spark.createDataFrame([(987654321,)], "v long").withColumn(
        "exact_n", F.lit(0).cast("long")
    )
    got = cms_estimate(table, unseen, "v").collect()
    assert len(got) == 1
    assert got[0]["est_n"] >= 0


def test_cms_tables_merge_by_addition(spark):
    """sketch(A ∪ B) == elementwise-sum(sketch(A), sketch(B))."""
    from prometheus_pulsar_remote_write_spark.operators.sketch import cms_table

    a = spark.range(3000).select((F.col("id") % 100).alias("v"))
    b = spark.range(3000, 7000).select((F.col("id") % 130).alias("v"))
    whole = {
        (r["depth"], r["bucket"]): r["n"]
        for r in cms_table(a.unionAll(b), "v").collect()
    }
    merged = (
        cms_table(a, "v")
        .unionAll(cms_table(b, "v"))
        .groupBy("depth", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    assert {
        (r["depth"], r["bucket"]): r["n"] for r in merged.collect()
    } == whole


def test_misra_gries_guarantees(spark):
    """Classic MG bounds must hold on the real fixture: counters never
    overestimate, undercount at most n/(capacity+1), and every item with
    true frequency above n/(capacity+1) survives in the summary."""
    from prometheus_pulsar_remote_write_spark.plans.events_batch import (
        _MG_CAPACITY,
        events_misra_gries_topk,
    )
    from prometheus_pulsar_remote_write_spark.schema import load_tables
    from tests.conftest import SF_SMOKE

    rows = events_misra_gries_topk(spark, SF_SMOKE).collect()
    assert rows
    in_summary = {}
    for r in rows:
        assert r["est_count"] <= r["exact_count"]
        assert r["exact_count"] - r["est_count"] <= r["n_total"] / (_MG_CAPACITY + 1)
        in_summary.setdefault(r["event_type"], set()).add(r["item"])
    ev = load_tables(spark, SF_SMOKE, ["events"])["events"]
    exact = (
        ev.groupBy("event_type", F.col("user_id").cast("string").alias("item"))
        .count()
        .collect()
    )
    n_by_type = {}
    for r in exact:
        n_by_type[r["event_type"]] = n_by_type.get(r["event_type"], 0) + r["count"]
    for r in exact:
        if r["count"] > n_by_type[r["event_type"]] / (_MG_CAPACITY + 1):
            assert r["item"] in in_summary.get(r["event_type"], set()), (
                f"heavy hitter {r['item']} missing from {r['event_type']} summary"
            )
