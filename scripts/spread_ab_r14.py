#!/usr/bin/env python
"""Same-session interleaved A/B: does a guarded spread of the
single-row-group lineitem scan pay for itself on the TPC-H headline
queries (q1/q3/q5/q10), or does the exchange cost exceed the parallelism
win (as it measurably did for the cheap produce projection --
plans/pipeline.py samples_from_events NOTE)?

The spread variant runs the EXACT committed plan functions with
relational.load_tables monkeypatched to repartition lineitem, so there is
no clone-divergence risk. Also times q1's scan+filter sub-stage alone to
separate unsplittable parquet decode from parallelizable agg work.

Usage: python scripts/spread_ab_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.session import get_spark
from prometheus_pulsar_remote_write_spark.schema import load_tables
import prometheus_pulsar_remote_write_spark.plans.relational as R

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
QUERIES = ["q1_pricing_summary", "q3_shipping_priority",
           "q5_local_supplier_volume", "q10_returned_items"]


def t1(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main():
    spark = get_spark(app_name="spread_ab_r14")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    par = spark.sparkContext.defaultParallelism
    orig = R.load_tables

    def patched_rr(spark_, sf_dir_, names=None):
        tabs = orig(spark_, sf_dir_, names)
        if "lineitem" in tabs:
            tabs["lineitem"] = tabs["lineitem"].repartition(par)
        return tabs

    def patched_hash(spark_, sf_dir_, names=None):
        # NB (r15 advice close-out): l_orderkey is the JOIN key for
        # q3/q5/q10; q1 aggregates by (l_returnflag, l_linestatus), so
        # for q1 this leg is effectively a second arbitrary spread, not
        # an agg-key-aligned one. The rejection verdict is unaffected
        # (the rr leg also lost on every query), but read the q1 hash
        # row as "spread", not "aligned partitioning".
        tabs = orig(spark_, sf_dir_, names)
        if "lineitem" in tabs:
            tabs["lineitem"] = tabs["lineitem"].repartition(
                par, F.col("l_orderkey")
            )
        return tabs

    # sub-stage: unsplittable decode floor for q1. The column list and
    # shipdate predicate are PINNED to plans/relational.py
    # q1_pricing_summary (its scan projection + filter as committed in
    # r13) -- if q1's predicate ever changes, update this sub-stage or
    # the "decode floor" comparison silently measures something else.
    li = load_tables(spark, SF_DIR, ["lineitem"])["lineitem"]
    scan_only = li.select(
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    ).filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    for _ in range(2):
        t1(scan_only)  # warm
    print(f"q1 scan+filter only: {[t1(scan_only) for _ in range(4)]}")

    results = {q: {"base": [], "rr": [], "hash": []} for q in QUERIES}
    # warm each variant once (codegen)
    for q in QUERIES:
        fn = getattr(R, q)
        for patch in (orig, patched_rr, patched_hash):
            R.load_tables = patch
            try:
                t1(fn(spark, SF_DIR))
            finally:
                R.load_tables = orig

    for rnd in range(4):
        for q in QUERIES:
            fn = getattr(R, q)
            for key, patch in (("base", orig), ("rr", patched_rr),
                               ("hash", patched_hash)):
                R.load_tables = patch
                try:
                    results[q][key].append(t1(fn(spark, SF_DIR)))
                finally:
                    R.load_tables = orig

    print(f"\n== interleaved ABAB x4, sf={SF_DIR}, par={par} ==")
    for q in QUERIES:
        r = results[q]
        print(f"{q:34s} base={r['base']} min={min(r['base'])}")
        print(f"{'':34s} rr  ={r['rr']} min={min(r['rr'])}")
        print(f"{'':34s} hash={r['hash']} min={min(r['hash'])}")

    spark.stop()


if __name__ == "__main__":
    main()
