#!/usr/bin/env python
"""Round-14 A/B for the produce_* wire-query drift class (VERDICT r13
item 6): three rounds running, produce_flatten / produce_serialize_json
moved +/-20-30% between rounds at BYTE-IDENTICAL shuffle profiles and
untouched plans (r12: emb_int8 +30%; r13: produce_flatten +21%).

Question: is the band (a) per-RUN variance that best-of-2 can't
suppress (fix: more timed runs for the wire queries), or (b) per-
SESSION state -- JIT compilation layout, Python worker pool placement --
that offsets every run in a process equally (no harness fix can help;
compare shuffle bytes, not seconds, which is already the doctrine)?

Method: per session, the bench's exact warmup discipline (session-level
warmup + one untimed per-query warmup), then N=12 timed runs per query.
Run the script twice (two processes) and compare:
  - within-session: cv and min(first 2) vs min(all 12) -- if deeper
    best-of-N finds a materially lower floor, (a) is real;
  - between-session: |minA - minB| / min -- if sessions disagree while
    within-session runs agree, it's (b).
Usage: python scripts/drift_ab_r14.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_pulsar_remote_write_spark.plans import catalog
from prometheus_pulsar_remote_write_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["produce_flatten", "produce_serialize_json"]
N_RUNS = 12


def main():
    label = sys.argv[1] if len(sys.argv) > 1 else "A"
    spark = get_spark(app_name=f"drift-ab-{label}")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()
    out = {"label": label, "pid": os.getpid(), "sf_dir": SF_DIR, "runs": {}}
    for name in QUERIES:
        fn = catalog.QUERIES[name]
        spark._jvm.System.gc()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warmup
        runs = []
        for _ in range(N_RUNS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out["runs"][name] = runs
        print(
            json.dumps(
                {
                    "label": label,
                    "query": name,
                    "runs": runs,
                    "min_first2": min(runs[:2]),
                    "min_all": min(runs),
                    "spread_best2_vs_floor": round(min(runs[:2]) / min(runs), 3),
                }
            ),
            flush=True,
        )
    print("RESULT " + json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
