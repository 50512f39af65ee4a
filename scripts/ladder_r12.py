#!/usr/bin/env python
"""Round-12 scaling-ladder points for the two re-parameterized LSH paths.

Measures, at one corpus dir (pass it as argv[1]):
  - emb_neardup_lsh (the catalog entry: 4 bands x 8 bits, Arrow
    signature tier, star cap 2000) -- r11 measured the OLD 2x4 default
    at wall exponent 1.41 sf1->sf10; the done-criterion is <= ~1.0.
  - the text near-dup PRODUCTION drop-set path
    (_neardup_pairs(max_bucket_size=NEARDUP_MAX_BUCKET)) -- r11 measured
    the uncapped path's candidate shuffle at 57x per data decade; the
    done-criterion is a <= ~linear shuffle-byte slope.
  - the uncapped all-pairs listing (docs_neardup_pairs) for the same
    corpus, as the control.

Protocol matches bench.py: untimed warmup, then best-of-2 (retry while
the two best disagree > 1.2x), shuffle bytes for one steady-state run
from the AppStatusStore. Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _metrics_snapshot, run_query
from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
    NEARDUP_MAX_BUCKET,
    _neardup_pairs,
    docs_neardup_pairs,
    emb_neardup_lsh,
)
from prometheus_pulsar_remote_write_spark.session import get_spark


def measure(spark, name, make_df, sf_dir):
    spark._jvm.System.gc()
    run_query(make_df(spark, sf_dir))  # untimed warmup
    runs = []
    before = _metrics_snapshot(spark)
    after = None
    for _ in range(2):
        t0 = time.time()
        run_query(make_df(spark, sf_dir))
        runs.append(time.time() - t0)
        if after is None and before is not None:
            after = _metrics_snapshot(spark)
    while len(runs) < 4:
        best2 = sorted(runs)[:2]
        if best2[1] <= 1.2 * best2[0]:
            break
        t0 = time.time()
        run_query(make_df(spark, sf_dir))
        runs.append(time.time() - t0)
    out = {
        "query": name,
        "sf_dir": sf_dir,
        "best_s": round(min(runs), 3),
        "runs": [round(r, 3) for r in runs],
    }
    if before is not None and after is not None:
        out["shuffle_write_mb"] = round((after[0] - before[0]) / 1e6, 2)
        out["shuffle_read_mb"] = round((after[1] - before[1]) / 1e6, 2)
    print(json.dumps(out), flush=True)


def main():
    sf_dir = sys.argv[1]
    spark = get_spark(app_name="ladder-r12")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()
    measure(spark, "emb_neardup_lsh", emb_neardup_lsh, sf_dir)
    measure(
        spark,
        f"neardup_drop_path(cap={NEARDUP_MAX_BUCKET})",
        lambda s, d: _neardup_pairs(s, d, max_bucket_size=NEARDUP_MAX_BUCKET),
        sf_dir,
    )
    measure(spark, "docs_neardup_pairs(uncapped)", docs_neardup_pairs, sf_dir)


if __name__ == "__main__":
    main()
