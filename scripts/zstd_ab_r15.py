#!/usr/bin/env python
"""r15 shuffle-codec A/B (guide §2.3, deferred from r12-r14): lz4 vs
zstd on the highest-shuffle catalog queries at sf1, interleaved
session-level ABAB in one process so host drift cancels.

sf0.1 shuffles are sub-4 MB and cannot resolve the trade; sf1 (the
generated .testdata/sf1 fixture corpus) moves enough bytes to measure.
Each session runs the subset warmed + min-of-N through the noop sink,
then stops, so codec config applies cleanly at session start.

Usage: python scripts/zstd_ab_r15.py [reps_per_session] [sessions_per_codec]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_pulsar_remote_write_spark.plans import catalog
from prometheus_pulsar_remote_write_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/repo/.testdata/sf1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SESSIONS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

QUERIES = [
    "docs_neardup_pairs",
    "docs_phrase_search",
    "q3_shipping_priority",
    "events_sessionization",
    "consume_batching",
    "q1_pricing_summary",
]


def run_session(codec: str) -> dict:
    spark = get_spark(
        app_name=f"zstd_ab_{codec}",
        extra_conf={"spark.io.compression.codec": codec},
    )
    assert spark.conf.get("spark.io.compression.codec") == codec
    out = {}
    for name in QUERIES:
        fn = catalog.QUERIES[name]
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        out[name] = runs
        print(f"  [{codec}] {name}: min={min(runs):.3f} {[round(r,3) for r in runs]}")
    spark.stop()
    return out


def main():
    results = {"lz4": {}, "zstd": {}}
    for i in range(SESSIONS):
        for codec in ("lz4", "zstd"):
            print(f"-- session {i+1}/{SESSIONS} codec={codec}")
            for name, runs in run_session(codec).items():
                results[codec].setdefault(name, []).extend(runs)
    print("\n== minima over all sessions ==")
    for name in QUERIES:
        a = min(results["lz4"][name])
        b = min(results["zstd"][name])
        print(f"{name:28s} lz4={a:.3f}  zstd={b:.3f}  zstd/lz4={b/a:.2f}")


if __name__ == "__main__":
    main()
