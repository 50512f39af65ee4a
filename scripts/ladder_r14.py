#!/usr/bin/env python
"""Round-14 ladder: replay the embedding sign-LSH ladder with the
AUTO-SIZED default (bits_per_band=None) that r14 wired in -- the cure
for r13's one weak (the fixed 4x8 signature saturating at >=2M vectors,
SCALE.md §11).

For each corpus this measures the SHIPPED catalog configuration
(emb_neardup_lsh: bands=4, bits auto from count, star cap 2000):
picked width, pair count, wall, bucket histogram, over-cap fraction.
The r13 evidence to beat: at sf100 the old 4x8 default had 1,020/1,024
buckets over the cap and its pair listing collapsed to 31,654 (vs
10.29M from the hand-measured 4x12 remedy); the rule picks 15 bits at
2M vectors, so the replay must show <1% over-cap buckets and a pair
listing that is bucket-collision semantics, not cap-star semantics.

Corpora: scripts/make_testdata.py seed 42 (/tmp/ladder/sf{1,10} full,
sf100 documents+embeddings, sf1000 embeddings only).
Usage: python scripts/ladder_r14.py /tmp/ladder/sf1 /tmp/ladder/sf10 /tmp/ladder/sf100
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _max_stage_id, _peak_memory_snapshot
from prometheus_pulsar_remote_write_spark.operators.similarity import (
    embedding_lsh_bucket_histogram,
    embedding_neardup_pairs,
    suggest_signature_bits,
)
from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
    EMB_LSH_BANDS,
    EMB_LSH_MAX_BUCKET,
)
from prometheus_pulsar_remote_write_spark.schema import load_tables
from prometheus_pulsar_remote_write_spark.session import get_spark


def main():
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark(
        app_name="ladder-r14",
        extra_conf={
            "spark.executor.processTreeMetrics.enabled": "true",
            "spark.executor.metrics.pollingInterval": "250ms",
        },
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([(1,)], "x int").mapInPandas(
        lambda it: it, "x int"
    ).write.format("noop").mode("overwrite").save()
    for sf_dir in dirs:
        emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
        n = emb.count()
        bits = suggest_signature_bits(n)
        first_stage = _max_stage_id(spark)
        t0 = time.time()
        n_pairs = embedding_neardup_pairs(
            emb,
            threshold=0.42,
            bands=EMB_LSH_BANDS,
            bits_per_band=None,  # the shipped auto default
            max_bucket_size=EMB_LSH_MAX_BUCKET,
        ).count()
        wall = round(time.time() - t0, 1)
        peaks = _peak_memory_snapshot(spark, first_stage)
        hist = embedding_lsh_bucket_histogram(
            emb,
            bands=EMB_LSH_BANDS,
            bits_per_band=None,
            max_bucket_size=EMB_LSH_MAX_BUCKET,
        )
        over_cap_frac = (hist.get("over_cap_buckets") or 0) / max(
            hist.get("n_buckets") or 1, 1
        )
        print(
            json.dumps(
                {
                    "sf_dir": sf_dir,
                    "n_vectors": n,
                    "auto_bits": bits,
                    "n_pairs": n_pairs,
                    "wall_s": wall,
                    "over_cap_frac": round(over_cap_frac, 5),
                    "hist": hist,
                    "peaks": peaks,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
