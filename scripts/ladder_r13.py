#!/usr/bin/env python
"""Round-13 ladder: the emb sign-LSH path one decade further (sf100,
2M vectors), plus the new bucket-occupancy detector at every scale.

Round 12 fixed the repo's only superlinear operator (emb_neardup_lsh,
wall exponent 1.41 -> 0.65 over sf1->sf10 with the 4x8 signature) but
the asymptote was only pinned for the TEXT path (documents sf100). This
runner adds the embeddings sf100 point, and runs
embedding_lsh_bucket_histogram at each scale so the saturation doctrine
("median occupancy growing with n = signature saturation") is checked
by the shipped detector rather than a hand ladder.

Corpora: scripts/make_testdata.py seed 42 (sf1/sf10 full sets at
/tmp/ladder, sf100 embeddings via gen_embeddings(100.0, 42)).
Usage: python scripts/ladder_r13.py /tmp/ladder/sf1 /tmp/ladder/sf10 ...
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _peak_memory_snapshot, _max_stage_id
from ladder_r12 import measure
from prometheus_pulsar_remote_write_spark.operators.similarity import (
    embedding_lsh_bucket_histogram,
)
from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
    EMB_LSH_BANDS,
    EMB_LSH_BITS,
    EMB_LSH_MAX_BUCKET,
    emb_neardup_lsh,
)
from prometheus_pulsar_remote_write_spark.schema import load_tables
from prometheus_pulsar_remote_write_spark.session import get_spark


def main():
    # --wide: re-measure each corpus with 4x12 signatures as well (the
    # §11 saturation remedy) -- pair counts + histogram + wall, exactly
    # the numbers behind SCALE.md §11's remedy table
    wide = "--wide" in sys.argv
    dirs = [a for a in sys.argv[1:] if not a.startswith("--")]
    spark = get_spark(
        app_name="ladder-r13",
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
        first_stage = _max_stage_id(spark)
        measure(spark, "emb_neardup_lsh", emb_neardup_lsh, sf_dir)
        peaks = _peak_memory_snapshot(spark, first_stage)
        emb = load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
        hist = embedding_lsh_bucket_histogram(
            emb,
            bands=EMB_LSH_BANDS,
            bits_per_band=EMB_LSH_BITS,
            max_bucket_size=EMB_LSH_MAX_BUCKET,
        )
        print(
            json.dumps({"sf_dir": sf_dir, "peaks": peaks, "bucket_hist": hist}),
            flush=True,
        )
        if wide:
            import time

            from prometheus_pulsar_remote_write_spark.operators.similarity import (
                embedding_neardup_pairs,
            )

            for bands, bits in ((EMB_LSH_BANDS, EMB_LSH_BITS), (4, 12)):
                t0 = time.time()
                n_pairs = embedding_neardup_pairs(
                    emb,
                    threshold=0.42,
                    bands=bands,
                    bits_per_band=bits,
                    max_bucket_size=EMB_LSH_MAX_BUCKET,
                ).count()
                wall = round(time.time() - t0, 1)
                h = embedding_lsh_bucket_histogram(
                    emb,
                    bands=bands,
                    bits_per_band=bits,
                    max_bucket_size=EMB_LSH_MAX_BUCKET,
                )
                print(
                    json.dumps(
                        {
                            "sf_dir": sf_dir,
                            "bands": bands,
                            "bits": bits,
                            "n_pairs": n_pairs,
                            "wall_s": wall,
                            "hist": h,
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
