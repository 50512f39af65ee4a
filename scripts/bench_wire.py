#!/usr/bin/env python
"""Wire-path throughput harness -- the engine-side counterpart of the
reference's Go benchmarks (serializers_test.go:102-108,186-192,238-244
marshal throughput; write_test.go:375-419 batcher throughput), which
publish no absolute numbers. This prints ours, at 1M samples on
local[$SPARK_GRAFT_CPUS], as samples/sec through each wire stage.

Usage: python scripts/bench_wire.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.functions.fnv import (
    colocation_key_col,
    partition_key_col,
)
from prometheus_pulsar_remote_write_spark.functions.serializers import (
    deserialize,
    serialize_json_compat_expr,
    serialize_json_expr,
)
from prometheus_pulsar_remote_write_spark.plans.pipeline import samples_from_events
from prometheus_pulsar_remote_write_spark.session import get_spark
from prometheus_pulsar_remote_write_spark.streaming.batcher import microbatch_batches


def run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-wire")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # replicate to ~1M rows (per-job scheduling overhead would otherwise
    # dominate) and stage to a properly-split parquet: the raw testdata is
    # one row group, so without this every stage would run on 1-2 cores
    import tempfile

    base = samples_from_events(spark, sf_dir)
    reps = max(1, 1_000_000 // max(base.count(), 1))
    stage_dir = os.path.join(tempfile.mkdtemp(prefix="bench-wire-"), "samples")
    (
        base.withColumn("__r", F.explode(F.sequence(F.lit(1), F.lit(reps))))
        .drop("__r")
        .repartition(int(spark.sparkContext.defaultParallelism))
        .write.mode("overwrite")
        .parquet(stage_dir)
    )
    samples = spark.read.parquet(stage_dir)
    n = samples.count()

    stages = {
        "marshal_json": lambda: samples.select(
            serialize_json_expr(
                F.col("timestamp"), F.col("value"), F.col("labels"), F.col("tenant_id")
            ).alias("payload")
        ),
        "marshal_json_compat": lambda: samples.select(
            serialize_json_compat_expr(
                F.col("timestamp"), F.col("value"), F.col("labels"), F.col("tenant_id")
            ).alias("payload")
        ),
        "unmarshal_compat": lambda: deserialize(
            samples.select(
                serialize_json_compat_expr(
                    F.col("timestamp"), F.col("value"), F.col("labels"), F.col("tenant_id")
                ).alias("payload")
            ),
            "json-compat",
        ),
        "partition_key_exact_fnv": lambda: samples.select(
            partition_key_col(F.col("labels"), F.col("tenant_id")).alias("key")
        ),
        "partition_key_colocation": lambda: samples.select(
            colocation_key_col(F.col("labels"), F.col("tenant_id")).alias("key")
        ),
        "batcher_microbatch": lambda: microbatch_batches(
            samples.select(
                "tenant_id",
                "timestamp",
                "value",
                F.to_json("labels").alias("labels_json"),
            )
        ),
    }

    out = {}
    for name, mk in stages.items():
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            run(mk())
            best = min(best, time.time() - t0)
        out[name] = round(n / best)
        print(f"  {name}: {out[name]:,} samples/s ({best:.2f}s)", file=sys.stderr)

    print(json.dumps({"metric": "wire_samples_per_sec", "n_samples": n, "stages": out}))
    spark.stop()


if __name__ == "__main__":
    main()
