#!/usr/bin/env python
"""Watermark-dedup state-sizing soak (round 10).

SCALE.md §8 claims the effectively-once consume stage's state is
bounded by ingest-rate x horizon, not history. This measures it: the
sf0.1 events history (100k rows / 720h) replays as ts-ordered
micro-batches through the SAME stage shape `run_consume_pipeline`
wires -- withWatermark(ts, H) -> dropDuplicatesWithinWatermark(key) --
with every batch DOUBLED (each row appears twice, the redelivery
worst case). Expected: emitted rows == distinct keys (every duplicate
dropped), and the state-store row count settles at ~rate x horizon
(100k/720h x H) instead of growing toward 100k.

Usage: python scripts/soak_dedup.py [n_batches] [horizon_hours]
Prints the per-decile state curve and the summary line SCALE.md
records.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.session import get_spark


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 120
    horizon_h = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    tbl = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    tbl = tbl.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = tbl.num_rows
    stage = tempfile.mkdtemp(prefix="soak-dedup-")
    src = os.path.join(stage, "src")
    os.makedirs(src)
    per = (n + n_batches - 1) // n_batches
    for i in range(n_batches):
        part = tbl.slice(i * per, per)
        # the redelivery worst case: EVERY row of the batch arrives twice
        pq.write_table(
            pa.concat_tables([part, part]),
            os.path.join(src, f"b{i:04d}.parquet"),
        )

    spark = get_spark(
        app_name="soak-dedup",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=8,
        extra_conf={
            "spark.sql.streaming.numRecentProgressUpdates": str(n_batches + 16)
        },
    )
    schema = spark.read.parquet(os.path.join(src, "b0000.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    if dict(stream.dtypes)["ts"].startswith("timestamp_ntz"):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    horizon_ms = int(horizon_h * 3_600_000)
    deduped = stream.withWatermark(
        "ts", f"{horizon_ms} milliseconds"
    ).dropDuplicatesWithinWatermark(["event_id"])

    t0 = time.time()
    q = (
        deduped.writeStream.format("memory")
        .queryName("soak_dedup")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(3600)
    elapsed = time.time() - t0

    curve = []
    for p in q.recentProgress:
        for op in p.get("stateOperators", []):
            curve.append(
                (p["batchId"], op.get("numRowsTotal", 0), op.get("numRowsRemoved", 0))
            )
    curve.sort()
    emitted = spark.sql("SELECT count(*) c FROM soak_dedup").collect()[0]["c"]
    dupes_seen = spark.sql(
        "SELECT count(*) - count(DISTINCT event_id) c FROM soak_dedup"
    ).collect()[0]["c"]

    peak = max(c[1] for c in curve)
    steady = [c[1] for c in curve[len(curve) // 3 :]]
    expect = n / 720.0 * horizon_h
    print(
        f"history: {n} distinct keys fed as {2 * n} rows"
        f" ({n_batches} micro-batches, every row twice), horizon {horizon_h}h"
    )
    print("batch  state_rows  removed")
    for b, tot, rem in curve[:: max(1, len(curve) // 12)]:
        print(f"{b:5d}  {tot:10d}  {rem:7d}")
    print(
        f"\nemitted {emitted} rows, duplicate keys downstream: {dupes_seen}"
        f" (must be 0); peak state {peak} rows, steady-state mean"
        f" {sum(steady) / len(steady):.0f} vs rate x horizon"
        f" ~{expect:.0f} ({2 * n} input rows in {elapsed:.1f}s)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
