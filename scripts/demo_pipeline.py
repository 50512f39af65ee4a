#!/usr/bin/env python
"""End-to-end drive of the whole engine on real wire bytes.

The reference's two dataflows, run back-to-back through this repo's
public API on a temp directory:

  1. PRODUCE: snappy(protobuf(WriteRequest)) request bodies (built from
     testdata events with the pure-Python wire codecs) land in a drop
     dir -> streaming decode (A1) -> flatten (B1) -> tenant (B4) ->
     FNV partition key (B8) -> C1 JSON payloads -> bus sink (A2).
  2. CONSUME: the produced messages -> deserialize (C4) -> poison split
     (B9) -> per-tenant batches (D1/D2) -> re-nest + label sort (B2/B3)
     -> snappy(prompb) POSTs to an in-process sink (A4), with delivered
     sample counts printed per tenant.

Usage: python scripts/demo_pipeline.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.schema import load_tables
from prometheus_pulsar_remote_write_spark.session import get_spark
from prometheus_pulsar_remote_write_spark.sources import prompb, snappy_codec
from prometheus_pulsar_remote_write_spark.streaming.consume import (
    RemoteWriteSink,
    run_consume_pipeline,
)
from prometheus_pulsar_remote_write_spark.streaming.produce import run_produce_pipeline

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    work = tempfile.mkdtemp(prefix="demo-pipeline-")
    drop, bus, poison, dlq = (os.path.join(work, d) for d in ("drop", "bus", "poison", "dlq"))

    # --- stage remote-write request bodies from testdata events -------------
    ev = load_tables(spark, SF_DIR, ["events"])["events"].limit(200).collect()
    for tenant in ("tenant-a", "tenant-b"):
        body = {
            "timeseries": [
                {
                    "labels": [
                        {"name": "__name__", "value": r["event_type"]},
                        {"name": "user", "value": str(r["user_id"])},
                    ],
                    "samples": [
                        {"value": r["value"], "timestamp": int(r["ts"].timestamp() * 1000)}
                    ],
                }
                for r in ev
                if (r["user_id"] % 2 == 0) == (tenant == "tenant-a")
            ]
        }
        path = os.path.join(drop, tenant, "req.bin")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(snappy_codec.compress(prompb.encode_write_request(body)))
    print(f"staged {len(ev)} samples as remote-write bodies under {drop}")

    # --- produce ------------------------------------------------------------
    run_produce_pipeline(spark, drop, bus, trigger_once=True).awaitTermination(120)
    produced = spark.read.json(os.path.join(bus, "epoch=*"))
    print(f"produce: {produced.count()} messages on the bus; sample payload:")
    print("  " + produced.select("payload").first()["payload"][:120])

    # --- consume ------------------------------------------------------------
    from prometheus_pulsar_remote_write_spark.operators.metrics import DeliveryMetrics

    # POSTs run on the executors (distributed default); per-tenant totals
    # come back through the sink's driver-side ledger, not a closure
    metrics = DeliveryMetrics()
    sink = RemoteWriteSink(
        url="http://downstream",
        dlq_dir=dlq,
        post_fn=lambda url, body, headers: 200,
        batch_size=50,
        metrics=metrics,
    )
    # the bus sink wrote one JSON file per epoch/partition; feed those
    # message files to the consume stream unchanged
    run_consume_pipeline(
        spark, os.path.join(bus, "epoch=0"), sink, poison
    ).awaitTermination(120)
    print(f"consume: {metrics.duration_count} remote-write POSTs, samples per tenant: "
          + json.dumps(sink.sent, sort_keys=True))
    assert sum(sink.sent.values()) == produced.count()
    print("round-trip complete: every produced sample delivered downstream")
    spark.stop()


if __name__ == "__main__":
    main()
