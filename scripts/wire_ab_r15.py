#!/usr/bin/env python
"""r15 wire-serialization floor A/B (guide §1.2 per-task work).

Decomposes produce_serialize_json's per-row cost and times candidate
rewrites of the expression tier, interleaved ABAB in ONE session so
host drift cancels:

  sub-stages (where does the time go):
    scan_ms       events scan + _EPOCH_MS + tenant only
    scan_k        + the get_json_object('$.k') parse
    samples       the full committed projection (map build included)
  variants (identical payloads by construction, asserted before timing):
    v0_base       committed serialize_json_expr
    v1_rtrim      regexp trims -> rtrim('.', rtrim('0', s)) on the
                  fixed-scale decimal strings
    v2_intsec     + seconds rendered from integer div/pmod + a 3-way
                  CASE on the ms digits (no DECIMAL cast for the
                  timestamp at all; corpus timestamps are positive,
                  the _EPOCH_MS precedent)
    v3_scalars    + labels JSON from the flat scalar projection (no
                  create_map/map_entries/array_sort/transform chain;
                  key order is the static byte order of the 3 keys)

Usage: SPARK_GRAFT_CPUS=N python scripts/wire_ab_r15.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql import types as T

from prometheus_pulsar_remote_write_spark.functions.serializers import (
    go_float_expr,
    serialize_json_expr,
)
from prometheus_pulsar_remote_write_spark.plans.pipeline import (
    _EPOCH_MS,
    samples_from_events,
    samples_from_events_flat,
)
from prometheus_pulsar_remote_write_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5


def _rt(trim, c):
    return F.call_function("rtrim", F.lit(trim), c)


def trim_fixed(c):
    """rtrim twin of trim_zeros_expr for strings KNOWN to carry a '.'"""
    return _rt(".", _rt("0", c))


def go_sec_rtrim(ts):
    dec = (ts.cast(T.DecimalType(20, 0)) / F.lit(1000)).cast(T.DecimalType(24, 3))
    return trim_fixed(dec.cast("string"))


def go_float_rtrim(v):
    return trim_fixed(v.cast(T.DecimalType(38, 6)).cast("string"))


def go_sec_int(ts):
    """integer-arithmetic seconds rendering (ts >= 0)."""
    sec = (ts / F.lit(1000)).cast("long")  # div, positive => truncation ok
    ms = ts % 1000
    frac = (
        F.when(ms == 0, F.lit(""))
        .when(ms % 100 == 0, F.concat(F.lit("."), (ms / 100).cast("long").cast("string")))
        .when(
            ms % 10 == 0,
            F.concat(F.lit("."), F.lpad((ms / 10).cast("long").cast("string"), 2, "0")),
        )
        .otherwise(F.concat(F.lit("."), F.lpad(ms.cast("string"), 3, "0")))
    )
    return F.concat(sec.cast("string"), frac)


def labels_json_scalars(name, k, user):
    """sorted-entry render from scalars; a NULL value drops its entry,
    exactly like concat->NULL->array_join skip in labels_json_expr."""
    return F.concat(
        F.lit("{"),
        F.array_join(
            F.array(
                F.concat(F.lit('"__name__":"'), name, F.lit('"')),
                F.concat(F.lit('"k":"'), k, F.lit('"')),
                F.concat(F.lit('"user":"'), user, F.lit('"')),
            ),
            ",",
        ),
        F.lit("}"),
    )


def serialize_variant(samples_flat, sec_fn, float_fn, labels_col):
    tenant_part = F.when(
        F.length(F.col("tenant_id")) > 0,
        F.concat(F.lit(',"tenant_id":"'), F.col("tenant_id"), F.lit('"')),
    ).otherwise(F.lit(""))
    return samples_flat.select(
        "event_id",
        "tenant_id",
        F.concat(
            F.lit('{"value":['),
            sec_fn(F.col("timestamp")),
            F.lit(',"'),
            float_fn(F.col("value")),
            F.lit('"],"metric":'),
            labels_col,
            tenant_part,
            F.lit("}"),
        ).alias("payload"),
    )


def main():
    spark = get_spark(app_name="wire_ab_r15")
    sc = spark.sparkContext

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def build():
        samples = samples_from_events(spark, SF_DIR)
        flat = samples_from_events_flat(spark, SF_DIR)
        ev_scan = flat.select("event_id", "tenant_id", "timestamp", "value")
        ev_k = flat.select("event_id", "tenant_id", "timestamp", "value", "k")
        v0 = samples.select(
            "event_id",
            "tenant_id",
            serialize_json_expr(
                F.col("timestamp"), F.col("value"), F.col("labels"), F.col("tenant_id")
            ).alias("payload"),
        )
        lbl_map = F.create_map(
            F.lit("__name__"), F.col("name"),
            F.lit("k"), F.col("k"),
            F.lit("user"), F.col("user_str"),
        )
        from prometheus_pulsar_remote_write_spark.functions.serializers import (
            labels_json_expr,
        )

        v1 = serialize_variant(flat, go_sec_rtrim, go_float_rtrim, labels_json_expr(lbl_map))
        v2 = serialize_variant(flat, go_sec_int, go_float_rtrim, labels_json_expr(lbl_map))
        v3 = serialize_variant(
            flat,
            go_sec_int,
            go_float_rtrim,
            labels_json_scalars(F.col("name"), F.col("k"), F.col("user_str")),
        )
        return {
            "scan_ms": ev_scan,
            "scan_k": ev_k,
            "v0_base": v0,
            "v1_rtrim": v1,
            "v2_intsec": v2,
            "v3_scalars": v3,
        }

    dfs = build()
    # identity gate before any timing: all variants must render the
    # exact committed payload on every row
    base = dfs["v0_base"].select("event_id", "payload")
    for name in ("v1_rtrim", "v2_intsec", "v3_scalars"):
        other = dfs[name].select("event_id", F.col("payload").alias("p2"))
        n_diff = base.join(other, "event_id").filter(
            F.col("payload") != F.col("p2")
        ).count()
        n_a, n_b = base.count(), other.count()
        print(f"{name}: n_diff={n_diff} rows={n_a}/{n_b}")
        assert n_diff == 0 and n_a == n_b, name

    for df in dfs.values():  # warm
        noop(df)
    times = {k: [] for k in dfs}
    for _ in range(REPS):
        for name, df in dfs.items():
            sc.setJobDescription(f"ab:{name}")
            t0 = time.time()
            noop(df)
            times[name].append(time.time() - t0)
    for name, ts in times.items():
        print(f"{name:12s} min={min(ts):.3f} runs={[round(t, 3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
