"""Deterministic Bloom-filter semi-join prefilter (§2.F scale toolkit).

The manual analog of Spark's AQE runtime bloom filters
(`spark.sql.optimizer.runtime.bloomFilter.enabled`): when the build side
of a semi-join is too large to broadcast as a key set, its Bloom filter
is still tiny -- m bits packed into m/32 words -- and broadcasting THAT
prunes the probe side before the real shuffle. At 100 TB this turns a
fact-x-fact semi-join into (scan + broadcast-filter + much smaller
shuffle).

This implementation is *deterministic* (k md5-derived hash functions, no
RNG), so the whole filter -- build, probe, false-positive accounting --
is replayable in ANSI SQL and carries a full value-hash oracle, unlike
an opaque `BloomFilterAggregate`.

Layout: m bits as m/32 words of 32 bits each, stored in a BIGINT so both
engines' `<<`/`&`/`bit_or` stay in signed-64 range with no overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _positions(col, k: int, m: int):
    """k bloom bit-positions for a key: md5('bf{j}|' || key) hex prefix
    (28 bits) mod m. Engine-portable (md5 + integer ops only)."""
    return [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{j}|"), col.cast("string"))), 1, 7),
            16,
            10,
        ).cast("long")
        % m
        for j in range(k)
    ]


def build_bloom(keys: DataFrame, key_col: str, k: int = 3, m: int = 65536) -> DataFrame:
    """Aggregate the key set into (word, bits) rows -- at most m/32 rows,
    always broadcastable. One shuffle of (n_keys * k) tiny rows."""
    pos = F.explode(F.array(*_positions(F.col(key_col), k, m))).alias("pos")
    return (
        keys.select(pos)
        .select(
            F.expr("pos div 32").alias("word"),
            F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bits"))
    )


def bloom_might_contain(
    probe: DataFrame, probe_col: str, bloom: DataFrame, k: int = 3, m: int = 65536
) -> DataFrame:
    """Adds a boolean ``bloom_pass`` column: true iff all k bits are set.

    The probe explodes to k (word, mask) lookups joined against the
    broadcast bloom words, then re-groups on the probe's own columns --
    the join is a broadcast hash join against <= m/32 rows, so the only
    shuffle is the regroup. Rows identical in every probe column collapse
    to one output row (set semantics); the pass test is "every lookup
    hit" (sum == count), so collapsed duplicates stay correct.
    """
    pcols = probe.columns
    pos = F.posexplode(F.array(*_positions(F.col(probe_col), k, m))).alias(
        "j", "pos"
    )
    exploded = probe.select(*pcols, pos).select(
        *pcols,
        (F.col("pos") / 32).cast("long").alias("word"),
        F.expr("shiftleft(1L, cast(pos % 32 as int))").alias("mask"),
    )
    joined = exploded.join(F.broadcast(bloom), "word", "left")
    hit = F.when(
        F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("mask")) != 0), 1
    ).otherwise(0)
    return (
        joined.withColumn("hit", hit)
        .groupBy(*pcols)
        .agg((F.sum("hit") == F.count("*")).alias("bloom_pass"))
    )
