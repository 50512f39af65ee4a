"""Partition-key hashing.

The reference computes the Pulsar message key as FNV-1 64-bit (Go
``hash/fnv.New64()`` -- multiply-then-xor, NOT the 1a variant) over the
sorted (k, v) byte concatenation of the non-replica labels followed by the
tenant id, rendered ``"hex %016x"`` (reference pkg/pulsar/serializers.go:91-114).

Two tiers, by design:
  - ``colocation_key_col``: Spark-native ``xxhash64`` -- JVM-side, codegen'd,
    zero Python cost. Partitioning only needs *consistency* (equal label
    sets -> equal key), not byte-parity with Go, so this is the hot path
    used for repartitioning inside the engine at scale.
  - ``partition_key_col``: exact FNV-1 via an Arrow-batched pandas UDF --
    used only at the Pulsar wire edge where byte-equality with the
    reference's message keys matters.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..schema import DEFAULT_REPLICA_LABELS

FNV1_64_OFFSET = 0xCBF29CE484222325
FNV1_64_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def fnv1_64(data: bytes) -> int:
    """FNV-1 64-bit (multiply then xor), as Go hash/fnv.New64."""
    h = FNV1_64_OFFSET
    for b in data:
        h = ((h * FNV1_64_PRIME) & _MASK64) ^ b
    return h


def sample_partition_key(
    labels: dict | None, tenant_id: str, replica_labels: Iterable[str] = ()
) -> str:
    """Pure-Python reference implementation of the reference's partitionKey."""
    replica = set(replica_labels)
    h = FNV1_64_OFFSET
    if labels:
        for k in sorted(k for k in labels if k not in replica):
            for part in (k, labels[k]):
                for b in part.encode("utf-8"):
                    h = ((h * FNV1_64_PRIME) & _MASK64) ^ b
    for b in (tenant_id or "").encode("utf-8"):
        h = ((h * FNV1_64_PRIME) & _MASK64) ^ b
    return f"hex {h:016x}"


def partition_key_col(
    labels: Column, tenant_id: Column, replica_labels: list[str] | None = None
) -> Column:
    """Exact Go-parity partition key column (pandas UDF, Arrow-batched)."""
    replica = tuple(replica_labels if replica_labels is not None else DEFAULT_REPLICA_LABELS)

    @pandas_udf(T.StringType())
    def _key(labels_s: pd.Series, tenant_s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                sample_partition_key(lbls, ten if ten is not None else "", replica)
                for lbls, ten in zip(labels_s, tenant_s)
            ]
        )

    return _key(labels, tenant_id)


def colocation_key_col(
    labels: Column, tenant_id: Column, replica_labels: list[str] | None = None
) -> Column:
    """JVM-side consistent hash with the same *semantics* (same inputs in the
    same sorted order -> same key; replica labels excluded; tenant included).

    Use this for in-engine repartitioning/bucketing; it keeps the whole
    expression inside whole-stage codegen.
    """
    replica = replica_labels if replica_labels is not None else DEFAULT_REPLICA_LABELS
    replica_arr = F.array(*[F.lit(r) for r in replica]) if replica else F.array()
    filtered = F.map_filter(labels, lambda k, _: ~F.array_contains(replica_arr, k))
    canonical = F.concat_ws(
        "\x00",
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries(filtered)),
                lambda e: F.concat_ws("\x01", e["key"], e["value"]),
            ),
            "\x02",
        ),
        F.coalesce(tenant_id, F.lit("")),
    )
    return F.xxhash64(canonical)
