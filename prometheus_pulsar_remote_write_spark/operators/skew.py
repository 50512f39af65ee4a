"""Skew-mitigation operators (SURVEY.md §2.F 100 TB notes).

A hot grouping key (one giant tenant, one dominant event type) turns a
hash aggregation's single reducer partition into the job's critical path.
``salted_agg`` splits every key into ``n_salts`` sub-keys for the first
(heavy) aggregation, then combines the partials in a second, tiny
aggregation over at most ``n_keys x n_salts`` rows.

AQE's skew-join handling covers joins; this covers aggregations, and
composes with it. The salt is deterministic (hash of a row-identity
column, not rand()) so replayed micro-batches re-aggregate identically --
a requirement for the streaming at-least-once story.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: aggregate specs the two-phase rewrite knows how to split:
#: partial expression on the salted leg, final expression over partials
_SPLITTABLE = {
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "count": (lambda c: F.count(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_on: str | Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    aggs: output_name -> (agg_fn, input_col), agg_fn in sum/count/min/max.
    ``avg`` is expressible as sum+count composed by the caller.
    salt_on: a column whose hash spreads the hot key's rows (any row-unique
    or near-unique column; NOT rand(), for replay determinism).
    """
    salt = F.pmod(F.xxhash64(F.col(salt_on) if isinstance(salt_on, str) else salt_on),
                  F.lit(n_salts)).alias("__salt")
    partial_exprs = []
    final_exprs = []
    for name, (fn, col) in aggs.items():
        if fn not in _SPLITTABLE:
            raise ValueError(f"salted_agg cannot split {fn!r}")
        partial_fn, final_fn = _SPLITTABLE[fn]
        partial_exprs.append(partial_fn(F.col(col)).alias(f"__p_{name}"))
        final_exprs.append(final_fn(F.col(f"__p_{name}")).alias(name))
    partial = df.groupBy(*key_cols, salt).agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)
