"""As-of (point-in-time) join -- a time-series operator Spark lacks as a
built-in (reference scope: the engine extension surface, SURVEY.md §2.F).

``asof_join(left, right)`` attaches, to every left row, the latest right
row with the same key whose time is <= the left row's time ("backward"
direction, inclusive -- the common financial/attribution semantics, and
what DuckDB's ``ASOF JOIN ... ON l.t >= r.t`` implements, which is the
oracle used by the driver harness).

Plan shape (the scale path): expressing this as an inequality join would
make Catalyst fall back to BroadcastNestedLoopJoin -- O(|L| x |R|) per
key. Instead both sides are union-tagged and sorted once per key:

    union(left + right) -> hash-shuffle on key -> sort by (time, tag)
    -> running last(right_attrs, ignorenulls) -> keep left rows

i.e. exactly one shuffle of |L| + |R| rows and a per-partition sort --
the same cost as a sort-merge join, independent of match fan-out. Ties
(left.time == right.time) resolve to the right row because the right tag
sorts first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_cols: list[str],
    how: str = "inner",
) -> DataFrame:
    """Backward-inclusive as-of join; keeps all left columns and attaches
    ``right_cols`` from the matched right row (NULLs when ``how='left'``
    and no right row precedes the left time).

    The right side should be unique per (key, time); pre-dedupe it if
    ties are possible, or the matched attributes are nondeterministic.
    """
    assert how in ("inner", "left")
    left_cols = left.columns
    r_struct = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    r_tagged = right.select(
        *on, F.col(right_time).alias("__t"), F.lit(0).alias("__is_left"), r_struct
    )
    r_type = r_tagged.schema["__r"].dataType
    l_tagged = left.select(
        *left_cols,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_type).alias("__r"),
    )
    # align schemas: left carries its full row, right carries only key+time
    for c in left_cols:
        if c not in on:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    kept = matched.filter(F.col("__is_left") == 1)
    if how == "inner":
        # filter on the matched STRUCT, not an attribute: a right row whose
        # attribute is legitimately NULL must still count as a match
        kept = kept.filter(F.col("__m").isNotNull())
    return kept.select(*left_cols, *[F.col("__m")[c].alias(c) for c in right_cols])


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Banded range join: all (left, right) pairs with the same key and
    ``lower_s <= right_time - left_time <= upper_s`` (seconds).

    A raw inequality join degenerates to BroadcastNestedLoopJoin. Instead
    each right row lands in one time bucket of width (upper-lower), each
    left row probes the two buckets its admissible window can overlap,
    and the exact predicate filters after an EQUI-join on (key, bucket) --
    a hash join whose cost tracks the true match count, not |L| x |R|.
    """
    width = max(upper_s - lower_s, 1)
    lt = F.unix_timestamp(F.col(left_time))
    rt = F.unix_timestamp(F.col(right_time))
    r_b = right.withColumn("__bucket", F.floor(rt / width))
    l_b = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor((lt + lower_s) / width), F.floor((lt + upper_s) / width)
            )
        ),
    )
    joined = l_b.join(r_b, on + ["__bucket"]).drop("__bucket")
    delta = F.unix_timestamp(F.col(right_time)) - F.unix_timestamp(F.col(left_time))
    return joined.filter((delta >= lower_s) & (delta <= upper_s))
