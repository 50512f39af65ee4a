"""Distributed global ordering primitives: exact row_number / running
sums / ntile over a TOTAL order without ever moving the data to a
single partition.

``Window.orderBy`` with no partitionBy is the one pattern Spark itself
warns about ("Moving all data to a single partition"): correct, but at
100x scale the whole per-entity table funnels through ONE task. The
classic fix is two-phase ranking:

1. ``repartitionByRange`` on the total order -- every row in partition i
   sorts before every row in partition i+1 (range exchange, fully
   parallel);
2. rank / running-sum WITHIN each partition (a partitioned window --
   parallel, no warning);
3. collect one tiny row per partition (count + per-column partial sums;
   bounded by the partition count, never the data) and broadcast the
   cumulative offsets back as a literal map keyed by partition id.

``global rank = partition offset + local rank`` is exact whatever the
sampled range boundaries turn out to be, so results are deterministic
and hash-parity with a single-partition oracle holds. The same offsets
give exact global running sums, and ntile(b) is pure arithmetic on the
global rank (SQL ntile semantics: the first ``n_rows mod b`` buckets
take one extra row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"


def attach_global_order(
    df: DataFrame,
    order_cols: list,
    rank_col: str | None = "rk",
    cum_cols: dict | None = None,
    num_partitions: int | None = None,
):
    """Attach an exact global ``row_number`` (``rank_col``) and/or exact
    global running sums (``cum_cols``: {output_name: source_column})
    over the total order ``order_cols`` (Columns with sort direction,
    e.g. ``[F.desc("rev"), F.asc("key")]``), without a single-partition
    window.

    Returns ``(df, stats)`` where ``stats`` is
    ``{"n_rows": int, "totals": {output_name: column_total}}`` -- the
    grand totals fall out of the same tiny per-partition aggregate, so
    callers needing N or a column sum get them without extra jobs.

    The intermediate is ``localCheckpoint``-ed: partition ids must be
    identical between the offsets job and the result plan, and the
    checkpoint also keeps the (often expensive) upstream subplan from
    running twice."""
    cum_cols = cum_cols or {}
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    local = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    out = local.withColumn("__local_rk", F.row_number().over(w))
    for out_name, src in cum_cols.items():
        out = out.withColumn(out_name, F.sum(src).over(wsum))

    aggs = [F.count(F.lit(1)).alias("__cnt")] + [
        F.sum(src).alias(f"__sum_{out_name}") for out_name, src in cum_cols.items()
    ]
    part_stats = sorted(
        local.groupBy(_PID).agg(*aggs).collect(), key=lambda r: r[_PID]
    )

    def _offset_lookup(values_by_pid: dict) -> F.Column:
        # empty input (no partitions collected): a typed zero, because
        # map()[int] does not analyze (VOID key type)
        if not values_by_pid:
            return F.lit(0).cast("bigint")
        pairs = []
        for pid, off in values_by_pid.items():
            pairs.extend((F.lit(pid), F.lit(off)))
        return F.coalesce(F.create_map(*pairs)[F.col(_PID)], F.lit(0))

    rank_offsets, cum_offsets = {}, {name: {} for name in cum_cols}
    acc_n = 0
    acc_sums = {name: 0 for name in cum_cols}
    for row in part_stats:
        rank_offsets[row[_PID]] = acc_n
        acc_n += row["__cnt"]
        for name in cum_cols:
            cum_offsets[name][row[_PID]] = acc_sums[name]
            acc_sums[name] += row[f"__sum_{name}"] or 0

    if rank_col is not None:
        out = out.withColumn(
            rank_col,
            (F.col("__local_rk") + _offset_lookup(rank_offsets)).cast("bigint"),
        )
    for name in cum_cols:
        out = out.withColumn(
            name,
            (F.col(name) + _offset_lookup(cum_offsets[name])).cast("bigint"),
        )
    stats = {"n_rows": acc_n, "totals": dict(acc_sums)}
    return out.drop(_PID, "__local_rk"), stats


def ntile_from_rank(rank_col: str, n_rows: int, buckets: int) -> F.Column:
    """SQL ``ntile(buckets)`` as integer arithmetic on an exact global
    1-based rank: with ``q, r = divmod(n_rows, buckets)``, the first
    ``r`` buckets hold ``q+1`` rows and the rest hold ``q`` -- identical
    tie-splitting to the window function, because the rank already
    encodes the total order (including any tiebreak columns)."""
    q, r = divmod(max(n_rows, 0), buckets)
    if q == 0:
        return F.col(rank_col).cast("bigint")
    big = r * (q + 1)
    # integer ceil-division keeps the whole expression exact
    return (
        F.when(
            F.col(rank_col) <= F.lit(big),
            F.expr(f"({rank_col} + {q}) div {q + 1}"),
        )
        .otherwise(F.expr(f"{r} + (({rank_col} - {big} + {q - 1}) div {q})"))
        .cast("bigint")
    )
