"""Connected components over a pair/edge stream (dup-family resolution).

A near-dup pair list (MinHash LSH, SimHash, embedding cosine) is a graph;
the unit a training pipeline actually deduplicates is its connected
component (a "dup family"), not the individual pair: A~B and B~C must
collapse to ONE kept document even when A~C was never emitted as a pair.
The reference has no graph surface; this is part of the §2.F
training-data extension mandate.

Algorithm: min-label propagation to fixpoint. Every node starts labeled
with its own id; each round every node takes the min of its label and its
neighbours' labels; stop when a round changes nothing. Converges in
O(diameter) rounds, and each round is one shuffle (groupBy node) over the
edge list -- the standard scalable formulation (GraphX/Pregel does the
same exchange). Labels only ever decrease, so the fixpoint is exactly
"min node id reachable", independent of iteration order -- which is what
makes the result SQL-replayable (the oracle computes min-over-reachable
via a recursive CTE).

At 100 TB the edge list is a tiny fraction of the corpus (near-dup pairs,
not all pairs), so each round's shuffle is cheap; `localCheckpoint`
truncates the growing lineage so round N's plan does not replay rounds
1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve undirected edges to (node, component) with component = min
    reachable node id. Iterates min-label propagation until a fixpoint.

    Returns a DataFrame (node, component) covering every node that appears
    in at least one edge.
    """
    # Undirected: every edge contributes both directions; self-loops are
    # harmless (min(label(v)) includes v's own label anyway).
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("peer"))
    rev = edges.select(F.col(dst).alias("node"), F.col(src).alias("peer"))
    adj = fwd.unionByName(rev).distinct()
    adj = adj.localCheckpoint(eager=True)

    labels = adj.select("node").distinct().withColumn("component", F.col("node"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # neighbour minimum in one shuffle: peers' labels grouped by node
        neigh_min = (
            adj.join(labels.withColumnRenamed("node", "peer"), "peer")
            .groupBy("node")
            .agg(F.min("component").alias("neigh_component"))
        )
        new_labels = (
            labels.join(neigh_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("neigh_component"), F.col("component")),
                ).alias("component"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
    iters: int = 5,
    damping_pct: int = 85,
    scale: int = 1_000_000,
) -> DataFrame:
    """Weighted PageRank with a fixed iteration count in integer
    micro-units, so the result is bit-identical across engines (and
    SQL-replayable as ``iters`` unrolled CTEs).

    Edges are directed; pass both directions for an undirected graph.
    Per iteration each node sends ``floor(rank * w / wdeg)`` along each
    out-edge and collects ``floor(damping_pct * sum(contrib) / 100) +
    (100 - damping_pct) * scale / 100``. The divisions are IEEE-double
    (both Spark and DuckDB divide integers as doubles), exact as long as
    ``rank * w < 2^53`` -- with micro-scale ranks that holds until a
    single token carries ~9e15 micro-rank-weight, far beyond any corpus.

    The rank table is the set of nodes WITH OUT-EDGES (wdeg), retained
    every iteration via a left join -- a node with no in-edges keeps the
    (1-d) base rank instead of silently vanishing, so directed graphs
    with source-only nodes are ranked correctly. Pure sinks (no
    out-edges) are outside the node set by construction; pass both edge
    directions if every endpoint must be ranked (undirected usage).

    One shuffle per iteration (groupBy dst); the edge list is cached and
    ``localCheckpoint`` keeps the loop's lineage flat, the same shape as
    :func:`connected_components`. Returns (node, rank_micro, wdeg).
    """
    base = (1_00 - damping_pct) * scale // 100
    wdeg = edges.groupBy(src).agg(F.sum(weight).alias("wdeg"))
    out = (
        edges.join(wdeg, src)
        .select(
            F.col(src).alias("_src"),
            F.col(dst).alias("_dst"),
            F.col(weight).alias("_w"),
            "wdeg",
        )
        .localCheckpoint(eager=True)
    )
    ranks = wdeg.select(
        F.col(src).alias("_node"), F.lit(scale).cast("bigint").alias("rank")
    )
    nodes = wdeg.select(F.col(src).alias("_node")).localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (
            out.join(ranks, out["_src"] == ranks["_node"])
            .withColumn(
                "c", F.floor(F.col("rank") * F.col("_w") / F.col("wdeg"))
            )
            .groupBy("_dst")
            .agg(F.sum("c").alias("csum"))
        )
        # left join keeps source-only nodes (no in-edges) at the base rank
        ranks = (
            nodes.join(contrib, nodes["_node"] == contrib["_dst"], "left")
            .select(
                "_node",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(damping_pct)
                        * F.coalesce(F.col("csum"), F.lit(0))
                        / F.lit(100)
                    )
                )
                .cast("bigint")
                .alias("rank"),
            )
        )
        ranks = ranks.localCheckpoint(eager=True)
    return ranks.join(wdeg, ranks["_node"] == wdeg[src]).select(
        F.col("_node").alias("node"),
        F.col("rank").alias("rank_micro"),
        F.col("wdeg").cast("bigint").alias("wdeg"),
    )
