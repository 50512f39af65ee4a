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
