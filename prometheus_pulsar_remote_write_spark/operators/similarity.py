"""Similarity search over embedding columns (SURVEY.md §2.F F3).

Brute-force cosine top-k as the exact baseline, and an IVF-style
(inverted-file) variant as the 100 TB scale path.

Scale notes:
  - brute force is a broadcast nested-loop: fine when the *query* side is
    small (it's broadcast); cost is one scan of the corpus per batch of
    queries, fully parallel, no shuffle of the corpus.
  - IVF assigns every vector to its nearest centroid once (one broadcast
    pass + one write partitioned by cell), then probes only nprobe cells
    per query: corpus scan shrinks by ~n_cells/nprobe. Centroid choice
    here is deterministic (first-k vectors) rather than trained k-means --
    the partition/probe machinery is the operator under test; swapping in
    trained centroids is a drop-in.
  - dot products run through F.zip_with/F.aggregate (JVM, codegen); no
    Python in the per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Double-precision dot product of two float arrays, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force).

    queries is broadcast (small side); ties break on corpus id so results
    are total-ordered and reproducible. Self-matches are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(F.col(id_col).alias("match_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.join(F.broadcast(q), F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(cosine_expr(F.col("query_vec"), F.col("vec")), round_to).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (one broadcast pass).

    Returns (id, vec, cell). At scale, persist this partitioned by cell so
    probes prune at the file level.
    """
    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).join(F.broadcast(cent))
    w = Window.partitionBy(id_col).orderBy(
        F.desc(F.round(cosine_expr(F.col(vec_col), F.col("cent_vec")), 9)), F.asc("cell")
    )
    return (
        scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select(id_col, vec_col, "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 8,
    nprobe: int = 2,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 4,
) -> DataFrame:
    """Approximate top-k: probe only the nprobe nearest cells per query.

    Deterministic centroids: the n_cells lowest-id corpus vectors. Recall
    vs the brute-force baseline is asserted in tests.
    """
    centroids = corpus.orderBy(id_col).limit(n_cells)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    probe_w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(cosine_expr(F.col("query_vec"), F.col("cent_vec")), 9)),
        F.asc("cell"),
    )
    probes = (
        q.join(F.broadcast(cent))
        .withColumn("__r", F.row_number().over(probe_w))
        .filter(F.col("__r") <= nprobe)
        .select("query_id", "query_vec", "cell")
    )

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("match_id"),
            F.round(cosine_expr(F.col("query_vec"), F.col(vec_col)), round_to).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "match_id", "cosine", "rank")
    )
