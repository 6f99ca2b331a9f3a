"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force cosine top-k: the embedding table
  is scanned once, the (small) query set is broadcast, ranking is a window
  per query.  The dot product is a codegen'd higher-order ``aggregate`` over
  ``zip_with`` — JVM-side, no Python.
* :func:`ivf_topk` — the scale path: a deterministic coarse quantizer
  (centroid set) partitions vectors into cells; queries probe only their
  own cell.  At 100 TB the vector table is written partitioned by
  ``centroid_id`` so a probe prunes to one partition (partition pruning on
  the scan); here the assignment join demonstrates the same plan.

Outputs are rank-only (query_id, vec_id, rnk): float similarity values are
engine-rounding-sensitive, ranks of random embeddings are not — that is
what the DuckDB oracle pins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Σ a_i·b_i in double precision (left-to-right fold, codegen'd)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def norm2_expr(a: Column) -> Column:
    return F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / F.sqrt(norm2_expr(a) * norm2_expr(b))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "q_embedding",
) -> DataFrame:
    """(query_id, vec_id, rnk): exact top-k by cosine, ties → lower vec_id."""
    pairs = vectors.select(
        F.col(vec_id), _as_double(F.col(vec_col)).alias("_v")
    ).crossJoin(
        F.broadcast(queries.select(F.col(query_id), _as_double(F.col(query_col)).alias("_q")))
    )
    scored = pairs.withColumn("_cos", cosine_expr(F.col("_v"), F.col("_q")))
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, vec_id, "rnk")
    )


def assign_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_col: str = "c_embedding",
) -> DataFrame:
    """(vec_id, centroid_id): nearest centroid by cosine (ties → lower id).
    Centroid side broadcast; one scan of the vector table."""
    pairs = vectors.select(
        F.col(vec_id), _as_double(F.col(vec_col)).alias("_v")
    ).crossJoin(
        F.broadcast(
            centroids.select(F.col(centroid_id), _as_double(F.col(centroid_col)).alias("_c"))
        )
    )
    scored = pairs.withColumn("_cos", cosine_expr(F.col("_v"), F.col("_c")))
    w = Window.partitionBy(vec_id).orderBy(F.col("_cos").desc(), F.col(centroid_id).asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(vec_id, centroid_id)
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    k: int,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    query_id: str = "query_id",
    query_col: str = "q_embedding",
    centroid_id: str = "centroid_id",
    centroid_col: str = "c_embedding",
) -> DataFrame:
    """IVF (single-probe) approximate top-k: search only the query's cell.

    Recall < 1 by design (the oracle encodes the same approximation, so the
    comparison is exact).  nprobe>1 = union over the n nearest centroids.
    """
    v_assign = assign_centroids(vectors, centroids, vec_id, vec_col, centroid_id, centroid_col)
    q_assign = assign_centroids(
        queries, centroids, query_id, query_col, centroid_id, centroid_col
    )
    vecs = vectors.select(F.col(vec_id), _as_double(F.col(vec_col)).alias("_v")).join(
        v_assign, vec_id
    )
    qs = queries.select(F.col(query_id), _as_double(F.col(query_col)).alias("_q")).join(
        q_assign, query_id
    )
    cands = vecs.join(F.broadcast(qs), on=centroid_id, how="inner")
    scored = cands.withColumn("_cos", cosine_expr(F.col("_v"), F.col("_q")))
    w = Window.partitionBy(query_id).orderBy(F.col("_cos").desc(), F.col(vec_id).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id, vec_id, "rnk")
    )
