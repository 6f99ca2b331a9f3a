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


def embedding_neardup_pairs(
    vectors: DataFrame,
    planes: DataFrame,
    threshold: float = 0.99,
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    plane_id: str = "plane_id",
    plane_col: str = "p_embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs with random-hyperplane LSH
    blocking: bucket = sign bits of the dot product against each plane
    (identical vectors always share a bucket), candidate pairs form only
    inside a bucket, exact cosine refines.

    Scale shape: one scan buckets every vector (planes broadcast), the
    self-join shuffles on the bucket id (2^n_planes keys), and the cosine
    refine runs only on in-bucket pairs — the same
    block→join→refine decomposition as the spatial PIP join."""
    b = (
        vectors.select(F.col(vec_id).alias("_id"), _as_double(F.col(vec_col)).alias("_e"))
        .crossJoin(
            F.broadcast(
                planes.select(F.col(plane_id).alias("_pid"), _as_double(F.col(plane_col)).alias("_pe"))
            )
        )
        .withColumn("_dot", dot_expr(F.col("_e"), F.col("_pe")))
        .groupBy("_id")
        .agg(
            F.sum(
                # SQL shiftleft: the python wrapper only takes literal shift
                # amounts, the SQL function shifts by a column
                F.when(F.col("_dot") > 0, F.expr("shiftleft(1, CAST(_pid AS INT))")).otherwise(
                    F.lit(0)
                )
            ).alias("_bucket")
        )
    )
    left = b.select(F.col("_id").alias("id_a"), "_bucket")
    right = b.select(F.col("_id").alias("id_b"), "_bucket")
    pairs = left.join(right, "_bucket").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b")
    va = vectors.select(F.col(vec_id).alias("id_a"), _as_double(F.col(vec_col)).alias("_ea"))
    vb = vectors.select(F.col(vec_id).alias("id_b"), _as_double(F.col(vec_col)).alias("_eb"))
    scored = pairs.join(va, "id_a").join(vb, "id_b").withColumn(
        "_cos", cosine_expr(F.col("_ea"), F.col("_eb"))
    )
    return scored.filter(F.col("_cos") >= threshold).select("id_a", "id_b")


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
