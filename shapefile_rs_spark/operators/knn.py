"""kNN operators (K1): brute-force window top-k and expanding-ring search.

* :func:`knn_bruteforce` — exact top-k via broadcast cross join + window
  rank.  The right tool when the query side is small (the usual "snap pages
  to the nearest N city centers" shape): the big point side is scanned once,
  never shuffled beyond the final per-query rank.
* :func:`knn_cells` — the north_star "expanding ring search": points are
  indexed once at a cell resolution; each round joins the still-unsatisfied
  queries against a k-ring of cells, doubling the radius until the k-th
  neighbor distance is provably inside the explored ring
  (``kth_dist <= r * min_cell_dim`` ⇒ no unexplored cell can hold a closer
  point).  Data-dependent iteration is a bounded DRIVER loop over whole
  DataFrames — no per-row Python (input_hint).

Distance metric: planar squared euclidean on (lon, lat) — consistent with
the cell metric (FIXTURES.md §4).
"""

from __future__ import annotations


import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from .. import cells as C


def dist2_col(lon1, lat1, lon2, lat2):
    """Squared planar distance as a Catalyst expression (codegen'd JVM-side);
    the SQL oracle spells the identical arithmetic."""
    return (lon1 - lon2) * (lon1 - lon2) + (lat1 - lat2) * (lat1 - lat2)


def knn_bruteforce(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    point_id: str = "point_id",
    query_id: str = "query_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
) -> DataFrame:
    """(query_id, point_id, dist2, rank) — exact; queries side broadcast.

    Ties break on point id so results are deterministic (and match the SQL
    oracle's ORDER BY dist2, point_id)."""
    pairs = points.crossJoin(F.broadcast(queries))
    with_d = pairs.withColumn(
        "dist2", dist2_col(F.col(lon_col), F.col(lat_col), F.col(q_lon), F.col(q_lat))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dist2").asc(), F.col(point_id).asc())
    return (
        with_d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, point_id, "dist2", "rank")
    )


def knn_cells(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 8,
    point_id: str = "point_id",
    query_id: str = "query_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
    max_rounds: int = 8,
) -> DataFrame:
    """Expanding-ring kNN: exact results, bounded rounds.

    Each round r explores the Chebyshev cell ring of radius r around every
    unsatisfied query.  A query finishes when it has ≥k candidates whose
    k-th distance fits inside the guaranteed-covered radius.  Queries still
    unsatisfied after ``max_rounds`` fall back to brute force (correctness
    is never sacrificed; the fallback set is tiny in practice).
    """
    spark = points.sparkSession
    cell_w = 360.0 / (1 << res)
    cell_h = 180.0 / (1 << res)
    min_dim = min(cell_w, cell_h)

    @F.pandas_udf(ArrayType(LongType()))
    def ring_cells(lon: pd.Series, lat: pd.Series, radius: pd.Series) -> pd.Series:
        out = []
        lon_v = lon.to_numpy(np.float64)
        lat_v = lat.to_numpy(np.float64)
        rad_v = radius.to_numpy()
        base = C.cell_id(lon_v, lat_v, res)
        for i in range(len(lon_v)):
            out.append(C.k_ring(int(base[i]), int(rad_v[i])).tolist())
        return pd.Series(out)

    # big side indexed JVM-side (codegen'd Morton twin — no Python pass)
    pts = points.withColumn(
        "_pcell", C.cell_id_col(F.col(lon_col), F.col(lat_col), res)
    ).persist()
    # the query side is small by contract (it is the broadcast side of every
    # round); its ids live on the driver so loop control costs zero jobs
    pending = queries.persist()
    pending_n = pending.count()
    done_parts = []
    r = 1
    for _ in range(max_rounds):
        if pending_n == 0:
            break
        cand_cells = pending.withColumn(
            "_qcell", F.explode(ring_cells(F.col(q_lon), F.col(q_lat), F.lit(r)))
        )
        cands = cand_cells.join(
            pts, cand_cells["_qcell"] == pts["_pcell"], "inner"
        ).withColumn("dist2", dist2_col(F.col(lon_col), F.col(lat_col), F.col(q_lon), F.col(q_lat)))
        w = Window.partitionBy(query_id).orderBy(F.col("dist2").asc(), F.col(point_id).asc())
        ranked = (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, point_id, "dist2", "rank")
            .persist()
        )
        # a query is satisfied when its k-th neighbor provably cannot be
        # beaten by any cell outside the explored ring
        guarantee = float((r * min_dim) ** 2)
        stats = ranked.groupBy(query_id).agg(
            F.count(F.lit(1)).alias("_n"), F.max("dist2").alias("_kth")
        )
        sat_ids = [
            row[query_id]
            for row in stats.filter(
                (F.col("_n") >= k) & (F.col("_kth") <= F.lit(guarantee))
            ).collect()
        ]
        if sat_ids:
            done_parts.append(ranked.filter(F.col(query_id).isin(sat_ids)))
            pending = pending.filter(~F.col(query_id).isin(sat_ids)).persist()
            pending_n -= len(sat_ids)
        r *= 2

    result = done_parts[0] if done_parts else None
    for part in done_parts[1:]:
        result = result.unionByName(part)
    if pending_n > 0:
        fallback = knn_bruteforce(
            points, pending, k, point_id, query_id, lon_col, lat_col, q_lon, q_lat
        )
        result = fallback if result is None else result.unionByName(fallback)
    return result
