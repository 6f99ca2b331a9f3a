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


def _sql_lit(v) -> str:
    """SQL literal for VALUES row rebuilds (int/float/str/None)."""
    import math

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"  # repr round-trips finite IEEE doubles
    if isinstance(v, int):
        return str(v)
    # Spark SQL string literals process backslash escapes — double them
    # BEFORE quote-doubling so '\n' stays two characters
    return "'" + str(v).replace("\\", "\\\\").replace("'", "''") + "'"


def _values_df(spark, rows, colnames, casts=None) -> DataFrame:
    """Small driver-side row set → DataFrame via a VALUES literal (measured
    orders faster than createDataFrame on this stack, CLAUDE.md)."""
    body = ",\n".join("(" + ", ".join(_sql_lit(v) for v in r) + ")" for r in rows)
    df = spark.sql(f"SELECT * FROM VALUES {body} AS t({', '.join(colnames)})")
    if casts:
        df = df.select(
            *[F.col(c).cast(t).alias(c) if t else F.col(c) for c, t in zip(colnames, casts)]
        )
    return df


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
    est_res: int = None,
) -> DataFrame:
    """Expanding-ring kNN: exact results, ≤2 Spark jobs in the common case.

    The point side is cell-indexed once (codegen'd Morton twin) and cached;
    ONE aggregation builds a coarse occupancy histogram (≤ 4^est_res rows,
    est_res = min(res, 7) so it always collects) whose driver-side
    summed-area table prices each query's starting radius exactly: the
    smallest coarse ring holding ≥ k points, converted conservatively to
    fine-res cells, so round 1 is guaranteed ≥ k candidates.  Each round is
    a single job — ring join + window top-k — whose result (≤ k·n_queries
    rows, small by the same contract that makes the query side
    broadcast-small) is collected for loop control; a query finishes when
    its k-th distance fits inside the covered radius (kth ≤ r·min_dim ⇒ no
    unexplored cell holds a closer point), otherwise its next radius is
    ceil(kth/min_dim), which terminates it the following round.  Queries
    still pending after ``max_rounds`` fall back to brute force
    (correctness is never sacrificed).

    Resource hygiene (r1 verdict item 7): the only persisted frame is the
    cell index, unpersisted before return; loop state lives driver-side so
    no per-round persists/checkpoints accumulate and no ``isin`` chains
    bloat the plan.  The returned frame is rebuilt from the collected rows
    via a VALUES literal — result size is k·n_queries by contract.
    """
    spark = points.sparkSession
    n_side = 1 << res
    cell_w = 360.0 / n_side
    cell_h = 180.0 / n_side
    min_dim = min(cell_w, cell_h)
    e_res = min(res, 7) if est_res is None else est_res
    shift = res - e_res

    q_rows = queries.select(query_id, q_lon, q_lat).collect()
    out_schema = (
        f"{query_id} {queries.schema[query_id].dataType.simpleString()}, "
        f"{point_id} {points.schema[point_id].dataType.simpleString()}, "
        "dist2 double, rank int"
    )
    if not q_rows:
        return spark.createDataFrame([], out_schema)

    pts = points.withColumn(
        "_pcell", C.cell_id_col(F.col(lon_col), F.col(lat_col), res)
    ).persist()

    # --- job 1: coarse occupancy histogram (also warms the cell index) ---
    hist = (
        pts.groupBy(C.cell_id_col(F.col(lon_col), F.col(lat_col), e_res).alias("_ec"))
        .count()
        .collect()
    )
    n_e = 1 << e_res
    grid = np.zeros((n_e, n_e), dtype=np.int64)
    _, hix, hiy = C.decode_cell(np.array([r["_ec"] for r in hist], dtype=np.int64))
    grid[hix, hiy] = [r["count"] for r in hist]
    total = int(grid.sum())
    # summed-area table: ring population queries in O(1)
    sat = np.zeros((n_e + 1, n_e + 1), dtype=np.int64)
    sat[1:, 1:] = grid.cumsum(0).cumsum(1)

    def ring_pop(ix: int, iy: int, r: int) -> int:
        x0, x1 = max(ix - r, 0), min(ix + r, n_e - 1)
        y0, y1 = max(iy - r, 0), min(iy + r, n_e - 1)
        return int(sat[x1 + 1, y1 + 1] - sat[x0, y1 + 1] - sat[x1 + 1, y0] + sat[x0, y0])

    def r0_fine(lon: float, lat: float) -> int:
        ix, iy = C.lonlat_to_ixiy(np.array([lon]), np.array([lat]), e_res)
        ix, iy = int(ix[0]), int(iy[0])
        r_e = 0
        while ring_pop(ix, iy, r_e) < k and r_e < n_e:
            r_e += 1
        # the fine ring of radius (r_e+1)<<shift fully contains the coarse
        # ring of radius r_e around any point of the query's coarse cell
        return max(1, (r_e + 1) << shift)

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

    out_rows: list = []
    # fewer points than k: ring search degenerates, brute is exact + cheap
    pend = (
        []
        if total < k
        else [[r[0], float(r[1]), float(r[2]), r0_fine(float(r[1]), float(r[2]))] for r in q_rows]
    )
    fallback_ids = [] if total >= k else [r[0] for r in q_rows]

    for _ in range(max_rounds):
        if not pend:
            break
        pend_df = _values_df(
            spark,
            pend,
            [query_id, q_lon, q_lat, "_r"],
            casts=[queries.schema[query_id].dataType.simpleString(), "double", "double", "int"],
        )
        cand_cells = pend_df.withColumn(
            "_qcell", F.explode(ring_cells(F.col(q_lon), F.col(q_lat), F.col("_r")))
        )
        cands = cand_cells.join(
            pts, cand_cells["_qcell"] == pts["_pcell"], "inner"
        ).withColumn(
            "dist2", dist2_col(F.col(lon_col), F.col(lat_col), F.col(q_lon), F.col(q_lat))
        )
        w = Window.partitionBy(query_id).orderBy(F.col("dist2").asc(), F.col(point_id).asc())
        got = (
            cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id, point_id, "dist2", "rank")
            .collect()  # the round's ONE job; ≤ k·n_pending rows
        )
        by_q: dict = {}
        for row in got:
            by_q.setdefault(row[0], []).append(row)
        nxt = []
        for qid, qlon, qlat, r in pend:
            rows = by_q.get(qid, [])
            kth = max((row["dist2"] for row in rows), default=float("inf"))
            if len(rows) >= k and kth <= (r * min_dim) ** 2:
                out_rows.extend(tuple(row) for row in rows)
            elif len(rows) >= k:
                # kth is an upper bound on the true k-th distance: a ring of
                # ceil(kth/min_dim) provably covers it -> terminates next round
                nxt.append([qid, qlon, qlat, int(np.ceil(np.sqrt(kth) / min_dim))])
            else:
                nxt.append([qid, qlon, qlat, min(r * 2, n_side)])
        pend = nxt

    if pend:
        fallback_ids.extend(p[0] for p in pend)
    pts.unpersist()

    if fallback_ids:
        fb_q = queries.join(
            F.broadcast(_values_df(spark, [[i] for i in fallback_ids], [query_id])),
            query_id,
            "left_semi",
        )
        out_rows.extend(
            tuple(row)
            for row in knn_bruteforce(
                points, fb_q, k, point_id, query_id, lon_col, lat_col, q_lon, q_lat
            ).collect()
        )

    if not out_rows:
        return spark.createDataFrame([], out_schema)
    return _values_df(
        spark,
        out_rows,
        [query_id, point_id, "dist2", "rank"],
        casts=[
            queries.schema[query_id].dataType.simpleString(),
            points.schema[point_id].dataType.simpleString(),
            "double",
            "int",
        ],
    )


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 6,
    point_id: str = "point_id",
    query_id: str = "query_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    q_lon: str = "q_lon",
    q_lat: str = "q_lat",
) -> DataFrame:
    """Distributed kNN JOIN — both sides big (the variant
    :func:`knn_bruteforce` (small-query broadcast) and :func:`knn_cells`
    (driver loop over a small query set) don't cover): every query row gets
    its exact k nearest points, with no driver-side per-query state.

    Exactly TWO distributed passes:

    1. One aggregation builds the cell occupancy histogram (≤ 4^res rows —
       collectable by construction for res ≤ 8); a driver-side summed-area
       table prices, PER CELL, the minimal Chebyshev radius whose ring
       holds ≥ k points (one vectorized whole-grid pass per radius).  The
       radius grid (≤512 KB) rides the ring UDF's closure; each query looks
       up its start radius map-side, explodes its ring, joins the point
       index, and window-ranks — guaranteed ≥ k candidates per query.
    2. Rows whose top-k is not yet PROVEN (kth > r·min_dim coverage bound)
       re-run once with r = ceil(kth/min_dim) — sufficient by construction
       (the round-1 kth is an upper bound on the true kth distance), so
       pass 2 terminates every query.  Typically a small minority of
       queries (those near cell boundaries/sparse regions) reach pass 2.

    Output: (query_id, point_id, dist2, rank).  The only non-DataFrame
    state is the ≤4^res histogram — everything else shuffles on cell keys.
    """
    if res > 8:
        raise ValueError("knn_join histogram is exact up to res 8 (4^res cells)")
    n_side = 1 << res
    min_dim = min(360.0 / n_side, 180.0 / n_side)

    pts = points.withColumn(
        "_pcell", C.cell_id_col(F.col(lon_col), F.col(lat_col), res)
    ).persist()

    # pass-0 agg: histogram → per-cell start radius (driver SAT, tiny)
    hist = pts.groupBy("_pcell").count().collect()
    grid = np.zeros((n_side, n_side), dtype=np.int64)
    _, hix, hiy = C.decode_cell(np.array([r["_pcell"] for r in hist], dtype=np.int64))
    grid[hix, hiy] = [r["count"] for r in hist]
    sat = np.zeros((n_side + 1, n_side + 1), dtype=np.int64)
    sat[1:, 1:] = grid.cumsum(0).cumsum(1)

    def ring_pop(ix, iy, r):
        x0, x1 = max(ix - r, 0), min(ix + r, n_side - 1)
        y0, y1 = max(iy - r, 0), min(iy + r, n_side - 1)
        return int(sat[x1 + 1, y1 + 1] - sat[x0, y1 + 1] - sat[x1 + 1, y0] + sat[x0, y0])

    total = int(grid.sum())
    if total < k:
        # degenerate: fewer points than k — single global ring covers all
        r_of = np.full((n_side, n_side), n_side, dtype=np.int64)
    else:
        # whole-grid radius pricing: one vectorized SAT pass per radius,
        # assigning each cell the first r whose ring holds >= k points.
        # The grid (n_side² int64, ≤512 KB at res 8) rides the UDF closure
        # — no broadcast join, no VALUES parse.
        gx, gy = np.meshgrid(np.arange(n_side), np.arange(n_side), indexing="ij")
        r_of = np.full((n_side, n_side), -1, dtype=np.int64)
        for r in range(n_side + 1):
            x0 = np.clip(gx - r, 0, n_side - 1)
            x1 = np.clip(gx + r, 0, n_side - 1)
            y0 = np.clip(gy - r, 0, n_side - 1)
            y1 = np.clip(gy + r, 0, n_side - 1)
            pop = sat[x1 + 1, y1 + 1] - sat[x0, y1 + 1] - sat[x1 + 1, y0] + sat[x0, y0]
            newly = (r_of < 0) & (pop >= k)
            r_of[newly] = r
            if (r_of >= 0).all():
                break
        r_of[r_of < 0] = n_side

    @F.pandas_udf("int")
    def radius_of(lon: pd.Series, lat: pd.Series) -> pd.Series:
        ix, iy = C.lonlat_to_ixiy(lon.to_numpy(np.float64), lat.to_numpy(np.float64), res)
        return pd.Series(np.maximum(1, r_of[ix, iy]).astype(np.int32))

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

    def ranked_pass(qs: DataFrame) -> DataFrame:
        """qs must carry (_r) per row; returns top-k + per-query stats."""
        cand = qs.withColumn(
            "_qcell", F.explode(ring_cells(F.col(q_lon), F.col(q_lat), F.col("_r")))
        ).join(pts, F.col("_qcell") == pts["_pcell"], "inner").withColumn(
            "dist2", dist2_col(F.col(lon_col), F.col(lat_col), F.col(q_lon), F.col(q_lat))
        )
        w = Window.partitionBy(query_id).orderBy(F.col("dist2").asc(), F.col(point_id).asc())
        wq = Window.partitionBy(query_id)
        return (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .withColumn("_n", F.count(F.lit(1)).over(wq))
            .withColumn("_kth", F.max("dist2").over(wq))
            .select(query_id, point_id, "dist2", "rank", q_lon, q_lat, "_r", "_n", "_kth")
        )

    base_q = queries.select(query_id, q_lon, q_lat)
    q1 = base_q.withColumn("_r", radius_of(F.col(q_lon), F.col(q_lat)))

    pass1 = ranked_pass(q1).localCheckpoint(eager=True)  # output-sized
    if total < k:
        # degenerate: pass 1 ran at r = n_side and saw EVERY point — the
        # _n >= k guarantee can never hold, and a pass 2 at ceil(kth/dim)
        # would SHRINK the ring and drop rows.  pass 1 is already complete.
        pts.unpersist()
        return pass1.select(query_id, point_id, "dist2", "rank")
    proven = (F.col("_n") >= k) & (
        F.col("_kth") <= (F.col("_r") * F.lit(min_dim)) * (F.col("_r") * F.lit(min_dim))
    )
    done1 = pass1.filter(proven)

    # pass 2: re-run ONLY the unproven queries at the radius their own
    # round-1 kth bounds — sufficient, so no further passes are needed
    redo = (
        pass1.filter(~proven)
        .select(query_id, q_lon, q_lat, "_kth")
        .distinct()
        .withColumn(
            "_r",
            F.greatest(
                F.lit(1), F.ceil(F.sqrt(F.col("_kth")) / F.lit(min_dim)).cast("int")
            ),
        )
        .drop("_kth")
    )
    done2 = ranked_pass(redo)

    out_cols = [query_id, point_id, "dist2", "rank"]
    result = (
        done1.select(*out_cols)
        .unionByName(done2.select(*out_cols))
        .localCheckpoint(eager=True)  # output-sized; frees the cell index
    )
    pts.unpersist()
    return result
