"""Bench harness — prints ONE JSON line with per-query seconds.

Headline queries run at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1)
on ``local[$SPARK_GRAFT_CPUS]``.  The flagship throughput number is the full
page pipeline (synthesize html pages from lineitem keys → parse geotags →
cell-index → PIP join vs the demo polygons → count), reported as pages/sec.

Extras:
* ``SPARK_GRAFT_SCALING=1`` also runs the flagship at local[8] vs local[32]
  on the same input and reports throughput at both plus scaling efficiency
  (the sandbox proxy for N vs 4N executors mandated by BASELINE.md).
* ``SPARK_GRAFT_BENCH_QUERIES=q1,q2`` restricts the query set.
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def flagship_pipeline(spark, sf_dir):
    """lineitem keys → synthetic pages → geotag parse → PIP join →
    tile assignment → per-tile/polygon counts (the north-rule metric is
    spatial-join + tile-assignment throughput, so both stages are inside
    the measured job)."""
    from pyspark.sql import functions as F

    from shapefile_rs_spark import demo
    from shapefile_rs_spark.operators.spatial_join import point_in_polygon_join
    from shapefile_rs_spark.operators.tiles import tile_aggregate
    from shapefile_rs_spark.pages import geotag_pages, synth_pages_from_ids

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ids = lineitem.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("page_id")
    )
    pages = geotag_pages(synth_pages_from_ids(ids))
    joined = point_in_polygon_join(
        pages.select("doc_id", "lon", "lat"),
        demo.oracle_polygons_df(spark),
        point_cols=["doc_id", "lon", "lat"],
        polygon_cols=["polygon_id"],
        broadcast_polygons=True,
    )
    return tile_aggregate(
        joined,
        z=6,
        aggs=[
            F.count(F.lit(1)).alias("n_pages"),
            F.count_distinct("polygon_id").alias("n_polygons"),
        ],
    )


def run_queries(spark, sf_dir, names=None, repeats: Optional[int] = None):
    """Per-query wall time, MIN of ``repeats`` runs: the first execution of
    a plan pays JVM JIT + python-worker + allocator warm-up (measured 5-15s
    on this host vs 1-3s steady-state); min-of-k is the standard
    noise-robust estimator (CLAUDE.md host-noise notes)."""
    import __spark_entry__ as E

    import gc

    if repeats is None:
        # env override for noisy-host windows (min-of-k rescues spot noise,
        # not a uniformly degraded phase — see host_control_sec)
        repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    qs = E.queries()
    times = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        best = float("inf")
        for _ in range(repeats):
            t0 = time.time()
            # noop sink materializes EVERY column — .count() would let
            # Catalyst prune map-only projections and time the bare scan
            # (the CLAUDE.md profiling rule)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[name] = round(best, 3)
        # drop the query's frames NOW: localCheckpoint/persist blocks are
        # freed by ContextCleaner only after the python refs die, and 25
        # queries of lazily-retained blocks measurably degrade later
        # queries on this memory-sensitive host
        gc.collect()
    return times


def time_flagship(spark, sf_dir):
    t0 = time.time()
    rows = flagship_pipeline(spark, sf_dir).collect()
    dt = time.time() - t0
    return dt, rows


def codec_microbench(n_records: int = 200_000) -> dict:
    """Single-threaded shapefile codec throughput (the reference is a
    decode/encode library, so this is the apples-to-apples single-node
    number): write then read an n-record point file + a multipart polyline
    file, report records/sec and MB/sec for decode."""
    import numpy as np

    from shapefile_rs_spark.shapelib.shp import ShapeRec, read_shp, write_shp
    from shapefile_rs_spark.shapelib.shptypes import POINT, POLYLINE

    from shapefile_rs_spark.geom.wkb import points_wkb_bulk
    from shapefile_rs_spark.shapelib.shp import read_points_xy

    rng = np.random.default_rng(11)
    pts = [ShapeRec(POINT, rng.uniform(-180, 180, (1, 2))) for _ in range(n_records)]
    shp, shx = write_shp(pts)
    t0 = time.time()
    _, recs, _ = read_shp(shp, shx=shx)
    dt = time.time() - t0
    t0 = time.time()
    _, xy = read_points_xy(shp, shx)
    points_wkb_bulk(xy)
    dt_bulk = time.time() - t0
    out = {
        "point_records": n_records,
        "point_decode_sec": round(dt, 3),
        "point_rec_per_sec": round(n_records / dt, 1),
        "point_mb_per_sec": round(len(shp) / dt / 1e6, 1),
        "point_bulk_decode_sec": round(dt_bulk, 4),
        "point_bulk_rec_per_sec": round(n_records / dt_bulk, 1),
        "point_bulk_mb_per_sec": round(len(shp) / dt_bulk / 1e6, 1),
    }
    from shapefile_rs_spark.geom.wkb import multilinestrings_wkb_bulk
    from shapefile_rs_spark.shapelib.shp import read_shp_bulk

    lines = [
        ShapeRec(POLYLINE, rng.uniform(-180, 180, (40, 2)), parts=[0, 20])
        for _ in range(n_records // 20)
    ]
    shp2, shx2 = write_shp(lines)
    read_shp_bulk(shp2, shx2)  # warm the allocator (first-touch page faults
    # on this host cost seconds; executors are long-lived, so warm is the
    # representative state — see CLAUDE.md noise notes)
    t0 = time.time()
    read_shp(shp2, shx=shx2)  # ShapeRec-materializing API path
    dt2 = time.time() - t0
    t0 = time.time()
    b = read_shp_bulk(shp2, shx2)  # SoA path the Spark source runs
    dt2b = time.time() - t0
    t0 = time.time()
    multilinestrings_wkb_bulk(b.xy, b.point_offsets, b.parts, b.part_offsets)
    dt2w = time.time() - t0
    out.update(
        {
            "polyline_records": len(lines),
            "polyline_decode_sec": round(dt2, 3),
            "polyline_mb_per_sec": round(len(shp2) / dt2 / 1e6, 1),
            "polyline_bulk_decode_sec": round(dt2b, 4),
            "polyline_bulk_mb_per_sec": round(len(shp2) / dt2b / 1e6, 1),
            "polyline_bulk_wkb_sec": round(dt2w, 4),
        }
    )
    return out


def ann_microbench(spark, n: int = 200_000, d: int = 64, nq: int = 4, k: int = 5) -> dict:
    """Vectorized-vs-interpreted ANN scoring at a scale where the plan (not
    job overhead) dominates: the sf0.1 embeddings table is only 2k rows, so
    the headline ann_* queries measure scheduling.  Here a 200k×64 synthetic
    table is scored by (a) the round-1 plan — crossJoin + interpreted HOF
    cosine + full N×q window shuffle — and (b) cosine_topk's scan-side
    numpy partial top-k.  Both must return the identical rank set."""
    import numpy as np
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from shapefile_rs_spark.operators.similarity import cosine_expr, cosine_topk

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 7)
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": list(rng.normal(size=(len(ids), d)))}
            )

    vecs = spark.range(0, n, 1, 32).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    ).persist()
    vecs.count()
    queries = vecs.filter(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )

    def hof_plan():
        pairs = vecs.crossJoin(F.broadcast(queries))
        scored = pairs.withColumn(
            "_cos", cosine_expr(F.col("embedding"), F.col("q_embedding"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("_cos").desc(), F.col("vec_id").asc()
        )
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .select("query_id", "vec_id", "rnk")
        )

    want = {tuple(r) for r in hof_plan().collect()}
    got = {tuple(r) for r in cosine_topk(vecs, queries, k=k).collect()}
    assert got == want, "vectorized top-k diverged from the expression plan"

    t_hof = min(_timed(hof_plan) for _ in range(2))
    t_vec = min(_timed(lambda: cosine_topk(vecs, queries, k=k)) for _ in range(2))
    vecs.unpersist()
    return {
        "rows": n,
        "dim": d,
        "queries": nq,
        "hof_crossjoin_sec": round(t_hof, 3),
        "vectorized_topk_sec": round(t_vec, 3),
        "speedup": round(t_hof / t_vec, 2),
    }


def _lsh_buckets(spark) -> dict:
    import __spark_entry__ as E

    return E.lsh_bucket_report(spark, SF_DIR)


def _host_control(n: int = 4_000_000) -> float:
    """Fixed SINGLE-thread numpy workload (~0.3 s healthy): sort, which
    BLAS cannot parallelize (a matmul control read 9 ms — OpenBLAS used
    all 32 threads)."""
    import numpy as np

    a = np.random.default_rng(5).normal(size=n)
    t0 = time.time()
    np.sort(a)
    return round(time.time() - t0, 4)


def _timed(plan_fn) -> float:
    t0 = time.time()
    plan_fn().count()
    return time.time() - t0


def main():
    from shapefile_rs_spark.session import get_spark

    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    only = set(only.split(",")) if only else None
    scale_only = os.environ.get("SPARK_GRAFT_SCALE_ONLY") == "1"

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    n_pages = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # warm the JVM/python-worker pool so per-query numbers measure the plan,
    # not process spin-up: local[N] lazily forks N python workers that each
    # import numpy+pandas (~5s once) and fault in their Arrow buffers
    spark.range(1000).select(F.sum("id")).collect()

    def _noop(batches):
        import numpy as np  # fault the heavy imports into every worker
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"].to_numpy() + np.int64(0)})

    spark.range(0, CPUS * 4, 1, CPUS).mapInPandas(_noop, "id long").count()

    # canary at THREE points: the host flips between healthy (≈0.1) and
    # ~3×-degraded phases on a seconds-to-minutes timescale (r5 measured
    # 0.09 → 2.9 between consecutive readings), so a single end reading
    # cannot certify a run — a healthy pre+mid+end triple can, and a bad
    # mid reading explains an inflated flagship without tail surgery.
    control_pre = _host_control()
    flagship_s = min(time_flagship(spark, SF_DIR)[0] for _ in range(2))
    control_mid = _host_control()
    # SPARK_GRAFT_SCALE_ONLY=1 skips the per-query suite so a scaling run
    # fits a short wall-clock budget (the scaling block below still runs)
    qtimes = {} if scale_only else run_queries(spark, SF_DIR, only)
    qtimes["flagship_pip_pipeline"] = round(flagship_s, 3)
    total = round(sum(qtimes.values()), 3)

    result = {
        "metric": "headline query wall time",
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR,
        "pages": n_pages,
        "pages_per_sec": round(n_pages / flagship_s, 1),
        "cpus": CPUS,
        "codec": None if scale_only else codec_microbench(),
        "ann": None if scale_only else ann_microbench(spark),
        # hot-bucket canary for the LSH family: max_bucket drifting toward
        # bucket_cap (or n_buckets collapsing) flags an impending quadratic
        # in-bucket self-join before it costs wall-time
        "lsh_buckets": None if scale_only else _lsh_buckets(spark),
        # single-thread numpy control: the host's effective speed varies
        # >3x between runs (documented in BASELINE.md) — divide suite
        # numbers by (host_control_sec / 0.1) to normalize across phases.
        # pre = before the flagship, mid = after it, host_control_sec =
        # run end; a run certifies only when ALL THREE are healthy.
        "host_control_pre": control_pre,
        "host_control_mid": control_mid,
        "host_control_sec": _host_control(),
    }
    spark.stop()

    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # N vs 4N cluster-size proxy (BASELINE.md): same job, same input, at
        # local[8] vs local[32].  The input must be COMPUTE-BOUND — the sf0.1
        # table finishes in ~3s warm, where scheduling overhead (constant in
        # core count) swamps the signal — so the flagship runs over a
        # spark.range-synthesized page table large enough that per-core work
        # dominates (rows via $SPARK_GRAFT_SCALE_ROWS, default 10M).
        # The sandbox host shows heavy run-to-run noise (likely CPU steal:
        # identical jobs measured 8-25s), so each level takes the MIN of
        # `repeats` runs — the standard noise-robust estimator.
        # Levels via $SPARK_GRAFT_SCALE_LEVELS ("N,4N", default "2,8").
        # 2→8 is the cleanest N-vs-4N proxy on this host: at 32 threads one
        # shared-memory JVM saturates bandwidth on the string-heavy parse
        # (pure-arithmetic jobs scale 8→32 at ~4×, string stages ~2.2×),
        # which a real 4N-executor scale-out — 4× machines, 4× memory
        # subsystems — does not suffer.  Both pairs are recorded in
        # BASELINE.md.
        levels = [
            int(x)
            for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "2,8").split(",")
        ]
        n_rows = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "50000000"))
        # 4, not 3: r4 measured the min-of-3 ratio swinging 0.775 → 0.989
        # off a single slow sample in the same host window — one extra
        # repeat per level is the cheapest stabilizer (BASELINE.md r4)
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "4"))
        scaling = {}
        for cores in levels:
            s = get_spark(
                app_name=f"bench{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8)
            )
            s.sparkContext.setLogLevel("ERROR")

            def big_pipeline(n):
                from shapefile_rs_spark import demo
                from shapefile_rs_spark.operators.spatial_join import point_in_polygon_join
                from shapefile_rs_spark.operators.tiles import tile_aggregate
                from shapefile_rs_spark.pages import geotag_pages, synth_pages_from_ids

                ids = s.range(0, n, 1, cores * 4).withColumnRenamed("id", "page_id")
                pages = geotag_pages(synth_pages_from_ids(ids))
                joined = point_in_polygon_join(
                    pages.select("doc_id", "lon", "lat"),
                    demo.oracle_polygons_df(s),
                    point_cols=["doc_id", "lon", "lat"],
                    polygon_cols=["polygon_id"],
                    broadcast_polygons=True,  # skip the selection-count job
                )
                return tile_aggregate(
                    joined, z=6, aggs=[F.count(F.lit(1)).alias("n_pages")]
                )

            big_pipeline(max(n_rows // 10, 1)).collect()  # JIT/worker warm-up
            runs = []
            for _ in range(repeats):
                t0 = time.time()
                big_pipeline(n_rows).collect()
                runs.append(time.time() - t0)
            dt = min(runs)
            scaling[str(cores)] = {
                "sec": round(dt, 3),
                "runs": [round(r, 3) for r in runs],
                "pages_per_sec": round(n_rows / dt, 1),
            }
            s.stop()
        lo, hi = str(levels[0]), str(levels[-1])
        ratio = levels[-1] / levels[0]
        eff = scaling[hi]["pages_per_sec"] / (ratio * scaling[lo]["pages_per_sec"])
        result["scaling"] = {
            **scaling,
            "rows": n_rows,
            f"efficiency_{lo}_to_{hi}": round(eff, 3),
        }

    print(json.dumps(result))
    # Second, COMPACT line with the headline scalars: the driver captures a
    # bounded stdout tail, and the full blob's head (where "value" lives)
    # can scroll out of that window (BENCH_r04 recorded "parsed": null).
    # Keeping this line last and tiny guarantees the suite total survives.
    summary = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "n_queries": len(result["queries"]),
        "sf": result["sf"],
        "pages_per_sec": result["pages_per_sec"],
        "host_control_pre": result["host_control_pre"],
        "host_control_mid": result["host_control_mid"],
        "host_control_sec": result["host_control_sec"],
    }
    if "scaling" in result:
        eff_keys = [k for k in result["scaling"] if k.startswith("efficiency_")]
        for k in eff_keys:
            summary[k] = result["scaling"][k]
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
