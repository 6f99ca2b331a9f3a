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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def flagship_pipeline(spark, sf_dir):
    """lineitem keys → synthetic pages → geotag parse → PIP join → counts."""
    from pyspark.sql import functions as F

    from shapefile_rs_spark import demo
    from shapefile_rs_spark.operators.spatial_join import point_in_polygon_join
    from shapefile_rs_spark.pages import geotag_pages, synth_pages_from_ids

    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ids = lineitem.select(
        (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("page_id")
    )
    pages = geotag_pages(synth_pages_from_ids(ids))
    joined = point_in_polygon_join(
        pages.select("doc_id", "lon", "lat"),
        demo.oracle_polygons_df(spark),
        point_cols=["doc_id"],
        polygon_cols=["polygon_id"],
    )
    return joined.groupBy("polygon_id").count()


def run_queries(spark, sf_dir, names=None):
    import __spark_entry__ as E

    qs = E.queries()
    times = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        times[name] = round(time.time() - t0, 3)
    return times


def time_flagship(spark, sf_dir):
    t0 = time.time()
    rows = flagship_pipeline(spark, sf_dir).collect()
    dt = time.time() - t0
    return dt, rows


def main():
    from shapefile_rs_spark.session import get_spark

    only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES")
    only = set(only.split(",")) if only else None

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", shuffle_partitions=max(CPUS, 8))
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    n_pages = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()

    # warm the JVM/python-worker pool so per-query numbers measure the plan,
    # not process spin-up
    spark.range(1000).select(F.sum("id")).collect()

    flagship_s, _ = time_flagship(spark, SF_DIR)
    qtimes = run_queries(spark, SF_DIR, only)
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
        n_rows = int(os.environ.get("SPARK_GRAFT_SCALE_ROWS", "100000000"))
        repeats = int(os.environ.get("SPARK_GRAFT_SCALE_REPEATS", "3"))
        scaling = {}
        for cores in (8, 32):
            s = get_spark(
                app_name=f"bench{cores}", master=f"local[{cores}]", shuffle_partitions=max(cores, 8)
            )
            s.sparkContext.setLogLevel("ERROR")

            def big_pipeline(n):
                from shapefile_rs_spark import demo
                from shapefile_rs_spark.operators.spatial_join import point_in_polygon_join
                from shapefile_rs_spark.pages import geotag_pages, synth_pages_from_ids

                ids = s.range(0, n, 1, cores * 4).withColumnRenamed("id", "page_id")
                pages = geotag_pages(synth_pages_from_ids(ids))
                return point_in_polygon_join(
                    pages.select("doc_id", "lon", "lat"),
                    demo.oracle_polygons_df(s),
                    point_cols=["doc_id"],
                    polygon_cols=["polygon_id"],
                    broadcast_polygons=True,  # skip the selection-count job
                ).groupBy("polygon_id").count()

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
        eff = scaling["32"]["pages_per_sec"] / (4.0 * scaling["8"]["pages_per_sec"])
        result["scaling"] = {
            **scaling,
            "rows": n_rows,
            "efficiency_8_to_32": round(eff, 3),
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
