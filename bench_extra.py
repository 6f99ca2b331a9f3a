"""Extra benchmarks for optimization work (bench.py is FROZEN — guide §1.4).

Usage:
  python bench_extra.py [--sf DIR] [--repeats N] [--explain] q1 q2 ...

Times each named declared query with the noop sink (same methodology as
bench.py: min of N repeats after a warm-up of the worker pool), optionally
dumping .explain("formatted") to plans/r07/<q>_<tag>.txt.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--explain", default=None, help="tag: write plans/r07/<q>_<tag>.txt")
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from shapefile_rs_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # warm worker pool like bench.py does
    spark.range(1000).select(F.sum("id")).collect()

    def _noop(batches):
        import numpy as np
        import pandas as pd
        for pdf in batches:
            yield pd.DataFrame({"id": pdf["id"].to_numpy() + np.int64(0)})

    spark.range(0, cpus * 4, 1, cpus).mapInPandas(_noop, "id long").count()

    import numpy as _np

    def _host_control(n: int = 4_000_000) -> float:
        a = _np.random.default_rng(5).normal(size=n)
        t0 = time.time()
        _np.sort(a)
        return round(time.time() - t0, 4)

    print(json.dumps({"host_control_pre": _host_control()}), flush=True)

    import __spark_entry__ as E

    qs = E.queries()
    names = list(qs) if args.all else args.queries
    times = {}
    for name in names:
        fn = qs[name]
        if args.explain:
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, args.sf)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(f"plans/r07/{name}_{args.explain}.txt", "w") as fh:
                fh.write(txt)
        best = float("inf")
        samples = []
        for _ in range(args.repeats):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            samples.append(round(dt, 3))
            best = min(best, dt)
        times[name] = {"min": round(best, 3), "samples": samples}
        gc.collect()
        print(json.dumps({name: times[name]}), flush=True)
    print(json.dumps({"sf": args.sf, "times": {k: v["min"] for k, v in times.items()},
                      "host_control_end": _host_control()}))
    spark.stop()


if __name__ == "__main__":
    main()
