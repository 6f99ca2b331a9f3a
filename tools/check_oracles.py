"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, compares row count, column names, and an
order-insensitive value multiset (values canonicalized: floats by repr,
timestamps by isoformat, Decimals normalized).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import datetime
import decimal
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def canon(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(v.normalize())
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray, memoryview)):
        return bytes(v).hex()
    if isinstance(v, bool):
        return f"b:{v}"
    return repr(v)


def row_key(row, col_order):
    return tuple(canon(row[i]) for i in col_order)


def spark_numeric_kind(dt) -> str | None:
    """Map a Spark type to a pandas dtype-kind for driver-parity checks.

    The driver compares Spark results against ``duckdb.df()`` output, where
    HUGEINT (SUM of BIGINT) and DECIMAL both surface as float64.  Our canon()
    comparison normalizes that away, so we separately enforce that numeric
    dtype *kinds* agree — a Spark bigint against a DuckDB float64 (or any
    Spark decimal output at all) would hash-mismatch on the driver even when
    values are equal (r1 verdict: doc_stats, events_hourly).
    """
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return "decimal"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "i"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "f"
    return None


def dtype_mismatches(sdf, duck_df) -> list[str]:
    from pyspark.sql import types as T

    problems = []
    for field in sdf.schema.fields:
        if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
            # the DRIVER canonicalizer sorts a pandas frame by value — a
            # list/dict cell raises "unhashable type" there even though our
            # repr()-based canon() handles it (r3: winnow_fp ERRORED on the
            # driver while green here).  Refuse locally so the divergence
            # can't recur: string-encode (concat_ws/array_to_string) or
            # explode nested outputs in the query wrapper.
            problems.append(
                f"column {field.name!r}: nested type "
                f"{field.dataType.simpleString()} — the driver canonicalizer "
                "cannot hash it; string-encode or explode in the wrapper"
            )
            continue
        sk = spark_numeric_kind(field.dataType)
        if sk is None:
            continue
        if sk == "decimal":
            problems.append(
                f"column {field.name!r}: Spark emits DECIMAL — the driver's "
                "DuckDB .df() twin renders decimals as float64; cast both "
                "sides to DOUBLE or BIGINT"
            )
            continue
        if field.name not in duck_df.columns:
            continue
        col = duck_df[field.name]
        dk = col.dtype.kind
        if dk == "f" and sk == "i" and col.isna().any():
            # nullable BIGINT (e.g. ROLLUP grouping keys) surfaces as float64
            # with NaN in pandas — the driver's r1 hash accepted this case
            continue
        if dk in ("i", "u", "f") and dk.replace("u", "i") != sk:
            problems.append(
                f"column {field.name!r}: Spark kind {sk!r} vs DuckDB .df() "
                f"dtype {duck_df[field.name].dtype} — driver hash would differ"
            )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as E
    from shapefile_rs_spark.session import get_spark

    spark = get_spark(
        app_name="check_oracles", master="local[8]", shuffle_partitions=16,
        extra_conf={"spark.sql.session.timeZone": "UTC"},
    )
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:
            print(f"{name}: SPARK ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s) — no oracle")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            duck_df = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"{name}: DUCKDB ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        ok = True
        for msg in dtype_mismatches(sdf, duck_df):
            print(f"{name}: DRIVER-DTYPE {msg}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"{name}: SCHEMA MISMATCH spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"{name}: COUNT MISMATCH spark={len(srows)} duck={len(drows)}")
            ok = False
        if ok:
            s_order = [scols.index(c) for c in sorted(scols)]
            d_order = [dcols.index(c) for c in sorted(dcols)]
            sset = sorted(row_key(tuple(r), s_order) for r in srows)
            dset = sorted(row_key(tuple(r), d_order) for r in drows)
            if sset != dset:
                ok = False
                diff_s = [r for r in sset if r not in set(dset)][:3]
                diff_d = [r for r in dset if r not in set(sset)][:3]
                print(f"{name}: VALUE MISMATCH\n  spark-only: {diff_s}\n  duck-only:  {diff_d}")
        status = "OK" if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{name}: {status} ({len(srows)} rows, {time.time()-t0:.1f}s)")
    print("\n==", "ALL OK" if not failures else f"FAILURES: {failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
