"""Spark shapefile source: ``binaryFile`` scan → Arrow-vectorized decode.

Pipeline (SURVEY §3 EP1 re-expressed for Spark):

1. ``spark.read.format("binaryFile")`` loads each ``.shp``/``.shx``/``.dbf``/
   ``.cpg`` as one row (path, content) — the Spark-native replacement for the
   reference's ``Read+Seek`` streams (src/reader.rs:649-693).
2. Rows are grouped per shapefile stem (one shapefile = the coupled triplet,
   src/lib.rs:3-6) with ``groupBy(stem).pivot-free`` aggregation.
3. A single ``mapInPandas`` pass decodes every record of every file with the
   pure-numpy codec (:mod:`shapefile_rs_spark.shapelib`) — batch-vectorized,
   no per-row Python — emitting one DataFrame row per shape record zipped
   with its DBF attributes (the ShapeRecordIterator analog,
   src/reader.rs:164-193).

Scale notes: one task decodes one shapefile (format caps files at 4 GiB; in
practice ≪). Thousands of shapefiles parallelize across executors; the
downstream join/refine stages repartition by cell, so decode skew does not
propagate.  Attributes are carried as a JSON map column (schema varies per
file); use :func:`shapes_with_typed_attrs` to lift them to typed columns.
"""

from __future__ import annotations

import json
import os
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

SHAPES_SCHEMA = StructType(
    [
        StructField("source_file", StringType()),
        StructField("record_number", IntegerType()),  # 1-based (src/record/mod.rs:289)
        StructField("shape_type", IntegerType()),  # ESRI code (src/lib.rs:162-180)
        StructField("wkb", BinaryType()),  # canonical 2D geometry
        StructField("xmin", DoubleType()),
        StructField("ymin", DoubleType()),
        StructField("xmax", DoubleType()),
        StructField("ymax", DoubleType()),
        StructField("num_points", IntegerType()),
        StructField("num_parts", IntegerType()),
        StructField("z", ArrayType(DoubleType())),
        StructField("m", ArrayType(DoubleType())),  # NO_DATA sentinel preserved
        StructField("attrs_json", StringType()),  # DBF row as JSON object
        StructField("crs_wkt", StringType()),  # .prj contents (passthrough —
        # the reference stores but never parses .prj; same contract here)
    ]
)


def _decode_stem_group(
    batches: Iterator[pd.DataFrame], expected_type: Optional[int] = None
) -> Iterator[pd.DataFrame]:
    import json as _json

    from ..geom.wkb import points_wkb_bulk, shape_to_wkb
    from ..shapelib.dbf import read_dbf, resolve_encoding
    from ..shapelib.shp import read_header, read_points_xy, read_shp
    from ..shapelib.shptypes import POINT

    for pdf in batches:
        out_rows = []
        fast_frames = []
        for _, row in pdf.iterrows():
            shp = bytes(row["shp"]) if row["shp"] is not None else None
            if not shp:
                continue
            shx = bytes(row["shx"]) if row["shx"] is not None else None
            dbf = bytes(row["dbf"]) if row["dbf"] is not None else None
            cpg = bytes(row["cpg"]) if row["cpg"] is not None else None
            prj = bytes(row["prj"]) if row.get("prj") is not None else None
            crs_wkt = prj.decode("utf-8", "replace").strip() if prj else None
            encoding = resolve_encoding(cpg.decode("ascii", "replace") if cpg else None)

            # bulk fast path: POINT files decode as one numpy gather (no
            # per-record Python) — the dominant web-scale case (geocoded
            # point layers with millions of records)
            if (
                shx is not None
                and read_header(shp).shape_type == POINT
                and expected_type in (None, POINT)
            ):
                nums_v, xy = read_points_xy(shp, shx)
                attrs = None
                if dbf:
                    _, attr_rows = read_dbf(dbf, encoding=encoding)
                    attrs = [
                        _json.dumps(a, default=str) if a else None for a in attr_rows
                    ]
                    attrs += [None] * (len(nums_v) - len(attrs))
                fast_frames.append(
                    pd.DataFrame(
                        {
                            "source_file": row["stem"],
                            "record_number": nums_v.astype("int32"),
                            "shape_type": POINT,
                            "wkb": points_wkb_bulk(xy),
                            "xmin": xy[:, 0],
                            "ymin": xy[:, 1],
                            "xmax": xy[:, 0],
                            "ymax": xy[:, 1],
                            "num_points": 1,
                            "num_parts": 0,
                            "z": None,
                            "m": None,
                            "attrs_json": attrs,
                            "crs_wkt": crs_wkt,
                        }
                    )
                )
                continue

            header, recs, nums = read_shp(shp, shx=shx, expected_type=expected_type)
            attr_rows = [None] * len(recs)
            if dbf:
                _, attr_rows = read_dbf(dbf, encoding=encoding)
                if len(attr_rows) < len(recs):
                    attr_rows = attr_rows + [None] * (len(recs) - len(attr_rows))
            for rec, num, attrs in zip(recs, nums, attr_rows):
                try:
                    wkb = shape_to_wkb(rec)
                except Exception:
                    wkb = None  # TriangleStrip/Fan multipatch etc.
                bb = rec.bbox_xy or (None, None, None, None)
                out_rows.append(
                    {
                        "source_file": row["stem"],
                        "record_number": int(num),
                        "shape_type": int(rec.shape_type),
                        "wkb": wkb,
                        "xmin": bb[0],
                        "ymin": bb[1],
                        "xmax": bb[2],
                        "ymax": bb[3],
                        "num_points": rec.num_points,
                        "num_parts": rec.num_parts,
                        "z": rec.z.tolist() if rec.z is not None else None,
                        "m": rec.m.tolist() if rec.m is not None else None,
                        "attrs_json": json.dumps(attrs, default=str) if attrs else None,
                        "crs_wkt": crs_wkt,
                    }
                )
        cols = [f.name for f in SHAPES_SCHEMA.fields]
        slow = pd.DataFrame(out_rows, columns=cols)
        if fast_frames:
            yield pd.concat([slow[cols]] + [f[cols] for f in fast_frames], ignore_index=True)
        else:
            yield slow


def read_shapefiles(
    spark: SparkSession,
    path: str,
    pattern: str = "*",
    expected_type: Optional[int] = None,
) -> DataFrame:
    """Read a directory of shapefiles into the canonical shapes DataFrame.

    ``path`` may hold many ``stem.shp`` (+``.shx``/``.dbf``/``.cpg``) sets;
    each decodes in its own task.  ``expected_type`` is the typed-scan mode
    (SURVEY EP2 / src/record/mod.rs:55-68): the first record whose type code
    differs fails the task with MismatchShapeType — row-level strictness
    identical to the reference's ``read_as``.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"{pattern}.{{shp,shx,dbf,cpg,prj}}")
        .load(path)
        .select(
            F.regexp_replace(F.col("path"), r"\.[a-z]{3}$", "").alias("stem"),
            F.lower(F.regexp_extract(F.col("path"), r"\.([a-z]{3})$", 1)).alias("ext"),
            F.col("content"),
        )
    )
    grouped = raw.groupBy("stem").agg(
        *[
            F.max(F.when(F.col("ext") == e, F.col("content"))).alias(e)
            for e in ("shp", "shx", "dbf", "cpg", "prj")
        ]
    )
    return grouped.mapInPandas(
        lambda it: _decode_stem_group(it, expected_type), schema=SHAPES_SCHEMA
    )


def shapes_with_typed_attrs(shapes: DataFrame, fields: dict) -> DataFrame:
    """Lift ``attrs_json`` into typed columns, e.g. ``{"id": "bigint",
    "Type": "string"}`` (DBF dynamic schema → Catalyst StructType)."""
    schema = ", ".join(f"`{k}` {v}" for k, v in fields.items())
    parsed = shapes.withColumn("_attrs", F.from_json("attrs_json", schema))
    for k in fields:
        parsed = parsed.withColumn(k, F.col(f"_attrs.`{k}`"))
    return parsed.drop("_attrs")
