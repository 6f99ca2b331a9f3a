"""Shapefile sink: DataFrame → .shp/.shx/.dbf files.

The reference writer's finalize (seek-back header rewrite with folded bbox,
src/writer.rs:190-221) inverts naturally in Spark to aggregate-then-write
(SURVEY §3 EP3): each output shapefile is produced by one task that encodes
its partition's records with the numpy codec.  Records are grouped by an
``output_stem`` column — a thousand-stem DataFrame writes a thousand
shapefiles in parallel; record order inside a stem follows ``record_number``.

Used by the round-trip tests (write_tests.rs analog) and for exporting join
results back to the shapefile world.
"""

from __future__ import annotations

import os
from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..geom.wkb import parse_wkb, WKB_MULTILINESTRING, WKB_MULTIPOINT, WKB_MULTIPOLYGON, WKB_POINT
from ..shapelib.dbf import DbfField, write_dbf
from ..shapelib.shp import ShapeRec, write_shp
from ..shapelib.shptypes import MULTIPOINT, POINT, POLYGON, POLYLINE

_SINK_SCHEMA = StructType([StructField("stem", StringType()), StructField("path", StringType())])


def wkb_to_shape_rec(wkb: bytes) -> ShapeRec:
    """Inverse of shape_to_wkb for the 2D types (geo-types import analog,
    src/record/mod.rs:484-509)."""
    gtype, payload = parse_wkb(wkb)
    if gtype == WKB_POINT:
        return ShapeRec(POINT, [list(payload)])
    if gtype == WKB_MULTIPOINT:
        return ShapeRec(MULTIPOINT, payload)
    if gtype == WKB_MULTILINESTRING:
        xy = np.vstack(payload)
        parts = np.cumsum([0] + [len(p) for p in payload[:-1]])
        return ShapeRec(POLYLINE, xy, parts=parts)
    if gtype == WKB_MULTIPOLYGON:
        rings: List[np.ndarray] = [r for poly in payload for r in poly]
        xy = np.vstack(rings)
        parts = np.cumsum([0] + [len(r) for r in rings[:-1]])
        return ShapeRec(POLYGON, xy, parts=parts)
    raise ValueError(f"unsupported WKB type {gtype} for shapefile export")


def write_shapefiles(
    df: DataFrame,
    out_dir: str,
    stem_col: str = "output_stem",
    wkb_col: str = "wkb",
    order_col: str = "record_number",
    dbf_fields: Optional[List[DbfField]] = None,
    attr_cols: Optional[List[str]] = None,
) -> List[str]:
    """Write one shapefile per distinct ``stem_col`` value; returns paths.

    One shuffle (repartition by stem) then one encoding task per stem — the
    Spark inversion of the reference's running-fold writer.
    """
    os.makedirs(out_dir, exist_ok=True)
    attr_cols = attr_cols or []
    cols = [stem_col, wkb_col, order_col] + attr_cols
    fields = dbf_fields

    def write_group(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            yield pd.DataFrame({"stem": [], "path": []})
            return
        pdf = pd.concat(chunks)
        out = []
        for stem, grp in pdf.groupby(stem_col):
            grp = grp.sort_values(order_col)
            recs = [wkb_to_shape_rec(bytes(b)) for b in grp[wkb_col]]
            shp, shx = write_shp(recs)
            base = os.path.join(out_dir, str(stem))
            with open(base + ".shp", "wb") as fh:
                fh.write(shp)
            with open(base + ".shx", "wb") as fh:
                fh.write(shx)
            if fields:
                rows = grp[attr_cols].to_dict("records")
                with open(base + ".dbf", "wb") as fh:
                    fh.write(write_dbf(fields, rows))
            out.append({"stem": str(stem), "path": base + ".shp"})
        yield pd.DataFrame(out)

    result = (
        df.select(*cols)
        .repartition(F.col(stem_col))
        .mapInPandas(write_group, schema=_SINK_SCHEMA)
        .collect()
    )
    return [r["path"] for r in result]
