"""Geometry statistics over WKB polygon columns.

The measurement side of the reference's ring machinery: shoelace area
(outer rings positive, holes negative — the same signed-area kernel that
classifies ring roles, geom/rings.py / src/record/polygon.rs ring logic),
perimeter, and ring/vertex counts.  Vectorized per Arrow batch over the
(small) polygon side; numbers are raw doubles — callers round for
cross-engine comparison.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import BinaryType, DoubleType, IntegerType, StructField, StructType

from ..geom import rings as R
from ..geom.wkb import wkb_rings


def polygon_stats(
    polygons: DataFrame,
    wkb_col: str = "wkb",
    id_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Per polygon: (id cols, n_rings, n_outer, n_vertices, area,
    perimeter).  Area = Σ|shoelace|/2 over outer rings − Σ over holes."""
    id_cols = id_cols or ["polygon_id"]
    out_schema = StructType(
        [polygons.schema[c] for c in id_cols]
        + [
            StructField("n_rings", IntegerType()),
            StructField("n_outer", IntegerType()),
            StructField("n_vertices", IntegerType()),
            StructField("area", DoubleType()),
            StructField("perimeter", DoubleType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            rows = {c: pdf[c].to_numpy() for c in id_cols}
            n_rings, n_outer, n_verts, areas, perims = [], [], [], [], []
            for blob in pdf[wkb_col]:
                rings = wkb_rings(bytes(blob))
                area = perim = 0.0
                nv = outer = 0
                for ring in rings:
                    half = abs(R.signed_area2(ring)) / 2.0
                    if R.ring_role(ring) == R.OUTER:
                        outer += 1
                        area += half
                    else:
                        area -= half
                    d = np.diff(ring, axis=0)
                    perim += float(np.sqrt((d * d).sum(axis=1)).sum())
                    nv += len(ring)
                n_rings.append(len(rings))
                n_outer.append(outer)
                n_verts.append(nv)
                areas.append(area)
                perims.append(perim)
            rows.update(
                n_rings=np.array(n_rings, dtype=np.int32),
                n_outer=np.array(n_outer, dtype=np.int32),
                n_vertices=np.array(n_verts, dtype=np.int32),
                area=np.array(areas),
                perimeter=np.array(perims),
            )
            yield pd.DataFrame(rows, columns=cols)

    return polygons.select(*id_cols, wkb_col).mapInPandas(stats, schema=out_schema)


def _dp_mask(xy: np.ndarray, tol: float) -> np.ndarray:
    """Douglas-Peucker keep-mask (iterative stack, perpendicular distance).
    Endpoints always kept; classic O(n log n) expected."""
    n = len(xy)
    if n == 0:
        return np.zeros(0, dtype=bool)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        seg = xy[j] - xy[i]
        rel = xy[i + 1 : j] - xy[i]
        L2 = float(seg @ seg)
        if L2 == 0.0:
            d = np.sqrt((rel * rel).sum(axis=1))
        else:
            d = np.abs(rel[:, 0] * seg[1] - rel[:, 1] * seg[0]) / np.sqrt(L2)
        m = int(np.argmax(d))
        if d[m] > tol:
            k = i + 1 + m
            keep[k] = True
            stack.append((i, k))
            stack.append((k, j))
    return keep


def simplify_polylines(
    lines: DataFrame,
    tolerance: float,
    wkb_col: str = "wkb",
    id_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Douglas-Peucker simplification of (Multi)LineString/(Multi)Polygon
    WKB parts (the geo crate's Simplify trait the reference's geo-types
    interop exposes): per part, drop vertices within ``tolerance``
    perpendicular distance of the kept chain.  Map-only (one batch pass);
    emits the simplified WKB plus before/after vertex counts."""
    from ..geom.wkb import (
        WKB_LINESTRING,
        WKB_MULTILINESTRING,
        WKB_MULTIPOLYGON,
        WKB_POLYGON,
        multilinestring_wkb,
        multipolygon_wkb,
        parse_wkb,
    )

    id_cols = id_cols or ["line_id"]
    out_schema = StructType(
        [lines.schema[c] for c in id_cols]
        + [
            StructField("wkb", BinaryType()),
            StructField("n_vertices_in", IntegerType()),
            StructField("n_vertices_out", IntegerType()),
        ]
    )

    def simplify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in out_schema.fields]
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(columns=cols)
                continue
            out = {c: pdf[c].to_numpy() for c in id_cols}
            blobs, n_in, n_out = [], [], []
            for blob in pdf[wkb_col]:
                gtype, payload = parse_wkb(bytes(blob))
                if gtype == WKB_LINESTRING:
                    parts = [payload]
                elif gtype == WKB_MULTILINESTRING:
                    parts = payload
                elif gtype in (WKB_POLYGON, WKB_MULTIPOLYGON):
                    polys = [payload] if gtype == WKB_POLYGON else payload
                    parts = [r for poly in polys for r in poly]
                else:
                    raise ValueError(f"cannot simplify WKB type {gtype}")
                simp = [p[_dp_mask(p, tolerance)] for p in parts]
                if gtype in (WKB_POLYGON, WKB_MULTIPOLYGON):
                    # rings stay rings (>=4 pts incl. closure) or collapse away
                    simp = [r for r in simp if len(r) >= 4]
                    blobs.append(multipolygon_wkb([simp]))
                else:
                    blobs.append(multilinestring_wkb(simp))
                n_in.append(sum(len(p) for p in parts))
                n_out.append(sum(len(p) for p in simp))
            out["wkb"] = blobs
            out["n_vertices_in"] = np.array(n_in, dtype=np.int32)
            out["n_vertices_out"] = np.array(n_out, dtype=np.int32)
            yield pd.DataFrame(out, columns=cols)

    return lines.select(*id_cols, wkb_col).mapInPandas(simplify, schema=out_schema)


def convex_hull_per_group(
    points: DataFrame,
    group_cols: List[str],
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Per-group convex hull (Andrew monotone chain) via grouped-map
    ``applyInPandas``: (group cols, hull WKB polygon, n_hull_vertices,
    hull_area).  The hull of each group's point cloud is the standard
    coverage-footprint summary (per cell, per polygon, per source)."""
    from ..geom.wkb import multipolygon_wkb

    out_schema = StructType(
        [points.schema[c] for c in group_cols]
        + [
            StructField("wkb", BinaryType()),
            StructField("n_hull_vertices", IntegerType()),
            StructField("hull_area", DoubleType()),
        ]
    )

    def hull(pdf: pd.DataFrame) -> pd.DataFrame:
        xy = np.unique(
            np.column_stack([pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy()]), axis=0
        )  # sorted lexicographically
        if len(xy) == 1:
            h = np.vstack([xy[0], xy[0], xy[0]])
        elif len(xy) == 2:
            h = np.vstack([xy[0], xy[1], xy[0]])
        else:
            def half(pts):
                out = []
                for p in pts:
                    while len(out) >= 2 and np.cross(out[-1] - out[-2], p - out[-2]) <= 0:
                        out.pop()
                    out.append(p)
                return out

            lower = half(xy)
            upper = half(xy[::-1])
            h = np.vstack(lower[:-1] + upper[:-1] + [lower[0]])
        area = abs(R.signed_area2(h)) / 2.0
        row = {c: [pdf[c].iloc[0]] for c in group_cols}
        # shapefile convention: OUTER = clockwise = POSITIVE shoelace
        # (geom/rings.py signed_area2) — reverse a CCW chain
        ring = h if R.signed_area2(h) >= 0 else h[::-1]
        row["wkb"] = [multipolygon_wkb([[ring]])]
        row["n_hull_vertices"] = [len(h) - 1]
        row["hull_area"] = [area]
        return pd.DataFrame(row)

    return points.groupBy(*group_cols).applyInPandas(hull, schema=out_schema)
