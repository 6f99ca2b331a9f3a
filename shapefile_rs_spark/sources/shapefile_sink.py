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

from ..geom import rings as RG
from ..geom.wkb import (
    WKB_LINESTRING,
    WKB_MULTILINESTRING,
    WKB_MULTIPOINT,
    WKB_MULTIPOLYGON,
    WKB_POINT,
    WKB_POLYGON,
    parse_wkb,
)
from ..shapelib.dbf import DbfField, write_dbf
from ..shapelib.shp import ShapeRec, write_shp
from ..shapelib.shptypes import (
    INNER_RING,
    MULTIPATCH,
    MULTIPOINT,
    NULL_SHAPE,
    OUTER_RING,
    POINT,
    POLYGON,
    POLYLINE,
    has_m,
    has_z,
    is_multipoint_family,
    is_point_family,
)

_SINK_SCHEMA = StructType([StructField("stem", StringType()), StructField("path", StringType())])

# WKB geometry → the 2D shape type it lifts to, and the Z/M variants that
# type may be promoted to via an explicit shape_type (src/writer.rs:97-145:
# the reference writer accepts all 13 concrete types)
_WKB_FAMILIES = {
    WKB_POINT: (POINT, {POINT, 11, 21}),
    WKB_MULTIPOINT: (MULTIPOINT, {MULTIPOINT, 18, 28}),
    WKB_LINESTRING: (POLYLINE, {POLYLINE, 13, 23}),
    WKB_MULTILINESTRING: (POLYLINE, {POLYLINE, 13, 23}),
    WKB_POLYGON: (POLYGON, {POLYGON, 15, 25, MULTIPATCH}),
    WKB_MULTIPOLYGON: (POLYGON, {POLYGON, 15, 25, MULTIPATCH}),
}


def _ring_index_map(polygons: List[List[np.ndarray]]) -> tuple:
    """Write-side ring normalization with an index mapping so Z/M columns
    follow their vertices.

    Mirrors the reference writer's Polygon::new (src/record/polygon.rs:150-169):
    every ring is closed (first vertex appended if needed) and reversed when
    its orientation contradicts its declared role — first ring per polygon =
    OUTER, the rest = INNER.  Returns ``(index_array, parts, patch_types)``
    where ``index_array`` maps output vertices to input-vertex positions
    (closing points re-use the first vertex's index, as closing a
    Vec<PointZ> would)."""
    idx_chunks: List[np.ndarray] = []
    parts: List[int] = []
    patch_types: List[int] = []
    off = 0
    total = 0
    for rings_ in polygons:
        for k, ring in enumerate(rings_):
            n = len(ring)
            idx = np.arange(off, off + n, dtype=np.int64)
            closed = n > 0 and bool(np.all(ring[0] == ring[-1]))
            ring_c = ring if closed else np.vstack([ring, ring[:1]])
            if not closed:
                idx = np.append(idx, idx[:1])
            declared = RG.OUTER if k == 0 else RG.INNER
            if len(ring_c) and RG.ring_role(ring_c) != declared:
                idx = idx[::-1]
            parts.append(total)
            patch_types.append(OUTER_RING if k == 0 else INNER_RING)
            total += len(idx)
            idx_chunks.append(idx)
            off += n
    index = np.concatenate(idx_chunks) if idx_chunks else np.empty(0, dtype=np.int64)
    return index, parts, patch_types


def wkb_to_shape_rec(
    wkb: Optional[bytes],
    shape_type: Optional[int] = None,
    z=None,
    m=None,
    patch_types=None,
) -> ShapeRec:
    """Inverse of shape_to_wkb for ALL 13 concrete types (geo-types import
    analog, src/record/mod.rs:484-509 + writer contract src/writer.rs:97-145).

    ``shape_type`` lifts the 2D geometry to a Z/M variant (or MULTIPATCH),
    attaching the ``z``/``m`` arrays (indexed per original WKB vertex order —
    ring closing/reordering carries them along).  ``wkb=None`` produces a
    NullShape record (the reference writes NullShape in any file,
    src/record/mod.rs:236).

    ``patch_types`` (MULTIPATCH only) overrides the rebuilt OUTER/INNER
    labels with an explicit per-part sequence (e.g. FIRST_RING/RING) —
    length must match the part count.  Orientation is still normalized by
    ring role; strip/fan GEOMETRY cannot ride WKB at all — use the raw-
    geometry sink path for those records."""
    if wkb is None:
        return ShapeRec(NULL_SHAPE, np.empty((0, 2)), bbox_xy=(0.0, 0.0, 0.0, 0.0))
    gtype, payload = parse_wkb(wkb)
    if gtype not in _WKB_FAMILIES:
        raise ValueError(f"unsupported WKB type {gtype} for shapefile export")
    base, allowed = _WKB_FAMILIES[gtype]
    st = base if shape_type is None else int(shape_type)
    if st not in allowed:
        raise ValueError(f"WKB geometry {gtype} cannot be written as shape type {st}")

    z_arr = None if z is None else np.asarray(z, dtype=np.float64).ravel()
    m_arr = None if m is None else np.asarray(m, dtype=np.float64).ravel()

    if is_point_family(st):
        xy = np.array([list(payload)])
        index = np.zeros(1, dtype=np.int64)
        parts = patch = None
    elif is_multipoint_family(st):
        xy = np.asarray(payload, dtype=np.float64).reshape(-1, 2)
        index = np.arange(len(xy), dtype=np.int64)
        parts = patch = None
    elif st in (POLYLINE, 13, 23):
        segs = [payload] if gtype == WKB_LINESTRING else payload
        xy = np.vstack(segs) if segs else np.empty((0, 2))
        index = np.arange(len(xy), dtype=np.int64)
        parts = np.cumsum([0] + [len(p) for p in segs[:-1]])
        patch = None
    else:  # polygon family / multipatch
        polygons = [payload] if gtype == WKB_POLYGON else payload
        rings_flat = [r for poly in polygons for r in poly]
        xy_in = np.vstack(rings_flat) if rings_flat else np.empty((0, 2))
        index, parts, patch = _ring_index_map(polygons)
        xy = xy_in[index]
        if st == MULTIPATCH:
            if patch_types is not None:
                override = [int(p) for p in patch_types]
                if len(override) != len(parts):
                    raise ValueError(
                        f"patch_types length {len(override)} != part count {len(parts)}"
                    )
                patch = override
        else:
            patch = None

    if z_arr is not None or m_arr is not None:
        z_arr = None if z_arr is None else z_arr[index]
        m_arr = None if m_arr is None else m_arr[index]
    if not has_z(st):
        z_arr = None
    if not has_m(st):
        m_arr = None
    return ShapeRec(st, xy, z=z_arr, m=m_arr, parts=parts, patch_types=patch)


# reverse of dbf.resolve_encoding for the labels the read side understands
_CPG_LABELS = {"utf-8": "UTF-8", "cp936": "936", "cp950": "950", "cp1252": "1252"}


def write_shapefiles(
    df: DataFrame,
    out_dir: str,
    stem_col: str = "output_stem",
    wkb_col: str = "wkb",
    order_col: str = "record_number",
    dbf_fields: Optional[List[DbfField]] = None,
    attr_cols: Optional[List[str]] = None,
    shape_type_col: Optional[str] = None,
    z_col: Optional[str] = None,
    m_col: Optional[str] = None,
    xy_col: Optional[str] = None,
    parts_col: Optional[str] = None,
    patch_types_col: Optional[str] = None,
    encoding: Optional[str] = None,
    crs_wkt: Optional[str] = None,
) -> List[str]:
    """Write one shapefile per distinct ``stem_col`` value; returns paths.

    One shuffle (repartition by stem) then one encoding task per stem — the
    Spark inversion of the reference's running-fold writer.

    ``shape_type_col``/``z_col``/``m_col`` carry Z/M/Multipatch exports: the
    target ESRI code per row plus per-vertex measure arrays (writer contract
    src/writer.rs:97-145).  A null ``wkb`` writes a NullShape record.
    ``encoding`` applies to the DBF text fields AND emits the matching
    ``.cpg`` sidecar so the label survives a round trip
    (src/reader.rs:664-684 read contract).

    ``xy_col``/``parts_col``/``patch_types_col`` are the RAW-geometry path
    (the source's ``raw_geometry=True`` columns): a row with null wkb but a
    non-null xy array writes the shape directly from interleaved coords +
    part starts + patch types — the only route for TriangleStrip/Fan
    multipatch, whose geometry WKB cannot represent (writer contract
    src/writer.rs:97-145).  ``patch_types_col`` alone also overrides ring
    roles for wkb-borne MULTIPATCH rows."""
    os.makedirs(out_dir, exist_ok=True)
    attr_cols = attr_cols or []
    extra = [c for c in (shape_type_col, z_col, m_col, xy_col, parts_col, patch_types_col) if c]
    cols = [stem_col, wkb_col, order_col] + extra + attr_cols
    fields = dbf_fields
    enc = encoding

    def write_group(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks = [pdf for pdf in batches if len(pdf)]
        if not chunks:
            yield pd.DataFrame({"stem": [], "path": []})
            return
        pdf = pd.concat(chunks)
        out = []
        for stem, grp in pdf.groupby(stem_col):
            grp = grp.sort_values(order_col)
            recs = []
            for _, row in grp.iterrows():
                st = (
                    None
                    if not shape_type_col or pd.isna(row[shape_type_col])
                    else int(row[shape_type_col])
                )
                z = row[z_col] if z_col and row[z_col] is not None else None
                m = row[m_col] if m_col and row[m_col] is not None else None
                patch = (
                    row[patch_types_col]
                    if patch_types_col and row[patch_types_col] is not None
                    else None
                )
                if (
                    row[wkb_col] is None
                    and xy_col
                    and row[xy_col] is not None
                    and st is not None
                    and st != NULL_SHAPE
                ):
                    # raw-geometry path: strip/fan multipatch (and any other
                    # WKB-inexpressible record) writes straight from coords
                    parts = (
                        row[parts_col]
                        if parts_col and row[parts_col] is not None
                        else None
                    )
                    recs.append(
                        ShapeRec(
                            st,
                            np.asarray(row[xy_col], dtype=np.float64).reshape(-1, 2),
                            z=None if z is None else np.asarray(z, dtype=np.float64),
                            m=None if m is None else np.asarray(m, dtype=np.float64),
                            parts=None if parts is None else np.asarray(parts, dtype=np.int64),
                            patch_types=patch,
                        )
                    )
                    continue
                recs.append(
                    wkb_to_shape_rec(
                        None if row[wkb_col] is None else bytes(row[wkb_col]),
                        shape_type=st,
                        z=z,
                        m=m,
                        patch_types=patch,
                    )
                )
            shp, shx = write_shp(recs)
            base = os.path.join(out_dir, str(stem))
            with open(base + ".shp", "wb") as fh:
                fh.write(shp)
            with open(base + ".shx", "wb") as fh:
                fh.write(shx)
            if fields:
                rows = grp[attr_cols].to_dict("records")
                memo_names = [f.name for f in fields if f.ftype == "M"]
                if memo_names:
                    # memo columns carry TEXT in the DataFrame; resolve to
                    # .dbt block pointers and emit the sidecar (dbase-crate
                    # memo surface, src/lib.rs:60) — the read path maps
                    # them back to text, closing the memo round trip
                    from ..shapelib.dbf import write_dbt

                    memos = [row.get(n) for row in rows for n in memo_names]
                    dbt, blocks = write_dbt(memos, encoding=enc or "ascii")
                    it = iter(blocks)
                    for row in rows:
                        for n in memo_names:
                            row[n] = next(it)
                    with open(base + ".dbt", "wb") as fh:
                        fh.write(dbt)
                with open(base + ".dbf", "wb") as fh:
                    fh.write(write_dbf(fields, rows, encoding=enc or "ascii"))
            if enc:
                with open(base + ".cpg", "w") as fh:
                    fh.write(_CPG_LABELS.get(enc.lower(), enc))
            if crs_wkt:
                # .prj passthrough on write (the source's crs_wkt column is
                # the read contract; the reference stores but never parses)
                with open(base + ".prj", "w") as fh:
                    fh.write(crs_wkt)
            out.append({"stem": str(stem), "path": base + ".shp"})
        yield pd.DataFrame(out)

    result = (
        df.select(*cols)
        .repartition(F.col(stem_col))
        .mapInPandas(write_group, schema=_SINK_SCHEMA)
        .collect()
    )
    return [r["path"] for r in result]
