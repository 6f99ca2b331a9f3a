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
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

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
