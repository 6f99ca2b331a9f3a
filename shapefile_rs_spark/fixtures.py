"""Deterministic fixture generators (FIXTURES.md §2-§3).

We cannot copy the reference's binary fixtures; instead we construct shapes
in code with the reference's golden values (tests/read_tests.rs asserts) and
write them with our own writer — exactly the reference's own write-test
pattern (tests/write_tests.rs:18-31).  Every generator returns raw bytes so
tests and the Spark source layer share one source of truth.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np

from .shapelib.dbf import DbfField, write_dbf
from .shapelib.shp import ShapeRec, write_shp
from .shapelib.shptypes import (
    MULTIPATCH,
    MULTIPOINT,
    MULTIPOINT_Z,
    NO_DATA,
    POINT,
    POINT_M,
    POINT_Z,
    POLYGON,
    POLYGON_M,
    POLYLINE,
    POLYLINE_M,
    POLYLINE_Z,
    TRIANGLE_FAN,
    TRIANGLE_STRIP,
)


def fx_point() -> List[ShapeRec]:
    # golden (122.0, 37.0) — tests/read_tests.rs:186-206
    return [ShapeRec(POINT, [[122.0, 37.0]])]


def fx_pointm() -> List[ShapeRec]:
    # tests/read_tests.rs:208-255
    return [
        ShapeRec(POINT_M, [[160477.9000324604, 5403959.561417906]], m=[0.0]),
        ShapeRec(POINT_M, [[160467.63787299366, 5403971.985031904]], m=[0.0]),
    ]


def fx_pointz() -> List[ShapeRec]:
    # tests/read_tests.rs:257-309 (m = NO_DATA sentinel)
    return [
        ShapeRec(
            POINT_Z,
            [[1422464.3681007193, 4188962.3364355816]],
            z=[72.40956470558095],
            m=[NO_DATA],
        ),
        ShapeRec(
            POINT_Z,
            [[1422459.0908050265, 4188942.211755641]],
            z=[72.58286959604922],
            m=[NO_DATA],
        ),
    ]


_LINE_XY = [
    [1.0, 5.0],
    [5.0, 5.0],
    [5.0, 1.0],
    [3.0, 3.0],
    [1.0, 1.0],
    [3.0, 2.0],
    [2.0, 6.0],
]


def fx_line() -> List[ShapeRec]:
    # 2 parts, bbox (1,1)-(5,6) — tests/testfiles.rs:27-46
    return [ShapeRec(POLYLINE, _LINE_XY, parts=[0, 5])]


def fx_linem() -> List[ShapeRec]:
    # tests/read_tests.rs:30-92
    m = [0.0, NO_DATA, 3.0, NO_DATA, 0.0, NO_DATA, NO_DATA]
    return [ShapeRec(POLYLINE_M, _LINE_XY, m=m, parts=[0, 5])]


def fx_linez() -> List[ShapeRec]:
    # 3 parts; part3 = [(3,2,15,0),(2,6,13,3),(1,9,14,2)] — tests/read_tests.rs:94-184
    xy = [
        [1.0, 5.0],
        [5.0, 5.0],
        [5.0, 1.0],
        [3.0, 3.0],
        [1.0, 1.0],
        [3.0, 2.0],
        [2.0, 6.0],
        [3.0, 2.0],
        [2.0, 6.0],
        [1.0, 9.0],
    ]
    z = [18.8, 20.2, 18.2, 16.4, 18.8, 19.0, 21.0, 15.0, 13.0, 14.0]
    m = [NO_DATA] * 7 + [0.0, 3.0, 2.0]
    return [ShapeRec(POLYLINE_Z, xy, z=z, m=m, parts=[0, 5, 7])]


def fx_polygon() -> List[ShapeRec]:
    """3 rings in deliberately weird file order Inner/Outer/Inner
    (tests/read_tests.rs:311-347).  Stored as-read: the record keeps file
    order; classification happens on decode."""
    inner1 = [[122.0, 37.0], [117.0, 36.0], [115.0, 32.0], [118.0, 20.0], [113.0, 24.0]]
    outer = [[15.0, 2.0], [17.0, 6.0], [22.0, 7.0]]
    inner2 = [[122.0, 37.0], [117.0, 36.0], [115.0, 32.0]]

    def closed(pts):
        return pts + [pts[0]]

    # ensure orientations match declared roles (inner ccw / outer cw) the way
    # the reference constructor would have written them
    from .geom import rings as R

    r1 = R.close_and_reorder(np.array(inner1), R.INNER)
    r2 = R.close_and_reorder(np.array(outer), R.OUTER)
    r3 = R.close_and_reorder(np.array(inner2), R.INNER)
    xy = np.vstack([r1, r2, r3])
    parts = [0, len(r1), len(r1) + len(r2)]
    return [ShapeRec(POLYGON, xy, parts=parts)]


def fx_polygon_hole() -> List[ShapeRec]:
    # tests/write_tests.rs:57-117
    outer = np.array(
        [[-120.0, 60.0], [120.0, 60.0], [120.0, -60.0], [-120.0, -60.0], [-120.0, 60.0]]
    )
    inner = np.array(
        [[-60.0, 30.0], [-60.0, -30.0], [60.0, -30.0], [60.0, 30.0], [-60.0, 30.0]]
    )
    from .geom import rings as R

    r_outer = R.close_and_reorder(outer, R.OUTER)
    r_inner = R.close_and_reorder(inner, R.INNER)
    xy = np.vstack([r_outer, r_inner])
    return [ShapeRec(POLYGON, xy, parts=[0, len(r_outer)])]


def fx_polygonm() -> List[ShapeRec]:
    # tests/read_tests.rs:349-394 (1 outer ring, m=0)
    pts = np.array(
        [
            [159814.75390576152, 5404314.139043656],
            [160420.36722814097, 5403703.520652397],
            [159374.30785312195, 5403473.287488617],
            [159814.75390576152, 5404314.139043656],
        ]
    )
    from .geom import rings as R

    ring = R.close_and_reorder(pts, R.OUTER)
    return [ShapeRec(POLYGON_M, ring, m=[0.0] * len(ring))]


def fx_multipoint() -> List[ShapeRec]:
    # tests/read_tests.rs:417-434
    return [ShapeRec(MULTIPOINT, [[122.0, 37.0], [124.0, 32.0]])]


def fx_multipointz() -> List[ShapeRec]:
    # tests/read_tests.rs:436-494 — m sentinel
    xy = [
        [1422671.7232666016, 4188903.4295959473],
        [1422672.1022949219, 4188903.4295959473],
        [1422671.9127807617, 4188903.7578430176],
        [1422671.9127807617, 4188903.539001465],
    ]
    z = [72.00995635986328, 72.0060806274414, 72.00220489501953, 72.00430297851563]
    m = [NO_DATA] * 4
    return [ShapeRec(MULTIPOINT_Z, xy, z=z, m=m)]


def fx_multipatch() -> List[ShapeRec]:
    """TriangleStrip(10 pts, cube walls 5x5x3) + TriangleFan(6 pts, apex
    (2.5,2.5,5)) — tests/read_tests.rs:496-615."""
    strip = [
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 3.0],
        [5.0, 0.0, 0.0],
        [5.0, 0.0, 3.0],
        [5.0, 5.0, 0.0],
        [5.0, 5.0, 3.0],
        [0.0, 5.0, 0.0],
        [0.0, 5.0, 3.0],
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 3.0],
    ]
    fan = [
        [2.5, 2.5, 5.0],
        [0.0, 0.0, 3.0],
        [5.0, 0.0, 3.0],
        [5.0, 5.0, 3.0],
        [0.0, 5.0, 3.0],
        [0.0, 0.0, 3.0],
    ]
    pts = np.array(strip + fan)
    xy = pts[:, :2]
    z = pts[:, 2]
    m = [NO_DATA] * len(pts)
    return [
        ShapeRec(
            MULTIPATCH,
            xy,
            z=z,
            m=m,
            parts=[0, 10],
            patch_types=[TRIANGLE_STRIP, TRIANGLE_FAN],
        )
    ]


FIXTURE_BUILDERS = {
    "point": fx_point,
    "pointm": fx_pointm,
    "pointz": fx_pointz,
    "line": fx_line,
    "linem": fx_linem,
    "linez": fx_linez,
    "polygon": fx_polygon,
    "polygon_hole": fx_polygon_hole,
    "polygonm": fx_polygonm,
    "multipoint": fx_multipoint,
    "multipointz": fx_multipointz,
    "multipatch": fx_multipatch,
}


def build_fixture(name: str) -> Tuple[bytes, bytes]:
    """(shp_bytes, shx_bytes) for a named fixture family."""
    return write_shp(FIXTURE_BUILDERS[name]())


# ---------------------------------------------------------------------------
# spatial-join fixture (FIXTURES.md §3, geotype-example analog)
# ---------------------------------------------------------------------------


def fx_join_polygons() -> Tuple[List[ShapeRec], List[dict]]:
    """Two polygon records with DBF id/Type; polygon 1 has a hole."""
    from .geom import rings as R

    outer1 = R.close_and_reorder(
        np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]]), R.OUTER
    )
    hole1 = R.close_and_reorder(
        np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]]), R.INNER
    )
    poly1 = ShapeRec(POLYGON, np.vstack([outer1, hole1]), parts=[0, len(outer1)])
    outer2 = R.close_and_reorder(
        np.array([[20.0, 0.0], [30.0, 5.0], [20.0, 10.0]]), R.OUTER
    )
    poly2 = ShapeRec(POLYGON, outer2)
    attrs = [{"id": 1, "Type": "square-with-hole"}, {"id": 2, "Type": "triangle"}]
    return [poly1, poly2], attrs


def fx_join_points() -> Tuple[List[ShapeRec], List[dict]]:
    """7 points: inside poly1, inside poly1's hole (excluded), inside poly2,
    outside everything, near-boundary."""
    pts = [
        (2.0, 2.0),  # 1: in poly1
        (5.0, 5.0),  # 2: in poly1's hole -> excluded
        (8.0, 9.0),  # 3: in poly1
        (22.0, 5.0),  # 4: in poly2
        (29.0, 5.0),  # 5: in poly2 (near vertex)
        (15.0, 5.0),  # 6: outside all
        (-3.0, -3.0),  # 7: outside all
    ]
    shapes = [ShapeRec(POINT, [[x, y]]) for x, y in pts]
    attrs = [{"id": i + 1, "value": float(i + 1) * 1.5} for i in range(len(pts))]
    return shapes, attrs


# golden (point_id, polygon_id) pairs for the join fixture
JOIN_GOLDEN = [(1, 1), (3, 1), (4, 2), (5, 2)]


def write_join_fixture(directory: str) -> None:
    """Materialize points.shp/.shx/.dbf + polygons.shp/.shx/.dbf."""
    import os

    os.makedirs(directory, exist_ok=True)
    polys, poly_attrs = fx_join_polygons()
    pts, pt_attrs = fx_join_points()
    for stem, shapes, attrs, fields in (
        (
            "polygons",
            polys,
            poly_attrs,
            [DbfField("id", "N", 10, 0), DbfField("Type", "C", 80, 0)],
        ),
        (
            "points",
            pts,
            pt_attrs,
            [DbfField("id", "N", 10, 0), DbfField("value", "N", 11, 3)],
        ),
    ):
        shp, shx = write_shp(shapes)
        dbf = write_dbf(fields, attrs)
        for ext, blob in (("shp", shp), ("shx", shx), ("dbf", dbf)):
            with open(os.path.join(directory, f"{stem}.{ext}"), "wb") as fh:
                fh.write(blob)
