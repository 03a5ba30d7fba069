"""AOI clipping semantics (reference tabular.py:271-327 contract):
points strict-contains-else-drop; lines/polygons intersects-else-drop,
clipped-unless-contained."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_export_tool_python_spark.operators.assemble import FEATURE_SCHEMA
from osm_export_tool_python_spark.operators.clip import AOI, clip_features

SQUARE = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])


def _pt(osm_id, x, y, tags=None):
    return (osm_id, "node", "point", tags or {"a": "1"}, [x], [y], [0, 1], [0, 1])


def _line(osm_id, coords, tags=None):
    xs = [float(c[0]) for c in coords]
    ys = [float(c[1]) for c in coords]
    return (osm_id, "way", "line", tags or {"a": "1"}, xs, ys, [0, len(xs)], [0, 1])


def _poly(osm_id, ring, tags=None):
    ring = list(ring) + [ring[0]]
    xs = [float(c[0]) for c in ring]
    ys = [float(c[1]) for c in ring]
    return (osm_id, "way", "polygon", tags or {"a": "1"}, xs, ys, [0, len(xs)], [0, 1])


@pytest.fixture(scope="module")
def aoi():
    return AOI([SQUARE], cover_zoom=8)


def _run(spark, aoi, rows):
    df = spark.createDataFrame(rows, FEATURE_SCHEMA)
    return {r["osm_id"]: r for r in clip_features(df, aoi).collect()}


def test_points(spark, aoi):
    got = _run(
        spark,
        aoi,
        [
            _pt(1, 5.0, 5.0),     # deep inside → kept (fast path)
            _pt(2, 9.99, 9.99),   # inside near boundary → kept (exact path)
            _pt(3, 15.0, 5.0),    # outside → dropped
            _pt(4, 10.2, 10.2),   # just outside, boundary cell → dropped
        ],
    )
    assert set(got) == {1, 2}


def test_lines(spark, aoi):
    got = _run(
        spark,
        aoi,
        [
            _line(10, [(1, 1), (9, 9)]),          # inside → kept whole
            _line(11, [(-5, 5), (15, 5)]),        # crossing → clipped to [0,10]
            _line(12, [(20, 20), (30, 30)]),      # disjoint → dropped
        ],
    )
    assert set(got) == {10, 11}
    assert got[10]["xs"] == [1.0, 9.0]
    assert got[11]["xs"] == [0.0, 10.0] and got[11]["ys"] == [5.0, 5.0]


def test_polygons(spark, aoi):
    got = _run(
        spark,
        aoi,
        [
            _poly(20, [(2, 2), (4, 2), (4, 4), (2, 4)]),       # inside → kept
            _poly(21, [(5, 5), (15, 5), (15, 15), (5, 15)]),   # overlap → clipped
            _poly(22, [(20, 20), (30, 20), (30, 30), (20, 30)]),  # disjoint → drop
            _poly(23, [(-5, -5), (15, -5), (15, 15), (-5, 15)]),  # contains AOI → clipped to AOI
        ],
    )
    assert set(got) == {20, 21, 23}
    assert got[20]["xs"][0] == 2.0
    xs21 = np.array(got[21]["xs"])
    ys21 = np.array(got[21]["ys"])
    assert xs21.max() <= 10.0 and ys21.max() <= 10.0
    # area of clipped overlap square = 25
    from osm_export_tool_python_spark.functions.geomkernel import signed_area

    ring = np.stack([xs21, ys21], axis=1)[:-1]
    assert abs(abs(signed_area(ring)) - 25.0) < 1e-9
    # feature 23 becomes exactly the AOI square (area 100)
    ring23 = np.stack([got[23]["xs"], got[23]["ys"]], axis=1)[:-1]
    assert abs(abs(signed_area(ring23)) - 100.0) < 1e-9


def test_multipart_line_result(spark, aoi):
    # zigzag exits and re-enters → 2 pieces
    got = _run(spark, aoi, [_line(30, [(-2, 2), (2, 2), (2, -2), (8, -2), (8, 2), (12, 2)])])
    assert set(got) == {30}
    assert len(got[30]["ring_offsets"]) == 3  # two pieces


def test_concave_aoi_drop_only(spark):
    lshape = np.array([[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], dtype=float)
    aoi = AOI([lshape], cover_zoom=8)
    assert not aoi.convex
    got = _run(
        spark,
        aoi,
        [
            _pt(1, 2.0, 8.0),   # in the L → kept
            _pt(2, 8.0, 8.0),   # in the notch → dropped (exact PIP)
            _line(3, [(6, 6), (9, 9)]),  # fully in notch → dropped
            _line(4, [(1, 1), (9, 1)]),  # inside lower arm → kept uncut
        ],
    )
    assert set(got) == {1, 4}
    assert got[4]["xs"] == [1.0, 9.0]


def test_concave_aoi_exact_cut(spark):
    """Concave hole-free AOI: boundary-crossing geometries are now CUT
    exactly (ear-clip decomposition), not kept whole — numpy oracle on
    length / area."""
    from osm_export_tool_python_spark.functions.geomkernel import signed_area

    lshape = np.array(
        [[0, 0], [10, 0], [10, 5], [5, 5], [5, 10], [0, 10]], dtype=float
    )
    aoi = AOI([lshape], cover_zoom=8)
    assert aoi.clip_polys is not None and len(aoi.clip_polys) >= 2
    # triangulation tiles the L exactly (area 75)
    assert sum(abs(signed_area(t)) for t in aoi.clip_polys) == pytest.approx(75.0)

    got = _run(
        spark,
        aoi,
        [
            # horizontal line at y=7: inside only for x in [0,5]
            _line(1, [(2, 7), (9, 7)]),
            # square straddling the notch: ∩L area = 25 - 9 = 16
            _poly(2, [(3, 3), (8, 3), (8, 8), (3, 8)]),
            # fully in notch → dropped
            _poly(3, [(6, 6), (9, 6), (9, 9), (6, 9)]),
        ],
    )
    assert set(got) == {1, 2}

    # line: union of kept pieces spans x∈[2,5] at y=7 → total length 3
    r1 = got[1]
    pts = np.stack([r1["xs"], r1["ys"]], axis=1)
    total = 0.0
    for i in range(len(r1["ring_offsets"]) - 1):
        seg = pts[r1["ring_offsets"][i] : r1["ring_offsets"][i + 1]]
        total += float(np.abs(np.diff(seg[:, 0])).sum() + np.abs(np.diff(seg[:, 1])).sum())
        assert (seg[:, 1] == 7.0).all() and seg[:, 0].min() >= 2.0 and seg[:, 0].max() <= 5.0
    assert total == pytest.approx(3.0)

    # polygon: summed piece area == exact intersection area
    r2 = got[2]
    pts2 = np.stack([r2["xs"], r2["ys"]], axis=1)
    area = sum(
        abs(signed_area(pts2[r2["ring_offsets"][i] : r2["ring_offsets"][i + 1]]))
        for i in range(len(r2["ring_offsets"]) - 1)
    )
    assert area == pytest.approx(16.0)


def test_multiring_phantom_edge_not_counted(spark):
    """A disjoint 2-part polygon whose phantom inter-part 'edge' crosses
    the AOI must be DROPPED (the packed representation has no real edge
    between parts)."""
    aoi = AOI([SQUARE], cover_zoom=8)
    # two small squares far outside, on opposite sides of the AOI: the
    # segment between part 1's last vertex and part 2's first vertex
    # would cross the AOI if treated as an edge
    ring_a = [(-5.0, 4.0), (-4.0, 4.0), (-4.0, 5.0), (-5.0, 5.0)]
    ring_b = [(14.0, 4.0), (15.0, 4.0), (15.0, 5.0), (14.0, 5.0)]
    xs, ys, roffs, poffs = [], [], [0], [0]
    for ring in (ring_a, ring_b):
        closed = list(ring) + [ring[0]]
        xs.extend(p[0] for p in closed)
        ys.extend(p[1] for p in closed)
        roffs.append(len(xs))
        poffs.append(len(roffs) - 1)
    row = (9, "relation", "polygon", {"a": "1"}, xs, ys, roffs, poffs)
    got = _run(spark, aoi, [row])
    assert got == {}
