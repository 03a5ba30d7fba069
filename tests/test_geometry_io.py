"""AOI loader parity with reference geometry.py (.poly incl. holes,
GeoJSON geometry/Feature/FeatureCollection-first-feature)."""

import json

import numpy as np

from osm_export_tool_python_spark.functions.geomkernel import points_in_rings
from osm_export_tool_python_spark.sources.geometry_io import (
    load_geometry,
    parse_poly,
    rings_for_clip,
)

POLY_WITH_HOLE = """test_area
section1
   0.0  0.0
   10.0 0.0
   10.0 10.0
   0.0  10.0
   0.0  0.0
END
!hole1
   4.0 4.0
   6.0 4.0
   6.0 6.0
   4.0 6.0
   4.0 4.0
END
section2
   20.0 20.0
   30.0 20.0
   30.0 30.0
   20.0 30.0
END
END
"""

# the Hawaii-style multipolygon from reference examples/python_example.py
GEOJSON_MP = {
    "type": "MultiPolygon",
    "coordinates": [
        [[[0, 0], [10, 0], [10, 10], [0, 10], [0, 0]]],
        [[[20, 20], [30, 20], [30, 30], [20, 30], [20, 20]]],
    ],
}


class TestPoly:
    def test_parts_and_holes(self):
        parts = parse_poly(POLY_WITH_HOLE.split("\n"))
        assert len(parts) == 2
        assert len(parts[0]) == 2  # outer + hole
        assert len(parts[1]) == 1
        assert parts[0][1][0] == [4.0, 4.0]

    def test_even_odd_clip_rings(self):
        rings = rings_for_clip(parse_poly(POLY_WITH_HOLE.split("\n")))
        assert len(rings) == 3
        pts = np.array([[5.0, 5.0], [2.0, 2.0], [25.0, 25.0], [15.0, 15.0]])
        inside = points_in_rings(pts, rings)
        # (5,5) is in the hole → outside; (2,2) in part1; (25,25) in part2
        assert inside.tolist() == [False, True, True, False]


class TestGeoJSON:
    def test_geometry(self):
        parts = load_geometry(json.dumps(GEOJSON_MP))
        assert len(parts) == 2

    def test_feature(self):
        parts = load_geometry(json.dumps({"type": "Feature", "geometry": GEOJSON_MP}))
        assert len(parts) == 2

    def test_feature_collection_first_only(self, capsys):
        fc = {
            "type": "FeatureCollection",
            "features": [
                {"type": "Feature", "geometry": {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}},
                {"type": "Feature", "geometry": GEOJSON_MP},
            ],
        }
        parts = load_geometry(json.dumps(fc))
        assert len(parts) == 1  # first feature only (geometry.py:47-49)
        assert "first feature" in capsys.readouterr().out

    def test_poly_fallback(self):
        parts = load_geometry(POLY_WITH_HOLE)
        assert len(parts) == 2
