"""Cell codec: golden XYZ/quadkey values, roundtrips, parents,
neighbors, AOI cover classification."""

import numpy as np

from osm_export_tool_python_spark.functions.cells import (
    cell_decode,
    cell_encode,
    cell_from_zxy,
    cell_neighbors,
    cell_parent,
    cover_at_zoom,
    lonlat_to_tile,
    polygon_cover,
    quadkey_str,
    tile_bounds,
)


def test_golden_tiles():
    # z=0: everything is tile (0,0)
    x, y = lonlat_to_tile([0.0], [0.0], 0)
    assert (x[0], y[0]) == (0, 0)
    # z=1: lon 0, lat 0 is the SE quadrant boundary tile (1,1)
    x, y = lonlat_to_tile([0.0], [0.0], 1)
    assert (x[0], y[0]) == (1, 1)
    # OSM wiki worked example ("Slippy map tilenames"):
    # lat=51.51202, lon=0.02435, zoom=17 → x=65544, y=43582
    x, y = lonlat_to_tile([0.02435], [51.51202], 17)
    assert (x[0], y[0]) == (65544, 43582)
    # extreme west/north corner
    x, y = lonlat_to_tile([-180.0], [85.0511], 4)
    assert (x[0], y[0]) == (0, 0)


def test_quadkey_golden():
    # canonical Bing Maps example: tile (3,5) at level 3 → "213"
    c = cell_from_zxy(3, np.uint64(3), np.uint64(5))
    assert quadkey_str(int(c)) == "213"


def test_roundtrip():
    rng = np.random.default_rng(42)
    lon = rng.uniform(-180, 180, 1000)
    lat = rng.uniform(-85, 85, 1000)
    for z in (0, 4, 12, 20, 29):
        cells = cell_encode(lon, lat, z)
        zz, x, y = cell_decode(cells)
        assert (zz == z).all()
        x2, y2 = lonlat_to_tile(lon, lat, z)
        assert (x == x2.astype(np.int64)).all()
        assert (y == y2.astype(np.int64)).all()
        assert (cells >= 0).all()  # int64-safe for Spark LongType


def test_parent_is_prefix():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    fine = cell_encode(lon, lat, 14)
    coarse = cell_encode(lon, lat, 6)
    assert (cell_parent(fine, 6) == coarse).all()


def test_neighbors():
    c = cell_encode(np.array([10.0]), np.array([50.0]), 10)
    nbrs = cell_neighbors(c)
    assert nbrs.shape == (1, 8)
    assert len(set(nbrs[0])) == 8
    z, x, y = cell_decode(c)
    nz, nx, ny = cell_decode(nbrs[0])
    assert (nz == 10).all()
    assert set(zip(nx - x[0], ny - y[0])) == {
        (-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1),
    }


def test_neighbors_wrap_antimeridian():
    c = cell_from_zxy(5, np.uint64(0), np.uint64(10)).astype(np.int64).reshape(1)
    nbrs = cell_neighbors(c)
    _, nx, _ = cell_decode(nbrs[0])
    assert 31 in nx  # x=-1 wraps to 2^5-1


def test_polygon_cover_square():
    # a square spanning a whole z=2 tile and a bit more
    lon_w, lat_s, lon_e, lat_n = (float(v) for v in tile_bounds(1, 1, 2))
    ring = np.array(
        [
            [lon_w - 1, lat_s - 1],
            [lon_e + 1, lat_s - 1],
            [lon_e + 1, lat_n + 1],
            [lon_w - 1, lat_n + 1],
        ]
    )
    cover = polygon_cover([ring], zoom=4)
    assert cover, "cover must not be empty"
    classes = set(cover.values())
    assert classes <= {"inside", "boundary"}
    assert "inside" in classes and "boundary" in classes
    # the fully-covered z=2 tile must appear as inside (possibly at z=2)
    from osm_export_tool_python_spark.functions.cells import cell_from_zxy as czxy

    target = int(czxy(2, np.uint64(1), np.uint64(1)))
    assert cover.get(target) == "inside"

    flat = cover_at_zoom(cover, 4)
    zz, _, _ = cell_decode(np.array(list(flat.keys())))
    assert (zz == 4).all()
    # inside cells expanded 1 z2-cell → 16 z4-cells at least
    assert sum(1 for v in flat.values() if v == "inside") >= 16


def test_cover_membership_agrees_with_pip():
    """Every point encoded into an 'inside' cover cell must be inside
    the polygon; points in no cover cell must be outside."""
    from osm_export_tool_python_spark.functions.geomkernel import points_in_rings

    ring = np.array([[0.0, 0.0], [30.0, 0.0], [30.0, 20.0], [0.0, 20.0]])
    zoom = 7
    flat = cover_at_zoom(polygon_cover([ring], zoom), zoom)
    rng = np.random.default_rng(3)
    lon = rng.uniform(-10, 40, 3000)
    lat = rng.uniform(-10, 30, 3000)
    cells = cell_encode(lon, lat, zoom)
    inside_poly = points_in_rings(np.stack([lon, lat], axis=1), [ring])
    for i in range(len(lon)):
        cls = flat.get(int(cells[i]))
        if cls == "inside":
            assert inside_poly[i], (lon[i], lat[i])
        elif cls is None:
            assert not inside_poly[i], (lon[i], lat[i])
        # 'boundary' cells may contain either — exact kernel decides
