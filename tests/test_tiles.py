"""Tile assignment: bbox covers, golden point assignments, salted
packing equivalence, JVM-side cell decode parity."""

import numpy as np
from pyspark.sql import functions as F

from osm_export_tool_python_spark.functions.cells import cell_decode, cell_encode
from osm_export_tool_python_spark.operators.assemble import FEATURE_SCHEMA
from osm_export_tool_python_spark.operators.tiles import (
    decode_cell_cols,
    point_tile_assignment,
    tile_counts,
    tile_features,
    with_tile_cells,
)


def _pt(osm_id, x, y):
    return (osm_id, "node", "point", {"a": "1"}, [x], [y], [0, 1], [0, 1])


def _line(osm_id, coords):
    xs = [float(c[0]) for c in coords]
    ys = [float(c[1]) for c in coords]
    return (osm_id, "way", "line", {"a": "1"}, xs, ys, [0, len(xs)], [0, 1])


def test_point_assignment_golden(spark):
    df = spark.createDataFrame([_pt(1, 0.02435, 51.51202)], FEATURE_SCHEMA)
    out = point_tile_assignment(df, 17).select(decode_cell_cols("cell")).select("c.*").collect()
    assert (out[0]["z"], out[0]["x"], out[0]["y"]) == (17, 65544, 43582)


def test_jvm_cell_decode_matches_numpy(spark):
    rng = np.random.default_rng(11)
    lon = rng.uniform(-179, 179, 300)
    lat = rng.uniform(-84, 84, 300)
    for zoom in (3, 11, 18):
        cells = cell_encode(lon, lat, zoom)
        df = spark.createDataFrame([(int(c),) for c in cells], "cell long")
        rows = df.select("cell", decode_cell_cols("cell")).select("cell", "c.*").collect()
        z, x, y = cell_decode(cells)
        byc = {int(c): (int(zz), int(xx), int(yy)) for c, zz, xx, yy in zip(cells, z, x, y)}
        for r in rows:
            assert (r["z"], r["x"], r["y"]) == byc[r["cell"]]


def test_line_bbox_cover(spark):
    # a line spanning 2 tiles at z=10
    df = spark.createDataFrame([_line(1, [(0.01, 0.01), (0.5, 0.01)])], FEATURE_SCHEMA)
    cells = [r["cell"] for r in with_tile_cells(df, 10, 10).select("cell").collect()]
    z, x, y = cell_decode(np.array(cells))
    assert (z == 10).all()
    assert len(cells) == len(set(cells))
    exp_x0, _ = (int(a[0]) for a in __import__(
        "osm_export_tool_python_spark.functions.cells", fromlist=["lonlat_to_tile"]
    ).lonlat_to_tile([0.01], [0.01], 10))
    assert exp_x0 in x.tolist()


def test_tile_counts_multizoom(spark):
    df = spark.createDataFrame([_pt(i, 10.0 + i * 1e-4, 50.0) for i in range(20)], FEATURE_SCHEMA)
    counts = tile_counts(df, 0, 4).collect()
    by_z = {}
    for r in counts:
        by_z.setdefault(r["z"], 0)
        by_z[r["z"]] += r["n_features"]
    # every zoom sees all 20 features (they share tiles at coarse zooms)
    assert by_z == {z: 20 for z in range(5)}


def test_salted_packing_equals_unsalted(spark):
    rng = np.random.default_rng(5)
    rows = [_pt(i, float(13.4 + rng.normal() * 0.01), float(52.5 + rng.normal() * 0.01)) for i in range(200)]
    df = spark.createDataFrame(rows, FEATURE_SCHEMA)
    a = {
        (r["z"], r["x"], r["y"]): (r["n_features"], tuple(r["osm_ids"]))
        for r in tile_features(df, 6, 8, salt=16).collect()
    }
    b = {
        (r["z"], r["x"], r["y"]): (r["n_features"], tuple(r["osm_ids"]))
        for r in tile_features(df, 6, 8, salt=1).collect()
    }
    assert a == b
    assert sum(v[0] for v in a.values()) == 600  # 200 pts × 3 zooms
