"""End-to-end export: themes → sinks → manifest → resume, WKT/KML
serialization, centroid mode."""

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_export_tool_python_spark.functions.mapping import Mapping
from osm_export_tool_python_spark.plans.export import export
from osm_export_tool_python_spark.plans.sinks import launder_name
from osm_export_tool_python_spark.sources import synth

MAPPING_YAML = """
buildings:
  types:
    - polygons
  select:
    - name
    - building
  where: building = 'yes'
roads:
  types:
    - lines
  select:
    - highway
    - name
  where: highway IS NOT NULL
pois:
  types:
    - points
  select:
    - amenity
    - addr:housenumber
  where: amenity IS NOT NULL
"""


@pytest.fixture(scope="module")
def docs(spark):
    return synth.synthesize(spark, n_nodes=1500, n_ways=400, n_rels=20)


def test_export_all_formats(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export"))
    mapping = Mapping(MAPPING_YAML)
    payload = export(
        spark,
        docs,
        mapping,
        out,
        formats=("gpkg", "shp", "kml", "tiles"),
        tile_zooms=(4, 6),
    )
    assert payload["metrics"]["themed_features"] > 0
    themes = {e["theme"] for e in payload["entries"]}
    assert {"buildings", "roads", "pois", "*"} <= themes

    # gpkg-equiv: mixed geom per theme, WKT geometry column
    gdf = spark.read.parquet(os.path.join(out, "gpkg", "buildings"))
    assert "geometry" in gdf.columns and "building" in gdf.columns
    r = gdf.where(F.col("geometry").startswith("MULTIPOLYGON")).first()
    assert r is not None
    assert gdf.where(~F.col("geometry").startswith("MULTIPOLYGON")).count() == 0

    # shp-equiv: laundered names
    sdf = spark.read.parquet(os.path.join(out, "shp", "pois_point"))
    assert launder_name("addr:housenumber") == "addrhousen"
    assert "addrhousen" in sdf.columns

    # kml-equiv: placemark snippets
    kdf = spark.read.parquet(os.path.join(out, "kml", "roads_line"))
    assert kdf.where(~F.col("kml").startswith("<LineString>")).count() == 0

    # tiles
    tdf = spark.read.parquet(os.path.join(out, "tiles"))
    assert set(tdf.columns) == {"z", "x", "y", "n_features", "osm_ids"}
    assert tdf.where((F.col("z") < 4) | (F.col("z") > 6)).count() == 0

    # manifest file exists and matches payload
    with open(os.path.join(out, "manifest.json")) as f:
        on_disk = json.load(f)
    assert on_disk["entries"] == payload["entries"]


def test_export_resume_skips_done(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export_resume"))
    mapping = Mapping(MAPPING_YAML)
    export(spark, docs, mapping, out, formats=("gpkg",))
    # tamper: write a sentinel into one output dir; resume must NOT rewrite
    sentinel = os.path.join(out, "gpkg", "buildings", "SENTINEL")
    open(sentinel, "w").write("x")
    payload2 = export(spark, docs, mapping, out, formats=("gpkg",))
    assert os.path.exists(sentinel), "resume rewrote a done part"
    # and the manifest still lists recovered entries for all themes
    assert {e["theme"] for e in payload2["entries"]} == {"buildings", "roads", "pois"}


def test_export_with_aoi_and_centroids(spark, docs, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("export_aoi"))
    mapping = Mapping(MAPPING_YAML)
    aoi = [np.array([[0.0, 40.0], [20.0, 40.0], [20.0, 55.0], [0.0, 55.0]])]
    payload = export(
        spark, docs, mapping, out, aoi_rings=aoi, formats=("gpkg",), polygon_centroid=True
    )
    bdf = spark.read.parquet(os.path.join(out, "gpkg", "buildings"))
    rows = bdf.collect()
    assert rows, "AOI export produced no building rows"
    # centroid mode: all polygons became points
    assert all(r["geom_type"] == "point" for r in rows)
    assert all(r["geometry"].startswith("POINT") for r in rows)
    # centroids inside the AOI box (outer-ring centroid of clipped polys)
    for r in rows:
        x, y = r["geometry"][7:-1].split(" ")
        assert -0.5 <= float(x) <= 20.5 and 39.5 <= float(y) <= 55.5
