"""Cell-prefix partition pruning: the AOI scan must read only a subset
of partition directories (plan-level PartitionFilters + result parity
with a full-scan filter)."""

import numpy as np
from pyspark.sql import functions as F

from osm_export_tool_python_spark.operators import assemble
from osm_export_tool_python_spark.operators.clip import AOI, clip_features
from osm_export_tool_python_spark.sources import decode, synth
from osm_export_tool_python_spark.sources.tables import (
    read_aoi_pruned,
    with_cell_prefix,
    write_cell_partitioned,
)

SMALL_AOI = [np.array([[12.9, 52.0], [13.9, 52.0], [13.9, 53.0], [12.9, 53.0]])]


def test_pruned_scan_correct_and_partial(spark, tmp_path):
    docs = synth.synthesize(spark, 3000, 600, 20)
    feats = assemble.assemble_features(decode.with_entity_meta(docs))
    path = str(tmp_path / "cellpart")
    write_cell_partitioned(feats, path, zoom=4)

    aoi = AOI(SMALL_AOI)
    pruned = read_aoi_pruned(spark, path, aoi, zoom=4)

    # 1. partition pruning is visible in the plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "cell_prefix" in plan

    # 2. it reads strictly fewer partitions than exist
    all_parts = spark.read.parquet(path).select("cell_prefix").distinct().count()
    read_parts = pruned.select("cell_prefix").distinct().count()
    assert 0 < read_parts < all_parts

    # 3. clipping the pruned scan == clipping the full scan (no loss)
    full = spark.read.parquet(path).dropDuplicates(["osm_id", "src"])
    a = clip_features(pruned.drop("cell_prefix"), aoi)
    b = clip_features(full.drop("cell_prefix"), aoi)
    ka = sorted((r["osm_id"], r["src"]) for r in a.select("osm_id", "src").collect())
    kb = sorted((r["osm_id"], r["src"]) for r in b.select("osm_id", "src").collect())
    assert ka == kb
    assert ka, "AOI over a hot city must catch features"


def test_prefix_assignment_matches_codec(spark):
    from osm_export_tool_python_spark.functions.cells import cell_encode
    from osm_export_tool_python_spark.operators.assemble import FEATURE_SCHEMA

    rows = [
        (1, "node", "point", {"a": "1"}, [13.4], [52.5], [0, 1], [0, 1]),
        (2, "node", "point", {"a": "1"}, [-70.0], [-33.0], [0, 1], [0, 1]),
    ]
    df = with_cell_prefix(spark.createDataFrame(rows, FEATURE_SCHEMA), zoom=4)
    got = {r["osm_id"]: r["cell_prefix"] for r in df.collect()}
    assert got[1] == int(cell_encode(np.array([13.4]), np.array([52.5]), 4)[0])
    assert got[2] == int(cell_encode(np.array([-70.0]), np.array([-33.0]), 4)[0])


def test_multiassignment_covers_wide_features(spark):
    from osm_export_tool_python_spark.operators.assemble import FEATURE_SCHEMA

    # a way spanning ~3 cells of longitude at z4 (cell ≈ 22.5°)
    rows = [(7, "way", "line", {"a": "1"}, [-30.0, 30.0], [10.0, 10.0], [0, 2], [0, 1])]
    df = with_cell_prefix(spark.createDataFrame(rows, FEATURE_SCHEMA), zoom=4)
    assert df.count() >= 3  # duplicated into every covering prefix cell
