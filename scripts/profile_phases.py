"""Phase-level scaling profiler: times each pipeline phase separately at
two parallelism levels to locate where N->4N efficiency is lost.

Usage:
  python scripts/profile_phases.py PREP NODES WAYS RELS   # synth input
  python scripts/profile_phases.py RUN CPUS [HEAP]        # one level
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS_PATH = "/tmp/spark_osm_profile_docs"


def run(cpus: int, heap: str):
    import numpy as np

    os.environ["SPARK_OSM_DRIVER_MEM"] = heap
    from bench import BENCH_MAPPING, prepare_osm_input
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators import assemble
    from osm_export_tool_python_spark.operators.clip import AOI, clip_features
    from osm_export_tool_python_spark.operators.themes import prefilter, theme_fanout
    from osm_export_tool_python_spark.operators.tiles import tile_counts
    from osm_export_tool_python_spark.plans.session import default_session
    from osm_export_tool_python_spark.sources import decode

    spark = default_session(
        master="local[%d]" % cpus, shuffle_partitions=2 * cpus, app_name="prof"
    )
    spark.sparkContext.setLogLevel("ERROR")
    prepare_osm_input(spark, 800, 200, 10, "/tmp/spark_osm_profile_warm")
    from bench import osm_pipeline_counts

    osm_pipeline_counts(spark, "/tmp/spark_osm_profile_warm")

    mapping = Mapping(BENCH_MAPPING)
    t = {}

    def mark(name, t0):
        t[name] = round(time.perf_counter() - t0, 2)

    docs = spark.read.parquet(DOCS_PATH)
    meta = decode.with_entity_meta(docs)

    t0 = time.perf_counter()
    entities = decode.entities_table(meta).persist()
    entities.count()
    mark("decode_entities", t0)

    nodes = decode.nodes_from_entities(entities)
    ways = decode.ways_from_entities(entities)
    way_refs = decode.way_refs_from_entities(entities)
    members = decode.rel_members_from_entities(entities)

    t0 = time.perf_counter()
    wcoords = assemble.way_coords(way_refs, nodes, ways).persist()
    wcoords.count()
    mark("way_coords_join", t0)

    pts = assemble.point_features(nodes)
    lines = assemble.line_features(wcoords)
    way_polys = assemble.closed_way_polygon_features(wcoords)
    rel_polys = assemble.relation_polygon_features(
        members.where(assemble.closed_way_is_polygon_col("tags")), wcoords
    )
    feats = (
        pts.unionByName(lines).unionByName(way_polys).unionByName(rel_polys)
    )
    feats._persisted_intermediates = []

    t0 = time.perf_counter()
    filtered = prefilter(feats, mapping)
    aoi = AOI([np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])])
    clipped = clip_features(filtered, aoi, persist=True)
    mark("prefilter_clip_classify", t0)

    t0 = time.perf_counter()
    themed = theme_fanout(clipped, mapping).persist()
    n_features = themed.count()
    mark("theme_fanout_count", t0)

    t0 = time.perf_counter()
    n_tiles = tile_counts(themed.dropDuplicates(["osm_id", "src"]), 2, 8).count()
    mark("tile_count", t0)

    t["total"] = round(sum(v for k, v in t.items() if k != "total"), 2)
    print(
        "PROF_RESULT "
        + json.dumps({"cpus": cpus, "heap": heap, "features": n_features, "tiles": n_tiles, "phases": t})
    )
    spark.stop()


def prep(n_nodes, n_ways, n_rels):
    from bench import prepare_osm_input
    from osm_export_tool_python_spark.plans.session import default_session

    spark = default_session(master="local[32]", shuffle_partitions=64, app_name="prep")
    spark.sparkContext.setLogLevel("ERROR")
    prepare_osm_input(spark, n_nodes, n_ways, n_rels, DOCS_PATH)
    print("prepared", spark.read.parquet(DOCS_PATH).count())
    spark.stop()


if __name__ == "__main__":
    if sys.argv[1] == "PREP":
        prep(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    else:
        run(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else "24g")
