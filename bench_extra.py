"""Round-6 optimization measurement harness (bench.py stays frozen).

Modes:
  suite   — re-time the 8 frozen-bench queries (same closures via
            `import bench`) with N interleaved repeats; prints per-query
            min/median so before/after deltas are attributable.
  phases  — break the osm_export headline pipeline into its timed
            phases (decode ckpt, wcoords ckpt, themed ckpt, count,
            dedup+tiles) to localize the wall time.
  explain — dump .explain("formatted") for every bench query path to
            plans/r06/<name>_<tag>.txt (the judge-readable evidence).

Usage:
  python bench_extra.py suite   [repeats] [tag]
  python bench_extra.py phases  [tag]
  python bench_extra.py explain <tag>        # tag: before|after
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen driver-contract module, reused read-only)


def _session():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        scale = max(float(sf) * 10.0, 0.05)
    except ValueError:
        sf, scale = "0.1", 1.0
    from osm_export_tool_python_spark.plans.session import default_session

    spark = default_session(
        master="local[%d]" % cpus,
        shuffle_partitions=2 * cpus,
        app_name="spark-osm-export-bench-extra",
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark, sf_dir, scale


def _warm(spark):
    warm = "/tmp/spark_osm_bench_warmup"
    bench.prepare_osm_input(spark, 800, 200, 10, warm)
    bench.osm_pipeline_counts(spark, warm)


def run_suite(repeats=3, tag=""):
    spark, sf_dir, scale = _session()
    _warm(spark)
    queries = bench.bench_queries(spark, sf_dir, scale)
    samples = {name: [] for name in queries}
    for _ in range(repeats):
        for name, fn in queries.items():
            spark.sparkContext.setJobDescription("bench_extra:%s" % name)
            t0 = time.perf_counter()
            fn()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "tag": tag,
        "sf_dir": sf_dir,
        "mins": {k: min(v) for k, v in samples.items()},
        "samples": samples,
        "total_min": round(sum(min(v) for v in samples.values()), 3),
        "vm_probe_sha1t": bench.vm_probe(4)["sha_1t_sec"],
    }
    print(json.dumps(out))
    spark.stop()
    return out


def run_phases(tag=""):
    """Time each materialization of the headline pipeline separately
    (same code path as bench.osm_pipeline_counts, ckpt='auto')."""
    import numpy as np

    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators import assemble
    from osm_export_tool_python_spark.operators.clip import AOI, clip_features
    from osm_export_tool_python_spark.operators.themes import prefilter, theme_fanout
    from osm_export_tool_python_spark.operators.tiles import tile_counts
    from osm_export_tool_python_spark.sources import decode

    spark, sf_dir, scale = _session()
    _warm(spark)
    docs_path = "/tmp/spark_osm_bench_docs_sf%s" % str(scale)
    bench.prepare_osm_input(
        spark, int(40000 * scale), int(10000 * scale), int(500 * scale), docs_path
    )

    results = []
    for rep in range(3):
        t = {}
        mapping = Mapping(bench.BENCH_MAPPING)
        docs = spark.read.parquet(docs_path)
        ckpt = lineage.resolve_auto(docs, "auto")
        t["ckpt_mode"] = ckpt

        t0 = time.perf_counter()
        entities = decode.entities_table(decode.with_entity_meta(docs))
        entities = lineage.eager_checkpoint(entities, ckpt)
        t["decode_ckpt"] = round(time.perf_counter() - t0, 3)

        # rebuild the assembly exactly as assemble_features does, but
        # on the already-checkpointed entities so phases separate
        t0 = time.perf_counter()
        from pyspark.sql import functions as F

        from osm_export_tool_python_spark.functions.compile import (
            any_theme_tag_predicate,
            closed_way_is_polygon_col,
        )

        themes = list(mapping.themes)
        nodes = decode.nodes_from_entities(entities)
        members = decode.rel_members_from_entities(entities).where(
            any_theme_tag_predicate(themes, ("polygon",))
        )
        member_ids = members.select(F.col("way_id").alias("orig_id")).dropDuplicates(
            ["orig_id"]
        )
        way_pred = any_theme_tag_predicate(themes, ("line", "polygon"))
        way_entities = entities.where(F.col("src") == "way")
        kept_way_entities = way_entities.where(way_pred).unionByName(
            way_entities.where(~way_pred).join(member_ids, "orig_id", "left_semi")
        )
        ways = decode.ways_from_entities(kept_way_entities)
        way_refs = decode.way_refs_from_entities(kept_way_entities)
        wcoords = assemble.way_coords(way_refs, nodes, ways)
        wcoords = lineage.eager_checkpoint(wcoords, ckpt)
        t["wcoords_ckpt"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        point_nodes = nodes.where(any_theme_tag_predicate(themes, ("point",)))
        pts = assemble.point_features(point_nodes)
        lines = assemble.line_features(wcoords)
        way_polys = assemble.closed_way_polygon_features(wcoords)
        rel_polys = assemble.relation_polygon_features(
            members.where(closed_way_is_polygon_col("tags")), wcoords
        )
        feats = pts.unionByName(lines).unionByName(way_polys).unionByName(rel_polys)
        filtered = prefilter(feats, mapping)
        aoi = AOI(
            [np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])]
        )
        clipped = clip_features(filtered, aoi)
        themed = lineage.eager_checkpoint(theme_fanout(clipped, mapping), ckpt)
        t["themed_ckpt"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        n_features = themed.count()
        t["count"] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        deduped = themed.repartition(nparts, "osm_id", "src").dropDuplicates(
            ["osm_id", "src"]
        )
        n_tiles = tile_counts(deduped, 2, 8, exact=True, strip=False).count()
        t["dedup_tiles"] = round(time.perf_counter() - t0, 3)

        lineage.release(themed, entities, wcoords)
        t["total"] = round(
            sum(v for k, v in t.items() if isinstance(v, float)), 3
        )
        t["n_features"], t["n_tiles"] = n_features, n_tiles
        results.append(t)
    print(json.dumps({"tag": tag, "phases": results}))
    spark.stop()


def _dump_plan(df, name, tag):
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    path = os.path.join(REPO, "plans", "r06", "%s_%s.txt" % (name, tag))
    jvm = df.sparkSession._jvm
    with open(path, "w") as f:
        f.write(
            jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        )
    print("wrote", path)


def run_explain(tag):
    import numpy as np
    from pyspark.sql import functions as F

    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators import assemble
    from osm_export_tool_python_spark.operators.clip import AOI, clip_features
    from osm_export_tool_python_spark.operators.dedup import minhash_dedup
    from osm_export_tool_python_spark.operators.similarity import brute_force_topk
    from osm_export_tool_python_spark.operators.themes import prefilter, theme_fanout
    from osm_export_tool_python_spark.operators.tiles import tile_counts
    from osm_export_tool_python_spark.plans import driver_queries as dq
    from osm_export_tool_python_spark.sources import decode

    spark, sf_dir, scale = _session()
    docs_path = "/tmp/spark_osm_bench_docs_sf%s" % str(scale)
    if not os.path.exists(docs_path):
        bench.prepare_osm_input(
            spark, int(40000 * scale), int(10000 * scale), int(500 * scale), docs_path
        )

    # relational / window / spatial paths straight off the query builders
    _dump_plan(dq.q_pricing_summary(spark, sf_dir), "pricing_summary", tag)
    _dump_plan(dq.q_revenue_by_nation(spark, sf_dir), "revenue_by_nation", tag)
    _dump_plan(dq.q_events_sessionize(spark, sf_dir), "events_sessionize", tag)
    _dump_plan(dq.q_knn_cell_join(spark, sf_dir), "knn_cell_join", tag)
    _dump_plan(dq.q_tile_counts_z8(spark, sf_dir), "tile_counts_z8", tag)

    docs = spark.read.parquet("%s/documents.parquet" % sf_dir)
    _dump_plan(minhash_dedup(docs, threshold=0.8), "minhash_dedup", tag)
    _dump_plan(dq.q_lsh_near_dup(spark, sf_dir), "lsh_near_dup", tag)

    emb = spark.read.parquet("%s/embeddings.parquet" % sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    _dump_plan(brute_force_topk(emb, emb.limit(50), k=10), "ann_top10", tag)

    # osm_export: dump the themed frame (pre-checkpoint lineage) and the
    # tile stage over a checkpointed themed frame (what actually runs)
    mapping = Mapping(bench.BENCH_MAPPING)
    docs_osm = spark.read.parquet(docs_path)
    ckpt = lineage.resolve_auto(docs_osm, "auto")
    feats = assemble.assemble_features(
        decode.with_entity_meta(docs_osm), checkpoint=ckpt, mapping=mapping
    )
    filtered = prefilter(feats, mapping)
    aoi = AOI([np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])])
    clipped = clip_features(filtered, aoi)
    themed_plan = theme_fanout(clipped, mapping)
    _dump_plan(themed_plan, "osm_export_themed", tag)
    themed = lineage.eager_checkpoint(themed_plan, ckpt)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    deduped = themed.repartition(nparts, "osm_id", "src").dropDuplicates(
        ["osm_id", "src"]
    )
    _dump_plan(tile_counts(deduped, 2, 8, exact=True), "osm_export_tiles", tag)
    lineage.release(themed, *feats._persisted_intermediates)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "suite"
    if mode == "suite":
        repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
        tag = sys.argv[3] if len(sys.argv) > 3 else ""
        run_suite(repeats, tag)
    elif mode == "phases":
        run_phases(sys.argv[2] if len(sys.argv) > 2 else "")
    elif mode == "explain":
        run_explain(sys.argv[2] if len(sys.argv) > 2 else "before")
    else:
        raise SystemExit("unknown mode %r" % mode)
