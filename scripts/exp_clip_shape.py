"""Round-6 experiment: themed-phase clip shape A/B at driver scale.

A = current shape (clip unmaterialized: kept-union-mapInPandas re-scans
    the feats/prefilter/classify subtree once per union branch)
B = clip checkpoint=True (materialize with_cls once; both branches read
    the checkpointed rows)

Interleaved repeats; each arm runs the themed phase exactly as
bench.osm_pipeline_counts does (entities/wcoords checkpointed first,
untimed, shared by both arms).  Also prints the i/b/o class counts so
the candidate fraction is on record.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    from pyspark.sql import functions as F

    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators import assemble
    from osm_export_tool_python_spark.operators.clip import AOI, clip_features
    from osm_export_tool_python_spark.operators.themes import (
        prefilter,
        theme_fanout,
    )
    from osm_export_tool_python_spark.plans.session import default_session
    from osm_export_tool_python_spark.sources import decode

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = default_session(
        master="local[%d]" % cpus,
        shuffle_partitions=2 * cpus,
        app_name="exp-clip-shape",
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.prepare_osm_input(spark, 800, 200, 10, "/tmp/spark_osm_bench_warmup")
    bench.osm_pipeline_counts(spark, "/tmp/spark_osm_bench_warmup")

    docs_path = "/tmp/spark_osm_bench_docs_sf%s" % str(scale)
    bench.prepare_osm_input(
        spark, int(40000 * scale), int(10000 * scale), int(500 * scale), docs_path
    )

    mapping = Mapping(bench.BENCH_MAPPING)
    docs = spark.read.parquet(docs_path)
    # untimed: decode + assembly checkpoints shared by every arm
    feats = assemble.assemble_features(
        decode.with_entity_meta(docs), checkpoint=True, mapping=mapping
    )
    filtered = prefilter(feats, mapping)
    aoi = AOI([np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])])

    # class counts (diagnostic, untimed)
    from osm_export_tool_python_spark.operators.clip import DEFAULT_COVER_ZOOM  # noqa

    xmin, ymin = F.array_min("xs"), F.array_min("ys")
    xmax, ymax = F.array_max("xs"), F.array_max("ys")
    W, S, E, N = aoi.bbox
    disjoint = (xmax < W) | (xmin > E) | (ymax < S) | (ymin > N)
    inside = (xmin > W) & (xmax < E) & (ymin > S) & (ymax < N)
    cls = F.when(disjoint, "o").when(inside, "i").otherwise("b")
    counts = {
        r["c"]: r["n"]
        for r in filtered.withColumn("c", cls).groupBy(F.col("c")).agg(
            F.count("*").alias("n")
        ).collect()
    }
    print("class_counts", json.dumps(counts), flush=True)

    def run(ck):
        t0 = time.perf_counter()
        clipped = clip_features(filtered, aoi, checkpoint=ck)
        themed = lineage.eager_checkpoint(theme_fanout(clipped, mapping), "local")
        n = themed.count()
        dt = time.perf_counter() - t0
        lineage.release(themed)
        extra = feats._persisted_intermediates
        # clip_features appends its checkpoint to the shared list; pop
        # and release so arms stay independent
        while len(extra) > 2:
            lineage.release(extra.pop())
        return n, round(dt, 3)

    samples = {"A_nockpt": [], "B_ckpt": []}
    ns = set()
    for _ in range(reps):
        for name, ck in (("A_nockpt", False), ("B_ckpt", True)):
            spark.sparkContext.setJobDescription("exp:%s" % name)
            n, dt = run(ck)
            ns.add(n)
            samples[name].append(dt)
    print(
        json.dumps(
            {
                "scale": scale,
                "n_themed": sorted(ns),
                "samples": samples,
                "mins": {k: min(v) for k, v in samples.items()},
                "meds": {
                    k: sorted(v)[len(v) // 2] for k, v in samples.items()
                },
                "probe_sha1t": bench.vm_probe(4)["sha_1t_sec"],
            }
        ),
        flush=True,
    )
    lineage.release(*feats._persisted_intermediates)
    spark.stop()


if __name__ == "__main__":
    main()
