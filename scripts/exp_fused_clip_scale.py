"""Fused vs union clip shape at larger scale (perf only; parity proven
by exp_fused_clip.py).  Usage: exp_fused_clip_scale.py [reps] [scale]"""

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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0

    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators import assemble, clip as clipmod
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
        app_name="exp-fused-clip-scale",
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.prepare_osm_input(spark, 800, 200, 10, "/tmp/spark_osm_bench_warmup")
    bench.osm_pipeline_counts(spark, "/tmp/spark_osm_bench_warmup")

    docs_path = "/tmp/exp_clip_docs_sf%s" % str(scale)
    if not os.path.exists(docs_path):
        bench.prepare_osm_input(
            spark,
            int(40000 * scale),
            int(10000 * scale),
            int(500 * scale),
            docs_path,
            compact=True,
        )
    mapping = Mapping(bench.BENCH_MAPPING)
    feats = assemble.assemble_features(
        decode.with_entity_meta(spark.read.parquet(docs_path)),
        checkpoint=True,
        mapping=mapping,
    )
    filtered = prefilter(feats, mapping)
    aoi = AOI([np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])])

    def run():
        t0 = time.perf_counter()
        clipped = clip_features(filtered, aoi)
        themed = lineage.eager_checkpoint(theme_fanout(clipped, mapping), "local")
        n = themed.count()
        dt = time.perf_counter() - t0
        lineage.release(themed)
        return n, round(dt, 3)

    samples = {"fused": [], "union": []}
    ns = set()
    for _ in range(reps):
        for shape in ("fused", "union"):
            clipmod.CLIP_SHAPE = shape
            spark.sparkContext.setJobDescription("exp-clip-scale:%s" % shape)
            n, dt = run()
            ns.add(n)
            samples[shape].append(dt)
    print(
        json.dumps(
            {
                "scale": scale,
                "n_themed": sorted(ns),
                "samples": samples,
                "mins": {k: min(v) for k, v in samples.items()},
                "probe_sha1t": bench.vm_probe(4)["sha_1t_sec"],
            }
        ),
        flush=True,
    )
    lineage.release(*feats._persisted_intermediates)
    spark.stop()


if __name__ == "__main__":
    main()
