"""Round-6 experiment: fused vs union clip shape — row-level parity +
interleaved perf A/B at driver scale.

Parity: full multiset equality of clipped feature rows (canonicalized
tags map, exact float equality — both shapes run the identical numpy
kernel) across three AOI routes: axis-rect (Column classify), concave
triangle (pandas classify + ear-clip cut), and an invalid bowtie-ring
AOI (keep-uncut fallback, clip_polys=None).

Perf: themed-phase wall (clip consumer: theme_fanout → localCheckpoint
→ count) interleaved fused/union at scale 10 (the driver's sf1.0
batch).
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


def canon_rows(df):
    from pyspark.sql import functions as F

    out = df.select(
        "osm_id",
        "src",
        "geom_type",
        F.sort_array(F.map_entries("tags")).alias("t"),
        "xs",
        "ys",
        "ring_offsets",
        "part_offsets",
    ).collect()
    return sorted(
        (
            r["osm_id"],
            r["src"],
            r["geom_type"],
            tuple((e["key"], e["value"]) for e in r["t"]),
            tuple(r["xs"]),
            tuple(r["ys"]),
            tuple(r["ring_offsets"]),
            tuple(r["part_offsets"]),
        )
        for r in out
    )


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

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
        app_name="exp-fused-clip",
    )
    spark.sparkContext.setLogLevel("ERROR")
    bench.prepare_osm_input(spark, 800, 200, 10, "/tmp/spark_osm_bench_warmup")
    bench.osm_pipeline_counts(spark, "/tmp/spark_osm_bench_warmup")

    # ---------------- parity at scale 1.0 (55k docs) ----------------
    pdocs = "/tmp/spark_osm_bench_docs_sf1.0"
    bench.prepare_osm_input(spark, 40000, 10000, 500, pdocs)
    mapping = Mapping(bench.BENCH_MAPPING)
    feats = assemble.assemble_features(
        decode.with_entity_meta(spark.read.parquet(pdocs)),
        checkpoint=True,
        mapping=mapping,
    )
    filtered = prefilter(feats, mapping)
    aois = {
        "rect": AOI(
            [np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])]
        ),
        "concave": AOI(
            [np.array([[-15.0, -8.0], [38.0, -8.0], [-15.0, 52.0]])]
        ),
        "bowtie_fallback": AOI(
            [np.array([[0.0, 0.0], [30.0, 40.0], [30.0, 0.0], [0.0, 40.0]])]
        ),
    }
    for name, aoi in aois.items():
        rows = {}
        for shape in ("fused", "union"):
            clipmod.CLIP_SHAPE = shape
            rows[shape] = canon_rows(clip_features(filtered, aoi))
        same = rows["fused"] == rows["union"]
        print(
            "parity",
            name,
            "rows=%d" % len(rows["fused"]),
            "MATCH" if same else "MISMATCH",
            flush=True,
        )
        if not same:
            fu, un = rows["fused"], rows["union"]
            only_f = [r for r in fu if r not in un][:3]
            only_u = [r for r in un if r not in fu][:3]
            print("only_fused", only_f)
            print("only_union", only_u)
            sys.exit(1)

    # ---------------- perf A/B at driver scale ----------------
    docs_path = "/tmp/spark_osm_bench_docs_sf%s" % str(scale)
    bench.prepare_osm_input(
        spark, int(40000 * scale), int(10000 * scale), int(500 * scale), docs_path
    )
    feats10 = assemble.assemble_features(
        decode.with_entity_meta(spark.read.parquet(docs_path)),
        checkpoint=True,
        mapping=mapping,
    )
    filtered10 = prefilter(feats10, mapping)
    aoi = aois["rect"]

    def run():
        t0 = time.perf_counter()
        clipped = clip_features(filtered10, aoi)
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
            spark.sparkContext.setJobDescription("exp-clip:%s" % shape)
            n, dt = run()
            ns.add(n)
            samples[shape].append(dt)
    clipmod.CLIP_SHAPE = "fused"
    print(
        json.dumps(
            {
                "scale": scale,
                "n_themed": sorted(ns),
                "samples": samples,
                "mins": {k: min(v) for k, v in samples.items()},
                "meds": {k: sorted(v)[len(v) // 2] for k, v in samples.items()},
                "probe_sha1t": bench.vm_probe(4)["sha_1t_sec"],
            }
        ),
        flush=True,
    )
    lineage.release(*feats._persisted_intermediates)
    lineage.release(*feats10._persisted_intermediates)
    spark.stop()


if __name__ == "__main__":
    main()
