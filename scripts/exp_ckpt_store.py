"""ABBA A/B of the checkpoint STORE (local row store vs parquet) on
the headline pipeline at a given synth scale — resolves the question
of where AUTO_PARQUET_THRESHOLD should sit relative to the driver's
sf1.0 batch (24 MB compressed input → ~360 MB decoded rows).

  python scripts/exp_ckpt_store.py [scale] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6

    from osm_export_tool_python_spark.plans.session import default_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = default_session(
        master="local[%d]" % cpus,
        shuffle_partitions=2 * cpus,
        app_name="exp-ckpt-store",
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs_path = "/tmp/exp_ckpt_docs_%s" % scale
    bench.prepare_osm_input(
        spark, int(40000 * scale), int(10000 * scale), int(500 * scale), docs_path
    )
    bench.osm_pipeline_counts(spark, docs_path)  # untimed warmup

    arms = ["local", "parquet"]
    walls = {k: [] for k in arms}
    counts = {}
    for r in range(reps):
        for mode in (arms if r % 2 == 0 else arms[::-1]):
            spark.sparkContext.setJobDescription("exp_ckpt:%s" % mode)
            t0 = time.perf_counter()
            c = bench.osm_pipeline_counts(spark, docs_path, ckpt=mode)
            walls[mode].append(round(time.perf_counter() - t0, 3))
            counts.setdefault(mode, c)
            spark.sparkContext.setJobDescription(None)

    out = {
        "scale": scale,
        "walls": walls,
        "mins": {k: min(v) for k, v in walls.items()},
        "meds": {k: sorted(v)[len(v) // 2] for k, v in walls.items()},
        "counts_equal": len(set(counts.values())) == 1,
        "vm_probe_sha1t": bench.vm_probe(4)["sha_1t_sec"],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
