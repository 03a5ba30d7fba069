"""A/B `spark.sql.execution.arrow.maxRecordsPerBatch` on the headline
export pipeline (guide §4.2: raise for narrow numeric data, lower for
wide rows).  The conf is a runtime SQL conf, so both arms run
interleaved inside ONE session — same JVM, same caches, same VM
window.  Usage:

  python scripts/exp_arrow_batch.py [scale] [reps] [batchB]

Default: scale=10 (the driver's sf1.0 batch, 550k docs), 3 reps/arm,
B=65536 vs the 10000 default.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def main():
    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    batch_b = int(sys.argv[3]) if len(sys.argv) > 3 else 65536

    from osm_export_tool_python_spark.plans.session import default_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = default_session(
        master="local[%d]" % cpus,
        shuffle_partitions=2 * cpus,
        app_name="exp-arrow-batch",
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs_path = "/tmp/exp_arrow_docs_%s" % scale
    bench.prepare_osm_input(
        spark, int(40000 * scale), int(10000 * scale), int(500 * scale), docs_path
    )
    default = int(spark.conf.get(CONF))

    # untimed warmup (JIT, worker pool, shuffle dirs)
    bench.osm_pipeline_counts(spark, docs_path)

    arms = {"A_default_%d" % default: default, "B_%d" % batch_b: batch_b}
    walls = {k: [] for k in arms}
    counts = {}
    order = list(arms.items())
    for r in range(reps):
        # ABBA: alternate arm order each rep so intra-session warmup
        # drift cancels instead of crediting whichever arm runs later
        for name, val in (order if r % 2 == 0 else order[::-1]):
            spark.conf.set(CONF, str(val))
            spark.sparkContext.setJobDescription("exp_arrow:%s" % name)
            t0 = time.perf_counter()
            c = bench.osm_pipeline_counts(spark, docs_path)
            walls[name].append(round(time.perf_counter() - t0, 3))
            counts.setdefault(name, c)
            spark.sparkContext.setJobDescription(None)
    spark.conf.set(CONF, str(default))

    out = {
        "conf": CONF,
        "scale": scale,
        "walls": walls,
        "mins": {k: min(v) for k, v in walls.items()},
        "meds": {k: sorted(v)[len(v) // 2] for k, v in walls.items()},
        "counts_equal": len(set(counts.values())) == 1,
        "counts": {k: list(v) for k, v in counts.items()},
        "vm_probe_sha1t": bench.vm_probe(4)["sha_1t_sec"],
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
