"""Phase-level scaling profiler: locate WHERE the N->4N pinned-core
efficiency is lost, on the EXACT timed pipeline bench_scaling times.

Unlike a wall-only A/B, this instruments one full `osm_pipeline_counts`
run per level with three independent views:

  1. phase marks — every `lineage.eager_local_checkpoint` and every
     `DataFrame.count` is timed in call order (the bench pipeline's
     materialization points), so the wall decomposes into
     decode/assembly/theme/tile phases without changing the plan shape;
  2. Spark stage metrics — pulled from the live UI REST API after the
     timed run: per-stage executorRunTime / executorCpuTime / GC /
     shuffle bytes, plus the wall-vs-task-time gap that separates
     "tasks got slower" (compute contention) from "cores sat idle"
     (driver/serial time, stragglers, low-parallelism stages);
  3. calibration microbenches in the SAME pinned session — a pure-JVM
     codegen sum and a pandas-UDF (Arrow worker) sum, which bound how
     well ANY Spark work can scale under this pin on this VM.

Usage (each RUN child is expected to be launched under
`taskset -c 0..N-1`; the driver mode does that):

  python scripts/profile_phases.py PREP NODES WAYS RELS   # synth input
  python scripts/profile_phases.py RUN CPUS [DOCS]        # one level
  python scripts/profile_phases.py DRIVE [DOCS]           # 2 then 8
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS_PATH = "/tmp/spark_osm_scaling_docs"


def _stage_metrics(spark):
    """All completed stages from the live UI REST API (local mode)."""
    base = spark.sparkContext.uiWebUrl
    if not base:
        return []
    apps = json.load(urllib.request.urlopen(base + "/api/v1/applications"))
    app_id = apps[0]["id"]
    return json.load(
        urllib.request.urlopen(
            "%s/api/v1/applications/%s/stages?status=complete" % (base, app_id)
        )
    )


def run(cpus: int, docs_path: str):
    os.environ.setdefault("SPARK_OSM_DRIVER_MEM", "%dg" % min(12 * cpus, 96))
    from bench import osm_pipeline_counts, prepare_osm_input, vm_probe
    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.plans.session import default_session
    import pyspark.sql.dataframe as dfmod

    spark = default_session(
        master="local[%d]" % cpus, shuffle_partitions=2 * cpus,
        app_name="prof-%d" % cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    prepare_osm_input(spark, 800, 200, 10, "/tmp/spark_osm_profile_warm")
    osm_pipeline_counts(spark, "/tmp/spark_osm_profile_warm")
    probe = vm_probe(cpus)

    # --- calibration: pure-JVM codegen scaling under this pin
    t0 = time.perf_counter()
    spark.range(0, 2_000_000_000, 1, 4 * cpus).selectExpr(
        "sum(id % 7)"
    ).collect()
    jvm_cal = round(time.perf_counter() - t0, 2)

    # --- calibration: Arrow/pandas-UDF worker scaling under this pin
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _heavy(x):
        import numpy as np

        v = x.to_numpy(dtype="float64")
        acc = v.copy()
        for _ in range(200):
            acc = np.sqrt(acc * acc + 1.0)
        import pandas as pd

        return pd.Series(acc)

    cal_df = spark.range(0, 40_000_000, 1, 4 * cpus).select(
        _heavy(F.col("id").cast("double")).alias("v")
    )
    t0 = time.perf_counter()
    cal_df.selectExpr("sum(v)").collect()
    udf_cal = round(time.perf_counter() - t0, 2)

    # --- instrument the bench pipeline's materialization points
    events = []
    orig_ckpt = lineage.eager_local_checkpoint
    orig_count = dfmod.DataFrame.count

    def timed_ckpt(df, *a, **k):
        t0 = time.perf_counter()
        out = orig_ckpt(df, *a, **k)
        events.append(["ckpt", round(time.perf_counter() - t0, 2)])
        return out

    def timed_count(self):
        t0 = time.perf_counter()
        out = orig_count(self)
        events.append(["count", round(time.perf_counter() - t0, 2)])
        return out

    lineage.eager_local_checkpoint = timed_ckpt
    dfmod.DataFrame.count = timed_count
    pre_stages = {s["stageId"] for s in _stage_metrics(spark)}
    t0 = time.perf_counter()
    try:
        n_features, n_tiles = osm_pipeline_counts(spark, docs_path)
    finally:
        lineage.eager_local_checkpoint = orig_ckpt
        dfmod.DataFrame.count = orig_count
    wall = round(time.perf_counter() - t0, 2)

    stages = [s for s in _stage_metrics(spark) if s["stageId"] not in pre_stages]
    tot_run_ms = sum(s.get("executorRunTime", 0) for s in stages)
    tot_cpu_ms = sum(s.get("executorCpuTime", 0) for s in stages) / 1e6
    tot_gc_ms = sum(s.get("jvmGcTime", 0) for s in stages)
    top = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:12]
    top_stages = [
        {
            "id": s["stageId"],
            "name": s.get("name", "")[:60],
            "tasks": s.get("numCompleteTasks"),
            "runtime_s": round(s.get("executorRunTime", 0) / 1e3, 1),
            "cpu_s": round(s.get("executorCpuTime", 0) / 1e9, 1),
            "gc_s": round(s.get("jvmGcTime", 0) / 1e3, 1),
            "shuf_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
            "shuf_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
        }
        for s in top
    ]
    result = {
        "cpus": cpus,
        "heap": os.environ["SPARK_OSM_DRIVER_MEM"],
        "wall_s": wall,
        "features": n_features,
        "tiles": n_tiles,
        "events": events,
        "events_sum_s": round(sum(e[1] for e in events), 2),
        "jvm_cal_s": jvm_cal,
        "udf_cal_s": udf_cal,
        "vm_probe": probe,
        "n_stages": len(stages),
        "task_runtime_s": round(tot_run_ms / 1e3, 1),
        "task_cpu_s": round(tot_cpu_ms / 1e3, 1),
        "task_gc_s": round(tot_gc_ms / 1e3, 1),
        # wall * cores - task_runtime = core-seconds the pin had
        # available but no task occupied: driver time, stage gaps,
        # straggler tails, sub-width stages
        "idle_core_s": round(wall * cpus - tot_run_ms / 1e3, 1),
        "top_stages": top_stages,
    }
    print("PROF_RESULT " + json.dumps(result))
    spark.stop()
    return result


def prep(n_nodes, n_ways, n_rels):
    from bench import prepare_osm_input
    from osm_export_tool_python_spark.plans.session import default_session

    spark = default_session(master="local[32]", shuffle_partitions=64, app_name="prep")
    spark.sparkContext.setLogLevel("ERROR")
    prepare_osm_input(spark, n_nodes, n_ways, n_rels, DOCS_PATH)
    print("prepared", spark.read.parquet(DOCS_PATH).count())
    spark.stop()


def drive(docs_path: str):
    out = {}
    for cpus in (2, 8):
        env = dict(os.environ)
        env["SPARK_OSM_DRIVER_MEM"] = "%dg" % min(12 * cpus, 96)
        p = subprocess.run(
            ["taskset", "-c", "0-%d" % (cpus - 1), sys.executable,
             os.path.abspath(__file__), "RUN", str(cpus), docs_path],
            capture_output=True, text=True, env=env,
        )
        for line in p.stdout.splitlines():
            if line.startswith("PROF_RESULT "):
                out[cpus] = json.loads(line[len("PROF_RESULT "):])
        if cpus not in out:
            print("child %d failed:\n%s\n%s" % (cpus, p.stdout[-3000:], p.stderr[-3000:]))
            return
    with open(os.path.join(REPO, "BENCH", "PROFILE_PHASES.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if sys.argv[1] == "PREP":
        prep(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
    elif sys.argv[1] == "DRIVE":
        drive(sys.argv[2] if len(sys.argv) > 2 else DOCS_PATH)
    else:
        run(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else DOCS_PATH)
