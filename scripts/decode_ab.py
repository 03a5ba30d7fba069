"""Decode-phase cost decomposition: which layer of the entities phase
burns the core-seconds, and which materialization shape scales.

The phase profiler (BENCH/PROFILE_PHASES.json) shows the entities
checkpoint phase scaling at 0.45 efficiency 2->8 pinned cores with its
JVM core-seconds DOUBLING (745 -> 1575 cpu-s) while pure-CPU probes
scale at ~0.9 — an allocation/memory-bandwidth signature.  This script
separates the layers:

  scan          read+count the raw documents (parquet scan ceiling)
  tags          + the map_from_entries tag-decode HOF chain
  decode        + way/rel HOFs + WKB pandas-udf  (= entities_table)
  ckpt          + localCheckpoint row store      (= the bench shape)
  pq            entities written to local parquet and re-read (columnar
                store alternative: lineage-flat AND column-pruned)

Usage:
  python scripts/decode_ab.py RUN CPUS [DOCS]     # one pinned child
  python scripts/decode_ab.py DRIVE [DOCS]        # 8 then 2, report
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DOCS_PATH = "/tmp/spark_osm_scaling_docs"
PQ_PATH = "/tmp/spark_osm_decode_ab_entities"


def run(cpus: int, docs_path: str):
    os.environ.setdefault("SPARK_OSM_DRIVER_MEM", "%dg" % min(12 * cpus, 96))
    from bench import prepare_osm_input, vm_probe
    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.plans.session import default_session
    from osm_export_tool_python_spark.sources import decode
    from pyspark.sql import functions as F

    spark = default_session(
        master="local[%d]" % cpus, shuffle_partitions=2 * cpus,
        app_name="decode-ab-%d" % cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    prepare_osm_input(spark, 800, 200, 10, "/tmp/spark_osm_profile_warm")
    meta_w = decode.with_entity_meta(spark.read.parquet("/tmp/spark_osm_profile_warm"))
    decode.entities_table(meta_w).count()
    probe = vm_probe(cpus)

    docs = spark.read.parquet(docs_path)
    t = {}

    def mark(name, fn):
        t0 = time.perf_counter()
        out = fn()
        t[name] = round(time.perf_counter() - t0, 2)
        return out

    mark("scan", lambda: docs.count())
    meta = decode.with_entity_meta(docs)
    mark("tags", lambda: meta.select("src", "orig_id", "tags").count())
    ents = decode.entities_table(meta)
    mark("decode", lambda: ents.count())
    ck = mark("ckpt", lambda: lineage.eager_local_checkpoint(ents))
    mark("ckpt_reread", lambda: ck.select(F.sum("n_refs")).collect())
    lineage.release(ck)

    shutil.rmtree(PQ_PATH, ignore_errors=True)
    mark("pq_write", lambda: ents.write.mode("overwrite").parquet(PQ_PATH))
    pq = spark.read.parquet(PQ_PATH)
    mark("pq_reread", lambda: pq.select(F.sum("n_refs")).collect())

    result = {"cpus": cpus, "heap": os.environ["SPARK_OSM_DRIVER_MEM"],
              "phases": t, "vm_probe": probe}
    print("AB_RESULT " + json.dumps(result))
    spark.stop()
    return result


def drive(docs_path: str):
    out = {}
    for cpus in (8, 2):
        env = dict(os.environ)
        env["SPARK_OSM_DRIVER_MEM"] = "%dg" % min(12 * cpus, 96)
        p = subprocess.run(
            ["taskset", "-c", "0-%d" % (cpus - 1), sys.executable,
             os.path.abspath(__file__), "RUN", str(cpus), docs_path],
            capture_output=True, text=True, env=env,
        )
        for line in p.stdout.splitlines():
            if line.startswith("AB_RESULT "):
                out[cpus] = json.loads(line[len("AB_RESULT "):])
        if cpus not in out:
            print("child %d failed:\n%s\n%s" % (cpus, p.stdout[-3000:], p.stderr[-3000:]))
            return
    with open(os.path.join(REPO, "BENCH", "DECODE_AB.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if sys.argv[1] == "DRIVE":
        drive(sys.argv[2] if len(sys.argv) > 2 else DOCS_PATH)
    else:
        run(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else DOCS_PATH)
