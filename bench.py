"""Benchmark runner (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line:  {"metric": ..., "value": <total sec>, "unit": "sec",
        "queries": {name: sec}, "sf": ...}

The headline is the full themed-export pipeline (synthesize →
decode → assemble → theme → clip → tile) whose features/sec is the
BASELINE.md target metric; the remaining queries cover the operator
families (relational, window, dedup, ANN, spatial join/kNN).
Scaling-efficiency runs (local[8] vs local[32]) are produced by
scripts/bench_scaling.py into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


BENCH_MAPPING = (
    "buildings:\n  types: [polygons]\n  select: [name, building]\n"
    "  where: building = 'yes'\n"
    "roads:\n  types: [lines]\n  select: [highway, name]\n"
    "  where: highway IS NOT NULL\n"
    "pois:\n  types: [points]\n  select: [amenity, name]\n"
    "  where: amenity IS NOT NULL\n"
)


def prepare_osm_input(spark, n_nodes, n_ways, n_rels, path, compact=False):
    """Untimed: materialize the interleaved documents table (the
    engine's input is a table on disk per input_hint, not a generator).
    `compact=True` places nodes on a Z-order curve so ways are
    realistically small (see sources/synth.node_lonlat)."""
    from osm_export_tool_python_spark.sources import synth

    synth.synthesize(
        spark, n_nodes=n_nodes, n_ways=n_ways, n_rels=n_rels, compact=compact
    ).write.mode("overwrite").parquet(path)


def osm_pipeline_counts(spark, docs_path, exact_tiles=True, prune=True,
                        strip_tiles=False, collect_routing=None,
                        tile_zooms=(2, 8), ckpt="auto"):
    """The timed headline pipeline; returns (features, tiles) counts.
    `exact_tiles=False` swaps the intersection-exact tile kernel for
    the pure-Column bbox cover — the A/B knob scripts/bench_scaling.py
    --ab-tiles uses to separate the exact kernel's genuine cost from
    VM drift in cross-round wall comparisons.  `prune=False` disables
    mapping-aware assembly pruning (assembles EVERY way, theme filter
    only after assembly) — the --ab-prune knob; outputs are identical
    either way (parity gates in tests/test_assemble.py).
    `strip_tiles=True` enables the 1×N/N×1 pure-Column strip fast
    path inside exact tile assignment — the --ab-strip knob (parity
    gates in tests/test_tiles.py; measured slower than the kernel, so
    OFF by default — see BENCH/AB_STRIP.json).  Pass a dict as `collect_routing`
    to have it filled with the deduped feature set's per-route row
    counts (single/strip/kernel at max zoom) — diagnostic only, adds
    one aggregation pass.

    Lineage-truncation shape (`ckpt` — checkpoint of the decoded
    entities, way-coords and themed frames): each materialized
    intermediate becomes a flat one-node scan, so the count and tile
    actions don't re-run Catalyst over the deep decode/join/union
    tree — measured ~2x end-to-end at this batch size, with far lower
    variance.  The default STORE is `ckpt='auto'`: resolved ONCE from
    the input scan's Catalyst size estimate (lineage.resolve_auto) —
    small batches take localCheckpoint (the parquet write+re-read
    latency, ~1 s per materialization, dominates a seconds-long run),
    large inputs take snappy parquet, which was 15% faster end-to-end
    at 24 M docs and scales 0.86 vs the row store's 0.52 from 2→8
    cores (BENCH/DECODE_AB.json, BENCH/AB_CKPT.json; identical
    outputs either way).  `ckpt='local'`/`'parquet'` pin a store — the
    A/B knobs.  The
    tile stage repartitions by feature key BEFORE dropDuplicates: the
    dedup then reuses that exchange, and the exact-tile kernel runs at
    full parallelism instead of on the 1-2 AQE-coalesced post-shuffle
    partitions a small batch collapses to."""
    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators import assemble
    from osm_export_tool_python_spark.operators.clip import AOI, clip_features
    from osm_export_tool_python_spark.operators.themes import prefilter, theme_fanout
    from osm_export_tool_python_spark.operators.tiles import tile_counts
    from osm_export_tool_python_spark.sources import decode

    mapping = Mapping(BENCH_MAPPING)
    docs = spark.read.parquet(docs_path)
    ckpt = lineage.resolve_auto(docs, ckpt)
    feats = assemble.assemble_features(
        decode.with_entity_meta(docs),
        checkpoint=ckpt,
        mapping=mapping if prune else None,
    )
    filtered = prefilter(feats, mapping)
    filtered._persisted_intermediates = feats._persisted_intermediates
    aoi = AOI([np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])])
    # the clip output is consumed exactly once (by the themed
    # materialization below), so materializing it separately is a pure
    # extra write+read pass over the feature set — measured ~1 s at
    # this batch size with identical outputs
    clipped = clip_features(filtered, aoi)
    themed = lineage.eager_checkpoint(theme_fanout(clipped, mapping), ckpt)
    try:
        n_features = themed.count()
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        deduped = themed.repartition(nparts, "osm_id", "src").dropDuplicates(
            ["osm_id", "src"]
        )
        n_tiles = tile_counts(
            deduped, tile_zooms[0], tile_zooms[1], exact=exact_tiles,
            strip=strip_tiles
        ).count()
        if collect_routing is not None:
            from osm_export_tool_python_spark.operators.tiles import (
                routing_class_counts,
            )

            collect_routing.update(
                routing_class_counts(deduped, tile_zooms[1])
            )
    finally:
        lineage.release(themed, *feats._persisted_intermediates)
    return n_features, n_tiles


def osm_tile_input(spark, docs_path, prune=True):
    """Untimed helper for stage-level tile A/Bs: the deduped feature
    set the tile stage consumes, materialized via localCheckpoint so
    repeated tile_counts timings don't re-run the upstream pipeline.
    Caller must lineage.release() the returned frame."""
    from osm_export_tool_python_spark import lineage
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators import assemble
    from osm_export_tool_python_spark.operators.clip import AOI, clip_features
    from osm_export_tool_python_spark.operators.themes import prefilter, theme_fanout
    from osm_export_tool_python_spark.sources import decode

    mapping = Mapping(BENCH_MAPPING)
    docs = spark.read.parquet(docs_path)
    feats = assemble.assemble_features(
        decode.with_entity_meta(docs), checkpoint=True,
        mapping=mapping if prune else None,
    )
    filtered = prefilter(feats, mapping)
    aoi = AOI([np.array([[-15.0, -8.0], [38.0, -8.0], [38.0, 52.0], [-15.0, 52.0]])])
    clipped = clip_features(filtered, aoi)
    themed = theme_fanout(clipped, mapping)
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    deduped = lineage.eager_local_checkpoint(
        themed.repartition(nparts, "osm_id", "src").dropDuplicates(["osm_id", "src"])
    )
    lineage.release(*feats._persisted_intermediates)
    return deduped


def bench_queries(spark, sf_dir, scale):
    from pyspark.sql import functions as F

    from osm_export_tool_python_spark.operators.dedup import minhash_dedup
    from osm_export_tool_python_spark.operators.similarity import brute_force_topk
    from osm_export_tool_python_spark.plans import driver_queries as dq

    docs_path = "/tmp/spark_osm_bench_docs_sf%s" % str(scale)
    prepare_osm_input(
        spark, int(40000 * scale), int(10000 * scale), int(500 * scale), docs_path
    )

    def q_osm_export():
        return osm_pipeline_counts(spark, docs_path)[0]

    def q_minhash_dedup():
        docs = spark.read.parquet("%s/documents.parquet" % sf_dir)
        return minhash_dedup(docs, threshold=0.8).count()

    def q_ann():
        emb = spark.read.parquet("%s/embeddings.parquet" % sf_dir).select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        return brute_force_topk(emb, emb.limit(50), k=10).count()

    return {
        "osm_export": q_osm_export,
        "pricing_summary": lambda: dq.q_pricing_summary(spark, sf_dir).count(),
        "revenue_by_nation": lambda: dq.q_revenue_by_nation(spark, sf_dir).count(),
        "events_sessionize": lambda: dq.q_events_sessionize(spark, sf_dir).count(),
        "minhash_dedup": q_minhash_dedup,
        "ann_top10": q_ann,
        "knn_cell_join": lambda: dq.q_knn_cell_join(spark, sf_dir).count(),
        "tile_counts_z8": lambda: dq.q_tile_counts_z8(spark, sf_dir).count(),
    }


def _sha_work(iters):
    # module-level so ProcessPoolExecutor can pickle it
    import hashlib

    h = b"\x00" * 65536
    for _ in range(iters):
        h = hashlib.sha256(h).digest() * 2048  # 64 KiB again
    return h[0]


def _membw_steady(mib=128, reps=8):
    # STREAMING bandwidth: copy between two preallocated, pre-touched
    # buffers — no page faults in the timed window.  GB/s.
    src = np.ones(mib << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    dst[:] = 1
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(dst, src)
    dt = time.perf_counter() - t0
    return round(reps * mib / 1024.0 / dt, 2)


def _membw_worker(args):
    # per-process streaming-copy worker for the bandwidth-SCALING probe:
    # allocates + pre-touches its buffers OUTSIDE its own timed window,
    # returns (GiB copied, seconds) so the parent can aggregate.
    mib, reps = args
    src = np.ones(mib << 20, dtype=np.uint8)
    dst = np.empty_like(src)
    dst[:] = 1
    t0 = time.perf_counter()
    for _ in range(reps):
        np.copyto(dst, src)
    return (reps * mib / 1024.0, time.perf_counter() - t0)


def _membw_parallel(procs, mib=128, reps=8):
    """AGGREGATE streaming bandwidth with `procs` concurrent forked
    copiers (GB/s).  The single-process probe tracks VM-era drift; this
    one answers a different question: does total memory bandwidth GROW
    with the number of busy cores?  On this sandbox VM it does not
    (one guest memory system shared by all vCPUs), which puts a hard
    ceiling on in-box scaling of memory-bound stages — a ceiling a real
    N->4N EXECUTOR-HOST scale-out does not have, because added hosts
    bring their own memory controllers.  Reported per level so scaling
    efficiencies can be read against the machine's measured ceiling."""
    from concurrent.futures import ProcessPoolExecutor

    try:
        with ProcessPoolExecutor(procs) as ex:
            list(ex.map(_membw_worker, [(1, 1)] * procs))  # spawn+warm
            t0 = time.perf_counter()
            parts = list(ex.map(_membw_worker, [(mib, reps)] * procs))
            wall = time.perf_counter() - t0
        return round(sum(p[0] for p in parts) / wall, 2)
    except Exception:
        return None


def _alloc_fault_work(mib=64, reps=4):
    # ALLOCATION throughput: every copy materializes a FRESH buffer, so
    # the timed window is dominated by page faults / THP behavior — the
    # path JVM heap growth, Arrow batch buffers and fork'd Python
    # workers actually exercise.  Probed separately from streaming
    # bandwidth because they drift independently: measured sessions
    # where steady copy held 8+ GB/s while fresh-allocation copies ran
    # at 0.09 GB/s (~90x down), and Spark walls tracked the LATTER
    # (2.5x slower suite at a near-flat sha probe).  GB/s.
    src = np.ones(mib << 20, dtype=np.uint8)
    t0 = time.perf_counter()
    for _ in range(reps):
        dst = src.copy()
    dt = time.perf_counter() - t0
    del dst
    return round(reps * mib / 1024.0 / dt, 2)


def vm_probe(cpus):
    """Deterministic CPU probes (single-thread + all-core) recorded in
    the output JSON: this VM's run-to-run and round-to-round speed
    drifts by up to ~1.6x under hypervisor/THP load, so absolute walls
    across rounds are only comparable after dividing by the probe
    ratio.  Same work every call; no RNG, no IO."""
    t0 = time.perf_counter()
    _sha_work(4000)
    t1 = time.perf_counter()
    # PROCESSES, not threads: even though hashlib releases the GIL on
    # large buffers, 32 hashing threads in one interpreter measured
    # 10-50x off ideal (allocator/GIL handoff thrash), which made the
    # all-core figure track interpreter contention instead of machine
    # load.  Forked workers with quarter work each keep the probe
    # cheap; ideal wall = sha_1t/4.  Pool fork + teardown stay OUTSIDE
    # the timed window (a tiny warm map forces every worker to spawn
    # first): fork time varies with parent RSS — the very machine-state
    # drift the probe exists to normalize away.
    from concurrent.futures import ProcessPoolExecutor

    try:
        with ProcessPoolExecutor(cpus) as ex:
            list(ex.map(_sha_work, [1] * cpus))
            t2 = time.perf_counter()
            list(ex.map(_sha_work, [1000] * cpus))
            t3 = time.perf_counter()
        allcore = round(t3 - t2, 3)
    except Exception:
        allcore = None
    # Memory + scratch-disk probes (round 5): the sha pair only tracks
    # CPU crunch, but the suite's heavy paths (JVM heap growth, Arrow
    # buffers, shuffle spill) are allocation/IO-bound — measured days
    # where Spark walls moved 2.5x while sha moved 1.1x.  Streaming
    # bandwidth and fresh-allocation (page-fault/THP) throughput are
    # probed SEPARATELY because they drift independently (see
    # _alloc_fault_work); the fsync'd write probes the shuffle scratch
    # volume.  Divide cross-round Spark walls by the alloc/io ratios,
    # not just sha.
    membw_steady = _membw_steady()
    alloc_gbps = _alloc_fault_work()
    try:
        import tempfile

        buf = b"\x00" * (8 << 20)
        with tempfile.NamedTemporaryFile(dir="/tmp") as f:
            t5 = time.perf_counter()
            for _ in range(8):  # 64 MiB
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
            io_gbps = round(0.0625 / (time.perf_counter() - t5), 2)
    except Exception:
        io_gbps = None
    return {
        "sha_1t_sec": round(t1 - t0, 3),
        "sha_allcore_qwork_sec": allcore,
        "membw_steady_gbps": membw_steady,
        # aggregate streaming bandwidth with ALL this level's cores
        # busy copying: if this is ~flat versus the single-process
        # figure, memory-bound stages cannot scale inside this box no
        # matter what the engine does (the ceiling added executor HOSTS
        # remove) — read N->4N efficiencies against it
        "membw_par_gbps": _membw_parallel(cpus),
        "alloc_fault_gbps": alloc_gbps,
        "tmp_write_gbps": io_gbps,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        scale = max(float(sf) * 10.0, 0.05)  # sf0.1 → full-size OSM synth
    except ValueError:
        sf, scale = "0.1", 1.0

    from osm_export_tool_python_spark.plans.session import default_session

    spark = default_session(
        master="local[%d]" % cpus,
        shuffle_partitions=2 * cpus,
        app_name="spark-osm-export-bench",
    )
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: JIT/codegen + Arrow python-worker spin-up, so the
    # timings below measure steady-state throughput
    warm = "/tmp/spark_osm_bench_warmup"
    prepare_osm_input(spark, 800, 200, 10, warm)
    osm_pipeline_counts(spark, warm)

    # best-of-3 with the repeats INTERLEAVED round-robin across the
    # suite (pass 1 of every query, then pass 2, then pass 3) instead
    # of 3 consecutive runs per query: this VM's noise arrives in
    # multi-second windows (a measured incident put all three
    # consecutive repeats of one 1.5 s query at 12+ s while its
    # neighbors ran clean — see BENCH/BASELINE.md), so spacing a
    # query's repeats a full suite apart lets the min dodge any window
    # shorter than a suite pass, at identical total work
    queries = bench_queries(spark, sf_dir, scale)
    timings = {}
    for _ in range(3):
        for name, fn in queries.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = dt
    timings = {k: round(v, 3) for k, v in timings.items()}
    total = sum(timings.values())

    out = {
        "metric": "themed OSM export + operator suite wall time, local[%d]" % cpus,
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # divide cross-round walls by the probe ratio before comparing:
        # the VM's effective speed moves round-to-round (hypervisor
        # neighbors, THP compaction)
        "vm_probe": vm_probe(cpus),
    }
    # round-over-round stability point: the 2x-docs pinned-local[8]
    # stretch run recorded by `scripts/bench_scaling.py --stretch`
    # (too slow to re-run inside every bench invocation; the recorded
    # figure is embedded so BENCH_r{N}.json carries it)
    stretch_path = os.path.join(REPO, "BENCH", "STRETCH.json")
    if os.path.exists(stretch_path):
        with open(stretch_path) as f:
            out["stretch_2x_local8"] = json.load(f)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
