"""Lineage truncation for multi-action pipelines.

Why this exists: every Spark action re-analyzes and re-optimizes the
FULL logical plan of its DataFrame — caching a frame shortcuts the
*execution* but not the *planning*.  A pipeline that materializes
several intermediates (decode → assembly → clip → theme fan-out →
tiles) therefore pays Catalyst over an ever-deepening tree once per
action; on the themed-export benchmark this driver-side planning was
measured at ~2-4 s PER ACTION by the time the tree contains the span
decode, two joins, the relation assembler and a four-way union —
roughly half the end-to-end wall time at small scale, and the main
source of run-to-run variance.

``eager_local_checkpoint`` materializes a frame AND replaces its plan
with a flat ``LogicalRDD`` scan, so every downstream action plans
against a one-node tree.  Trade-off (why this is NOT the default for
every persist): ``localCheckpoint`` stores raw row partitions on the
executors and *truncates lineage*, so losing an executor loses the
partition unrecoverably (a plain ``persist`` recomputes from lineage,
and a reliable ``checkpoint()`` writes to HDFS/object storage).  At
cluster scale with long-running stages the planning cost is amortized
and fault tolerance dominates — use ``persist``.  For latency-bound
jobs (small batches, interactive exports, benchmarks) planning
dominates — use the checkpoint.  Callers choose via the
``checkpoint=`` flag on ``assemble_features`` / ``export``.

``release`` frees either kind: the cache-manager entry for persisted
frames, and the underlying checkpointed RDD (reached through the
``LogicalRDD`` plan node) for locally-checkpointed ones — plain
``DataFrame.unpersist()`` silently no-ops on those, which leaks the
stored partitions for the lifetime of the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_local_checkpoint(df: DataFrame) -> DataFrame:
    """Materialize now; return a frame whose plan is a flat RDD scan."""
    return df.localCheckpoint(eager=True)


def _unpersist_checkpoint_rdd(df: DataFrame) -> bool:
    """Best-effort free of a localCheckpoint's stored partitions.

    The checkpointed RDD is held by the plan's ``LogicalRDD`` node;
    ``df.rdd``/``toRdd()`` return *derived* RDDs whose unpersist would
    not free it.  Internal-API access is fenced: on any JVM-interface
    drift this degrades to a no-op (the RDD then lives until session
    stop, never a correctness issue).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
            return True
    except Exception:
        pass
    return False


def release(*dfs: DataFrame) -> None:
    """Free persisted or locally-checkpointed frames, ignoring failures."""
    for df in dfs:
        if df is None:
            continue
        try:
            df.unpersist()
        except Exception:
            pass
        _unpersist_checkpoint_rdd(df)
