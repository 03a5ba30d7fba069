"""Small-input parallelism guard.

A tiny parquet table (one small file) arrives as a single scan
partition, so any CPU-heavy narrow map over it — shingle explosion,
64-term simhash bit math, cosine scoring — serializes onto one core no
matter how many the session has: the 5k-doc bench corpus spent 3.3 s
single-threaded in the shingle/hash map (0.4 s once spread).

``fan_out`` repartitions ONLY when the frame has fewer partitions than
the session's shuffle parallelism AND its optimizer size estimate is
small (``_MAX_FAN_OUT_BYTES``); at cluster scale the scan already has
more partitions than that — and even a few-partition scan of a LARGE
table is skipped by the size gate — so the guard is a no-op and the
shape stays shuffle-minimal (the pre-shuffle would move full
text/vector rows, which costs more than the map-side-combined
aggregates it could replace).  When key columns are given the repartition is a hash
exchange on them with an EXPLICIT partition count — AQE does not
coalesce user-specified counts, so the fan-out survives its
bytes-based advisory sizing — and a downstream groupBy/join on the
same keys reuses it instead of adding a second exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Above this optimizer size estimate the pre-shuffle stops paying for
# itself: a big narrow frame already spreads across many scan
# partitions, and repartitioning it would move the FULL rows (text /
# vectors) through an exchange that the downstream map-side-combined
# aggregation never needed.  512 MiB ≈ a few scan partitions at the
# default 128 MiB maxPartitionBytes — the regime where the guard's
# single-core serialization problem actually exists.
_MAX_FAN_OUT_BYTES = 512 << 20

# Catalyst reports defaultSizeInBytes (≈ Long.MaxValue, configurable
# via spark.sql.defaultSizeInBytes) when a plan node has NO real
# statistics — LogicalRDD-backed frames, some sources.  Estimates at
# or beyond this floor mean "unknown", not "huge": treating them as
# large would permanently disable the fan-out for exactly the small
# RDD-backed frames the guard exists for.
_UNKNOWN_SIZE_FLOOR = 1 << 60


def _session_width(spark) -> int:
    """The session's shuffle parallelism, tolerant of non-numeric
    values (e.g. "auto" under vendor AQE): falls back to the
    scheduler's defaultParallelism instead of raising."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return spark.sparkContext.defaultParallelism


def _plan_size_bytes(df: DataFrame):
    """Catalyst's optimizer size estimate (bytes) for the frame; None
    when unavailable.  Pure plan metadata — no job runs."""
    try:
        return int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return None


def _is_narrow(df: DataFrame) -> bool:
    """True iff the frame's physical plan contains no exchange.

    Guard order matters: under AQE, touching ``df.rdd`` on a
    SHUFFLE-BEARING frame executes its query stages immediately (a
    real Spark job at graph-construction time, re-run again by the
    actual action) — so the partition-count probe below is only safe
    on narrow plans.  Inspecting the executed-plan STRING is lazy for
    both AQE and non-AQE plans (AdaptiveSparkPlan prints its initial
    plan without running it)."""
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:
        return False
    # AQE wraps a plan in AdaptiveSparkPlan ONLY when it contains
    # exchanges (or subqueries) — and its initial toString elides the
    # Exchange nodes themselves, so the wrapper is the reliable signal;
    # the literal Exchange check covers AQE-off sessions.
    return "AdaptiveSparkPlan" not in plan and "Exchange" not in plan


def fan_out(
    df: DataFrame, *key_cols: str, max_bytes: int = _MAX_FAN_OUT_BYTES
) -> DataFrame:
    """Spread a SMALL narrow frame across the session's full
    parallelism; no-op when the input already has at least that many
    partitions, already contains a shuffle (post-shuffle width IS the
    session parallelism, and probing partitions there would execute
    stages), or is estimated bigger than `max_bytes` (a large scan
    already parallelizes across its file partitions — pre-shuffling
    its full rows would cost more than the skew it prevents).  A
    missing/sentinel estimate (no stats → defaultSizeInBytes) counts
    as SMALL: RDD-backed frames carry no stats and are precisely the
    shape this guard was written for."""
    n = _session_width(df.sparkSession)
    if not _is_narrow(df):
        return df
    if df.rdd.getNumPartitions() >= n:
        return df
    size = _plan_size_bytes(df)
    if size is not None and max_bytes < size < _UNKNOWN_SIZE_FLOOR:
        return df
    if key_cols:
        return df.repartition(n, *key_cols)
    return df.repartition(n)
