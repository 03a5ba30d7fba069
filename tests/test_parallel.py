"""parallel.fan_out: the small-input parallelism guard must (a) widen
a single-partition frame to the session's shuffle parallelism, (b)
no-op on an already-wide frame (so the at-scale shuffle shape is
untouched), and (c) when keyed, produce an exchange the downstream
groupBy on the same key REUSES — one exchange total, not two."""

from pyspark.sql import functions as F

from osm_export_tool_python_spark.parallel import fan_out


def _nparts(spark):
    return int(spark.conf.get("spark.sql.shuffle.partitions"))


def test_fan_out_widens_narrow_frame(spark):
    df = spark.range(1000).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    wide = fan_out(df)
    assert wide.rdd.getNumPartitions() == _nparts(spark)
    assert wide.count() == 1000


def test_fan_out_noop_when_already_wide(spark):
    n = _nparts(spark)
    df = spark.range(1000).repartition(n + 4)
    assert fan_out(df) is df


def test_keyed_fan_out_single_exchange_for_groupby(spark):
    df = spark.range(2000).coalesce(1).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    agg = fan_out(df, "k").groupBy("k").agg(F.min("v").alias("mv"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # values identical to the unguarded aggregation
    base = df.groupBy("k").agg(F.min("v").alias("mv"))
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, base.collect()))


def test_fan_out_noop_on_shuffle_bearing_frame(spark):
    # under AQE, probing .rdd on a shuffle-bearing frame EXECUTES its
    # query stages — fan_out must return such frames untouched without
    # running anything
    from pyspark import inheritable_thread_target  # noqa: F401  (import guard)

    df = (
        spark.range(1000)
        .coalesce(1)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    assert fan_out(df, "k") is df
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # no job ran at graph-construction time


def test_fan_out_tolerates_non_numeric_shuffle_partitions(spark):
    # vendor AQE distros set spark.sql.shuffle.partitions to "auto" —
    # the width probe must fall back to defaultParallelism, not raise
    from osm_export_tool_python_spark.parallel import _session_width

    class _Conf:
        def get(self, k):
            return "auto"

    class _SC:
        defaultParallelism = 5

    class _Fake:
        conf = _Conf()
        sparkContext = _SC()

    assert _session_width(_Fake()) == 5
    assert _session_width(spark) == _nparts(spark)


def test_fan_out_noop_on_large_estimated_input(spark):
    # a narrow frame whose optimizer size estimate exceeds the gate
    # must come back untouched — repartitioning a large scan's full
    # rows is the exchange the guard exists to avoid, not create.
    # Range stats are exact (8 bytes/row): 2^27 rows = 1 GiB estimate.
    df = spark.range(1 << 27).coalesce(1)
    assert fan_out(df) is df
    # and the same frame passes with a raised gate
    assert fan_out(df, max_bytes=1 << 40) is not df


def test_minhash_signatures_unchanged_by_fan_out(spark):
    # signatures are per-row deterministic: partitioning must not
    # change them
    rows = [(i, "alpha beta gamma delta epsilon zeta %d" % (i % 7)) for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from osm_export_tool_python_spark.operators.dedup import minhash_signature_table

    narrow = minhash_signature_table(docs.coalesce(1))
    wide = minhash_signature_table(docs.repartition(8))
    assert sorted(map(tuple, narrow.collect())) == sorted(map(tuple, wide.collect()))


def test_fan_out_treats_unknown_size_estimate_as_small(spark):
    # An RDD-backed frame has NO Catalyst stats — its size estimate is
    # the defaultSizeInBytes sentinel (~Long.MaxValue).  That means
    # "unknown", not "huge": the guard must still fan it out, or the
    # exact small frames it was written for stay single-core forever.
    rdd = spark.sparkContext.parallelize([(i,) for i in range(500)], 1)
    df = spark.createDataFrame(rdd, "id long")
    from osm_export_tool_python_spark.parallel import _plan_size_bytes, _UNKNOWN_SIZE_FLOOR

    est = _plan_size_bytes(df)
    assert est is None or est >= _UNKNOWN_SIZE_FLOOR  # precondition: no stats
    wide = fan_out(df)
    assert wide is not df
    assert wide.rdd.getNumPartitions() == _nparts(spark)
    assert wide.count() == 500
