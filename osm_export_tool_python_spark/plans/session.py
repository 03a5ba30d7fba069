"""SparkSession helpers + package self-distribution.

On a real cluster this engine ships via ``spark-submit --py-files
engine.zip`` (BASELINE.json north_star).  ``attach_package`` replicates
that from any driver process: it zips the installed package directory
and registers it with ``sc.addPyFile`` so executor-side Python workers
(pandas UDFs, applyInPandas, mapInPandas) can import it regardless of
the driver's cwd/sys.path."""

from __future__ import annotations

import os
import tempfile
import zipfile


def package_zip(path=None):
    """Zip the package source tree; returns the zip path."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.dirname(pkg_dir)
    name = os.path.basename(pkg_dir)
    if path is None:
        # per-process name: concurrent driver JVMs (multi-JVM scaling
        # evidence, parallel test runs) must not truncate a zip another
        # process's executors are still reading
        path = os.path.join(
            tempfile.gettempdir(), "%s_pyfiles_%d.zip" % (name, os.getpid())
        )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_dir):
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, root))
    return path


def attach_package(spark):
    """Make this package importable on executors (--py-files equivalent)."""
    spark.sparkContext.addPyFile(package_zip())
    return spark


def default_session(master=None, app_name="spark-osm-export", shuffle_partitions=None, extra_conf=None):
    """Engine-tuned local session.  At cluster scale the same confs are
    passed to spark-submit; here they size local[N] runs:

      - AQE on (runtime skew-join splitting + partition coalescing),
      - shuffle partitions default 2× cores (bounded small-file churn
        locally; production would use 100-200% of total cores),
      - Arrow enabled for every pandas UDF crossing.

    Cached-frame compression stays at Spark's default (ON): measured
    ~15-20% faster UNcompressed on the 24M-doc export at 32 cores
    (`spark.sql.inMemoryColumnarStorage.compressed=false` via
    extra_conf) because the caches fit in memory easily here — but at
    cluster scale executor storage memory is the scarce resource and
    compressed caches keep the working set resident, so the default is
    the scale-correct choice.
    """
    from pyspark.sql import SparkSession

    cpus = os.cpu_count() or 8
    master = master or "local[%d]" % cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE re-plan (coalesce/skew-split) shuffles UNDER persisted
        # frames too — the export pipeline persists its decoded entities
        # / way-coords / themed frames, and with the default (false) every
        # cached plan keeps the static partition count: measured 2.3x on
        # the themed-export pipeline (9s vs 21s) plus far lower variance,
        # because hundreds of near-empty tasks disappear
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: driver == executor; the 1g default heap thrashes
        # GC as soon as many tasks run concurrently
        .config("spark.driver.memory", os.environ.get("SPARK_OSM_DRIVER_MEM", "24g"))
        .config("spark.driver.maxResultSize", "4g")
        # G1's concurrent phases collapse under many runner threads in
        # this virtualized sandbox (measured 2.5x slowdown at 32
        # threads); throughput GC restores parallel scaling
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or 2 * int(master[6:-1] if master.startswith("local[") and master[6:-1].isdigit() else cpus)),
        )
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    attach_package(spark)
    return spark
