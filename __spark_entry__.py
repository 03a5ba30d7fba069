"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship themed export on /root/testdata/sf0.001
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-data ops); callables take (spark, sf_dir)
oracle_sql()  — DuckDB-equivalent SQL per query (omitted only for the
                genuinely non-SQL-expressible engine pipelines, whose
                exactness is covered by tests/ instead)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _prepare(spark: SparkSession) -> SparkSession:
    from osm_export_tool_python_spark.plans.session import attach_package

    return attach_package(spark)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: themed feature extraction (the reference's
    simple.yml buildings export) over sf0.001-scaled synthesized
    interleaved documents + per-theme counts."""
    _prepare(spark)
    from osm_export_tool_python_spark.plans.driver_queries import q_osm_flagship_export

    return q_osm_flagship_export(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from osm_export_tool_python_spark.plans.driver_queries import QUERIES

    out = {}
    for name, (fn, _sql) in QUERIES.items():
        def wrapper(spark, sf_dir, _fn=fn):
            _prepare(spark)
            return _fn(spark, sf_dir)

        out[name] = wrapper
    return out


def oracle_sql() -> dict[str, str]:
    from osm_export_tool_python_spark.plans.driver_queries import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
