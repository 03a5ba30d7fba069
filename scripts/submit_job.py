"""Cluster-launch entrypoint: the themed-export job as a plain
``spark-submit`` application (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

    spark-submit --master <cluster> \
        --py-files /path/to/osm_export_tool_python_spark_pyfiles.zip \
        scripts/submit_job.py DOCS_PATH OUT_DIR [MAPPING_YAML]

No repo checkout is assumed on the driver or executors: the package
imports from the ``--py-files`` zip (spark-submit prepends it to the
driver's sys.path in client mode and ships it to every executor's
Python worker), and the session comes from ``getOrCreate()`` so the
submit command's ``--master/--conf`` flags are authoritative — the
script sets only confs the engine requires (Arrow, AQE) and never
overrides cluster sizing.  tests/test_spark_submit.py runs this file
end-to-end through a real spark-submit from a neutral cwd.
"""

import json
import os
import sys


def main(argv):
    docs_path = argv[1]
    out_dir = argv[2]
    mapping_yaml = None
    if len(argv) > 3:
        with open(argv[3]) as f:
            mapping_yaml = f.read()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("spark-osm-export-submit")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    # imports resolve via --py-files; AFTER the session exists so a
    # missing zip fails loudly here, not with a half-imported package
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.plans.export import export

    if mapping_yaml is None:
        mapping_yaml = (
            "buildings:\n  types: [polygons]\n  select: [name, building]\n"
            "  where: building = 'yes'\n"
            "roads:\n  types: [lines]\n  select: [highway, name]\n"
            "  where: highway IS NOT NULL\n"
            "pois:\n  types: [points]\n  select: [amenity, name]\n"
            "  where: amenity IS NOT NULL\n"
        )

    docs = spark.read.parquet(docs_path)
    manifest = export(spark, docs, Mapping(mapping_yaml), out_dir)
    print(
        "SUBMIT_RESULT "
        + json.dumps(
            {
                "themed_features": manifest["metrics"]["themed_features"],
                "outputs": len(manifest["entries"]),
                "out": out_dir,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
