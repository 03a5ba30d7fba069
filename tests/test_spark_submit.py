"""End-to-end launch test for the north rule's submit form: a REAL
``spark-submit --py-files engine.zip scripts/submit_job.py`` run, from
a neutral working directory (so the package can only import from the
shipped zip, not from a repo checkout on sys.path), asserting the job
prints its result line and writes the export manifest.

This is the literal cluster launch path — on a real cluster only
``--master`` changes.  Reference analog: the reference ships as a pip
package driven by a console script (setup.py entry_points); the Spark
engine's unit of deployment is the py-files zip instead.
"""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit on this host"
)
def test_spark_submit_py_files_launch(spark, tmp_path):
    from osm_export_tool_python_spark.plans.session import package_zip
    from osm_export_tool_python_spark.sources import synth

    docs_path = str(tmp_path / "docs")
    out_dir = str(tmp_path / "out")
    synth.synthesize(spark, n_nodes=400, n_ways=100, n_rels=5).write.mode(
        "overwrite"
    ).parquet(docs_path)

    zip_path = package_zip(str(tmp_path / "engine_pyfiles.zip"))

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # neutral cwd + no repo on PYTHONPATH: the engine import below can
    # resolve ONLY through --py-files
    env.pop("PYTHONPATH", None)
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
            docs_path,
            out_dir,
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env=env,
        timeout=600,
    )
    lines = [
        l for l in proc.stdout.splitlines() if l.startswith("SUBMIT_RESULT ")
    ]
    assert proc.returncode == 0 and lines, (
        "spark-submit failed\nSTDOUT:\n%s\nSTDERR:\n%s"
        % (proc.stdout[-3000:], proc.stderr[-3000:])
    )
    result = json.loads(lines[-1][len("SUBMIT_RESULT "):])
    assert result["themed_features"] > 0
    assert result["outputs"] >= 1

    # the manifest on disk is the job's durable record (resume +
    # per-partition lineage); its themed count must match the stdout
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["metrics"]["themed_features"] == result["themed_features"]
    # per-partition row-count lineage recorded for the parquet outputs
    gpkg = [e for e in manifest["entries"] if e.get("format") == "gpkg"]
    assert gpkg and all("partitions" in e for e in gpkg)
    assert all(
        sum(e["partitions"].values()) == e["rows"] for e in gpkg
    )
