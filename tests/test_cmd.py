"""CLI parity (reference cmd.py:10-66): argument surface, export run,
manifest print-out, packaging flags."""

import os
import zipfile

import numpy as np
import pytest

from osm_export_tool_python_spark import cmd
from osm_export_tool_python_spark.sources import synth


@pytest.fixture(scope="module")
def docs_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli_docs") / "docs")
    synth.synthesize(spark, n_nodes=800, n_ways=200, n_rels=10).write.parquet(p)
    return p


def test_cli_export_and_package(spark, docs_path, tmp_path_factory, capsys, monkeypatch):
    # reuse the test session instead of building a fresh JVM
    import osm_export_tool_python_spark.plans.session as sess

    monkeypatch.setattr(sess, "default_session", lambda **kw: spark)
    out = str(tmp_path_factory.mktemp("cli_out"))

    aoi = tmp_path_factory.mktemp("cli_aoi") / "aoi.geojson"
    aoi.write_text(
        '{"type":"Feature","geometry":{"type":"Polygon","coordinates":'
        "[[[0,40],[20,40],[20,55],[0,55],[0,40]]]}}"
    )
    rc = cmd.main(
        [
            docs_path, out,
            "-f", "gpkg",
            "--clip", str(aoi),
            "--tile-zooms", "4,6",
            "--package",
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    assert "Completed in" in printed and "gpkg" in printed
    assert "package\t" in printed
    with zipfile.ZipFile(os.path.join(out, "export.zip")) as z:
        assert "clipping_boundary.geojson" in z.namelist()
    assert os.path.exists(os.path.join(out, "manifest.json"))


def test_cli_checkpoint_flag_modes(spark, docs_path, tmp_path_factory, monkeypatch):
    """--checkpoint is an optional-value flag: bare means 'local'
    (backward compatible with the old store_true), --checkpoint parquet
    selects the columnar store; both produce the same manifest counts
    as the persist default."""
    import json

    import osm_export_tool_python_spark.plans.session as sess

    monkeypatch.setattr(sess, "default_session", lambda **kw: spark)

    def run(*extra):
        out = str(tmp_path_factory.mktemp("cli_ckpt"))
        rc = cmd.main([docs_path, out, "-f", "gpkg", "--tile-zooms", "4,5", *extra])
        assert rc == 0
        with open(os.path.join(out, "manifest.json")) as f:
            return json.load(f)["metrics"]["themed_features"]

    base = run()
    assert run("--checkpoint") == base
    assert run("--checkpoint", "parquet") == base
