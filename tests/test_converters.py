"""Native-converter orchestration (plans/converters.py) with an
injected runner — asserts the exact command lines / env contract /
staged files the reference builds (nontabular.py:8-108), no external
binaries needed."""

import os

from osm_export_tool_python_spark.plans.converters import garmin, mwm, osmand


class Recorder:
    def __init__(self):
        self.calls = []

    def __call__(self, cmd, env=None):
        self.calls.append((cmd, env))


def test_osmand_command_and_staging(tmp_path):
    pbf = tmp_path / "in.osm.pbf"
    pbf.write_bytes(b"x")
    run = Recorder()
    out = osmand(str(pbf), "/opt/mapcreator", str(tmp_path), run=run)
    assert out == str(tmp_path / "Osmand_2.obf")
    # input hard-linked into the batch dir; batch.xml written with the
    # tempdir substituted and all five index flags on
    assert (tmp_path / "osmand" / "osmand.osm.pbf").exists()
    xml = (tmp_path / "batch.xml").read_text()
    assert 'directory_for_osm_files="%s/osmand"' % tmp_path in xml
    assert xml.count('="true"') == 5
    (cmd, _env) = run.calls[0]
    assert cmd[:3] == ["java", "-Xms256M", "-Xmx2048M"]
    assert cmd[3] == "-cp"
    assert cmd[4].startswith("/opt/mapcreator/OsmAndMapCreator.jar:")
    assert cmd[5] == "net.osmand.util.IndexBatchCreator"
    assert cmd[6] == str(tmp_path / "batch.xml")


def test_garmin_two_stage_flow(tmp_path):
    run = Recorder()
    out = garmin("/x/in.pbf", "/jars/splitter.jar", "/jars/mkgmap.jar",
                 str(tmp_path), jvm_mem=(512, 4096), run=run)
    assert out == str(tmp_path / "gmapsupp.img")
    assert len(run.calls) == 2
    split_cmd, _ = run.calls[0]
    assert split_cmd == [
        "java", "-Xms512M", "-Xmx4096M", "-jar", "/jars/splitter.jar",
        "--output-dir=" + str(tmp_path), "/x/in.pbf",
    ]
    mk_cmd, _ = run.calls[1]
    assert mk_cmd[4] == "/jars/mkgmap.jar"
    # the reference's exact mkgmap flag set, incl. template.args handoff
    for flag in ("--gmapsupp", "--index", "--route", "--unicode",
                 "--generate-sea=extend-sea-sectors", "--draw-priority=100",
                 "--family-id=2", "--mapname=80000111",
                 "--read-config=%s/template.args" % tmp_path):
        assert flag in mk_cmd


def test_mwm_env_contract(tmp_path):
    run = Recorder()
    out = mwm("/data/region.osm.pbf", str(tmp_path), "/omim/generate_mwm.sh",
              "/omim/generator_tool", osmconvert_path="/usr/bin/osmconvert",
              run=run)
    assert out == str(tmp_path / "region.mwm")
    cmd, env = run.calls[0]
    assert cmd == ["/omim/generate_mwm.sh", "/data/region.osm.pbf"]
    assert env["OSMCONVERT"] == "/usr/bin/osmconvert"
    assert env["TARGET"] == str(tmp_path)
    assert env["GENERATOR_TOOL"] == "/omim/generator_tool"


def test_osmand_staging_always_fresh(tmp_path):
    """A stale staged PBF from a previous run must be REPLACED, never
    silently re-indexed; a missing input fails loudly."""
    import pytest

    run = Recorder()
    pbf1 = tmp_path / "a.osm.pbf"
    pbf1.write_bytes(b"first")
    osmand(str(pbf1), "/opt/mc", str(tmp_path), run=run)
    pbf2 = tmp_path / "b.osm.pbf"
    pbf2.write_bytes(b"second-different")
    osmand(str(pbf2), "/opt/mc", str(tmp_path), run=run)
    staged = tmp_path / "osmand" / "osmand.osm.pbf"
    assert staged.read_bytes() == b"second-different"

    with pytest.raises(OSError):
        osmand(str(tmp_path / "missing.pbf"), "/opt/mc", str(tmp_path), run=run)
