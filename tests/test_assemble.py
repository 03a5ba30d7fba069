"""Geometry assembly: way⋈nodes join, closed-way polygon routing,
incomplete-way dropout, multipolygon ring stitching, negative osm_ids.

Uses a handcrafted documents fixture with known coordinates (FIXTURES.md
§3 assembly cases) plus the seeded synthesizer."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_export_tool_python_spark.operators import assemble
from osm_export_tool_python_spark.sources import decode, synth


def _doc(doc_id, tags=(), refs=(), members=(), media=None):
    spans = []
    for k, v in tags:
        spans.append(("tag", "%s=%s" % (k, v), "", len(spans)))
    for r in refs:
        spans.append(("ref", "", "node/%d" % r, len(spans)))
    for role, w in members:
        spans.append(("member", role, "way/%d" % w, len(spans)))
    if media is not None:
        spans.append(("media", "point", media, len(spans)))
    return (doc_id, spans)


def _wkb(lon, lat):
    return synth.point_wkb_hex(np.array([lon]), np.array([lat]))[0]


@pytest.fixture(scope="module")
def fixture_features(spark):
    docs = [
        # nodes 1-4: a unit square (ring), nodes 10-11: a segment
        _doc("node/1", [("name", "a")], media=_wkb(0.0, 0.0)),
        _doc("node/2", [], media=_wkb(1.0, 0.0)),
        _doc("node/3", [], media=_wkb(1.0, 1.0)),
        _doc("node/4", [], media=_wkb(0.0, 1.0)),
        _doc("node/10", [("amenity", "bank")], media=_wkb(5.0, 5.0)),
        _doc("node/11", [], media=_wkb(6.0, 6.0)),
        # inner-ring square nodes 20-23
        _doc("node/20", [], media=_wkb(0.25, 0.25)),
        _doc("node/21", [], media=_wkb(0.75, 0.25)),
        _doc("node/22", [], media=_wkb(0.75, 0.75)),
        _doc("node/23", [], media=_wkb(0.25, 0.75)),
        # way 100: open 2-node way (line)
        _doc("way/100", [("highway", "primary")], refs=[10, 11]),
        # way 101: closed square WITH area key → polygon
        _doc("way/101", [("building", "yes")], refs=[1, 2, 3, 4, 1]),
        # way 102: closed square WITHOUT area key → line
        _doc("way/102", [("barrier", "fence")], refs=[1, 2, 3, 4, 1]),
        # way 103: references missing node 999 → incomplete, dropped
        _doc("way/103", [("highway", "service")], refs=[10, 999]),
        # way 104: untagged, used only as relation member (two open halves)
        _doc("way/104", [], refs=[1, 2, 3]),
        _doc("way/105", [], refs=[3, 4, 1]),
        # way 106: inner ring (closed)
        _doc("way/106", [], refs=[20, 21, 22, 23, 20]),
        # rel 200: multipolygon outer = ways 104+105 chained, inner = 106
        _doc(
            "rel/200",
            [("type", "multipolygon"), ("building", "yes")],
            members=[("outer", 104), ("outer", 105), ("inner", 106)],
        ),
        # rel 201: broken multipolygon (unclosable outer) → invalid, dropped
        _doc("rel/201", [("type", "multipolygon"), ("building", "yes")], members=[("outer", 100)]),
        # rel 202: multipolygon without area tags → routed away (tabular.py:310-311)
        _doc("rel/202", [("type", "multipolygon"), ("name", "no area key")], members=[("outer", 101)]),
    ]
    df = spark.createDataFrame(docs, synth.SPAN_SCHEMA)
    meta = decode.with_entity_meta(df)
    return assemble.assemble_features(meta).collect()


def _by_id(rows, src):
    return {r["osm_id"]: r for r in rows if r["src"] == src}


def test_point_features(fixture_features):
    pts = _by_id(fixture_features, "node")
    # only tagged nodes become point features
    assert set(pts) == {1, 10}
    assert pts[10]["xs"] == [5.0] and pts[10]["ys"] == [5.0]
    assert pts[10]["geom_type"] == "point"


def test_line_features(fixture_features):
    ways = _by_id(fixture_features, "way")
    assert ways[100]["geom_type"] == "line"
    assert ways[100]["xs"] == [5.0, 6.0]
    # closed way without area key stays a line (reference tabular.py:280-283)
    assert ways[102]["geom_type"] == "line"
    assert len(ways[102]["xs"]) == 5
    # incomplete way dropped (reference tabular.py:305-306)
    assert 103 not in ways


def test_closed_way_polygon(fixture_features):
    ways = _by_id(fixture_features, "way")
    assert ways[101]["geom_type"] == "polygon"
    assert ways[101]["ring_offsets"] == [0, 5]
    assert ways[101]["xs"] == [0.0, 1.0, 1.0, 0.0, 0.0]


def test_relation_multipolygon(fixture_features):
    rels = _by_id(fixture_features, "relation")
    # negative osm_id for relation-derived areas (reference tabular.py:313)
    assert set(rels) == {-200}
    r = rels[-200]
    assert r["geom_type"] == "polygon"
    # one part, two rings (outer + inner)
    assert len(r["ring_offsets"]) == 3
    assert r["part_offsets"] == [0, 2]
    ro = r["ring_offsets"]
    outer_n = ro[1] - ro[0]
    inner_n = ro[2] - ro[1]
    assert outer_n == 5 and inner_n == 5  # closed squares
    # outer ring covers the unit square
    xs = np.array(r["xs"][ro[0] : ro[1]])
    ys = np.array(r["ys"][ro[0] : ro[1]])
    assert xs.min() == 0.0 and xs.max() == 1.0 and ys.min() == 0.0 and ys.max() == 1.0


def test_synth_assembly_counts(spark):
    docs = decode.with_entity_meta(
        synth.synthesize(spark, n_nodes=400, n_ways=120, n_rels=12)
    )
    feats = assemble.assemble_features(docs)
    counts = {r["geom_type"]: r["count"] for r in feats.groupBy("geom_type").agg(F.count("*").alias("count")).collect()}
    assert counts.get("point", 0) > 200
    assert counts.get("line", 0) > 20
    assert counts.get("polygon", 0) > 5
    # no empty geometries
    assert feats.where(F.size("xs") == 0).count() == 0
    # polygons' rings all closed
    polys = feats.where(F.col("geom_type") == "polygon").collect()
    for p in polys:
        ro = p["ring_offsets"]
        for i in range(len(ro) - 1):
            a, b = ro[i], ro[i + 1] - 1
            assert p["xs"][a] == p["xs"][b] and p["ys"][a] == p["ys"][b]


# ---------------------------------------------------------------------------
# Mapping-aware assembly pruning: assemble_features(mapping=...) keeps a
# strict SUPERSET of what prefilter keeps, so full vs pruned assembly must
# agree row-for-row POST-prefilter.  Edge cases covered: untagged member
# ways (kept only via the relation semi-join), absent-true `!=` matchers,
# and a points-only mapping (no line/polygon theme => way_pred == False).
# ---------------------------------------------------------------------------

PRUNE_MAPPINGS = {
    "bench_like": (
        "buildings:\n  types: [polygons]\n  select: [name, building]\n"
        "  where: building = 'yes'\n"
        "roads:\n  types: [lines]\n  select: [highway, name]\n"
        "  where: highway IS NOT NULL\n"
        "pois:\n  types: [points]\n  select: [amenity, name]\n"
        "  where: amenity IS NOT NULL\n"
    ),
    # absent-true != matcher: TRUE on entities lacking the key entirely
    "absent_true_neq": (
        "not_wall:\n  types: [lines, polygons]\n  select: [barrier]\n"
        "  where: barrier != 'wall'\n"
    ),
    # points only: way_pred compiles to lit(False); every way must go
    # through (and die in) the member-id semi-join
    "points_only": (
        "pois:\n  types: [points]\n  select: [name]\n"
        "  where: name IS NOT NULL\n"
    ),
    # polygons only: untagged member ways 104/105/106 survive ONLY via
    # the relation member semi-join; their line features then die in
    # prefilter identically on both paths
    "polygons_only": (
        "buildings:\n  types: [polygons]\n  select: [building]\n"
        "  where: building = 'yes'\n"
    ),
}


def _canon(df):
    """Set-comparable projection (tags map -> sorted entry array)."""
    return df.select(
        "src",
        "osm_id",
        "geom_type",
        "xs",
        "ys",
        "ring_offsets",
        "part_offsets",
        F.array_sort(F.map_entries("tags")).alias("tag_entries"),
    )


@pytest.mark.parametrize("name", sorted(PRUNE_MAPPINGS))
def test_mapping_pruned_assembly_matches_full(spark, name):
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators.themes import prefilter

    mapping = Mapping(PRUNE_MAPPINGS[name])
    docs = [
        _doc("node/1", [("name", "a")], media=_wkb(0.0, 0.0)),
        _doc("node/2", [], media=_wkb(1.0, 0.0)),
        _doc("node/3", [], media=_wkb(1.0, 1.0)),
        _doc("node/4", [], media=_wkb(0.0, 1.0)),
        _doc("node/10", [("amenity", "bank")], media=_wkb(5.0, 5.0)),
        _doc("node/11", [], media=_wkb(6.0, 6.0)),
        _doc("node/20", [], media=_wkb(0.25, 0.25)),
        _doc("node/21", [], media=_wkb(0.75, 0.25)),
        _doc("node/22", [], media=_wkb(0.75, 0.75)),
        _doc("node/23", [], media=_wkb(0.25, 0.75)),
        _doc("way/100", [("highway", "primary")], refs=[10, 11]),
        _doc("way/101", [("building", "yes")], refs=[1, 2, 3, 4, 1]),
        _doc("way/102", [("barrier", "fence")], refs=[1, 2, 3, 4, 1]),
        _doc("way/103", [("highway", "service")], refs=[10, 999]),
        # untagged member ways: the semi-join is their only survival path
        _doc("way/104", [], refs=[1, 2, 3]),
        _doc("way/105", [], refs=[3, 4, 1]),
        _doc("way/106", [], refs=[20, 21, 22, 23, 20]),
        _doc(
            "rel/200",
            [("type", "multipolygon"), ("building", "yes")],
            members=[("outer", 104), ("outer", 105), ("inner", 106)],
        ),
        _doc(
            "rel/201",
            [("type", "multipolygon"), ("building", "yes")],
            members=[("outer", 100)],
        ),
        _doc(
            "rel/202",
            [("type", "multipolygon"), ("name", "no area key")],
            members=[("outer", 101)],
        ),
    ]
    meta = decode.with_entity_meta(spark.createDataFrame(docs, synth.SPAN_SCHEMA))
    full = _canon(prefilter(assemble.assemble_features(meta), mapping))
    pruned = _canon(
        prefilter(assemble.assemble_features(meta, mapping=mapping), mapping)
    )
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0
    assert full.count() == pruned.count()


def test_mapping_pruned_assembly_matches_full_synth(spark):
    """Same parity on the seeded synthesizer (400 nodes / 120 ways /
    12 rels) with the bench mapping — broad-coverage backstop."""
    from osm_export_tool_python_spark.functions.mapping import Mapping
    from osm_export_tool_python_spark.operators.themes import prefilter

    mapping = Mapping(PRUNE_MAPPINGS["bench_like"])
    meta = decode.with_entity_meta(
        synth.synthesize(spark, n_nodes=400, n_ways=120, n_rels=12)
    )
    full = _canon(prefilter(assemble.assemble_features(meta), mapping))
    pruned = _canon(
        prefilter(assemble.assemble_features(meta, mapping=mapping), mapping)
    )
    assert full.count() > 0
    assert pruned.exceptAll(full).count() == 0
    assert full.exceptAll(pruned).count() == 0
