"""Real binary geo-format outputs (no GDAL): GeoPackage SQLite layout,
Shapefile .shp/.shx/.dbf record structure, KML XML — each verified by
an independent reader written against the PUBLIC format spec (sqlite3
/ struct / ElementTree), round-tripping coordinates and attributes."""

import os
import sqlite3
import struct
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from osm_export_tool_python_spark.functions.mapping import Mapping
from osm_export_tool_python_spark.plans import binary_sinks as bs
from osm_export_tool_python_spark.plans.export import export
from osm_export_tool_python_spark.sources import synth

MAPPING_YAML = """
buildings:
  types:
    - polygons
  select:
    - name
    - building
  where: building = 'yes'
roads:
  types:
    - lines
  select:
    - highway
    - name
  where: highway IS NOT NULL
pois:
  types:
    - points
  select:
    - amenity
    - addr:housenumber
  where: amenity IS NOT NULL
"""


# --- independent WKB decoder (spec: OGC 06-103r4) -------------------------

def wkb_decode(buf):
    def rd(fmt, off):
        sz = struct.calcsize(fmt)
        return struct.unpack(fmt, buf[off : off + sz]), off + sz

    def geom(off):
        (bo,), off = rd("<B", off)
        assert bo == 1  # little-endian
        (gt,), off = rd("<I", off)
        if gt == 1:  # point
            (x, y), off = rd("<dd", off)
            return ("point", [(x, y)]), off
        if gt == 2:  # linestring
            (n,), off = rd("<I", off)
            pts, off = rd("<%dd" % (2 * n), off)
            return ("line", list(zip(pts[0::2], pts[1::2]))), off
        if gt == 3:  # polygon
            (nr,), off = rd("<I", off)
            rings = []
            for _ in range(nr):
                (n,), off = rd("<I", off)
                pts, off = rd("<%dd" % (2 * n), off)
                rings.append(list(zip(pts[0::2], pts[1::2])))
            return ("polygon", rings), off
        if gt in (5, 6):  # multi line/polygon
            (n,), off = rd("<I", off)
            subs = []
            for _ in range(n):
                g, off = geom(off)
                subs.append(g)
            return ("multi", subs), off
        raise AssertionError("unexpected wkb type %d" % gt)

    g, off = geom(0)
    assert off == len(buf)
    return g


def gpkg_blob_decode(blob):
    assert blob[:2] == b"GP" and blob[2] == 0
    flags = blob[3]
    assert flags & 1  # little-endian header
    env_ind = (flags >> 1) & 0x07
    (srs,) = struct.unpack("<i", blob[4:8])
    assert srs == 4326
    off = 8 + {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_ind]
    env = struct.unpack("<4d", blob[8:40]) if env_ind == 1 else None
    return env, wkb_decode(blob[off:])


ROW_POINT = {
    "osm_id": 7, "geom_type": "point", "xs": [1.5], "ys": [2.5],
    "ring_offsets": [0, 1], "part_offsets": [0, 1],
    "name": "café", "building": None,
}
ROW_LINE = {
    "osm_id": 8, "geom_type": "line", "xs": [0.0, 1.0, 5.0, 6.0],
    "ys": [0.0, 1.0, 5.0, 5.0], "ring_offsets": [0, 2, 4],
    "part_offsets": [0, 2], "name": "x", "building": None,
}
ROW_POLY = {  # square with a hole, stored closed
    "osm_id": -9, "geom_type": "polygon",
    "xs": [0.0, 4.0, 4.0, 0.0, 0.0, 1.0, 2.0, 1.0, 1.0],
    "ys": [0.0, 0.0, 4.0, 4.0, 0.0, 1.0, 1.0, 2.0, 1.0],
    "ring_offsets": [0, 5, 9], "part_offsets": [0, 2],
    "name": None, "building": "yes",
}


def test_wkb_roundtrip_unit():
    kind, pts = wkb_decode(bs.wkb_from_packed("point", ROW_POINT))
    assert kind == "point" and pts == [(1.5, 2.5)]

    kind, subs = wkb_decode(bs.wkb_from_packed("line", ROW_LINE))
    assert kind == "multi"  # 2 pieces -> MultiLineString
    assert [s[1] for s in subs] == [[(0.0, 0.0), (1.0, 1.0)], [(5.0, 5.0), (6.0, 5.0)]]

    kind, subs = wkb_decode(bs.wkb_from_packed("polygon", ROW_POLY))
    assert kind == "multi" and len(subs) == 1  # always MultiPolygon
    rings = subs[0][1]
    assert len(rings) == 2 and rings[0][0] == (0.0, 0.0) and rings[1][0] == (1.0, 1.0)


def test_geopackage_writer_unit(tmp_path):
    path = str(tmp_path / "t.gpkg")
    w = bs.GeoPackageWriter(path)
    n = w.write_layer("mixed", ["name", "building"], [ROW_POINT, ROW_LINE, ROW_POLY])
    w.close()
    assert n == 3

    con = sqlite3.connect(path)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 1196444487  # 'GPKG'
    assert con.execute("SELECT COUNT(*) FROM gpkg_spatial_ref_sys WHERE srs_id=4326").fetchone()[0] == 1
    tn, dt, sid = con.execute(
        "SELECT table_name, data_type, srs_id FROM gpkg_contents"
    ).fetchone()
    assert (tn, dt, sid) == ("mixed", "features", 4326)
    assert con.execute(
        "SELECT column_name, geometry_type_name FROM gpkg_geometry_columns"
    ).fetchone() == ("geom", "GEOMETRY")

    rows = con.execute(
        "SELECT fid, geom, osm_id, name, building FROM mixed ORDER BY fid"
    ).fetchall()
    assert [r[2] for r in rows] == [7, 8, -9]
    assert rows[0][3] == "café" and rows[2][4] == "yes"
    env, (kind, pts) = gpkg_blob_decode(rows[0][1])
    assert kind == "point" and pts == [(1.5, 2.5)]
    assert env == (1.5, 1.5, 2.5, 2.5)  # minx, maxx, miny, maxy
    env, (kind, subs) = gpkg_blob_decode(rows[2][1])
    assert kind == "multi" and env == (0.0, 4.0, 0.0, 4.0)
    con.close()


def test_shapefile_writer_unit(tmp_path):
    base = str(tmp_path / "polys")
    n = bs.write_shapefile(base, "polygon", ["name", "building"], [ROW_POLY],
                           field_names=["name", "building"])
    assert n == 1
    shp = open(base + ".shp", "rb").read()
    assert struct.unpack(">i", shp[:4])[0] == 9994
    (flen,) = struct.unpack(">i", shp[24:28])
    assert flen * 2 == len(shp)
    ver, stype = struct.unpack("<ii", shp[28:36])
    assert (ver, stype) == (1000, 5)
    xmin, ymin, xmax, ymax = struct.unpack("<4d", shp[36:68])
    assert (xmin, ymin, xmax, ymax) == (0.0, 0.0, 4.0, 4.0)
    # record 1
    recno, clen = struct.unpack(">ii", shp[100:108])
    assert recno == 1 and 108 + clen * 2 == len(shp)
    body = shp[108:]
    assert struct.unpack("<i", body[:4])[0] == 5
    nparts, npts = struct.unpack("<ii", body[36:44])
    assert nparts == 2 and npts == 9
    starts = struct.unpack("<2i", body[44:52])
    assert starts == (0, 5)
    pts = np.frombuffer(body[52:], dtype="<f8").reshape(-1, 2)
    # outer ring must be CLOCKWISE in a shapefile, hole counter-clockwise
    def area(r):
        x, y = r[:-1, 0], r[:-1, 1]
        return 0.5 * float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    assert area(pts[0:5]) < 0 and area(pts[5:9]) > 0

    shx = open(base + ".shx", "rb").read()
    assert struct.unpack(">i", shx[24:28])[0] * 2 == len(shx)
    off, clen2 = struct.unpack(">ii", shx[100:108])
    assert off == 50 and clen2 == clen

    dbf = open(base + ".dbf", "rb").read()
    assert dbf[0] == 0x03
    (nrec,) = struct.unpack("<I", dbf[4:8])
    (hsz, rsz) = struct.unpack("<HH", dbf[8:12])
    assert nrec == 1 and hsz == 32 + 32 * 3 + 1 and rsz == 1 + 18 + 80 + 80
    f1 = dbf[32:64]
    assert f1[:11].rstrip(b"\x00") == b"osm_id" and f1[11:12] == b"N"
    rec = dbf[hsz : hsz + rsz]
    assert rec[0:1] == b" " and rec[1:19].strip() == b"-9"
    assert rec[19 + 80 : 19 + 160].rstrip() == b"yes"
    assert open(base + ".prj").read().startswith("GEOGCS[")
    assert open(base + ".cpg").read() == "UTF-8"


def test_kml_writer_unit(tmp_path):
    path = str(tmp_path / "a.kml")
    n = bs.write_kml(path, "pois point", ["name", "building"],
                     [ROW_POINT, ROW_POLY])
    assert n == 2
    ns = {"k": "http://www.opengis.net/kml/2.2"}
    root = ET.parse(path).getroot()
    pms = root.findall(".//k:Placemark", ns)
    assert len(pms) == 2
    assert pms[0].find(".//k:Point/k:coordinates", ns).text == "1.5,2.5"
    data = {
        d.get("name"): d.find("k:value", ns).text
        for d in pms[0].findall(".//k:Data", ns)
    }
    assert data == {"osm_id": "7", "name": "café"}
    outer = pms[1].find(".//k:outerBoundaryIs//k:coordinates", ns).text
    assert outer.startswith("0.0,0.0 4.0,0.0")
    assert pms[1].find(".//k:innerBoundaryIs//k:coordinates", ns) is not None


def test_export_materializes_real_binaries(spark, tmp_path_factory):
    """export(binary=True) produces a loadable .gpkg whose per-layer
    feature counts equal the parquet dataset row counts, plus real
    shapefile sidecar sets and parseable KML."""
    docs = synth.synthesize(spark, n_nodes=1500, n_ways=400, n_rels=20)
    mapping = Mapping(MAPPING_YAML)
    out = str(tmp_path_factory.mktemp("binexp"))
    payload = export(spark, docs, mapping, out, formats=("gpkg", "shp", "kml"),
                     binary=True)

    gpkg = os.path.join(out, "gpkg", "export.gpkg")
    con = sqlite3.connect(gpkg)
    layers = {r[0] for r in con.execute("SELECT table_name FROM gpkg_contents")}
    assert layers == {"buildings", "roads", "pois"}
    parquet_rows = {
        e["theme"]: e["rows"] for e in payload["entries"] if e["format"] == "gpkg"
    }
    for layer in layers:
        n = con.execute('SELECT COUNT(*) FROM "%s"' % layer).fetchone()[0]
        assert n == parquet_rows[layer] > 0
        blob = con.execute('SELECT geom FROM "%s" LIMIT 1' % layer).fetchone()[0]
        gpkg_blob_decode(blob)  # parses cleanly
    con.close()

    shp_base = os.path.join(out, "shp_bin", "roads_line")
    for ext in (".shp", ".shx", ".dbf", ".prj", ".cpg"):
        assert os.path.exists(shp_base + ext), ext
    shp = open(shp_base + ".shp", "rb").read()
    assert struct.unpack(">i", shp[:4])[0] == 9994
    assert struct.unpack(">i", shp[24:28])[0] * 2 == len(shp)

    kml_path = os.path.join(out, "kml_bin", "pois_point.kml")
    root = ET.parse(kml_path).getroot()
    ns = {"k": "http://www.opengis.net/kml/2.2"}
    n_pm = len(root.findall(".//k:Placemark", ns))
    kml_rows = {
        (e["theme"], e.get("geom_type")): e["rows"]
        for e in payload["entries"]
        if e["format"] == "kml"
    }
    assert n_pm == kml_rows[("pois", "point")] > 0


def test_dbf_cell_utf8_boundary():
    # a value whose UTF-8 encoding exceeds 80 bytes mid-character must
    # truncate on a character boundary (cpg declares UTF-8)
    v = "x" + "é" * 41  # 83 bytes encoded; byte 80 falls MID-character
    cell = bs._dbf_cell(v, "C", 80)
    assert len(cell) == 80
    assert cell.rstrip().decode("utf-8") == "x" + "é" * 39  # 79 bytes + pad
    assert bs._dbf_cell("-42", "N", 18) == b"-42".rjust(18)


def test_shapefile_empty_layer(tmp_path):
    base = str(tmp_path / "empty")
    n = bs.write_shapefile(base, "point", ["name"], [], field_names=["name"])
    assert n == 0
    shp = open(base + ".shp", "rb").read()
    assert len(shp) == 100 and struct.unpack(">i", shp[24:28])[0] == 50
    dbf = open(base + ".dbf", "rb").read()
    assert struct.unpack("<I", dbf[4:8])[0] == 0


def test_mbtiles_writer_unit(tmp_path):
    path = str(tmp_path / "t.mbtiles")
    tiles = [
        {"z": 2, "x": 1, "y": 1, "n_features": 5, "osm_ids": [7, 9]},
        {"z": 3, "x": 4, "y": 2, "n_features": 1, "osm_ids": [7]},
    ]
    n = bs.write_mbtiles(path, tiles, (-10.0, -5.0, 10.0, 5.0), 2, 3)
    assert n == 2
    import json as j

    con = sqlite3.connect(path)
    meta = dict(con.execute("SELECT name, value FROM metadata").fetchall())
    assert meta["format"] == "json" and meta["minzoom"] == "2" and meta["maxzoom"] == "3"
    assert meta["bounds"] == "-10.0,-5.0,10.0,5.0"
    rows = con.execute(
        "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles ORDER BY zoom_level"
    ).fetchall()
    # TMS flip: y=1@z2 -> row 2; y=2@z3 -> row 5
    assert (rows[0][0], rows[0][1], rows[0][2]) == (2, 1, 2)
    assert (rows[1][0], rows[1][1], rows[1][2]) == (3, 4, 5)
    assert j.loads(rows[0][3]) == {"n": 5, "osm_ids": [7, 9]}
    con.close()


def test_mbtiles_payload_carries_overflow(tmp_path):
    """Bounded tile packing: a truncated row's n_overflow lands in the
    tile payload (never silent); complete rows omit the key."""
    path = str(tmp_path / "o.mbtiles")
    tiles = [
        {"z": 1, "x": 0, "y": 0, "n_features": 9, "osm_ids": [1, 2], "n_overflow": 7},
        {"z": 1, "x": 1, "y": 0, "n_features": 2, "osm_ids": [3, 4], "n_overflow": 0},
    ]
    assert bs.write_mbtiles(path, tiles, (-10.0, -5.0, 10.0, 5.0), 1, 1) == 2
    import json as j

    con = sqlite3.connect(path)
    rows = dict(
        (c, j.loads(d))
        for _z, c, _r, d in con.execute(
            "SELECT zoom_level, tile_column, tile_row, tile_data FROM tiles"
        ).fetchall()
    )
    con.close()
    assert rows[0] == {"n": 9, "osm_ids": [1, 2], "n_overflow": 7}
    assert rows[1] == {"n": 2, "osm_ids": [3, 4]}


def test_export_tiles_mbtiles_and_package(spark, tmp_path_factory):
    """export(formats=('tiles','gpkg')) produces a real .mbtiles whose
    tile set equals the parquet tile table (modulo the TMS row flip),
    and create_package ships the binary artifacts under binary/."""
    import zipfile

    from osm_export_tool_python_spark.plans.package import create_package

    docs = synth.synthesize(spark, n_nodes=800, n_ways=200, n_rels=10)
    mapping = Mapping(MAPPING_YAML)
    out = str(tmp_path_factory.mktemp("mbt"))
    payload = export(spark, docs, mapping, out, formats=("gpkg", "tiles"),
                     tile_zooms=(2, 6), binary=True)

    mb = os.path.join(out, "tiles.mbtiles")
    con = sqlite3.connect(mb)
    n_mb = con.execute("SELECT COUNT(*) FROM tiles").fetchone()[0]
    tiles_entry = [e for e in payload["entries"] if e["format"] == "tiles"][0]
    assert n_mb == tiles_entry["rows"] > 0
    assert tiles_entry["binary"] == mb
    pq = spark.read.parquet(tiles_entry["path"]).collect()
    src = {(r["z"], r["x"], (1 << r["z"]) - 1 - r["y"]) for r in pq}
    got = {
        tuple(r)
        for r in con.execute("SELECT zoom_level, tile_column, tile_row FROM tiles")
    }
    assert src == got
    con.close()

    zpath = os.path.join(out, "pkg.zip")
    create_package(zpath, payload["entries"])
    names = zipfile.ZipFile(zpath).namelist()
    assert "binary/tiles.mbtiles" in names
    assert "binary/export.gpkg" in names
