"""Export packaging: zip archive and POSM bundle (reference
package.py:10-67).

The reference zips OGR files by basename; this engine's sinks are
parquet dataset DIRECTORIES, so each dataset is archived under
``<format>_<dirname>/<part-file>`` (part filenames are uuid-unique but
meaningless alone).  ``clipping_boundary.geojson`` mirrors the
reference's shapely ``mapping(geom)`` dump, built from the AOI rings.

Driver-side by design: archives are a post-export, single-machine
artifact step (the reference does the same); the distributed work
ended at the parquet commit.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import zipfile
from os.path import basename


def _dataset_parts(path):
    """Data files of one written dataset (skip Spark _SUCCESS etc.)."""
    out = []
    for name in sorted(os.listdir(path)):
        if name.startswith(("_", ".")):
            continue
        out.append(os.path.join(path, name))
    return out


def boundary_geojson(rings):
    """AOI rings → GeoJSON Polygon (exterior + holes), closed per spec —
    the reference's shapely.geometry.mapping(boundary_geom)."""
    coords = []
    for ring in rings:
        pts = [[float(x), float(y)] for x, y in ring]
        if pts and pts[0] != pts[-1]:
            pts.append(list(pts[0]))
        coords.append(pts)
    return {"type": "Polygon", "coordinates": coords}


def _binary_parts(bin_path):
    """Files making up one binary artifact: a shapefile is its 5
    sidecars, everything else (gpkg/kml/mbtiles) a single file."""
    if bin_path.endswith(".shp"):
        base = bin_path[:-4]
        return [base + ext for ext in (".shp", ".shx", ".dbf", ".prj", ".cpg")]
    return [bin_path]


def create_package(destination, entries, boundary_rings=None):
    """Zip of every exported dataset plus clipping_boundary.geojson
    (reference create_package, package.py:10-18).  `entries` is the
    manifest payload's entry list.  Binary artifacts (the real
    .gpkg/.shp/.kml/.mbtiles files) ship under binary/ — the gpkg is
    shared across theme entries, so artifacts dedupe by path."""
    with zipfile.ZipFile(destination, "w", zipfile.ZIP_DEFLATED, True) as z:
        if boundary_rings is not None:
            z.writestr(
                "clipping_boundary.geojson",
                json.dumps(boundary_geojson(boundary_rings)),
            )
        seen_binaries = set()
        for e in entries:
            arc_dir = "%s_%s" % (e["format"], basename(e["path"].rstrip("/")))
            for part in _dataset_parts(e["path"]):
                z.write(part, os.path.join(arc_dir, basename(part)))
            bin_path = e.get("binary")
            if bin_path and bin_path not in seen_binaries and os.path.exists(bin_path):
                seen_binaries.add(bin_path)
                for part in _binary_parts(bin_path):
                    z.write(part, os.path.join("binary", basename(part)))
    return destination


_BUNDLE_DIRS = {
    "shp": ("data", "ESRI Shapefile"),
    "kml": ("data", "KML"),
    "gpkg": ("data", "Geopackage"),
    "osmand_obf": ("navigation", "OsmAnd"),
    "garmin": ("navigation", "Garmin IMG"),
    "mwm": ("navigation", "Maps.me"),
    "osm_pbf": ("osm", "OSM/PBF"),
}


def create_posm_bundle(destination, entries, title, name, description, bbox):
    """tar.gz POSM bundle with a typed contents manifest (reference
    create_posm_bundle, package.py:20-67).  Tile datasets map to the
    reference's mbtiles branch, carrying their zoom range."""
    contents = {}
    with tarfile.open(destination, "w|gz") as bundle:
        for e in entries:
            fmt = e["format"]
            arc_dir = "%s_%s" % (fmt, basename(e["path"].rstrip("/")))
            for part in _dataset_parts(e["path"]):
                if fmt == "tiles":
                    target = "tiles/%s/%s" % (arc_dir, basename(part))
                    # lowercase "type" for MBTiles while every other
                    # format uses "Type" — faithful to the reference,
                    # which has exactly this casing split
                    # (reference package.py:27-49)
                    contents[target] = {
                        "type": "MBTiles",
                        "minzoom": e.get("zooms", [None, None])[0],
                        "maxzoom": e.get("zooms", [None, None])[1],
                        "source": e.get("theme", "*"),
                    }
                else:
                    top, typ = _BUNDLE_DIRS.get(fmt, ("data", fmt))
                    target = "%s/%s/%s" % (top, arc_dir, basename(part))
                    contents[target] = {"Type": typ}
                bundle.add(part, target)

        data = json.dumps(
            {
                "title": title,
                "name": name,
                "description": description,
                "bbox": list(bbox),
                "contents": contents,
            },
            indent=2,
        ).encode()
        info = tarfile.TarInfo("manifest.json")
        info.size = len(data)
        bundle.addfile(info, io.BytesIO(data))
    return destination
