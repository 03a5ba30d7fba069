"""Driver-side AOI geometry loaders (reference osm_export_tool/geometry.py).

No shapely here: geometries are plain ring lists compatible with the
even-odd numpy kernels —

    multipolygon := list of parts; part := [outer_ring, hole, hole, ...]
    ring         := list of [lon, lat]

``rings_for_clip`` flattens a multipolygon into the even-odd ring list
the AOI/clip operators consume (outer rings and holes together).
"""

from __future__ import annotations

import json

import numpy as np


def parse_poly(lines):
    """Parse an Osmosis polygon filter file (reference geometry.py:5-41):
    first line is a name; sections start with a section name
    (`!`-prefixed = hole of the preceding part) and end with END; the
    final END closes the file.  Returns multipolygon part list."""
    parts = []  # each: [outer, hole, hole...]
    ring = None
    in_ring = False
    for index, line in enumerate(lines):
        if index == 0:
            continue  # file name line
        stripped = line.strip()
        if in_ring:
            if stripped == "END":
                in_ring = False
            elif stripped:
                ring.append([float(v) for v in stripped.split()])
        else:
            if stripped == "END":
                break  # end of whole polygon
            if not stripped:
                continue
            if stripped.startswith("!"):
                if not parts:
                    raise ValueError("hole before any outer ring")
                parts[-1].append([])
                ring = parts[-1][-1]
            else:
                parts.append([[]])
                ring = parts[-1][0]
            in_ring = True
    return parts


def _geojson_to_parts(geom):
    t = geom["type"]
    if t == "Polygon":
        return [[list(map(list, ring)) for ring in geom["coordinates"]]]
    if t == "MultiPolygon":
        return [
            [list(map(list, ring)) for ring in part] for part in geom["coordinates"]
        ]
    raise ValueError("unsupported geometry type %r" % t)


def load_geometry(txt):
    """GeoJSON (geometry / Feature / FeatureCollection — first feature
    only, with a warning, per reference geometry.py:47-49) or Osmosis
    .poly text → multipolygon part list."""
    try:
        j = json.loads(txt)
    except json.JSONDecodeError:
        return parse_poly(txt.split("\n"))
    if j.get("type") == "FeatureCollection":
        print("Warning: using first feature of --clip FeatureCollection.")
        return _geojson_to_parts(j["features"][0]["geometry"])
    if j.get("type") == "Feature":
        return _geojson_to_parts(j["geometry"])
    return _geojson_to_parts(j)


def rings_for_clip(parts):
    """Multipolygon parts → flat even-odd ring list (numpy arrays) for
    operators/clip.AOI."""
    rings = []
    for part in parts:
        for ring in part:
            r = np.asarray(ring, dtype=np.float64)
            if len(r) >= 2 and np.array_equal(r[0], r[-1]):
                r = r[:-1]
            if len(r) >= 3:
                rings.append(r)
    return rings
