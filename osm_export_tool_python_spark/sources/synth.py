"""Deterministic, distributed synthesizer of the interleaved-documents
table (BASELINE.json input_hint):

    doc_id : string        -- "node/123" | "way/45" | "rel/7"
    spans  : array<struct<kind:string, text:string, media_ref:string, offset:int>>

One document = one OSM entity (FIXTURES.md §1 encoding):
  node: [tag…] + one 'media' span (media_ref = WKB-hex point)
  way : [tag…] + ordered 'ref' spans (media_ref = node doc_id)
  rel : [tag…] + 'member' spans (text = outer|inner, media_ref = way doc_id)

Scale design: generation is `spark.range` + `mapInPandas`, so it
parallelizes to any cluster size; ALL randomness derives from
SplitMix64 hashes of (entity id, salt) — partition-count independent,
wall-clock free, reproducible bit-for-bit at any scale factor.

Skew: a configurable share of nodes lands in a few "hot city" centers
(BASELINE.json north_rule requires the engine to defeat exactly this
geometry-density skew via salting / range partitioning).
"""

from __future__ import annotations

import binascii

import numpy as np

SPAN_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

# world region the synthetic map lives in
LON_RANGE = (-20.0, 40.0)
LAT_RANGE = (-10.0, 55.0)

# hot-spot centers (lon, lat, stddev_deg) — density skew knobs
HOT_CELLS = [
    (13.4, 52.5, 0.05),
    (2.35, 48.85, 0.05),
    (-0.12, 51.5, 0.05),
]

_U64 = np.uint64


def _splitmix64(x):
    """Vectorized SplitMix64 — the deterministic randomness source."""
    x = (x.astype(np.uint64) + _U64(0x9E3779B97F4A7C15)) & _U64(0xFFFFFFFFFFFFFFFF)
    z = x
    z = ((z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)) & _U64(0xFFFFFFFFFFFFFFFF)
    z = ((z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)) & _U64(0xFFFFFFFFFFFFFFFF)
    return z ^ (z >> _U64(31))


def _u01(ids, salt):
    """Uniform [0,1) doubles keyed by (id, salt)."""
    h = _splitmix64(np.asarray(ids, dtype=np.uint64) * _U64(0x100000001B3) + _U64(salt * 1315423911))
    return (h >> _U64(11)).astype(np.float64) / float(1 << 53)


TAG_CHOICES = [
    # (key, [values], probability-of-presence)
    ("building", ["yes", "yes", "yes", "house", "apartments", "no"], 0.35),
    ("highway", ["primary", "secondary", "residential", "service", "platform"], 0.30),
    ("amenity", ["bank", "parking", "school", "hospital", "restaurant"], 0.15),
    ("natural", ["water", "wood", "cliff"], 0.08),
    ("waterway", ["river", "stream"], 0.05),
    ("name", None, 0.40),  # value synthesized from id
    ("addr:housenumber", None, 0.12),  # numeric string from id
    ("height", None, 0.10),  # numeric string (lexicographic-compare trap food)
    ("public_transport", ["platform", "stop_position"], 0.03),
]

UNTAGGED_FRACTION = 0.18  # skipped by the engine (reference tabular.py:264)


# compact mode: node id → cell along a BLOCK-CYCLIC Z-order curve over
# a 2^13 × 2^13 grid spanning the world region (~0.007° ≈ 800 m
# cells).  Ids are grouped into blocks of 4^6 = 4096 consecutive ids;
# each block is one 64×64-cell Z-square (a Z-curve run of 4^k indices
# aligned to 4^k IS a 2^k × 2^k square), and the SQUARE's position is
# hash-scattered over the 128×128 grid of squares.  So the CONSECUTIVE
# id runs that ways reference become spatially compact features (real
# OSM scales: metres-to-km, ≪ a z8 tile) at ANY n_nodes — the naive
# `curve_index = id` mapping would pack all ids into one corner of the
# grid and make corpus geography a function of the scale factor.
_COMPACT_BITS = 13
_COMPACT_BLOCK_BITS = 6  # 4^6 ids per block = a 64x64-cell square


def node_lonlat(node_ids, hot_fraction=0.3, compact=False):
    """Deterministic node placement.  Default: independent hash draw
    per id with hot-city density skew (the skew-evidence corpus; a
    multi-node way spans the whole region).  ``compact=True``: ids
    walk a block-cyclic Z-order curve with sub-cell jitter —
    consecutive ids are spatially adjacent (block-crossing prob
    ~0.03%/id), so ways become realistically SMALL; the density-skew
    knob is traded away (block scatter is uniform)."""
    ids = np.asarray(node_ids, dtype=np.uint64)
    if compact:
        from ..functions.cells import _compact_bits

        n = np.uint64(1) << np.uint64(_COMPACT_BITS)
        bb = np.uint64(2 * _COMPACT_BLOCK_BITS)
        n_slots = (n * n) >> bb  # 4^(13-6) block squares
        block = ids >> bb
        slot = _splitmix64(block * _U64(0x9E3779B97F4A7C15) + _U64(41)) % n_slots
        idx = (slot << bb) | (ids & ((_U64(1) << bb) - _U64(1)))
        gx = _compact_bits(idx).astype(np.float64)
        gy = _compact_bits(idx >> np.uint64(1)).astype(np.float64)
        jx = _u01(ids, 7)
        jy = _u01(ids, 8)
        lon = LON_RANGE[0] + (gx + jx) / float(n) * (LON_RANGE[1] - LON_RANGE[0])
        lat = LAT_RANGE[0] + (gy + jy) / float(n) * (LAT_RANGE[1] - LAT_RANGE[0])
        return np.clip(lon, -179.9, 179.9), np.clip(lat, -84.9, 84.9)
    u_hot = _u01(ids, 1)
    hot = u_hot < hot_fraction
    which = (_u01(ids, 2) * len(HOT_CELLS)).astype(np.int64)
    cx = np.array([h[0] for h in HOT_CELLS])[which]
    cy = np.array([h[1] for h in HOT_CELLS])[which]
    sd = np.array([h[2] for h in HOT_CELLS])[which]
    # Box-Muller from two hash streams (normals around hot centers)
    u1 = np.clip(_u01(ids, 3), 1e-12, 1.0)
    u2 = _u01(ids, 4)
    r = np.sqrt(-2.0 * np.log(u1))
    gx = r * np.cos(2 * np.pi * u2)
    gy = r * np.sin(2 * np.pi * u2)
    lon_hot = cx + gx * sd
    lat_hot = cy + gy * sd
    lon_uni = LON_RANGE[0] + _u01(ids, 5) * (LON_RANGE[1] - LON_RANGE[0])
    lat_uni = LAT_RANGE[0] + _u01(ids, 6) * (LAT_RANGE[1] - LAT_RANGE[0])
    lon = np.where(hot, lon_hot, lon_uni)
    lat = np.where(hot, lat_hot, lat_uni)
    return np.clip(lon, -179.9, 179.9), np.clip(lat, -84.9, 84.9)


def point_wkb_hex(lon, lat):
    """Vectorized little-endian WKB POINT hex strings."""
    n = len(lon)
    buf = np.zeros((n, 21), dtype=np.uint8)
    buf[:, 0] = 1  # little endian
    buf[:, 1] = 1  # point
    buf[:, 5:13] = np.asarray(lon, dtype="<f8").view(np.uint8).reshape(n, 8)
    buf[:, 13:21] = np.asarray(lat, dtype="<f8").view(np.uint8).reshape(n, 8)
    big = binascii.hexlify(buf.tobytes()).decode("ascii")
    return [big[i * 42 : (i + 1) * 42] for i in range(n)]


def entity_tags(ids, salt_base=100):
    """Deterministic tag dicts per entity id; ~UNTAGGED_FRACTION empty."""
    ids = np.asarray(ids, dtype=np.uint64)
    n = len(ids)
    untagged = _u01(ids, salt_base) < UNTAGGED_FRACTION
    cols = {}
    for j, (key, values, p) in enumerate(TAG_CHOICES):
        present = (_u01(ids, salt_base + 10 + j) < p) & ~untagged
        if values is not None:
            pick = (_u01(ids, salt_base + 50 + j) * len(values)).astype(np.int64)
            vals = np.array(values, dtype=object)[pick]
        elif key == "name":
            vals = np.array(["name %d" % i for i in ids], dtype=object)
        elif key == "addr:housenumber":
            vals = np.array([str(int(i) % 200 + 1) for i in ids], dtype=object)
        else:  # height
            vals = np.array([str(int(i) % 95 + 3) for i in ids], dtype=object)
        cols[key] = (present, vals)
    out = []
    for i in range(n):
        tags = []
        for key, (present, vals) in cols.items():
            if present[i]:
                tags.append((key, str(vals[i])))
        out.append(tags)
    return out


def _node_rows(ids, compact=False):
    lon, lat = node_lonlat(ids, compact=compact)
    wkb = point_wkb_hex(lon, lat)
    tag_lists = entity_tags(ids, salt_base=100)
    rows = []
    for i, nid in enumerate(ids):
        spans = [
            {"kind": "tag", "text": "%s=%s" % (k, v), "media_ref": "", "offset": j}
            for j, (k, v) in enumerate(tag_lists[i])
        ]
        spans.append(
            {
                "kind": "media",
                "text": "point",
                "media_ref": wkb[i],
                "offset": len(spans),
            }
        )
        rows.append(("node/%d" % nid, spans))
    return rows


def _way_rows(ids, n_nodes, closed_fraction=0.45, missing_ref_fraction=0.01,
              compact=False):
    """Way i references a locality-preserving run of node ids.  Closed
    ways repeat their first ref last.  A small fraction references one
    node id beyond the node table → 'Incomplete way' dropout
    (reference tabular.py:305-306)."""
    ids_u = np.asarray(ids, dtype=np.uint64)
    nref = (2 + (_u01(ids_u, 200) * 9).astype(np.int64)).tolist()
    start = (_u01(ids_u, 201) * max(n_nodes - 16, 1)).astype(np.int64).tolist()
    closed = (_u01(ids_u, 202) < closed_fraction).tolist()
    broken = (_u01(ids_u, 203) < missing_ref_fraction).tolist()
    tag_lists = entity_tags(ids_u, salt_base=300)
    rows = []
    for i, wid in enumerate(ids):
        refs = list(range(start[i], start[i] + max(nref[i], 2)))
        if broken[i]:
            refs[-1] = n_nodes + int(wid)  # dangling ref
        elif closed[i]:
            # order refs by angle around their coordinate mean so the
            # ring is star-shaped (simple polygon) — real closed ways
            # are simple; random order would make self-intersecting
            # bowties whose shoelace area/centroid are meaningless
            lon, lat = node_lonlat(np.array(refs, dtype=np.uint64), compact=compact)
            ang = np.arctan2(lat - lat.mean(), lon - lon.mean())
            refs = [refs[j] for j in np.argsort(ang, kind="stable")]
            refs = refs + [refs[0]]
        spans = [
            {"kind": "tag", "text": "%s=%s" % (k, v), "media_ref": "", "offset": j}
            for j, (k, v) in enumerate(tag_lists[i])
        ]
        off = len(spans)
        for j, r in enumerate(refs):
            spans.append(
                {"kind": "ref", "text": "", "media_ref": "node/%d" % r, "offset": off + j}
            )
        rows.append(("way/%d" % wid, spans))
    return rows


def _way_is_closed(way_id, closed_fraction=0.45, missing_ref_fraction=0.01):
    """Same hash draws as _way_rows — lets relation generation pick
    closed member ways without materializing the way table."""
    wid = np.asarray([way_id], dtype=np.uint64)
    return bool(
        (_u01(wid, 203) >= missing_ref_fraction)[0]
        and (_u01(wid, 202) < closed_fraction)[0]
    )


def _rel_rows(ids, n_ways):
    """Multipolygon relations: 1 outer way + 0..2 inner ways.  Members
    prefer CLOSED ways (scan forward from a seeded start) so most
    relations assemble; the remainder reference open/broken ways and
    exercise the 'Invalid area' rejection (reference tabular.py:338-339)."""
    ids_u = np.asarray(ids, dtype=np.uint64)

    def pick_closed(start):
        for k in range(n_ways):
            w = (start + k) % n_ways
            if _way_is_closed(w):
                return w
        return start % n_ways

    raw = (_u01(ids_u, 400) * n_ways).astype(np.int64)
    keep_open = _u01(ids_u, 402) < 0.15  # leave some invalid on purpose
    outer = [
        int(r) if ko else pick_closed(int(r)) for r, ko in zip(raw, keep_open)
    ]
    n_inner = (_u01(ids_u, 401) * 3).astype(np.int64).tolist()
    tag_lists = entity_tags(ids_u, salt_base=500)
    rows = []
    for i, rid in enumerate(ids):
        spans = [
            {"kind": "tag", "text": "type=multipolygon", "media_ref": "", "offset": 0}
        ]
        for j, (k, v) in enumerate(tag_lists[i]):
            if k == "type":
                continue
            spans.append(
                {"kind": "tag", "text": "%s=%s" % (k, v), "media_ref": "", "offset": j + 1}
            )
        off = len(spans)
        members = [("outer", outer[i])]
        for j in range(n_inner[i]):
            members.append(("inner", pick_closed(outer[i] + 1 + j)))
        for j, (role, w) in enumerate(members):
            spans.append(
                {
                    "kind": "member",
                    "text": role,
                    "media_ref": "way/%d" % w,
                    "offset": off + j,
                }
            )
        rows.append(("rel/%d" % rid, spans))
    return rows


def synthesize(
    spark, n_nodes=10000, n_ways=2000, n_rels=100, partitions=None, hot_keys=(),
    compact=False,
):
    """Distributed deterministic documents table.  Entities are encoded
    into one `spark.range` id space: [0,n_nodes) nodes, then ways, then
    relations.

    `hot_keys` models an INGEST-time sargable projection (the Iceberg
    writer's job in production): each named tag key is additionally
    materialized as a top-level nullable string column ``hk_<key>`` =
    the entity's value for that key — plain columns reach parquet
    min/max + dictionary stats, so theme predicates routed through
    them (functions/sargable.py) prune row groups at the scan."""
    import pandas as pd  # noqa: F401

    from ..functions.sargable import hot_column

    hot_cols = [(k, hot_column(k), k + "=") for k in hot_keys]
    schema = SPAN_SCHEMA + "".join(", %s string" % c for _k, c, _p in hot_cols)
    total = n_nodes + n_ways + n_rels
    rng = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            node_ids = ids[ids < n_nodes]
            if len(node_ids):
                rows += _node_rows(node_ids.tolist(), compact=compact)
            way_ids = ids[(ids >= n_nodes) & (ids < n_nodes + n_ways)] - n_nodes
            if len(way_ids):
                rows += _way_rows(way_ids.tolist(), n_nodes, compact=compact)
            rel_ids = ids[ids >= n_nodes + n_ways] - (n_nodes + n_ways)
            if len(rel_ids):
                rows += _rel_rows(rel_ids.tolist(), n_ways)
            import pandas as pd

            data = {"doc_id": [r[0] for r in rows], "spans": [r[1] for r in rows]}
            for _k, col, pref in hot_cols:
                data[col] = [
                    next(
                        (
                            s["text"][len(pref):]
                            for s in spans
                            if s["kind"] == "tag" and s["text"].startswith(pref)
                        ),
                        None,
                    )
                    for _d, spans in rows
                ]
            yield pd.DataFrame(data)

    return rng.mapInPandas(gen, schema=schema)
