"""AOI clipping: cell-cover prefilter + exact numpy kernels.

Reference semantics (tabular.py):
  - points: kept iff AOI strictly contains them (prepared.contains,
    :271-275) — not-contained points are DROPPED,
  - lines: dropped unless intersects (:294-300); clipped unless
    contained (may become multi-part),
  - polygons: same rule (:321-327).

Spark-first structure (replaces shapely prepared geometry):
  1. driver: AOI → quadtree cell cover with inside/boundary classes
     (functions/cells.polygon_cover) — the prep() equivalent,
  2. per feature (pure Column math): bbox → candidate class via a
     broadcast cover dict inside one Arrow-vectorized pandas UDF:
     'inside'  → keep with NO exact test (fast path),
     'outside' → drop immediately,
     'boundary'→ exact numpy kernel on the candidate subset only.
  3. exact kernel (mapInPandas over candidates): PIP for points; for
     lines/polygons intersects-test + convex-AOI cutting
     (Cyrus–Beck / Sutherland–Hodgman).

At 100 TB the win is step 2: the cover broadcast is a few KB–MB, the
candidate fraction is the AOI-boundary surface area ratio, and no
shuffle is introduced — classification and clipping are narrow maps.

v1 exactness (documented in functions/geomkernel.py): cutting is exact
for convex AOIs; concave AOIs drop non-intersecting features exactly
but keep crossing geometries uncut.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import geomkernel as gk
from ..functions.cells import cell_from_zxy, cover_at_zoom, lonlat_to_tile, polygon_cover

DEFAULT_COVER_ZOOM = 10


class AOI:
    """Driver-side prepared AOI: rings + convexity + (lazy) cell cover.

    The cover is only needed for SCAN-level partition pruning (cell
    prefixes → Iceberg/parquet partition filter); per-feature clip
    classification works directly on the rings, so the quadtree is not
    built unless asked for."""

    def __init__(self, rings, cover_zoom=DEFAULT_COVER_ZOOM):
        self.rings = [np.asarray(r, dtype=np.float64) for r in rings]
        self.cover_zoom = cover_zoom
        self._cover = None
        self.convex = len(self.rings) == 1 and gk.is_convex(self.rings[0])

    @property
    def cover(self):
        if self._cover is None:
            self._cover = cover_at_zoom(
                polygon_cover(self.rings, self.cover_zoom), self.cover_zoom
            )
        return self._cover

    def cell_classes(self):
        inside = np.array(
            [c for c, v in self.cover.items() if v == "inside"], dtype=np.int64
        )
        boundary = np.array(
            [c for c, v in self.cover.items() if v == "boundary"], dtype=np.int64
        )
        return inside, boundary

    def prune_cells(self, zoom):
        """Cell ids at `zoom` overlapping the AOI — the partition-
        pruning predicate for a cell-partitioned scan."""
        from ..functions.cells import cell_parent

        cells = np.array(sorted(self.cover), dtype=np.int64)
        if zoom == self.cover_zoom:
            return set(int(c) for c in cells)
        if zoom > self.cover_zoom:
            raise ValueError(
                "prune_cells zoom %d is finer than the AOI cover zoom %d; "
                "build the AOI with cover_zoom>=%d" % (zoom, self.cover_zoom, zoom)
            )
        return set(int(c) for c in np.unique(cell_parent(cells, zoom)))


def _classify_batch(xs_min, ys_min, xs_max, ys_max, rings):
    """Vectorized bbox → 'i'/'o'/'b' classification DIRECTLY against the
    AOI rings (functions/geomkernel.classify_bboxes) — O(N×edges), no
    per-tile loops.  The quadtree cell cover remains the scan-level
    partition-pruning structure (AOI → cell prefixes), but per-feature
    classification never touches cells."""
    from ..functions.geomkernel import classify_bboxes

    return classify_bboxes(xs_min, ys_min, xs_max, ys_max, rings)


def _exact_row(geom_type, xs, ys, ring_offsets, part_offsets, aoi):
    """Exact clip of one candidate feature.  Returns updated packed
    arrays or None (drop).  numpy per feature (batched at the Arrow
    level; candidate sets are small by construction)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    pts = np.stack([xs, ys], axis=1)

    if geom_type == "point":
        return (
            (xs.tolist(), ys.tolist(), list(ring_offsets), list(part_offsets))
            if gk.points_in_rings(pts[:1], aoi.rings)[0]
            else None
        )

    any_vertex_in = bool(gk.points_in_rings(pts, aoi.rings).any())
    # vectorized feature-edges × AOI-edges proper-crossing test
    crosses = gk.polyline_crosses_rings(pts, aoi.rings)
    # polygon case: AOI fully inside feature also intersects
    aoi_first_in_feature = False
    if geom_type == "polygon" and not (any_vertex_in or crosses):
        rings = [
            pts[ring_offsets[i] : ring_offsets[i + 1]]
            for i in range(len(ring_offsets) - 1)
        ]
        aoi_first_in_feature = bool(gk.points_in_rings(aoi.rings[0][:1], rings)[0])

    intersects = any_vertex_in or crosses or aoi_first_in_feature
    if not intersects:
        return None  # drop (tabular.py:296-297,323-324)

    fully_inside = bool(gk.points_in_rings(pts, aoi.rings).all()) and not crosses
    if fully_inside or not aoi.convex:
        # contained ⇒ keep whole; concave AOI ⇒ keep uncut (v1 policy)
        return (xs.tolist(), ys.tolist(), list(ring_offsets), list(part_offsets))

    clip_poly = aoi.rings[0]
    if geom_type == "line":
        pieces = []
        for i in range(len(ring_offsets) - 1):
            seg = pts[ring_offsets[i] : ring_offsets[i + 1]]
            pieces.extend(gk.clip_polyline_convex(seg, clip_poly))
        if not pieces:
            return None
        nxs, nys, offs = [], [], [0]
        for p in pieces:
            nxs.extend(p[:, 0].tolist())
            nys.extend(p[:, 1].tolist())
            offs.append(len(nxs))
        return (nxs, nys, offs, [0, len(offs) - 1])

    # polygon: clip each ring; dropped rings vanish
    nxs, nys, roffs, poffs = [], [], [0], [0]
    for pi in range(len(part_offsets) - 1):
        rings_in_part = range(part_offsets[pi], part_offsets[pi + 1])
        wrote = 0
        for ri in rings_in_part:
            ring = pts[ring_offsets[ri] : ring_offsets[ri + 1]]
            clipped = gk.clip_ring_convex(ring, clip_poly)
            if len(clipped) >= 3:
                closed = np.vstack([clipped, clipped[0]])
                nxs.extend(closed[:, 0].tolist())
                nys.extend(closed[:, 1].tolist())
                roffs.append(len(nxs))
                wrote += 1
        if wrote:
            poffs.append(len(roffs) - 1)
    if len(roffs) == 1:
        return None
    return (nxs, nys, roffs, poffs)


def clip_features(features: DataFrame, aoi: AOI) -> DataFrame:
    """The full clip operator.  Narrow (no shuffle): classify + exact
    kernel are both vectorized maps with the AOI broadcast."""
    spark = features.sparkSession
    sc = spark.sparkContext
    b_aoi = sc.broadcast(
        {
            "rings": [r.tolist() for r in aoi.rings],
            "convex": aoi.convex,
        }
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def classify(xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series) -> pd.Series:
        a = b_aoi.value
        return pd.Series(
            _classify_batch(
                xmin.to_numpy(np.float64),
                ymin.to_numpy(np.float64),
                xmax.to_numpy(np.float64),
                ymax.to_numpy(np.float64),
                [np.asarray(r) for r in a["rings"]],
            )
        )

    with_cls = features.withColumn(
        "__clip",
        classify(
            F.array_min("xs"), F.array_min("ys"), F.array_max("xs"), F.array_max("ys")
        ),
    )
    kept = with_cls.where(F.col("__clip") == "i").drop("__clip")
    candidates = with_cls.where(F.col("__clip") == "b").drop("__clip")

    schema = candidates.schema

    def exact(batches):
        aoi_local = AOI.__new__(AOI)
        a = b_aoi.value
        aoi_local.rings = [np.asarray(r) for r in a["rings"]]
        aoi_local.convex = a["convex"]
        for pdf in batches:
            rows = []
            for t in pdf.itertuples(index=False):
                res = _exact_row(
                    t.geom_type, t.xs, t.ys, t.ring_offsets, t.part_offsets, aoi_local
                )
                if res is None:
                    continue
                d = t._asdict()
                d["xs"], d["ys"], d["ring_offsets"], d["part_offsets"] = res
                rows.append(d)
            if rows:
                yield pd.DataFrame(rows)

    clipped = candidates.mapInPandas(exact, schema=schema)
    return kept.unionByName(clipped)
