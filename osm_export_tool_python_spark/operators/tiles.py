"""Raster↔vector tile assignment (the MBTiles-equivalent sink's core).

The reference's mbtiles path fetches raster XYZ tiles over the AOI bbox
for a zoom range (nontabular.py:103-108, landez).  The engine's
vector-native equivalent: assign every feature to the XYZ tiles its
bbox covers at each zoom in [min_zoom, max_zoom], then pack tiles with
groupBy.

Skew is the design driver here (axis A+B): geometry density is wildly
non-uniform (hot city cells), so:
  - tile-cell explosion happens BEFORE the shuffle, so Spark's
    partial aggregation (map-side combine) absorbs per-tile counts;
  - for the feature-packing variant the shuffle key is salted:
    (cell, pmod(hash(osm_id), salt)) sub-buckets hot tiles, the final
    merge regroups by cell only — exact same tile contents, bounded
    per-task skew;
  - `repartitionByRange` on cell before the write produces
    spatially-clustered output files (range partitioner samples the
    cell distribution — hot areas get more files).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import cell_from_zxy, lonlat_to_tile


def _tiles_for_bbox(xmin, ymin, xmax, ymax, zooms, max_cells_per_zoom=256):
    """All covering cells of one bbox across zooms (numpy per row)."""
    out = []
    for z in zooms:
        x0, y1 = lonlat_to_tile(np.array([xmin]), np.array([ymin]), z)
        x1, y0 = lonlat_to_tile(np.array([xmax]), np.array([ymax]), z)
        nx = int(x1[0]) - int(x0[0]) + 1
        ny = int(y1[0]) - int(y0[0]) + 1
        if nx * ny > max_cells_per_zoom:
            continue  # coarse zoom already covers it; skip absurd fanout
        xs = np.arange(int(x0[0]), int(x1[0]) + 1, dtype=np.uint64)
        for ty in range(int(y0[0]), int(y1[0]) + 1):
            cells = cell_from_zxy(z, xs, np.full(len(xs), ty, dtype=np.uint64))
            out.extend(int(c) for c in cells.astype(np.int64))
    return out


def _spread_bits_col(v):
    """Morton bit-spread as pure Column ops (inverse of decode_cell_cols'
    compact) — bit i of the low 32 moves to bit 2i."""
    v = v.bitwiseAND(F.lit(0x00000000FFFFFFFF))
    v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
    v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
    v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
    v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
    v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
    return v


def tile_x_col(lon, zoom):
    """lon → tile x at zoom, pure Column math (same formula as
    functions/cells.lonlat_to_tile)."""
    n = F.pow(F.lit(2.0), zoom.cast("double"))
    x = F.floor((lon + 180.0) / 360.0 * n)
    return F.greatest(F.lit(0), F.least(x, (n - 1).cast("long"))).cast("long")


def tile_y_col(lat, zoom):
    n = F.pow(F.lit(2.0), zoom.cast("double"))
    lat_c = F.greatest(F.lit(-85.05112878), F.least(lat, F.lit(85.05112878)))
    rad = F.radians(lat_c)
    y = F.floor((1.0 - F.asinh(F.tan(rad)) / float(__import__("math").pi)) / 2.0 * n)
    return F.greatest(F.lit(0), F.least(y, (n - 1).cast("long"))).cast("long")


def cell_col(zoom, x, y):
    return (
        F.shiftleft(_spread_bits_col(x).bitwiseOR(F.shiftleft(_spread_bits_col(y), 1)), 5)
        .bitwiseOR(zoom.cast("long"))
    )


def with_tile_cells(
    features: DataFrame, min_zoom: int, max_zoom: int, max_cells_per_zoom: int = 256
) -> DataFrame:
    """Add `cell` (exploded): one row per (feature, covering tile,
    zoom).  Entirely JVM-side Column math — zoom explode, per-zoom
    bbox→tile-range arithmetic, sequence×sequence explode, Morton
    packing — so whole-stage codegen handles millions of features
    without touching Python.  Features whose bbox covers more than
    `max_cells_per_zoom` tiles at a zoom are skipped at that zoom
    (coarser zooms still cover them)."""
    z = F.explode(F.sequence(F.lit(min_zoom), F.lit(max_zoom))).alias("z")
    df = features.select("*", z)
    x0 = tile_x_col(F.array_min("xs"), F.col("z"))
    x1 = tile_x_col(F.array_max("xs"), F.col("z"))
    y0 = tile_y_col(F.array_max("ys"), F.col("z"))  # y grows southward
    y1 = tile_y_col(F.array_min("ys"), F.col("z"))
    df = df.withColumn("__x0", x0).withColumn("__x1", x1).withColumn("__y0", y0).withColumn("__y1", y1)
    df = df.where(
        (F.col("__x1") - F.col("__x0") + 1) * (F.col("__y1") - F.col("__y0") + 1)
        <= max_cells_per_zoom
    )
    df = df.withColumn("__tx", F.explode(F.sequence("__x0", "__x1")))
    df = df.withColumn("__ty", F.explode(F.sequence("__y0", "__y1")))
    return df.withColumn(
        "cell", cell_col(F.col("z"), F.col("__tx"), F.col("__ty"))
    ).drop("z", "__x0", "__x1", "__y0", "__y1", "__tx", "__ty")


def point_tile_assignment(features: DataFrame, zoom: int) -> DataFrame:
    """Exact single-zoom assignment for point features — pure pandas_udf
    cell encode, no explode."""
    from ..functions.cells import cell_udf

    return features.where(F.col("geom_type") == "point").withColumn(
        "cell", cell_udf(zoom)(F.try_element_at("xs", F.lit(1)), F.try_element_at("ys", F.lit(1)))
    )


def tile_counts(features: DataFrame, min_zoom: int, max_zoom: int) -> DataFrame:
    """(z, x, y, n_features) — partial agg absorbs hot-cell skew."""
    with_cells = with_tile_cells(features, min_zoom, max_zoom)
    counts = with_cells.groupBy("cell").agg(F.count("*").alias("n_features"))
    return counts.select(
        decode_cell_cols("cell"),
        F.col("n_features"),
    ).select("c.z", "c.x", "c.y", "n_features")


def decode_cell_cols(cell_col="cell"):
    """cell id → struct<z,x,y> in pure Column bit math (JVM-side,
    mirrors functions/cells.cell_decode)."""
    c = F.col(cell_col) if isinstance(cell_col, str) else cell_col
    z = c.bitwiseAND(F.lit(31))
    m = F.shiftrightunsigned(c, 5)

    def compact(v):
        v = v.bitwiseAND(F.lit(0x5555555555555555))
        v = v.bitwiseOR(F.shiftrightunsigned(v, 1)).bitwiseAND(F.lit(0x3333333333333333))
        v = v.bitwiseOR(F.shiftrightunsigned(v, 2)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        v = v.bitwiseOR(F.shiftrightunsigned(v, 4)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        v = v.bitwiseOR(F.shiftrightunsigned(v, 8)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        v = v.bitwiseOR(F.shiftrightunsigned(v, 16)).bitwiseAND(F.lit(0x00000000FFFFFFFF))
        return v

    return F.struct(
        z.cast("int").alias("z"),
        compact(m).cast("long").alias("x"),
        compact(F.shiftrightunsigned(m, 1)).cast("long").alias("y"),
    ).alias("c")


def tile_features(
    features: DataFrame, min_zoom: int, max_zoom: int, salt: int = 16
) -> DataFrame:
    """(z, x, y, n_features, osm_ids) — the packed tile table.

    Two-phase salted aggregation: hot tiles are split into `salt`
    sub-buckets for the wide shuffle, then merged per tile.  Tile
    contents are exactly the unsalted result; only the shuffle's key
    cardinality changes."""
    with_cells = with_tile_cells(features, min_zoom, max_zoom)
    salted = with_cells.withColumn(
        "__salt", F.pmod(F.hash("osm_id"), F.lit(salt))
    )
    partial = salted.groupBy("cell", "__salt").agg(
        F.count("*").alias("pn"),
        F.collect_list("osm_id").alias("pids"),
    )
    merged = partial.groupBy("cell").agg(
        F.sum("pn").alias("n_features"),
        F.sort_array(F.flatten(F.collect_list("pids"))).alias("osm_ids"),
    )
    return merged.select(decode_cell_cols("cell"), "n_features", "osm_ids").select(
        "c.z", "c.x", "c.y", "n_features", "osm_ids"
    )
