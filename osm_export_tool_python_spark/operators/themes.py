"""Theme fan-out: route each feature to every matching theme in ONE
pass over the feature frame.

The reference loops over themes per entity, building the geometry once
and writing to each matching output (tabular.py:266-277).  The Spark
equivalent: compute an array<boolean> of theme matches (all-Catalyst,
functions/compile.theme_match_array), posexplode it, and keep matched
(feature, theme) pairs.  Geometry columns are carried by reference —
built exactly once upstream, reused by every theme, preserving the
reference's single-geometry-build guarantee structurally."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.compile import any_theme_predicate, theme_match_array


def theme_fanout(features: DataFrame, mapping) -> DataFrame:
    """features → one row per (feature, matching theme); adds `theme`."""
    names = F.array(*[F.lit(t.name) for t in mapping.themes])
    df = (
        features.withColumn("__m", theme_match_array(mapping.themes))
        .select("*", F.posexplode("__m").alias("__ti", "__matched"))
        .where(F.col("__matched"))
        .withColumn("theme", F.try_element_at(names, F.col("__ti") + 1))
        .drop("__m", "__ti", "__matched")
    )
    return df


def prefilter(features: DataFrame, mapping) -> DataFrame:
    """Coarse any-theme pushdown — apply BEFORE expensive operators
    (clip, tiles) so Catalyst prunes early (the engine's analogue of the
    reference's source-level filter compilation, sources.py)."""
    return features.where(F.size("tags") > 0).where(
        any_theme_predicate(mapping.themes)
    )


def theme_output(themed: DataFrame, theme, polygon_centroid=False) -> DataFrame:
    """Per-theme output projection: osm_id (flag-gated), geometry,
    selected keys (missing → NULL).  Matches the reference writer row
    shape (tabular.py:71-79)."""
    from ..functions.compile import select_keys_projection

    df = themed.where(F.col("theme") == theme.name)
    cols = []
    if theme.osm_id:
        # sign convention already applied at assembly (negative for
        # relation-derived areas, tabular.py:313)
        cols.append(F.col("osm_id"))
    cols += [
        F.col("geom_type"),
        F.col("xs"),
        F.col("ys"),
        F.col("ring_offsets"),
        F.col("part_offsets"),
    ]
    cols += select_keys_projection(theme)
    out = df.select(*cols)
    if polygon_centroid:
        out = polygons_to_centroids(out)
    return out


def polygons_to_centroids(df: DataFrame) -> DataFrame:
    """polygon→centroid-point mode (reference tabular.py:252,332-334).
    Shoelace centroid of the first (outer) ring, pure Column math via
    aggregate over the coordinate arrays."""
    n = F.try_element_at("ring_offsets", F.lit(2))  # end of first ring
    xs = F.slice("xs", 1, n)
    ys = F.slice("ys", 1, n)
    # cross_i = x_i*y_{i+1} - x_{i+1}*y_i over the closed ring
    idx = F.sequence(F.lit(1), n - 1)
    cross = F.transform(
        idx,
        lambda i: F.try_element_at(xs, i) * F.try_element_at(ys, i + 1)
        - F.try_element_at(xs, i + 1) * F.try_element_at(ys, i),
    )
    area2 = F.aggregate(cross, F.lit(0.0), lambda acc, c: acc + c)
    cx_num = F.aggregate(
        F.transform(
            idx,
            lambda i: (F.try_element_at(xs, i) + F.try_element_at(xs, i + 1))
            * (
                F.try_element_at(xs, i) * F.try_element_at(ys, i + 1)
                - F.try_element_at(xs, i + 1) * F.try_element_at(ys, i)
            ),
        ),
        F.lit(0.0),
        lambda acc, c: acc + c,
    )
    cy_num = F.aggregate(
        F.transform(
            idx,
            lambda i: (F.try_element_at(ys, i) + F.try_element_at(ys, i + 1))
            * (
                F.try_element_at(xs, i) * F.try_element_at(ys, i + 1)
                - F.try_element_at(xs, i + 1) * F.try_element_at(ys, i)
            ),
        ),
        F.lit(0.0),
        lambda acc, c: acc + c,
    )
    # degenerate ring (area 0): fall back to vertex mean
    cx = F.when(area2 != 0.0, cx_num / (F.lit(3.0) * area2)).otherwise(
        F.aggregate(xs, F.lit(0.0), lambda a, v: a + v) / F.size(xs)
    )
    cy = F.when(area2 != 0.0, cy_num / (F.lit(3.0) * area2)).otherwise(
        F.aggregate(ys, F.lit(0.0), lambda a, v: a + v) / F.size(ys)
    )
    is_poly = F.col("geom_type") == "polygon"
    return (
        df.withColumn("__cx", cx)
        .withColumn("__cy", cy)
        .withColumn("xs", F.when(is_poly, F.array("__cx")).otherwise(F.col("xs")))
        .withColumn("ys", F.when(is_poly, F.array("__cy")).otherwise(F.col("ys")))
        .withColumn(
            "ring_offsets",
            F.when(is_poly, F.array(F.lit(0), F.lit(1)).cast("array<int>")).otherwise(
                F.col("ring_offsets")
            ),
        )
        .withColumn(
            "part_offsets",
            F.when(is_poly, F.array(F.lit(0), F.lit(1)).cast("array<int>")).otherwise(
                F.col("part_offsets")
            ),
        )
        .withColumn(
            "geom_type", F.when(is_poly, F.lit("point")).otherwise(F.col("geom_type"))
        )
        .drop("__cx", "__cy")
    )
