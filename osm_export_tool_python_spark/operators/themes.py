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
    structural = (["osm_id"] if theme.osm_id else []) + [
        "geom_type", "xs", "ys", "ring_offsets", "part_offsets",
    ]
    cols += select_keys_projection(theme, taken=structural)
    out = df.select(*cols)
    if polygon_centroid:
        out = polygons_to_centroids(out)
    return out


def polygons_to_centroids(df: DataFrame) -> DataFrame:
    """polygon→centroid-point mode (reference tabular.py:252,332-334).

    OGR ``Centroid()`` semantics over the WHOLE multipolygon: hole-signed
    shoelace accumulated across every ring of every part — each part's
    first ring (outer) adds area, subsequent rings (holes) subtract, and
    each ring's orientation is normalized by the sign of its own shoelace
    area so stored vertex order doesn't matter.  Pure Column math."""
    n_rings = F.size("ring_offsets") - 1
    # 0-based ring q is an OUTER ring iff it starts a part
    outers = F.slice(
        "part_offsets", 1, F.greatest(F.size("part_offsets") - 1, F.lit(0))
    )

    def ring_stats(q):
        s = F.try_element_at(F.col("ring_offsets"), (q + 1).cast("int"))
        e = F.try_element_at(F.col("ring_offsets"), (q + 2).cast("int"))
        idx = F.sequence(s + 1, e - 1)  # 1-based vertex positions (closed ring)
        cross = lambda i: (  # noqa: E731
            F.try_element_at(F.col("xs"), i.cast("int"))
            * F.try_element_at(F.col("ys"), (i + 1).cast("int"))
            - F.try_element_at(F.col("xs"), (i + 1).cast("int"))
            * F.try_element_at(F.col("ys"), i.cast("int"))
        )
        area2 = F.aggregate(
            F.transform(idx, lambda i: cross(i)), F.lit(0.0), lambda a, c: a + c
        )
        cxn = F.aggregate(
            F.transform(
                idx,
                lambda i: (
                    F.try_element_at(F.col("xs"), i.cast("int"))
                    + F.try_element_at(F.col("xs"), (i + 1).cast("int"))
                )
                * cross(i),
            ),
            F.lit(0.0),
            lambda a, c: a + c,
        )
        cyn = F.aggregate(
            F.transform(
                idx,
                lambda i: (
                    F.try_element_at(F.col("ys"), i.cast("int"))
                    + F.try_element_at(F.col("ys"), (i + 1).cast("int"))
                )
                * cross(i),
            ),
            F.lit(0.0),
            lambda a, c: a + c,
        )
        # +1 outer / -1 hole, times orientation sign → additive weight
        role = F.when(F.exists(outers, lambda p: p.cast("long") == q), F.lit(1.0)).otherwise(
            F.lit(-1.0)
        )
        w = role * F.signum(area2)
        return F.struct(
            (w * area2).alias("a"), (w * cxn).alias("cxn"), (w * cyn).alias("cyn")
        )

    stats = F.transform(F.sequence(F.lit(0), n_rings - 1), lambda q: ring_stats(q))
    area2 = F.aggregate(stats, F.lit(0.0), lambda a, s: a + s.a)
    cx_num = F.aggregate(stats, F.lit(0.0), lambda a, s: a + s.cxn)
    cy_num = F.aggregate(stats, F.lit(0.0), lambda a, s: a + s.cyn)
    # degenerate (zero total area): fall back to the mean of all vertices
    cx = F.when(area2 != 0.0, cx_num / (F.lit(3.0) * area2)).otherwise(
        F.aggregate(F.col("xs"), F.lit(0.0), lambda a, v: a + v) / F.size("xs")
    )
    cy = F.when(area2 != 0.0, cy_num / (F.lit(3.0) * area2)).otherwise(
        F.aggregate(F.col("ys"), F.lit(0.0), lambda a, v: a + v) / F.size("ys")
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
