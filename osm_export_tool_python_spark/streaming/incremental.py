"""Incremental (streaming) exports.

The reference is strictly batch (SURVEY.md §2.9) — one apply_file pass.
This module is the engine's forward-looking stretch: the same decode +
theme predicates run unchanged over a STREAM of document files
(readStream on the documents directory ≈ an Iceberg change-log feed),
so a growing table exports incrementally with exactly-once sinks via
checkpointing.

Everything here reuses the batch Column expressions — decode and theme
compilation are stream-agnostic because they are pure projections and
filters (no UDF state, no RDDs)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def stream_documents(spark, input_dir: str, max_files_per_trigger: int = None) -> DataFrame:
    """readStream over a documents parquet directory."""
    reader = spark.readStream.schema(SPAN_STRUCT)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def incremental_point_features(
    doc_stream: DataFrame, mapping, select_keys: bool = True
) -> DataFrame:
    """Streaming point-feature extraction: decode tags + node coords,
    theme fan-out — append-mode safe (no aggregation).

    `select_keys=True` additionally projects the union of the
    mapping's select keys as NULL-padded top-level columns (the batch
    `theme_output` row shape, reference tabular.py:71-79), so the
    streamed sink is directly consumable without the tags map."""
    from ..operators.themes import theme_fanout
    from ..sources import decode

    meta = decode.with_entity_meta(doc_stream)
    nodes = decode.nodes_table(meta).where(F.size("tags") > 0)
    feats = nodes.select(
        F.col("node_id").alias("osm_id"),
        F.lit("node").alias("src"),
        F.lit("point").alias("geom_type"),
        "tags",
        F.array("lon").alias("xs"),
        F.array("lat").alias("ys"),
        F.array(F.lit(0), F.lit(1)).cast("array<int>").alias("ring_offsets"),
        F.array(F.lit(0), F.lit(1)).cast("array<int>").alias("part_offsets"),
    )
    themed = theme_fanout(feats, mapping)
    if select_keys:
        keys = sorted({k for t in mapping.themes for k in t.keys})
        taken = set(themed.columns)
        # a key that collides with a structural output column ('theme',
        # 'osm_id', 'tags' …) gets the same deterministic '_tag' suffix
        # as the batch projection (functions/compile.select_keys_
        # projection) — a duplicate name would fail at stream start
        themed = themed.select(
            "*",
            *[
                F.try_element_at("tags", F.lit(kk)).alias(
                    kk if kk not in taken else kk + "_tag"
                )
                for kk in keys
            ],
        )
    return themed


def run_incremental_export(
    spark,
    input_dir: str,
    mapping,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Append-mode streaming export of point features with an
    exactly-once parquet sink (Spark checkpoint = resume state)."""
    themed = incremental_point_features(stream_documents(spark, input_dir), mapping)
    writer = (
        themed.drop("tags")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Late-data-tolerant windowed aggregation over the events stream
    (ts, event_type): the canonical watermark + window pattern."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select("w.start", "w.end", "event_type", "n", "total_value")
    )
