"""CLI entry point — the engine's equivalent of the reference's
``osm-export-tool INPUT OUTPUT -m map.yml --clip aoi -f gpkg,shp``
(reference cmd.py:10-66), Spark-first: INPUT is an interleaved
documents table (parquet/Iceberg path) instead of a .pbf file.

    spark-osm-export DOCS_PATH OUT_DIR -f gpkg,shp,kml,tiles \
        -m mapping.yml --clip aoi.geojson --omit-osm-ids \
        --polygon-centroid --master local[32]
"""

from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export an interleaved OSM documents table to themed formats."
    )
    parser.add_argument("docs_path", help="parquet/Iceberg documents table path")
    parser.add_argument("output_name", help="output directory")
    parser.add_argument(
        "-f", "--formats", default="gpkg",
        help="comma list of gpkg,shp,kml,tiles (default: gpkg)",
    )
    parser.add_argument(
        "-m", "--mapping", help="YAML feature mapping (default: bundled default.yml)"
    )
    parser.add_argument("--clip", help="GeoJSON or POLY file to clip geometries")
    parser.add_argument("--omit-osm-ids", action="store_true")
    parser.add_argument("--polygon-centroid", action="store_true")
    parser.add_argument("--tile-zooms", default="0,8", help="min,max tile zooms")
    parser.add_argument("--master", default=None, help="spark master (default local[cpus])")
    parser.add_argument("--no-resume", action="store_true")
    parser.add_argument(
        "--binary", action="store_true",
        help="also write the single-file artifacts (.gpkg/.shp/.kml/"
        ".mbtiles) via the driver-side streamed writer — a single-"
        "writer pass over every feature, so opt-in at scale",
    )
    parser.add_argument(
        "--checkpoint", nargs="?", const="local",
        choices=["local", "parquet", "auto"], default=None,
        help="materialize pipeline intermediates via a lineage-truncating "
        "checkpoint instead of persist (downstream actions plan over "
        "flat scans).  'local' stores raw rows on the executors — "
        "fast on latency-bound batches but trades away fault "
        "recovery; 'parquet' stores snappy parquet — faster AND "
        "better-scaling on wide frames (BENCH/AB_CKPT.json), and a "
        "reliable checkpoint when SPARK_OSM_CKPT_DIR points at "
        "durable storage; 'auto' picks the store from the input "
        "scan's size estimate (small → local, large/unknown → "
        "parquet).  Bare --checkpoint means 'local' "
        "(backward compatible)",
    )
    parser.add_argument(
        "--metrics", action="store_true",
        help="also record assembly dropout metrics (incomplete ways / invalid relations)",
    )
    parser.add_argument(
        "--package", action="store_true",
        help="zip the exported datasets (+ clipping_boundary.geojson) into "
        "OUT_DIR/export.zip (reference create_package)",
    )
    parser.add_argument(
        "--posm-bundle", action="store_true",
        help="tar.gz POSM bundle with typed contents manifest into "
        "OUT_DIR/bundle.tar.gz (reference create_posm_bundle)",
    )
    parser.add_argument("-v", "--verbose", action="store_true")
    parsed = parser.parse_args(argv)

    from .functions.mapping import Mapping
    from .plans.export import export
    from .plans.session import default_session
    from .sources.geometry_io import load_geometry, rings_for_clip

    if parsed.mapping:
        with open(parsed.mapping) as f:
            mapping_txt = f.read()
    else:
        with open(
            os.path.join(os.path.dirname(__file__), "mappings", "default.yml")
        ) as f:
            mapping_txt = f.read()
    mapping = Mapping(mapping_txt, default_osm_id=not parsed.omit_osm_ids)

    aoi_rings = None
    if parsed.clip:
        with open(parsed.clip) as f:
            aoi_rings = rings_for_clip(load_geometry(f.read()))

    spark = default_session(master=parsed.master, app_name="spark-osm-export")
    if not parsed.verbose:
        spark.sparkContext.setLogLevel("ERROR")

    zmin, zmax = (int(z) for z in parsed.tile_zooms.split(","))
    start = time.time()
    manifest = export(
        spark,
        spark.read.parquet(parsed.docs_path),
        mapping,
        parsed.output_name,
        aoi_rings=aoi_rings,
        formats=tuple(parsed.formats.split(",")),
        polygon_centroid=parsed.polygon_centroid,
        tile_zooms=(zmin, zmax),
        resume=not parsed.no_resume,
        dropout_metrics=parsed.metrics,
        binary=parsed.binary,
        checkpoint=parsed.checkpoint,
    )
    print("Completed in {0} seconds.".format(round(time.time() - start, 1)))
    for entry in manifest["entries"]:
        print("%s\t%s\t%d rows\t%s" % (entry["format"], entry["theme"], entry["rows"], entry["path"]))

    if parsed.package or parsed.posm_bundle:
        from .plans.package import create_package, create_posm_bundle

        if parsed.package:
            dest = os.path.join(parsed.output_name, "export.zip")
            create_package(dest, manifest["entries"], boundary_rings=aoi_rings)
            print("package\t%s" % dest)
        if parsed.posm_bundle:
            from .operators.clip import AOI

            if aoi_rings is not None:
                bbox = AOI(aoi_rings).bbox
            else:
                bbox = (-180.0, -90.0, 180.0, 90.0)
            dest = os.path.join(parsed.output_name, "bundle.tar.gz")
            create_posm_bundle(
                dest, manifest["entries"], title=parsed.output_name,
                name=os.path.basename(parsed.output_name.rstrip("/")),
                description="spark-osm-export bundle", bbox=bbox,
            )
            print("bundle\t%s" % dest)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
