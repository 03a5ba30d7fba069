"""Z-order (Morton) spatial clustering: a bbox read over the
z-ordered layout must equal the plain filter, push its four
comparisons into the scan, and measurably prune row-group bytes on
BOTH lon and lat — the two-dimensional win a single-column sort
cannot deliver (sources/tables.write_zordered / read_bbox)."""

import glob
import os

from pyspark.sql import functions as F

from osm_export_tool_python_spark.sources.tables import read_bbox, write_zordered

BBOX = (10.0, 10.0, 20.0, 20.0)


def _points(spark):
    """Deterministic points spread over the whole world, written in a
    spatially-random row order (hash-scrambled id) so the plain layout
    has no accidental locality."""
    k = F.col("id")
    return (
        spark.range(0, 40000)
        .withColumn("pid", F.xxhash64(k))
        .withColumn("lon", (F.pmod(F.col("pid"), 36000) / 100.0) - 180.0)
        .withColumn("lat", (F.pmod(F.xxhash64(k + 1), 16000) / 100.0) - 80.0)
        .select("pid", "lon", "lat")
    )


def _range_admission(path, col_name, lo, hi):
    """(admitted_bytes, total_bytes): row groups whose [min, max] on
    `col_name` intersects [lo, hi] must be read; the rest are provably
    skippable from footer stats alone."""
    import pyarrow.parquet as pq

    admitted = total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col_name]
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            sz = rg.total_byte_size
            total += sz
            st = rg.column(idx).statistics
            if st is None or not st.has_min_max:
                admitted += sz
            elif st.min <= hi and st.max >= lo:
                admitted += sz
    return admitted, total


def test_zorder_bbox_equals_plain_filter_and_pushes_down(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("zorder")
    plain, zordered = str(base / "plain"), str(base / "zordered")
    pts = _points(spark)
    pts.write.mode("overwrite").parquet(plain)
    write_zordered(pts, zordered, "lon", "lat", n_files=64)

    got = read_bbox(spark, zordered, BBOX)
    old = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
    try:
        plan = got._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", old)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters: [")[1].split("]")[0]
    assert "GreaterThanOrEqual(lon,10.0)" in pushed
    assert "LessThanOrEqual(lat,20.0)" in pushed

    min_lon, min_lat, max_lon, max_lat = BBOX
    want = sorted(
        r["pid"]
        for r in spark.read.parquet(plain)
        .where(
            (F.col("lon") >= min_lon)
            & (F.col("lon") <= max_lon)
            & (F.col("lat") >= min_lat)
            & (F.col("lat") <= max_lat)
        )
        .collect()
    )
    assert sorted(r["pid"] for r in got.collect()) == want
    assert want  # the box is not empty


def test_zorder_prunes_both_dimensions(spark, tmp_path_factory):
    """The measured two-dimensional drop: for a 10°×10° box (~1/1000
    of the world's area), the z-ordered layout admits a small byte
    fraction on the lon range AND on the lat range; a lon-only sort
    prunes lon but admits ~everything on lat; the plain random layout
    admits ~everything on both."""
    base = tmp_path_factory.mktemp("zorder2")
    plain, lonsort, zordered = (
        str(base / "plain"),
        str(base / "lonsort"),
        str(base / "zordered"),
    )
    pts = _points(spark)
    pts.write.mode("overwrite").parquet(plain)
    pts.repartitionByRange(64, "lon").sortWithinPartitions("lon").write.mode(
        "overwrite"
    ).parquet(lonsort)
    write_zordered(pts, zordered, "lon", "lat", n_files=64)

    min_lon, min_lat, max_lon, max_lat = BBOX

    def frac(path, col, lo, hi):
        adm, tot = _range_admission(path, col, lo, hi)
        assert tot > 0
        return adm / tot

    # plain random layout: every row group spans ~the whole world
    assert frac(plain, "lon", min_lon, max_lon) > 0.9
    assert frac(plain, "lat", min_lat, max_lat) > 0.9
    # lon-only sort: strong on lon, useless on lat
    assert frac(lonsort, "lon", min_lon, max_lon) < 0.3
    assert frac(lonsort, "lat", min_lat, max_lat) > 0.9
    # z-order: strong on BOTH dimensions
    assert frac(zordered, "lon", min_lon, max_lon) < 0.3
    assert frac(zordered, "lat", min_lat, max_lat) < 0.3
