"""Multimodal plumbing: schemas, deterministic synth, stubbed decode,
feature extraction batch shapes, resize roundtrip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_export_tool_python_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synth_media(spark, n=60).cache()


def test_media_schema_and_determinism(spark, media):
    assert media.count() == 60
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    a = media.orderBy("media_id").collect()
    b = M.synth_media(spark, n=60, partitions=7).orderBy("media_id").collect()
    assert a == b


def test_feature_extraction(spark, media):
    feats = M.extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert len(rows) == 60
    for mid, r in rows.items():
        assert r["feat_dim"] == len(r["feat"])
        if r["kind"] == "image":
            assert r["feat_dim"] == 5  # 3 channel means + 2 dims
            assert all(0.0 <= x <= 1.5 for x in r["feat"])
        elif r["kind"] == "audio":
            assert r["feat_dim"] == 2
        else:
            assert r["feat_dim"] == 2
            assert r["feat"][0] == 4.0  # 16 frames sampled every 4


def test_image_payload_is_decodable(media):
    rows = media.where(F.col("kind") == "image").collect()
    for r in rows:
        meta = r["meta"]
        arr = M._decode_image_stub(bytes(r["payload"]), meta.asDict())
        assert arr.shape == (meta["height"], meta["width"], meta["channels"])


def test_corrupt_payload_raises(media):
    r = media.where(F.col("kind") == "image").first()
    with pytest.raises(ValueError, match="corrupt"):
        M._decode_image_stub(bytes(r["payload"])[:-1], r["meta"].asDict())


def test_resize(spark, media):
    small = M.resize_images(media, out_w=4, out_h=4)
    rows = small.collect()
    assert rows and all(r["meta"]["width"] == 4 and r["meta"]["height"] == 4 for r in rows)
    for r in rows:
        assert len(bytes(r["payload"])) == 4 * 4 * r["meta"]["channels"]
