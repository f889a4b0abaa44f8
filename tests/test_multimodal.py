"""Multimodal plumbing tests: schemas, batch shapes, deterministic
fake decode, and the NotImplementedError gate for real codecs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rle_spark import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    df = mm.synthesize_assets(spark, 60, seed=7).cache()
    df.count()
    yield df
    df.unpersist()


def test_asset_table_shape(assets):
    rows = assets.groupBy("modality").count().collect()
    assert {r["modality"] for r in rows} == {"image", "audio", "video"}
    assert sum(r["count"] for r in rows) == 60


def test_features(assets):
    feats = mm.extract_features(assets)
    rows = feats.collect()
    assert len(rows) == 60
    for r in rows:
        assert r.n_bytes > 12
        assert len(r.content_md5) == 32
        assert 0.0 <= r.byte_entropy <= 8.0


def test_features_deterministic(spark):
    a = mm.extract_features(mm.synthesize_assets(spark, 10, seed=9)).collect()
    b = mm.extract_features(mm.synthesize_assets(spark, 10, seed=9)).collect()
    assert sorted(r.content_md5 for r in a) == sorted(r.content_md5 for r in b)


def test_resize(assets):
    small = mm.resize_images(assets, 8, 8)
    rows = small.collect()
    n_images = assets.filter(F.col("modality") == "image").count()
    assert len(rows) == n_images
    for r in rows:
        assert len(bytes(r.payload)) == 64


def test_frame_sample(assets, spark):
    frames = mm.frame_sample(assets, every_n=4).collect()
    vids = assets.filter(F.col("modality") == "video") \
                 .select("asset_id", "n_frames").collect()
    expected = sum(-(-r.n_frames // 4) for r in vids)
    assert len(frames) == expected
    for r in frames:
        assert len(bytes(r.payload)) == 16 * 16


def test_real_codec_gate():
    with pytest.raises(NotImplementedError):
        mm._decode_payload(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)
