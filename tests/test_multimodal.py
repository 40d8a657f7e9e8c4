"""Multimodal plumbing tests: schemas, batch shapes, determinism, and the
codec-stub contract (real decode raises NotImplementedError)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cql_xmlpipe_spark.operators.multimodal import (
    attach_media_columns,
    decode_image_features,
    resize_images,
    sample_video_frames,
)
from cql_xmlpipe_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return attach_media_columns(load_table(spark, "documents", SF)).persist()


def test_media_schema_and_partition_of_modalities(media):
    assert [f.name for f in media.schema.fields] == ["doc_id", "payload", "meta"]
    counts = {r["modality"]: r["n"] for r in
              media.groupBy(F.col("meta.modality").alias("modality"))
                   .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"image", "audio", "video"}
    assert sum(counts.values()) == media.count()


def test_image_features_deterministic(media):
    a = decode_image_features(media).orderBy("doc_id").limit(5).collect()
    b = decode_image_features(media).orderBy("doc_id").limit(5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        assert 0 <= r["mean_r"] <= 255 and r["width"] >= 1 and r["sharpness"] >= 0


def test_image_features_only_images(media):
    n_img = media.filter(F.col("meta.modality") == "image").count()
    assert decode_image_features(media).count() == n_img


def test_resize_passthrough_shape(media):
    out = resize_images(media, 64, 64)
    rows = out.limit(3).collect()
    assert all(r["width"] == 64 and r["height"] == 64 for r in rows)
    assert all(isinstance(r["payload"], (bytes, bytearray)) for r in rows)


def test_frame_sampling_fanout(media):
    frames = sample_video_frames(media, every_ms=5000)
    got = frames.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    want = (
        media.filter(F.col("meta.modality") == "video")
        .select(
            "doc_id",
            (F.floor((F.greatest(F.col("meta.duration_ms"), F.lit(1)) - 1) / 5000) + 1)
            .cast("long").alias("n"),
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_codec_stub_raises(media):
    with pytest.raises(Exception) as ei:
        decode_image_features(media, use_codec=True).limit(1).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)
