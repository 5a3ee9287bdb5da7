"""Multimodal plumbing (X6): schema, mapInPandas batch shape,
deterministic stub decode, strict mode."""

import pytest
from pyspark.sql import functions as F

from data_pipeline_bigquery_to_sftp_server_spark.operators import multimodal as mm


def test_feature_extraction_schema_and_determinism(spark):
    media = mm.synthesize_media(spark, n=16, kind="image")
    a = mm.extract_features(media).orderBy("media_id").collect()
    b = mm.extract_features(media).orderBy("media_id").collect()
    assert [r.feature for r in a] == [r.feature for r in b]  # deterministic stub
    assert all(len(r.feature) == 8 for r in a)
    assert all(r.n_bytes == 1024 for r in a)
    assert all(r.digest is not None for r in a)


def test_metadata_only_query_prunes_payload(spark):
    """Predicating on metadata must not require decoding payloads."""
    media = mm.synthesize_media(spark, n=16, kind="image")
    wide = media.where(F.col("width") > 100).select("media_id", "width", "height")
    assert wide.count() > 0


def test_resize_updates_metadata(spark):
    media = mm.synthesize_media(spark, n=8, kind="image")
    out = mm.resize_images(media, 32, 32).collect()
    assert all(r.width == 32 and r.height == 32 for r in out)
    assert len(out) == 8


def test_frame_sampling_row_explosion(spark):
    media = mm.synthesize_media(spark, n=4, kind="video")
    frames = mm.sample_frames(media, every_ms=1000).collect()
    # duration_ms = 1000*(i%30+1) -> i+1 frames for media_id i
    expected = sum(i + 1 for i in range(4))
    assert len(frames) == expected
    assert all(f.frame is not None for f in frames)


def test_strict_mode_raises(spark):
    media = mm.synthesize_media(spark, n=2, kind="image")
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        mm.extract_features(media, strict=True).collect()
