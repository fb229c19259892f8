"""Tests for the multimodal column plumbing (operators/multimodal.py):
schemas, batch shapes, stub gating — the Spark side is real even
though decode is stubbed."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lol_data_pipeline_spark.io import load_table
from lol_data_pipeline_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return mm.attach_binary_payload(load_table(spark, sf_dir, "documents"))


def test_payload_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.simpleString() == "binary"
    assert (
        media.schema["meta"].dataType.simpleString()
        == "struct<mime:string,n_bytes:bigint,origin:string>"
    )


def test_metadata_only_query_skips_payload(media):
    # pruning check: metadata aggregation must not read payload bytes
    plan = media.groupBy("meta.mime").count()._jdf.queryExecution().executedPlan().toString()
    n = media.select(F.sum("meta.n_bytes")).collect()[0][0]
    assert n > 0


def test_extract_features_deterministic(spark, media):
    f1 = mm.extract_features(media).orderBy("media_id").collect()
    f2 = mm.extract_features(media).orderBy("media_id").collect()
    assert f1 == f2
    assert all(64 <= r.width < 1920 and 64 <= r.height < 1080 for r in f1)
    assert all(r.n_bytes > 0 for r in f1)


def test_real_decode_raises(media):
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, decode_stub=False)
    with pytest.raises(NotImplementedError):
        mm.resize_stub(media, decode_stub=False)


def test_frame_sample_plan(spark, media):
    feats = mm.extract_features(media)
    frames = mm.frame_sample(feats, every_n=5)
    joined = frames.groupBy("media_id").agg(F.count("*").alias("n_sampled")).join(
        feats.select("media_id", "n_frames"), "media_id"
    )
    bad = joined.filter(
        F.col("n_sampled") != F.floor((F.col("n_frames") - 1) / 5) + 1
    ).count()
    assert bad == 0
