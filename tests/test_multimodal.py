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


def test_real_decode_tier_on_nonimage_payloads(spark, media):
    """The pixel tier is REAL as of r14 (no NotImplementedError
    gate): on image containers it decodes; on these TEXT payloads it
    must fail loudly at execution (decode_image_gray raises rather
    than inventing pixels) — wrapped by Spark as a Python worker
    error. The resize kernel shares the dispatch."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((PySparkException, Py4JJavaError)):
        mm.extract_features(media, decode_stub=False).collect()
    with pytest.raises((PySparkException, Py4JJavaError)):
        mm.resize_stub(media, decode_stub=False).collect()
    # and on a REAL image payload the same calls succeed
    img = mm.synthesize_gray_png(5, w=6, h=4)
    one = spark.createDataFrame(
        [(5, img, {"mime": "image/png", "n_bytes": len(img), "origin": "t"})],
        "media_id bigint, payload binary, "
        "meta struct<mime:string, n_bytes:bigint, origin:string>",
    )
    row = mm.extract_features(one, decode_stub=False).collect()[0]
    assert (row.width, row.height) == (6, 4)
    out = mm.resize_stub(one, max_dim=3, decode_stub=False).collect()[0]
    assert out.meta.mime == "image/bmp"
    assert out.meta.origin.endswith("|resized<3")
    assert mm.parse_bmp_gray(bytes(out.payload))  # re-encoded bytes decode


def test_parse_png_header_spec_conformance():
    """Parses a hand-assembled PNG (not from synthesize_payload):
    8-byte signature + IHDR with big-endian 320x200."""
    import struct

    png = (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II5B", 320, 200, 8, 2, 0, 0, 0) + b"\xAA\xBB\xCC\xDD"
    )
    f = mm.parse_media_header(png)
    assert (f["width"], f["height"], f["n_frames"]) == (320, 200, 1)


def test_parse_bmp_top_down_negative_height():
    import struct

    dib = struct.pack("<IiiHHIIiiII", 40, 640, -480, 1, 24, 0, 0, 0, 0, 0, 0)
    bmp = b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + dib
    f = mm.parse_media_header(bmp)
    assert (f["width"], f["height"]) == (640, 480)  # abs() of top-down height


def test_parse_wav_skips_unknown_chunks_word_aligned():
    """RIFF chunk walk must skip unknown chunks (with the odd-size
    pad byte) before finding fmt, and read the declared data size
    from a truncated final data chunk (header-only file)."""
    import struct

    junk = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd size → pad byte
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack("<HHIIHH", 1, 2, 44100, 176400, 4, 16)
    data = b"data" + struct.pack("<I", 352800)  # 2 s at 176400 B/s, body absent
    wav = b"RIFF" + struct.pack("<I", 1000) + b"WAVE" + junk + fmt + data
    f = mm.parse_media_header(wav)
    assert f["sample_rate"] == 44100 and f["duration_ms"] == 2000 and f["n_frames"] == 8


def test_parse_unknown_container_raises():
    import pytest as pt

    with pt.raises(ValueError):
        mm.parse_media_header(b"\x00\x01\x02\x03not-a-container")


def test_synthesize_decode_round_trip(spark, sf_dir):
    """End-to-end through Spark: real bytes out of synthesize_media,
    real header parse back in extract_media_features; features match
    the documented derivations."""
    docs = load_table(spark, sf_dir, "documents").limit(30)
    feats = mm.extract_media_features(mm.synthesize_media(docs)).collect()
    assert len(feats) == 30
    for r in feats:
        if r.mime == "image/png" or r.mime == "image/bmp":
            assert r.width == 64 + (r.media_id * 7) % 1856
            assert r.height == 64 + (r.media_id * 13) % 1016
            assert r.sample_rate is None and r.duration_ms is None
        else:
            assert r.sample_rate in (8000, 16000, 44100)
            assert r.duration_ms == (1 + r.media_id % 5) * 1000
            assert r.n_frames == r.duration_ms * 4 // 1000


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
