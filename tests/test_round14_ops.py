"""Round-14 regression tests: the pure-stdlib PNG pixel codec (every
scanline filter load-bearing, truecolor + error paths), the real
resize kernel's arithmetic, and the video-frame near-dup entry's
planted-twin/disjoint-control semantics."""

from __future__ import annotations

import random
import struct
import zlib

import pytest


# ---------------------------------------------------------------------------
# PNG codec — pure-Python, no Spark session needed.
# ---------------------------------------------------------------------------


def test_png_round_trip_varied_geometries():
    """Encode→decode is the identity over random grids at every
    width class (stride 1..24) and height ≥ 5 (so all five filter
    types appear in one image)."""
    from lol_data_pipeline_spark.operators.multimodal import (
        parse_png_gray,
        write_gray_png,
    )

    rng = random.Random(41)
    for _ in range(40):
        w, h = rng.randint(1, 24), rng.randint(5, 19)
        grid = [[rng.randrange(256) for _ in range(w)] for _ in range(h)]
        assert parse_png_gray(write_gray_png(grid)) == grid


def test_png_encoder_rotates_all_five_filters():
    """The encode side's y%5 rotation is what makes the decoder's
    Sub/Up/Average/Paeth reconstruction load-bearing — assert the
    raw scanline stream actually carries filter types 0..4."""
    from lol_data_pipeline_spark.operators.multimodal import write_gray_png

    grid = [[(x * 7 + y * 13) % 256 for x in range(9)] for y in range(8)]
    payload = write_gray_png(grid)
    # IDAT starts after sig(8) + IHDR chunk(12+13); its data begins 8
    # bytes later
    idat_len = struct.unpack(">I", payload[33:37])[0]
    raw = zlib.decompress(payload[41 : 41 + idat_len])
    stride = 9
    filters = {raw[y * (1 + stride)] for y in range(8)}
    assert filters == {0, 1, 2, 3, 4}


def test_png_truecolor_first_channel():
    """Color type 2 (RGB) decodes via the first channel — build a
    2×2 truecolor PNG by hand (filter 0 rows) and read it back."""
    from lol_data_pipeline_spark.operators.multimodal import parse_png_gray

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rows = [
        bytes([0, 10, 0, 0, 20, 0, 0]),  # filter 0; px (10,..) (20,..)
        bytes([0, 30, 0, 0, 40, 0, 0]),
    ]
    ihdr = struct.pack(">II5B", 2, 2, 8, 2, 0, 0, 0)
    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + chunk(b"IEND", b"")
    )
    assert parse_png_gray(payload) == [[10, 20], [30, 40]]


def test_png_decoder_rejects_unsupported_shapes():
    from lol_data_pipeline_spark.operators.multimodal import (
        parse_png_gray,
        write_gray_png,
    )

    with pytest.raises(ValueError, match="not a PNG"):
        parse_png_gray(b"BM" + b"\x00" * 60)
    # corrupt the filter byte of a valid image → explicit error, not
    # a silently wrong grid
    good = bytearray(write_gray_png([[1, 2], [3, 4]]))
    idat_len = struct.unpack(">I", bytes(good[33:37]))[0]
    raw = bytearray(zlib.decompress(bytes(good[41 : 41 + idat_len])))
    raw[0] = 9
    bad_idat = zlib.compress(bytes(raw))
    rebuilt = (
        bytes(good[:33])
        + struct.pack(">I", len(bad_idat))
        + b"IDAT"
        + bad_idat
        + struct.pack(">I", zlib.crc32(b"IDAT" + bad_idat) & 0xFFFFFFFF)
        + bytes(good[41 + idat_len + 4 :])
    )
    with pytest.raises(ValueError, match="bad filter type"):
        parse_png_gray(rebuilt)


def test_png_bmp_hash_parity_and_twin_bound():
    """The PNG and BMP synthesizers carry the SAME pixel field, so
    dHash agrees across containers; the 1-pixel twin stays within
    one bit on the PNG path too."""
    from lol_data_pipeline_spark.operators.multimodal import (
        dhash64,
        parse_bmp_gray,
        parse_png_gray,
        synthesize_gray_bmp,
        synthesize_gray_png,
    )

    for sid in (0, 5, 777, 123456):
        a = dhash64(parse_png_gray(synthesize_gray_png(sid)))
        b = dhash64(parse_bmp_gray(synthesize_gray_bmp(sid)))
        assert a == b
        t = dhash64(parse_png_gray(synthesize_gray_png(sid, perturb=True)))
        assert bin((a ^ t) & ((1 << 64) - 1)).count("1") <= 1


def test_resize_kernel_arithmetic_pure():
    """The resize mapping is src = out·src_dim // out_dim with
    integer output dims — pin it against a hand-computed case, plus
    the within-limit pass-through."""
    from lol_data_pipeline_spark.operators.multimodal import (
        decode_image_gray,
        parse_bmp_gray,
        synthesize_gray_png,
        _write_gray_bmp,
    )

    grid = decode_image_gray(synthesize_gray_png(9, w=20, h=10))
    # max_dim=10 → ow = 20*10//20 = 10, oh = 10*10//20 = 5
    expect = [[grid[y * 10 // 5][x * 20 // 10] for x in range(10)] for y in range(5)]
    bmp = _write_gray_bmp(expect)
    assert parse_bmp_gray(bmp) == expect
    assert len(bmp) == 54 + ((10 * 3 + 3) // 4) * 4 * 5


def test_wav_round_trip_and_audio_twin_bound():
    """PCM WAV bytes round-trip exactly (samples out == samples in),
    the fingerprint is stable across the trip, the one-sample
    perturbation stays within one bit, and unsupported PCM shapes
    raise instead of decoding garbage."""
    from lol_data_pipeline_spark.operators.multimodal import (
        AHASH_WIN,
        AHASH_WINDOWS,
        _sample16,
        audio_hash64,
        parse_wav_samples,
        synthesize_pcm_wav,
    )

    n = AHASH_WINDOWS * AHASH_WIN
    for sid in (0, 42, 4096):
        ss = parse_wav_samples(synthesize_pcm_wav(sid))
        assert ss == [_sample16(sid, i) for i in range(n)]
        a = audio_hash64(ss)
        t = audio_hash64(parse_wav_samples(synthesize_pcm_wav(sid, True)))
        assert bin((a ^ t) & ((1 << 64) - 1)).count("1") <= 1
    with pytest.raises(ValueError, match="not a WAV"):
        parse_wav_samples(b"RIFX" + b"\x00" * 40)
    # stereo/8-bit shapes must be rejected, not misread
    bad = bytearray(synthesize_pcm_wav(1))
    struct.pack_into("<H", bad, 22, 2)  # channels = 2 in fmt chunk
    with pytest.raises(ValueError, match="unsupported PCM"):
        parse_wav_samples(bytes(bad))


# ---------------------------------------------------------------------------
# Spark-side: the real tiers and the video entry.
# ---------------------------------------------------------------------------


def test_extract_features_real_tier_matches_header(spark):
    """The un-gated pixel tier's width/height must agree with the
    header parser on the same bytes (two independent derivations:
    IHDR ints vs decoded-grid dims)."""
    from lol_data_pipeline_spark.operators.multimodal import (
        parse_media_header,
        synthesize_gray_png,
    )

    rows = []
    for i in (0, 3, 11, 40):
        p = synthesize_gray_png(i, w=4 + i % 13, h=3 + i % 11)
        rows.append(
            (i, p, {"mime": "image/png", "n_bytes": len(p), "origin": "t"})
        )
    media = spark.createDataFrame(
        rows,
        "media_id bigint, payload binary, "
        "meta struct<mime:string, n_bytes:bigint, origin:string>",
    )
    from lol_data_pipeline_spark.operators.multimodal import extract_features

    got = {
        r.media_id: (r.width, r.height)
        for r in extract_features(media, decode_stub=False).collect()
    }
    for i, p, _m in rows:
        hdr = parse_media_header(p)
        assert got[i] == (hdr["width"], hdr["height"])


def test_audio_fp_catches_every_planted_twin(spark, sf_dir):
    """Recall teeth beyond the oracle: EVERY planted audio twin pair
    must surface (hamming ≤ 1 by the window-local bound), and no
    pair of unrelated base clips may appear at τ=3 (md5-mixed
    energies differ in ~32 bits)."""
    from lol_data_pipeline_spark.plans import REGISTRY
    from lol_data_pipeline_spark.plans.round14 import _AUD_SHIFT

    rows = REGISTRY["mm_dedup_audio_fp"].fn(spark, sf_dir).collect()
    assert rows
    planted = {r.media_a for r in rows if r.planted}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    expected = {
        r.doc_id
        for r in docs.filter("doc_id % 10 = 0").select("doc_id").collect()
    }
    assert planted == expected
    for r in rows:
        if r.planted:
            assert r.hamming <= 1
        else:
            # any non-planted survivor is a random collision between
            # independent md5 fields — tolerated only at the τ bound
            assert r.media_b != r.media_a + _AUD_SHIFT


def test_audio_index_lifecycle_roundtrip(spark, sf_dir, tmp_path):
    """The modality-blind signature index under the audio signer:
    build on a test-owned root, upsert NEW clips, probe their twins
    (must match the just-added bases at hamming ≤ 1), delete them,
    probe again (must come back empty) — the full maintain/serve
    loop on the non-default signer."""
    from pyspark.sql import functions as F

    from lol_data_pipeline_spark.operators.phash_index import (
        ensure_phash_index,
        phash_index_delete,
        phash_index_upsert,
        served_phash_pairs,
    )

    path, meta = ensure_phash_index(
        spark, sf_dir, root=str(tmp_path), variant="audlc", signer="audio",
        index_where="doc_id < 50",
    )
    assert meta["params"]["signer"] == "audio"
    new = spark.createDataFrame(
        [(900001, 777001, 0), (900002, 777002, 0)],
        "media_id long, src long, perturb int",
    )
    meta = phash_index_upsert(spark, path, meta, new)
    twins = new.select(
        (F.col("media_id") + 1000).alias("media_id"), "src",
        F.lit(1).alias("perturb"),
    )
    hits = served_phash_pairs(spark, path, meta, twins).collect()
    assert {(r.probe_id, r.match_id) for r in hits} >= {
        (901001, 900001),
        (901002, 900002),
    }
    assert all(r.hamming <= 1 for r in hits if r.match_id >= 900000)
    meta = phash_index_delete(
        spark, path, meta,
        new.select("media_id"),
    )
    hits2 = served_phash_pairs(spark, path, meta, twins).collect()
    assert not [r for r in hits2 if r.match_id >= 900000]


def test_video_frames_twins_match_disjoint_miss(spark, sf_dir):
    """The entry's semantic teeth beyond the oracle: every planted
    re-encoded clip matches its standing clip on ALL four sampled
    frames; every disjoint clip matches nothing."""
    from lol_data_pipeline_spark.plans import REGISTRY
    from lol_data_pipeline_spark.plans.round14 import (
        _VID_FRAMES,
        _VID_SHIFT,
    )

    rows = REGISTRY["mm_dedup_video_frames"].fn(spark, sf_dir).collect()
    assert rows
    twins = [r for r in rows if r.probe_clip < 2 * _VID_SHIFT]
    disjoint = [r for r in rows if r.probe_clip >= 2 * _VID_SHIFT]
    assert twins and disjoint and len(twins) == len(disjoint)
    for r in twins:
        assert r.matched
        assert r.n_frames_matched == len(_VID_FRAMES)
        assert r.match_clip == r.probe_clip - _VID_SHIFT
    for r in disjoint:
        assert not r.matched
        assert r.n_frames_matched == 0
        assert r.match_clip is None
