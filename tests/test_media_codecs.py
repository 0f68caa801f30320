"""Stdlib media codecs (BMP / WAV / RVID): byte-exact roundtrips across
the layout edge cases — BMP row padding for every width mod 4, bottom-up
vs top-down row order, WAV chunk walking with foreign chunks, RVID
byte-range frame isolation — plus the distributed decode operators."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from weather_tools_spark.sources import media_codecs as MC
from weather_tools_spark.sources import multimodal as MM


def _img(w, h, seed=0):
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    return ((seed * 7 + x * 13 + y * 31 + c * 5) % 256).astype(np.uint8)


# ------------------------------------------------------------------- BMP


@pytest.mark.parametrize("w", [1, 2, 3, 4, 5, 16, 17, 18, 19])
def test_bmp_roundtrip_all_paddings(w):
    rgb = _img(w, 7, seed=w)
    assert np.array_equal(MC.bmp_decode(MC.bmp_encode(rgb)), rgb)


def test_bmp_bytes_are_genuine_bmp():
    data = MC.bmp_encode(_img(6, 4))
    assert data[:2] == b"BM"
    assert struct.unpack_from("<I", data, 2)[0] == len(data)  # file size field
    w, h = struct.unpack_from("<ii", data, 18)
    assert (w, h) == (6, 4)


def test_bmp_top_down_negative_height():
    # Spec allows negative height = top-down rows; our decoder honors it.
    rgb = _img(5, 3, seed=9)
    data = bytearray(MC.bmp_encode(rgb[::-1]))  # encoded bottom-up of flipped
    struct.pack_into("<i", data, 22, -3)        # declare top-down
    got = MC.bmp_decode(bytes(data))
    assert np.array_equal(got, rgb[::-1][::-1])  # = rgb


def test_bmp_rejects_non_bmp():
    with pytest.raises(ValueError):
        MC.bmp_decode(b"\x89PNG....")


def test_resize_nearest_floor_mapping():
    rgb = _img(16, 12, seed=3)
    out = MC.image_resize_nearest(rgb, 5, 4)
    assert out.shape == (4, 5, 3)
    for j in range(4):
        for i in range(5):
            assert np.array_equal(out[j, i], rgb[(j * 12) // 4, (i * 16) // 5])


def test_resize_upscale():
    rgb = _img(2, 2, seed=1)
    out = MC.image_resize_nearest(rgb, 4, 4)
    assert np.array_equal(out[0, 0], rgb[0, 0]) and np.array_equal(out[3, 3], rgb[1, 1])


# ------------------------------------------------------------------- WAV


def test_wav_roundtrip_mono():
    v = (np.arange(1000) * 37 % 4001 - 2000).astype(np.int16)
    got, rate = MC.wav_decode(MC.wav_encode(v, 8000))
    assert rate == 8000 and got.shape == (1000, 1)
    assert np.array_equal(got[:, 0], v)


def test_wav_roundtrip_stereo():
    v = np.stack([np.arange(100), -np.arange(100)], axis=1).astype(np.int16)
    got, rate = MC.wav_decode(MC.wav_encode(v, 44100))
    assert rate == 44100 and np.array_equal(got, v)


def test_wav_skips_foreign_chunks():
    v = np.arange(10, dtype=np.int16)
    data = MC.wav_encode(v)
    # splice a LIST chunk (odd size -> word-alignment pad) before data
    fmt_end = 12 + 8 + 16
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = data[:fmt_end] + foreign + data[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    got, _ = MC.wav_decode(spliced)
    assert np.array_equal(got[:, 0], v)


def test_wav_rejects_bad_magic():
    with pytest.raises(ValueError):
        MC.wav_decode(b"OggS" + b"\x00" * 40)


# ------------------------------------------------------------------- RVID


def test_rvid_info_and_frame_slicing():
    frames = np.stack([_img(8, 6, seed=f) for f in range(5)])
    data = MC.rvid_encode(frames, fps=24)
    assert MC.rvid_info(data) == (8, 6, 24, 5)
    for f in range(5):
        assert np.array_equal(MC.rvid_frame(data, f), frames[f])
    with pytest.raises(IndexError):
        MC.rvid_frame(data, 5)


def test_sniff_media():
    assert MC.sniff_media(MC.bmp_encode(_img(2, 2))) == "bmp"
    assert MC.sniff_media(MC.wav_encode(np.zeros(4, dtype=np.int16))) == "wav"
    assert MC.sniff_media(MC.rvid_encode(np.zeros((1, 2, 2, 3), dtype=np.uint8))) == "rvid"
    assert MC.sniff_media(b"\x89PNG") == "unknown"


# ------------------------------------------- distributed decode operators


def test_decode_image_stats_spark(spark):
    rgb = _img(17, 7, seed=2)  # width forcing 3-byte padding
    df = spark.createDataFrame(
        [(1, bytearray(MC.bmp_encode(rgb)))], "media_id long, content binary"
    )
    row = MM.decode_image_stats(df).collect()[0]
    assert (row.width, row.height) == (17, 7)
    s = rgb.astype(np.int64).sum(axis=(0, 1))
    assert (row.sum_r, row.sum_g, row.sum_b) == tuple(int(v) for v in s)


def test_resize_images_spark_roundtrip(spark):
    rgb = _img(16, 12, seed=5)
    df = spark.createDataFrame(
        [(7, bytearray(MC.bmp_encode(rgb)))], "media_id long, content binary"
    )
    out = MM.resize_images(df, 5, 4).collect()[0]
    got = MC.bmp_decode(bytes(out.content))
    assert np.array_equal(got, MC.image_resize_nearest(rgb, 5, 4))


def test_decode_audio_stats_spark(spark):
    v = (np.arange(500) * 101 % 4001 - 2000).astype(np.int16)
    df = spark.createDataFrame(
        [(3, bytearray(MC.wav_encode(v)))], "media_id long, content binary"
    )
    row = MM.decode_audio_stats(df).collect()[0]
    m = v.astype(np.int64)
    assert row.n_samples == 500
    assert row.sum_sq == int((m * m).sum())
    assert row.zero_crossings == int(((m[:-1] * m[1:]) < 0).sum())


def test_sample_video_frames_spark(spark):
    frames = np.stack([_img(8, 6, seed=f) for f in range(10)])
    df = spark.createDataFrame(
        [(4, bytearray(MC.rvid_encode(frames)))], "media_id long, content binary"
    )
    rows = MM.sample_video_frames(df, every_n=3).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 3, 6, 9]
    for r in rows:
        s = frames[r.frame_idx].astype(np.int64).sum(axis=(0, 1))
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(int(v) for v in s)


def test_extract_features_real_formats(spark):
    rgb = _img(8, 4, seed=1)
    wav = MC.wav_encode(np.array([100, -100, 100, -100], dtype=np.int16), 8000)
    vid = MC.rvid_encode(np.stack([_img(4, 2, seed=9)] * 3), fps=12)
    df = spark.createDataFrame(
        [
            (1, "image", "image/bmp", 8, 4, None, bytearray(MC.bmp_encode(rgb))),
            (2, "audio", "audio/wav", None, None, 1, bytearray(wav)),
            (3, "video", "video/rvid", 4, 2, 250, bytearray(vid)),
            (4, "image", "image/png", 1, 1, None, bytearray(b"\x89PNG-unknown")),
        ],
        MM.MEDIA_SCHEMA,
    )
    feats = {r.media_id: r.feature for r in MM.extract_features(df).collect()}
    assert feats[1][0] == 1.0 and abs(feats[1][3] - rgb[:, :, 0].mean() / 255.0) < 1e-6
    assert feats[2][0] == 2.0 and abs(feats[2][4] - 1.0) < 1e-6  # ZCR of alternating signs
    assert feats[3][0] == 3.0 and feats[3][4] == pytest.approx(3 / 1e4)
    assert len(feats[4]) == MM.FEATURE_DIM  # unknown -> deterministic fake
    # strict raises only for the genuinely library-bound format
    import pyspark.errors

    with pytest.raises(Exception):
        MM.extract_features(df.filter("media_id = 4"), strict=True).collect()
    ok = MM.extract_features(df.filter("media_id < 4"), strict=True).count()
    assert ok == 3


def test_video_frame_diffs_matches_numpy(spark):
    import numpy as np
    import pandas as pd

    from weather_tools_spark.sources import media_codecs as MC
    from weather_tools_spark.sources.multimodal import video_frame_diffs

    rng = np.random.default_rng(3)
    vids = []
    expect = {}
    for mid in range(4):
        frames = rng.integers(0, 256, size=(5 + mid, 4, 6, 3), dtype=np.uint8)
        vids.append((mid, MC.rvid_encode(frames)))
        d = np.abs(frames[1:].astype(np.int64) - frames[:-1].astype(np.int64))
        expect[mid] = d.sum(axis=(1, 2, 3)).tolist()
    df = spark.createDataFrame(vids, "media_id long, content binary")
    out = video_frame_diffs(df).toPandas().sort_values(["media_id", "frame_idx"])
    for mid, sums in expect.items():
        got = out[out.media_id == mid]
        assert got.frame_idx.tolist() == list(range(1, len(sums) + 1))
        assert got.sum_abs_diff.tolist() == sums
        assert (got.n_frames == len(sums) + 1).all()
