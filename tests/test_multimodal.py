"""Multimodal codecs + operators: the decode/resize/frame-sample compute
is real (PPM / WAV / FRV1 parsing), so its outputs are verifiable pixel
and amplitude statistics, recomputed independently here from the
deterministic ramp the synthesizer uses."""

import numpy as np
import pytest

from structured_streaming_cassandra_sink_spark.operators.multimodal import (
    FRAME_SAMPLE_EVERY,
    RESIZE_TARGET,
    _media_geometry,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_video,
    encode_wav,
    iter_video_frames,
    resize_nearest,
    video_frame_count,
)
from structured_streaming_cassandra_sink_spark.plans import registry


def _ramp(n: int, seed: int) -> np.ndarray:
    """Independent recompute of the synthesizer's pixel ramp."""
    j = np.arange(n, dtype=np.int64)
    return ((seed * 31 + j * 7) % 256).astype(np.uint8)


# ---------------------------------------------------------------- codecs


def test_ppm_roundtrip():
    buf = encode_ppm(19, 7, seed=42)
    w, h, img = decode_ppm(buf)
    assert (w, h) == (19, 7)
    assert img.shape == (7, 19, 3)
    assert np.array_equal(img.reshape(-1), _ramp(19 * 7 * 3, 42))


def test_ppm_parser_handles_comments_and_whitespace():
    raster = bytes(_ramp(2 * 2 * 3, 5))
    buf = b"P6\n# a comment\n 2  2 \n# another\n255\n" + raster
    w, h, img = decode_ppm(buf)
    assert (w, h) == (2, 2)
    assert img.tobytes() == raster


def test_ppm_rejects_garbage():
    with pytest.raises(ValueError):
        decode_ppm(b"JFIF....")


def test_wav_roundtrip():
    buf = encode_wav(11000, 300, seed=9)
    rate, samples = decode_wav(buf)
    assert rate == 11000
    want = _ramp(300, 9).astype(np.int16) * 128 - 16384
    assert np.array_equal(samples, want)


def test_wav_chunk_walk_skips_foreign_chunks():
    buf = bytearray(encode_wav(8000, 10, seed=1))
    # splice a LIST chunk between fmt and data (word-aligned, 4-byte body)
    fmt_end = 12 + 8 + 16
    spliced = bytes(buf[:fmt_end]) + b"LIST\x04\x00\x00\x00INFO" + bytes(buf[fmt_end:])
    rate, samples = decode_wav(spliced)
    assert rate == 8000 and len(samples) == 10


def test_video_container_roundtrip():
    buf = encode_video(4, 3, 5, seed=77)
    assert video_frame_count(buf) == 5
    frames = list(iter_video_frames(buf))
    assert [i for i, _ in frames] == list(range(5))
    # each frame is an independently decodable PPM with per-frame seed
    w, h, img = decode_ppm(frames[2][1])
    assert (w, h) == (4, 3)
    assert np.array_equal(img.reshape(-1), _ramp(4 * 3 * 3, 77 + 2 * 101))


def test_resize_nearest_semantics():
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    same = resize_nearest(img, 4, 4)
    assert np.array_equal(same, img)
    half = resize_nearest(img, 2, 2)
    # index map: dst[y,x] = src[(y*4)//2? no: (y*h)//th] = src[0,2][...]
    assert np.array_equal(half, img[[0, 2]][:, [0, 2]])


# ------------------------------------------------------------- operators


def test_multimodal_decode_stats_match_recompute(spark, sf_dir):
    rows = {
        r.media_id: r
        for r in registry.QUERIES["multimodal_decode"](spark, sf_dir).collect()
    }
    assert rows
    kinds = {0: "image", 1: "audio", 2: "video"}
    for mid, r in list(sorted(rows.items()))[:9]:
        kind = kinds[mid % 3]
        assert r.kind == kind
        if kind == "image":
            w, h = _media_geometry(mid, kind)
            assert (r.width, r.height, r.n_frames) == (w, h, 1)
            want = float(_ramp(w * h * 3, mid).mean())
        elif kind == "audio":
            rate, n = _media_geometry(mid, kind)
            assert (r.sample_rate, r.n_frames) == (rate, n)
            want = float(
                np.abs(_ramp(n, mid).astype(np.int16) * 128 - 16384).mean()
            )
        else:
            w, h, nf = _media_geometry(mid, kind)
            assert (r.width, r.height, r.n_frames) == (w, h, nf)
            want = float(_ramp(w * h * 3, mid).mean())  # first frame seed=mid
        assert r.content_mean == pytest.approx(round(want, 4), abs=1e-4), mid


def test_multimodal_resize_real_geometry_and_stats(spark, sf_dir):
    tw, th = RESIZE_TARGET
    rows = registry.QUERIES["multimodal_resize"](spark, sf_dir).collect()
    assert rows
    header = len(f"P6\n{tw} {th}\n255\n".encode())
    for r in rows:
        assert (r.dst_width, r.dst_height) == (tw, th)
        assert r.resized_bytes == header + tw * th * 3
    # one full independent recompute
    r = min(rows, key=lambda x: x.media_id)
    w, h = _media_geometry(r.media_id, "image")
    img = _ramp(w * h * 3, r.media_id).reshape(h, w, 3)
    resized = resize_nearest(img, tw, th)
    assert (r.src_width, r.src_height) == (w, h)
    assert r.src_mean == pytest.approx(round(float(img.mean()), 4), abs=1e-4)
    assert r.dst_mean == pytest.approx(round(float(resized.mean()), 4), abs=1e-4)


def test_multimodal_frame_sample_real_walk(spark, sf_dir):
    rows = registry.QUERIES["multimodal_frame_sample"](spark, sf_dir).collect()
    assert rows
    by_media = {}
    for r in rows:
        assert r.frame_idx % FRAME_SAMPLE_EVERY == 0
        by_media.setdefault(r.media_id, []).append(r)
    for mid, rs in list(sorted(by_media.items()))[:5]:
        w, h, nf = _media_geometry(mid, "video")
        assert all(r.n_frames == nf for r in rs)
        assert len(rs) == (nf + FRAME_SAMPLE_EVERY - 1) // FRAME_SAMPLE_EVERY
        for r in rs:
            want = float(_ramp(w * h * 3, mid + r.frame_idx * 101).mean())
            assert r.frame_mean == pytest.approx(round(want, 4), abs=1e-4), (
                mid,
                r.frame_idx,
            )
