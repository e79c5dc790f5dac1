"""Vendored MJPEG-in-AVI codec (operators/mjpeg.py): RIFF container walk
+ per-frame T.81 JPEG decode -- B48's compressed-video modality
(round 5; previously a blanket 'compressed video' refusal)."""

from __future__ import annotations

import random

import pytest

from iot_data_pipeline_spark.operators import jpeg, mjpeg


def test_roundtrip_matches_direct_jpeg_decode():
    rnd = random.Random(2)
    for trial in range(20):
        w, h = rnd.randint(1, 24), rnd.randint(1, 24)
        nf = rnd.randint(1, 5)
        prog = rnd.random() < 0.5
        frames = [
            bytes(rnd.randrange(256) for _ in range(w * h * 3))
            for _ in range(nf)
        ]
        clip = mjpeg.decode_mjpeg_avi(
            mjpeg.encode_mjpeg_avi(w, h, frames, quality=95, progressive=prog)
        )
        assert (clip.width, clip.height, clip.n_frames) == (w, h, nf)
        for k, f in enumerate(frames):
            direct = jpeg.decode_jpeg(
                jpeg.encode_jpeg(w, h, 3, f, quality=95, progressive=prog)
            )
            assert bytes(clip.frames[k][3]) == bytes(direct[3]), (trial, k)


def test_fps_from_stream_header():
    clip = mjpeg.decode_mjpeg_avi(
        mjpeg.encode_mjpeg_avi(8, 8, [bytes(192)], fps=30)
    )
    assert (clip.fps_num, clip.fps_den) == (30, 1)


def test_solid_frame_mean_luma_closed_form():
    import math

    r, g, b = 40, 200, 90
    fl = lambda x: min(255, max(0, math.floor(x + 0.5)))  # noqa: E731
    y = fl(0.299 * r + 0.587 * g + 0.114 * b)
    cb = fl(128 - 0.168735892 * r - 0.331264108 * g + 0.5 * b)
    cr = fl(128 + 0.5 * r - 0.418687589 * g - 0.081312411 * b)
    r2 = fl(y + 1.402 * (cr - 128))
    g2 = fl(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
    b2 = fl(y + 1.772 * (cb - 128))
    expect = (299 * r2 + 587 * g2 + 114 * b2) // 1000
    clip = mjpeg.decode_mjpeg_avi(
        mjpeg.encode_mjpeg_avi(8, 8, [bytes((r, g, b)) * 64], quality=100)
    )
    assert mjpeg.mean_luma_rgb(clip.frames[0]) == expect


def test_non_jpeg_video_chunk_refused():
    blob = bytearray(mjpeg.encode_mjpeg_avi(8, 8, [bytes(192)], quality=100))
    dc_at = bytes(blob).find(b"00dc")
    blob[dc_at + 8 : dc_at + 10] = b"XX"  # clobber the frame's SOI
    with pytest.raises(mjpeg.MjpegFormatError, match="not a JPEG"):
        mjpeg.decode_mjpeg_avi(bytes(blob))


def test_not_avi_refused():
    with pytest.raises(mjpeg.MjpegFormatError):
        mjpeg.decode_mjpeg_avi(b"RIFF\x00\x00\x00\x00WAVE")


def test_video_kernel_samples_mjpeg(spark):
    from iot_data_pipeline_spark.operators.multimodal import (
        sample_video_frames,
    )

    frames = [bytes((v, v, v)) * 64 for v in (10, 60, 110, 160)]
    blob = mjpeg.encode_mjpeg_avi(8, 8, frames, quality=100)
    df = spark.createDataFrame(
        [(0, bytearray(blob))], "media_id long, content binary"
    )
    rows = sorted(
        (r["frame_idx"], r["n_frames"], r["mean_luma"])
        for r in sample_video_frames(df, every_n=2, mode="strict").collect()
    )
    assert [r[0] for r in rows] == [0, 2]
    assert all(r[1] == 4 for r in rows)


def test_deep_list_nesting_refused_as_format_error():
    """A crafted AVI nesting LISTs hundreds deep (~12 bytes/level) must
    raise MjpegFormatError, not RecursionError -- only typed codec
    FormatErrors may escape into the tolerant channel's dead-letter path
    (round-5 advisor finding)."""
    import struct

    depth = 500
    # innermost: an empty 'rec ' LIST; wrap outward repeatedly
    body = b"rec "
    for _ in range(depth):
        body = b"LIST" + struct.pack("<I", len(body)) + body
        body = b"movi" + body  # keep each level walkable
    # the outer walk sees LIST(movi(LIST(movi(...)))) chains
    blob = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(b"movi") + len(body))
        + b"AVI "
        + b"LIST"
        + struct.pack("<I", len(body))
        + body
    )
    with pytest.raises(mjpeg.MjpegFormatError):
        mjpeg.decode_mjpeg_avi(blob)
