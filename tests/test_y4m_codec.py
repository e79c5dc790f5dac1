"""Vendored YUV4MPEG2 codec: roundtrip, plane math, frame sampling, and
the declared compressed-video boundary (SURVEY.md B48 video tier)."""

from __future__ import annotations

import pytest

from iot_data_pipeline_spark.operators import y4m
from iot_data_pipeline_spark.operators.y4m import (
    Y4mFormatError,
    Y4mFrame,
    decode_y4m,
    encode_y4m,
    mean_luma,
)


def _solid_frames(w, h, values, colorspace="C444"):
    luma, chroma = y4m._plane_sizes(w, h, colorspace)
    return [
        Y4mFrame(
            bytes([v]) * luma,
            (b"\x80" * chroma) if chroma else None,
            (b"\x80" * chroma) if chroma else None,
        )
        for v in values
    ]


@pytest.mark.parametrize("cs", ["C444", "C420jpeg", "C420", "Cmono"])
def test_roundtrip_planes_exact(cs):
    frames = _solid_frames(8, 6, [0, 17, 255], cs)
    clip = decode_y4m(encode_y4m(8, 6, frames, cs, (30, 1)))
    assert (clip.width, clip.height, clip.n_frames) == (8, 6, 3)
    assert clip.colorspace == cs
    assert [f.y for f in clip.frames] == [f.y for f in frames]
    assert [f.cb for f in clip.frames] == [f.cb for f in frames]
    assert clip.duration_ms == 100  # 3 frames at 30fps


def test_mean_luma_exact_on_gradient():
    # non-solid plane: mean is the exact rational of the byte sum
    y = bytes(range(48))
    clip = decode_y4m(encode_y4m(8, 6, [Y4mFrame(y, None, None)], "Cmono"))
    assert mean_luma(clip.frames[0]) == sum(range(48)) / 48


def test_default_colorspace_is_420():
    # spec: absent C tag means 4:2:0
    payload = b"YUV4MPEG2 W4 H4 F25:1\nFRAME\n" + bytes(16) + bytes(4) + bytes(4)
    clip = decode_y4m(payload)
    assert clip.colorspace == "C420jpeg"
    assert clip.n_frames == 1


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"RIFFnot-a-video", "signature"),
        (b"YUV4MPEG2 W4 H4 F25:1 Cweird\nFRAME\n" + bytes(64), "colorspace"),
        (b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + bytes(10), "truncated"),
        (b"YUV4MPEG2 W4 H4 F25:1 C444\nBADMARK\n" + bytes(48), "FRAME marker"),
        (b"YUV4MPEG2 W0 H4 F25:1 C444\nFRAME\n", "dimensions"),
        (b"YUV4MPEG2 W4 H4 F0:1 C444\nFRAME\n", "frame rate"),
        (b"YUV4MPEG2 W5 H5 F25:1 C420\nFRAME\n" + bytes(75), "even dimensions"),
        (b"YUV4MPEG2 Wx H4 F25:1\n", "malformed header"),
    ],
)
def test_malformed_payloads_raise_format_error(payload, msg):
    with pytest.raises(Y4mFormatError, match=msg):
        decode_y4m(payload)


def test_decode_cap_blocks_huge_header():
    # a tiny payload declaring absurd geometry must refuse before allocating
    payload = b"YUV4MPEG2 W99999 H99999 F25:1 Cmono\nFRAME\n" + bytes(1024)
    with pytest.raises(Y4mFormatError, match="truncated|cap"):
        decode_y4m(payload)


def test_sample_video_frames_strict_and_boundary(spark):
    from iot_data_pipeline_spark.operators.multimodal import sample_video_frames

    clip = encode_y4m(4, 4, _solid_frames(4, 4, [10, 20, 30, 40, 50]), "C444")
    df = spark.createDataFrame(
        [(7, bytearray(clip))], "media_id long, content binary"
    )
    rows = sorted(
        sample_video_frames(df, every_n=2, mode="strict").collect(),
        key=lambda r: r.frame_idx,
    )
    assert [(r.frame_idx, r.n_frames, r.mean_luma) for r in rows] == [
        (0, 5, 10.0),
        (2, 5, 30.0),
        (4, 5, 50.0),
    ]

    # compressed video is a declared boundary: strict kernel refuses loudly
    h264ish = b"\x00\x00\x00\x01\x67" + bytes(64)
    bad = spark.createDataFrame(
        [(0, bytearray(h264ish))], "media_id long, content binary"
    )
    with pytest.raises(Exception, match="YUV4MPEG2"):
        sample_video_frames(bad, mode="strict").collect()


def test_sample_video_frames_null_and_fake(spark):
    from iot_data_pipeline_spark.operators.multimodal import sample_video_frames

    df = spark.createDataFrame(
        [(1, None), (2, bytearray(b"\x03abc"))],
        "media_id long, content binary",
    )
    out = sample_video_frames(df, every_n=1, mode="fake").collect()
    # NULL payload contributes no frames; fake mode fans out payload[0] rows
    assert {r.media_id for r in out} == {2}
    assert len(out) == 3
