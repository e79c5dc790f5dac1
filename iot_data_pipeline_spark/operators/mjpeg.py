"""Minimal MJPEG-in-AVI codec (B48's COMPRESSED-video modality).

Motion JPEG is the simplest real compressed-video format in the wild
(webcams, older cameras, capture cards): an AVI RIFF container whose
video stream is one independently-coded JPEG per frame. That makes it
exactly reachable with this repo's vendored T.81 codec -- the container
walk lives here, every frame decodes through ``operators/jpeg.py``
(baseline AND progressive), so "compressed video" stops being a blanket
refusal: MJPEG decodes for real, and only INTERFRAME codecs
(H.264/VP9/AV1 -- motion compensation, reference frames) remain the
documented ffmpeg plug-in point.

Scope: single-video-stream AVI ('vids' + 'MJPG'/'mjpg' or per-frame
JPEG-sniffed '00dc'/'00db' chunks), fps from the stream header's
rate/scale. The encoder writes a spec-shaped minimal AVI (RIFF/hdrl/
strl/movi) so round-trips exercise the parser on real structure.

Format reference: the public AVI RIFF specification (Microsoft
"AVI RIFF File Reference") and ITU-T T.81 for the frame payloads.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from iot_data_pipeline_spark.operators import jpeg as _jpeg

__all__ = [
    "MjpegFormatError",
    "is_avi",
    "decode_mjpeg_avi",
    "encode_mjpeg_avi",
    "mean_luma_rgb",
    "MAX_FRAMES",
]


class MjpegFormatError(ValueError):
    """Payload is not an MJPEG AVI this decoder supports."""


#: Bomb guard: maximum frames decoded from one payload.
MAX_FRAMES = 10_000


@dataclass(frozen=True)
class MjpegClip:
    width: int
    height: int
    fps_num: int
    fps_den: int
    #: decoded frames: (width, height, channels, pixels) per frame
    frames: tuple[tuple[int, int, int, bytearray], ...]

    @property
    def n_frames(self) -> int:
        return len(self.frames)


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_len) over a RIFF chunk run."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = pos + 8
        if body + clen > end:
            raise MjpegFormatError(f"truncated {fourcc!r} chunk")
        yield fourcc, body, clen
        pos = body + clen + (clen & 1)  # chunks are word-aligned


def decode_mjpeg_avi(payload: bytes) -> MjpegClip:
    """Parse the AVI container and JPEG-decode every video frame."""
    if not is_avi(payload):
        raise MjpegFormatError("bad RIFF/AVI signature")
    rate = scale = 0
    frames: list[tuple[int, int, int, bytearray]] = []
    saw_video_stream = False

    def handle_list(body: int, clen: int, depth: int = 0) -> None:
        nonlocal rate, scale, saw_video_stream
        # Real AVIs nest LISTs at most ~3 deep (hdrl>strl, movi>'rec ');
        # a crafted payload nesting ~12 bytes/level would otherwise turn
        # into RecursionError, which escapes the tolerant channel's
        # FormatError-only dead-letter contract.
        if depth > 32:
            raise MjpegFormatError("LIST nesting deeper than 32 levels")
        ltype = payload[body : body + 4]
        inner = body + 4
        end = body + clen
        if ltype in (b"hdrl", b"strl"):
            for fourcc, b, ln in _walk_chunks(payload, inner, end):
                if fourcc == b"LIST":
                    handle_list(b, ln, depth + 1)
                elif fourcc == b"strh" and ln >= 40:
                    fcc_type = payload[b : b + 4]
                    if fcc_type == b"vids":
                        saw_video_stream = True
                        scale, rate = struct.unpack(
                            "<II", payload[b + 20 : b + 28]
                        )
        elif ltype == b"movi":
            for fourcc, b, ln in _walk_chunks(payload, inner, end):
                if fourcc == b"LIST":
                    handle_list(b, ln, depth + 1)  # 'rec ' grouping
                elif fourcc[2:4] in (b"dc", b"db"):
                    blob = payload[b : b + ln]
                    if not _jpeg.is_jpeg(blob):
                        raise MjpegFormatError(
                            f"video chunk {fourcc!r} is not a JPEG frame "
                            "(non-MJPEG AVI codecs are the ffmpeg plug-in "
                            "point)"
                        )
                    if len(frames) >= MAX_FRAMES:
                        raise MjpegFormatError(
                            f"more than MAX_FRAMES ({MAX_FRAMES}) frames"
                        )
                    frames.append(_jpeg.decode_jpeg(blob))

    for fourcc, body, clen in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST":
            handle_list(body, clen)
    if not saw_video_stream:
        raise MjpegFormatError("no 'vids' stream header in AVI")
    if not frames:
        raise MjpegFormatError("no video frames in movi list")
    w, h = frames[0][0], frames[0][1]
    for f in frames:
        if (f[0], f[1]) != (w, h):
            raise MjpegFormatError("frame dimensions vary within the stream")
    return MjpegClip(
        width=w,
        height=h,
        fps_num=rate or 25,
        fps_den=scale or 1,
        frames=tuple(frames),
    )


def mean_luma_rgb(frame: tuple[int, int, int, bytearray]) -> float:
    """Mean integer Rec.601 luma of a decoded frame, in [0, 255] -- the
    RGB twin of ``y4m.mean_luma`` (greyscale frames pass through)."""
    w, h, ch, px = frame
    n = w * h
    if ch >= 3:
        total = sum(
            (299 * px[i * ch] + 587 * px[i * ch + 1] + 114 * px[i * ch + 2])
            // 1000
            for i in range(n)
        )
    else:
        total = sum(px[i * ch] for i in range(n))
    return total / n


def encode_mjpeg_avi(
    width: int,
    height: int,
    frames_rgb: list[bytes],
    fps: int = 25,
    quality: int = 90,
    progressive: bool = False,
) -> bytes:
    """Encode RGB frames as a minimal single-stream MJPEG AVI
    (decoder-coverage twin; ``progressive=True`` makes every frame an
    SOF2 JPEG, proving the container x progressive composition)."""
    if not frames_rgb:
        raise MjpegFormatError("need at least one frame")
    blobs = [
        _jpeg.encode_jpeg(
            width, height, 3, f, quality=quality, progressive=progressive
        )
        for f in frames_rgb
    ]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    n = len(blobs)
    max_blob = max(len(b) for b in blobs)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_blob * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0,  # dwFlags: no AVIF_HASINDEX -- this writer emits no idx1
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_blob,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate
            0,  # dwStart
            n,  # dwLength
            max_blob,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
