"""Vendored YUV4MPEG2 (.y4m) container codec -- pure stdlib, no deps.

YUV4MPEG2 is the public uncompressed-video interchange format used by
mjpegtools/ffmpeg/x264 test pipelines: one ASCII header line, then each
frame as an ASCII ``FRAME`` marker followed by raw planar YCbCr bytes.
Because it is uncompressed and byte-planar it decodes with zero codec
machinery -- which makes it the honest "real video path" tier next to
PNG (operators/png.py), WAV (operators/audio.py) and baseline JPEG
(operators/jpeg.py): container parsing, plane math and frame sampling
are real; *compressed* video (H.264/VP9/AV1) stays refused with
``NotImplementedError`` (SURVEY.md B48 boundary).

Format (public spec, wiki.multimedia.cx/index.php/YUV4MPEG2):

    YUV4MPEG2 W<w> H<h> F<num>:<den> [Ip] [A<n>:<d>] [C<cs>] [Xtag]\\n
    FRAME[ params]\\n  <Y plane> <Cb plane> <Cr plane>   (repeated)

Supported colorspaces: C444 (full-res chroma), C420 family
(C420/C420jpeg/C420mpeg2/C420paldv -- all 2x2-subsampled planes, the
siting tags only matter for resampling filters, not raw plane sizes),
and Cmono (no chroma planes). Anything else raises
:class:`Y4mFormatError`.

Reference behavioral parity note: the reference system (app/app.py) has
no media surface at all; this module exists for the north-star
multimodal mandate, not reference parity.
"""

from __future__ import annotations

from dataclasses import dataclass

_MAGIC = b"YUV4MPEG2"

#: Parse cap: frames * width * height is bounded to keep a malicious
#: header from driving unbounded allocation inside an executor kernel
#: (same decompression-bomb posture as operators/png.py).
MAX_TOTAL_LUMA_BYTES = 256 * 1024 * 1024


class Y4mFormatError(ValueError):
    """Payload is not a decodable YUV4MPEG2 stream."""


@dataclass(frozen=True)
class Y4mFrame:
    y: bytes
    cb: bytes | None
    cr: bytes | None


@dataclass(frozen=True)
class Y4mClip:
    width: int
    height: int
    fps_num: int
    fps_den: int
    colorspace: str
    frames: tuple[Y4mFrame, ...]

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        if self.fps_num <= 0:
            return 0
        return (1000 * self.n_frames * self.fps_den) // self.fps_num


def _plane_sizes(width: int, height: int, colorspace: str) -> tuple[int, int]:
    """(luma_bytes, chroma_bytes_per_plane) for one frame."""
    if colorspace == "C444":
        return width * height, width * height
    if colorspace.startswith("C420"):
        if width % 2 or height % 2:
            raise Y4mFormatError(
                f"C420 requires even dimensions, got {width}x{height}"
            )
        return width * height, (width // 2) * (height // 2)
    if colorspace == "Cmono":
        return width * height, 0
    raise Y4mFormatError(f"unsupported colorspace {colorspace!r}")


def decode_y4m(payload: bytes) -> Y4mClip:
    """Parse a complete .y4m byte payload into planes.

    Raises :class:`Y4mFormatError` on a bad magic, malformed header
    tags, unsupported colorspace, truncated frame data, or a header
    whose declared geometry exceeds :data:`MAX_TOTAL_LUMA_BYTES`.
    """
    if not payload.startswith(_MAGIC + b" "):
        raise Y4mFormatError("bad YUV4MPEG2 signature")
    nl = payload.find(b"\n")
    if nl < 0:
        raise Y4mFormatError("missing stream-header newline")
    try:
        header = payload[len(_MAGIC) + 1 : nl].decode("ascii")
    except UnicodeDecodeError as exc:
        raise Y4mFormatError("non-ASCII stream header") from exc

    width = height = 0
    fps_num, fps_den = 0, 1
    colorspace = "C420jpeg"  # spec default when no C tag is present
    for tag in header.split(" "):
        if not tag:
            continue
        kind, val = tag[0], tag[1:]
        try:
            if kind == "W":
                width = int(val)
            elif kind == "H":
                height = int(val)
            elif kind == "F":
                num, den = val.split(":")
                fps_num, fps_den = int(num), int(den)
            elif kind == "C":
                colorspace = tag
            elif kind in ("I", "A", "X"):
                pass  # interlacing / aspect / extensions: size-irrelevant
            else:
                raise Y4mFormatError(f"unknown header tag {tag!r}")
        except ValueError as exc:
            raise Y4mFormatError(f"malformed header tag {tag!r}") from exc
    if width <= 0 or height <= 0:
        raise Y4mFormatError(f"bad dimensions {width}x{height}")
    if fps_num <= 0 or fps_den <= 0:
        raise Y4mFormatError(f"bad frame rate {fps_num}:{fps_den}")

    luma, chroma = _plane_sizes(width, height, colorspace)
    frame_bytes = luma + 2 * chroma

    frames: list[Y4mFrame] = []
    pos = nl + 1
    total_luma = 0
    n = len(payload)
    while pos < n:
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise Y4mFormatError("missing FRAME marker")
        pos = fnl + 1
        if pos + frame_bytes > n:
            raise Y4mFormatError("truncated frame data")
        total_luma += luma
        if total_luma > MAX_TOTAL_LUMA_BYTES:
            raise Y4mFormatError("declared video size exceeds decode cap")
        y = payload[pos : pos + luma]
        pos += luma
        if chroma:
            cb = payload[pos : pos + chroma]
            cr = payload[pos + chroma : pos + 2 * chroma]
            pos += 2 * chroma
        else:
            cb = cr = None
        frames.append(Y4mFrame(y, cb, cr))
    return Y4mClip(width, height, fps_num, fps_den, colorspace, tuple(frames))


def encode_y4m(
    width: int,
    height: int,
    frames: list[Y4mFrame],
    colorspace: str = "C420jpeg",
    fps: tuple[int, int] = (25, 1),
) -> bytes:
    """Serialize planes back to a .y4m payload (the synth/test writer)."""
    luma, chroma = _plane_sizes(width, height, colorspace)
    out = [
        f"YUV4MPEG2 W{width} H{height} F{fps[0]}:{fps[1]} Ip A1:1 {colorspace}\n".encode()
    ]
    for i, fr in enumerate(frames):
        if len(fr.y) != luma:
            raise Y4mFormatError(f"frame {i}: luma plane must be {luma} bytes")
        out.append(b"FRAME\n")
        out.append(fr.y)
        if chroma:
            if fr.cb is None or fr.cr is None or len(fr.cb) != chroma or len(fr.cr) != chroma:
                raise Y4mFormatError(
                    f"frame {i}: chroma planes must be {chroma} bytes"
                )
            out.append(fr.cb)
            out.append(fr.cr)
    return b"".join(out)


def mean_luma(frame: Y4mFrame) -> float:
    """Average Y value of one frame, 0..255 (exact rational / len)."""
    if not frame.y:
        return 0.0
    return sum(frame.y) / len(frame.y)
