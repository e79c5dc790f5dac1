"""Minimal pure-stdlib PNG codec (B48's real decode path).

The sandbox has no image libraries, so this vendors a from-scratch PNG
decoder/encoder on ``zlib`` + ``struct`` only (PNG is the one mainstream
image format fully decodable with the stdlib). Scope: 8-bit greyscale /
RGB / RGBA / greyscale+alpha, non-interlaced, all five scanline filters --
i.e. everything the common ``Image.save(..., format='PNG')`` default
writers emit. Palette, 16-bit, and Adam7 raise ``PngFormatError`` rather
than silently mis-decoding.

This runs INSIDE mapInPandas/mapInArrow kernels (operators/multimodal.py),
so it must be dependency-free and deterministic; throughput is secondary
to having an honest end-to-end pixels path (the fast path on a real
cluster vendors libjpeg-turbo/ffmpeg via the cluster image).

Format reference: the public PNG specification (RFC 2083 / W3C PNG).
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color_type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Raised for payloads that are not PNG or use unsupported features."""


#: Decompression-bomb guard: max decoded sample buffer (width*height*channels)
#: accepted by ``decode_png``. 64 MiB covers any sane corpus thumbnail/image
#: while bounding the O(pixels) pure-Python unfilter loop an adversarial
#: 8-byte IHDR could otherwise trigger inside an executor kernel.
MAX_DECODED_BYTES = 64 * 1024 * 1024


def is_png(payload: bytes) -> bool:
    return payload[:8] == _SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a PNG -> ``(width, height, channels, pixels)``.

    ``pixels`` is a flat row-major bytearray of length
    ``width * height * channels`` (8 bits per sample).
    """
    if not is_png(payload):
        raise PngFormatError("bad PNG signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[
            pos + 4 : pos + 8
        ]
        if pos + 8 + length > len(payload):
            raise PngFormatError("chunk length exceeds payload (truncated PNG)")
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            if len(data) != 13:
                raise PngFormatError("malformed IHDR chunk")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS:
                raise PngFormatError(f"unsupported color type {color}")
            if interlace != 0:
                raise PngFormatError("Adam7 interlacing unsupported")
            if comp != 0 or filt != 0:
                raise PngFormatError("nonstandard compression/filter method")
            channels = _CHANNELS[color]
            if width * height * channels > MAX_DECODED_BYTES:
                raise PngFormatError(
                    f"decoded size {width}x{height}x{channels} exceeds "
                    f"MAX_DECODED_BYTES ({MAX_DECODED_BYTES})"
                )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width < 0 or not idat:
        raise PngFormatError("missing IHDR or IDAT")

    stride = width * channels
    expected = (stride + 1) * height
    try:
        # Bounded inflate: ask for at most expected+1 bytes so a bomb stream
        # stops at the cap instead of materializing; a too-long stream then
        # yields expected+1 bytes and fails the exact-length check below.
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise PngFormatError(f"corrupt IDAT stream: {exc}") from exc
    if len(raw) != expected:
        raise PngFormatError("IDAT length does not match dimensions")

    # Per-row unfilter. None/Sub/Up rows (everything our own encoder and
    # most tools emit) are numpy-vectorized: Sub's left-neighbor recurrence
    # is a per-channel cumulative sum mod 256, Up is elementwise add with
    # the previous output row. Average/Paeth keep the scalar loop -- their
    # left-dependency mixes with the up-row through >>1 / the Paeth
    # predictor, which has no closed prefix form; they stay correct, just
    # on the slow path.
    import numpy as np

    rawa = np.frombuffer(bytes(raw), dtype=np.uint8)
    out_np = np.empty((height, stride), dtype=np.uint8)
    for y in range(height):
        fbyte = raw[y * (stride + 1)]
        line_off = y * (stride + 1) + 1
        line = rawa[line_off : line_off + stride]
        if fbyte == 0:  # None
            out_np[y] = line
        elif fbyte == 1:  # Sub: per-channel cumsum mod 256
            cur = line.reshape(-1, channels).astype(np.int64)
            out_np[y] = (
                (np.cumsum(cur, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
            )
        elif fbyte == 2:  # Up
            if y:
                out_np[y] = line + out_np[y - 1]  # uint8 wraparound == mod 256
            else:
                out_np[y] = line
        elif fbyte in (3, 4):  # Average / Paeth: scalar (sequential in x)
            prev = bytes(out_np[y - 1]) if y else bytes(stride)
            row = bytearray(stride)
            if fbyte == 3:
                for x in range(stride):
                    left = row[x - channels] if x >= channels else 0
                    row[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
            else:
                for x in range(stride):
                    left = row[x - channels] if x >= channels else 0
                    ul = prev[x - channels] if x >= channels else 0
                    row[x] = (line[x] + _paeth(left, prev[x], ul)) & 0xFF
            out_np[y] = np.frombuffer(bytes(row), dtype=np.uint8)
        else:
            raise PngFormatError(f"bad filter byte {fbyte}")
    return width, height, channels, bytearray(out_np.tobytes())


def encode_png(
    width: int, height: int, channels: int, pixels: bytes | bytearray
) -> bytes:
    """Encode flat 8-bit row-major samples -> PNG bytes (filter 0 per row,
    fixed zlib level => byte-deterministic output)."""
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color is None:
        raise PngFormatError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise PngFormatError("pixel buffer does not match dimensions")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(pixels[y * stride : (y + 1) * stride])
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytes | bytearray,
    new_w: int,
    new_h: int,
) -> bytearray:
    """Nearest-neighbor resample (deterministic integer sampling grid)."""
    import numpy as np

    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(
        height, width, channels
    )
    sy = np.minimum(np.arange(new_h) * height // new_h, height - 1)
    sx = np.minimum(np.arange(new_w) * width // new_w, width - 1)
    return bytearray(arr[np.ix_(sy, sx)].tobytes())


def luma_grid_features(
    width: int, height: int, channels: int, pixels: bytes | bytearray, dim: int
) -> list[float]:
    """Real pixel features: mean luma over a ``g x g`` spatial grid
    (g = ceil(sqrt(dim))), flattened and truncated to ``dim``, each in
    [0, 1]. Luma uses integer Rec.601 weights so results are identical
    across platforms."""
    import numpy as np

    g = 1
    while g * g < dim:
        g += 1
    arr = (
        np.frombuffer(bytes(pixels), dtype=np.uint8)
        .reshape(height, width, channels)
        .astype(np.int64)
    )
    if channels >= 3:
        luma = (299 * arr[:, :, 0] + 587 * arr[:, :, 1] + 114 * arr[:, :, 2]) // 1000
    else:
        luma = arr[:, :, 0]
    gy = np.minimum(np.arange(height) * g // height, g - 1)
    gx = np.minimum(np.arange(width) * g // width, g - 1)
    cell = (gy[:, None] * g + gx[None, :]).ravel()
    # luma sums are integers exactly representable in float64 (<= 2^53),
    # so bincount-with-weights reproduces the scalar int accumulation
    sums = np.bincount(cell, weights=luma.ravel(), minlength=g * g)
    counts = np.bincount(cell, minlength=g * g)
    feats = np.where(
        counts > 0, sums / np.maximum(counts, 1) / 255.0, 0.0
    )
    return [float(v) for v in feats[:dim]]
