"""Minimal stdlib GIF codec (B48's compressed-image modality).

Companion to ``operators/png.py`` / ``jpeg.py`` / ``audio.py`` / ``y4m.py``:
a REAL decoder for a public format — GIF89a (CompuServe GIF89a spec, 1990;
also ISO/IEC-cited via W3C's archived copy) — implemented from the spec with
zero dependencies. GIF matters to the codec family because its pixel data is
**LZW-compressed** with variable-width codes, so a correct decode genuinely
exercises a dictionary-based compressed stream, not just byte plumbing
(PNG's inflate is delegated to zlib; here the decompressor is ours).

Scope: GIF87a/89a incl. 4-pass interlacing (round 5; previously
refused); ``decode_gif`` reads the first frame (global or local color
table), ``decode_gif_frames`` reads full-screen animation frames under
the global table; extensions (graphic control, comment, application)
are skipped per spec. Partial-region disposal composition raises
``GifFormatError`` — refused honestly.

The encoder emits real variable-width LZW (dictionary up to 4096 codes,
deferred clear), so encode→decode round-trips are a true compression test.
Everything is integer arithmetic — features are bit-identical across
platforms and SQL-restatable for closed-form oracles (q151).

Reference parity target: the reference has no media path at all
(`app/app.py:1-149` is JSONL-only); this extends SURVEY §2.2 B48.
"""

from __future__ import annotations

import struct

_MAX_CODE = 4096  # 12-bit ceiling fixed by the GIF spec


class GifFormatError(ValueError):
    """Payload is not a GIF this decoder supports."""


def is_gif(payload: bytes) -> bool:
    return payload[:6] in (b"GIF87a", b"GIF89a")


def lzw_compress(indices: bytes | bytearray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    clear code 2**mcs, end code clear+1, dictionary capped at 4096 codes
    (emit a clear and restart when full)."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in bytes(indices):
        probe = prefix + bytes([b])
        if probe in table:
            prefix = probe
            continue
        emit(table[prefix], width)
        if next_code < _MAX_CODE:
            table[probe] = next_code
            next_code += 1
            # canonical bump (giflib semantics): widen as soon as the NEXT
            # code to assign would not fit, so every emitted code fits
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
        # The decoder appends a table entry for this FINAL data code (it lags
        # the encoder by one during the loop and catches up here), so its
        # width bump can fire before it reads EOI. Mirror that bump: decoder
        # widens when len(table) == (1 << width) - 1, and after the final
        # append len(table) == next_code.
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    emit(end, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, min_code_size: int) -> bytearray:
    """Inverse of :func:`lzw_compress`, tolerant of the KwKwK case
    (code == next unassigned entry) per the spec's decoder algorithm."""
    clear = 1 << min_code_size
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    out = bytearray()
    prev: bytes | None = None
    bitbuf = 0
    nbits = 0
    for byte in data:
        bitbuf |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = bitbuf & ((1 << width) - 1)
            bitbuf >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                if code >= len(table):
                    raise GifFormatError(f"first code {code} out of table")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < _MAX_CODE:
                    table.append(prev + entry[:1])
            elif code == len(table):  # KwKwK
                entry = prev + prev[:1]
                if len(table) < _MAX_CODE:
                    table.append(entry)
            else:
                raise GifFormatError(f"LZW code {code} beyond table {len(table)}")
            out.extend(entry)
            # the decoder's table lags the encoder's by one entry, so the
            # matching bump point is one below the encoder's threshold
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
            prev = entry
    raise GifFormatError("LZW stream ended without end-of-information code")


#: GIF interlace passes (GIF89a spec 20.c): (start_row, row_step).
_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(height: int) -> list[int]:
    """Row indices in transmission order for an interlaced image."""
    order = []
    for start, step in _GIF_PASSES:
        order.extend(range(start, height, step))
    return order


def _deinterlace(indices: bytearray, width: int, height: int) -> bytearray:
    """Reorder transmitted rows (4-pass interlace) into top-to-bottom."""
    out = bytearray(len(indices))
    for tx_row, img_row in enumerate(_interlace_order(height)):
        out[img_row * width : (img_row + 1) * width] = indices[
            tx_row * width : (tx_row + 1) * width
        ]
    return out


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: bytes,
    interlaced: bool = False,
) -> bytes:
    """Encode row-major palette indices as a single-frame GIF89a with a
    global color table (palette padded to the next power of two ≥ 2)."""
    if len(indices) != width * height:
        raise GifFormatError("index buffer does not match dimensions")
    if not 1 <= len(palette) <= 256:
        raise GifFormatError(f"palette size {len(palette)} out of range")
    depth = 1
    while (1 << depth) < len(palette):
        depth += 1
    table = list(palette) + [(0, 0, 0)] * ((1 << depth) - len(palette))
    mcs = max(depth, 2)  # spec: minimum LZW code size is 2
    if max(indices, default=0) >= (1 << depth):
        raise GifFormatError("pixel index exceeds palette")
    if interlaced:
        reordered = bytearray()
        for row in _interlace_order(height):
            reordered.extend(indices[row * width : (row + 1) * width])
        indices = bytes(reordered)
    lzw = lzw_compress(indices, mcs)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)  # block terminator
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
        + b"".join(bytes(c) for c in table)
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0x40 if interlaced else 0)
        + bytes([mcs])
        + bytes(blocks)
        + b"\x3b"
    )


def decode_gif(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], bytearray]:
    """Decode -> ``(width, height, palette, indices)`` for the first image.

    Walks the block stream per spec: extensions (0x21) are skipped via
    their sub-block chain; the first image descriptor (0x2C) is decoded
    (local color table preferred over global when present); 0x3B ends.
    """
    if not is_gif(payload):
        raise GifFormatError("bad GIF signature")
    if len(payload) < 13:
        raise GifFormatError("truncated logical screen descriptor")
    _, _, flags, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        raw = payload[pos : pos + 3 * n]
        if len(raw) < 3 * n:
            raise GifFormatError("truncated global color table")
        palette = [(raw[i], raw[i + 1], raw[i + 2]) for i in range(0, 3 * n, 3)]
        pos += 3 * n
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:  # extension: label byte + sub-block chain
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise GifFormatError(f"unexpected block marker 0x{marker:02x}")
        if pos + 9 > len(payload):
            raise GifFormatError("truncated image descriptor")
        _, _, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        interlaced = bool(iflags & 0x40)
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            raw = payload[pos : pos + 3 * n]
            if len(raw) < 3 * n:
                raise GifFormatError("truncated local color table")
            palette = [(raw[i], raw[i + 1], raw[i + 2]) for i in range(0, 3 * n, 3)]
            pos += 3 * n
        if pos >= len(payload):
            raise GifFormatError("missing LZW minimum code size")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise GifFormatError(f"LZW minimum code size {mcs} out of range")
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            data.extend(payload[pos + 1 : pos + 1 + n])
            pos += 1 + n
        indices = lzw_decompress(bytes(data), mcs)
        if len(indices) < iw * ih:
            raise GifFormatError(
                f"decoded {len(indices)} indices for {iw}x{ih} image"
            )
        del indices[iw * ih :]
        if interlaced:
            indices = _deinterlace(indices, iw, ih)
        if not palette:
            raise GifFormatError("no color table for image")
        if max(indices, default=0) >= len(palette):
            raise GifFormatError(
                f"pixel index {max(indices)} exceeds palette of {len(palette)}"
            )
        return iw, ih, palette, indices
    raise GifFormatError("no image descriptor before trailer")


def encode_gif_animation(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    frames: list[bytes],
    delay_cs: int = 4,
) -> bytes:
    """Encode full-frame animation frames as a GIF89a with a NETSCAPE2.0
    loop extension and a graphic-control extension (delay, no disposal)
    before each frame -- the standard animated-GIF block layout."""
    if not frames:
        raise GifFormatError("animation needs at least one frame")
    if not 1 <= len(palette) <= 256:
        raise GifFormatError(f"palette size {len(palette)} out of range")
    depth = 1
    while (1 << depth) < len(palette):
        depth += 1
    table = list(palette) + [(0, 0, 0)] * ((1 << depth) - len(palette))
    mcs = max(depth, 2)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", width, height, 0x80 | (depth - 1), 0, 0)
    out += b"".join(bytes(c) for c in table)
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for frame in frames:
        if len(frame) != width * height:
            raise GifFormatError("frame size does not match dimensions")
        if max(frame, default=0) >= (1 << depth):
            raise GifFormatError("pixel index exceeds palette")
        # graphic control: disposal 0, no transparency
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out.append(mcs)
        lzw = lzw_compress(frame, mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(
    payload: bytes,
) -> tuple[int, int, list[tuple[int, int, int]], list[bytearray]]:
    """Decode ALL image descriptors -> ``(width, height, palette, frames)``.

    Like :func:`decode_gif` but keeps walking the block stream after the
    first frame. Scope limits (refused honestly): frames must be
    full-logical-screen (no partial-region composition/disposal) and
    non-interlaced; the global color table applies to every frame.
    """
    if not is_gif(payload):
        raise GifFormatError("bad GIF signature")
    if len(payload) < 13:
        raise GifFormatError("truncated logical screen descriptor")
    sw, sh, flags, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    palette: list[tuple[int, int, int]] = []
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        raw = payload[pos : pos + 3 * n]
        if len(raw) < 3 * n:
            raise GifFormatError("truncated global color table")
        palette = [(raw[i], raw[i + 1], raw[i + 2]) for i in range(0, 3 * n, 3)]
        pos += 3 * n
    frames: list[bytearray] = []
    while pos < len(payload):
        marker = payload[pos]
        pos += 1
        if marker == 0x3B:
            break
        if marker == 0x21:
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if marker != 0x2C:
            raise GifFormatError(f"unexpected block marker 0x{marker:02x}")
        if pos + 9 > len(payload):
            raise GifFormatError("truncated image descriptor")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        if (ix, iy, iw, ih) != (0, 0, sw, sh):
            raise GifFormatError(
                "partial-region animation frames (disposal composition) "
                "not supported; frames must cover the logical screen"
            )
        interlaced = bool(iflags & 0x40)
        if iflags & 0x80:
            raise GifFormatError(
                "per-frame local color tables not supported in animation "
                "decode; use the global table"
            )
        if pos >= len(payload):
            raise GifFormatError("missing LZW minimum code size")
        mcs = payload[pos]
        pos += 1
        if not 2 <= mcs <= 8:
            raise GifFormatError(f"LZW minimum code size {mcs} out of range")
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            n = payload[pos]
            data.extend(payload[pos + 1 : pos + 1 + n])
            pos += 1 + n
        pos += 1  # block terminator
        indices = lzw_decompress(bytes(data), mcs)
        if len(indices) < iw * ih:
            raise GifFormatError(
                f"decoded {len(indices)} indices for {iw}x{ih} frame"
            )
        del indices[iw * ih :]
        if interlaced:
            indices = _deinterlace(indices, iw, ih)
        frames.append(indices)
    if not frames:
        raise GifFormatError("no image descriptor before trailer")
    if not palette:
        raise GifFormatError("no color table for image")
    worst = max((max(f, default=0) for f in frames), default=0)
    if worst >= len(palette):
        raise GifFormatError(
            f"pixel index {worst} exceeds palette of {len(palette)}"
        )
    return sw, sh, palette, frames
