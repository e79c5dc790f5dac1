"""Minimal stdlib WAV codec + feature kernels (B48's audio modality).

Like ``operators/png.py`` for images, this gives the audio decode tier a
REAL path with zero dependencies: RIFF/WAVE PCM parsing via ``struct``
(the stdlib ``wave`` module is avoided deliberately -- it takes file
objects and seeks; media payloads arrive as in-memory byte columns, and
a direct parser keeps the kernel allocation-free).

Scope: PCM integer formats (8-bit unsigned, 16-bit signed LE), mono or
interleaved multi-channel. Compressed formats (MP3/AAC/FLAC) raise
``WavFormatError`` -- refused honestly, same posture as non-PNG images;
on a real cluster an ffmpeg kernel drops into the identical mapInPandas
signature.

Features are integer/rational arithmetic only (mean absolute amplitude
per time cell, zero-crossing count), so results are bit-identical across
platforms and SQL-restatable for closed-form oracles.
"""

from __future__ import annotations

import struct


class WavFormatError(ValueError):
    """Payload is not RIFF/WAVE PCM this decoder supports."""


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def encode_wav(
    samples: list[int], sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """Encode 16-bit signed PCM samples (interleaved if multi-channel)."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode -> ``(sample_rate, channels, samples)`` (interleaved ints).

    Supports PCM (audio format 1) at 8-bit unsigned / 16-bit signed.
    """
    rate, channels, _bits, samples = decode_wav_ex(payload)
    return rate, channels, samples


def decode_wav_ex(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode -> ``(sample_rate, channels, bits_per_sample, samples)``.

    8-bit payloads decode to [-128, 127] ints, so the amplitude full
    scale is ``2**(bits-1)`` -- feature kernels must normalize by it,
    not by the 16-bit constant (the FLAC depth-scope advisor finding
    applies here too: 8-bit WAV features were silently ~1/256 scale)."""
    if not is_wav(payload):
        raise WavFormatError("bad RIFF/WAVE signature")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise WavFormatError(
                f"truncated {cid!r} chunk: declared {clen}, got {len(body)} bytes"
            )
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if len(body) < 16:
                raise WavFormatError("fmt chunk shorter than 16 bytes")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise WavFormatError("missing fmt or data chunk")
    audio_format, channels, rate, _, _, bits = fmt
    if audio_format != 1:
        raise WavFormatError(f"non-PCM audio format {audio_format} unsupported")
    if channels < 1:
        raise WavFormatError("channel count must be >= 1")
    if bits not in (8, 16):
        raise WavFormatError(f"unsupported bit depth {bits}")
    frame_size = channels * bits // 8
    if len(data) % frame_size != 0:
        # A silently dropped trailing byte would mean features computed over
        # a partial final frame -- fail loudly instead.
        raise WavFormatError(
            f"data chunk length {len(data)} is not a multiple of the "
            f"{frame_size}-byte frame ({channels}ch x {bits}bit)"
        )
    if bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h", data))
    else:
        samples = [b - 128 for b in data]
    return rate, channels, bits, samples


def amplitude_grid_features(
    samples: list[int],
    channels: int,
    dim: int,
    full_scale: float = 32768.0,
) -> list[float]:
    """Mean |amplitude| over ``dim`` equal time cells, each normalized to
    [0, 1] by ``full_scale`` (``2**(bits_per_sample-1)``; defaults to the
    16-bit scale) -- the audio twin of the PNG luma grid. Multi-channel
    audio is folded by averaging the interleaved channels per frame
    (integer sum, exact)."""
    frames = len(samples) // channels
    if frames == 0:
        return [0.0] * dim
    sums = [0] * dim
    counts = [0] * dim
    for f in range(frames):
        cell = min(f * dim // frames, dim - 1)
        acc = 0
        for c in range(channels):
            acc += abs(samples[f * channels + c])
        sums[cell] += acc
        counts[cell] += channels
    return [
        (sums[i] / counts[i] / full_scale) if counts[i] else 0.0
        for i in range(dim)
    ]


def zero_crossings(samples: list[int], channels: int = 1) -> int:
    """Sign-change count of channel 0 -- the classic cheap voicing/noise
    discriminator."""
    prev = None
    crossings = 0
    for i in range(0, len(samples), channels):
        s = samples[i]
        if s == 0:
            continue
        sign = s > 0
        if prev is not None and sign != prev:
            crossings += 1
        prev = sign
    return crossings


# ---------------------------------------------------------------------------
# Fixed-point interior-bin DFT probe (closes the libm-parity boundary the
# q159 docstring documents: interior bins have irrational twiddles, so a
# float DFT's cross-engine bit-parity would hinge on libm. These tables
# freeze round(cos/sin(2*pi*k*n/32) * 2^15) ONCE as integer literals --
# generated offline, checked against numpy.fft by a proven error bound in
# tests/test_audio_codec.py -- and every engine consumes the same integers,
# so the probe is exact integer arithmetic end-to-end and SQL-restatable.)
# ---------------------------------------------------------------------------

#: DFT length of the fixed-point probe.
DFT_N = 32
#: Probed interior bins (DC and Nyquist are q159's integer-exact pair).
DFT_BINS = (1, 3, 5, 7)

DFT_COS_Q15 = {
    1: (
        32768, 32138, 30274, 27246, 23170, 18205, 12540, 6393,
        0, -6393, -12540, -18205, -23170, -27246, -30274, -32138,
        -32768, -32138, -30274, -27246, -23170, -18205, -12540, -6393,
        0, 6393, 12540, 18205, 23170, 27246, 30274, 32138,
    ),
    3: (
        32768, 27246, 12540, -6393, -23170, -32138, -30274, -18205,
        0, 18205, 30274, 32138, 23170, 6393, -12540, -27246,
        -32768, -27246, -12540, 6393, 23170, 32138, 30274, 18205,
        0, -18205, -30274, -32138, -23170, -6393, 12540, 27246,
    ),
    5: (
        32768, 18205, -12540, -32138, -23170, 6393, 30274, 27246,
        0, -27246, -30274, -6393, 23170, 32138, 12540, -18205,
        -32768, -18205, 12540, 32138, 23170, -6393, -30274, -27246,
        0, 27246, 30274, 6393, -23170, -32138, -12540, 18205,
    ),
    7: (
        32768, 6393, -30274, -18205, 23170, 27246, -12540, -32138,
        0, 32138, 12540, -27246, -23170, 18205, 30274, -6393,
        -32768, -6393, 30274, 18205, -23170, -27246, 12540, 32138,
        0, -32138, -12540, 27246, 23170, -18205, -30274, 6393,
    ),
}

DFT_SIN_Q15 = {
    1: (
        0, 6393, 12540, 18205, 23170, 27246, 30274, 32138,
        32768, 32138, 30274, 27246, 23170, 18205, 12540, 6393,
        0, -6393, -12540, -18205, -23170, -27246, -30274, -32138,
        -32768, -32138, -30274, -27246, -23170, -18205, -12540, -6393,
    ),
    3: (
        0, 18205, 30274, 32138, 23170, 6393, -12540, -27246,
        -32768, -27246, -12540, 6393, 23170, 32138, 30274, 18205,
        0, -18205, -30274, -32138, -23170, -6393, 12540, 27246,
        32768, 27246, 12540, -6393, -23170, -32138, -30274, -18205,
    ),
    5: (
        0, 27246, 30274, 6393, -23170, -32138, -12540, 18205,
        32768, 18205, -12540, -32138, -23170, 6393, 30274, 27246,
        0, -27246, -30274, -6393, 23170, 32138, 12540, -18205,
        -32768, -18205, 12540, 32138, 23170, -6393, -30274, -27246,
    ),
    7: (
        0, 32138, 12540, -27246, -23170, 18205, 30274, -6393,
        -32768, -6393, 30274, 18205, -23170, -27246, 12540, 32138,
        0, -32138, -12540, 27246, 23170, -18205, -30274, 6393,
        32768, 6393, -30274, -18205, 23170, 27246, -12540, -32138,
    ),
}

#: Quantized unit tones (round(cos * 2^11)) -- crafted test signals whose
#: spectral peak must land on their own bin.
TONE_Q11 = {
    1: (
        2048, 2009, 1892, 1703, 1448, 1138, 784, 400,
        0, -400, -784, -1138, -1448, -1703, -1892, -2009,
        -2048, -2009, -1892, -1703, -1448, -1138, -784, -400,
        0, 400, 784, 1138, 1448, 1703, 1892, 2009,
    ),
    3: (
        2048, 1703, 784, -400, -1448, -2009, -1892, -1138,
        0, 1138, 1892, 2009, 1448, 400, -784, -1703,
        -2048, -1703, -784, 400, 1448, 2009, 1892, 1138,
        0, -1138, -1892, -2009, -1448, -400, 784, 1703,
    ),
    5: (
        2048, 1138, -784, -2009, -1448, 400, 1892, 1703,
        0, -1703, -1892, -400, 1448, 2009, 784, -1138,
        -2048, -1138, 784, 2009, 1448, -400, -1892, -1703,
        0, 1703, 1892, 400, -1448, -2009, -784, 1138,
    ),
    7: (
        2048, 400, -1892, -1138, 1448, 1703, -784, -2009,
        0, 2009, 784, -1703, -1448, 1138, 1892, -400,
        -2048, -400, 1892, 1138, -1448, -1703, 784, 2009,
        0, -2009, -784, 1703, 1448, -1138, -1892, 400,
    ),
}


def fixed_point_dft_bins(x: list[int]) -> dict[int, tuple[int, int]]:
    """Exact-integer DFT response ``{bin: (re, im)}`` at :data:`DFT_BINS`
    for a length-:data:`DFT_N` integer signal, using the frozen Q15
    twiddles (convention ``X_k = sum x_n * e^{-2pi i k n / N}``, so
    ``im = -sum(x_n * sin_q15)``; results carry the 2^15 scale).

    Everything is Python-int arithmetic: no libm at probe time, no
    overflow (|re| <= max|x| * 2^15 * 32), and the identical integers are
    restatable as SQL list literals -- the property q190 gates.
    """
    if len(x) != DFT_N:
        raise ValueError(f"signal must have exactly {DFT_N} samples")
    out = {}
    for k in DFT_BINS:
        cos_k = DFT_COS_Q15[k]
        sin_k = DFT_SIN_Q15[k]
        re = sum(xi * c for xi, c in zip(x, cos_k))
        im = -sum(xi * s for xi, s in zip(x, sin_k))
        out[k] = (re, im)
    return out
