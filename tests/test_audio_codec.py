"""Vendored WAV codec (operators/audio.py) + the strict-mode audio kernel."""

from __future__ import annotations

import pytest

from iot_data_pipeline_spark.operators import audio


def test_wav_roundtrip_16bit():
    samples = [0, 100, -100, 32767, -32768, 5]
    blob = audio.encode_wav(samples, sample_rate=8000)
    assert audio.is_wav(blob)
    rate, channels, back = audio.decode_wav(blob)
    assert (rate, channels) == (8000, 1)
    assert back == samples


def test_wav_rejects_non_pcm_and_garbage():
    with pytest.raises(audio.WavFormatError):
        audio.decode_wav(b"ID3\x03mp3-like-bytes----")
    import struct

    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)  # format 3 = float
    blob = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(audio.WavFormatError):
        audio.decode_wav(blob)


def test_amplitude_grid_and_zero_crossings():
    # 8 frames stereo: channel avg |amp| constant 10 -> every cell 10/32768
    samples = []
    for i in range(8):
        s = 10 if i % 2 == 0 else -10
        samples.extend([s, s])
    feats = audio.amplitude_grid_features(samples, channels=2, dim=4)
    assert feats == pytest.approx([10 / 32768.0] * 4)
    assert audio.zero_crossings(samples, channels=2) == 7


def test_strict_audio_kernel_in_spark(spark):
    from iot_data_pipeline_spark.operators.multimodal import extract_audio_features

    rows = []
    for i in range(4):
        a = 100 * (i + 1)
        blob = audio.encode_wav([a if j % 2 == 0 else -a for j in range(16)])
        rows.append((i, bytearray(blob)))
    df = spark.createDataFrame(rows, "media_id long, content binary").repartition(2)
    got = {
        r["media_id"]: (list(r["features"]), r["zero_crossings"])
        for r in extract_audio_features(df, dim=4, mode="strict").collect()
    }
    for i in range(4):
        feats, zc = got[i]
        assert feats == pytest.approx([100 * (i + 1) / 32768.0] * 4)
        assert zc == 15


def test_truncated_data_chunk_raises():
    """data chunk declaring more bytes than present -> WavFormatError, not a
    silent partial decode (ADVICE r2)."""
    import struct

    blob = bytearray(audio.encode_wav([1, 2, 3, 4], sample_rate=8000))
    # Inflate the data chunk's declared length beyond the payload.
    data_at = bytes(blob).find(b"data") + 4
    blob[data_at : data_at + 4] = struct.pack("<I", 10_000)
    with pytest.raises(audio.WavFormatError, match="truncated"):
        audio.decode_wav(bytes(blob))


def test_misaligned_data_chunk_raises():
    """Odd data length at 16-bit depth means a partial trailing frame --
    must fail loudly rather than drop the byte."""
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    data = bytes(5)  # 5 bytes is not a multiple of the 2-byte frame
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    with pytest.raises(audio.WavFormatError, match="multiple"):
        audio.decode_wav(blob)


def test_mp3_payload_refused_with_documented_boundary(spark):
    """MP3/compressed audio is a declared boundary: strict kernel raises
    NotImplementedError naming the RIFF/WAVE-only scope."""
    from iot_data_pipeline_spark.operators.multimodal import extract_audio_features

    mp3 = b"ID3\x04\x00\x00\x00\x00\x00\x00" + bytes(64)
    df = spark.createDataFrame([(0, bytearray(mp3))], "media_id long, content binary")
    with pytest.raises(Exception, match="only RIFF/WAVE"):
        extract_audio_features(df, dim=4, mode="strict").collect()


def test_fixed_point_dft_matches_numpy_within_proven_bound():
    """The frozen Q15 twiddle tables ARE the DFT: for any integer signal,
    each per-term quantization error is at most 0.5 Q15 units, so
    |re - 2^15 * Re(FFT_k)| <= 32 * 0.5 * max|x| = 16 * max|x| (same for
    im). Checked on the four crafted tones and pseudo-random signals --
    this is what lets q190's oracle share the tables without the gate
    becoming self-referential."""
    import numpy as np

    signals = [list(audio.TONE_Q11[k]) for k in audio.DFT_BINS]
    rng = np.random.default_rng(7)
    signals += [
        [int(v) for v in rng.integers(-30000, 30000, size=audio.DFT_N)]
        for _ in range(8)
    ]
    for x in signals:
        bound = 16 * max(abs(v) for v in x)
        spec = np.fft.fft(np.asarray(x, dtype=np.float64))
        got = audio.fixed_point_dft_bins(x)
        for k in audio.DFT_BINS:
            re, im = got[k]
            assert abs(re - 2**15 * spec[k].real) <= bound, (k, x[:4])
            assert abs(im - 2**15 * spec[k].imag) <= bound, (k, x[:4])


def test_fixed_point_dft_tone_peaks():
    """Each quantized tone's largest probed-bin magnitude is its own bin,
    and rejection is strong (>60 dB: leakage is pure quantization)."""
    for k in audio.DFT_BINS:
        r = audio.fixed_point_dft_bins(list(audio.TONE_Q11[k]))
        mags = {b: re * re + im * im for b, (re, im) in r.items()}
        peak = max(mags, key=mags.get)
        assert peak == k
        others = max(m for b, m in mags.items() if b != k)
        assert mags[k] > others * 10**6


def test_fixed_point_dft_rejects_wrong_length():
    with pytest.raises(ValueError):
        audio.fixed_point_dft_bins([0] * 31)
