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
