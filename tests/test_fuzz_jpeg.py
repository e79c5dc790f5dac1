"""Property-based fuzz for the vendored JPEG codec (operators/jpeg.py).

Invariants, for arbitrary image content, sizes (including non-8-multiple
edges that exercise padding), and channel counts:

1. quality=100 (all-ones quant tables) bounds the roundtrip error by 1
   per sample -- the only loss is float FDCT/IDCT rounding;
2. encode and decode are both bit-deterministic;
3. dimensions and channel count survive the roundtrip exactly;
4. any quality in 1..100 still roundtrips without structural error
   (finite output of the declared shape) -- the entropy coder, restart
   logic, and EOB/ZRL paths must never corrupt the bitstream.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iot_data_pipeline_spark.operators import jpeg


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_quality100_roundtrip_error_bounded(w, h, ch, seed):
    rnd = np.random.RandomState(seed)
    pix = rnd.randint(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    blob = jpeg.encode_jpeg(w, h, ch, pix, quality=100)
    assert blob == jpeg.encode_jpeg(w, h, ch, pix, quality=100)
    rw, rh, rch, out = jpeg.decode_jpeg(blob)
    assert (rw, rh, rch) == (w, h, ch)
    assert bytes(out) == bytes(jpeg.decode_jpeg(blob)[3])
    got = np.frombuffer(bytes(out), dtype=np.uint8).astype(int)
    want = np.frombuffer(pix, dtype=np.uint8).astype(int)
    if ch == 1:
        # greyscale skips color conversion: only DCT float rounding remains
        assert np.abs(got - want).max() <= 1
    else:
        # RGB additionally passes the documented YCbCr double-rounding
        # (up to ~2.5 through the cr/cb amplification) stacked on the
        # all-ones-quant coefficient rounding (each of 64 coefficients
        # rounds by <= 0.5, which can align constructively in a block);
        # observed worst case across extended fuzz is 4 -- bound at 6
        # so the test pins the mechanism, not one sample's luck
        assert np.abs(got - want).max() <= 6


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    quality=st.integers(min_value=1, max_value=100),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_any_quality_roundtrips_structurally(quality, seed):
    rnd = np.random.RandomState(seed)
    pix = rnd.randint(0, 256, size=16 * 16 * 3, dtype=np.uint8).tobytes()
    blob = jpeg.encode_jpeg(16, 16, 3, pix, quality=quality)
    w, h, ch, out = jpeg.decode_jpeg(blob)
    assert (w, h, ch) == (16, 16, 3)
    assert len(out) == 16 * 16 * 3
