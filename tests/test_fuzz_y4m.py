"""Property-based fuzz for the vendored Y4M codec (operators/y4m.py) and
the BPE learn/apply pair (queries/llm.py helpers).

Y4M invariants for arbitrary plane content, geometry, and colorspace:
1. encode -> decode is byte-exact (uncompressed container: lossless);
2. both directions are deterministic;
3. geometry, colorspace, and frame count survive exactly;
4. truncating an encoded payload anywhere inside frame data raises
   Y4mFormatError (never returns partial frames silently).

BPE invariants for arbitrary word lists:
1. applying one learned merge never increases any word's symbol count;
2. removing the separators from a word's representation reproduces the
   word exactly after every round (merges only join, never alter bytes).
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from iot_data_pipeline_spark.operators import y4m


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    w=st.integers(min_value=1, max_value=16).map(lambda x: x * 2),
    h=st.integers(min_value=1, max_value=16).map(lambda x: x * 2),
    nframes=st.integers(min_value=0, max_value=5),
    cs=st.sampled_from(["C444", "C420jpeg", "Cmono"]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_y4m_roundtrip_lossless(w, h, nframes, cs, seed):
    rnd = np.random.RandomState(seed)
    luma, chroma = y4m._plane_sizes(w, h, cs)
    frames = [
        y4m.Y4mFrame(
            rnd.randint(0, 256, luma, dtype=np.uint8).tobytes(),
            rnd.randint(0, 256, chroma, dtype=np.uint8).tobytes() if chroma else None,
            rnd.randint(0, 256, chroma, dtype=np.uint8).tobytes() if chroma else None,
        )
        for _ in range(nframes)
    ]
    blob = y4m.encode_y4m(w, h, frames, cs, (30, 1))
    assert blob == y4m.encode_y4m(w, h, frames, cs, (30, 1))
    clip = y4m.decode_y4m(blob)
    assert (clip.width, clip.height, clip.colorspace) == (w, h, cs)
    assert clip.n_frames == nframes
    for got, want in zip(clip.frames, frames):
        assert got.y == want.y and got.cb == want.cb and got.cr == want.cr


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    cut=st.floats(min_value=0.01, max_value=0.99),
)
def test_y4m_truncation_always_raises(seed, cut):
    rnd = np.random.RandomState(seed)
    frames = [
        y4m.Y4mFrame(rnd.randint(0, 256, 16, dtype=np.uint8).tobytes(), None, None)
        for _ in range(3)
    ]
    blob = y4m.encode_y4m(4, 4, frames, "Cmono", (25, 1))
    header_end = blob.find(b"\n") + 1
    frame_bytes = len("FRAME\n") + 16
    # cut somewhere strictly inside the frame section
    pos = header_end + 1 + int(cut * (len(blob) - header_end - 2))
    if (pos - header_end) % frame_bytes == 0:
        # a cut at an exact frame boundary IS a valid shorter stream --
        # Y4M carries no frame count, so it must decode, with fewer frames
        assert y4m.decode_y4m(blob[:pos]).n_frames < 3
    else:
        with pytest.raises(y4m.Y4mFormatError):
            y4m.decode_y4m(blob[:pos])


_WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=8),
    min_size=1,
    max_size=12,
)


@pytest.fixture(scope="module")
def bpe_frame(spark):
    def build(words):
        from pyspark.sql import functions as F

        from iot_data_pipeline_spark.queries.llm import _bpe_merge_round, _bpe_rep0

        df = (
            spark.createDataFrame([(w,) for w in words], "word string")
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select("word", "cnt", _bpe_rep0().alias("rep"))
        )
        _, merged = _bpe_merge_round(df)
        return {r["word"]: r["rep"] for r in merged.collect()}

    return build


@settings(
    max_examples=10,  # each example runs Spark jobs; keep the budget tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(words=_WORDS)
def test_bpe_merge_preserves_bytes_and_shrinks(words, bpe_frame):
    reps = bpe_frame(words)
    assert set(reps) == set(words)
    for word, rep in reps.items():
        # separators removed == original word: merges never alter content
        assert rep.replace(" ", "") == word
        # one merge round never increases the symbol count
        assert len(rep.split(" ")) <= len(word)
