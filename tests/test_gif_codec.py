"""Vendored GIF codec (operators/gif.py): variable-width LZW + block
stream parsing, and its routing through the strict-mode media kernel
(B48's compressed-image modality)."""

from __future__ import annotations

import random

import pytest

from iot_data_pipeline_spark.operators import gif


def _roundtrip(w, h, npal, seed):
    rnd = random.Random(seed)
    pal = [
        (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
        for _ in range(npal)
    ]
    idx = bytes(rnd.randrange(npal) for _ in range(w * h))
    blob = gif.encode_gif(w, h, pal, idx)
    assert gif.is_gif(blob)
    dw, dh, dpal, didx = gif.decode_gif(blob)
    assert (dw, dh) == (w, h)
    assert dpal[:npal] == pal
    assert bytes(didx) == idx


@pytest.mark.parametrize("npal", [2, 3, 4, 7, 16, 100, 256])
def test_gif_roundtrip_palette_sizes(npal):
    _roundtrip(13, 7, npal, seed=npal)  # odd sizes catch stride bugs


def test_gif_roundtrip_fuzz_width_boundaries():
    """Random images sized so the LZW dictionary crosses every code-width
    bump (the off-by-one that variable-width codecs classically get wrong)."""
    rnd = random.Random(42)
    for trial in range(60):
        w = rnd.randint(1, 50)
        h = rnd.randint(1, 50)
        _roundtrip(w, h, rnd.choice([2, 4, 8, 64]), seed=1000 + trial)


def test_gif_lzw_dictionary_overflow_clears():
    """A 250x250 random image rolls the dictionary past 4096 codes, forcing
    the mid-stream clear/reset path in both encoder and decoder."""
    rnd = random.Random(9)
    idx = bytes(rnd.randrange(4) for _ in range(250 * 250))
    blob = gif.encode_gif(250, 250, [(i, i, i) for i in range(4)], idx)
    assert bytes(gif.decode_gif(blob)[3]) == idx


def test_gif_lzw_kwkwk_and_runs():
    """Long single-symbol runs exercise the KwKwK (code == next unassigned
    entry) decoder case continuously."""
    idx = bytes([0] * 5000 + [1, 0, 0, 1, 1, 0] * 2000)
    blob = gif.encode_gif(100, 170, [(1, 2, 3), (4, 5, 6)], idx)
    assert bytes(gif.decode_gif(blob)[3]) == idx


def test_gif_compresses_constant_image():
    """LZW is real compression, not byte plumbing: a constant 64x64 image
    must shrink far below 1 byte/pixel."""
    blob = gif.encode_gif(64, 64, [(9, 9, 9), (1, 1, 1)], bytes(64 * 64))
    assert len(blob) < 64 * 64 / 10
    assert bytes(gif.decode_gif(blob)[3]) == bytes(64 * 64)


def test_gif_extension_blocks_skipped():
    """Graphic-control/comment extensions (0x21) before the image descriptor
    are skipped via their sub-block chains, per spec."""
    blob = gif.encode_gif(3, 2, [(0, 0, 0), (255, 255, 255)], bytes([1, 0, 1, 0, 1, 0]))
    # splice a comment extension right after the global color table
    cut = 13 + 3 * (2 << (blob[10] & 0x07))
    ext = b"\x21\xfe\x05hello\x00"
    spliced = blob[:cut] + ext + blob[cut:]
    dw, dh, _, didx = gif.decode_gif(spliced)
    assert (dw, dh) == (3, 2)
    assert bytes(didx) == bytes([1, 0, 1, 0, 1, 0])


def test_gif_interlace_roundtrip():
    """4-pass interlaced GIFs (previously refused, added round 5)
    round-trip exactly: the encoder reorders rows into transmission
    order, the decoder scatters them back."""
    rnd = random.Random(31)
    for trial in range(40):
        n = rnd.randint(2, 16)
        pal = [
            (rnd.randrange(256), rnd.randrange(256), rnd.randrange(256))
            for _ in range(n)
        ]
        w, h = rnd.randint(1, 30), rnd.randint(1, 30)
        idx = bytes(rnd.randrange(n) for _ in range(w * h))
        blob = gif.encode_gif(w, h, pal, idx, interlaced=True)
        # interlace flag actually set in the image descriptor
        cut = 13 + 3 * (2 << (blob[10] & 0x07))
        assert blob[cut] == 0x2C and blob[cut + 9] & 0x40
        dw, dh, dpal, didx = gif.decode_gif(blob)
        assert (dw, dh) == (w, h) and bytes(didx) == idx, trial


def test_gif_truncated_refused():
    blob = gif.encode_gif(8, 8, [(0, 0, 0), (1, 1, 1)], bytes(64))
    with pytest.raises(gif.GifFormatError):
        gif.decode_gif(blob[:10])
    with pytest.raises(gif.GifFormatError):
        gif.decode_gif(b"NOTAGIF" + blob)


def test_strict_kernel_routes_gif():
    """The shared strict-mode dispatch decodes a GIF payload into the same
    luma-grid feature space as PNG/JPEG."""
    from iot_data_pipeline_spark.operators.multimodal import (
        _decode_image_features,
    )
    from iot_data_pipeline_spark.operators import png

    # identical gray image as GIF and PNG must yield identical features
    pal = [(40, 40, 40), (200, 200, 200)]
    idx = bytes((x ^ y) & 1 for y in range(8) for x in range(8))
    gif_blob = gif.encode_gif(8, 8, pal, idx)
    rgb = b"".join(bytes(pal[i]) for i in idx)
    png_blob = png.encode_png(8, 8, 3, rgb)
    assert _decode_image_features(gif_blob, 4) == _decode_image_features(
        png_blob, 4
    )


def test_tolerant_mode_routes_bad_payloads(spark):
    """mode='tolerant': decode failures become NULL features + the error
    class name, never a job failure (the media dead-letter posture)."""
    from iot_data_pipeline_spark.operators import png
    from iot_data_pipeline_spark.operators.multimodal import extract_features

    good = png.encode_png(2, 2, 3, bytes(12))
    rows = [
        (0, bytearray(good)),
        (1, bytearray(b"\x89PNG\r\n\x1a\ngarbage")),  # truncated PNG
        (2, bytearray(b"not media")),  # unknown codec
        (3, None),  # NULL passthrough
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r["media_id"]: r
        for r in extract_features(df, dim=2, mode="tolerant").collect()
    }
    assert out[0]["features"] is not None and out[0]["decode_error"] is None
    assert out[1]["features"] is None
    assert out[1]["decode_error"] == "PngFormatError"
    assert out[2]["features"] is None
    assert out[2]["decode_error"] == "NotImplementedError"
    assert out[3]["features"] is None and out[3]["decode_error"] is None


def test_gif_animation_roundtrip_fuzz():
    """Multi-frame encode/decode: every frame's indices survive, order
    preserved, dictionary state must not bleed across frame boundaries."""
    rnd = random.Random(3)
    for trial in range(40):
        w, h = rnd.randint(1, 24), rnd.randint(1, 24)
        npal = rnd.choice([2, 4, 16])
        pal = [(rnd.randrange(256),) * 3 for _ in range(npal)]
        frames = [
            bytes(rnd.randrange(npal) for _ in range(w * h))
            for _ in range(rnd.randint(1, 6))
        ]
        blob = gif.encode_gif_animation(w, h, pal, frames)
        dw, dh, dpal, dframes = gif.decode_gif_frames(blob)
        assert (dw, dh) == (w, h)
        assert [bytes(f) for f in dframes] == frames, trial


def test_gif_animation_first_frame_via_single_decode():
    """decode_gif (single-frame API) reads an animation's FIRST frame --
    graphic-control and NETSCAPE extension blocks are skipped per spec."""
    blob = gif.encode_gif_animation(
        4, 4, [(0, 0, 0), (9, 9, 9)], [bytes([1] * 16), bytes(16)]
    )
    assert bytes(gif.decode_gif(blob)[3]) == bytes([1] * 16)


def test_gif_animation_partial_region_refused():
    """Frames not covering the logical screen (disposal composition) are a
    documented boundary."""
    import struct

    blob = bytearray(
        gif.encode_gif_animation(4, 4, [(0, 0, 0), (1, 1, 1)], [bytes(16)])
    )
    # image descriptor: after header(13) + GCT + NETSCAPE ext(19) + GCE(8)
    pos = blob.index(b"\x2c")
    ix, iy, iw, ih, fl = struct.unpack("<HHHHB", blob[pos + 1 : pos + 10])
    assert (iw, ih) == (4, 4)
    blob[pos + 5 : pos + 7] = struct.pack("<H", 2)  # shrink frame width
    with pytest.raises(gif.GifFormatError, match="partial-region"):
        gif.decode_gif_frames(bytes(blob))


def test_gif_roundtrip_fuzz_final_code_width_bump():
    """Regression fuzz for the round-4 advisor finding: when the
    decoder's table-append for the FINAL data code lands exactly on its
    width-bump threshold, EOI must be written at the bumped width -- the
    encoder previously emitted it one bit narrow and ~0.4% of random
    small images failed to decode. 2000 draws over the failing
    population (100-700 px, 2-8 colors) reproduced 8-12 failures before
    the fix; zero after."""
    rnd = random.Random(4242)
    for trial in range(2000):
        n = rnd.randint(2, 8)
        npix = rnd.randint(100, 700)
        w = rnd.randint(5, 30)
        h = max(1, npix // w)
        _roundtrip(w, h, n, seed=50_000 + trial)


def test_gif_pixel_index_beyond_palette_refused():
    """A stream whose decoded indices exceed the color table must raise
    GifFormatError (round-4 advisor finding: it previously surfaced as a
    bare numpy IndexError from the feature kernel) -- crafted as a
    2-entry global table with mcs=2 indices up to 3."""
    import struct

    w, h = 4, 4
    lzw = gif.lzw_compress(bytes([0, 1, 2, 3] * 4), 2)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80, 0, 0)
        + bytes([0, 0, 0, 255, 255, 255])
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([2])
        + bytes(blocks)
        + b"\x3b"
    )
    with pytest.raises(gif.GifFormatError, match="palette"):
        gif.decode_gif(payload)


# ---------------------------------------------------------------- raw LZW

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.data(),
)
def test_lzw_roundtrip_property(mcs, data):
    """decompress(compress(x)) == x for arbitrary index streams at every
    minimum code size -- the property the round-4 width-bump bug broke
    on a 0.4% slice of inputs. Lengths span empty through dictionary
    overflow; alphabet is the full [0, 2**mcs) range so code-width bumps
    land at arbitrary stream offsets."""
    n = data.draw(
        st.one_of(
            st.integers(min_value=0, max_value=64),
            st.integers(min_value=400, max_value=900),
            st.just(6000),  # rolls the 4096-entry dictionary -> clear
        )
    )
    idx = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=(1 << mcs) - 1),
                min_size=n,
                max_size=n,
            )
        )
    )
    out = gif.lzw_decompress(gif.lzw_compress(idx, mcs), mcs)
    assert bytes(out) == idx
