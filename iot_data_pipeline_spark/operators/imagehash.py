"""Perceptual image hashing for multimodal dedup (B48 x B45).

dHash (difference hash, the public perceptual-hash family used for
image near-dup): decode -> integer Rec.601 luma plane -> nearest-neighbor
resample to 9x8 -> one bit per horizontal neighbor pair (left < right) ->
64-bit signed hash. Identical-looking images (recompressions, resizes)
collide; the hash is a fixed-width key an exact dedup groupBy or a
hamming-banded near-dup join can shuffle instead of pixels.

Runs on the REAL vendored codecs (PNG via operators/png.py, baseline JPEG
via operators/jpeg.py) inside a mapInPandas kernel -- the same
binary-column plumbing as the other media operators. At 100 TB the
shuffle carries 8-byte hashes, never images; near-dup at hamming
distance d uses the standard pigeonhole banding (split the 64 bits into
d+1 bands; any pair within distance d shares at least one exact band) --
the same equi-join shape as MinHash LSH (operators/dedup.py).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

DHASH_W, DHASH_H = 9, 8


def dhash_bytes(payload: bytes) -> int:
    """payload (PNG or baseline JPEG) -> signed 64-bit dHash."""
    from iot_data_pipeline_spark.operators import jpeg, png

    if png.is_png(payload):
        w, h, ch, pixels = png.decode_png(payload)
    elif jpeg.is_jpeg(payload):
        w, h, ch, pixels = jpeg.decode_jpeg(payload)
    else:
        raise NotImplementedError(
            "only PNG and baseline JPEG decode are vendored in this "
            "environment; other codecs plug into this kernel on a real "
            "cluster"
        )
    if ch >= 3:
        luma = bytearray(w * h)
        for i in range(w * h):
            p = i * ch
            luma[i] = (
                299 * pixels[p] + 587 * pixels[p + 1] + 114 * pixels[p + 2]
            ) // 1000
    else:
        # greyscale or grey+alpha: channel 0 is the luma
        luma = bytearray(pixels[i * ch] for i in range(w * h))
    small = png.resize_nearest(w, h, 1, luma, DHASH_W, DHASH_H)
    h64 = 0
    for r in range(DHASH_H):
        row = r * DHASH_W
        for c in range(DHASH_W - 1):
            h64 = (h64 << 1) | (1 if small[row + c] < small[row + c + 1] else 0)
    return h64 - (1 << 64) if h64 >= (1 << 63) else h64


def dhash_images(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """(id, content) -> (id, dhash): the dedup key column for media rows.
    NULL payload -> NULL hash (same NULL contract as extract_features)."""
    id_field = next(f for f in df.schema.fields if f.name == id_col)
    out_schema = T.StructType([id_field, T.StructField("dhash", T.LongType())])

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            hashes = [
                None if payload is None else dhash_bytes(bytes(payload))
                for payload in pdf[content_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": hashes})

    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)
