"""Multimodal column plumbing (north-star mandate; SURVEY.md B48).

Design: image/audio/video content is an opaque ``binary`` column plus
typed metadata; every media transform is ``mapInPandas`` over Arrow
batches so bytes never round-trip through Python row objects.

Codec posture (two tiers, both clearly marked):

- ``mode='strict'``: PNG and JPEG payloads -- baseline AND progressive
  (SOF2) since round 5 -- get a REAL decode via the vendored codecs
  (``operators/png.py`` -- zlib inflate, scanline unfiltering;
  ``operators/jpeg.py`` -- Huffman entropy decode incl. progressive
  scan accumulation, dequant, IDCT, chroma upsample, YCbCr->RGB).
  Other payloads raise NotImplementedError: compressed-audio/video
  codecs are not in this container, and the honest posture is to refuse
  rather than fake. On a real cluster that branch is where
  libjpeg-turbo/ffmpeg kernels plug in, same mapInPandas signature.
- ``mode='fake'`` produces a deterministic digest-derived feature vector,
  which keeps the Spark-side contract -- schema, batch shape, partitioning,
  null handling -- real and testable end to end for arbitrary payloads.

Everything around the kernel (schema, chunking, batch iteration) is
production plumbing, not stub.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def with_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach storage metadata computed JVM-side (no Python in the loop):
    byte length, content digest, 1 KiB chunk count."""
    payload = F.col(content_col)
    return df.withColumns(
        {
            "byte_len": F.octet_length(payload).cast("long"),
            "digest": F.sha2(payload, 256),
            "n_chunks": (F.floor(F.octet_length(payload) / 1024) + 1).cast("long"),
        }
    )


def _fake_features(payload: bytes, dim: int) -> list[float]:
    """Deterministic digest-derived pseudo-embedding (test stand-in).

    NOT a real feature extractor -- it exists so the distributed plumbing
    can be asserted (stable across partitionings and batch sizes because
    it depends only on the bytes).
    """
    out: list[float] = []
    counter = 0
    while len(out) < dim:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:dim]


def _decode_image_features(payload: bytes, dim: int) -> list[float]:
    """Shared strict-mode image dispatch: magic-sniff the codec (PNG,
    baseline JPEG, or GIF87a/89a — all vendored, spec-implemented), decode
    to pixels, and reduce to the Rec.601 luma-grid feature vector. GIF's
    palette indices are expanded to RGB before the luma pass (integer-only,
    so features stay bit-identical across platforms)."""
    from iot_data_pipeline_spark.operators import gif, jpeg, png

    if png.is_png(payload):
        w, h, ch, pixels = png.decode_png(payload)
        return png.luma_grid_features(w, h, ch, pixels, dim)
    if jpeg.is_jpeg(payload):
        w, h, ch, pixels = jpeg.decode_jpeg(payload)
        return png.luma_grid_features(w, h, ch, pixels, dim)
    if gif.is_gif(payload):
        import numpy as np

        w, h, palette, indices = gif.decode_gif(payload)
        pal = np.asarray(palette, dtype=np.uint8)
        flat = pal[np.frombuffer(bytes(indices), dtype=np.uint8)]
        return png.luma_grid_features(w, h, 3, bytearray(flat.tobytes()), dim)
    raise NotImplementedError(
        "only PNG, JPEG (baseline + progressive), and GIF decode are "
        "vendored in this environment; other codecs (compressed "
        "audio/video) plug into this kernel on a real cluster, or run "
        "with mode='fake' for the deterministic test kernel"
    )


def extract_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = 16,
    mode: str = "strict",
) -> DataFrame:
    """Decode + feature-extract each payload -> ``array<float>`` of ``dim``.

    ``mapInPandas`` streams Arrow record batches through one Python worker
    per partition -- the media bytes are never pickled row-at-a-time. NULL
    payloads yield NULL features (dirty-data tolerance, same posture as the
    corrupt-record channel).

    mode='strict' really decodes PNG, baseline JPEG, and GIF payloads
    (vendored spec codecs: operators/png.py, jpeg.py, gif.py) and refuses
    anything else; mode='fake' runs the deterministic digest stand-in for
    arbitrary bytes; mode='tolerant' decodes like strict but routes
    failures instead of failing the job -- bad payloads yield NULL
    features plus the error CLASS NAME in a ``decode_error`` column (the
    media twin of the corrupt-record dead-letter channel, reference
    `app/app.py:60-66`; class name, not message text, so the column is
    deterministic and oracle-checkable).
    """
    if mode not in ("strict", "fake", "tolerant"):
        raise ValueError(f"mode must be strict|fake|tolerant, got {mode!r}")

    def kernel(payload: bytes) -> list[float]:
        if mode == "fake":
            return _fake_features(payload, dim)
        return _decode_image_features(payload, dim)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            errs = []
            for payload in pdf[content_col]:
                if payload is None:
                    feats.append(None)
                    errs.append(None)
                    continue
                if mode != "tolerant":
                    feats.append(kernel(bytes(payload)))
                    errs.append(None)
                    continue
                try:
                    feats.append(kernel(bytes(payload)))
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 -- routed, not raised
                    feats.append(None)
                    errs.append(type(exc).__name__)
            out = {id_col: pdf[id_col], "features": feats}
            if mode == "tolerant":
                out["decode_error"] = errs
            yield pd.DataFrame(out)

    fields = [
        next(f for f in df.schema.fields if f.name == id_col),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
    if mode == "tolerant":
        fields.append(T.StructField("decode_error", T.StringType()))
    out_schema = T.StructType(fields)
    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    content_col: str = "content",
    id_col: str = "media_id",
    mode: str = "strict",
) -> DataFrame:
    """Resize each image payload to ``width``x``height`` -> new binary column.

    Same two-mode contract as :func:`extract_features`: the Spark-side
    plumbing (Arrow batches via ``mapInPandas``, NULL pass-through, binary
    out-schema) is real. mode='strict' decodes PNG payloads with the
    vendored codec, nearest-neighbor resamples to (width, height), and
    re-encodes PNG (byte-deterministic); non-PNG raises. mode='fake' emits
    a deterministic digest of (payload, w, h) truncated to w*h//64 bytes
    so output size scales with the requested dimensions and tests can
    assert the full pipeline shape on arbitrary bytes.
    """
    if mode not in ("strict", "fake"):
        raise ValueError(f"mode must be strict|fake, got {mode!r}")

    def kernel(payload: bytes) -> bytes:
        if mode == "strict":
            from iot_data_pipeline_spark.operators import gif, jpeg, png

            if png.is_png(payload):
                w, h, ch, pixels = png.decode_png(payload)
            elif jpeg.is_jpeg(payload):
                # JPEG in, PNG out: re-encoding lossy JPEG would degrade
                # again, so resized media normalizes to lossless PNG.
                w, h, ch, pixels = jpeg.decode_jpeg(payload)
            elif gif.is_gif(payload):
                # GIF in, PNG out: palette expanded to RGB truecolor
                # (resampling palette indices would invent colors).
                import numpy as np

                w, h, palette, indices = gif.decode_gif(payload)
                pal = np.asarray(palette, dtype=np.uint8)
                pixels = bytearray(
                    pal[np.frombuffer(bytes(indices), dtype=np.uint8)].tobytes()
                )
                ch = 3
            else:
                raise NotImplementedError(
                    "only PNG, JPEG (baseline + progressive), and GIF "
                    "resize are vendored in this environment; run with "
                    "mode='fake' for the deterministic test kernel"
                )
            return png.encode_png(
                width, height, ch, png.resize_nearest(w, h, ch, pixels, width, height)
            )
        out_len = max(width * height // 64, 1)
        seed = payload + width.to_bytes(2, "big") + height.to_bytes(2, "big")
        buf = b""
        counter = 0
        while len(buf) < out_len:
            buf += hashlib.sha256(seed + counter.to_bytes(4, "big")).digest()
            counter += 1
        return buf[:out_len]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            resized = [
                None if payload is None else kernel(bytes(payload))
                for payload in pdf[content_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "resized": resized})

    out_schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("resized", T.BinaryType()),
        ]
    )
    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    content_col: str = "content",
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame-sampling *plan* for video payloads: one output row per sampled
    timestamp (real), frame decode stubbed (strict-only).

    The timestamp fan-out runs JVM-side via ``sequence`` + ``explode`` --
    at scale the expensive part is the decode kernel, and this keeps
    everything around it in codegen.
    """
    ts = F.explode(
        F.sequence(F.lit(0), F.greatest(F.col(duration_col) - 1, F.lit(0)), F.lit(every_ms))
    ).alias("frame_ts_ms")
    frames = df.select(id_col, duration_col, content_col).select(
        id_col, ts, F.col(content_col)
    )

    def decode(batches: Iterator) -> Iterator:
        raise NotImplementedError(
            "frame decode requires video codecs not present in this environment"
        )

    # The decode stage is deliberately NOT attached here: callers get the
    # sampled-frame plan (id, frame_ts_ms, content) and attach a decode
    # kernel via mapInPandas when codecs exist. `decode` documents the
    # expected shape.
    del decode
    return frames


def extract_features_arrow(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = 16,
    mode: str = "strict",
) -> DataFrame:
    """Arrow-native twin of :func:`extract_features` via ``mapInArrow``:
    the kernel receives raw ``pyarrow.RecordBatch``es, so payload bytes
    skip the pandas object-column materialization entirely -- for
    binary-heavy media batches this removes one full copy per batch
    versus ``mapInPandas``. Same contract: NULL payload -> NULL features,
    strict mode decodes PNG/baseline-JPEG/GIF for real and refuses other
    codecs.
    """
    if mode not in ("strict", "fake"):
        raise ValueError(f"mode must be strict|fake, got {mode!r}")

    id_field = next(f for f in df.schema.fields if f.name == id_col)
    out_schema = T.StructType(
        [id_field, T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def kernel(payload: bytes) -> list[float]:
        if mode == "fake":
            return _fake_features(payload, dim)
        return _decode_image_features(payload, dim)

    def run(batches):
        import pyarrow as pa

        for batch in batches:
            content = batch.column(batch.schema.get_field_index(content_col))
            feats = [
                None if v is None else kernel(v)
                for v in content.to_pylist()
            ]
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index(id_col)),
                    pa.array(feats, type=pa.list_(pa.float32())),
                ],
                names=[id_col, "features"],
            )

    return df.select(id_col, content_col).mapInArrow(run, schema=out_schema)


def extract_audio_features(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
    dim: int = 8,
    mode: str = "strict",
) -> DataFrame:
    """Audio twin of :func:`extract_features`: decode each payload and
    emit ``features: array<float>`` (mean |amplitude| per time cell) plus
    ``zero_crossings: long``. mode='strict' really decodes RIFF/WAVE PCM
    via the vendored stdlib codec (operators/audio.py); compressed
    formats raise. mode='fake' reuses the digest kernel with a
    bytes-derived crossing count so plumbing stays testable on arbitrary
    payloads.
    """
    if mode not in ("strict", "fake"):
        raise ValueError(f"mode must be strict|fake, got {mode!r}")

    def kernel(payload: bytes):
        if mode == "fake":
            return _fake_features(payload, dim), len(payload) % 997
        from iot_data_pipeline_spark.operators import audio, flac

        if audio.is_wav(payload):
            rate, channels, bps, samples = audio.decode_wav_ex(payload)
        elif flac.is_flac(payload):
            # REAL compressed-audio decode (round 5): rice-coded
            # prediction residuals -> the same PCM feature path as WAV
            rate, channels, bps, samples = flac.decode_flac_ex(payload)
        else:
            raise NotImplementedError(
                "only RIFF/WAVE PCM and FLAC decode are vendored in this "
                "environment; lossy codecs (MP3/AAC/Opus) plug an ffmpeg "
                "kernel into this same signature on a real cluster, or "
                "run with mode='fake'"
            )
        # normalize by the stream's actual full scale -- a 24-bit FLAC
        # (or 8-bit WAV) through the 16-bit constant was silently ~256x
        # (resp. 1/256x) off the [0, 1] feature contract
        return (
            audio.amplitude_grid_features(
                samples, channels, dim, full_scale=float(1 << (bps - 1))
            ),
            audio.zero_crossings(samples, channels),
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats, zcs = [], []
            for payload in pdf[content_col]:
                if payload is None:
                    feats.append(None)
                    zcs.append(None)
                else:
                    f, z = kernel(bytes(payload))
                    feats.append(f)
                    zcs.append(z)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": feats, "zero_crossings": zcs}
            )

    out_schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("features", T.ArrayType(T.FloatType())),
            T.StructField("zero_crossings", T.LongType()),
        ]
    )
    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 1,
    content_col: str = "content",
    id_col: str = "media_id",
    mode: str = "strict",
) -> DataFrame:
    """REAL video frame sampling: decode each payload as a YUV4MPEG2 clip
    (vendored container codec, operators/y4m.py), keep every
    ``every_n``-th frame, and emit one row per sampled frame with its
    Rec.601-luma mean -- ``(id, frame_idx, n_frames, mean_luma)``.

    This supersedes :func:`sample_frames`' timestamp-only plan:
    container parse, frame decode and per-frame statistics all execute
    for real inside the Arrow-batched kernel -- YUV4MPEG2 plane slicing
    for the uncompressed tier, and (round 5) MJPEG-AVI with every frame
    JPEG-decoded through operators/jpeg.py for the compressed tier.
    Interframe codecs (H.264/VP9/AV1) still raise NotImplementedError --
    on a real cluster an ffmpeg/pyav kernel drops into this exact
    mapInPandas signature. mode='fake' keeps plumbing testable on
    arbitrary payloads (deterministic bytes-derived pseudo-frames).

    Scale notes: payload bytes never leave the executor; the fan-out from
    clip to frames happens inside the kernel so one input row yields
    len(frames)/every_n output rows without a JVM-side explode of the
    binary column (which would copy the payload per frame).
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")
    if mode not in ("strict", "fake"):
        raise ValueError(f"mode must be strict|fake, got {mode!r}")

    def kernel(payload: bytes) -> list[tuple[int, int, float]]:
        if mode == "fake":
            n = max(1, payload[0] if payload else 1)
            return [
                (k, n, float(payload[k % max(1, len(payload))]) if payload else 0.0)
                for k in range(0, n, every_n)
            ]
        from iot_data_pipeline_spark.operators import mjpeg, y4m

        if payload.startswith(b"YUV4MPEG2 "):
            clip = y4m.decode_y4m(payload)
            return [
                (k, clip.n_frames, y4m.mean_luma(clip.frames[k]))
                for k in range(0, clip.n_frames, every_n)
            ]
        if mjpeg.is_avi(payload):
            # REAL compressed video (round 5): MJPEG frames decode
            # through the vendored T.81 codec, same sampling contract
            mclip = mjpeg.decode_mjpeg_avi(payload)
            return [
                (k, mclip.n_frames, mjpeg.mean_luma_rgb(mclip.frames[k]))
                for k in range(0, mclip.n_frames, every_n)
            ]
        raise NotImplementedError(
            "only YUV4MPEG2 (uncompressed) and MJPEG-AVI video decode "
            "are vendored in this environment; interframe codecs "
            "(H.264/VP9/AV1) plug an ffmpeg kernel into this same "
            "signature on a real cluster, or run with mode='fake'"
        )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, counts, lumas = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                if payload is None:
                    continue
                for k, n, lum in kernel(bytes(payload)):
                    ids.append(mid)
                    idxs.append(k)
                    counts.append(n)
                    lumas.append(lum)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_frames": pd.Series(counts, dtype="int64"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    out_schema = T.StructType(
        [
            next(f for f in df.schema.fields if f.name == id_col),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("n_frames", T.LongType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )
    return df.select(id_col, content_col).mapInPandas(run, schema=out_schema)
