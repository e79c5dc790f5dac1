"""Model-shaped text encoder (the q143 RAG drop-in point, exercised).

``mlp_encode`` turns a string column into a fixed-dimension float
embedding with a real neural-network dataflow shape: hashed char-bigram
bag-of-features -> 2-layer tanh MLP -> L2 normalize, all as numpy
matmuls inside an Arrow-batched pandas UDF. The weights are generated
from a seeded PCG64 stream at worker import, so the encoder is
deterministic across runs and executors without shipping a weight file.

This is NOT a trained model -- it is the stand-in that proves the
engineering claims a real encoder needs from the engine:

- the Python stage is confined to computing the embedding column (one
  ArrowEvalPython node; everything before and after stays JVM-side --
  plan-pinned in tests/test_plan_shapes.py),
- per-batch cost is two dense matmuls (the transformer-encoder shape),
  so Arrow batch size, not Python call overhead, governs throughput,
- the output column type (array<double>) feeds the same IVF-cell /
  cosine-top-k plan as the hash-embedding tier (queries/llm.py
  rag_retrieve).

Swapping in a real model on a cluster = replacing ``_forward`` with a
framework call inside the same pandas UDF; nothing else changes.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

VOCAB = 256  # hashed char-bigram feature buckets
HIDDEN = 64
SEED = 0x5EED


def _weights(dim: int):
    """Deterministic MLP weights (seeded, regenerated per worker)."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(SEED + dim))
    w1 = rng.standard_normal((VOCAB, HIDDEN)) / np.sqrt(VOCAB)
    b1 = rng.standard_normal(HIDDEN) * 0.1
    w2 = rng.standard_normal((HIDDEN, dim)) / np.sqrt(HIDDEN)
    return w1, b1, w2


def _features(texts, vocab: int):
    """Batch of strings -> (n, vocab) hashed char-bigram counts."""
    import numpy as np

    x = np.zeros((len(texts), vocab))
    for i, s in enumerate(texts):
        b = np.frombuffer(str(s).encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < 2:
            continue
        codes = (b[:-1].astype(np.int64) * 31 + b[1:]) % vocab
        x[i] = np.bincount(codes, minlength=vocab)
    return x


def mlp_encode_udf(dim: int = 8) -> Column:
    """Pandas UDF column: text -> L2-normalized ``array<double>`` of
    length ``dim`` via the seeded 2-layer MLP."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<double>")
    def encode(texts: pd.Series) -> pd.Series:
        import numpy as np

        w1, b1, w2 = _weights(dim)
        x = _features(texts.tolist(), VOCAB)
        h = np.tanh(x @ w1 + b1)
        e = h @ w2
        nrm = np.linalg.norm(e, axis=1, keepdims=True)
        e = e / np.where(nrm == 0, 1.0, nrm)
        return pd.Series(list(e))

    return encode


def mlp_encode(df, text_col: str = "chunk", out_col: str = "e", dim: int = 8):
    """Attach the MLP embedding of ``text_col`` as ``out_col`` and drop
    the text (the downstream plan shuffles embeddings, never strings)."""
    return df.withColumn(out_col, mlp_encode_udf(dim)(F.col(text_col))).drop(
        text_col
    )
