"""Embedding inference as an Arrow-batched pandas UDF (reference ML4,
``scrappy.py:498-499``: driver-side SentenceTransformer encode).

Engine shape: the encoder is pluggable. ``make_embed_udf(encoder_factory)``
returns a pandas UDF whose worker-side state is constructed ONCE per
executor python process (lazy init inside the iterator), the distributed
equivalent of broadcasting the model; Arrow moves batches, and
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds peak memory.

The default encoder is a deterministic hash-based stub (sentence
transformers are not available in this container — SURVEY.md ML5 note):
each token contributes a unit pseudo-random vector seeded by the md5 of
the token, the document vector is the L2-normalized token sum. It is a
real bag-of-words random-projection embedding: deterministic,
vocabulary-free, and good enough for clustering tests; swap the factory
for a sentence-transformers encoder in deployment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.pandas.functions import pandas_udf

EncoderFactory = Callable[[], Callable[[list[str]], np.ndarray]]

DEFAULT_DIM = 64


def _token_vec(token: str, dim: int) -> np.ndarray:
    seed = int.from_bytes(hashlib.md5(token.encode()).digest()[:4], "big")
    rng = np.random.RandomState(seed)
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def hash_encoder_factory(dim: int = DEFAULT_DIM) -> EncoderFactory:
    def factory() -> Callable[[list[str]], np.ndarray]:
        cache: dict[str, np.ndarray] = {}

        def encode(texts: list[str]) -> np.ndarray:
            out = np.zeros((len(texts), dim))
            for i, text in enumerate(texts):
                toks = [t for t in "".join(
                    c if c.isalnum() else " " for c in text.lower()
                ).split() if t]
                for t in toks:
                    if t not in cache:
                        cache[t] = _token_vec(t, dim)
                    out[i] += cache[t]
                n = np.linalg.norm(out[i])
                if n > 0:
                    out[i] /= n
            return out

        return encode

    return factory


def make_embed_udf(encoder_factory: EncoderFactory | None = None, dim: int = DEFAULT_DIM):
    """Iterator-of-series pandas UDF: init the encoder once per worker,
    then encode Arrow batch by Arrow batch."""
    factory = encoder_factory or hash_encoder_factory(dim)

    @pandas_udf(T.ArrayType(T.FloatType()))
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encode = factory()  # once per python worker
        for s in batches:
            vecs = encode(s.fillna("").tolist())
            yield pd.Series([v.astype(np.float32).tolist() for v in vecs])

    return embed


def embed_texts(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    encoder_factory: EncoderFactory | None = None,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    return df.withColumn(out_col, make_embed_udf(encoder_factory, dim)(F.col(text_col)))
