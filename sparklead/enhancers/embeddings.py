"""Message-embedding enhancer: the BERT lane, with the model call stubbed.

Reference (/root/reference/loglead/parsers/bert/bertembedding.py:10-82,
enhancers/eventlog.py:374-390): batched (1000) transformer inference,
mean-pooled last hidden state, 768-d vectors into ``e_bert_emb``.

Transformer weights are not in this container, so the MODEL is a
deterministic fake (hash-seeded pseudo-embedding); everything Spark-side is
the real production pattern: iterator-of-series pandas UDF so per-task model
init happens ONCE (not per batch), Arrow batching, fixed-width
array<float> output. Swap ``_StubEncoder`` for a sentence-transformers /
TF call and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMB_DIM = 32  # reference uses 768; smaller keeps test IO sane


class _StubEncoder:
    """STUB for the transformer: deterministic unit-norm vector per text.

    Production: load the model here (once per executor task) and call
    ``model.encode(batch)``.
    """

    def __init__(self, dim: int = EMB_DIM):
        self.dim = dim

    def encode(self, texts: pd.Series) -> list[list[float] | None]:
        out: list[list[float] | None] = []
        for t in texts:
            if t is None or (isinstance(t, float) and pd.isna(t)):
                out.append(None)  # null message -> null embedding
                continue
            # seed from md5, NOT Python hash(): str hashing is
            # PYTHONHASHSEED-salted, so hash(t) is only stable within one
            # process — md5 makes the fake deterministic across executors/runs
            seed = int.from_bytes(hashlib.md5(str(t).encode()).digest()[:4], "little")
            rng = np.random.default_rng(seed)
            v = rng.standard_normal(self.dim).astype(np.float32)
            out.append((v / np.linalg.norm(v)).tolist())
        return out


def bert_embeddings(df: DataFrame, column: str = "e_message_normalized", out_col: str = "e_bert_emb") -> DataFrame:
    """Add ``e_bert_emb`` via an iterator pandas UDF (model init once/task)."""

    @F.pandas_udf("array<float>")
    def embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        encoder = _StubEncoder()  # once per task, like loading the real model
        for batch in batches:
            yield pd.Series(encoder.encode(batch))

    return df.withColumn(out_col, embed(F.col(column)))
