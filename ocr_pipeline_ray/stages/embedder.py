"""Actor-pool embedding INFERENCE stage — the learned-model shape.

The engine's other embedders are model-free (``textstats.hash_embed``
is the hashing trick, row-local). A real curation pipeline embeds
with a LEARNED model: weights load once per worker, batches stream
through a vectorized forward pass. This module demonstrates that
exact Ray Data shape — a callable CLASS passed to ``map_batches``
with ``concurrency=(min, max)`` so each actor pays model load ONCE
in ``__init__`` and every ``__call__`` is one batched matmul — with
a pluggable ``model_loader`` so a real checkpoint (a GPU sentence
encoder, an ONNX session) drops in without touching the plumbing.
Cf. the reference's per-document chained-step architecture
(``/root/reference/ocr_pipeline.py`` StepTesseract holds its config
per step instance); here the stateful stage is an actor pool and the
batch is the unit of work.

The in-repo stub model is a deterministic INTEGER linear projection
(``LinearStubModel``): features are the hashing-trick signed counts
(``textstats._hash_embed_matrix``, md5-based — SQL-reproducible) and
the weight matrix is generated cell-wise by a Knuth multiplicative
hash, so the whole forward pass has a bit-exact DuckDB twin
(``queries/_similarity.py`` ``embed_infer``) — the oracle gate covers
the distributed plumbing, not a float approximation of it.

Scale shape: zero shuffles (row-local forward), weights per ACTOR
not per batch, output is a fixed-dim vector column that feeds the
existing ANN stack (``stages/similarity.py``) unchanged.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import pyarrow as pa

_KNUTH = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)


class LinearStubModel:
    """Deterministic integer linear projection ``dim_in -> dim_out``.

    ``W[i, j] = ((i * dim_out + j) * 2654435761) % 2**32 % 7 - 3``
    — small signed integers in [-3, 3], reproducible cell-by-cell in
    ANSI SQL (all operands positive, so ``%`` agrees between Python,
    numpy and DuckDB). ``forward`` is one int64 matmul; with integer
    features the result is exact (no summation-order sensitivity),
    which is what makes the stage oracle-checkable.
    """

    def __init__(self, dim_in: int = 64, dim_out: int = 16):
        self.dim_in = dim_in
        self.dim_out = dim_out
        idx = np.arange(dim_in * dim_out, dtype=np.uint64)
        self.weights = (
            (idx * np.uint64(_KNUTH)) % np.uint64(2 ** 32)
            % np.uint64(7)
        ).astype(np.int64).reshape(dim_in, dim_out) - 3

    def forward(self, feats: np.ndarray) -> np.ndarray:
        """(n, dim_in) int64 -> (n, dim_out) int64."""
        return feats.astype(np.int64) @ self.weights


class EmbeddingInference:
    """map_batches actor: text batch -> fixed-dim embedding column.

    ``model_loader`` runs ONCE per actor in ``__init__`` (the
    checkpoint read / session build of a real model); ``__call__``
    featurizes the batch with the hashing trick and runs one batched
    forward. Output schema: ``(id_col, embedding list<int64>)``.
    NULL text embeds the zero feature vector (model applied — a
    learned model's bias would make that nonzero; the stub's linear
    map keeps it zero).
    """

    def __init__(self, model_loader: Optional[Callable] = None,
                 id_col: str = "doc_id", text_col: str = "text"):
        loader = model_loader if model_loader is not None \
            else LinearStubModel
        self.model = loader()          # ONCE per actor
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .textstats import _hash_embed_matrix

        feats = _hash_embed_matrix(
            batch.column(self.text_col), self.model.dim_in)
        emb = self.model.forward(feats)
        n, dim = emb.shape
        offsets = pa.array(
            (np.arange(n + 1, dtype=np.int32) * dim).astype(np.int32),
            pa.int32())
        col = pa.ListArray.from_arrays(
            offsets, pa.array(emb.ravel(), pa.int64()))
        return pa.table({self.id_col: batch.column(self.id_col),
                         "embedding": col})


def embedding_inference_stage(ds, model_loader: Optional[Callable] = None,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              batch_size: int = 256,
                              concurrency=(1, 8)):
    """Wire :class:`EmbeddingInference` as an actor-pool stage.

    ``batch_size`` trades actor-call overhead against peak heap
    (batch x dim_out x pool must fit the worker); ``concurrency``
    is ``(min, max)`` so few-CPU sessions can't livelock the pool
    against read tasks.
    """
    return ds.map_batches(
        EmbeddingInference,
        fn_constructor_kwargs={
            "model_loader": model_loader,
            "id_col": id_col,
            "text_col": text_col,
        },
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
