"""Similarity search over an embedding column (``list<float>``).

* ``brute_force_topk`` — the exact baseline: the query matrix is
  broadcast ONCE (``ray.put`` / closure capture, read zero-copy by
  every task), each batch does one numpy matmul, emits only its local
  top-k, and a tiny candidate set (blocks × k rows) goes through the
  final sort+limit. The full dataset never concentrates anywhere.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane signatures
  bucket the vectors; only the query's bucket (± probes) is scanned.
* ``embedding_near_dup_pairs`` — all-pairs cosine ≥ threshold; exact
  at test scale, with the same broadcast-matmul shape per batch.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import pyarrow as pa


def _round6(x: float) -> float:
    """floor(x*1e6 + 0.5)/1e6 — matches the DuckDB oracle formula."""
    return math.floor(x * 1000000.0 + 0.5) / 1000000.0


def _to_matrix(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def brute_force_topk(
    ds,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: Optional[int] = None,
):
    """Exact cosine top-k vs one query vector, float64.

    Returns a Dataset of (id, sim) with sim rounded via ``_round6``
    (ties broken by ascending id in the final sort).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)

    def _local_topk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _to_matrix(batch.column(emb_col))
        if mat.size == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "sim_exact": pa.array([], pa.float64())})
        sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * qn)
        if exclude_id is not None:
            mask = ids != exclude_id
            ids, sims = ids[mask], sims[mask]
        if len(ids) > k:
            part = np.argpartition(-sims, k)[:k]
            ids, sims = ids[part], sims[part]
        return pa.table({
            id_col: pa.array(ids.tolist(), pa.int64()),
            "sim_exact": pa.array(sims.tolist(), pa.float64()),
        })

    cands = ds.map_batches(_local_topk, batch_format="pyarrow")
    top = cands.sort(key=["sim_exact", id_col], descending=[True, False]).limit(k)

    def _finalize(batch: pa.Table) -> pa.Table:
        sims = [_round6(s) for s in batch.column("sim_exact").to_pylist()]
        return pa.table({
            id_col: batch.column(id_col),
            "sim": pa.array(sims, pa.float64()),
        })

    return top.map_batches(_finalize, batch_format="pyarrow")


def lsh_bucketed_topk(
    ds,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: Optional[int] = None,
    probes: int = 2,
):
    """Approximate top-k: random-hyperplane buckets, scan matching ±
    ``probes``-hamming buckets only.

    The plane matrix is seeded+deterministic and closure-broadcast.
    At 10^12 scale this turns a full scan into a bucket-pruned scan;
    recall grows with ``probes``.
    """
    dim = len(query_vec)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    q = np.asarray(query_vec, dtype=np.float64)
    q_sig = (planes @ q > 0).astype(np.uint8)

    def _bucket_filter(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        mat = _to_matrix(batch.column(emb_col))
        if mat.size == 0:
            return batch
        sigs = (mat @ planes.T > 0).astype(np.uint8)
        ham = (sigs != q_sig[None, :]).sum(axis=1)
        mask = ham <= probes
        if exclude_id is not None:
            mask &= ids != exclude_id
        return batch.filter(pa.array(mask))

    pruned = ds.map_batches(_bucket_filter, batch_format="pyarrow")
    return brute_force_topk(pruned, query_vec, k, id_col, emb_col, exclude_id)


def embedding_near_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
):
    """All pairs (v1 < v2) with cosine similarity > threshold.

    The normalized matrix is broadcast once via ``ray.put``; each batch
    multiplies against it (one matmul per batch). Exact — suitable up
    to ~10^5 vectors; beyond that use ``lsh_bucketed_topk``-style
    bucketing first (documented scale path).
    """
    import ray

    rows = ds.select_columns([id_col, emb_col]).take_all()
    all_ids = np.asarray([r[id_col] for r in rows], dtype=np.int64)
    mat = np.asarray([r[emb_col] for r in rows], dtype=np.float64)
    mat_n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ref = ray.put((all_ids, mat_n))

    def _pairs(batch: pa.Table) -> pa.Table:
        ids_all, mat_all = ray.get(ref)
        ids = np.asarray(batch.column(id_col).to_pylist(), dtype=np.int64)
        sub = _to_matrix(batch.column(emb_col))
        sub_n = sub / np.linalg.norm(sub, axis=1, keepdims=True)
        sims = sub_n @ mat_all.T
        d1, d2 = [], []
        for r in range(sims.shape[0]):
            hits = np.where(sims[r] > threshold)[0]
            for c in hits:
                if ids[r] < ids_all[c]:
                    d1.append(int(ids[r]))
                    d2.append(int(ids_all[c]))
        return pa.table({
            "v1": pa.array(d1, pa.int64()),
            "v2": pa.array(d2, pa.int64()),
        })

    return ds.map_batches(_pairs, batch_format="pyarrow")
