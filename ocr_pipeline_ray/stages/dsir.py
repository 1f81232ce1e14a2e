"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169): score every raw document by how
much its hashed-n-gram profile looks like a TARGET distribution
(e.g. curated/wiki-like text) versus the RAW corpus distribution.
Docs are then kept with probability ∝ exp(score) — the standard
pretraining-data curation move when a small high-quality target
corpus should steer selection over a 100-TB crawl.

Engine shape (two streaming passes, NO wide shuffle):

1. **Count pass** — every batch tokenizes vectorized
   (`textstats._token_lists`), hashes each DISTINCT token once
   (md5[:8] → feature bucket, the DuckDB-reproducible hash), and
   reduces to two fixed-size ``dim``-bucket count vectors (raw +
   target) via ``np.bincount``. Partials are ``dim × blocks`` tiny
   rows; the driver folds them (same contract as
   ``stages/profile.profile_table``). At 100 TB this is a scan that
   emits KBs per block.
2. **Weight table** — ``w[b] = floor((ln(p_target(b)) −
   ln(p_raw(b))) · 1e6 + 0.5)`` with add-one smoothing, as int64
   micro-nats: per-doc sums of int64 are ORDER-FREE, so the DuckDB
   twin is bit-exact (float log-ratios summed in shuffle order would
   drift in the last ulp). The table is ``dim`` scalars — broadcast
   by closure capture.
3. **Score pass** — per batch, per-doc score = Σ w[bucket(token)]
   over the doc's tokens (one ``np.bincount`` by doc index with
   int-valued weights; exact below 2^53 per doc).

Reference analogue: the per-doc quality scoring contract of
StepEstimateOCR (`/root/reference/lib/ocr_step.py:397-412`) — a
corpus-level model applied per document; DSIR replaces the lexicon
with a target-vs-raw likelihood ratio.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_of_tokens(flat: pa.Array, dim: int) -> np.ndarray:
    """md5-bucket per token instance: hash each DISTINCT token once
    (dictionary-encode first), then gather per instance."""
    enc = pc.dictionary_encode(flat)
    toks = enc.dictionary.to_pylist()
    dict_buckets = np.fromiter(
        (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % dim
         for t in toks),
        dtype=np.int64, count=len(toks),
    )
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return dict_buckets[codes]


def hashed_ngram_counts(ds, text_col: str, target_col: str,
                        dim: int = 256):
    """Pass 1: fold per-block ``(raw, target)`` hashed-unigram bucket
    counts into two length-``dim`` int64 vectors on the driver."""
    from .textstats import _token_lists

    def _partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column(text_col)))
        if b.num_rows == 0:
            z = np.zeros(dim, dtype=np.int64)
            return pa.table({"bucket": pa.array(np.arange(dim)),
                             "n_raw": pa.array(z), "n_tgt": pa.array(z)})
        flat, offsets, n_tokens = _token_lists(b, text_col)
        buckets = _bucket_of_tokens(flat, dim)
        is_tgt = b.column(target_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(bool)
        tok_tgt = np.repeat(is_tgt, n_tokens)
        n_raw = np.bincount(buckets, minlength=dim).astype(np.int64)
        n_tgt = np.bincount(buckets[tok_tgt],
                            minlength=dim).astype(np.int64)
        return pa.table({
            "bucket": pa.array(np.arange(dim, dtype=np.int64)),
            "n_raw": pa.array(n_raw), "n_tgt": pa.array(n_tgt),
        })

    raw = np.zeros(dim, dtype=np.int64)
    tgt = np.zeros(dim, dtype=np.int64)
    parts = ds.select_columns([text_col, target_col]).map_batches(
        _partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow", batch_size=None):
        idx = b.column("bucket").to_numpy(zero_copy_only=False)
        np.add.at(raw, idx, b.column("n_raw").to_numpy(
            zero_copy_only=False))
        np.add.at(tgt, idx, b.column("n_tgt").to_numpy(
            zero_copy_only=False))
    return raw, tgt


def dsir_weight_table(n_raw: np.ndarray, n_tgt: np.ndarray) -> np.ndarray:
    """Smoothed log-likelihood-ratio per bucket as int64 micro-nats:
    ``floor((ln((n_tgt+1)/(tot_tgt+dim)) − ln((n_raw+1)/(tot_raw+dim)))
    · 1e6 + 0.5)`` — the exact formula the SQL twin evaluates."""
    dim = len(n_raw)
    tot_raw = int(n_raw.sum()) + dim
    tot_tgt = int(n_tgt.sum()) + dim
    w = np.empty(dim, dtype=np.int64)
    for b in range(dim):
        lr = (math.log((int(n_tgt[b]) + 1) / tot_tgt)
              - math.log((int(n_raw[b]) + 1) / tot_raw))
        w[b] = math.floor(lr * 1e6 + 0.5)
    return w


def dsir_scores(ds, text_col: str = "text", target_col: str = "is_target",
                id_col: str = "doc_id", dim: int = 256):
    """Full DSIR scoring: count pass → weight table → score pass.

    Returns a Dataset ``(id_col, n_tokens, dsir_micro_nats)`` — the
    per-doc importance score in int64 micro-nats (descending = more
    target-like). ``target_col`` is a boolean column marking the
    in-target subset (computed upstream, e.g. a lang/quality gate).
    """
    from .textstats import _token_lists

    n_raw, n_tgt = hashed_ngram_counts(ds, text_col, target_col, dim)
    w = dsir_weight_table(n_raw, n_tgt)

    def _score(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.is_valid(batch.column(text_col)))
        if b.num_rows == 0:
            return pa.table({
                id_col: pa.array([], batch.schema.field(id_col).type),
                "n_tokens": pa.array([], pa.int64()),
                "dsir_micro_nats": pa.array([], pa.int64()),
            })
        flat, offsets, n_tokens = _token_lists(b, text_col)
        buckets = _bucket_of_tokens(flat, dim)
        doc_idx = np.repeat(np.arange(b.num_rows, dtype=np.int64),
                            n_tokens)
        # int-valued weights summed in float64: exact below 2^53/doc
        sums = np.bincount(doc_idx, weights=w[buckets].astype(np.float64),
                           minlength=b.num_rows)
        return pa.table({
            id_col: b.column(id_col),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "dsir_micro_nats": pa.array(sums.astype(np.int64), pa.int64()),
        })

    return ds.select_columns([id_col, text_col, target_col]).map_batches(
        _score, batch_format="pyarrow")
