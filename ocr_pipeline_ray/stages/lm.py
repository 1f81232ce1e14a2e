"""CCNet-style corpus language-model scoring (bigram, integer-exact).

CCNet (Wenzek et al., LREC 2020) buckets Common-Crawl documents by
the perplexity of a KenLM n-gram model — the standard "does this
read like real text" gate in web-scale training-data pipelines. This
module reproduces that shape with an in-engine bigram model:

* :func:`train_bigram_lm` — ONE corpus pass of map-side partial
  Counters (the ``top_tokens`` shape) feeding two small groupbys:
  unigram counts (kept whole — they are the smoothing denominators)
  and bigram counts pruned at ``min_count`` (the model). Vocabulary
  size = exact distinct unigram count.
* :func:`lm_score` — per document: mean inverse conditional
  probability over its adjacent-token bigrams under add-one
  smoothing, **in pure int64** so the result is bit-exact and
  summation-order-free (the float-log perplexity would hash-diverge
  between engines; monotonicity is what the filter needs):

      ipp(w1,w2)  = ((c(w1) + V) * scale) // (c(w1,w2) + 1)
      mean_ipp(d) = sum(ipp) // n_bigrams      (-1 when no bigrams)

  High ``mean_ipp`` = improbable text (the analogue of high
  perplexity). ``n_oov`` counts bigrams absent from the pruned model.

Two scoring strategies, equivalence-tested:

* ``join="broadcast"`` (default): the trained model lands in the
  object store ONCE (``ray.put``, per-worker cached deserialization)
  and scoring is a single corpus pass — zero shuffles. Right
  whenever the pruned model fits a worker heap (min_count pruning is
  exactly the knob; document counts, not documents, so the model is
  vocabulary-scale, not corpus-scale).
* ``join="shuffle"``: no memory assumption — bigram occurrence rows
  co-shuffle against the model via two bucketed repartition joins
  (pair, then w1) and a final per-doc groupby with map-side
  combinable int sums.

Overflow note: ``(c1 + V) * scale`` must stay < 2^63 — at 10^12
tokens pick ``scale`` ≤ 1e5. The default 1e6 suits corpus sizes to
~10^12/1e6 unigram occurrences; both paths use identical arithmetic
either way.

Reference analogue: none (the reference's quality gate is the
dictionary hit-ratio, ``/root/reference/ocr_step.py:397-412``); this
extends the same M9 quality-gating slot to the corpus-LM signal.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _cached_get

PAIR_SEP = " "


def train_bigram_lm(ds, text_col: str = "text", min_count: int = 1):
    """Distributed unigram + pruned-bigram counts.

    Returns ``(uni, bi, vocab_size)``: ``uni`` = Dataset
    ``(token, c)`` (unpruned), ``bi`` = Dataset ``(pair, c12)`` with
    ``c12 >= min_count`` (pair = "w1 w2"), ``vocab_size`` = exact
    distinct token count.
    """
    from ray.data.aggregate import Sum

    def _partials(batch: pa.Table) -> pa.Table:
        uni: Dict[str, int] = {}
        bi: Dict[str, int] = {}
        for text in batch.column(text_col).to_pylist():
            if text is None:
                continue
            toks = text.split(" ")
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                p = a + PAIR_SEP + b
                bi[p] = bi.get(p, 0) + 1
        return pa.table({
            "key": pa.array(list(uni.keys()) + list(bi.keys()),
                            pa.string()),
            "n": pa.array(list(uni.values()) + list(bi.values()),
                          pa.int64()),
            "is_pair": pa.array(
                [False] * len(uni) + [True] * len(bi), pa.bool_()),
        })

    counts = (
        ds.map_batches(_partials, batch_format="pyarrow")
        .groupby(["key", "is_pair"])
        .aggregate(Sum("n"))
    )

    def _split_uni(batch: pa.Table) -> pa.Table:
        m = pc.invert(batch.column("is_pair"))
        t = batch.filter(m)
        return pa.table({
            "token": t.column("key"),
            "c": pc.cast(t.column("sum(n)"), pa.int64()),
        })

    def _split_bi(batch: pa.Table) -> pa.Table:
        m = pc.and_(batch.column("is_pair"),
                    pc.greater_equal(batch.column("sum(n)"),
                                     pa.scalar(min_count)))
        t = batch.filter(m)
        return pa.table({
            "pair": t.column("key"),
            "c12": pc.cast(t.column("sum(n)"), pa.int64()),
        })

    counts = counts.materialize()  # counted once, consumed three ways
    uni = counts.map_batches(_split_uni, batch_format="pyarrow")
    bi = counts.map_batches(_split_bi, batch_format="pyarrow")
    vocab_size = uni.count()
    return uni, bi, vocab_size


def _doc_bigrams(toks):
    return zip(toks, toks[1:])


def lm_score(
    ds,
    uni,
    bi,
    vocab_size: int,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
    join: str = "broadcast",
):
    """Score every document: ``(id_col, n_bigrams, n_oov, mean_ipp)``.

    ``mean_ipp = -1`` for documents with no bigrams (NULL / empty /
    single-token text). See module docstring for the two strategies.
    """
    import ray

    if join not in ("broadcast", "shuffle"):
        raise ValueError(f"join must be broadcast|shuffle, got {join!r}")
    if join == "shuffle":
        return _lm_score_shuffle(
            ds, uni, bi, vocab_size, scale, id_col, text_col)

    # model-scale driver collection (vocabulary, not corpus), put ONCE
    uni_map: Dict[str, int] = {}
    for b in uni.iter_batches(batch_format="pyarrow"):
        uni_map.update(zip(b.column("token").to_pylist(),
                           b.column("c").to_pylist()))
    bi_map: Dict[str, int] = {}
    for b in bi.iter_batches(batch_format="pyarrow"):
        bi_map.update(zip(b.column("pair").to_pylist(),
                          b.column("c12").to_pylist()))
    model_ref = ray.put((uni_map, bi_map))
    v = int(vocab_size)
    s = int(scale)

    def _score(batch: pa.Table) -> pa.Table:
        u_map, b_map = _cached_get(model_ref)
        nbs, noovs, means = [], [], []
        for text in batch.column(text_col).to_pylist():
            toks = text.split(" ") if text is not None else []
            nb = noov = 0
            ssum = 0
            for a, b2 in _doc_bigrams(toks):
                nb += 1
                c12 = b_map.get(a + PAIR_SEP + b2, 0)
                if c12 == 0:
                    noov += 1
                c1 = u_map.get(a, 0)
                ssum += ((c1 + v) * s) // (c12 + 1)
            nbs.append(nb)
            noovs.append(noov)
            means.append(ssum // nb if nb else -1)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(nbs, pa.int64()),
            "n_oov": pa.array(noovs, pa.int64()),
            "mean_ipp": pa.array(means, pa.int64()),
        })

    return ds.map_batches(_score, batch_format="pyarrow")


def _lm_score_shuffle(ds, uni, bi, vocab_size: int, scale: int,
                      id_col: str, text_col: str):
    """No-memory-assumption path: bigram rows × model via two
    bucketed repartition joins, then one per-doc groupby of
    map-side-combinable int sums. One sentinel row per document
    keeps 0-bigram docs present (NULL keys match nothing in the
    joins, SQL semantics)."""
    from ray.data.aggregate import Sum

    from .join import repartition_join

    def _explode(batch: pa.Table) -> pa.Table:
        ids_out, pairs, w1s = [], [], []
        ids = batch.column(id_col).to_pylist()
        for rid, text in zip(ids, batch.column(text_col).to_pylist()):
            toks = text.split(" ") if text is not None else []
            ids_out.append(rid)       # sentinel: doc exists
            pairs.append(None)
            w1s.append(None)
            for a, b2 in _doc_bigrams(toks):
                ids_out.append(rid)
                pairs.append(a + PAIR_SEP + b2)
                w1s.append(a)
        return pa.table({
            id_col: pa.array(ids_out, pa.int64()),
            "pair": pa.array(pairs, pa.string()),
            "w1": pa.array(w1s, pa.string()),
        })

    rows = ds.map_batches(_explode, batch_format="pyarrow")
    rows = repartition_join(rows, bi, on="pair",
                            right_cols=["c12"], how="left")

    def _uni_renamed(batch: pa.Table) -> pa.Table:
        return pa.table({"w1": batch.column("token"),
                         "c1": batch.column("c")})

    uni_r = uni.map_batches(_uni_renamed, batch_format="pyarrow")
    rows = repartition_join(rows, uni_r, on="w1",
                            right_cols=["c1"], how="left")
    v = int(vocab_size)
    s = int(scale)

    def _ipp(batch: pa.Table) -> pa.Table:
        pair = batch.column("pair")
        real = pc.is_valid(pair).combine_chunks()
        real_np = np.asarray(real.to_numpy(zero_copy_only=False),
                             dtype=bool)
        c12 = np.asarray(
            batch.column("c12").combine_chunks().fill_null(0)
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        c1 = np.asarray(
            batch.column("c1").combine_chunks().fill_null(0)
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        ipp = ((c1 + v) * s) // (c12 + 1)
        ipp[~real_np] = 0
        oov = (real_np & (c12 == 0)).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "nb": pa.array(real_np.astype(np.int64), pa.int64()),
            "noov": pa.array(oov, pa.int64()),
            "ssum": pa.array(ipp, pa.int64()),
        })

    agg = (
        rows.map_batches(_ipp, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("nb"), Sum("noov"), Sum("ssum"))
    )

    def _final(batch: pa.Table) -> pa.Table:
        nb = np.asarray(batch.column("sum(nb)").combine_chunks()
                        .to_numpy(zero_copy_only=False), dtype=np.int64)
        noov = np.asarray(batch.column("sum(noov)").combine_chunks()
                          .to_numpy(zero_copy_only=False), dtype=np.int64)
        ssum = np.asarray(batch.column("sum(ssum)").combine_chunks()
                          .to_numpy(zero_copy_only=False), dtype=np.int64)
        mean = np.where(nb > 0, ssum // np.maximum(nb, 1), -1)
        return pa.table({
            id_col: batch.column(id_col),
            "n_bigrams": pa.array(nb, pa.int64()),
            "n_oov": pa.array(noov, pa.int64()),
            "mean_ipp": pa.array(mean, pa.int64()),
        })

    return agg.map_batches(_final, batch_format="pyarrow")
