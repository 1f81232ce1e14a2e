"""Sequence packing: the training-data window-assignment operator.

LLM pre-training concatenates documents in a fixed order and chunks
the token stream into fixed-length windows (contiguous-fill packing).
The per-document packing plan — where each document's tokens land —
is a pure function of the GLOBAL running token count before the
document, which makes this the canonical distributed PREFIX-SUM
shape:

1. one streaming pass reduces each batch to per-BAND partial token
   sums (band = ``id // band_size`` — value-range banding, so the
   result is layout-independent);
2. the driver prefix-sums the tiny (band, sum) table — bands number
   ``id_range / band_size``, a few thousand rows even at 10^12 docs
   with a sane ``band_size``, the same bounded-cardinality contract
   as ``stages/stats.exact_quantiles``;
3. a second pass co-shuffles rows by ``bucket_ids(band)`` and each
   whole-BUCKET UDF sorts its band runs by id once and adds the
   band's global offset to a local numpy cumsum — one UDF per
   bucket, never per document.

The corpus is touched twice, streaming both times; the only
materialized object is the band histogram. Output columns per doc:
``cum_before`` (tokens before this doc in the global stream),
``seq_id`` (window index of its first token), ``seq_offset``
(position inside that window) and ``n_windows`` (how many windows
the doc straddles). Downstream shard writers can emit actual packed
token buffers from this plan without any further shuffle: every
document knows exactly where it lands.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import bucket_ids


def sequence_packing(ds, seq_len: int, id_col: str = "doc_id",
                     tokens_col: str = "n_tokens",
                     band_size: int = 8192, n_buckets: int = 64):
    """Assign every row its packed-window coordinates.

    ``ds`` must carry unique integer ``id_col`` (the global packing
    order) and an int64 ``tokens_col``. Returns a Dataset with the
    input columns plus ``cum_before``/``seq_id``/``seq_offset``/
    ``n_windows`` (all int64). Zero-token docs get ``n_windows=0``
    but keep their stream position.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be > 0")
    if band_size <= 0:
        raise ValueError("band_size must be > 0")

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _band_partial(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().to_numpy()
        toks = batch.column(tokens_col).combine_chunks().to_numpy()
        band = ids // band_size
        ub, inv = np.unique(band, return_inverse=True)
        sums = np.zeros(len(ub), dtype=np.int64)
        np.add.at(sums, inv, toks.astype(np.int64))
        return pa.table({
            "_band": pa.array(ub, pa.int64()),
            "_tok": pa.array(sums, pa.int64()),
        })

    band_tbl = (
        ds.select_columns([id_col, tokens_col])
        .map_batches(_band_partial, batch_format="pyarrow")
        .groupby("_band").aggregate(Sum("_tok", alias_name="tok"))
        .sort("_band")
        .to_pandas()  # tiny: one row per band
    )
    bands = band_tbl["_band"].to_numpy()
    band_offset = np.concatenate(
        ([0], np.cumsum(band_tbl["tok"].to_numpy())[:-1])
    ).astype(np.int64)
    offsets = dict(zip(bands.tolist(), band_offset.tolist()))

    def _with_band(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().to_numpy()
        band = (ids // band_size).astype(np.int64)
        return batch.append_column(
            "_bucket", pa.array(bucket_ids(pa.array(band, pa.int64()),
                                           n_buckets), pa.int64())
        ).append_column("_band", pa.array(band, pa.int64()))

    def _pack_bucket(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).combine_chunks().to_numpy()
        toks = group.column(tokens_col).combine_chunks().to_numpy() \
            .astype(np.int64)
        band = group.column("_band").combine_chunks().to_numpy()
        # sort by (band, id): band runs become contiguous and each
        # run is already in packing order
        order = np.lexsort((ids, band))
        sb, st = band[order], toks[order]
        cum = np.zeros(len(order), dtype=np.int64)
        if len(order):
            run_starts = np.concatenate(
                ([0], np.nonzero(sb[1:] != sb[:-1])[0] + 1))
            csum = np.cumsum(st) - st  # within-bucket exclusive cumsum
            # rebase each band run to its own global offset
            base = csum[run_starts]
            rebased = csum - np.repeat(
                base, np.diff(np.concatenate((run_starts, [len(sb)]))))
            cum = rebased + np.array(
                [offsets[b] for b in sb[run_starts].tolist()],
                dtype=np.int64,
            ).repeat(np.diff(np.concatenate((run_starts, [len(sb)]))))
        seq_id = cum // seq_len
        seq_off = cum % seq_len
        last = np.where(st > 0, (cum + st - 1) // seq_len, seq_id)
        n_windows = np.where(st > 0, last - seq_id + 1, 0)
        out = group.take(pa.array(order, pa.int64())).drop_columns(
            ["_bucket", "_band"])
        return (
            out.append_column("cum_before", pa.array(cum, pa.int64()))
            .append_column("seq_id", pa.array(seq_id, pa.int64()))
            .append_column("seq_offset", pa.array(seq_off, pa.int64()))
            .append_column("n_windows",
                           pa.array(n_windows.astype(np.int64),
                                    pa.int64()))
        )

    return (
        ds.map_batches(_with_band, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=min(n_buckets, 64))
        .map_groups(_pack_bucket, batch_format="pyarrow")
    )


def shuffle_shards(ds, n_shards: int, key_col: str = "doc_id"):
    """Deterministic global shuffle into training shards.

    ``random_shuffle()`` on 100 TB is an all-to-all move of the full
    corpus with RNG state nobody can reproduce. Training-data prep
    wants the HASH-shuffle instead: shard = md5(key) % n_shards and
    within-shard order = (md5(key), key) — statistically a uniform
    shuffle (md5 destroys input locality), bit-reproducible across
    runs/layouts/cluster sizes, resumable per shard, and exactly ONE
    content move (the same co-shuffle any bucketed groupby pays).

    Output: ``(key_col, shard_id, shard_pos)`` — ``shard_pos`` is the
    row's position in its shard's deterministic order, so a writer
    task per shard can emit the final training file with no further
    exchange. n_shards follows the training-shard contract: sized so
    one shard = one loader file = one writer task's heap (the same
    bound a real pre-training pipeline imposes); the whole-shard sort
    happens inside one UDF per shard.

    Hash parity with the SQL twin: first 8 hex chars of
    md5(str(key)), like ``q_dataset_split``.
    """
    import hashlib

    import numpy as np
    import pyarrow as pa

    def _hash(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        hs = np.fromiter(
            (int(hashlib.md5(str(k).encode("utf-8")).hexdigest()[:8], 16)
             for k in keys),
            dtype=np.int64, count=len(keys),
        )
        return pa.table({
            key_col: batch.column(key_col),
            "shard_id": pa.array(hs % n_shards, pa.int64()),
            "_h": pa.array(hs, pa.int64()),
        })

    def _order(group: pa.Table) -> pa.Table:
        t = group.sort_by([("_h", "ascending"), (key_col, "ascending")])
        return pa.table({
            key_col: t.column(key_col),
            "shard_id": t.column("shard_id"),
            "shard_pos": pa.array(
                np.arange(t.num_rows, dtype=np.int64), pa.int64()),
        })

    return (
        ds.map_batches(_hash, batch_format="pyarrow")
        .groupby("shard_id")
        .map_groups(_order, batch_format="pyarrow")
    )


def pack_windows(ds, seq_len: int, id_col: str = "doc_id",
                 text_col: str = "text", band_size: int = 8192,
                 n_buckets: int = 64):
    """Materialize the packed training windows themselves.

    :func:`sequence_packing` computes the PLAN (where every doc's
    tokens land); this operator emits the actual fixed-length windows
    a loader reads: ``(seq_id, n_filled, tokens list<int64>)``.
    Token ids are vocabulary-free md5_32 hashes (the
    ``hash_embed``/``shuffle_shards`` parity rule) — swap in a real
    tokenizer's ids by replacing one row-local map.

    Shape: tokenize once, carry the per-doc token-hash list THROUGH
    the packing plan's band-bucket exchange (so ``cum_before``
    arrives with the content — no second doc-scale join), then
    explode to token rows ``(window, pos, tok)`` and co-shuffle by a
    window-hash bucket; each whole-bucket UDF assembles its windows
    with one lexsort + offset-boundary ListArray build (no per-window
    Python). Cross-node volume = one doc-content move + one
    token-row move (~token-count × 16 bytes; the inherent cost of
    materializing windows that straddle documents — the PLAN
    operator stays the cheap path when writers can re-read docs).
    The stream's final partial window ships unpadded
    (``n_filled < seq_len``).
    """
    import hashlib

    import pyarrow.compute as pc

    def _tokenize(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        tok_lists = [t.split(" ") if t is not None else []
                     for t in texts]
        idx = {}
        for toks in tok_lists:
            for t in toks:
                if t not in idx:
                    idx[t] = len(idx)
        hs = np.empty(len(idx), dtype=np.int64)
        for t, i in idx.items():
            hs[i] = int(
                hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
        lens = np.fromiter((len(t) for t in tok_lists), np.int64,
                           count=len(tok_lists))
        flat = np.fromiter(
            (idx[t] for toks in tok_lists for t in toks), np.int64)
        offsets = pa.array(
            np.concatenate(([0], np.cumsum(lens))).astype(np.int32),
            pa.int32())
        toks_arr = pa.ListArray.from_arrays(
            offsets, pa.array(hs[flat] if len(flat) else
                              np.empty(0, np.int64), pa.int64()))
        return pa.table({
            id_col: batch.column(id_col),
            "_toks": toks_arr,
            "n_tokens": pa.array(lens, pa.int64()),
        })

    planned = sequence_packing(
        ds.map_batches(_tokenize, batch_format="pyarrow"),
        seq_len, id_col=id_col, tokens_col="n_tokens",
        band_size=band_size, n_buckets=n_buckets)

    def _explode(batch: pa.Table) -> pa.Table:
        toks = batch.column("_toks").combine_chunks()
        lens = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        flat = np.asarray(toks.flatten(), dtype=np.int64)
        cum = batch.column("cum_before").combine_chunks().to_numpy() \
            .astype(np.int64)
        if flat.size == 0:
            return pa.table({
                "_win": pa.array([], pa.int64()),
                "_pos": pa.array([], pa.int64()),
                "tok": pa.array([], pa.int64()),
            })
        # global position of every token: doc's cum_before + arange
        starts = np.repeat(cum, lens)
        local = np.arange(len(flat), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)))[:-1], lens)
        g = starts + local
        return pa.table({
            "_win": pa.array(g // seq_len, pa.int64()),
            "_pos": pa.array(g % seq_len, pa.int64()),
            "tok": pa.array(flat, pa.int64()),
        })

    rows = planned.map_batches(_explode, batch_format="pyarrow")

    def _with_bucket(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket",
            pa.array(bucket_ids(batch.column("_win"), n_buckets),
                     pa.int64()))

    def _assemble(group: pa.Table) -> pa.Table:
        win = group.column("_win").combine_chunks().to_numpy()
        pos = group.column("_pos").combine_chunks().to_numpy()
        tok = group.column("tok").combine_chunks().to_numpy()
        order = np.lexsort((pos, win))
        win, tok = win[order], tok[order]
        bounds = np.concatenate(
            ([0], np.nonzero(win[1:] != win[:-1])[0] + 1, [len(win)]))
        seq_ids = win[bounds[:-1]]
        n_filled = np.diff(bounds)
        toks_arr = pa.ListArray.from_arrays(
            pa.array(bounds.astype(np.int32), pa.int32()),
            pa.array(tok, pa.int64()))
        return pa.table({
            "seq_id": pa.array(seq_ids, pa.int64()),
            "n_filled": pa.array(n_filled.astype(np.int64), pa.int64()),
            "tokens": toks_arr,
        })

    return (
        rows.map_batches(_with_bucket, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=min(n_buckets, 64))
        .map_groups(_assemble, batch_format="pyarrow")
    )
