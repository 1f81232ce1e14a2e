"""Inverted-index construction: token → postings (doc_ids, tfs).

The search-side companion to the corpus statistics in
`stages/textstats.py`: build exact posting lists for every token,
sorted by doc_id, with term frequencies and document frequency.

Scale shape:

* Map side: ONE Arrow ``group_by((token, doc_id)).count`` per block —
  the shuffle carries (token, doc_id, tf) rows, already combined
  within the block (a doc's repeated token is one row, not tf rows).
* Reduce side: groupby ``crc32(token) % n_buckets`` — NEVER by raw
  token (vocabulary-sized per-key UDF trap). Inside each whole-bucket
  UDF one Arrow sort by (token, doc_id) + numpy boundary masks build
  every posting list in the bucket as ONE ``ListArray`` (zero-copy
  over the sorted columns).
* Hot tokens ("the") produce long lists; ``max_postings`` caps them
  DETERMINISTICALLY (doc_id order, lowest first) and the drop is
  OBSERVABLE: ``df`` stays the full document frequency and
  ``truncated`` flags the cap — no silent loss.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_doc_tf_fn(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """Per-block (token, doc_id, tf) rows — the map-side combine.

    Vectorized: one split kernel, numpy repeat for the ids, one
    Arrow group_by. Null texts are skipped; empty texts contribute
    one '' token (DuckDB ``string_split`` parity).
    """
    valid = pc.is_valid(batch.column(text_col))
    b = batch.filter(valid)
    parts = pc.split_pattern(b.column(text_col), " ").combine_chunks()
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.chunk(0) if parts.num_chunks else pa.array(
            [], pa.list_(pa.string()))
    offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    ids = b.column(id_col).to_numpy(zero_copy_only=False)
    doc_ids = np.repeat(ids, np.diff(offsets))
    g = pa.table({
        "token": parts.values,
        id_col: pa.array(doc_ids, pa.int64()),
    }).group_by(["token", id_col]).aggregate([([], "count_all")])
    return pa.table({
        "token": g.column("token"),
        id_col: g.column(id_col),
        "tf": pc.cast(g.column("count_all"), pa.int64()),
    })


def inverted_index(ds, id_col: str = "doc_id", text_col: str = "text",
                   max_postings: Optional[int] = None,
                   n_buckets: int = 64):
    """Build the exact inverted index: one row per token with
    ``df`` (full document frequency), ``doc_ids`` and ``tfs``
    posting lists sorted by doc_id (capped at ``max_postings`` with
    the ``truncated`` flag when set).
    """
    from ..functions.hashing import bucket_ids

    tf_rows = ds.map_batches(
        lambda b: token_doc_tf_fn(b, id_col, text_col),
        batch_format="pyarrow",
    )

    def _bucketize(batch: pa.Table) -> pa.Table:
        buckets = bucket_ids(batch.column("token"), n_buckets)
        return batch.append_column(
            "_tbucket", pa.array(buckets, pa.int64()))

    def _build(group: pa.Table) -> pa.Table:
        g = group.sort_by([("token", "ascending"),
                           (id_col, "ascending")])
        toks = g.column("token").combine_chunks()
        n = len(toks)
        if n == 0:
            return pa.table({
                "token": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
                "doc_ids": pa.array([], pa.list_(pa.int64())),
                "tfs": pa.array([], pa.list_(pa.int64())),
                "truncated": pa.array([], pa.bool_()),
            })
        neq = pc.fill_null(pc.not_equal(
            toks.slice(1, n - 1), toks.slice(0, n - 1)), True
        ).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, neq])
        offsets = np.r_[starts, n].astype(np.int32)
        df = np.diff(offsets).astype(np.int64)
        doc_vals = g.column(id_col).combine_chunks()
        tf_vals = g.column("tf").combine_chunks()
        doc_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), doc_vals)
        tf_lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), tf_vals)
        if max_postings is not None:
            doc_lists = pc.list_slice(doc_lists, 0, max_postings)
            tf_lists = pc.list_slice(tf_lists, 0, max_postings)
            truncated = pa.array(df > max_postings)
        else:
            truncated = pa.array(np.zeros(len(df), dtype=bool))
        return pa.table({
            "token": toks.take(pa.array(starts, pa.int64())),
            "df": pa.array(df, pa.int64()),
            "doc_ids": doc_lists,
            "tfs": tf_lists,
            "truncated": truncated,
        })

    return (
        tf_rows.map_batches(_bucketize, batch_format="pyarrow")
        .groupby("_tbucket", num_partitions=n_buckets)
        .map_groups(_build, batch_format="pyarrow")
    )


def phrase_match(ds, phrase, id_col: str = "doc_id",
                 text_col: str = "text", n_buckets: int = 64):
    """Distributed POSITIONAL phrase search: docs containing the exact
    token sequence ``phrase`` (the positional-intersection query a
    bag-of-words `inverted_index` / BM25 cannot answer).

    Scale shape: the posting stream is pruned AT THE SCAN to the
    phrase's tokens (one vectorized ``is_in`` per batch — shuffle
    volume is phrase-postings-scale, never corpus-scale). Each
    surviving posting is normalized per phrase SLOT it could fill
    (``pos' = pos - slot``; repeated phrase tokens emit one row per
    slot), then ONE doc-hash co-shuffle and a whole-bucket sort +
    boundary-mask counts distinct slots per (doc, pos') — a start
    position matches iff all ``len(phrase)`` slots are present.

    Returns ``(id_col, n_matches:int64, first_pos:int64)`` for
    matching docs only; ``pos``/``first_pos`` are 1-based.
    """
    import numpy as np

    from ..functions.hashing import bucket_ids
    from .textstats import _token_lists

    m = len(phrase)
    if m < 1:
        raise ValueError("phrase must have at least one token")
    phrase_arr = pa.array(list(phrase), pa.string())
    # slot lists per distinct token (a token may fill several slots)
    slot_map = {}
    for s, t in enumerate(phrase):
        slot_map.setdefault(t, []).append(s)

    def _postings(batch: pa.Table) -> pa.Table:
        flat, offsets, n_tokens = _token_lists(batch, text_col)
        n_docs = batch.num_rows
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(n_docs), n_tokens)
        pos = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(offsets[:-1], n_tokens) + 1)  # 1-based
        hit = pc.is_in(flat, value_set=phrase_arr).to_numpy(
            zero_copy_only=False)
        idx = np.flatnonzero(hit)
        if len(idx) == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "_start": pa.array([], pa.int64()),
                "_slot": pa.array([], pa.int64()),
                "_dbucket": pa.array([], pa.int64()),
            })
        toks = flat.take(pa.array(idx, pa.int64())).to_pylist()
        out_doc, out_start, out_slot = [], [], []
        for i, t in zip(idx.tolist(), toks):
            for s in slot_map[t]:
                start = pos[i] - s
                if start >= 1:
                    out_doc.append(ids[doc_of[i]])
                    out_start.append(start)
                    out_slot.append(s)
        doc_arr = pa.array(out_doc, pa.int64())
        return pa.table({
            id_col: doc_arr,
            "_start": pa.array(out_start, pa.int64()),
            "_slot": pa.array(out_slot, pa.int64()),
            "_dbucket": pa.array(
                bucket_ids(doc_arr, n_buckets), pa.int64()),
        })

    empty = pa.table({
        id_col: pa.array([], pa.int64()),
        "n_matches": pa.array([], pa.int64()),
        "first_pos": pa.array([], pa.int64()),
    })

    def _intersect(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n == 0:
            return empty
        g = group.sort_by([(id_col, "ascending"),
                           ("_start", "ascending"),
                           ("_slot", "ascending")])
        doc = g.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        start = g.column("_start").combine_chunks().to_numpy(
            zero_copy_only=False)
        slot = g.column("_slot").combine_chunks().to_numpy(
            zero_copy_only=False)
        new_pair = np.empty(n, dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (doc[1:] != doc[:-1]) | (start[1:] != start[:-1])
        # distinct slots per (doc, start): slots are sorted within the
        # run, so a boundary mask on slot change counts distinct
        new_slot = np.empty(n, dtype=bool)
        new_slot[0] = True
        new_slot[1:] = new_pair[1:] | (slot[1:] != slot[:-1])
        p_starts = np.flatnonzero(new_pair)
        n_slots = np.add.reduceat(new_slot.astype(np.int64), p_starts)
        ok = n_slots == m
        if not ok.any():
            return empty
        pdoc = doc[p_starts[ok]]
        ppos = start[p_starts[ok]]
        d_starts = np.flatnonzero(
            np.r_[True, pdoc[1:] != pdoc[:-1]])
        return pa.table({
            id_col: pa.array(pdoc[d_starts], pa.int64()),
            "n_matches": pa.array(np.diff(
                np.append(d_starts, len(pdoc))).astype(np.int64),
                pa.int64()),
            "first_pos": pa.array(
                np.minimum.reduceat(ppos, d_starts), pa.int64()),
        })

    return (
        ds.map_batches(_postings, batch_format="pyarrow")
        .groupby("_dbucket", num_partitions=n_buckets)
        .map_groups(_intersect, batch_format="pyarrow")
    )
