"""Fuzzy string matching: EXACT edit-distance<=1 pair discovery.

The deletion-neighborhood blocking of FastSS (Bocek et al., 2007)
/ SymSpell: two strings within Levenshtein distance 1 MUST share a
key in {s} ∪ {s minus one character} — so candidate generation is an
equality join on those keys, never an all-pairs scan. This is the
fuzzy twin of the exact-dedup family (near-identical titles, typo'd
hosts, OCR one-char errors) with recall 1.0 by construction, unlike
the probabilistic minhash path.

Physical plan (the minhash-band shape, `stages/dedup.py:98`):

1. map-side: each row explodes into ``len(s)+1`` variant keys
   (itself + each single-deletion), tagged with ``(id, s)``.
2. ONE co-shuffle by ``bucket_ids(variant)``; each whole-bucket UDF
   dictionary-encodes its variants and expands per-variant id pairs
   with the same triu kernel as the minhash buckets — whole-bucket
   numpy, no per-key UDF. Hot variants (a deletion shared by
   thousands of short strings) are capped DETERMINISTICALLY (block
   sorted by id) at ``max_block``, and every cap is COUNTED and
   surfaced (sentinel counter rows folded into ``stats``) — never
   silent.
3. candidate pairs dedup (a pair can meet under several shared
   variants) through one pair-key groupby, then each surviving pair
   is VERIFIED with an O(n) two-pointer distance<=1 check — exactness
   does not rest on the blocking.

Shuffle volume = (len+1) x rows variant rows — the ~w x amplification
is inherent to deletion blocking (same tradeoff as the substring
window explode, `stages/dedup.py substring_dedup`); at 100 TB this
operator belongs on bounded-length KEY columns (hosts, titles, ids),
not document bodies.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import bucket_ids

_PAIR_FIELDS = [
    ("id_a", pa.int64()), ("id_b", pa.int64()),
    ("s_a", pa.string()), ("s_b", pa.string()),
    ("capped", pa.int64()),
]
_PAIR_SCHEMA = pa.schema(_PAIR_FIELDS)


def within_edit1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 in one O(n) pass."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:                       # one substitution allowed
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:                        # normalize: a is shorter
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]          # skip one char of the longer


def _variants(s: str):
    yield s
    for i in range(len(s)):
        yield s[:i] + s[i + 1:]


def _counter_row(n: int) -> pa.Table:
    """Sentinel row (NULL ids) carrying a hot-block cap counter."""
    return pa.table({
        "id_a": pa.array([None], pa.int64()),
        "id_b": pa.array([None], pa.int64()),
        "s_a": pa.array([None], pa.string()),
        "s_b": pa.array([None], pa.string()),
        "capped": pa.array([n], pa.int64()),
    }, schema=_PAIR_SCHEMA)


def edit1_pairs(ds, col: str, id_col: str = "doc_id",
                n_buckets: int = 64, max_block: int = 256,
                stats: Optional[dict] = None):
    """All id pairs whose ``col`` strings are within Levenshtein
    distance 1 (including exact duplicates at distance 0), as
    ``(id_a, id_b, s_a, s_b)`` with ``id_a < id_b``. NULL strings
    match nothing. Pass ``stats={}`` to materialize driver-side and
    receive ``{"blocks_capped": n}`` (the no-silent-caps rule);
    without ``stats`` a Dataset streams out and cap counters are
    dropped with the sentinel rows.
    """

    def _explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        ss = batch.column(col).to_pylist()
        v_ids, v_keys, v_strs = [], [], []
        for rid, s in zip(ids, ss):
            if s is None:
                continue
            for v in _variants(s):
                v_ids.append(rid)
                v_keys.append(v)
                v_strs.append(s)
        keys = pa.array(v_keys, pa.string())
        return pa.table({
            "_bucket": pa.array(bucket_ids(keys, n_buckets),
                                pa.int64()),
            "vk": keys,
            "id": pa.array(v_ids, pa.int64()),
            "s": pa.array(v_strs, pa.string()),
        })

    def _bucket(group: pa.Table) -> pa.Table:
        codes = pc.dictionary_encode(
            group.column("vk").combine_chunks()
        ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        ids = group.column("id").to_numpy(zero_copy_only=False)
        # deterministic order (and cap) inside each variant block
        order = np.lexsort((ids, codes))
        codes, ids = codes[order], ids[order]
        strs = group.column("s").take(pa.array(order, pa.int64()))
        seg_start = np.ones(len(codes), dtype=bool)
        seg_start[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(seg_start)
        ends = np.concatenate([starts[1:], [len(codes)]])
        capped = int(np.sum((ends - starts) > max_block))
        a_idx, b_idx = [], []
        for s0, e0 in zip(starts,
                          np.minimum(ends, starts + max_block)):
            k = e0 - s0
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            a_idx.append(s0 + iu[0])
            b_idx.append(s0 + iu[1])
        parts = []
        if a_idx:
            ai = np.concatenate(a_idx)
            bi = np.concatenate(b_idx)
            ia, ib = ids[ai], ids[bi]
            keep = ia != ib        # same id via two variants: drop
            ai, bi, ia, ib = ai[keep], bi[keep], ia[keep], ib[keep]
            swap = ia > ib
            lo = np.where(swap, ib, ia)
            hi = np.where(swap, ia, ib)
            lo_pos = np.where(swap, bi, ai)
            hi_pos = np.where(swap, ai, bi)
            parts.append(pa.table({
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "s_a": strs.take(pa.array(lo_pos, pa.int64())),
                "s_b": strs.take(pa.array(hi_pos, pa.int64())),
                "capped": pa.array(
                    np.zeros(len(lo), dtype=np.int64), pa.int64()),
            }, schema=_PAIR_SCHEMA))
        if capped:
            parts.append(_counter_row(capped))
        return (pa.concat_tables(parts) if parts
                else _PAIR_SCHEMA.empty_table())

    cands = ds.map_batches(_explode, batch_format="pyarrow").groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_bucket, batch_format="pyarrow")

    # global pair dedup (a pair meets under every shared variant):
    # one pair-key groupby; verification runs on the deduped set
    def _pair_key(batch: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(pc.fill_null(batch.column("id_a"), -1),
                    pa.string()),
            pc.cast(pc.fill_null(batch.column("id_b"), -1),
                    pa.string()), ":")
        return batch.append_column("_pk", k).append_column(
            "_pb", pa.array(bucket_ids(k, n_buckets), pa.int64()))

    def _dedup_verify(group: pa.Table) -> pa.Table:
        valid = pc.is_valid(group.column("id_a"))
        capped_total = int(
            pc.sum(group.column("capped")).as_py() or 0)
        sub = group.filter(valid)
        parts = []
        if sub.num_rows:
            codes = pc.dictionary_encode(
                sub.column("_pk").combine_chunks()
            ).indices.to_numpy(zero_copy_only=False).astype(np.int64)
            _, first = np.unique(codes, return_index=True)
            sub = sub.take(pa.array(first, pa.int64()))
            sa = sub.column("s_a").to_pylist()
            sb = sub.column("s_b").to_pylist()
            ok = pa.array([within_edit1(x, y)
                           for x, y in zip(sa, sb)])
            kept = sub.filter(ok)
            parts.append(pa.table({
                "id_a": kept.column("id_a"),
                "id_b": kept.column("id_b"),
                "s_a": kept.column("s_a"),
                "s_b": kept.column("s_b"),
                "capped": pa.array(
                    np.zeros(kept.num_rows, dtype=np.int64),
                    pa.int64()),
            }, schema=_PAIR_SCHEMA))
        if capped_total:
            parts.append(_counter_row(capped_total))
        return (pa.concat_tables(parts) if parts
                else _PAIR_SCHEMA.empty_table())

    deduped = cands.map_batches(
        _pair_key, batch_format="pyarrow"
    ).groupby("_pb", num_partitions=n_buckets).map_groups(
        _dedup_verify, batch_format="pyarrow")

    if stats is not None:
        total = 0
        tbls = []
        for b in deduped.iter_batches(batch_format="pyarrow",
                                      batch_size=None):
            if not b.num_rows:
                continue
            total += int(pc.sum(b.column("capped")).as_py() or 0)
            real = b.filter(pc.is_valid(b.column("id_a")))
            if real.num_rows:
                tbls.append(real.select(
                    ["id_a", "id_b", "s_a", "s_b"]))
        stats["blocks_capped"] = total
        if not tbls:
            return pa.schema(_PAIR_FIELDS[:4]).empty_table()
        return pa.concat_tables(tbls)

    def _strip(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.is_valid(batch.column("id_a"))
        ).select(["id_a", "id_b", "s_a", "s_b"])

    return deduped.map_batches(_strip, batch_format="pyarrow")
