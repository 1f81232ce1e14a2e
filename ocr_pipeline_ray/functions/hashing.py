"""Shared partitioning-hash helpers.

``bucket_ids`` maps a key column to shuffle-bucket ids. The bucket
function is INTERNAL partitioning state (no query semantics depend on
which bucket a key lands in — only that the mapping is deterministic
within and across runs and spreads keys evenly), so integer keys take
a vectorized numpy multiplicative mix (no per-row Python) and only
string-ish keys pay a per-row crc32.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pyarrow as pa

# SplitMix64-style odd multiplier — full-period, well-mixed high bits
_MIX = np.uint64(0x9E3779B97F4A7C15)


def bucket_ids(col, n_buckets: int) -> np.ndarray:
    """Key column (Arrow Array/ChunkedArray) → int64 bucket ids.

    The bucket of a VALUE depends only on the value and its type —
    never on which batch it arrived in (a per-batch hash-function
    switch would send the same key to different buckets on the two
    sides of a co-shuffle and silently drop joins). NULL keys map to
    bucket 0 — they match nothing in every keyed operator, so their
    placement only needs to be deterministic.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        v = col.fill_null(0).to_numpy(zero_copy_only=False).astype(
            np.uint64
        )
        mixed = (v * _MIX) >> np.uint64(33)
        out = (mixed % np.uint64(n_buckets)).astype(np.int64)
        if col.null_count:
            import pyarrow.compute as pc

            out[~pc.is_valid(col).to_numpy(zero_copy_only=False)] = 0
        return out
    return np.fromiter(
        (crc32(str(k).encode("utf-8")) % n_buckets for k in col.to_pylist()),
        dtype=np.int64,
        count=len(col),
    )


def rendezvous_pick(keys, nodes) -> list:
    """Rendezvous (highest-random-weight) placement: each key goes to
    ``argmax_node md5(key | node)`` — the consistent-placement rule
    whose defining property is MINIMAL MOVEMENT under cluster
    resizing (adding a node reassigns only the keys whose new hash
    wins; nothing else moves, unlike ``hash(key) % n`` which moves
    almost everything). Thaler & Ravishankar ToN'98; this is how a
    100-TB store maps partitions to a fixed-but-occasionally-resized
    node set without a central directory.

    The weight is the first 16 hex chars of ``md5(f"{key}|{node}")``
    as an unsigned int (ties — cryptographically negligible but SQL
    must agree — break to the lexicographically SMALLEST node).
    Returns the winning node per key; NULL keys get ``nodes[0]``
    (deterministic, like :func:`bucket_ids`'s bucket 0).
    """
    import hashlib

    order = sorted(nodes)
    out = []
    for k in keys:
        if k is None:
            out.append(order[0])
            continue
        best, best_w = None, -1
        for n in order:
            w = int(hashlib.md5(
                f"{k}|{n}".encode("utf-8")).hexdigest()[:16], 16)
            if w > best_w:
                best, best_w = n, w
        out.append(best)
    return out
