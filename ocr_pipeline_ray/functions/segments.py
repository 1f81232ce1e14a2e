"""Shared run-boundary math for sorted-key segment kernels.

Every bucketed whole-bucket UDF in this repo that processes per-key
runs of a SORTED array (running sums, per-doc top-k, as-of probes)
needs the same three arrays: segment starts, segment lengths, and
per-row rank within segment. One implementation, one set of edge
cases (empty input, single row).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def key_segments(keys: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """``(seg_start, seg_len)`` of equal-key runs in a sorted array."""
    n = len(keys)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z
    starts = np.ones(n, dtype=bool)
    starts[1:] = keys[1:] != keys[:-1]
    seg_start = np.flatnonzero(starts)
    seg_len = np.diff(np.append(seg_start, n))
    return seg_start, seg_len


def segment_ranks(seg_start: np.ndarray, seg_len: np.ndarray) -> np.ndarray:
    """Per-row 0-based rank within its segment."""
    n = int(seg_len.sum()) if len(seg_len) else 0
    return np.arange(n) - np.repeat(seg_start, seg_len)
