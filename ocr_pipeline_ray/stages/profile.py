"""One-pass table profiler: the ingest data-quality sweep.

Every large-scale ingest starts with "what is in this table" — per
column: row/null counts, min/max, numeric mean and a distinct-count
estimate. The engine computes ALL of it in ONE streaming pass:

* each batch reduces to one tiny partial row PER COLUMN (counts,
  min/max, sum, k-minimum-value hash sketch) inside ``map_batches``;
* the driver merges ``blocks × columns`` partial rows — bounded and
  tiny, the same driver-merge contract as
  ``stages/stats.exact_quantiles`` and the KMV sketch in
  ``queries.q_approx_distinct_tokens``.

No shuffle, no second pass, constant driver memory. Distinct counts
use the md5-based KMV estimator over the CANONICAL string rendering
of values (exactly reproducible in SQL via ``md5(CAST(col AS
VARCHAR))``), so the estimate itself is oracle-checkable bit-for-bit.
Float columns skip the sketch (their string rendering is not
canonical across engines) — profile them via quantiles instead.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Sequence

import numpy as np
import pyarrow as pa

_KMV_SPACE = 4294967296.0  # md5[:8] → 32-bit hash space


def _round6(x: float) -> float:
    import math

    return math.floor(x * 1_000_000.0 + 0.5) / 1_000_000.0


def _kmv_hashes(strs: Sequence[str], k: int) -> np.ndarray:
    hs = np.fromiter(
        (int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)
         for s in strs),
        dtype=np.uint64, count=len(strs),
    )
    return np.unique(hs)[:k]


def kmv_estimate(minima: np.ndarray, k: int) -> float:
    if len(minima) < k:
        return float(len(minima))
    return _round6((k - 1) / (float(minima[-1]) / _KMV_SPACE))


def profile_table(ds, numeric_cols: Sequence[str],
                  string_cols: Sequence[str], kmv_k: int = 64,
                  ) -> pa.Table:
    """Profile ``ds``: one output row per column.

    ``numeric_cols`` must be integer-typed for the distinct sketch
    (canonical rendering); ``string_cols`` are profiled with lexical
    min/max. Returns columns: ``col, n_rows, n_nulls, vmin, vmax,
    mean, smin, smax, n_distinct_kmv``.
    """
    import pyarrow.compute as pc

    cols = list(numeric_cols) + list(string_cols)
    numeric = set(numeric_cols)

    def _partial(batch: pa.Table) -> pa.Table:
        rows: Dict[str, List] = {
            "col": [], "n": [], "nulls": [], "vmin": [], "vmax": [],
            "vsum": [], "smin": [], "smax": [], "kmv": [],
        }
        for c in cols:
            arr = batch.column(c)
            arr = arr.combine_chunks() if isinstance(
                arr, pa.ChunkedArray) else arr
            nulls = arr.null_count
            valid = arr.drop_null()
            rows["col"].append(c)
            rows["n"].append(batch.num_rows)
            rows["nulls"].append(nulls)
            if len(valid) == 0:
                rows["vmin"].append(None)
                rows["vmax"].append(None)
                rows["vsum"].append(None)
                rows["smin"].append(None)
                rows["smax"].append(None)
                rows["kmv"].append([])
                continue
            mm = pc.min_max(valid)
            if c in numeric:
                rows["vmin"].append(float(mm["min"].as_py()))
                rows["vmax"].append(float(mm["max"].as_py()))
                rows["vsum"].append(float(
                    pc.sum(pc.cast(valid, pa.float64())).as_py()))
                rows["smin"].append(None)
                rows["smax"].append(None)
                uniq = [str(v) for v in pc.unique(valid).to_pylist()]
            else:
                rows["vmin"].append(None)
                rows["vmax"].append(None)
                rows["vsum"].append(None)
                rows["smin"].append(mm["min"].as_py())
                rows["smax"].append(mm["max"].as_py())
                uniq = pc.unique(valid).to_pylist()
            rows["kmv"].append(
                _kmv_hashes(uniq, kmv_k).tolist())
        return pa.table({
            "col": pa.array(rows["col"], pa.string()),
            "n": pa.array(rows["n"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "vmin": pa.array(rows["vmin"], pa.float64()),
            "vmax": pa.array(rows["vmax"], pa.float64()),
            "vsum": pa.array(rows["vsum"], pa.float64()),
            "smin": pa.array(rows["smin"], pa.string()),
            "smax": pa.array(rows["smax"], pa.string()),
            "kmv": pa.array(rows["kmv"], pa.list_(pa.uint64())),
        })

    partials = ds.select_columns(cols).map_batches(
        _partial, batch_format="pyarrow")

    # driver merge: blocks × columns tiny rows
    acc: Dict[str, dict] = {
        c: {"n": 0, "nulls": 0, "vmin": None, "vmax": None,
            "vsum": 0.0, "any_sum": False, "smin": None, "smax": None,
            "kmv": np.empty(0, dtype=np.uint64)}
        for c in cols
    }
    for b in partials.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            c = b.column("col")[i].as_py()
            a = acc[c]
            a["n"] += b.column("n")[i].as_py()
            a["nulls"] += b.column("nulls")[i].as_py()
            for key, pick in (("vmin", min), ("vmax", max),
                              ("smin", min), ("smax", max)):
                v = b.column(key)[i].as_py()
                if v is not None:
                    a[key] = v if a[key] is None else pick(a[key], v)
            s = b.column("vsum")[i].as_py()
            if s is not None:
                a["vsum"] += s
                a["any_sum"] = True
            hs = np.array(b.column("kmv")[i].as_py(), dtype=np.uint64)
            a["kmv"] = np.unique(
                np.concatenate((a["kmv"], hs)))[:kmv_k]

    out = {"col": [], "n_rows": [], "n_nulls": [], "vmin": [],
           "vmax": [], "mean": [], "smin": [], "smax": [],
           "n_distinct_kmv": []}
    for c in cols:
        a = acc[c]
        out["col"].append(c)
        out["n_rows"].append(a["n"])
        out["n_nulls"].append(a["nulls"])
        out["vmin"].append(a["vmin"])
        out["vmax"].append(a["vmax"])
        n_valid = a["n"] - a["nulls"]
        out["mean"].append(
            _round6(a["vsum"] / n_valid)
            if a["any_sum"] and n_valid else None)
        out["smin"].append(a["smin"])
        out["smax"].append(a["smax"])
        out["n_distinct_kmv"].append(kmv_estimate(a["kmv"], kmv_k))
    return pa.table({
        "col": pa.array(out["col"], pa.string()),
        "n_rows": pa.array(out["n_rows"], pa.int64()),
        "n_nulls": pa.array(out["n_nulls"], pa.int64()),
        "vmin": pa.array(out["vmin"], pa.float64()),
        "vmax": pa.array(out["vmax"], pa.float64()),
        "mean": pa.array(out["mean"], pa.float64()),
        "smin": pa.array(out["smin"], pa.string()),
        "smax": pa.array(out["smax"], pa.string()),
        "n_distinct_kmv": pa.array(out["n_distinct_kmv"],
                                   pa.float64()),
    })
