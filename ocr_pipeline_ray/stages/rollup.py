"""Multi-level aggregates: ROLLUP (grouping sets) and PIVOT.

Both use the engine's standard two-phase shape — a map-side partial
combine so the exchange carries group-level partials (at most one row
per distinct group per batch, never one per event), then ONE bounded
shuffle keyed on the output group — and both aggregate an INT64
measure (e.g. value cents), so summation order cannot perturb the
result and the DuckDB twins (``GROUP BY ROLLUP`` / ``count(*) FILTER``)
are bit-exact.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


_NULL_SENTINEL = "\x00"


def _composite_key(batch: pa.Table, cols: List[str]) -> pa.Array:
    """Deterministic string key over nullable mixed-type columns
    (NULL encoded as a sentinel that cannot appear in cast output)."""
    parts = []
    for c in cols:
        parts.append(pc.fill_null(
            pc.cast(batch.column(c), pa.string()), _NULL_SENTINEL))
        parts.append("\x1f")
    return pc.binary_join_element_wise(*parts, "")


def grouping_sets_agg(ds, keys: List[str], value_col: str,
                      sets: List[Sequence[int]], n_buckets: int = 32):
    """``GROUP BY GROUPING SETS`` over an int64 measure: one output
    row per group in every requested set (each set = the key INDICES
    kept), with dropped keys NULL and ``gid`` the DuckDB
    ``GROUPING()`` bitmask (bit i set ⇔ ``keys[i]`` aggregated away,
    ``keys[0]`` most significant).

    Map-side: each batch emits Arrow ``group_by`` partials for EVERY
    set (set row counts are bounded by the set's group count,
    not the batch's row count), so the single exchange moves
    group-scale rows. In-bucket: one multi-column Arrow ``group_by``
    merges the partials. Output: ``keys..., gid, n_rows, sum_val``.
    """

    def _partials(batch: pa.Table) -> pa.Table:
        out = []
        n_keys = len(keys)
        base = batch.select(keys + [value_col])
        for kept in sets:
            kept_set = set(kept)
            gid = sum(1 << (n_keys - 1 - i) for i in range(n_keys)
                      if i not in kept_set)
            grouped = base.group_by(
                [keys[i] for i in kept]).aggregate([
                    (value_col, "sum"), ([], "count_all")])
            arrays, names = [], []
            for i, k in enumerate(keys):
                if i in kept_set:
                    arrays.append(grouped.column(k))
                else:
                    arrays.append(pa.nulls(grouped.num_rows,
                                           base.schema.field(k).type))
                names.append(k)
            arrays.append(pa.array(
                np.full(grouped.num_rows, gid, np.int64)))
            names.append("gid")
            arrays.append(pc.cast(grouped.column("count_all"),
                                  pa.int64()))
            names.append("n_rows")
            arrays.append(pc.cast(grouped.column(f"{value_col}_sum"),
                                  pa.int64()))
            names.append("sum_val")
            out.append(pa.table(dict(zip(names, arrays))))
        merged = pa.concat_tables(out)
        from ..functions.hashing import bucket_ids

        comp = _composite_key(merged, ["gid"] + keys)
        return merged.append_column("_bucket", pa.array(
            bucket_ids(comp, n_buckets), pa.int64()))

    def _merge(group: pa.Table) -> pa.Table:
        # merge partials on the sentinel-encoded composite STRING, not
        # the raw key columns: after Ray's shuffle the fixed-width key
        # arrays can carry arbitrary bytes under null slots, and
        # pyarrow's hash group_by has been observed to split such
        # all-null groups by those invisible bytes. String identity
        # sees only real bytes, so it is immune; sums are numpy
        # (order-free int64).
        base = group.drop_columns(["_bucket"])
        if base.num_rows == 0:
            return base
        comp = _composite_key(base, ["gid"] + keys)
        if isinstance(comp, pa.ChunkedArray):
            comp = comp.combine_chunks()
        enc = pc.dictionary_encode(comp)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        n_groups = len(enc.dictionary)
        n_rows = np.zeros(n_groups, np.int64)
        np.add.at(n_rows, codes,
                  base.column("n_rows").combine_chunks().to_numpy())
        sum_val = np.zeros(n_groups, np.int64)
        np.add.at(sum_val, codes,
                  base.column("sum_val").combine_chunks().to_numpy())
        # one representative row per group carries the key values
        _, first_idx = np.unique(codes, return_index=True)
        rows = base.take(pa.array(first_idx, pa.int64()))
        rcodes = codes[first_idx]
        return pa.table({
            **{k: rows.column(k) for k in keys},
            "gid": rows.column("gid"),
            "n_rows": pa.array(n_rows[rcodes], pa.int64()),
            "sum_val": pa.array(sum_val[rcodes], pa.int64()),
        })

    return ds.map_batches(
        _partials, batch_format="pyarrow"
    ).groupby("_bucket", num_partitions=n_buckets).map_groups(
        _merge, batch_format="pyarrow")


def rollup_agg(ds, keys: List[str], value_col: str,
               n_buckets: int = 32):
    """``GROUP BY ROLLUP(keys...)``: the prefix grouping sets
    ``(k1..kn), (k1..k n-1), …, ()``. See ``grouping_sets_agg``."""
    sets = [list(range(level)) for level in range(len(keys), -1, -1)]
    return grouping_sets_agg(ds, keys, value_col, sets,
                             n_buckets=n_buckets)


def cube_agg(ds, keys: List[str], value_col: str,
             n_buckets: int = 32):
    """``GROUP BY CUBE(keys...)``: ALL ``2^n`` key subsets as
    grouping sets (the full OLAP cube). Each batch emits one Arrow
    ``group_by`` partial per subset, so the exchange still moves
    group-scale rows — the ``2^n`` factor multiplies the (bounded)
    distinct-group partials, never the event rows; with the usual
    n ≤ 3-4 cube dimensions this is a small constant.
    See ``grouping_sets_agg``."""
    n = len(keys)
    sets = [[i for i in range(n) if mask & (1 << i)]
            for mask in range(1 << n)]
    return grouping_sets_agg(ds, keys, value_col, sets,
                             n_buckets=n_buckets)


def pivot_counts(ds, row_col: str, col_col: str,
                 col_values: Sequence[str], n_buckets: int = 32,
                 strict: bool = True):
    """Wide aggregate (PIVOT): one row per ``row_col`` value, one
    int64 count column ``n_<v>`` per entry of ``col_values``.

    ``col_values`` is the FIXED output column set; with
    ``strict=True`` (default) an unseen ``col_col`` value raises —
    never a silent drop. Map-side (row, col) count partials → one
    row-bucket shuffle → in-bucket vectorized matrix fill
    (``np.add.at`` over row×col codes).
    """
    from ..functions.hashing import bucket_ids

    vals = list(col_values)

    def _partials(batch: pa.Table) -> pa.Table:
        g = batch.select([row_col, col_col]).group_by(
            [row_col, col_col]).aggregate([([], "count_all")])
        if strict and g.num_rows:
            seen = pc.is_in(g.column(col_col),
                            value_set=pa.array(vals, pa.string()))
            if not pc.all(pc.fill_null(seen, False)).as_py():
                bad = g.filter(pc.invert(pc.fill_null(seen, False)))
                raise ValueError(
                    "pivot_counts: unexpected column values "
                    f"{sorted(set(bad.column(col_col).to_pylist()))}")
        out = pa.table({
            row_col: g.column(row_col),
            col_col: g.column(col_col),
            "cnt": pc.cast(g.column("count_all"), pa.int64()),
        })
        return out.append_column("_bucket", pa.array(
            bucket_ids(out.column(row_col), n_buckets), pa.int64()))

    def _widen(group: pa.Table) -> pa.Table:
        base = group.drop_columns(["_bucket"])
        row_type = base.schema.field(row_col).type
        if base.num_rows == 0:
            return pa.table({
                row_col: pa.array([], row_type),
                **{f"n_{v}": pa.array([], pa.int64()) for v in vals},
            })
        renc = pc.dictionary_encode(
            base.column(row_col).combine_chunks())
        rcodes = renc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        ccodes = pc.index_in(
            base.column(col_col).combine_chunks(),
            value_set=pa.array(vals, pa.string()),
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        cnts = base.column("cnt").combine_chunks().to_numpy(
            zero_copy_only=False)
        mat = np.zeros((len(renc.dictionary), len(vals)), np.int64)
        np.add.at(mat, (rcodes, ccodes), cnts)
        return pa.table({
            row_col: renc.dictionary,
            **{f"n_{v}": pa.array(mat[:, j], pa.int64())
               for j, v in enumerate(vals)},
        })

    return ds.map_batches(
        _partials, batch_format="pyarrow"
    ).groupby("_bucket", num_partitions=n_buckets).map_groups(
        _widen, batch_format="pyarrow")
