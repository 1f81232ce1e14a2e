"""Join operators: broadcast hash join + bucketed repartition join.

The reference has no joins (SURVEY.md §2.4), but its engine recast
needs them as first-class tools for the wider training-data workload
(enrichment lookups, candidate verification, star-schema rollups).
Two strategies, mirroring the shapes already proven inside the
jaccard verifier (`stages/dedup.jaccard_dup_pairs`):

* :func:`broadcast_join` — the small side is materialized ONCE into
  the object store (``ray.put``), deserialized once per worker
  process (cached), and dict-joined inside ``map_batches``. Zero
  shuffles; right whenever one side fits in a worker's heap. This is
  the 100-TB default for dimension/lookup tables.
* :func:`repartition_join` — no memory assumption: both sides are
  co-shuffled by ``crc32(key) % n_buckets`` through a union + ONE
  groupby, and each whole-bucket UDF builds a dict of the right side
  and probes the left (never a per-key group). Shuffle volume = both
  sides, once.

Both are inner joins by default; ``how="left"`` keeps unmatched left
rows with nulls.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import pyarrow as pa

# per-worker cache for broadcast join maps (workers persist across
# tasks; deserialize once per worker, not once per batch)
_JOIN_MAP_CACHE: Dict[str, Dict] = {}


def _right_map_from_refs(refs, key_col: str, cols: List[str]):
    import ray

    cache_key = refs[0].hex() if refs else ""
    jmap = _JOIN_MAP_CACHE.get(cache_key)
    if jmap is None:
        jmap = {}
        for blk in ray.get(list(refs)):
            keys = blk.column(key_col).to_pylist()
            vals = [blk.column(c).to_pylist() for c in cols]
            for i, k in enumerate(keys):
                jmap[k] = tuple(v[i] for v in vals)
        _JOIN_MAP_CACHE.clear()  # hold at most one map per worker
        _JOIN_MAP_CACHE[cache_key] = jmap
    return jmap


def broadcast_join(ds, right, on: str, right_cols: Optional[List[str]] = None,
                   how: str = "inner", suffix: str = "_r"):
    """Join ``ds`` against a SMALL dataset/table ``right`` on ``on``.

    ``right`` may be a ``ray.data.Dataset`` or a ``pyarrow.Table``;
    it is broadcast via the object store and hash-probed per batch.
    ``right_cols`` selects which right-side columns to append
    (default: all but the key); name collisions get ``suffix``.
    Duplicate right keys keep the LAST row (dict semantics) — use a
    pre-deduped dimension table when that matters.
    """
    import ray
    import ray.data

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    if isinstance(right, pa.Table):
        right_tbl = right
    else:
        right_tbl = pa.concat_tables(
            right.iter_batches(batch_format="pyarrow", batch_size=None)
        )
    cols = right_cols or [c for c in right_tbl.column_names if c != on]
    types = {c: right_tbl.schema.field(c).type for c in cols}
    refs = (ray.put(right_tbl.select([on] + cols)),)

    def _probe(batch: pa.Table) -> pa.Table:
        jmap = _right_map_from_refs(refs, on, cols)
        keys = batch.column(on).to_pylist()
        hits = [jmap.get(k) for k in keys]
        if how == "inner":
            mask = [h is not None for h in hits]
            if not all(mask):
                batch = batch.filter(pa.array(mask))
                hits = [h for h in hits if h is not None]
        out = batch
        for j, c in enumerate(cols):
            name = c if c not in out.column_names else c + suffix
            out = out.append_column(
                name,
                pa.array([h[j] if h is not None else None for h in hits],
                         types[c]),
            )
        return out

    return ds.map_batches(_probe, batch_format="pyarrow")


def repartition_join(left, right, on: str,
                     right_cols: Optional[List[str]] = None,
                     how: str = "inner", suffix: str = "_r",
                     n_buckets: int = 64):
    """Large-large join: co-shuffle both sides by a crc32 key bucket.

    Union + one groupby on the bucket; each whole-bucket UDF builds a
    dict of its right-side rows and probes its left-side rows — one
    UDF call per bucket, not per key. Duplicate right keys keep the
    last row (same contract as :func:`broadcast_join`).
    """
    from zlib import crc32

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    left_schema = left.schema()
    left_cols = list(left_schema.names)
    left_types = {n: t for n, t in zip(left_schema.names,
                                       left_schema.types)}
    right_schema = right.schema()
    cols = right_cols or [c for c in right_schema.names if c != on]
    right_types = {n: t for n, t in zip(right_schema.names,
                                        right_schema.types)}
    out_names = left_cols + [
        (c if c not in left_cols else c + suffix) for c in cols
    ]
    key_type = left_types[on]

    # union schema: bucket, side, key, then nullable payloads of both
    payload_left = [c for c in left_cols if c != on]
    union_fields = (
        [("_bucket", pa.int64()), ("_side", pa.int32()), (on, key_type)]
        + [(f"_l_{c}", left_types[c]) for c in payload_left]
        + [(f"_r_{c}", right_types[c]) for c in cols]
    )
    union_schema = pa.schema(union_fields)

    def _tag(side: int, payload_names: List[str], prefix: str):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = batch.column(on)
            buckets = [
                crc32(str(k).encode("utf-8")) % n_buckets
                for k in keys.to_pylist()
            ]
            arrays = {
                "_bucket": pa.array(buckets, pa.int64()),
                "_side": pa.array([side] * n, pa.int32()),
                on: keys,
            }
            for name, typ in union_fields[3:]:
                arrays[name] = pa.nulls(n, typ)
            for c in payload_names:
                arrays[f"{prefix}{c}"] = batch.column(c)
            return pa.table(
                {name: arrays[name] for name, _ in union_fields},
                schema=union_schema,
            )
        return _fn

    tagged_left = left.map_batches(
        _tag(0, payload_left, "_l_"), batch_format="pyarrow")
    tagged_right = right.select_columns([on] + cols).map_batches(
        _tag(1, cols, "_r_"), batch_format="pyarrow")

    def _join_bucket(group: pa.Table) -> pa.Table:
        sides = group.column("_side").to_pylist()
        keys = group.column(on).to_pylist()
        rmap: Dict = {}
        rcols_data = [group.column(f"_r_{c}").to_pylist() for c in cols]
        for i, s in enumerate(sides):
            if s == 1:
                rmap[keys[i]] = tuple(col[i] for col in rcols_data)
        lcols_data = {
            c: group.column(f"_l_{c}").to_pylist() for c in payload_left
        }
        out: Dict[str, list] = {name: [] for name in out_names}
        for i, s in enumerate(sides):
            if s != 0:
                continue
            hit = rmap.get(keys[i])
            if hit is None and how == "inner":
                continue
            for c in left_cols:
                out[c].append(keys[i] if c == on else lcols_data[c][i])
            for j, c in enumerate(cols):
                name = c if c not in left_cols else c + suffix
                out[name].append(hit[j] if hit is not None else None)
        arrays = []
        for name in out_names:
            src = name[:-len(suffix)] if name.endswith(suffix) and \
                name not in left_cols and name[:-len(suffix)] in cols \
                else name
            if name in left_cols:
                typ = left_types[name]
            else:
                typ = right_types[src if src in right_types else name]
            arrays.append(pa.array(out[name], typ))
        return pa.table(dict(zip(out_names, arrays)))

    return tagged_left.union(tagged_right).groupby("_bucket").map_groups(
        _join_bucket, batch_format="pyarrow"
    )


def asof_join(left, right, on: str, ts_col: str = "ts",
              right_cols: Optional[List[str]] = None,
              how: str = "left", suffix: str = "_r",
              n_buckets: int = 64):
    """As-of join: for each left row, the LATEST right row with the
    same key and ``right.ts <= left.ts`` (DuckDB ``ASOF JOIN``
    semantics; the attribution/backfill operator).

    Same physical shape as :func:`repartition_join` — both sides
    co-shuffled once by ``crc32(key) % n_buckets``, then each
    whole-bucket UDF sorts its right rows per key and answers every
    left row with one ``np.searchsorted`` — never a per-key UDF,
    never a sort of the full dataset. Ties on ``right.ts`` keep the
    last row in (ts, input-order) sort order; pass unique (key, ts)
    right rows when that matters.
    """
    import numpy as np
    from zlib import crc32

    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    left_schema = left.schema()
    left_cols = list(left_schema.names)
    left_types = dict(zip(left_schema.names, left_schema.types))
    right_schema = right.schema()
    cols = right_cols or [
        c for c in right_schema.names if c not in (on, ts_col)
    ]
    right_types = dict(zip(right_schema.names, right_schema.types))
    out_names = left_cols + [
        (c if c not in left_cols else c + suffix) for c in cols
    ]
    payload_left = [c for c in left_cols if c != on]

    union_fields = (
        [("_bucket", pa.int64()), ("_side", pa.int32()),
         (on, left_types[on]), ("_ts", left_types[ts_col])]
        + [(f"_l_{c}", left_types[c]) for c in payload_left if c != ts_col]
        + [(f"_r_{c}", right_types[c]) for c in cols]
    )
    union_schema = pa.schema(union_fields)

    def _tag(side: int, payload: List[str], prefix: str):
        def _fn(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            keys = batch.column(on)
            buckets = [
                crc32(str(k).encode("utf-8")) % n_buckets
                for k in keys.to_pylist()
            ]
            arrays = {
                "_bucket": pa.array(buckets, pa.int64()),
                "_side": pa.array([side] * n, pa.int32()),
                on: keys,
                "_ts": batch.column(ts_col),
            }
            for name, typ in union_fields[4:]:
                arrays[name] = pa.nulls(n, typ)
            for c in payload:
                arrays[f"{prefix}{c}"] = batch.column(c)
            return pa.table(
                {name: arrays[name] for name, _ in union_fields},
                schema=union_schema,
            )
        return _fn

    tagged_left = left.map_batches(
        _tag(0, [c for c in payload_left if c != ts_col], "_l_"),
        batch_format="pyarrow")
    tagged_right = right.select_columns(
        [on, ts_col] + cols
    ).map_batches(_tag(1, cols, "_r_"), batch_format="pyarrow")

    def _probe(group: pa.Table) -> pa.Table:
        sides = np.asarray(group.column("_side").to_pylist())
        keys = group.column(on).to_pylist()
        ts = group.column("_ts").combine_chunks().to_numpy().astype(
            "datetime64[us]"
        ).view(np.int64) if pa.types.is_timestamp(
            group.schema.field("_ts").type
        ) else group.column("_ts").combine_chunks().to_numpy()
        # per-key sorted right timestamps + original row indices
        r_by_key: Dict = {}
        r_idx = np.flatnonzero(sides == 1)
        for i in r_idx:
            r_by_key.setdefault(keys[i], []).append(i)
        for k, idxs in r_by_key.items():
            arr = np.asarray(idxs)
            order = np.argsort(ts[arr], kind="stable")
            r_by_key[k] = (ts[arr][order], arr[order])
        rcols_data = [group.column(f"_r_{c}").to_pylist() for c in cols]
        lcols_data = {
            c: group.column(f"_l_{c}").to_pylist()
            for c in payload_left if c != ts_col
        }
        ts_vals = group.column("_ts").to_pylist()
        out: Dict[str, list] = {name: [] for name in out_names}
        for i in np.flatnonzero(sides == 0):
            entry = r_by_key.get(keys[i])
            hit_row = None
            if entry is not None:
                pos = int(np.searchsorted(entry[0], ts[i],
                                          side="right")) - 1
                if pos >= 0:
                    hit_row = int(entry[1][pos])
            if hit_row is None and how == "inner":
                continue
            for c in left_cols:
                if c == on:
                    out[c].append(keys[i])
                elif c == ts_col:
                    out[c].append(ts_vals[i])
                else:
                    out[c].append(lcols_data[c][i])
            for j, c in enumerate(cols):
                name = c if c not in left_cols else c + suffix
                out[name].append(
                    rcols_data[j][hit_row] if hit_row is not None else None
                )
        arrays = []
        for name in out_names:
            if name in left_cols:
                typ = left_types[name]
            else:
                base = name[:-len(suffix)] if name.endswith(suffix) \
                    and name not in right_types else name
                typ = right_types[base]
            arrays.append(pa.array(out[name], typ))
        return pa.table(dict(zip(out_names, arrays)))

    return tagged_left.union(tagged_right).groupby("_bucket").map_groups(
        _probe, batch_format="pyarrow"
    )
