"""Distributed order statistics.

:func:`exact_quantiles` — EXACT percentiles over a
bounded-cardinality column, the corpus-statistics companion to the
KMV distinct-count sketch (`queries.q_approx_distinct_tokens`).

Shape: one map-side ``value_counts`` per batch (the partial
combine), ONE small ``groupby(value).sum`` shuffle over the
DISTINCT-VALUE set, then a driver-side cumsum over that set. The
corpus is touched once, streaming; the only materialized object is
the distinct-value histogram. That is the exactness contract: the
column must have bounded cardinality (discrete scores like the
3-decimal ``hit_ratio``, integer lengths like ``n_chars``, enum-ish
codes) — at 10^12 rows a 10^6-distinct histogram is a few MB. For
genuinely continuous columns, discretize first (then this IS a
fixed-bin quantile sketch with known error = bin width).

Quantile semantics match SQL ``percentile_disc`` / DuckDB
``quantile_disc`` exactly: the element at index
``max(0, ceil(q*n) - 1)`` of the sorted column (verified against
DuckDB; the oracle recomputes it natively).
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def exact_quantiles(ds, col: str, qs: Sequence[float]) -> pa.Table:
    """Exact ``percentile_disc`` quantiles of ``ds[col]``.

    Returns one row per q: ``(q: float64, value: <col type>)``.
    NULLs are ignored (SQL aggregate semantics).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        vc = pc.value_counts(arr.combine_chunks()
                             if isinstance(arr, pa.ChunkedArray) else arr)
        return pa.table({
            "value": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("value").aggregate(Sum("n"))
    )
    tbls = [
        t for t in counts.iter_batches(batch_format="pyarrow",
                                       batch_size=None)
        if t.num_rows
    ]
    if not tbls:
        raise ValueError(f"exact_quantiles: no rows in column {col!r}")
    hist = pa.concat_tables(tbls)
    hist = hist.filter(pc.is_valid(hist.column("value")))
    hist = hist.sort_by([("value", "ascending")])
    values = hist.column("value").combine_chunks()
    cum = np.cumsum(hist.column("sum(n)").to_numpy(zero_copy_only=False))
    n = int(cum[-1]) if len(cum) else 0
    if n == 0:
        raise ValueError(f"exact_quantiles: column {col!r} is all-null")
    picks = []
    for q in qs:
        r = max(0, math.ceil(q * n) - 1)   # percentile_disc index
        picks.append(int(np.searchsorted(cum, r + 1, side="left")))
    return pa.table({
        "q": pa.array(list(qs), pa.float64()),
        "value": values.take(pa.array(picks, pa.int64())),
    })


def grouped_quantiles(ds, key_col: str, col: str,
                      qs: Sequence[float]) -> pa.Table:
    """Exact per-key ``percentile_disc`` quantiles.

    Same contract and shape as :func:`exact_quantiles`, with the
    histogram keyed by ``(key, value)``: one streaming pass, one
    groupby over the per-key distinct-value histogram, driver-side
    cumsum per key. Returns ``(key, q, value)`` rows sorted by
    ``(key, q)``. A key whose value column is entirely NULL has no
    quantiles and is OMITTED (unlike SQL GROUP BY, which would keep
    the group with NULL aggregates — the SQL twin needs
    ``HAVING count(col) > 0`` to match).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        sub = pa.table({
            "key": batch.column(key_col),
            "value": batch.column(col),
        })
        sub = sub.filter(pc.is_valid(sub.column("value")))
        agg = sub.group_by(["key", "value"]).aggregate([([], "count_all")])
        return pa.table({
            "key": agg.column("key"),
            "value": agg.column("value"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    counts = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["key", "value"]).aggregate(Sum("n"))
    )
    tbls = [
        t for t in counts.iter_batches(batch_format="pyarrow",
                                       batch_size=None)
        if t.num_rows
    ]
    key_type = ds.schema().types[ds.schema().names.index(key_col)]
    val_type = ds.schema().types[ds.schema().names.index(col)]
    if not tbls:
        return pa.table({
            "key": pa.array([], key_type),
            "q": pa.array([], pa.float64()),
            "value": pa.array([], val_type),
        })
    hist = pa.concat_tables(tbls).sort_by(
        [("key", "ascending"), ("value", "ascending")]
    )
    keys = hist.column("key").combine_chunks().to_numpy(
        zero_copy_only=False)
    values = hist.column("value").combine_chunks()
    ns = hist.column("sum(n)").to_numpy(zero_copy_only=False)

    from ..functions.segments import key_segments

    seg_start, seg_len = key_segments(keys)
    out_key_idx = []
    out_q = []
    out_val_idx = []
    for s, ln in zip(seg_start, seg_len):
        cum = np.cumsum(ns[s:s + ln])
        n = int(cum[-1])
        for q in qs:
            r = max(0, math.ceil(q * n) - 1)
            out_key_idx.append(int(s))
            out_q.append(q)
            out_val_idx.append(
                int(s) + int(np.searchsorted(cum, r + 1, side="left"))
            )
    take = pa.array(out_val_idx, pa.int64())
    return pa.table({
        "key": hist.column("key").take(
            pa.array(out_key_idx, pa.int64())),
        "q": pa.array(out_q, pa.float64()),
        "value": values.take(take),
    })


def partial_sum_count(batch: pa.Table, keys: Sequence[str],
                      value_col: str, sum_name: str = "sum_value",
                      count_name: str = "n_events") -> pa.Table:
    """Map-side partial combine: ONE vectorized Arrow ``group_by``
    per batch reducing ``(keys → count, sum(value))`` — the shuffle
    then carries keys × blocks rows, never raw rows. Shared by every
    grouped-aggregate query (sum of partial counts/sums is exact;
    float summation order changes only below the queries' 1e-6
    grids)."""
    import pyarrow.compute as pc

    agg = batch.select(list(keys) + [value_col]).group_by(
        list(keys)
    ).aggregate([(value_col, "sum"), ([], "count_all")])
    cols = {k: agg.column(k) for k in keys}
    cols[count_name] = pc.cast(agg.column("count_all"), pa.int64())
    cols[sum_name] = agg.column(f"{value_col}_sum")
    return pa.table(cols)


# per-block total marker for heavy_hitters: contains spaces, so no
# space-split token can ever equal it
_TOTAL_SENTINEL = " __block_total__ "


def heavy_hitters(ds, text_col: str = "text",
                  min_frac_num: int = 5, min_frac_den: int = 1000,
                  max_candidates: int = 2_000_000):
    """EXACT frequent tokens: every token with corpus frequency
    ``>= min_frac_num/min_frac_den`` of all tokens, with its exact
    count. Two streaming passes, shuffle bounded by the CANDIDATE
    set — never the vocabulary.

    The scale story vs the full-vocab partial combine
    (`queries.q_top_tokens`): that shape shuffles (vocab × blocks)
    partial rows; here pass 1 applies the LOCAL threshold
    ``count_b * den >= num * n_b`` inside each block (a token with
    global fraction >= num/den must clear it in at least one block —
    if it missed everywhere, summing gives count < (num/den) * N,
    contradiction), so only locally-heavy tokens (at most den/num
    per block) plus one total-row per block ever leave the block.
    Pass 2 broadcasts the deduped candidate set (``ray.put`` once,
    ``pc.is_in`` per batch) and counts ONLY candidates exactly via
    the usual partial-combine groupby, then filters by the exact
    global threshold ``count * den >= num * N``. All integer
    arithmetic — no float threshold drift vs the SQL oracle.

    The candidate set is driver-held between passes (bounded by
    ``blocks * den/num``); ``max_candidates`` turns a mis-sized
    threshold into a loud error instead of a silent OOM.

    Null texts are skipped; empty texts count one '' token (DuckDB
    ``string_split`` parity).
    """
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def _tokens(batch: pa.Table) -> pa.Array:
        col = batch.column(text_col)
        col = col.filter(pc.is_valid(col))
        parts = pc.split_pattern(col, " ").combine_chunks()
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.chunk(0) if parts.num_chunks else pa.array(
                [], pa.list_(pa.string()))
        return parts.values

    def _local_heavy(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch)
        n_b = len(toks)
        if n_b == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        g = pa.table({"token": toks}).group_by("token").aggregate(
            [([], "count_all")])
        cnt = pc.cast(g.column("count_all"), pa.int64())
        keep = pc.greater_equal(
            pc.multiply(cnt, pa.scalar(min_frac_den, pa.int64())),
            pa.scalar(min_frac_num * n_b, pa.int64()),
        )
        out = pa.table({"token": g.column("token"), "cnt": cnt}
                       ).filter(keep)
        # the per-block token total rides along under a sentinel key
        # that cannot collide with a real token (tokens are
        # space-split, the sentinel contains spaces); Ray's
        # sort-based aggregate cannot shuffle a null key
        return pa.concat_tables([out, pa.table({
            "token": pa.array([_TOTAL_SENTINEL], pa.string()),
            "cnt": pa.array([n_b], pa.int64()),
        })])

    partial = ds.map_batches(_local_heavy, batch_format="pyarrow")
    merged = partial.groupby("token").aggregate(Sum("cnt")).take_all()
    n_total = 0
    cand = []
    for row in merged:
        if row["token"] == _TOTAL_SENTINEL:
            n_total = row["sum(cnt)"]
        else:
            cand.append(row["token"])
    if len(cand) > max_candidates:
        raise ValueError(
            f"heavy_hitters: {len(cand)} candidates exceed "
            f"max_candidates={max_candidates}; raise the threshold "
            f"or the cap")
    cand_ref = ray.put(pa.array(sorted(cand), pa.string()))

    def _count_cand(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch)
        toks = toks.filter(pc.is_in(toks, value_set=ray.get(cand_ref)))
        if len(toks) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"token": toks}).group_by("token").aggregate(
            [([], "count_all")])
        return pa.table({
            "token": g.column("token"),
            "n": pc.cast(g.column("count_all"), pa.int64()),
        })

    exact = ds.map_batches(_count_cand, batch_format="pyarrow"
                           ).groupby("token").aggregate(Sum("n"))

    def _finish(batch: pa.Table) -> pa.Table:
        n = batch.column("sum(n)")
        keep = pc.greater_equal(
            pc.multiply(n, pa.scalar(min_frac_den, pa.int64())),
            pa.scalar(min_frac_num * n_total, pa.int64()),
        )
        return pa.table({"token": batch.column("token"),
                         "n": pc.cast(n, pa.int64())}).filter(keep)

    return exact.map_batches(_finish, batch_format="pyarrow")


def weighted_sample(ds, key_col: str, weight_col: str, scale: int):
    """Deterministic weighted Bernoulli sample: keep a row with
    probability ``min(1, weight / scale)`` — no RNG, reproducible
    across runs and block layouts, dup-safe (same key → same fate).

    The coin is ``md5(key)[:8]`` mapped to [0, 1): a row survives iff
    ``hash_32 * scale < weight * 2^32`` (pure int64 comparison — no
    float rounding ambiguity at the threshold). Row-local predicate:
    prunes at scan speed, no shuffle, exactly reproducible in SQL.

    This is the quality-proportional carve ("sample long/high-score
    docs more") complementing the uniform stratified sample
    (`queries.q_stratified_sample`).
    """
    import hashlib

    import pyarrow.compute as pc

    def _fn(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        hs = np.fromiter(
            (int(hashlib.md5(str(k).encode("utf-8")).hexdigest()[:8],
                 16) for k in keys),
            dtype=np.uint64, count=len(keys),
        ).astype(np.int64)
        w = batch.column(weight_col).combine_chunks() \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hs * int(scale) < w * 4294967296
        return batch.filter(pa.array(keep))

    return ds.map_batches(_fn, batch_format="pyarrow")


def mix_sample(ds, group_col: str, weights: dict, key_col: str):
    """Deterministic data-mix rebalancer: downsample groups so the
    output approximates target proportions ``weights`` (a training
    "data mixing" pass — e.g. rebalance languages or sources before
    shard writing).

    Let ``W = sum(weights)``, ``n_g`` the exact group counts (one
    map-side-combined aggregate over the group column only). The
    largest feasible output honoring the mix caps every group at its
    share of ``T = min_g floor(n_g * W / w_g)`` rows; each group then
    keeps rows with acceptance rate ``r_g = (T * w_g * 2^32) //
    (W * n_g)`` via the repo's integer hash-coin
    (``md5_32(key) < r_g`` — dup-safe, layout-independent, no RNG,
    exactly reproducible in SQL; see :func:`weighted_sample`).
    Keeps are Bernoulli, so realized counts are binomial around the
    target — the standard trade for a one-pass, shuffle-free mix.

    Groups missing from ``weights`` (and NULL groups) are dropped —
    an explicit mix is also a whitelist. Weight 0 drops the group but
    does not constrain ``T``.
    """
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if not weights or all(w == 0 for w in weights.values()):
        raise ValueError("weights must contain a positive target")

    def _counts(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column(group_col).combine_chunks())
        keys, counts = vc.field("values"), vc.field("counts")
        valid = pc.is_valid(keys)
        return pa.table({
            group_col: keys.filter(valid),
            "n": pc.cast(counts.filter(valid), pa.int64()),
        })

    n_g = {
        r[group_col]: r["sum(n)"]
        for r in ds.select_columns([group_col])
        .map_batches(_counts, batch_format="pyarrow")
        .groupby(group_col).aggregate(Sum("n")).take_all()
    }
    w_total = sum(weights.values())
    t_out = min(
        (n_g.get(g, 0) * w_total) // w
        for g, w in weights.items() if w > 0
    )
    rates = {
        g: min(2 ** 32, (t_out * w * 4294967296) // (w_total * n_g[g]))
        for g, w in weights.items() if w > 0 and n_g.get(g, 0) > 0
    }

    def _keep(batch: pa.Table) -> pa.Table:
        groups = batch.column(group_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        thresholds = np.fromiter(
            (rates.get(g, 0) for g in groups), dtype=np.int64,
            count=len(groups))
        hs = np.fromiter(
            (int(hashlib.md5(str(k).encode("utf-8")).hexdigest()[:8],
                 16) for k in keys),
            dtype=np.uint64, count=len(keys),
        ).astype(np.int64)
        return batch.filter(pa.array(hs < thresholds))

    return ds.map_batches(_keep, batch_format="pyarrow")


def hash_sample_exact(ds, k: int, key_col: str = "doc_id",
                      hash_col: str = "_h"):
    """Deterministic uniform sample of EXACTLY ``k`` rows.

    ``stratified/weighted_sample`` are threshold samplers — output
    size is only approximate. Eval-set carving often needs an exact
    row count; this is the distributed "ORDER BY md5(key) LIMIT k":

    1. per block, a vectorized LOCAL top-k by ``(md5(key), key)`` —
       only blocks × k candidate rows survive the scan;
    2. one tiny global sort+limit over the candidates.

    Deterministic across runs and block layouts (hash order is a
    pure function of the key; the key itself breaks md5-prefix
    ties). Candidates = blocks × k rows — fine for the eval-set
    regime (k up to ~10^6); for larger k use the threshold samplers.
    The md5 is over ``str(key)``, matching the DuckDB twin
    ``ORDER BY md5(CAST(key AS VARCHAR)), key LIMIT k``.
    """
    import hashlib

    def _local_topk(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null keys are unsampleable (and would poison the global
        # sort — Ray 2.49 null-sort-key hazard): drop them up front
        batch = batch.filter(pc.is_valid(batch.column(key_col)))
        keys = batch.column(key_col).to_pylist()
        hs = [
            hashlib.md5(str(x).encode("utf-8")).hexdigest()
            for x in keys
        ]
        order = sorted(range(len(hs)), key=lambda i: (hs[i], keys[i]))
        head = pa.array(order[:k], pa.int64())
        out = batch.take(head)
        return out.append_column(
            hash_col, pa.array([hs[i] for i in order[:k]], pa.string()))

    cands = ds.map_batches(_local_topk, batch_format="pyarrow")
    return (
        cands.sort([hash_col, key_col]).limit(k)
        .drop_columns([hash_col])
    )


def binned_quantiles(ds, col: str, qs: Sequence[float], lo: int,
                     bin_width: int, n_bins: int) -> pa.Table:
    """Fixed-bin quantile SKETCH — the scale path for columns where
    :func:`exact_quantiles`'s bounded-cardinality contract fails.

    Integer binning ``b = clamp((x - lo) // bin_width, 0, n_bins-1)``
    (int64 floor division — reproducible bit-exactly in SQL); each
    block contributes one ``np.bincount`` histogram partial and the
    driver folds them (``n_bins`` ints per block — NO shuffle at
    all, unlike the exact operator's distinct-value groupby).
    The estimate for quantile q is the INCLUSIVE UPPER EDGE
    ``lo + (b+1)*bin_width - 1`` of the bin holding the
    ``percentile_disc`` index — error ≤ ``bin_width`` by
    construction, mergeable across corpora by adding histograms.
    NULLs are ignored (SQL aggregate semantics).

    Returns one row per q: ``(q: float64, value_est: int64)``.
    """
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.filter(pc.is_valid(arr))
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.clip((v - lo) // bin_width, 0, n_bins - 1)
        hist = np.bincount(b, minlength=n_bins).astype(np.int64)
        return pa.table({
            "b": pa.array(np.arange(n_bins, dtype=np.int64)),
            "n": pa.array(hist),
        })

    hist = np.zeros(n_bins, dtype=np.int64)
    for t in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        hist[t.column("b").to_numpy(zero_copy_only=False)] += (
            t.column("n").to_numpy(zero_copy_only=False))
    cum = np.cumsum(hist)
    n = int(cum[-1]) if n_bins else 0
    if n == 0:
        raise ValueError(f"binned_quantiles: column {col!r} is all-null")
    out_q, out_v = [], []
    for q in qs:
        r = max(0, math.ceil(q * n) - 1)   # percentile_disc index
        b = int(np.searchsorted(cum, r + 1, side="left"))
        out_q.append(q)
        out_v.append(lo + (b + 1) * bin_width - 1)
    return pa.table({
        "q": pa.array(out_q, pa.float64()),
        "value_est": pa.array(out_v, pa.int64()),
    })


def grouped_distinct_count(ds, key_col: str, value_col: str,
                           out_col: str = "n_distinct",
                           n_buckets: int = 64):
    """EXACT ``COUNT(DISTINCT value) GROUP BY key`` in one shuffle.

    Phase 1 (map-side): each block dedups its (key, value) pairs, so
    the shuffle carries blocks x block-distinct pairs, never raw
    rows — a hot key whose duplicate values repeat within blocks
    collapses BEFORE it moves. Phase 2: pairs co-shuffle by
    ``bucket_ids(key)`` (key-hash, so every pair of a key meets in
    exactly one bucket); the whole-bucket UDF dedups pairs globally
    and counts valid values per key — final rows, no second
    exchange.

    Semantics match SQL: NULL values are never counted
    (``COUNT(DISTINCT v)`` ignores NULL) but an all-NULL key still
    appears with count 0, exactly like ``GROUP BY``; NULL keys form
    their own group.

    Dedup identity is a sentinel-encoded composite STRING
    (``rollup._composite_key`` — same contract: cast output must not
    contain the \\x00/\\x1f sentinels, true for numeric/timestamp
    and real-text keys) dictionary-encoded to dense codes +
    ``np.unique`` first-occurrence take — NEVER a pyarrow
    ``group_by`` on the nullable columns themselves: pyarrow 16's
    hash group_by splits groups with NULL slots by the garbage bytes
    under them (measurably: one whole-table group_by on 300 rows of
    (nullable string, nullable int64) returned 27 "distinct" pairs
    for 23), and Ray's sort shares the null-key hazard.

    Scale note: a key's DISTINCT-value set lands in one bucket (that
    is what makes the count exact in one pass); per-bucket cost is
    bounded by distinct pairs per bucket, not row count. For
    sketch-grade cardinalities use the KMV estimator instead.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids
    from .rollup import _composite_key

    def _dedup_pairs(sub: pa.Table) -> pa.Table:
        if not sub.num_rows:
            return sub
        ck = _composite_key(sub, ["k", "v"])
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        codes = pc.dictionary_encode(ck).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        _, first = np.unique(codes, return_index=True)
        return sub.take(pa.array(first, pa.int64()))

    def _local(batch: pa.Table) -> pa.Table:
        # NULL values are KEPT (collapsed to one (k, NULL) pair per
        # block) so an all-NULL key still reaches its bucket and
        # comes out with count 0, matching SQL GROUP BY
        sub = _dedup_pairs(pa.table({
            "k": batch.column(key_col),
            "v": batch.column(value_col),
        }))
        return pa.table({
            "_bucket": pa.array(
                bucket_ids(sub.column("k"), n_buckets), pa.int64()),
            "k": sub.column("k"),
            "v": sub.column("v"),
        })

    def _bucket(group: pa.Table) -> pa.Table:
        pairs = _dedup_pairs(group.select(["k", "v"]).combine_chunks())
        kck = _composite_key(pairs, ["k"])
        if isinstance(kck, pa.ChunkedArray):
            kck = kck.combine_chunks()
        kcodes = pc.dictionary_encode(kck).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        valid = pc.is_valid(pairs.column("v")).to_numpy(
            zero_copy_only=False)
        n_codes = int(kcodes.max()) + 1 if len(kcodes) else 0
        cnt = np.bincount(
            kcodes, weights=valid.astype(np.float64),
            minlength=max(n_codes, 1)).astype(np.int64)
        # dictionary codes are dense 0..n-1, so np.unique's sorted
        # uniques == arange(n_codes) and `first` aligns with `cnt`
        _, first = np.unique(kcodes, return_index=True)
        return pa.table({
            key_col: pairs.column("k").take(
                pa.array(first, pa.int64())),
            out_col: pa.array(cnt[:n_codes], pa.int64()),
        })

    return ds.map_batches(_local, batch_format="pyarrow").groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_bucket, batch_format="pyarrow")


def grouped_moments(ds, key_col: str, value_col: str):
    """Per-key count / mean / sample variance via SUFFICIENT
    STATISTICS: each block contributes one ``(key, n, sum, sumsq)``
    partial row (Arrow ``group_by``), ONE tiny per-key groupby sums
    them, and the driver-scale finish computes
    ``mean = s1/n`` and ``var_samp = (s2 - s1^2/n) / (n-1)``.
    The corpus is touched once and the shuffle carries keys x blocks
    rows — the same contract as ``partial_sum_count``, extended to
    second moments.

    SQL parity: NULL values are ignored (``n`` counts valid values
    only, like ``count(value)``); a key with ``n == 0`` keeps its
    group with NULL mean/variance; ``n == 1`` yields NULL
    ``var_samp``. Keys must be non-null (pre-filter or fill a
    sentinel — the Ray groupby null-key hazard).

    Numerical note: the textbook ``s2 - s1^2/n`` form is exact
    enough here because downstream comparison happens on a 1e-6
    grid after floor-rounding (the repo-wide float contract); for
    ill-conditioned data (mean >> stddev) switch to a shifted-value
    pass using any per-key pivot.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        sq = pc.multiply(v, v)
        sub = pa.table({
            "key": batch.column(key_col),
            "v": v,
            "v2": sq,
        })
        agg = sub.group_by(["key"]).aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")])
        return pa.table({
            key_col: agg.column("key"),
            "n": pc.cast(agg.column("v_count"), pa.int64()),
            "s1": agg.column("v_sum"),
            "s2": agg.column("v2_sum"),
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n"), Sum("s1"), Sum("s2"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        import numpy as np

        n = batch.column("sum(n)").to_numpy(zero_copy_only=False)
        s1 = batch.column("sum(s1)").to_numpy(zero_copy_only=False)
        s2 = batch.column("sum(s2)").to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            mean = s1 / n
            var = (s2 - s1 * s1 / n) / (n - 1)
        # var_samp never goes negative through float cancellation
        var = np.maximum(var, 0.0)
        return pa.table({
            key_col: batch.column(key_col),
            "n": pa.array(n, pa.int64()),
            "mean_value": pa.array(mean, pa.float64(),
                                   mask=(n == 0)),
            "var_value": pa.array(var, pa.float64(),
                                  mask=(n < 2)),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def grouped_corr(ds, key_col: str, x_col: str, y_col: str):
    """Per-key Pearson correlation via SUFFICIENT STATISTICS: each
    block contributes one ``(key, n, sx, sy, sxx, syy, sxy)`` partial
    row (Arrow ``group_by``), ONE tiny per-key groupby sums them, and
    the key-scale finish computes
    ``r = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))``.
    The corpus is touched once; the shuffle carries keys x blocks
    rows — the ``grouped_moments`` contract extended to cross
    moments.

    SQL parity (``corr(x, y)``): rows where EITHER side is NULL are
    ignored; keys with ``n < 2`` or a zero-variance side yield NULL.
    Downstream comparison happens on the repo-wide 1e-6 grid, which
    absorbs the ulp-level differences between this two-pass form and
    DuckDB's streaming update formula.
    """
    import numpy as np
    import pyarrow.compute as pc

    agg = _cross_moments(ds, key_col, x_col, y_col)

    def _finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sx = batch.column("sx").to_numpy(zero_copy_only=False)
        sy = batch.column("sy").to_numpy(zero_copy_only=False)
        sxx = batch.column("sxx").to_numpy(zero_copy_only=False)
        syy = batch.column("syy").to_numpy(zero_copy_only=False)
        sxy = batch.column("sxy").to_numpy(zero_copy_only=False)
        # float cancellation can push a zero variance slightly negative
        vx = np.maximum(n * sxx - sx * sx, 0.0)
        vy = np.maximum(n * syy - sy * sy, 0.0)
        denom = np.sqrt(vx * vy)
        bad = (n < 2) | (denom == 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            r = (n * sxy - sx * sy) / denom
        return pa.table({
            key_col: batch.column(key_col),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "corr_xy": pa.array(np.where(bad, 0.0, r), pa.float64(),
                                mask=bad),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def _cross_moments(ds, key_col: str, x_col: str, y_col: str):
    """Shared sufficient-statistics plan for the per-key bivariate
    family (:func:`grouped_corr`, :func:`grouped_ols`): block-local
    Arrow ``group_by`` partials of ``(n, sx, sy, sxx, syy, sxy)``
    then ONE key-scale groupby sum. Rows with a NULL on either side
    are ignored (SQL ``corr``/``regr_*`` semantics).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        x = pc.cast(batch.column(x_col), pa.float64())
        y = pc.cast(batch.column(y_col), pa.float64())
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        sub = pa.table({
            "key": batch.column(key_col),
            "x": x, "y": y,
            "xx": pc.multiply(x, x),
            "yy": pc.multiply(y, y),
            "xy": pc.multiply(x, y),
        }).filter(ok)
        agg = sub.group_by(["key"]).aggregate(
            [("x", "count"), ("x", "sum"), ("y", "sum"),
             ("xx", "sum"), ("yy", "sum"), ("xy", "sum")])
        return pa.table({
            key_col: agg.column("key"),
            "n": pc.cast(agg.column("x_count"), pa.int64()),
            "sx": agg.column("x_sum"), "sy": agg.column("y_sum"),
            "sxx": agg.column("xx_sum"), "syy": agg.column("yy_sum"),
            "sxy": agg.column("xy_sum"),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .aggregate(Sum("n", alias_name="n"),
                   Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"),
                   Sum("sxx", alias_name="sxx"),
                   Sum("syy", alias_name="syy"),
                   Sum("sxy", alias_name="sxy"))
    )


def grouped_ols(ds, key_col: str, x_col: str, y_col: str):
    """Per-key simple linear regression (trend detection): the SQL
    ``regr_slope`` / ``regr_intercept`` pair from the SAME
    sufficient-statistic plan as :func:`grouped_corr` — one pass, one
    key-scale groupby, finish is
    ``slope = (n·sxy − sx·sy) / (n·sxx − sx²)``,
    ``intercept = (sy − slope·sx) / n``. At web scale this is the
    per-host / per-type drift monitor (is quality sinking over crawl
    time?) for the cost of an aggregate.

    NULL-x/y rows are ignored; keys with ``n < 1`` or zero x-variance
    yield NULL slope/intercept (``regr_slope`` semantics). Callers
    should feed SMALL x values (day index, not raw epoch): the
    two-pass normal-equation form loses precision when ``x`` has a
    huge common offset — the slope is shift-invariant, so shift.
    """
    import numpy as np
    import pyarrow.compute as pc

    agg = _cross_moments(ds, key_col, x_col, y_col)

    def _finish(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        sx = batch.column("sx").to_numpy(zero_copy_only=False)
        sy = batch.column("sy").to_numpy(zero_copy_only=False)
        sxx = batch.column("sxx").to_numpy(zero_copy_only=False)
        sxy = batch.column("sxy").to_numpy(zero_copy_only=False)
        vx = n * sxx - sx * sx
        bad = (n < 1) | (vx <= 0.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / vx
            intercept = (sy - slope * sx) / n
        return pa.table({
            key_col: batch.column(key_col),
            "n": pc.cast(batch.column("n"), pa.int64()),
            "slope": pa.array(np.where(bad, 0.0, slope),
                              pa.float64(), mask=bad),
            "intercept": pa.array(np.where(bad, 0.0, intercept),
                                  pa.float64(), mask=bad),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def cms_sketch(ds, text_col: str = "text", width: int = 1024,
               depth: int = 4):
    """Count-Min sketch of the corpus token frequency — the
    MERGEABLE approximate-counts structure (Cormode & Muthukrishnan
    2005): ``depth`` hash rows x ``width`` counters;
    ``est(t) = min_r counter[r][h_r(t)] >= true(t)``, overestimate
    only, error bounded by collisions (~N/width per row, take the
    min across rows).

    Fully deterministic and SQL-twinnable: the ``depth<=4`` row
    hashes are the four 8-hex chunks of ONE md5 per token (the
    minhash-signature trick — one digest, four independent hashes;
    DuckDB: ``substr(md5(t), 1+8*r, 8)``), bucket = chunk % width.

    Shape: per block, ``value_counts`` over the flat token split
    dedups tokens FIRST (one md5 per distinct token per block, not
    per occurrence), counters accumulate via ``np.bincount`` with
    count weights, and the shuffle carries <= depth*width partial
    rows per block — never tokens. One tiny groupby merges partials.
    Returns a Dataset of ``(r, b, c)`` with zero counters omitted.
    NULL texts contribute nothing (SQL ``WHERE text IS NOT NULL``).
    """
    import hashlib

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if not (1 <= depth <= 4):
        raise ValueError("depth must be in 1..4 (four 8-hex chunks "
                         "per md5 digest)")

    def _partial(batch: pa.Table) -> pa.Table:
        sub = batch.filter(pc.is_valid(batch.column(text_col)))
        flat = pc.list_flatten(
            pc.split_pattern(sub.column(text_col), " "))
        vc = pc.value_counts(flat.combine_chunks()
                             if isinstance(flat, pa.ChunkedArray)
                             else flat)
        toks = vc.field("values").to_pylist()
        cnts = vc.field("counts").to_numpy(
            zero_copy_only=False).astype(np.int64)
        digs = [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in toks]
        rbs, cs = [], []
        for r in range(depth):
            b = np.array(
                [int(d[8 * r:8 * r + 8], 16) for d in digs],
                dtype=np.int64) % width
            row = np.bincount(b, weights=cnts, minlength=width)
            nz = np.flatnonzero(row)
            rbs.append(r * width + nz)
            cs.append(row[nz].astype(np.int64))
        return pa.table({
            "rb": pa.array(np.concatenate(rbs) if rbs else [],
                           pa.int64()),
            "c": pa.array(np.concatenate(cs) if cs else [],
                          pa.int64()),
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("rb").aggregate(Sum("c"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        rb = batch.column("rb").to_numpy(zero_copy_only=False)
        return pa.table({
            "r": pa.array(rb // width, pa.int64()),
            "b": pa.array(rb % width, pa.int64()),
            "c": pc.cast(batch.column("sum(c)"), pa.int64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def cms_estimate(sketch: pa.Table, tokens, width: int = 1024,
                 depth: int = 4) -> "pa.Table":
    """Point-estimate token counts from a materialized (tiny)
    :func:`cms_sketch` table: ``min_r counter[r][h_r(token)]``.
    Driver-side by design — the sketch is depth*width counters."""
    import hashlib

    mat = np.zeros((depth, width), dtype=np.int64)
    mat[sketch.column("r").to_numpy(zero_copy_only=False),
        sketch.column("b").to_numpy(zero_copy_only=False)] = \
        sketch.column("c").to_numpy(zero_copy_only=False)
    ests = []
    for t in tokens:
        d = hashlib.md5(t.encode("utf-8")).hexdigest()
        ests.append(int(min(
            mat[r][int(d[8 * r:8 * r + 8], 16) % width]
            for r in range(depth))))
    return pa.table({
        "token": pa.array(list(tokens), pa.string()),
        "est": pa.array(ests, pa.int64()),
    })


def grouped_kmv(ds, key_col: str, value_col: str, k: int = 16,
                n_buckets: int = 64):
    """Per-key KMV (k-minimum-values) distinct sketch — the SCALE
    path next to :func:`grouped_distinct_count`: where the exact
    operator must co-locate a key's whole distinct-value set, this
    carries at most ``keys x k`` hash rows per block through the
    shuffle, whatever the value cardinality.

    Hash = first 8 md5 hex chars of ``str(value)`` (deterministic,
    SQL-reproducible: ``substr(md5(CAST(v AS VARCHAR)), 1, 8)``), so
    the ESTIMATE itself is oracle-pinnable bit-for-bit after the
    repo-wide 1e-6 grid. estimate = (k-1) / (max_of_k / 2^32) when a
    key has >= k distinct hashes, else the exact count of hashes
    seen (the sketch is exact below k). NULL values are ignored
    (COUNT DISTINCT semantics); NULL keys form their own group.

    Shape: map-side per-block (key, value) dedup + per-key k-min
    (one md5 per block-distinct pair, lexsort rank mask — no per-key
    UDF), ONE key-hash co-shuffle, whole-bucket merge by the same
    lexsort+rank kernel.
    """
    import hashlib

    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids

    def _kmin_per_key(keys_arr, hv: np.ndarray):
        """(keys, hv) -> per-key k smallest UNIQUE hvs, vectorized.
        Returns (take_idx, seg_key_idx aligned to kept rows)."""
        codes = pc.dictionary_encode(
            keys_arr.combine_chunks()
            if isinstance(keys_arr, pa.ChunkedArray) else keys_arr
        ).indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((hv, codes))
        c_s, h_s = codes[order], hv[order]
        # drop duplicate (key, hv) pairs (hash collisions of equal
        # values across blocks; DISTINCT hv semantics)
        first = np.ones(len(order), dtype=bool)
        first[1:] = (c_s[1:] != c_s[:-1]) | (h_s[1:] != h_s[:-1])
        order, c_s, h_s = order[first], c_s[first], h_s[first]
        seg_start = np.ones(len(c_s), dtype=bool)
        seg_start[1:] = c_s[1:] != c_s[:-1]
        seg_idx = np.cumsum(seg_start) - 1
        starts = np.flatnonzero(seg_start)
        rank = np.arange(len(c_s)) - starts[seg_idx]
        keep = rank < k
        return order[keep], h_s[keep]

    def _partial(batch: pa.Table) -> pa.Table:
        sub = pa.table({
            "k": batch.column(key_col),
            "v": batch.column(value_col),
        })
        sub = sub.filter(pc.is_valid(sub.column("v")))
        if not sub.num_rows:
            return pa.table({
                "_bucket": pa.array([], pa.int64()),
                "k": pa.array([], batch.column(key_col).type),
                "hv": pa.array([], pa.uint64()),
            })
        # block-level pair dedup first (sentinel composite — the
        # null-safe dedup kernel shared with grouped_distinct_count)
        from .rollup import _composite_key

        ck = _composite_key(sub, ["k", "v"])
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        cidx = pc.dictionary_encode(ck).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        _, fst = np.unique(cidx, return_index=True)
        sub = sub.take(pa.array(fst, pa.int64()))
        hv = np.fromiter(
            (int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8],
                 16) for v in sub.column("v").to_pylist()),
            dtype=np.uint64, count=sub.num_rows)
        take, hs = _kmin_per_key(sub.column("k"), hv)
        kept = sub.take(pa.array(take, pa.int64()))
        return pa.table({
            "_bucket": pa.array(
                bucket_ids(kept.column("k"), n_buckets), pa.int64()),
            "k": kept.column("k"),
            "hv": pa.array(hs, pa.uint64()),
        })

    def _bucket(group: pa.Table) -> pa.Table:
        import math

        hv = group.column("hv").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        take, hs = _kmin_per_key(group.column("k"), hv)
        kept_keys = group.column("k").take(pa.array(take, pa.int64()))
        # segment stats over the kept (sorted-by-key) rows
        codes = pc.dictionary_encode(
            kept_keys.combine_chunks()
            if isinstance(kept_keys, pa.ChunkedArray) else kept_keys
        ).indices.fill_null(-1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        order = np.lexsort((hs, codes))
        c_s, h_s = codes[order], hs[order]
        seg_start = np.ones(len(c_s), dtype=bool)
        seg_start[1:] = c_s[1:] != c_s[:-1]
        starts = np.flatnonzero(seg_start)
        ends = np.concatenate([starts[1:], [len(c_s)]])
        n_k = ends - starts
        mx = h_s[ends - 1]
        ests = []
        for nk, m in zip(n_k, mx):
            if nk < k:
                ests.append(float(nk))
            else:
                ests.append(math.floor(
                    (k - 1.0) / (float(m) / 4294967296.0)
                    * 1e6 + 0.5) / 1e6)
        rep = kept_keys.take(pa.array(order[starts], pa.int64()))
        return pa.table({
            key_col: rep,
            "k_used": pa.array(n_k.astype(np.int64), pa.int64()),
            "kmv_estimate": pa.array(ests, pa.float64()),
        })

    return ds.map_batches(_partial, batch_format="pyarrow").groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_bucket, batch_format="pyarrow")


def grouped_hll(ds, key_col: str, value_col: str,
                n_buckets: int = 64):
    """Per-key HyperLogLog distinct sketch (Flajolet et al. 2007),
    m = 64 registers — the FIXED-SIZE mergeable twin of
    :func:`grouped_kmv`: where KMV carries ``keys x k`` hash rows,
    HLL carries at most ``keys x 64`` (key, register, max_rho) rows
    through the shuffle whatever the value cardinality, and register
    merge is a plain ``max`` — the sketch unions across any number
    of blocks/hosts losslessly.

    Deterministic + oracle-pinnable construction: one md5 per
    block-distinct (key, value) pair; register = first 8 hex chars
    mod 64, rho = 1 + trailing zeros of the second 8 hex chars
    (33 when that 32-bit word is 0). The estimate
    ``0.709 * m^2 / sum(2^-M_j)`` is EXACT float math — every
    ``2^-M`` term is a dyadic ≥ 2^-33 and the sum stays below 2^6,
    so all 39 significand bits fit in a double and the sum is
    order-independent — which makes the estimate reproducible
    bit-for-bit in SQL after the repo-wide 1e-6 grid. Small-range
    (linear-counting) correction applies when ``raw <= 2.5 m`` and
    empty registers exist; the 32-bit large-range correction is
    unreachable at these register counts and is omitted.

    Shape: map-side (key, value) dedup + Arrow group_by max(rho)
    per (key, register), ONE key-hash co-shuffle of register rows,
    whole-bucket lexsort + reduceat merge — no per-key UDF.
    """
    import hashlib

    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids
    from .rollup import _composite_key

    M = 64

    def _empty(key_type) -> pa.Table:
        return pa.table({
            "_bucket": pa.array([], pa.int64()),
            "k": pa.array([], key_type),
            "reg": pa.array([], pa.int64()),
            "rho": pa.array([], pa.int64()),
        })

    def _partial(batch: pa.Table) -> pa.Table:
        sub = pa.table({
            "k": batch.column(key_col),
            "v": batch.column(value_col),
        })
        sub = sub.filter(pc.is_valid(sub.column("v")))
        if not sub.num_rows:
            return _empty(batch.column(key_col).type)
        ck = _composite_key(sub, ["k", "v"])
        if isinstance(ck, pa.ChunkedArray):
            ck = ck.combine_chunks()
        cidx = pc.dictionary_encode(ck).indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        _, fst = np.unique(cidx, return_index=True)
        sub = sub.take(pa.array(fst, pa.int64()))
        digests = [
            hashlib.md5(str(v).encode("utf-8")).hexdigest()
            for v in sub.column("v").to_pylist()]
        h1 = np.fromiter((int(d[:8], 16) for d in digests),
                         dtype=np.int64, count=sub.num_rows)
        h2 = np.fromiter((int(d[8:16], 16) for d in digests),
                         dtype=np.int64, count=sub.num_rows)
        low = h2 & -h2
        rho = np.where(
            h2 == 0, np.int64(33),
            np.log2(np.maximum(low, 1)).astype(np.int64) + 1)
        t = pa.table({
            "k": sub.column("k"),
            "reg": pa.array(h1 % M, pa.int64()),
            "rho": pa.array(rho, pa.int64()),
        })
        g = t.group_by(["k", "reg"]).aggregate([("rho", "max")])
        return pa.table({
            "_bucket": pa.array(
                bucket_ids(g.column("k"), n_buckets), pa.int64()),
            "k": g.column("k"),
            "reg": g.column("reg"),
            "rho": g.column("rho_max"),
        })

    def _bucket(group: pa.Table) -> pa.Table:
        key_type = group.schema.field("k").type
        if group.num_rows == 0:
            return pa.table({
                key_col: pa.array([], key_type),
                "n_registers_set": pa.array([], pa.int64()),
                "hll_estimate": pa.array([], pa.float64()),
            })
        # null-safe key codes (the grouped_kmv precedent: after the
        # shuffle, hash group_by on raw nullable keys is unsafe)
        karr = group.column("k").combine_chunks()
        codes = pc.dictionary_encode(karr).indices.fill_null(
            -1).to_numpy(zero_copy_only=False).astype(np.int64)
        reg = group.column("reg").to_numpy(zero_copy_only=False)
        rho = group.column("rho").to_numpy(zero_copy_only=False)
        order = np.lexsort((reg, codes))
        c_s, r_s, rho_s = codes[order], reg[order], rho[order]
        pair_start = np.ones(len(c_s), dtype=bool)
        pair_start[1:] = (c_s[1:] != c_s[:-1]) | (r_s[1:] != r_s[:-1])
        p_idx = np.flatnonzero(pair_start)
        mr = np.maximum.reduceat(rho_s, p_idx)
        pc_codes = c_s[p_idx]
        key_start = np.ones(len(pc_codes), dtype=bool)
        key_start[1:] = pc_codes[1:] != pc_codes[:-1]
        k_idx = np.flatnonzero(key_start)
        k_end = np.append(k_idx[1:], len(pc_codes))
        nset = (k_end - k_idx).astype(np.int64)
        s = np.add.reduceat(np.power(2.0, -mr.astype(np.float64)),
                            k_idx)
        denom = s + (M - nset).astype(np.float64)
        raw = 0.709 * 4096.0 / denom
        lin_arg = np.where(nset < M, M - nset, 1).astype(np.float64)
        lin = M * np.log(M / lin_arg)
        est = np.where((raw <= 2.5 * M) & (nset < M), lin, raw)
        est = np.floor(est * 1e6 + 0.5) / 1e6
        rep = karr.take(pa.array(order[p_idx][k_idx], pa.int64()))
        return pa.table({
            key_col: rep,
            "n_registers_set": pa.array(nset, pa.int64()),
            "hll_estimate": pa.array(est, pa.float64()),
        })

    return ds.map_batches(_partial, batch_format="pyarrow").groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_bucket, batch_format="pyarrow")


def grouped_concat(ds, key_col: str, value_col: str, order_cols,
                   sep: str = ",", out_col: str = "agg",
                   n_buckets: int = 64):
    """Ordered per-key string aggregation — SQL
    ``string_agg(value, sep ORDER BY order_cols) GROUP BY key`` in
    ONE key-hash shuffle.

    The whole-bucket UDF sorts once by (key, order_cols) with Arrow
    ``sort_by``, then assembles every key's string in one
    ListArray + ``binary_join`` over segment offsets (the
    paragraph-reassembly kernel, `stages/dedup.paragraph_dedup`) —
    no per-key UDF, no Python join loop. NULL values are skipped
    (SQL string_agg semantics); a key whose values are all NULL
    yields a NULL aggregate (kept, like GROUP BY). NULL keys form
    their own group. Output strings are key-cardinality-scale: at
    100 TB cap the group size upstream (`group_cap`) — an unbounded
    hot key's concat is a single giant row by definition.
    """
    import numpy as np
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids
    from .rollup import _composite_key

    order_cols = list(order_cols)

    def _tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket",
            pa.array(bucket_ids(batch.column(key_col), n_buckets),
                     pa.int64()))

    def _bucket(group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [(key_col, "ascending")]
            + [(c, "ascending") for c in order_cols])
        n = g.num_rows
        kck = _composite_key(g, [key_col])
        if isinstance(kck, pa.ChunkedArray):
            kck = kck.combine_chunks()
        kch = np.ones(n, dtype=bool)
        if n > 1:
            kch[1:] = np.asarray(
                pc.not_equal(kck.slice(1), kck.slice(0, n - 1)))
        starts = np.flatnonzero(kch)
        ends = np.concatenate([starts[1:], [n]])
        vals = g.column(value_col).combine_chunks()
        valid = pc.is_valid(vals).to_numpy(zero_copy_only=False)
        # drop NULL values but keep segment accounting: per-segment
        # valid counts via cumsum difference
        cs = np.concatenate(
            [[0], np.cumsum(valid, dtype=np.int64)])
        seg_n = cs[ends] - cs[starts]
        kept = vals.filter(pa.array(valid))
        offsets = np.concatenate(
            [[0], np.cumsum(seg_n)]).astype(np.int32)
        lists = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            kept.cast(pa.string()))
        joined = pc.binary_join(lists, sep)
        # all-NULL segment -> empty join -> NULL (SQL string_agg)
        agg = pc.if_else(
            pa.array(seg_n > 0), joined,
            pa.scalar(None, pa.string()))
        return pa.table({
            key_col: g.column(key_col).take(
                pa.array(starts, pa.int64())),
            out_col: agg,
        })

    return ds.map_batches(_tag, batch_format="pyarrow").groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_bucket, batch_format="pyarrow")


_CHECKSUM_MOD = 1 << 63


def table_checksum(ds, cols):
    """Order-insensitive, MERGEABLE content checksum — the
    replication/migration audit primitive ("is the copy byte-equal
    to the source?") that never needs a sort or a shuffle: checksum
    = sum over rows of md5_60(sentinel-composite(cols)) mod 2^63.
    Any row-order permutation, block layout, or partial/merged
    computation yields the same value; a single changed/missing row
    changes it (md5 collision odds aside).

    One streaming pass: each block contributes ``(n, partial_sum)``;
    the driver folds blocks-scale partials. Returns a one-row table
    ``(n_rows, checksum)``. The composite uses the repo's sentinel
    encoding (NULL -> \\x1e, \\x1f separators) over ``CAST(col AS
    VARCHAR)`` — SQL-reproducible, so the checksum itself is
    oracle-pinnable bit-for-bit.
    """
    import hashlib

    import pyarrow.compute as pc

    from .setops import _row_keys

    def _partial(batch: pa.Table) -> pa.Table:
        keys = _row_keys(batch, list(cols))
        total = 0
        for s in keys.to_pylist():
            total = (total + int(
                hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
            ) % _CHECKSUM_MOD
        return pa.table({
            "n": pa.array([batch.num_rows], pa.int64()),
            "s": pa.array([total], pa.int64()),
        })

    n_rows = 0
    total = 0
    for b in ds.map_batches(
            _partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if not b.num_rows:
            continue
        n_rows += int(pc.sum(b.column("n")).as_py() or 0)
        for v in b.column("s").to_pylist():
            total = (total + int(v)) % _CHECKSUM_MOD
    return pa.table({
        "n_rows": pa.array([n_rows], pa.int64()),
        "checksum": pa.array([total], pa.int64()),
    })


def key_skew_stats(counts_ds, count_col: str = "n",
                   qs=(0.5, 0.9, 0.99)):
    """Skew diagnostics over a per-key count table — the operator
    you run BEFORE choosing a shuffle strategy ("is this key safe to
    groupby, or does it need `skew_join` / salting / `group_cap`?").

    Input: any Dataset with one row per key and an int64 count
    column (e.g. `web.host_stats` output). Output: one (stat,
    value) row each for n_keys, n_rows, max_count, the exact
    percentile_disc quantiles of the per-key count distribution at
    ``qs``, and top_share_ppm = max_count * 1e6 // n_rows (the hot
    key's integer parts-per-million share — >10^5 ppm means one key
    owns >10% of the table and a plain groupby will strand a
    straggler).

    All passes run over the KEY-cardinality table: count/max via
    map-side partials, quantiles via `exact_quantiles` (the
    distinct-count-histogram shape) — nothing touches the raw rows.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Max, Sum, Count

    agg = counts_ds.aggregate(
        Count(), Sum(count_col), Max(count_col))
    n_keys = int(agg["count()"])
    n_rows = int(agg[f"sum({count_col})"])
    mx = int(agg[f"max({count_col})"])
    q_tbl = exact_quantiles(counts_ds, count_col, list(qs))
    stats = [("n_keys", n_keys), ("n_rows", n_rows),
             ("max_count", mx)]
    for q, v in zip(q_tbl.column("q").to_pylist(),
                    q_tbl.column("value").to_pylist()):
        stats.append((f"p{int(q * 100)}_count", int(v)))
    stats.append(("top_share_ppm", mx * 1_000_000 // max(n_rows, 1)))
    return pa.table({
        "stat": pa.array([s for s, _ in stats], pa.string()),
        "value": pa.array([v for _, v in stats], pa.int64()),
    })


def grouped_histogram(ds, key_col: str, value_col: str,
                      lo: float, width: float, n_bins: int):
    """Per-key equi-width histogram: ``bin = clip(floor((v - lo) /
    width), 0, n_bins-1)``, counted per (key, bin) — the grouped
    twin of the engine's global fixed-bin shapes (`analyze`'s 5-bin
    quality histogram, `binned_quantiles`' sketch). Row-local bin
    math + map-side (key, bin) partial combine -> ONE tiny groupby;
    shuffle carries keys x bins x blocks rows. NULL values are
    dropped (SQL aggregate semantics); under/overflow values clamp
    into the edge bins (loud in the SQL twin via the same
    least/greatest math, never silently dropped).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col)
        ok = pc.is_valid(v)
        sub = pa.table({"key": batch.column(key_col), "v": v}).filter(ok)
        b = pc.floor(pc.divide(pc.subtract(
            pc.cast(sub.column("v"), pa.float64()), lo), width))
        b = pc.min_element_wise(
            pc.max_element_wise(b, 0.0), float(n_bins - 1))
        g = pa.table({
            "key": sub.column("key"),
            "bin": pc.cast(b, pa.int64()),
        }).group_by(["key", "bin"]).aggregate([([], "count_all")])
        return pa.table({
            key_col: g.column("key"),
            "bin": g.column("bin"),
            "n": pc.cast(g.column("count_all"), pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([key_col, "bin"])
        .aggregate(Sum("n"))
        .map_batches(
            lambda b: pa.table({
                key_col: b.column(key_col),
                "bin": b.column("bin"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }),
            batch_format="pyarrow")
    )


def priority_sample_k(ds, k: int, key_col: str, weight_col: str):
    """Deterministic WEIGHTED sample of exactly ``k`` rows —
    Efraimidis-Spirakis priority sampling (Inf. Proc. Letters 2006)
    with hash coins: each row draws u = (md5_15(key)+1) / 2^60 and
    gets priority ``-ln(u) / w``; the k smallest priorities win,
    giving inclusion probability proportional to weight. No RNG —
    the coin is a pure function of the key, so the sample is
    reproducible across runs and block layouts (dup-safe like every
    sampler here).

    Same two-phase shape as :func:`hash_sample_exact`: a vectorized
    LOCAL top-k per block (only blocks x k candidates survive), one
    tiny global sort+limit. Rows with NULL keys, or NULL/non-positive
    weights, are unsampleable and dropped. Ties (measure-zero) break
    by key. The priority arithmetic (-ln / divide on float64) is
    mirrored verbatim by the DuckDB twin; the k-th/k+1-th priority
    gap is astronomically larger than any libm ulp difference.
    """
    import hashlib

    import pyarrow.compute as pc

    pri_col = "_pri"

    def _local_topk(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.is_valid(batch.column(key_col)),
            pc.and_(pc.is_valid(batch.column(weight_col)),
                    pc.greater(pc.cast(batch.column(weight_col),
                                       pa.float64()), 0.0))))
        keys = batch.column(key_col).to_pylist()
        w = batch.column(weight_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        hv = np.array(
            [int(hashlib.md5(str(x).encode("utf-8")).hexdigest()[:15],
                 16) for x in keys], dtype=np.float64)
        u = (hv + 1.0) / float(1 << 60)
        pri = -np.log(u) / w
        order = np.lexsort((np.array(keys), pri))[:k]
        out = batch.take(pa.array(order, pa.int64()))
        return out.append_column(
            pri_col, pa.array(pri[order], pa.float64()))

    cands = ds.map_batches(_local_topk, batch_format="pyarrow")
    return (
        cands.sort([pri_col, key_col]).limit(k)
        .drop_columns([pri_col])
    )


def join_size_exact(left, right, left_key: str, right_key: str,
                    n_buckets: int = 64) -> pa.Table:
    """EXACT inner-join output cardinality |A JOIN B| = sum over
    keys of count_A(k) * count_B(k) — the optimizer statistic you
    compute BEFORE paying for the join itself. ONE exchange of
    (key, count, side) block partials (map-side combine: a key
    enters the shuffle once per block, never once per row);
    whole-bucket boundary masks multiply the two sides' per-key
    totals; the driver folds bucket-scale partial sums. NULL keys
    match nothing (SQL semantics)."""
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids

    def _partial(key_col: str, side: int):
        def _fn(batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col)
            if isinstance(keys, pa.ChunkedArray):
                keys = keys.combine_chunks()
            keys = keys.drop_null()
            vc = pc.value_counts(keys)
            k = vc.field("values")
            return pa.table({
                "_bucket": pa.array(bucket_ids(k, n_buckets),
                                    pa.int64()),
                "k": pc.cast(k, pa.int64()),
                "n": pc.cast(vc.field("counts"), pa.int64()),
                "side": pa.array([side] * len(k), pa.int8()),
            })
        return _fn

    tagged = left.map_batches(
        _partial(left_key, 0), batch_format="pyarrow"
    ).union(right.map_batches(
        _partial(right_key, 1), batch_format="pyarrow"))

    def _bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({"s": pa.array([0], pa.int64())})
        g = group.sort_by([("k", "ascending")])
        k = g.column("k").to_numpy(zero_copy_only=False)
        n = g.column("n").to_numpy(zero_copy_only=False)
        side = g.column("side").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(
            np.concatenate(([True], k[1:] != k[:-1])))
        ends = np.concatenate((starts[1:], [len(k)]))
        na = np.add.reduceat(np.where(side == 0, n, 0), starts)
        nb = np.add.reduceat(np.where(side == 1, n, 0), starts)
        # reduceat quirk: empty slices impossible here (starts from
        # flatnonzero of a non-empty array)
        del ends
        return pa.table({
            "s": pa.array([int((na * nb).sum())], pa.int64()),
        })

    total = 0
    for b in tagged.groupby(
            "_bucket", num_partitions=n_buckets).map_groups(
            _bucket, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            import pyarrow.compute as pc2
            total += int(pc2.sum(b.column("s")).as_py() or 0)
    return pa.table({"n_join_rows": pa.array([total], pa.int64())})


def cms_inner_product(sketch_a: pa.Table, sketch_b: pa.Table,
                      width: int = 1024, depth: int = 4) -> int:
    """Join-size ESTIMATE from two :func:`cms_sketch` tables:
    ``min_r sum_b cmsA[r][b] * cmsB[r][b]`` — the classic Count-Min
    inner-product upper bound on ``sum_v fA(v) * fB(v)`` (Cormode &
    Muthukrishnan 2005, §4.2). Driver-side: the sketches are
    depth x width counters; deterministic integer math, so the
    estimate itself is oracle-pinnable."""

    def _mat(sk: pa.Table) -> np.ndarray:
        m = np.zeros((depth, width), dtype=np.int64)
        m[sk.column("r").to_numpy(zero_copy_only=False),
          sk.column("b").to_numpy(zero_copy_only=False)] = \
            sk.column("c").to_numpy(zero_copy_only=False)
        return m

    a, b = _mat(sketch_a), _mat(sketch_b)
    return int(min(int((a[r] * b[r]).sum()) for r in range(depth)))


def winsorized_group_mean(ds, key_col: str, cents_col: str,
                          lo_q: float = 0.05, hi_q: float = 0.95):
    """Winsorized per-group mean: clip an int64 measure to its exact
    GLOBAL ``percentile_disc`` [lo_q, hi_q] bounds, then average per
    key — the outlier-robust aggregate every metrics pipeline wants
    before a mean (a heavy-tail click can otherwise move a daily KPI
    alone).

    Two streaming passes, no wide shuffle of raw rows: pass 1 is
    :func:`exact_quantiles` (value-histogram partials → tiny
    value-keyed fold); the two clip bounds broadcast by closure
    (scalars); pass 2 clips vectorized per batch and reduces to
    map-side ``(key, sum, n)`` partials before ONE tiny groupby.
    The measure must be int64 (cents) so sums are order-free and the
    DuckDB ``least(greatest(...))`` twin is bit-exact; the mean is
    the single terminal division.

    Returns ``(key_col, n, mean_winsorized)`` with the mean rounded
    via ``floor(x*1000+0.5)/1000``.
    """
    import math

    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    bounds = exact_quantiles(ds, cents_col, [lo_q, hi_q])
    lo = bounds.column("value")[0].as_py()
    hi = bounds.column("value")[1].as_py()

    def _partial(batch: pa.Table) -> pa.Table:
        v = batch.column(cents_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        clipped = np.clip(v, lo, hi)
        return partial_sum_count(
            pa.table({key_col: batch.column(key_col),
                      "w": pa.array(clipped, pa.int64())}),
            [key_col], "w",
        )

    agg = ds.select_columns([key_col, cents_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).groupby(key_col).aggregate(Sum("sum_value"), Sum("n_events"))

    def _finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(sum_value)").to_numpy(zero_copy_only=False)
        n = batch.column("sum(n_events)").to_numpy(zero_copy_only=False)
        mean = [
            math.floor(si / ni / 100.0 * 1000.0 + 0.5) / 1000.0
            for si, ni in zip(s, n)
        ]
        return pa.table({
            key_col: batch.column(key_col),
            "n": pa.array(n, pa.int64()),
            "mean_winsorized": pa.array(mean, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def grouped_mode(ds, key_col: str, value_col: str, n_buckets: int = 64):
    """Exact per-key MODE: the most frequent ``value_col`` per
    ``key_col`` with deterministic tie-break (count desc, value asc)
    — e.g. each user's dominant event type. SQL's
    ``mode() WITHIN GROUP`` with a pinned tie rule.

    Shape: map-side ``(key, value, n)`` partial combine (the shuffle
    carries distinct pairs per block, never raw rows), then ONE
    key-hash co-shuffle of the pair partials; each whole-bucket UDF
    re-combines with one Arrow group_by and picks first-per-key via a
    single sort + boundary mask — no per-key UDF invocation.

    Returns ``(key_col, mode_value, n)``.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col, value_col]).group_by(
            [key_col, value_col]).aggregate([([], "count_all")])
        out = pa.table({
            key_col: g.column(key_col),
            value_col: g.column(value_col),
            "n": pc.cast(g.column("count_all"), pa.int64()),
        })
        return out.append_column("_kbucket", pa.array(
            bucket_ids(out.column(key_col), n_buckets), pa.int64()))

    def _mode(group: pa.Table) -> pa.Table:
        key_t = group.schema.field(key_col).type
        val_t = group.schema.field(value_col).type
        empty = pa.table({
            key_col: pa.array([], key_t),
            "mode_value": pa.array([], val_t),
            "n": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        # fold the per-block partials, then one sort + first-per-key
        g = group.select([key_col, value_col, "n"]).group_by(
            [key_col, value_col]).aggregate([("n", "sum")])
        g = g.sort_by([(key_col, "ascending"), ("n_sum", "descending"),
                       (value_col, "ascending")])
        keys = g.column(key_col).combine_chunks()
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False)
        first = np.ones(len(codes), dtype=bool)
        first[1:] = codes[1:] != codes[:-1]
        idx = pa.array(np.flatnonzero(first), pa.int64())
        return pa.table({
            key_col: keys.take(idx),
            "mode_value": g.column(value_col).take(idx),
            "n": pc.cast(g.column("n_sum").take(idx), pa.int64()),
        })

    return ds.select_columns([key_col, value_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).groupby("_kbucket", num_partitions=n_buckets).map_groups(
        _mode, batch_format="pyarrow")


def grouped_topk(ds, key_col: str, value_col: str, k: int,
                 n_buckets: int = 64):
    """Exact top-``k`` values per key by frequency (grouped heavy
    hitters): ``(key, value, n, rk)`` for the k most frequent
    ``value_col`` per ``key_col`` — e.g. each language's dominant
    vocabulary. Tie rule pinned: count desc, value asc.
    :func:`grouped_mode` is the k = 1 special case.

    Same shape as grouped_mode: map-side (key, value, n) partial
    combine, ONE key-hash co-shuffle of the pair partials, per
    whole bucket one Arrow group_by + sort + vectorized per-key rank
    (cumcount via boundary subtraction) and a rank filter.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key_col, value_col]).group_by(
            [key_col, value_col]).aggregate([([], "count_all")])
        out = pa.table({
            key_col: g.column(key_col),
            value_col: g.column(value_col),
            "n": pc.cast(g.column("count_all"), pa.int64()),
        })
        return out.append_column("_kbucket", pa.array(
            bucket_ids(out.column(key_col), n_buckets), pa.int64()))

    def _topk(group: pa.Table) -> pa.Table:
        key_t = group.schema.field(key_col).type
        val_t = group.schema.field(value_col).type
        empty = pa.table({
            key_col: pa.array([], key_t),
            value_col: pa.array([], val_t),
            "n": pa.array([], pa.int64()),
            "rk": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        g = group.select([key_col, value_col, "n"]).group_by(
            [key_col, value_col]).aggregate([("n", "sum")])
        g = g.sort_by([(key_col, "ascending"), ("n_sum", "descending"),
                       (value_col, "ascending")])
        keys = g.column(key_col).combine_chunks()
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False)
        pos = np.arange(len(codes), dtype=np.int64)
        first = np.ones(len(codes), dtype=bool)
        first[1:] = codes[1:] != codes[:-1]
        seg_start = pos[first][np.cumsum(first) - 1]
        rk = pos - seg_start + 1
        sel = rk <= k
        idx = pa.array(pos[sel], pa.int64())
        return pa.table({
            key_col: keys.take(idx),
            value_col: g.column(value_col).take(idx),
            "n": pc.cast(g.column("n_sum").take(idx), pa.int64()),
            "rk": pa.array(rk[sel], pa.int64()),
        })

    return ds.select_columns([key_col, value_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).groupby("_kbucket", num_partitions=n_buckets).map_groups(
        _topk, batch_format="pyarrow")


def grouped_argmax(ds, key_col: str, value_col: str, id_col: str,
                   n_buckets: int = 64):
    """Per-key ARG-MAX row: for each key, the ``(id, value)`` with
    the largest ``value_col`` (ties → smallest ``id_col``) — the
    survivor-selection primitive (best doc per duplicate cluster,
    best candidate per query, latest version per key).

    Scale shape: each block first reduces to ONE candidate row per
    key it contains (vectorized sort + boundary mask — a legal
    partial because argmax is associative), so the single key-hash
    co-shuffle carries keys × blocks candidate rows, never raw rows;
    the whole-bucket UDF re-runs the same kernel to finish.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import bucket_ids

    def _best(tbl: pa.Table) -> pa.Table:
        g = tbl.sort_by([(key_col, "ascending"),
                         (value_col, "descending"),
                         (id_col, "ascending")])
        keys = g.column(key_col).combine_chunks()
        codes = pc.dictionary_encode(keys).indices.to_numpy(
            zero_copy_only=False)
        first = np.ones(len(codes), dtype=bool)
        first[1:] = codes[1:] != codes[:-1]
        return g.take(pa.array(np.flatnonzero(first), pa.int64()))

    def _partial(batch: pa.Table) -> pa.Table:
        b = batch.select([key_col, value_col, id_col])
        if b.num_rows == 0:
            return b.append_column("_kbucket", pa.array([], pa.int64()))
        best = _best(b)
        return best.append_column("_kbucket", pa.array(
            bucket_ids(best.column(key_col), n_buckets), pa.int64()))

    def _final(group: pa.Table) -> pa.Table:
        base = group.drop_columns(["_kbucket"])
        if base.num_rows == 0:
            return base
        return _best(base)

    return ds.map_batches(_partial, batch_format="pyarrow").groupby(
        "_kbucket", num_partitions=n_buckets
    ).map_groups(_final, batch_format="pyarrow")


def range_partition(ds, col: str, n_shards: int, lo: int,
                    bin_width: int, n_bins: int, id_col: str = "doc_id"):
    """RANGE sharding — the sorted-layout complement of hash
    `shuffle_shards`: rows land in ``n_shards`` contiguous key
    ranges of ~equal row counts, so downstream consumers get
    globally ordered shards (merge-readable output, range-prunable
    files — pairs with `bucketed.build_zone_map`).

    Splits come from the same fixed-bin histogram SKETCH as
    :func:`binned_quantiles` (per-block bincount partials,
    driver-folded, NO shuffle); split i is the inclusive-upper-edge
    estimate at rank ``ceil(i*n/n_shards)`` evaluated in PURE int64
    (``(i*n + n_shards - 1) // n_shards``) so the assignment is
    bit-reproducible in SQL. Pass 2 is map-only:
    ``shard = #(splits <= x)`` via one searchsorted per batch;
    NULL keys get shard -1.

    Returns ``(assignments, splits)``: assignments is a Dataset of
    ``(id_col, shard:int64)``; splits the (n_shards-1,) int64 array
    (driver state — it IS the partitioner).
    """
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        arr = arr.filter(pc.is_valid(arr))
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.clip((v - lo) // bin_width, 0, n_bins - 1)
        return pa.table({
            "b": pa.array(np.arange(n_bins, dtype=np.int64)),
            "n": pa.array(np.bincount(b, minlength=n_bins).astype(
                np.int64)),
        })

    hist = np.zeros(n_bins, dtype=np.int64)
    for t in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        hist[t.column("b").to_numpy(zero_copy_only=False)] += (
            t.column("n").to_numpy(zero_copy_only=False))
    cum = np.cumsum(hist)
    n = int(cum[-1]) if n_bins else 0
    if n == 0:
        raise ValueError(f"range_partition: column {col!r} is all-null")
    splits = np.empty(n_shards - 1, dtype=np.int64)
    for i in range(1, n_shards):
        r = max(0, (i * n + n_shards - 1) // n_shards - 1)
        b = int(np.searchsorted(cum, r + 1, side="left"))
        splits[i - 1] = lo + (b + 1) * bin_width - 1
    final = splits.copy()

    def _assign(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
        v = arr.fill_null(0).to_numpy(zero_copy_only=False).astype(
            np.int64)
        shard = np.searchsorted(final, v, side="right").astype(np.int64)
        shard[~valid] = -1
        return pa.table({
            id_col: batch.column(id_col),
            "shard": pa.array(shard, pa.int64()),
        })

    return ds.map_batches(_assign, batch_format="pyarrow"), final


def grouped_binned_quantiles(ds, key_col: str, col: str,
                             qs: Sequence[float], lo: int,
                             bin_width: int, n_bins: int) -> pa.Table:
    """Per-KEY fixed-bin quantile sketch — :func:`binned_quantiles`
    with a group dimension (per-language length percentiles, per-host
    size profiles). Each block emits one (key, bin, n) 2-D bincount
    partial built via dictionary-encode + one flat bincount (no
    Python loop); the driver folds keys×bins ints per block — NO
    shuffle, mergeable across corpora like the ungrouped sketch.
    Same estimate rule: inclusive upper edge of the bin holding the
    percentile_disc index.

    Returns one row per (key, q): ``(key_col, q, value_est)``.
    Intended for modest key cardinality (languages, sources — the
    driver holds keys × n_bins ints); use per-key exact quantiles
    or a second-level groupby for open-ended keys.
    """
    import pyarrow.compute as pc

    def _partial(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        vals = batch.column(col)
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        ok = pc.and_(pc.is_valid(keys), pc.is_valid(vals))
        keys = keys.filter(ok)
        vals = vals.filter(ok)
        if len(keys) == 0:
            return pa.table({
                key_col: pa.array([], pa.string()),
                "b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })
        enc = keys.dictionary_encode()
        ki = np.asarray(enc.indices, dtype=np.int64)
        v = vals.to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.clip((v - lo) // bin_width, 0, n_bins - 1)
        flat = np.bincount(ki * n_bins + b,
                           minlength=len(enc.dictionary) * n_bins)
        nz = np.flatnonzero(flat)
        return pa.table({
            key_col: enc.dictionary.take(
                pa.array(nz // n_bins, pa.int64())),
            "b": pa.array((nz % n_bins).astype(np.int64), pa.int64()),
            "n": pa.array(flat[nz].astype(np.int64), pa.int64()),
        })

    hists: dict = {}
    for t in ds.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for k, b, n in zip(t.column(key_col).to_pylist(),
                           t.column("b").to_pylist(),
                           t.column("n").to_pylist()):
            h = hists.get(k)
            if h is None:
                h = hists[k] = np.zeros(n_bins, dtype=np.int64)
            h[b] += n
    out_k, out_q, out_v = [], [], []
    for k in sorted(hists):
        cum = np.cumsum(hists[k])
        n = int(cum[-1])
        for q in qs:
            r = max(0, math.ceil(q * n) - 1)
            b = int(np.searchsorted(cum, r + 1, side="left"))
            out_k.append(k)
            out_q.append(q)
            out_v.append(lo + (b + 1) * bin_width - 1)
    return pa.table({
        key_col: pa.array(out_k, pa.string()),
        "q": pa.array(out_q, pa.float64()),
        "value_est": pa.array(out_v, pa.int64()),
    })


def adaptive_salted_agg(ds, key_col: str, value_col: str, salt_src: str,
                        sample_mod: int = 20,
                        target_per_reducer: int = 200_000,
                        max_salt: int = 64, plan_ds=None):
    """Grouped count/sum with MEASURED, per-key salting — the
    adaptive version of the fixed-fan-out salted shape (cf.
    ``q_events_by_type_salted``): a fixed salt multiplies EVERY key's
    phase-2 input by the fan-out, which is exactly wrong at 10^9 cold
    keys; here only keys a plan-time sample says are hot get salted,
    each with a fan-out sized to its estimated volume.

    Three phases, result identical to a plain groupby (the sample
    tunes the PLAN, never the values):

    0. Plan sample: a pruned ``columns=[key]`` read of the
       deterministic ``crc32(str(salt_src)) % sample_mod == 0`` row
       slice → map-side per-key partial counts → tiny key groupby →
       the driver keeps only keys whose extrapolated count exceeds
       ``target_per_reducer`` (the hot dict is bounded by data volume
       / target, not by key cardinality).
    1. Salted partial combine: salt = crc32(str(salt_src)) %
       fan_out(key) (1 for cold keys) → groupby (key, salt).
    2. Re-aggregate the ≤ fan_out partials per key.

    Output: ``(key, n_events: int64, sum_value: float round6)``.
    """
    import math
    from zlib import crc32

    import numpy as np
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def _row_hash(col) -> np.ndarray:
        return np.fromiter(
            (crc32(str(v).encode()) for v in col.to_pylist()),
            np.int64, len(col))

    def _sample_counts(batch: pa.Table) -> pa.Table:
        h = _row_hash(batch.column(salt_src))
        t = batch.filter(pa.array(h % sample_mod == 0))
        agg = t.select([key_col]).group_by([key_col]).aggregate(
            [([], "count_all")])
        return pa.table({
            key_col: agg.column(key_col),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    # the plan pass only touches (key, salt_src) — pass a pruned
    # read as plan_ds so the sample never lifts the value column
    sampled = (plan_ds if plan_ds is not None else ds).map_batches(
        _sample_counts, batch_format="pyarrow"
    ).groupby(key_col).aggregate(Sum("n"))
    hot: dict = {}
    for row in sampled.take_all():
        est = row["sum(n)"] * sample_mod
        if est > target_per_reducer:
            hot[row[key_col]] = min(
                max_salt, math.ceil(est / target_per_reducer))

    def _partial(batch: pa.Table) -> pa.Table:
        if hot:
            fan = np.fromiter(
                (hot.get(k, 1) for k in
                 batch.column(key_col).to_pylist()),
                np.int64, batch.num_rows)
            salt = _row_hash(batch.column(salt_src)) % fan
        else:
            salt = np.zeros(batch.num_rows, np.int64)
        return partial_sum_count(
            pa.table({
                key_col: batch.column(key_col),
                "salt": pa.array(salt, pa.int64()),
                value_col: batch.column(value_col),
            }),
            [key_col, "salt"], value_col,
        )

    phase1 = ds.map_batches(_partial, batch_format="pyarrow").groupby(
        [key_col, "salt"]
    ).aggregate(Sum("n_events"), Sum("sum_value"))
    phase2 = phase1.groupby(key_col).aggregate(
        Sum("sum(n_events)"), Sum("sum(sum_value)"))

    def _finish(batch: pa.Table) -> pa.Table:
        sums = [
            math.floor(s * 1000000.0 + 0.5) / 1000000.0
            for s in batch.column("sum(sum(sum_value))").to_pylist()
        ]
        return pa.table({
            key_col: batch.column(key_col),
            "n_events": pc.cast(
                batch.column("sum(sum(n_events))"), pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return phase2.map_batches(_finish, batch_format="pyarrow")


def grouped_count_and_distinct(ds, key_col: str, value_col: str,
                               n_buckets: int = 64):
    """Per-key ``(n_rows, n_distinct_values)`` in ONE exchange of
    ``(key, value, n)`` partials: each batch pre-combines to its
    distinct (key, value) pairs (map-side shrink — at web scale the
    per-batch pair set is far smaller than the rows), the pairs
    co-shuffle by crc32(key) bucket, and the whole-bucket UDF folds
    both statistics with vectorized Arrow group_bys — never a
    per-key UDF. NULL keys are dropped; a NULL value counts toward
    ``n_rows`` and contributes one distinct value, matching SQL
    ``count(*)`` / ``count(DISTINCT v)``-with-NULLs-excluded would
    NOT — so the value column is coalesced by the caller if SQL
    parity matters (the oracle twins here never feed NULL values).
    """
    from zlib import crc32

    def _partial(batch: pa.Table) -> pa.Table:
        sub = batch.select([key_col, value_col]).drop_null()
        g = sub.group_by([key_col, value_col]).aggregate([
            ([], "count_all")])
        keys = g.column(key_col).to_pylist()
        return pa.table({
            key_col: g.column(key_col),
            value_col: g.column(value_col),
            "n": g.column("count_all"),
            "_kbucket": pa.array(
                [crc32(str(k).encode()) % n_buckets for k in keys],
                pa.int32()),
        })

    def _bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return pa.table({
                key_col: pa.array([], pa.int64()),
                "n_rows": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
            })
        pairs = group.group_by([key_col, value_col]).aggregate([
            ("n", "sum")])
        fold = pairs.group_by(key_col).aggregate([
            ("n_sum", "sum"), ([], "count_all")])
        return pa.table({
            key_col: fold.column(key_col),
            "n_rows": fold.column("n_sum_sum").cast(pa.int64()),
            "n_distinct": fold.column("count_all").cast(pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("_kbucket", num_partitions=n_buckets)
        .map_groups(_bucket, batch_format="pyarrow")
    )


def _skyline_mask(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boolean keep-mask of the 2-D maxima (both dims maximized).

    Point q is dominated iff some p has ``p.x >= q.x`` and
    ``p.y >= q.y`` with strict inequality somewhere; coordinate-equal
    duplicates never dominate each other (standard SKYLINE OF
    semantics, Börzsönyi et al. ICDE'01). Vectorized: sort by
    (x desc, y desc); a row survives iff its y equals its equal-x
    group's max AND strictly exceeds the running y-max over all
    strictly-greater-x rows.
    """
    n = len(x)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    new_x = np.concatenate(([True], xs[1:] != xs[:-1]))
    idx = np.arange(n)
    group_start = np.maximum.accumulate(np.where(new_x, idx, 0))
    group_max_y = ys[group_start]
    run_max = np.maximum.accumulate(ys)
    prev_max = np.where(
        group_start > 0, run_max[np.maximum(group_start - 1, 0)],
        np.iinfo(np.int64).min)
    keep_sorted = (ys == group_max_y) & (ys > prev_max)
    keep = np.zeros(n, dtype=bool)
    keep[order] = keep_sorted
    return keep


def skyline_2d(ds, x_col: str, y_col: str):
    """Distributed 2-D SKYLINE (Pareto frontier, maximize both
    columns): the multi-criteria selection operator (pick documents
    /users not beaten on BOTH quality axes by anyone).

    Skyline is MERGEABLE — ``sky(S ∪ T) = sky(sky(S) ∪ sky(T))`` —
    so the plan is a map-side local skyline per block (each block
    shrinks to its own frontier before anything moves) followed by
    one final pass over the concatenated local frontiers. The final
    pass runs in a single task: the skyline of 2-D points with
    distinct x values has at most |distinct x| members, and after
    local pruning the survivors of a web-scale input are frontier-
    scale, not input-scale (the caller's dimensions bound it — the
    same output-size contract every skyline engine has; a degenerate
    fully-anticorrelated input keeps O(n) and belongs in a top-k
    instead). Both columns must be integer-valued (exactness: no
    float ties).
    """
    def _local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keep = _skyline_mask(
            batch.column(x_col).to_numpy().astype(np.int64),
            batch.column(y_col).to_numpy().astype(np.int64))
        return batch.filter(pa.array(keep))

    return (
        ds.map_batches(_local, batch_format="pyarrow")
        .repartition(1)
        .map_batches(_local, batch_format="pyarrow",
                     batch_size=None)
    )


def agg_refresh(base_agg, delta, keys, value_col: str,
                count_name: str = "n", sum_name: str = "sum_value"):
    """Incremental AGGREGATE-VIEW maintenance: merge a stored
    grouped aggregate (one row per key: count + sum) with a fresh
    delta partition WITHOUT rescanning history — the materialized-
    view refresh every ingest pipeline runs on each new crawl/day
    partition. Counts and sums are mergeable sufficient statistics,
    so refresh = (stored agg rows) ∪ (map-side partials of the
    delta) → one groupby at AGG scale; the work is proportional to
    |delta| + |keys|, never to the history that produced the base.

    ``base_agg`` must carry ``keys + [count_name, sum_name]``
    (exactly what this function outputs — refreshes chain). Float
    sums merge in a different order than a full recompute; callers
    compare on the shared 1e-6 grid like every grouped-sum query.
    """
    from ray.data.aggregate import Sum

    ks = list(keys)

    def _partial(batch: pa.Table) -> pa.Table:
        return partial_sum_count(batch, ks, value_col,
                                 sum_name=sum_name,
                                 count_name=count_name)

    delta_partials = delta.select_columns(ks + [value_col]).map_batches(
        _partial, batch_format="pyarrow")
    return base_agg.select_columns(
        ks + [count_name, sum_name]
    ).union(delta_partials).groupby(ks).aggregate(
        Sum(count_name, alias_name=count_name),
        Sum(sum_name, alias_name=sum_name),
    )


def bucket_checksums(ds, key_col: str, cols, n_buckets: int = 64):
    """Per-BUCKET mergeable content checksums — the Merkle level of a
    bucketed store's layout, and the anti-entropy repair primitive:
    two replicas compare buckets-scale checksum tables and re-sync
    ONLY the buckets that disagree, never scanning matching data
    twice (Dynamo/Cassandra repair, at bucket granularity).

    Same integrity math as :func:`table_checksum` (order-insensitive
    ``Σ md5_60(sentinel-composite) mod 2^63`` — SQL-reproducible),
    keyed by ``key_col % n_buckets`` (the SQL-expressible store
    partition rule; the engine-hash layout works identically).

    One streaming pass, NO shuffle: each block emits per-bucket
    ``(bucket, n, partial)`` rows (exact Python-int modular sums —
    an int64 aggregate of 2^63-bounded partials could overflow);
    the driver folds the buckets × blocks table. Returns
    ``(bucket, n_rows, checksum)``.
    """
    import hashlib

    import ray.data

    from .setops import _row_keys

    def _partial(batch: pa.Table) -> pa.Table:
        keys = _row_keys(batch, list(cols))
        bucket = pc.cast(batch.column(key_col), pa.int64()
                         ).combine_chunks().to_numpy(
            zero_copy_only=False) % n_buckets
        sums: dict = {}
        counts: dict = {}
        for b, s in zip(bucket.tolist(), keys.to_pylist()):
            hv = int(hashlib.md5(
                s.encode("utf-8")).hexdigest()[:15], 16)
            sums[b] = (sums.get(b, 0) + hv) % _CHECKSUM_MOD
            counts[b] = counts.get(b, 0) + 1
        bs = sorted(sums)
        return pa.table({
            "bucket": pa.array(bs, pa.int64()),
            "n": pa.array([counts[b] for b in bs], pa.int64()),
            "s": pa.array([sums[b] for b in bs], pa.int64()),
        })

    folded_n: dict = {}
    folded_s: dict = {}
    for b in ds.map_batches(
            _partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for bk, n, s in zip(b.column("bucket").to_pylist(),
                            b.column("n").to_pylist(),
                            b.column("s").to_pylist()):
            folded_n[bk] = folded_n.get(bk, 0) + n
            folded_s[bk] = (folded_s.get(bk, 0) + s) % _CHECKSUM_MOD
    bs = sorted(folded_n)
    return ray.data.from_arrow(pa.table({
        "bucket": pa.array(bs, pa.int64()),
        "n_rows": pa.array([folded_n[b] for b in bs], pa.int64()),
        "checksum": pa.array([folded_s[b] for b in bs], pa.int64()),
    }))


def grouped_priority_sample(ds, k: int, group_col: str,
                            key_col: str, weight_col: str,
                            n_buckets: int = 64):
    """Per-GROUP weighted exact-k sample — stratified
    Efraimidis-Spirakis: inside every group the k smallest
    ``-ln((md5_15(key)+1)/2^60) / w`` priorities win, so inclusion
    is weight-proportional WITHIN each stratum (the "k docs per
    language, weighted by length" training-mix sampler). Hash coins,
    no RNG — reproducible across runs and layouts like
    :func:`priority_sample_k`.

    Two-phase `group_cap` shape: a vectorized local per-group top-k
    per block (lexsort + boundary-mask cumcount — never a per-group
    UDF) cuts candidates to blocks × groups × k rows, then ONE
    group-hash co-shuffle re-applies the same kernel per whole
    bucket. NULL groups/keys and non-positive weights drop.
    """
    import hashlib

    import ray.data

    from ..functions.hashing import bucket_ids

    pri_col = "_pri"

    def _rank_mask(groups: np.ndarray, pri: np.ndarray,
                   keys: np.ndarray):
        """indices of rows with per-group priority rank < k."""
        order = np.lexsort((keys, pri, groups))
        g = groups[order]
        change = np.r_[True, g[1:] != g[:-1]]
        idx = np.arange(len(g), dtype=np.int64)
        seg = np.maximum.accumulate(np.where(change, idx, 0))
        return order[(idx - seg) < k]

    def _local(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(
            pc.and_(pc.is_valid(batch.column(group_col)),
                    pc.is_valid(batch.column(key_col))),
            pc.and_(pc.is_valid(batch.column(weight_col)),
                    pc.greater(pc.cast(batch.column(weight_col),
                                       pa.float64()), 0.0))))
        if batch.num_rows == 0:
            return batch.append_column(
                pri_col, pa.array([], pa.float64())).append_column(
                "_bucket", pa.array([], pa.int64()))
        keys = batch.column(key_col).to_pylist()
        w = batch.column(weight_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64)
        hv = np.array(
            [int(hashlib.md5(
                str(x).encode("utf-8")).hexdigest()[:15], 16)
             for x in keys], dtype=np.float64)
        pri = -np.log((hv + 1.0) / float(1 << 60)) / w
        groups = np.asarray(batch.column(group_col).to_pylist())
        keep = _rank_mask(groups, pri, np.asarray(keys))
        out = batch.take(pa.array(keep, pa.int64()))
        out = out.append_column(
            pri_col, pa.array(pri[keep], pa.float64()))
        return out.append_column(
            "_bucket", pa.array(
                bucket_ids(out.column(group_col), n_buckets),
                pa.int64()))

    def _bucket_final(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group.drop_columns(["_bucket", pri_col])
        groups = np.asarray(group.column(group_col).to_pylist())
        pri = group.column(pri_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        keys = np.asarray(group.column(key_col).to_pylist())
        keep = _rank_mask(groups, pri, keys)
        return group.take(pa.array(keep, pa.int64())).drop_columns(
            ["_bucket", pri_col])

    return (
        ds.map_batches(_local, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=n_buckets)
        .map_groups(_bucket_final, batch_format="pyarrow")
    )
