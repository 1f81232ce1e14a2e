"""Event-stream, sessionization and temporal queries (split from queries.py; keys unchanged)."""
from __future__ import annotations

import hashlib
import math
import os
import re
from typing import Dict
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum
from ..functions.text import replace_chars_regex, round3
from ..stages.dedup import (
    exact_dedup_summary,
    fingerprint_fn,
    minhash_bucket_stats,
    minhash_dup_pairs,
    minhash_signatures,
    simhash_signatures,
    jaccard_dup_pairs,
)
from ..stages.similarity import (
    brute_force_topk,
    bucketed_near_dup_pairs,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)
from ..stages.textstats import (
    doc_quality_fn,
    lang_id_fn,
    quality_heuristics_fn,
    repetition_stats_fn,
    sanitize_fn,
    token_count_fn,
    token_rarity,
)
from ..stages.pii import PII_PATTERNS as _PII_PATTERNS
from ._registry import ORACLE_SQL, QUERIES
from ._shared import *  # noqa: F401,F403

def q_user_activity(sf_dir: str):
    """Per-user event aggregate with map-side partial combining.

    The skew-mitigation shape from SURVEY §7.3: each batch pre-combines
    (user_id → count, sum) so a hot user contributes ONE row per block
    to the shuffle instead of every event — the salted-key pattern's
    effect without a second pass, since count/sum are commutative.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        from ..stages.stats import partial_sum_count

        return partial_sum_count(batch, ["user_id"], "value")

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])
    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_events"), Sum("sum_value"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        sums = [
            math.floor(s * 1000000.0 + 0.5) / 1000000.0
            for s in batch.column("sum(sum_value)").to_pylist()
        ]
        return pa.table({
            "user_id": batch.column("user_id"),
            "n_events": pc.cast(batch.column("sum(n_events)"), pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")
ORACLE_SQL["user_activity"] = (
"SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value "
        "FROM events GROUP BY user_id"
)
QUERIES["user_activity"] = q_user_activity
def q_events_value_histogram(sf_dir: str):
    """Per-type equi-width histogram of event values
    (stages/stats.py ``grouped_histogram``): 10 bins over [0, 100),
    edge-clamped — row-local bin math, (key, bin) partial combine,
    one tiny groupby."""
    from ..stages.stats import grouped_histogram

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_histogram(events, "event_type", "value",
                             lo=0.0, width=10.0, n_bins=10)
ORACLE_SQL["events_value_histogram"] = (
"SELECT event_type, CAST(least(greatest(floor((value - 0.0) "
        "/ 10.0), 0), 9) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        "WHERE value IS NOT NULL GROUP BY 1, 2"
)
QUERIES["events_value_histogram"] = q_events_value_histogram
def q_interval_union(sf_dir: str):
    """Gaps-and-islands interval merging (stages/temporal.py
    ``interval_union``): per-user activity windows
    ``[epoch_us(ts), epoch_us(ts) + floor(value*1e6)]`` merged into
    maximal disjoint islands — one key-hash shuffle, per-segment
    running-max island detection, maximum.reduceat collapse. Bounds
    are int64 microseconds, bit-exact vs the SQL window twin."""
    from ..stages.temporal import interval_union

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value"])

    def _iv(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        start = pc.cast(t.column("ts"), pa.int64())
        dur = pc.cast(pc.floor(pc.multiply(
            t.column("value"), pa.scalar(1000000.0, pa.float64()))),
            pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "start_us": start,
            "end_us": pc.add(start, dur),
        })

    iv = events.map_batches(_iv, batch_format="pyarrow")
    return interval_union(iv, "user_id", "start_us", "end_us",
                          n_buckets=32)
ORACLE_SQL["interval_union"] = (
    "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + "
    "CAST(floor(value * 1000000.0) AS BIGINT) AS e FROM events "
    "WHERE value IS NOT NULL), "
    "o AS (SELECT user_id, s, e, CASE WHEN s > coalesce(max(e) OVER "
    "(PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED "
    "PRECEDING AND 1 PRECEDING), -9223372036854775808) "
    "THEN 1 ELSE 0 END AS brk FROM iv), "
    "g AS (SELECT user_id, s, e, sum(brk) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM o) "
    "SELECT user_id, min(s) AS start_us, max(e) AS end_us FROM g "
    "GROUP BY user_id, isl"
)
QUERIES["interval_union"] = q_interval_union
def q_events_value_zscore(sf_dir: str):
    """Per-group feature standardization (training-data scaling):
    z = (value - mean) / std within each event_type. Composition of
    existing primitives — `grouped_moments` sufficient-statistic
    partials give key-scale (mean, var) rows, the driver grid-rounds
    them to the repo-wide 1e-6 float contract (the gridded moments
    are PROVEN bit-equal to the SQL twin by `events_value_stats`,
    so the z arithmetic runs on bit-identical inputs both sides),
    broadcasts the tiny per-type dict in the closure, and a
    row-local map does the scaling at scan speed — no second
    shuffle."""
    import numpy as np

    from ..stages.stats import grouped_moments

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"])
    moments = grouped_moments(
        events.select_columns(["event_type", "value"]),
        "event_type", "value")

    def _grid(x: float) -> float:
        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    stats = {}
    for r in moments.iter_rows():
        if (r["event_type"] is None or r["var_value"] is None
                or _grid(r["var_value"]) <= 0.0):
            continue
        stats[r["event_type"]] = (
            _grid(r["mean_value"]),
            math.sqrt(_grid(r["var_value"])))
    keys = pa.array(sorted(stats), pa.string())
    means = np.array([stats[k][0] for k in sorted(stats)],
                     dtype=np.float64)
    stds = np.array([stats[k][1] for k in sorted(stats)],
                    dtype=np.float64)

    def _z(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        idx = pc.index_in(t.column("event_type"), value_set=keys)
        t = t.filter(pc.is_valid(idx))
        pos = pc.index_in(t.column("event_type"),
                          value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        z = (v - means[pos]) / stds[pos]
        z = np.floor(z * 1000000.0 + 0.5) / 1000000.0
        return pa.table({
            "event_id": t.column("event_id"),
            "z": pa.array(z, pa.float64()),
        })

    return events.map_batches(_z, batch_format="pyarrow")
ORACLE_SQL["events_value_zscore"] = (
    "WITH s AS (SELECT event_type, "
    "floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS m, "
    "floor(var_samp(value) * 1000000.0 + 0.5) / 1000000.0 AS v "
    "FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL "
    "GROUP BY event_type) "
    "SELECT e.event_id, floor((e.value - s.m) / sqrt(s.v) "
    "* 1000000.0 + 0.5) / 1000000.0 AS z "
    "FROM events e JOIN s USING (event_type) "
    "WHERE e.value IS NOT NULL AND s.v > 0"
)
QUERIES["events_value_zscore"] = q_events_value_zscore
def q_interval_coverage(sf_dir: str):
    """Per-user total covered time over the merged activity islands:
    one more map pass over `interval_union` output — island blocks
    are BUCKET-ALIGNED (a user's islands all live in one whole-bucket
    output block), so a block-local groupby IS the global per-user
    sum: zero additional shuffles."""
    iv = q_interval_union(sf_dir)

    def _cover(batch: pa.Table) -> pa.Table:
        dur = pc.subtract(batch.column("end_us"),
                          batch.column("start_us"))
        sub = pa.table({"user_id": batch.column("user_id"),
                        "covered_us": dur})
        agg = sub.group_by(["user_id"]).aggregate([("covered_us",
                                                    "sum")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "covered_us": pc.cast(agg.column("covered_us_sum"),
                                  pa.int64()),
        })

    return iv.map_batches(_cover, batch_format="pyarrow",
                          batch_size=None)
ORACLE_SQL["interval_coverage"] = (
    "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + "
    "CAST(floor(value * 1000000.0) AS BIGINT) AS e FROM events "
    "WHERE value IS NOT NULL), "
    "o AS (SELECT user_id, s, e, CASE WHEN s > coalesce(max(e) OVER "
    "(PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED "
    "PRECEDING AND 1 PRECEDING), -9223372036854775808) "
    "THEN 1 ELSE 0 END AS brk FROM iv), "
    "g AS (SELECT user_id, s, e, sum(brk) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM o), "
    "m AS (SELECT user_id, min(s) AS s, max(e) AS e FROM g "
    "GROUP BY user_id, isl) "
    "SELECT user_id, CAST(sum(e - s) AS BIGINT) AS covered_us "
    "FROM m GROUP BY user_id"
)
QUERIES["interval_coverage"] = q_interval_coverage
def q_event_funnel(sf_dir: str):
    """Ordered min-time funnel (stages/temporal.py
    ``funnel_counts``): users completing view -> click -> purchase,
    each step strictly after the previous step's first occurrence.
    One user-hash shuffle; per-bucket work is vectorized per STEP
    (never per user); driver folds steps-scale count partials."""
    from ..stages.temporal import funnel_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return funnel_counts(events, FUNNEL_STEPS, n_buckets=32)
ORACLE_SQL["event_funnel"] = (
    "WITH s0 AS (SELECT user_id, min(ts) AS t FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s0 USING (user_id) WHERE e.event_type = 'click' "
    "AND e.ts > s0.t GROUP BY e.user_id), "
    "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' "
    "AND e.ts > s1.t GROUP BY e.user_id) "
    "SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step, "
    "CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users "
    "UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1) "
    "UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2)"
)
QUERIES["event_funnel"] = q_event_funnel
def q_sliding_distinct_users(sf_dir: str):
    """Rolling active users (stages/temporal.py
    ``sliding_distinct``): distinct users per event_type over a
    trailing 3-hour window — the exact window-explode + global
    distinct plan (distinct does NOT decompose into per-hour
    partials, unlike the sum/count sliding window)."""
    from ..stages.temporal import sliding_distinct

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"])
    return sliding_distinct(events, window_hours=3, n_buckets=16)
ORACLE_SQL["sliding_distinct_users"] = (
    "WITH p AS (SELECT DISTINCT event_type AS k, "
    "date_trunc('hour', ts) AS h, user_id AS u FROM events "
    "WHERE user_id IS NOT NULL AND event_type IS NOT NULL), "
    "anchors AS (SELECT DISTINCT k, h FROM p) "
    "SELECT a.k AS event_type, a.h AS hour, "
    "CAST(count(DISTINCT p.u) AS BIGINT) AS n_users_w "
    "FROM anchors a JOIN p ON p.k = a.k "
    "AND p.h BETWEEN a.h - INTERVAL 2 HOUR AND a.h "
    "GROUP BY a.k, a.h"
)
QUERIES["sliding_distinct_users"] = q_sliding_distinct_users
def q_event_funnel_windowed(sf_dir: str):
    """Windowed funnel: view -> click -> purchase where each
    conversion must land within 6 hours of the previous step's first
    occurrence (`funnel_counts(within_hours=6)`) — the
    bounded-conversion variant of `event_funnel`."""
    from ..stages.temporal import funnel_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return funnel_counts(events, FUNNEL_STEPS, n_buckets=32,
                         within_hours=6)
ORACLE_SQL["event_funnel_windowed"] = (
    "WITH s0 AS (SELECT user_id, min(ts) AS t FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s0 USING (user_id) WHERE e.event_type = 'click' "
    "AND e.ts > s0.t AND e.ts <= s0.t + INTERVAL 6 HOUR "
    "GROUP BY e.user_id), "
    "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' "
    "AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 6 HOUR "
    "GROUP BY e.user_id) "
    "SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step, "
    "CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users "
    "UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1) "
    "UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2)"
)
QUERIES["event_funnel_windowed"] = q_event_funnel_windowed
def q_recency_user_scores(sf_dir: str):
    """Recency-weighted engagement score per user:
    sum(value * 2^-(age_days)) with age measured from the corpus'
    max event day — the exponential-decay rollup behind "recent
    activity" features. Decay factors are DYADIC (2^-k with integer
    k), so every per-row weight is IEEE-exact on both engines; only
    the sum order differs, absorbed by the 1e-6 grid. Two passes:
    a tiny max-day fold, then map-side weighted partials + one small
    user groupby."""
    import numpy as np

    from ray.data.aggregate import Sum

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value"])

    def _day_partial(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.int64())
        return pa.table({"mx": pa.array(
            [pc.max(d).as_py() or 0], pa.int64())})

    max_day = 0
    for b in events.map_batches(
            _day_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            max_day = max(max_day,
                          int(pc.max(b.column("mx")).as_py() or 0))
    day_us = 86_400_000_000

    def _weighted(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        d = pc.cast(pc.floor_temporal(t.column("ts"), unit="day"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        age = (max_day - d) // day_us
        v = t.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        w = v * np.exp2(-age.astype(np.float64))
        return pa.table({
            "user_id": t.column("user_id"),
            "w": pa.array(w, pa.float64()),
        })

    out = events.map_batches(
        _weighted, batch_format="pyarrow"
    ).groupby("user_id").aggregate(Sum("w"))

    def _grid(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(w)")
        return pa.table({
            "user_id": batch.column("user_id"),
            "score": pc.divide(
                pc.floor(pc.add(pc.multiply(s, 1e6), 0.5)), 1e6),
        })

    return out.map_batches(_grid, batch_format="pyarrow")
ORACLE_SQL["recency_user_scores"] = (
    "WITH mx AS (SELECT max(date_trunc('day', ts)) AS m FROM events), "
    "w AS (SELECT user_id, value * power(2.0, "
    "-CAST(date_diff('day', date_trunc('day', ts), mx.m) AS DOUBLE)) "
    "AS w FROM events, mx WHERE value IS NOT NULL) "
    "SELECT user_id, floor(sum(w) * 1000000.0 + 0.5) / 1000000.0 "
    "AS score FROM w GROUP BY user_id"
)
QUERIES["recency_user_scores"] = q_recency_user_scores
def q_churned_users(sf_dir: str):
    """Churn: users active in the FIRST half of the event range but
    absent from the LAST 1% of the range — the period set
    difference, composed from the engine's own EXCEPT operator over
    two distinct-user projections (integer-us split point; the churn
    list itself is concrete, users-absent-recently scale)."""
    from ..stages.setops import except_distinct

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    lo_hi = [None, None]
    for b in events.map_batches(
            lambda t: pa.table({
                "lo": pa.array([pc.min(pc.cast(t.column("ts"),
                                               pa.int64())).as_py()]),
                "hi": pa.array([pc.max(pc.cast(t.column("ts"),
                                               pa.int64())).as_py()]),
            }), batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for lo, hi in zip(b.column("lo").to_pylist(),
                          b.column("hi").to_pylist()):
            if lo is not None:
                lo_hi[0] = lo if lo_hi[0] is None else min(lo_hi[0], lo)
            if hi is not None:
                lo_hi[1] = hi if lo_hi[1] is None else max(lo_hi[1], hi)
    # split point in INTEGER epoch-us (floor) — interval math in
    # timestamp space rounds differently between engines. The last
    # 10% of the range is the "recent" period: active-before,
    # absent-recently = churned.
    mid = lo_hi[0] + (lo_hi[1] - lo_hi[0]) * 99 // 100

    def _half(first: bool):
        def _fn(batch: pa.Table) -> pa.Table:
            us = pc.cast(batch.column("ts"), pa.int64())
            m = (pc.less_equal(us, pa.scalar(mid, pa.int64()))
                 if first else
                 pc.greater(us, pa.scalar(mid, pa.int64())))
            t = batch.filter(m)
            return pa.table({
                "user_id": pc.unique(t.column("user_id")),
            })
        return events.map_batches(_fn, batch_format="pyarrow")

    out = except_distinct(_half(True), _half(False), n_buckets=32)
    parts = [b for b in out.iter_batches(batch_format="pyarrow",
                                         batch_size=None)
             if b.num_rows]
    if not parts:
        return pa.table({"user_id": pa.array([], pa.int64())})
    return pa.concat_tables(parts).sort_by([("user_id", "ascending")])
ORACLE_SQL["churned_users"] = (
    "WITH rng AS (SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS lo, "
    "CAST(epoch_us(max(ts)) AS BIGINT) AS hi FROM events), "
    "m AS (SELECT lo + (hi - lo) * 99 // 100 AS mid FROM rng) "
    "SELECT DISTINCT user_id FROM events, m "
    "WHERE epoch_us(ts) <= mid "
    "EXCEPT SELECT DISTINCT user_id FROM events, m "
    "WHERE epoch_us(ts) > mid"
)
QUERIES["churned_users"] = q_churned_users
def q_peak_sessions(sf_dir: str):
    """Peak concurrent sessions (stages/temporal.py
    ``peak_concurrency``): 30-minute gap sessions from `sessionize`,
    swept as +1/-1 delta events through a banded prefix sum — the
    distributed sweepline; driver state is bands-scale, never
    events."""
    from ..stages.temporal import peak_concurrency, sessionize

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])
    sessions = sessionize(events, gap_minutes=30.0, n_buckets=32)
    return peak_concurrency(sessions, band_minutes=60, n_buckets=32)
ORACLE_SQL["peak_sessions"] = "WITH e AS (SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM e), iv AS (SELECT epoch_us(min(ts)) AS st, CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS dur FROM s GROUP BY user_id, sess), ev AS (SELECT st AS t, 1 AS delta FROM iv UNION ALL SELECT st + dur + 1, -1 FROM iv), run AS (SELECT sum(delta) OVER (ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS c FROM ev) SELECT CAST(max(c) AS BIGINT) AS peak FROM run"
QUERIES["peak_sessions"] = q_peak_sessions
def q_user_retention(sf_dir: str):
    """Retention cohorts: users grouped by FIRST active day, counted
    per day-offset of return — the classic growth-analytics rollup,
    fused into ONE user-keyed exchange: block-level (user, day)
    dedup map-side, then a whole-bucket UDF makes the pair set
    globally distinct (all of a user's rows co-locate), reads each
    user's cohort as its sorted segment head, computes day offsets,
    and pre-combines (cohort, offset) counts — the old
    distinct-groupby / cohort-groupby / repartition-join chain (four
    barriers, with the pair set re-executed per consumer) collapses
    into one barrier plus a driver-side (cohorts x offsets) fold."""
    import numpy as np

    from ..functions.hashing import bucket_ids

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def _day_pairs(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch.column("ts"), unit="day")
        sub = pa.table({"user_id": batch.column("user_id"), "d": d})
        agg = sub.group_by(["user_id", "d"]).aggregate([])
        u = agg.column("user_id")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        return pa.table({
            "user_id": u,
            "d": pc.cast(agg.column("d"), pa.int64()),
            "_bucket": pa.array(bucket_ids(u, 32), pa.int64()),
        })

    _DAY_US = 86_400_000_000

    def _cohort_partials(group: pa.Table) -> pa.Table:
        from ..functions.segments import key_segments

        empty = pa.table({
            "cohort_day": pa.array([], pa.int64()),
            "day_offset": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        g = group.sort_by([("user_id", "ascending"),
                           ("d", "ascending")])
        u = g.column("user_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = g.column("d").combine_chunks().to_numpy(
            zero_copy_only=False)
        # global distinctness: a user-day straddling blocks lands
        # here twice; keep the first (all of a user's rows co-locate)
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        seg_start, seg_len = key_segments(u)
        cohort = np.repeat(d[seg_start], seg_len)
        off = (d - cohort) // _DAY_US
        # (cohort, offset) partial combine before the tiny groupby;
        # pack on the cohort DAY INDEX (epoch-us cohorts would
        # overflow int64 under the *100000 pack)
        key = (cohort // _DAY_US) * 100_000 + off
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            "cohort_day": pa.array((uniq // 100_000) * _DAY_US,
                                   pa.int64()),
            "day_offset": pa.array(uniq % 100_000, pa.int64()),
            "n_users": pa.array(counts.astype(np.int64), pa.int64()),
        })

    partials = (
        events.map_batches(_day_pairs, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=32)
        .map_groups(_cohort_partials, batch_format="pyarrow")
    )
    # final merge is (cohorts x offsets)-scale — driver fold, not a
    # distributed aggregate barrier (the tiny-merge pattern)
    totals: Dict[tuple, int] = {}
    for b in partials.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        for c, o, n in zip(b.column("cohort_day").to_pylist(),
                           b.column("day_offset").to_pylist(),
                           b.column("n_users").to_pylist()):
            totals[(c, o)] = totals.get((c, o), 0) + n
    ks = sorted(totals)
    return pa.table({
        "cohort_day": pa.array(
            np.array([k[0] for k in ks],
                     dtype="datetime64[us]"), pa.timestamp("us")),
        "day_offset": pa.array([k[1] for k in ks], pa.int64()),
        "n_users": pa.array([totals[k] for k in ks], pa.int64()),
    })
ORACLE_SQL["user_retention"] = (
"WITH p AS (SELECT DISTINCT user_id, "
        "date_trunc('day', ts) AS d FROM events), "
        "f AS (SELECT user_id, min(d) AS c FROM p GROUP BY user_id) "
        "SELECT f.c AS cohort_day, "
        "CAST(date_diff('day', f.c, p.d) AS BIGINT) AS day_offset, "
        "CAST(count(*) AS BIGINT) AS n_users "
        "FROM p JOIN f ON p.user_id = f.user_id GROUP BY 1, 2"
)
QUERIES["user_retention"] = q_user_retention
def q_user_event_trail(sf_dir: str):
    """Ordered per-user event-type trail (stages/stats.py
    ``grouped_concat``): string_agg(event_type, ',' ORDER BY ts,
    event_id) per user — one key-hash shuffle, whole-bucket sort +
    ListArray/binary_join assembly, never a per-key UDF."""
    from ..stages.stats import grouped_concat

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )
    out = grouped_concat(events, "user_id", "event_type",
                         ["ts", "event_id"], sep=",",
                         out_col="trail", n_buckets=32)

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "trail": batch.column("trail"),
        })

    return out.map_batches(_fin, batch_format="pyarrow")
ORACLE_SQL["user_event_trail"] = (
"SELECT user_id, string_agg(event_type, ',' "
        "ORDER BY ts, event_id) AS trail FROM events GROUP BY user_id"
)
QUERIES["user_event_trail"] = q_user_event_trail
def q_events_by_type_salted(sf_dir: str):
    """Two-phase SALTED aggregate over a genuinely hot key.

    ``event_type`` has a handful of distinct values over the whole
    events table — every key is hot, so a naive groupby funnels each
    key's entire volume through one reducer. The salted shape:
    phase 1 groups by ``(event_type, salt)`` (salt = user_id % 16,
    deterministic and data-derived) spreading each hot key over 16
    reducers; phase 2 re-aggregates the 16 partials per key. Combined
    with the map-side partial combine, shuffle volume is
    O(keys × salt × blocks) regardless of row skew.
    """
    n_salt = 16

    def _partial(batch: pa.Table) -> pa.Table:
        # vectorized per-batch combine: salt column + one Arrow
        # group_by (no Python row loop)
        from ..stages.stats import partial_sum_count

        salt = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), n_salt - 1),
            pa.int64(),
        )
        return partial_sum_count(
            pa.table({
                "event_type": batch.column("event_type"),
                "salt": salt,
                "value": batch.column("value"),
            }),
            ["event_type", "salt"], "value",
        )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id", "value"])
    phase1 = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["event_type", "salt"])
        .aggregate(Sum("n_events"), Sum("sum_value"))
    )
    phase2 = phase1.groupby("event_type").aggregate(
        Sum("sum(n_events)"), Sum("sum(sum_value)")
    )

    def _finish(batch: pa.Table) -> pa.Table:
        sums = [
            math.floor(s * 1000000.0 + 0.5) / 1000000.0
            for s in batch.column("sum(sum(sum_value))").to_pylist()
        ]
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(sum(n_events))"), pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return phase2.map_batches(_finish, batch_format="pyarrow")
ORACLE_SQL["events_by_type_salted"] = (
"SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value "
        "FROM events GROUP BY event_type"
)
QUERIES["events_by_type_salted"] = q_events_by_type_salted
def q_user_sessions(sf_dir: str):
    """Gap-based sessionization (30-min gap), one row per session.

    The engine's windowed-state shape: ONE crc32-bucketed shuffle of
    (user, ts, value, event_id), then a whole-bucket Arrow sort +
    vectorized numpy break/segment math — never a per-user UDF. The
    DuckDB twin is the classic lag()+cumulative-sum sessionization.
    """
    from ..stages.temporal import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_id"],
    )
    return sessionize(ds, gap_minutes=30.0)
ORACLE_SQL["user_sessions"] = (
"WITH e AS (SELECT user_id, ts, event_id, value, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
        "AS brk FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM e) "
        "SELECT user_id, min(ts) AS session_start, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value, "
        "CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) "
        "AS duration_us "
        "FROM s GROUP BY user_id, sess"
)
QUERIES["user_sessions"] = q_user_sessions
def q_event_gaps(sf_dir: str):
    """Per-user inter-event gaps (the LAG window): count / max /
    total of microsecond gaps between consecutive events per user.
    ONE user-bucket shuffle + vectorized numpy diff/reduceat — all
    int64, bit-exact vs the DuckDB lag() OVER twin."""
    from ..stages.temporal import event_gaps

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
    )
    return event_gaps(ds).sort("user_id")
ORACLE_SQL["event_gaps"] = (
"WITH o AS (SELECT user_id, ts, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS pts "
        "FROM events), "
        "g AS (SELECT user_id, date_diff('microsecond', pts, ts) "
        "AS gap FROM o WHERE pts IS NOT NULL) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps, "
        "CAST(max(gap) AS BIGINT) AS max_gap_us, "
        "CAST(sum(gap) AS BIGINT) AS total_gap_us "
        "FROM g GROUP BY user_id ORDER BY user_id"
)
QUERIES["event_gaps"] = q_event_gaps
def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day) with GROUPING() ids: one
    output row per (type, day), per type, and the grand total. The
    measure is int64 value-cents, so partial combines at every level
    sum order-free and the DuckDB ROLLUP twin is bit-exact."""
    import numpy as np

    from ..stages.rollup import rollup_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64()),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    rolled = rollup_agg(prep, keys=["event_type", "day"],
                        value_col="cents")

    # Ray's sort range-partitioner mis-partitions (duplicates rows)
    # or crashes when a sort KEY contains nulls, and rollup subtotal
    # rows are null by design — sort on null-filled helper keys and
    # drop them (tests/test_rollup.py pins the hazard).
    def _sortable(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_et_ord", pc.fill_null(batch.column("event_type"), "")
        ).append_column(
            "_day_ord", pc.fill_null(
                pc.cast(batch.column("day"), pa.int64()), -1))

    return rolled.map_batches(_sortable, batch_format="pyarrow").sort(
        ["gid", "_et_ord", "_day_ord"]
    ).drop_columns(["_et_ord", "_day_ord"])
ORACLE_SQL["events_rollup"] = (
"WITH e AS (SELECT event_type, date_trunc('day', ts) AS day, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents "
        "FROM events) "
        "SELECT event_type, day, "
        "CAST(2 * grouping(event_type) + grouping(day) AS BIGINT) "
        "AS gid, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(cents) AS BIGINT) AS sum_val "
        "FROM e GROUP BY ROLLUP(event_type, day) "
        "ORDER BY gid, event_type, day"
)
QUERIES["events_rollup"] = q_events_rollup
def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day): all four grouping sets —
    (type, day), (type), (day), () — with GROUPING() ids, over the
    same int64 value-cents measure as ``events_rollup`` (bit-exact
    vs the DuckDB CUBE twin). The day-only subtotal is the set
    ROLLUP cannot produce."""
    import numpy as np

    from ..stages.rollup import cube_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64()),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    cubed = cube_agg(prep, keys=["event_type", "day"],
                     value_col="cents")

    # null-key sort hazard: sort on null-filled helper keys
    # (see q_events_rollup / tests/test_rollup.py)
    def _sortable(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_et_ord", pc.fill_null(batch.column("event_type"), "")
        ).append_column(
            "_day_ord", pc.fill_null(
                pc.cast(batch.column("day"), pa.int64()), -1))

    return cubed.map_batches(_sortable, batch_format="pyarrow").sort(
        ["gid", "_et_ord", "_day_ord"]
    ).drop_columns(["_et_ord", "_day_ord"])
ORACLE_SQL["events_cube"] = (
"WITH e AS (SELECT event_type, date_trunc('day', ts) AS day, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents "
        "FROM events) "
        "SELECT event_type, day, "
        "CAST(2 * grouping(event_type) + grouping(day) AS BIGINT) "
        "AS gid, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(cents) AS BIGINT) AS sum_val "
        "FROM e GROUP BY CUBE(event_type, day) "
        "ORDER BY gid, event_type, day"
)
QUERIES["events_cube"] = q_events_cube
def q_events_pivot(sf_dir: str):
    """PIVOT: one row per day, one int64 count column per event type
    (fixed column set, strict — an unseen type raises, never a silent
    drop). Map-side (day, type) partials → one day-bucket shuffle →
    vectorized matrix fill."""
    from ..stages.rollup import pivot_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "event_type": batch.column("event_type"),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    return pivot_counts(
        prep, row_col="day", col_col="event_type",
        col_values=["click", "error", "purchase", "signup", "view"],
    ).sort("day")
ORACLE_SQL["events_pivot"] = (
"SELECT date_trunc('day', ts) AS day, "
        "CAST(count(*) FILTER (event_type = 'click') AS BIGINT) "
        "AS n_click, "
        "CAST(count(*) FILTER (event_type = 'error') AS BIGINT) "
        "AS n_error, "
        "CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) "
        "AS n_purchase, "
        "CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) "
        "AS n_signup, "
        "CAST(count(*) FILTER (event_type = 'view') AS BIGINT) "
        "AS n_view "
        "FROM events GROUP BY 1 ORDER BY day"
)
QUERIES["events_pivot"] = q_events_pivot
def q_events_sliding_window(sf_dir: str):
    """Trailing 3-hour sliding-window aggregate per event type.

    Phase 1 pre-aggregates to (type, hour) hourly partials (map-side
    combine — the shuffle carries hours, not events); phase 2 windows
    by VALUE inside whole-bucket UDFs, so missing hours weigh zero —
    exactly SQL ``RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND
    CURRENT ROW``.
    """
    from ..stages.temporal import sliding_window_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    )
    return sliding_window_agg(ds, window_hours=3)
ORACLE_SQL["events_sliding_window"] = (
"WITH hourly AS (SELECT event_type, "
        "date_trunc('hour', ts) AS hour, count(*) AS n, sum(value) AS sv "
        "FROM events GROUP BY event_type, date_trunc('hour', ts)) "
        "SELECT event_type, hour, "
        "CAST(sum(n) OVER w AS BIGINT) AS n_events_w, "
        "floor(sum(sv) OVER w * 1000000.0 + 0.5) / 1000000.0 "
        "AS sum_value_w FROM hourly "
        "WINDOW w AS (PARTITION BY event_type ORDER BY hour "
        "RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)"
)
QUERIES["events_sliding_window"] = q_events_sliding_window
def q_events_frame_window(sf_dir: str):
    """Positional ROWS-frame window per user (stages/temporal.py
    ``frame_window``): trailing-4-event spend sum + LEAD(cents) for
    every event, ordered by (ts, event_id). One row per event; the
    int64 cents measure keeps the DuckDB ``ROWS BETWEEN 3 PRECEDING
    AND CURRENT ROW`` / ``lead()`` twin bit-exact."""
    import numpy as np

    from ..stages.temporal import frame_window

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": batch.column("event_id"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64()),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    out = frame_window(prep, key_col="user_id",
                       order_cols=["ts", "event_id"],
                       val_col="cents", preceding=3)
    return out.sort(["user_id", "ts", "event_id"])
ORACLE_SQL["events_frame_window"] = (
"WITH e AS (SELECT user_id, ts, event_id, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents "
        "FROM events) "
        "SELECT user_id, ts, event_id, cents, "
        "CAST(sum(cents) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS win_sum, "
        "lead(cents) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS lead_val "
        "FROM e ORDER BY user_id, ts, event_id"
)
QUERIES["events_frame_window"] = q_events_frame_window
def q_events_json_agg(sf_dir: str):
    """JSON scalar extraction (§2.8's JSON family — the reference
    parses LanguageTool's JSON response, `lib/ocr_step.py:395-402`):
    parse the ``props`` JSON column per event, extract ``k``, and
    aggregate per event type with map-side partial combine."""
    import json

    from ray.data.aggregate import Max, Min

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])

    def _extract(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch.column("props").to_pylist():
            try:
                v = json.loads(p).get("k") if p else None
            except (ValueError, AttributeError):
                v = None
            ks.append(v)
        return pa.table({
            "event_type": batch.column("event_type"),
            "k": pa.array(ks, pa.int64()),
        })

    agg = (
        ds.map_batches(_extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(), Sum("k"), Min("k"), Max("k"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("count()"), pa.int64()),
            "sum_k": pc.cast(batch.column("sum(k)"), pa.int64()),
            "min_k": pc.cast(batch.column("min(k)"), pa.int64()),
            "max_k": pc.cast(batch.column("max(k)"), pa.int64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")
ORACLE_SQL["events_json_agg"] = (
"SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
        "AS sum_k, "
        "CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
        "AS min_k, "
        "CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
        "AS max_k FROM events GROUP BY event_type"
)
QUERIES["events_json_agg"] = q_events_json_agg
def q_events_value_stats(sf_dir: str):
    """Per-type value moments (stages/stats.py ``grouped_moments``):
    count/mean/var_samp from sufficient-statistic partials — blocks
    contribute (key, n, sum, sumsq) rows, one tiny groupby, finish
    math at key scale. Grid-rounded to the repo-wide 1e-6 float
    contract."""
    from ..stages.stats import grouped_moments

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = grouped_moments(events, "event_type", "value")

    def _grid(batch: pa.Table) -> pa.Table:
        def g(col):
            return pc.divide(
                pc.floor(pc.add(pc.multiply(col, 1e6), 0.5)), 1e6)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "mean_value": g(batch.column("mean_value")),
            "var_value": g(batch.column("var_value")),
        })

    return out.map_batches(_grid, batch_format="pyarrow")
ORACLE_SQL["events_value_stats"] = (
    "SELECT event_type, CAST(count(value) AS BIGINT) AS n, "
    "floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS mean_value, "
    "floor(var_samp(value) * 1000000.0 + 0.5) / 1000000.0 "
    "AS var_value FROM events GROUP BY event_type"
)
QUERIES["events_value_stats"] = q_events_value_stats
def q_click_attribution(sf_dir: str):
    """As-of join, ORACLE-CHECKED against DuckDB's native ASOF JOIN:
    for every click event, the latest view event by the same user
    at-or-before the click (the classic attribution/backfill shape).
    One crc32-bucketed co-shuffle; per-bucket sorted-right
    searchsorted probe — never a per-user UDF."""
    from ..stages.join import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]
    )

    def _views(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("event_type"), "view")
        b = batch.filter(m)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "view_id": b.column("event_id"),
            "view_ts": b.column("ts"),
        })

    views = ev.map_batches(_views, batch_format="pyarrow")
    joined = asof_join(clicks, views, on="user_id", ts_col="ts",
                       right_cols=["view_id", "view_ts"], how="left")

    def _finish(batch: pa.Table) -> pa.Table:
        gap = pc.cast(
            pc.subtract(batch.column("ts"), batch.column("view_ts")),
            pa.duration("us"),
        )
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "view_id": batch.column("view_id"),
            "gap_us": pc.cast(gap, pa.int64()),
        })

    return joined.map_batches(_finish, batch_format="pyarrow")
ORACLE_SQL["click_attribution"] = (
"WITH c AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'click'), "
        "v AS (SELECT event_id AS view_id, user_id, ts AS view_ts "
        "FROM events WHERE event_type = 'view') "
        "SELECT c.event_id, c.user_id, c.ts, v.view_id, "
        "CAST(date_diff('microsecond', v.view_ts, c.ts) AS BIGINT) "
        "AS gap_us "
        "FROM c ASOF LEFT JOIN v "
        "ON c.user_id = v.user_id AND v.view_ts <= c.ts"
)
QUERIES["click_attribution"] = q_click_attribution
def q_campaign_attribution(sf_dir: str):
    """Range (interval) join, banded SHUFFLE strategy, oracle-checked
    against a DuckDB ``BETWEEN`` join: every event × every campaign
    window containing its timestamp — one row PER MATCHING PAIR.

    Campaigns are 24 deterministic 54-hour windows starting every 30
    hours through Jan 2024, so consecutive windows overlap by 24h and
    most events belong to exactly two — multi-match is load-bearing.
    The engine path cuts time into 1-day bands, replicates each window
    to the 3 bands it overlaps and co-shuffles (no memory assumption,
    no all-pairs scan); the pytest differential also covers the
    broadcast strategy.
    """
    import datetime as dt

    from ..stages.join import range_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"])
    base = dt.datetime(2024, 1, 1)
    camp = pa.table({
        "campaign_id": pa.array(range(24), pa.int64()),
        "start_ts": pa.array(
            [base + dt.timedelta(hours=30 * k) for k in range(24)],
            pa.timestamp("us")),
        "end_ts": pa.array(
            [base + dt.timedelta(hours=30 * k + 54) for k in range(24)],
            pa.timestamp("us")),
    })
    joined = range_join(
        ev, ray.data.from_arrow(camp),
        value_col="ts", lo_col="start_ts", hi_col="end_ts",
        right_cols=["campaign_id"], how="inner",
        strategy="shuffle", band_width=86400e6, n_buckets=32,
    )
    return joined.select_columns(["event_id", "campaign_id",
                                  "event_type"])
ORACLE_SQL["campaign_attribution"] = (
"WITH camp AS (SELECT k AS campaign_id, "
        "TIMESTAMP '2024-01-01' + to_hours(30 * k) AS start_ts, "
        "TIMESTAMP '2024-01-01' + to_hours(30 * k + 54) AS end_ts "
        "FROM (SELECT unnest(range(24)) AS k)) "
        "SELECT event_id, campaign_id, event_type "
        "FROM events JOIN camp "
        "ON events.ts BETWEEN camp.start_ts AND camp.end_ts"
)
QUERIES["campaign_attribution"] = q_campaign_attribution
def q_events_hourly(sf_dir: str):
    """Timestamp bucketing + grouped aggregate over the events table.

    Map-side partial combine: each batch reduces to one row per
    (hour, event_type) BEFORE the shuffle, so the groupby moves
    partials (keys × blocks rows), never raw events.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        from ..stages.stats import partial_sum_count

        return partial_sum_count(
            pa.table({
                "hour": pc.floor_temporal(batch.column("ts"),
                                          unit="hour"),
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }),
            ["hour", "event_type"], "value",
            sum_name="value", count_name="n",
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n"), Sum("value"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        sums = [
            math.floor(s * 1000000.0 + 0.5) / 1000000.0
            for s in batch.column("sum(value)").to_pylist()
        ]
        return pa.table({
            "hour": pc.cast(batch.column("hour"), pa.timestamp("us")),
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(n)"), pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")
ORACLE_SQL["events_hourly"] = (
"SELECT date_trunc('hour', ts) AS hour, event_type, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value "
        "FROM events GROUP BY 1, 2"
)
QUERIES["events_hourly"] = q_events_hourly
def q_events_value_corr(sf_dir: str):
    """Per-type Pearson correlation between hour-of-day and value
    (stages/stats.py ``grouped_corr``): sufficient-statistic partials
    per block, one tiny groupby, key-scale finish — the
    ``grouped_moments`` shape extended to cross moments. Grid-rounded
    to the repo-wide 1e-6 float contract."""
    from ..stages.stats import grouped_corr

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"])

    def _hour(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "hour": pc.cast(pc.hour(batch.column("ts")), pa.float64()),
            "value": batch.column("value"),
        })

    out = grouped_corr(
        events.map_batches(_hour, batch_format="pyarrow"),
        "event_type", "hour", "value")

    def _grid(batch: pa.Table) -> pa.Table:
        c = batch.column("corr_xy")
        g = pc.divide(pc.floor(pc.add(pc.multiply(c, 1e6), 0.5)), 1e6)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "corr_hour_value": g,
        })

    return out.map_batches(_grid, batch_format="pyarrow")
ORACLE_SQL["events_value_corr"] = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "FLOOR(corr(CAST(extract(hour FROM ts) AS DOUBLE), value) * 1e6 "
    "+ 0.5) / 1e6 AS corr_hour_value "
    "FROM events GROUP BY event_type"
)
QUERIES["events_value_corr"] = q_events_value_corr
def q_event_transitions(sf_dir: str):
    """Markov transition matrix over per-user event trails
    (stages/temporal.event_transitions): global counts of consecutive
    ``(src_type, dst_type)`` pairs ordered by (ts, event_id) within
    each user. ONE user-bucket co-shuffle + in-bucket Arrow group_by
    partials; bit-exact vs the DuckDB lead() OVER twin."""
    from ..stages.temporal import event_transitions

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return event_transitions(ds).sort(["src_type", "dst_type"])
ORACLE_SQL["event_transitions"] = (
    "SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n FROM ("
    "SELECT event_type AS src_type, lead(event_type) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS dst_type "
    "FROM events) WHERE dst_type IS NOT NULL "
    "GROUP BY src_type, dst_type ORDER BY src_type, dst_type"
)
QUERIES["event_transitions"] = q_event_transitions
def q_events_winsorized(sf_dir: str):
    """Winsorized per-type mean (stages/stats.winsorized_group_mean):
    int64 cents clipped to the exact global percentile_disc
    [p05, p95], then one map-side-combined groupby. Robust-KPI shape:
    two streaming passes, bounds broadcast as scalars."""
    import numpy as np

    from ..stages.stats import winsorized_group_mean

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()),
        })

    cents = ds.map_batches(_cents, batch_format="pyarrow")
    return winsorized_group_mean(
        cents, "event_type", "cents", 0.05, 0.95
    ).sort("event_type")
ORACLE_SQL["events_winsorized"] = (
    "WITH c AS (SELECT event_type, "
    "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events), "
    "b AS (SELECT percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) "
    "AS lo, percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS hi "
    "FROM c) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "floor(sum(least(greatest(cents, lo), hi)) / count(*) / 100.0 "
    "* 1000.0 + 0.5) / 1000.0 AS mean_winsorized "
    "FROM c CROSS JOIN b GROUP BY event_type, lo, hi "
    "ORDER BY event_type"
)
QUERIES["events_winsorized"] = q_events_winsorized
def q_user_mode_event(sf_dir: str):
    """Exact per-user MODE event type (stages/stats.grouped_mode):
    map-side (user, type, n) partial combine → one user-bucket
    co-shuffle → whole-bucket sort + boundary-mask arg-max with the
    (count desc, value asc) tie rule."""
    from ..stages.stats import grouped_mode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return grouped_mode(ds, "user_id", "event_type").sort("user_id")
ORACLE_SQL["user_mode_event"] = (
    "SELECT user_id, mode_value, n FROM ("
    "SELECT user_id, event_type AS mode_value, "
    "CAST(count(*) AS BIGINT) AS n, row_number() OVER ("
    "PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC) "
    "AS rk FROM events GROUP BY user_id, event_type) "
    "WHERE rk = 1 ORDER BY user_id"
)
QUERIES["user_mode_event"] = q_user_mode_event
def q_event_type_affinity(sf_dir: str):
    """Market-basket pair supports (stages/temporal.
    event_type_affinity): users exhibiting each unordered distinct
    event-type pair — the Apriori first pass. Map-side distinct,
    one user co-shuffle, vectorized basket expansion."""
    from ..stages.temporal import event_type_affinity

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return event_type_affinity(ds).sort(["type_a", "type_b"])
ORACLE_SQL["event_type_affinity"] = (
    "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
    "SELECT a.event_type AS type_a, b.event_type AS type_b, "
    "CAST(count(*) AS BIGINT) AS n_users FROM d a JOIN d b "
    "ON a.user_id = b.user_id AND a.event_type < b.event_type "
    "GROUP BY 1, 2 ORDER BY type_a, type_b"
)
QUERIES["event_type_affinity"] = q_event_type_affinity
def q_url_churn(sf_dir: str):
    """Per-URL crawl-revisit churn over planted snapshot history.

    Revisits are synthesized by doc_id formula (url_id = doc_id % 120,
    visit = doc_id // 120) with a content fingerprint that changes on
    a per-url cycle (url_id % 3 + 1 distinct versions), so the ORACLE
    derives every expected statistic independently in SQL — all-int64
    except the single-division round3 change_ratio.
    """
    import numpy as np

    from ..stages.web import url_churn

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy()
        url_id = ids % 120
        visit = ids // 120
        fp = url_id * 100 + visit % (url_id % 3 + 1)
        host = url_id % 10
        urls = [
            f"https://host{h}.example.com/p/{u}"
            for h, u in zip(host.tolist(), url_id.tolist())
        ]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "fp": pa.array(fp, pa.int64()),
            "ts": pa.array(1600000000 + ids, pa.int64()),
        })

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aug, batch_format="pyarrow")
    return url_churn(pages)
ORACLE_SQL["url_churn"] = """
WITH s AS (
  SELECT 'https://host' || CAST((doc_id % 120) % 10 AS VARCHAR)
         || '.example.com/p/' || CAST(doc_id % 120 AS VARCHAR) AS url,
         (doc_id % 120) * 100
           + (doc_id // 120) % ((doc_id % 120) % 3 + 1) AS fp,
         1600000000 + doc_id AS ts
  FROM documents
)
SELECT url,
  CAST(count(*) AS BIGINT) AS n_snapshots,
  CAST(count(DISTINCT fp) AS BIGINT) AS n_versions,
  CAST(min(ts) AS BIGINT) AS first_ts,
  CAST(max(ts) AS BIGINT) AS last_ts,
  CASE WHEN count(*) = 1 THEN 0.0
       ELSE floor((count(DISTINCT fp) - 1.0) / (count(*) - 1.0)
                  * 1000 + 0.5) / 1000 END AS change_ratio
FROM s GROUP BY url
"""
QUERIES["url_churn"] = q_url_churn
def q_interval_overlap(sf_dir: str):
    """Interval × interval overlap join over doc_id-formula windows
    (first half of the docs vs second half), grid co-shuffle vs the
    DuckDB inequality join."""
    import numpy as np

    from ..stages.join import interval_overlap_join

    def _mk(side: int, id_name: str):
        def _fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").combine_chunks().to_numpy()
            if side == 0:
                keep = ids < 250
                mul, span = 37, 40
            else:
                keep = ids >= 250
                mul, span = 53, 30
            ids = ids[keep].astype(np.int64)
            lo = (ids * mul) % 500
            return pa.table({
                id_name: pa.array(ids, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(lo + ids % span, pa.int64()),
            })
        return _fn

    docs = _docs(sf_dir, columns=["doc_id"])
    left = docs.map_batches(_mk(0, "l_id"), batch_format="pyarrow")
    right = docs.map_batches(_mk(1, "r_id"), batch_format="pyarrow")
    return interval_overlap_join(left, right, grid=32)
ORACLE_SQL["interval_overlap"] = """
WITH l AS (
  SELECT doc_id AS l_id, (doc_id * 37) % 500 AS llo,
         (doc_id * 37) % 500 + doc_id % 40 AS lhi
  FROM documents WHERE doc_id < 250
), r AS (
  SELECT doc_id AS r_id, (doc_id * 53) % 500 AS rlo,
         (doc_id * 53) % 500 + doc_id % 30 AS rhi
  FROM documents WHERE doc_id >= 250
)
SELECT l_id, r_id,
  CAST(least(lhi, rhi) - greatest(llo, rlo) + 1 AS BIGINT) AS overlap
FROM l JOIN r ON llo <= rhi AND rlo <= lhi
"""
QUERIES["interval_overlap"] = q_interval_overlap
def q_events_by_type_adaptive(sf_dir: str):
    """ADAPTIVE salted aggregate: per-key salt fan-out measured from
    a deterministic plan-time sample (only hot keys salt; cold keys
    skip the fan-out the fixed-salt shape pays everywhere). Values
    identical to the plain groupby — the sample tunes the plan."""
    from ..stages.stats import adaptive_salted_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"])
    plan = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    # tiny target so the sample actually classifies keys as hot at
    # test scale (every event_type is hot here — mirrors the salted
    # query's premise)
    return adaptive_salted_agg(
        ds, "event_type", "value", "user_id",
        target_per_reducer=200, plan_ds=plan)
ORACLE_SQL["events_by_type_adaptive"] = ORACLE_SQL["events_by_type_salted"]
QUERIES["events_by_type_adaptive"] = q_events_by_type_adaptive
def q_user_skyline(sf_dir: str):
    """Pareto-frontier user selection (stages/stats.skyline_2d —
    SKYLINE OF n_rows MAX, n_distinct MAX, Börzsönyi ICDE'01): users
    not dominated on BOTH activity axes. Points come from ONE
    (user, type, n) partial co-shuffle
    (stats.grouped_count_and_distinct); the skyline itself is
    map-side local frontiers + one frontier-scale final pass."""
    from ..stages.stats import grouped_count_and_distinct, skyline_2d

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    pts = grouped_count_and_distinct(ev, "user_id", "event_type")
    return skyline_2d(pts, "n_rows", "n_distinct").sort("user_id")
ORACLE_SQL["user_skyline"] = (
    "WITH pts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct "
    "FROM events GROUP BY user_id) "
    "SELECT user_id, n_rows, n_distinct FROM pts q "
    "WHERE NOT EXISTS (SELECT 1 FROM pts p "
    "WHERE p.n_rows >= q.n_rows AND p.n_distinct >= q.n_distinct "
    "AND (p.n_rows > q.n_rows OR p.n_distinct > q.n_distinct)) "
    "ORDER BY user_id"
)
QUERIES["user_skyline"] = q_user_skyline
def q_events_trend(sf_dir: str):
    """Per-type value trend over crawl time (stages/stats.grouped_ols
    — the SQL regr_slope/regr_intercept pair from one
    sufficient-statistic pass): x = day index since 2024-01-01 (small
    ints by design — the normal-equation form is shift-invariant, so
    shift), y = value. Compared on the repo-wide 1e-6 grid like
    events_value_corr."""
    from ..stages.stats import grouped_ols

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def _day(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        day = pc.subtract(
            pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
            pa.scalar(19723, pa.int64()))
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": day,
            "value": batch.column("value"),
        })

    out = grouped_ols(
        ds.map_batches(_day, batch_format="pyarrow"),
        "event_type", "day", "value")

    def _grid(batch: pa.Table) -> pa.Table:
        def _r6(col):
            return pc.divide(
                pc.floor(pc.add(pc.multiply(col, 1e6), 0.5)), 1e6)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "slope": _r6(batch.column("slope")),
            "intercept": _r6(batch.column("intercept")),
        })

    return out.map_batches(_grid, batch_format="pyarrow").sort(
        "event_type")
ORACLE_SQL["events_trend"] = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "FLOOR(regr_slope(value, "
    "CAST(floor(epoch(ts) / 86400) AS BIGINT) - 19723) * 1e6 + 0.5) "
    "/ 1e6 AS slope, "
    "FLOOR(regr_intercept(value, "
    "CAST(floor(epoch(ts) / 86400) AS BIGINT) - 19723) * 1e6 + 0.5) "
    "/ 1e6 AS intercept "
    "FROM events GROUP BY event_type ORDER BY event_type"
)
QUERIES["events_trend"] = q_events_trend
def q_type_hour_bursts(sf_dir: str):
    """Traffic burst detection (stages/temporal.rate_bursts): hours
    where an event type's count exceeds its OWN hourly baseline by
    more than 2σ — the crawl-rate anomaly monitor (bot floods,
    scraper storms, recrawl loops). The z-test runs as the
    all-integer predicate (c·H−S)² > 4·(H·S2−S²) with c·H−S > 0 —
    no sqrt, no float — in Python ints engine-side and HUGEINT in
    the oracle."""
    from ..stages.temporal import rate_bursts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])
    return rate_bursts(ds, key_col="event_type", ts_col="ts", z=2)
ORACLE_SQL["type_hour_bursts"] = (
    "WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
    "s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS h, "
    "CAST(sum(n) AS HUGEINT) AS s, "
    "sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS s2, "
    "CAST(max(n) AS BIGINT) AS max_n FROM c GROUP BY 1) "
    "SELECT c.event_type, CAST(s.h AS BIGINT) AS n_hours, "
    "CAST(sum(CASE WHEN CAST(c.n AS HUGEINT) * s.h - s.s > 0 AND "
    "(CAST(c.n AS HUGEINT) * s.h - s.s) * "
    "(CAST(c.n AS HUGEINT) * s.h - s.s) > "
    "4 * (s.h * s.s2 - s.s * s.s) THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_bursts, s.max_n "
    "FROM c JOIN s USING (event_type) "
    "GROUP BY c.event_type, s.h, s.max_n ORDER BY c.event_type"
)
QUERIES["type_hour_bursts"] = q_type_hour_bursts
def q_watermark_windows(sf_dir: str):
    """Event-time tumbling windows with watermark semantics
    (`stages/temporal.watermark_windows`, lateness 2h): planted
    disorder — every 13th event arrives with a 3h-stale event time
    (LATE), every 11th with 1h (reordered but inside the watermark,
    stays on-time). The batch replay of streaming window/late-data
    handling; bit-exact vs the running-max window twin."""
    from ..stages.temporal import watermark_windows

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"])

    h_us = 3_600_000_000

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id")
        ts = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64())
        ts = pc.if_else(
            pc.equal(_int_mod(ids, 13), 7),
            pc.subtract(ts, pa.scalar(3 * h_us, pa.int64())),
            pc.if_else(
                pc.equal(_int_mod(ids, 11), 4),
                pc.subtract(ts, pa.scalar(h_us, pa.int64())), ts))
        return pa.table({
            "event_id": ids,
            "ts": pc.cast(ts, pa.timestamp("us")),
            "event_type": batch.column("event_type"),
        })

    planted = ds.map_batches(_plant, batch_format="pyarrow")
    return watermark_windows(
        planted, lateness_us=2 * h_us).sort(["hour", "event_type"])
ORACLE_SQL["watermark_windows"] = """
WITH p AS (
  SELECT event_id,
    CASE WHEN event_id % 13 = 7 THEN ts - INTERVAL 3 HOUR
         WHEN event_id % 11 = 4 THEN ts - INTERVAL 1 HOUR
         ELSE ts END AS ts,
    event_type
  FROM events
), w AS (
  SELECT event_id, ts, event_type,
    max(ts) OVER (ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM p
), f AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
    CASE WHEN wm IS NOT NULL AND ts + INTERVAL 2 HOUR < wm
         THEN 1 ELSE 0 END AS late
  FROM w
)
SELECT CAST(hour AS TIMESTAMP) AS hour, event_type,
  CAST(sum(1 - late) AS BIGINT) AS n_ontime,
  CAST(sum(late) AS BIGINT) AS n_late
FROM f GROUP BY hour, event_type ORDER BY hour, event_type
"""
QUERIES["watermark_windows"] = q_watermark_windows
def q_rolling_p95(sf_dir: str):
    """Rolling p95 of event values over the trailing 6 hours per
    event type (`stages/temporal.rolling_percentile`, bin width 25 —
    bin-exact, all-integer): the ops-monitoring window statistic,
    windows anchored on hours with activity."""
    from ..stages.temporal import rolling_percentile

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"])
    return rolling_percentile(ds).sort(["event_type", "hour"])
ORACLE_SQL["rolling_p95"] = """
WITH b AS (
  SELECT event_type AS k, date_trunc('hour', ts) AS h,
    CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n
  FROM events GROUP BY 1, 2, 3
), anchors AS (
  SELECT DISTINCT k, h FROM b
), w AS (
  SELECT a.k, a.h, b.bin, sum(b.n) AS n
  FROM anchors a JOIN b ON b.k = a.k
    AND b.h BETWEEN a.h - INTERVAL 5 HOUR AND a.h
  GROUP BY a.k, a.h, b.bin
), c AS (
  SELECT k, h, bin, n,
    sum(n) OVER (PARTITION BY k, h ORDER BY bin) AS cum,
    sum(n) OVER (PARTITION BY k, h) AS tot
  FROM w
)
SELECT k AS event_type, CAST(h AS TIMESTAMP) AS hour,
  CAST(any_value(tot) AS BIGINT) AS n_window,
  CAST(min(bin) FILTER (WHERE cum * 100 >= tot * 95) AS BIGINT)
    AS p_bin
FROM c GROUP BY k, h ORDER BY event_type, hour
"""
QUERIES["rolling_p95"] = q_rolling_p95
def q_multi_touch_attribution(sf_dir: str):
    """Linear multi-touch attribution
    (`stages/temporal.linear_attribution`, 24h lookback): every
    purchase splits its cents equally across the user's preceding
    clicks — the budget-allocation complement of the last-touch
    `click_attribution`. All-integer credits, bit-exact twin."""
    from ..stages.temporal import linear_attribution

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])
    return linear_attribution(ds).sort("user_id")
ORACLE_SQL["multi_touch_attribution"] = """
WITH c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id, user_id, ts,
    CAST(round(coalesce(value, 0) * 100.0) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT p.event_id, p.user_id, p.vc, count(c.ts) AS n
  FROM p LEFT JOIN c ON c.user_id = p.user_id
    AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts < p.ts
  GROUP BY p.event_id, p.user_id, p.vc
)
SELECT user_id,
  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_conv_attr,
  CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_conv_orphan,
  CAST(sum(CASE WHEN n > 0 THEN (vc // n) * n ELSE 0 END)
    AS BIGINT) AS attributed_c
FROM t GROUP BY user_id ORDER BY user_id
"""
QUERIES["multi_touch_attribution"] = q_multi_touch_attribution
def q_events_geomean(sf_dir: str):
    """Geometric mean of event values per type — the
    multiplicative-scale aggregate (latencies, ratios): map-side
    (type, Σln, n) partials, one tiny groupby, finish =
    ``exp(s/n)`` on the repo-wide 1e-6 grid (the `events_hourly`
    float contract: order-dependent ulps live far below the grid).
    Non-positive values are excluded (SQL ln domain)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch.column("value"), 0.0))
        t = pa.table({
            "event_type": b.column("event_type"),
            "lv": pc.ln(pc.cast(b.column("value"), pa.float64())),
        })
        agg = t.group_by(["event_type"]).aggregate(
            [("lv", "sum"), ([], "count_all")])
        return pa.table({
            "event_type": agg.column("event_type"),
            "s": agg.column("lv_sum"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby(
        "event_type").aggregate(Sum("s"), Sum("n"))

    def _finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(s)").to_pylist()
        n = batch.column("sum(n)").to_pylist()
        gm = [math.floor(math.exp(a / b) * 1e6 + 0.5) / 1e6
              for a, b in zip(s, n)]
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(n)"), pa.int64()),
            "geo_mean": pa.array(gm, pa.float64()),
        })

    return agg.map_batches(
        _finish, batch_format="pyarrow").sort("event_type")
ORACLE_SQL["events_geomean"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
  floor(exp(sum(ln(value)) / count(*)) * 1000000.0 + 0.5)
    / 1000000.0 AS geo_mean
FROM events WHERE value > 0
GROUP BY event_type ORDER BY event_type
"""
QUERIES["events_geomean"] = q_events_geomean
