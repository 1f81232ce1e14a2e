"""Relational/TPC-H-style join and aggregation queries (split from queries.py; keys unchanged)."""
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

def q_skew_join_enrich(sf_dir: str):
    """Skew-aware hybrid join: documents enriched with per-lang totals.

    ``lang`` is the skewed key (~40% of the corpus is 'en'): a plain
    repartition join lands nearly half the rows in one bucket. The
    skew join detects hot keys with an exact map-side histogram,
    routes the hot mass through a zero-shuffle broadcast join, and
    co-shuffles only the balanced cold remainder
    (``stages/join.skew_join``; equals the plain join by contract,
    equivalence-tested in pytest across layouts and join types).
    """
    from ray.data.aggregate import Sum

    from ..stages.join import skew_join

    docs = _docs(sf_dir, columns=["doc_id", "lang"])

    def _partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("lang").combine_chunks())
        return pa.table({
            "lang": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    totals = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("lang").aggregate(Sum("n"))
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch.column("lang"),
            "lang_total": pc.cast(batch.column("sum(n)"), pa.int64()),
        })

    totals = totals.map_batches(
        _rename, batch_format="pyarrow").materialize()
    # the right side IS the left-key histogram — reuse it as the hot
    # set instead of paying skew_join's detection scan+exchange
    hot = [r["lang"] for r in totals.take_all()
           if r["lang_total"] >= 100]
    return skew_join(docs, totals, on="lang",
                     right_cols=["lang_total"], hot_count=100,
                     hot=hot)
ORACLE_SQL["skew_join_enrich"] = (
    "SELECT d.doc_id, d.lang, t.lang_total FROM documents d JOIN "
    "(SELECT lang, CAST(count(*) AS BIGINT) AS lang_total "
    "FROM documents GROUP BY lang) t USING (lang)"
)
QUERIES["skew_join_enrich"] = q_skew_join_enrich
def q_join_size_estimate(sf_dir: str):
    """Join-cardinality statistics BEFORE paying for the join (the
    optimizer primitive): exact |orders JOIN customer| from one
    (key, count, side) partial exchange (stages/stats.py
    ``join_size_exact``), plus the Count-Min inner-product upper
    bound (``cms_inner_product``) from two 4x1024 sketches built by
    the existing ``cms_sketch`` over the stringified keys — both
    deterministic integers, both oracle-pinned."""
    from ..stages.stats import (cms_inner_product, cms_sketch,
                               join_size_exact)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def _as_text(col: str):
        def _fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "text": pc.cast(batch.column(col), pa.string()),
            })
        return _fn

    def _collect(ds) -> pa.Table:
        parts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None)
                 if b.num_rows]
        return pa.concat_tables(parts)

    # the three legs are independent Ray jobs — drive them
    # concurrently (Ray Data executes multiple datasets in parallel;
    # the per-job fixed costs overlap instead of stacking)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(3) as pool:
        f_exact = pool.submit(
            join_size_exact, orders, cust, "o_custkey", "c_custkey",
            n_buckets=32)
        f_a = pool.submit(lambda: _collect(cms_sketch(
            orders.map_batches(_as_text("o_custkey"),
                               batch_format="pyarrow"))))
        f_b = pool.submit(lambda: _collect(cms_sketch(
            cust.map_batches(_as_text("c_custkey"),
                             batch_format="pyarrow"))))
        exact, sk_a, sk_b = f_exact.result(), f_a.result(), f_b.result()
    est = cms_inner_product(sk_a, sk_b)
    return pa.table({
        "n_join_rows": exact.column("n_join_rows"),
        "cms_estimate": pa.array([est], pa.int64()),
    })
ORACLE_SQL["join_size_estimate"] = (
    "WITH ca AS (WITH tok AS (SELECT CAST(o_custkey AS VARCHAR) "
    "AS t FROM orders WHERE o_custkey IS NOT NULL), "
    "rows AS (SELECT r, CAST(CAST(('0x' || substr(md5(t), "
    "1 + 8 * r, 8)) AS UBIGINT) % 1024 AS BIGINT) AS b "
    "FROM tok CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(r)) "
    "SELECT r, b, CAST(count(*) AS BIGINT) AS c FROM rows "
    "GROUP BY r, b), "
    "cb AS (WITH tok AS (SELECT CAST(c_custkey AS VARCHAR) AS t "
    "FROM customer WHERE c_custkey IS NOT NULL), "
    "rows AS (SELECT r, CAST(CAST(('0x' || substr(md5(t), "
    "1 + 8 * r, 8)) AS UBIGINT) % 1024 AS BIGINT) AS b "
    "FROM tok CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(r)) "
    "SELECT r, b, CAST(count(*) AS BIGINT) AS c FROM rows "
    "GROUP BY r, b), "
    "prods AS (SELECT ca.r, sum(ca.c * cb.c) AS p FROM ca "
    "JOIN cb ON ca.r = cb.r AND ca.b = cb.b GROUP BY ca.r) "
    "SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders "
    "JOIN customer ON o_custkey = c_custkey) AS n_join_rows, "
    "(SELECT CAST(min(p) AS BIGINT) FROM prods) AS cms_estimate"
)
QUERIES["join_size_estimate"] = q_join_size_estimate
def q_asof_last_purchase(sf_dir: str):
    """Point-in-time as-of join (stages/join.py ``asof_join``):
    each click event is attached to the SAME user's most recent
    purchase at-or-before the click — the SQL ``ASOF LEFT JOIN``
    shape (last price before the trade, dimension state at event
    time). One key-hash co-shuffle; the whole-bucket UDF resolves
    every probe with one ``np.maximum.accumulate`` over the
    (key, ts)-sorted union — no per-key loop."""
    from ..stages.join import asof_join

    clicks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"])
    purchases = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_type"],
    ).filter(expr="event_type == 'purchase'").select_columns(
        ["user_id", "ts", "value"])
    return asof_join(clicks, purchases, on="user_id", ts_col="ts",
                     right_cols=["ts", "value"], n_buckets=32)
ORACLE_SQL["asof_last_purchase"] = (
    "SELECT a.event_id, a.user_id, a.ts, b.ts AS ts_r, b.value "
    "FROM (SELECT * FROM events WHERE event_type = 'click') a "
    "ASOF LEFT JOIN "
    "(SELECT * FROM events WHERE event_type = 'purchase') b "
    "ON a.user_id = b.user_id AND b.ts <= a.ts"
)
QUERIES["asof_last_purchase"] = q_asof_last_purchase
def q_fuzzy_name_pairs(sf_dir: str):
    """EXACT edit-distance<=1 pair discovery (stages/fuzzy.py
    ``edit1_pairs``, FastSS deletion-neighborhood blocking): customer
    names within one typo of each other. Recall 1.0 by construction
    (verified per pair with the O(n) distance check), candidate
    generation is an equality join on deletion variants — never an
    all-pairs scan. Hot-block caps are counted; this query asserts
    none fired (the no-silent-caps rule)."""
    from ..stages.fuzzy import edit1_pairs

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"])

    def _ren(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("c_custkey"), pa.int64()),
            "s": batch.column("c_name"),
        })

    stats = {}
    out = edit1_pairs(
        cust.map_batches(_ren, batch_format="pyarrow"), "s",
        n_buckets=32, max_block=512, stats=stats)
    if stats["blocks_capped"]:
        raise AssertionError(
            f"fuzzy blocking capped {stats['blocks_capped']} blocks "
            "— raise max_block (recall contract violated)")
    return out
# Pre-filtered EXACT pair universe (the same tractability move as
# PAIR_UNIVERSE_FRAGMENT): dist(x,y) <= 1 implies x and y share a
# member of {s} ∪ {1-deletions of s} (substitution: delete the edited
# position from both; insertion/deletion: the short string IS a
# 1-deletion of the long one) — so the hash-joinable variant universe
# loses nothing vs the O(N^2) levenshtein cross join (>1 h single-core
# at sf1's 150k names), and every candidate is still verified with an
# INDEPENDENT levenshtein call, so engine-side blocking bugs cannot
# hide.
ORACLE_SQL["fuzzy_name_pairs"] = (
"WITH d AS (SELECT c_custkey, c_name, "
        "unnest(generate_series(1, len(c_name))) AS i FROM customer), "
        "v AS ("
        "SELECT c_custkey, c_name AS var FROM customer "
        "UNION ALL "
        "SELECT c_custkey, "
        "substr(c_name, 1, CAST(i AS INT) - 1) || "
        "substr(c_name, CAST(i AS INT) + 1) AS var FROM d), "
        "cand AS (SELECT DISTINCT a.c_custkey AS ka, b.c_custkey AS kb "
        "FROM v a JOIN v b ON a.var = b.var "
        "AND a.c_custkey < b.c_custkey) "
        "SELECT CAST(x.c_custkey AS BIGINT) AS id_a, "
        "CAST(y.c_custkey AS BIGINT) AS id_b, "
        "x.c_name AS s_a, y.c_name AS s_b "
        "FROM cand JOIN customer x ON x.c_custkey = cand.ka "
        "JOIN customer y ON y.c_custkey = cand.kb "
        "WHERE levenshtein(x.c_name, y.c_name) <= 1"
)
QUERIES["fuzzy_name_pairs"] = q_fuzzy_name_pairs
def q_bucketed_join_orders(sf_dir: str):
    """Bucketed-storage join (`stages/bucketed.py`): customer and
    orders are each written ONCE as Hive ``_bucket=`` parquet
    bucketed by custkey, then joined with ZERO exchange — one task
    per bucket pair, the layout-is-the-shuffle pattern that turns
    every repeat join on the canonical key into a parallel scan.
    Scratch bucket dirs live under /tmp per run."""
    import shutil

    from ..stages.bucketed import bucketed_join, write_bucketed

    base = (f"/tmp/ocr_ray_bucketed_{os.getpid()}_"
            f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(base, ignore_errors=True)
    n_buckets = 32

    def _ren_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "custkey": batch.column("o_custkey"),
        })

    def _ren_cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": batch.column("c_custkey"),
            "mktsegment": batch.column("c_mktsegment"),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(_ren_orders, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_ren_cust, batch_format="pyarrow")
    write_bucketed(orders, f"{base}/orders", "custkey", n_buckets)
    write_bucketed(cust, f"{base}/customer", "custkey", n_buckets)
    return bucketed_join(f"{base}/orders", f"{base}/customer",
                         on="custkey", n_buckets=n_buckets)
ORACLE_SQL["bucketed_join_orders"] = (
"SELECT o.o_orderkey, o.o_custkey AS custkey, "
        "c.c_mktsegment AS mktsegment FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey"
)
QUERIES["bucketed_join_orders"] = q_bucketed_join_orders
def q_bucketed_order_counts(sf_dir: str):
    """Shuffle-free per-key aggregate over BUCKETED storage
    (`stages/bucketed.py bucketed_aggregate`): because bucket
    alignment puts every row of a key in one bucket dir, a
    per-bucket local group_by IS the global per-customer order count
    — the groupby exchange disappears the same way the join's did."""
    import shutil

    from ..stages.bucketed import bucketed_aggregate, write_bucketed

    base = (f"/tmp/ocr_ray_bucketed_agg_{os.getpid()}_"
            f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(base, ignore_errors=True)
    n_buckets = 32

    def _ren(batch: pa.Table) -> pa.Table:
        return pa.table({"custkey": batch.column("o_custkey")})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(_ren, batch_format="pyarrow")
    write_bucketed(orders, base, "custkey", n_buckets)
    return bucketed_aggregate(base, "custkey", n_buckets,
                              count_name="n_orders")
ORACLE_SQL["bucketed_order_counts"] = (
"SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) "
        "AS n_orders FROM orders GROUP BY 1"
)
QUERIES["bucketed_order_counts"] = q_bucketed_order_counts
def q_customers_no_orders(sf_dir: str):
    """ANTI join (NOT EXISTS): customers with no URGENT order.

    The right side is predicate-pruned at the read (priority filter,
    two columns), then both sides co-shuffle once by key hash —
    bucketed repartition anti join, no memory assumption on either
    side (the 100-TB shape for large-large existence filters).
    """
    from ..stages.join import repartition_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    ).map_batches(
        lambda b: pa.table({"c_custkey": b.column("o_custkey")}),
        batch_format="pyarrow",
    )
    out = repartition_join(cust, orders, on="c_custkey", how="anti")

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
            "c_nationkey": pc.cast(batch.column("c_nationkey"),
                                   pa.int64()),
        })

    return out.map_batches(_fin, batch_format="pyarrow").sort("c_custkey")
ORACLE_SQL["customers_no_orders"] = (
"SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey "
        "FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT') "
        "ORDER BY c_custkey"
)
QUERIES["customers_no_orders"] = q_customers_no_orders
def q_parts_ordered(sf_dir: str):
    """SEMI join (EXISTS): parts that appear in ≥1 lineitem.

    The right side is reduced to its DISTINCT key set FIRST (one
    groupby over keys only), then broadcast — membership filters
    never need the fact table's payload, so the broadcast side is
    bounded by key cardinality, not fact rows.
    """
    from ..stages.join import broadcast_join

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    # per-block unique FIRST (shrinks the shuffle input to
    # blocks × per-block distinct), then a tiny global distinct so the
    # driver-side broadcast collection is bounded by |distinct keys|,
    # never blocks × distinct
    li_keys = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
        )
        .map_batches(
            lambda b: pa.table({
                "p_partkey": pc.unique(b.column("l_partkey"))
            }),
            batch_format="pyarrow",
        )
        .groupby("p_partkey").aggregate(Count())
        .select_columns(["p_partkey"])
    )
    return broadcast_join(
        part, li_keys, on="p_partkey", how="semi"
    ).sort("p_partkey")
ORACLE_SQL["parts_ordered"] = (
"SELECT p_partkey, p_brand FROM part p WHERE EXISTS "
        "(SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey) "
        "ORDER BY p_partkey"
)
QUERIES["parts_ordered"] = q_parts_ordered
def q_customer_running_spend(sf_dir: str):
    """Grouped cumulative window: per-customer running order total,
    ordered by (orderdate, orderkey) — the
    ``SUM() OVER (PARTITION BY … ORDER BY …)`` operator as one hash
    shuffle + per-bucket segment cumsum (stages/temporal.py
    ``grouped_running_sum``)."""
    from ..stages.temporal import grouped_running_sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"],
    )
    run = grouped_running_sum(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"],
        "o_totalprice", out_col="running",
    )
    return run.select_columns(
        ["o_orderkey", "o_custkey", "running"]
    ).sort("o_orderkey")
ORACLE_SQL["customer_running_spend"] = (
"SELECT o_orderkey, o_custkey, "
        "floor(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) * 1000000.0 + 0.5) "
        "/ 1000000.0 AS running FROM orders ORDER BY o_orderkey"
)
QUERIES["customer_running_spend"] = q_customer_running_spend
def q_customer_orders_full(sf_dir: str):
    """ANSI FULL OUTER join with true SQL multiplicity
    (stages/join.py ``expand_join``): BUILDING-segment customers vs
    URGENT orders on custkey. A customer with k urgent orders emits
    k rows (duplicate-key expansion — the lookup joins can't express
    this); customers with none keep a null order side; urgent orders
    from other segments' customers keep a null customer side. Both
    sides predicate-and-column pruned at the read; one co-shuffle.
    """
    from ..stages.join import expand_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    ).map_batches(
        lambda b: pa.table({
            "c_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "o_totalprice": b.column("o_totalprice"),
        }),
        batch_format="pyarrow",
    )
    out = expand_join(cust, orders, on="c_custkey", how="full")

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
            "c_name": batch.column("c_name"),
            "o_orderkey": pc.cast(batch.column("o_orderkey"),
                                  pa.int64()),
            "o_totalprice": batch.column("o_totalprice"),
        })

    return out.map_batches(_fin, batch_format="pyarrow")
ORACLE_SQL["customer_orders_full"] = (
    "SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, "
    "c.c_name, o.o_orderkey, o.o_totalprice "
    "FROM (SELECT c_custkey, c_name FROM customer "
    "WHERE c_mktsegment = 'BUILDING') c "
    "FULL JOIN (SELECT o_custkey, o_orderkey, o_totalprice "
    "FROM orders WHERE o_orderpriority = '1-URGENT') o "
    "ON c.c_custkey = o.o_custkey"
)
QUERIES["customer_orders_full"] = q_customer_orders_full
def q_revenue_by_nation(sf_dir: str):
    """Star-schema rollup across BOTH join strategies, oracle-checked.

    lineitem ⨝ orders runs as a ``repartition_join`` (both sides
    large at scale: one co-shuffle by crc32(orderkey) bucket,
    whole-bucket dict probe); orders ⨝ (customer ⨝ nation) runs as
    ONE ``broadcast_join`` — the two dimension tables are snowflaked
    into a single (custkey → nation) map on the driver first (both
    are dimension-scale), so the fact table is passed over once, not
    twice. Revenue = sum(extendedprice·(1−discount))
    per nation with map-side partial combine; round3 grid so
    summation-order float noise (~1e-8 relative) sits far below the
    comparison granularity.
    """
    from ..stages.join import broadcast_join, repartition_join

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.rename_columns(["o_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nation = nation.rename_columns(["c_nationkey", "n_name"])
    cust_nation = cust.join(
        nation, keys=["c_nationkey"], join_type="inner"
    ).select(["o_custkey", "n_name"])

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust_nation, on="o_custkey")

    def _orders_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("o_orderkey"),
            "n_name": batch.column("n_name"),
        })

    orders_dim = orders.map_batches(_orders_key, batch_format="pyarrow")
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = repartition_join(lineitem, orders_dim, on="l_orderkey")

    def _partial(batch: pa.Table) -> pa.Table:
        # map-side partial combine: the shuffle carries ~25 rows per
        # block, not one per lineitem row
        from ..stages.stats import partial_sum_count

        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return partial_sum_count(
            pa.table({"n_name": batch.column("n_name"), "rev": rev}),
            ["n_name"], "rev", sum_name="rev", count_name="one",
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev"), Sum("one"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        revs = [
            math.floor(v * 1000.0 + 0.5) / 1000.0
            for v in batch.column("sum(rev)").to_pylist()
        ]
        return pa.table({
            "n_name": batch.column("n_name"),
            "n_items": pc.cast(batch.column("sum(one)"), pa.int64()),
            "revenue": pa.array(revs, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")
ORACLE_SQL["revenue_by_nation"] = (
"SELECT n_name, CAST(count(*) AS BIGINT) AS n_items, "
        "floor(sum(l_extendedprice * (1 - l_discount)) * 1000.0 + 0.5) "
        "/ 1000.0 AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
)
QUERIES["revenue_by_nation"] = q_revenue_by_nation
def q_top_parts_by_revenue(sf_dir: str):
    """Broadcast dimension join + partial agg + global top-k:
    lineitem ⨝ part (2k-row dimension, object-store broadcast),
    revenue per part, top 10 by (revenue desc, p_name asc)."""
    import pyarrow.parquet as pq

    from ..stages.join import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    part = part.rename_columns(["l_partkey", "p_name"])
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(lineitem, part, on="l_partkey")

    def _partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table({"p_name": batch.column("p_name"), "rev": rev})

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("p_name")
        .aggregate(Sum("rev"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        revs = [
            math.floor(v * 1000.0 + 0.5) / 1000.0
            for v in batch.column("sum(rev)").to_pylist()
        ]
        return pa.table({
            "p_name": batch.column("p_name"),
            "revenue": pa.array(revs, pa.float64()),
        })

    return (
        agg.map_batches(_finish, batch_format="pyarrow")
        .sort(key=["revenue", "p_name"], descending=[True, False])
        .limit(10)
    )
ORACLE_SQL["top_parts_by_revenue"] = (
"SELECT p_name, "
        "floor(sum(l_extendedprice * (1 - l_discount)) * 1000.0 + 0.5) "
        "/ 1000.0 AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "GROUP BY p_name ORDER BY revenue DESC, p_name ASC LIMIT 10"
)
QUERIES["top_parts_by_revenue"] = q_top_parts_by_revenue
def q_dq_audit(sf_dir: str):
    """Data-quality expectation suite (stages/profile.dq_audit): six
    exact assertions — null/empty text, n_chars consistency, doc_id
    uniqueness (one int64-key co-shuffle), orders→customer
    referential integrity (broadcast anti-probe), events value
    domain. One row per check, driver folds scalar partials."""
    import pyarrow.parquet as pq

    from ..stages.profile import dq_audit

    docs = _docs(sf_dir, columns=["doc_id", "text", "n_chars"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["value"])
    # the customer dimension is the broadcast small side by design;
    # a driver-side pruned read of the key column IS the broadcast
    # prep (same contract as stages/join.broadcast_join)
    customer_keys = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).column("c_custkey")
    return dq_audit(docs, orders, customer_keys, events)
ORACLE_SQL["dq_audit"] = (
    "SELECT * FROM ("
    "SELECT 'documents.dup_doc_id' AS check_name, "
    "CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS violations "
    "FROM documents "
    "UNION ALL SELECT 'documents.empty_text', CAST(count(*) FILTER ("
    "text IS NOT NULL AND length(text) = 0) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'documents.n_chars_mismatch', "
    "CAST(count(*) FILTER (coalesce(length(text), 0) != "
    "coalesce(n_chars, -1)) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'documents.null_text', "
    "CAST(count(*) FILTER (text IS NULL) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'events.negative_value', "
    "CAST(count(*) FILTER (value < 0) AS BIGINT) FROM events "
    "UNION ALL SELECT 'orders.orphan_custkey', "
    "CAST(count(*) FILTER (o_custkey IS NOT NULL AND o_custkey NOT IN "
    "(SELECT c_custkey FROM customer)) AS BIGINT) FROM orders"
    ") ORDER BY check_name"
)
QUERIES["dq_audit"] = q_dq_audit
def q_golden_record(sf_dir: str):
    """MDM golden-record survivorship (stages/temporal.golden_record):
    per user, each field keeps the value of its LATEST non-null row
    by (ts, event_id) — fields survive independently (deterministic
    CDC sparsity: event_type nulled when event_id % 7 == 0, value
    when event_id % 5 == 0, so the survivors come from DIFFERENT
    rows). One user co-shuffle, boundary-mask + reduceat bucket UDF."""
    from ..stages.temporal import golden_record

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"])

    def _sparsify(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id")
        et_null = pc.equal(_int_mod(eid, 7), 0)
        v_null = pc.equal(_int_mod(eid, 5), 0)
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": eid,
            "event_type": pc.if_else(
                et_null, pa.scalar(None, pa.string()),
                batch.column("event_type")),
            "value": pc.if_else(
                v_null, pa.scalar(None, pa.float64()),
                batch.column("value")),
        })

    return golden_record(
        ds.map_batches(_sparsify, batch_format="pyarrow"),
        "user_id", ["ts", "event_id"], ["event_type", "value"],
    ).sort("user_id")
ORACLE_SQL["golden_record"] = (
    "WITH aug AS (SELECT user_id, ts, event_id, "
    "CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END "
    "AS event_type, "
    "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value "
    "FROM events), "
    "base AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows, "
    "min(ts) AS first_ts, max(ts) AS last_ts FROM aug "
    "GROUP BY user_id), "
    "lt AS (SELECT user_id, event_type AS last_event_type FROM aug "
    "WHERE event_type IS NOT NULL QUALIFY row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1), "
    "lv AS (SELECT user_id, value AS last_value FROM aug "
    "WHERE value IS NOT NULL QUALIFY row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1) "
    "SELECT base.user_id, n_rows, first_ts, last_ts, "
    "lt.last_event_type, lv.last_value "
    "FROM base LEFT JOIN lt USING (user_id) "
    "LEFT JOIN lv USING (user_id) ORDER BY user_id"
)
QUERIES["golden_record"] = q_golden_record
def q_adaptive_join_orders(sf_dir: str):
    """Adaptive physical join planning (stages/join.adaptive_join):
    orders enriched with customer — the engine MEASURES the right
    side (a parquet-footer metadata fold) and picks broadcast vs
    co-shuffle itself, instead of a hand-chosen operator. customer
    sits far under the broadcast limit at every test SF, so the
    plan resolves to "broadcast" (left side never shuffles); the
    emitted ``strategy`` column pins the decision rule in the
    oracle (CASE over count(*)), and the choice cannot change
    values — both operators share one join contract."""
    from ..stages.join import adaptive_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"])

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("c_custkey"),
            "c_name": batch.column("c_name"),
            "c_mktsegment": batch.column("c_mktsegment"),
        })

    joined, strategy = adaptive_join(
        orders, cust.map_batches(_key, batch_format="pyarrow"),
        on="o_custkey", right_cols=["c_name", "c_mktsegment"],
        broadcast_limit_rows=2_000_000)

    def _tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "strategy", pa.array([strategy] * batch.num_rows,
                                 pa.string()))

    return joined.map_batches(_tag, batch_format="pyarrow").sort(
        "o_orderkey")
ORACLE_SQL["adaptive_join_orders"] = (
    "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, "
    "c.c_name, c.c_mktsegment, "
    "CASE WHEN (SELECT count(*) FROM customer) <= 2000000 "
    "THEN 'broadcast' ELSE 'shuffle' END AS strategy "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "ORDER BY o.o_orderkey"
)
QUERIES["adaptive_join_orders"] = q_adaptive_join_orders
def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 pricing summary over ``lineitem``.

    Scale shape: the date filter prunes at the scan, then each block
    reduces to ≤ |flag×status| rows of ALL-INTEGER sufficient
    statistics (values are exact at 2 decimals, so ×100 int64 cents
    make every sum order-free and bit-exact vs SQL); ONE tiny groupby
    moves keys × blocks rows; the finish math is single float
    divisions shared operation-for-operation with the oracle.

    int64 bound: the charge sum carries cents × 10^4 scaling — at
    10^12 rows a per-group sum needs the decimal128 variant; at any
    bench scale here it is exact with ~10^2 headroom.
    """
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax",
                 "l_shipdate"],
    )
    cutoff = pa.scalar(PRICING_CUTOFF).cast(pa.timestamp("us"))

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"), cutoff))
        if batch.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty_c": pa.array([], pa.int64()),
                "sum_ext_c": pa.array([], pa.int64()),
                "sum_disc_c": pa.array([], pa.int64()),
                "sum_dp": pa.array([], pa.int64()),
                "sum_ch": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })

        def cents(col):
            return pc.cast(pc.round(pc.multiply(
                batch.column(col), 100.0)), pa.int64())

        qty, ext = cents("l_quantity"), cents("l_extendedprice")
        disc, tax = cents("l_discount"), cents("l_tax")
        # disc_price = ext * (1 - discount)  -> ext_c * (100-disc_c),
        # scale 10^-4 dollars; charge adds * (100+tax_c), 10^-6.
        dp = pc.multiply(ext, pc.subtract(pa.scalar(100, pa.int64()),
                                          disc))
        ch = pc.multiply(dp, pc.add(pa.scalar(100, pa.int64()), tax))
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": qty, "ext": ext, "disc": disc, "dp": dp, "ch": ch,
        })
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("ext", "sum"), ("disc", "sum"),
             ("dp", "sum"), ("ch", "sum"), ([], "count_all")])
        return pa.table({
            "l_returnflag": agg.column("l_returnflag"),
            "l_linestatus": agg.column("l_linestatus"),
            "sum_qty_c": agg.column("qty_sum"),
            "sum_ext_c": agg.column("ext_sum"),
            "sum_disc_c": agg.column("disc_sum"),
            "sum_dp": agg.column("dp_sum"),
            "sum_ch": agg.column("ch_sum"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty_c"), Sum("sum_ext_c"),
                   Sum("sum_disc_c"), Sum("sum_dp"), Sum("sum_ch"),
                   Sum("n"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        qty = batch.column("sum(sum_qty_c)").to_pylist()
        ext = batch.column("sum(sum_ext_c)").to_pylist()
        dsc = batch.column("sum(sum_disc_c)").to_pylist()
        dp = batch.column("sum(sum_dp)").to_pylist()
        ch = batch.column("sum(sum_ch)").to_pylist()
        n = batch.column("sum(n)").to_pylist()
        # every float below = float(exact int) / float literal — the
        # same two IEEE ops the SQL twin performs.
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": pa.array([float(v) / 100.0 for v in qty]),
            "sum_base_price": pa.array(
                [float(v) / 100.0 for v in ext]),
            "sum_disc_price": pa.array(
                [float(v) / 10000.0 for v in dp]),
            "sum_charge": pa.array(
                [float(v) / 1000000.0 for v in ch]),
            "avg_qty": pa.array(
                [float(q) / (100.0 * c) for q, c in zip(qty, n)]),
            "avg_price": pa.array(
                [float(e) / (100.0 * c) for e, c in zip(ext, n)]),
            "avg_disc": pa.array(
                [float(d) / (100.0 * c) for d, c in zip(dsc, n)]),
            "count_order": pc.cast(batch.column("sum(n)"),
                                   pa.int64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"])
ORACLE_SQL["pricing_summary"] = f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_c,
    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS ext_c,
    CAST(round(l_discount * 100.0) AS BIGINT) AS disc_c,
    CAST(round(l_tax * 100.0) AS BIGINT) AS tax_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
), s AS (
  SELECT l_returnflag, l_linestatus,
    sum(qty_c) AS sq, sum(ext_c) AS se, sum(disc_c) AS sd,
    sum(ext_c * (100 - disc_c)) AS sdp,
    sum(ext_c * (100 - disc_c) * (100 + tax_c)) AS sch,
    count(*) AS n
  FROM c GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
  CAST(sq AS DOUBLE) / 100.0 AS sum_qty,
  CAST(se AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(sdp AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(sch AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(sq AS DOUBLE) / (100.0 * n) AS avg_qty,
  CAST(se AS DOUBLE) / (100.0 * n) AS avg_price,
  CAST(sd AS DOUBLE) / (100.0 * n) AS avg_disc,
  CAST(n AS BIGINT) AS count_order
FROM s ORDER BY l_returnflag, l_linestatus
"""
QUERIES["pricing_summary"] = q_pricing_summary
def q_bloom_join_revenue(sf_dir: str):
    """Runtime-filter (Bloom-pushdown) join
    (`stages/join.bloom_join`): urgent orders (selective dim side)
    join the lineitem fact side; fact rows that cannot match are cut
    AT SCAN SPEED before the shuffle, the survivors take the exact
    repartition join, and revenue rolls up by order status —
    integer-cents exact."""
    from ..stages.join import bloom_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"])
    urgent = orders.filter(
        expr="o_orderpriority == '1-URGENT'").select_columns(
        ["o_orderkey", "o_orderstatus"])
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("l_orderkey"),
            "price_c": pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), 100.0)),
                pa.int64()),
        })

    joined = bloom_join(
        items.map_batches(_prep, batch_format="pyarrow"), urgent,
        on="o_orderkey", how="inner", n_bits=1 << 16)

    def _partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["o_orderstatus"]).aggregate(
            [("price_c", "sum"), ([], "count_all")])
        return pa.table({
            "o_orderstatus": agg.column("o_orderstatus"),
            "s": agg.column("price_c_sum"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = joined.map_batches(
        _partial, batch_format="pyarrow").groupby(
        "o_orderstatus").aggregate(Sum("s"), Sum("n"))

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": batch.column("o_orderstatus"),
            "n_items": pc.cast(batch.column("sum(n)"), pa.int64()),
            "revenue": pa.array(
                [float(v) / 100.0
                 for v in batch.column("sum(s)").to_pylist()],
                pa.float64()),
        })

    return agg.map_batches(
        _finish, batch_format="pyarrow").sort("o_orderstatus")
ORACLE_SQL["bloom_join_revenue"] = """
WITH urgent AS (
  SELECT o_orderkey, o_orderstatus FROM orders
  WHERE o_orderpriority = '1-URGENT'
), j AS (
  SELECT u.o_orderstatus,
    CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS price_c
  FROM lineitem l JOIN urgent u ON l.l_orderkey = u.o_orderkey
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(price_c) AS DOUBLE) / 100.0 AS revenue
FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus
"""
QUERIES["bloom_join_revenue"] = q_bloom_join_revenue
def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the classic 3-way join + grouped revenue +
    top-k: BUILDING-segment customers semi-gate orders (broadcast —
    the dimension default), date filters prune both fact scans,
    lineitem revenue joins order keys (broadcast of the filtered
    order side; at 100 TB swap in `bloom_join`/`repartition_join`),
    map-side partial combine per order, tiny groupby, exact-int64
    top-10. Revenue in cents×(100−disc) units ⇒ ordering and values
    bit-exact vs SQL."""
    from ..stages.join import broadcast_join

    cutoff = pa.scalar(Q3_CUTOFF).cast(pa.timestamp("us"))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'").select_columns(
        ["c_custkey"])

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def _ord_prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less(batch.column("o_orderdate"),
                                 cutoff))
        return pa.table({
            "c_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": b.column("o_orderdate"),
        })

    o_building = broadcast_join(
        orders.map_batches(_ord_prep, batch_format="pyarrow"),
        cust, on="c_custkey", how="semi").select_columns(
        ["o_orderkey", "o_orderdate"])

    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def _item_prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch.column("l_shipdate"),
                                    cutoff))
        ext = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            b.column("l_discount"), 100.0)), pa.int64())
        return pa.table({
            "o_orderkey": b.column("l_orderkey"),
            "rev": pc.multiply(ext, pc.subtract(
                pa.scalar(100, pa.int64()), disc)),
        })

    joined = broadcast_join(
        items.map_batches(_item_prep, batch_format="pyarrow"),
        o_building, on="o_orderkey", how="inner")

    def _partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(
            ["o_orderkey", "o_orderdate"]).aggregate(
            [("rev", "sum")])
        return pa.table({
            "o_orderkey": agg.column("o_orderkey"),
            "o_orderdate": agg.column("o_orderdate"),
            "rev": agg.column("rev_sum"),
        })

    agg = joined.map_batches(
        _partial, batch_format="pyarrow").groupby(
        ["o_orderkey", "o_orderdate"]).aggregate(Sum("rev"))

    top = agg.sort(
        ["sum(rev)", "o_orderdate", "o_orderkey"],
        descending=[True, False, False]).limit(10)

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch.column("o_orderkey"),
                                  pa.int64()),
            "o_orderdate": pc.cast(batch.column("o_orderdate"),
                                   pa.timestamp("us")),
            "revenue": pa.array(
                [float(v) / 10000.0
                 for v in batch.column("sum(rev)").to_pylist()],
                pa.float64()),
        })

    return top.map_batches(_finish, batch_format="pyarrow")
ORACLE_SQL["shipping_priority"] = f"""
WITH c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), o AS (
  SELECT o_orderkey, o_orderdate FROM orders
  JOIN c ON o_custkey = c_custkey
  WHERE o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
), l AS (
  SELECT l_orderkey,
    CAST(round(l_extendedprice * 100.0) AS BIGINT)
      * (100 - CAST(round(l_discount * 100.0) AS BIGINT)) AS rev
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
)
SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
  CAST(sum(l.rev) AS DOUBLE) / 10000.0 AS revenue
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY sum(l.rev) DESC, o.o_orderdate, o.o_orderkey LIMIT 10
"""
QUERIES["shipping_priority"] = q_shipping_priority
def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — the pure filter + scalar aggregate: one
    pruned scan, row-local integer-cents revenue terms
    (`ext_c · disc_c`, exact), one-row block partials, driver-side
    exact fold, a single shared float division at the end."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])
    lo = pa.scalar("1999-01-01 00:00:00").cast(pa.timestamp("us"))
    hi = pa.scalar("2000-01-01 00:00:00").cast(pa.timestamp("us"))

    def _partial(batch: pa.Table) -> pa.Table:
        def cents(col):
            return pc.cast(pc.round(pc.multiply(
                batch.column(col), 100.0)), pa.int64())

        disc = cents("l_discount")
        qty = cents("l_quantity")
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("l_shipdate"), lo),
                pc.less(batch.column("l_shipdate"), hi)),
            pc.and_(
                pc.and_(pc.greater_equal(disc, 5),
                        pc.less_equal(disc, 7)),
                pc.less(qty, 2400)))
        ext = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64())
        rev = pc.multiply(ext, disc).filter(keep)
        s = pc.sum(rev).as_py() or 0
        return pa.table({"s": pa.array([s], pa.int64()),
                         "n": pa.array([rev.length()], pa.int64())})

    total = 0
    n = 0
    for b in ds.map_batches(_partial,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        total += sum(b.column("s").to_pylist())
        n += sum(b.column("n").to_pylist())
    return pa.table({
        "revenue": pa.array([float(total) / 10000.0], pa.float64()),
        "n_items": pa.array([n], pa.int64()),
    })
ORACLE_SQL["forecast_revenue"] = """
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT)
         * CAST(round(l_discount * 100.0) AS BIGINT) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
    AND CAST(round(l_discount * 100.0) AS BIGINT) BETWEEN 5 AND 7
    AND CAST(round(l_quantity * 100.0) AS BIGINT) < 2400
)
SELECT CAST(coalesce(sum(rev), 0) AS DOUBLE) / 10000.0 AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM f
"""
QUERIES["forecast_revenue"] = q_forecast_revenue
