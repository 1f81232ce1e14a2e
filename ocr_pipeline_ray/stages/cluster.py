"""Duplicate clustering: distributed connected components over a
pair list, plus the canonical-survivor filter.

The dedup family (``stages/dedup.py``) produces PAIRS — exact-dup
groups, MinHash/LSH candidates, Jaccard-verified near-dups. A
training-data pipeline needs one more step the reference never had
(its only dedup is ``set(paths)``, ``/root/reference/ocr_pipeline.py:335``):
fold the pair list into CLUSTERS (transitive closure — a~b and b~c
put a,b,c in one group even when a,c were never paired) and keep one
canonical document per cluster.

Two methods, both Ray-Data-native, both operating ONLY on the pair
list and its node set (candidate-scale — ≪ corpus at 100 TB; the
corpus itself is never shuffled by either):

* ``method="fold"`` (default) — log-depth block folding: each edge
  block is compressed by a local union-find into its spanning star
  ``(component_min, member)`` edges (one ``map_batches``, no
  shuffle), then blocks are coalesced K-ways (``repartition`` —
  block movement, not a key shuffle) and re-compressed, until one
  block remains whose union-find is the global answer. Depth =
  ``log_K(blocks)``; per-task memory = the COMPRESSED mapping
  (O(clustered nodes), the same bound this repo already accepts for
  the verified-pair take_all). This is the fast path and mirrors the
  classic parallel union-find fold.
* ``method="propagate"`` — iterative min-label propagation in the
  style of the MapReduce CC literature (Rastogi et al., "Finding
  Connected Components in Map-Reduce in Logarithmic Rounds",
  ICDE'13): labels pushed across edges via two bucketed repartition
  joins + a ``groupby().min()`` per round, plus a pointer-doubling
  round (``label ← label[label]``) so chains collapse in
  O(log diameter) rounds. No per-task memory assumption at all —
  the scale fallback when even the compressed cluster mapping
  cannot fit one worker. Fixpoint is DETECTED, not assumed: a round
  ends by counting edges whose endpoint labels disagree; zero
  disagreements ⟺ every component carries one constant label.

Both return the same table (equivalence-tested across methods and
block layouts): ``(node, cluster)`` with cluster = min node id of
the connected component, one row per node that appears in ≥1 pair.
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa

from .join import repartition_join


def _rename(ds, mapping):
    """Column-rename via one zero-copy map_batches."""
    def _fn(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names]
        )
    return ds.map_batches(_fn, batch_format="pyarrow")


def _compress_block(batch: pa.Table) -> pa.Table:
    """Union-find one edge block down to its spanning stars.

    Output: ``(u=component-min-in-block, v=member)`` edges, one per
    non-root member — the smallest edge set with the same local
    equivalence. Pure per-block compute; roots are deterministic
    (min id) so the fold's FINAL output is layout-independent.
    """
    parent: Dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    us = batch.column("u").to_pylist()
    vs = batch.column("v").to_pylist()
    for a, b in zip(us, vs):
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by id: smaller id wins the root slot, so local
            # roots are already local minima
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    key_type = batch.schema.field("u").type
    out_u: List = []
    out_v: List = []
    with_members = set()
    for x in parent:
        r = find(x)
        if r != x:
            out_u.append(r)
            out_v.append(x)
            with_members.add(r)
    # a node seen only in self-pairs is an isolated root: keep it
    # alive as a self-edge so it still gets a (node, node) label
    for x in parent:
        if parent[x] == x and x not in with_members:
            out_u.append(x)
            out_v.append(x)
    return pa.table({
        "u": pa.array(out_u, key_type),
        "v": pa.array(out_v, key_type),
    })


def _fold(edges, fan_in: int):
    """Compress → coalesce K blocks → recompress, to one block."""
    cur = edges.map_batches(
        _compress_block, batch_format="pyarrow", batch_size=None
    ).materialize()
    while cur.num_blocks() > 1:
        cur = cur.repartition(
            max(1, cur.num_blocks() // fan_in)
        ).map_batches(
            _compress_block, batch_format="pyarrow", batch_size=None
        ).materialize()

    def _labels(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # member rows (v → u); self-edges already label isolated
        # roots, so emit (r, r) only for roots that HAVE members
        member_roots = pc.unique(
            batch.filter(pc.invert(pc.equal(batch.column("u"),
                                            batch.column("v"))))
            .column("u")
        )
        return pa.concat_tables([
            pa.table({"node": batch.column("v"),
                      "cluster": batch.column("u")}),
            pa.table({"node": member_roots, "cluster": member_roots}),
        ])

    return cur.map_batches(
        _labels, batch_format="pyarrow", batch_size=None
    )


def _propagate(edges, n_buckets: int, max_iter: int):
    """Join-based min-label propagation with pointer doubling."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    def _votes(batch: pa.Table) -> pa.Table:
        m = pc.min_element_wise(batch.column("u"), batch.column("v"))
        return pa.concat_tables([
            pa.table({"node": batch.column("u"), "label": m}),
            pa.table({"node": batch.column("v"), "label": m}),
        ])

    # init = one propagation round for free: every edge votes
    # min(u, v) for both endpoints; groupby-min folds the votes and
    # dedups the node set in the same shuffle.
    labels = _rename(
        edges.map_batches(_votes, batch_format="pyarrow")
        .groupby("node").aggregate(Min("label")),
        {"min(label)": "label"},
    ).materialize()

    # max_iter label updates, max_iter+1 fixpoint checks (the check
    # runs BEFORE each update, so the final update gets its own
    # check instead of a spurious non-convergence error)
    converged = False
    for it in range(max_iter + 1):
        # attach both endpoint labels to every edge (bucketed
        # co-shuffle joins — edge-scale, never corpus-scale)
        tagged = repartition_join(
            repartition_join(
                edges,
                _rename(labels, {"node": "u", "label": "lu"}),
                on="u", n_buckets=n_buckets,
            ),
            _rename(labels, {"node": "v", "label": "lv"}),
            on="v", n_buckets=n_buckets,
        ).materialize()
        if tagged.filter(expr="lu != lv").count() == 0:
            converged = True
            break
        if it == max_iter:
            break

        def _msgs(batch: pa.Table) -> pa.Table:
            m = pc.min_element_wise(batch.column("lu"),
                                    batch.column("lv"))
            return pa.concat_tables([
                pa.table({"node": batch.column("u"), "label": m}),
                pa.table({"node": batch.column("v"), "label": m}),
            ])

        labels = _rename(
            tagged.map_batches(_msgs, batch_format="pyarrow")
            .union(labels)
            .groupby("node").aggregate(Min("label")),
            {"min(label)": "label"},
        )
        # pointer doubling: label ← label[label]. Every label value
        # is itself a node (a min over node ids) and component
        # minima are fixpoints (label(m)=m), so the inner join is
        # total; chains of length d collapse in O(log d) rounds.
        labels = _rename(
            repartition_join(
                _rename(labels, {"label": "_mid"}),
                _rename(labels, {"node": "_mid", "label": "_root"}),
                on="_mid", n_buckets=n_buckets,
            ).select_columns(["node", "_root"]),
            {"_root": "label"},
        ).materialize()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    return _rename(labels, {"label": "cluster"})


def connected_components(pairs, a_col: str = "d1", b_col: str = "d2",
                         method: str = "fold", fan_in: int = 8,
                         n_buckets: int = 64, max_iter: int = 16):
    """Pair list → ``(node, cluster)`` with cluster = min node id of
    the connected component.

    ``pairs`` is any Dataset with two id columns. Only nodes that
    appear in at least one pair are emitted; singletons are by
    definition their own cluster and never left the corpus, so the
    caller filters the corpus with :func:`canonical_filter` instead
    of materializing a corpus-sized label table.
    """
    if method not in ("fold", "propagate"):
        raise ValueError(f"method must be fold|propagate, got {method!r}")
    edges = pairs.map_batches(
        lambda b: pa.table({"u": b.column(a_col), "v": b.column(b_col)}),
        batch_format="pyarrow",
    ).materialize()
    if edges.count() == 0:
        key_type = edges.schema().types[0] if edges.schema() else pa.int64()
        import ray.data

        return ray.data.from_arrow(pa.table({
            "node": pa.array([], key_type),
            "cluster": pa.array([], key_type),
        }))
    if method == "fold":
        return _fold(edges, fan_in)
    return _propagate(edges, n_buckets, max_iter)


def canonical_filter(ds, clusters, id_col: str = "doc_id",
                     broadcast_limit_rows: int = 2_000_000):
    """Drop non-canonical cluster members from a corpus dataset.

    ``clusters`` is :func:`connected_components` output; the ids to
    drop are the members with ``node != cluster``. The drop set is
    cluster-MEMBER-scale, which is small on a lightly-duplicated
    corpus but 30–50% of rows on a Common-Crawl-grade one — so the
    attach is ADAPTIVE (``stages/join.adaptive_join`` anti-join): at
    or under ``broadcast_limit_rows`` the drop set broadcasts once
    and each corpus batch filters vectorized with no corpus shuffle;
    above it both sides co-shuffle by key hash, so a 40%-dup corpus
    can never blow a worker heap with an unconditional broadcast.

    Returns ``(filtered, strategy)`` with strategy one of
    ``"none" | "broadcast" | "shuffle"`` (``"none"`` = empty drop
    set, corpus passed through untouched) so callers and tests can
    pin the plan that ran.
    """
    from .join import adaptive_join

    def _ren(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column("node")})

    drop_ds = clusters.filter(expr="node != cluster").select_columns(
        ["node"]).map_batches(_ren, batch_format="pyarrow").materialize()
    if drop_ds.count() == 0:
        return ds, "none"
    out, strategy = adaptive_join(
        ds, drop_ds, on=id_col, how="anti",
        broadcast_limit_rows=broadcast_limit_rows)
    return out, strategy
