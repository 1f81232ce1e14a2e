"""Link-graph operators: distributed integer PageRank.

A webtext pipeline's documents form a link graph (page → outlink);
rank-style centrality is the classic signal over it (Page et al.
1999). The fixpoint is approximated by a FIXED number of power
iterations so the result is deterministic and SQL-expressible, and
all arithmetic is **int64** (scaled ranks, integer division) so
summation order cannot perturb the result — the DuckDB oracle is
bit-exact, unlike any float formulation.

Semantics per iteration (damping d = d_num/d_den, start rank ``r0``):

    contrib(u→v)  = R(u) // outdeg(u)          (edge multiset degree)
    R'(v)         = (r0 * (d_den - d_num)) // d_den
                    + (d_num * Σ contrib(·→v)) // d_den

Dangling nodes (no outlinks) simply don't propagate — the standard
simplified formulation. Nodes with no inlinks get the base term.

Scale shape — **one exchange per iteration, plus one final**, nothing
ever broadcast (a web-scale rank vector does not fit one worker):

* ``bucket_ids`` is the same hash for a node id whether it appears as
  a contribution target, a rank row, or an edge ``src`` — so "sum the
  incoming partials per node", "compute the new rank", "join ranks
  onto edges by src" and "emit next contributions" all happen INSIDE
  one whole-bucket UDF on one co-shuffle (iteration fusion: the
  classic join + aggregate pair collapses into a single exchange).
* The tagged edge rows and the node-universe zero rows are
  loop-invariant: materialized ONCE (edge-/node-scale, object store
  spills) and re-union'd per iteration, never recomputed from source.
* Between exchanges only ``(dst, partial)`` contribution rows move,
  pre-combined map-side (``np.add.at``) so the exchange carries at
  most one row per distinct dst per batch — not one per edge.

The remaining per-iteration cost is the edge rows flowing through
each exchange — inherent to rank propagation over a Dataset. The
module therefore ships TWO physical plans with identical int64
semantics: :func:`pagerank_int` (uniform Dataset shuffle operators,
Ray's fault model for free) and :func:`pagerank_pregel` (edges
pinned ONCE in shard actors, per-iteration point-to-point node-scale
partial routing — no sort barrier; the shape a real iterative rank
job wants, at the cost of actor lifecycle management).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pagerank_int(nodes, edges, iters: int = 3, node_col: str = "node",
                 src_col: str = "src", dst_col: str = "dst",
                 r0: int = 10 ** 9, d_num: int = 85, d_den: int = 100,
                 n_buckets: int = 32):
    """Integer power-iteration PageRank over an edge Dataset.

    ``nodes``: Dataset with int64 ``node_col`` (the node universe);
    ``edges``: Dataset with int64 ``src_col`` / ``dst_col`` (a
    multiset — parallel edges count twice; every src/dst must be in
    ``nodes``). Returns ``(node, rank)`` int64 rows after ``iters``
    iterations.
    """
    from ..functions.hashing import bucket_ids

    base = (r0 * (d_den - d_num)) // d_den

    # union row: edges (side 0, _key=src), node-universe zeros /
    # contribution partials (side 1, _key=node, val=partial)
    union_schema = pa.schema([
        ("_bucket", pa.int64()), ("_side", pa.int32()),
        ("_key", pa.int64()), (dst_col, pa.int64()),
        ("val", pa.int64()),
    ])

    def _tag_edges(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = pc.cast(batch.column(src_col), pa.int64())
        return pa.table({
            "_bucket": pa.array(bucket_ids(key, n_buckets), pa.int64()),
            "_side": pa.array(np.zeros(n, np.int32)),
            "_key": key,
            dst_col: pc.cast(batch.column(dst_col), pa.int64()),
            "val": pa.nulls(n, pa.int64()),
        }, schema=union_schema)

    def _tag_zeros(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        key = pc.cast(batch.column(node_col), pa.int64())
        return pa.table({
            "_bucket": pa.array(bucket_ids(key, n_buckets), pa.int64()),
            "_side": pa.array(np.ones(n, np.int32)),
            "_key": key,
            dst_col: pa.nulls(n, pa.int64()),
            "val": pa.array(np.zeros(n, np.int64)),
        }, schema=union_schema)

    def _partial_tagged(batch: pa.Table) -> pa.Table:
        """Map-side combine of contribution rows → tagged side-1
        partials for the next exchange."""
        ids = batch.column(node_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        vals = batch.column("contrib").combine_chunks().to_numpy(
            zero_copy_only=False)
        uniq, inv = np.unique(ids, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, vals)
        key = pa.array(uniq, pa.int64())
        return pa.table({
            "_bucket": pa.array(bucket_ids(key, n_buckets), pa.int64()),
            "_side": pa.array(np.ones(len(uniq), np.int32)),
            "_key": key,
            dst_col: pa.nulls(len(uniq), pa.int64()),
            "val": pa.array(sums, pa.int64()),
        }, schema=union_schema)

    def _node_ranks(group: pa.Table, first: bool):
        """Within one bucket: per-node rank from the side-1 partials
        (all partials of a node land in its bucket)."""
        sides = group.column("_side").combine_chunks().to_numpy()
        part_t = group.filter(pa.array(sides == 1))
        keys = part_t.column("_key").combine_chunks()
        codes_arr = pc.dictionary_encode(keys)
        codes = codes_arr.indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        node_ids = codes_arr.dictionary.to_numpy(zero_copy_only=False)
        sums = np.zeros(len(node_ids), np.int64)
        np.add.at(sums, codes, part_t.column("val").combine_chunks()
                  .to_numpy(zero_copy_only=False))
        if first:
            ranks = np.full(len(node_ids), r0, np.int64)
        else:
            ranks = base + (d_num * sums) // d_den
        return node_ids, ranks, sides, group

    def _make_step(first: bool):
        def _step(group: pa.Table) -> pa.Table:
            empty = pa.table({node_col: pa.array([], pa.int64()),
                              "contrib": pa.array([], pa.int64())})
            if group.num_rows == 0:
                return empty
            node_ids, ranks, sides, g = _node_ranks(group, first)
            edges_t = g.filter(pa.array(sides == 0))
            if edges_t.num_rows == 0:
                return empty
            srcs = edges_t.column("_key").combine_chunks()
            pos = pc.index_in(
                srcs, value_set=pa.array(node_ids, pa.int64())
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            ecodes = pc.dictionary_encode(srcs).indices.to_numpy(
                zero_copy_only=False).astype(np.int64)
            deg = np.bincount(ecodes)
            contrib = ranks[pos] // deg[ecodes]
            return pa.table({
                node_col: edges_t.column(dst_col),
                "contrib": pa.array(contrib, pa.int64()),
            })
        return _step

    def _make_final(first: bool):
        def _final(group: pa.Table) -> pa.Table:
            if group.num_rows == 0:
                return pa.table({node_col: pa.array([], pa.int64()),
                                 "rank": pa.array([], pa.int64())})
            node_ids, ranks, _, _ = _node_ranks(group, first)
            return pa.table({
                node_col: pa.array(node_ids, pa.int64()),
                "rank": pa.array(ranks, pa.int64()),
            })
        return _final

    # loop-invariant sides cached ONCE; re-union'd per iteration
    tagged_edges = edges.map_batches(
        _tag_edges, batch_format="pyarrow").materialize()
    tagged_zeros = nodes.select_columns([node_col]).map_batches(
        _tag_zeros, batch_format="pyarrow").materialize()

    partials = tagged_zeros
    for i in range(iters):
        partials = tagged_edges.union(partials).groupby(
            "_bucket", num_partitions=n_buckets
        ).map_groups(
            _make_step(first=(i == 0)), batch_format="pyarrow"
        ).map_batches(_partial_tagged, batch_format="pyarrow")
        if i + 1 < iters:
            partials = partials.union(tagged_zeros)
    if iters == 0:
        return tagged_zeros.groupby(
            "_bucket", num_partitions=n_buckets
        ).map_groups(_make_final(first=True), batch_format="pyarrow")
    return partials.union(tagged_zeros).groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_make_final(first=False), batch_format="pyarrow")

def _route_by_bucket(tbl, key_col, k):
    from ..functions.hashing import bucket_ids

    b = bucket_ids(tbl.column(key_col), k)
    return tuple(
        tbl.filter(pa.array(b == i)) for i in range(k)
    )


# ray.remote(num_returns=k) task wrapper created inside pagerank_pregel


class _PagerankShard:
    """One shard: owns ranks for its node bucket + edges by src."""

    def __init__(self, shard_id, n_shards, r0, d_num, d_den):
        self.shard_id = shard_id
        self.n_shards = n_shards
        self.r0 = r0
        self.d_num = d_num
        self.d_den = d_den
        self.base = (r0 * (d_den - d_num)) // d_den
        self._edge_parts = []
        self._node_parts = []
        self.nodes = None      # np.int64 sorted unique node ids
        self.ranks = None      # np.int64 aligned to self.nodes
        self._src = None       # np int64 edge srcs (positions into nodes)
        self._dst = None       # np int64 edge dsts (raw ids)
        self._deg = None       # per-edge degree of its src
        self._incoming = []    # partial tables for the current round

    def ingest_edges(self, tbl: pa.Table):
        if tbl.num_rows:
            self._edge_parts.append(tbl)

    def ingest_nodes(self, tbl: pa.Table):
        if tbl.num_rows:
            self._node_parts.append(tbl)

    def build(self):
        nodes = (
            pa.concat_tables(self._node_parts).column("node")
            .combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.int64)
            if self._node_parts else np.empty(0, np.int64)
        )
        self.nodes = np.unique(nodes)
        self.ranks = np.full(len(self.nodes), self.r0, np.int64)
        if self._edge_parts:
            e = pa.concat_tables(self._edge_parts)
            src = e.column("src").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            self._dst = e.column("dst").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            self._src = np.searchsorted(self.nodes, src)
            # degree per src (multiset)
            deg_per_node = np.bincount(
                self._src, minlength=len(self.nodes))
            self._deg = deg_per_node[self._src]
        else:
            self._src = np.empty(0, np.int64)
            self._dst = np.empty(0, np.int64)
            self._deg = np.empty(0, np.int64)
        self._edge_parts = self._node_parts = None
        return len(self.nodes)

    def contribute(self):
        """Emit per-target-shard (node, partial) tables; num_returns
        = n_shards on the caller side."""
        from ..functions.hashing import bucket_ids

        contrib = self.ranks[self._src] // self._deg
        # combine per dst locally
        uniq, inv = np.unique(self._dst, return_inverse=True)
        sums = np.zeros(len(uniq), np.int64)
        np.add.at(sums, inv, contrib)
        tbl = pa.table({"node": pa.array(uniq, pa.int64()),
                        "partial": pa.array(sums, pa.int64())})
        parts = _route_by_bucket(tbl, "node", self.n_shards)
        return parts if self.n_shards > 1 else parts[0]

    def receive(self, part: pa.Table):
        self._incoming.append(part)

    def apply(self):
        sums = np.zeros(len(self.nodes), np.int64)
        for p in self._incoming:
            ids = p.column("node").combine_chunks().to_numpy(
                zero_copy_only=False).astype(np.int64)
            vals = p.column("partial").combine_chunks().to_numpy(
                zero_copy_only=False)
            pos = np.searchsorted(self.nodes, ids)
            np.add.at(sums, pos, vals)
        self._incoming = []
        self.ranks = self.base + (self.d_num * sums) // self.d_den

    def result(self) -> pa.Table:
        return pa.table({"node": pa.array(self.nodes, pa.int64()),
                         "rank": pa.array(self.ranks, pa.int64())})


def pagerank_pregel(nodes, edges, iters: int = 3,
                    node_col: str = "node", src_col: str = "src",
                    dst_col: str = "dst", r0: int = 10 ** 9,
                    d_num: int = 85, d_den: int = 100,
                    n_shards: int = 8):
    """Actor-pinned (Pregel-style) integer PageRank — identical math
    to :func:`pagerank_int`, different physical plan: edges are
    partitioned ONCE into shard actors and never move again; per
    iteration only node-scale contribution partials flow point-to-
    point between shards (no sort barrier, no re-shuffle of edges).
    The Dataset formulation (:func:`pagerank_int`) remains the
    uniform-operator default; this is the iterate-fast path and the
    shape a real rank job at scale wants.
    """
    import ray

    shard_cls = ray.remote(_PagerankShard)
    shards = [shard_cls.remote(i, n_shards, r0, d_num, d_den)
              for i in range(n_shards)]

    @ray.remote(num_returns=n_shards)
    def route_edges(tbl: pa.Table):
        t = pa.table({
            "src": pc.cast(tbl.column(src_col), pa.int64()),
            "dst": pc.cast(tbl.column(dst_col), pa.int64()),
        })
        parts = _route_by_bucket(t, "src", n_shards)
        return parts if n_shards > 1 else parts[0]

    @ray.remote(num_returns=n_shards)
    def route_nodes(tbl: pa.Table):
        t = pa.table({
            "node": pc.cast(tbl.column(node_col), pa.int64())})
        parts = _route_by_bucket(t, "node", n_shards)
        return parts if n_shards > 1 else parts[0]

    pending = []
    for bundle in edges.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            parts = route_edges.remote(block_ref)
            parts = parts if isinstance(parts, list) else [parts]
            for i, ref in enumerate(parts):
                pending.append(shards[i].ingest_edges.remote(ref))
    for bundle in nodes.iter_internal_ref_bundles():
        for block_ref in bundle.block_refs:
            parts = route_nodes.remote(block_ref)
            parts = parts if isinstance(parts, list) else [parts]
            for i, ref in enumerate(parts):
                pending.append(shards[i].ingest_nodes.remote(ref))
    ray.get(pending)
    ray.get([s.build.remote() for s in shards])

    for _ in range(iters):
        recv = []
        for s in shards:
            parts = s.contribute.options(
                num_returns=n_shards).remote()
            parts = parts if isinstance(parts, list) else [parts]
            for i, ref in enumerate(parts):
                recv.append(shards[i].receive.remote(ref))
        ray.get(recv)
        ray.get([s.apply.remote() for s in shards])

    import ray.data

    return ray.data.from_arrow_refs(
        [s.result.remote() for s in shards])


def triangle_count(edges, src_col: str = "src", dst_col: str = "dst",
                   n_buckets: int = 64):
    """EXACT triangle count of the undirected simple graph underlying
    ``edges`` — the compact-forward / node-iterator algorithm
    (Latapy 2008) as four bounded exchanges:

    1. canonicalize: drop self-loops, fold direction (u<v), dedup
       parallel edges (one pair-hash shuffle, whole-bucket
       ``np.unique`` over lexsorted pairs).
    2. degrees: per-node edge counts (map-side partials + one tiny
       node groupby).
    3. ORIENT each edge from its (degree, id)-smaller endpoint to
       the larger — the skew fix that makes step 4 safe: after
       orientation every out-neighborhood is O(sqrt(m)), so a
       10^9-degree hub never produces a quadratic wedge explosion
       (this is why the orientation joins are worth their two
       co-shuffles; degrees ride a ``repartition_join``, never a
       node-scale broadcast).
    4. wedges ∩ edges: per oriented source, all out-neighbor pairs
       (whole-bucket triu over sorted segments) co-shuffle with the
       oriented edge set by pair hash; a wedge that meets its
       closing edge is a triangle, counted once by construction.

    Returns a one-row table ``(n_triangles,)``. Node ids are int64;
    NULL endpoints are dropped with the self-loops.
    """
    from ..functions.hashing import bucket_ids
    from .join import repartition_join

    def _pair_key(u: np.ndarray, v: np.ndarray) -> pa.Array:
        return pc.binary_join_element_wise(
            pa.array(u.astype("U"), pa.string()),
            pa.array(v.astype("U"), pa.string()), ":")

    def _canon(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).combine_chunks()
        d = batch.column(dst_col).combine_chunks()
        ok = pc.and_(pc.is_valid(s), pc.is_valid(d))
        s = s.filter(ok).to_numpy(zero_copy_only=False).astype(np.int64)
        d = d.filter(ok).to_numpy(zero_copy_only=False).astype(np.int64)
        m = s != d
        s, d = s[m], d[m]
        u, v = np.minimum(s, d), np.maximum(s, d)
        k = _pair_key(u, v)
        return pa.table({
            "_bucket": pa.array(bucket_ids(k, n_buckets), pa.int64()),
            "u": pa.array(u, pa.int64()),
            "v": pa.array(v, pa.int64()),
        })

    def _dedup(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        first = np.ones(len(u), dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (v[1:] != v[:-1])
        return pa.table({"u": pa.array(u[first], pa.int64()),
                         "v": pa.array(v[first], pa.int64())})

    simple = edges.map_batches(_canon, batch_format="pyarrow").groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_dedup, batch_format="pyarrow")

    def _deg_partial(batch: pa.Table) -> pa.Table:
        both = np.concatenate([
            batch.column("u").to_numpy(zero_copy_only=False),
            batch.column("v").to_numpy(zero_copy_only=False)])
        nodes, cnts = np.unique(both, return_counts=True)
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "dn": pa.array(cnts, pa.int64())})

    from ray.data.aggregate import Sum

    degrees = (
        simple.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node").aggregate(Sum("dn"))
        .map_batches(
            lambda b: pa.table({
                "node": b.column("node"),
                "deg": pc.cast(b.column("sum(dn)"), pa.int64()),
            }),
            batch_format="pyarrow")
    )

    with_u = repartition_join(
        simple.map_batches(
            lambda b: pa.table({"node": b.column("u"),
                                "v": b.column("v")}),
            batch_format="pyarrow"),
        degrees, on="node", right_cols=["deg"],
        n_buckets=n_buckets,
    ).map_batches(
        lambda b: pa.table({"u": b.column("node"),
                            "node": b.column("v"),
                            "du": b.column("deg")}),
        batch_format="pyarrow")
    with_both = repartition_join(
        with_u, degrees, on="node", right_cols=["deg"],
        n_buckets=n_buckets,
    )

    def _orient(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("node").to_numpy(zero_copy_only=False)
        du = batch.column("du").to_numpy(zero_copy_only=False)
        dv = batch.column("deg").to_numpy(zero_copy_only=False)
        # from (deg, id)-smaller to larger: a total order, so every
        # edge gets exactly one direction
        fwd = (du < dv) | ((du == dv) & (u < v))
        a = np.where(fwd, u, v)
        b = np.where(fwd, v, u)
        return pa.table({
            "_bucket": pa.array(
                bucket_ids(pa.array(a, pa.int64()), n_buckets),
                pa.int64()),
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
        })

    oriented = with_both.map_batches(_orient, batch_format="pyarrow")

    def _wedges(group: pa.Table) -> pa.Table:
        a = group.column("a").to_numpy(zero_copy_only=False)
        b = group.column("b").to_numpy(zero_copy_only=False)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        seg = np.ones(len(a), dtype=bool)
        seg[1:] = a[1:] != a[:-1]
        starts = np.flatnonzero(seg)
        ends = np.concatenate([starts[1:], [len(a)]])
        xs, ys = [], []
        for s0, e0 in zip(starts, ends):
            k = e0 - s0
            if k < 2:
                continue
            iu = np.triu_indices(k, 1)
            xs.append(b[s0 + iu[0]])
            ys.append(b[s0 + iu[1]])
        if xs:
            x = np.concatenate(xs)
            y = np.concatenate(ys)
            # wedge pair in canonical (u<v) order: the closing edge
            # was canonicalized the same way before orientation
            lo, hi = np.minimum(x, y), np.maximum(x, y)
        else:
            lo = hi = np.empty(0, dtype=np.int64)
        k = _pair_key(lo, hi)
        return pa.table({
            "_pb": pa.array(bucket_ids(k, n_buckets), pa.int64()),
            "pk": k,
            "is_edge": pa.array(
                np.zeros(len(lo), dtype=np.int64), pa.int64()),
        })

    wedges = oriented.groupby(
        "_bucket", num_partitions=n_buckets
    ).map_groups(_wedges, batch_format="pyarrow")

    def _edge_keys(batch: pa.Table) -> pa.Table:
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        k = _pair_key(u, v)
        return pa.table({
            "_pb": pa.array(bucket_ids(k, n_buckets), pa.int64()),
            "pk": k,
            "is_edge": pa.array(
                np.ones(len(u), dtype=np.int64), pa.int64()),
        })

    edge_keys = simple.map_batches(_edge_keys, batch_format="pyarrow")

    def _close(group: pa.Table) -> pa.Table:
        is_edge = group.column("is_edge").to_numpy(
            zero_copy_only=False).astype(bool)
        pk = group.column("pk").combine_chunks()
        eset = pk.filter(pa.array(is_edge))
        wset = pk.filter(pa.array(~is_edge))
        if not len(wset) or not len(eset):
            n = 0
        else:
            n = int(pc.sum(pc.cast(pc.is_in(
                wset, value_set=pc.unique(eset)), pa.int64())).as_py())
        return pa.table({"n": pa.array([n], pa.int64())})

    counts = wedges.union(edge_keys).groupby(
        "_pb", num_partitions=n_buckets
    ).map_groups(_close, batch_format="pyarrow")

    total = 0
    for b in counts.iter_batches(batch_format="pyarrow",
                                 batch_size=None):
        if b.num_rows:
            total += int(pc.sum(b.column("n")).as_py() or 0)
    return pa.table({"n_triangles": pa.array([total], pa.int64())})
