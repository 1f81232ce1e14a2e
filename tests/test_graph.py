"""Distributed integer PageRank (stages/graph.py)."""

import os
import sys

import pyarrow as pa
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TestPagerankInt:
    def _graph(self):
        import ray.data

        nodes = ray.data.from_arrow(pa.table({
            "node": pa.array([0, 1, 2, 3], pa.int64())}))
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array([0, 0, 1, 2, 3], pa.int64()),
            "dst": pa.array([1, 2, 2, 0, 2], pa.int64()),
        }))
        return nodes, edges

    def test_three_iterations_hand_computed(self, ray_session):
        from ocr_pipeline_ray.stages.graph import pagerank_int

        nodes, edges = self._graph()
        got = {r["node"]: r["rank"] for r in pagerank_int(
            nodes, edges, iters=3, n_buckets=4).take_all()}
        # integer power iteration by hand (r0=1e9, d=85/100):
        # contrib = rank // outdeg; rank' = 150000000 + 85*sum // 100
        assert got == {0: 1162562500, 1: 1035593750,
                       2: 1651843750, 3: 150000000}

    def test_zero_iterations_is_initial(self, ray_session):
        from ocr_pipeline_ray.stages.graph import pagerank_int

        nodes, edges = self._graph()
        got = {r["node"]: r["rank"] for r in pagerank_int(
            nodes, edges, iters=0, n_buckets=4).take_all()}
        assert got == {v: 10 ** 9 for v in range(4)}

    def test_parallel_edges_count_twice(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.graph import pagerank_int

        nodes = ray.data.from_arrow(pa.table({
            "node": pa.array([0, 1], pa.int64())}))
        # 0 -> 1 twice: deg(0)=2, each edge carries rank//2
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array([0, 0], pa.int64()),
            "dst": pa.array([1, 1], pa.int64()),
        }))
        got = {r["node"]: r["rank"] for r in pagerank_int(
            nodes, edges, iters=1, n_buckets=2).take_all()}
        assert got == {0: 150000000,
                       1: 150000000 + (85 * (10 ** 9)) // 100}


class TestPagerankPregel:
    def test_equals_dataset_path_hand_graph(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.graph import (pagerank_int,
                                                   pagerank_pregel)

        nodes = ray.data.from_arrow(pa.table({
            "node": pa.array([0, 1, 2, 3], pa.int64())}))
        edges_tbl = pa.table({
            "src": pa.array([0, 0, 1, 2, 3], pa.int64()),
            "dst": pa.array([1, 2, 2, 0, 2], pa.int64()),
        })
        a = {r["node"]: r["rank"] for r in pagerank_int(
            nodes, ray.data.from_arrow(edges_tbl), iters=3,
            n_buckets=4).take_all()}
        nodes2 = ray.data.from_arrow(pa.table({
            "node": pa.array([0, 1, 2, 3], pa.int64())}))
        b = {r["node"]: r["rank"] for r in pagerank_pregel(
            nodes2, ray.data.from_arrow(edges_tbl), iters=3,
            n_shards=3).take_all()}
        assert a == b == {0: 1162562500, 1: 1035593750,
                          2: 1651843750, 3: 150000000}

    def test_equals_dataset_path_random_graph(self, ray_session):
        import numpy as np
        import ray.data

        from ocr_pipeline_ray.stages.graph import (pagerank_int,
                                                   pagerank_pregel)

        rng = np.random.RandomState(11)
        n = 60
        src = rng.randint(0, n, 300).astype(np.int64)
        dst = rng.randint(0, n, 300).astype(np.int64)
        nodes_tbl = pa.table({"node": pa.array(np.arange(n),
                                               pa.int64())})
        edges_tbl = pa.table({"src": pa.array(src, pa.int64()),
                              "dst": pa.array(dst, pa.int64())})
        a = {r["node"]: r["rank"] for r in pagerank_int(
            ray.data.from_arrow(nodes_tbl),
            ray.data.from_arrow(edges_tbl), iters=2,
            n_buckets=4).take_all()}
        b = {r["node"]: r["rank"] for r in pagerank_pregel(
            ray.data.from_arrow(nodes_tbl),
            ray.data.from_arrow(edges_tbl), iters=2,
            n_shards=5).take_all()}
        assert a == b
        assert len(a) == n


class TestTriangleCount:
    @staticmethod
    def _duck_triangles(edges_tbl):
        import duckdb

        con = duckdb.connect()
        con.register("e0", edges_tbl)
        n = con.execute(
            "WITH e AS (SELECT DISTINCT least(src, dst) AS u, "
            "greatest(src, dst) AS v FROM e0 WHERE src != dst) "
            "SELECT count(*) FROM e a JOIN e b ON a.v = b.u "
            "JOIN e c ON c.u = a.u AND c.v = b.v"
        ).fetchone()[0]
        con.close()
        return int(n)

    def test_known_graphs(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.graph import triangle_count

        # K4 = 4 triangles; plus a dangling edge, a self-loop and a
        # parallel/reversed duplicate that must not change the count
        src = [0, 0, 0, 1, 1, 2, 2, 3, 9, 1]
        dst = [1, 2, 3, 2, 3, 3, 2, 9, 9, 0]
        tbl = pa.table({"src": pa.array(src, pa.int64()),
                        "dst": pa.array(dst, pa.int64())})
        out = triangle_count(ray.data.from_arrow(tbl).repartition(3),
                             n_buckets=4)
        assert out.column("n_triangles").to_pylist() == [4]

    @pytest.mark.parametrize("seed", [1, 2])
    def test_random_vs_duckdb(self, ray_session, seed):
        import random

        import ray.data

        from ocr_pipeline_ray.stages.graph import triangle_count

        rng = random.Random(seed)
        n_nodes, n_edges = 40, 220
        src = [rng.randrange(n_nodes) for _ in range(n_edges)]
        dst = [rng.randrange(n_nodes) for _ in range(n_edges)]
        tbl = pa.table({"src": pa.array(src, pa.int64()),
                        "dst": pa.array(dst, pa.int64())})
        out = triangle_count(ray.data.from_arrow(tbl).repartition(4),
                             n_buckets=6)
        assert (out.column("n_triangles").to_pylist()[0]
                == self._duck_triangles(tbl))


class TestHitsInt:
    @staticmethod
    def _reference(n_nodes, src, dst, iters=2, scale=10 ** 9):
        """Sequential fixed-point HITS matching hits_int semantics."""
        h = [scale] * n_nodes
        a = [0] * n_nodes
        for _ in range(iters):
            a_raw = [0] * n_nodes
            for s, d in zip(src, dst):
                a_raw[d] += h[s]
            div = max(sum(a_raw) // scale, 1)
            a = [x // div for x in a_raw]
            h_raw = [0] * n_nodes
            for s, d in zip(src, dst):
                h_raw[s] += a[d]
            div = max(sum(h_raw) // scale, 1)
            h = [x // div for x in h_raw]
        return a, h

    @pytest.mark.parametrize("n_blocks,n_buckets", [(1, 4), (3, 2),
                                                    (5, 8)])
    def test_matches_reference_across_layouts(self, ray_session,
                                              n_blocks, n_buckets):
        import ray.data

        from ocr_pipeline_ray.stages.graph import hits_int

        n = 23
        src = [i for i in range(n)] + [i for i in range(0, n, 3)]
        dst = [(i * 5 + 2) % n for i in range(n)] + [
            (i * 11 + 7) % n for i in range(0, n, 3)]
        nodes = ray.data.from_arrow(pa.table({
            "node": pa.array(list(range(n)), pa.int64())}))
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })).repartition(n_blocks)
        got = {r["node"]: (r["auth"], r["hub"]) for r in hits_int(
            nodes, edges, iters=2, n_buckets=n_buckets).take_all()}
        a, h = self._reference(n, src, dst)
        assert got == {i: (a[i], h[i]) for i in range(n)}

    def test_sink_node_zero_hub(self, ray_session):
        """A node with no out-edges ends with hub 0; unreferenced
        node ends with auth 0 — both still appear in the output."""
        import ray.data

        from ocr_pipeline_ray.stages.graph import hits_int

        nodes = ray.data.from_arrow(pa.table({
            "node": pa.array([0, 1, 2], pa.int64())}))
        # 0 -> 1 only: node 1 is a pure sink, node 2 is isolated
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array([0], pa.int64()),
            "dst": pa.array([1], pa.int64()),
        }))
        got = {r["node"]: (r["auth"], r["hub"]) for r in hits_int(
            nodes, edges, iters=2, n_buckets=2).take_all()}
        a, h = self._reference(3, [0], [1])
        assert got == {i: (a[i], h[i]) for i in range(3)}
        assert got[1][1] == 0 and got[2] == (0, 0)

    def test_zero_iterations_is_fixed_point(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.graph import hits_int

        nodes = ray.data.from_arrow(pa.table({
            "node": pa.array([0, 1], pa.int64())}))
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array([0], pa.int64()),
            "dst": pa.array([1], pa.int64())}))
        got = {r["node"]: (r["auth"], r["hub"]) for r in hits_int(
            nodes, edges, iters=0).take_all()}
        assert got == {0: (0, 10 ** 9), 1: (0, 10 ** 9)}


class TestResolveChains:
    @pytest.mark.parametrize("n_blocks,n_buckets", [(1, 2), (4, 8)])
    def test_long_chain_resolves_log_depth(self, ray_session,
                                           n_blocks, n_buckets):
        import ray.data

        from ocr_pipeline_ray.stages.graph import resolve_chains

        # one chain 63 -> 62 -> ... -> 0 (terminal): length 63,
        # must resolve within max_rounds=7 doublings (2^7 > 63)
        src = list(range(1, 64))
        dst = [i - 1 for i in src]
        mapping = ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        })).repartition(n_blocks)
        rows = resolve_chains(mapping, n_buckets=n_buckets,
                              max_rounds=7).take_all()
        assert len(rows) == 63
        assert all(r["final"] == 0 and r["resolved"] for r in rows)

    def test_cycle_marked_unresolved(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.graph import resolve_chains

        # 1 -> 2 -> 3 -> 1 (a redirect loop), 10 -> 1 (chain INTO
        # the loop), 20 -> 21 (plain one-hop)
        mapping = ray.data.from_arrow(pa.table({
            "src": pa.array([1, 2, 3, 10, 20], pa.int64()),
            "dst": pa.array([2, 3, 1, 1, 21], pa.int64()),
        }))
        got = {r["src"]: (r["final"], r["resolved"])
               for r in resolve_chains(mapping,
                                       max_rounds=8).take_all()}
        assert got[20] == (21, True)
        for k in (1, 2, 3, 10):
            final, resolved = got[k]
            assert resolved is False and final in (1, 2, 3)


class TestBfsLevels:
    def test_hop_distances_and_unreachable(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.graph import bfs_levels

        # 0->1->2->3, 1->4, isolated 9<-8 component
        edges = pa.table({
            "src": pa.array([0, 1, 2, 1, 8], pa.int64()),
            "dst": pa.array([1, 2, 3, 4, 9], pa.int64()),
        })
        out = bfs_levels(
            ray.data.from_arrow(edges).repartition(3), seeds=[0],
            n_buckets=4,
        ).to_pandas().sort_values("node").reset_index(drop=True)
        assert list(map(tuple, out.itertuples(index=False))) == [
            (0, 0), (1, 1), (2, 2), (3, 3), (4, 2)]

    def test_multi_seed_and_cycle(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.graph import bfs_levels

        # cycle 0->1->2->0 plus 2->5; seeds {0, 5}
        edges = pa.table({
            "src": pa.array([0, 1, 2, 2], pa.int64()),
            "dst": pa.array([1, 2, 0, 5], pa.int64()),
        })
        out = bfs_levels(
            ray.data.from_arrow(edges), seeds=[0, 5],
        ).to_pandas().sort_values("node").reset_index(drop=True)
        assert list(map(tuple, out.itertuples(index=False))) == [
            (0, 0), (1, 1), (2, 2), (5, 0)]

    def test_max_iters_bound(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.graph import bfs_levels

        edges = pa.table({
            "src": pa.array([0, 1, 2], pa.int64()),
            "dst": pa.array([1, 2, 3], pa.int64()),
        })
        out = bfs_levels(
            ray.data.from_arrow(edges), seeds=[0], max_iters=2,
        ).to_pandas()
        assert out["dist"].max() == 2 and 3 not in set(out["node"])


class TestKcore:
    def test_triangle_plus_tail(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.graph import kcore_prune

        # triangle 1-2-3 (the 2-core) with tails 3-4-5
        edges = pa.table({
            "src": pa.array([1, 2, 3, 3, 4, 2], pa.int64()),
            "dst": pa.array([2, 3, 1, 4, 5, 1], pa.int64()),  # dup 1-2
        })
        out = kcore_prune(
            ray.data.from_arrow(edges).repartition(2), k=2, rounds=3,
            n_buckets=4,
        ).to_pandas().sort_values("node").reset_index(drop=True)
        assert list(map(tuple, out.itertuples(index=False))) == [
            (1, 2), (2, 2), (3, 2)]

    def test_everything_pruned(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.graph import kcore_prune

        edges = pa.table({
            "src": pa.array([1, 2], pa.int64()),
            "dst": pa.array([2, 3], pa.int64()),
        })
        out = kcore_prune(
            ray.data.from_arrow(edges), k=2, rounds=2,
        ).to_pandas()
        assert len(out) == 0


class TestLoopInvariantCheckpoint:
    """VERDICT r4 item 3: above the pin threshold the loop-invariant
    edge multiset goes through a storage-backed parquet checkpoint
    instead of an object-store materialize — bit-identical results
    either way."""

    def _graph(self):
        import ray.data

        nodes = ray.data.from_arrow(pa.table({
            "node": pa.array([0, 1, 2, 3], pa.int64())}))
        edges = ray.data.from_arrow(pa.table({
            "src": pa.array([0, 0, 1, 2, 3], pa.int64()),
            "dst": pa.array([1, 2, 2, 0, 2], pa.int64()),
        }))
        return nodes, edges

    def test_pagerank_same_through_checkpoint(self, ray_session,
                                              monkeypatch, tmp_path):
        from ocr_pipeline_ray.stages.graph import pagerank_int

        nodes, edges = self._graph()
        base = {r["node"]: r["rank"] for r in pagerank_int(
            nodes, edges, iters=3, n_buckets=4).take_all()}
        monkeypatch.setenv("OCR_RAY_GRAPH_PIN_ROWS", "0")
        monkeypatch.setenv("OCR_RAY_SCRATCH", str(tmp_path))
        ckpt = {r["node"]: r["rank"] for r in pagerank_int(
            nodes, edges, iters=3, n_buckets=4).take_all()}
        assert ckpt == base
        # the checkpoint path actually ran: dirs exist in scratch
        assert any(d.startswith("ocr_ray_ckpt_ginv_pr_edges")
                   for d in __import__("os").listdir(tmp_path))

    def test_kcore_and_bfs_same_through_checkpoint(
            self, ray_session, monkeypatch, tmp_path):
        import ray.data

        from ocr_pipeline_ray.stages.graph import bfs_levels, kcore_prune

        edges = ray.data.from_arrow(pa.table({
            "src": pa.array([0, 0, 1, 2, 3, 4], pa.int64()),
            "dst": pa.array([1, 2, 2, 0, 4, 0], pa.int64()),
        }))
        seeds = [0]

        def _run():
            kc = sorted(
                (r["node"], r["deg"])
                for r in kcore_prune(edges, k=2, rounds=2,
                                     n_buckets=4).take_all())
            bf = sorted(
                (r["node"], r["dist"])
                for r in bfs_levels(edges, seeds, max_iters=4,
                                    n_buckets=4).take_all())
            return kc, bf

        base = _run()
        monkeypatch.setenv("OCR_RAY_GRAPH_PIN_ROWS", "0")
        monkeypatch.setenv("OCR_RAY_SCRATCH", str(tmp_path))
        assert _run() == base
