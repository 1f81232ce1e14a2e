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
