"""Distributed integer k-means: exactness across layouts and options."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.kmeans import (
    _assign,
    _trunc_div,
    kmeans_int,
    quantize_batch,
)


def _synth_vectors(n: int, dim: int, seed: int = 7):
    """Deterministic float32 vectors with duplicate rows (ties)."""
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim)).astype(np.float32)
    mat[n // 2] = mat[0]  # exact duplicate -> distance ties
    mat[n - 1] = mat[1]
    return mat


def _local_kmeans(ids, mat, k, iters):
    """Driver-side reference with identical integer semantics."""
    q = quantize_batch(pa.array([list(v) for v in mat],
                                pa.list_(pa.float32())))
    order = np.argsort(ids)
    ids_s, q_s = np.asarray(ids)[order], q[order]
    cents = q_s[:k].copy()
    for _ in range(iters):
        a = _assign(q_s, cents)
        nxt = cents.copy()
        for j in range(k):
            m = q_s[a == j]
            if len(m):
                nxt[j] = _trunc_div(m.sum(axis=0), np.int64(len(m)))
        cents = nxt
    return dict(zip(ids_s.tolist(), _assign(q_s, cents).tolist())), cents


def _dataset(ray, ids, mat, blocks):
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in mat],
                              pa.list_(pa.float32())),
    })
    return ray.data.from_arrow(tbl).repartition(blocks)


class TestKmeansInt:
    def test_matches_local_reference_across_layouts(self, ray_session):
        mat = _synth_vectors(60, 8)
        ids = list(range(60))
        ref, ref_cents = _local_kmeans(ids, mat, k=4, iters=3)
        for blocks in (1, 3, 7):
            ds = _dataset(ray_session, ids, mat, blocks)
            assign, cents = kmeans_int(ds, k=4, iters=3)
            got = {r["vec_id"]: r["cluster"]
                   for r in assign.take_all()}
            assert got == ref, f"blocks={blocks}"
            assert (cents == ref_cents).all()

    def test_cache_false_equivalent(self, ray_session):
        mat = _synth_vectors(40, 6)
        ids = list(range(40))
        ds = _dataset(ray_session, ids, mat, 4)
        a1, c1 = kmeans_int(ds, k=3, iters=2, cache=True)
        a2, c2 = kmeans_int(ds, k=3, iters=2, cache=False)
        assert (c1 == c2).all()
        assert sorted((r["vec_id"], r["cluster"]) for r in a1.take_all()) \
            == sorted((r["vec_id"], r["cluster"]) for r in a2.take_all())

    def test_unordered_ids_init_from_smallest(self, ray_session):
        """Init must pick the k smallest ids regardless of row order."""
        mat = _synth_vectors(30, 4)
        ids = list(range(29, -1, -1))  # descending on purpose
        ref, _ = _local_kmeans(ids, mat, k=3, iters=2)
        ds = _dataset(ray_session, ids, mat, 3)
        assign, _ = kmeans_int(ds, k=3, iters=2)
        got = {r["vec_id"]: r["cluster"] for r in assign.take_all()}
        assert got == ref

    def test_empty_cluster_keeps_centroid(self, ray_session):
        """k = n with duplicate points forces an empty cluster (two
        identical points both assign to the lower index); the loser's
        centroid must survive unchanged and the run must not raise."""
        mat = np.zeros((4, 3), dtype=np.float32)
        mat[0] = mat[1] = [1.0, 0.0, 0.0]   # ids 0,1 identical
        mat[2] = [0.0, 5.0, 0.0]
        mat[3] = [0.0, 0.0, 9.0]
        ids = [0, 1, 2, 3]
        ds = _dataset(ray_session, ids, mat, 2)
        assign, cents = kmeans_int(ds, k=4, iters=2)
        got = {r["vec_id"]: r["cluster"] for r in assign.take_all()}
        ref, ref_cents = _local_kmeans(ids, mat, k=4, iters=2)
        assert got == ref
        assert (cents == ref_cents).all()
        # cluster 1 never receives members; its centroid is the init
        q = quantize_batch(pa.array([list(map(float, v)) for v in mat],
                                    pa.list_(pa.float32())))
        assert (cents[1] == q[1]).all()

    def test_needs_k_rows(self, ray_session):
        mat = _synth_vectors(2, 3)
        ds = _dataset(ray_session, [0, 1], mat, 1)
        with pytest.raises(ValueError):
            kmeans_int(ds, k=5, iters=1)


class TestTruncDiv:
    def test_matches_duckdb_semantics(self):
        import duckdb

        vals = np.array([7, -7, 9, -9, 1, -1, 0, 1000001], np.int64)
        cnt = np.array([2, 2, 4, 4, 3, 3, 5, 7], np.int64)
        got = _trunc_div(vals, cnt).tolist()
        want = [duckdb.sql(f"SELECT {a} // {b}").fetchone()[0]
                for a, b in zip(vals.tolist(), cnt.tolist())]
        assert got == want


class TestPqAdc:
    def test_adc_matches_brute_force_on_codes(self, ray_session):
        import numpy as np
        import ray
        from ocr_pipeline_ray.stages.kmeans import pq_adc_topk, pq_codes

        rng = np.random.RandomState(11)
        vecs = rng.uniform(-1, 1, size=(80, 8)).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(80), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        })
        ds = ray.data.from_arrow(tbl).repartition(5)
        codes_ds, books = pq_codes(ds, m=2, k=3, iters=2)
        q = vecs[0].tolist()
        out = pq_adc_topk(codes_ds, books, q, k=10,
                          exclude_id=0).to_pandas()

        # driver-side brute force over the same codes
        codes = codes_ds.to_pandas().sort_values("vec_id")
        qx = np.floor(np.asarray(q, np.float64) * 1e6).astype(np.int64)
        dt = [((b - qx[j * 4:(j + 1) * 4][None, :]) ** 2).sum(axis=1)
              for j, b in enumerate(books)]
        dist = (dt[0][codes["code_0"].values]
                + dt[1][codes["code_1"].values])
        ids = codes["vec_id"].values
        mask = ids != 0
        order = np.lexsort((ids[mask], dist[mask]))[:10]
        assert out["vec_id"].tolist() == ids[mask][order].tolist()
        assert out["adc_dist"].tolist() == dist[mask][order].tolist()
