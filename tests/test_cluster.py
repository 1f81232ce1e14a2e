"""Connected-components clustering + canonical-survivor filter."""

import random

import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.cluster import (
    _compress_block,
    canonical_filter,
    connected_components,
)

# chain 1-2-3-4-5, triangle 10-11-12 (redundant edge), pair 20-21
TOY = pa.table({
    "d1": [1, 2, 3, 4, 10, 11, 10, 20],
    "d2": [2, 3, 4, 5, 11, 12, 12, 21],
})
TOY_CLUSTERS = [
    (1, 1), (2, 1), (3, 1), (4, 1), (5, 1),
    (10, 10), (11, 10), (12, 10), (20, 20), (21, 20),
]


def _cc_rows(ds, **kw):
    return sorted(
        (r["node"], r["cluster"])
        for r in connected_components(ds, **kw).take_all()
    )


class TestCompressBlock:
    def test_star_output_is_minimal(self):
        out = _compress_block(pa.table({"u": [1, 2, 3], "v": [2, 3, 4]}))
        rows = sorted(zip(out.column("u").to_pylist(),
                          out.column("v").to_pylist()))
        assert rows == [(1, 2), (1, 3), (1, 4)]

    def test_self_and_duplicate_edges(self):
        out = _compress_block(
            pa.table({"u": [5, 5, 7], "v": [5, 6, 6]})
        )
        rows = sorted(zip(out.column("u").to_pylist(),
                          out.column("v").to_pylist()))
        assert rows == [(5, 6), (5, 7)]


class TestConnectedComponents:
    @pytest.mark.parametrize("nblk", [1, 4])
    def test_fold_layout_independent(self, ray_session, nblk):
        import ray.data

        ds = ray.data.from_arrow(TOY).repartition(nblk)
        assert _cc_rows(ds) == TOY_CLUSTERS

    def test_propagate_agrees_with_fold(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(TOY).repartition(3)
        assert _cc_rows(ds, method="propagate") == TOY_CLUSTERS

    def test_random_graph_vs_networkless_union_find(self, ray_session):
        """Fold result == a single-process union-find oracle on a
        random graph spread across many blocks (cross-block chains)."""
        import ray.data

        rng = random.Random(7)
        edges = [(rng.randrange(200), rng.randrange(200))
                 for _ in range(150)]
        parent = list(range(200))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        touched = set()
        for a, b in edges:
            touched.update((a, b))
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expect = sorted((x, find(x)) for x in touched)

        ds = ray.data.from_arrow(pa.table({
            "d1": pa.array([a for a, _ in edges], pa.int64()),
            "d2": pa.array([b for _, b in edges], pa.int64()),
        })).repartition(8)
        assert _cc_rows(ds) == expect

    def test_empty_pairs(self, ray_session):
        import ray.data

        ds = ray.data.from_arrow(
            pa.table({"d1": pa.array([], pa.int64()),
                      "d2": pa.array([], pa.int64())})
        )
        assert connected_components(ds).count() == 0

    def test_bad_method(self, ray_session):
        import ray.data

        with pytest.raises(ValueError):
            connected_components(
                ray.data.from_arrow(TOY), method="driver"
            )


class TestCanonicalFilter:
    def test_keeps_min_per_cluster_and_singletons(self, ray_session):
        import ray.data

        clusters = connected_components(ray.data.from_arrow(TOY))
        corpus = ray.data.from_arrow(
            pa.table({"doc_id": list(range(25))})
        )
        filtered, strategy = canonical_filter(corpus, clusters)
        kept = sorted(r["doc_id"] for r in filtered.take_all())
        dropped = {2, 3, 4, 5, 11, 12, 21}
        assert kept == [i for i in range(25) if i not in dropped]
        assert strategy == "broadcast"  # tiny drop set

    def test_large_drop_set_co_shuffles(self, ray_session):
        """Above the broadcast threshold the attach switches to the
        key-hash co-shuffle (VERDICT r4 item 2: a 40%-dup corpus must
        not be broadcast unconditionally) — same rows either way."""
        import ray.data

        clusters = connected_components(ray.data.from_arrow(TOY))
        corpus = ray.data.from_arrow(
            pa.table({"doc_id": list(range(25))})
        )
        filtered, strategy = canonical_filter(
            corpus, clusters, broadcast_limit_rows=2)
        kept = sorted(r["doc_id"] for r in filtered.take_all())
        dropped = {2, 3, 4, 5, 11, 12, 21}
        assert kept == [i for i in range(25) if i not in dropped]
        assert strategy == "shuffle"

    def test_no_clusters_is_identity(self, ray_session):
        import ray.data

        empty = ray.data.from_arrow(
            pa.table({"d1": pa.array([], pa.int64()),
                      "d2": pa.array([], pa.int64())})
        )
        clusters = connected_components(empty)
        corpus = ray.data.from_arrow(pa.table({"doc_id": [1, 2, 3]}))
        kept, strategy = canonical_filter(corpus, clusters)
        assert strategy == "none"
        assert sorted(r["doc_id"] for r in kept.take_all()) == [1, 2, 3]


class TestStringKeys:
    def test_fold_with_url_keys(self, ray_session):
        """Keys can be strings (urls/fingerprints) — bucket hashing
        and the union-find treat them opaquely; cluster id = min
        lexicographic member."""
        import ray.data

        pairs = pa.table({
            "d1": ["url/a", "url/b", "url/x"],
            "d2": ["url/b", "url/c", "url/y"],
        })
        rows = _cc_rows(ray.data.from_arrow(pairs).repartition(2))
        assert rows == [
            ("url/a", "url/a"), ("url/b", "url/a"), ("url/c", "url/a"),
            ("url/x", "url/x"), ("url/y", "url/x"),
        ]


class TestPropagateRandomized:
    def test_propagate_agrees_with_fold_random_graph(self, ray_session):
        """The no-memory-assumption fallback reaches the same
        fixpoint as the fold on a random multi-block graph."""
        import ray.data

        # small on purpose: every propagate round costs a fixed
        # handful of shuffles, so this stays a semantics check, not
        # a perf test (the fold path carries the big random graph)
        rng = random.Random(23)
        edges = [(rng.randrange(24), rng.randrange(24))
                 for _ in range(14)]
        ds = ray.data.from_arrow(pa.table({
            "d1": pa.array([a for a, _ in edges], pa.int64()),
            "d2": pa.array([b for _, b in edges], pa.int64()),
        })).repartition(3)
        assert _cc_rows(ds, method="propagate") == _cc_rows(ds)
