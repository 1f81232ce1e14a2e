"""snapshot_diff / diff_summary — keyed two-snapshot reconciliation."""

import numpy as np
import pyarrow as pa
import pytest


def _mk(ids, texts, langs=None):
    n = len(ids)
    return pa.table({
        "id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs or ["en"] * n, pa.string()),
    })


class TestSnapshotDiff:
    def test_all_four_statuses(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.diff import diff_summary, snapshot_diff

        old = _mk([1, 2, 3, 4], ["a", "b", "c", "d"])
        new = _mk([2, 3, 4, 5], ["b", "C!", "d", "e"])
        out = snapshot_diff(
            ray.data.from_arrow(old), ray.data.from_arrow(new),
            "id", ["text", "lang"], n_buckets=8,
        ).to_pandas().set_index("id")["status"].to_dict()
        assert out == {1: "removed", 2: "unchanged", 3: "changed",
                       4: "unchanged", 5: "added"}
        summ = diff_summary(
            ray.data.from_arrow(old), ray.data.from_arrow(new),
            "id", ["text", "lang"], n_buckets=8).to_pylist()[0]
        assert summ == {"n_added": 1, "n_removed": 1,
                        "n_changed": 1, "n_unchanged": 2}

    def test_null_values_compare_equal(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.diff import snapshot_diff

        old = _mk([1, 2], [None, None])
        new = _mk([1, 2], [None, "x"])
        out = snapshot_diff(
            ray.data.from_arrow(old), ray.data.from_arrow(new),
            "id", ["text"], n_buckets=4,
        ).to_pandas().set_index("id")["status"].to_dict()
        # NULL IS NOT DISTINCT FROM NULL -> unchanged; NULL vs 'x' -> changed
        assert out == {1: "unchanged", 2: "changed"}

    def test_layout_invariance_vs_duckdb(self, ray_session):
        import duckdb
        import ray.data

        from ocr_pipeline_ray.stages.diff import snapshot_diff

        rng = np.random.default_rng(7)
        ids_old = rng.choice(3000, size=800, replace=False)
        ids_new = rng.choice(3000, size=800, replace=False)
        old = _mk(ids_old.tolist(),
                  [f"t{i % 13}" for i in ids_old],
                  [f"l{i % 3}" for i in ids_old])
        new = _mk(ids_new.tolist(),
                  [f"t{i % 11}" for i in ids_new],
                  [f"l{i % 3}" for i in ids_new])
        con = duckdb.connect()
        con.register("o", old)
        con.register("n", new)
        want = con.execute(
            "SELECT coalesce(o.id, n.id) AS id, "
            "CASE WHEN o.id IS NULL THEN 'added' "
            "WHEN n.id IS NULL THEN 'removed' "
            "WHEN (o.text IS DISTINCT FROM n.text) "
            "OR (o.lang IS DISTINCT FROM n.lang) THEN 'changed' "
            "ELSE 'unchanged' END AS status "
            "FROM o FULL JOIN n ON o.id = n.id ORDER BY id"
        ).fetch_df()
        for parts in (1, 7):
            got = snapshot_diff(
                ray.data.from_arrow(old).repartition(parts),
                ray.data.from_arrow(new).repartition(3),
                "id", ["text", "lang"], n_buckets=16,
            ).to_pandas().sort_values("id").reset_index(drop=True)
            assert got.equals(want)

    def test_duplicate_key_raises(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.diff import snapshot_diff

        old = _mk([1, 1], ["a", "b"])
        new = _mk([1], ["a"])
        with pytest.raises(Exception, match="duplicate key"):
            snapshot_diff(
                ray.data.from_arrow(old), ray.data.from_arrow(new),
                "id", ["text"], n_buckets=2).materialize()
