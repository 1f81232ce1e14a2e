"""ROLLUP (grouping sets) and PIVOT operators (stages/rollup.py)."""

import os
import sys

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _events():
    import ray.data

    return ray.data.from_arrow(pa.table({
        "t": pa.array(["a", "a", "b", "b", "b"], pa.string()),
        "d": pa.array(["d1", "d1", "d1", "d2", "d2"], pa.string()),
        "v": pa.array([1, 2, 4, 8, 16], pa.int64()),
    }))


class TestRollupAgg:
    def test_all_levels(self, ray_session):
        from ocr_pipeline_ray.stages.rollup import rollup_agg

        got = {(r["t"], r["d"], r["gid"]): (r["n_rows"], r["sum_val"])
               for r in rollup_agg(_events(), keys=["t", "d"],
                                   value_col="v",
                                   n_buckets=4).take_all()}
        assert got == {
            ("a", "d1", 0): (2, 3),
            ("b", "d1", 0): (1, 4),
            ("b", "d2", 0): (2, 24),
            ("a", None, 1): (2, 3),
            ("b", None, 1): (3, 28),
            (None, None, 3): (5, 31),
        }

    def test_cube_all_subsets(self, ray_session):
        from ocr_pipeline_ray.stages.rollup import cube_agg

        got = {(r["t"], r["d"], r["gid"]): (r["n_rows"], r["sum_val"])
               for r in cube_agg(_events(), keys=["t", "d"],
                                 value_col="v",
                                 n_buckets=4).take_all()}
        assert got == {
            ("a", "d1", 0): (2, 3),
            ("b", "d1", 0): (1, 4),
            ("b", "d2", 0): (2, 24),
            ("a", None, 1): (2, 3),
            ("b", None, 1): (3, 28),
            (None, "d1", 2): (3, 7),
            (None, "d2", 2): (2, 24),
            (None, None, 3): (5, 31),
        }

    def test_layout_invariance(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.rollup import rollup_agg

        tbl = pa.table({
            "t": pa.array(["a", "a", "b", "b", "b"], pa.string()),
            "d": pa.array(["d1", "d1", "d1", "d2", "d2"], pa.string()),
            "v": pa.array([1, 2, 4, 8, 16], pa.int64()),
        })
        expect = sorted(
            (r["t"] or "", r["d"] or "", r["gid"], r["n_rows"],
             r["sum_val"])
            for r in rollup_agg(
                ray.data.from_arrow(tbl), ["t", "d"], "v",
                n_buckets=4).take_all())
        many_blocks = ray.data.from_arrow_refs([
            __import__("ray").put(tbl.slice(i, 1))
            for i in range(tbl.num_rows)])
        got = sorted(
            (r["t"] or "", r["d"] or "", r["gid"], r["n_rows"],
             r["sum_val"])
            for r in rollup_agg(many_blocks, ["t", "d"], "v",
                                n_buckets=2).take_all())
        assert got == expect


class TestPivotCounts:
    def test_wide_counts(self, ray_session):
        from ocr_pipeline_ray.stages.rollup import pivot_counts

        got = {r["d"]: (r["n_a"], r["n_b"])
               for r in pivot_counts(_events(), row_col="d",
                                     col_col="t",
                                     col_values=["a", "b"],
                                     n_buckets=4).take_all()}
        assert got == {"d1": (2, 1), "d2": (0, 2)}

    def test_strict_raises_on_unknown(self, ray_session):
        import pytest as _pytest
        import ray.exceptions

        from ocr_pipeline_ray.stages.rollup import pivot_counts

        with _pytest.raises(
                (ValueError, ray.exceptions.RayTaskError)):
            pivot_counts(_events(), row_col="d", col_col="t",
                         col_values=["a"], n_buckets=4).take_all()
