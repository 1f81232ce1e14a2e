"""FastSS deletion-neighborhood edit-distance<=1 pair discovery."""

import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.fuzzy import within_edit1


class TestWithinEdit1:
    def test_kernel(self):
        assert within_edit1("abc", "abc")
        assert within_edit1("abc", "abd")    # substitution
        assert within_edit1("abc", "ab")     # deletion
        assert within_edit1("ab", "abc")     # insertion
        assert within_edit1("", "a")
        assert within_edit1("", "")
        assert not within_edit1("abc", "cba")
        assert not within_edit1("abc", "a")
        assert not within_edit1("ab", "ba")  # distance 2

    def test_randomized_vs_levenshtein(self):
        import random

        import duckdb

        rng = random.Random(6)
        con = duckdb.connect()
        for _ in range(300):
            a = "".join(rng.choice("abc")
                        for _ in range(rng.randrange(0, 6)))
            b = "".join(rng.choice("abc")
                        for _ in range(rng.randrange(0, 6)))
            want = con.execute(
                "SELECT levenshtein(?, ?) <= 1", [a, b]
            ).fetchone()[0]
            assert within_edit1(a, b) == want, (a, b)
        con.close()


class TestEdit1Pairs:
    @pytest.mark.parametrize("layout", [1, 4])
    def test_differential_vs_duckdb(self, ray_session, layout):
        import random

        import duckdb
        import ray.data

        from ocr_pipeline_ray.stages.fuzzy import edit1_pairs

        rng = random.Random(31)
        base = ["table", "fable", "cable", "tble", "tables",
                "stream", "steam", "dream", "", "a", "b", None]
        vals = [rng.choice(base) for _ in range(80)]
        tbl = pa.table({
            "doc_id": pa.array(range(80), pa.int64()),
            "s": pa.array(vals, pa.string()),
        })
        stats = {}
        got = edit1_pairs(
            ray.data.from_arrow(tbl).repartition(layout), "s",
            n_buckets=7, stats=stats)
        got_set = {(r["id_a"], r["id_b"])
                   for r in got.to_pylist()}
        con = duckdb.connect()
        con.register("t", tbl)
        want = {(a, b) for a, b in con.execute(
            "SELECT x.doc_id, y.doc_id FROM t x JOIN t y "
            "ON x.doc_id < y.doc_id "
            "AND levenshtein(x.s, y.s) <= 1").fetchall()}
        con.close()
        assert got_set == want
        assert stats["blocks_capped"] == 0

    def test_cap_is_counted_not_silent(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.fuzzy import edit1_pairs

        # 30 identical strings: every variant block is size 30 > cap
        tbl = pa.table({
            "doc_id": pa.array(range(30), pa.int64()),
            "s": pa.array(["same"] * 30, pa.string()),
        })
        stats = {}
        edit1_pairs(ray.data.from_arrow(tbl), "s", n_buckets=4,
                    max_block=8, stats=stats)
        assert stats["blocks_capped"] > 0
