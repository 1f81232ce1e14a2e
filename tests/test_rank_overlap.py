"""global_rank (distributed ROW_NUMBER/NTILE) and source_overlap
(cross-source shingle matrix) vs DuckDB window/join twins."""

import random

import duckdb
import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.overlap import source_overlap
from ocr_pipeline_ray.stages.rank import global_rank


def _duck(tbl: pa.Table, sql: str):
    con = duckdb.connect()
    con.register("t", tbl)
    return con.sql(sql).arrow()


class TestGlobalRank:
    @pytest.mark.parametrize("n,k", [(1, 4), (7, 4), (100, 4),
                                     (257, 7), (3, 8)])
    def test_matches_row_number_and_ntile(self, ray_session, n, k):
        import ray.data

        rng = random.Random(n)
        ids = list(range(n))
        # heavy score duplication stresses tie handling across blocks
        scores = [rng.randrange(0, max(2, n // 4)) for _ in ids]
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "score": pa.array(scores, pa.int64()),
        })
        ds = ray.data.from_arrow(tbl).repartition(5)
        got = (
            global_rank(ds, ["score", "doc_id"], ntile_k=k)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        want = _duck(tbl, (
            "SELECT doc_id, score, "
            "CAST(row_number() OVER (ORDER BY score, doc_id) AS BIGINT)"
            " AS rank, "
            f"CAST(ntile({k}) OVER (ORDER BY score, doc_id) AS BIGINT)"
            " AS tile FROM t ORDER BY doc_id"
        )).to_pandas()
        assert got["rank"].tolist() == want["rank"].tolist()
        assert got["tile"].tolist() == want["tile"].tolist()

    def test_rank_only_no_ntile(self, ray_session):
        import ray.data

        tbl = pa.table({"doc_id": pa.array([3, 1, 2], pa.int64()),
                        "score": pa.array([5, 5, 1], pa.int64())})
        ds = ray.data.from_arrow(tbl)
        out = global_rank(ds, ["score", "doc_id"]).to_pandas()
        assert "tile" not in out.columns
        by_id = dict(zip(out["doc_id"], out["rank"]))
        assert by_id == {2: 1, 1: 2, 3: 3}

    def test_null_scores_sort_first(self, ray_session):
        import ray.data

        # nulls fill to int64 min => rank ahead of every real score
        tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                        "score": pa.array([7, None, -3], pa.int64())})
        ds = ray.data.from_arrow(tbl)
        out = global_rank(ds, ["score", "doc_id"]).to_pandas()
        by_id = dict(zip(out["doc_id"], out["rank"]))
        assert by_id == {1: 1, 2: 2, 0: 3}

    def test_empty_dataset(self, ray_session):
        import ray.data

        tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                        "score": pa.array([], pa.int64())})
        out = global_rank(ray.data.from_arrow(tbl),
                          ["score", "doc_id"], ntile_k=4)
        assert out.count() == 0
        assert set(out.schema().names) == {"doc_id", "score", "rank",
                                           "tile"}


class TestSourceOverlap:
    def test_matches_sql_join(self, ray_session):
        import ray.data

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(30)]
        rows = []
        for i in range(120):
            src = f"s{i % 4}"
            text = " ".join(rng.choice(vocab) for _ in range(12))
            rows.append((i, src, text))
        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })
        ds = ray.data.from_arrow(tbl).repartition(6)
        got = source_overlap(ds).to_pandas()
        want = _duck(tbl, (
            "WITH d AS (SELECT source, string_split(text, ' ') AS toks"
            " FROM t), "
            "sh AS (SELECT source, CASE WHEN len(toks) >= 3 THEN "
            "list_transform(generate_series(1, len(toks) - 2), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
            "ELSE [] END AS shingles FROM d), "
            "ss AS (SELECT DISTINCT source, unnest(shingles) AS s "
            "FROM sh) "
            "SELECT a.source AS source_a, b.source AS source_b, "
            "CAST(count(*) AS BIGINT) AS n_shared "
            "FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        )).to_pandas()
        assert got.values.tolist() == want.values.tolist()

    def test_null_rows_and_short_texts_ignored(self, ray_session):
        import ray.data

        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "source": pa.array(["a", "b", None, "a", "b"], pa.string()),
            "text": pa.array(["x y z", "x y z", "x y z", None, "x y"],
                             pa.string()),
        })
        got = source_overlap(ray.data.from_arrow(tbl))
        assert got.to_pydict() == {
            "source_a": ["a"], "source_b": ["b"], "n_shared": [1],
        }

    def test_too_many_groups_raises(self, ray_session):
        import ray.data

        tbl = pa.table({
            "doc_id": pa.array(range(70), pa.int64()),
            "source": pa.array([f"g{i}" for i in range(70)],
                               pa.string()),
            "text": pa.array(["a b c"] * 70, pa.string()),
        })
        with pytest.raises(ValueError):
            source_overlap(ray.data.from_arrow(tbl))


class TestGroupedRank:
    @pytest.mark.parametrize("layout", [1, 4])
    def test_differential_vs_duckdb(self, ray_session, layout):
        import random

        import duckdb
        import ray.data

        from ocr_pipeline_ray.stages.rank import grouped_rank

        rng = random.Random(21)
        n = 300
        tbl = pa.table({
            "k": pa.array(
                [None if rng.random() < 0.1 else f"g{rng.randrange(4)}"
                 for _ in range(n)], pa.string()),
            "v": pa.array(
                [None if rng.random() < 0.1 else rng.randrange(12)
                 for _ in range(n)], pa.int64()),     # heavy ties
            "id": pa.array(range(n), pa.int64()),
        })
        got = grouped_rank(
            ray.data.from_arrow(tbl).repartition(layout), "k",
            [("v", "descending"), ("id", "ascending")], n_dense=1,
            n_buckets=5,
        ).take_all()
        got = sorted(((r["k"], r["id"], r["row_number"], r["rank"],
                       r["dense_rank"]) for r in got), key=repr)
        con = duckdb.connect()
        con.register("t", tbl)
        want = sorted((tuple(r) for r in con.execute(
            "SELECT k, id, "
            "row_number() OVER (PARTITION BY k ORDER BY v DESC "
            "NULLS LAST, id), "
            "rank() OVER (PARTITION BY k ORDER BY v DESC NULLS LAST), "
            "dense_rank() OVER (PARTITION BY k ORDER BY v DESC "
            "NULLS LAST) FROM t").fetchall()), key=repr)
        con.close()
        assert got == want

    def test_n_dense_validation(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.rank import grouped_rank

        tbl = pa.table({"k": pa.array(["a"], pa.string()),
                        "v": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            grouped_rank(ray.data.from_arrow(tbl), "k",
                         [("v", "ascending")], n_dense=2)
