"""Inverted index: postings correctness, caps, block invariance."""

import random

import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.index import inverted_index, token_doc_tf_fn


def _tbl(texts):
    return pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })


def _naive(texts, cap=None):
    from collections import Counter, defaultdict

    post = defaultdict(dict)
    for i, t in enumerate(texts):
        if t is None:
            continue
        for tok, n in Counter(t.split(" ")).items():
            post[tok][i] = n
    out = {}
    for tok, docs in post.items():
        ids = sorted(docs)
        kept = ids if cap is None else ids[:cap]
        out[tok] = (len(ids), kept, [docs[i] for i in kept],
                    cap is not None and len(ids) > cap)
    return out


class TestTokenDocTf:
    def test_combines_within_doc(self):
        out = token_doc_tf_fn(_tbl(["a a b", None, "b"]))
        rows = sorted(zip(out.column("token").to_pylist(),
                          out.column("doc_id").to_pylist(),
                          out.column("tf").to_pylist()))
        assert rows == [("a", 0, 2), ("b", 0, 1), ("b", 2, 1)]


class TestInvertedIndex:
    def _run(self, texts, cap=None, n_blocks=3, n_buckets=4):
        import ray.data

        ds = ray.data.from_arrow(_tbl(texts)).repartition(n_blocks)
        rows = inverted_index(ds, max_postings=cap,
                              n_buckets=n_buckets).take_all()
        return {r["token"]: (r["df"], list(r["doc_ids"]),
                             list(r["tfs"]), r["truncated"])
                for r in rows}

    def test_exact_postings(self, ray_session):
        texts = ["a b a", "b c", "a c c", None, ""]
        got = self._run(texts)
        assert got == _naive(texts)
        assert got["a"] == (2, [0, 2], [2, 1], False)
        assert got[""] == (1, [4], [1], False)

    def test_cap_keeps_lowest_doc_ids_and_flags(self, ray_session):
        texts = ["hot"] * 10 + ["cold"]
        got = self._run(texts, cap=4)
        assert got["hot"] == (10, [0, 1, 2, 3], [1, 1, 1, 1], True)
        assert got["cold"] == (1, [10], [1], False)

    @pytest.mark.parametrize("n_blocks,n_buckets", [(1, 2), (7, 8)])
    def test_block_layout_invariant(self, ray_session, n_blocks, n_buckets):
        rng = random.Random(3)
        vocab = [f"t{i}" for i in range(15)]
        texts = [
            " ".join(rng.choice(vocab)
                     for _ in range(rng.randrange(1, 10)))
            for _ in range(60)
        ]
        assert self._run(texts, cap=8, n_blocks=n_blocks,
                         n_buckets=n_buckets) == _naive(texts, cap=8)


class TestPhraseMatch:
    def test_matches_counts_and_positions(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.index import phrase_match

        tbl = pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "x a b c y a b c",   # 2 matches at pos 2 and 6
                "a b x c",            # gap -> no match
                "c b a",              # wrong order -> no match
                "a b c",              # match at pos 1
            ], pa.string()),
        })
        out = phrase_match(
            ray.data.from_arrow(tbl).repartition(3),
            ["a", "b", "c"], n_buckets=4,
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [1, 4]
        assert out["n_matches"].tolist() == [2, 1]
        assert out["first_pos"].tolist() == [2, 1]

    def test_repeated_phrase_tokens(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.index import phrase_match

        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a a b", "a b a"], pa.string()),
        })
        out = phrase_match(
            ray.data.from_arrow(tbl), ["a", "a"],
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [1]
        assert out["n_matches"].tolist() == [1]
        assert out["first_pos"].tolist() == [1]
