"""Bigram-LM scoring: known values, edge rows, strategy equivalence."""

import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.lm import lm_score, train_bigram_lm

DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    "text": pa.array([
        "a b a b",          # bigrams: a b, b a, a b
        "a b c",            # a b, b c
        "x",                # single token -> no bigrams
        "",                 # one empty token -> no bigrams
        None,               # NULL -> no bigrams
        "c c",              # c c (count 1 -> pruned at min_count=2)
    ], pa.string()),
})
# unigrams: a:3 b:3 c:3 x:1 '':1  -> V = 5
# bigram counts: "a b":3, "b a":1, "b c":1, "c c":1


def _rows(ds):
    return {r["doc_id"]: (r["n_bigrams"], r["n_oov"], r["mean_ipp"])
            for r in ds.take_all()}


class TestLmScore:
    @pytest.fixture()
    def model(self, ray_session):
        ds = ray_session.data.from_arrow(DOCS).repartition(3)
        uni, bi, v = train_bigram_lm(ds, min_count=2)
        return ds, uni, bi, v

    def test_training_counts(self, model):
        _, uni, bi, v = model
        assert v == 5
        uni_map = {r["token"]: r["c"] for r in uni.take_all()}
        assert uni_map == {"a": 3, "b": 3, "c": 3, "x": 1, "": 1}
        bi_map = {r["pair"]: r["c12"] for r in bi.take_all()}
        assert bi_map == {"a b": 3}  # min_count=2 prunes the rest

    def test_hand_computed_scores(self, model):
        ds, uni, bi, v = model
        got = _rows(lm_score(ds, uni, bi, v, scale=100))
        # doc 0: "a b"(c12=3,c1=3): (3+5)*100//4 = 200, twice;
        #        "b a"(pruned,c1=3): (3+5)*100//1 = 800
        #        sum=1200, nb=3, noov=1, mean=400
        assert got[0] == (3, 1, 400)
        # doc 1: "a b" -> 200; "b c"(pruned, c1=3) -> 800
        assert got[1] == (2, 1, 500)
        # degenerate rows present with sentinel
        assert got[2] == (0, 0, -1)
        assert got[3] == (0, 0, -1)
        assert got[4] == (0, 0, -1)
        # doc 5: "c c" pruned, c1=3 -> (3+5)*100//1 = 800
        assert got[5] == (1, 1, 800)

    def test_shuffle_equals_broadcast(self, model):
        ds, uni, bi, v = model
        a = _rows(lm_score(ds, uni, bi, v, scale=100))
        b = _rows(lm_score(ds, uni, bi, v, scale=100, join="shuffle"))
        assert a == b

    def test_layout_invariance(self, ray_session):
        want = None
        for blocks in (1, 2, 5):
            ds = ray_session.data.from_arrow(DOCS).repartition(blocks)
            uni, bi, v = train_bigram_lm(ds, min_count=2)
            got = _rows(lm_score(ds, uni, bi, v, scale=100))
            if want is None:
                want = got
            assert got == want

    def test_bad_join_raises(self, model):
        ds, uni, bi, v = model
        with pytest.raises(ValueError):
            lm_score(ds, uni, bi, v, join="hash")
