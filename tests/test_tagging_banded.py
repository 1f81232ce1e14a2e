"""Banded (b×r) MinHash LSH + phrase-dictionary tagging."""

import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.dedup import (
    minhash_banded_pairs,
    minhash_signature,
    minhash_signature_salted,
)
from ocr_pipeline_ray.stages.textstats import DictionaryTagger, dictionary_tag


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


class TestSaltedSignature:
    def test_first_four_match_unsalted(self):
        t = "der hund läuft über die alte brücke heute am morgen"
        assert minhash_signature_salted(t, 4) == minhash_signature(t)
        assert minhash_signature_salted(t, 8)[:4] == minhash_signature(t)

    def test_salted_hashes_differ_from_unsalted(self):
        t = "der hund läuft über die alte brücke heute am morgen"
        sig = minhash_signature_salted(t, 8)
        # h4 comes from the salt-1 digest — a different hash function
        assert sig[4] != sig[0] and all(v is not None for v in sig)

    def test_short_doc_all_null(self):
        assert minhash_signature_salted("nur zwei", 8) == [None] * 8

    def test_deterministic(self):
        t = "a b c d e f g h i j"
        assert (minhash_signature_salted(t, 6)
                == minhash_signature_salted(t, 6))


class TestBandedPairs:
    def test_exact_dups_always_pair_disjoint_never(self, ray_session):
        base = "der hund läuft über die alte brücke heute am morgen früh"
        other = "completely different vocabulary nothing shared here at all"
        ds = _ds([(1, base), (2, base), (3, other)])
        pairs = {
            (r["d1"], r["d2"])
            for r in minhash_banded_pairs(ds, b=3, r=2).take_all()
        }
        assert (1, 2) in pairs
        assert all(3 not in p for p in pairs)

    def test_r2_no_looser_than_r1_on_shared_functions(self, ray_session):
        # a pair colliding on band0 (h0 AND h1) necessarily collides
        # on the r=1 path's h0 band — banding only tightens bands it
        # shares hash functions with
        base = ["worte"] * 30
        edited = base[:25] + ["anders"] * 5
        ds = _ds([(1, " ".join(base)), (2, " ".join(edited))])
        from ocr_pipeline_ray.stages.dedup import minhash_dup_pairs

        banded = {(r["d1"], r["d2"])
                  for r in minhash_banded_pairs(ds, b=2, r=2).take_all()}
        loose = {(r["d1"], r["d2"])
                 for r in minhash_dup_pairs(ds).take_all()}
        assert banded <= loose

    def test_short_docs_produce_no_bands(self, ray_session):
        ds = _ds([(1, "nur zwei"), (2, "nur zwei")])
        assert minhash_banded_pairs(ds, b=3, r=2).count() == 0


class TestDictionaryTagger:
    def test_overlapping_counts(self):
        tagger = DictionaryTagger(["batch batch"])
        out = tagger(pa.table({
            "doc_id": pa.array([7], pa.int64()),
            "text": pa.array(["batch batch batch"], pa.string()),
        }))
        assert out.to_pylist() == [
            {"doc_id": 7, "term": "batch batch", "n_hits": 2}
        ]

    def test_longest_phrase_wins_at_shared_offset(self):
        tagger = DictionaryTagger(["x y", "x y z"])
        out = tagger(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["x y z x y"], pa.string()),
        })).to_pylist()
        by_term = {r["term"]: r["n_hits"] for r in out}
        # offset 0 matches the longer "x y z"; "x y" only at offset 6
        assert by_term == {"x y z": 1, "x y": 1}

    def test_null_and_empty_text_skipped(self):
        tagger = DictionaryTagger(["a b"])
        out = tagger(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([None, ""], pa.string()),
        }))
        assert out.num_rows == 0

    def test_empty_dictionary_rejected(self):
        with pytest.raises(ValueError):
            DictionaryTagger([])
        with pytest.raises(ValueError):
            DictionaryTagger([""])  # '' matches at every offset

    def test_empty_string_terms_filtered(self):
        tagger = DictionaryTagger(["a b", ""])
        out = tagger(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["a b c"], pa.string()),
        })).to_pylist()
        assert out == [{"doc_id": 1, "term": "a b", "n_hits": 1}]

    def test_actor_pool_stage(self, ray_session):
        ds = _ds([
            (1, "slow join after slow join"),
            (2, "no dictionary words here"),
        ])
        rows = dictionary_tag(ds, ["slow join"], concurrency=2).take_all()
        assert rows == [{"doc_id": 1, "term": "slow join", "n_hits": 2}]


class TestCharEntropy:
    def test_uniform_and_degenerate(self):
        from ocr_pipeline_ray.stages.textstats import char_entropy_fn
        import math

        out = char_entropy_fn(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(["aaaa", "ab", None, ""], pa.string()),
        })).to_pylist()
        # null/empty dropped; single-char alphabet → 0; 50/50 → ln 2
        assert [r["doc_id"] for r in out] == [1, 2]
        assert out[0]["char_entropy"] == 0.0
        assert abs(out[1]["char_entropy"] - math.log(2)) < 1e-6
        assert out[1]["n_chars"] == 2

    def test_multibyte_codepoints(self):
        from ocr_pipeline_ray.stages.textstats import char_entropy_fn
        import math

        out = char_entropy_fn(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["日本語日本語"], pa.string()),
        })).to_pylist()
        assert out[0]["n_chars"] == 6
        assert abs(out[0]["char_entropy"] - math.log(3)) < 1e-6


class TestOovRate:
    def test_top_v_coverage(self, ray_session):
        from ocr_pipeline_ray.stages.textstats import oov_rate

        # 'a' dominates; with v=1 the vocab is exactly {'a'}
        ds = _ds([(1, "a a a rare"), (2, "a a"), (3, "x y")])
        rows = {r["doc_id"]: r for r in oov_rate(ds, v=1).take_all()}
        assert rows[1]["n_oov"] == 1 and rows[1]["n_tokens"] == 4
        assert rows[2]["n_oov"] == 0 and rows[2]["oov_rate"] == 0.0
        assert rows[3]["n_oov"] == 2 and rows[3]["oov_rate"] == 1.0

    def test_tie_break_token_asc(self, ray_session):
        from ocr_pipeline_ray.stages.textstats import oov_rate

        # 'b' and 'c' tie on count; token-asc keeps 'b' at v=1
        ds = _ds([(1, "b c"), (2, "c b")])
        rows = {r["doc_id"]: r for r in oov_rate(ds, v=1).take_all()}
        assert rows[1]["n_oov"] == 1 and rows[2]["n_oov"] == 1


class TestPrefixDup:
    def test_shared_head_different_tail(self, ray_session):
        from ocr_pipeline_ray.stages.dedup import prefix_dup_groups

        head = " ".join(f"t{i}" for i in range(32))
        ds = _ds([
            (1, head + " original tail"),
            (2, head + " syndicated copy with extra chrome"),
            (3, "completely different document head entirely"),
        ])
        rows = prefix_dup_groups(ds, p=32).take_all()
        assert len(rows) == 1
        assert rows[0]["keep_id"] == 1 and rows[0]["n_docs"] == 2

    def test_short_docs_degrade_to_exact(self, ray_session):
        from ocr_pipeline_ray.stages.dedup import prefix_dup_groups

        ds = _ds([(1, "kurz"), (2, "kurz"), (3, "anders")])
        rows = prefix_dup_groups(ds, p=32).take_all()
        assert len(rows) == 1 and rows[0]["n_docs"] == 2


class TestAdaptiveSaltedAgg:
    def _events(self, rows):
        import ray.data

        return ray.data.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], pa.string()),
            "uid": pa.array([r[1] for r in rows], pa.int64()),
            "v": pa.array([r[2] for r in rows], pa.float64()),
        }))

    def test_matches_plain_groupby(self, ray_session):
        from ocr_pipeline_ray.stages.stats import adaptive_salted_agg

        rows = [("hot", i, float(i % 7)) for i in range(400)]
        rows += [("cold", i, 1.0) for i in range(5)]
        out = {r["k"]: r for r in adaptive_salted_agg(
            self._events(rows), "k", "v", "uid",
            sample_mod=2, target_per_reducer=50).take_all()}
        assert out["hot"]["n_events"] == 400
        assert out["hot"]["sum_value"] == sum(i % 7 for i in range(400))
        assert out["cold"]["n_events"] == 5 and out["cold"]["sum_value"] == 5.0

    def test_no_hot_keys_single_salt(self, ray_session):
        from ocr_pipeline_ray.stages.stats import adaptive_salted_agg

        rows = [("a", i, 2.0) for i in range(10)]
        out = adaptive_salted_agg(
            self._events(rows), "k", "v", "uid",
            sample_mod=2, target_per_reducer=10_000).take_all()
        assert out == [{"k": "a", "n_events": 10, "sum_value": 20.0}]


class TestSparseCosinePairs:
    def test_repetition_sensitivity_vs_jaccard(self, ray_session):
        from ocr_pipeline_ray.stages.dedup import sparse_cosine_pairs

        base = "alpha beta gamma delta epsilon zeta eta theta"
        # doc 2 = doc 1 with one shingle region repeated many times:
        # identical shingle SET (Jaccard high) but skewed counts
        rep = base + (" alpha beta gamma" * 10)
        ds = _ds([(1, base), (2, rep), (3, base)])
        rows = {(r["d1"], r["d2"]): r["cosine"]
                for r in sparse_cosine_pairs(
                    ds, threshold=0.0, df_cap=100).take_all()}
        assert rows[(1, 3)] == 1.0           # identical docs
        assert rows[(1, 2)] < rows[(1, 3)]   # repetition drags cosine

    def test_df_cap_excludes_common_terms(self, ray_session):
        from ocr_pipeline_ray.stages.dedup import sparse_cosine_pairs

        # the only shared shingle appears in all 3 docs -> df=3 > cap
        shared = "x y z"
        ds = _ds([(1, shared + " a b c"), (2, shared + " d e f"),
                  (3, shared + " g h i")])
        out = sparse_cosine_pairs(ds, threshold=0.0, df_cap=2).take_all()
        assert out == []

    def test_short_docs_no_rows(self, ray_session):
        from ocr_pipeline_ray.stages.dedup import sparse_cosine_pairs

        ds = _ds([(1, "nur zwei"), (2, "nur zwei")])
        assert sparse_cosine_pairs(ds).count() == 0


class TestRarityDispersion:
    def test_uniform_vs_mixed_dispersion(self, ray_session):
        from ocr_pipeline_ray.stages.textstats import rarity_dispersion

        # docs 1-3 share 'common' (df=4); 'rare*' tokens have df=1.
        # doc 4 is all-common (zero variance); doc 1 mixes df=4 and
        # df=1 tokens (positive variance).
        ds = _ds([
            (1, "common rare1 rare2"),
            (2, "common rarex"),
            (3, "common rarey"),
            (4, "common common common"),
        ])
        rows = {r["doc_id"]: r for r in rarity_dispersion(ds).take_all()}
        assert rows[4]["var_df"] == 0.0
        assert rows[4]["mean_df"] == 4.0
        assert rows[1]["var_df"] > 0.0
        # doc 1: dfs (4,1,1) -> mean 2, var = (16+1+1)/3 - 4 = 2
        assert rows[1]["mean_df"] == 2.0 and rows[1]["var_df"] == 2.0


class TestParagraphLangMix:
    def test_mixing_and_majority(self):
        from ocr_pipeline_ray.stages.textstats import paragraph_lang_mix_fn

        out = paragraph_lang_mix_fn(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                "the a here\n\nder die das\n\nthe a again",  # en,de,en
                "der und die\n\nder die",                    # de,de
                "nichts here",                               # unk only
            ], pa.string()),
        })).to_pylist()
        r = {x["doc_id"]: x for x in out}
        assert r[1]["n_paras"] == 3 and r[1]["n_langs"] == 2
        assert r[1]["major_lang"] == "en"
        assert abs(r[1]["mix_frac"] - (1.0 - 2 / 3)) < 1e-12
        assert r[2] == {"doc_id": 2, "n_paras": 2, "n_langs": 1,
                        "major_lang": "de", "mix_frac": 0.0}
        assert r[3]["major_lang"] == "unk" and r[3]["mix_frac"] == 0.0

    def test_tie_breaks_lexicographic(self):
        from ocr_pipeline_ray.stages.textstats import paragraph_lang_mix_fn

        # one en para, one de para: tie -> 'de' (lexicographic min)
        out = paragraph_lang_mix_fn(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["the a\n\nder die"], pa.string()),
        })).to_pylist()
        assert out[0]["major_lang"] == "de" and out[0]["n_langs"] == 2
