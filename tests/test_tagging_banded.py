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

    def test_actor_pool_stage(self, ray_session):
        ds = _ds([
            (1, "slow join after slow join"),
            (2, "no dictionary words here"),
        ])
        rows = dictionary_tag(ds, ["slow join"], concurrency=2).take_all()
        assert rows == [{"doc_id": 1, "term": "slow join", "n_hits": 2}]
