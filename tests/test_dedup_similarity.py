"""Dedup + similarity operators on corpora with KNOWN duplicates."""

import random

import numpy as np
import pyarrow as pa
import pytest

from ocr_pipeline_ray.stages.dedup import (
    jaccard,
    minhash_signature,
    shingles,
    simhash64,
)


class TestPrimitives:
    def test_shingles(self):
        assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
        assert shingles(["a", "b"], 3) == []

    def test_minhash_identical_docs_identical_sigs(self):
        a = minhash_signature("der hund läuft über die alte brücke heute")
        b = minhash_signature("der hund läuft über die alte brücke heute")
        assert a == b and all(v is not None for v in a)

    def test_minhash_near_dup_shares_bands(self):
        base = "der hund läuft über die alte brücke " * 6
        edited = base + "kleine änderung"
        a = minhash_signature(base.strip())
        b = minhash_signature(edited.strip())
        assert sum(x == y for x, y in zip(a, b)) >= 2

    def test_minhash_short_doc_null(self):
        assert minhash_signature("nur zwei") == [None] * 4

    def test_simhash_near_dup_small_hamming(self):
        base = "viele gleiche worte " * 20
        a = simhash64(base.strip())
        b = simhash64((base + "extra wort").strip())
        c = simhash64("komplett anderes thema über ganz andere dinge hier")
        ham_ab = bin(a ^ b).count("1")
        ham_ac = bin(a ^ c).count("1")
        assert ham_ab < ham_ac
        assert ham_ab <= 8

    def test_winnow_fingerprint(self, ray_session):
        """Winnowing: short docs get no windows; identical docs get
        identical fingerprints; a LOCAL edit preserves most distinct
        window minima (the robustness property the technique is for)."""
        import hashlib as _hl

        import ray.data

        from ocr_pipeline_ray.stages.dedup import winnow_fingerprint_fn

        base = ("der alte turm steht am fluss unter dem hohen berg "
                "und die sonne geht über dem tal langsam unter heute") * 3
        edited = base.replace("sonne", "wolke", 1)
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array([base, base, edited, "nur sieben worte"],
                             pa.string()),
        })
        rows = (
            ray.data.from_arrow(tbl)
            .map_batches(winnow_fingerprint_fn, batch_format="pyarrow")
            .take_all()
        )
        by_id = {r["doc_id"]: r for r in rows}
        assert by_id[3] == {"doc_id": 3, "n_windows": 0, "n_fps": 0,
                            "fp_min": None}
        assert by_id[0] == {**by_id[1], "doc_id": 0}
        # hand-check the window count and the global min for doc 0
        toks = base.split(" ")
        hs = [int(_hl.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        assert by_id[0]["n_windows"] == len(toks) - 7
        assert by_id[0]["fp_min"] == min(
            min(hs[i:i + 8]) for i in range(len(toks) - 7)
        )
        # a one-token local edit perturbs at most `window` minima
        assert abs(by_id[2]["n_fps"] - by_id[0]["n_fps"]) <= 8

    def test_simhash_batch_matches_scalar(self):
        """Vectorized kernel is bit-exact vs the scalar reference,
        including empty text and shared tokens across docs."""
        from ocr_pipeline_ray.stages.dedup import simhash64_batch

        rng = np.random.RandomState(3)
        vocab = [f"wort{i}" for i in range(40)] + ["ſtraße", "café"]
        texts = [
            " ".join(vocab[j] for j in rng.randint(0, len(vocab), size=n))
            for n in rng.randint(1, 60, size=25)
        ] + ["", "ein", "zwei zwei zwei"]
        assert simhash64_batch(texts) == [simhash64(t) for t in texts]
        assert simhash64_batch([]) == []

    def test_jaccard(self):
        assert jaccard(["a b c"], ["a b c"]) == 1.0
        assert jaccard(["a b c"], ["x y z"]) == 0.0


@pytest.fixture(scope="module")
def dup_docs_ds(ray_session):
    import ray.data

    base = "der alte turm steht am fluss unter dem hohen berg " * 4
    texts = [
        base.strip(),                                # 0
        base.strip(),                                # 1: exact dup of 0
        (base + "neuer satz am ende").strip(),       # 2: near dup of 0
        "völlig anderes dokument über bücher und seiten hier drüben",  # 3
        "noch ein ganz eigenes dokument ohne überlappung dabei jetzt",  # 4
    ]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return ray.data.from_arrow(tbl)


class TestDedupDistributed:
    def test_exact_dedup_groups(self, dup_docs_ds):
        from ocr_pipeline_ray.stages.dedup import exact_dedup_summary

        rows = exact_dedup_summary(dup_docs_ds).take_all()
        assert len(rows) == 4  # 5 docs, one exact-dup collapses
        by_n = sorted(r["n_dups"] for r in rows)
        assert by_n == [1, 1, 1, 2]
        dup_group = [r for r in rows if r["n_dups"] == 2][0]
        assert dup_group["keep_id"] == 0  # first wins

    @pytest.mark.parametrize("n_blocks", [1, 3, 7])
    def test_dedup_first_keeps_min_order_row(self, ray_session, n_blocks):
        """Bucketed first-per-key == naive per-key winner, across
        block layouts (the shuffle must not change the winner)."""
        import ray.data

        from ocr_pipeline_ray.stages.dedup import dedup_first

        rng = np.random.RandomState(11)
        n = 200
        keys = [f"k{rng.randint(0, 37)}" for _ in range(n)]
        order = rng.permutation(n).astype(np.int64)
        payload = [f"row-{i}" for i in range(n)]
        tbl = pa.table({
            "url": pa.array(keys, pa.string()),
            "warc_ts": pa.array(order, pa.int64()),
            "payload": pa.array(payload, pa.string()),
        })
        expected = {}
        for k, o, p in zip(keys, order, payload):
            if k not in expected or o < expected[k][0]:
                expected[k] = (int(o), p)
        ds = ray.data.from_arrow(tbl).repartition(n_blocks)
        rows = dedup_first(ds, key_col="url", order_col="warc_ts",
                           n_buckets=8).take_all()
        got = {r["url"]: (r["warc_ts"], r["payload"]) for r in rows}
        assert got == expected
        assert all("_kbucket" not in r for r in rows)

    def test_dedup_first_multi_order_cols(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import dedup_first

        tbl = pa.table({
            "url": pa.array(["a", "a", "a", "b"], pa.string()),
            "warc_ts": pa.array([5, 5, 5, 1], pa.int64()),
            "doc_id": pa.array([30, 10, 20, 7], pa.int64()),
        })
        rows = dedup_first(ray.data.from_arrow(tbl), key_col="url",
                           order_col=["warc_ts", "doc_id"]).take_all()
        got = {r["url"]: r["doc_id"] for r in rows}
        assert got == {"a": 10, "b": 7}

    def test_minhash_pairs_find_near_dups(self, dup_docs_ds):
        from ocr_pipeline_ray.stages.dedup import minhash_dup_pairs

        pairs = {(r["d1"], r["d2"]) for r in minhash_dup_pairs(dup_docs_ds).take_all()}
        assert (0, 1) in pairs  # exact dup
        assert (0, 2) in pairs  # near dup
        assert (3, 4) not in pairs  # unrelated

    def test_jaccard_verification(self, dup_docs_ds):
        from ocr_pipeline_ray.stages.dedup import jaccard_dup_pairs

        rows = jaccard_dup_pairs(dup_docs_ds, threshold=0.5).take_all()
        verified = {(r["d1"], r["d2"]): r["jaccard"] for r in rows}
        assert verified[(0, 1)] == 1.0
        assert (0, 2) in verified

    def test_dedup_first_by_key(self, ray_session):
        import ray.data

        tbl = pa.table({
            "url": pa.array(["u1", "u1", "u2"], pa.string()),
            "warc_ts": pa.array([20, 10, 5], pa.int64()),
            "payload": pa.array(["later", "earlier", "only"], pa.string()),
        })
        from ocr_pipeline_ray.stages.dedup import dedup_first

        rows = sorted(
            dedup_first(ray.data.from_arrow(tbl)).take_all(),
            key=lambda r: r["url"],
        )
        assert [(r["url"], r["payload"]) for r in rows] == [
            ("u1", "earlier"), ("u2", "only"),
        ]


class TestSimilarity:
    @pytest.fixture(scope="class")
    def emb_ds(self, ray_session):
        import ray.data

        rng = np.random.default_rng(7)
        mat = rng.standard_normal((40, 16))
        mat[5] = mat[0] + 0.01 * rng.standard_normal(16)  # near dup of 0
        tbl = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in mat], pa.list_(pa.float32())
            ),
        })
        return ray.data.from_arrow(tbl), mat

    def test_brute_force_topk(self, emb_ds):
        from ocr_pipeline_ray.stages.similarity import brute_force_topk

        ds, mat = emb_ds
        q = mat[0].tolist()
        rows = brute_force_topk(ds, q, k=5, exclude_id=0).take_all()
        assert len(rows) == 5
        assert rows[0]["vec_id"] == 5  # the planted near-dup ranks first
        sims = [r["sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)

    def test_lsh_topk_recalls_planted_neighbor(self, emb_ds):
        from ocr_pipeline_ray.stages.similarity import lsh_bucketed_topk

        ds, mat = emb_ds
        rows = lsh_bucketed_topk(
            ds, mat[0].tolist(), k=5, exclude_id=0, probes=3
        ).take_all()
        assert rows and rows[0]["vec_id"] == 5

    def test_near_dup_pairs(self, emb_ds):
        from ocr_pipeline_ray.stages.similarity import embedding_near_dup_pairs

        ds, _ = emb_ds
        pairs = {(r["v1"], r["v2"])
                 for r in embedding_near_dup_pairs(ds, 0.95).take_all()}
        assert pairs == {(0, 5)}

    def test_near_dup_block_pair_join_is_exact(self, ray_session):
        """The distributed block-pair join finds EVERY pair regardless
        of block layout — compared against a numpy all-pairs oracle."""
        import ray.data

        from ocr_pipeline_ray.stages.similarity import embedding_near_dup_pairs

        rng = np.random.default_rng(11)
        mat = rng.standard_normal((60, 12))
        # plant near-dups crossing block boundaries
        for src, dst in [(0, 59), (7, 31), (20, 21), (3, 45)]:
            mat[dst] = mat[src] + 0.005 * rng.standard_normal(12)
        norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = norm @ norm.T
        expected = {
            (i, j)
            for i in range(60) for j in range(i + 1, 60)
            if sims[i, j] > 0.9
        }
        assert len(expected) >= 4
        tbl = pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat],
                                  pa.list_(pa.float64())),
        })
        ds = ray.data.from_arrow(tbl).repartition(8)
        got = {(r["v1"], r["v2"])
               for r in embedding_near_dup_pairs(ds, 0.9, max_blocks=5).take_all()}
        assert got == expected

    def test_bucketed_near_dup_subset_of_exact(self, ray_session):
        """LSH-bucketed pairs: finds identical vectors (same signature
        by construction), never reports a false positive."""
        import ray.data

        from ocr_pipeline_ray.stages.similarity import (
            bucketed_near_dup_pairs,
            embedding_near_dup_pairs,
        )

        rng = np.random.default_rng(3)
        mat = rng.standard_normal((50, 10))
        mat[10] = mat[2]            # identical → same bucket, sim 1.0
        mat[33] = mat[4] * 2.0      # scaled copy → same direction
        tbl = pa.table({
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([r.tolist() for r in mat],
                                  pa.list_(pa.float64())),
        })
        ds = ray.data.from_arrow(tbl)
        exact = {(r["v1"], r["v2"])
                 for r in embedding_near_dup_pairs(ds, 0.99).take_all()}
        approx = {(r["v1"], r["v2"])
                  for r in bucketed_near_dup_pairs(ds, 0.99).take_all()}
        assert {(2, 10), (4, 33)} <= approx
        assert approx <= exact  # no false positives


class TestJaccardJoinStrategies:
    def test_broadcast_and_shuffle_agree(self, ray_session):
        """The broadcast hash-join and the bucketed shuffle join are
        two physical plans of the SAME operator — identical results
        on a seeded corpus with planted near-dups."""
        import random

        import ray.data

        from ocr_pipeline_ray.stages.dedup import jaccard_dup_pairs

        rng = random.Random(99)
        vocab = [f"w{i}" for i in range(60)]
        base = [rng.choice(vocab) for _ in range(40)]
        texts = []
        for i in range(30):
            words = list(base)
            for _ in range(i % 7):  # increasing edit distance
                words[rng.randrange(len(words))] = rng.choice(vocab)
            texts.append(" ".join(words))
        texts += [" ".join(rng.choice(vocab) for _ in range(40))
                  for _ in range(10)]
        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        ds = ray.data.from_arrow(tbl)
        results = {}
        for join in ("broadcast", "shuffle"):
            rows = jaccard_dup_pairs(ds, threshold=0.5, join=join).take_all()
            results[join] = sorted(
                (r["d1"], r["d2"], r["jaccard"]) for r in rows
            )
        assert results["broadcast"] == results["shuffle"]
        assert len(results["broadcast"]) > 5  # planted dups found

    def test_bad_join_arg(self, ray_session):
        import pytest
        import ray.data

        from ocr_pipeline_ray.stages.dedup import jaccard_dup_pairs

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["x"], pa.string()),
        }))
        with pytest.raises(ValueError, match="broadcast|shuffle"):
            jaccard_dup_pairs(ds, join="nope")


class TestBucketTelemetry:
    def test_minhash_bucket_stats(self, dup_docs_ds):
        """Cap telemetry matches a by-hand recomputation from the
        band-exploded signature table (no silent truncation)."""
        from collections import Counter

        from ocr_pipeline_ray.stages.dedup import (
            minhash_bucket_stats,
            minhash_signatures,
        )

        sigs = minhash_signatures(dup_docs_ds).take_all()
        sizes = Counter()
        for row in sigs:
            for i in range(4):
                if row[f"h{i}"] is not None:
                    sizes[f"{i}:{row[f'h{i}']}"] += 1
        for cap in (1, 2, 1000):
            got = minhash_bucket_stats(dup_docs_ds, max_bucket=cap).to_pylist()[0]
            assert got["n_buckets"] == len(sizes)
            assert got["n_hot_buckets"] == sum(1 for n in sizes.values() if n > cap)
            assert got["max_bucket_size"] == max(sizes.values())
            assert got["dropped_ids"] == sum(max(0, n - cap) for n in sizes.values())

    def test_bucketed_near_dup_cap_deterministic(self, ray_session):
        """max_bucket truncation keeps the SMALLEST ids (sorted before
        slice), so drops are run-independent, and near_dup_bucket_stats
        measures exactly what the cap drops (ADVICE: the slice used to
        depend on shuffle order)."""
        import ray.data

        from ocr_pipeline_ray.stages.similarity import (
            bucketed_near_dup_pairs,
            near_dup_bucket_stats,
        )

        # 6 identical unit vectors → one signature bucket of size 6
        vecs = [[1.0, 0.0, 0.0, 0.0]] * 6
        tbl = pa.table({
            "vec_id": pa.array([9, 3, 7, 1, 5, 2], pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float64())),
        })
        for layout in (1, 3):
            ds = ray.data.from_arrow(tbl).repartition(layout)
            pairs = {
                (r["v1"], r["v2"])
                for r in bucketed_near_dup_pairs(
                    ds, threshold=0.9, max_bucket=3
                ).take_all()
            }
            # smallest three ids {1,2,3} survive the cap, every run
            assert pairs == {(1, 2), (1, 3), (2, 3)}
            stats = near_dup_bucket_stats(ds, max_bucket=3).to_pylist()[0]
            assert stats["n_buckets"] == 1
            assert stats["n_hot_buckets"] == 1
            assert stats["max_bucket_size"] == 6
            assert stats["dropped_ids"] == 3

    def test_ivf_topk_subset_of_exact(self, ray_session):
        """IVF results ⊆ exact top-k universe with correct sims; a
        full probe (nprobe = n_centroids) recovers the exact top-k."""
        import ray.data

        from ocr_pipeline_ray.stages.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        rng = np.random.RandomState(9)
        # three well-separated clusters so the quantizer is meaningful
        centers = np.array([[10, 0, 0, 0], [0, 10, 0, 0], [0, 0, 10, 0]],
                           dtype=float)
        mat = np.vstack([
            centers[i % 3] + rng.randn(4) * 0.5 for i in range(90)
        ])
        tbl = pa.table({
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
        })
        ds = ray.data.from_arrow(tbl)
        q = mat[0].tolist()
        exact = {(r["vec_id"], r["sim"])
                 for r in brute_force_topk(ds, q, k=10,
                                           exclude_id=0).take_all()}
        approx = {(r["vec_id"], r["sim"])
                  for r in ivf_topk(ds, q, k=10, n_centroids=6, nprobe=2,
                                    exclude_id=0).take_all()}
        # sims must agree exactly for any id found by both paths
        exact_by_id = dict(exact)
        for vid, sim in approx:
            assert exact_by_id.get(vid, sim) == sim
        # probing every list degenerates to the exact scan
        full = {(r["vec_id"], r["sim"])
                for r in ivf_topk(ds, q, k=10, n_centroids=6, nprobe=6,
                                  exclude_id=0).take_all()}
        assert full == exact
        # with clustered data, 2 probes should still find most of top-10
        assert len({v for v, _ in approx} & {v for v, _ in exact}) >= 7

    def test_embedding_lsh_recall_counts(self, ray_session):
        """Recall telemetry: exact twin vs LSH path, one row, and the
        LSH pair set is a subset of the exact set."""
        import ray.data

        from ocr_pipeline_ray.stages.similarity import embedding_lsh_recall

        rng = np.random.RandomState(5)
        base = rng.randn(20, 8)
        # 5 near-dup twins of the first 5 vectors
        twins = base[:5] + rng.randn(5, 8) * 0.01
        mat = np.vstack([base, twins])
        tbl = pa.table({
            "vec_id": pa.array(range(len(mat)), pa.int64()),
            "embedding": pa.array(mat.tolist(), pa.list_(pa.float64())),
        })
        ds = ray.data.from_arrow(tbl)
        row = embedding_lsh_recall(ds, threshold=0.95).to_pylist()[0]
        assert row["n_exact"] >= 5
        assert 0 <= row["n_lsh"] <= row["n_exact"]
        assert row["n_common"] == row["n_lsh"]  # subset property
        assert 0.0 <= row["recall"] <= 1.0

    def test_jaccard_all_pairs_exact(self, dup_docs_ds):
        """Block-pair all-pairs Jaccard finds the known dups with the
        same scores as the scalar jaccard()."""
        from ocr_pipeline_ray.stages.dedup import jaccard_all_pairs

        rows = jaccard_all_pairs(dup_docs_ds, threshold=0.5).take_all()
        got = {(r["d1"], r["d2"]): r["jaccard"] for r in rows}
        assert (0, 1) in got and got[(0, 1)] == 1.0  # exact dup
        assert (0, 2) in got and 0.5 <= got[(0, 2)] < 1.0  # near dup
        assert (1, 2) in got
        assert all(k in {(0, 1), (0, 2), (1, 2)} for k in got)

    def test_block_pair_ops_survive_empty_blocks(self, ray_session):
        """Zero-row blocks (from aggressive repartition) must not
        crash the block-pair joins (regression: empty blocks carry an
        empty schema and KeyError'd the pair tasks)."""
        import ray.data

        from ocr_pipeline_ray.stages.dedup import jaccard_all_pairs
        from ocr_pipeline_ray.stages.similarity import (
            embedding_near_dup_pairs,
        )

        docs = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(
                ["der alte turm steht am fluss"] * 2, pa.string()
            ),
        })
        rows = jaccard_all_pairs(
            ray.data.from_arrow(docs).repartition(5)
        ).take_all()
        assert {(r["d1"], r["d2"]) for r in rows} == {(0, 1)}
        vecs = pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 0.0]] * 2,
                                  pa.list_(pa.float64())),
        })
        pairs = embedding_near_dup_pairs(
            ray.data.from_arrow(vecs).repartition(5), threshold=0.9
        ).take_all()
        assert {(r["v1"], r["v2"]) for r in pairs} == {(0, 1)}

    def test_jaccard_all_pairs_excludes_empty_shingle_docs(
        self, ray_session
    ):
        """Two sub-k-token docs (empty shingle sets) are NOT emitted
        as jaccard=1.0 'true dups' — matching the lsh_recall oracle
        (SQL 0/0 → NULL drops the pair) and the LSH path, which can
        never propose them (their bands are NULL)."""
        import ray.data

        from ocr_pipeline_ray.stages.dedup import jaccard_all_pairs

        docs = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["kurz", "klein", "winzig"], pa.string()),
        })
        assert jaccard_all_pairs(ray.data.from_arrow(docs)).take_all() == []

    def test_from_matrix_degenerate(self):
        from ocr_pipeline_ray.stages.similarity import _from_matrix

        assert _from_matrix(np.empty((0, 0))).to_pylist() == []
        assert _from_matrix(np.empty((0, 4))).to_pylist() == []
        assert _from_matrix(np.ones((2, 0))).to_pylist() == [[], []]

    def test_jaccard_no_candidates_schema(self, ray_session):
        """Empty candidate set still yields the (d1,d2,jaccard) schema."""
        import ray.data

        from ocr_pipeline_ray.stages.dedup import jaccard_dup_pairs

        tbl = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["kurz", "klein"], pa.string()),  # no shingles
        })
        ds = ray.data.from_arrow(tbl)
        out = jaccard_dup_pairs(ds)
        schema = out.schema()
        assert schema.names == ["d1", "d2", "jaccard"]
        assert out.take_all() == []


class TestMultimodal:
    def test_media_feature_stage(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.multimodal import (
            MEDIA_SCHEMA,
            media_feature_stage,
        )

        tbl = pa.table({
            "media_id": pa.array(["m0", "m1", "m2"], pa.string()),
            "kind": pa.array(["image", "audio", "image"], pa.string()),
            "payload": pa.array([b"\x89PNG fake", b"RIFF fake", b""], pa.binary()),
            "mime": pa.array(["image/png", "audio/wav", "image/png"], pa.string()),
            "width": pa.array([100, -1, 10], pa.int32()),
            "height": pa.array([80, -1, 10], pa.int32()),
            "duration_ms": pa.array([-1, 1200, -1], pa.int32()),
        }, schema=MEDIA_SCHEMA)
        rows = media_feature_stage(
            ray.data.from_arrow(tbl), concurrency=(1, 2), batch_size=2
        ).take_all()
        assert len(rows) == 3
        by_id = {r["media_id"]: r for r in rows}
        assert len(by_id["m0"]["features"]) == 16
        assert by_id["m2"]["decode_error"] == "empty payload"
        assert by_id["m0"]["payload_bytes"] == 9
        # deterministic features
        assert by_id["m0"]["features"] == by_id["m0"]["features"]

    def test_pgm_round_trip(self):
        from ocr_pipeline_ray.stages.multimodal import decode_pnm, encode_pgm

        px = np.arange(12, dtype=np.uint8).reshape(3, 4)
        img = decode_pnm(encode_pgm(4, 3, px))
        assert (img["width"], img["height"], img["channels"]) == (4, 3, 1)
        assert (img["pixels"][:, :, 0] == px).all()
        # comment + whitespace tolerant header
        wonky = b"P5\n# a comment\n 4\t3\n255\n" + bytes(range(12))
        assert decode_pnm(wonky)["width"] == 4
        # PPM (P6): 2x1 RGB
        ppm = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 40, 50, 60])
        img = decode_pnm(ppm)
        assert img["channels"] == 3
        assert img["pixels"][0, 1].tolist() == [40, 50, 60]

    def test_pgm_malformed(self):
        from ocr_pipeline_ray.stages.multimodal import decode_pnm

        for bad in (b"\x89PNG fake", b"P5\n4 3\n255\n\x00\x00",
                    b"P5\nx y\n255\n", b"P5\n0 3\n255\n"):
            with pytest.raises(ValueError):
                decode_pnm(bad)

    def test_wav_round_trip(self):
        from ocr_pipeline_ray.stages.multimodal import decode_wav, encode_wav

        samples = np.array([0, 100, -100, 32000], dtype=np.int16)
        wav = decode_wav(encode_wav(samples, framerate=8000))
        assert wav["channels"] == 1
        assert wav["framerate"] == 8000
        assert wav["n_frames"] == 4
        assert wav["duration_ms"] == 0  # 4 frames @ 8 kHz < 1 ms
        assert (wav["samples"][:, 0] == samples).all()
        long = decode_wav(encode_wav(np.zeros(8000, dtype=np.int16)))
        assert long["duration_ms"] == 1000
        with pytest.raises(ValueError):
            decode_wav(b"RIFF fake")

    def test_real_decode_stage(self, ray_session):
        """Default (real) decoder reads dims/means from the BYTES;
        garbage and video rows get decode_error, never a crash."""
        import ray.data

        from ocr_pipeline_ray.stages.multimodal import (
            encode_pgm,
            encode_wav,
            encode_y4m,
            media_feature_stage,
        )

        tbl = pa.table({
            "media_id": pa.array(["img", "wav", "vid", "codec", "bad"],
                                 pa.string()),
            "kind": pa.array(["image", "audio", "video", "video",
                              "image"], pa.string()),
            "payload": pa.array([
                encode_pgm(6, 5, 42),
                encode_wav([7] * 1600, framerate=8000),
                encode_y4m(8, 6, 5, 99),
                b"not decodable video bytes",
                b"\x89PNG fake",
            ], pa.binary()),
        })
        rows = media_feature_stage(
            ray.data.from_arrow(tbl), concurrency=(1, 2), batch_size=2
        ).take_all()
        by_id = {r["media_id"]: r for r in rows}
        img = by_id["img"]
        assert (img["decoded_width"], img["decoded_height"]) == (6, 5)
        assert img["content_mean"] == 42.0
        assert img["decode_error"] is None
        wav = by_id["wav"]
        assert wav["decoded_duration_ms"] == 200
        assert wav["content_mean"] == 7.0
        vid = by_id["vid"]
        assert (vid["decoded_width"], vid["decoded_height"]) == (8, 6)
        assert vid["decoded_duration_ms"] == 200  # 5 frames @ 25 fps
        assert vid["content_mean"] == 99.0
        assert vid["decode_error"] is None
        assert "YUV4MPEG2" in by_id["codec"]["decode_error"]
        assert "PNM" in by_id["bad"]["decode_error"]
        assert all(len(r["features"]) == 16 for r in rows)

    def test_y4m_round_trip(self):
        from ocr_pipeline_ray.stages.multimodal import (
            decode_y4m,
            encode_y4m,
        )

        vid = decode_y4m(encode_y4m(12, 8, 3, 200, fps=(30, 1)))
        assert (vid["width"], vid["height"]) == (12, 8)
        assert vid["n_frames"] == 3
        assert vid["duration_ms"] == 100
        assert vid["luma_mean"] == 200.0
        # frame params after FRAME are tolerated; mono colorspace
        mono = (b"YUV4MPEG2 W4 H2 F1:1 Cmono\n"
                b"FRAME Xsome=param\n" + bytes([10] * 8))
        v = decode_y4m(mono)
        assert v["n_frames"] == 1 and v["luma_mean"] == 10.0
        for bad in (
            b"RIFF not video",
            b"YUV4MPEG2 W0 H2 F1:1\nFRAME\n",
            b"YUV4MPEG2 W4 H2 F1:1 C420\nFRAME\n\x00\x00",  # truncated
            b"YUV4MPEG2 W4 H2 F1:1 C999x\nFRAME\n" + bytes(12),
        ):
            with pytest.raises(ValueError):
                decode_y4m(bad)
        # extended-plane colorspaces are REJECTED with the specific
        # diagnostic, never prefix-misparsed as their base layout
        with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
            decode_y4m(
                b"YUV4MPEG2 W2 H2 F1:1 C444alpha\nFRAME\n" + bytes(16)
            )
        with pytest.raises(ValueError):
            encode_y4m(5, 4, 1, 0)  # odd width under 4:2:0

    def test_resize_plan(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ocr_pipeline_ray.stages.multimodal import resize_plan_fn

        tbl = pa.table({
            "media_id": pa.array(["a", "b", "c"], pa.string()),
            "width": pa.array([1024, 256, -1], pa.int32()),
            "height": pa.array([768, 512, -1], pa.int32()),
        })
        rows = (
            ray.data.from_arrow(tbl)
            .map_batches(resize_plan_fn, batch_format="pyarrow")
            .take_all()
        )
        by_id = {r["media_id"]: r for r in rows}
        assert (by_id["a"]["target_width"], by_id["a"]["target_height"]) == (512, 384)
        assert (by_id["b"]["target_width"], by_id["b"]["target_height"]) == (256, 512)
        assert by_id["c"]["target_width"] == -1

    def test_frame_sample_plan(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ocr_pipeline_ray.stages.multimodal import frame_sample_fn

        tbl = pa.table({
            "media_id": pa.array(["v1", "v2", "img"], pa.string()),
            "kind": pa.array(["video", "video", "image"], pa.string()),
            "duration_ms": pa.array([5000, 500000, -1], pa.int32()),
        })
        rows = (
            ray.data.from_arrow(tbl)
            .map_batches(frame_sample_fn, batch_format="pyarrow")
            .take_all()
        )
        by_id = {r["media_id"]: r for r in rows}
        assert by_id["v1"]["frame_times_ms"] == [0, 1000, 2000, 3000, 4000, 5000]
        assert len(by_id["v2"]["frame_times_ms"]) == 32  # cap binds, re-spaced
        assert by_id["img"]["frame_times_ms"] == []


class TestBloomIncremental:
    def _fps(self, texts, with_id=True):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import fingerprint_fn

        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        fp = fingerprint_fn(tbl)
        cols = ["doc_id", "fp"] if with_id else ["fp"]
        return ray.data.from_arrow(fp.select(cols)).repartition(3)

    def test_bit_indices_match_int_parse(self):
        import hashlib

        import numpy as np

        from ocr_pipeline_ray.stages.dedup import _fp_bit_indices

        fps = [hashlib.md5(str(i).encode()).hexdigest()
               for i in range(50)]
        got = _fp_bit_indices(pa.array(fps, pa.string()), 1 << 20)
        expect = np.array([
            [int(fp[8 * i:8 * i + 8], 16) % (1 << 20) for i in range(4)]
            for fp in fps
        ])
        assert (got == expect).all()

    def test_exact_even_with_false_positives(self, ray_session):
        """A deliberately tiny bitmap (64 bits) forces Bloom false
        positives on the old side — the exact anti join must still
        produce exactly the true-new rows."""
        from ocr_pipeline_ray.stages.dedup import incremental_dedup_bloom

        new_texts = [f"new doc {i}" for i in range(20)] + ["shared a",
                                                           "shared b"]
        old_texts = [f"old doc {i}" for i in range(40)] + ["shared a",
                                                           "shared b"]
        out = incremental_dedup_bloom(
            self._fps(new_texts), self._fps(old_texts, with_id=False),
            n_bits=64, n_buckets=4,
        ).take_all()
        assert sorted(r["doc_id"] for r in out) == list(range(20))

    def test_empty_sides(self, ray_session):
        from ocr_pipeline_ray.stages.dedup import incremental_dedup_bloom

        # empty new side -> nothing survives
        out = incremental_dedup_bloom(
            self._fps([]), self._fps(["x"], with_id=False), n_bits=64
        ).take_all()
        assert out == []
        # empty old side -> everything survives
        out = incremental_dedup_bloom(
            self._fps(["x", "y"]), self._fps([], with_id=False),
            n_bits=64,
        ).take_all()
        assert sorted(r["doc_id"] for r in out) == [0, 1]


class TestParagraphDedup:
    def _run(self, texts, n_blocks=3, n_buckets=4):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import paragraph_dedup

        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        out = paragraph_dedup(
            ray.data.from_arrow(tbl).repartition(n_blocks),
            n_buckets=n_buckets,
        ).take_all()
        return {r["doc_id"]: (r["text_dedup"], r["n_kept"])
                for r in out}

    def test_first_wins_and_reassembly(self, ray_session):
        got = self._run([
            "A\n\nB\n\nC",   # all first occurrences
            "B\n\nD",        # B dup -> D only
            "A\n\nB",        # fully duplicate -> doc dropped
            "E\n\nE",        # intra-doc dup -> one E
        ])
        assert got == {
            0: ("A\n\nB\n\nC", 3),
            1: ("D", 1),
            3: ("E", 1),
        }

    def test_null_and_empty_docs(self, ray_session):
        got = self._run([None, "", "X"])
        # null->'' and '' both explode to the single empty paragraph;
        # the first (doc 0) wins, doc 1 disappears
        assert got == {0: ("", 1), 2: ("X", 1)}

    @pytest.mark.parametrize("n_blocks", [1, 7])
    def test_block_layout_invariant(self, ray_session, n_blocks):
        rng = random.Random(11)
        pool = [f"para {i}" for i in range(12)]
        texts = [
            "\n\n".join(rng.choice(pool)
                        for _ in range(rng.randrange(1, 5)))
            for _ in range(40)
        ]
        base = self._run(texts, n_blocks=3, n_buckets=4)
        other = self._run(texts, n_blocks=n_blocks, n_buckets=8)
        assert base == other
        # global invariant: every distinct paragraph survives exactly once
        total_kept = sum(k for _, k in base.values())
        distinct = len({p for t in texts for p in t.split("\n\n")})
        assert total_kept == distinct


class TestGroupCap:
    def _tbl(self):
        import numpy as np

        rng = np.random.default_rng(13)
        keys = rng.integers(0, 9, 120)
        return pa.table({
            "k": pa.array([f"h{x}" for x in keys], pa.string()),
            "o": pa.array(rng.permutation(120).astype("int64")),
            "payload": pa.array(range(120), pa.int64()),
        })

    @pytest.mark.parametrize("layout", [1, 5])
    def test_keeps_k_smallest_per_key(self, ray_session, layout):
        from collections import defaultdict

        import ray.data

        from ocr_pipeline_ray.stages.dedup import group_cap

        tbl = self._tbl()
        got = group_cap(
            ray.data.from_arrow(tbl).repartition(layout),
            key_col="k", order_col="o", k=3, n_buckets=8,
        ).take_all()
        expect = defaultdict(list)
        for k, o in zip(tbl.column("k").to_pylist(),
                        tbl.column("o").to_pylist()):
            expect[k].append(o)
        want = {k: sorted(v)[:3] for k, v in expect.items()}
        seen = defaultdict(list)
        for r in got:
            seen[r["k"]].append(r["o"])
        assert {k: sorted(v) for k, v in seen.items()} == want

    def test_k1_equals_dedup_first(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import dedup_first, group_cap

        tbl = self._tbl()
        a = group_cap(ray.data.from_arrow(tbl), key_col="k",
                      order_col=["o", "payload"], k=1).take_all()
        b = dedup_first(ray.data.from_arrow(tbl), key_col="k",
                        order_col=["o", "payload"]).take_all()
        key = lambda r: (r["k"], r["o"], r["payload"])
        assert sorted(map(key, a)) == sorted(map(key, b))

    def test_cap_larger_than_group_keeps_all(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import group_cap

        tbl = self._tbl()
        got = group_cap(ray.data.from_arrow(tbl), key_col="k",
                        order_col="o", k=1000).take_all()
        assert len(got) == tbl.num_rows


class TestSubstringDedup:
    """ExactSubstr-style duplicate-span removal (token granularity)."""

    ROWS = [
        (1, "a b c d e f g h"),             # shares "a b c d e" w/ 2
        (2, "x a b c d e y z"),
        (3, None),                          # NULL stays NULL
        (4, ""),                            # single '' token, kept
        (5, "p q r"),                       # shorter than w: untouched
        (6, "a b c d e a b c d e"),         # internal repeat: all gone
        (7, "unique tokens only here now"),
    ]

    def _ds(self):
        import pyarrow as pa
        import ray.data

        tbl = pa.table({
            "doc_id": pa.array([r[0] for r in self.ROWS], pa.int64()),
            "text": pa.array([r[1] for r in self.ROWS], pa.string()),
        })
        return ray.data.from_arrow(tbl)

    def test_spans_removed(self, ray_session):
        from ocr_pipeline_ray.stages.dedup import substring_dedup

        got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
               for r in substring_dedup(self._ds(), w=5,
                                        n_buckets=4).take_all()}
        assert got == {
            1: ("f g h", 5),
            2: ("x y z", 5),
            3: (None, 0),
            4: ("", 0),
            5: ("p q r", 0),
            6: ("", 10),
            7: ("unique tokens only here now", 0),
        }

    def test_no_duplicates_is_identity(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ocr_pipeline_ray.stages.dedup import substring_dedup

        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["one two three four five six",
                              "seven eight nine ten eleven twelve"]),
        })
        got = substring_dedup(ray.data.from_arrow(tbl), w=5,
                              n_buckets=4).sort("doc_id").take_all()
        assert [r["clean_text"] for r in got] == [
            "one two three four five six",
            "seven eight nine ten eleven twelve"]
        assert [r["n_removed"] for r in got] == [0, 0]

    def test_overlapping_windows_merge_coverage(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ocr_pipeline_ray.stages.dedup import substring_dedup

        # docs share a 6-token run -> two overlapping dup 5-windows
        # in each; coverage merges to the full 6 tokens
        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["k l m n o p QQ", "RR k l m n o p"]),
        })
        got = substring_dedup(ray.data.from_arrow(tbl), w=5,
                              n_buckets=4).sort("doc_id").take_all()
        assert [(r["clean_text"], r["n_removed"]) for r in got] == [
            ("QQ", 6), ("RR", 6)]

    def test_w_validation(self, ray_session):
        import pyarrow as pa

        import pytest as _pytest

        from ocr_pipeline_ray.stages.dedup import window_gram_rows_fn

        tbl = pa.table({"doc_id": pa.array([1], pa.int64()),
                        "text": pa.array(["a b"], pa.string())})
        with _pytest.raises(ValueError):
            window_gram_rows_fn(tbl, w=1)


class TestMinhashCrossPairs:
    def _docs(self):
        import pyarrow as pa

        texts = {
            0: "the quick brown fox jumps over the lazy dog today",
            1: "the quick brown fox jumps over the lazy dog today",
            2: "completely different words live in this sentence here",
            3: "completely different words live in this sentence here",
            4: "another unrelated document about graph algorithms",
            5: "the quick brown fox jumps over the lazy dog tonight",
        }
        return pa.table({
            "doc_id": pa.array(sorted(texts), pa.int64()),
            "text": pa.array([texts[i] for i in sorted(texts)],
                             pa.string()),
        })

    def test_cross_only_and_matches_full_pairs(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import (
            minhash_cross_pairs,
            minhash_dup_pairs,
        )

        tbl = self._docs()
        ds = ray.data.from_arrow(tbl).repartition(3)
        new = ds.filter(lambda r: r["doc_id"] % 2 == 1)
        old = ds.filter(lambda r: r["doc_id"] % 2 == 0)
        got = {(r["d_new"], r["d_old"])
               for r in minhash_cross_pairs(new, old).take_all()}
        # ground truth: full self-pair set restricted to odd×even
        full = {(r["d1"], r["d2"])
                for r in minhash_dup_pairs(ds).take_all()}
        want = {(b, a) if b % 2 == 1 else (a, b)
                for a, b in full if (a % 2) != (b % 2)}
        assert got == want
        assert all(n % 2 == 1 and o % 2 == 0 for n, o in got)
        assert (1, 0) in got  # identical texts across sides

    def test_precomputed_corpus_signatures(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import (
            minhash_cross_pairs,
            minhash_signatures,
        )

        tbl = self._docs()
        ds = ray.data.from_arrow(tbl)
        new = ds.filter(lambda r: r["doc_id"] % 2 == 1)
        old = ds.filter(lambda r: r["doc_id"] % 2 == 0)
        old_sigs = minhash_signatures(old).materialize()
        a = sorted(map(tuple, minhash_cross_pairs(new, old)
                       .to_pandas().values.tolist()))
        b = sorted(map(tuple, minhash_cross_pairs(new, old_sigs)
                       .to_pandas().values.tolist()))
        assert a == b and len(a) > 0


class TestContainmentMetric:
    def test_quote_scores_one_where_jaccard_small(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import jaccard_dup_pairs

        quote = "alpha beta gamma delta epsilon zeta"
        long_doc = quote + " " + " ".join(f"w{i}" for i in range(60))
        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([quote, long_doc], pa.string()),
        })
        ds = ray.data.from_arrow(tbl)
        cont = jaccard_dup_pairs(ds, threshold=0.9,
                                 metric="containment").to_pandas()
        # the quote is fully contained -> containment 1.0
        assert len(cont) == 1 and cont["containment"][0] == 1.0
        jac = jaccard_dup_pairs(ds, threshold=0.9).to_pandas()
        assert len(jac) == 0      # Jaccard ~4/64: far below 0.9

    def test_shuffle_strategy_equivalent(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.dedup import jaccard_dup_pairs

        quote = "alpha beta gamma delta epsilon zeta"
        long_doc = quote + " " + " ".join(f"w{i}" for i in range(60))
        tbl = pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([quote, long_doc], pa.string()),
        })
        ds = ray.data.from_arrow(tbl)
        a = jaccard_dup_pairs(ds, threshold=0.9, metric="containment",
                              join="broadcast").to_pandas()
        b = jaccard_dup_pairs(ds, threshold=0.9, metric="containment",
                              join="shuffle").to_pandas()
        assert a.values.tolist() == b.values.tolist()


class TestSemanticDedup:
    def _vecs(self):
        import numpy as np

        # two tight directions + noise vectors; ids interleaved
        rng = np.random.default_rng(5)
        base_a = np.array([1.0, 0.0, 0.0, 0.0])
        base_b = np.array([0.0, 1.0, 0.0, 0.0])
        rows = []
        for i in range(40):
            if i % 3 == 0:
                v = base_a + rng.normal(0, 0.01, 4)
            elif i % 3 == 1:
                v = base_b + rng.normal(0, 0.01, 4)
            else:
                v = rng.normal(0, 1, 4)
            rows.append((i, [float(x) for x in v]))
        return rows

    def test_keep_rule_matches_reference(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ocr_pipeline_ray.stages.kmeans import (
            _assign, kmeans_int, quantize_batch)
        from ocr_pipeline_ray.stages.similarity import semantic_dedup

        rows = self._vecs()
        tbl = pa.table({
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows],
                                  pa.list_(pa.float64())),
        })
        ds = ray.data.from_arrow(tbl)
        got = {r["vec_id"]: (r["cluster"], r["keep"])
               for r in semantic_dedup(
                   ds, k=4, iters=2, threshold=0.95,
                   scale=1_000_000).take_all()}

        # reference: same centroids -> same assignment, then the
        # keep-lowest-id rule per cluster on exact cosine
        _, cents = kmeans_int(ray.data.from_arrow(tbl), k=4, iters=2,
                              scale=1_000_000)
        q = quantize_batch(tbl.column("embedding"), 1_000_000)
        cl = _assign(q, cents)
        mat = np.array([r[1] for r in rows])
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        expect = {}
        for i, r in enumerate(rows):
            dup = any(
                cl[j] == cl[i] and rows[j][0] < r[0]
                and float(mat[i] @ mat[j]) > 0.95
                for j in range(len(rows)))
            expect[r[0]] = (int(cl[i]), not dup)
        assert got == expect
        # sanity: the tight directions actually deduplicate
        assert sum(1 for _, k in got.values() if not k) > 5

    def test_oversize_cluster_raises(self, ray_session):
        import pyarrow as pa
        import pytest
        import ray.data

        from ocr_pipeline_ray.stages.similarity import semantic_dedup

        tbl = pa.table({
            "vec_id": pa.array(list(range(30)), pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0]] * 30, pa.list_(pa.float64())),
        })
        with pytest.raises(Exception):
            semantic_dedup(ray.data.from_arrow(tbl), k=2, iters=1,
                           max_cluster=5).take_all()


class TestPrefixJaccardJoin:
    def _corpus(self):
        # near-dup pairs + heavy shared boilerplate + unique docs
        base = ("alpha beta gamma delta epsilon zeta eta theta iota "
                "kappa lam mu nu xi omicron pi rho sigma tau upsilon")
        boiler = "terms of service apply all rights reserved contact us"
        docs = []
        for i in range(20):
            if i % 4 == 0:
                docs.append(f"{base} {boiler}")
            elif i % 4 == 1:
                docs.append(f"{base} extra{i} {boiler}")
            elif i % 4 == 2:
                docs.append(f"doc {i} unique words here "
                            f"number{i} token{i} {boiler}")
            else:
                docs.append(f"totally different content {i} "
                            f"with its own vocabulary{i}")
        return docs

    def test_matches_exact_all_pairs(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ocr_pipeline_ray.stages.dedup import (
            jaccard_all_pairs, prefix_jaccard_pairs)

        docs = self._corpus()
        tbl = pa.table({
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        })
        ds = ray.data.from_arrow(tbl)
        got = sorted(
            (r["d1"], r["d2"], r["jaccard"])
            for r in prefix_jaccard_pairs(
                ds, threshold=0.8, n_buckets=8).take_all())
        expect = sorted(
            (r["d1"], r["d2"], r["jaccard"])
            for r in jaccard_all_pairs(
                ray.data.from_arrow(tbl),
                threshold=0.8).take_all())
        assert got == expect
        assert len(got) >= 10  # the %4∈{0,1} docs are mutual near-dups

    def test_layout_invariance(self, ray_session):
        import ray
        import pyarrow as pa
        import ray.data

        from ocr_pipeline_ray.stages.dedup import prefix_jaccard_pairs

        docs = self._corpus()
        tbl = pa.table({
            "doc_id": pa.array(list(range(len(docs))), pa.int64()),
            "text": pa.array(docs, pa.string()),
        })
        one = sorted(
            (r["d1"], r["d2"], r["jaccard"])
            for r in prefix_jaccard_pairs(
                ray.data.from_arrow(tbl), threshold=0.8,
                n_buckets=8).take_all())
        many = sorted(
            (r["d1"], r["d2"], r["jaccard"])
            for r in prefix_jaccard_pairs(
                ray.data.from_arrow_refs([
                    ray.put(tbl.slice(i, 3))
                    for i in range(0, tbl.num_rows, 3)]),
                threshold=0.8, n_buckets=8).take_all())
        assert one == many


class TestScalarQuantize:
    def test_codes_match_numpy_reference(self, ray_session):
        import numpy as np
        import ray
        from ocr_pipeline_ray.stages.similarity import scalar_quantize

        rng = np.random.RandomState(7)
        vecs = rng.uniform(-1, 1, size=(40, 6)).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(40), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        })
        out = scalar_quantize(
            ray.data.from_arrow(tbl).repartition(4)
        ).to_pandas().sort_values("vec_id").reset_index(drop=True)

        x = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
        mn, mx = x.min(axis=0), x.max(axis=0)
        rng_ = mx - mn
        expect = np.where(
            rng_ > 0, ((x - mn) * 510 + rng_) // (2 * rng_), 0)
        got = np.array([list(c) for c in out["codes"]])
        assert (got == expect).all()
        assert got.min() >= 0 and got.max() <= 255
        assert out["n_dims"].tolist() == [6] * 40

    def test_constant_dimension_codes_zero(self, ray_session):
        import numpy as np
        import ray
        from ocr_pipeline_ray.stages.similarity import scalar_quantize

        tbl = pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array(
                [[0.5, 0.1], [0.5, 0.9], [0.5, 0.4]],
                pa.list_(pa.float32())),
        })
        out = scalar_quantize(
            ray.data.from_arrow(tbl)).to_pandas().sort_values(
            "vec_id").reset_index(drop=True)
        codes = np.array([list(c) for c in out["codes"]])
        assert (codes[:, 0] == 0).all()
        assert codes[1, 1] == 255 and codes[0, 1] == 0


class TestHostBoilerplate:
    def _docs(self):
        # host A: 4 docs, NAV in all (removed), X in 2/4 (exactly half,
        # kept), uniques kept; host B: 2 docs sharing NAV text — but on
        # B it's 2/2 so removed there, independent of A
        rows = [
            (0, "A", "NAV<p>X<p>a0"),
            (1, "A", "NAV<p>X<p>a1"),
            (2, "A", "NAV<p>a2"),
            (3, "A", "NAV<p>a3"),
            (10, "B", "NAV<p>b0"),
            (11, "B", "NAV<p>b1"),
        ]
        return pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "host": pa.array([r[1] for r in rows], pa.string()),
            "text": pa.array([r[2] for r in rows], pa.string()),
        })

    def test_threshold_semantics(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.dedup import host_boilerplate_removal

        out = host_boilerplate_removal(
            ray.data.from_arrow(self._docs()).repartition(3), sep="<p>"
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["text_clean"].tolist() == [
            "X<p>a0", "X<p>a1", "a2", "a3", "b0", "b1"]
        assert out["n_kept"].tolist() == [2, 2, 1, 1, 1, 1]

    def test_doc_vanishes_when_all_template(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.dedup import host_boilerplate_removal

        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "host": pa.array(["A"] * 3, pa.string()),
            "text": pa.array(["NAV", "NAV", "NAV<p>u"], pa.string()),
        })
        out = host_boilerplate_removal(
            ray.data.from_arrow(tbl), sep="<p>"
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        assert out["doc_id"].tolist() == [2]
        assert out["text_clean"].tolist() == ["u"]

    def test_layout_independent(self, ray_session):
        import pandas.testing as pdt
        import ray
        from ocr_pipeline_ray.stages.dedup import host_boilerplate_removal

        ref = None
        for parts in (1, 2, 6):
            got = host_boilerplate_removal(
                ray.data.from_arrow(self._docs()).repartition(parts),
                sep="<p>", n_buckets=4,
            ).to_pandas().sort_values("doc_id").reset_index(drop=True)
            if ref is None:
                ref = got
            else:
                pdt.assert_frame_equal(ref, got)


class TestPqCodes:
    def test_codes_layout_independent_and_reconstruct(self, ray_session):
        import numpy as np
        import pandas.testing as pdt
        import ray
        from ocr_pipeline_ray.stages.kmeans import pq_codes

        rng = np.random.RandomState(3)
        vecs = rng.uniform(-1, 1, size=(60, 8)).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(60), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
        })
        ref = books_ref = None
        for parts in (1, 4):
            ds = ray.data.from_arrow(tbl).repartition(parts)
            codes, books = pq_codes(ds, m=2, k=3, iters=2)
            got = codes.to_pandas().sort_values("vec_id").reset_index(
                drop=True)
            if ref is None:
                ref, books_ref = got, books
            else:
                pdt.assert_frame_equal(ref, got)
                for a, b in zip(books_ref, books):
                    assert (a == b).all()
        assert set(ref.columns) == {"vec_id", "code_0", "code_1"}
        assert ref["code_0"].between(0, 2).all()
        assert ref["code_1"].between(0, 2).all()
        # codes must be the argmin against the returned codebooks
        x = np.floor(vecs.astype(np.float64) * 1e6).astype(np.int64)
        for j, book in enumerate(books_ref):
            sub = x[:, j * 4:(j + 1) * 4]
            d = ((sub[:, None, :] - book[None, :, :]) ** 2).sum(axis=2)
            assert (d.argmin(axis=1) == ref[f"code_{j}"].values).all()

    def test_dim_not_divisible_raises(self, ray_session):
        import numpy as np
        import pytest as _pytest
        import ray
        from ocr_pipeline_ray.stages.kmeans import pq_codes

        tbl = pa.table({
            "vec_id": pa.array(range(5), pa.int64()),
            "embedding": pa.array(
                [[0.1, 0.2, 0.3]] * 5, pa.list_(pa.float32())),
        })
        with _pytest.raises(ValueError):
            pq_codes(ray.data.from_arrow(tbl), m=2, k=2, iters=1)


class TestGroupCapDescending:
    def test_latest_k(self, ray_session):
        import ray
        from ocr_pipeline_ray.stages.dedup import group_cap

        tbl = pa.table({
            "url": pa.array(["a", "a", "a", "b"], pa.string()),
            "ts": pa.array([1, 3, 2, 9], pa.int64()),
        })
        out = group_cap(
            ray.data.from_arrow(tbl).repartition(2), key_col="url",
            order_col="ts", k=2, descending=True,
        ).to_pandas().sort_values(["url", "ts"]).reset_index(drop=True)
        assert list(map(tuple, out.itertuples(index=False))) == [
            ("a", 2), ("a", 3), ("b", 9)]


class TestSimhashNearPairs:
    def test_exact_vs_bruteforce(self, ray_session):
        import numpy as np
        import ray
        from ocr_pipeline_ray.stages.dedup import (
            simhash64_batch,
            simhash_near_pairs,
            _popcount64,
        )

        texts = [
            "alpha beta gamma delta epsilon",
            "alpha beta gamma delta zeta",      # near dup of 0
            "completely different words here",
            "alpha beta gamma delta epsilon",   # exact dup of 0
            "one two three four five six",
        ]
        tbl = pa.table({
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        for max_dist in (0, 3, 8):
            out = simhash_near_pairs(
                ray.data.from_arrow(tbl).repartition(3),
                max_dist=max_dist, n_buckets=4,
            ).to_pandas()
            got = sorted(map(tuple, out.itertuples(index=False)))
            h = np.array(simhash64_batch(texts), dtype=np.uint64)
            want = []
            for i in range(5):
                for j in range(i + 1, 5):
                    d = int(_popcount64(np.array([h[i] ^ h[j]]))[0])
                    if d <= max_dist:
                        want.append((i, j, d))
            assert got == sorted(want), max_dist
        # the exact-dup pair must appear at dist 0
        out0 = simhash_near_pairs(
            ray.data.from_arrow(tbl), max_dist=0).to_pandas()
        assert (0, 3, 0) in set(map(tuple, out0.itertuples(index=False)))

    def test_max_band_raises(self, ray_session):
        import pytest as _pytest
        import ray
        from ocr_pipeline_ray.stages.dedup import simhash_near_pairs

        tbl = pa.table({
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(["same text here"] * 6, pa.string()),
        })
        with _pytest.raises(Exception):
            simhash_near_pairs(
                ray.data.from_arrow(tbl), max_band=3,
            ).to_pandas()
