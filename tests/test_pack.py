"""Sequence packing: distributed prefix-sum vs a DuckDB window twin."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_tbl(seed=3, n=300, id_stride=7):
    rng = np.random.default_rng(seed)
    # non-contiguous, shuffled ids: packing order is BY ID, not by
    # input layout
    ids = (np.arange(n) * id_stride + 11).astype(np.int64)
    rng.shuffle(ids)
    toks = rng.integers(0, 900, n).astype(np.int64)
    toks[rng.integers(0, n, 5)] = 0  # zero-token docs keep position
    return pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(toks, pa.int64()),
    })


def _oracle(tbl, seq_len):
    import duckdb

    con = duckdb.connect()
    con.register("d", tbl)
    rows = con.execute(f"""
        WITH c AS (
          SELECT doc_id, n_tokens,
                 COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cum_before
          FROM d)
        SELECT doc_id, cum_before, cum_before // {seq_len},
               cum_before % {seq_len},
               CASE WHEN n_tokens = 0 THEN 0
                    ELSE (cum_before + n_tokens - 1) // {seq_len}
                         - cum_before // {seq_len} + 1 END
        FROM c ORDER BY doc_id
    """).fetchall()
    con.close()
    return rows


class TestSequencePacking:
    @pytest.mark.parametrize("layout", [1, 4])
    @pytest.mark.parametrize("band_size", [64, 8192])
    def test_matches_window_oracle(self, ray_session, layout, band_size):
        import ray.data

        from ocr_pipeline_ray.stages.pack import sequence_packing

        tbl = _docs_tbl()
        got = sequence_packing(
            ray.data.from_arrow(tbl).repartition(layout),
            seq_len=512, band_size=band_size, n_buckets=8,
        ).take_all()
        got_rows = sorted(
            (r["doc_id"], r["cum_before"], r["seq_id"],
             r["seq_offset"], r["n_windows"]) for r in got
        )
        assert got_rows == _oracle(tbl, 512)

    def test_stream_is_gapless(self, ray_session):
        """Window coordinates tile the token stream exactly."""
        import ray.data

        from ocr_pipeline_ray.stages.pack import sequence_packing

        tbl = _docs_tbl(seed=9)
        rows = sequence_packing(
            ray.data.from_arrow(tbl).repartition(3), seq_len=256,
            band_size=128, n_buckets=8,
        ).take_all()
        rows.sort(key=lambda r: r["doc_id"])
        expect = 0
        for r in rows:
            assert r["cum_before"] == expect
            assert r["seq_id"] * 256 + r["seq_offset"] == expect
            expect += r["n_tokens"]


class TestShuffleShards:
    """Deterministic hash-shuffle sharding."""

    def _ds(self, ray_session, ids, blocks=3):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64())})
        ).repartition(blocks)

    def test_layout_invariant_and_dense_positions(self, ray_session):
        from ocr_pipeline_ray.stages.pack import shuffle_shards

        ids = list(range(200))
        want = None
        for blocks in (1, 4, 9):
            rows = shuffle_shards(
                self._ds(ray_session, ids, blocks), n_shards=8
            ).take_all()
            got = sorted((r["doc_id"], r["shard_id"], r["shard_pos"])
                         for r in rows)
            if want is None:
                want = got
                # every shard's positions are dense 0..len-1
                by_shard = {}
                for _, s, p in got:
                    by_shard.setdefault(s, []).append(p)
                for s, ps in by_shard.items():
                    assert sorted(ps) == list(range(len(ps)))
                assert len(by_shard) == 8  # all shards populated
            assert got == want

    def test_hash_parity_with_dataset_split_rule(self, ray_session):
        """First-8-hex-md5 parity: shard of a known key."""
        import hashlib

        from ocr_pipeline_ray.stages.pack import shuffle_shards

        rows = shuffle_shards(
            self._ds(ray_session, [42], 1), n_shards=16).take_all()
        want = int(hashlib.md5(b"42").hexdigest()[:8], 16) % 16
        assert rows[0]["shard_id"] == want and rows[0]["shard_pos"] == 0

    def test_order_is_hash_not_id(self, ray_session):
        """Within a shard, consecutive ids must NOT stay consecutive
        (the point of the shuffle); order follows the hash."""
        import hashlib

        from ocr_pipeline_ray.stages.pack import shuffle_shards

        ids = list(range(100))
        rows = shuffle_shards(self._ds(ray_session, ids), n_shards=1
                              ).take_all()
        ordered = [r["doc_id"] for r in
                   sorted(rows, key=lambda r: r["shard_pos"])]
        assert ordered != sorted(ordered)
        hs = [int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
              for i in ordered]
        assert hs == sorted(hs)


class TestPackWindows:
    """Materialized packed windows."""

    def _docs(self, ray_session, texts, blocks=3):
        import pyarrow as pa
        import ray.data

        tbl = pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        return ray.data.from_arrow(tbl).repartition(blocks)

    def test_windows_reconstruct_global_stream(self, ray_session):
        import hashlib

        from ocr_pipeline_ray.stages.pack import pack_windows

        texts = ["a b c", "d e", None, "f", "g h i j k"]
        ds = self._docs(ray_session, texts)
        rows = sorted(pack_windows(ds, seq_len=4).take_all(),
                      key=lambda r: r["seq_id"])
        # global stream in doc_id order
        stream = [t for x in texts if x is not None
                  for t in x.split(" ")]
        want = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                for t in stream]
        got = [tok for r in rows for tok in r["tokens"]]
        assert got == want
        # fixed-length windows; only the last is partial
        assert [r["seq_id"] for r in rows] == list(range(len(rows)))
        assert [r["n_filled"] for r in rows][:-1] == [4] * (len(rows) - 1)
        assert rows[-1]["n_filled"] == len(stream) % 4 or 4
        assert all(len(r["tokens"]) == r["n_filled"] for r in rows)

    def test_layout_invariance(self, ray_session):
        from ocr_pipeline_ray.stages.pack import pack_windows

        texts = [f"tok{i} tok{i+1} tok{i*7%23}" for i in range(60)]
        want = None
        for blocks in (1, 5, 11):
            ds = self._docs(ray_session, texts, blocks)
            got = sorted(
                (r["seq_id"], r["n_filled"], tuple(r["tokens"]))
                for r in pack_windows(ds, seq_len=16).take_all())
            if want is None:
                want = got
            assert got == want

    def test_straddling_doc_spans_windows(self, ray_session):
        from ocr_pipeline_ray.stages.pack import pack_windows

        # one 10-token doc through seq_len=3 -> windows of 3/3/3/1
        ds = self._docs(ray_session, [" ".join(f"w{i}" for i in range(10))], 1)
        rows = sorted(pack_windows(ds, seq_len=3).take_all(),
                      key=lambda r: r["seq_id"])
        assert [r["n_filled"] for r in rows] == [3, 3, 3, 1]
