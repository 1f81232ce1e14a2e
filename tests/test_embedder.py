"""Embedding-inference actor-pool stage (stages/embedder.py)."""
import numpy as np
import pyarrow as pa

SF_001 = "/root/testdata/sf0.001"


def _embed_matrix(sf_dir):
    import ray.data

    from ocr_pipeline_ray.stages.embedder import embedding_inference_stage

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = embedding_inference_stage(docs, batch_size=64,
                                    concurrency=(1, 2))
    ids, rows = [], []
    for b in out.iter_batches(batch_format="pyarrow", batch_size=None):
        col = b.column("embedding").combine_chunks()
        rows.append(np.asarray(col.flatten()).reshape(len(col), 16))
        ids.extend(b.column("doc_id").to_pylist())
    return np.asarray(ids), np.vstack(rows)


class TestEmbeddingInference:
    def test_stub_weights_deterministic_and_small(self):
        from ocr_pipeline_ray.stages.embedder import LinearStubModel

        a, b = LinearStubModel(), LinearStubModel()
        assert np.array_equal(a.weights, b.weights)
        assert a.weights.shape == (64, 16)
        assert a.weights.min() >= -3 and a.weights.max() <= 3
        # the Knuth-hash formula, spelled out for cell (5, 7)
        ij = 5 * 16 + 7
        assert a.weights[5, 7] == (ij * 2654435761) % 2 ** 32 % 7 - 3

    def test_planted_twin_is_top1_neighbor(self, ray_session):
        """Recall floor: a PLANTED duplicate of a corpus doc embeds
        identically (cosine 1) and is the doc's top-1 neighbor over
        the whole corpus — the property the downstream ANN/near-dup
        stack relies on (the recall-floor pattern of
        tests/test_recall_pins.py)."""
        import duckdb
        import pyarrow.parquet as pq
        import tempfile, os, shutil

        tbl = pq.read_table(f"{SF_001}/documents.parquet",
                            columns=["doc_id", "text"])
        # plant a twin of doc 0 under a fresh id
        twin_id = int(duckdb.sql(
            f"SELECT max(doc_id) + 1 FROM read_parquet("
            f"'{SF_001}/documents.parquet')").fetchone()[0])
        d1 = tbl.column("doc_id")[0].as_py()
        planted = pa.table({
            "doc_id": pa.array(
                tbl.column("doc_id").to_pylist() + [twin_id],
                pa.int64()),
            "text": pa.array(
                tbl.column("text").to_pylist()
                + [tbl.column("text")[0].as_py()], pa.string()),
        })
        tmp = tempfile.mkdtemp()
        try:
            pq.write_table(planted, os.path.join(
                tmp, "documents.parquet"))
            ids, mat = _embed_matrix(tmp)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

        v = {i: mat[k] for k, i in enumerate(ids)
             if i in (d1, twin_id)}
        assert np.array_equal(v[d1], v[twin_id])
        assert np.any(v[d1]), "planted doc embedded to the zero vector"

        # top-1 by cosine over the whole corpus: the twin ties the
        # query vector itself, so it must reach the max similarity
        q = v[d1].astype(np.float64)
        norms = np.linalg.norm(mat, axis=1)
        sims = (mat @ q) / (np.maximum(norms, 1e-12) *
                            np.linalg.norm(q))
        self_pos = int(np.flatnonzero(ids == d1)[0])
        twin_pos = int(np.flatnonzero(ids == twin_id)[0])
        sims[self_pos] = -np.inf
        assert sims[twin_pos] >= sims.max() - 1e-12

    def test_pluggable_model_loader(self, ray_session):
        """A custom model object drops in: same plumbing, different
        weights (here: identity-ish projection picking feature 0)."""
        import ray.data

        from ocr_pipeline_ray.stages.embedder import (
            embedding_inference_stage)

        class OneHot:
            dim_in, dim_out = 64, 16

            def __init__(self):
                self.weights = np.zeros((64, 16), np.int64)
                self.weights[0, 0] = 1

            def forward(self, f):
                return f.astype(np.int64) @ self.weights

        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array(["hello world"], pa.string()),
        }))
        out = embedding_inference_stage(
            docs, model_loader=OneHot).take_all()
        emb = out[0]["embedding"]
        assert len(emb) == 16
        assert all(v == 0 for v in emb[1:])

    def test_null_text_zero_vector(self, ray_session):
        import ray.data

        from ocr_pipeline_ray.stages.embedder import (
            embedding_inference_stage)

        docs = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array([None, "a b c"], pa.string()),
        }))
        rows = {r["doc_id"]: r["embedding"]
                for r in embedding_inference_stage(docs).take_all()}
        assert all(v == 0 for v in rows[1])
        assert any(v != 0 for v in rows[2])
