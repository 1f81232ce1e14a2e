"""Resumable partitioned execution + lineage markers."""

import json
import os

import pytest

from ocr_pipeline_ray.pipelines.extraction import build_pipeline
from ocr_pipeline_ray.state.lineage import (
    LineageStore,
    partition_id,
    run_partitioned,
)


def _pipeline(ds):
    return build_pipeline(ds)


class TestLineage:
    def test_partition_id(self):
        assert partition_id("/x/pages-00003.parquet") == "pages-00003"

    def test_full_run_then_resume_skips_all(
        self, ray_session, small_corpus, tmp_path
    ):
        out = str(tmp_path / "out")
        s1 = run_partitioned(small_corpus, out, _pipeline, "2026-01-01 10:00:00")
        assert s1["processed_partitions"] == [
            partition_id(f) for f in sorted(small_corpus)
        ]
        assert s1["rows_written"] == 240
        # every partition published + lineage done with history
        store = LineageStore(out)
        assert len(store.done_partitions()) == 4
        rec = store.read(partition_id(small_corpus[0]))
        assert rec["status"] == "done"
        assert any("mark state busy" in h for h in rec["history"])
        assert any("mark state done" in h for h in rec["history"])
        assert rec["rows"] > 0
        assert os.path.isdir(os.path.join(out, f"pid={rec['partition']}"))

        # resume: nothing pending
        s2 = run_partitioned(small_corpus, out, _pipeline, "2026-01-01 11:00:00")
        assert s2["processed_partitions"] == []
        assert len(s2["skipped_partitions"]) == 4

    def test_partial_resume_only_processes_missing(
        self, ray_session, small_corpus, tmp_path
    ):
        out = str(tmp_path / "out")
        run_partitioned(small_corpus, out, _pipeline, "2026-01-01 10:00:00")
        # invalidate one partition (simulate a lost/failed shard)
        victim = partition_id(small_corpus[2])
        os.remove(os.path.join(out, "_lineage", f"{victim}.json"))
        s = run_partitioned(small_corpus, out, _pipeline, "2026-01-01 12:00:00")
        assert s["processed_partitions"] == [victim]
        assert len(s["skipped_partitions"]) == 3

    def test_failed_run_marks_fail_and_leaves_no_partials(
        self, ray_session, small_corpus, tmp_path
    ):
        out = str(tmp_path / "out")

        def _broken(ds):
            def _boom(batch):
                raise RuntimeError("stage exploded")

            return ds.map_batches(_boom, batch_format="pyarrow")

        with pytest.raises(Exception):
            run_partitioned(small_corpus, out, _broken, "2026-01-01 10:00:00")
        store = LineageStore(out)
        assert store.done_partitions() == set()
        rec = store.read(partition_id(small_corpus[0]))
        assert rec["status"] == "fail"
        assert "stage exploded" in rec["error"]
        # no published partitions, no staging leftovers
        assert not [d for d in os.listdir(out) if d.startswith("pid=")]
        assert not [d for d in os.listdir(out) if d.startswith("_staging")]

        # recovery: a good re-run processes everything
        s = run_partitioned(small_corpus, out, _pipeline, "2026-01-01 13:00:00")
        assert len(s["processed_partitions"]) == 4

    def test_output_readable_and_complete(
        self, ray_session, small_corpus, tmp_path
    ):
        import duckdb

        out = str(tmp_path / "out")
        run_partitioned(small_corpus, out, _pipeline, "2026-01-01 10:00:00")
        con = duckdb.connect()
        n = con.sql(
            f"SELECT count(*), count(DISTINCT pid) FROM "
            f"read_parquet('{out}/pid=*/*.parquet', hive_partitioning=true)"
        ).fetchall()
        assert n == [(240, 4)]
