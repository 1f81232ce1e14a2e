"""Resumable partitioned execution + lineage markers."""

import json
import os

import pytest

from ocr_pipeline_ray.pipelines.extraction import build_pipeline
from ocr_pipeline_ray.state.lineage import (
    LineageStore,
    partition_id,
    partition_ids,
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

    def test_partition_ids_collision_free(self, tmp_path):
        """Two shards sharing a basename in different dirs must BOTH
        get a pid (regression: one was silently dropped)."""
        a = tmp_path / "a" / "pages-00000.parquet"
        b = tmp_path / "b" / "pages-00000.parquet"
        c = tmp_path / "b" / "pages-00001.parquet"
        for p in (a, b, c):
            p.parent.mkdir(exist_ok=True)
            p.write_bytes(b"")
        mapping = partition_ids([str(a), str(b), str(c)])
        assert len(mapping) == 3
        assert set(mapping.values()) == {str(a), str(b), str(c)}
        # non-colliding shard keeps the plain basename pid
        assert "pages-00001" in mapping
        # colliding pids are deterministic
        assert mapping == partition_ids([str(b), str(a), str(c)])

    def test_stage_metrics_recorded(self, ray_session, small_corpus, tmp_path):
        """Lineage records carry per-operator wall/rows (the per-step
        profile() analogue, ocr_pipeline.py:368-376)."""
        out = str(tmp_path / "out")
        run_partitioned(small_corpus, out, _pipeline, "2026-01-01 10:00:00")
        rec = LineageStore(out).read(partition_id(small_corpus[0]))
        assert rec["run_wall_sec"] > 0
        stages = rec["stages"]
        assert stages, "expected per-stage entries"
        names = " ".join(s["stage"] for s in stages)
        assert "ReadParquet" in names
        assert any("wall_time_sum_sec" in s for s in stages)
        assert any(s.get("output_rows") for s in stages)


class TestConcurrentDrivers:
    def test_lease_splits_pending_set(self, ray_session, small_corpus, tmp_path):
        """Two drivers on one out_root: each shard processed exactly
        once (the open→busy rename lease, ocr_pipeline.py:338-365)."""
        out = str(tmp_path / "out")
        store = LineageStore(out)
        pids = sorted(partition_ids(small_corpus))
        # driver B holds live claims on the first two shards
        for pid in pids[:2]:
            assert store.try_claim(pid, "driver-b")
        s1 = run_partitioned(small_corpus, out, _pipeline,
                             "2026-01-01 10:00:00", run_id="driver-a")
        assert s1["locked_partitions"] == pids[:2]
        assert s1["processed_partitions"] == pids[2:]
        # driver B finishes its shards (release + its own run)
        for pid in pids[:2]:
            store.release(pid, "driver-b")
        s2 = run_partitioned(small_corpus, out, _pipeline,
                             "2026-01-01 10:05:00", run_id="driver-b2")
        assert s2["processed_partitions"] == pids[:2]
        assert s2["skipped_partitions"] == pids[2:]
        # all four published exactly once
        assert len(LineageStore(out).done_partitions()) == 4

    def test_two_real_processes_share_out_root(self, small_corpus, tmp_path):
        """TWO OS processes run the CLI concurrently against one
        out_root: every shard is published exactly once, no
        double-writes (the reference's NFS busy-marker contract,
        ocr_pipeline.py:338-365, under genuine concurrency)."""
        import subprocess
        import sys

        out = str(tmp_path / "out")
        cmd = [sys.executable, "-m", "ocr_pipeline_ray", *small_corpus,
               "-o", out, "--num-cpus", "2"]
        procs = [
            subprocess.Popen(cmd, cwd="/root/repo",
                             stdout=subprocess.PIPE, stderr=subprocess.PIPE)
            for _ in range(2)
        ]
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (so, se) in zip(procs, outs):
            assert p.returncode == 0, se.decode()[-2000:]
        store = LineageStore(out)
        pids = set(partition_ids(small_corpus))
        assert store.done_partitions() == pids
        # no shard processed twice: total rows exactly the corpus size
        # and lineage row counts sum to it
        import duckdb

        n, distinct = duckdb.sql(
            f"SELECT count(*), count(DISTINCT url || CAST(warc_ts AS VARCHAR)) "
            f"FROM read_parquet('{out}/pid=*/*.parquet', "
            f"hive_partitioning=true)"
        ).fetchone()
        assert n == 240 and distinct == 240
        assert sum(store.read(p)["rows"] for p in pids) == 240
        # no leftover claims or staging
        assert not [f for f in os.listdir(os.path.join(out, "_lineage"))
                    if f.endswith(".lock")]
        assert not [d for d in os.listdir(out) if d.startswith("_staging")]

    def test_stale_lease_takeover(self, tmp_path):
        out = str(tmp_path / "out")
        store = LineageStore(out)
        assert store.try_claim("p1", "dead-run")
        # fresh lock: not stealable
        assert not store.try_claim("p1", "new-run", stale_sec=3600)
        # idempotent re-claim by the owner
        assert store.try_claim("p1", "dead-run")
        # age the lock past the deadline → takeover succeeds
        lock = store._lock_path("p1")
        old = os.path.getmtime(lock) - 7200
        os.utime(lock, (old, old))
        assert store.try_claim("p1", "new-run", stale_sec=3600)
        assert store.lock_owner("p1") == "new-run"

    def test_heartbeat_refreshes_claims(self, tmp_path):
        """A long run keeps its lease: the heartbeat touches the run
        marker and lock mtimes so stale takeover never fires against
        a live driver (ADVICE: locks were touched once at claim)."""
        import time

        from ocr_pipeline_ray.state.lineage import _Heartbeat

        out = str(tmp_path / "out")
        store = LineageStore(out)
        assert store.try_claim("p1", "run-a")
        assert store.try_claim("p2", "thief")  # not ours: left alone
        store.register_run("run-a")
        lock = store._lock_path("p1")
        other = store._lock_path("p2")
        marker = store._run_marker("run-a")
        old = time.time() - 7200
        for p in (lock, other, marker):
            os.utime(p, (old, old))
        hb = _Heartbeat(store, "run-a", ["p1", "p2"], stale_sec=0.2)
        hb.start()
        time.sleep(0.4)
        hb.stop()
        assert time.time() - os.path.getmtime(lock) < 3600
        assert time.time() - os.path.getmtime(marker) < 3600
        # the foreign lock's mtime was NOT refreshed
        assert time.time() - os.path.getmtime(other) > 3600
        # so: our aged-but-beating claim is not stealable ...
        assert store.try_claim("p1", "thief", stale_sec=3600)is False
        # ... and our run marker still reads live
        assert store.run_is_live("run-a", stale_sec=3600)

    def test_publish_skips_lost_lease(
        self, ray_session, small_corpus, tmp_path
    ):
        """If another driver steals a claim mid-run (stale takeover),
        the loser must NOT publish that partition or mark it done —
        publish re-checks lock ownership (ADVICE high)."""
        out = str(tmp_path / "out")
        store = LineageStore(out)
        pids = sorted(partition_ids(small_corpus))
        victim = pids[1]

        def _stealing(ds):
            # runs driver-side after claims, before write/publish
            with open(store._lock_path(victim), "w", encoding="UTF-8") as fh:
                fh.write("thief-run")
            return _pipeline(ds)

        s = run_partitioned(small_corpus, out, _stealing,
                            "2026-01-01 10:00:00", run_id="loser-run")
        assert s["lost_partitions"] == [victim]
        assert s["processed_partitions"] == sorted(set(pids) - {victim})
        assert not os.path.isdir(os.path.join(out, f"pid={victim}"))
        assert store.read(victim)["status"] == "busy"  # not done
        assert store.lock_owner(victim) == "thief-run"  # not released
        for pid in set(pids) - {victim}:
            assert os.path.isdir(os.path.join(out, f"pid={pid}"))

    def test_bisect_staging_owned_by_run(self, ray_session, small_corpus,
                                         tmp_path):
        """Bisect retries stage under _staging_<run_id>/ so a
        concurrent sweep resolves their owner to the live run
        (ADVICE medium: `_staging_<run>.0` parsed as owner
        '<run>.0' and got swept mid-write)."""
        out = str(tmp_path / "out")
        store = LineageStore(out)
        pids = sorted(partition_ids(small_corpus))
        poison = pids[1]
        seen_stagings = []

        def _poisoned(ds):
            import pyarrow as pa

            # snapshot staging layout while the run is mid-flight
            seen_stagings.append(
                [d for d in os.listdir(out) if d.startswith("_staging")]
            )

            def _maybe_boom(batch: pa.Table) -> pa.Table:
                if poison in set(batch.column("pid").to_pylist()):
                    raise RuntimeError("poison shard")
                return batch

            return _pipeline(ds.map_batches(_maybe_boom,
                                            batch_format="pyarrow"))

        with pytest.raises(RuntimeError, match="poison"):
            run_partitioned(small_corpus, out, _poisoned,
                            "2026-01-01 10:00:00", run_id="bisect-run")
        # every staging dir ever visible at top level was the run's own
        for snapshot in seen_stagings:
            for d in snapshot:
                assert d == "_staging_bisect-run", d
        # and a sweep during the run would have identified the owner:
        # simulate by re-registering the run and checking liveness
        store.register_run("bisect-run")
        assert store.run_is_live("bisect-run")
        assert store.sweep_staging() == []

    def test_sweep_leaves_live_staging(self, tmp_path):
        out = str(tmp_path / "out")
        store = LineageStore(out)
        live = os.path.join(out, "_staging_liverun")
        dead = os.path.join(out, "_staging_deadrun")
        os.makedirs(live)
        os.makedirs(dead)
        store.register_run("liverun")
        removed = store.sweep_staging()
        assert removed == ["_staging_deadrun"]
        assert os.path.isdir(live)
        assert not os.path.isdir(dead)

    def test_poison_shard_isolated_by_bisect(
        self, ray_session, small_corpus, tmp_path
    ):
        """One shard whose rows break the pipeline fails ALONE; the
        healthy shards publish and a resume retries only the poison
        one (shard-level analogue of the skip-vs-fail split)."""
        out = str(tmp_path / "out")
        pids = sorted(partition_ids(small_corpus))
        poison = pids[1]

        def _poisoned(ds):
            import pyarrow as pa

            def _maybe_boom(batch: pa.Table) -> pa.Table:
                if poison in set(batch.column("pid").to_pylist()):
                    raise RuntimeError("poison shard")
                return batch

            return _pipeline(ds.map_batches(_maybe_boom,
                                            batch_format="pyarrow"))

        with pytest.raises(RuntimeError, match="poison"):
            run_partitioned(small_corpus, out, _poisoned,
                            "2026-01-01 10:00:00")
        store = LineageStore(out)
        assert store.done_partitions() == set(pids) - {poison}
        assert store.read(poison)["status"] == "fail"
        for pid in set(pids) - {poison}:
            assert os.path.isdir(os.path.join(out, f"pid={pid}"))
        assert not os.path.isdir(os.path.join(out, f"pid={poison}"))
        assert not [d for d in os.listdir(out) if d.startswith("_staging")]
        # resume with a healthy pipeline touches only the poison shard
        s = run_partitioned(small_corpus, out, _pipeline,
                            "2026-01-01 11:00:00")
        assert s["processed_partitions"] == [poison]
        assert len(s["skipped_partitions"]) == 3

    def test_corrupt_parquet_shard_isolated(
        self, ray_session, small_corpus, tmp_path
    ):
        """A shard whose FILE is unreadable (corrupt parquet bytes)
        fails alone too — the bisect covers read-time breakage, not
        just pipeline-stage exceptions."""
        import shutil as sh

        corrupt_dir = tmp_path / "shards"
        corrupt_dir.mkdir()
        files = []
        for f in small_corpus:
            dst = corrupt_dir / os.path.basename(f)
            sh.copyfile(f, dst)
            files.append(str(dst))
        victim = files[2]
        with open(victim, "wb") as fh:
            fh.write(b"PAR1 this is not a parquet file")
        out = str(tmp_path / "out")
        with pytest.raises(RuntimeError, match="partition"):
            run_partitioned(files, out, _pipeline, "2026-01-01 10:00:00")
        store = LineageStore(out)
        vpid = partition_id(victim)
        assert store.read(vpid)["status"] == "fail"
        assert store.done_partitions() == set(partition_ids(files)) - {vpid}

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
