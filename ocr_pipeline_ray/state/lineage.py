"""Resumable partitioned execution with per-partition lineage records.

The Ray-native recast of the reference's directory marker files
(``ocr_pipeline_open → busy → done/fail`` with appended timestamped
history, `/root/reference/ocr_pipeline.py:160-199,338-365`) and of its
"one directory = one unit of distribution" layout:

* partition unit = ONE input parquet shard file;
* a run CLAIMS each pending shard with an atomic create-or-fail lock
  file before touching it — the analogue of the reference's
  ``open → busy`` marker rename, which is its cross-host lease
  (`ocr_pipeline.py:338-365`): two concurrent drivers over the same
  ``out_root`` split the pending set instead of double-processing;
* the run processes all claimed shards in a single streaming Dataset
  (pid column derived from the input path), writes Hive-partitioned
  output into a staging dir OWNED by this run id, then atomically
  renames each finished ``pid=<shard>`` dir into place and writes the
  shard's lineage JSON (history of state transitions + row metrics +
  per-stage wall/rows from ``Dataset.stats()`` — the per-step
  ``profile()`` analogue, `ocr_pipeline.py:368-376`);
* a re-run skips shards whose lineage says ``done`` (driver-side set
  arithmetic — the checkpoint-resume anti-join of SURVEY.md §2.4);
* a failed run leaves no partial final partitions (its staging is
  discarded), records ``fail`` markers, and releases its claims;
* orphaned staging dirs are swept only when their owning run is dead
  (run-marker absent or stale) — a live concurrent run's staging is
  never touched.

Timestamps are provided by the CALLER (driver) — nothing inside the
distributed tasks reads the clock.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import socket
import threading
import time as _time
import uuid
from typing import Callable, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq

# a claim/run marker older than this is considered dead (stale lease
# takeover — the analogue of manually clearing a crashed host's busy
# marker in the reference's NFS layout)
DEFAULT_STALE_SEC = 3600.0


def store_root() -> str:
    """Root directory for STORED artifacts (materialized views,
    staged table generations, zone-mapped layouts) that outlive a
    single Dataset plan. On a multi-node cluster ``$OCR_RAY_STORE``
    must point at storage every node can read (shared filesystem /
    object-store mount); the default — ``$OCR_RAY_SCRATCH``, then
    the system temp dir — is only correct single-node. All
    atomic-publish helpers below assume ``os.replace`` is atomic on
    this filesystem (true for POSIX renames within one mount, the
    same assumption the reference's marker-file protocol makes,
    /root/reference/ocr_pipeline.py:160-199)."""
    import tempfile

    return os.environ.get(
        "OCR_RAY_STORE",
        os.environ.get("OCR_RAY_SCRATCH", tempfile.gettempdir()))


def publish_table(tbl: pa.Table, path: str) -> str:
    """Atomically publish a (small, driver-side) Arrow table as ONE
    parquet file: write to ``path + '.tmp'``, then rename into place
    — the same stage-then-rename protocol as the partition markers,
    so a concurrent reader never sees a half-written file."""
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path


def publish_dataset(ds, path: str) -> str:
    """Atomically publish a Dataset as a parquet DIRECTORY: workers
    write into ``path + '.tmp'``, the driver renames the finished
    dir into place. ``path`` must not already exist (stored views
    are create-once; refresh protocols write a NEW generation)."""
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    ds.write_parquet(tmp)
    os.replace(tmp, path)
    return path


def partition_id(input_file: str) -> str:
    base = os.path.basename(input_file)
    return base[:-8] if base.endswith(".parquet") else base


def partition_ids(input_files: Sequence[str]) -> Dict[str, str]:
    """Collision-free ``pid -> file`` map for a set of input shards.

    pid = basename sans ``.parquet``; when two files in different
    directories share a basename, each colliding pid gets a stable
    8-hex path-hash suffix so no shard is silently dropped (previously
    one of them would vanish from the dict and never be processed).
    Deterministic per absolute path, so resume keeps working.
    """
    files = sorted(set(input_files))
    by_base: Dict[str, List[str]] = {}
    for f in files:
        by_base.setdefault(partition_id(f), []).append(f)
    out: Dict[str, str] = {}
    for base, group in by_base.items():
        if len(group) == 1:
            out[base] = group[0]
        else:
            for f in group:
                suffix = hashlib.md5(
                    os.path.abspath(f).encode("utf-8")
                ).hexdigest()[:8]
                out[f"{base}-{suffix}"] = f
    return out


class LineageStore:
    """JSON lineage records + claim locks under ``<out_root>/_lineage/``."""

    def __init__(self, out_root: str):
        self.out_root = out_root
        self.dir = os.path.join(out_root, "_lineage")
        self.runs_dir = os.path.join(self.dir, "_runs")
        os.makedirs(self.runs_dir, exist_ok=True)

    def _path(self, pid: str) -> str:
        return os.path.join(self.dir, f"{pid}.json")

    def _lock_path(self, pid: str) -> str:
        return os.path.join(self.dir, f"{pid}.lock")

    def read(self, pid: str) -> Optional[Dict]:
        try:
            with open(self._path(pid), encoding="UTF-8") as fh:
                return json.load(fh)
        except FileNotFoundError:
            return None

    def write(self, pid: str, record: Dict) -> None:
        tmp = self._path(pid) + ".tmp"
        with open(tmp, "w", encoding="UTF-8") as fh:
            json.dump(record, fh, indent=1, sort_keys=True)
        os.replace(tmp, self._path(pid))  # atomic marker transition

    def append_state(self, pid: str, state: str, run_ts: str,
                     extra: Optional[Dict] = None) -> Dict:
        """Marker-file semantics: append a timestamped state line,
        then 'rename' (rewrite with the new status)."""
        record = self.read(pid) or {"partition": pid, "history": []}
        record["history"].append(f"{run_ts} mark state {state}")
        record["status"] = state
        if extra:
            record.update(extra)
        self.write(pid, record)
        return record

    def done_partitions(self) -> set:
        done = set()
        for name in os.listdir(self.dir):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.dir, name), encoding="UTF-8") as fh:
                rec = json.load(fh)
            if rec.get("status") == "done":
                done.add(rec["partition"])
        return done

    # ---- multi-driver lease ------------------------------------------

    def try_claim(self, pid: str, run_id: str,
                  stale_sec: float = DEFAULT_STALE_SEC) -> bool:
        """Atomically claim ``pid`` for ``run_id``.

        ``O_CREAT|O_EXCL`` — exactly one concurrent driver wins (the
        open→busy rename analogue). A lock whose mtime is older than
        ``stale_sec`` belongs to a dead run and is taken over.
        """
        lock = self._lock_path(pid)
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                with open(lock, encoding="UTF-8") as fh:
                    owner = fh.read().strip()
                age = _time.time() - os.path.getmtime(lock)
            except OSError:
                return False  # lock vanished mid-check → other run won
            if owner == run_id:
                return True  # already ours (idempotent re-claim)
            if age <= stale_sec:
                return False  # live concurrent run owns it
            # stale takeover: rewrite atomically (narrow race between
            # two stealers is the same one the reference's NFS rename
            # takeover has; the loser's staging is never published
            # because publish re-checks ownership)
            tmp = f"{lock}.{run_id}"
            with open(tmp, "w", encoding="UTF-8") as fh:
                fh.write(run_id)
            os.replace(tmp, lock)
            return self.lock_owner(pid) == run_id
        with os.fdopen(fd, "w", encoding="UTF-8") as fh:
            fh.write(run_id)
        return True

    def lock_owner(self, pid: str) -> Optional[str]:
        try:
            with open(self._lock_path(pid), encoding="UTF-8") as fh:
                return fh.read().strip()
        except OSError:
            return None

    def release(self, pid: str, run_id: str) -> None:
        if self.lock_owner(pid) == run_id:
            try:
                os.remove(self._lock_path(pid))
            except OSError:
                pass

    def touch_claims(self, run_id: str, pids: Sequence[str]) -> None:
        """Heartbeat: refresh mtimes of this run's marker and its
        lock files so a LIVE long run is never mistaken for dead by
        the ``stale_sec`` takeover (a lease is live while its holder
        keeps beating, not merely for ``stale_sec`` after claim)."""
        for path in [self._run_marker(run_id)] + [
            self._lock_path(p) for p in pids
        ]:
            try:
                # refresh only locks we still own (utime on a stolen
                # lock would extend the thief's lease — harmless but
                # wrong-headed; skip them)
                if path.endswith(".lock"):
                    with open(path, encoding="UTF-8") as fh:
                        if fh.read().strip() != run_id:
                            continue
                os.utime(path, None)
            except OSError:
                continue

    # ---- run markers (staging ownership) -----------------------------

    def _run_marker(self, run_id: str) -> str:
        return os.path.join(self.runs_dir, run_id)

    def register_run(self, run_id: str) -> None:
        with open(self._run_marker(run_id), "w", encoding="UTF-8") as fh:
            fh.write(run_id)

    def finish_run(self, run_id: str) -> None:
        try:
            os.remove(self._run_marker(run_id))
        except OSError:
            pass

    def run_is_live(self, run_id: str,
                    stale_sec: float = DEFAULT_STALE_SEC) -> bool:
        marker = self._run_marker(run_id)
        try:
            return _time.time() - os.path.getmtime(marker) <= stale_sec
        except OSError:
            return False

    def sweep_staging(self, stale_sec: float = DEFAULT_STALE_SEC) -> List[str]:
        """Remove staging dirs of DEAD runs only (crashed / SIGKILLed).

        A staging dir is ``_staging_<run_id>``; it is swept only when
        its owning run's marker is absent or stale — a live concurrent
        driver's staging is left alone.
        """
        removed = []
        for name in os.listdir(self.out_root):
            if not name.startswith("_staging_"):
                continue
            owner = name[len("_staging_"):]
            if not self.run_is_live(owner, stale_sec):
                shutil.rmtree(os.path.join(self.out_root, name),
                              ignore_errors=True)
                removed.append(name)
        return removed


class _Heartbeat(threading.Thread):
    """Driver-side lease heartbeat.

    Touches the run marker + claimed lock files every
    ``stale_sec / 4`` (capped at 60 s) while the run processes, so
    runs longer than ``stale_sec`` keep their claims and their
    staging dir against concurrent drivers' stale-takeover/sweep.
    """

    def __init__(self, store: "LineageStore", run_id: str,
                 pids: Sequence[str], stale_sec: float):
        super().__init__(daemon=True, name=f"lineage-heartbeat-{run_id}")
        self._store = store
        self._run_id = run_id
        self._pids = list(pids)
        self._interval = min(max(stale_sec / 4.0, 0.05), 60.0)
        self._halt = threading.Event()  # NB: Thread reserves `_stop`

    def run(self) -> None:
        while not self._halt.wait(self._interval):
            self._store.touch_claims(self._run_id, self._pids)

    def stop(self) -> None:
        self._halt.set()
        self.join(timeout=5.0)


def _stage_metrics(ds) -> List[Dict]:
    """Per-operator wall-time / row metrics from ``Dataset.stats()``.

    The per-step ``profile()`` analogue (`ocr_pipeline.py:368-376`):
    one entry per physical operator of the executed plan. Defensive —
    returns whatever subset of fields the Ray version exposes.
    """
    stages: List[Dict] = []
    try:
        # after write_parquet the executed plan's stats live on the
        # internal written dataset, not the pre-write handle
        executed = getattr(ds, "_write_ds", None) or ds
        summaries = [executed._get_stats_summary()]
        seen = set()
        while summaries:
            summary = summaries.pop()
            if id(summary) in seen:
                continue
            seen.add(id(summary))
            summaries.extend(getattr(summary, "parents", []) or [])
            for op in getattr(summary, "operators_stats", []) or []:
                entry: Dict = {"stage": getattr(op, "operator_name", "?")}
                wall = getattr(op, "wall_time", None)
                if isinstance(wall, dict) and "sum" in wall:
                    entry["wall_time_sum_sec"] = round(wall["sum"], 4)
                rows = getattr(op, "output_num_rows", None)
                if isinstance(rows, dict) and "sum" in rows:
                    entry["output_rows"] = rows["sum"]
                total = getattr(op, "time_total_s", None)
                if isinstance(total, (int, float)):
                    entry["time_total_sec"] = round(total, 4)
                stages.append(entry)
    except Exception:  # stats are best-effort telemetry, never fatal
        return stages
    return stages


def run_partitioned(
    input_files: Sequence[str],
    out_root: str,
    pipeline_fn: Callable,
    run_ts: str,
    read_columns: Optional[List[str]] = None,
    run_id: Optional[str] = None,
    stale_sec: float = DEFAULT_STALE_SEC,
    **read_kwargs,
) -> Dict:
    """Process pending input shards through ``pipeline_fn``, resumably.

    ``pipeline_fn(ds) -> ds`` must preserve the ``pid`` column. Returns
    a summary dict with processed/skipped/locked partitions and row
    counts. Safe under concurrent drivers sharing ``out_root``: each
    pending shard is processed by exactly one of them (lease claims).
    """
    import ray.data

    store = LineageStore(out_root)
    if run_id is None:
        # host-unique: two drivers launched the same second on
        # different hosts sharing an NFS out_root must never collide
        # on (pid, timestamp) alone
        run_id = (
            f"{socket.gethostname()}-{os.getpid()}-{uuid.uuid4().hex[:6]}"
        )
    store.register_run(run_id)
    done = store.done_partitions()
    by_pid = partition_ids(input_files)
    candidates = {pid: f for pid, f in by_pid.items() if pid not in done}
    # lease: claim each candidate; shards claimed by a LIVE concurrent
    # run are reported as locked and left to that run
    pending, locked = {}, []
    for pid, f in candidates.items():
        if store.try_claim(pid, run_id, stale_sec):
            pending[pid] = f
        else:
            locked.append(pid)
    summary = {
        "total_partitions": len(by_pid),
        "skipped_partitions": sorted(set(by_pid) - set(candidates)),
        "locked_partitions": sorted(locked),
        "processed_partitions": sorted(pending),
        "rows_written": 0,
    }
    if not pending:
        store.finish_run(run_id)
        return summary

    for pid in pending:
        store.append_state(pid, "busy", run_ts,
                           {"input_file": pending[pid], "run_id": run_id})

    # sweep staging dirs of DEAD runs only (ours is freshly registered)
    store.sweep_staging(stale_sec)
    # all staging (incl. bisect retries) nests under ONE top-level
    # dir named by the run id, so a concurrent sweep always resolves
    # its owner (a sibling `_staging_<run>.0` would parse as owner
    # "<run>.0" and be swept out from under a live run)
    staging_root = os.path.join(out_root, f"_staging_{run_id}")

    run_t0 = _time.monotonic()
    failed: Dict[str, str] = {}
    lost: List[str] = []

    def _process(batch_pending: Dict[str, str], staging: str) -> None:
        """Run one shard subset; on failure BISECT so a single poison
        shard fails alone while healthy shards still publish.

        The reference distinguishes skip-this-doc from kill-the-run
        (`ocr_pipeline.py:426-441`); row-level errors are already
        isolated into the ``error`` column by the chain — this is the
        shard-level analogue for inputs that break the READ itself
        (corrupt parquet), at log2(n) extra executions worst-case.
        """
        pid_by_path = {
            os.path.abspath(f): pid for pid, f in batch_pending.items()
        }

        def _assign_pid(batch: pa.Table) -> pa.Table:
            paths = batch.column("path").to_pylist()
            pids = [pid_by_path[os.path.abspath(p)] for p in paths]
            return batch.drop_columns(["path"]).append_column(
                "pid", pa.array(pids, pa.string())
            )

        try:
            ds = ray.data.read_parquet(
                sorted(batch_pending.values()),
                include_paths=True,
                columns=read_columns,
                **read_kwargs,
            )
            ds = ds.map_batches(_assign_pid, batch_format="pyarrow")
            out = pipeline_fn(ds)
            out.write_parquet(staging, partition_cols=["pid"])
        except Exception as exc:
            shutil.rmtree(staging, ignore_errors=True)
            if len(batch_pending) == 1:
                (pid,) = batch_pending
                failed[pid] = str(exc)
                store.append_state(pid, "fail", run_ts,
                                   {"error": str(exc), "run_id": run_id})
                store.release(pid, run_id)
                return
            pids = sorted(batch_pending)
            half = len(pids) // 2
            for i, part in enumerate((pids[:half], pids[half:])):
                _process({p: batch_pending[p] for p in part},
                         f"{staging}.{i}")
            return

        stages = _stage_metrics(out)
        run_wall = round(_time.monotonic() - run_t0, 3)
        for pid in batch_pending:
            # publish re-checks lease ownership: if another driver
            # stole this claim (stale takeover) while we processed,
            # publishing anyway would double-write the partition —
            # skip it, leave its lineage un-done, and report it lost
            if store.lock_owner(pid) != run_id:
                lost.append(pid)
                continue
            src = os.path.join(staging, f"pid={pid}")
            dst = os.path.join(out_root, f"pid={pid}")
            rows = 0
            if os.path.isdir(src):
                for f in os.listdir(src):
                    if f.endswith(".parquet"):
                        rows += pq.ParquetFile(
                            os.path.join(src, f)).metadata.num_rows
                shutil.rmtree(dst, ignore_errors=True)
                os.replace(src, dst)  # atomic publish of the partition
            else:
                os.makedirs(dst, exist_ok=True)  # shard with zero rows
            # run_wall = driver wall so far; "stages" carries the
            # per-operator wall/rows split of the executed plan
            store.append_state(
                pid, "done", run_ts,
                {"rows": rows,
                 "run_id": run_id,
                 "run_wall_sec": run_wall,
                 "stages": stages},
            )
            store.release(pid, run_id)
            summary["rows_written"] += rows
        shutil.rmtree(staging, ignore_errors=True)

    heartbeat = _Heartbeat(store, run_id, list(pending), stale_sec)
    heartbeat.start()
    try:
        _process(pending, os.path.join(staging_root, "s"))
    finally:
        heartbeat.stop()
        shutil.rmtree(staging_root, ignore_errors=True)
        store.finish_run(run_id)
    summary["failed_partitions"] = sorted(failed)
    summary["lost_partitions"] = sorted(lost)
    summary["processed_partitions"] = sorted(
        set(pending) - set(failed) - set(lost)
    )
    if failed:
        # healthy shards are already published + marked done (a
        # re-run resumes past them); surface the poison shards loudly
        raise RuntimeError(
            f"{len(failed)} partition(s) failed: "
            + "; ".join(f"{p}: {e}" for p, e in sorted(failed.items()))
        )
    return summary
