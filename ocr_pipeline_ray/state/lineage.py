"""Resumable partitioned execution with per-partition lineage records.

The Ray-native recast of the reference's directory marker files
(``ocr_pipeline_open → busy → done/fail`` with appended timestamped
history, `/root/reference/ocr_pipeline.py:160-199,338-365`) and of its
"one directory = one unit of distribution" layout:

* partition unit = ONE input parquet shard file;
* a run processes all pending shards in a single streaming Dataset
  (pid column derived from the input path), writes Hive-partitioned
  output into a staging dir, then atomically renames each finished
  ``pid=<shard>`` dir into place and writes the shard's lineage JSON
  (history of state transitions + row metrics);
* a re-run skips shards whose lineage says ``done`` (driver-side set
  arithmetic — the checkpoint-resume anti-join of SURVEY.md §2.4);
* a failed run leaves no partial final partitions (staging is
  discarded) and records ``fail`` markers.

Timestamps are provided by the CALLER (driver) — nothing inside the
distributed tasks reads the clock.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable, Dict, List, Optional, Sequence

import pyarrow as pa
import pyarrow.parquet as pq


def partition_id(input_file: str) -> str:
    base = os.path.basename(input_file)
    return base[:-8] if base.endswith(".parquet") else base


class LineageStore:
    """JSON lineage records under ``<out_root>/_lineage/``."""

    def __init__(self, out_root: str):
        self.out_root = out_root
        self.dir = os.path.join(out_root, "_lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, pid: str) -> str:
        return os.path.join(self.dir, f"{pid}.json")

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


def run_partitioned(
    input_files: Sequence[str],
    out_root: str,
    pipeline_fn: Callable,
    run_ts: str,
    read_columns: Optional[List[str]] = None,
    **read_kwargs,
) -> Dict:
    """Process pending input shards through ``pipeline_fn``, resumably.

    ``pipeline_fn(ds) -> ds`` must preserve the ``pid`` column. Returns
    a summary dict with processed/skipped partitions and row counts.
    """
    import ray.data

    store = LineageStore(out_root)
    done = store.done_partitions()
    by_pid = {partition_id(f): f for f in sorted(input_files)}
    pending = {pid: f for pid, f in by_pid.items() if pid not in done}
    summary = {
        "total_partitions": len(by_pid),
        "skipped_partitions": sorted(set(by_pid) - set(pending)),
        "processed_partitions": sorted(pending),
        "rows_written": 0,
    }
    if not pending:
        return summary

    for pid in pending:
        store.append_state(pid, "busy", run_ts,
                           {"input_file": pending[pid]})

    # single-writer contract per out_root: clear orphaned staging dirs
    # left by a crashed (SIGKILLed) previous run — they were never
    # published, so removing them is always safe
    for name in os.listdir(out_root):
        if name.startswith("_staging_"):
            shutil.rmtree(os.path.join(out_root, name), ignore_errors=True)
    staging = os.path.join(out_root, f"_staging_{run_ts}".replace(" ", "_").replace(":", "-"))

    pid_by_path = {os.path.abspath(f): pid for pid, f in pending.items()}

    def _assign_pid(batch: pa.Table) -> pa.Table:
        paths = batch.column("path").to_pylist()
        pids = [pid_by_path[os.path.abspath(p)] for p in paths]
        return batch.drop_columns(["path"]).append_column(
            "pid", pa.array(pids, pa.string())
        )

    import time as _time

    run_t0 = _time.monotonic()
    try:
        ds = ray.data.read_parquet(
            sorted(pending.values()),
            include_paths=True,
            columns=read_columns,
            **read_kwargs,
        )
        ds = ds.map_batches(_assign_pid, batch_format="pyarrow")
        out = pipeline_fn(ds)
        out.write_parquet(staging, partition_cols=["pid"])
    except Exception as exc:
        for pid in pending:
            store.append_state(pid, "fail", run_ts, {"error": str(exc)})
        shutil.rmtree(staging, ignore_errors=True)
        raise

    for pid in pending:
        src = os.path.join(staging, f"pid={pid}")
        dst = os.path.join(out_root, f"pid={pid}")
        rows = 0
        if os.path.isdir(src):
            for f in os.listdir(src):
                if f.endswith(".parquet"):
                    rows += pq.ParquetFile(os.path.join(src, f)).metadata.num_rows
            shutil.rmtree(dst, ignore_errors=True)
            os.replace(src, dst)  # atomic publish of the partition
        else:
            os.makedirs(dst, exist_ok=True)  # shard produced zero rows
        # driver-measured wall time for the whole pending batch — the
        # per-step profile() analogue (ocr_pipeline.py:368-376); finer
        # per-stage splits live in Dataset.stats().
        store.append_state(
            pid, "done", run_ts,
            {"rows": rows,
             "run_wall_sec": round(_time.monotonic() - run_t0, 3)},
        )
        summary["rows_written"] += rows
    shutil.rmtree(staging, ignore_errors=True)
    return summary
