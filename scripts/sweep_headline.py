"""Saturation sweep: headline extraction at 32 (and 8) CPUs across
batch_size x target_max_block_size.

VERDICT r3 item 5: decide whether the 8->32 scaling-efficiency dip
(0.69) has a fixable executor component (bad batch/block sizing) or is
purely the single host's memory/frequency envelope. Each cell runs the
headline in a FRESH process (`bench.py --headline-only`) so Ray block
sizing can't leak between cells.

Usage: python scripts/sweep_headline.py [sf_dir]   (default sf0.1)
Prints one JSON line per cell plus a final summary table.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

CELLS = [
    # (cpus, batch_size, target_block_mb or None=default 128MB)
    (32, 256, None),   # current production setting
    (32, 128, None),
    (32, 512, None),
    (32, 1024, None),
    (32, 256, 32),
    (32, 256, 16),
    (32, 1024, 32),
    (8, 256, None),    # reference point for per-core comparison
]


def run_cell(cpus: int, batch: int, blk) -> dict:
    env = dict(os.environ)
    env["RAY_GRAFT_CPUS"] = str(cpus)
    env["GRAFT_BATCH_SIZE"] = str(batch)
    env["GRAFT_BENCH_REPEATS"] = "2"
    if blk is not None:
        env["GRAFT_TARGET_BLOCK_MB"] = str(blk)
    else:
        env.pop("GRAFT_TARGET_BLOCK_MB", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"),
         "--headline-only", "--sf-dir", SF],
        capture_output=True, text=True, cwd=REPO)
    lines = [l for l in proc.stdout.strip().splitlines()
             if l.startswith("{")]
    if proc.returncode != 0 or not lines:
        sys.stderr.write(proc.stderr)
        raise RuntimeError(
            f"bench cell cpus={cpus} batch={batch} blk={blk} failed "
            f"(rc={proc.returncode}, {len(lines)} JSON lines)")
    return json.loads(lines[-1])


def main() -> None:
    rows = []
    for cpus, batch, blk in CELLS:
        r = run_cell(cpus, batch, blk)
        cell = {
            "cpus": cpus, "batch_size": batch,
            "target_block_mb": blk or "default",
            "wall_sec": r["value"], "docs_per_sec": r["docs_per_sec"],
            "docs_per_sec_per_cpu": round(r["docs_per_sec"] / cpus, 1),
        }
        rows.append(cell)
        print(json.dumps(cell), flush=True)
    print("\n| cpus | batch | block MB | wall s | docs/s | docs/s/cpu |")
    print("|---|---|---|---|---|---|")
    for c in rows:
        print(f"| {c['cpus']} | {c['batch_size']} | {c['target_block_mb']} "
              f"| {c['wall_sec']} | {c['docs_per_sec']} "
              f"| {c['docs_per_sec_per_cpu']} |")


if __name__ == "__main__":
    main()
