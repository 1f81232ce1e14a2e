"""Corpus-level quality report (store_estimations / analyze parity).

Reference: `/root/reference/ocr_pipeline.py:233-269` (``.wtr`` writer:
header ``mean,b1..b5,total,invalid`` + per-doc rows sorted ascending by
ratio) and `lib/ocr_step.py:426-446` (mean + 5-bin histogram with
``min(bins-1, round(ratio // 15))``).

Scale shape: the summary is a PARTIAL aggregate — bin counts and ratio
sums combine inside ``map_batches`` per block, and the driver merges a
handful of tiny partial rows. No shuffle. Only the per-doc report rows
(a few columns, one row per doc) go through the small global ``sort``.
"""

from __future__ import annotations

from typing import Dict

import pyarrow as pa

from ..functions.text import round3

REPORT_COLUMNS = [
    "url", "hit_ratio", "n_words", "n_errs", "n_lines_in",
    "n_wraps", "n_shorts", "n_lines_out",
]


def _bin_index(ratio: float, bins: int = 5, step_bin: int = 15) -> int:
    target = round(ratio // step_bin)
    return bins - 1 if target >= bins else int(target)


def quality_summary(ds, bins: int = 5, step_bin: int = 15) -> Dict[str, float]:
    """Distributed mean/bin/valid-invalid summary (A1 + A2).

    ``ds`` must carry a ``hit_ratio`` column; ``-1`` marks unscored
    documents (reference sentinel).
    """

    def _partial(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        col = batch.column("hit_ratio")
        valid_mask = pc.and_(pc.is_valid(col), pc.not_equal(col, -1.0))
        ratios = np.asarray(col.filter(valid_mask).combine_chunks())
        n_valid = len(ratios)
        n_invalid = batch.num_rows - n_valid
        total = float(ratios.sum()) if n_valid else 0.0
        # bin = min(bins-1, round(r // step)); r // step is integral,
        # so round() is the identity — exact parity with _bin_index.
        # Out-of-domain negative ratios (other than the -1 sentinel,
        # filtered above) wrap like Python list indexing did in the
        # scalar path (bin_counts[-1] == last bin) instead of
        # crashing np.bincount.
        idx = np.minimum(
            (ratios // step_bin).astype(np.int64), bins - 1
        ) % bins if n_valid else np.empty(0, dtype=np.int64)
        bin_counts = np.bincount(idx, minlength=bins)
        return pa.table(
            {
                "sum_ratio": pa.array([total], pa.float64()),
                "n_valid": pa.array([n_valid], pa.int64()),
                "n_invalid": pa.array([n_invalid], pa.int64()),
                **{
                    f"b{i + 1}": pa.array([bin_counts[i]], pa.int64())
                    for i in range(bins)
                },
            }
        )

    merged = {"sum_ratio": 0.0, "n_valid": 0, "n_invalid": 0}
    for i in range(bins):
        merged[f"b{i + 1}"] = 0
    partials = ds.select_columns(["hit_ratio"]).map_batches(
        _partial, batch_format="pyarrow"
    )
    for row in partials.iter_rows():
        for key in merged:
            merged[key] += row[key]
    mean = (
        round3(merged["sum_ratio"] / merged["n_valid"])
        if merged["n_valid"]
        else 0.0
    )
    summary = {
        "mean": mean,
        "total": merged["n_valid"] + merged["n_invalid"],
        "invalid": merged["n_invalid"],
    }
    for i in range(bins):
        summary[f"b{i + 1}"] = merged[f"b{i + 1}"]
    return summary


def sorted_report(ds):
    """Per-doc report rows sorted ascending by ratio (O2 parity).

    Valid docs only (``hit_ratio != -1``); narrow projection before the
    global sort so only report columns shuffle.
    """
    import pyarrow.compute as pc

    def _valid(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.is_valid(batch.column("hit_ratio")),
            pc.not_equal(batch.column("hit_ratio"), -1.0),
        )
        return batch.filter(mask)

    return (
        ds.select_columns(REPORT_COLUMNS)
        .map_batches(_valid, batch_format="pyarrow")
        .sort("hit_ratio")
    )


def write_wtr(path: str, summary: Dict, report_rows) -> str:
    """Write the ``.wtr``-style report file (S5 parity format).

    ``report_rows``: iterable of dicts in ascending-ratio order.
    Timestamped naming is the CALLER's job (timestamps come from the
    driver, never from inside workflow tasks).
    """
    with open(path, "w", encoding="UTF-8") as outfile:
        outfile.write(
            f"{summary['mean']},{summary['b1']},{summary['b2']},"
            f"{summary['b3']},{summary['b4']},{summary['b5']},"
            f"{summary['total']},{summary['invalid']}\n"
        )
        for row in report_rows:
            outfile.write(
                f"{row['url']},{row['hit_ratio']:.3f},{row['n_words']},"
                f"{row['n_errs']},{row['n_lines_in']},{row['n_wraps']},"
                f"{row['n_shorts']},{row['n_lines_out']}\n"
            )
        outfile.write("\n")
    return path


def stream_wtr(path: str, summary: Dict, sorted_ds,
               batch_size: int = 4096) -> str:
    """Single-file ``.wtr`` streamed from a SORTED dataset.

    Constant driver memory: rows flow through ``iter_batches`` one
    block at a time — never a ``take_all`` of one row per document
    (at 10^12 docs that list IS the corpus). Byte-identical to
    :func:`write_wtr` over the same rows.
    """

    def _rows():
        for batch in sorted_ds.iter_batches(
            batch_format="pyarrow", batch_size=batch_size
        ):
            yield from batch.to_pylist()

    return write_wtr(path, summary, _rows())


def write_report_parts(out_dir: str, summary: Dict, sorted_ds) -> str:
    """Partitioned report — the 10^12-doc mode of S5.

    The single-file ``.wtr`` cannot scale past a small corpus (one
    global text file); here the sorted per-doc rows are written as
    parquet PARTS from the workers (Ray names output files by
    ascending task/block index, so lexicographic filename order ==
    global ascending-ratio order) plus a tiny ``_summary.json``
    holding the header aggregate. :func:`iter_report_parts` streams
    the rows back in order; the ``.wtr`` file stays available as the
    small-corpus mode (`/root/reference/ocr_pipeline.py:233-269`).
    """
    import glob
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    # a re-run must REPLACE the report: leftover part files from a
    # previous run would interleave into the streamed row order.
    # Remove ONLY the report's own artifacts (never rmtree a
    # caller-supplied directory that may hold other outputs), and
    # raise on failure rather than silently keeping stale parts.
    for stale in glob.glob(os.path.join(out_dir, "*.parquet")):
        os.remove(stale)
    summary_path = os.path.join(out_dir, "_summary.json")
    if os.path.exists(summary_path):
        os.remove(summary_path)
    with open(os.path.join(out_dir, "_summary.json"), "w",
              encoding="UTF-8") as fh:
        json.dump(summary, fh, sort_keys=True)
    sorted_ds.write_parquet(out_dir)
    return out_dir


def iter_report_parts(out_dir: str):
    """(summary, row-iterator) from a :func:`write_report_parts` dir —
    rows stream back in global ascending-ratio order."""
    import glob
    import json
    import os

    import pyarrow.parquet as pq

    with open(os.path.join(out_dir, "_summary.json"),
              encoding="UTF-8") as fh:
        summary = json.load(fh)

    def _rows():
        for part in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
            pf = pq.ParquetFile(part)
            for batch in pf.iter_batches():
                yield from batch.to_pylist()

    return summary, _rows()
