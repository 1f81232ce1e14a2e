"""Quality-estimation stage (StepEstimateOCR slot) — actor pool.

The scorer holds its lexicon / compiled validator once per actor
(``__init__``), replacing the reference's per-host LanguageTool HTTP
service (`/root/reference/lib/ocr_step.py:337-424`) with an in-process
deterministic model — the shared-service bottleneck and the network
hop disappear from the hot path.
"""

from __future__ import annotations

from typing import FrozenSet, Optional

import pyarrow as pa

from ..functions.quality import estimate_quality

QUALITY_FIELDS = (
    ("hit_ratio", pa.float64()),
    ("n_words", pa.int32()),
    ("n_errs", pa.int32()),
    ("n_lines_in", pa.int32()),
    ("n_wraps", pa.int32()),
    ("n_shorts", pa.int32()),
    ("n_lines_out", pa.int32()),
)


class QualityScorer:
    """lines → flat quality columns (hit_ratio .. n_lines_out)."""

    def __init__(self, lexicon: Optional[FrozenSet[str]] = None, minlen: int = 2):
        self.lexicon = frozenset(w.lower() for w in lexicon) if lexicon else None
        self.minlen = minlen

    def __call__(self, batch: pa.Table) -> pa.Table:
        lines_list = batch.column("lines").to_pylist()
        records = {name: [] for name, _ in QUALITY_FIELDS}
        for lines in lines_list:
            lines = lines or []
            texts = [ln["text"] for ln in lines]
            rec = estimate_quality(texts, self.lexicon, self.minlen)
            for name, _ in QUALITY_FIELDS:
                records[name].append(rec[name])
        out = batch
        for name, typ in QUALITY_FIELDS:
            out = out.append_column(name, pa.array(records[name], typ))
        return out


def quality_stage(ds, lexicon=None, batch_size: int = 256, concurrency=(1, 8)):
    """Attach the scorer actor pool."""
    return ds.map_batches(
        QualityScorer,
        fn_constructor_kwargs={"lexicon": lexicon},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
