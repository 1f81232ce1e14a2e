"""Extraction stage — the stateful recognition actor (StepTesseract slot).

``HtmlExtractor`` is the actor-pool class for
``ds.map_batches(HtmlExtractor, concurrency=(lo, hi),
batch_size=B, batch_format="pyarrow")``: the parser configuration
(compiled boilerplate regex, thresholds) is built once per actor in
``__init__`` — the analogue of the reference loading the OCR model
once per worker process (`/root/reference/ocr_pipeline.py:33,517`).
"""

from __future__ import annotations

import re
from typing import Optional

import pyarrow as pa

from ..functions.extract import ExtractConfig, extract_lines
from ..schema import LINES_TYPE


class HtmlExtractor:
    """html:binary → lines:list<struct> (+ error column), per batch."""

    def __init__(self, config: Optional[ExtractConfig] = None):
        self.cfg = config or ExtractConfig()
        self.boiler_re = re.compile(self.cfg.boiler_class_pattern)

    def __call__(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        all_lines = []
        errors = []
        n_raw = []
        for raw in htmls:
            if raw is None:
                all_lines.append([])
                errors.append("empty html")
                n_raw.append(0)
                continue
            try:
                lines, stats = extract_lines(raw, self.cfg, self.boiler_re)
                all_lines.append(lines)
                errors.append(None)
                n_raw.append(stats["n_raw_lines"])
            except Exception as exc:  # row-local skip (StepException parity)
                all_lines.append([])
                errors.append(f"{type(exc).__name__}: {exc}")
                n_raw.append(0)
        out = batch.drop_columns(["html"])
        out = out.append_column("lines", pa.array(all_lines, LINES_TYPE))
        out = out.append_column("n_raw_lines", pa.array(n_raw, pa.int32()))
        out = out.append_column("error", pa.array(errors, pa.string()))
        return out


def extract_stage(
    ds,
    config: Optional[ExtractConfig] = None,
    batch_size: int = 64,
    concurrency=(1, 8),
):
    """Attach the extraction actor pool to a pages Dataset.

    Small batch_size by default: html rows can be MB-scale, and a batch
    must fit in an actor's heap alongside its parsed DOM state.
    """
    return ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"config": config},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
