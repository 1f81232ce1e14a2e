"""Fused extraction chain — one Arrow↔Python round trip per batch.

The per-step pipeline (extract → replace → regex → finalize → quality)
is semantically a composition of ROW-LOCAL functions, but running it
as separate ``map_batches`` stages deserializes/re-serializes the
nested ``lines`` column once per stage (~4× the conversion cost; Ray
fuses the tasks but not the conversions). ``FusedExtractor`` compiles
the same ordered StepSpec chain into one actor that converts each row
once: html → lines → normalized texts → spans/quality → columns.

Output schema and values are IDENTICAL to the per-step path (asserted
by the e2e parity tests); ``build_pipeline(..., fused=False)`` keeps
the stage-per-step path for custom/user step types.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

import pyarrow as pa

from ..config import StepSpec
from ..functions.extract import ExtractConfig, extract_document
from ..functions.quality import estimate_quality
from ..functions.text import (
    doc_id_from_url,
    page_id_from_url,
    replace_chars,
    replace_chars_regex,
)
from ..schema import LINES_TYPE
from .normalize import REPL_STATS_TYPE
from .quality import QUALITY_FIELDS

FUSABLE_TAIL = {"ReplaceChars", "ReplaceCharsRegex", "FinalizeText",
                "QualityEstimate"}

# shared pool of line-id strings ("l00000", ...) — built lazily once
# per worker process
_LINE_ID_POOL: list = []


def _line_id(i: int) -> str:
    while len(_LINE_ID_POOL) <= i:
        _LINE_ID_POOL.append(f"l{len(_LINE_ID_POOL):05d}")
    return _LINE_ID_POOL[i]


def is_fusable(specs: Sequence[StepSpec]) -> bool:
    if not specs or specs[0].type != "HtmlExtract":
        return False
    # the backup column is a per-step-path feature (extra output
    # column the fused chain doesn't model)
    if any(s.params.get("backup") for s in specs):
        return False
    tail = [s.type for s in specs[1:]]
    return (
        set(tail) <= FUSABLE_TAIL
        and "FinalizeText" in tail
        and "QualityEstimate" in tail
    )


class FusedExtractor:
    """Actor: the whole default chain, one conversion per batch.

    ``profile=True`` appends a ``step_wall_us`` map column — per-STEP
    wall microseconds accumulated over the batch (the reference's
    per-step ``profile()`` log, `ocr_pipeline.py:368-376`, at batch
    granularity; values repeat on every row of the batch). Off by
    default: the timer calls are cheap but not free.
    """

    def __init__(self, specs: Sequence[StepSpec], profile: bool = False):
        from ..config import coerce_params

        self.profile = profile
        extract_params = coerce_params(specs[0].params)
        cfg = extract_params.get("config")
        if cfg is None:
            kwargs = {
                k: extract_params[k]
                for k in ("min_len", "max_link_density")
                if k in extract_params
            }
            cfg = ExtractConfig(**kwargs) if kwargs else ExtractConfig()
        self.cfg = cfg
        self.boiler_re = re.compile(cfg.boiler_class_pattern)
        self.tail = [(s.type, coerce_params(s.params)) for s in specs[1:]]
        for _type, params in self.tail:
            if _type == "ReplaceCharsRegex":
                params["_compiled"] = re.compile(params["pattern"])
            if _type == "QualityEstimate" and params.get("lexicon"):
                params["lexicon"] = frozenset(
                    w.lower() for w in params["lexicon"]
                )

    def _process_row(self, raw: Optional[bytes], timings=None):
        """One row: texts through the chain. Returns
        (texts, n_raw, error, stats_items, extracted_text, starts,
        stops, quality)."""
        from time import perf_counter

        error = None
        texts: List[str] = []
        overrides = None
        n_raw = 0
        t0 = perf_counter() if timings is not None else 0.0
        if raw is None:
            error = "empty html"
        else:
            try:
                texts, overrides, stats = extract_document(
                    raw, self.cfg, self.boiler_re
                )
                n_raw = stats["n_raw_lines"]
            except Exception as exc:
                error = f"{type(exc).__name__}: {exc}"
                texts = []
                overrides = None
        if timings is not None:
            now = perf_counter()
            timings["HtmlExtract"] = timings.get("HtmlExtract", 0.0) + (now - t0)
            t0 = now
        repl_stats: Dict[str, int] = {}
        extracted_text = ""
        quality = None
        starts: List[int] = []
        stops: List[int] = []
        for _type, params in self.tail:
            if _type == "ReplaceChars":
                texts, stats = replace_chars(texts, params["dict_chars"])
                for k, v in stats.items():
                    repl_stats[k] = repl_stats.get(k, 0) + v
            elif _type == "ReplaceCharsRegex":
                texts, stats = replace_chars_regex(
                    texts, params["pattern"], params["old"], params["new"]
                )
                for k, v in stats.items():
                    repl_stats[k] = repl_stats.get(k, 0) + v
            elif _type == "FinalizeText":
                pos = 0
                for txt in texts:
                    starts.append(pos)
                    stops.append(pos + len(txt))
                    pos += len(txt) + 1
                extracted_text = "\n".join(texts)
            elif _type == "QualityEstimate":
                quality = estimate_quality(
                    texts, params.get("lexicon"), params.get("minlen", 2)
                )
            if timings is not None:
                now = perf_counter()
                timings[_type] = timings.get(_type, 0.0) + (now - t0)
                t0 = now
        return (texts, n_raw, error, list(repl_stats.items()),
                extracted_text, starts, stops, quality, overrides)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        timings = {} if self.profile else None
        if timings is not None:
            from time import perf_counter

            batch_t0 = perf_counter()
        htmls = batch.column("html").to_pylist()
        n_raw_col, err_col, stats_col, text_col, nl_col = [], [], [], [], []
        qual_cols = {name: [] for name, _ in QUALITY_FIELDS}
        flat_texts: List[str] = []
        flat_starts: List[int] = []
        flat_stops: List[int] = []
        offsets = [0]
        xml_overrides = []  # (flat_pos, ids, geoms) for ALTO/PAGE docs
        for raw in htmls:
            (texts, n_raw, error, stats, extracted, starts, stops,
             quality, overrides) = self._process_row(raw, timings)
            n_raw_col.append(n_raw)
            err_col.append(error)
            stats_col.append(stats)
            text_col.append(extracted)
            nl_col.append(len(texts))
            if overrides is not None and texts:
                xml_overrides.append((offsets[-1],) + overrides)
            flat_texts.extend(texts)
            flat_starts.extend(starts)
            flat_stops.extend(stops)
            offsets.append(offsets[-1] + len(texts))
            if quality is not None:
                for name, _ in QUALITY_FIELDS:
                    qual_cols[name].append(quality[name])

        # columnar construction of the nested lines column: geometry
        # and ids are pure functions of (in-doc index, text length),
        # computed vectorized — no per-line dict allocation.
        total = offsets[-1]
        lengths = np.diff(np.asarray(offsets, dtype=np.int64))
        doc_starts = np.repeat(
            np.asarray(offsets[:-1], dtype=np.int64), lengths
        )
        idx = np.arange(total, dtype=np.int64) - doc_starts
        text_lens = np.fromiter(
            (len(t) for t in flat_texts), dtype=np.int64, count=total
        )
        cfg = self.cfg
        ids = [_line_id(i) for i in idx]
        hpos_arr = np.full(total, cfg.hpos0, dtype=np.int32)
        vpos_arr = (cfg.vpos0 + cfg.line_step * idx).astype(np.int32)
        width_arr = (cfg.char_width * text_lens).astype(np.int32)
        height_arr = np.full(total, cfg.line_height, dtype=np.int32)
        # ALTO/PAGE documents carry REAL element ids + coordinates
        for pos, real_ids, geoms in xml_overrides:
            for j, (rid, (h, v, w, ht)) in enumerate(zip(real_ids, geoms)):
                ids[pos + j] = rid
                hpos_arr[pos + j] = h
                vpos_arr[pos + j] = v
                width_arr[pos + j] = w
                height_arr[pos + j] = ht
        struct = pa.StructArray.from_arrays(
            [
                pa.array(ids, pa.string()),
                pa.array(flat_texts, pa.string()),
                pa.array(flat_starts, pa.int64()),
                pa.array(flat_stops, pa.int64()),
                pa.array(hpos_arr),
                pa.array(vpos_arr),
                pa.array(width_arr),
                pa.array(height_arr),
            ],
            fields=list(LINES_TYPE.value_type),
        )
        lines_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), struct
        )

        out = batch.drop_columns(["html"])
        out = out.append_column("n_raw_lines", pa.array(n_raw_col, pa.int32()))
        out = out.append_column("error", pa.array(err_col, pa.string()))
        out = out.append_column("repl_stats",
                                pa.array(stats_col, REPL_STATS_TYPE))
        out = out.append_column("lines", lines_arr)
        out = out.append_column("extracted_text",
                                pa.array(text_col, pa.string()))
        out = out.append_column("n_lines", pa.array(nl_col, pa.int32()))
        urls = batch.column("url").to_pylist()
        out = out.append_column(
            "doc_id", pa.array([doc_id_from_url(u) for u in urls], pa.string())
        )
        out = out.append_column(
            "page_id",
            pa.array([page_id_from_url(u) for u in urls], pa.string()),
        )
        for name, typ in QUALITY_FIELDS:
            out = out.append_column(name, pa.array(qual_cols[name], typ))
        if timings is not None:
            total = perf_counter() - batch_t0
            timings["arrow_assembly"] = total - sum(timings.values())
            items = [(k, int(v * 1_000_000)) for k, v in timings.items()]
            out = out.append_column(
                "step_wall_us",
                pa.array([items] * out.num_rows,
                         pa.map_(pa.string(), pa.int64())),
            )
        return out


# per-worker-process compiled-chain cache: worker processes persist
# across tasks, so each worker compiles the chain exactly once even on
# the task-pool path (the reference's load-once-per-worker guarantee,
# ocr_pipeline.py:517, without pinning an actor pool).
_FUSED_CACHE: dict = {}


def make_fused_fn(specs: Sequence[StepSpec], profile: bool = False):
    spec_list = [StepSpec(s.type, dict(s.params)) for s in specs]
    key = repr([(s.type, sorted((k, repr(v)) for k, v in s.params.items()))
                for s in spec_list]) + f"|profile={profile}"

    def _fused_fn(batch: pa.Table) -> pa.Table:
        inst = _FUSED_CACHE.get(key)
        if inst is None:
            inst = FusedExtractor(spec_list, profile=profile)
            _FUSED_CACHE[key] = inst
        return inst(batch)

    return _fused_fn


def fused_stage(ds, specs: Sequence[StepSpec], batch_size: int = 64,
                concurrency=None, profile: bool = False):
    """Attach the fused chain.

    Default: TASK pool (cheap per-worker init, full-cluster scaling,
    and Ray fuses read→map→write into one pass). Pass ``concurrency``
    to force an actor pool instead — right when the chain carries
    heavy state (a large lexicon) worth pinning in long-lived actors.
    ``profile=True`` adds the per-step ``step_wall_us`` column.
    """
    if concurrency is None:
        return ds.map_batches(
            make_fused_fn(specs, profile=profile),
            batch_size=batch_size,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    return ds.map_batches(
        FusedExtractor,
        fn_constructor_kwargs={"specs": list(specs), "profile": profile},
        batch_size=batch_size,
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )
