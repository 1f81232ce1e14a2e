"""The flagship extraction pipeline — pages in, extracted docs out.

Chain (default config = reference conf/ocr_config.ini parity):

``read_parquet(pages)``
→ ``HtmlExtract``      (actor pool, stateful parse — M1/M4/M5)
→ ``ReplaceChars``     (stateless, ordered dict — M2)
→ ``ReplaceCharsRegex``(stateless, first-match — M3)
→ ``FinalizeText``     (extracted_text + span offsets)
→ ``QualityEstimate``  (actor pool, M6-M9 inside)
→ ``write_parquet``    / report aggregation (A1/A2/S5)

Everything streams; nothing materializes the full corpus. The step
chain is assembled from :mod:`ocr_pipeline_ray.config` StepSpecs so
user configs (INI or dicts) order/extend it exactly like the
reference's ``step_01..NN`` sections.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import ray.data

from ..config import (
    PipelineContext,
    StepSpec,
    default_steps,
    register_step,
    resolve_step,
)
from ..functions.extract import ExtractConfig
from ..stages.extract import extract_stage
from ..stages.normalize import (
    finalize_text_fn,
    make_replace_chars_fn,
    make_replace_regex_fn,
)
from ..stages.quality import quality_stage


@register_step("HtmlExtract")
def _build_extract(ds, params, ctx: PipelineContext):
    from ..config import coerce_params

    params = coerce_params(params)
    cfg = params.get("config")
    if cfg is None:
        kwargs = {
            k: params[k]
            for k in ("min_len", "max_link_density")
            if k in params
        }
        cfg = ExtractConfig(**kwargs) if kwargs else None
    return extract_stage(
        ds, config=cfg, batch_size=ctx.batch_size, concurrency=ctx.concurrency
    )


@register_step("ReplaceChars")
def _build_replace_chars(ds, params, ctx: PipelineContext):
    from ..config import coerce_params

    params = coerce_params(params)
    fn = make_replace_chars_fn(dict(params["dict_chars"]),
                               backup=bool(params.get("backup", False)))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


@register_step("ReplaceCharsRegex")
def _build_replace_regex(ds, params, ctx: PipelineContext):
    fn = make_replace_regex_fn(params["pattern"], params["old"], params["new"])
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


@register_step("FinalizeText")
def _build_finalize(ds, params, ctx: PipelineContext):
    return ds.map_batches(
        finalize_text_fn, batch_format="pyarrow", zero_copy_batch=True
    )


@register_step("EmitAlto")
def _build_emit_alto(ds, params, ctx: PipelineContext):
    """Optional ALTO v4 serialization of the extracted lines — the S4
    pretty/CRLF XML writer as an ``alto_xml`` binary column."""
    from ..functions.xmlout import alto_xml_fn

    return ds.map_batches(alto_xml_fn, batch_format="pyarrow",
                          zero_copy_batch=True)


@register_step("QualityEstimate")
def _build_quality(ds, params, ctx: PipelineContext):
    return quality_stage(
        ds,
        lexicon=params.get("lexicon"),
        batch_size=ctx.quality_batch_size,
        concurrency=ctx.concurrency,
    )


def build_pipeline(
    ds: "ray.data.Dataset",
    steps: Optional[Sequence[StepSpec]] = None,
    ctx: Optional[PipelineContext] = None,
    fused: bool = True,
    profile: bool = False,
) -> "ray.data.Dataset":
    """Apply the ordered step chain to a pages Dataset (lazy).

    When the chain matches the fusable default shape, it compiles to
    ONE actor-pool stage (single Arrow↔Python conversion per batch,
    see stages/fused.py); custom step types fall back to one
    ``map_batches`` per step via the registry. ``profile=True`` adds
    the fused chain's per-step ``step_wall_us`` timing column (the
    reference's per-step profile() log at batch granularity; the
    per-step registry path gets per-operator timings from
    ``Dataset.stats()``/lineage instead).
    """
    from ..stages.fused import fused_stage, is_fusable

    ctx = ctx or PipelineContext()
    specs = list(steps) if steps is not None else default_steps()
    if fused and is_fusable(specs):
        return fused_stage(
            ds, specs, batch_size=ctx.batch_size,
            concurrency=ctx.fused_concurrency,
            profile=profile,
        )
    for spec in specs:
        builder = resolve_step(spec.type)
        ds = builder(ds, spec.params, ctx)
    return ds


def read_pages(paths, columns: Optional[List[str]] = None, **kwargs):
    """Read the pages table, pruning to the needed columns at the scan."""
    if columns is None:
        columns = ["url", "warc_ts", "html", "lang"]
    return ray.data.read_parquet(paths, columns=columns, **kwargs)


def extraction_pipeline(
    paths,
    steps: Optional[Sequence[StepSpec]] = None,
    ctx: Optional[PipelineContext] = None,
    **read_kwargs,
) -> "ray.data.Dataset":
    """read → extract → normalize → finalize → score, fully streaming."""
    return build_pipeline(read_pages(paths, **read_kwargs), steps, ctx)
