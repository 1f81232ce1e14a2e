"""Declarative pipeline configuration + step registry.

The reference assembles its per-document step chain from INI sections
``step_01..step_NN`` sorted numerically, resolving each section's
``type`` string through ``globals()``
(`/root/reference/ocr_pipeline.py:101-118`). This engine keeps the
same extension surface — a string-typed ordered step list — but with
an explicit registry (no ``globals()`` magic) and upfront parameter
validation. Each registered builder takes ``(ds, params, ctx)`` and
returns the transformed Dataset, so user-defined stages plug in by
registering a builder name.
"""

from __future__ import annotations

import configparser
from dataclasses import dataclass, field
from typing import Callable, Dict, List

from .functions.text import parse_dict, strip_raw_wrapper


@dataclass
class StepSpec:
    type: str
    params: Dict[str, object] = field(default_factory=dict)


@dataclass
class PipelineContext:
    """Per-run sizing knobs shared by all stages."""

    batch_size: int = 64
    concurrency: object = (1, 8)
    quality_batch_size: int = 256
    # fused chain: None → task pool (default); tuple/int → actor pool
    fused_concurrency: object = None


STEP_REGISTRY: Dict[str, Callable] = {}


def register_step(name: str):
    """Decorator: register a stage builder under a config type name."""

    def _wrap(builder: Callable):
        STEP_REGISTRY[name] = builder
        return builder

    return _wrap


def resolve_step(name: str) -> Callable:
    if name not in STEP_REGISTRY:
        raise KeyError(
            f"unknown step type '{name}' — registered: {sorted(STEP_REGISTRY)}"
        )
    return STEP_REGISTRY[name]


def default_steps() -> List[StepSpec]:
    """Default chain mirroring the reference's conf/ocr_config.ini:

    recognition → char replacement → regex replacement → quality.
    ``dict_chars`` matches conf/ocr_config.ini:24 (entities decoded);
    the regex matches tests/resources/ocr_config_full.ini:27-30.
    """
    return [
        StepSpec("HtmlExtract", {}),
        StepSpec("ReplaceChars", {"dict_chars": {"ic)": "ich", "s<": "sc", "<": "c"}}),
        StepSpec(
            "ReplaceCharsRegex",
            {"pattern": '([aeioubcglnt]3[:-]*")', "old": "3", "new": "s"},
        ),
        StepSpec("FinalizeText", {}),
        StepSpec("QualityEstimate", {}),
    ]


def load_steps_ini(path: str) -> List[StepSpec]:
    """Parse an INI pipeline config into ordered StepSpecs.

    Sections ``step_01..step_NN`` sorted numerically, ``type`` key
    picks the registered builder; remaining keys pass through as
    params. ``dict_chars`` accepts the reference's loose
    ``{'a':'b', ...}`` syntax; ``pattern`` may carry the stored
    ``r'...'`` wrapper (tests/resources/ocr_config_full.ini:28) which
    is stripped here.
    """
    cfg = configparser.ConfigParser()
    read = cfg.read(path)
    if not read:
        raise ValueError(f"no pipeline configuration at {path}")
    sections = [s for s in cfg.sections() if s.startswith("step_")]
    ordered = sorted(sections, key=lambda s: int(s.split("_")[1]))
    specs: List[StepSpec] = []
    for section in ordered:
        params = {k: v for k, v in cfg[section].items() if k != "type"}
        if "dict_chars" in params:
            params["dict_chars"] = parse_dict(params["dict_chars"])
        if "pattern" in params:
            params["pattern"] = strip_raw_wrapper(params["pattern"])
        specs.append(StepSpec(cfg.get(section, "type"), params))
    return specs
