"""Single-process parity oracle — the engine's ground truth.

``process_page`` composes the row-local semantic functions exactly as
the Ray pipeline's default step chain does, but with no Ray, no
batching, no concurrency. Tests assert that the distributed pipeline's
output is byte-identical per url to this oracle (the per-row invariant
from BASELINE.json ``input_hint``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from .extract import ExtractConfig, extract_lines
from .quality import estimate_quality
from .text import replace_chars, replace_chars_regex

DEFAULT_DICT_CHARS = {"ic)": "ich", "s<": "sc", "<": "c"}
DEFAULT_REGEX = ('([aeioubcglnt]3[:-]*")', "3", "s")


def process_page(
    html_bytes: Optional[bytes],
    dict_chars: Dict[str, str] = DEFAULT_DICT_CHARS,
    regex: Tuple[str, str, str] = DEFAULT_REGEX,
    extract_config: ExtractConfig = ExtractConfig(),
    lexicon=None,
) -> Dict[str, object]:
    """One page through the full default chain, single-process."""
    result: Dict[str, object] = {
        "extracted_text": "",
        "lines": [],
        "n_lines": 0,
        "repl_stats": {},
        "error": None,
    }
    quality = estimate_quality([])
    if html_bytes is None:
        result["error"] = "empty html"
        result.update(quality)
        return result
    try:
        lines, _stats = extract_lines(html_bytes, extract_config)
    except Exception as exc:
        result["error"] = f"{type(exc).__name__}: {exc}"
        result.update(quality)
        return result

    texts = [ln["text"] for ln in lines]
    texts, stats_chars = replace_chars(texts, dict_chars)
    texts, stats_regex = replace_chars_regex(texts, *regex)
    merged: Dict[str, int] = dict(stats_chars)
    for key, val in stats_regex.items():
        merged[key] = merged.get(key, 0) + val

    rebuilt: List[dict] = []
    pos = 0
    for ln, txt in zip(lines, texts):
        ln = dict(ln)
        ln["text"] = txt
        ln["start"] = pos
        ln["stop"] = pos + len(txt)
        pos += len(txt) + 1
        rebuilt.append(ln)

    result["lines"] = rebuilt
    result["extracted_text"] = "\n".join(texts)
    result["n_lines"] = len(rebuilt)
    result["repl_stats"] = merged
    result.update(estimate_quality(texts, lexicon))
    return result
