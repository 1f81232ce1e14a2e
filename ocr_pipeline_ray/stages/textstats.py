"""Text-analysis operators: token counts, lang-ID, quality heuristics.

All operate over a string column of a ``ray.data.Dataset`` as
vectorized-or-row-local ``map_batches`` (no shuffle). The arithmetic
is deliberately DuckDB-expressible so every operator has an exact SQL
oracle twin (see ``ocr_pipeline_ray.queries``).
"""

from __future__ import annotations

from typing import Dict, List

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.quality import estimate_quality
from ..functions.text import sanitize_chars

# stopword profiles for the n-gram/stopword language-ID heuristic
STOPWORDS_EN = frozenset({"the", "a"})
STOPWORDS_DE = frozenset({"der", "die", "das", "und"})


def token_count_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """n_tokens = single-space-split token count, fully vectorized.

    Equivalent to ``len(string_split(text, ' '))`` (DuckDB) and
    ``len(text.split(' '))`` (Python): spaces + 1.
    """
    n = pc.add(pc.count_substring(batch.column(text_col), " "), 1)
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def sanitize_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """QA sanitization of a single-line text column (M7 semantics)."""
    texts = batch.column(text_col).to_pylist()
    out = sanitize_chars([t or "" for t in texts])
    return batch.append_column("text_sanitized", pa.array(out, pa.string()))


def lang_id_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID: en/de scores + argmax prediction."""
    texts = batch.column(text_col).to_pylist()
    s_en: List[int] = []
    s_de: List[int] = []
    pred: List[str] = []
    for t in texts:
        toks = (t or "").split(" ")
        en = sum(1 for x in toks if x in STOPWORDS_EN)
        de = sum(1 for x in toks if x in STOPWORDS_DE)
        s_en.append(en)
        s_de.append(de)
        pred.append("en" if en > de else ("de" if de > en else "unk"))
    return (
        batch.append_column("s_en", pa.array(s_en, pa.int64()))
        .append_column("s_de", pa.array(s_de, pa.int64()))
        .append_column("lang_pred", pa.array(pred, pa.string()))
    )


def quality_heuristics_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality features: length, tokens, short/stopword ratios.

    mean_token_len uses ``(len(text) - (n_tokens - 1)) / n_tokens``
    (total chars minus separator spaces) — one exact division, so the
    SQL twin is bit-identical.
    """
    texts = batch.column(text_col).to_pylist()
    cols: Dict[str, List] = {
        "n_chars_text": [], "n_tokens": [], "short_ratio": [],
        "stop_ratio": [], "mean_token_len": [],
    }
    for t in texts:
        t = t or ""
        toks = t.split(" ")
        n = len(toks)
        cols["n_chars_text"].append(len(t))
        cols["n_tokens"].append(n)
        cols["short_ratio"].append(sum(1 for x in toks if len(x) <= 2) / n)
        cols["stop_ratio"].append(sum(1 for x in toks if x in STOPWORDS_EN) / n)
        cols["mean_token_len"].append((len(t) - (n - 1)) / n)
    out = batch
    for name in ("n_chars_text", "n_tokens"):
        out = out.append_column(name, pa.array(cols[name], pa.int64()))
    for name in ("short_ratio", "stop_ratio", "mean_token_len"):
        out = out.append_column(name, pa.array(cols[name], pa.float64()))
    return out


def doc_quality_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Single-line-document quality scoring (StepEstimateOCR contract).

    Treats each row's text as a one-line document through the full
    sanitize → dense filter → token validate → ratio chain; emits
    ``hit_ratio`` (with the -1 sentinel), ``n_words``, ``n_errs``.
    """
    texts = batch.column(text_col).to_pylist()
    ratios, n_words, n_errs = [], [], []
    for t in texts:
        rec = estimate_quality([t or ""])
        ratios.append(rec["hit_ratio"])
        n_words.append(rec["n_words"])
        n_errs.append(rec["n_errs"])
    return (
        batch.append_column("hit_ratio", pa.array(ratios, pa.float64()))
        .append_column("n_words", pa.array(n_words, pa.int64()))
        .append_column("n_errs", pa.array(n_errs, pa.int64()))
    )
