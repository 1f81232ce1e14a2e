"""Text-analysis operators: token counts, lang-ID, quality heuristics.

All operate over a string column of a ``ray.data.Dataset`` as
vectorized-or-row-local ``map_batches`` (no shuffle). The arithmetic
is deliberately DuckDB-expressible so every operator has an exact SQL
oracle twin (see ``ocr_pipeline_ray.queries``).
"""

from __future__ import annotations


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


def _token_lists(batch: pa.Table, text_col: str):
    """Vectorized tokenization shared by lang-ID / heuristics.

    Returns ``(flat_tokens, offsets, n_tokens)``: the single-space
    split as one flat Arrow array + int64 doc offsets — per-doc
    reductions become cumsum differences over the flat arrays (no
    Python loop over rows or tokens).
    """
    import numpy as np

    col = pc.fill_null(batch.column(text_col), "")
    parts = pc.split_pattern(col, " ").combine_chunks()
    if isinstance(parts, pa.ChunkedArray):  # single chunk after combine
        parts = parts.chunk(0)
    offsets = parts.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = parts.values
    n_tokens = np.diff(offsets)
    return flat, offsets, n_tokens


def _segment_sum(mask, offsets):
    """Per-doc sums of a flat 0/1 array via cumsum differences
    (empty-list safe, unlike ``np.add.reduceat``)."""
    import numpy as np

    cs = np.concatenate([[0], np.cumsum(mask, dtype=np.int64)])
    return cs[offsets[1:]] - cs[offsets[:-1]]


def lang_id_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID: en/de scores + argmax prediction.

    Vectorized: one split kernel, two ``is_in`` kernels over the flat
    token array, per-doc counts by cumsum difference.
    """
    import numpy as np

    flat, offsets, _ = _token_lists(batch, text_col)
    en_mask = pc.is_in(
        flat, value_set=pa.array(sorted(STOPWORDS_EN))
    ).to_numpy(zero_copy_only=False)
    de_mask = pc.is_in(
        flat, value_set=pa.array(sorted(STOPWORDS_DE))
    ).to_numpy(zero_copy_only=False)
    s_en = _segment_sum(en_mask, offsets)
    s_de = _segment_sum(de_mask, offsets)
    pred = np.where(s_en > s_de, "en", np.where(s_de > s_en, "de", "unk"))
    return (
        batch.append_column("s_en", pa.array(s_en, pa.int64()))
        .append_column("s_de", pa.array(s_de, pa.int64()))
        .append_column("lang_pred", pa.array(pred.tolist(), pa.string()))
    )


def quality_heuristics_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality features: length, tokens, short/stopword ratios.

    mean_token_len uses ``(len(text) - (n_tokens - 1)) / n_tokens``
    (total chars minus separator spaces) — one exact division, so the
    SQL twin is bit-identical. Fully vectorized (Arrow kernels over
    the flat token array + cumsum-difference per-doc reductions; the
    int64→float64 divisions are the same IEEE ops as Python's).
    """
    import numpy as np

    col = pc.fill_null(batch.column(text_col), "")
    flat, offsets, n_tokens = _token_lists(batch, text_col)
    n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
    tok_lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    short = _segment_sum(tok_lens <= 2, offsets)
    stop = _segment_sum(
        pc.is_in(flat, value_set=pa.array(sorted(STOPWORDS_EN)))
        .to_numpy(zero_copy_only=False),
        offsets,
    )
    out = batch
    out = out.append_column("n_chars_text", pa.array(n_chars, pa.int64()))
    out = out.append_column("n_tokens", pa.array(n_tokens, pa.int64()))
    out = out.append_column("short_ratio", pa.array(short / n_tokens,
                                                   pa.float64()))
    out = out.append_column("stop_ratio", pa.array(stop / n_tokens,
                                                   pa.float64()))
    out = out.append_column(
        "mean_token_len",
        pa.array((n_chars - (n_tokens - 1)) / n_tokens, pa.float64()),
    )
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


def tfidf_top_terms(ds, id_col: str = "doc_id", text_col: str = "text",
                    k: int = 3, n_buckets: int = 64):
    """Corpus TF-IDF: top-``k`` terms per document.

    Three stages, all candidate/vocab-scale after the first:

    1. ``map_batches``: per-doc term frequencies → flat
       ``(doc_id, token, tf)`` rows (one row per DISTINCT doc-term).
    2. document frequency = ONE ``groupby(token).count`` over those
       rows (vocab-scale), then a token-keyed ``repartition_join``
       back onto the tf rows — the no-memory-assumption path (a web
       vocabulary does not fit a worker; never broadcast it).
    3. score = tf · ln(N/df); per-doc top-k via the standard bucketed
       shape — hash shuffle by doc bucket, per-bucket Arrow sort
       ``(doc, score desc, token)`` + vectorized segment-rank mask
       (never a per-doc UDF). Ordering uses the 1e-6-GRIDDED score
       (ties break by token) — the same grid the output carries — so
       the DuckDB twin's independently rounded ``ln`` yields the same
       selection whenever it yields the same gridded values.

    N (corpus size) is a driver-side scalar count — metadata-cheap.
    """
    import numpy as np
    from ray.data.aggregate import Count

    from ..functions.hashing import bucket_ids
    from ..functions.segments import key_segments, segment_ranks
    from .join import repartition_join

    n_docs = ds.count()

    def _tf(batch: pa.Table) -> pa.Table:
        ids: list = []
        toks: list = []
        tfs: list = []
        id_vals = batch.column(id_col).to_pylist()
        for did, text in zip(id_vals, batch.column(text_col).to_pylist()):
            if text is None:
                # SQL semantics: unnest(string_split(NULL)) emits no
                # rows; '' emits the single token '' (both engines)
                continue
            counts: dict = {}
            for t in text.split(" "):
                counts[t] = counts.get(t, 0) + 1
            ids.extend([did] * len(counts))
            toks.extend(counts.keys())
            tfs.extend(counts.values())
        return pa.table({
            id_col: pa.array(ids, batch.schema.field(id_col).type),
            "token": pa.array(toks, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
        })

    # tf feeds BOTH the df groupby and the join probe side —
    # materialize once (flat token-scale rows; the object store
    # spills) instead of re-running the tokenize pass
    tf = ds.map_batches(_tf, batch_format="pyarrow").materialize()
    df = tf.groupby("token").aggregate(Count()).map_batches(
        lambda b: pa.table({"token": b.column("token"),
                            "df": pc.cast(b.column("count()"),
                                          pa.int64())}),
        batch_format="pyarrow",
    )
    scored = repartition_join(tf, df, on="token", n_buckets=n_buckets)

    def _bucketize(batch: pa.Table) -> pa.Table:
        return batch.append_column("_dbucket", pa.array(
            bucket_ids(batch.column(id_col), n_buckets), pa.int64()
        ))

    def _topk(group: pa.Table) -> pa.Table:
        base = group.drop_columns(["_dbucket"])
        if group.num_rows == 0:
            return pa.table({
                id_col: pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "score": pa.array([], pa.float64()),
            })
        tfs = base.column("tf").combine_chunks().to_numpy().astype(
            np.float64)
        dfs = base.column("df").combine_chunks().to_numpy().astype(
            np.float64)
        score = tfs * np.log(float(n_docs) / dfs)
        score = np.floor(score * 1000000.0 + 0.5) / 1000000.0
        with_score = base.append_column(
            "score", pa.array(score, pa.float64())
        )
        g = with_score.sort_by([
            (id_col, "ascending"), ("score", "descending"),
            ("token", "ascending"),
        ])
        dids = g.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        seg_start, seg_len = key_segments(dids)
        rank = segment_ranks(seg_start, seg_len)
        top = g.filter(pa.array(rank < k))
        return top.select([id_col, "token", "score"])

    return scored.map_batches(
        _bucketize, batch_format="pyarrow"
    ).groupby(
        "_dbucket", num_partitions=n_buckets
    ).map_groups(_topk, batch_format="pyarrow")
