"""Driver-facing operator queries + their DuckDB oracle SQL twins.

Each entry in :data:`QUERIES` is one operator from SURVEY.md §2 (or a
training-data-pipeline extension: dedup / similarity / text analysis)
expressed as a Ray Data pipeline over the driver's parquet tables
(``documents``, ``embeddings``, ``events``); :data:`ORACLE_SQL` holds
the exact ANSI-SQL twin DuckDB runs on the same tables.

Parity rules baked in everywhere:

* identical column NAMES and types (BIGINT↔int64, DOUBLE↔float64);
* floats only through deterministic formulas shared by both sides —
  ``floor(x*1000+0.5)/1000`` rounding (see ``functions.text.round3``),
  single-division ratios, md5 hex (Python hashlib == DuckDB md5);
* no wall-clock, no randomness.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from typing import Dict

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

from .functions.text import replace_chars_regex, round3
from .stages.dedup import (
    exact_dedup_summary,
    fingerprint_fn,
    minhash_bucket_stats,
    minhash_dup_pairs,
    minhash_signatures,
    simhash_signatures,
    jaccard_dup_pairs,
)
from .stages.similarity import (
    brute_force_topk,
    bucketed_near_dup_pairs,
    embedding_near_dup_pairs,
    lsh_bucketed_topk,
)
from .stages.textstats import (
    doc_quality_fn,
    lang_id_fn,
    quality_heuristics_fn,
    repetition_stats_fn,
    sanitize_fn,
    token_count_fn,
    token_rarity,
)

# ordered replacement table used by the replace_chars demo queries
REPL_KEYS = [("spark", "ray"), ("table", "tbl")]
REGEX_PATTERN, REGEX_OLD, REGEX_NEW = "(s[a-z]*k)", "ar", "er"

# SQL fragment: the M7 sanitize chain (matches functions.text.sanitize_chars
# for single-line text: strip → bad-char removal → '..' → single-pass
# '  '→' ' → ſ→s → drop tokens of length <= 1)
SANITIZE_SQL = (
    "array_to_string(list_filter(string_split("
    "replace(replace(replace(regexp_replace(trim({col}), "
    "'[0-9“„\"''?!*.;:=\\[\\]()|-]', '', 'g'), '..', ''), '  ', ' '), "
    "'ſ', 's'), ' '), x -> length(x) > 1), ' ')"
)

# SQL fragment: single-line-doc quality scoring (doc_quality_fn twin)
QUALITY_SQL = """
WITH s AS (
  SELECT doc_id, {sanitize} AS st FROM documents
), w AS (
  SELECT doc_id, CASE WHEN length(st) > 2 THEN st ELSE '' END AS ws FROM s
), t AS (
  SELECT doc_id,
    CASE WHEN ws = '' THEN 0 ELSE len(string_split(ws, ' ')) END AS nw,
    CASE WHEN ws = '' THEN 0 ELSE len(list_filter(string_split(ws, ' '),
      x -> NOT regexp_matches(x, '^[A-Za-zÄÖÜäöüß]+$'))) END AS ne
  FROM w
)
SELECT doc_id,
  CASE WHEN nw = 0 THEN -1.0
       WHEN nw <= ne THEN 0.0
       ELSE floor(((nw - ne) / CAST(nw AS DOUBLE) * 100.0) * 1000.0 + 0.5) / 1000.0
  END AS hit_ratio,
  CAST(nw AS BIGINT) AS n_words,
  CAST(ne AS BIGINT) AS n_errs
FROM t
""".format(sanitize=SANITIZE_SQL.format(col="text"))


def _docs(sf_dir: str, columns=None):
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=columns or ["doc_id", "text"],
    )


# ------------------------------------------------------------ operators

def q_replace_chars(sf_dir: str):
    """M2: ordered literal substitution (all occurrences, dict order)."""

    def _fn(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        for key, val in REPL_KEYS:
            col = pc.replace_substring(col, key, val)
        return pa.table({"doc_id": batch.column("doc_id"), "text_norm": col})

    return _docs(sf_dir).map_batches(_fn, batch_format="pyarrow")


def q_replace_chars_stats(sf_dir: str):
    """M2 statistics: once-per-doc-per-key counts, sequential keys.

    Partial counts per batch (vectorized contains), merged by a tiny
    groupby — the A3 pattern.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        col = batch.column("text")
        ks, ns = [], []
        for key, val in REPL_KEYS:
            hits = pc.sum(pc.match_substring(col, key)).as_py() or 0
            ks.append(key)
            ns.append(hits)
            col = pc.replace_substring(col, key, val)
        return pa.table({"k": pa.array(ks, pa.string()),
                         "n_docs": pa.array(ns, pa.int64())})

    partials = _docs(sf_dir).map_batches(_partial, batch_format="pyarrow")
    agg = partials.groupby("k").aggregate(Sum("n_docs"))
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["k" if c == "k" else "n_docs" for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def q_replace_regex(sf_dir: str):
    """M3: first regex match per doc, replace that literal everywhere."""

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        out, _stats = replace_chars_regex(
            [t or "" for t in texts], REGEX_PATTERN, REGEX_OLD, REGEX_NEW
        )
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text_regexed": pa.array(out, pa.string()),
        })

    return _docs(sf_dir).map_batches(_fn, batch_format="pyarrow")


def q_sanitize_chars(sf_dir: str):
    """M7: QA character sanitization projection."""
    ds = _docs(sf_dir).map_batches(sanitize_fn, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "text_sanitized"])


def q_token_count(sf_dir: str):
    """Token counting (single-space split), vectorized."""
    ds = _docs(sf_dir).map_batches(token_count_fn, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "n_tokens"])


def q_quality_report(sf_dir: str):
    """M8+M9: per-doc quality record (ratio/words/errs, -1 sentinel)."""
    ds = _docs(sf_dir).map_batches(doc_quality_fn, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "hit_ratio", "n_words", "n_errs"])


def q_quality_bins(sf_dir: str):
    """A1: 5-bin histogram, bin = min(4, ratio // 15), valid docs only."""

    def _partial(batch: pa.Table) -> pa.Table:
        ratios = batch.column("hit_ratio").to_pylist()
        counts: Dict[int, int] = {}
        for r in ratios:
            if r == -1.0:
                continue
            b = min(4, int(r // 15))
            counts[b] = counts.get(b, 0) + 1
        return pa.table({
            "bin": pa.array(list(counts.keys()), pa.int64()),
            "n_docs": pa.array(list(counts.values()), pa.int64()),
        })

    ds = _docs(sf_dir).map_batches(doc_quality_fn, batch_format="pyarrow")
    partials = ds.map_batches(_partial, batch_format="pyarrow")
    agg = partials.groupby("bin").aggregate(Sum("n_docs"))
    return agg.map_batches(
        lambda b: b.rename_columns(
            ["bin" if c == "bin" else "n_docs" for c in b.column_names]
        ),
        batch_format="pyarrow",
    )


def q_corpus_quality_summary(sf_dir: str):
    """A1+A2: corpus mean (round3) + valid/invalid counts, one row."""

    def _partial(batch: pa.Table) -> pa.Table:
        ratios = batch.column("hit_ratio").to_pylist()
        valid = [r for r in ratios if r != -1.0]
        return pa.table({
            "sum_ratio": pa.array([sum(valid)], pa.float64()),
            "n_valid": pa.array([len(valid)], pa.int64()),
            "n_invalid": pa.array([len(ratios) - len(valid)], pa.int64()),
        })

    ds = _docs(sf_dir).map_batches(doc_quality_fn, batch_format="pyarrow")
    total, n_valid, n_invalid = 0.0, 0, 0
    for row in ds.map_batches(_partial, batch_format="pyarrow").iter_rows():
        total += row["sum_ratio"]
        n_valid += row["n_valid"]
        n_invalid += row["n_invalid"]
    mean = round3(total / n_valid) if n_valid else -1.0
    return pa.table({
        "n_valid": pa.array([n_valid], pa.int64()),
        "n_invalid": pa.array([n_invalid], pa.int64()),
        "mean_ratio": pa.array([mean], pa.float64()),
    })


def q_dedup_exact(sf_dir: str):
    """D1: exact dedup summary by content hash (first doc_id wins)."""
    return exact_dedup_summary(_docs(sf_dir))


def q_dedup_first_rows(sf_dir: str):
    """D1 keep-ONE-ROW dedup: first-wins per key, bucketed shape.

    Groups documents by a 2-hex md5 prefix of the content (~181
    non-trivial groups at sf0.01) and keeps the row with the minimum
    ``doc_id`` per group — the keep-row variant of D1 first-wins
    (`/root/reference/ocr_pipeline.py:335`), executed as ONE
    crc32-bucketed shuffle with a whole-bucket Arrow
    sort + key-boundary mask (no per-key UDF invocations).
    """
    from .stages.dedup import dedup_first

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang", "n_chars"])

    def _key(batch: pa.Table) -> pa.Table:
        fps = [
            hashlib.md5((t or "").encode("utf-8")).hexdigest()[:2]
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({
            "grp": pa.array(fps, pa.string()),
            "doc_id": batch.column("doc_id"),
            "lang": batch.column("lang"),
            "n_chars": pc.cast(batch.column("n_chars"), pa.int64()),
        })

    keyed = ds.map_batches(_key, batch_format="pyarrow")
    return dedup_first(keyed, key_col="grp", order_col="doc_id")


def q_fingerprint(sf_dir: str):
    """Document fingerprinting: md5 content hash + 16-hex prefix."""

    def _fn(batch: pa.Table) -> pa.Table:
        out = fingerprint_fn(batch)
        fps = out.column("fp")
        return pa.table({
            "doc_id": out.column("doc_id"),
            "fp": fps,
            "fp16": pc.utf8_slice_codeunits(fps, 0, 16),
        })

    return _docs(sf_dir).map_batches(_fn, batch_format="pyarrow")


def q_winnow_fingerprint(sf_dir: str):
    """Winnowing rolling-hash fingerprint (SIGMOD'03 technique),
    oracle-checked: 8-token sliding windows, per-window 32-bit md5
    minima, distinct-count + global min reproduced in SQL."""
    from .stages.dedup import winnow_fingerprint_fn

    return _docs(sf_dir).map_batches(
        winnow_fingerprint_fn, batch_format="pyarrow"
    )


def q_lang_stats(sf_dir: str):
    """Per-language corpus stats (groupby + partial-friendly aggs)."""
    ds = _docs(sf_dir, ["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(Count(), Sum("n_chars"))

    def _finish(batch: pa.Table) -> pa.Table:
        names = {"count()": "n_docs", "sum(n_chars)": "sum_chars"}
        batch = batch.rename_columns(
            [names.get(c, c) for c in batch.column_names]
        )
        n_docs = batch.column("n_docs").to_pylist()
        sum_chars = batch.column("sum_chars").to_pylist()
        avg = [s / n for s, n in zip(sum_chars, n_docs)]
        return (
            pa.table({
                "lang": batch.column("lang"),
                "n_docs": pc.cast(batch.column("n_docs"), pa.int64()),
                "sum_chars": pc.cast(batch.column("sum_chars"), pa.int64()),
                "avg_chars": pa.array(avg, pa.float64()),
            })
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def q_lang_id(sf_dir: str):
    """Stopword-profile language identification."""
    ds = _docs(sf_dir).map_batches(lang_id_fn, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "s_en", "s_de", "lang_pred"])


def q_lang_confusion(sf_dir: str):
    """Label-quality audit: confusion matrix of the DECLARED lang
    column vs the stopword-profile detector — the "how dirty are my
    labels" rollup. Map-side (declared, predicted) partial counts,
    one tiny groupby (languages² cells)."""
    from ray.data.aggregate import Sum

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"]).map_batches(
        lang_id_fn, batch_format="pyarrow")

    def _partial(batch: pa.Table) -> pa.Table:
        sub = pa.table({
            "lang_declared": batch.column("lang"),
            "lang_pred": batch.column("lang_pred"),
        })
        agg = sub.group_by(
            ["lang_declared", "lang_pred"]).aggregate([([],
                                                        "count_all")])
        return pa.table({
            "lang_declared": agg.column("lang_declared"),
            "lang_pred": agg.column("lang_pred"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    out = ds.map_batches(_partial, batch_format="pyarrow").groupby(
        ["lang_declared", "lang_pred"]).aggregate(Sum("n"))
    return out.map_batches(
        lambda b: pa.table({
            "lang_declared": b.column("lang_declared"),
            "lang_pred": b.column("lang_pred"),
            "n": pc.cast(b.column("sum(n)"), pa.int64()),
        }), batch_format="pyarrow")


def q_host_entropy(sf_dir: str):
    """Corpus source-diversity index: Shannon entropy (nats) of the
    host distribution over the synthetic crawl — the one-number
    "how concentrated is my crawl" gauge (a single mega-host drives
    entropy toward 0). Host counts come from the existing map-side
    partial combine; the entropy math runs on the driver over the
    hosts-scale count table, mirrored term-for-term in SQL and
    grid-rounded."""
    from .stages.web import host_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"])
    urls = docs.map_batches(_url_augment, batch_format="pyarrow")
    counts = host_stats(urls, url_col="url")
    ns = []
    for b in counts.iter_batches(batch_format="pyarrow",
                                 batch_size=None):
        ns.extend(b.column("n_docs").to_pylist())
    total = float(sum(ns))
    ent = -sum((n / total) * math.log(n / total) for n in sorted(ns))
    ent = math.floor(ent * 1000000.0 + 0.5) / 1000000.0
    return pa.table({
        "n_hosts": pa.array([len(ns)], pa.int64()),
        "entropy_nats": pa.array([ent], pa.float64()),
    })


def q_quality_heuristics(sf_dir: str):
    """Quality-scoring features (length/short/stopword/mean-token-len)."""
    ds = _docs(sf_dir).map_batches(
        quality_heuristics_fn, batch_format="pyarrow"
    )
    return ds.select_columns(
        ["doc_id", "n_chars_text", "n_tokens", "short_ratio",
         "stop_ratio", "mean_token_len"]
    )


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals: duplicate/top bigram fractions."""
    return _docs(sf_dir).map_batches(
        repetition_stats_fn, batch_format="pyarrow"
    )


def q_token_rarity(sf_dir: str):
    """CCNet-style corpus-frequency rarity: per-doc mean df."""
    return token_rarity(_docs(sf_dir))


def _pii_augment(batch: pa.Table) -> pa.Table:
    """Deterministically embed one email / phone / IPv4 per doc.

    The synthetic documents contain no PII, so the redaction queries
    plant it: doc_id-derived, reproducible in SQL with the same
    string concatenation (bit_and == % for the non-negative ids).
    """
    ids = batch.column("doc_id")
    ids_s = pc.cast(ids, pa.string())
    x = pc.binary_join_element_wise(
        pc.fill_null(batch.column("text"), ""),
        " contact user", ids_s,
        "@mail.example.com or +1-555-",
        pc.cast(pc.add(ids, 1000000), pa.string()),
        " at 10.",
        pc.cast(pc.bit_wise_and(ids, 255), pa.string()),
        ".0.",
        pc.cast(pc.bit_wise_and(ids, 63), pa.string()),
        "",
    )
    return pa.table({"doc_id": ids, "text": x})


def q_pii_redact(sf_dir: str):
    """PII scrub: typed placeholders + per-doc hit counts.

    Vectorized RE2 kernels (Arrow and DuckDB share the dialect), one
    count+replace pass per pattern in contract order.
    """
    from .stages.pii import pii_redact_fn

    def _fn(batch: pa.Table) -> pa.Table:
        return pii_redact_fn(_pii_augment(batch)).drop_columns(["text"])

    return _docs(sf_dir).map_batches(_fn, batch_format="pyarrow")


def q_pii_summary(sf_dir: str):
    """Corpus-level PII totals (ONE row, map-side partial combine)."""
    from .stages.pii import pii_summary

    aug = _docs(sf_dir).map_batches(_pii_augment, batch_format="pyarrow")
    return pii_summary(aug)


def _url_augment(batch: pa.Table) -> pa.Table:
    """Deterministic skewed url per doc: every 3rd doc lands on
    ``host0`` (the hot host of the synthetic crawl), the rest spread
    over 96 more hosts — mirrors the SQL CASE in the oracles."""
    ids = batch.column("doc_id")
    hot = pc.equal(_int_mod(ids, 3), 0)
    host_id = pc.if_else(
        hot, pa.scalar(0, pa.int64()), _int_mod(ids, 97)
    )
    url = pc.binary_join_element_wise(
        "http://host", pc.cast(host_id, pa.string()),
        ".example.com/p/", pc.cast(ids, pa.string()), "",
    )
    return batch.append_column("url", url)


def _int_mod(col, d: int):
    """Non-negative int64 modulo via truncating divide (Arrow has no
    modulo kernel) — equals SQL ``%`` for the non-negative ids."""
    q = pc.divide(col, pa.scalar(d, pa.int64()))
    return pc.subtract(col, pc.multiply(q, pa.scalar(d, pa.int64())))


# SQL twin of _url_augment's host id
_HOST_ID_SQL = ("CASE WHEN doc_id % 3 = 0 THEN 0 "
                "ELSE doc_id % 97 END")


def q_host_stats(sf_dir: str):
    """Per-host rollup over the skewed synthetic crawl.

    Map-side partial combine per block, then ONE small groupby —
    the hot host (``host0``, a third of the corpus) enters the
    shuffle as one row per block, not one per document.
    """
    from .stages.web import host_stats

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"]).map_batches(
        _url_augment, batch_format="pyarrow"
    )
    return host_stats(ds, size_col="n_chars")


def q_host_blocklist(sf_dir: str):
    """Blocklist hygiene gate: drop docs on blocked hosts.

    Broadcast ANTI join against a 10-host blocklist — the corpus
    never shuffles; the blocklist ships once via the object store.
    """
    from .stages.web import blocklist_filter

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    )
    blocked = [f"host{h}.example.com" for h in range(0, 97, 10)]
    return blocklist_filter(ds, blocked).sort("doc_id")


def q_host_cap(sf_dir: str):
    """Domain balancing: keep at most 5 docs per host (smallest
    doc_id wins) over the skewed synthetic crawl — the hot host
    (1/3 of the corpus) is cut to 5 like everyone else. One
    key-hash-bucketed shuffle, whole-bucket sort + rank mask; oracle
    is the ``row_number() OVER (PARTITION BY host)`` twin."""
    from .stages.dedup import group_cap
    from .stages.web import url_host_fn

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(url_host_fn, batch_format="pyarrow")
    capped = group_cap(ds, key_col="host", order_col="doc_id", k=5,
                       n_buckets=32)
    return capped.select_columns(["doc_id", "host"])


def q_paragraph_dedup(sf_dir: str):
    """CCNet-style paragraph dedup with doc reassembly.

    Each doc is wrapped in synthetic boilerplate: a semi-shared
    header (one of 40) and a corpus-wide footer (the hot key — one
    md5 group holding every doc). First occurrence wins corpus-wide;
    docs are rebuilt from surviving paragraphs. Two paragraph-sized
    shuffles, no per-key UDFs.
    """
    from .stages.dedup import paragraph_dedup

    sep = "\n\n"

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        t = pc.binary_join_element_wise(
            "shared ", pc.cast(_int_mod(ids, 40), pa.string()), sep,
            pc.fill_null(batch.column("text"), ""), sep,
            "common footer", "",
        )
        return pa.table({"doc_id": ids, "text": t})

    aug = _docs(sf_dir).map_batches(_aug, batch_format="pyarrow")
    return paragraph_dedup(aug, sep=sep).sort("doc_id")


def q_pagerank(sf_dir: str):
    """Distributed integer PageRank (3 power iterations, d=0.85) over
    a deterministic synthetic link graph on the documents table
    (doc i links to (7i+1)%N, plus (13i+2)%N when i%3>=1, plus
    (29i+5)%N when i%3==2 — 1..3 outlinks, parallel edges possible).

    All-int64 arithmetic (scaled ranks, integer division) makes the
    fixed-iteration result bit-exact vs the DuckDB join-chain twin —
    summation order cannot perturb it. Per iteration: rank join +
    out-degree fused into ONE src-bucket exchange, then one
    contribution-sum groupby with map-side partial combine.
    """
    import numpy as np

    from .stages.graph import pagerank_int

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        m1, m2 = ids % 3 >= 1, ids % 3 == 2
        src = np.concatenate([ids, ids[m1], ids[m2]])
        dst = np.concatenate([(ids * 7 + 1) % n,
                              (ids[m1] * 13 + 2) % n,
                              (ids[m2] * 29 + 5) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def _as_node(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id")})

    nodes = docs.map_batches(_as_node, batch_format="pyarrow")
    edges = docs.map_batches(_edges, batch_format="pyarrow")
    ranks = pagerank_int(nodes, edges, iters=3, n_buckets=32)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "rank_score": batch.column("rank")})

    return ranks.map_batches(_rename, batch_format="pyarrow").sort(
        "doc_id")


def q_hits(sf_dir: str):
    """Integer fixed-point HITS hub/authority scores (2 iterations)
    over the same deterministic synthetic link graph as q_pagerank
    (stages/graph.py ``hits_int``). All-int64 arithmetic with
    int-division L1 renormalization per half-step makes the result
    bit-exact vs the unrolled DuckDB join-chain twin. Per half-step:
    ONE bucket exchange (edges cached pre-tagged per key side) plus a
    blocks-scale driver fold of the normalization total."""
    import numpy as np

    from .stages.graph import hits_int

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        m1, m2 = ids % 3 >= 1, ids % 3 == 2
        src = np.concatenate([ids, ids[m1], ids[m2]])
        dst = np.concatenate([(ids * 7 + 1) % n,
                              (ids[m1] * 13 + 2) % n,
                              (ids[m2] * 29 + 5) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def _as_node(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id")})

    nodes = docs.map_batches(_as_node, batch_format="pyarrow")
    edges = docs.map_batches(_edges, batch_format="pyarrow")
    scores = hits_int(nodes, edges, iters=2, n_buckets=32)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "auth": batch.column("auth"),
                         "hub": batch.column("hub")})

    return scores.map_batches(_rename, batch_format="pyarrow").sort(
        "doc_id")


def q_redirect_resolve(sf_dir: str):
    """Redirect-chain resolution (stages/graph.py
    ``resolve_chains``): every url follows its 3xx chain to the
    FINAL target — pointer doubling, so a length-L chain resolves in
    ceil(log2 L) exchanges (chains here reach ~log2(N) hops: doc i
    with i%7 != 0 redirects to i//2; multiples of 7 and 0 are
    terminal). The oracle follows the same chains with a recursive
    CTE; the engine's per-round plan is two scans of the current
    mapping into one (key,ptr)-bucket co-shuffle."""
    import numpy as np

    from .stages.graph import resolve_chains

    docs = _docs(sf_dir, columns=["doc_id"])

    def _mapping(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = ids[ids % 7 != 0]
        return pa.table({"src": pa.array(ids, pa.int64()),
                         "dst": pa.array(ids // 2, pa.int64())})

    # n_buckets sizes the per-round co-shuffle fan-out; 8 matches
    # the toy mapping here (at real scale pass ~cluster cores)
    resolved = resolve_chains(
        docs.map_batches(_mapping, batch_format="pyarrow"),
        n_buckets=8)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("src"),
                         "final_id": batch.column("final")})

    return resolved.map_batches(_rename, batch_format="pyarrow").sort(
        "doc_id")


def q_pagerank_pregel(sf_dir: str):
    """Same graph, same int64 PageRank semantics and oracle as
    q_pagerank, Pregel physical plan: edges partitioned once into
    shard actors (never re-shuffled); per iteration only node-scale
    contribution partials flow point-to-point between shards — no
    sort barrier per iteration."""
    import numpy as np

    from .stages.graph import pagerank_pregel

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        m1, m2 = ids % 3 >= 1, ids % 3 == 2
        src = np.concatenate([ids, ids[m1], ids[m2]])
        dst = np.concatenate([(ids * 7 + 1) % n,
                              (ids[m1] * 13 + 2) % n,
                              (ids[m2] * 29 + 5) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def _as_node(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id")})

    nodes = docs.map_batches(_as_node, batch_format="pyarrow")
    edges = docs.map_batches(_edges, batch_format="pyarrow")
    ranks = pagerank_pregel(nodes, edges, iters=3, n_shards=8)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "rank_score": batch.column("rank")})

    return ranks.map_batches(_rename, batch_format="pyarrow").sort(
        "doc_id")


def q_substring_dedup(sf_dir: str):
    """ExactSubstr duplicate-span removal (Lee et al. 2022) at
    token granularity: every token covered by a 5-token window whose
    exact text occurs >= 2 times corpus-wide is removed; docs rebuilt
    from surviving tokens. Two window-row shuffles, rebuild fully
    vectorized (diff-array coverage + ListArray/binary_join)."""
    from .stages.dedup import substring_dedup

    return substring_dedup(_docs(sf_dir), w=5, n_buckets=32).sort(
        "doc_id")


def q_heavy_hitters(sf_dir: str):
    """EXACT frequent tokens (>= 3.3% of all corpus tokens).

    Candidates from a per-block local threshold (shuffle carries only
    locally-heavy tokens — never the vocabulary), exact counts from a
    second candidate-only pass, integer threshold arithmetic.
    """
    from .stages.stats import heavy_hitters

    return heavy_hitters(
        _docs(sf_dir), min_frac_num=33, min_frac_den=1000
    ).sort(["n", "token"], descending=[True, False])


def q_url_canonicalize(sf_dir: str):
    """URL canonicalization over five messy variants per doc.

    Uppercase scheme/host, default ports, fragments, utm_* params and
    bare root slashes are planted by doc_id formula; the ORACLE
    derives the expected canonical url INDEPENDENTLY from the same
    formulas (not by re-running the regex chain), so a rewrite bug
    cannot cancel out.
    """
    from .stages.web import canonicalize_url_fn

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        ids_s = pc.cast(ids, pa.string())
        hid = pc.cast(_int_mod(ids, 97), pa.string())
        v = _int_mod(ids, 5)

        def _join(*parts):
            return pc.binary_join_element_wise(*parts, "")

        u0 = _join("HTTP://Host", hid, ".Example.COM:80/p/", ids_s,
                   "#sec")
        u1 = _join("https://host", hid, ".example.com:443/")
        u2 = _join("https://host", hid, ".example.com/p/", ids_s,
                   "?utm_source=feed&utm_medium=rss")
        u3 = _join("http://host", hid, ".example.com/p/", ids_s,
                   "?a=1&utm_x=2")
        u4 = _join("http://host", hid, ".example.com/p/", ids_s)
        url = pc.if_else(
            pc.equal(v, 0), u0,
            pc.if_else(pc.equal(v, 1), u1,
                       pc.if_else(pc.equal(v, 2), u2,
                                  pc.if_else(pc.equal(v, 3), u3, u4))))
        return pa.table({"doc_id": ids, "url": url})

    aug = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aug, batch_format="pyarrow")
    return aug.map_batches(canonicalize_url_fn, batch_format="pyarrow")


def q_nfc_normalize(sf_dir: str):
    """Unicode NFC normalization with a vectorized ASCII fast path.

    The synthetic corpus text is pure ASCII (NFC by definition), so the
    query first plants decomposed accents deterministically ('e' ->
    'e' + U+0301 combining acute) and then normalizes: rows containing
    'e' exercise the Python compose path, the rest ride the zero-copy
    ASCII identity path. The ORACLE applies DuckDB's independent
    ``nfc_normalize`` implementation to the same decomposed input, so
    the compose table itself is load-bearing.
    """
    from .stages.normalize import nfc_normalize_fn

    def _decompose(batch: pa.Table) -> pa.Table:
        txt = pc.replace_substring(batch.column("text"), "e", "e\u0301")
        return pa.table({"doc_id": batch.column("doc_id"), "text": txt})

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _decompose, batch_format="pyarrow")
    ds = ds.map_batches(nfc_normalize_fn, batch_format="pyarrow")
    return ds.select_columns(["doc_id", "text_nfc"])


def q_inverted_index(sf_dir: str):
    """Exact inverted index: token → (df, doc_ids, tfs) postings.

    Map-side (token, doc_id, tf) combine, bucketed whole-bucket
    posting-list build (one sort + ListArray per bucket — never a
    per-token UDF), deterministic 16-posting cap with the full df
    and a truncated flag (no silent loss).
    """
    from .stages.index import inverted_index

    idx = inverted_index(_docs(sf_dir), max_postings=16)

    def _csv(batch: pa.Table) -> pa.Table:
        # the driver's value-hash compares scalars — CSV-encode the
        # posting lists (the operator itself emits real list columns)
        def _join(col):
            return pc.binary_join(
                pc.cast(col, pa.list_(pa.string())), ",")
        return pa.table({
            "token": batch.column("token"),
            "df": batch.column("df"),
            "doc_ids_csv": _join(batch.column("doc_ids")),
            "tfs_csv": _join(batch.column("tfs")),
            "truncated": batch.column("truncated"),
        })

    return idx.map_batches(_csv, batch_format="pyarrow").sort("token")


def q_minhash_signatures(sf_dir: str):
    """MinHash band values (md5-based, 4 salts, 3-token shingles)."""
    return minhash_signatures(_docs(sf_dir))


def q_minhash_dup_pairs(sf_dir: str):
    """LSH candidate pairs: docs sharing any minhash band."""
    return minhash_dup_pairs(_docs(sf_dir))


def q_minhash_banded_pairs(sf_dir: str):
    """(b=3 bands × r=2 rows) LSH banding: candidate pairs whose BOTH
    minhashes of some band agree — the precision-tuned S-curve
    variant of ``minhash_dup_pairs`` (which is the r=1 corner)."""
    from .stages.dedup import minhash_banded_pairs

    return minhash_banded_pairs(_docs(sf_dir), b=3, r=2)


# Multi-phrase dictionary for dictionary_tag — drawn from the
# synthetic corpus vocabulary; NO phrase is a prefix of another, so
# the tagger's longest-first tiebreak never fires and the SQL twin
# is a plain per-term overlap count.
TAG_TERMS = (
    "batch batch", "slow join", "merge data",
    "window window", "sort merge", "data row",
)


def q_dictionary_tag(sf_dir: str):
    """Phrase-dictionary tagging: (doc_id, term, n_hits) for every
    dictionary phrase occurring in the doc, overlaps counted (one
    automaton pass per doc across the whole lexicon; actor pool)."""
    from .stages.textstats import dictionary_tag

    return dictionary_tag(
        _docs(sf_dir, columns=["doc_id", "text"]), TAG_TERMS)


def q_prefix_dup(sf_dir: str):
    """Truncation-mirror groups: docs sharing the md5 of their first
    32 tokens (head-hash dedup; exact-dedup shape, (pfp, id) shuffle
    only)."""
    from .stages.dedup import prefix_dup_groups

    return prefix_dup_groups(
        _docs(sf_dir, columns=["doc_id", "text"]), p=32)


def q_char_entropy(sf_dir: str):
    """Per-doc character-level Shannon entropy (nats, round6) — the
    gibberish/binary-junk curation signal; row-local, no shuffle."""
    from .stages.textstats import char_entropy_fn

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        char_entropy_fn, batch_format="pyarrow")


def q_oov_rate(sf_dir: str):
    """Tokenizer-coverage report: per-doc OOV fraction against the
    corpus's own top-100 vocabulary (global token totals → tiny
    top-V sort → broadcast is_in scan; all-integer until the final
    division)."""
    from .stages.textstats import oov_rate

    return oov_rate(_docs(sf_dir, columns=["doc_id", "text"]), v=100)


def q_simhash(sf_dir: str):
    """64-bit SimHash per document (hex string)."""
    return simhash_signatures(_docs(sf_dir))


def q_dedup_incremental_bloom(sf_dir: str):
    """Incremental exact dedup with a Bloom semi-join reduction:
    identical result to ``dedup_incremental`` (same oracle), but the
    existing-corpus side is pre-filtered at scan speed by a Bloom
    bitmap built over the new batch's fingerprints — the shuffle
    into the exact anti join carries new-batch-scale rows, not
    corpus-scale. See stages/dedup.py incremental_dedup_bloom.
    """
    from .stages.bucketed import checkpoint_bucketed
    from .stages.dedup import incremental_dedup_bloom

    def _fp(batch: pa.Table) -> pa.Table:
        b = fingerprint_fn(batch)
        return pa.table({"doc_id": b.column("doc_id"),
                         "fp": b.column("fp")})

    # md5 the corpus ONCE; the fp table is narrow (id + 32-hex per
    # doc) but corpus-ROW-count scale, so checkpoint it to bucketed
    # parquet rather than pin it — both sides are then scan-speed
    # filters over the storage-backed re-read
    fps = checkpoint_bucketed(
        _docs(sf_dir).map_batches(_fp, batch_format="pyarrow"),
        f"incbloom_{os.path.basename(os.path.normpath(sf_dir))}",
        key_col="doc_id")

    def _odd(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 1))

    def _even(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
        ).select(["fp"])

    new_fp = fps.map_batches(_odd, batch_format="pyarrow")
    old_fp = fps.map_batches(_even, batch_format="pyarrow")
    return incremental_dedup_bloom(new_fp, old_fp).sort("doc_id")


def q_jaccard_dup_pairs(sf_dir: str):
    """MinHash candidates verified by exact n-gram Jaccard >= 0.8.

    Distributed verification (no driver-side candidate
    materialization) — see stages/dedup.py jaccard_dup_pairs.
    """
    return jaccard_dup_pairs(_docs(sf_dir))


def q_containment_pairs(sf_dir: str):
    """MinHash candidates re-scored by exact shingle CONTAINMENT
    |A∩B| / min(|A|,|B|) >= 0.9 — the asymmetric-overlap detector
    (a short doc quoted inside a long one scores 1.0 where Jaccard
    stays small). Same distributed verification machinery as
    `jaccard_dup_pairs`, metric switched."""
    return jaccard_dup_pairs(_docs(sf_dir), threshold=0.9,
                             metric="containment")


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup: a NEW batch (odd doc_ids) kept only
    where its content fingerprint is absent from the EXISTING corpus
    (even doc_ids).

    The daily-ingest shape at 100 TB: both sides reduce to
    ``(fp[, id])`` rows before the anti join — content never moves —
    and the repartition anti join makes no memory assumption about
    the reference fingerprint store.
    """
    from .stages.join import repartition_join

    def _odd_fp(batch: pa.Table) -> pa.Table:
        # parity filter BEFORE hashing: each scan md5s only its half
        b = fingerprint_fn(batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 1)
        ))
        return pa.table({"doc_id": b.column("doc_id"),
                         "fp": b.column("fp")})

    def _even_fp(batch: pa.Table) -> pa.Table:
        b = fingerprint_fn(batch.filter(
            pc.equal(pc.bit_wise_and(batch.column("doc_id"), 1), 0)
        ))
        return pa.table({"fp": b.column("fp")})

    new_fp = _docs(sf_dir).map_batches(_odd_fp, batch_format="pyarrow")
    old_fp = _docs(sf_dir).map_batches(_even_fp, batch_format="pyarrow")
    return repartition_join(
        new_fp, old_fp, on="fp", how="anti"
    ).sort("doc_id")


def q_decontaminate(sf_dir: str):
    """Benchmark DECONTAMINATION: corpus docs sharing any 3-token
    shingle with the benchmark set (here: doc_id < 10 stands in for
    the eval suite), with the distinct-overlap count.

    The 100-TB shape: the benchmark shingle set is tiny and
    broadcast ONCE through the object store; every corpus batch does
    one set intersection per doc — no shuffle, scan-speed.
    """
    import ray as ray_core

    from .stages.dedup import _cached_get, shingles

    bench_rows = (
        _docs(sf_dir).filter(expr="doc_id < 10").take_all()
    )
    bench: set = set()
    for r in bench_rows:
        bench.update(shingles((r["text"] or "").split(" "), 3))
    ref = ray_core.put(frozenset(bench))

    def _overlap(batch: pa.Table) -> pa.Table:
        bset = _cached_get(ref)
        ids, counts = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            if did < 10 or text is None:
                continue
            n = len(set(shingles(text.split(" "), 3)) & bset)
            if n >= 1:
                ids.append(did)
                counts.append(n)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_overlap": pa.array(counts, pa.int64()),
        })

    return _docs(sf_dir).map_batches(
        _overlap, batch_format="pyarrow"
    ).sort("doc_id")


def q_dup_clusters(sf_dir: str):
    """Near-dup CLUSTERS: transitive closure over the MinHash
    candidate pairs, cluster id = min doc_id of the component.

    Distributed min-label propagation with pointer doubling
    (stages/cluster.py) — all shuffles are over the candidate pair
    list, never the corpus. The DuckDB oracle reproduces the closure
    with a recursive CTE over the same bit-exact pair set.
    """
    from .stages.cluster import connected_components

    cl = connected_components(minhash_dup_pairs(_docs(sf_dir)),
                              a_col="d1", b_col="d2")

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("node"), pa.int64()),
            "cluster_id": pc.cast(batch.column("cluster"), pa.int64()),
        })

    return cl.map_batches(_fin, batch_format="pyarrow").sort("doc_id")


def q_dup_cluster_sizes(sf_dir: str):
    """Near-dup cluster-SIZE histogram: how many clusters of each
    size the corpus carries — the dedup-audit rollup an operator
    reads before deciding thresholds ("are dups pairs, or giant
    templates?"). Composition: connected components over the MinHash
    pairs, then a (cluster -> size -> histogram) double partial
    combine — both aggregates are cluster-member-scale, the corpus
    never moves."""
    from ray.data.aggregate import Count

    from .stages.cluster import connected_components

    cl = connected_components(minhash_dup_pairs(_docs(sf_dir)),
                              a_col="d1", b_col="d2")
    sizes = cl.groupby("cluster").aggregate(Count())

    def _hist(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("count()"))
        return pa.table({
            "cluster_size": pc.cast(vc.field("values"), pa.int64()),
            "n_clusters": pc.cast(vc.field("counts"), pa.int64()),
        })

    out = sizes.map_batches(_hist, batch_format="pyarrow")
    totals: Dict[int, int] = {}
    for b in out.iter_batches(batch_format="pyarrow",
                              batch_size=None):
        for s, n in zip(b.column("cluster_size").to_pylist(),
                        b.column("n_clusters").to_pylist()):
            totals[s] = totals.get(s, 0) + n
    ks = sorted(totals)
    return pa.table({
        "cluster_size": pa.array(ks, pa.int64()),
        "n_clusters": pa.array([totals[s] for s in ks], pa.int64()),
    })


def q_dedup_canonical(sf_dir: str):
    """Corpus survivors after near-dup clustering: ONE canonical
    (min-id) document per cluster, all unclustered docs kept.

    The drop set (non-canonical members) is cluster-member-scale and
    is broadcast once; the corpus itself is filtered with a
    vectorized ``is_in`` — no corpus shuffle (stages/cluster.py
    ``canonical_filter``).
    """
    from .stages.cluster import canonical_filter, connected_components

    clusters = connected_components(minhash_dup_pairs(_docs(sf_dir)))
    docs = _docs(sf_dir, columns=["doc_id", "n_chars"])

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("doc_id"), pa.int64()),
            "n_chars": pc.cast(batch.column("n_chars"), pa.int64()),
        })

    return canonical_filter(docs, clusters).map_batches(
        _fin, batch_format="pyarrow"
    ).sort("doc_id")


HOT_BUCKET_CAP = 3  # deliberately tiny so truncation telemetry is non-zero


def q_lsh_recall(sf_dir: str):
    """Recall telemetry for the MinHash LSH path, ORACLE-CHECKED.

    One row: candidate pairs found by LSH banding, candidates that
    verify at true Jaccard ≥ 0.8, ALL pairs at true Jaccard ≥ 0.8
    (exact twin, distributed block-pair join), and recall =
    verified / true. Makes the LSH path's recall<1 a measured number
    the DuckDB oracle reproduces end to end.
    """
    from .stages.dedup import _round6 as round6
    from .stages.dedup import jaccard_all_pairs

    docs = _docs(sf_dir)
    n_cand = minhash_dup_pairs(docs).count()
    n_ver = jaccard_dup_pairs(_docs(sf_dir)).count()
    n_true = jaccard_all_pairs(_docs(sf_dir)).count()
    recall = 1.0 if n_true == 0 else round6(n_ver / n_true)
    return pa.table({
        "n_candidates": pa.array([n_cand], pa.int64()),
        "n_verified": pa.array([n_ver], pa.int64()),
        "n_true": pa.array([n_true], pa.int64()),
        "recall": pa.array([recall], pa.float64()),
    })


def q_embedding_lsh_recall(sf_dir: str):
    """Recall of the hyperplane-LSH embedding near-dup path vs its
    exact block-pair twin (rows-only: the plane matmul is not
    SQL-expressible; the exact side IS oracle-checked separately via
    ``embedding_near_dup``)."""
    from .stages.similarity import embedding_lsh_recall

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return embedding_lsh_recall(ds, threshold=0.90)


def q_near_dup_bucket_stats(sf_dir: str):
    """Hot-bucket telemetry for the embedding-LSH cap (rows-only
    companion to the oracle-checked ``minhash_hot_buckets``)."""
    from .stages.similarity import near_dup_bucket_stats

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
    return near_dup_bucket_stats(ds, max_bucket=100)


def q_minhash_hot_buckets(sf_dir: str):
    """Hot-bucket cap telemetry: what a max_bucket cap would drop."""
    return minhash_bucket_stats(_docs(sf_dir), max_bucket=HOT_BUCKET_CAP)


def _query_vec(sf_dir: str, vec_id: int = 0):
    rows = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet")
        .filter(expr=f"vec_id == {vec_id}")
        .take(1)
    )
    return rows[0]["embedding"]


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-10 vs the vec_id=0 query vector."""
    q = _query_vec(sf_dir, 0)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return brute_force_topk(ds, q, k=10, exclude_id=0)


def q_ann_topk_lsh(sf_dir: str):
    """LSH-bucketed approximate top-10 (scale path; no SQL oracle)."""
    q = _query_vec(sf_dir, 0)
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return lsh_bucketed_topk(ds, q, k=10, exclude_id=0, probes=4)


NEAR_DUP_THRESHOLD = 0.5


def q_ann_topk_ivf(sf_dir: str):
    """IVF-quantizer ANN (scale path #2; rows-only like the LSH
    paths — centroid math is not SQL-expressible; pytest pins the
    subset-of-exact property)."""
    from .stages.similarity import ivf_topk

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return ivf_topk(ds, _query_vec(sf_dir), k=10, exclude_id=0)


def q_embedding_near_dup(sf_dir: str):
    """All embedding pairs with cosine > threshold (v1 < v2) — exact,
    via the distributed block-pair join (stages/similarity.py).

    Returned as a concrete Arrow table so the (v1, v2) schema survives
    even when no pair crosses the threshold (the PAIR set is tiny by
    definition; the vectors themselves never leave the object store).
    """
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(ds, threshold=NEAR_DUP_THRESHOLD)
    schema = pa.schema([("v1", pa.int64()), ("v2", pa.int64())])
    return pa.Table.from_pylist(pairs.take_all(), schema=schema)


def q_embedding_near_dup_lsh(sf_dir: str):
    """Approximate near-dup pairs via hyperplane-signature buckets —
    the 10^12-scale path (recall < 1 by construction; no SQL oracle)."""
    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    pairs = bucketed_near_dup_pairs(ds, threshold=NEAR_DUP_THRESHOLD)
    schema = pa.schema([("v1", pa.int64()), ("v2", pa.int64())])
    return pa.Table.from_pylist(pairs.take_all(), schema=schema)


def q_prefix_jaccard_pairs(sf_dir: str):
    """EXACT set-similarity self-join via AllPairs prefix filtering
    (stages/dedup.py ``prefix_jaccard_pairs``): recall 1.0 vs the
    O(N²) scan by the prefix-filter theorem, candidates generated
    only from each doc's rarest (df-ordered) prefix shingles. The
    oracle is the exact all-pairs join — identity, not recall, is
    the claim."""
    from .stages.dedup import prefix_jaccard_pairs

    return prefix_jaccard_pairs(
        _docs(sf_dir), threshold=0.8).sort(["d1", "d2"])


def q_semantic_dedup(sf_dir: str):
    """SemDeDup (stages/similarity.py ``semantic_dedup``): k-means
    clusters the embedding space (bit-exact integer Lloyd), then
    cosine near-dups are searched WITHIN each cluster only, keeping
    the lowest-id representative per neighborhood. The pair space
    shrinks from O(N²) to per-cluster quadratic — the algorithm's own
    scale knob is k. Oracle: the chained-CTE Lloyd twin + a
    same-cluster NOT EXISTS anti-join."""
    from .stages.similarity import semantic_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return semantic_dedup(
        ds, k=KMEANS_K, iters=KMEANS_ITERS,
        threshold=NEAR_DUP_THRESHOLD, scale=KMEANS_SCALE,
    ).sort("vec_id")


PACK_SEQ_LEN = 512


def q_packed_windows(sf_dir: str):
    """Materialized packed training windows, exploded to (seq_id,
    pos, tok) rows for the oracle. The engine emits the loader-ready
    ``(seq_id, n_filled, tokens list<int64>)`` windows
    (``stages/pack.pack_windows``: tokenize once, token hashes ride
    the packing plan's band exchange, token rows co-shuffle by window
    bucket, whole-bucket lexsort assembly)."""
    import numpy as np

    from .stages.pack import pack_windows

    wins = pack_windows(_docs(sf_dir), seq_len=PACK_SEQ_LEN)

    def _explode(batch: pa.Table) -> pa.Table:
        col = batch.column("tokens").combine_chunks()
        lens = np.asarray(pc.list_value_length(col), dtype=np.int64)
        flat = np.asarray(col.flatten(), dtype=np.int64)
        seq = batch.column("seq_id").combine_chunks().to_numpy() \
            .astype(np.int64)
        pos = (np.arange(len(flat), dtype=np.int64)
               - np.repeat(np.concatenate(([0], np.cumsum(lens)))[:-1],
                           lens))
        return pa.table({
            "seq_id": pa.array(np.repeat(seq, lens), pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "tok": pa.array(flat, pa.int64()),
        })

    return wins.map_batches(_explode, batch_format="pyarrow")


def q_mix_sample(sf_dir: str):
    """Deterministic data-mix rebalance: downsample the skewed lang
    distribution (~40% en) toward an even 5-way mix. One exact group
    count + one row-local integer hash-coin filter — zero shuffles
    (``stages/stats.mix_sample``).
    """
    from .stages.stats import mix_sample

    docs = _docs(sf_dir, columns=["doc_id", "lang"])
    return mix_sample(
        docs, group_col="lang",
        weights={"en": 1, "de": 1, "fr": 1, "es": 1, "zh": 1},
        key_col="doc_id")


def q_doc_embed(sf_dir: str):
    """Feature-hashing document embeddings, exploded to nonzero
    cells for the oracle (the engine keeps the fixed-dim vector
    column — it feeds the ANN/near-dup stack;
    ``stages/textstats.hash_embed`` is row-local, vocabulary-free,
    zero shuffles)."""
    import numpy as np

    from .stages.textstats import hash_embed

    vecs = hash_embed(_docs(sf_dir), dim=64)

    def _explode(batch: pa.Table) -> pa.Table:
        col = batch.column("embedding").combine_chunks()
        n = len(col)
        mat = np.asarray(col.flatten()).reshape(n, 64)
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        doc, d = np.nonzero(mat)
        return pa.table({
            "doc_id": pa.array(ids[doc], pa.int64()),
            "d": pa.array(d.astype(np.int64), pa.int64()),
            "val": pa.array(mat[doc, d], pa.int64()),
        })

    return vecs.map_batches(_explode, batch_format="pyarrow")


def q_shuffle_shards(sf_dir: str):
    """Deterministic hash-shuffle into 16 training shards.

    The 100-TB substitute for ``random_shuffle``: shard and
    within-shard order derive from md5(doc_id) — uniform like a
    random permutation, but bit-reproducible, layout-independent,
    resumable per shard, and exactly one content move
    (``stages/pack.shuffle_shards``).
    """
    from .stages.pack import shuffle_shards

    return shuffle_shards(_docs(sf_dir, columns=["doc_id"]),
                          n_shards=16)


def q_skew_join_enrich(sf_dir: str):
    """Skew-aware hybrid join: documents enriched with per-lang totals.

    ``lang`` is the skewed key (~40% of the corpus is 'en'): a plain
    repartition join lands nearly half the rows in one bucket. The
    skew join detects hot keys with an exact map-side histogram,
    routes the hot mass through a zero-shuffle broadcast join, and
    co-shuffles only the balanced cold remainder
    (``stages/join.skew_join``; equals the plain join by contract,
    equivalence-tested in pytest across layouts and join types).
    """
    from ray.data.aggregate import Sum

    from .stages.join import skew_join

    docs = _docs(sf_dir, columns=["doc_id", "lang"])

    def _partial(batch: pa.Table) -> pa.Table:
        vc = pc.value_counts(batch.column("lang").combine_chunks())
        return pa.table({
            "lang": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    totals = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby("lang").aggregate(Sum("n"))
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "lang": batch.column("lang"),
            "lang_total": pc.cast(batch.column("sum(n)"), pa.int64()),
        })

    totals = totals.map_batches(
        _rename, batch_format="pyarrow").materialize()
    # the right side IS the left-key histogram — reuse it as the hot
    # set instead of paying skew_join's detection scan+exchange
    hot = [r["lang"] for r in totals.take_all()
           if r["lang_total"] >= 100]
    return skew_join(docs, totals, on="lang",
                     right_cols=["lang_total"], hot_count=100,
                     hot=hot)


LM_MIN_COUNT = 2
LM_SCALE = 1_000_000


def q_lm_score(sf_dir: str):
    """CCNet-style bigram-LM document scoring (integer-exact).

    Train = one corpus pass of map-side Counters into two small
    groupbys (unigram counts + min_count-pruned bigram model); score
    = one broadcast-model corpus pass, zero shuffles. ``mean_ipp``
    is the add-one-smoothed mean inverse conditional probability
    ×1e6 in pure int64 — the perplexity-gate signal without the
    float-log hash hazard (see stages/lm.py; a no-memory-assumption
    ``join="shuffle"`` twin is equivalence-tested in pytest).
    """
    from .stages.lm import lm_score, train_bigram_lm

    ds = _docs(sf_dir)
    uni, bi, vocab = train_bigram_lm(ds, min_count=LM_MIN_COUNT)
    return lm_score(ds, uni, bi, vocab, scale=LM_SCALE)


def _lm_score_sql(min_count: int, scale: int) -> str:
    return (
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t "
        "FROM documents), "
        "big AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM toks, "
        "LATERAL unnest(generate_series(1, len(t) - 1)) AS r(i)), "
        "uni AS (SELECT token, CAST(count(*) AS BIGINT) AS c FROM "
        "(SELECT unnest(string_split(text, ' ')) AS token "
        "FROM documents) GROUP BY token), "
        "v AS (SELECT count(*) AS vs FROM uni), "
        "bic AS (SELECT w1 || ' ' || w2 AS pair, "
        "CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2 "
        f"HAVING count(*) >= {min_count}), "
        "scored AS (SELECT b.doc_id, "
        f"((u.c + v.vs) * {scale}) // (COALESCE(bc.c12, 0) + 1) AS ipp, "
        "CASE WHEN bc.c12 IS NULL THEN 1 ELSE 0 END AS oov "
        "FROM big b "
        "LEFT JOIN bic bc ON bc.pair = b.w1 || ' ' || b.w2 "
        "JOIN uni u ON u.token = b.w1 CROSS JOIN v), "
        "per_doc AS (SELECT doc_id, count(*) AS nb, sum(oov) AS noov, "
        "sum(ipp) AS ssum FROM scored GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(p.nb, 0) AS BIGINT) AS n_bigrams, "
        "CAST(COALESCE(p.noov, 0) AS BIGINT) AS n_oov, "
        "CAST(CASE WHEN p.nb IS NULL THEN -1 ELSE p.ssum // p.nb END "
        "AS BIGINT) AS mean_ipp "
        "FROM documents d LEFT JOIN per_doc p USING (doc_id)"
    )


def q_split_leakage_safe(sf_dir: str):
    """Near-dup-aware train/val/test split: all documents of one
    near-dup CLUSTER land in the same split, so paraphrased or
    lightly-edited copies can never straddle train/test (the leakage
    `q_dataset_split`'s content hash only blocks for EXACT dups).

    Chain: MinHash candidates -> distributed connected components
    (all shuffles candidate-scale) -> the node->cluster map
    broadcasts once (cluster-scale) -> one row-local pass hashes
    md5(cluster id, or own doc_id when unclustered) into 90/5/5.
    """
    import hashlib

    import ray

    from .stages.cluster import connected_components
    from .stages.dedup import _cached_get

    docs = _docs(sf_dir)
    clusters = connected_components(
        minhash_dup_pairs(docs), a_col="d1", b_col="d2")
    mapping: dict = {}
    for b in clusters.iter_batches(batch_format="pyarrow"):
        mapping.update(zip(b.column("node").to_pylist(),
                           b.column("cluster").to_pylist()))
    map_ref = ray.put(mapping)

    def _split(batch: pa.Table) -> pa.Table:
        m = _cached_get(map_ref)
        ids = batch.column("doc_id").to_pylist()
        buckets = [
            int(hashlib.md5(
                str(m.get(i, i)).encode("utf-8")).hexdigest()[:8], 16)
            % 100
            for i in ids
        ]
        splits = [
            "train" if b < 90 else ("val" if b < 95 else "test")
            for b in buckets
        ]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(splits, pa.string()),
        })

    return docs.map_batches(_split, batch_format="pyarrow")


def q_lm_buckets(sf_dir: str):
    """CCNet's head/middle/tail corpus partition, end to end: bigram
    LM scoring -> exact tercile cuts over the scored docs -> row-local
    bucket map. The full chain is one oracle (train + score + exact
    quantiles + bucketing all load-bearing in the SQL twin)."""
    from .stages.bucketed import checkpoint_bucketed
    from .stages.lm import lm_score, train_bigram_lm
    from .stages.stats import exact_quantiles

    ds = _docs(sf_dir)
    uni, bi, vocab = train_bigram_lm(ds, min_count=LM_MIN_COUNT)
    # score the corpus ONCE; the per-doc score table has two
    # consumers (tercile cuts + bucket map), so checkpoint it to
    # bucketed parquet instead of pinning corpus-row-count rows
    scored = checkpoint_bucketed(
        lm_score(ds, uni, bi, vocab, scale=LM_SCALE),
        f"lmbuckets_{os.path.basename(os.path.normpath(sf_dir))}",
        key_col="doc_id")

    def _scored_only(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater_equal(batch.column("mean_ipp"), pa.scalar(0)))

    ok = scored.map_batches(_scored_only, batch_format="pyarrow")
    qt = exact_quantiles(ok, "mean_ipp", [0.33, 0.66])
    cuts = dict(zip(qt.column("q").to_pylist(),
                    qt.column("value").to_pylist()))
    c1, c2 = cuts[0.33], cuts[0.66]

    def _bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        m = batch.column("mean_ipp").combine_chunks().to_numpy() \
            .astype(np.int64)
        lab = np.where(
            m < 0, "unscored",
            np.where(m <= c1, "head",
                     np.where(m <= c2, "middle", "tail")))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "mean_ipp": batch.column("mean_ipp"),
            "bucket": pa.array(lab.tolist(), pa.string()),
        })

    return scored.map_batches(_bucket, batch_format="pyarrow")


KMEANS_K = 8
KMEANS_ITERS = 3
KMEANS_SCALE = 1_000_000


def q_kmeans_assign(sf_dir: str):
    """Full-corpus distributed k-means (Lloyd's) cluster assignment.

    The shuffle-free broadcast-partials shape: per iteration ONE
    map_batches pass emits k-row int64 partial sums per block, the
    driver merges k tiny rows, and the next centroid matrix is
    closure-broadcast. Pure integer arithmetic (floor-quantized
    vectors, trunc-div centroid update) makes the assignment
    bit-exact vs the chained-CTE DuckDB twin — like ``pagerank``,
    summation order cannot perturb it.
    """
    from .stages.kmeans import kmeans_int

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    assign, _ = kmeans_int(ds, k=KMEANS_K, iters=KMEANS_ITERS,
                           scale=KMEANS_SCALE)
    return assign


def _kmeans_sql(k: int, iters: int, scale: int) -> str:
    """Chained-CTE Lloyd twin: v = floor-quantized exploded vectors;
    per iteration an argmin-assign CTE (row_number over summed int
    squared-L2, ties -> lowest cluster) and a trunc-div centroid
    CTE (empty clusters COALESCE to the previous centroid)."""

    def _it(i: int) -> str:
        return (
            f"a{i} AS (SELECT vec_id, cluster FROM ("
            f"SELECT v.vec_id, c.cluster, row_number() OVER ("
            f"PARTITION BY v.vec_id "
            f"ORDER BY sum((v.x - c.x)*(v.x - c.x)), c.cluster) AS rn "
            f"FROM v JOIN c{i} c USING (d) "
            f"GROUP BY v.vec_id, c.cluster) WHERE rn = 1), "
            f"c{i + 1} AS (SELECT c.cluster, c.d, COALESCE(m.x, c.x) AS x "
            f"FROM c{i} c LEFT JOIN ("
            f"SELECT a.cluster, v.d, sum(v.x) // count(*) AS x "
            f"FROM a{i} a JOIN v USING (vec_id) "
            f"GROUP BY a.cluster, v.d) m "
            f"ON m.cluster = c.cluster AND m.d = c.d)"
        )

    chain = ", ".join(_it(i) for i in range(iters))
    return (
        "WITH v AS (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS d, "
        f"CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) "
        "AS BIGINT) AS x FROM embeddings), "
        "init AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 "
        "AS cluster FROM (SELECT DISTINCT vec_id FROM v "
        f"ORDER BY vec_id LIMIT {k})), "
        "c0 AS (SELECT i.cluster, v.d, v.x FROM init i "
        f"JOIN v USING (vec_id)), {chain} "
        "SELECT vec_id, cluster FROM ("
        "SELECT v.vec_id, c.cluster, row_number() OVER ("
        "PARTITION BY v.vec_id "
        "ORDER BY sum((v.x - c.x)*(v.x - c.x)), c.cluster) AS rn "
        f"FROM v JOIN c{iters} c USING (d) "
        "GROUP BY v.vec_id, c.cluster) WHERE rn = 1"
    )


def q_user_activity(sf_dir: str):
    """Per-user event aggregate with map-side partial combining.

    The skew-mitigation shape from SURVEY §7.3: each batch pre-combines
    (user_id → count, sum) so a hot user contributes ONE row per block
    to the shuffle instead of every event — the salted-key pattern's
    effect without a second pass, since count/sum are commutative.
    """

    def _partial(batch: pa.Table) -> pa.Table:
        from .stages.stats import partial_sum_count

        return partial_sum_count(batch, ["user_id"], "value")

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])
    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n_events"), Sum("sum_value"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        sums = [
            math.floor(s * 1000000.0 + 0.5) / 1000000.0
            for s in batch.column("sum(sum_value)").to_pylist()
        ]
        return pa.table({
            "user_id": batch.column("user_id"),
            "n_events": pc.cast(batch.column("sum(n_events)"), pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def q_top_tokens(sf_dir: str):
    """Corpus top-50 vocabulary — partial Counters, tiny shuffle,
    deterministic tie-break (count desc, token asc)."""

    def _partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for tok in (text or "").split(" "):
                counts[tok] = counts.get(tok, 0) + 1
        return pa.table({
            "token": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })

    ds = _docs(sf_dir, ["text"])
    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby(
        "token"
    ).aggregate(Sum("n"))

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "token": batch.column("token"),
            "n": pc.cast(batch.column("sum(n)"), pa.int64()),
        })

    return (
        agg.map_batches(_rename, batch_format="pyarrow")
        .sort(key=["n", "token"], descending=[True, False])
        .limit(50)
    )


def q_token_pair_counts(sf_dir: str):
    """Corpus top-20 adjacent token pairs — the statistic behind a
    BPE tokenizer's first merge choice. Same shape as top_tokens:
    map-side partial Counters over per-doc pair streams, one small
    groupby, deterministic (count desc, pair asc) top-k."""

    def _partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            if text is None:
                continue
            toks = text.split(" ")
            for a, b in zip(toks, toks[1:]):
                p = a + " " + b
                counts[p] = counts.get(p, 0) + 1
        return pa.table({
            "pair": pa.array(list(counts.keys()), pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        })

    agg = (
        _docs(sf_dir, ["text"])
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("pair").aggregate(Sum("n"))
    )
    return (
        agg.map_batches(
            lambda b: pa.table({
                "pair": b.column("pair"),
                "n": pc.cast(b.column("sum(n)"), pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .sort(key=["n", "pair"], descending=[True, False])
        .limit(20)
    )


def q_extraction_flagship(sf_dir: str):
    """FLAGSHIP: the full extraction pipeline, oracle-checked.

    Wraps each document's text into a deterministic HTML page (nav +
    footer boilerplate around one main paragraph), runs the COMPLETE
    chain (DOM parse + boilerplate strip → ordered char/regex
    normalization → finalize → quality scoring) and returns per-url
    extracted text + quality. Because the embedded main content is the
    single-spaced document text (html-escaped in, entity-decoded out)
    and the default replacement tables don't fire on it, the oracle is
    expressible in SQL: extracted_text == text, quality == the
    single-line scoring formula.
    """
    import html as html_mod

    from .pipelines.extraction import build_pipeline

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls = [f"doc://{i}" for i in ids]
        htmls = [
            (
                "<html><head><title>d</title></head><body>"
                "<nav><ul><li><a href='/x'>Start</a></li></ul></nav>"
                f"<p>{html_mod.escape(t or '')}</p>"
                "<footer><p>Impressum Kontakt</p></footer>"
                "</body></html>"
            ).encode("utf-8")
            for t in texts
        ]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": batch.column("lang"),
        })

    pages = ds.map_batches(_to_pages, batch_format="pyarrow")
    out = build_pipeline(pages)

    def _cast(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "extracted_text": batch.column("extracted_text"),
            "hit_ratio": batch.column("hit_ratio"),
            "n_words": pc.cast(batch.column("n_words"), pa.int64()),
            "n_errs": pc.cast(batch.column("n_errs"), pa.int64()),
        })

    return out.map_batches(_cast, batch_format="pyarrow")


def q_extraction_wraps(sf_dir: str):
    """M6 dehyphenation, ORACLE-CHECKED end to end.

    Each document's page carries a CONSTRUCTED hyphen wrap: the main
    paragraph is ``tok0-<br>rest`` — so extraction yields two lines,
    the first ending in ``-``. The quality chain merges the wrap
    (``sanitize_wraps``: pop the next line's first token, append sans
    hyphen — `/root/reference/lib/ocr_step.py:472-494`), so
    ``n_wraps=1`` and the scored word string starts with the FUSED
    token ``tok0tok1``; ``extracted_text`` keeps the raw hyphen (M6
    feeds scoring only). The DuckDB twin rebuilds both lines, the
    merge, sanitization and scoring from the original token stream —
    every M6 semantic is load-bearing in the hash.
    """
    import html as html_mod

    from .pipelines.extraction import build_pipeline

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls = [f"doc://{i}" for i in ids]
        htmls = []
        for t in texts:
            toks = (t or "").split(" ")
            first, rest = toks[0], " ".join(toks[1:])
            htmls.append((
                "<html><body>"
                "<nav><ul><li><a href='/x'>Start</a></li></ul></nav>"
                f"<p>{html_mod.escape(first)}-<br>{html_mod.escape(rest)}</p>"
                "<footer><p>Impressum Kontakt</p></footer>"
                "</body></html>"
            ).encode("utf-8"))
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": batch.column("lang"),
        })

    out = build_pipeline(ds.map_batches(_to_pages, batch_format="pyarrow"))

    def _cast(batch: pa.Table) -> pa.Table:
        cols = {"url": batch.column("url"),
                "extracted_text": batch.column("extracted_text"),
                "hit_ratio": batch.column("hit_ratio")}
        for name in ("n_words", "n_errs", "n_lines_in", "n_wraps",
                     "n_shorts", "n_lines_out"):
            cols[name] = pc.cast(batch.column(name), pa.int64())
        return pa.table(cols)

    return out.map_batches(_cast, batch_format="pyarrow")


def q_corpus_filter(sf_dir: str):
    """C4-style training-corpus quality FILTER, oracle-checked: keep
    documents passing vectorized heuristic gates (min length, token
    count, bounded short-token ratio, bounded mean token length) —
    the canonical cleaning step ahead of dedup/split in a web-scale
    data pipeline. Pure row-local predicate: no shuffle, prunes at
    full scan speed."""
    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    def _fn(batch: pa.Table) -> pa.Table:
        feats = quality_heuristics_fn(batch)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(feats.column("n_tokens"), 30),
                pc.greater_equal(feats.column("n_chars_text"), 200),
            ),
            pc.and_(
                pc.less_equal(feats.column("short_ratio"), 0.30),
                pc.less_equal(feats.column("mean_token_len"), 12.0),
            ),
        )
        f = feats.filter(keep)
        return pa.table({
            "doc_id": f.column("doc_id"),
            "lang": f.column("lang"),
            "n_tokens": f.column("n_tokens"),
            "n_chars_text": f.column("n_chars_text"),
        })

    return ds.map_batches(_fn, batch_format="pyarrow")


def q_tfidf_top_terms(sf_dir: str):
    """Corpus TF-IDF, top-3 terms per doc — flat tf rows, one
    vocab-scale df groupby, token-keyed repartition join (a web
    vocabulary is never broadcast), bucketed per-doc top-k. See
    stages/textstats.tfidf_top_terms."""
    from .stages.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(sf_dir), k=3).sort(["doc_id", "token"])


QUANTILE_QS = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def q_corpus_quantiles(sf_dir: str):
    """EXACT percentile_disc quantiles of doc length, distributed.

    Map-side value_counts partial combine → one groupby over the
    DISTINCT-VALUE histogram → driver cumsum (histogram-scale only;
    the corpus streams through once). Matches DuckDB
    ``quantile_disc`` bit-for-bit — see stages/stats.py.
    """
    from .stages.stats import exact_quantiles

    t = exact_quantiles(
        _docs(sf_dir, columns=["n_chars"]), "n_chars", QUANTILE_QS
    )
    return pa.table({
        "q": t.column("q"),
        "value": pc.cast(t.column("value"), pa.int64()),
    })


def q_lang_quantiles(sf_dir: str):
    """Exact per-language doc-length quantiles (grouped
    percentile_disc — stages/stats.grouped_quantiles)."""
    from .stages.stats import grouped_quantiles

    t = grouped_quantiles(
        _docs(sf_dir, columns=["lang", "n_chars"]), "lang", "n_chars",
        [0.25, 0.5, 0.9],
    )
    return pa.table({
        "lang": t.column("key"),
        "q": t.column("q"),
        "value": pc.cast(t.column("value"), pa.int64()),
    })


def q_corpus_p10_cut(sf_dir: str):
    """Percentile-cut quality gate: drop the shortest decile.

    Composition shape for a 100-TB filter: ONE streaming pass
    computes the exact p10 (histogram combine, stages/stats.py), the
    threshold is a scalar closure, and the corpus filters at scan
    speed on a second pruned pass — no shuffle anywhere.
    """
    from .stages.stats import exact_quantiles

    p10 = exact_quantiles(
        _docs(sf_dir, columns=["n_chars"]), "n_chars", [0.1]
    ).column("value")[0].as_py()
    docs = _docs(sf_dir, columns=["doc_id", "n_chars"])
    return docs.filter(expr=f"n_chars > {p10}").map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "n_chars": pc.cast(b.column("n_chars"), pa.int64()),
        }),
        batch_format="pyarrow",
    ).sort("doc_id")


def q_approx_distinct_tokens(sf_dir: str):
    """KMV (k-minimum-values) distinct-count sketch, ORACLE-CHECKED
    including the ESTIMATE itself.

    Classic sketch (Bar-Yossef et al. 2002): keep the k smallest
    md5-derived hash values over the distinct tokens; estimate
    distinct ≈ (k−1) / max-of-k-normalized. Because the hash is md5
    (deterministic, SQL-reproducible) the DuckDB twin recomputes the
    exact same estimate — a sketch whose approximation error is
    itself oracle-pinned. Distributed shape: each block emits its k
    smallest distinct hashes (bytes per block), the driver-side merge
    is one tiny groupby; the EXACT side is a distinct-count groupby
    for comparison. One output row: (n_exact, k, kmv_estimate).
    """
    import numpy as np

    from .stages.dedup import _round6

    k = 16
    ds = _docs(sf_dir)

    def _partial_hashes(batch: pa.Table) -> pa.Table:
        seen = set()
        for t in batch.column("text").to_pylist():
            for tok in (t or "").split(" "):
                if tok not in seen:
                    seen.add(tok)
        hs = np.unique(np.fromiter(
            (int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16)
             for t in seen),
            dtype=np.uint64, count=len(seen),
        ))[:k]
        return pa.table({"hv": pa.array(hs, pa.uint64())})

    partials = ds.map_batches(_partial_hashes, batch_format="pyarrow")
    merged = np.unique(np.concatenate([
        b.column("hv").to_numpy(zero_copy_only=False)
        for b in partials.iter_batches(batch_format="pyarrow")
    ] + [np.empty(0, dtype=np.uint64)]))[:k]

    # exact twin: distributed distinct count (groupby on the token)
    def _toks(batch: pa.Table) -> pa.Table:
        toks = sorted({
            tok
            for t in batch.column("text").to_pylist()
            for tok in (t or "").split(" ")
        })
        return pa.table({"tok": pa.array(toks, pa.string())})

    n_exact = ds.map_batches(_toks, batch_format="pyarrow") \
        .groupby("tok").count().count()

    if len(merged) < k:
        estimate = float(len(merged))
    else:
        estimate = _round6((k - 1) / (float(merged[-1]) / 4294967296.0))
    return pa.table({
        "n_exact": pa.array([n_exact], pa.int64()),
        "k": pa.array([k], pa.int64()),
        "kmv_estimate": pa.array([estimate], pa.float64()),
    })


def q_stratified_sample(sf_dir: str):
    """Deterministic ~20% stratified sample per language: hash-based
    (md5 of doc content), no RNG, reproducible across runs and block
    layouts — the sampling primitive for eval-set carving. Row-local
    predicate, no shuffle."""
    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"])

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        keep = [
            int(hashlib.md5((t or "").encode("utf-8")).hexdigest()[:8], 16)
            % 100 < 20
            for t in texts
        ]
        f = batch.filter(pa.array(keep))
        return pa.table({
            "doc_id": f.column("doc_id"),
            "lang": f.column("lang"),
        })

    return ds.map_batches(_fn, batch_format="pyarrow")


def q_top_docs_per_lang(sf_dir: str):
    """Group-wise top-k (top 3 docs per language by n_chars, doc_id
    tie-break) — computed the scalable way: vectorized PARTIAL top-k
    per block (argsort + head inside map_batches), then one tiny
    global groupby over blocks×k candidate rows. The full dataset
    never sorts."""
    import numpy as np

    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
    k = 3

    def _partial_topk(batch: pa.Table) -> pa.Table:
        langs = np.asarray(batch.column("lang").to_pylist())
        ids = batch.column("doc_id").combine_chunks().to_numpy()
        chars = batch.column("n_chars").combine_chunks().to_numpy()
        keep_idx = []
        for lang in np.unique(langs):
            sel = np.flatnonzero(langs == lang)
            # top-k by (-n_chars, doc_id): lexsort last key primary
            order = np.lexsort((ids[sel], -chars[sel]))
            keep_idx.extend(sel[order[:k]])
        f = batch.take(pa.array(sorted(keep_idx), pa.int64()))
        return pa.table({
            "lang": f.column("lang"),
            "doc_id": f.column("doc_id"),
            "n_chars": pc.cast(f.column("n_chars"), pa.int64()),
        })

    def _final_topk(group: pa.Table) -> pa.Table:
        g = group.sort_by([("lang", "ascending"),
                           ("n_chars", "descending"),
                           ("doc_id", "ascending")])
        langs = g.column("lang").to_pylist()
        rank_in_lang, seen = [], {}
        for lang in langs:
            seen[lang] = seen.get(lang, 0) + 1
            rank_in_lang.append(seen[lang])
        mask = pa.array([r <= k for r in rank_in_lang])
        return g.filter(mask)

    cands = ds.map_batches(_partial_topk, batch_format="pyarrow")
    # candidates = blocks × langs × k rows — tiny; one single-group
    # pass finishes the selection
    return (
        cands.map_batches(
            lambda b: b.append_column(
                "_g", pa.nulls(b.num_rows, pa.int64()).fill_null(0)
            ),
            batch_format="pyarrow",
        )
        .groupby("_g")
        .map_groups(
            lambda g: _final_topk(g.drop_columns(["_g"])),
            batch_format="pyarrow",
        )
    )


def q_quality_rank(sf_dir: str):
    """Global ``ROW_NUMBER`` + ``NTILE(4)`` over the whole corpus by
    ``(n_chars, doc_id)`` — the window function a curriculum /
    percentile-gate pipeline needs. Physical plan = the distributed
    zipWithIndex shape (`stages/rank.py`): one range-partitioned
    sort, block offsets from METADATA only, one task per block to
    attach ranks; NTILE derived from the rank in exact integer
    arithmetic (ANSI semantics)."""
    from .stages.rank import global_rank

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])
    ranked = global_rank(ds, ["n_chars", "doc_id"], ntile_k=4,
                         rank_col="rnk", ntile_col="tile")

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(batch.column("n_chars"), pa.int64()),
            "rnk": batch.column("rnk"),
            "tile": batch.column("tile"),
        })

    # no display sort: the output is corpus-sized, already in a
    # deterministic (score, doc_id) order, and the gate's compare is
    # order-insensitive — a second full exchange would be pure waste
    return ranked.map_batches(_shape, batch_format="pyarrow")


def q_source_overlap(sf_dir: str):
    """Cross-SOURCE contamination audit: for every pair of corpus
    sources, the count of distinct 3-token shingles they share —
    the governance matrix that decides "source B is contained in A"
    before any per-document dedup. One deduped
    ``(shingle, source-bitmask)`` exchange, whole-bucket OR-reduceat,
    output bounded by distinct source COMBINATIONS (`stages/overlap.py`)."""
    from .stages.overlap import source_overlap

    ds = _docs(sf_dir, columns=["doc_id", "text", "source"])
    return source_overlap(ds, group_col="source", text_col="text", k=3)


def q_sample_exact_k(sf_dir: str):
    """Deterministic uniform sample of EXACTLY 100 docs — distributed
    "ORDER BY md5(key) LIMIT k": vectorized local top-k per block,
    tiny global sort+limit over blocks×k candidates
    (`stages/stats.py hash_sample_exact`). Complements the threshold
    samplers (stratified/weighted), whose output size is only
    approximate."""
    from .stages.stats import hash_sample_exact

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])
    out = hash_sample_exact(ds, k=100, key_col="doc_id")

    def _shape(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(batch.column("n_chars"), pa.int64()),
        })

    return out.map_batches(_shape, batch_format="pyarrow")


def q_approx_quantiles(sf_dir: str):
    """Fixed-bin quantile SKETCH over n_chars (`stages/stats.py
    binned_quantiles`) — the scale path when `corpus_quantiles`'s
    bounded-cardinality contract fails: integer binning, one
    bincount partial per block folded on the driver, NO shuffle;
    mergeable across corpora; error ≤ bin width. The estimate
    itself is deterministic, so the oracle reproduces the sketch
    math bit-exactly."""
    from .stages.stats import binned_quantiles

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])
    return binned_quantiles(ds, "n_chars", [0.1, 0.5, 0.9, 0.99],
                            lo=0, bin_width=100, n_bins=100)


def _docs_half(sf_dir: str, first: bool):
    """(lang, source) projection of one snapshot half. The split is
    ``doc_id % 7 < 3`` — deliberately NOT doc_id parity, which the
    synthetic generator anti-correlates with (lang, source) so
    perfectly that the halves share zero combinations."""
    def _fn(batch: pa.Table) -> pa.Table:
        lt = pc.less(_int_mod(batch.column("doc_id"), 7),
                     pa.scalar(3, pa.int64()))
        f = batch.filter(lt if first else pc.invert(lt))
        return pa.table({"lang": f.column("lang"),
                         "source": f.column("source")})

    return _docs(sf_dir, columns=["doc_id", "lang", "source"]).map_batches(
        _fn, batch_format="pyarrow")


def _schema_stable(ds, schema: pa.Schema) -> pa.Table:
    """Collect a SMALL (audit-scale) result into an Arrow table that
    keeps its schema even when EMPTY — Ray Data's ``to_pandas()``
    drops all columns from a 0-row Dataset, so any query whose
    result can legitimately be empty (EXCEPT over converged
    snapshots) must hand the driver a schema-pinned table instead.
    Only for outputs bounded by distinct-combination counts — never
    corpus-scale data."""
    batches = [
        b for b in ds.iter_batches(batch_format="pyarrow",
                                   batch_size=None)
        if b.num_rows
    ]
    if not batches:
        return schema.empty_table()
    return pa.concat_tables([b.select(schema.names) for b in batches])


_LANG_SOURCE_SCHEMA = pa.schema([("lang", pa.string()),
                                 ("source", pa.string())])


def q_docs_except(sf_dir: str):
    """SQL ``EXCEPT`` (set, not bag): distinct (lang, source)
    combinations present in the even-doc_id snapshot but absent from
    the odd one — the snapshot-diff audit. One co-shuffle of both
    sides by composite-row-key bucket, whole-bucket boundary-mask
    distinctness (`stages/setops.py`). Result is combo-scale and can
    be EMPTY on converged snapshots, so it returns a schema-pinned
    Arrow table."""
    from .stages.setops import except_distinct

    return _schema_stable(
        except_distinct(_docs_half(sf_dir, True),
                        _docs_half(sf_dir, False)),
        _LANG_SOURCE_SCHEMA)


def q_docs_intersect(sf_dir: str):
    """SQL ``INTERSECT``: distinct (lang, source) combinations in
    BOTH snapshot halves — same one-exchange plan as `docs_except`,
    same schema-pinned combo-scale return (empty-safe)."""
    from .stages.setops import intersect_distinct

    return _schema_stable(
        intersect_distinct(_docs_half(sf_dir, True),
                           _docs_half(sf_dir, False)),
        _LANG_SOURCE_SCHEMA)


def q_events_value_histogram(sf_dir: str):
    """Per-type equi-width histogram of event values
    (stages/stats.py ``grouped_histogram``): 10 bins over [0, 100),
    edge-clamped — row-local bin math, (key, bin) partial combine,
    one tiny groupby."""
    from .stages.stats import grouped_histogram

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    return grouped_histogram(events, "event_type", "value",
                             lo=0.0, width=10.0, n_bins=10)


def _diff_snapshots(sf_dir: str):
    """The deterministic old/new snapshot pair the diff queries
    reconcile: old drops ``doc_id%11=3`` (those become 'added'),
    new drops ``doc_id%7=2`` ('removed') and rewrites text for
    ``doc_id%5=0`` ('changed')."""

    def _old(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(_int_mod(batch.column("doc_id"), 11),
                         pa.scalar(3, pa.int64())))

    def _new(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.not_equal(_int_mod(batch.column("doc_id"), 7),
                         pa.scalar(2, pa.int64())))
        changed = pc.equal(_int_mod(t.column("doc_id"), 5),
                           pa.scalar(0, pa.int64()))
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        rewritten = pc.binary_join_element_wise(text, "!", "")
        return t.set_column(
            t.schema.get_field_index("text"), "text",
            pc.if_else(changed, rewritten, text))

    cols = ["doc_id", "text", "lang"]
    old = _docs(sf_dir, columns=cols).map_batches(
        _old, batch_format="pyarrow")
    new = _docs(sf_dir, columns=cols).map_batches(
        _new, batch_format="pyarrow")
    return old, new


def q_snapshot_diff(sf_dir: str):
    """Keyed two-snapshot reconciliation (stages/diff.py
    ``snapshot_diff``): added / removed / changed / unchanged per
    doc_id between an old and a new corpus snapshot. Content diffs
    by digest: only (key, 15-hex md5, side) enters the one
    co-shuffle — the compared text column never moves."""
    from .stages.diff import snapshot_diff

    old, new = _diff_snapshots(sf_dir)
    return snapshot_diff(old, new, "doc_id", ["text", "lang"],
                         n_buckets=32)


def q_snapshot_diff_summary(sf_dir: str):
    """Corpus-wide reconciliation counts (stages/diff.py
    ``diff_summary``): the per-key diff folded to one row of four
    int64 counts by a map-side partial combine — key-scale rows
    never reach the driver."""
    from .stages.diff import diff_summary

    old, new = _diff_snapshots(sf_dir)
    return diff_summary(old, new, "doc_id", ["text", "lang"],
                        n_buckets=32)


def q_locf_fill(sf_dir: str):
    """Last-observation-carried-forward backfill (stages/temporal.py
    ``locf_fill``): per-user value gap fill in (ts, event_id) order
    — the SQL `last_value(v IGNORE NULLS)` window. Missingness is
    derived deterministically (``event_id%4=1`` -> NULL); filled
    floats move by Arrow `take`, so they stay bit-exact."""
    from .stages.temporal import locf_fill

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "value"])

    def _mask(batch: pa.Table) -> pa.Table:
        missing = pc.equal(_int_mod(batch.column("event_id"), 4),
                           pa.scalar(1, pa.int64()))
        v = batch.column("value")
        if isinstance(v, pa.ChunkedArray):
            v = v.combine_chunks()
        return batch.set_column(
            batch.schema.get_field_index("value"), "value",
            pc.if_else(missing, pa.scalar(None, pa.float64()), v))

    masked = events.map_batches(_mask, batch_format="pyarrow")
    return locf_fill(masked, "user_id", ["ts", "event_id"], "value",
                     n_buckets=32)


def q_bucketed_upsert(sf_dir: str):
    """MERGE into bucketed storage (stages/bucketed.py
    ``bucketed_upsert``): orders written once as a clustered
    bucketed store, then a derived delta (price updates for
    ``o_orderkey%5=0``, inserts as negated keys for ``%17=2``,
    tombstone deletes for ``%13=1`` minus the update set) merges
    into a NEW store root — only the delta is exchanged, the store
    side moves zero rows, untouched buckets hardlink over. Returns
    the merged table via per-bucket reads."""
    import shutil

    from .stages.bucketed import (bucketed_upsert, read_bucketed,
                                  write_bucketed)

    base = (f"/tmp/ocr_ray_upsert_{os.getpid()}_"
            f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(base, ignore_errors=True)
    n_buckets = 32
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice"])
    write_bucketed(orders, f"{base}/store", "o_orderkey", n_buckets,
                   clustered=True)

    def _delta(batch: pa.Table) -> pa.Table:
        k = batch.column("o_orderkey")
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        p = batch.column("o_totalprice")
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        upd = pc.equal(_int_mod(k, 5), pa.scalar(0, pa.int64()))
        ins = pc.equal(_int_mod(k, 17), pa.scalar(2, pa.int64()))
        dele = pc.and_(
            pc.equal(_int_mod(k, 13), pa.scalar(1, pa.int64())),
            pc.invert(upd))

        def _part(mask, key, price, is_del):
            idx = pc.indices_nonzero(mask)
            return pa.table({
                "o_orderkey": key.take(idx),
                "o_totalprice": price.take(idx),
                "is_delete": pa.array(
                    [is_del] * len(idx), pa.bool_()),
            })

        return pa.concat_tables([
            _part(upd, k, pc.add(p, pa.scalar(1000.0, pa.float64())),
                  False),
            _part(ins, pc.negate(k), p, False),
            _part(dele, k, p, True),
        ])

    delta = orders.map_batches(_delta, batch_format="pyarrow")
    bucketed_upsert(f"{base}/store", delta, f"{base}/v2",
                    "o_orderkey", n_buckets,
                    tombstone_col="is_delete")
    return read_bucketed(f"{base}/v2", n_buckets)


def q_interval_union(sf_dir: str):
    """Gaps-and-islands interval merging (stages/temporal.py
    ``interval_union``): per-user activity windows
    ``[epoch_us(ts), epoch_us(ts) + floor(value*1e6)]`` merged into
    maximal disjoint islands — one key-hash shuffle, per-segment
    running-max island detection, maximum.reduceat collapse. Bounds
    are int64 microseconds, bit-exact vs the SQL window twin."""
    from .stages.temporal import interval_union

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value"])

    def _iv(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        start = pc.cast(t.column("ts"), pa.int64())
        dur = pc.cast(pc.floor(pc.multiply(
            t.column("value"), pa.scalar(1000000.0, pa.float64()))),
            pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "start_us": start,
            "end_us": pc.add(start, dur),
        })

    iv = events.map_batches(_iv, batch_format="pyarrow")
    return interval_union(iv, "user_id", "start_us", "end_us",
                          n_buckets=32)


def q_events_value_zscore(sf_dir: str):
    """Per-group feature standardization (training-data scaling):
    z = (value - mean) / std within each event_type. Composition of
    existing primitives — `grouped_moments` sufficient-statistic
    partials give key-scale (mean, var) rows, the driver grid-rounds
    them to the repo-wide 1e-6 float contract (the gridded moments
    are PROVEN bit-equal to the SQL twin by `events_value_stats`,
    so the z arithmetic runs on bit-identical inputs both sides),
    broadcasts the tiny per-type dict in the closure, and a
    row-local map does the scaling at scan speed — no second
    shuffle."""
    import numpy as np

    from .stages.stats import grouped_moments

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"])
    moments = grouped_moments(
        events.select_columns(["event_type", "value"]),
        "event_type", "value")

    def _grid(x: float) -> float:
        return math.floor(x * 1000000.0 + 0.5) / 1000000.0

    stats = {}
    for r in moments.iter_rows():
        if (r["event_type"] is None or r["var_value"] is None
                or _grid(r["var_value"]) <= 0.0):
            continue
        stats[r["event_type"]] = (
            _grid(r["mean_value"]),
            math.sqrt(_grid(r["var_value"])))
    keys = pa.array(sorted(stats), pa.string())
    means = np.array([stats[k][0] for k in sorted(stats)],
                     dtype=np.float64)
    stds = np.array([stats[k][1] for k in sorted(stats)],
                    dtype=np.float64)

    def _z(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        idx = pc.index_in(t.column("event_type"), value_set=keys)
        t = t.filter(pc.is_valid(idx))
        pos = pc.index_in(t.column("event_type"),
                          value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        z = (v - means[pos]) / stds[pos]
        z = np.floor(z * 1000000.0 + 0.5) / 1000000.0
        return pa.table({
            "event_id": t.column("event_id"),
            "z": pa.array(z, pa.float64()),
        })

    return events.map_batches(_z, batch_format="pyarrow")


def q_interval_coverage(sf_dir: str):
    """Per-user total covered time over the merged activity islands:
    one more map pass over `interval_union` output — island blocks
    are BUCKET-ALIGNED (a user's islands all live in one whole-bucket
    output block), so a block-local groupby IS the global per-user
    sum: zero additional shuffles."""
    iv = q_interval_union(sf_dir)

    def _cover(batch: pa.Table) -> pa.Table:
        dur = pc.subtract(batch.column("end_us"),
                          batch.column("start_us"))
        sub = pa.table({"user_id": batch.column("user_id"),
                        "covered_us": dur})
        agg = sub.group_by(["user_id"]).aggregate([("covered_us",
                                                    "sum")])
        return pa.table({
            "user_id": agg.column("user_id"),
            "covered_us": pc.cast(agg.column("covered_us_sum"),
                                  pa.int64()),
        })

    return iv.map_batches(_cover, batch_format="pyarrow",
                          batch_size=None)


def q_priority_sample(sf_dir: str):
    """Weighted exact-k sampling (stages/stats.py
    ``priority_sample_k``): 100 documents drawn with probability
    proportional to length via Efraimidis-Spirakis hash-coin
    priorities — deterministic, dup-safe, layout-independent; local
    per-block top-k then one tiny candidates sort."""
    from .stages.stats import priority_sample_k

    docs = _docs(sf_dir, columns=["doc_id", "n_chars"])
    return priority_sample_k(docs, 100, "doc_id", "n_chars")


BM25_QUERY = ["window", "merge", "stream"]


def q_bm25_search(sf_dir: str):
    """BM25 lexical top-10 (stages/textstats.py ``bm25_topk``): two
    shuffle-free scans — query-token corpus stats folded on the
    driver, then vectorized per-block scoring + local top-k. The
    SQL twin computes the identical formula (grid-rounded scores,
    id tie-break)."""
    from .stages.textstats import bm25_topk

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    return bm25_topk(docs, BM25_QUERY, k=10)


HYBRID_LEG_K = 20  # candidates per retrieval leg before fusion


def q_hybrid_search(sf_dir: str):
    """Hybrid retrieval (stages/rank.py ``rrf_fuse``): reciprocal-
    rank fusion of the BM25 lexical top-20 and the dense cosine
    top-20 over the SAME id space (doc_id == vec_id in the corpus) —
    the standard RAG-curation retrieval shape where neither lexical
    nor embedding recall alone suffices. Both legs are the existing
    distributed operators (two scans each, no shuffle); the fuse
    itself folds 2xK candidate rows on the driver. The SQL twin
    recomputes both legs with the leg oracles' own ORDER BY rules,
    ranks via row_number(), and COALESCE-sums 1/(60+rank)."""
    from .stages.rank import rrf_fuse
    from .stages.similarity import brute_force_topk
    from .stages.textstats import bm25_topk

    docs = _docs(sf_dir, columns=["doc_id", "text"])
    lex = bm25_topk(docs, BM25_QUERY, k=HYBRID_LEG_K)
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    dense = brute_force_topk(emb, _query_vec(sf_dir, 0),
                             k=HYBRID_LEG_K, exclude_id=0)
    return rrf_fuse(
        {"lex": (lex, "doc_id", "score"),
         "dense": (dense, "vec_id", "sim")},
        k=10)


FUNNEL_STEPS = ["view", "click", "purchase"]


def q_event_funnel(sf_dir: str):
    """Ordered min-time funnel (stages/temporal.py
    ``funnel_counts``): users completing view -> click -> purchase,
    each step strictly after the previous step's first occurrence.
    One user-hash shuffle; per-bucket work is vectorized per STEP
    (never per user); driver folds steps-scale count partials."""
    from .stages.temporal import funnel_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return funnel_counts(events, FUNNEL_STEPS, n_buckets=32)


def q_sliding_distinct_users(sf_dir: str):
    """Rolling active users (stages/temporal.py
    ``sliding_distinct``): distinct users per event_type over a
    trailing 3-hour window — the exact window-explode + global
    distinct plan (distinct does NOT decompose into per-hour
    partials, unlike the sum/count sliding window)."""
    from .stages.temporal import sliding_distinct

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "user_id"])
    return sliding_distinct(events, window_hours=3, n_buckets=16)


def q_join_size_estimate(sf_dir: str):
    """Join-cardinality statistics BEFORE paying for the join (the
    optimizer primitive): exact |orders JOIN customer| from one
    (key, count, side) partial exchange (stages/stats.py
    ``join_size_exact``), plus the Count-Min inner-product upper
    bound (``cms_inner_product``) from two 4x1024 sketches built by
    the existing ``cms_sketch`` over the stringified keys — both
    deterministic integers, both oracle-pinned."""
    from .stages.stats import (cms_inner_product, cms_sketch,
                               join_size_exact)

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"])

    def _as_text(col: str):
        def _fn(batch: pa.Table) -> pa.Table:
            return pa.table({
                "text": pc.cast(batch.column(col), pa.string()),
            })
        return _fn

    def _collect(ds) -> pa.Table:
        parts = [b for b in ds.iter_batches(batch_format="pyarrow",
                                            batch_size=None)
                 if b.num_rows]
        return pa.concat_tables(parts)

    # the three legs are independent Ray jobs — drive them
    # concurrently (Ray Data executes multiple datasets in parallel;
    # the per-job fixed costs overlap instead of stacking)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(3) as pool:
        f_exact = pool.submit(
            join_size_exact, orders, cust, "o_custkey", "c_custkey",
            n_buckets=32)
        f_a = pool.submit(lambda: _collect(cms_sketch(
            orders.map_batches(_as_text("o_custkey"),
                               batch_format="pyarrow"))))
        f_b = pool.submit(lambda: _collect(cms_sketch(
            cust.map_batches(_as_text("c_custkey"),
                             batch_format="pyarrow"))))
        exact, sk_a, sk_b = f_exact.result(), f_a.result(), f_b.result()
    est = cms_inner_product(sk_a, sk_b)
    return pa.table({
        "n_join_rows": exact.column("n_join_rows"),
        "cms_estimate": pa.array([est], pa.int64()),
    })


def q_collocations(sf_dir: str):
    """PMI collocations: top-20 adjacent token pairs by pointwise
    mutual information (pair count >= 5) — the statistic behind
    multi-word-expression mining. One pairs exchange (map-side
    Counter partials -> groupby sum, the token_pair_counts shape);
    totals fold from tiny per-block partials; the qualifying pairs
    (count >= 5) are collection-scale by construction, so their
    unigram counts come from a second filtered scan (qualifying
    token set broadcast in the closure) and the PMI math runs on the
    driver over qualifying-pairs rows only."""
    import math

    from ray.data.aggregate import Sum

    MIN_PAIR = 5
    docs = _docs(sf_dir, ["text"])

    def _pair_partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        n_pairs = 0
        n_toks = 0
        for text in batch.column("text").to_pylist():
            toks = (text or "").split(" ")
            n_toks += len(toks)
            n_pairs += max(0, len(toks) - 1)
            for a, b in zip(toks, toks[1:]):
                key = a + "\x1f" + b
                counts[key] = counts.get(key, 0) + 1
        # sentinel row (no \x1f, n=0) carries the block totals even
        # when the block produced no pairs; MIN_PAIR filters it out
        keys = list(counts.keys()) + ["\x1e"]
        ns = list(counts.values()) + [0]
        np_col = [0] * (len(keys) - 1) + [n_pairs]
        nu_col = [0] * (len(keys) - 1) + [n_toks]
        return pa.table({
            "pair": pa.array(keys, pa.string()),
            "n": pa.array(ns, pa.int64()),
            "np_": pa.array(np_col, pa.int64()),
            "nu_": pa.array(nu_col, pa.int64()),
        })

    agg = docs.map_batches(
        _pair_partial, batch_format="pyarrow"
    ).groupby("pair").aggregate(Sum("n"), Sum("np_"), Sum("nu_"))

    pairs: Dict[str, int] = {}
    n_pairs_total = 0
    n_toks_total = 0
    for b in agg.iter_batches(batch_format="pyarrow",
                              batch_size=None):
        for p, n in zip(b.column("pair").to_pylist(),
                        pc.cast(b.column("sum(n)"),
                                pa.int64()).to_pylist()):
            if n >= MIN_PAIR:
                pairs[p] = n
        n_pairs_total += int(pc.sum(b.column("sum(np_)")).as_py() or 0)
        n_toks_total += int(pc.sum(b.column("sum(nu_)")).as_py() or 0)

    qual_tokens = set()
    for p in pairs:
        a, b2 = p.split("\x1f", 1)
        qual_tokens.add(a)
        qual_tokens.add(b2)

    def _uni_partial(batch: pa.Table) -> pa.Table:
        counts: Dict[str, int] = {}
        for text in batch.column("text").to_pylist():
            for t in (text or "").split(" "):
                if t in qual_tokens:
                    counts[t] = counts.get(t, 0) + 1
        return pa.table({
            "t": pa.array(list(counts.keys()), pa.string()),
            "c": pa.array(list(counts.values()), pa.int64()),
        })

    uni: Dict[str, int] = {}
    for b in docs.map_batches(
            _uni_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for t, c in zip(b.column("t").to_pylist(),
                        b.column("c").to_pylist()):
            uni[t] = uni.get(t, 0) + c

    np_f = float(n_pairs_total)
    nu_f = float(n_toks_total)
    rows = []
    for p, c_ab in pairs.items():
        a, b2 = p.split("\x1f", 1)
        pmi = math.log(
            (c_ab / np_f) / ((uni[a] / nu_f) * (uni[b2] / nu_f)))
        pmi = math.floor(pmi * 1000000.0 + 0.5) / 1000000.0
        rows.append((a, b2, c_ab, pmi))
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    rows = rows[:20]
    return pa.table({
        "a": pa.array([r[0] for r in rows], pa.string()),
        "b": pa.array([r[1] for r in rows], pa.string()),
        "n_pair": pa.array([r[2] for r in rows], pa.int64()),
        "pmi": pa.array([r[3] for r in rows], pa.float64()),
    })


def q_event_funnel_windowed(sf_dir: str):
    """Windowed funnel: view -> click -> purchase where each
    conversion must land within 6 hours of the previous step's first
    occurrence (`funnel_counts(within_hours=6)`) — the
    bounded-conversion variant of `event_funnel`."""
    from .stages.temporal import funnel_counts

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type"])
    return funnel_counts(events, FUNNEL_STEPS, n_buckets=32,
                         within_hours=6)


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroids (grouped vector mean — the
    semantic-clustering / class-prototype primitive and the kmeans
    update step exposed as a query): per block, one zero-copy
    matrix view + `np.add.at` over label codes gives (label,
    sum-vector, n) partials; the driver folds labels-scale partials
    and emits (label, d, mean) rows on the repo-wide 1e-6 grid."""
    import numpy as np

    from .stages.similarity import _to_matrix

    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["label", "embedding"])

    def _partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        mat = _to_matrix(batch.column("embedding")).astype(np.float64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), mat.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, mat)
        counts = np.bincount(inv, minlength=len(uniq))
        dim = mat.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), pa.int64()),
            "d": pa.array(np.tile(np.arange(dim), len(uniq)),
                          pa.int64()),
            "s": pa.array(sums.ravel(), pa.float64()),
            "n": pa.array(np.repeat(counts, dim).astype(np.int64),
                          pa.int64()),
        })

    sums: Dict[tuple, float] = {}
    ns: Dict[tuple, int] = {}
    for b in ds.map_batches(
            _partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for lb, d, s, n in zip(b.column("label").to_pylist(),
                               b.column("d").to_pylist(),
                               b.column("s").to_pylist(),
                               b.column("n").to_pylist()):
            sums[(lb, d)] = sums.get((lb, d), 0.0) + s
            ns[(lb, d)] = ns.get((lb, d), 0) + n
    ks = sorted(sums)
    means = [math.floor(sums[k] / ns[k] * 1000000.0 + 0.5) / 1000000.0
             for k in ks]
    return pa.table({
        "label": pa.array([k[0] for k in ks], pa.int64()),
        "d": pa.array([k[1] for k in ks], pa.int64()),
        "mean": pa.array(means, pa.float64()),
    })


def q_recency_user_scores(sf_dir: str):
    """Recency-weighted engagement score per user:
    sum(value * 2^-(age_days)) with age measured from the corpus'
    max event day — the exponential-decay rollup behind "recent
    activity" features. Decay factors are DYADIC (2^-k with integer
    k), so every per-row weight is IEEE-exact on both engines; only
    the sum order differs, absorbed by the 1e-6 grid. Two passes:
    a tiny max-day fold, then map-side weighted partials + one small
    user groupby."""
    import numpy as np

    from ray.data.aggregate import Sum

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value"])

    def _day_partial(batch: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor_temporal(batch.column("ts"), unit="day"),
                    pa.int64())
        return pa.table({"mx": pa.array(
            [pc.max(d).as_py() or 0], pa.int64())})

    max_day = 0
    for b in events.map_batches(
            _day_partial, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        if b.num_rows:
            max_day = max(max_day,
                          int(pc.max(b.column("mx")).as_py() or 0))
    day_us = 86_400_000_000

    def _weighted(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        d = pc.cast(pc.floor_temporal(t.column("ts"), unit="day"),
                    pa.int64()).to_numpy(zero_copy_only=False)
        age = (max_day - d) // day_us
        v = t.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        w = v * np.exp2(-age.astype(np.float64))
        return pa.table({
            "user_id": t.column("user_id"),
            "w": pa.array(w, pa.float64()),
        })

    out = events.map_batches(
        _weighted, batch_format="pyarrow"
    ).groupby("user_id").aggregate(Sum("w"))

    def _grid(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(w)")
        return pa.table({
            "user_id": batch.column("user_id"),
            "score": pc.divide(
                pc.floor(pc.add(pc.multiply(s, 1e6), 0.5)), 1e6),
        })

    return out.map_batches(_grid, batch_format="pyarrow")


def q_churned_users(sf_dir: str):
    """Churn: users active in the FIRST half of the event range but
    absent from the LAST 1% of the range — the period set
    difference, composed from the engine's own EXCEPT operator over
    two distinct-user projections (integer-us split point; the churn
    list itself is concrete, users-absent-recently scale)."""
    from .stages.setops import except_distinct

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    lo_hi = [None, None]
    for b in events.map_batches(
            lambda t: pa.table({
                "lo": pa.array([pc.min(pc.cast(t.column("ts"),
                                               pa.int64())).as_py()]),
                "hi": pa.array([pc.max(pc.cast(t.column("ts"),
                                               pa.int64())).as_py()]),
            }), batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for lo, hi in zip(b.column("lo").to_pylist(),
                          b.column("hi").to_pylist()):
            if lo is not None:
                lo_hi[0] = lo if lo_hi[0] is None else min(lo_hi[0], lo)
            if hi is not None:
                lo_hi[1] = hi if lo_hi[1] is None else max(lo_hi[1], hi)
    # split point in INTEGER epoch-us (floor) — interval math in
    # timestamp space rounds differently between engines. The last
    # 10% of the range is the "recent" period: active-before,
    # absent-recently = churned.
    mid = lo_hi[0] + (lo_hi[1] - lo_hi[0]) * 99 // 100

    def _half(first: bool):
        def _fn(batch: pa.Table) -> pa.Table:
            us = pc.cast(batch.column("ts"), pa.int64())
            m = (pc.less_equal(us, pa.scalar(mid, pa.int64()))
                 if first else
                 pc.greater(us, pa.scalar(mid, pa.int64())))
            t = batch.filter(m)
            return pa.table({
                "user_id": pc.unique(t.column("user_id")),
            })
        return events.map_batches(_fn, batch_format="pyarrow")

    out = except_distinct(_half(True), _half(False), n_buckets=32)
    parts = [b for b in out.iter_batches(batch_format="pyarrow",
                                         batch_size=None)
             if b.num_rows]
    if not parts:
        return pa.table({"user_id": pa.array([], pa.int64())})
    return pa.concat_tables(parts).sort_by([("user_id", "ascending")])


def q_value_outliers(sf_dir: str):
    """Robust outlier detection (median/MAD, the
    breakdown-point-0.5 alternative to z-scores): per event_type,
    how many values deviate from the median by more than 3x the
    median absolute deviation. Two exact grouped-median passes
    (`grouped_quantiles` — per-key distinct-value histograms, never
    a value sort), a materialized deviation set shared by the MAD
    pass and the count pass, and a driver fold of types-scale count
    partials. Medians are DATA VALUES (percentile_disc), so every
    float op is bit-identical to the SQL twin."""
    import numpy as np

    from .stages.stats import grouped_quantiles

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    med_tbl = grouped_quantiles(events, "event_type", "value", [0.5])
    med = {k: v for k, v in zip(med_tbl.column("key").to_pylist(),
                                med_tbl.column("value").to_pylist())}

    keys = pa.array(sorted(med), pa.string())
    meds = np.array([med[k] for k in sorted(med)], dtype=np.float64)

    def _dev(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_valid(batch.column("value")))
        idx = pc.index_in(t.column("event_type"), value_set=keys)
        t = t.filter(pc.is_valid(idx))
        pos = pc.index_in(t.column("event_type"),
                          value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        v = t.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": t.column("event_type"),
            "dev": pa.array(np.abs(v - meds[pos]), pa.float64()),
        })

    # two consumers (MAD quantiles + outlier count) over an
    # events-row-count table: checkpoint, don't pin
    from .stages.bucketed import checkpoint_bucketed
    devs = checkpoint_bucketed(
        events.map_batches(_dev, batch_format="pyarrow"),
        f"valout_{os.path.basename(os.path.normpath(sf_dir))}",
        key_col=None)
    mad_tbl = grouped_quantiles(devs, "event_type", "dev", [0.5])
    mad = {k: v for k, v in zip(mad_tbl.column("key").to_pylist(),
                                mad_tbl.column("value").to_pylist())}
    mads = np.array([mad[k] for k in sorted(med)], dtype=np.float64)

    def _count(batch: pa.Table) -> pa.Table:
        pos = pc.index_in(batch.column("event_type"),
                          value_set=keys).to_numpy(
            zero_copy_only=False).astype(np.int64)
        dev = batch.column("dev").combine_chunks().to_numpy(
            zero_copy_only=False)
        out = dev > 3.0 * mads[pos]
        n = np.bincount(pos, minlength=len(meds))
        n_out = np.bincount(pos[out], minlength=len(meds))
        return pa.table({
            "i": pa.array(np.arange(len(meds)), pa.int64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
            "n_out": pa.array(n_out.astype(np.int64), pa.int64()),
        })

    tot_n = np.zeros(len(meds), dtype=np.int64)
    tot_o = np.zeros(len(meds), dtype=np.int64)
    for b in devs.map_batches(
            _count, batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        i = b.column("i").to_numpy(zero_copy_only=False)
        tot_n[i] += b.column("n").to_numpy(zero_copy_only=False)
        tot_o[i] += b.column("n_out").to_numpy(zero_copy_only=False)
    return pa.table({
        "event_type": keys,
        "n": pa.array(tot_n, pa.int64()),
        "n_outliers": pa.array(tot_o, pa.int64()),
    })


def q_ks_drift(sf_dir: str):
    """Two-sample Kolmogorov-Smirnov drift statistic between the
    old/new corpus snapshots' doc-length distributions — the
    distribution-shift gauge a pipeline checks before concluding
    "the new crawl looks like the old one". Exact: per-side
    (value, count) histogram partials fold on the driver
    (distinct-length scale), CDFs are integer cumsums over one
    merged value axis, D = max |F_a - F_b|. Integer cumsum /
    integer total keeps every float op bit-identical to the SQL
    window twin; grid-rounded."""
    import numpy as np

    def _old(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(_int_mod(batch.column("doc_id"), 11),
                         pa.scalar(3, pa.int64())))

    def _new(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(_int_mod(batch.column("doc_id"), 7),
                         pa.scalar(2, pa.int64())))

    def _hist(fn, side):
        def _p(batch: pa.Table) -> pa.Table:
            t = fn(batch)
            vc = pc.value_counts(t.column("n_chars"))
            return pa.table({
                "v": pc.cast(vc.field("values"), pa.int64()),
                "n": pc.cast(vc.field("counts"), pa.int64()),
                "side": pa.array([side] * len(vc), pa.int8()),
            })
        return _p

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    hist: Dict[tuple, int] = {}
    for b in docs.map_batches(
            _hist(_old, 0), batch_format="pyarrow").union(
            docs.map_batches(_hist(_new, 1),
                             batch_format="pyarrow")).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for v, n, s in zip(b.column("v").to_pylist(),
                           b.column("n").to_pylist(),
                           b.column("side").to_pylist()):
            hist[(v, s)] = hist.get((v, s), 0) + n
    vals = sorted({v for v, _ in hist})
    na = np.array([hist.get((v, 0), 0) for v in vals], dtype=np.int64)
    nb = np.array([hist.get((v, 1), 0) for v in vals], dtype=np.int64)
    ta, tb = int(na.sum()), int(nb.sum())
    fa = np.cumsum(na) / ta
    fb = np.cumsum(nb) / tb
    d = float(np.max(np.abs(fa - fb))) if len(vals) else 0.0
    d = math.floor(d * 1000000.0 + 0.5) / 1000000.0
    return pa.table({
        "n_old": pa.array([ta], pa.int64()),
        "n_new": pa.array([tb], pa.int64()),
        "ks_d": pa.array([d], pa.float64()),
    })


def q_chi2_drift(sf_dir: str):
    """Categorical drift between the old/new snapshots' LANGUAGE
    distributions: Pearson chi-square over the lang contingency
    table (the categorical twin of `ks_drift`). Per-side (lang,
    count) partials fold on the driver (languages-scale); the chi2
    terms are computed in deterministic sorted-category order and
    the SQL twin mirrors the identical expected-count arithmetic;
    grid-rounded."""

    def _old(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(_int_mod(batch.column("doc_id"), 11),
                         pa.scalar(3, pa.int64())))

    def _new(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.not_equal(_int_mod(batch.column("doc_id"), 7),
                         pa.scalar(2, pa.int64())))

    def _hist(fn, side):
        def _p(batch: pa.Table) -> pa.Table:
            t = fn(batch)
            vc = pc.value_counts(t.column("lang"))
            return pa.table({
                "lang": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
                "side": pa.array([side] * len(vc), pa.int8()),
            })
        return _p

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
    hist: Dict[tuple, int] = {}
    for b in docs.map_batches(
            _hist(_old, 0), batch_format="pyarrow").union(
            docs.map_batches(_hist(_new, 1),
                             batch_format="pyarrow")).iter_batches(
            batch_format="pyarrow", batch_size=None):
        for v, n, s in zip(b.column("lang").to_pylist(),
                           b.column("n").to_pylist(),
                           b.column("side").to_pylist()):
            hist[(v, s)] = hist.get((v, s), 0) + n
    langs = sorted({v for v, _ in hist})
    na = [hist.get((v, 0), 0) for v in langs]
    nb = [hist.get((v, 1), 0) for v in langs]
    ta, tb = sum(na), sum(nb)
    tot = ta + tb
    chi2 = 0.0
    for a, b2 in zip(na, nb):
        row = a + b2
        ea = row * ta / tot
        eb = row * tb / tot
        chi2 += (a - ea) * (a - ea) / ea + (b2 - eb) * (b2 - eb) / eb
    chi2 = math.floor(chi2 * 1000000.0 + 0.5) / 1000000.0
    return pa.table({
        "n_cats": pa.array([len(langs)], pa.int64()),
        "chi2": pa.array([chi2], pa.float64()),
    })


def q_doc_novelty(sf_dir: str):
    """Per-doc n-gram novelty (stages/dedup.py ``doc_novelty``):
    fraction of each doc's distinct 3-shingles occurring in no other
    document — one shingle-hash co-shuffle, run-length df inside
    whole-bucket UDFs, per-doc partial combine before the tiny doc
    groupby."""
    from .stages.dedup import doc_novelty

    return doc_novelty(_docs(sf_dir), n_buckets=32)


def q_asof_last_purchase(sf_dir: str):
    """Point-in-time as-of join (stages/join.py ``asof_join``):
    each click event is attached to the SAME user's most recent
    purchase at-or-before the click — the SQL ``ASOF LEFT JOIN``
    shape (last price before the trade, dimension state at event
    time). One key-hash co-shuffle; the whole-bucket UDF resolves
    every probe with one ``np.maximum.accumulate`` over the
    (key, ts)-sorted union — no per-key loop."""
    from .stages.join import asof_join

    clicks = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "ts", "event_type"],
    ).filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"])
    purchases = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_type"],
    ).filter(expr="event_type == 'purchase'").select_columns(
        ["user_id", "ts", "value"])
    return asof_join(clicks, purchases, on="user_id", ts_col="ts",
                     right_cols=["ts", "value"], n_buckets=32)


def q_host_skew_stats(sf_dir: str):
    """Skew diagnostics (stages/stats.py ``key_skew_stats``) over
    the synthetic crawl's per-host counts (1/3 of docs on host0 by
    construction): n_keys / n_rows / max / exact count percentiles /
    hot-key ppm share — the pre-shuffle skew probe that tells a
    pipeline whether a key needs `skew_join`, salting or
    `group_cap` BEFORE the groupby runs. All passes over the
    key-cardinality table."""
    from .stages.stats import key_skew_stats
    from .stages.web import host_stats

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"])
    urls = docs.map_batches(_url_augment, batch_format="pyarrow")
    counts = host_stats(urls, url_col="url")
    return key_skew_stats(counts, count_col="n_docs")


def q_peak_sessions(sf_dir: str):
    """Peak concurrent sessions (stages/temporal.py
    ``peak_concurrency``): 30-minute gap sessions from `sessionize`,
    swept as +1/-1 delta events through a banded prefix sum — the
    distributed sweepline; driver state is bands-scale, never
    events."""
    from .stages.temporal import peak_concurrency, sessionize

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])
    sessions = sessionize(events, gap_minutes=30.0, n_buckets=32)
    return peak_concurrency(sessions, band_minutes=60, n_buckets=32)


def q_user_retention(sf_dir: str):
    """Retention cohorts: users grouped by FIRST active day, counted
    per day-offset of return — the classic growth-analytics rollup,
    fused into ONE user-keyed exchange: block-level (user, day)
    dedup map-side, then a whole-bucket UDF makes the pair set
    globally distinct (all of a user's rows co-locate), reads each
    user's cohort as its sorted segment head, computes day offsets,
    and pre-combines (cohort, offset) counts — the old
    distinct-groupby / cohort-groupby / repartition-join chain (four
    barriers, with the pair set re-executed per consumer) collapses
    into one barrier plus a driver-side (cohorts x offsets) fold."""
    import numpy as np

    from .functions.hashing import bucket_ids

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def _day_pairs(batch: pa.Table) -> pa.Table:
        d = pc.floor_temporal(batch.column("ts"), unit="day")
        sub = pa.table({"user_id": batch.column("user_id"), "d": d})
        agg = sub.group_by(["user_id", "d"]).aggregate([])
        u = agg.column("user_id")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        return pa.table({
            "user_id": u,
            "d": pc.cast(agg.column("d"), pa.int64()),
            "_bucket": pa.array(bucket_ids(u, 32), pa.int64()),
        })

    _DAY_US = 86_400_000_000

    def _cohort_partials(group: pa.Table) -> pa.Table:
        from .functions.segments import key_segments

        empty = pa.table({
            "cohort_day": pa.array([], pa.int64()),
            "day_offset": pa.array([], pa.int64()),
            "n_users": pa.array([], pa.int64()),
        })
        if group.num_rows == 0:
            return empty
        g = group.sort_by([("user_id", "ascending"),
                           ("d", "ascending")])
        u = g.column("user_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        d = g.column("d").combine_chunks().to_numpy(
            zero_copy_only=False)
        # global distinctness: a user-day straddling blocks lands
        # here twice; keep the first (all of a user's rows co-locate)
        keep = np.ones(len(u), dtype=bool)
        keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
        u, d = u[keep], d[keep]
        seg_start, seg_len = key_segments(u)
        cohort = np.repeat(d[seg_start], seg_len)
        off = (d - cohort) // _DAY_US
        # (cohort, offset) partial combine before the tiny groupby;
        # pack on the cohort DAY INDEX (epoch-us cohorts would
        # overflow int64 under the *100000 pack)
        key = (cohort // _DAY_US) * 100_000 + off
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            "cohort_day": pa.array((uniq // 100_000) * _DAY_US,
                                   pa.int64()),
            "day_offset": pa.array(uniq % 100_000, pa.int64()),
            "n_users": pa.array(counts.astype(np.int64), pa.int64()),
        })

    partials = (
        events.map_batches(_day_pairs, batch_format="pyarrow")
        .groupby("_bucket", num_partitions=32)
        .map_groups(_cohort_partials, batch_format="pyarrow")
    )
    # final merge is (cohorts x offsets)-scale — driver fold, not a
    # distributed aggregate barrier (the tiny-merge pattern)
    totals: Dict[tuple, int] = {}
    for b in partials.iter_batches(batch_format="pyarrow",
                                   batch_size=None):
        for c, o, n in zip(b.column("cohort_day").to_pylist(),
                           b.column("day_offset").to_pylist(),
                           b.column("n_users").to_pylist()):
            totals[(c, o)] = totals.get((c, o), 0) + n
    ks = sorted(totals)
    return pa.table({
        "cohort_day": pa.array(
            np.array([k[0] for k in ks],
                     dtype="datetime64[us]"), pa.timestamp("us")),
        "day_offset": pa.array([k[1] for k in ks], pa.int64()),
        "n_users": pa.array([totals[k] for k in ks], pa.int64()),
    })


def q_triangle_count(sf_dir: str):
    """Exact triangle count (stages/graph.py ``triangle_count``,
    compact-forward with (degree, id) orientation — the skew fix
    that bounds every out-neighborhood by O(sqrt(m))) over a
    deterministic synthetic link graph on documents: doc i links to
    (i+1)%N, (i+2)%N and (7i+3)%N. Four bounded exchanges; count is
    exact and matched by the DuckDB triple-join twin."""
    import numpy as np

    from .stages.graph import triangle_count

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        src = np.concatenate([ids, ids, ids])
        dst = np.concatenate([(ids + 1) % n, (ids + 2) % n,
                              (ids * 7 + 3) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    return triangle_count(
        docs.map_batches(_edges, batch_format="pyarrow"),
        n_buckets=32)


def q_docs_checksum(sf_dir: str):
    """Order-insensitive corpus checksum (stages/stats.py
    ``table_checksum``): sum of md5_60(sentinel row composite) mod
    2^63 over (doc_id, lang, source) — the replication audit
    primitive; layout/order invariant, mergeable, shuffle-free, and
    the checksum value itself is oracle-pinned."""
    from .stages.stats import table_checksum

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "source"])
    return table_checksum(docs, ["doc_id", "lang", "source"])


def q_user_event_trail(sf_dir: str):
    """Ordered per-user event-type trail (stages/stats.py
    ``grouped_concat``): string_agg(event_type, ',' ORDER BY ts,
    event_id) per user — one key-hash shuffle, whole-bucket sort +
    ListArray/binary_join assembly, never a per-key UDF."""
    from .stages.stats import grouped_concat

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "event_type", "ts", "event_id"],
    )
    out = grouped_concat(events, "user_id", "event_type",
                         ["ts", "event_id"], sep=",",
                         out_col="trail", n_buckets=32)

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(batch.column("user_id"), pa.int64()),
            "trail": batch.column("trail"),
        })

    return out.map_batches(_fin, batch_format="pyarrow")


def q_fuzzy_name_pairs(sf_dir: str):
    """EXACT edit-distance<=1 pair discovery (stages/fuzzy.py
    ``edit1_pairs``, FastSS deletion-neighborhood blocking): customer
    names within one typo of each other. Recall 1.0 by construction
    (verified per pair with the O(n) distance check), candidate
    generation is an equality join on deletion variants — never an
    all-pairs scan. Hot-block caps are counted; this query asserts
    none fired (the no-silent-caps rule)."""
    from .stages.fuzzy import edit1_pairs

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"])

    def _ren(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("c_custkey"), pa.int64()),
            "s": batch.column("c_name"),
        })

    stats = {}
    out = edit1_pairs(
        cust.map_batches(_ren, batch_format="pyarrow"), "s",
        n_buckets=32, max_block=512, stats=stats)
    if stats["blocks_capped"]:
        raise AssertionError(
            f"fuzzy blocking capped {stats['blocks_capped']} blocks "
            "— raise max_block (recall contract violated)")
    return out


def q_quality_classifier(sf_dir: str):
    """fastText-style linear quality scoring (stages/textstats.py
    ``linear_score``): integer logit = <hashing-trick vector,
    fixed int weights> + bias, row-local at scan speed. The weights
    here are a deterministic surrogate (w[d] = (d*37) % 21 - 10) so
    the full model-scoring arithmetic is oracle-pinned bit-for-bit;
    a trained model drops into the same operator."""
    from .stages.textstats import linear_score

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    w = [((d * 37) % 21) - 10 for d in range(64)]
    return linear_score(docs, w, bias=3)


def q_source_extract(sf_dir: str):
    """Vectorized RE2 field extraction (stages/textstats.py
    ``regex_extract_fn``): numeric suffix of the source tag + first
    b-word of the text, both via the C++ extract_regex kernel with
    DuckDB regexp_extract parity ('' on no-match, NULL on NULL) —
    the log/URL field-parsing operator, row-local."""
    from .stages.textstats import regex_extract_fn

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source", "text"])

    def _fn(batch: pa.Table) -> pa.Table:
        out = regex_extract_fn(batch, "source",
                               r"^src(?P<src_num>\d+)$")
        out = regex_extract_fn(out, "text",
                               r"\b(?P<first_b>b[a-z]+)")
        return out.select(["doc_id", "src_num", "first_b"])

    return docs.map_batches(_fn, batch_format="pyarrow")


def q_docs_union(sf_dir: str):
    """SQL ``UNION`` (DISTINCT): every distinct (lang, source)
    combination of either snapshot half, once — completes the set-op
    family on the same one-exchange kernel (stages/setops.py)."""
    from .stages.setops import union_distinct

    return union_distinct(_docs_half(sf_dir, True),
                          _docs_half(sf_dir, False))


def q_near_dup_incremental(sf_dir: str):
    """Incremental NEAR-dup: candidate pairs between a NEW batch
    (odd doc_ids) and the EXISTING corpus (even doc_ids) — docs
    sharing ANY minhash band across the two sets
    (`stages/dedup.py minhash_cross_pairs`). The near-dup twin of
    `dedup_incremental`'s exact anti join: how a fresh crawl is
    deduped against the index without re-pairing the corpus with
    itself. One (band, id, side) exchange; per-band new×corpus cross
    products inside whole-bucket UDFs."""
    from .stages.dedup import minhash_cross_pairs

    ds = _docs(sf_dir)

    def _half(parity: int):
        def _fn(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(
                _int_mod(batch.column("doc_id"), 2), parity))
        return ds.map_batches(_fn, batch_format="pyarrow")

    return minhash_cross_pairs(_half(1), _half(0)).sort(
        ["d_new", "d_old"])


def q_bucketed_join_orders(sf_dir: str):
    """Bucketed-storage join (`stages/bucketed.py`): customer and
    orders are each written ONCE as Hive ``_bucket=`` parquet
    bucketed by custkey, then joined with ZERO exchange — one task
    per bucket pair, the layout-is-the-shuffle pattern that turns
    every repeat join on the canonical key into a parallel scan.
    Scratch bucket dirs live under /tmp per run."""
    import shutil

    from .stages.bucketed import bucketed_join, write_bucketed

    base = (f"/tmp/ocr_ray_bucketed_{os.getpid()}_"
            f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(base, ignore_errors=True)
    n_buckets = 32

    def _ren_orders(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("o_orderkey"),
            "custkey": batch.column("o_custkey"),
        })

    def _ren_cust(batch: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": batch.column("c_custkey"),
            "mktsegment": batch.column("c_mktsegment"),
        })

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(_ren_orders, batch_format="pyarrow")
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]
    ).map_batches(_ren_cust, batch_format="pyarrow")
    write_bucketed(orders, f"{base}/orders", "custkey", n_buckets)
    write_bucketed(cust, f"{base}/customer", "custkey", n_buckets)
    return bucketed_join(f"{base}/orders", f"{base}/customer",
                         on="custkey", n_buckets=n_buckets)


def q_bucketed_order_counts(sf_dir: str):
    """Shuffle-free per-key aggregate over BUCKETED storage
    (`stages/bucketed.py bucketed_aggregate`): because bucket
    alignment puts every row of a key in one bucket dir, a
    per-bucket local group_by IS the global per-customer order count
    — the groupby exchange disappears the same way the join's did."""
    import shutil

    from .stages.bucketed import bucketed_aggregate, write_bucketed

    base = (f"/tmp/ocr_ray_bucketed_agg_{os.getpid()}_"
            f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(base, ignore_errors=True)
    n_buckets = 32

    def _ren(batch: pa.Table) -> pa.Table:
        return pa.table({"custkey": batch.column("o_custkey")})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"]
    ).map_batches(_ren, batch_format="pyarrow")
    write_bucketed(orders, base, "custkey", n_buckets)
    return bucketed_aggregate(base, "custkey", n_buckets,
                              count_name="n_orders")


def q_training_pipeline(sf_dir: str):
    """END-TO-END training-data pipeline, ORACLE-CHECKED as one chain:

    extraction (full HTML chain, byte-identical text) → C4-style
    quality filter → exact dedup (first-wins by content hash) →
    MinHash-candidate + Jaccard-verified near-dup REMOVAL (drop the
    higher doc_id of each verified pair, computed over the filtered
    survivors) → deterministic content-hash train/val/test split.
    Every stage is load-bearing in the single DuckDB hash. The
    survivor set has two consumers (the near-dup scan and the final
    filter), so it is checkpointed to doc_id-bucketed parquet and
    re-read — storage-backed and resumable, instead of pinning the
    whole surviving corpus in the object store with a
    ``materialize()``.
    """
    import html as html_mod

    from .config import StepSpec
    from .pipelines.extraction import build_pipeline
    from .stages.bucketed import checkpoint_bucketed
    from .stages.dedup import dedup_first, jaccard_dup_pairs

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "url": pa.array([f"doc://{i}" for i in ids], pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "html": pa.array([
                (
                    "<html><body>"
                    "<nav><ul><li><a href='/x'>Start</a></li></ul></nav>"
                    f"<p>{html_mod.escape(t or '')}</p>"
                    "<footer><p>Impressum Kontakt</p></footer>"
                    "</body></html>"
                ).encode("utf-8")
                for t in texts
            ], pa.binary()),
            "lang": batch.column("lang"),
        })

    # replace-free step chain: extraction must be IDENTITY on the
    # embedded text for the oracle to chain from documents.text — the
    # default ReplaceChars/regex tables would rewrite any text that
    # happens to contain their triggers ('<', 'ic)', letter+'3'+'"')
    extracted = build_pipeline(
        ds.map_batches(_to_pages, batch_format="pyarrow"),
        steps=[StepSpec("HtmlExtract", {}), StepSpec("FinalizeText", {}),
               StepSpec("QualityEstimate", {})],
    )

    def _project_and_filter(batch: pa.Table) -> pa.Table:
        ids = [int(u[len("doc://"):])
               for u in batch.column("url").to_pylist()]
        tbl = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": batch.column("extracted_text"),
        })
        feats = quality_heuristics_fn(tbl)
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(feats.column("n_tokens"), 30),
                pc.greater_equal(feats.column("n_chars_text"), 200),
            ),
            pc.and_(
                pc.less_equal(feats.column("short_ratio"), 0.30),
                pc.less_equal(feats.column("mean_token_len"), 12.0),
            ),
        )
        return tbl.filter(keep)

    filtered = extracted.map_batches(_project_and_filter,
                                     batch_format="pyarrow")

    deduped = checkpoint_bucketed(
        dedup_first(
            filtered.map_batches(fingerprint_fn, batch_format="pyarrow"),
            key_col="fp", order_col="doc_id",
        ).drop_columns(["fp"]),
        f"training_{os.path.basename(os.path.normpath(sf_dir))}",
        key_col="doc_id")

    # verified near-dup pairs over the SURVIVORS; the drop set is the
    # pair-set projection (tiny by construction). max_bucket is set
    # far above any band-bucket size this corpus can produce so the
    # hot-bucket cap cannot silently diverge from the (uncapped)
    # oracle SQL — at real scale, size it from minhash_bucket_stats.
    drop_ids = frozenset(
        r["d2"]
        for r in jaccard_dup_pairs(deduped, max_bucket=1_000_000)
        .take_all()
    )

    def _finish(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        keep, splits, n_tokens = [], [], []
        for i, t in zip(ids, texts):
            if i in drop_ids:
                keep.append(False)
                splits.append("")
                n_tokens.append(0)
                continue
            keep.append(True)
            b = int(hashlib.md5((t or "").encode("utf-8")).hexdigest()[:8],
                    16) % 100
            splits.append("train" if b < 90 else
                          ("val" if b < 95 else "test"))
            n_tokens.append(len((t or "").split(" ")))
        f = pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "split": pa.array(splits, pa.string()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
        }).filter(pa.array(keep))
        return f

    return deduped.map_batches(_finish, batch_format="pyarrow")


def q_dataset_split(sf_dir: str):
    """Deterministic content-hash train/val/test split (90/5/5).

    The split key is md5 of the CONTENT (not the id), so exact
    duplicates always land in the same split — no train/test leakage
    through duplicated documents; fully reproducible with no RNG
    state. Bucket = first 8 md5 hex chars as an integer, mod 100.
    """

    def _fn(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        buckets = [
            int(hashlib.md5((t or "").encode("utf-8")).hexdigest()[:8], 16)
            % 100
            for t in texts
        ]
        splits = [
            "train" if b < 90 else ("val" if b < 95 else "test")
            for b in buckets
        ]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "bucket": pa.array(buckets, pa.int64()),
            "split": pa.array(splits, pa.string()),
        })

    return _docs(sf_dir).map_batches(_fn, batch_format="pyarrow")


def q_media_features(sf_dir: str):
    """Multimodal plumbing, ORACLE-CHECKED end to end.

    Synthesizes a deterministic binary media payload per document
    (utf-8 text bytes; kind from doc_id), runs the real actor-pool
    ``MediaFeatureExtractor`` stage (small batches, payload dropped
    after featurization), and emits digest-derived features the
    DuckDB twin reproduces bit-for-bit via chained sha256 — proving
    the batching/schema/actor plumbing, not just running it.
    """
    from .stages.multimodal import media_feature_stage

    kinds = ["image", "audio", "video"]

    def _to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "media_id": pa.array([f"m{i}" for i in ids], pa.string()),
            "kind": pa.array([kinds[i % 3] for i in ids], pa.string()),
            "payload": pa.array(
                [(t or "").encode("utf-8") for t in texts], pa.binary()
            ),
            "mime": pa.array(["application/octet-stream"] * len(ids),
                             pa.string()),
        })

    from .stages.multimodal import DecodeConfig

    media = _docs(sf_dir).map_batches(_to_media, batch_format="pyarrow")
    # fake decoder pinned: these payloads are raw utf-8 text, not
    # decodable media — this query proves the digest/actor plumbing;
    # real PNM/WAV decoding is oracle-checked by `media_decode`
    feats = media_feature_stage(
        media, config=DecodeConfig(use_fake_decoder=True)
    )

    def _project(batch: pa.Table) -> pa.Table:
        # scalar projection of the feature vector (the comparator —
        # like most SQL engines — can't sort on list columns):
        # f0 = first component, features_sig = the 16 feature bytes
        # as hex
        fl = batch.column("features").to_pylist()
        f0 = [f[0] if f else None for f in fl]
        sig = [
            "".join(f"{round(v * 255):02x}" for v in f) if f else None
            for f in fl
        ]
        return pa.table({
            "media_id": batch.column("media_id"),
            "kind": batch.column("kind"),
            "payload_bytes": batch.column("payload_bytes"),
            "decode_error": batch.column("decode_error"),
            "f0": pa.array(f0, pa.float64()),
            "features_sig": pa.array(sig, pa.string()),
        })

    return feats.map_batches(_project, batch_format="pyarrow")


def q_media_decode(sf_dir: str):
    """REAL media decode, ORACLE-CHECKED end to end.

    Synthesizes genuine binary media per document — a binary PGM
    image (dims and constant fill derived from doc_id), a mono 16-bit
    PCM WAV (frame count and amplitude from doc_id), a raw YUV4MPEG2
    video (dims/frame count/luma fill from doc_id), or an opaque
    codec-video payload — and runs the real actor-pool decoder
    (``decode_pnm`` / ``decode_wav`` / ``decode_y4m``, pure stdlib).
    The emitted dimensions, durations, byte counts and content means
    are read from the DECODED BYTES on the Ray side and recomputed
    from the doc_id formulas on the DuckDB side: a header-faking
    decoder cannot pass. Opaque video rows (doc_id % 6 == 5) pin the
    documented codec-formats-need-external-libs error.
    """
    from .stages.multimodal import (
        encode_pgm,
        encode_wav,
        encode_y4m,
        media_feature_stage,
    )

    def _to_media(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        payloads, kinds = [], []
        for i, t in zip(ids, texts):
            m = i % 3
            if m == 0:
                w, h = 8 + i % 25, 8 + (i * 7) % 25
                payloads.append(encode_pgm(w, h, i % 256))
                kinds.append("image")
            elif m == 1:
                n_frames = 8 * (10 + i % 50)
                payloads.append(encode_wav([i % 100] * n_frames))
                kinds.append("audio")
            elif i % 6 == 2:
                w, h = 8 + 2 * (i % 13), 8 + 2 * ((i * 3) % 11)
                payloads.append(encode_y4m(w, h, 2 + i % 7, i % 256))
                kinds.append("video")
            else:
                # i % 6 == 5: opaque codec-compressed stand-in
                payloads.append((t or "").encode("utf-8"))
                kinds.append("video")
        return pa.table({
            "media_id": pa.array([f"m{i}" for i in ids], pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    media = _docs(sf_dir).map_batches(_to_media, batch_format="pyarrow")
    # real decoder (default config); these synthetic payloads are
    # KB-scale, so a larger batch than the MB-payload default is right
    feats = media_feature_stage(media, batch_size=128, concurrency=(1, 16))
    return feats.select_columns([
        "media_id", "kind", "payload_bytes", "decoded_width",
        "decoded_height", "decoded_duration_ms", "content_mean",
        "decode_error",
    ])


def q_events_by_type_salted(sf_dir: str):
    """Two-phase SALTED aggregate over a genuinely hot key.

    ``event_type`` has a handful of distinct values over the whole
    events table — every key is hot, so a naive groupby funnels each
    key's entire volume through one reducer. The salted shape:
    phase 1 groups by ``(event_type, salt)`` (salt = user_id % 16,
    deterministic and data-derived) spreading each hot key over 16
    reducers; phase 2 re-aggregates the 16 partials per key. Combined
    with the map-side partial combine, shuffle volume is
    O(keys × salt × blocks) regardless of row skew.
    """
    n_salt = 16

    def _partial(batch: pa.Table) -> pa.Table:
        # vectorized per-batch combine: salt column + one Arrow
        # group_by (no Python row loop)
        from .stages.stats import partial_sum_count

        salt = pc.cast(
            pc.bit_wise_and(batch.column("user_id"), n_salt - 1),
            pa.int64(),
        )
        return partial_sum_count(
            pa.table({
                "event_type": batch.column("event_type"),
                "salt": salt,
                "value": batch.column("value"),
            }),
            ["event_type", "salt"], "value",
        )

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id", "value"])
    phase1 = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["event_type", "salt"])
        .aggregate(Sum("n_events"), Sum("sum_value"))
    )
    phase2 = phase1.groupby("event_type").aggregate(
        Sum("sum(n_events)"), Sum("sum(sum_value)")
    )

    def _finish(batch: pa.Table) -> pa.Table:
        sums = [
            math.floor(s * 1000000.0 + 0.5) / 1000000.0
            for s in batch.column("sum(sum(sum_value))").to_pylist()
        ]
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(sum(n_events))"), pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return phase2.map_batches(_finish, batch_format="pyarrow")


def q_extraction_boilerplate(sf_dir: str):
    """Boilerplate-stripping oracle: every drop rule is LOAD-BEARING.

    Wraps each document in HTML where the extractor must (a) drop a
    class-matched sidebar (``class="sidebar promo"``), (b) drop a
    pure-link nav list via link density, (c) drop a 1-char line via
    ``min_len``, (d) reverse an ``dir="rtl"`` line's token order, and
    keep exactly three content lines. Unlike the flagship identity
    oracle, a regression in ANY of those classifiers changes
    ``extracted_text`` and fails the DuckDB hash.
    """
    import html as html_mod

    from .pipelines.extraction import build_pipeline

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls = [f"doc://{i}" for i in ids]
        htmls = [
            (
                "<html><body>"
                "<div class='sidebar promo'><p>Best offers here now</p></div>"
                "<ul><li><a href='/1'>Home</a></li>"
                "<li><a href='/2'>Kontakt hier</a></li></ul>"
                f"<p>{html_mod.escape(t or '')}</p>"
                "<p>x</p>"
                f"<p>doc {i} end</p>"
                "<p dir='rtl'>aleph bet gimel</p>"
                "<footer><p>Impressum</p></footer>"
                "</body></html>"
            ).encode("utf-8")
            for i, t in zip(ids, texts)
        ]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "lang": batch.column("lang"),
        })

    pages = ds.map_batches(_to_pages, batch_format="pyarrow")
    out = build_pipeline(pages)
    return out.select_columns(["url", "extracted_text"])


def q_extraction_alto_roundtrip(sf_dir: str):
    """XML-dialect extraction, ORACLE-CHECKED: each document is
    serialized to ALTO v4 with the engine's own S4 emitter, then the
    FULL pipeline must sniff the dialect, parse it back and reproduce
    the text byte-identically — pinning the ALTO reader (namespace
    sniff, String/TextLine traversal) under the DuckDB gate, not just
    pytest."""
    from .functions.xmlout import doc_to_alto_xml
    from .pipelines.extraction import build_pipeline

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls = [f"doc://{i}" for i in ids]
        payloads = [
            doc_to_alto_xml(
                str(i), f"p{i}",
                [{"line_id": "l00000", "text": t or "",
                  "hpos": 80, "vpos": 100,
                  "width": 12 * len(t or ""), "height": 24}],
            )
            for i, t in zip(ids, texts)
        ]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": batch.column("lang"),
        })

    pages = ds.map_batches(_to_pages, batch_format="pyarrow")
    out = build_pipeline(pages)
    return out.select_columns(["url", "extracted_text"])


PAGE_NS = "http://schema.primaresearch.org/PAGE/gts/pagecontent/2019-07-15"


def q_extraction_page_roundtrip(sf_dir: str):
    """PAGE-dialect extraction, ORACLE-CHECKED: documents wrapped in
    PAGE 2019 XML (TextLine/TextEquiv/Unicode, no Word elements — the
    whole text is ONE token per reference parity) must sniff, parse
    and reproduce the text byte-identically."""
    from xml.sax.saxutils import escape

    from .pipelines.extraction import build_pipeline

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        urls = [f"doc://{i}" for i in ids]
        payloads = [
            (
                f'<?xml version="1.0"?><PcGts xmlns="{PAGE_NS}">'
                "<Page><TextRegion>"
                f'<TextLine id="l{i}">'
                '<Coords points="80,100 500,100 500,124 80,124"/>'
                f"<TextEquiv><Unicode>{escape(t or '')}</Unicode></TextEquiv>"
                "</TextLine></TextRegion></Page></PcGts>"
            ).encode("utf-8")
            for i, t in zip(ids, texts)
        ]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": batch.column("lang"),
        })

    pages = ds.map_batches(_to_pages, batch_format="pyarrow")
    out = build_pipeline(pages)
    return out.select_columns(["url", "extracted_text"])


def q_extraction_pdf_roundtrip(sf_dir: str):
    """PDF-dialect extraction, ORACLE-CHECKED: each document's text
    is typeset into a REAL multi-page PDF (FlateDecode content
    streams, page tree, xref) with the engine's own writer
    (``functions/pdf.py``), then the FULL pipeline must sniff the
    ``%PDF-`` header, walk the page tree, decompress and interpret
    the content streams (BT/Tf/TL/Td/T*/Tj) and reproduce the text
    byte-identically — pinning the "PDF/layout parse" leg under the
    DuckDB gate exactly like the ALTO/PAGE roundtrips. Lines are 8
    tokens each (4 per page → most docs span 2-4 pages); the parsed
    lines re-join with spaces to reconstruct the original text."""
    from .functions.pdf import doc_to_pdf
    from .pipelines.extraction import build_pipeline

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text", "lang"])

    def _to_pages(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        payloads = []
        for t in texts:
            toks = (t or "").split(" ")
            lines = [" ".join(toks[i:i + 8])
                     for i in range(0, len(toks), 8)]
            # a tail line shorter than min_len would be dropped by
            # the extractor's line filter — merge it back instead
            if len(lines) > 1 and len(lines[-1]) < 2:
                lines[-2:] = [lines[-2] + " " + lines[-1]]
            payloads.append(doc_to_pdf(lines, lines_per_page=4))
        return pa.table({
            "url": pa.array([f"doc://{i}" for i in ids], pa.string()),
            "warc_ts": pa.array([0] * len(ids), pa.timestamp("us")),
            "html": pa.array(payloads, pa.binary()),
            "lang": batch.column("lang"),
        })

    def _rejoin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch.column("url"),
            "extracted_text": pc.replace_substring(
                batch.column("extracted_text"), "\n", " "),
        })

    pages = ds.map_batches(_to_pages, batch_format="pyarrow")
    out = build_pipeline(pages)
    return out.select_columns(["url", "extracted_text"]).map_batches(
        _rejoin, batch_format="pyarrow")


def q_user_sessions(sf_dir: str):
    """Gap-based sessionization (30-min gap), one row per session.

    The engine's windowed-state shape: ONE crc32-bucketed shuffle of
    (user, ts, value, event_id), then a whole-bucket Arrow sort +
    vectorized numpy break/segment math — never a per-user UDF. The
    DuckDB twin is the classic lag()+cumulative-sum sessionization.
    """
    from .stages.temporal import sessionize

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "value", "event_id"],
    )
    return sessionize(ds, gap_minutes=30.0)


def q_event_gaps(sf_dir: str):
    """Per-user inter-event gaps (the LAG window): count / max /
    total of microsecond gaps between consecutive events per user.
    ONE user-bucket shuffle + vectorized numpy diff/reduceat — all
    int64, bit-exact vs the DuckDB lag() OVER twin."""
    from .stages.temporal import event_gaps

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id"],
    )
    return event_gaps(ds).sort("user_id")


def q_events_rollup(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day) with GROUPING() ids: one
    output row per (type, day), per type, and the grand total. The
    measure is int64 value-cents, so partial combines at every level
    sum order-free and the DuckDB ROLLUP twin is bit-exact."""
    import numpy as np

    from .stages.rollup import rollup_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64()),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    rolled = rollup_agg(prep, keys=["event_type", "day"],
                        value_col="cents")

    # Ray's sort range-partitioner mis-partitions (duplicates rows)
    # or crashes when a sort KEY contains nulls, and rollup subtotal
    # rows are null by design — sort on null-filled helper keys and
    # drop them (tests/test_rollup.py pins the hazard).
    def _sortable(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_et_ord", pc.fill_null(batch.column("event_type"), "")
        ).append_column(
            "_day_ord", pc.fill_null(
                pc.cast(batch.column("day"), pa.int64()), -1))

    return rolled.map_batches(_sortable, batch_format="pyarrow").sort(
        ["gid", "_et_ord", "_day_ord"]
    ).drop_columns(["_et_ord", "_day_ord"])


def q_events_cube(sf_dir: str):
    """GROUP BY CUBE(event_type, day): all four grouping sets —
    (type, day), (type), (day), () — with GROUPING() ids, over the
    same int64 value-cents measure as ``events_rollup`` (bit-exact
    vs the DuckDB CUBE twin). The day-only subtotal is the set
    ROLLUP cannot produce."""
    import numpy as np

    from .stages.rollup import cube_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64()),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    cubed = cube_agg(prep, keys=["event_type", "day"],
                     value_col="cents")

    # null-key sort hazard: sort on null-filled helper keys
    # (see q_events_rollup / tests/test_rollup.py)
    def _sortable(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_et_ord", pc.fill_null(batch.column("event_type"), "")
        ).append_column(
            "_day_ord", pc.fill_null(
                pc.cast(batch.column("day"), pa.int64()), -1))

    return cubed.map_batches(_sortable, batch_format="pyarrow").sort(
        ["gid", "_et_ord", "_day_ord"]
    ).drop_columns(["_et_ord", "_day_ord"])


def q_events_pivot(sf_dir: str):
    """PIVOT: one row per day, one int64 count column per event type
    (fixed column set, strict — an unseen type raises, never a silent
    drop). Map-side (day, type) partials → one day-bucket shuffle →
    vectorized matrix fill."""
    from .stages.rollup import pivot_counts

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "day": pc.floor_temporal(batch.column("ts"), unit="day"),
            "event_type": batch.column("event_type"),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    return pivot_counts(
        prep, row_col="day", col_col="event_type",
        col_values=["click", "error", "purchase", "signup", "view"],
    ).sort("day")


def q_events_sliding_window(sf_dir: str):
    """Trailing 3-hour sliding-window aggregate per event type.

    Phase 1 pre-aggregates to (type, hour) hourly partials (map-side
    combine — the shuffle carries hours, not events); phase 2 windows
    by VALUE inside whole-bucket UDFs, so missing hours weigh zero —
    exactly SQL ``RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND
    CURRENT ROW``.
    """
    from .stages.temporal import sliding_window_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"],
    )
    return sliding_window_agg(ds, window_hours=3)


def q_events_frame_window(sf_dir: str):
    """Positional ROWS-frame window per user (stages/temporal.py
    ``frame_window``): trailing-4-event spend sum + LEAD(cents) for
    every event, ordered by (ts, event_id). One row per event; the
    int64 cents measure keeps the DuckDB ``ROWS BETWEEN 3 PRECEDING
    AND CURRENT ROW`` / ``lead()`` twin bit-exact."""
    import numpy as np

    from .stages.temporal import frame_window

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"],
    )

    def _prep(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": batch.column("event_id"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64),
                pa.int64()),
        })

    prep = ds.map_batches(_prep, batch_format="pyarrow")
    out = frame_window(prep, key_col="user_id",
                       order_cols=["ts", "event_id"],
                       val_col="cents", preceding=3)
    return out.sort(["user_id", "ts", "event_id"])


def q_events_json_agg(sf_dir: str):
    """JSON scalar extraction (§2.8's JSON family — the reference
    parses LanguageTool's JSON response, `lib/ocr_step.py:395-402`):
    parse the ``props`` JSON column per event, extract ``k``, and
    aggregate per event type with map-side partial combine."""
    import json

    from ray.data.aggregate import Max, Min

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])

    def _extract(batch: pa.Table) -> pa.Table:
        ks = []
        for p in batch.column("props").to_pylist():
            try:
                v = json.loads(p).get("k") if p else None
            except (ValueError, AttributeError):
                v = None
            ks.append(v)
        return pa.table({
            "event_type": batch.column("event_type"),
            "k": pa.array(ks, pa.int64()),
        })

    agg = (
        ds.map_batches(_extract, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Count(), Sum("k"), Min("k"), Max("k"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("count()"), pa.int64()),
            "sum_k": pc.cast(batch.column("sum(k)"), pa.int64()),
            "min_k": pc.cast(batch.column("min(k)"), pa.int64()),
            "max_k": pc.cast(batch.column("max(k)"), pa.int64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def q_customers_no_orders(sf_dir: str):
    """ANTI join (NOT EXISTS): customers with no URGENT order.

    The right side is predicate-pruned at the read (priority filter,
    two columns), then both sides co-shuffle once by key hash —
    bucketed repartition anti join, no memory assumption on either
    side (the 100-TB shape for large-large existence filters).
    """
    from .stages.join import repartition_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"],
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    ).map_batches(
        lambda b: pa.table({"c_custkey": b.column("o_custkey")}),
        batch_format="pyarrow",
    )
    out = repartition_join(cust, orders, on="c_custkey", how="anti")

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
            "c_nationkey": pc.cast(batch.column("c_nationkey"),
                                   pa.int64()),
        })

    return out.map_batches(_fin, batch_format="pyarrow").sort("c_custkey")


def q_parts_ordered(sf_dir: str):
    """SEMI join (EXISTS): parts that appear in ≥1 lineitem.

    The right side is reduced to its DISTINCT key set FIRST (one
    groupby over keys only), then broadcast — membership filters
    never need the fact table's payload, so the broadcast side is
    bounded by key cardinality, not fact rows.
    """
    from .stages.join import broadcast_join

    part = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    )
    # per-block unique FIRST (shrinks the shuffle input to
    # blocks × per-block distinct), then a tiny global distinct so the
    # driver-side broadcast collection is bounded by |distinct keys|,
    # never blocks × distinct
    li_keys = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey"]
        )
        .map_batches(
            lambda b: pa.table({
                "p_partkey": pc.unique(b.column("l_partkey"))
            }),
            batch_format="pyarrow",
        )
        .groupby("p_partkey").aggregate(Count())
        .select_columns(["p_partkey"])
    )
    return broadcast_join(
        part, li_keys, on="p_partkey", how="semi"
    ).sort("p_partkey")


def q_customer_running_spend(sf_dir: str):
    """Grouped cumulative window: per-customer running order total,
    ordered by (orderdate, orderkey) — the
    ``SUM() OVER (PARTITION BY … ORDER BY …)`` operator as one hash
    shuffle + per-bucket segment cumsum (stages/temporal.py
    ``grouped_running_sum``)."""
    from .stages.temporal import grouped_running_sum

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate",
                 "o_totalprice"],
    )
    run = grouped_running_sum(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"],
        "o_totalprice", out_col="running",
    )
    return run.select_columns(
        ["o_orderkey", "o_custkey", "running"]
    ).sort("o_orderkey")


def q_lang_doc_rank(sf_dir: str):
    """Per-language window numbering (stages/rank.py
    ``grouped_rank``): row_number/rank/dense_rank OVER (PARTITION BY
    lang ORDER BY n_chars DESC, doc_id) in one key-hash shuffle —
    whole-bucket Arrow sort + change-mask cumsums, never a per-key
    UDF. dense ties group on n_chars alone (n_dense=1)."""
    from .stages.rank import grouped_rank

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    )
    out = grouped_rank(
        docs, "lang",
        [("n_chars", "descending"), ("doc_id", "ascending")],
        n_dense=1, n_buckets=32,
    )
    return out.select_columns(
        ["doc_id", "lang", "row_number", "rank", "dense_rank"])


def q_lang_doc_rank_dist(sf_dir: str):
    """SQL distribution windows (stages/rank.py
    ``grouped_rank(distribution=True)``): percent_rank + cume_dist
    OVER (PARTITION BY lang ORDER BY n_chars DESC) — same one-shuffle
    change-mask kernel, two extra integer divisions (bit-identical
    to the SQL twin; ties on n_chars alone, n_dense=1)."""
    from .stages.rank import grouped_rank

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
    )
    out = grouped_rank(
        docs, "lang",
        [("n_chars", "descending"), ("doc_id", "ascending")],
        n_dense=1, n_buckets=32, distribution=True,
    )
    return out.select_columns(
        ["doc_id", "lang", "percent_rank", "cume_dist"])


def q_approx_users_by_type(sf_dir: str):
    """Per-key KMV distinct sketch (stages/stats.py ``grouped_kmv``)
    — the scale path beside the exact ``distinct_users_by_type``:
    shuffle carries <= keys x k hash rows per block regardless of
    user cardinality. The ESTIMATE itself is oracle-pinned (md5
    hashes, identical float ops, 1e-6 grid)."""
    from .stages.stats import grouped_kmv

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
    )
    return grouped_kmv(events, "event_type", "user_id", k=16,
                       n_buckets=32)


def q_hll_users_by_type(sf_dir: str):
    """Per-key HyperLogLog distinct sketch (stages/stats.py
    ``grouped_hll``, m=64) — the fixed-size mergeable sketch beside
    KMV: the shuffle carries <= keys x 64 register rows per block
    and merge is plain max. Registers AND the estimate are
    oracle-pinned bit-for-bit (md5 hashes, exact dyadic register
    sum, identical float ops, 1e-6 grid)."""
    from .stages.stats import grouped_hll

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
    )
    return grouped_hll(events, "event_type", "user_id",
                       n_buckets=32).sort("event_type")


def q_cms_sketch(sf_dir: str):
    """Count-Min sketch of corpus token counts (stages/stats.py
    ``cms_sketch``): 4x1024 counters from one md5 per distinct token
    per block (four 8-hex digest chunks = the four row hashes);
    shuffle bounded by depth*width partial rows per block. The
    sketch itself is oracle-pinned BIT-FOR-BIT — approximate in
    estimate semantics, deterministic in construction."""
    from .stages.stats import cms_sketch

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["text"])
    return cms_sketch(docs, width=1024, depth=4)


def q_doc_chunks(sf_dir: str):
    """Overlapping token chunking (stages/textstats.py
    ``chunk_documents``): 64-token windows, stride 48, row-local
    vectorized explode — zero shuffles, the RAG/window splitter.
    Chunk content is pinned by md5 so the oracle compares window
    EXTRACTION byte-for-byte without hauling chunk text through the
    compare."""
    from .stages.dedup import _md5
    from .stages.textstats import chunk_documents

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _fn(batch: pa.Table) -> pa.Table:
        out = chunk_documents(batch, chunk_tokens=64, step=48)
        md5s = [_md5(t) for t in
                out.column("chunk_text").to_pylist()]
        return pa.table({
            "doc_id": out.column("doc_id"),
            "chunk_id": out.column("chunk_id"),
            "n_tokens": out.column("n_tokens"),
            "chunk_md5": pa.array(md5s, pa.string()),
        })

    return docs.map_batches(_fn, batch_format="pyarrow")


def q_events_value_stats(sf_dir: str):
    """Per-type value moments (stages/stats.py ``grouped_moments``):
    count/mean/var_samp from sufficient-statistic partials — blocks
    contribute (key, n, sum, sumsq) rows, one tiny groupby, finish
    math at key scale. Grid-rounded to the repo-wide 1e-6 float
    contract."""
    from .stages.stats import grouped_moments

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "value"])
    out = grouped_moments(events, "event_type", "value")

    def _grid(batch: pa.Table) -> pa.Table:
        def g(col):
            return pc.divide(
                pc.floor(pc.add(pc.multiply(col, 1e6), 0.5)), 1e6)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "mean_value": g(batch.column("mean_value")),
            "var_value": g(batch.column("var_value")),
        })

    return out.map_batches(_grid, batch_format="pyarrow")


def q_bucket_point_lookup(sf_dir: str):
    """Point lookup over clustered bucketed storage
    (stages/bucketed.py ``bucketed_lookup``): orders written ONCE
    bucketed+sorted by custkey (one file per bucket, 256-row row
    groups), then a key probe reads ONE bucket dir and lets parquet
    row-group min/max statistics skip inside it — the
    prune-at-the-read path a 100-TB store needs for key lookups. The
    pruning is asserted real (candidate row groups < total), not
    assumed."""
    import shutil

    from .stages.bucketed import bucketed_lookup, write_bucketed

    base = (f"/tmp/ocr_ray_ptlookup_{os.getpid()}_"
            f"{os.path.basename(os.path.normpath(sf_dir))}")
    shutil.rmtree(base, ignore_errors=True)
    n_buckets = 16
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(
        lambda b: pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "custkey": pc.cast(b.column("o_custkey"), pa.int64()),
        }),
        batch_format="pyarrow",
    )
    write_bucketed(orders, base, "custkey", n_buckets,
                   clustered=True, row_group_size=256)
    tbl, stats = bucketed_lookup(base, "custkey", 7,
                                 n_buckets=n_buckets, with_stats=True)
    # loud contract: clustering must have made the stats selective
    # whenever there is more than one row group to choose from
    if (stats["row_groups_total"] > 1
            and stats["row_groups_candidate"] >= stats["row_groups_total"]):
        raise AssertionError(
            f"row-group pruning ineffective: {stats}")
    return tbl


def q_distinct_users_by_type(sf_dir: str):
    """Exact COUNT(DISTINCT user_id) per event_type
    (stages/stats.py ``grouped_distinct_count``): map-side pair
    dedup, ONE key-hash co-shuffle, whole-bucket sentinel-encoded
    dedup + per-key valid count — the two-phase distinct shape that
    never shuffles raw rows."""
    from .stages.stats import grouped_distinct_count

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id"],
    )
    return grouped_distinct_count(
        events, "event_type", "user_id", out_col="n_users",
        n_buckets=32,
    )


def q_customer_orders_full(sf_dir: str):
    """ANSI FULL OUTER join with true SQL multiplicity
    (stages/join.py ``expand_join``): BUILDING-segment customers vs
    URGENT orders on custkey. A customer with k urgent orders emits
    k rows (duplicate-key expansion — the lookup joins can't express
    this); customers with none keep a null order side; urgent orders
    from other segments' customers keep a null customer side. Both
    sides predicate-and-column pruned at the read; one co-shuffle.
    """
    from .stages.join import expand_join

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name"],
        filter=pc.field("c_mktsegment") == "BUILDING",
    )
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice"],
        filter=pc.field("o_orderpriority") == "1-URGENT",
    ).map_batches(
        lambda b: pa.table({
            "c_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "o_totalprice": b.column("o_totalprice"),
        }),
        batch_format="pyarrow",
    )
    out = expand_join(cust, orders, on="c_custkey", how="full")

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "custkey": pc.cast(batch.column("c_custkey"), pa.int64()),
            "c_name": batch.column("c_name"),
            "o_orderkey": pc.cast(batch.column("o_orderkey"),
                                  pa.int64()),
            "o_totalprice": batch.column("o_totalprice"),
        })

    return out.map_batches(_fin, batch_format="pyarrow")


def q_revenue_by_nation(sf_dir: str):
    """Star-schema rollup across BOTH join strategies, oracle-checked.

    lineitem ⨝ orders runs as a ``repartition_join`` (both sides
    large at scale: one co-shuffle by crc32(orderkey) bucket,
    whole-bucket dict probe); orders ⨝ (customer ⨝ nation) runs as
    ONE ``broadcast_join`` — the two dimension tables are snowflaked
    into a single (custkey → nation) map on the driver first (both
    are dimension-scale), so the fact table is passed over once, not
    twice. Revenue = sum(extendedprice·(1−discount))
    per nation with map-side partial combine; round3 grid so
    summation-order float noise (~1e-8 relative) sits far below the
    comparison granularity.
    """
    from .stages.join import broadcast_join, repartition_join

    import pyarrow.parquet as pq

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    cust = cust.rename_columns(["o_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    nation = nation.rename_columns(["c_nationkey", "n_name"])
    cust_nation = cust.join(
        nation, keys=["c_nationkey"], join_type="inner"
    ).select(["o_custkey", "n_name"])

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    orders = broadcast_join(orders, cust_nation, on="o_custkey")

    def _orders_key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("o_orderkey"),
            "n_name": batch.column("n_name"),
        })

    orders_dim = orders.map_batches(_orders_key, batch_format="pyarrow")
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )
    joined = repartition_join(lineitem, orders_dim, on="l_orderkey")

    def _partial(batch: pa.Table) -> pa.Table:
        # map-side partial combine: the shuffle carries ~25 rows per
        # block, not one per lineitem row
        from .stages.stats import partial_sum_count

        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return partial_sum_count(
            pa.table({"n_name": batch.column("n_name"), "rev": rev}),
            ["n_name"], "rev", sum_name="rev", count_name="one",
        )

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev"), Sum("one"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        revs = [
            math.floor(v * 1000.0 + 0.5) / 1000.0
            for v in batch.column("sum(rev)").to_pylist()
        ]
        return pa.table({
            "n_name": batch.column("n_name"),
            "n_items": pc.cast(batch.column("sum(one)"), pa.int64()),
            "revenue": pa.array(revs, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


def q_top_parts_by_revenue(sf_dir: str):
    """Broadcast dimension join + partial agg + global top-k:
    lineitem ⨝ part (2k-row dimension, object-store broadcast),
    revenue per part, top 10 by (revenue desc, p_name asc)."""
    import pyarrow.parquet as pq

    from .stages.join import broadcast_join

    part = pq.read_table(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name"])
    part = part.rename_columns(["l_partkey", "p_name"])
    lineitem = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )
    joined = broadcast_join(lineitem, part, on="l_partkey")

    def _partial(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        return pa.table({"p_name": batch.column("p_name"), "rev": rev})

    agg = (
        joined.map_batches(_partial, batch_format="pyarrow")
        .groupby("p_name")
        .aggregate(Sum("rev"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        revs = [
            math.floor(v * 1000.0 + 0.5) / 1000.0
            for v in batch.column("sum(rev)").to_pylist()
        ]
        return pa.table({
            "p_name": batch.column("p_name"),
            "revenue": pa.array(revs, pa.float64()),
        })

    return (
        agg.map_batches(_finish, batch_format="pyarrow")
        .sort(key=["revenue", "p_name"], descending=[True, False])
        .limit(10)
    )


def q_click_attribution(sf_dir: str):
    """As-of join, ORACLE-CHECKED against DuckDB's native ASOF JOIN:
    for every click event, the latest view event by the same user
    at-or-before the click (the classic attribution/backfill shape).
    One crc32-bucketed co-shuffle; per-bucket sorted-right
    searchsorted probe — never a per-user UDF."""
    from .stages.join import asof_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    clicks = ev.filter(expr="event_type == 'click'").select_columns(
        ["event_id", "user_id", "ts"]
    )

    def _views(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch.column("event_type"), "view")
        b = batch.filter(m)
        return pa.table({
            "user_id": b.column("user_id"),
            "ts": b.column("ts"),
            "view_id": b.column("event_id"),
            "view_ts": b.column("ts"),
        })

    views = ev.map_batches(_views, batch_format="pyarrow")
    joined = asof_join(clicks, views, on="user_id", ts_col="ts",
                       right_cols=["view_id", "view_ts"], how="left")

    def _finish(batch: pa.Table) -> pa.Table:
        gap = pc.cast(
            pc.subtract(batch.column("ts"), batch.column("view_ts")),
            pa.duration("us"),
        )
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "view_id": batch.column("view_id"),
            "gap_us": pc.cast(gap, pa.int64()),
        })

    return joined.map_batches(_finish, batch_format="pyarrow")


def q_weighted_sample(sf_dir: str):
    """Length-proportional deterministic sample: keep a doc with
    probability min(1, n_chars/4000), coin = md5(doc_id) — pure
    integer comparison so the threshold reproduces bit-for-bit in
    SQL. Row-local, prunes at scan speed, no shuffle."""
    from .stages.stats import weighted_sample

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])
    return weighted_sample(ds, key_col="doc_id",
                           weight_col="n_chars", scale=4000)


def q_bpe_merges(sf_dir: str):
    """First 6 BPE merges learned over the corpus (rows-only: the
    trainer is iterative — round 1's statistic is oracle-pinned by
    ``token_pair_counts``; rounds 2+ are pinned to a sequential
    reference trainer in pytest). The corpus streams ONCE into the
    word histogram; every round runs over the bounded histogram."""
    from .stages.bpe import bpe_train

    return bpe_train(_docs(sf_dir, columns=["text"]), n_merges=6)


def q_profile_table(sf_dir: str):
    """One-pass per-column profile of the documents table — counts,
    nulls, min/max, numeric mean, md5-KMV distinct estimate — every
    statistic (including the sketch VALUE) oracle-checked against a
    per-column SQL twin. One streaming pass, driver merges only
    blocks × columns tiny partial rows."""
    from .stages.profile import profile_table

    ds = _docs(sf_dir, columns=["doc_id", "n_chars", "lang", "source"])
    return profile_table(ds, numeric_cols=["doc_id", "n_chars"],
                         string_cols=["lang", "source"], kmv_k=64)


def q_sequence_packing(sf_dir: str):
    """Training-data sequence packing plan, oracle-checked against a
    DuckDB global-window cumsum: each doc's coordinates in the
    contiguous 512-token packing stream (cum_before / seq_id /
    seq_offset / windows straddled), ordered by doc_id.

    Engine shape is the distributed prefix-sum: per-band partial sums
    → tiny driver prefix over the band histogram → one co-shuffle by
    band bucket with whole-bucket rebased cumsums. The oracle's
    ``sum() OVER (ORDER BY doc_id)`` is the sequential twin.
    """
    from .stages.pack import sequence_packing
    from .stages.textstats import token_count_fn

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        token_count_fn, batch_format="pyarrow"
    ).select_columns(["doc_id", "n_tokens"])
    packed = sequence_packing(ds, seq_len=512, band_size=64,
                              n_buckets=16)
    return packed.select_columns(
        ["doc_id", "n_tokens", "cum_before", "seq_id", "seq_offset",
         "n_windows"])


def q_campaign_attribution(sf_dir: str):
    """Range (interval) join, banded SHUFFLE strategy, oracle-checked
    against a DuckDB ``BETWEEN`` join: every event × every campaign
    window containing its timestamp — one row PER MATCHING PAIR.

    Campaigns are 24 deterministic 54-hour windows starting every 30
    hours through Jan 2024, so consecutive windows overlap by 24h and
    most events belong to exactly two — multi-match is load-bearing.
    The engine path cuts time into 1-day bands, replicates each window
    to the 3 bands it overlaps and co-shuffles (no memory assumption,
    no all-pairs scan); the pytest differential also covers the
    broadcast strategy.
    """
    import datetime as dt

    from .stages.join import range_join

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"])
    base = dt.datetime(2024, 1, 1)
    camp = pa.table({
        "campaign_id": pa.array(range(24), pa.int64()),
        "start_ts": pa.array(
            [base + dt.timedelta(hours=30 * k) for k in range(24)],
            pa.timestamp("us")),
        "end_ts": pa.array(
            [base + dt.timedelta(hours=30 * k + 54) for k in range(24)],
            pa.timestamp("us")),
    })
    joined = range_join(
        ev, ray.data.from_arrow(camp),
        value_col="ts", lo_col="start_ts", hi_col="end_ts",
        right_cols=["campaign_id"], how="inner",
        strategy="shuffle", band_width=86400e6, n_buckets=32,
    )
    return joined.select_columns(["event_id", "campaign_id",
                                  "event_type"])


def q_events_hourly(sf_dir: str):
    """Timestamp bucketing + grouped aggregate over the events table.

    Map-side partial combine: each batch reduces to one row per
    (hour, event_type) BEFORE the shuffle, so the groupby moves
    partials (keys × blocks rows), never raw events.
    """
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        from .stages.stats import partial_sum_count

        return partial_sum_count(
            pa.table({
                "hour": pc.floor_temporal(batch.column("ts"),
                                          unit="hour"),
                "event_type": batch.column("event_type"),
                "value": batch.column("value"),
            }),
            ["hour", "event_type"], "value",
            sum_name="value", count_name="n",
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Sum("n"), Sum("value"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        sums = [
            math.floor(s * 1000000.0 + 0.5) / 1000000.0
            for s in batch.column("sum(value)").to_pylist()
        ]
        return pa.table({
            "hour": pc.cast(batch.column("hour"), pa.timestamp("us")),
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(n)"), pa.int64()),
            "sum_value": pa.array(sums, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")


# ------------------------------------------------------------- oracles

# shared CTE fragments for the minhash family (3-token shingles,
# 4 md5-salted band hashes — mirrors stages/dedup.py exactly)
def shingle_cte(src: str = "documents") -> str:
    """The 3-token shingle CTE over an arbitrary (doc_id, text) source
    relation — mirrors stages/dedup.py shingling exactly."""
    return (
        f"t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM {src}), "
        "sh AS (SELECT doc_id, CASE WHEN len(toks) >= 3 THEN "
        "list_transform(generate_series(1, len(toks) - 2), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
        "ELSE [] END AS shingles FROM t)"
    )


SHINGLE_CTE = shingle_cte("documents")
SIG_FRAGMENT = (
    "sig AS (SELECT doc_id, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 1, 8))) AS h0, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 9, 8))) AS h1, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 17, 8))) AS h2, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 25, 8))) AS h3 "
    "FROM sh)"
)
SIG_CTE = SHINGLE_CTE + ", " + SIG_FRAGMENT
CAND_SELECT = (
    "SELECT d1, d2 FROM ("
    "SELECT a.doc_id AS d1, b.doc_id AS d2 FROM sig a JOIN sig b "
    "ON a.h0 = b.h0 AND a.doc_id < b.doc_id "
    "UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b "
    "ON a.h1 = b.h1 AND a.doc_id < b.doc_id "
    "UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b "
    "ON a.h2 = b.h2 AND a.doc_id < b.doc_id "
    "UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b "
    "ON a.h3 = b.h3 AND a.doc_id < b.doc_id)"
)

# connected-components closure over the candidate pair set: label
# every node with every reachable node (edges are symmetrized so
# reachability = component membership), then min per node — the SQL
# twin of stages/cluster.connected_components' min-label fixpoint.
CC_CTE = (
    "edges AS (SELECT d1 AS u, d2 AS v FROM cand "
    "UNION ALL SELECT d2, d1 FROM cand), "
    "lbl(node, lab) AS ("
    "SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
    "UNION "
    "SELECT e.u, l.lab FROM edges e JOIN lbl l ON l.node = e.v), "
    "clusters AS (SELECT node, MIN(lab) AS cluster_id FROM lbl "
    "GROUP BY node)"
)

# PII oracle fragments: the augmented text (mirrors _pii_augment —
# doc_id is non-negative so % == bit_and) and the sequential
# count-then-redact chain over stages.pii.PII_PATTERNS, one CTE per
# pattern so each count sees the text as already redacted by the
# previous patterns (the operator's ordering contract).
from .stages.pii import PII_PATTERNS as _PII_PATTERNS  # noqa: E402

_PII_AUG_CTE = (
    "aug AS (SELECT doc_id, coalesce(text, '') || ' contact user' || "
    "CAST(doc_id AS VARCHAR) || '@mail.example.com or +1-555-' || "
    "CAST(doc_id + 1000000 AS VARCHAR) || ' at 10.' || "
    "CAST(doc_id % 256 AS VARCHAR) || '.0.' || "
    "CAST(doc_id % 64 AS VARCHAR) AS x FROM documents)"
)


def _pii_chain_cte() -> str:
    frags, prev, carried = [], "aug", []
    for i, (name, pat, repl) in enumerate(_PII_PATTERNS, 1):
        keep = ", ".join(f"n_{c}" for c in carried)
        keep = keep + ", " if keep else ""
        frags.append(
            f"r{i} AS (SELECT doc_id, {keep}"
            f"len(regexp_extract_all(x, '{pat}')) AS n_{name}, "
            f"regexp_replace(x, '{pat}', '{repl}', 'g') AS x "
            f"FROM {prev})"
        )
        prev = f"r{i}"
        carried.append(name)
    return ", ".join(frags)


_PII_CHAIN_CTE = _pii_chain_cte()

def _profile_sql_col(col: str, numeric: bool) -> str:
    """One UNION-ALL arm of the profile_table oracle: the SQL twin of
    stages/profile.profile_table for a single column, including the
    md5-KMV distinct sketch (k=64) computed bit-for-bit."""
    kmv = (
        "(WITH h AS (SELECT DISTINCT CAST(('0x' || "
        "substr(md5(CAST({c} AS VARCHAR)), 1, 8)) AS UBIGINT) AS hv "
        "FROM documents WHERE {c} IS NOT NULL), "
        "kmin AS (SELECT hv FROM h ORDER BY hv LIMIT 64) "
        "SELECT CASE WHEN count(*) < 64 "
        "THEN CAST(count(*) AS DOUBLE) "
        "ELSE floor(63.0 / (CAST(max(hv) AS DOUBLE) / 4294967296.0) "
        "* 1000000.0 + 0.5) / 1000000.0 END FROM kmin)"
    ).format(c=col)
    if numeric:
        stats = (
            "CAST(min({c}) AS DOUBLE) AS vmin, "
            "CAST(max({c}) AS DOUBLE) AS vmax, "
            "floor(avg({c}) * 1000000.0 + 0.5) / 1000000.0 AS mean, "
            "CAST(NULL AS VARCHAR) AS smin, "
            "CAST(NULL AS VARCHAR) AS smax"
        ).format(c=col)
    else:
        stats = (
            "CAST(NULL AS DOUBLE) AS vmin, CAST(NULL AS DOUBLE) AS "
            "vmax, CAST(NULL AS DOUBLE) AS mean, "
            "min({c}) AS smin, max({c}) AS smax"
        ).format(c=col)
    return (
        f"SELECT '{col}' AS col, CAST(count(*) AS BIGINT) AS n_rows, "
        f"CAST(count(*) FILTER (WHERE {col} IS NULL) AS BIGINT) "
        f"AS n_nulls, " + stats
        + f", {kmv} AS n_distinct_kmv FROM documents"
    )


PROFILE_SQL = " UNION ALL ".join(
    [_profile_sql_col(c, True) for c in ("doc_id", "n_chars")]
    + [_profile_sql_col(c, False) for c in ("lang", "source")]
)

ORACLE_SQL: Dict[str, str] = {
    "profile_table": PROFILE_SQL,
    "replace_chars": (
        "SELECT doc_id, replace(replace(text, 'spark', 'ray'), "
        "'table', 'tbl') AS text_norm FROM documents"
    ),
    "replace_chars_stats": (
        "SELECT 'spark' AS k, CAST(count(*) FILTER (WHERE "
        "contains(text, 'spark')) AS BIGINT) AS n_docs FROM documents "
        "UNION ALL "
        "SELECT 'table' AS k, CAST(count(*) FILTER (WHERE "
        "contains(replace(text, 'spark', 'ray'), 'table')) AS BIGINT) "
        "AS n_docs FROM documents"
    ),
    "replace_regex": (
        "SELECT doc_id, CASE WHEN m = '' THEN text ELSE "
        "replace(text, m, replace(m, 'ar', 'er')) END AS text_regexed "
        "FROM (SELECT doc_id, text, "
        "regexp_extract(text, 's[a-z]*k', 0) AS m FROM documents)"
    ),
    "sanitize_chars": (
        "SELECT doc_id, "
        + SANITIZE_SQL.format(col="text")
        + " AS text_sanitized FROM documents"
    ),
    "token_count": (
        "SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) "
        "AS n_tokens FROM documents"
    ),
    "quality_report": QUALITY_SQL,
    "quality_bins": (
        "WITH q AS (" + QUALITY_SQL + ") "
        "SELECT LEAST(4, CAST(floor(hit_ratio / 15) AS BIGINT)) AS bin, "
        "CAST(count(*) AS BIGINT) AS n_docs FROM q "
        "WHERE hit_ratio <> -1.0 GROUP BY 1"
    ),
    "corpus_quality_summary": (
        "WITH q AS (" + QUALITY_SQL + ") "
        "SELECT CAST(count(*) FILTER (WHERE hit_ratio <> -1.0) AS BIGINT) AS n_valid, "
        "CAST(count(*) FILTER (WHERE hit_ratio = -1.0) AS BIGINT) AS n_invalid, "
        "floor(avg(hit_ratio) FILTER (WHERE hit_ratio <> -1.0) * 1000.0 + 0.5) / 1000.0 AS mean_ratio "
        "FROM q"
    ),
    "dedup_exact": (
        "SELECT md5(text) AS fp, CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY md5(text)"
    ),
    "dedup_first_rows": (
        "SELECT substr(md5(text), 1, 2) AS grp, doc_id, lang, "
        "CAST(n_chars AS BIGINT) AS n_chars FROM documents "
        "QUALIFY row_number() OVER ("
        "PARTITION BY substr(md5(text), 1, 2) ORDER BY doc_id) = 1"
    ),
    "fingerprint": (
        "SELECT doc_id, md5(text) AS fp, substr(md5(text), 1, 16) AS fp16 "
        "FROM documents"
    ),
    "winnow_fingerprint": (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "ti AS (SELECT doc_id, len(toks) AS n, list_transform(toks, "
        "x -> CAST(('0x' || substr(md5(x), 1, 8)) AS UBIGINT)) AS hs "
        "FROM t), "
        "w AS (SELECT doc_id, n, CASE WHEN n >= 8 THEN "
        "list_transform(generate_series(1, n - 7), "
        "i -> list_min(hs[i:i+7])) ELSE [] END AS mins FROM ti) "
        "SELECT doc_id, "
        "CAST(CASE WHEN n >= 8 THEN n - 7 ELSE 0 END AS BIGINT) "
        "AS n_windows, "
        "CAST(len(list_distinct(mins)) AS BIGINT) AS n_fps, "
        "CAST(CASE WHEN n >= 8 THEN list_min(mins) END AS BIGINT) "
        "AS fp_min FROM w"
    ),
    "lang_stats": (
        "SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS sum_chars, "
        "CAST(sum(n_chars) AS DOUBLE) / count(*) AS avg_chars "
        "FROM documents GROUP BY lang"
    ),
    "lang_id": (
        "SELECT doc_id, "
        "CAST(len(list_filter(string_split(text, ' '), "
        "x -> x = 'the' OR x = 'a')) AS BIGINT) AS s_en, "
        "CAST(len(list_filter(string_split(text, ' '), "
        "x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und')) AS BIGINT) AS s_de, "
        "CASE WHEN len(list_filter(string_split(text, ' '), "
        "x -> x = 'the' OR x = 'a')) > len(list_filter(string_split(text, ' '), "
        "x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und')) THEN 'en' "
        "WHEN len(list_filter(string_split(text, ' '), "
        "x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und')) > "
        "len(list_filter(string_split(text, ' '), x -> x = 'the' OR x = 'a')) "
        "THEN 'de' ELSE 'unk' END AS lang_pred "
        "FROM documents"
    ),
    "approx_distinct_tokens": (
        "WITH toks AS (SELECT DISTINCT unnest(string_split(text, ' ')) "
        "AS tok FROM documents), "
        "h AS (SELECT DISTINCT CAST(('0x' || substr(md5(tok), 1, 8)) "
        "AS UBIGINT) AS hv FROM toks), "
        "kmin AS (SELECT hv FROM h ORDER BY hv LIMIT 16) "
        "SELECT CAST((SELECT count(*) FROM toks) AS BIGINT) AS n_exact, "
        "CAST(16 AS BIGINT) AS k, "
        "CASE WHEN (SELECT count(*) FROM kmin) < 16 "
        "THEN CAST((SELECT count(*) FROM kmin) AS DOUBLE) "
        "ELSE floor(15.0 / (CAST((SELECT max(hv) FROM kmin) AS DOUBLE) "
        "/ 4294967296.0) * 1000000.0 + 0.5) / 1000000.0 "
        "END AS kmv_estimate"
    ),
    "customer_running_spend": (
        "SELECT o_orderkey, o_custkey, "
        "floor(SUM(o_totalprice) OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate, o_orderkey) * 1000000.0 + 0.5) "
        "/ 1000000.0 AS running FROM orders ORDER BY o_orderkey"
    ),
    "customers_no_orders": (
        "SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey "
        "FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        "AND o.o_orderpriority = '1-URGENT') "
        "ORDER BY c_custkey"
    ),
    "parts_ordered": (
        "SELECT p_partkey, p_brand FROM part p WHERE EXISTS "
        "(SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey) "
        "ORDER BY p_partkey"
    ),
    "tfidf_top_terms": (
        "WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) "
        "AS token FROM documents), "
        "tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf "
        "FROM tk GROUP BY doc_id, token), "
        "df AS (SELECT token, count(*) AS df FROM tf GROUP BY token), "
        "s AS (SELECT doc_id, token, "
        "floor(tf * ln(CAST((SELECT count(*) FROM documents) "
        "AS DOUBLE) / df) * 1000000.0 + 0.5) / 1000000.0 AS score "
        "FROM tf JOIN df USING (token)) "
        "SELECT doc_id, token, score FROM s "
        "QUALIFY row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score DESC, token ASC) <= 3 "
        "ORDER BY doc_id, token"
    ),
    "lang_quantiles": (
        # HAVING mirrors the operator contract: a key whose value
        # column is entirely NULL has no quantiles and is omitted
        "SELECT lang, unnest([0.25, 0.5, 0.9]) AS q, "
        "CAST(unnest(quantile_disc(n_chars, [0.25, 0.5, 0.9])) "
        "AS BIGINT) AS value FROM documents GROUP BY lang "
        "HAVING count(n_chars) > 0"
    ),
    "corpus_p10_cut": (
        "SELECT doc_id, n_chars FROM documents "
        "WHERE n_chars > (SELECT quantile_disc(n_chars, 0.1) "
        "FROM documents) ORDER BY doc_id"
    ),
    "corpus_quantiles": (
        "SELECT unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS q, "
        "CAST(unnest(quantile_disc(n_chars, "
        "[0.1, 0.25, 0.5, 0.75, 0.9, 0.99])) AS BIGINT) AS value "
        "FROM documents"
    ),
    "stratified_sample": (
        "SELECT doc_id, lang FROM documents "
        "WHERE CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) "
        "% 100 < 20"
    ),
    "top_docs_per_lang": (
        "SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars "
        "FROM documents "
        "QUALIFY row_number() OVER (PARTITION BY lang "
        "ORDER BY n_chars DESC, doc_id ASC) <= 3"
    ),
    "quality_rank": (
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, "
        "CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) "
        "AS rnk, "
        "CAST(ntile(4) OVER (ORDER BY n_chars, doc_id) AS BIGINT) "
        "AS tile FROM documents ORDER BY doc_id"
    ),
    "sample_exact_k": (
        "SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars "
        "FROM documents "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT 100"
    ),
    "approx_quantiles": (
        "WITH h AS (SELECT LEAST(GREATEST((n_chars - 0) // 100, 0), 99)"
        " AS b, count(*) AS n FROM documents "
        "WHERE n_chars IS NOT NULL GROUP BY 1), "
        "c AS (SELECT b, CAST(sum(n) OVER (ORDER BY b) AS BIGINT) "
        "AS cum FROM h), "
        "tot AS (SELECT max(cum) AS n FROM c), "
        "qs AS (SELECT CAST(unnest([0.1, 0.5, 0.9, 0.99]) AS DOUBLE) "
        "AS q) "
        "SELECT q, CAST(((SELECT min(b) FROM c WHERE cum >= "
        "GREATEST(CAST(ceil(q * tot.n) AS BIGINT) - 1, 0) + 1) + 1) "
        "* 100 - 1 AS BIGINT) AS value_est "
        "FROM qs, tot ORDER BY q"
    ),
    "near_dup_incremental": (
        "WITH " + SIG_CTE + " "
        "SELECT n.doc_id AS d_new, c.doc_id AS d_old "
        "FROM sig n JOIN sig c ON n.doc_id % 2 = 1 "
        "AND c.doc_id % 2 = 0 AND (n.h0 = c.h0 OR n.h1 = c.h1 "
        "OR n.h2 = c.h2 OR n.h3 = c.h3) ORDER BY 1, 2"
    ),
    "bucketed_order_counts": (
        "SELECT o_custkey AS custkey, CAST(count(*) AS BIGINT) "
        "AS n_orders FROM orders GROUP BY 1"
    ),
    "bucketed_join_orders": (
        "SELECT o.o_orderkey, o.o_custkey AS custkey, "
        "c.c_mktsegment AS mktsegment FROM orders o "
        "JOIN customer c ON o.o_custkey = c.c_custkey"
    ),
    "docs_except": (
        "SELECT lang, source FROM documents WHERE doc_id % 7 < 3 "
        "EXCEPT "
        "SELECT lang, source FROM documents WHERE doc_id % 7 >= 3"
    ),
    "docs_intersect": (
        "SELECT lang, source FROM documents WHERE doc_id % 7 < 3 "
        "INTERSECT "
        "SELECT lang, source FROM documents WHERE doc_id % 7 >= 3"
    ),
    "events_value_histogram": (
        "SELECT event_type, CAST(least(greatest(floor((value - 0.0) "
        "/ 10.0), 0), 9) AS BIGINT) AS bin, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        "WHERE value IS NOT NULL GROUP BY 1, 2"
    ),
    "host_skew_stats": (
        "WITH h AS (SELECT 'host' || CAST(" + _HOST_ID_SQL
        + " AS VARCHAR) || '.example.com' AS host FROM documents), "
        "c AS (SELECT host, CAST(count(*) AS BIGINT) AS n FROM h "
        "GROUP BY host) "
        "SELECT 'n_keys' AS stat, CAST(count(*) AS BIGINT) AS value "
        "FROM c "
        "UNION ALL SELECT 'n_rows', CAST(sum(n) AS BIGINT) FROM c "
        "UNION ALL SELECT 'max_count', max(n) FROM c "
        "UNION ALL SELECT 'p50_count', quantile_disc(n, 0.5) FROM c "
        "UNION ALL SELECT 'p90_count', quantile_disc(n, 0.9) FROM c "
        "UNION ALL SELECT 'p99_count', quantile_disc(n, 0.99) FROM c "
        "UNION ALL SELECT 'top_share_ppm', "
        "CAST(max(n) * 1000000 // sum(n) AS BIGINT) FROM c"
    ),
    "peak_sessions": (
        "WITH e AS (SELECT user_id, ts, event_id, CASE WHEN lag(ts) OVER w IS NULL OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM e), iv AS (SELECT epoch_us(min(ts)) AS st, CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) AS dur FROM s GROUP BY user_id, sess), ev AS (SELECT st AS t, 1 AS delta FROM iv UNION ALL SELECT st + dur + 1, -1 FROM iv), run AS (SELECT sum(delta) OVER (ORDER BY t, delta ROWS UNBOUNDED PRECEDING) AS c FROM ev) SELECT CAST(max(c) AS BIGINT) AS peak FROM run"
    ),
    "user_retention": (
        "WITH p AS (SELECT DISTINCT user_id, "
        "date_trunc('day', ts) AS d FROM events), "
        "f AS (SELECT user_id, min(d) AS c FROM p GROUP BY user_id) "
        "SELECT f.c AS cohort_day, "
        "CAST(date_diff('day', f.c, p.d) AS BIGINT) AS day_offset, "
        "CAST(count(*) AS BIGINT) AS n_users "
        "FROM p JOIN f ON p.user_id = f.user_id GROUP BY 1, 2"
    ),
    "triangle_count": (
        "WITH ids AS (SELECT doc_id AS i, "
        "(SELECT count(*) FROM documents) AS n FROM documents), "
        "e0 AS (SELECT i AS src, (i + 1) % n AS dst FROM ids "
        "UNION ALL SELECT i, (i + 2) % n FROM ids "
        "UNION ALL SELECT i, (7 * i + 3) % n FROM ids), "
        "e AS (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM e0 WHERE src != dst) "
        "SELECT CAST(count(*) AS BIGINT) AS n_triangles "
        "FROM e a JOIN e b ON a.v = b.u "
        "JOIN e c ON c.u = a.u AND c.v = b.v"
    ),
    "docs_checksum": (
        "WITH comp AS (SELECT "
        "COALESCE(CAST(doc_id AS VARCHAR), chr(30)) || chr(31) || "
        "COALESCE(lang, chr(30)) || chr(31) || "
        "COALESCE(source, chr(30)) || chr(31) AS c FROM documents), "
        "h AS (SELECT CAST(('0x' || substr(md5(c), 1, 15)) "
        "AS UBIGINT) AS hv FROM comp) "
        "SELECT CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(hv) % 9223372036854775808 AS BIGINT) AS checksum "
        "FROM h"
    ),
    "user_event_trail": (
        "SELECT user_id, string_agg(event_type, ',' "
        "ORDER BY ts, event_id) AS trail FROM events GROUP BY user_id"
    ),
    "fuzzy_name_pairs": (
        "SELECT CAST(x.c_custkey AS BIGINT) AS id_a, "
        "CAST(y.c_custkey AS BIGINT) AS id_b, "
        "x.c_name AS s_a, y.c_name AS s_b "
        "FROM customer x JOIN customer y ON x.c_custkey < y.c_custkey "
        "AND levenshtein(x.c_name, y.c_name) <= 1"
    ),
    "quality_classifier": (
        "WITH toks AS (SELECT doc_id, "
        "unnest(string_split(text, ' ')) AS tok FROM documents), "
        "h AS (SELECT doc_id, CAST(CAST(('0x' || substr(md5(tok), 1, "
        "8)) AS UBIGINT) AS BIGINT) AS hv FROM toks), "
        "cells AS (SELECT doc_id, hv % 64 AS d, CASE WHEN "
        "(hv // 65536) % 2 = 1 THEN 1 ELSE -1 END AS sgn FROM h), "
        "dots AS (SELECT doc_id, sum(sgn * (((d * 37) % 21) - 10)) "
        "AS dot FROM cells GROUP BY doc_id) "
        "SELECT d.doc_id, CAST(COALESCE(dt.dot, 0) + 3 AS BIGINT) "
        "AS logit, (COALESCE(dt.dot, 0) + 3 >= 0) AS label "
        "FROM documents d LEFT JOIN dots dt ON d.doc_id = dt.doc_id"
    ),
    "source_extract": (
        "SELECT doc_id, "
        "regexp_extract(source, '^src(\\d+)$', 1) AS src_num, "
        "regexp_extract(text, '\\b(b[a-z]+)', 1) AS first_b "
        "FROM documents"
    ),
    "docs_union": (
        "SELECT lang, source FROM documents WHERE doc_id % 7 < 3 "
        "UNION "
        "SELECT lang, source FROM documents WHERE doc_id % 7 >= 3"
    ),
    "source_overlap": (
        "WITH t AS (SELECT source, string_split(text, ' ') AS toks "
        "FROM documents), "
        "sh AS (SELECT source, CASE WHEN len(toks) >= 3 THEN "
        "list_transform(generate_series(1, len(toks) - 2), "
        "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
        "ELSE [] END AS shingles FROM t), "
        "ss AS (SELECT DISTINCT source, unnest(shingles) AS s FROM sh) "
        "SELECT a.source AS source_a, b.source AS source_b, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        "FROM ss a JOIN ss b ON a.s = b.s AND a.source < b.source "
        "GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "training_pipeline": (
        # extraction is identity on this page construction (pinned by
        # extraction_flagship), so the chain starts from documents
        "WITH q AS (SELECT doc_id, text, string_split(text, ' ') AS tk "
        "FROM documents), "
        "f AS (SELECT doc_id, text FROM q "
        "WHERE len(tk) >= 30 AND length(text) >= 200 "
        "AND CAST(len(list_filter(tk, x -> length(x) <= 2)) AS DOUBLE) "
        "/ len(tk) <= 0.30 "
        "AND CAST(length(text) - (len(tk) - 1) AS DOUBLE) / len(tk) "
        "<= 12.0), "
        "d AS (SELECT doc_id, text FROM f QUALIFY row_number() OVER ("
        "PARTITION BY md5(text) ORDER BY doc_id) = 1), "
        + shingle_cte("d") + ", " + SIG_FRAGMENT + ", "
        "cand AS (" + CAND_SELECT + "), "
        "dsh AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh), "
        "dropset AS (SELECT DISTINCT c.d2 FROM cand c "
        "JOIN dsh a ON a.doc_id = c.d1 JOIN dsh b ON b.doc_id = c.d2 "
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
        "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8) "
        "SELECT doc_id, "
        "CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) "
        "% 100 < 90 THEN 'train' "
        "WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) "
        "% 100 < 95 THEN 'val' ELSE 'test' END AS split, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
        "FROM d WHERE doc_id NOT IN (SELECT d2 FROM dropset)"
    ),
    "corpus_filter": (
        "WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') "
        "AS toks FROM documents), "
        "f AS (SELECT doc_id, lang, "
        "CAST(length(text) AS BIGINT) AS n_chars_text, "
        "CAST(len(toks) AS BIGINT) AS n_tokens, "
        "CAST(len(list_filter(toks, x -> length(x) <= 2)) AS DOUBLE) "
        "/ len(toks) AS short_ratio, "
        "CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) "
        "AS mean_token_len FROM t) "
        "SELECT doc_id, lang, n_tokens, n_chars_text FROM f "
        "WHERE n_tokens >= 30 AND n_chars_text >= 200 "
        "AND short_ratio <= 0.30 AND mean_token_len <= 12.0"
    ),
    "quality_heuristics": (
        "WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks "
        "FROM documents) "
        "SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_text, "
        "CAST(len(toks) AS BIGINT) AS n_tokens, "
        "CAST(len(list_filter(toks, x -> length(x) <= 2)) AS DOUBLE) / len(toks) AS short_ratio, "
        "CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS DOUBLE) / len(toks) AS stop_ratio, "
        "CAST(length(text) - (len(toks) - 1) AS DOUBLE) / len(toks) AS mean_token_len "
        "FROM t"
    ),
    "url_canonicalize": (
        "WITH b AS (SELECT doc_id, doc_id % 5 AS v, "
        "CAST(doc_id AS VARCHAR) AS ids, "
        "CAST(doc_id % 97 AS VARCHAR) AS hid FROM documents) "
        "SELECT doc_id, "
        "CASE v WHEN 0 THEN 'HTTP://Host' || hid || "
        "'.Example.COM:80/p/' || ids || '#sec' "
        "WHEN 1 THEN 'https://host' || hid || '.example.com:443/' "
        "WHEN 2 THEN 'https://host' || hid || '.example.com/p/' || ids "
        "|| '?utm_source=feed&utm_medium=rss' "
        "WHEN 3 THEN 'http://host' || hid || '.example.com/p/' || ids "
        "|| '?a=1&utm_x=2' "
        "ELSE 'http://host' || hid || '.example.com/p/' || ids "
        "END AS url, "
        "CASE v WHEN 1 THEN 'https://host' || hid || '.example.com' "
        "WHEN 2 THEN 'https://host' || hid || '.example.com/p/' || ids "
        "WHEN 3 THEN 'http://host' || hid || '.example.com/p/' || ids "
        "|| '?a=1' "
        "ELSE 'http://host' || hid || '.example.com/p/' || ids "
        "END AS url_canon FROM b"
    ),
    "sequence_packing": (
        "WITH t AS (SELECT doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens "
        "FROM documents), "
        "c AS (SELECT doc_id, n_tokens, "
        "CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
        "AS BIGINT) AS cum_before FROM t) "
        "SELECT doc_id, n_tokens, cum_before, "
        "cum_before // 512 AS seq_id, "
        "cum_before % 512 AS seq_offset, "
        "CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE "
        "(cum_before + n_tokens - 1) // 512 - cum_before // 512 + 1 "
        "END AS BIGINT) AS n_windows FROM c"
    ),
    "campaign_attribution": (
        "WITH camp AS (SELECT k AS campaign_id, "
        "TIMESTAMP '2024-01-01' + to_hours(30 * k) AS start_ts, "
        "TIMESTAMP '2024-01-01' + to_hours(30 * k + 54) AS end_ts "
        "FROM (SELECT unnest(range(24)) AS k)) "
        "SELECT event_id, campaign_id, event_type "
        "FROM events JOIN camp "
        "ON events.ts BETWEEN camp.start_ts AND camp.end_ts"
    ),
    "nfc_normalize": (
        "SELECT doc_id, "
        "nfc_normalize(replace(text, 'e', 'e' || chr(769))) AS text_nfc "
        "FROM documents"
    ),
    "inverted_index": (
        "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) "
        "AS token FROM documents WHERE text IS NOT NULL), "
        "tf AS (SELECT token, doc_id, count(*) AS tf FROM t "
        "GROUP BY token, doc_id) "
        "SELECT token, CAST(count(*) AS BIGINT) AS df, "
        "array_to_string((list(doc_id ORDER BY doc_id))[1:16], ',') "
        "AS doc_ids_csv, "
        "array_to_string((list(tf ORDER BY doc_id))[1:16], ',') "
        "AS tfs_csv, "
        "count(*) > 16 AS truncated "
        "FROM tf GROUP BY token ORDER BY token"
    ),
    "heavy_hitters": (
        "WITH t AS (SELECT unnest(string_split(text, ' ')) AS token "
        "FROM documents WHERE text IS NOT NULL), "
        "tot AS (SELECT count(*) AS nt FROM t) "
        "SELECT token, CAST(count(*) AS BIGINT) AS n "
        "FROM t, tot GROUP BY token, tot.nt "
        "HAVING count(*) * 1000 >= 33 * tot.nt "
        "ORDER BY n DESC, token"
    ),
    "paragraph_dedup": (
        "WITH aug AS (SELECT doc_id, 'shared ' || "
        "CAST(doc_id % 40 AS VARCHAR) || chr(10) || chr(10) || "
        "coalesce(text, '') || chr(10) || chr(10) || 'common footer' "
        "AS t FROM documents), "
        "p AS (SELECT doc_id, g - 1 AS para_idx, paras[g] AS para "
        "FROM (SELECT doc_id, string_split(t, chr(10) || chr(10)) "
        "AS paras FROM aug), "
        "LATERAL unnest(range(1, len(paras) + 1)) AS r(g)), "
        "f AS (SELECT doc_id, para_idx, para, row_number() OVER "
        "(PARTITION BY md5(para) ORDER BY doc_id, para_idx) AS rn "
        "FROM p) "
        "SELECT doc_id, string_agg(para, chr(10) || chr(10) "
        "ORDER BY para_idx) AS text_dedup, "
        "CAST(count(*) AS BIGINT) AS n_kept "
        "FROM f WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id"
    ),
    "pagerank": (
        "WITH nn AS (SELECT count(*) AS c FROM documents), "
        "nodes AS (SELECT doc_id AS node FROM documents), "
        "edges AS ("
        "SELECT node AS src, (node*7+1) % nn.c AS dst FROM nodes, nn "
        "UNION ALL SELECT node, (node*13+2) % nn.c FROM nodes, nn "
        "WHERE node % 3 >= 1 "
        "UNION ALL SELECT node, (node*29+5) % nn.c FROM nodes, nn "
        "WHERE node % 3 = 2), "
        "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src), "
        "r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r "
        "FROM nodes), "
        "s1 AS (SELECT e.dst AS node, sum(r.r // g.d) AS s "
        "FROM edges e JOIN r0 r ON r.node = e.src "
        "JOIN deg g ON g.src = e.src GROUP BY e.dst), "
        "r1 AS (SELECT n2.node, 150000000 + 85 * coalesce(s1.s, 0) "
        "// 100 AS r FROM nodes n2 LEFT JOIN s1 USING (node)), "
        "s2 AS (SELECT e.dst AS node, sum(r.r // g.d) AS s "
        "FROM edges e JOIN r1 r ON r.node = e.src "
        "JOIN deg g ON g.src = e.src GROUP BY e.dst), "
        "r2 AS (SELECT n2.node, 150000000 + 85 * coalesce(s2.s, 0) "
        "// 100 AS r FROM nodes n2 LEFT JOIN s2 USING (node)), "
        "s3 AS (SELECT e.dst AS node, sum(r.r // g.d) AS s "
        "FROM edges e JOIN r2 r ON r.node = e.src "
        "JOIN deg g ON g.src = e.src GROUP BY e.dst), "
        "r3 AS (SELECT n2.node, 150000000 + 85 * coalesce(s3.s, 0) "
        "// 100 AS r FROM nodes n2 LEFT JOIN s3 USING (node)) "
        "SELECT node AS doc_id, CAST(r AS BIGINT) AS rank_score "
        "FROM r3 ORDER BY node"
    ),
    "substring_dedup": (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "w0 AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 3)) "
        "AS i FROM t), "
        "w AS (SELECT doc_id, i, array_to_string(toks[i:i+4], ' ') "
        "AS gram FROM w0), "
        "dup AS (SELECT gram FROM w GROUP BY gram "
        "HAVING count(*) >= 2), "
        "cov AS (SELECT DISTINCT d.doc_id, d.i + o.o AS p "
        "FROM (SELECT w.doc_id, w.i FROM w JOIN dup USING (gram)) d "
        "CROSS JOIN (SELECT unnest(range(0, 5)) AS o) o), "
        "tok AS (SELECT doc_id, unnest(toks) AS tok, "
        "unnest(range(1, len(toks) + 1)) AS pos FROM t), "
        "kept AS (SELECT k.doc_id, k.tok, k.pos FROM tok k "
        "LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.p = k.pos "
        "WHERE c.p IS NULL), "
        "agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) "
        "AS clean_text, count(*) AS n_kept FROM kept GROUP BY doc_id) "
        "SELECT d.doc_id, CASE WHEN d.text IS NULL THEN NULL "
        "ELSE coalesce(a.clean_text, '') END AS clean_text, "
        "CAST(CASE WHEN d.text IS NULL THEN 0 "
        "ELSE len(string_split(d.text, ' ')) - coalesce(a.n_kept, 0) "
        "END AS BIGINT) AS n_removed "
        "FROM documents d LEFT JOIN agg a USING (doc_id) "
        "ORDER BY doc_id"
    ),
    "host_stats": (
        "SELECT 'host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) || "
        "'.example.com' AS host, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_n_chars "
        "FROM documents GROUP BY 1"
    ),
    "weighted_sample": (
        "SELECT doc_id, n_chars FROM documents "
        "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), "
        "1, 8)) AS UBIGINT) * 4000 < n_chars * 4294967296"
    ),
    "host_cap": (
        "SELECT doc_id, host FROM ("
        "SELECT doc_id, 'host' || CAST(" + _HOST_ID_SQL
        + " AS VARCHAR) || '.example.com' AS host FROM documents) "
        "QUALIFY row_number() OVER "
        "(PARTITION BY host ORDER BY doc_id) <= 5"
    ),
    "host_blocklist": (
        "SELECT doc_id, 'http://host' || "
        "CAST(" + _HOST_ID_SQL + " AS VARCHAR) || "
        "'.example.com/p/' || CAST(doc_id AS VARCHAR) AS url "
        "FROM documents WHERE (" + _HOST_ID_SQL + ") % 10 <> 0 "
        "ORDER BY doc_id"
    ),
    "pii_redact": (
        "WITH " + _PII_AUG_CTE + ", " + _PII_CHAIN_CTE +
        " SELECT doc_id, CAST(n_email AS BIGINT) AS n_email, "
        "CAST(n_ip AS BIGINT) AS n_ip, "
        "CAST(n_phone AS BIGINT) AS n_phone, x AS text_redacted FROM r3"
    ),
    "pii_summary": (
        "WITH " + _PII_AUG_CTE + ", " + _PII_CHAIN_CTE +
        " SELECT CAST(sum(n_email) AS BIGINT) AS n_email, "
        "CAST(sum(n_ip) AS BIGINT) AS n_ip, "
        "CAST(sum(n_phone) AS BIGINT) AS n_phone, "
        "CAST(sum(CASE WHEN n_email + n_ip + n_phone > 0 THEN 1 "
        "ELSE 0 END) AS BIGINT) AS n_docs_hit FROM r3"
    ),
    "repetition_stats": (
        # bigrams of the single-space split; docs with <2 tokens have
        # none and are dropped (mirrors repetition_stats_fn). Every
        # fraction is ONE IEEE double division of exact ints, so the
        # hash compare is bit-exact.
        "WITH t AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') "
        "AS toks FROM documents), "
        "b AS (SELECT doc_id, toks[g] || ' ' || toks[g + 1] AS bg "
        "FROM t, LATERAL unnest(range(1, len(toks))) AS r(g) "
        "WHERE len(toks) >= 2), "
        "g AS (SELECT doc_id, bg, count(*) AS c FROM b "
        "GROUP BY doc_id, bg) "
        "SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, "
        "1.0 - CAST(count(*) AS DOUBLE) / CAST(sum(c) AS BIGINT) "
        "AS dup_bigram_frac, "
        "CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) "
        "AS top_bigram_frac FROM g GROUP BY doc_id"
    ),
    "token_rarity": (
        # occurrence-weighted mean document frequency; every sum is
        # exact int arithmetic, the final division is the single
        # IEEE double op (bit-exact vs token_rarity's _finish)
        "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) "
        "AS tok FROM documents WHERE text IS NOT NULL), "
        "tf AS (SELECT doc_id, tok, count(*) AS tf FROM t "
        "GROUP BY doc_id, tok), "
        "df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok) "
        "SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
        "CAST(sum(tf.tf * df.df) AS DOUBLE) / "
        "CAST(sum(tf.tf) AS BIGINT) AS mean_df "
        "FROM tf JOIN df USING (tok) GROUP BY tf.doc_id"
    ),
    "minhash_signatures": (
        "WITH " + SHINGLE_CTE + " "
        "SELECT doc_id, "
        "list_min(list_transform(shingles, s -> substr(md5(s), 1, 8))) AS h0, "
        "list_min(list_transform(shingles, s -> substr(md5(s), 9, 8))) AS h1, "
        "list_min(list_transform(shingles, s -> substr(md5(s), 17, 8))) AS h2, "
        "list_min(list_transform(shingles, s -> substr(md5(s), 25, 8))) AS h3 "
        "FROM sh"
    ),
    "minhash_dup_pairs": "WITH " + SIG_CTE + " " + CAND_SELECT,
    "decontaminate": (
        "WITH " + SHINGLE_CTE + ", "
        "bench AS (SELECT list(DISTINCT s) AS bs FROM ("
        "SELECT unnest(shingles) AS s FROM sh WHERE doc_id < 10)), "
        "corpus AS (SELECT doc_id, list_distinct(shingles) AS ds "
        "FROM sh WHERE doc_id >= 10) "
        "SELECT doc_id, CAST(len(list_intersect(ds, bs)) AS BIGINT) "
        "AS n_overlap FROM corpus, bench "
        "WHERE len(list_intersect(ds, bs)) >= 1 "
        "ORDER BY doc_id"
    ),
    "dedup_incremental": (
        "SELECT doc_id, md5(text) AS fp FROM documents d "
        "WHERE doc_id % 2 = 1 AND NOT EXISTS "
        "(SELECT 1 FROM documents e WHERE e.doc_id % 2 = 0 "
        "AND md5(e.text) = md5(d.text)) ORDER BY doc_id"
    ),
    # Bloom semi-join reduction must be EXACT — same oracle
    "dedup_incremental_bloom": (
        "SELECT doc_id, md5(text) AS fp FROM documents d "
        "WHERE doc_id % 2 = 1 AND NOT EXISTS "
        "(SELECT 1 FROM documents e WHERE e.doc_id % 2 = 0 "
        "AND md5(e.text) = md5(d.text)) ORDER BY doc_id"
    ),
    "dup_clusters": (
        "WITH RECURSIVE " + SIG_CTE + ", cand AS (" + CAND_SELECT + "), "
        + CC_CTE +
        " SELECT node AS doc_id, cluster_id FROM clusters ORDER BY doc_id"
    ),
    "dedup_canonical": (
        "WITH RECURSIVE " + SIG_CTE + ", cand AS (" + CAND_SELECT + "), "
        + CC_CTE +
        " SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars "
        "FROM documents d WHERE d.doc_id NOT IN "
        "(SELECT node FROM clusters WHERE node != cluster_id) "
        "ORDER BY d.doc_id"
    ),
    "containment_pairs": (
        "WITH " + SIG_CTE + ", "
        "cand AS (" + CAND_SELECT + "), "
        "dsh AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh), "
        "j AS (SELECT c.d1, c.d2, "
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
        "least(len(a.s), len(b.s)) AS cont "
        "FROM cand c JOIN dsh a ON a.doc_id = c.d1 "
        "JOIN dsh b ON b.doc_id = c.d2) "
        "SELECT d1, d2, floor(cont * 1000000.0 + 0.5) / 1000000.0 "
        "AS containment FROM j WHERE cont >= 0.9"
    ),
    "jaccard_dup_pairs": (
        "WITH " + SIG_CTE + ", "
        "cand AS (" + CAND_SELECT + "), "
        "dsh AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh), "
        "j AS (SELECT c.d1, c.d2, "
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
        "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac "
        "FROM cand c JOIN dsh a ON a.doc_id = c.d1 "
        "JOIN dsh b ON b.doc_id = c.d2) "
        "SELECT d1, d2, floor(jac * 1000000.0 + 0.5) / 1000000.0 AS jaccard "
        "FROM j WHERE jac >= 0.8"
    ),
    "prefix_jaccard_pairs": (
        "WITH " + SHINGLE_CTE + ", "
        "dsh AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh), "
        "j AS (SELECT a.doc_id AS d1, b.doc_id AS d2, "
        "CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
        "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jac "
        "FROM dsh a JOIN dsh b ON a.doc_id < b.doc_id) "
        "SELECT d1, d2, floor(jac * 1000000.0 + 0.5) / 1000000.0 "
        "AS jaccard FROM j WHERE jac >= 0.8 ORDER BY d1, d2"
    ),
    "lsh_recall": (
        "WITH " + SIG_CTE + ", "
        "cand AS (" + CAND_SELECT + "), "
        "dsh AS (SELECT doc_id, list_distinct(shingles) AS s FROM sh), "
        "ver AS (SELECT c.d1 FROM cand c "
        "JOIN dsh a ON a.doc_id = c.d1 JOIN dsh b ON b.doc_id = c.d2 "
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
        "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8), "
        "tp AS (SELECT a.doc_id FROM dsh a JOIN dsh b "
        "ON a.doc_id < b.doc_id "
        "WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / "
        "(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8) "
        "SELECT CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates, "
        "CAST((SELECT count(*) FROM ver) AS BIGINT) AS n_verified, "
        "CAST((SELECT count(*) FROM tp) AS BIGINT) AS n_true, "
        "CASE WHEN (SELECT count(*) FROM tp) = 0 THEN 1.0 ELSE "
        "floor(CAST((SELECT count(*) FROM ver) AS DOUBLE) / "
        "(SELECT count(*) FROM tp) * 1000000.0 + 0.5) / 1000000.0 "
        "END AS recall"
    ),
    "minhash_hot_buckets": (
        "WITH " + SIG_CTE + ", "
        "bands AS ("
        "SELECT '0:' || h0 AS band FROM sig WHERE h0 IS NOT NULL "
        "UNION ALL SELECT '1:' || h1 FROM sig WHERE h1 IS NOT NULL "
        "UNION ALL SELECT '2:' || h2 FROM sig WHERE h2 IS NOT NULL "
        "UNION ALL SELECT '3:' || h3 FROM sig WHERE h3 IS NOT NULL), "
        "bs AS (SELECT band, count(*) AS n FROM bands GROUP BY band) "
        "SELECT CAST(count(*) AS BIGINT) AS n_buckets, "
        "CAST(count(*) FILTER (WHERE n > 3) AS BIGINT) AS n_hot_buckets, "
        "CAST(max(n) AS BIGINT) AS max_bucket_size, "
        "CAST(sum(greatest(n - 3, 0)) AS BIGINT) AS dropped_ids "
        "FROM bs"
    ),
    "simhash": (
        # 64-bit SimHash reproduced bit-for-bit in SQL: per-token
        # h = first 8 md5 bytes big-endian (== '0x'||hexdigest[:16]),
        # per-bit majority vote, hex-formatted from the bit vector
        "WITH toks AS ("
        "SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS tok "
        "FROM documents), "
        "th AS (SELECT doc_id, "
        "CAST(('0x' || substr(md5(tok), 1, 16)) AS UBIGINT) AS h FROM toks), "
        "bits AS (SELECT doc_id, b.bit AS bit, "
        "sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc "
        "FROM th, (SELECT unnest(generate_series(0, 63)) AS bit) b "
        "GROUP BY doc_id, b.bit), "
        "docbits AS (SELECT doc_id, "
        "list(CASE WHEN acc > 0 THEN 1 ELSE 0 END ORDER BY bit) AS bv "
        "FROM bits GROUP BY doc_id) "
        "SELECT doc_id, array_to_string(list_transform(generate_series(0, 15), "
        "c -> substr('0123456789abcdef', "
        "1 + bv[64-4*c] * 8 + bv[63-4*c] * 4 + bv[62-4*c] * 2 + bv[61-4*c], 1)), "
        "'') AS simhash FROM docbits"
    ),
    "ann_topk": (
        "WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings "
        "WHERE vec_id = 0) "
        "SELECT e.vec_id, "
        "floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) "
        "* 1000000.0 + 0.5) / 1000000.0 AS sim "
        "FROM embeddings e, q WHERE e.vec_id <> 0 "
        "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) "
        "DESC, e.vec_id LIMIT 10"
    ),
    "embedding_near_dup": (
        "SELECT a.vec_id AS v1, b.vec_id AS v2 "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        "WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
        "CAST(b.embedding AS DOUBLE[])) > 0.5"
    ),
    "events_hourly": (
        "SELECT date_trunc('hour', ts) AS hour, event_type, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value "
        "FROM events GROUP BY 1, 2"
    ),
    "extraction_alto_roundtrip": (
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "text AS extracted_text FROM documents"
    ),
    "extraction_page_roundtrip": (
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "text AS extracted_text FROM documents"
    ),
    "extraction_pdf_roundtrip": (
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "text AS extracted_text FROM documents"
    ),
    "dataset_split": (
        "SELECT doc_id, "
        "CAST(CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 100 "
        "AS BIGINT) AS bucket, "
        "CASE WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 100 "
        "< 90 THEN 'train' "
        "WHEN CAST(('0x' || substr(md5(text), 1, 8)) AS UBIGINT) % 100 "
        "< 95 THEN 'val' ELSE 'test' END AS split "
        "FROM documents"
    ),
    "media_features": (
        "SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, "
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
        "ELSE 'video' END AS kind, "
        "CAST(CASE WHEN text = '' THEN 0 ELSE octet_length(encode(text)) "
        "END AS BIGINT) AS payload_bytes, "
        "CASE WHEN text = '' THEN 'empty payload' ELSE NULL END "
        "AS decode_error, "
        "CASE WHEN text = '' THEN NULL ELSE "
        "CAST(('0x' || substr(sha256(sha256(text)), 1, 2)) AS INTEGER) "
        "/ 255.0 END AS f0, "
        "CASE WHEN text = '' THEN NULL ELSE "
        "substr(sha256(sha256(text)), 1, 32) END AS features_sig "
        "FROM documents"
    ),
    "extraction_wraps": (
        "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks "
        "FROM documents), "
        "l AS (SELECT doc_id, toks, toks[1] || toks[2] AS l1, "
        "array_to_string(toks[3:], ' ') AS l2 FROM t), "
        "s AS (SELECT doc_id, toks, "
        + SANITIZE_SQL.format(col="l1") + " AS s1, "
        + SANITIZE_SQL.format(col="l2") + " AS s2 FROM l), "
        "w AS (SELECT doc_id, toks, s1, s2, array_to_string("
        "list_filter([s1, s2], x -> length(x) > 2), ' ') AS ws FROM s), "
        "q AS (SELECT doc_id, toks, s1, s2, ws, "
        "CASE WHEN ws = '' THEN 0 ELSE len(string_split(ws, ' ')) END AS nw, "
        "CASE WHEN ws = '' THEN 0 ELSE len(list_filter(string_split(ws, ' '), "
        "x -> NOT regexp_matches(x, '^[A-Za-zÄÖÜäöüß]+$'))) END AS ne "
        "FROM w) "
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "toks[1] || '-' || chr(10) || array_to_string(toks[2:], ' ') "
        "AS extracted_text, "
        "CASE WHEN nw = 0 THEN -1.0 WHEN nw <= ne THEN 0.0 ELSE "
        "floor(((nw - ne) / CAST(nw AS DOUBLE) * 100.0) * 1000.0 + 0.5) "
        "/ 1000.0 END AS hit_ratio, "
        "CAST(CASE WHEN nw = 0 THEN 0 ELSE nw END AS BIGINT) AS n_words, "
        "CAST(CASE WHEN nw = 0 THEN 0 ELSE ne END AS BIGINT) AS n_errs, "
        "CAST(CASE WHEN nw = 0 THEN 0 ELSE 2 END AS BIGINT) AS n_lines_in, "
        "CAST(CASE WHEN nw = 0 THEN 0 ELSE 1 END AS BIGINT) AS n_wraps, "
        "CAST(CASE WHEN nw = 0 THEN 0 ELSE "
        "2 - len(list_filter([s1, s2], x -> length(x) > 2)) END AS BIGINT) "
        "AS n_shorts, "
        "CAST(CASE WHEN nw = 0 THEN 0 ELSE "
        "len(list_filter([s1, s2], x -> length(x) > 2)) END AS BIGINT) "
        "AS n_lines_out "
        "FROM q"
    ),
    "media_decode": (
        # vw/vh/vn: Y4M dims + frame count formulas (even dims, 4:2:0)
        "WITH m AS (SELECT doc_id, text, "
        "8 + 2 * (doc_id % 13) AS vw, "
        "8 + 2 * ((doc_id * 3) % 11) AS vh, "
        "2 + doc_id % 7 AS vn FROM documents) "
        "SELECT 'm' || CAST(doc_id AS VARCHAR) AS media_id, "
        "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' "
        "ELSE 'video' END AS kind, "
        "CAST(CASE doc_id % 3 "
        "WHEN 0 THEN 9 + length(CAST(8 + doc_id % 25 AS VARCHAR)) "
        "+ length(CAST(8 + (doc_id * 7) % 25 AS VARCHAR)) "
        "+ (8 + doc_id % 25) * (8 + (doc_id * 7) % 25) "
        "WHEN 1 THEN 44 + 2 * 8 * (10 + doc_id % 50) "
        "ELSE CASE WHEN doc_id % 6 = 2 THEN "
        "37 + length(CAST(vw AS VARCHAR)) + length(CAST(vh AS VARCHAR)) "
        "+ vn * (6 + (vw * vh * 3) // 2) "
        "WHEN text = '' THEN 0 ELSE octet_length(encode(text)) "
        "END END AS BIGINT) AS payload_bytes, "
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + doc_id % 25 "
        "WHEN doc_id % 6 = 2 THEN vw END AS INTEGER) AS decoded_width, "
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 8 + (doc_id * 7) % 25 "
        "WHEN doc_id % 6 = 2 THEN vh END AS INTEGER) AS decoded_height, "
        "CAST(CASE WHEN doc_id % 3 = 1 THEN 10 + doc_id % 50 "
        "WHEN doc_id % 6 = 2 THEN vn * 40 END "
        "AS INTEGER) AS decoded_duration_ms, "
        "CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 256 AS DOUBLE) "
        "WHEN doc_id % 3 = 1 THEN CAST(doc_id % 100 AS DOUBLE) "
        "WHEN doc_id % 6 = 2 THEN CAST(doc_id % 256 AS DOUBLE) "
        "END AS content_mean, "
        "CASE WHEN doc_id % 6 = 5 THEN (CASE WHEN text = '' "
        "THEN 'empty payload' ELSE "
        "'not a YUV4MPEG2 stream (codec formats unsupported "
        "without external libs)' END) "
        "END AS decode_error "
        "FROM m"
    ),
    "events_by_type_salted": (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value "
        "FROM events GROUP BY event_type"
    ),
    "revenue_by_nation": (
        "SELECT n_name, CAST(count(*) AS BIGINT) AS n_items, "
        "floor(sum(l_extendedprice * (1 - l_discount)) * 1000.0 + 0.5) "
        "/ 1000.0 AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name"
    ),
    "top_parts_by_revenue": (
        "SELECT p_name, "
        "floor(sum(l_extendedprice * (1 - l_discount)) * 1000.0 + 0.5) "
        "/ 1000.0 AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "GROUP BY p_name ORDER BY revenue DESC, p_name ASC LIMIT 10"
    ),
    "click_attribution": (
        "WITH c AS (SELECT event_id, user_id, ts FROM events "
        "WHERE event_type = 'click'), "
        "v AS (SELECT event_id AS view_id, user_id, ts AS view_ts "
        "FROM events WHERE event_type = 'view') "
        "SELECT c.event_id, c.user_id, c.ts, v.view_id, "
        "CAST(date_diff('microsecond', v.view_ts, c.ts) AS BIGINT) "
        "AS gap_us "
        "FROM c ASOF LEFT JOIN v "
        "ON c.user_id = v.user_id AND v.view_ts <= c.ts"
    ),
    "events_json_agg": (
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
        "AS sum_k, "
        "CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
        "AS min_k, "
        "CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) "
        "AS max_k FROM events GROUP BY event_type"
    ),
    "user_sessions": (
        "WITH e AS (SELECT user_id, ts, event_id, value, "
        "CASE WHEN lag(ts) OVER w IS NULL "
        "OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END "
        "AS brk FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM e) "
        "SELECT user_id, min(ts) AS session_start, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value, "
        "CAST(date_diff('microsecond', min(ts), max(ts)) AS BIGINT) "
        "AS duration_us "
        "FROM s GROUP BY user_id, sess"
    ),
    "event_gaps": (
        "WITH o AS (SELECT user_id, ts, lag(ts) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id) AS pts "
        "FROM events), "
        "g AS (SELECT user_id, date_diff('microsecond', pts, ts) "
        "AS gap FROM o WHERE pts IS NOT NULL) "
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps, "
        "CAST(max(gap) AS BIGINT) AS max_gap_us, "
        "CAST(sum(gap) AS BIGINT) AS total_gap_us "
        "FROM g GROUP BY user_id ORDER BY user_id"
    ),
    "events_rollup": (
        "WITH e AS (SELECT event_type, date_trunc('day', ts) AS day, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents "
        "FROM events) "
        "SELECT event_type, day, "
        "CAST(2 * grouping(event_type) + grouping(day) AS BIGINT) "
        "AS gid, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(cents) AS BIGINT) AS sum_val "
        "FROM e GROUP BY ROLLUP(event_type, day) "
        "ORDER BY gid, event_type, day"
    ),
    "events_cube": (
        "WITH e AS (SELECT event_type, date_trunc('day', ts) AS day, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents "
        "FROM events) "
        "SELECT event_type, day, "
        "CAST(2 * grouping(event_type) + grouping(day) AS BIGINT) "
        "AS gid, CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(cents) AS BIGINT) AS sum_val "
        "FROM e GROUP BY CUBE(event_type, day) "
        "ORDER BY gid, event_type, day"
    ),
    "events_frame_window": (
        "WITH e AS (SELECT user_id, ts, event_id, "
        "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents "
        "FROM events) "
        "SELECT user_id, ts, event_id, cents, "
        "CAST(sum(cents) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id "
        "ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS win_sum, "
        "lead(cents) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id) AS lead_val "
        "FROM e ORDER BY user_id, ts, event_id"
    ),
    "events_pivot": (
        "SELECT date_trunc('day', ts) AS day, "
        "CAST(count(*) FILTER (event_type = 'click') AS BIGINT) "
        "AS n_click, "
        "CAST(count(*) FILTER (event_type = 'error') AS BIGINT) "
        "AS n_error, "
        "CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) "
        "AS n_purchase, "
        "CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) "
        "AS n_signup, "
        "CAST(count(*) FILTER (event_type = 'view') AS BIGINT) "
        "AS n_view "
        "FROM events GROUP BY 1 ORDER BY day"
    ),
    "events_sliding_window": (
        "WITH hourly AS (SELECT event_type, "
        "date_trunc('hour', ts) AS hour, count(*) AS n, sum(value) AS sv "
        "FROM events GROUP BY event_type, date_trunc('hour', ts)) "
        "SELECT event_type, hour, "
        "CAST(sum(n) OVER w AS BIGINT) AS n_events_w, "
        "floor(sum(sv) OVER w * 1000000.0 + 0.5) / 1000000.0 "
        "AS sum_value_w FROM hourly "
        "WINDOW w AS (PARTITION BY event_type ORDER BY hour "
        "RANGE BETWEEN INTERVAL 2 HOUR PRECEDING AND CURRENT ROW)"
    ),
    "user_activity": (
        "SELECT user_id, CAST(count(*) AS BIGINT) AS n_events, "
        "floor(sum(value) * 1000000.0 + 0.5) / 1000000.0 AS sum_value "
        "FROM events GROUP BY user_id"
    ),
    "top_tokens": (
        "SELECT token, CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(string_split(text, ' ')) AS token FROM documents"
        ") GROUP BY token ORDER BY count(*) DESC, token ASC LIMIT 50"
    ),
    "token_pair_counts": (
        "SELECT pair, CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(list_transform("
        "generate_series(1, len(toks) - 1), "
        "i -> toks[i] || ' ' || toks[i+1])) AS pair FROM ("
        "SELECT string_split(text, ' ') AS toks FROM documents)) "
        "GROUP BY pair ORDER BY count(*) DESC, pair ASC LIMIT 20"
    ),
    "extraction_flagship": (
        "WITH q AS (" + QUALITY_SQL + ") "
        "SELECT 'doc://' || CAST(d.doc_id AS VARCHAR) AS url, "
        "d.text AS extracted_text, q.hit_ratio, q.n_words, q.n_errs "
        "FROM documents d JOIN q USING (doc_id)"
    ),
    "extraction_boilerplate": (
        # kept lines: the doc text (unless empty), 'doc <id> end', and
        # the RTL line with tokens REVERSED; sidebar/nav/x/footer gone
        "SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url, "
        "(CASE WHEN text = '' THEN '' ELSE text || chr(10) END) || "
        "'doc ' || CAST(doc_id AS VARCHAR) || ' end' || chr(10) || "
        "'gimel bet aleph' AS extracted_text "
        "FROM documents"
    ),
    # no oracle (approximate by design): ann_topk_lsh,
    # embedding_near_dup_lsh
}

# same graph, same semantics, different physical plan — one SQL twin
ORACLE_SQL["pagerank_pregel"] = ORACLE_SQL["pagerank"]

# redirect_resolve: follow each chain to its terminal (a node with
# no outgoing mapping row, i.e. doc_id % 7 = 0 — which includes 0,
# the halving fixpoint) with a recursive CTE.
ORACLE_SQL["redirect_resolve"] = (
    "WITH RECURSIVE m AS (SELECT doc_id AS src, doc_id // 2 AS dst "
    "FROM documents WHERE doc_id % 7 <> 0), "
    "r AS (SELECT src, dst AS cur FROM m "
    "UNION ALL SELECT r.src, m2.dst FROM r "
    "JOIN m m2 ON m2.src = r.cur) "
    "SELECT src AS doc_id, cur AS final_id FROM r "
    "WHERE cur % 7 = 0 ORDER BY src"
)

# hits: same synthetic edge multiset as pagerank; two unrolled
# authority/hub half-steps in pure BIGINT arithmetic — sum of the
# opposite score over the edge multiset, then // greatest(total //
# scale, 1) renormalization, missing nodes COALESCE to 0.
ORACLE_SQL["hits"] = (
    "WITH nn AS (SELECT count(*) AS c FROM documents), "
    "nodes AS (SELECT doc_id AS node FROM documents), "
    "edges AS (SELECT node AS src, (node*7+1) % nn.c AS dst "
    "FROM nodes, nn "
    "UNION ALL SELECT node, (node*13+2) % nn.c FROM nodes, nn "
    "WHERE node % 3 >= 1 "
    "UNION ALL SELECT node, (node*29+5) % nn.c FROM nodes, nn "
    "WHERE node % 3 = 2), "
    "h0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS v FROM nodes), "
    "a1r AS (SELECT e.dst AS node, sum(h.v) AS s FROM edges e "
    "JOIN h0 h ON h.node = e.src GROUP BY e.dst), "
    "a1d AS (SELECT CAST(greatest(sum(s) // 1000000000, 1) AS BIGINT)"
    " AS d FROM a1r), "
    "a1 AS (SELECT n.node, "
    "CAST(coalesce(a1r.s, 0) // a1d.d AS BIGINT) AS v "
    "FROM nodes n LEFT JOIN a1r USING (node), a1d), "
    "h1r AS (SELECT e.src AS node, sum(a.v) AS s FROM edges e "
    "JOIN a1 a ON a.node = e.dst GROUP BY e.src), "
    "h1d AS (SELECT CAST(greatest(sum(s) // 1000000000, 1) AS BIGINT)"
    " AS d FROM h1r), "
    "h1 AS (SELECT n.node, "
    "CAST(coalesce(h1r.s, 0) // h1d.d AS BIGINT) AS v "
    "FROM nodes n LEFT JOIN h1r USING (node), h1d), "
    "a2r AS (SELECT e.dst AS node, sum(h.v) AS s FROM edges e "
    "JOIN h1 h ON h.node = e.src GROUP BY e.dst), "
    "a2d AS (SELECT CAST(greatest(sum(s) // 1000000000, 1) AS BIGINT)"
    " AS d FROM a2r), "
    "a2 AS (SELECT n.node, "
    "CAST(coalesce(a2r.s, 0) // a2d.d AS BIGINT) AS v "
    "FROM nodes n LEFT JOIN a2r USING (node), a2d), "
    "h2r AS (SELECT e.src AS node, sum(a.v) AS s FROM edges e "
    "JOIN a2 a ON a.node = e.dst GROUP BY e.src), "
    "h2d AS (SELECT CAST(greatest(sum(s) // 1000000000, 1) AS BIGINT)"
    " AS d FROM h2r), "
    "h2 AS (SELECT n.node, "
    "CAST(coalesce(h2r.s, 0) // h2d.d AS BIGINT) AS v "
    "FROM nodes n LEFT JOIN h2r USING (node), h2d) "
    "SELECT n.node AS doc_id, a2.v AS auth, h2.v AS hub "
    "FROM nodes n JOIN a2 ON a2.node = n.node "
    "JOIN h2 ON h2.node = n.node ORDER BY n.node"
)

ORACLE_SQL["split_leakage_safe"] = (
    "WITH RECURSIVE " + SIG_CTE + ", cand AS (" + CAND_SELECT + "), "
    + CC_CTE +
    ", keyed AS (SELECT d.doc_id, "
    "COALESCE(c.cluster_id, d.doc_id) AS k FROM documents d "
    "LEFT JOIN clusters c ON c.node = d.doc_id), "
    "b AS (SELECT doc_id, CAST(CAST(('0x' || "
    "substr(md5(CAST(k AS VARCHAR)), 1, 8)) AS UBIGINT) % 100 "
    "AS BIGINT) AS bucket FROM keyed) "
    "SELECT doc_id, bucket, CASE WHEN bucket < 90 THEN 'train' "
    "WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split FROM b"
)
ORACLE_SQL["kmeans_assign"] = _kmeans_sql(KMEANS_K, KMEANS_ITERS, KMEANS_SCALE)
ORACLE_SQL["semantic_dedup"] = (
    "WITH km AS (" + _kmeans_sql(KMEANS_K, KMEANS_ITERS, KMEANS_SCALE)
    + "), e AS (SELECT km.vec_id, km.cluster, em.embedding "
    "FROM km JOIN embeddings em USING (vec_id)) "
    "SELECT a.vec_id, a.cluster, NOT EXISTS ("
    "SELECT 1 FROM e b WHERE b.cluster = a.cluster "
    "AND b.vec_id < a.vec_id "
    "AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[])) > "
    f"{NEAR_DUP_THRESHOLD}) AS keep "
    "FROM e a ORDER BY a.vec_id"
)
ORACLE_SQL["lm_score"] = _lm_score_sql(LM_MIN_COUNT, LM_SCALE)
ORACLE_SQL["lm_buckets"] = (
    "WITH scored AS (SELECT * FROM ("
    + _lm_score_sql(LM_MIN_COUNT, LM_SCALE) +
    ") s0), cuts AS (SELECT "
    "quantile_disc(mean_ipp, 0.33) AS c1, "
    "quantile_disc(mean_ipp, 0.66) AS c2 "
    "FROM scored WHERE mean_ipp >= 0) "
    "SELECT s.doc_id, s.mean_ipp, "
    "CASE WHEN s.mean_ipp < 0 THEN 'unscored' "
    "WHEN s.mean_ipp <= cuts.c1 THEN 'head' "
    "WHEN s.mean_ipp <= cuts.c2 THEN 'middle' "
    "ELSE 'tail' END AS bucket FROM scored s, cuts"
)
ORACLE_SQL["packed_windows"] = (
    "WITH toks AS (SELECT doc_id, CASE WHEN text IS NULL THEN "
    "CAST([] AS VARCHAR[]) ELSE string_split(text, ' ') END AS t "
    "FROM documents), "
    "cum AS (SELECT doc_id, t, COALESCE(sum(len(t)) OVER "
    "(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
    "1 PRECEDING), 0) AS cb FROM toks), "
    "tok AS (SELECT cb + i - 1 AS g, "
    "CAST(CAST(('0x' || substr(md5(t[i]), 1, 8)) AS UBIGINT) "
    "AS BIGINT) AS th FROM cum, "
    "LATERAL unnest(generate_series(1, len(t))) AS r(i)) "
    f"SELECT CAST(g // {PACK_SEQ_LEN} AS BIGINT) AS seq_id, "
    f"CAST(g % {PACK_SEQ_LEN} AS BIGINT) AS pos, th AS tok FROM tok"
)
ORACLE_SQL["mix_sample"] = (
    "WITH n AS (SELECT lang, CAST(count(*) AS BIGINT) AS c "
    "FROM documents GROUP BY lang), "
    "t AS (SELECT min(c * 5) AS t FROM n), "
    "r AS (SELECT n.lang, (t.t * 4294967296) // (5 * n.c) AS rate "
    "FROM n, t), "
    "h AS (SELECT doc_id, lang, "
    "CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS UBIGINT) AS BIGINT) AS hv FROM documents) "
    "SELECT h.doc_id, h.lang FROM h JOIN r USING (lang) "
    "WHERE h.hv < r.rate"
)
ORACLE_SQL["doc_embed"] = (
    "WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok "
    "FROM documents), "
    "h AS (SELECT doc_id, CAST(CAST(('0x' || substr(md5(tok), 1, 8)) "
    "AS UBIGINT) AS BIGINT) AS hv FROM toks), "
    "cells AS (SELECT doc_id, hv % 64 AS d, "
    "CASE WHEN (hv // 65536) % 2 = 1 THEN 1 ELSE -1 END AS sgn FROM h) "
    "SELECT doc_id, CAST(d AS BIGINT) AS d, "
    "CAST(sum(sgn) AS BIGINT) AS val FROM cells "
    "GROUP BY doc_id, d HAVING sum(sgn) != 0"
)
ORACLE_SQL["shuffle_shards"] = (
    "WITH h AS (SELECT doc_id, "
    "CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) "
    "AS UBIGINT) AS BIGINT) AS hv FROM documents) "
    "SELECT doc_id, CAST(hv % 16 AS BIGINT) AS shard_id, "
    "CAST(row_number() OVER (PARTITION BY hv % 16 "
    "ORDER BY hv, doc_id) - 1 AS BIGINT) AS shard_pos FROM h"
)
ORACLE_SQL["lang_doc_rank"] = (
    "SELECT doc_id, lang, "
    "CAST(row_number() OVER (PARTITION BY lang ORDER BY n_chars "
    "DESC, doc_id) AS BIGINT) AS row_number, "
    "CAST(rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) "
    "AS BIGINT) AS rank, "
    "CAST(dense_rank() OVER (PARTITION BY lang ORDER BY n_chars "
    "DESC) AS BIGINT) AS dense_rank FROM documents"
)

ORACLE_SQL["approx_users_by_type"] = (
    "WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events "
    "WHERE user_id IS NOT NULL), "
    "h AS (SELECT DISTINCT event_type, "
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) "
    "AS UBIGINT) AS hv FROM pairs), "
    "rk AS (SELECT event_type, hv, row_number() OVER "
    "(PARTITION BY event_type ORDER BY hv) AS rn FROM h), "
    "km AS (SELECT event_type, max(hv) AS mx, "
    "CAST(count(*) AS BIGINT) AS nk FROM rk WHERE rn <= 16 "
    "GROUP BY event_type) "
    "SELECT event_type, nk AS k_used, "
    "CASE WHEN nk < 16 THEN CAST(nk AS DOUBLE) "
    "ELSE floor(15.0 / (CAST(mx AS DOUBLE) / 4294967296.0) "
    "* 1000000.0 + 0.5) / 1000000.0 END AS kmv_estimate FROM km"
)

ORACLE_SQL["hll_users_by_type"] = (
    "WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events "
    "WHERE user_id IS NOT NULL), "
    "h AS (SELECT event_type, "
    "CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)) "
    "AS UBIGINT) AS BIGINT) AS h1, "
    "CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 9, 8)) "
    "AS UBIGINT) AS BIGINT) AS h2 FROM pairs), "
    "r AS (SELECT event_type, h1 % 64 AS reg, "
    "CASE WHEN h2 = 0 THEN 33 ELSE "
    "CAST(floor(log2(CAST((h2 & -h2) AS DOUBLE))) AS BIGINT) + 1 "
    "END AS rho FROM h), "
    "m AS (SELECT event_type, reg, max(rho) AS mr FROM r "
    "GROUP BY event_type, reg), "
    "agg AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nset, "
    "sum(power(2.0, -mr)) AS s FROM m GROUP BY event_type), "
    "est AS (SELECT event_type, nset, "
    "0.709 * 4096.0 / (s + (64 - nset)) AS raw FROM agg) "
    "SELECT event_type, nset AS n_registers_set, "
    "floor((CASE WHEN raw <= 160.0 AND nset < 64 "
    "THEN 64.0 * ln(64.0 / (64.0 - nset)) ELSE raw END) "
    "* 1000000.0 + 0.5) / 1000000.0 AS hll_estimate "
    "FROM est ORDER BY event_type"
)

ORACLE_SQL["cms_sketch"] = (
    "WITH tok AS (SELECT unnest(string_split(text, ' ')) AS t "
    "FROM documents WHERE text IS NOT NULL), "
    "rows AS (SELECT r, CAST(CAST(('0x' || substr(md5(t), "
    "1 + 8 * r, 8)) AS UBIGINT) % 1024 AS BIGINT) AS b "
    "FROM tok CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(r)) "
    "SELECT CAST(r AS BIGINT) AS r, b, "
    "CAST(count(*) AS BIGINT) AS c FROM rows GROUP BY r, b"
)

ORACLE_SQL["doc_chunks"] = (
    "WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, "
    "CAST(len(string_split(text, ' ')) AS BIGINT) AS n "
    "FROM documents WHERE text IS NOT NULL), "
    "e AS (SELECT doc_id, toks, n, "
    "unnest(range(0, 1 + (greatest(n - 64, 0) + 47) // 48)) AS g "
    "FROM t) "
    "SELECT doc_id, CAST(g AS BIGINT) AS chunk_id, "
    "CAST(least(g * 48 + 64, n) - g * 48 AS BIGINT) AS n_tokens, "
    "md5(array_to_string(list_slice(toks, g * 48 + 1, "
    "least(g * 48 + 64, n)), ' ')) AS chunk_md5 FROM e"
)

ORACLE_SQL["events_value_stats"] = (
    "SELECT event_type, CAST(count(value) AS BIGINT) AS n, "
    "floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS mean_value, "
    "floor(var_samp(value) * 1000000.0 + 0.5) / 1000000.0 "
    "AS var_value FROM events GROUP BY event_type"
)

ORACLE_SQL["bucket_point_lookup"] = (
    "SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey "
    "FROM orders WHERE o_custkey = 7"
)

ORACLE_SQL["distinct_users_by_type"] = (
    "SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
    "AS n_users FROM events GROUP BY event_type"
)

ORACLE_SQL["customer_orders_full"] = (
    "SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey, "
    "c.c_name, o.o_orderkey, o.o_totalprice "
    "FROM (SELECT c_custkey, c_name FROM customer "
    "WHERE c_mktsegment = 'BUILDING') c "
    "FULL JOIN (SELECT o_custkey, o_orderkey, o_totalprice "
    "FROM orders WHERE o_orderpriority = '1-URGENT') o "
    "ON c.c_custkey = o.o_custkey"
)

ORACLE_SQL["skew_join_enrich"] = (
    "SELECT d.doc_id, d.lang, t.lang_total FROM documents d JOIN "
    "(SELECT lang, CAST(count(*) AS BIGINT) AS lang_total "
    "FROM documents GROUP BY lang) t USING (lang)"
)

_DIFF_SNAPSHOTS_SQL = (
    "WITH oldsnap AS (SELECT doc_id, text, lang FROM documents "
    "WHERE doc_id % 11 <> 3), "
    "newsnap AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 "
    "THEN text || '!' ELSE text END AS text, lang FROM documents "
    "WHERE doc_id % 7 <> 2), "
    "d AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, "
    "CASE WHEN o.doc_id IS NULL THEN 'added' "
    "WHEN n.doc_id IS NULL THEN 'removed' "
    "WHEN (o.text IS DISTINCT FROM n.text) "
    "OR (o.lang IS DISTINCT FROM n.lang) THEN 'changed' "
    "ELSE 'unchanged' END AS status "
    "FROM oldsnap o FULL JOIN newsnap n ON o.doc_id = n.doc_id) "
)

ORACLE_SQL["events_value_zscore"] = (
    "WITH s AS (SELECT event_type, "
    "floor(avg(value) * 1000000.0 + 0.5) / 1000000.0 AS m, "
    "floor(var_samp(value) * 1000000.0 + 0.5) / 1000000.0 AS v "
    "FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL "
    "GROUP BY event_type) "
    "SELECT e.event_id, floor((e.value - s.m) / sqrt(s.v) "
    "* 1000000.0 + 0.5) / 1000000.0 AS z "
    "FROM events e JOIN s USING (event_type) "
    "WHERE e.value IS NOT NULL AND s.v > 0"
)

ORACLE_SQL["interval_union"] = (
    "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + "
    "CAST(floor(value * 1000000.0) AS BIGINT) AS e FROM events "
    "WHERE value IS NOT NULL), "
    "o AS (SELECT user_id, s, e, CASE WHEN s > coalesce(max(e) OVER "
    "(PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED "
    "PRECEDING AND 1 PRECEDING), -9223372036854775808) "
    "THEN 1 ELSE 0 END AS brk FROM iv), "
    "g AS (SELECT user_id, s, e, sum(brk) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM o) "
    "SELECT user_id, min(s) AS start_us, max(e) AS end_us FROM g "
    "GROUP BY user_id, isl"
)

ORACLE_SQL["bm25_search"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split("
    "coalesce(text, ''), ' ')) AS t FROM documents), "
    "dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len "
    "FROM tok GROUP BY doc_id), "
    "st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(len) AS avgdl "
    "FROM dl), "
    "tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf "
    "FROM tok WHERE t IN ('window', 'merge', 'stream') "
    "GROUP BY doc_id, t), "
    "df AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df "
    "FROM tf GROUP BY t), "
    "sc AS (SELECT tf.doc_id, sum("
    "ln((st.nd - df.df + 0.5) / (df.df + 0.5) + 1.0) "
    "* tf.tf * (1.2 + 1.0) "
    "/ (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / st.avgdl))"
    ") AS score "
    "FROM tf JOIN df USING (t) JOIN dl ON dl.doc_id = tf.doc_id, st "
    "GROUP BY tf.doc_id) "
    "SELECT doc_id, floor(score * 1000000.0 + 0.5) / 1000000.0 "
    "AS score FROM sc "
    "ORDER BY floor(score * 1000000.0 + 0.5) / 1000000.0 DESC, "
    "doc_id LIMIT 10"
)

# hybrid_search: both legs reuse their own proven oracle shapes
# (bm25_search / ann_topk above) with LIMIT 20; ranks come from
# row_number() over the grid-rounded scores (id tie-break), and the
# fused score is the leg-ordered COALESCE sum of 1/(60+rank),
# grid-rounded at 1e-9.
ORACLE_SQL["hybrid_search"] = (
    "WITH tok AS (SELECT doc_id, unnest(string_split("
    "coalesce(text, ''), ' ')) AS t FROM documents), "
    "dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS len "
    "FROM tok GROUP BY doc_id), "
    "st AS (SELECT CAST(count(*) AS DOUBLE) AS nd, avg(len) AS avgdl "
    "FROM dl), "
    "tf AS (SELECT doc_id, t, CAST(count(*) AS DOUBLE) AS tf "
    "FROM tok WHERE t IN ('window', 'merge', 'stream') "
    "GROUP BY doc_id, t), "
    "df AS (SELECT t, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df "
    "FROM tf GROUP BY t), "
    "sc AS (SELECT tf.doc_id, sum("
    "ln((st.nd - df.df + 0.5) / (df.df + 0.5) + 1.0) "
    "* tf.tf * (1.2 + 1.0) "
    "/ (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.len / st.avgdl))"
    ") AS score "
    "FROM tf JOIN df USING (t) JOIN dl ON dl.doc_id = tf.doc_id, st "
    "GROUP BY tf.doc_id), "
    "lex_top AS (SELECT doc_id, "
    "floor(score * 1000000.0 + 0.5) / 1000000.0 AS s FROM sc "
    "ORDER BY floor(score * 1000000.0 + 0.5) / 1000000.0 DESC, "
    "doc_id LIMIT 20), "
    "lex_rank AS (SELECT doc_id, "
    "row_number() OVER (ORDER BY s DESC, doc_id) AS r FROM lex_top), "
    "q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv "
    "FROM embeddings WHERE vec_id = 0), "
    "dense_top AS (SELECT e.vec_id AS doc_id, "
    "floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
    "q.qv) * 1000000.0 + 0.5) / 1000000.0 AS s "
    "FROM embeddings e, q WHERE e.vec_id <> 0 "
    "ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
    "q.qv) DESC, e.vec_id LIMIT 20), "
    "dense_rank AS (SELECT doc_id, "
    "row_number() OVER (ORDER BY s DESC, doc_id) AS r "
    "FROM dense_top), "
    "fused AS (SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id, "
    "COALESCE(1.0 / (60 + l.r), 0.0) + "
    "COALESCE(1.0 / (60 + d.r), 0.0) AS rrf_raw, "
    "COALESCE(l.r, 0) AS lex_rank, COALESCE(d.r, 0) AS dense_rank "
    "FROM lex_rank l FULL OUTER JOIN dense_rank d "
    "ON l.doc_id = d.doc_id) "
    "SELECT doc_id, "
    "floor(rrf_raw * 1000000000.0 + 0.5) / 1000000000.0 AS rrf, "
    "lex_rank, dense_rank FROM fused "
    "ORDER BY floor(rrf_raw * 1000000000.0 + 0.5) / 1000000000.0 "
    "DESC, doc_id LIMIT 10"
)

ORACLE_SQL["lang_doc_rank_dist"] = (
    "SELECT doc_id, lang, "
    "percent_rank() OVER (PARTITION BY lang ORDER BY n_chars DESC) "
    "AS percent_rank, "
    "cume_dist() OVER (PARTITION BY lang ORDER BY n_chars DESC) "
    "AS cume_dist FROM documents"
)

ORACLE_SQL["doc_novelty"] = (
    "WITH " + SHINGLE_CTE + ", "
    "dsh AS (SELECT doc_id, unnest(list_distinct(shingles)) AS s "
    "FROM sh), "
    "df AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM dsh "
    "GROUP BY s), "
    "x AS (SELECT d.doc_id, "
    "CAST(count(*) FILTER (df.df = 1) AS BIGINT) AS nu, "
    "CAST(count(*) AS BIGINT) AS nt "
    "FROM dsh d JOIN df USING (s) GROUP BY d.doc_id) "
    "SELECT doc_id, nu AS n_unique, nt AS n_shingles, "
    "floor(CAST(nu AS DOUBLE) / CAST(nt AS DOUBLE) * 1000000.0 "
    "+ 0.5) / 1000000.0 AS novelty FROM x"
)

ORACLE_SQL["asof_last_purchase"] = (
    "SELECT a.event_id, a.user_id, a.ts, b.ts AS ts_r, b.value "
    "FROM (SELECT * FROM events WHERE event_type = 'click') a "
    "ASOF LEFT JOIN "
    "(SELECT * FROM events WHERE event_type = 'purchase') b "
    "ON a.user_id = b.user_id AND b.ts <= a.ts"
)

ORACLE_SQL["chi2_drift"] = (
    "WITH a AS (SELECT lang, CAST(count(*) AS BIGINT) AS na "
    "FROM documents WHERE doc_id % 11 <> 3 GROUP BY lang), "
    "b AS (SELECT lang, CAST(count(*) AS BIGINT) AS nb "
    "FROM documents WHERE doc_id % 7 <> 2 GROUP BY lang), "
    "j AS (SELECT coalesce(a.lang, b.lang) AS lang, "
    "coalesce(na, 0) AS na, coalesce(nb, 0) AS nb "
    "FROM a FULL JOIN b USING (lang)), "
    "t AS (SELECT CAST(sum(na) AS DOUBLE) AS ta, "
    "CAST(sum(nb) AS DOUBLE) AS tb, "
    "CAST(sum(na) + sum(nb) AS DOUBLE) AS tot FROM j), "
    "terms AS (SELECT "
    "(na - (na + nb) * ta / tot) * (na - (na + nb) * ta / tot) "
    "/ ((na + nb) * ta / tot) + "
    "(nb - (na + nb) * tb / tot) * (nb - (na + nb) * tb / tot) "
    "/ ((na + nb) * tb / tot) AS term FROM j, t) "
    "SELECT (SELECT CAST(count(*) AS BIGINT) FROM j) AS n_cats, "
    "floor((SELECT sum(term) FROM terms) * 1000000.0 + 0.5) "
    "/ 1000000.0 AS chi2"
)

ORACLE_SQL["ks_drift"] = (
    "WITH a AS (SELECT n_chars AS v FROM documents "
    "WHERE doc_id % 11 <> 3), "
    "b AS (SELECT n_chars AS v FROM documents "
    "WHERE doc_id % 7 <> 2), "
    "pts AS (SELECT v, CAST(sum(na) AS BIGINT) AS na, "
    "CAST(sum(nb) AS BIGINT) AS nb FROM ("
    "SELECT v, 1 AS na, 0 AS nb FROM a "
    "UNION ALL SELECT v, 0, 1 FROM b) GROUP BY v), "
    "c AS (SELECT v, "
    "CAST(sum(na) OVER (ORDER BY v) AS DOUBLE) "
    "/ (SELECT sum(na) FROM pts) AS fa, "
    "CAST(sum(nb) OVER (ORDER BY v) AS DOUBLE) "
    "/ (SELECT sum(nb) FROM pts) AS fb FROM pts) "
    "SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_old, "
    "(SELECT CAST(count(*) AS BIGINT) FROM b) AS n_new, "
    "floor((SELECT max(abs(fa - fb)) FROM c) * 1000000.0 + 0.5) "
    "/ 1000000.0 AS ks_d"
)

ORACLE_SQL["value_outliers"] = (
    "WITH med AS (SELECT event_type, quantile_disc(value, 0.5) AS m "
    "FROM events WHERE value IS NOT NULL GROUP BY event_type), "
    "d AS (SELECT e.event_type, abs(e.value - med.m) AS dev "
    "FROM events e JOIN med USING (event_type) "
    "WHERE e.value IS NOT NULL), "
    "mad AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad "
    "FROM d GROUP BY event_type) "
    "SELECT d.event_type, CAST(count(*) AS BIGINT) AS n, "
    "CAST(count(*) FILTER (dev > 3.0 * mad.mad) AS BIGINT) "
    "AS n_outliers FROM d JOIN mad USING (event_type) "
    "GROUP BY d.event_type"
)

ORACLE_SQL["lang_confusion"] = (
    "WITH p AS (SELECT lang AS lang_declared, "
    "CASE WHEN len(list_filter(string_split(text, ' '), "
    "x -> x = 'the' OR x = 'a')) > len(list_filter("
    "string_split(text, ' '), x -> x = 'der' OR x = 'die' "
    "OR x = 'das' OR x = 'und')) THEN 'en' "
    "WHEN len(list_filter(string_split(text, ' '), "
    "x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und')) > "
    "len(list_filter(string_split(text, ' '), "
    "x -> x = 'the' OR x = 'a')) THEN 'de' ELSE 'unk' END "
    "AS lang_pred FROM documents) "
    "SELECT lang_declared, lang_pred, CAST(count(*) AS BIGINT) AS n "
    "FROM p GROUP BY 1, 2"
)

ORACLE_SQL["host_entropy"] = (
    "WITH h AS (SELECT 'host' || CAST(" + _HOST_ID_SQL
    + " AS VARCHAR) || '.example.com' AS host FROM documents), "
    "c AS (SELECT host, CAST(count(*) AS DOUBLE) AS n FROM h "
    "GROUP BY host), t AS (SELECT sum(n) AS tot FROM c) "
    "SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_hosts, "
    "floor((SELECT -sum((n / tot) * ln(n / tot)) FROM c, t) "
    "* 1000000.0 + 0.5) / 1000000.0 AS entropy_nats"
)

ORACLE_SQL["recency_user_scores"] = (
    "WITH mx AS (SELECT max(date_trunc('day', ts)) AS m FROM events), "
    "w AS (SELECT user_id, value * power(2.0, "
    "-CAST(date_diff('day', date_trunc('day', ts), mx.m) AS DOUBLE)) "
    "AS w FROM events, mx WHERE value IS NOT NULL) "
    "SELECT user_id, floor(sum(w) * 1000000.0 + 0.5) / 1000000.0 "
    "AS score FROM w GROUP BY user_id"
)

ORACLE_SQL["churned_users"] = (
    "WITH rng AS (SELECT CAST(epoch_us(min(ts)) AS BIGINT) AS lo, "
    "CAST(epoch_us(max(ts)) AS BIGINT) AS hi FROM events), "
    "m AS (SELECT lo + (hi - lo) * 99 // 100 AS mid FROM rng) "
    "SELECT DISTINCT user_id FROM events, m "
    "WHERE epoch_us(ts) <= mid "
    "EXCEPT SELECT DISTINCT user_id FROM events, m "
    "WHERE epoch_us(ts) > mid"
)

ORACLE_SQL["label_centroids"] = (
    "SELECT CAST(label AS BIGINT) AS label, d, "
    "floor(avg(CAST(v AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 "
    "AS mean FROM (SELECT label, unnest(embedding) AS v, "
    "generate_subscripts(embedding, 1) - 1 AS d FROM embeddings) "
    "GROUP BY 1, 2"
)

ORACLE_SQL["event_funnel_windowed"] = (
    "WITH s0 AS (SELECT user_id, min(ts) AS t FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s0 USING (user_id) WHERE e.event_type = 'click' "
    "AND e.ts > s0.t AND e.ts <= s0.t + INTERVAL 6 HOUR "
    "GROUP BY e.user_id), "
    "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' "
    "AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 6 HOUR "
    "GROUP BY e.user_id) "
    "SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step, "
    "CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users "
    "UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1) "
    "UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2)"
)

ORACLE_SQL["sliding_distinct_users"] = (
    "WITH p AS (SELECT DISTINCT event_type AS k, "
    "date_trunc('hour', ts) AS h, user_id AS u FROM events "
    "WHERE user_id IS NOT NULL AND event_type IS NOT NULL), "
    "anchors AS (SELECT DISTINCT k, h FROM p) "
    "SELECT a.k AS event_type, a.h AS hour, "
    "CAST(count(DISTINCT p.u) AS BIGINT) AS n_users_w "
    "FROM anchors a JOIN p ON p.k = a.k "
    "AND p.h BETWEEN a.h - INTERVAL 2 HOUR AND a.h "
    "GROUP BY a.k, a.h"
)

ORACLE_SQL["collocations"] = (
    "WITH toks AS (SELECT string_split(coalesce(text, ''), ' ') "
    "AS toks FROM documents), "
    "uni AS (SELECT t, CAST(count(*) AS BIGINT) AS c FROM "
    "(SELECT unnest(toks) AS t FROM toks) GROUP BY t), "
    "nu AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM uni), "
    "pr AS (SELECT unnest(list_transform("
    "generate_series(1, len(toks) - 1), i -> toks[i])) AS a, "
    "unnest(list_transform(generate_series(1, len(toks) - 1), "
    "i -> toks[i+1])) AS b FROM toks), "
    "pairs AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c FROM pr "
    "GROUP BY a, b), "
    "np AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM pairs), "
    "sc AS (SELECT p.a, p.b, p.c AS n_pair, "
    "floor(ln((p.c / np.n) / ((ua.c / nu.n) * (ub.c / nu.n))) "
    "* 1000000.0 + 0.5) / 1000000.0 AS pmi "
    "FROM pairs p JOIN uni ua ON ua.t = p.a "
    "JOIN uni ub ON ub.t = p.b, np, nu WHERE p.c >= 5) "
    "SELECT a, b, n_pair, pmi FROM sc "
    "ORDER BY pmi DESC, a, b LIMIT 20"
)

ORACLE_SQL["dup_cluster_sizes"] = (
    "WITH RECURSIVE " + SIG_CTE + ", cand AS (" + CAND_SELECT + "), "
    + CC_CTE +
    ", sizes AS (SELECT cluster_id, count(*) AS s FROM clusters "
    "GROUP BY cluster_id) "
    "SELECT CAST(s AS BIGINT) AS cluster_size, "
    "CAST(count(*) AS BIGINT) AS n_clusters FROM sizes GROUP BY s"
)

ORACLE_SQL["join_size_estimate"] = (
    "WITH ca AS (WITH tok AS (SELECT CAST(o_custkey AS VARCHAR) "
    "AS t FROM orders WHERE o_custkey IS NOT NULL), "
    "rows AS (SELECT r, CAST(CAST(('0x' || substr(md5(t), "
    "1 + 8 * r, 8)) AS UBIGINT) % 1024 AS BIGINT) AS b "
    "FROM tok CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(r)) "
    "SELECT r, b, CAST(count(*) AS BIGINT) AS c FROM rows "
    "GROUP BY r, b), "
    "cb AS (WITH tok AS (SELECT CAST(c_custkey AS VARCHAR) AS t "
    "FROM customer WHERE c_custkey IS NOT NULL), "
    "rows AS (SELECT r, CAST(CAST(('0x' || substr(md5(t), "
    "1 + 8 * r, 8)) AS UBIGINT) % 1024 AS BIGINT) AS b "
    "FROM tok CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(r)) "
    "SELECT r, b, CAST(count(*) AS BIGINT) AS c FROM rows "
    "GROUP BY r, b), "
    "prods AS (SELECT ca.r, sum(ca.c * cb.c) AS p FROM ca "
    "JOIN cb ON ca.r = cb.r AND ca.b = cb.b GROUP BY ca.r) "
    "SELECT (SELECT CAST(count(*) AS BIGINT) FROM orders "
    "JOIN customer ON o_custkey = c_custkey) AS n_join_rows, "
    "(SELECT CAST(min(p) AS BIGINT) FROM prods) AS cms_estimate"
)

ORACLE_SQL["event_funnel"] = (
    "WITH s0 AS (SELECT user_id, min(ts) AS t FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s1 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s0 USING (user_id) WHERE e.event_type = 'click' "
    "AND e.ts > s0.t GROUP BY e.user_id), "
    "s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
    "JOIN s1 USING (user_id) WHERE e.event_type = 'purchase' "
    "AND e.ts > s1.t GROUP BY e.user_id) "
    "SELECT CAST(0 AS BIGINT) AS step_index, 'view' AS step, "
    "CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users "
    "UNION ALL SELECT 1, 'click', (SELECT count(*) FROM s1) "
    "UNION ALL SELECT 2, 'purchase', (SELECT count(*) FROM s2)"
)

ORACLE_SQL["interval_coverage"] = (
    "WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + "
    "CAST(floor(value * 1000000.0) AS BIGINT) AS e FROM events "
    "WHERE value IS NOT NULL), "
    "o AS (SELECT user_id, s, e, CASE WHEN s > coalesce(max(e) OVER "
    "(PARTITION BY user_id ORDER BY s, e ROWS BETWEEN UNBOUNDED "
    "PRECEDING AND 1 PRECEDING), -9223372036854775808) "
    "THEN 1 ELSE 0 END AS brk FROM iv), "
    "g AS (SELECT user_id, s, e, sum(brk) OVER (PARTITION BY user_id "
    "ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM o), "
    "m AS (SELECT user_id, min(s) AS s, max(e) AS e FROM g "
    "GROUP BY user_id, isl) "
    "SELECT user_id, CAST(sum(e - s) AS BIGINT) AS covered_us "
    "FROM m GROUP BY user_id"
)

ORACLE_SQL["priority_sample"] = (
    "WITH p AS (SELECT doc_id, n_chars, "
    "-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS UBIGINT) + 1.0) / 1152921504606846976.0) / n_chars AS pri "
    "FROM documents WHERE n_chars > 0) "
    "SELECT doc_id, n_chars FROM p ORDER BY pri, doc_id LIMIT 100"
)

ORACLE_SQL["bucketed_upsert"] = (
    "WITH delta AS ("
    "SELECT o_orderkey AS k, o_totalprice + 1000.0 AS p, "
    "FALSE AS del FROM orders WHERE o_orderkey % 5 = 0 "
    "UNION ALL SELECT -o_orderkey, o_totalprice, FALSE FROM orders "
    "WHERE o_orderkey % 17 = 2 "
    "UNION ALL SELECT o_orderkey, o_totalprice, TRUE FROM orders "
    "WHERE o_orderkey % 13 = 1 AND o_orderkey % 5 <> 0) "
    "SELECT k AS o_orderkey, p AS o_totalprice FROM delta "
    "WHERE NOT del "
    "UNION ALL SELECT o.o_orderkey, o.o_totalprice FROM orders o "
    "WHERE NOT EXISTS (SELECT 1 FROM delta d "
    "WHERE d.k = o.o_orderkey)"
)

ORACLE_SQL["locf_fill"] = (
    "WITH e AS (SELECT event_id, user_id, ts, "
    "CASE WHEN event_id % 4 = 1 THEN NULL ELSE value END AS value "
    "FROM events) "
    "SELECT event_id, user_id, ts, "
    "last_value(value IGNORE NULLS) OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS value FROM e"
)

def _synth_link_pages(batch: pa.Table) -> pa.Table:
    """Deterministic page synth shared by the web-graph queries:
    ``doc_id % 4`` absolute anchors (``ref j`` → host
    ``(doc_id*7+j) % 97``) plus a relative nav link that host-level
    operators drop by design."""
    ids = batch.column("doc_id").to_pylist()
    htmls = []
    for i in ids:
        anchors = "".join(
            f'<a href="http://host{(i * 7 + j) % 97}.example.com'
            f'/p/{j}">ref {j}</a> '
            for j in range(1, i % 4 + 1)
        )
        htmls.append((
            "<html><body>"
            "<nav><a href='/about'>About</a></nav>"
            f"<p>doc {i} {anchors}</p>"
            "</body></html>"
        ).encode("utf-8"))
    return pa.table({
        "url": batch.column("url"),
        "html": pa.array(htmls, pa.binary()),
    })


def q_link_graph(sf_dir: str):
    """Host-level link graph from the raw HTML (stages/web.py
    ``link_graph``): the CC-webgraph construction. Pages are
    synthesized from the documents table with deterministic absolute
    outlinks (``doc_id % 4`` anchors to hosts ``(doc_id*7+j) % 97``)
    plus a relative nav link that the graph drops by design; href
    extraction is one compiled findall per doc, edges combine
    map-side per block, and ONE small (src,dst) groupby sums them —
    the html payloads never shuffle."""
    from .stages.web import link_graph

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    )
    pages = ds.map_batches(_synth_link_pages, batch_format="pyarrow")
    return link_graph(pages)


def q_events_value_corr(sf_dir: str):
    """Per-type Pearson correlation between hour-of-day and value
    (stages/stats.py ``grouped_corr``): sufficient-statistic partials
    per block, one tiny groupby, key-scale finish — the
    ``grouped_moments`` shape extended to cross moments. Grid-rounded
    to the repo-wide 1e-6 float contract."""
    from .stages.stats import grouped_corr

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "ts", "value"])

    def _hour(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": batch.column("event_type"),
            "hour": pc.cast(pc.hour(batch.column("ts")), pa.float64()),
            "value": batch.column("value"),
        })

    out = grouped_corr(
        events.map_batches(_hour, batch_format="pyarrow"),
        "event_type", "hour", "value")

    def _grid(batch: pa.Table) -> pa.Table:
        c = batch.column("corr_xy")
        g = pc.divide(pc.floor(pc.add(pc.multiply(c, 1e6), 0.5)), 1e6)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "corr_hour_value": g,
        })

    return out.map_batches(_grid, batch_format="pyarrow")


ORACLE_SQL["snapshot_diff"] = (
    _DIFF_SNAPSHOTS_SQL + "SELECT doc_id, status FROM d"
)
ORACLE_SQL["snapshot_diff_summary"] = (
    _DIFF_SNAPSHOTS_SQL
    + "SELECT "
    "CAST(count(*) FILTER (status = 'added') AS BIGINT) AS n_added, "
    "CAST(count(*) FILTER (status = 'removed') AS BIGINT) AS n_removed, "
    "CAST(count(*) FILTER (status = 'changed') AS BIGINT) AS n_changed, "
    "CAST(count(*) FILTER (status = 'unchanged') AS BIGINT) "
    "AS n_unchanged FROM d"
)

ORACLE_SQL["link_graph"] = (
    "SELECT 'host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) || "
    "'.example.com' AS src_host, "
    "'host' || CAST((doc_id * 7 + j) % 97 AS VARCHAR) || "
    "'.example.com' AS dst_host, "
    "count(*) AS n_links "
    "FROM (SELECT doc_id, unnest(range(1, doc_id % 4 + 1)) AS j "
    "FROM documents) "
    "GROUP BY 1, 2"
)

ORACLE_SQL["events_value_corr"] = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "FLOOR(corr(CAST(extract(hour FROM ts) AS DOUBLE), value) * 1e6 "
    "+ 0.5) / 1e6 AS corr_hour_value "
    "FROM events GROUP BY event_type"
)

def q_event_transitions(sf_dir: str):
    """Markov transition matrix over per-user event trails
    (stages/temporal.event_transitions): global counts of consecutive
    ``(src_type, dst_type)`` pairs ordered by (ts, event_id) within
    each user. ONE user-bucket co-shuffle + in-bucket Arrow group_by
    partials; bit-exact vs the DuckDB lead() OVER twin."""
    from .stages.temporal import event_transitions

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return event_transitions(ds).sort(["src_type", "dst_type"])


def q_dq_audit(sf_dir: str):
    """Data-quality expectation suite (stages/profile.dq_audit): six
    exact assertions — null/empty text, n_chars consistency, doc_id
    uniqueness (one int64-key co-shuffle), orders→customer
    referential integrity (broadcast anti-probe), events value
    domain. One row per check, driver folds scalar partials."""
    import pyarrow.parquet as pq

    from .stages.profile import dq_audit

    docs = _docs(sf_dir, columns=["doc_id", "text", "n_chars"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["value"])
    # the customer dimension is the broadcast small side by design;
    # a driver-side pruned read of the key column IS the broadcast
    # prep (same contract as stages/join.broadcast_join)
    customer_keys = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]
    ).column("c_custkey")
    return dq_audit(docs, orders, customer_keys, events)


def q_dsir_weights(sf_dir: str):
    """DSIR importance scores (stages/dsir.py, Xie et al. 2023):
    hashed-unigram target-vs-raw log-likelihood ratio per doc, target
    = lang 'en'. Two streaming passes (bincount partials driver-fold
    → broadcast 256-bucket int64 micro-nat weight table → vectorized
    per-doc sums); NO shuffle. Bit-exact vs the DuckDB twin because
    per-doc sums are int64."""
    from .stages.dsir import dsir_scores

    def _mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_target",
            pc.equal(pc.fill_null(batch.column("lang"), ""), "en"),
        )

    ds = _docs(sf_dir, columns=["doc_id", "text", "lang"]).map_batches(
        _mark, batch_format="pyarrow")
    return dsir_scores(ds, dim=256).sort("doc_id")


def q_anchor_texts(sf_dir: str):
    """Per-destination-host anchor-text aggregation
    (stages/web.anchor_stats) over the same deterministic synthetic
    pages as `link_graph`: total mentions, distinct anchor strings,
    and the arg-max anchor per host (ties → lexicographic). Payloads
    never shuffle; only (host, anchor, n) partials move."""
    from .stages.web import anchor_stats

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(_synth_link_pages, batch_format="pyarrow")
    return anchor_stats(pages).sort("dst_host")


def q_events_winsorized(sf_dir: str):
    """Winsorized per-type mean (stages/stats.winsorized_group_mean):
    int64 cents clipped to the exact global percentile_disc
    [p05, p95], then one map-side-combined groupby. Robust-KPI shape:
    two streaming passes, bounds broadcast as scalars."""
    import numpy as np

    from .stages.stats import winsorized_group_mean

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    def _cents(batch: pa.Table) -> pa.Table:
        v = batch.column("value").combine_chunks().to_numpy(
            zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "cents": pa.array(
                np.floor(v * 100.0 + 0.5).astype(np.int64), pa.int64()),
        })

    cents = ds.map_batches(_cents, batch_format="pyarrow")
    return winsorized_group_mean(
        cents, "event_type", "cents", 0.05, 0.95
    ).sort("event_type")


def q_image_dhash(sf_dir: str):
    """Image near-dup via 64-bit PERCEPTUAL HASH (dHash) computed
    from REAL decoded pixels (stages/multimodal.PerceptualHasher →
    decode_pnm): every doc becomes a deterministic 9x8 gradient PGM
    (pixel = (11·doc_id + 7x + 13y) mod 83, so docs sharing
    doc_id mod 83 are pixel-identical), the actor pool decodes and
    hashes, and ONE groupby over the 16-hex dhash yields dup groups.
    The DuckDB twin recomputes the hash from the pixel FORMULA — a
    header-faking decoder cannot match it."""
    import numpy as np

    from ray.data.aggregate import Count, Min

    from .stages.multimodal import encode_pgm, image_dhash_stage

    ys, xs = np.mgrid[0:8, 0:9]

    def _to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        return pa.table({
            "media_id": pa.array([f"m{i:06d}" for i in ids], pa.string()),
            "payload": pa.array(
                [encode_pgm(9, 8, (11 * i + 7 * xs + 13 * ys) % 83)
                 for i in ids],
                pa.binary()),
        })

    imgs = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _to_images, batch_format="pyarrow")
    hashed = image_dhash_stage(imgs)
    agg = hashed.groupby("dhash").aggregate(
        Count(), Min("media_id", alias_name="min_media_id"))

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            "dhash": batch.column("dhash"),
            "n_images": pc.cast(batch.column("count()"), pa.int64()),
            "min_media_id": batch.column("min_media_id"),
        })

    return agg.map_batches(_rename, batch_format="pyarrow").sort("dhash")


ORACLE_SQL["event_transitions"] = (
    "SELECT src_type, dst_type, CAST(count(*) AS BIGINT) AS n FROM ("
    "SELECT event_type AS src_type, lead(event_type) OVER ("
    "PARTITION BY user_id ORDER BY ts, event_id) AS dst_type "
    "FROM events) WHERE dst_type IS NOT NULL "
    "GROUP BY src_type, dst_type ORDER BY src_type, dst_type"
)

ORACLE_SQL["dq_audit"] = (
    "SELECT * FROM ("
    "SELECT 'documents.dup_doc_id' AS check_name, "
    "CAST(count(*) - count(DISTINCT doc_id) AS BIGINT) AS violations "
    "FROM documents "
    "UNION ALL SELECT 'documents.empty_text', CAST(count(*) FILTER ("
    "text IS NOT NULL AND length(text) = 0) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'documents.n_chars_mismatch', "
    "CAST(count(*) FILTER (coalesce(length(text), 0) != "
    "coalesce(n_chars, -1)) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'documents.null_text', "
    "CAST(count(*) FILTER (text IS NULL) AS BIGINT) FROM documents "
    "UNION ALL SELECT 'events.negative_value', "
    "CAST(count(*) FILTER (value < 0) AS BIGINT) FROM events "
    "UNION ALL SELECT 'orders.orphan_custkey', "
    "CAST(count(*) FILTER (o_custkey IS NOT NULL AND o_custkey NOT IN "
    "(SELECT c_custkey FROM customer)) AS BIGINT) FROM orders"
    ") ORDER BY check_name"
)

ORACLE_SQL["dsir_weights"] = (
    "WITH tok AS (SELECT doc_id, CAST(CAST(('0x' || substr(md5(t), 1, 8))"
    " AS UBIGINT) % 256 AS BIGINT) AS bucket, is_tgt FROM ("
    "SELECT doc_id, lang = 'en' AS is_tgt, "
    "unnest(string_split(text, ' ')) AS t "
    "FROM documents WHERE text IS NOT NULL)), "
    "cnt AS (SELECT bucket, count(*) AS n_raw, "
    "coalesce(count(*) FILTER (is_tgt), 0) AS n_tgt "
    "FROM tok GROUP BY bucket), "
    "tot AS (SELECT sum(n_raw) AS t_raw, sum(n_tgt) AS t_tgt FROM cnt), "
    "w AS (SELECT bucket, CAST(floor((ln((n_tgt + 1) / (t_tgt + 256.0)) "
    "- ln((n_raw + 1) / (t_raw + 256.0))) * 1e6 + 0.5) AS BIGINT) AS wt "
    "FROM cnt CROSS JOIN tot) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
    "CAST(sum(wt) AS BIGINT) AS dsir_micro_nats "
    "FROM tok JOIN w USING (bucket) GROUP BY doc_id ORDER BY doc_id"
)

ORACLE_SQL["anchor_texts"] = (
    "WITH l AS (SELECT (doc_id * 7 + j) % 97 AS hid, "
    "'ref ' || CAST(j AS VARCHAR) AS anchor FROM ("
    "SELECT doc_id, unnest(range(1, doc_id % 4 + 1)) AS j "
    "FROM documents)), "
    "c AS (SELECT hid, anchor, count(*) AS n FROM l GROUP BY 1, 2), "
    "r AS (SELECT hid, anchor, row_number() OVER (PARTITION BY hid "
    "ORDER BY n DESC, anchor ASC) AS rk, "
    "sum(n) OVER (PARTITION BY hid) AS tot, "
    "count(*) OVER (PARTITION BY hid) AS nd FROM c) "
    "SELECT 'host' || CAST(hid AS VARCHAR) || '.example.com' AS dst_host, "
    "CAST(tot AS BIGINT) AS n_mentions, "
    "CAST(nd AS BIGINT) AS n_distinct_anchors, anchor AS top_anchor "
    "FROM r WHERE rk = 1 ORDER BY dst_host"
)

ORACLE_SQL["events_winsorized"] = (
    "WITH c AS (SELECT event_type, "
    "CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events), "
    "b AS (SELECT percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) "
    "AS lo, percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS hi "
    "FROM c) "
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "floor(sum(least(greatest(cents, lo), hi)) / count(*) / 100.0 "
    "* 1000.0 + 0.5) / 1000.0 AS mean_winsorized "
    "FROM c CROSS JOIN b GROUP BY event_type, lo, hi "
    "ORDER BY event_type"
)

ORACLE_SQL["image_dhash"] = (
    "WITH bits AS (SELECT doc_id, y, x, "
    "CASE WHEN (11 * doc_id + 7 * (x + 1) + 13 * y) % 83 > "
    "(11 * doc_id + 7 * x + 13 * y) % 83 THEN 1 ELSE 0 END AS b "
    "FROM (SELECT doc_id, unnest(range(0, 8)) AS y FROM documents), "
    "(SELECT unnest(range(0, 8)) AS x)), "
    "h AS (SELECT doc_id, "
    "sum(CASE WHEN y * 8 + x >= 32 THEN b * (CAST(1 AS BIGINT) << "
    "CAST(y * 8 + x - 32 AS INTEGER)) ELSE 0 END) AS hi, "
    "sum(CASE WHEN y * 8 + x < 32 THEN b * (CAST(1 AS BIGINT) << "
    "CAST(y * 8 + x AS INTEGER)) ELSE 0 END) AS lo "
    "FROM bits GROUP BY doc_id) "
    "SELECT lower(lpad(to_hex(hi), 8, '0')) || "
    "lower(lpad(to_hex(lo), 8, '0')) AS dhash, "
    "CAST(count(*) AS BIGINT) AS n_images, "
    "min('m' || lpad(CAST(doc_id AS VARCHAR), 6, '0')) AS min_media_id "
    "FROM h GROUP BY 1 ORDER BY dhash"
)


def q_scd2_build(sf_dir: str):
    """SCD2 history build (stages/temporal.scd2_intervals): collapse
    each user's consecutive equal event_type runs into validity
    intervals (valid_from = run start, valid_to = next run start,
    NULL = current). ONE user co-shuffle + boundary masks; bit-exact
    vs the DuckDB lag-filter-lead twin."""
    from .stages.temporal import scd2_intervals

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    )
    return scd2_intervals(ds).sort(["user_id", "valid_from"])


def q_user_mode_event(sf_dir: str):
    """Exact per-user MODE event type (stages/stats.grouped_mode):
    map-side (user, type, n) partial combine → one user-bucket
    co-shuffle → whole-bucket sort + boundary-mask arg-max with the
    (count desc, value asc) tie rule."""
    from .stages.stats import grouped_mode

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return grouped_mode(ds, "user_id", "event_type").sort("user_id")


def q_robots_allowed(sf_dir: str):
    """Robots-style disallow-prefix URL filtering
    (stages/web.robots_filter): per-host Disallow rules broadcast
    once, probed with O(distinct prefix lengths) vectorized is_in
    kernels per batch — the crawl-politeness / takedown gate. Rules
    here derive from the host id (h%3→'/p/1', h%5→'/p/2',
    h%7→'/p/33') so the DuckDB NOT EXISTS twin reproduces them."""
    from .stages.web import robots_filter

    hosts, prefixes = [], []
    for h in range(97):
        host = f"host{h}.example.com"
        if h % 3 == 0:
            hosts.append(host)
            prefixes.append("/p/1")
        if h % 5 == 0:
            hosts.append(host)
            prefixes.append("/p/2")
        if h % 7 == 0:
            hosts.append(host)
            prefixes.append("/p/33")
    rules = pa.table({"host": pa.array(hosts, pa.string()),
                      "prefix": pa.array(prefixes, pa.string())})
    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow")
    return robots_filter(ds, rules).select_columns(
        ["doc_id", "url"]).sort("doc_id")


def q_robots_rep(sf_dir: str):
    """Full REP (RFC 9309) robots evaluation
    (stages/web.robots_rep_filter): longest-prefix rule wins, Allow
    beats Disallow on length ties, no match allows — the semantics
    the plain disallow gate can't express (``Disallow: /p/1`` +
    ``Allow: /p/12`` re-opens /p/12*; host0 re-blocks /p/123*).
    Rules derive from host-id formulas so the SQL twin rebuilds them
    and picks each url's verdict with a longest-match LIMIT 1."""
    from .stages.web import robots_rep_filter

    hosts, dirs, prefixes = [], [], []
    for h in range(97):
        host = f"host{h}.example.com"
        hosts += [host, host]
        dirs += ["disallow", "allow"]
        prefixes += ["/p/1", "/p/12"]
        if h % 2 == 0:
            hosts.append(host)
            dirs.append("disallow")
            prefixes.append("/p/4")
    hosts.append("host0.example.com")
    dirs.append("disallow")
    prefixes.append("/p/123")
    rules = pa.table({"host": pa.array(hosts, pa.string()),
                      "directive": pa.array(dirs, pa.string()),
                      "prefix": pa.array(prefixes, pa.string())})
    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow")
    return robots_rep_filter(ds, rules).select_columns(
        ["doc_id", "url"]).sort("doc_id")


def q_distinctive_terms(sf_dir: str):
    """Fightin'-Words distinctive terms (Monroe et al. 2008;
    stages/textstats.distinctive_terms): top-20 tokens
    characterizing 'en' vs 'de' docs by add-one-prior log-odds
    z-score. One vocab-scale token groupby (never broadcast),
    blocks-scale scalar fold, per-block local top-k + tiny global
    sort — exact int64 counts drive the identical float expression
    on both engines (1e-6 grid)."""
    from .stages.textstats import distinctive_terms

    def _mark(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "is_a", pc.equal(pc.fill_null(batch.column("lang"), ""),
                             "en"))

    ds = _docs(sf_dir, columns=["text", "lang"]).filter(
        expr="lang == 'en' or lang == 'de'"
    ).map_batches(_mark, batch_format="pyarrow")
    return distinctive_terms(ds, side_col="is_a", k=20)


ORACLE_SQL["scd2_build"] = (
    "WITH o AS (SELECT user_id, ts, event_id, event_type, "
    "lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
    "AS prev_type FROM events), "
    "s AS (SELECT user_id, event_type, ts AS valid_from, event_id "
    "FROM o WHERE prev_type IS NULL OR prev_type != event_type) "
    "SELECT user_id, event_type, valid_from, "
    "lead(valid_from) OVER (PARTITION BY user_id "
    "ORDER BY valid_from, event_id) AS valid_to "
    "FROM s ORDER BY user_id, valid_from"
)

ORACLE_SQL["user_mode_event"] = (
    "SELECT user_id, mode_value, n FROM ("
    "SELECT user_id, event_type AS mode_value, "
    "CAST(count(*) AS BIGINT) AS n, row_number() OVER ("
    "PARTITION BY user_id ORDER BY count(*) DESC, event_type ASC) "
    "AS rk FROM events GROUP BY user_id, event_type) "
    "WHERE rk = 1 ORDER BY user_id"
)

ORACLE_SQL["robots_rep"] = (
    "WITH hs AS (SELECT unnest(range(0, 97)) AS h), "
    "rules AS ("
    "SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' AS host, "
    "'disallow' AS d, '/p/1' AS p FROM hs "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com',"
    " 'allow', '/p/12' FROM hs "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com',"
    " 'disallow', '/p/4' FROM hs WHERE h % 2 = 0 "
    "UNION ALL SELECT 'host0.example.com', 'disallow', '/p/123'), "
    "u AS (SELECT doc_id, "
    "'host' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0 "
    "ELSE doc_id % 97 END AS VARCHAR) || '.example.com' AS host, "
    "'/p/' || CAST(doc_id AS VARCHAR) AS path, "
    "'http://host' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0 "
    "ELSE doc_id % 97 END AS VARCHAR) || '.example.com/p/' || "
    "CAST(doc_id AS VARCHAR) AS url FROM documents) "
    "SELECT doc_id, url FROM u WHERE COALESCE(("
    "SELECT r.d = 'allow' FROM rules r WHERE r.host = u.host "
    "AND starts_with(u.path, r.p) "
    "ORDER BY length(r.p) DESC, r.d LIMIT 1), TRUE) "
    "ORDER BY doc_id"
)

ORACLE_SQL["robots_allowed"] = (
    "WITH hs AS (SELECT unnest(range(0, 97)) AS h), "
    "rules AS ("
    "SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' AS host, "
    "'/p/1' AS prefix FROM hs WHERE h % 3 = 0 "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com', "
    "'/p/2' FROM hs WHERE h % 5 = 0 "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com', "
    "'/p/33' FROM hs WHERE h % 7 = 0), "
    "u AS (SELECT doc_id, "
    "'host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) || '.example.com' "
    "AS host, '/p/' || CAST(doc_id AS VARCHAR) AS path, "
    "'http://host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) || "
    "'.example.com/p/' || CAST(doc_id AS VARCHAR) AS url "
    "FROM documents) "
    "SELECT doc_id, url FROM u WHERE NOT EXISTS ("
    "SELECT 1 FROM rules r WHERE r.host = u.host "
    "AND starts_with(u.path, r.prefix)) ORDER BY doc_id"
)

ORACLE_SQL["distinctive_terms"] = (
    "WITH tok AS (SELECT lang = 'en' AS a, "
    "unnest(string_split(text, ' ')) AS token FROM documents "
    "WHERE lang IN ('en', 'de') AND text IS NOT NULL), "
    "c AS (SELECT token, coalesce(count(*) FILTER (a), 0) AS ya, "
    "coalesce(count(*) FILTER (NOT a), 0) AS yb FROM tok "
    "GROUP BY token), "
    "t AS (SELECT sum(ya) AS na, sum(yb) AS nb, count(*) AS v FROM c) "
    "SELECT token, floor((ln((ya + 1) / (na + v - ya - 1.0)) "
    "- ln((yb + 1) / (nb + v - yb - 1.0))) "
    "/ sqrt(1.0 / (ya + 1) + 1.0 / (yb + 1)) * 1e6 + 0.5) / 1e6 AS z "
    "FROM c CROSS JOIN t ORDER BY z DESC, token ASC LIMIT 20"
)


def q_lang_top_tokens(sf_dir: str):
    """Per-language top-5 vocabulary (stages/stats.grouped_topk —
    grouped heavy hitters, grouped_mode's k>1 generalization):
    vectorized per-block (lang, token) partial counts, one key
    co-shuffle of the pair partials, whole-bucket rank kernel."""
    from .stages.stats import grouped_topk
    from .stages.textstats import _token_lists

    def _pairs(batch: pa.Table) -> pa.Table:
        import numpy as np

        b = batch.filter(pc.is_valid(batch.column("text")))
        flat, offsets, n_tokens = _token_lists(b, "text")
        langs = b.column("lang").combine_chunks()
        return pa.table({
            "lang": langs.take(pa.array(np.repeat(
                np.arange(b.num_rows, dtype=np.int64), n_tokens))),
            "token": flat,
        })

    pairs = _docs(sf_dir, columns=["text", "lang"]).map_batches(
        _pairs, batch_format="pyarrow")
    return grouped_topk(pairs, "lang", "token", k=5).sort(["lang", "rk"])


def q_host_components(sf_dir: str):
    """Connected components over the HOST link graph — the
    string-keyed reuse of the distributed block-fold union-find
    (stages/cluster.connected_components, cluster = lexicographic
    min host): pages → link_graph edges → (host, component)."""
    from .stages.cluster import connected_components
    from .stages.web import link_graph

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(_synth_link_pages, batch_format="pyarrow")
    edges = link_graph(pages)
    return connected_components(
        edges, a_col="src_host", b_col="dst_host"
    ).sort("node")


def q_host_gini(sf_dir: str):
    """Crawl concentration: Gini coefficient of docs over hosts
    (stages/web.host_gini) — hosts-scale driver fold of the map-side-
    combined host_stats counts; all-integer numerator, one terminal
    division on the 1e-6 grid."""
    from .stages.web import host_gini

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow")
    return host_gini(ds)


ORACLE_SQL["lang_top_tokens"] = (
    "SELECT lang, token, n, rk FROM ("
    "SELECT lang, token, CAST(count(*) AS BIGINT) AS n, "
    "row_number() OVER (PARTITION BY lang "
    "ORDER BY count(*) DESC, token ASC) AS rk FROM ("
    "SELECT lang, unnest(string_split(text, ' ')) AS token "
    "FROM documents WHERE text IS NOT NULL) GROUP BY lang, token) "
    "WHERE rk <= 5 ORDER BY lang, rk"
)

ORACLE_SQL["host_components"] = (
    "WITH RECURSIVE e0 AS (SELECT "
    "'host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) || '.example.com' "
    "AS src, 'host' || CAST((doc_id * 7 + j) % 97 AS VARCHAR) || "
    "'.example.com' AS dst FROM (SELECT doc_id, "
    "unnest(range(1, doc_id % 4 + 1)) AS j FROM documents)), "
    "edges AS (SELECT src AS u, dst AS v FROM e0 "
    "UNION ALL SELECT dst, src FROM e0), "
    "lbl(node, lab) AS ("
    "SELECT u, u FROM (SELECT DISTINCT u FROM edges) "
    "UNION SELECT e.u, l.lab FROM edges e JOIN lbl l ON l.node = e.v) "
    "SELECT node, MIN(lab) AS cluster FROM lbl GROUP BY node "
    "ORDER BY node"
)

ORACLE_SQL["host_gini"] = (
    "WITH h AS (SELECT " + _HOST_ID_SQL + " AS hid, count(*) AS n "
    "FROM documents GROUP BY 1), "
    "r AS (SELECT n, row_number() OVER (ORDER BY n, hid) AS i, "
    "count(*) OVER () AS cnt, sum(n) OVER () AS tot FROM h) "
    "SELECT CAST(max(cnt) AS BIGINT) AS n_hosts, "
    "floor(sum((2 * i - cnt - 1) * n) / (max(cnt) * max(tot)) * 1e6 "
    "+ 0.5) / 1e6 AS gini FROM r"
)


def q_dedup_best_survivor(sf_dir: str):
    """QUALITY-AWARE dedup survivor: per near-dup cluster keep the
    BEST member (max n_chars, tie min doc_id) instead of
    `dedup_canonical`'s min-id convention — the curation-grade
    survivor rule (keep the longest/cleanest copy of a template).
    Composition: connected components over the bit-exact MinHash
    pairs → broadcast the cluster-member-scale label table into one
    pruned corpus scan (no corpus shuffle) →
    stages/stats.grouped_argmax (per-block partial arg-max, one
    keys×blocks exchange)."""
    from .stages.cluster import connected_components
    from .stages.join import broadcast_join
    from .stages.stats import grouped_argmax

    clusters = connected_components(minhash_dup_pairs(_docs(sf_dir)))

    def _ren(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(batch.column("node"), pa.int64()),
            "cluster_id": pc.cast(batch.column("cluster"), pa.int64()),
        })

    labels = clusters.map_batches(_ren, batch_format="pyarrow")
    docs = _docs(sf_dir, columns=["doc_id", "n_chars"])
    joined = broadcast_join(docs, labels, on="doc_id")
    best = grouped_argmax(joined, "cluster_id", "n_chars", "doc_id")

    def _fin(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cluster_id": batch.column("cluster_id"),
            "doc_id": batch.column("doc_id"),
            "n_chars": pc.cast(batch.column("n_chars"), pa.int64()),
        })

    return best.map_batches(_fin, batch_format="pyarrow").sort(
        "cluster_id")


ORACLE_SQL["dedup_best_survivor"] = (
    "WITH RECURSIVE " + SIG_CTE + ", cand AS (" + CAND_SELECT + "), "
    + CC_CTE +
    " SELECT cluster_id, doc_id, n_chars FROM ("
    "SELECT c.cluster_id AS cluster_id, d.doc_id, "
    "CAST(d.n_chars AS BIGINT) AS n_chars, row_number() OVER ("
    "PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, d.doc_id ASC) "
    "AS rk FROM clusters c JOIN documents d ON d.doc_id = c.node) "
    "WHERE rk = 1 ORDER BY cluster_id"
)


def q_wordlist_gate(sf_dir: str):
    """C4-style bad-words gate (stages/textstats.wordlist_gate_fn):
    per-doc blocklisted-token count + kept flag — one is_in kernel
    over the flat token array per block, no shuffle. The blocklist
    here is corpus-vocabulary words so the gate is load-bearing."""
    from .stages.textstats import wordlist_gate_fn

    words = ["join", "merge", "query"]
    return _docs(sf_dir).map_batches(
        lambda b: wordlist_gate_fn(b, words), batch_format="pyarrow"
    ).sort("doc_id")


def q_minhash_jaccard_estimate(sf_dir: str):
    """Signature-based Jaccard ESTIMATE per candidate pair (matching
    minhash fraction — the estimation step between LSH candidacy and
    exact verification in the standard near-dup chain). Scale shape:
    the pair-scale candidate id set broadcasts into the signature
    scan (is_in filter), and the candidates-only signature table —
    small by construction, same argument as the verified-Jaccard
    chain — broadcasts into two vectorized hash-joins over the pair
    list. Bit-exact: signatures are bit-exact vs SQL, the estimate is
    a single division."""
    from .stages.bucketed import checkpoint_bucketed
    from .stages.join import broadcast_join

    # hash the corpus ONCE: the signature table feeds both the
    # candidate-pair plan (precomputed-sig branch of
    # minhash_dup_pairs) and the estimate joins — corpus-row-count
    # rows, so checkpoint to bucketed parquet instead of pinning
    all_sigs = checkpoint_bucketed(
        minhash_signatures(_docs(sf_dir)),
        f"mhest_{os.path.basename(os.path.normpath(sf_dir))}",
        key_col="doc_id")
    pairs = minhash_dup_pairs(all_sigs)
    cand_ids = set()
    for b in pairs.iter_batches(batch_format="pyarrow",
                                batch_size=None):
        cand_ids.update(b.column("d1").to_pylist())
        cand_ids.update(b.column("d2").to_pylist())
    id_set = pa.array(sorted(cand_ids), pa.int64())

    def _cand_only(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch.column("doc_id"),
                                     value_set=id_set))

    sigs = all_sigs.map_batches(_cand_only, batch_format="pyarrow")

    def _ren(side: str):
        def _fn(batch: pa.Table) -> pa.Table:
            cols = {side: batch.column("doc_id")}
            for i in range(4):
                cols[f"{side}_h{i}"] = batch.column(f"h{i}")
            return pa.table(cols)
        return _fn

    a = sigs.map_batches(_ren("d1"), batch_format="pyarrow")
    b = sigs.map_batches(_ren("d2"), batch_format="pyarrow")
    joined = broadcast_join(broadcast_join(pairs, a, on="d1"), b,
                            on="d2")

    def _est(batch: pa.Table) -> pa.Table:
        import numpy as np

        match = np.zeros(batch.num_rows, dtype=np.int64)
        for i in range(4):
            match += pc.equal(
                batch.column(f"d1_h{i}"), batch.column(f"d2_h{i}")
            ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "d1": batch.column("d1"),
            "d2": batch.column("d2"),
            "est_jaccard": pa.array(match / 4.0, pa.float64()),
        })

    return joined.map_batches(_est, batch_format="pyarrow").sort(
        ["d1", "d2"])


def q_mirror_hosts(sf_dir: str):
    """Template-syndication report: UNORDERED host pairs linked by
    near-dup content (the MinHash candidate pairs), with pair counts
    — the mirror/content-farm detection rollup. Pair-scale all the
    way: hosts derive per side, least/greatest normalizes the pair,
    map-side partial combine feeds one tiny groupby."""
    from ray.data.aggregate import Sum

    pairs = minhash_dup_pairs(_docs(sf_dir))

    def _hosts(batch: pa.Table) -> pa.Table:
        def hid(col):
            hot = pc.equal(_int_mod(col, 3), 0)
            return pc.if_else(hot, pa.scalar(0, pa.int64()),
                              _int_mod(col, 97))

        h1, h2 = hid(batch.column("d1")), hid(batch.column("d2"))
        lo = pc.min_element_wise(h1, h2)
        hi = pc.max_element_wise(h1, h2)

        def name(c):
            return pc.binary_join_element_wise(
                "host", pc.cast(c, pa.string()), ".example.com", "")

        t = pa.table({"host_a": name(lo), "host_b": name(hi)})
        g = t.group_by(["host_a", "host_b"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "host_a": g.column("host_a"),
            "host_b": g.column("host_b"),
            "n_pairs": pc.cast(g.column("count_all"), pa.int64()),
        })

    return pairs.map_batches(_hosts, batch_format="pyarrow").groupby(
        ["host_a", "host_b"]
    ).aggregate(Sum("n_pairs", alias_name="n_pairs")).sort(
        ["host_a", "host_b"])


ORACLE_SQL["wordlist_gate"] = (
    "SELECT doc_id, CAST(coalesce(len(list_filter("
    "string_split(text, ' '), t -> t IN ('join', 'merge', 'query'))), "
    "0) AS BIGINT) AS n_blocked, "
    "coalesce(len(list_filter(string_split(text, ' '), "
    "t -> t IN ('join', 'merge', 'query'))), 0) = 0 AS kept "
    "FROM documents ORDER BY doc_id"
)

ORACLE_SQL["minhash_jaccard_estimate"] = (
    "WITH " + SIG_CTE + ", cand AS (" + CAND_SELECT + ") "
    "SELECT c.d1, c.d2, "
    "((CASE WHEN a.h0 = b.h0 THEN 1 ELSE 0 END) + "
    "(CASE WHEN a.h1 = b.h1 THEN 1 ELSE 0 END) + "
    "(CASE WHEN a.h2 = b.h2 THEN 1 ELSE 0 END) + "
    "(CASE WHEN a.h3 = b.h3 THEN 1 ELSE 0 END)) / 4.0 AS est_jaccard "
    "FROM cand c JOIN sig a ON a.doc_id = c.d1 "
    "JOIN sig b ON b.doc_id = c.d2 ORDER BY c.d1, c.d2"
)

ORACLE_SQL["mirror_hosts"] = (
    "WITH " + SIG_CTE + ", cand AS (" + CAND_SELECT + "), "
    "hp AS (SELECT "
    "least(CASE WHEN d1 % 3 = 0 THEN 0 ELSE d1 % 97 END, "
    "CASE WHEN d2 % 3 = 0 THEN 0 ELSE d2 % 97 END) AS lo, "
    "greatest(CASE WHEN d1 % 3 = 0 THEN 0 ELSE d1 % 97 END, "
    "CASE WHEN d2 % 3 = 0 THEN 0 ELSE d2 % 97 END) AS hi FROM cand) "
    "SELECT 'host' || CAST(lo AS VARCHAR) || '.example.com' AS host_a, "
    "'host' || CAST(hi AS VARCHAR) || '.example.com' AS host_b, "
    "CAST(count(*) AS BIGINT) AS n_pairs FROM hp "
    "GROUP BY 1, 2 ORDER BY host_a, host_b"
)


def q_cocitation_pairs(sf_dir: str):
    """Host co-citation (stages/web.cocitation_pairs): distinct
    unordered host pairs linked together by the same page, summed
    over the corpus — the webgraph relatedness signal. Pair-scale
    map-side combine + one groupby; the pair is normalized by host
    NAME (lexicographic), matching the SQL least/greatest twin."""
    from .stages.web import cocitation_pairs

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(_synth_link_pages, batch_format="pyarrow")
    return cocitation_pairs(pages).sort(["host_a", "host_b"])


ORACLE_SQL["cocitation_pairs"] = (
    "WITH e AS (SELECT doc_id, 'host' || CAST((doc_id * 7 + j) % 97 "
    "AS VARCHAR) || '.example.com' AS h, j FROM ("
    "SELECT doc_id, unnest(range(1, doc_id % 4 + 1)) AS j "
    "FROM documents)), "
    "p AS (SELECT DISTINCT a.doc_id, least(a.h, b.h) AS host_a, "
    "greatest(a.h, b.h) AS host_b FROM e a JOIN e b "
    "ON a.doc_id = b.doc_id AND a.j < b.j AND a.h != b.h) "
    "SELECT host_a, host_b, CAST(count(*) AS BIGINT) AS n_pages "
    "FROM p GROUP BY 1, 2 ORDER BY host_a, host_b"
)


def q_polyglot_hosts(sf_dir: str):
    """Mixed-language hosts (stages/web.polyglot_hosts): hosts
    serving ≥ 2 languages with doc counts and dominant language —
    the MT-spam curation signal. One (host, lang) partial co-shuffle,
    whole-bucket rollup."""
    from .stages.web import polyglot_hosts, url_host_fn

    ds = _docs(sf_dir, columns=["doc_id", "lang"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(lambda b: url_host_fn(b), batch_format="pyarrow")
    return polyglot_hosts(ds).sort("host")


def q_event_type_affinity(sf_dir: str):
    """Market-basket pair supports (stages/temporal.
    event_type_affinity): users exhibiting each unordered distinct
    event-type pair — the Apriori first pass. Map-side distinct,
    one user co-shuffle, vectorized basket expansion."""
    from .stages.temporal import event_type_affinity

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    return event_type_affinity(ds).sort(["type_a", "type_b"])


ORACLE_SQL["polyglot_hosts"] = (
    "WITH d AS (SELECT 'host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) "
    "|| '.example.com' AS host, lang FROM documents), "
    "c AS (SELECT host, lang, count(*) AS n FROM d GROUP BY 1, 2), "
    "r AS (SELECT host, lang, n, row_number() OVER (PARTITION BY host "
    "ORDER BY n DESC, lang ASC) AS rk, sum(n) OVER (PARTITION BY host) "
    "AS tot, count(*) OVER (PARTITION BY host) AS nl FROM c) "
    "SELECT host, CAST(tot AS BIGINT) AS n_docs, "
    "CAST(nl AS BIGINT) AS n_langs, lang AS top_lang FROM r "
    "WHERE rk = 1 AND nl >= 2 ORDER BY host"
)

ORACLE_SQL["event_type_affinity"] = (
    "WITH d AS (SELECT DISTINCT user_id, event_type FROM events) "
    "SELECT a.event_type AS type_a, b.event_type AS type_b, "
    "CAST(count(*) AS BIGINT) AS n_users FROM d a JOIN d b "
    "ON a.user_id = b.user_id AND a.event_type < b.event_type "
    "GROUP BY 1, 2 ORDER BY type_a, type_b"
)


QUERIES = {
    "polyglot_hosts": q_polyglot_hosts,
    "event_type_affinity": q_event_type_affinity,
    "cocitation_pairs": q_cocitation_pairs,
    "wordlist_gate": q_wordlist_gate,
    "minhash_jaccard_estimate": q_minhash_jaccard_estimate,
    "mirror_hosts": q_mirror_hosts,
    "dedup_best_survivor": q_dedup_best_survivor,
    "lang_top_tokens": q_lang_top_tokens,
    "host_components": q_host_components,
    "host_gini": q_host_gini,
    "scd2_build": q_scd2_build,
    "user_mode_event": q_user_mode_event,
    "robots_allowed": q_robots_allowed,
    "robots_rep": q_robots_rep,
    "distinctive_terms": q_distinctive_terms,
    "event_transitions": q_event_transitions,
    "dq_audit": q_dq_audit,
    "dsir_weights": q_dsir_weights,
    "anchor_texts": q_anchor_texts,
    "events_winsorized": q_events_winsorized,
    "image_dhash": q_image_dhash,
    "replace_chars": q_replace_chars,
    "replace_chars_stats": q_replace_chars_stats,
    "replace_regex": q_replace_regex,
    "sanitize_chars": q_sanitize_chars,
    "token_count": q_token_count,
    "quality_report": q_quality_report,
    "quality_bins": q_quality_bins,
    "corpus_quality_summary": q_corpus_quality_summary,
    "dedup_exact": q_dedup_exact,
    "dedup_first_rows": q_dedup_first_rows,
    "fingerprint": q_fingerprint,
    "winnow_fingerprint": q_winnow_fingerprint,
    "lang_stats": q_lang_stats,
    "lang_id": q_lang_id,
    "quality_heuristics": q_quality_heuristics,
    "repetition_stats": q_repetition_stats,
    "token_rarity": q_token_rarity,
    "pii_redact": q_pii_redact,
    "pii_summary": q_pii_summary,
    "host_stats": q_host_stats,
    "host_blocklist": q_host_blocklist,
    "paragraph_dedup": q_paragraph_dedup,
    "substring_dedup": q_substring_dedup,
    "pagerank": q_pagerank,
    "hits": q_hits,
    "redirect_resolve": q_redirect_resolve,
    "kmeans_assign": q_kmeans_assign,
    "lm_score": q_lm_score,
    "lm_buckets": q_lm_buckets,
    "split_leakage_safe": q_split_leakage_safe,
    "skew_join_enrich": q_skew_join_enrich,
    "shuffle_shards": q_shuffle_shards,
    "doc_embed": q_doc_embed,
    "mix_sample": q_mix_sample,
    "packed_windows": q_packed_windows,
    "pagerank_pregel": q_pagerank_pregel,
    "heavy_hitters": q_heavy_hitters,
    "inverted_index": q_inverted_index,
    "url_canonicalize": q_url_canonicalize,
    "nfc_normalize": q_nfc_normalize,
    "campaign_attribution": q_campaign_attribution,
    "sequence_packing": q_sequence_packing,
    "profile_table": q_profile_table,
    "host_cap": q_host_cap,
    "bpe_merges": q_bpe_merges,
    "weighted_sample": q_weighted_sample,
    "corpus_filter": q_corpus_filter,
    "stratified_sample": q_stratified_sample,
    "approx_distinct_tokens": q_approx_distinct_tokens,
    "corpus_quantiles": q_corpus_quantiles,
    "tfidf_top_terms": q_tfidf_top_terms,
    "corpus_p10_cut": q_corpus_p10_cut,
    "lang_quantiles": q_lang_quantiles,
    "top_docs_per_lang": q_top_docs_per_lang,
    "quality_rank": q_quality_rank,
    "source_overlap": q_source_overlap,
    "sample_exact_k": q_sample_exact_k,
    "approx_quantiles": q_approx_quantiles,
    "docs_except": q_docs_except,
    "docs_intersect": q_docs_intersect,
    "bucketed_join_orders": q_bucketed_join_orders,
    "near_dup_incremental": q_near_dup_incremental,
    "bucketed_order_counts": q_bucketed_order_counts,
    "minhash_signatures": q_minhash_signatures,
    "minhash_dup_pairs": q_minhash_dup_pairs,
    "dup_clusters": q_dup_clusters,
    "dedup_incremental": q_dedup_incremental,
    "dedup_incremental_bloom": q_dedup_incremental_bloom,
    "decontaminate": q_decontaminate,
    "dedup_canonical": q_dedup_canonical,
    "minhash_hot_buckets": q_minhash_hot_buckets,
    "lsh_recall": q_lsh_recall,
    "embedding_lsh_recall": q_embedding_lsh_recall,
    "near_dup_bucket_stats": q_near_dup_bucket_stats,
    "simhash": q_simhash,
    "jaccard_dup_pairs": q_jaccard_dup_pairs,
    "ann_topk": q_ann_topk,
    "ann_topk_lsh": q_ann_topk_lsh,
    "ann_topk_ivf": q_ann_topk_ivf,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "events_hourly": q_events_hourly,
    "events_json_agg": q_events_json_agg,
    "revenue_by_nation": q_revenue_by_nation,
    "customers_no_orders": q_customers_no_orders,
    "customer_running_spend": q_customer_running_spend,
    "parts_ordered": q_parts_ordered,
    "click_attribution": q_click_attribution,
    "top_parts_by_revenue": q_top_parts_by_revenue,
    "user_sessions": q_user_sessions,
    "event_gaps": q_event_gaps,
    "events_rollup": q_events_rollup,
    "events_cube": q_events_cube,
    "events_frame_window": q_events_frame_window,
    "events_pivot": q_events_pivot,
    "events_sliding_window": q_events_sliding_window,
    "events_by_type_salted": q_events_by_type_salted,
    "media_features": q_media_features,
    "media_decode": q_media_decode,
    "dataset_split": q_dataset_split,
    "training_pipeline": q_training_pipeline,
    "user_activity": q_user_activity,
    "top_tokens": q_top_tokens,
    "token_pair_counts": q_token_pair_counts,
    "extraction_flagship": q_extraction_flagship,
    "extraction_wraps": q_extraction_wraps,
    "extraction_boilerplate": q_extraction_boilerplate,
    "extraction_alto_roundtrip": q_extraction_alto_roundtrip,
    "extraction_page_roundtrip": q_extraction_page_roundtrip,
    "extraction_pdf_roundtrip": q_extraction_pdf_roundtrip,
    "customer_orders_full": q_customer_orders_full,
    "distinct_users_by_type": q_distinct_users_by_type,
    "bucket_point_lookup": q_bucket_point_lookup,
    "events_value_stats": q_events_value_stats,
    "doc_chunks": q_doc_chunks,
    "cms_sketch": q_cms_sketch,
    "approx_users_by_type": q_approx_users_by_type,
    "hll_users_by_type": q_hll_users_by_type,
    "semantic_dedup": q_semantic_dedup,
    "prefix_jaccard_pairs": q_prefix_jaccard_pairs,
    "lang_doc_rank": q_lang_doc_rank,
    "docs_union": q_docs_union,
    "source_extract": q_source_extract,
    "quality_classifier": q_quality_classifier,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
    "user_event_trail": q_user_event_trail,
    "docs_checksum": q_docs_checksum,
    "triangle_count": q_triangle_count,
    "user_retention": q_user_retention,
    "peak_sessions": q_peak_sessions,
    "host_skew_stats": q_host_skew_stats,
    "events_value_histogram": q_events_value_histogram,
    "snapshot_diff": q_snapshot_diff,
    "snapshot_diff_summary": q_snapshot_diff_summary,
    "locf_fill": q_locf_fill,
    "bucketed_upsert": q_bucketed_upsert,
    "interval_union": q_interval_union,
    "events_value_zscore": q_events_value_zscore,
    "interval_coverage": q_interval_coverage,
    "priority_sample": q_priority_sample,
    "bm25_search": q_bm25_search,
    "hybrid_search": q_hybrid_search,
    "event_funnel": q_event_funnel,
    "sliding_distinct_users": q_sliding_distinct_users,
    "join_size_estimate": q_join_size_estimate,
    "dup_cluster_sizes": q_dup_cluster_sizes,
    "collocations": q_collocations,
    "event_funnel_windowed": q_event_funnel_windowed,
    "label_centroids": q_label_centroids,
    "containment_pairs": q_containment_pairs,
    "recency_user_scores": q_recency_user_scores,
    "churned_users": q_churned_users,
    "lang_confusion": q_lang_confusion,
    "host_entropy": q_host_entropy,
    "value_outliers": q_value_outliers,
    "lang_doc_rank_dist": q_lang_doc_rank_dist,
    "ks_drift": q_ks_drift,
    "chi2_drift": q_chi2_drift,
    "doc_novelty": q_doc_novelty,
    "asof_last_purchase": q_asof_last_purchase,
    "link_graph": q_link_graph,
    "events_value_corr": q_events_value_corr,
}


# ---------------------------------------------------------------------------
# round-3 session-7 additions
# ---------------------------------------------------------------------------

def q_url_churn(sf_dir: str):
    """Per-URL crawl-revisit churn over planted snapshot history.

    Revisits are synthesized by doc_id formula (url_id = doc_id % 120,
    visit = doc_id // 120) with a content fingerprint that changes on
    a per-url cycle (url_id % 3 + 1 distinct versions), so the ORACLE
    derives every expected statistic independently in SQL — all-int64
    except the single-division round3 change_ratio.
    """
    import numpy as np

    from .stages.web import url_churn

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy()
        url_id = ids % 120
        visit = ids // 120
        fp = url_id * 100 + visit % (url_id % 3 + 1)
        host = url_id % 10
        urls = [
            f"https://host{h}.example.com/p/{u}"
            for h, u in zip(host.tolist(), url_id.tolist())
        ]
        return pa.table({
            "url": pa.array(urls, pa.string()),
            "fp": pa.array(fp, pa.int64()),
            "ts": pa.array(1600000000 + ids, pa.int64()),
        })

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aug, batch_format="pyarrow")
    return url_churn(pages)


ORACLE_SQL["url_churn"] = """
WITH s AS (
  SELECT 'https://host' || CAST((doc_id % 120) % 10 AS VARCHAR)
         || '.example.com/p/' || CAST(doc_id % 120 AS VARCHAR) AS url,
         (doc_id % 120) * 100
           + (doc_id // 120) % ((doc_id % 120) % 3 + 1) AS fp,
         1600000000 + doc_id AS ts
  FROM documents
)
SELECT url,
  CAST(count(*) AS BIGINT) AS n_snapshots,
  CAST(count(DISTINCT fp) AS BIGINT) AS n_versions,
  CAST(min(ts) AS BIGINT) AS first_ts,
  CAST(max(ts) AS BIGINT) AS last_ts,
  CASE WHEN count(*) = 1 THEN 0.0
       ELSE floor((count(DISTINCT fp) - 1.0) / (count(*) - 1.0)
                  * 1000 + 0.5) / 1000 END AS change_ratio
FROM s GROUP BY url
"""
QUERIES["url_churn"] = q_url_churn


def q_embedding_quantize(sf_dir: str):
    """Int8 scalar quantization of the embeddings table, exactly
    oracle-pinned: the query reduces each code vector to digest
    columns (count, sum, position-weighted checksum, md5 of the
    comma-joined codes) so EVERY code in EVERY position is gated
    without putting list columns through the row-sort compare.
    """
    import numpy as np

    from .stages.similarity import scalar_quantize

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    coded = scalar_quantize(ds)

    def _digest(batch: pa.Table) -> pa.Table:
        codes = batch.column("codes").combine_chunks()
        n = len(codes)
        lengths = pc.list_value_length(codes).to_numpy(
            zero_copy_only=False).astype(np.int64)
        flat = np.asarray(codes.flatten(), dtype=np.int64)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=offs[1:])
        starts = offs[:-1]
        # 1-based position weights within each row
        w = np.arange(1, flat.size + 1, dtype=np.int64) - np.repeat(
            starts, lengths)
        sums = np.add.reduceat(flat, starts) if flat.size else \
            np.zeros(n, dtype=np.int64)
        chks = np.add.reduceat(flat * w, starts) if flat.size else \
            np.zeros(n, dtype=np.int64)
        md5s = [
            hashlib.md5(",".join(
                str(c) for c in flat[offs[i]:offs[i + 1]].tolist()
            ).encode("ascii")).hexdigest()
            for i in range(n)
        ]
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "n_dims": pa.array(lengths, pa.int64()),
            "code_sum": pa.array(sums, pa.int64()),
            "code_chk": pa.array(chks, pa.int64()),
            "codes_md5": pa.array(md5s, pa.string()),
        })

    return coded.map_batches(_digest, batch_format="pyarrow")


ORACLE_SQL["embedding_quantize"] = """
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
              AS BIGINT) AS x
  FROM embeddings
), s AS (
  SELECT d, min(x) AS mn, max(x) AS mx FROM v GROUP BY d
), c AS (
  SELECT v.vec_id, v.d,
         CASE WHEN s.mx = s.mn THEN 0
              ELSE ((v.x - s.mn) * 510 + (s.mx - s.mn))
                   // (2 * (s.mx - s.mn)) END AS code
  FROM v JOIN s USING (d)
)
SELECT vec_id,
  CAST(count(*) AS BIGINT) AS n_dims,
  CAST(sum(code) AS BIGINT) AS code_sum,
  CAST(sum(d * code) AS BIGINT) AS code_chk,
  md5(array_to_string(list(CAST(code AS VARCHAR) ORDER BY d), ','))
    AS codes_md5
FROM c GROUP BY vec_id
"""
QUERIES["embedding_quantize"] = q_embedding_quantize


def _boilerplate_aug_fn(batch: pa.Table, sep: str) -> pa.Table:
    """Shared NAV/HALF/PROMO planting fixture for the host-template
    queries (host_boilerplate + curation_pipeline) — ONE definition so
    the component query and the composite cannot silently diverge."""
    ids = batch.column("doc_id")
    host = pc.binary_join_element_wise(
        "h", pc.cast(_int_mod(ids, 25), pa.string()), "")
    k = pc.divide(ids, pa.scalar(25, pa.int64()))
    half = pc.if_else(
        pc.equal(_int_mod(k, 2), 0),
        pc.binary_join_element_wise("HALF ", host, sep, ""), "")
    promo = pc.if_else(
        pc.equal(_int_mod(k, 5), 0),
        pc.binary_join_element_wise(sep, "PROMO ", host, ""), "")
    text = pc.binary_join_element_wise(
        "NAV ", host, sep, half,
        pc.fill_null(batch.column("text"), ""), promo, "")
    return pa.table({"doc_id": ids, "host": host, "text": text})


def _formula_edges_fn(batch: pa.Table) -> pa.Table:
    """Shared formula link graph (crawl_depth + kcore): two edge
    families src=id%200 -> id*7%200 and src -> (src+3)%200."""
    import numpy as np

    ids = batch.column("doc_id").combine_chunks().to_numpy(
        zero_copy_only=False).astype(np.int64)
    src = ids % 200
    return pa.table({
        "src": pa.array(np.concatenate([src, src]), pa.int64()),
        "dst": pa.array(np.concatenate(
            [(ids * 7) % 200, (src + 3) % 200]), pa.int64()),
    })


def q_host_boilerplate(sf_dir: str):
    """Per-host template-line removal (CCNet/WET boilerplate rule).

    Every doc gets a host-wide NAV line (removed: 100% > 50%), an
    alternating HALF line (exactly half the host's docs — pins the
    STRICT-> threshold: kept), a 20% PROMO line (kept) and its own
    unique text (kept). The ORACLE recomputes the whole semantics
    independently (count distinct docs per (host, line), threshold
    against per-host totals, anti join, ordered reassembly).
    """
    from .stages.dedup import host_boilerplate_removal

    sep = "<p>"
    aug = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda b: _boilerplate_aug_fn(b, sep), batch_format="pyarrow")
    return host_boilerplate_removal(aug, sep=sep)


ORACLE_SQL["host_boilerplate"] = """
WITH aug AS (
  SELECT doc_id, 'h' || CAST(doc_id % 25 AS VARCHAR) AS host,
    'NAV h' || CAST(doc_id % 25 AS VARCHAR) || '<p>' ||
    CASE WHEN (doc_id // 25) % 2 = 0
         THEN 'HALF h' || CAST(doc_id % 25 AS VARCHAR) || '<p>'
         ELSE '' END ||
    COALESCE(text, '') ||
    CASE WHEN (doc_id // 25) % 5 = 0
         THEN '<p>' || 'PROMO h' || CAST(doc_id % 25 AS VARCHAR)
         ELSE '' END AS text
  FROM documents
), lines AS (
  SELECT doc_id, host,
         generate_subscripts(string_split(text, '<p>'), 1) AS idx,
         unnest(string_split(text, '<p>')) AS line
  FROM aug
), cnt AS (
  SELECT host, line, count(DISTINCT doc_id) AS c
  FROM lines GROUP BY host, line
), tot AS (
  SELECT host, count(*) AS t FROM aug GROUP BY host
), bp AS (
  SELECT host, line FROM cnt JOIN tot USING (host)
  WHERE c >= 2 AND c > 0.5 * t
), kept AS (
  SELECT l.doc_id, l.idx, l.line FROM lines l
  ANTI JOIN bp b ON l.host = b.host AND l.line = b.line
)
SELECT doc_id,
  array_to_string(list(line ORDER BY idx), '<p>') AS text_clean,
  CAST(count(*) AS BIGINT) AS n_kept
FROM kept GROUP BY doc_id
"""
QUERIES["host_boilerplate"] = q_host_boilerplate


# --- product quantization -------------------------------------------------
PQ_M, PQ_K, PQ_ITERS = 4, 4, 2
PQ_DIM = 64  # testdata embeddings are fixed 64-d (corpus generator)


def q_pq_codes(sf_dir: str):
    """PQ codebook training + encoding, bit-exact vs a chained-CTE
    SQL twin (the `kmeans_assign` oracle applied per dim-slice)."""
    from .stages.kmeans import pq_codes

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    codes, _ = pq_codes(ds, m=PQ_M, k=PQ_K, iters=PQ_ITERS,
                        scale=KMEANS_SCALE)
    return codes


def _pq_sql(m: int, k: int, iters: int, scale: int, dim: int) -> str:
    """Per-subspace `_kmeans_sql` chains sharing one flattened-vector
    CTE and one smallest-ids init CTE; final select joins the m
    assignment CTEs into (vec_id, code_0..code_{m-1})."""
    w = dim // m

    def _chain(j: int) -> str:
        lo = j * w
        ctes = [
            f"v{j} AS (SELECT vec_id, d - {lo} AS d, x FROM v "
            f"WHERE d > {lo} AND d <= {lo + w})",
            f"c0_{j} AS (SELECT i.cluster, v.d, v.x FROM init i "
            f"JOIN v{j} v USING (vec_id))",
        ]
        for i in range(iters):
            ctes.append(
                f"a{i}_{j} AS (SELECT vec_id, cluster FROM ("
                f"SELECT v.vec_id, c.cluster, row_number() OVER ("
                f"PARTITION BY v.vec_id "
                f"ORDER BY sum((v.x - c.x)*(v.x - c.x)), c.cluster) AS rn "
                f"FROM v{j} v JOIN c{i}_{j} c USING (d) "
                f"GROUP BY v.vec_id, c.cluster) WHERE rn = 1)")
            ctes.append(
                f"c{i + 1}_{j} AS (SELECT c.cluster, c.d, "
                f"COALESCE(mm.x, c.x) AS x FROM c{i}_{j} c LEFT JOIN ("
                f"SELECT a.cluster, v.d, sum(v.x) // count(*) AS x "
                f"FROM a{i}_{j} a JOIN v{j} v USING (vec_id) "
                f"GROUP BY a.cluster, v.d) mm "
                f"ON mm.cluster = c.cluster AND mm.d = c.d)")
        ctes.append(
            f"f{j} AS (SELECT vec_id, cluster FROM ("
            f"SELECT v.vec_id, c.cluster, row_number() OVER ("
            f"PARTITION BY v.vec_id "
            f"ORDER BY sum((v.x - c.x)*(v.x - c.x)), c.cluster) AS rn "
            f"FROM v{j} v JOIN c{iters}_{j} c USING (d) "
            f"GROUP BY v.vec_id, c.cluster) WHERE rn = 1)")
        return ", ".join(ctes)

    chains = ", ".join(_chain(j) for j in range(m))
    code_cols = ", ".join(
        f"f{j}.cluster AS code_{j}" for j in range(m))
    joins = " ".join(
        f"JOIN f{j} USING (vec_id)" for j in range(1, m))
    return (
        "WITH v AS (SELECT vec_id, "
        "generate_subscripts(embedding, 1) AS d, "
        f"CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {scale}) "
        "AS BIGINT) AS x FROM embeddings), "
        "init AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 "
        "AS cluster FROM (SELECT DISTINCT vec_id FROM v "
        f"ORDER BY vec_id LIMIT {k})), "
        f"{chains} "
        f"SELECT f0.vec_id, {code_cols} FROM f0 {joins}"
    )


ORACLE_SQL["pq_codes"] = _pq_sql(PQ_M, PQ_K, PQ_ITERS, KMEANS_SCALE, PQ_DIM)
QUERIES["pq_codes"] = q_pq_codes


def q_ann_topk_pq(sf_dir: str):
    """PQ+ADC approximate top-10 vs the vec_id=0 query — unlike the
    LSH/IVF approximate paths this one IS exactly oracle-checkable:
    given the (bit-exact) codebooks and codes, the ADC ranking is a
    deterministic integer computation the SQL twin reproduces end to
    end (chains + query distance table + ORDER BY dist, id)."""
    from .stages.kmeans import pq_adc_topk, pq_codes

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    codes, books = pq_codes(ds, m=PQ_M, k=PQ_K, iters=PQ_ITERS,
                            scale=KMEANS_SCALE)
    q = _query_vec(sf_dir, 0)
    return pq_adc_topk(codes, books, q, k=10, scale=KMEANS_SCALE,
                       exclude_id=0)


def _pq_adc_sql(m: int, k: int, iters: int, scale: int, dim: int,
                qid: int, topk: int) -> str:
    """ADC twin: reuse the `_pq_sql` chain text (same codebooks and
    codes by construction), add per-subspace query slices qv{j} and
    distance tables dt{j}, rank by summed table lookups."""
    w = dim // m
    base = _pq_sql(m, k, iters, scale, dim)
    chains = base[:base.rindex(" SELECT f0.vec_id")]
    extra = []
    for j in range(m):
        lo = j * w
        extra.append(
            f"qv{j} AS (SELECT d - {lo} AS d, x FROM v "
            f"WHERE vec_id = {qid} AND d > {lo} AND d <= {lo + w})")
        extra.append(
            f"dt{j} AS (SELECT c.cluster, "
            f"sum((c.x - q.x)*(c.x - q.x)) AS dd "
            f"FROM c{iters}_{j} c JOIN qv{j} q USING (d) "
            f"GROUP BY c.cluster)")
    dist_sum = " + ".join(f"d{j}.dd" for j in range(m))
    joins = " ".join(
        f"JOIN f{j} USING (vec_id)" for j in range(1, m)) + " " + " ".join(
        f"JOIN dt{j} d{j} ON d{j}.cluster = f{j}.cluster"
        for j in range(m))
    return (
        f"{chains}, {', '.join(extra)} "
        f"SELECT vec_id, CAST({dist_sum} AS BIGINT) AS adc_dist "
        f"FROM f0 {joins} WHERE vec_id <> {qid} "
        f"ORDER BY adc_dist, vec_id LIMIT {topk}"
    )


ORACLE_SQL["ann_topk_pq"] = _pq_adc_sql(
    PQ_M, PQ_K, PQ_ITERS, KMEANS_SCALE, PQ_DIM, qid=0, topk=10)
QUERIES["ann_topk_pq"] = q_ann_topk_pq


def q_interval_overlap(sf_dir: str):
    """Interval × interval overlap join over doc_id-formula windows
    (first half of the docs vs second half), grid co-shuffle vs the
    DuckDB inequality join."""
    import numpy as np

    from .stages.join import interval_overlap_join

    def _mk(side: int, id_name: str):
        def _fn(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").combine_chunks().to_numpy()
            if side == 0:
                keep = ids < 250
                mul, span = 37, 40
            else:
                keep = ids >= 250
                mul, span = 53, 30
            ids = ids[keep].astype(np.int64)
            lo = (ids * mul) % 500
            return pa.table({
                id_name: pa.array(ids, pa.int64()),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(lo + ids % span, pa.int64()),
            })
        return _fn

    docs = _docs(sf_dir, columns=["doc_id"])
    left = docs.map_batches(_mk(0, "l_id"), batch_format="pyarrow")
    right = docs.map_batches(_mk(1, "r_id"), batch_format="pyarrow")
    return interval_overlap_join(left, right, grid=32)


ORACLE_SQL["interval_overlap"] = """
WITH l AS (
  SELECT doc_id AS l_id, (doc_id * 37) % 500 AS llo,
         (doc_id * 37) % 500 + doc_id % 40 AS lhi
  FROM documents WHERE doc_id < 250
), r AS (
  SELECT doc_id AS r_id, (doc_id * 53) % 500 AS rlo,
         (doc_id * 53) % 500 + doc_id % 30 AS rhi
  FROM documents WHERE doc_id >= 250
)
SELECT l_id, r_id,
  CAST(least(lhi, rhi) - greatest(llo, rlo) + 1 AS BIGINT) AS overlap
FROM l JOIN r ON llo <= rhi AND rlo <= lhi
"""
QUERIES["interval_overlap"] = q_interval_overlap


def q_video_scene_cuts(sf_dir: str):
    """Scene-cut detection over REAL decoded Y4M frame planes.

    Every doc gets a genuine multi-frame YUV4MPEG2 payload whose
    per-frame luma fill follows ``(doc_id*31 + f*f) % 256``; the
    Ray side counts cuts from the DECODED per-frame plane sums
    (``|sum_f - sum_{f-1}| > T*w*h`` — exact integers), the ORACLE
    recomputes the fills and the same threshold rule from the
    formulas alone. A decoder that fakes per-frame stats from the
    header cannot pass.
    """
    from .stages.multimodal import encode_y4m_frames, scene_cut_stage

    def _to_video(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for i in ids:
            w = 8 + 2 * (i % 5)
            h = 6 + 2 * (i % 4)
            fills = [(i * 31 + f * f) % 256 for f in range(3 + i % 6)]
            payloads.append(encode_y4m_frames(w, h, fills))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        })

    vids = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _to_video, batch_format="pyarrow")
    return scene_cut_stage(vids, threshold=6).select_columns(
        ["doc_id", "n_frames", "n_cuts", "first_cut"])


ORACLE_SQL["video_scene_cuts"] = """
WITH f AS (
  SELECT d.doc_id, u.f AS fr,
         (d.doc_id * 31 + u.f * u.f) % 256 AS fill
  FROM documents d,
       LATERAL unnest(generate_series(0, 2 + d.doc_id % 6)) AS u(f)
), dif AS (
  SELECT doc_id, fr,
         abs(fill - lag(fill) OVER (
             PARTITION BY doc_id ORDER BY fr)) AS dd
  FROM f
)
SELECT doc_id,
  CAST(count(*) AS BIGINT) AS n_frames,
  CAST(count(*) FILTER (dd > 6) AS BIGINT) AS n_cuts,
  CAST(COALESCE(min(fr) FILTER (dd > 6), -1) AS BIGINT) AS first_cut
FROM dif GROUP BY doc_id
"""
QUERIES["video_scene_cuts"] = q_video_scene_cuts


def q_zonemap_scan(sf_dir: str):
    """File-level zone-map pruning: documents staged ONCE into 10
    doc_id-range-clustered parquet files; a range scan consults the
    footer-stats manifest and reads only the files whose interval
    intersects — 9 of 10 skipped here (pytest pins the skip count;
    the driver gate pins the surviving rows vs plain SQL)."""
    import pyarrow.parquet as pq_

    from .stages.bucketed import pruned_read
    from .state.lineage import publish_table, store_root

    label = os.path.basename(os.path.normpath(sf_dir))
    stage = os.path.join(store_root(),
                         f"ocr_ray_zonemap_{os.getpid()}_{label}")
    paths = [os.path.join(stage, f"part-{i:02d}.parquet")
             for i in range(10)]
    if not all(os.path.exists(p) for p in paths):
        os.makedirs(stage, exist_ok=True)
        tbl = pq_.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"])
        tbl = tbl.sort_by([("doc_id", "ascending")])
        n = tbl.num_rows
        cuts = [n * i // 10 for i in range(11)]
        for i, p in enumerate(paths):
            publish_table(tbl.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
    ds, _n_read, _n_skipped = pruned_read(
        paths, "doc_id", 100, 149, columns=["doc_id", "n_chars"])
    return ds


ORACLE_SQL["zonemap_scan"] = (
    "SELECT doc_id, n_chars FROM documents "
    "WHERE doc_id BETWEEN 100 AND 149"
)
QUERIES["zonemap_scan"] = q_zonemap_scan


def q_range_shards(sf_dir: str):
    """Histogram-sketch range sharding of documents by n_chars into 8
    ~equal contiguous ranges; per-doc shard ids are bit-reproduced by
    the SQL twin (same int64 split rule over the same fixed bins)."""
    from .stages.stats import range_partition

    ds = _docs(sf_dir, columns=["doc_id", "n_chars"])
    assignments, _splits = range_partition(
        ds, "n_chars", n_shards=8, lo=0, bin_width=100, n_bins=100)
    return assignments


ORACLE_SQL["range_shards"] = """
WITH h AS (
  SELECT LEAST(GREATEST((n_chars - 0) // 100, 0), 99) AS b,
         count(*) AS n
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
), c AS (
  SELECT b, CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS cum FROM h
), tot AS (
  SELECT max(cum) AS n FROM c
), sp AS (
  SELECT ((SELECT min(b) FROM c WHERE cum >=
           GREATEST((i * tot.n + 7) // 8 - 1, 0) + 1) + 1) * 100 - 1
         AS v
  FROM (SELECT unnest(generate_series(1, 7)) AS i), tot
)
SELECT doc_id,
  CAST(CASE WHEN n_chars IS NULL THEN -1
       ELSE (SELECT count(*) FROM sp WHERE n_chars >= v) END
       AS BIGINT) AS shard
FROM documents
"""
QUERIES["range_shards"] = q_range_shards


def q_url_latest_k(sf_dir: str):
    """Crawl-store retention: keep the LATEST 2 snapshots per url
    (the url_churn revisit layout; descending group_cap) —
    one bucketed exchange, whole-bucket rank mask."""
    import numpy as np

    from .stages.dedup import group_cap

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy()
        url_id = ids % 120
        return pa.table({
            "url": pa.array(
                [f"u{u}" for u in url_id.tolist()], pa.string()),
            "ts": pa.array(1600000000 + ids, pa.int64()),
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
        })

    snaps = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aug, batch_format="pyarrow")
    return group_cap(snaps, key_col="url", order_col="ts", k=2,
                     descending=True)


ORACLE_SQL["url_latest_k"] = """
WITH s AS (
  SELECT 'u' || CAST(doc_id % 120 AS VARCHAR) AS url,
         1600000000 + doc_id AS ts, doc_id
  FROM documents
)
SELECT url, ts, doc_id FROM (
  SELECT url, ts, doc_id,
         row_number() OVER (PARTITION BY url ORDER BY ts DESC) AS rn
  FROM s
) WHERE rn <= 2
"""
QUERIES["url_latest_k"] = q_url_latest_k


def q_phrase_match(sf_dir: str):
    """Positional phrase search for the planted 3-token phrase:
    docs get 0/1/2 occurrences (plus a near-miss decoy with a gap)
    by doc_id % 6; the oracle recomputes matches by position
    arithmetic over the split tokens."""
    from .stages.index import phrase_match

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        r = _int_mod(ids, 6)
        suffix = pc.if_else(
            pc.equal(r, 0), " zq1 zq2 zq3",
            pc.if_else(
                pc.equal(r, 1), " zq1 zq2 zq3 zq1 zq2 zq3",
                pc.if_else(pc.equal(r, 2), " zq1 zq2 x zq3", "")))
        text = pc.binary_join_element_wise(
            pc.fill_null(batch.column("text"), ""), suffix, "")
        return pa.table({"doc_id": ids, "text": text})

    aug = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _aug, batch_format="pyarrow")
    return phrase_match(aug, ["zq1", "zq2", "zq3"])


ORACLE_SQL["phrase_match"] = """
WITH aug AS (
  SELECT doc_id, COALESCE(text, '') || CASE doc_id % 6
    WHEN 0 THEN ' zq1 zq2 zq3'
    WHEN 1 THEN ' zq1 zq2 zq3 zq1 zq2 zq3'
    WHEN 2 THEN ' zq1 zq2 x zq3'
    ELSE '' END AS text
  FROM documents
), tk AS (
  SELECT doc_id,
         generate_subscripts(string_split(text, ' '), 1) AS pos,
         unnest(string_split(text, ' ')) AS token
  FROM aug
), m AS (
  SELECT a.doc_id, a.pos FROM tk a
  JOIN tk b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tk c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
  WHERE a.token = 'zq1' AND b.token = 'zq2' AND c.token = 'zq3'
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(pos) AS BIGINT) AS first_pos
FROM m GROUP BY doc_id
"""
QUERIES["phrase_match"] = q_phrase_match


def q_simhash_near_pairs(sf_dir: str):
    """EXACT SimHash Hamming join (pigeonhole banding, Manku WWW'07):
    corpus ∪ perturbed copies of every 5th doc (one appended token →
    small nonzero distances); the oracle is the brute-force O(n²)
    bit_count(xor) join over the bit-exact simhash CTE, so BOTH the
    lossless candidate generation and the popcount verify are gated.
    """
    import numpy as np

    from .stages.dedup import simhash_near_pairs

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        texts = batch.column("text").to_pylist()
        mask = ids % 5 == 0
        cp_ids = ids[mask] + 100000
        cp_texts = [(t or "") + " xx1"
                    for t, m in zip(texts, mask.tolist()) if m]
        return pa.table({
            "doc_id": pa.array(
                np.concatenate([ids, cp_ids]), pa.int64()),
            "text": pa.array(list(texts) + cp_texts, pa.string()),
        })

    aug = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _aug, batch_format="pyarrow")
    return simhash_near_pairs(aug, max_dist=3)


def _simhash_near_sql(max_dist: int) -> str:
    body = ORACLE_SQL["simhash"]
    cut = body.rindex(" SELECT doc_id, array_to_string")
    ctes = body[len("WITH "):cut].replace("FROM documents)", "FROM aug)", 1)
    final = body[cut + 1:]
    return (
        "WITH aug AS (SELECT doc_id, text FROM documents UNION ALL "
        "SELECT doc_id + 100000, COALESCE(text, '') || ' xx1' "
        "FROM documents WHERE doc_id % 5 = 0), "
        f"{ctes}, sh AS ({final}), "
        "pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, "
        "CAST(bit_count(xor(CAST('0x' || a.simhash AS UBIGINT), "
        "CAST('0x' || b.simhash AS UBIGINT))) AS BIGINT) AS dist "
        "FROM sh a JOIN sh b ON a.doc_id < b.doc_id) "
        f"SELECT d1, d2, dist FROM pairs WHERE dist <= {max_dist}"
    )


ORACLE_SQL["simhash_near_pairs"] = _simhash_near_sql(3)
QUERIES["simhash_near_pairs"] = q_simhash_near_pairs


def q_schema_evolution(sf_dir: str):
    """Schema-evolution read: documents staged ONCE as two
    generations — v1 files (doc_id, text) and v2 files (doc_id, text,
    lang, n_chars:int32 — narrower than the live int64) — then read
    through `read_harmonized` against the current schema: v1 rows get
    NULL lang/n_chars, v2's int32 widens. Oracle = UNION ALL with the
    same NULL/CAST rules straight off the live table."""
    import pyarrow.parquet as pq_

    from .sources.ingest import read_harmonized
    from .state.lineage import publish_table, store_root

    label = os.path.basename(os.path.normpath(sf_dir))
    stage = os.path.join(store_root(),
                         f"ocr_ray_schemaevo_{os.getpid()}_{label}")
    v1 = os.path.join(stage, "v1.parquet")
    v2 = os.path.join(stage, "v2.parquet")
    if not (os.path.exists(v1) and os.path.exists(v2)):
        os.makedirs(stage, exist_ok=True)
        tbl = pq_.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang", "n_chars"])
        tbl = tbl.sort_by([("doc_id", "ascending")])
        half = tbl.num_rows // 2
        old = tbl.slice(0, half).select(["doc_id", "text"])
        new = tbl.slice(half)
        new = new.set_column(
            new.schema.get_field_index("n_chars"), "n_chars",
            new.column("n_chars").cast(pa.int32()))
        publish_table(old, v1)
        publish_table(new, v2)
    target = pa.schema([
        ("doc_id", pa.int64()), ("text", pa.string()),
        ("lang", pa.string()), ("n_chars", pa.int64()),
    ])
    return read_harmonized([[v1], [v2]], target)


ORACLE_SQL["schema_evolution"] = """
WITH ranked AS (
  SELECT doc_id, text, lang, n_chars,
         row_number() OVER (ORDER BY doc_id) - 1 AS rn,
         count(*) OVER () AS n
  FROM documents
)
SELECT doc_id, text, CAST(NULL AS VARCHAR) AS lang,
       CAST(NULL AS BIGINT) AS n_chars
FROM ranked WHERE rn < n // 2
UNION ALL
SELECT doc_id, text, lang, n_chars FROM ranked WHERE rn >= n // 2
"""
QUERIES["schema_evolution"] = q_schema_evolution


def q_deobfuscate(sf_dir: str):
    """Homoglyph de-obfuscation: Cyrillic look-alikes planted into
    every doc whose id % 4 == 0 ('a'→'а', 'e'→'е'); the cleaner must
    restore them (and leave pure-ASCII rows on the zero-copy path).
    Oracle: DuckDB translate() over the full confusable alphabet."""
    from .stages.normalize import CONFUSABLES, deobfuscate_fn

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        t = pc.fill_null(batch.column("text"), "")
        dirty = pc.replace_substring(
            pc.replace_substring(t, "a", "а"), "e", "е")
        text = pc.if_else(pc.equal(_int_mod(ids, 4), 0), dirty, t)
        return pa.table({"doc_id": ids, "text": text})

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow")
    out = ds.map_batches(deobfuscate_fn, batch_format="pyarrow")
    return out.select_columns(["doc_id", "text_clean"])


def _confusable_sql() -> str:
    from .stages.normalize import CONFUSABLES

    src = "".join(CONFUSABLES)
    dst = "".join(CONFUSABLES.values())
    return (
        "SELECT doc_id, translate(CASE WHEN doc_id % 4 = 0 THEN "
        "replace(replace(COALESCE(text, ''), 'a', 'а'), 'e', 'е') "
        f"ELSE COALESCE(text, '') END, '{src}', '{dst}') AS text_clean "
        "FROM documents"
    )


ORACLE_SQL["deobfuscate"] = _confusable_sql()
QUERIES["deobfuscate"] = q_deobfuscate


def q_lang_approx_quantiles(sf_dir: str):
    """Per-language n_chars quantile SKETCH (grouped fixed-bin
    histogram, driver-folded, no shuffle) — deterministic estimate
    pinned by the same-rule SQL twin."""
    from .stages.stats import grouped_binned_quantiles

    ds = _docs(sf_dir, columns=["lang", "n_chars"])
    return grouped_binned_quantiles(
        ds, "lang", "n_chars", qs=[0.25, 0.5, 0.9],
        lo=0, bin_width=100, n_bins=100)


ORACLE_SQL["lang_approx_quantiles"] = """
WITH h AS (
  SELECT lang, LEAST(GREATEST((n_chars - 0) // 100, 0), 99) AS b,
         count(*) AS n
  FROM documents
  WHERE n_chars IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2
), c AS (
  SELECT lang, b, CAST(sum(n) OVER (
      PARTITION BY lang ORDER BY b) AS BIGINT) AS cum FROM h
), tot AS (
  SELECT lang, max(cum) AS n FROM c GROUP BY lang
), qs AS (
  SELECT CAST(unnest([0.25, 0.5, 0.9]) AS DOUBLE) AS q
)
SELECT t.lang, q.q,
  CAST(((SELECT min(b) FROM c WHERE c.lang = t.lang AND cum >=
         GREATEST(CAST(ceil(q.q * t.n) AS BIGINT) - 1, 0) + 1) + 1)
       * 100 - 1 AS BIGINT) AS value_est
FROM tot t, qs q
"""
QUERIES["lang_approx_quantiles"] = q_lang_approx_quantiles


def q_crawl_depth(sf_dir: str):
    """BFS crawl-depth labeling over the formula link graph
    (src = doc_id % 200 → dst = doc_id*7 % 200) from seeds {0, 1};
    oracle = bounded recursive-CTE shortest hop count."""
    from .stages.graph import bfs_levels

    edges = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _formula_edges_fn, batch_format="pyarrow")
    return bfs_levels(edges, seeds=[0, 1], max_iters=6)


ORACLE_SQL["crawl_depth"] = """
WITH RECURSIVE e AS (
  SELECT doc_id % 200 AS src, (doc_id * 7) % 200 AS dst FROM documents
  UNION ALL
  SELECT doc_id % 200, (doc_id % 200 + 3) % 200 FROM documents
), walk(node, dist) AS (
  SELECT unnest([0, 1]) AS node, 0 AS dist
  UNION
  SELECT e.dst, w.dist + 1 FROM walk w
  JOIN e ON e.src = w.node WHERE w.dist < 6
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node
"""
QUERIES["crawl_depth"] = q_crawl_depth


def q_kcore(sf_dir: str):
    """Iterated 3-core pruning (3 fixed rounds) over the formula
    link graph; chained-CTE SQL twin replays the identical rounds."""
    from .stages.graph import kcore_prune

    edges = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _formula_edges_fn, batch_format="pyarrow")
    return kcore_prune(edges, k=3, rounds=3)


def _kcore_sql(k: int, rounds: int) -> str:
    parts = [
        "WITH raw AS (SELECT doc_id % 200 AS src, (doc_id * 7) % 200 "
        "AS dst FROM documents UNION ALL SELECT doc_id % 200, "
        "(doc_id % 200 + 3) % 200 FROM documents), "
        "e0 AS (SELECT DISTINCT least(src, dst) AS u, "
        "greatest(src, dst) AS v FROM raw WHERE src <> dst)"
    ]
    for i in range(rounds):
        parts.append(
            f"d{i} AS (SELECT node, count(*) AS deg FROM ("
            f"SELECT u AS node FROM e{i} UNION ALL "
            f"SELECT v FROM e{i}) GROUP BY node)")
        parts.append(
            f"s{i} AS (SELECT node FROM d{i} WHERE deg >= {k})")
        parts.append(
            f"e{i + 1} AS (SELECT e.u, e.v FROM e{i} e "
            f"JOIN s{i} a ON a.node = e.u "
            f"JOIN s{i} b ON b.node = e.v)")
    return (
        ", ".join(parts)
        + f" SELECT node, CAST(count(*) AS BIGINT) AS deg FROM ("
        f"SELECT u AS node FROM e{rounds} UNION ALL "
        f"SELECT v FROM e{rounds}) GROUP BY node"
    )


ORACLE_SQL["kcore"] = _kcore_sql(3, 3)
QUERIES["kcore"] = q_kcore


def q_curation_pipeline(sf_dir: str):
    """END-TO-END web-curation chain over the session-7 operators,
    oracle-checked as ONE result: per-host template removal (CCNet
    rule) → min-content gate (n_kept >= 2 — removes the docs whose
    only surviving line is their own text) → histogram-sketch RANGE
    sharding by cleaned length → (doc_id, n_kept, text_md5, shard).
    Every stage is load-bearing in the hash."""
    import numpy as np

    from .stages.bucketed import checkpoint_bucketed
    from .stages.dedup import host_boilerplate_removal
    from .stages.stats import range_partition

    sep = "<p>"
    aug = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        lambda b: _boilerplate_aug_fn(b, sep), batch_format="pyarrow")
    cleaned = host_boilerplate_removal(aug, sep=sep)
    gated = cleaned.filter(expr="n_kept >= 2")

    def _with_len(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "len_clean",
            pc.cast(pc.utf8_length(batch.column("text_clean")),
                    pa.int64()))

    # two consumers (sketch pass + shard map): checkpoint the cleaned
    # corpus to bucketed parquet instead of pinning it in the object
    # store
    staged = checkpoint_bucketed(
        gated.map_batches(_with_len, batch_format="pyarrow"),
        f"curation_{os.path.basename(os.path.normpath(sf_dir))}",
        key_col="doc_id")
    _assignments, splits = range_partition(
        staged, "len_clean", n_shards=4, lo=0, bin_width=100,
        n_bins=100)

    def _final(batch: pa.Table, *, _sp=splits) -> pa.Table:
        lens = batch.column("len_clean").combine_chunks().to_numpy(
            zero_copy_only=False)
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in batch.column("text_clean").to_pylist()]
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_kept": batch.column("n_kept"),
            "text_md5": pa.array(md5s, pa.string()),
            "shard": pa.array(
                np.searchsorted(_sp, lens, side="right").astype(
                    np.int64), pa.int64()),
        })

    return staged.map_batches(_final, batch_format="pyarrow")


ORACLE_SQL["curation_pipeline"] = (
    "WITH hb AS (" + ORACLE_SQL["host_boilerplate"] + "), "
    "gated AS (SELECT doc_id, text_clean, n_kept, "
    "length(text_clean) AS lc FROM hb WHERE n_kept >= 2), "
    "h AS (SELECT LEAST(GREATEST((lc - 0) // 100, 0), 99) AS b, "
    "count(*) AS n FROM gated GROUP BY 1), "
    "c AS (SELECT b, CAST(sum(n) OVER (ORDER BY b) AS BIGINT) AS cum "
    "FROM h), "
    "tot AS (SELECT max(cum) AS n FROM c), "
    "sp AS (SELECT ((SELECT min(b) FROM c WHERE cum >= "
    "GREATEST((i * tot.n + 3) // 4 - 1, 0) + 1) + 1) * 100 - 1 AS v "
    "FROM (SELECT unnest(generate_series(1, 3)) AS i), tot) "
    "SELECT doc_id, n_kept, md5(text_clean) AS text_md5, "
    "CAST((SELECT count(*) FROM sp WHERE gated.lc >= v) AS BIGINT) "
    "AS shard FROM gated"
)
QUERIES["curation_pipeline"] = q_curation_pipeline


def q_meta_extract(sf_dir: str):
    """HTML metadata extraction: title (entity decode load-bearing),
    meta description (both attribute orders), canonical link and
    og:title, with per-variant missing fields → NULL. Oracle derives
    every expected value from the planting formulas."""
    from .stages.web import meta_extract_fn

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        htmls = []
        for i in ids:
            v = i % 4
            title = f"T{i} &amp; Co" if v == 2 else f"T{i}"
            parts = [f"<html><head><title> {title} </title>"]
            if v == 0:
                parts.append(f'<meta name="description" content="D{i % 7}">')
            elif v == 2:
                parts.append(f'<meta content="D{i % 7}" name="description">')
            if v in (0, 1):
                parts.append(
                    f'<link rel="canonical" '
                    f'href="https://c{i % 5}.example.com/p">')
            if v in (0, 3):
                parts.append(f'<meta property="og:title" content="OG{i % 3}">')
            parts.append("</head><body><p>x</p></body></html>")
            htmls.append("".join(parts).encode("utf-8"))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(htmls, pa.binary()),
        })

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aug, batch_format="pyarrow")
    return pages.map_batches(meta_extract_fn, batch_format="pyarrow")


ORACLE_SQL["meta_extract"] = """
SELECT doc_id,
  'T' || CAST(doc_id AS VARCHAR)
    || CASE WHEN doc_id % 4 = 2 THEN ' & Co' ELSE '' END AS title,
  CASE WHEN doc_id % 4 IN (0, 2)
       THEN 'D' || CAST(doc_id % 7 AS VARCHAR) END AS description,
  CASE WHEN doc_id % 4 IN (0, 1)
       THEN 'https://c' || CAST(doc_id % 5 AS VARCHAR)
            || '.example.com/p' END AS canonical,
  CASE WHEN doc_id % 4 IN (0, 3)
       THEN 'OG' || CAST(doc_id % 3 AS VARCHAR) END AS og_title
FROM documents
"""
QUERIES["meta_extract"] = q_meta_extract


def q_html_tables(sf_dir: str):
    """Table extraction: formula-planted tables (doc_id % 3 tables of
    (1 + doc_id % 3) rows × (2 + doc_id % 2) cols; every 5th doc's
    cells wrap their text in an <a> tag — the strip is load-bearing);
    oracle regenerates every cell from the formulas."""
    from .stages.web import table_cells_fn

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        htmls = []
        for i in ids:
            n_t, n_r, n_c = i % 3, 1 + i % 3, 2 + i % 2
            parts = ["<html><body><p>text</p>"]
            for t in range(n_t):
                parts.append("<table>")
                for r in range(n_r):
                    parts.append("<tr>")
                    for c in range(n_c):
                        v = f"c{t}_{r}_{c}_{i % 10}"
                        if i % 5 == 0:
                            v = f'<a href="/x"> {v} </a>'
                        tag = "th" if r == 0 else "td"
                        parts.append(f"<{tag}>{v}</{tag}>")
                    parts.append("</tr>")
                parts.append("</table>")
            parts.append("</body></html>")
            htmls.append("".join(parts).encode("utf-8"))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "html": pa.array(htmls, pa.binary()),
        })

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aug, batch_format="pyarrow")
    return pages.map_batches(table_cells_fn, batch_format="pyarrow")


ORACLE_SQL["html_tables"] = """
SELECT d.doc_id, t.t AS tbl, r.r AS row, c.c AS col,
  'c' || CAST(t.t AS VARCHAR) || '_' || CAST(r.r AS VARCHAR)
    || '_' || CAST(c.c AS VARCHAR) || '_'
    || CAST(d.doc_id % 10 AS VARCHAR) AS cell
FROM documents d,
  LATERAL unnest(generate_series(0, d.doc_id % 3 - 1)) AS t(t),
  LATERAL unnest(generate_series(0, d.doc_id % 3)) AS r(r),
  LATERAL unnest(generate_series(0, 1 + d.doc_id % 2)) AS c(c)
"""
QUERIES["html_tables"] = q_html_tables


def q_url_path_rollup(sf_dir: str):
    """Path-hierarchy page counts over formula urls
    (host = doc_id % 10, two path segments from doc_id) at depths
    0..2; oracle regenerates each ancestor prefix row in SQL."""
    from .stages.web import url_path_rollup

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        h = pc.cast(_int_mod(ids, 10), pa.string())
        s1 = pc.cast(_int_mod(ids, 4), pa.string())
        s2 = pc.cast(ids, pa.string())
        url = pc.binary_join_element_wise(
            "https://h", h, ".example.com/sec", s1, "/p", s2, "")
        return pa.table({"url": url})

    pages = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aug, batch_format="pyarrow")
    return url_path_rollup(pages, max_depth=3)


ORACLE_SQL["url_path_rollup"] = """
WITH u AS (
  SELECT 'h' || CAST(doc_id % 10 AS VARCHAR) || '.example.com' AS host,
         'sec' || CAST(doc_id % 4 AS VARCHAR) AS s1,
         'p' || CAST(doc_id AS VARCHAR) AS s2
  FROM documents
), expanded AS (
  SELECT host AS prefix, 0 AS depth FROM u
  UNION ALL
  SELECT host || '/' || s1, 1 FROM u
  UNION ALL
  SELECT host || '/' || s1 || '/' || s2, 2 FROM u
)
SELECT prefix, CAST(depth AS BIGINT) AS depth,
       CAST(count(*) AS BIGINT) AS n_pages
FROM expanded GROUP BY prefix, depth
"""
QUERIES["url_path_rollup"] = q_url_path_rollup


# (b=3 × r=2) banded minhash: h0..h3 are the four chunks of md5(s)
# (identical to SIG_FRAGMENT); h4..h5 come from the salt-1 digest
# md5('1:' || s) — mirrors stages/dedup.minhash_signature_salted.
# A band matches when BOTH its r=2 hashes agree.
ORACLE_SQL["minhash_banded_pairs"] = (
    "WITH " + SHINGLE_CTE + ", "
    "sig AS (SELECT doc_id, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 1, 8))) AS h0, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 9, 8))) AS h1, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 17, 8))) AS h2, "
    "list_min(list_transform(shingles, s -> substr(md5(s), 25, 8))) AS h3, "
    "list_min(list_transform(shingles, "
    "s -> substr(md5('1:' || s), 1, 8))) AS h4, "
    "list_min(list_transform(shingles, "
    "s -> substr(md5('1:' || s), 9, 8))) AS h5 "
    "FROM sh) "
    "SELECT d1, d2 FROM ("
    "SELECT a.doc_id AS d1, b.doc_id AS d2 FROM sig a JOIN sig b "
    "ON a.h0 = b.h0 AND a.h1 = b.h1 AND a.doc_id < b.doc_id "
    "UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b "
    "ON a.h2 = b.h2 AND a.h3 = b.h3 AND a.doc_id < b.doc_id "
    "UNION SELECT a.doc_id, b.doc_id FROM sig a JOIN sig b "
    "ON a.h4 = b.h4 AND a.h5 = b.h5 AND a.doc_id < b.doc_id)"
)
QUERIES["minhash_banded_pairs"] = q_minhash_banded_pairs

# dictionary_tag: per-term OVERLAPPING occurrence counts — every
# char offset i where the phrase starts. No dictionary phrase is a
# prefix of another (see TAG_TERMS), so no tiebreak term is needed.
ORACLE_SQL["dictionary_tag"] = "WITH hits AS (" + " UNION ALL ".join(
    "SELECT doc_id, '" + t + "' AS term, "
    "CAST(len(list_filter(generate_series(1, len(text) - "
    + str(len(t)) + " + 1), i -> substr(text, i, " + str(len(t))
    + ") = '" + t + "')) AS BIGINT) AS n_hits FROM documents"
    for t in TAG_TERMS
) + ") SELECT doc_id, term, n_hits FROM hits WHERE n_hits > 0"
QUERIES["dictionary_tag"] = q_dictionary_tag


# prefix-fingerprint dup groups: md5 of the first-32-token join;
# toks[1:32] clamps for shorter docs (prefix == full text there)
ORACLE_SQL["prefix_dup"] = (
    "WITH t AS (SELECT doc_id, "
    "md5(array_to_string("
    "string_split(coalesce(text, ''), ' ')[1:32], ' ')) AS pfp "
    "FROM documents) "
    "SELECT pfp, CAST(min(doc_id) AS BIGINT) AS keep_id, "
    "CAST(count(*) AS BIGINT) AS n_docs FROM t "
    "GROUP BY pfp HAVING count(*) > 1"
)
QUERIES["prefix_dup"] = q_prefix_dup

# char-level Shannon entropy, both sides rounded to the 1e-6 grid
# (summation order differs; the grid absorbs last-ulp noise)
ORACLE_SQL["char_entropy"] = (
    "WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch "
    "FROM documents WHERE len(coalesce(text, '')) > 0), "
    "cc AS (SELECT doc_id, ch, count(*) AS n FROM c GROUP BY doc_id, ch), "
    "tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS nn FROM cc "
    "GROUP BY doc_id) "
    "SELECT cc.doc_id, CAST(max(nn) AS BIGINT) AS n_chars, "
    "floor(-sum((n / CAST(nn AS DOUBLE)) * ln(n / CAST(nn AS DOUBLE))) "
    "* 1000000.0 + 0.5) / 1000000.0 AS char_entropy "
    "FROM cc JOIN tot USING (doc_id) GROUP BY cc.doc_id"
)
QUERIES["char_entropy"] = q_char_entropy

# OOV rate vs the corpus top-100 vocab (count desc, token asc ties)
ORACLE_SQL["oov_rate"] = (
    "WITH tok AS (SELECT doc_id, "
    "unnest(string_split(coalesce(text, ''), ' ')) AS t "
    "FROM documents), "
    "vocab AS (SELECT t FROM tok GROUP BY t "
    "QUALIFY row_number() OVER (ORDER BY count(*) DESC, t) <= 100), "
    "flags AS (SELECT doc_id, CAST(t IN (SELECT t FROM vocab) AS INT) "
    "AS in_v FROM tok) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
    "CAST(count(*) - sum(in_v) AS BIGINT) AS n_oov, "
    "CAST(count(*) - sum(in_v) AS DOUBLE) / count(*) AS oov_rate "
    "FROM flags GROUP BY doc_id"
)
QUERIES["oov_rate"] = q_oov_rate


def q_events_by_type_adaptive(sf_dir: str):
    """ADAPTIVE salted aggregate: per-key salt fan-out measured from
    a deterministic plan-time sample (only hot keys salt; cold keys
    skip the fan-out the fixed-salt shape pays everywhere). Values
    identical to the plain groupby — the sample tunes the plan."""
    from .stages.stats import adaptive_salted_agg

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "user_id", "value"])
    plan = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    # tiny target so the sample actually classifies keys as hot at
    # test scale (every event_type is hot here — mirrors the salted
    # query's premise)
    return adaptive_salted_agg(
        ds, "event_type", "value", "user_id",
        target_per_reducer=200, plan_ds=plan)


ORACLE_SQL["events_by_type_adaptive"] = ORACLE_SQL["events_by_type_salted"]
QUERIES["events_by_type_adaptive"] = q_events_by_type_adaptive


def q_sparse_cosine_pairs(sf_dir: str):
    """Weighted sparse cosine self-join over 3-shingle count vectors
    (postings-based all-pairs; repetition-sensitive, unlike the
    set-Jaccard twin). df > 1000 terms excluded by operator
    semantics, mirrored in the SQL twin."""
    from .stages.dedup import sparse_cosine_pairs

    return sparse_cosine_pairs(
        _docs(sf_dir, columns=["doc_id", "text"]),
        k=3, threshold=0.8, df_cap=1000)


ORACLE_SQL["sparse_cosine_pairs"] = (
    "WITH " + SHINGLE_CTE + ", "
    "u AS (SELECT doc_id, unnest(shingles) AS term FROM sh), "
    "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
    "FROM u GROUP BY doc_id, term), "
    "nrm AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nsq "
    "FROM tf GROUP BY doc_id), "
    "keepterms AS (SELECT term FROM tf GROUP BY term "
    "HAVING count(*) <= 1000), "
    "p AS (SELECT a.doc_id AS d1, b.doc_id AS d2, "
    "CAST(sum(a.tf * b.tf) AS BIGINT) AS dot "
    "FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id "
    "JOIN keepterms kt ON kt.term = a.term GROUP BY 1, 2) "
    "SELECT d1, d2, floor(dot / (sqrt(na.nsq) * sqrt(nb.nsq)) "
    "* 1000000.0 + 0.5) / 1000000.0 AS cosine "
    "FROM p JOIN nrm na ON na.doc_id = p.d1 "
    "JOIN nrm nb ON nb.doc_id = p.d2 "
    "WHERE dot / (sqrt(na.nsq) * sqrt(nb.nsq)) >= 0.8"
)
QUERIES["sparse_cosine_pairs"] = q_sparse_cosine_pairs


def q_rarity_dispersion(sf_dir: str):
    """Second-moment rarity: per-doc variance of token document
    frequency (MGT/template "burstiness" heuristic — narrow-band
    frequency profiles score low at a given mean). Same plan as
    token_rarity + one extra int64 partial."""
    from .stages.textstats import rarity_dispersion

    return rarity_dispersion(_docs(sf_dir, columns=["doc_id", "text"]))


ORACLE_SQL["rarity_dispersion"] = (
    "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) "
    "AS tok FROM documents WHERE text IS NOT NULL), "
    "tf AS (SELECT doc_id, tok, count(*) AS tf FROM t "
    "GROUP BY doc_id, tok), "
    "df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok) "
    "SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
    "CAST(sum(tf.tf * df.df) AS DOUBLE) / CAST(sum(tf.tf) AS BIGINT) "
    "AS mean_df, "
    "CAST(sum(tf.tf * df.df * df.df) AS DOUBLE) / "
    "CAST(sum(tf.tf) AS BIGINT) - "
    "(CAST(sum(tf.tf * df.df) AS DOUBLE) / CAST(sum(tf.tf) AS BIGINT)) "
    "* (CAST(sum(tf.tf * df.df) AS DOUBLE) / CAST(sum(tf.tf) AS BIGINT)) "
    "AS var_df "
    "FROM tf JOIN df USING (tok) GROUP BY tf.doc_id"
)
QUERIES["rarity_dispersion"] = q_rarity_dispersion


def q_paragraph_lang_mix(sf_dir: str):
    """Paragraph-level code-switching detection (CCNet runs lang-ID
    per paragraph): docs augmented with a second paragraph in a
    rotating language + an unk-profile third, then one row-local
    vectorized pass computes per-doc paragraph-language mixing."""
    from .stages.textstats import paragraph_lang_mix_fn

    sep = "\n\n"

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        second = pc.if_else(
            pc.equal(_int_mod(ids, 3), pa.scalar(0, pa.int64())),
            pa.scalar("der die das und"), pa.scalar("the a the"))
        t = pc.binary_join_element_wise(
            pc.fill_null(batch.column("text"), ""), sep,
            second, sep, "keine stopwords hier", "",
        )
        return pa.table({"doc_id": ids, "text": t})

    aug = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _aug, batch_format="pyarrow")
    return aug.map_batches(
        paragraph_lang_mix_fn, batch_format="pyarrow",
        fn_kwargs={"sep": sep})


ORACLE_SQL["paragraph_lang_mix"] = (
    "WITH aug AS (SELECT doc_id, coalesce(text, '') || chr(10) || "
    "chr(10) || CASE WHEN doc_id % 3 = 0 THEN 'der die das und' "
    "ELSE 'the a the' END || chr(10) || chr(10) || "
    "'keine stopwords hier' AS text FROM documents), "
    "p AS (SELECT doc_id, unnest(string_split(text, "
    "chr(10) || chr(10))) AS para FROM aug), "
    "sc AS (SELECT doc_id, "
    "len(list_filter(string_split(para, ' '), "
    "x -> x = 'the' OR x = 'a')) AS s_en, "
    "len(list_filter(string_split(para, ' '), "
    "x -> x = 'der' OR x = 'die' OR x = 'das' OR x = 'und')) AS s_de "
    "FROM p), "
    "l AS (SELECT doc_id, CASE WHEN s_en > s_de THEN 'en' "
    "WHEN s_de > s_en THEN 'de' ELSE 'unk' END AS lp FROM sc), "
    "c AS (SELECT doc_id, lp, count(*) AS n FROM l GROUP BY doc_id, lp), "
    "sel AS (SELECT doc_id, lp AS major_lang, n AS maj_n FROM c "
    "QUALIFY row_number() OVER (PARTITION BY doc_id "
    "ORDER BY n DESC, lp) = 1), "
    "tot AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_paras, "
    "CAST(count(*) AS BIGINT) AS n_langs FROM c GROUP BY doc_id) "
    "SELECT tot.doc_id, n_paras, n_langs, major_lang, "
    "1.0 - CAST(maj_n AS DOUBLE) / n_paras AS mix_frac "
    "FROM tot JOIN sel ON sel.doc_id = tot.doc_id"
)
QUERIES["paragraph_lang_mix"] = q_paragraph_lang_mix


def q_zorder_scan(sf_dir: str):
    """Z-ORDER clustered layout + 2-D zone-map pruning: documents are
    staged ONCE into 16 files clustered by the Morton interleave of
    (doc_id, n_chars) (`stages/bucketed.zorder_key` — the lakehouse
    OPTIMIZE ZORDER BY layout), then a conjunctive 2-D range scan
    (`pruned_read_multi`) consults the footer-stats manifest for BOTH
    columns and reads only files whose (doc_id × n_chars) rectangle
    intersects the predicate box. A 1-D sorted layout can prune only
    its sort column; pytest pins that the Z layout skips strictly
    more files on the same box. The oracle is the plain 2-D BETWEEN —
    pruning must never change results."""
    import numpy as np
    import pyarrow.parquet as pq_

    from .stages.bucketed import pruned_read_multi, zorder_key
    from .state.lineage import publish_table, store_root

    label = os.path.basename(os.path.normpath(sf_dir))
    stage = os.path.join(store_root(),
                         f"ocr_ray_zorder_{os.getpid()}_{label}")
    paths = [os.path.join(stage, f"part-{i:02d}.parquet")
             for i in range(16)]
    if not all(os.path.exists(p) for p in paths):
        os.makedirs(stage, exist_ok=True)
        tbl = pq_.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id", "n_chars"])
        z = zorder_key(tbl.column("doc_id").to_numpy(),
                       tbl.column("n_chars").to_numpy())
        tbl = tbl.take(pa.array(np.argsort(z, kind="stable")))
        n = tbl.num_rows
        cuts = [n * i // 16 for i in range(17)]
        for i, p in enumerate(paths):
            publish_table(tbl.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
    ds, _n_read, _n_skipped = pruned_read_multi(
        paths, {"doc_id": (100, 249), "n_chars": (150, 400)},
        columns=["doc_id", "n_chars"])
    if ds is None:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "n_chars": pa.array([], pa.int64())})
    return ds


ORACLE_SQL["zorder_scan"] = (
    "SELECT doc_id, n_chars FROM documents "
    "WHERE doc_id BETWEEN 100 AND 249 "
    "AND n_chars BETWEEN 150 AND 400"
)
QUERIES["zorder_scan"] = q_zorder_scan


def q_stitch_pairs(sf_dir: str):
    """Paginated-crawl stitching (stages/dedup.stitch_pairs): pairs
    whose k=3-token seam matches (tail of A == head of B) — the
    split-article reassembly signal both exact and near dedup miss.
    The corpus is deterministically augmented so every ``doc_id % 10
    == 1`` doc's tail continues into ``doc_id + 1`` (seam tokens
    carry the pair id); the oracle replays the augmentation and joins
    head/tail slices directly."""
    from .stages.dedup import stitch_pairs

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            t = t or ""
            if i % 10 == 1:
                t = f"{t} stitch pg{i} marker"
            elif i % 10 == 2:
                t = f"stitch pg{i - 1} marker {t}"
            out.append(t)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out, pa.string()),
        })

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _aug, batch_format="pyarrow")
    return stitch_pairs(ds, k=3).sort(["a_id", "b_id"])


ORACLE_SQL["stitch_pairs"] = (
    "WITH aug AS (SELECT doc_id, CASE "
    "WHEN doc_id % 10 = 1 THEN coalesce(text, '') || ' stitch pg' || "
    "CAST(doc_id AS VARCHAR) || ' marker' "
    "WHEN doc_id % 10 = 2 THEN 'stitch pg' || "
    "CAST(doc_id - 1 AS VARCHAR) || ' marker ' || coalesce(text, '') "
    "ELSE coalesce(text, '') END AS text FROM documents), "
    "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM aug), "
    "ht AS (SELECT doc_id, array_to_string(toks[1:3], ' ') AS head, "
    "array_to_string(toks[-3:], ' ') AS tail FROM t "
    "WHERE len(toks) >= 3) "
    "SELECT a.doc_id AS a_id, b.doc_id AS b_id "
    "FROM ht a JOIN ht b ON a.tail = b.head AND a.doc_id <> b.doc_id"
)
QUERIES["stitch_pairs"] = q_stitch_pairs


def q_user_skyline(sf_dir: str):
    """Pareto-frontier user selection (stages/stats.skyline_2d —
    SKYLINE OF n_rows MAX, n_distinct MAX, Börzsönyi ICDE'01): users
    not dominated on BOTH activity axes. Points come from ONE
    (user, type, n) partial co-shuffle
    (stats.grouped_count_and_distinct); the skyline itself is
    map-side local frontiers + one frontier-scale final pass."""
    from .stages.stats import grouped_count_and_distinct, skyline_2d

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    pts = grouped_count_and_distinct(ev, "user_id", "event_type")
    return skyline_2d(pts, "n_rows", "n_distinct").sort("user_id")


ORACLE_SQL["user_skyline"] = (
    "WITH pts AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows, "
    "CAST(count(DISTINCT event_type) AS BIGINT) AS n_distinct "
    "FROM events GROUP BY user_id) "
    "SELECT user_id, n_rows, n_distinct FROM pts q "
    "WHERE NOT EXISTS (SELECT 1 FROM pts p "
    "WHERE p.n_rows >= q.n_rows AND p.n_distinct >= q.n_distinct "
    "AND (p.n_rows > q.n_rows OR p.n_distinct > q.n_distinct)) "
    "ORDER BY user_id"
)
QUERIES["user_skyline"] = q_user_skyline


def q_events_trend(sf_dir: str):
    """Per-type value trend over crawl time (stages/stats.grouped_ols
    — the SQL regr_slope/regr_intercept pair from one
    sufficient-statistic pass): x = day index since 2024-01-01 (small
    ints by design — the normal-equation form is shift-invariant, so
    shift), y = value. Compared on the repo-wide 1e-6 grid like
    events_value_corr."""
    from .stages.stats import grouped_ols

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts", "value"])

    def _day(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64())
        day = pc.subtract(
            pc.divide(us, pa.scalar(86_400_000_000, pa.int64())),
            pa.scalar(19723, pa.int64()))
        return pa.table({
            "event_type": batch.column("event_type"),
            "day": day,
            "value": batch.column("value"),
        })

    out = grouped_ols(
        ds.map_batches(_day, batch_format="pyarrow"),
        "event_type", "day", "value")

    def _grid(batch: pa.Table) -> pa.Table:
        def _r6(col):
            return pc.divide(
                pc.floor(pc.add(pc.multiply(col, 1e6), 0.5)), 1e6)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "slope": _r6(batch.column("slope")),
            "intercept": _r6(batch.column("intercept")),
        })

    return out.map_batches(_grid, batch_format="pyarrow").sort(
        "event_type")


ORACLE_SQL["events_trend"] = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "FLOOR(regr_slope(value, "
    "CAST(floor(epoch(ts) / 86400) AS BIGINT) - 19723) * 1e6 + 0.5) "
    "/ 1e6 AS slope, "
    "FLOOR(regr_intercept(value, "
    "CAST(floor(epoch(ts) / 86400) AS BIGINT) - 19723) * 1e6 + 0.5) "
    "/ 1e6 AS intercept "
    "FROM events GROUP BY event_type ORDER BY event_type"
)
QUERIES["events_trend"] = q_events_trend


def q_mutual_nn_pairs(sf_dir: str):
    """Reciprocal cosine-NN pairs between the even- and odd-id halves
    of the embeddings table (stages/similarity.mutual_nn_pairs — the
    bitext-mining hub filter). Block-pair matmul fan-out with local
    argmax partials, grid-quantized BEFORE argmax so tie-breaks are
    SQL-replicable; the oracle is the double QUALIFY row_number twin
    over list_cosine_similarity."""
    from .stages.similarity import mutual_nn_pairs

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    def _half(parity: int):
        def _f(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id")
            return batch.filter(pc.equal(
                pc.bit_wise_and(ids, pa.scalar(1, pa.int64())),
                pa.scalar(parity, pa.int64())))
        return _f

    ds_a = emb.map_batches(_half(0), batch_format="pyarrow")
    ds_b = emb.map_batches(_half(1), batch_format="pyarrow")
    return mutual_nn_pairs(ds_a, ds_b, max_blocks=8).sort("a_id")


ORACLE_SQL["mutual_nn_pairs"] = (
    "WITH a AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
    "FROM embeddings WHERE vec_id % 2 = 0), "
    "b AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
    "FROM embeddings WHERE vec_id % 2 = 1), "
    "s AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id, "
    "CAST(FLOOR(list_cosine_similarity(a.v, b.v) * 1e6 + 0.5) "
    "AS BIGINT) AS sq FROM a, b), "
    "na AS (SELECT a_id, b_id, sq FROM s QUALIFY row_number() OVER "
    "(PARTITION BY a_id ORDER BY sq DESC, b_id ASC) = 1), "
    "nb AS (SELECT a_id, b_id FROM s QUALIFY row_number() OVER "
    "(PARTITION BY b_id ORDER BY sq DESC, a_id ASC) = 1) "
    "SELECT na.a_id, na.b_id, CAST(na.sq AS DOUBLE) / 1e6 AS sim "
    "FROM na JOIN nb ON na.a_id = nb.a_id AND na.b_id = nb.b_id "
    "ORDER BY na.a_id"
)
QUERIES["mutual_nn_pairs"] = q_mutual_nn_pairs


def q_golden_record(sf_dir: str):
    """MDM golden-record survivorship (stages/temporal.golden_record):
    per user, each field keeps the value of its LATEST non-null row
    by (ts, event_id) — fields survive independently (deterministic
    CDC sparsity: event_type nulled when event_id % 7 == 0, value
    when event_id % 5 == 0, so the survivors come from DIFFERENT
    rows). One user co-shuffle, boundary-mask + reduceat bucket UDF."""
    from .stages.temporal import golden_record

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type", "value"])

    def _sparsify(batch: pa.Table) -> pa.Table:
        eid = batch.column("event_id")
        et_null = pc.equal(_int_mod(eid, 7), 0)
        v_null = pc.equal(_int_mod(eid, 5), 0)
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": eid,
            "event_type": pc.if_else(
                et_null, pa.scalar(None, pa.string()),
                batch.column("event_type")),
            "value": pc.if_else(
                v_null, pa.scalar(None, pa.float64()),
                batch.column("value")),
        })

    return golden_record(
        ds.map_batches(_sparsify, batch_format="pyarrow"),
        "user_id", ["ts", "event_id"], ["event_type", "value"],
    ).sort("user_id")


ORACLE_SQL["golden_record"] = (
    "WITH aug AS (SELECT user_id, ts, event_id, "
    "CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END "
    "AS event_type, "
    "CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS value "
    "FROM events), "
    "base AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_rows, "
    "min(ts) AS first_ts, max(ts) AS last_ts FROM aug "
    "GROUP BY user_id), "
    "lt AS (SELECT user_id, event_type AS last_event_type FROM aug "
    "WHERE event_type IS NOT NULL QUALIFY row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1), "
    "lv AS (SELECT user_id, value AS last_value FROM aug "
    "WHERE value IS NOT NULL QUALIFY row_number() OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1) "
    "SELECT base.user_id, n_rows, first_ts, last_ts, "
    "lt.last_event_type, lv.last_value "
    "FROM base LEFT JOIN lt USING (user_id) "
    "LEFT JOIN lv USING (user_id) ORDER BY user_id"
)
QUERIES["golden_record"] = q_golden_record


def q_rendezvous_shards(sf_dir: str):
    """Rendezvous (HRW) shard placement
    (functions/hashing.rendezvous_pick): every doc picks
    argmax_node md5(key|node) under a 5-node cluster and again under
    6 nodes — the minimal-movement property is exposed as a ``moved``
    column (pytest pins that every moved doc moved TO the new node;
    the oracle replays both argmaxes). Map-only, row-local: shard
    placement at 100 TB needs no directory and no shuffle."""
    from .functions.hashing import rendezvous_pick

    nodes5 = [f"node-{c}" for c in "abcde"]
    nodes6 = nodes5 + ["node-f"]

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        n5 = rendezvous_pick(ids, nodes5)
        n6 = rendezvous_pick(ids, nodes6)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "node5": pa.array(n5, pa.string()),
            "node6": pa.array(n6, pa.string()),
            "moved": pa.array([a != b for a, b in zip(n5, n6)],
                              pa.bool_()),
        })

    return _docs(sf_dir, columns=["doc_id"]).map_batches(
        _assign, batch_format="pyarrow").sort("doc_id")


_RVZ_W = ("CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' "
          "|| n.node), 1, 16)) AS UBIGINT)")
ORACLE_SQL["rendezvous_shards"] = (
    "WITH n5 AS (SELECT unnest(['node-a','node-b','node-c','node-d',"
    "'node-e']) AS node), "
    "n6 AS (SELECT unnest(['node-a','node-b','node-c','node-d',"
    "'node-e','node-f']) AS node), "
    "a5 AS (SELECT d.doc_id, n.node AS node5 FROM documents d, n5 n "
    f"QUALIFY row_number() OVER (PARTITION BY d.doc_id ORDER BY "
    f"{_RVZ_W} DESC, n.node ASC) = 1), "
    "a6 AS (SELECT d.doc_id, n.node AS node6 FROM documents d, n6 n "
    f"QUALIFY row_number() OVER (PARTITION BY d.doc_id ORDER BY "
    f"{_RVZ_W} DESC, n.node ASC) = 1) "
    "SELECT a5.doc_id, node5, node6, node5 <> node6 AS moved "
    "FROM a5 JOIN a6 USING (doc_id) ORDER BY doc_id"
)
QUERIES["rendezvous_shards"] = q_rendezvous_shards


def q_url_features(sf_dir: str):
    """URL-only spam/quality features (stages/web.url_features_fn):
    length, host length, path depth, digit density, query-param
    count — the crawl-frontier classifier inputs, computed before
    any fetch. Urls are the skewed synthetic crawl's, deterministically
    extended so deep paths (doc_id % 5 == 2) and query strings
    (doc_id % 4 == 1) both occur; the oracle rebuilds the same urls
    and derives every feature with string arithmetic."""
    from .stages.web import url_features_fn

    def _extend(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        url = batch.column("url")
        deep = pc.equal(_int_mod(ids, 5), 2)
        url = pc.if_else(
            deep,
            pc.binary_join_element_wise(url, "/long/tail/seg", ""),
            url)
        q = pc.equal(_int_mod(ids, 4), 1)
        url = pc.if_else(
            q,
            pc.binary_join_element_wise(
                url, "?utm_source=feed&ref=rss", ""),
            url)
        return pa.table({"doc_id": ids, "url": url})

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(_extend, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: url_features_fn(b), batch_format="pyarrow"
    ).select_columns(["doc_id", "url_len", "host_len", "path_depth",
                      "n_digits", "n_params"]).sort("doc_id")


ORACLE_SQL["url_features"] = (
    "WITH u AS (SELECT doc_id, 'http://host' || CAST("
    + _HOST_ID_SQL + " AS VARCHAR) || '.example.com/p/' || "
    "CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 5 = 2 THEN '/long/tail/seg' ELSE '' END || "
    "CASE WHEN doc_id % 4 = 1 THEN '?utm_source=feed&ref=rss' "
    "ELSE '' END AS url FROM documents), "
    "b AS (SELECT doc_id, url, string_split(url, '?')[1] AS base "
    "FROM u) "
    "SELECT doc_id, CAST(length(url) AS BIGINT) AS url_len, "
    "CAST(length(string_split(base, '/')[3]) AS BIGINT) AS host_len, "
    "CAST(length(base) - length(replace(base, '/', '')) - 2 "
    "AS BIGINT) AS path_depth, "
    "CAST(length(regexp_replace(url, '[^0-9]', '', 'g')) AS BIGINT) "
    "AS n_digits, "
    "CAST(CASE WHEN contains(url, '?') THEN length(url) - "
    "length(replace(url, '&', '')) + 1 ELSE 0 END AS BIGINT) "
    "AS n_params "
    "FROM b ORDER BY doc_id"
)
QUERIES["url_features"] = q_url_features


def q_communities(sf_dir: str):
    """Label-propagation communities (stages/graph.label_propagation,
    2 synchronous rounds, smallest-label ties) over the same
    deterministic synthetic link graph as q_pagerank — the density
    clustering that connected components can't express (one bridge
    edge merges components but not communities). Two exchanges per
    round; the oracle replays both rounds as chained CTEs."""
    import numpy as np

    from .stages.graph import label_propagation

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        m1, m2 = ids % 3 >= 1, ids % 3 == 2
        src = np.concatenate([ids, ids[m1], ids[m2]])
        dst = np.concatenate([(ids * 7 + 1) % n,
                              (ids[m1] * 13 + 2) % n,
                              (ids[m2] * 29 + 5) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def _as_node(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id")})

    labels = label_propagation(
        docs.map_batches(_as_node, batch_format="pyarrow"),
        docs.map_batches(_edges, batch_format="pyarrow"),
        rounds=2)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "community": batch.column("label")})

    return labels.map_batches(_rename, batch_format="pyarrow").sort(
        "doc_id")


ORACLE_SQL["communities"] = (
    "WITH nn AS (SELECT count(*) AS c FROM documents), "
    "nodes AS (SELECT doc_id AS node FROM documents), "
    "e AS (SELECT node AS src, (node*7+1) % nn.c AS dst "
    "FROM nodes, nn "
    "UNION ALL SELECT node, (node*13+2) % nn.c FROM nodes, nn "
    "WHERE node % 3 >= 1 "
    "UNION ALL SELECT node, (node*29+5) % nn.c FROM nodes, nn "
    "WHERE node % 3 = 2), "
    "sym AS (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e), "
    "l0 AS (SELECT node, node AS lbl FROM nodes), "
    "m1 AS (SELECT s.dst AS node, l.lbl, count(*) AS c FROM sym s "
    "JOIN l0 l ON l.node = s.src GROUP BY 1, 2), "
    "w1 AS (SELECT node, lbl FROM m1 QUALIFY row_number() OVER "
    "(PARTITION BY node ORDER BY c DESC, lbl ASC) = 1), "
    "l1 AS (SELECT l.node, COALESCE(w.lbl, l.lbl) AS lbl FROM l0 l "
    "LEFT JOIN w1 w ON w.node = l.node), "
    "m2 AS (SELECT s.dst AS node, l.lbl, count(*) AS c FROM sym s "
    "JOIN l1 l ON l.node = s.src GROUP BY 1, 2), "
    "w2 AS (SELECT node, lbl FROM m2 QUALIFY row_number() OVER "
    "(PARTITION BY node ORDER BY c DESC, lbl ASC) = 1), "
    "l2 AS (SELECT l.node, COALESCE(w.lbl, l.lbl) AS lbl FROM l1 l "
    "LEFT JOIN w2 w ON w.node = l.node) "
    "SELECT node AS doc_id, CAST(lbl AS BIGINT) AS community "
    "FROM l2 ORDER BY node"
)
QUERIES["communities"] = q_communities


def q_filter_cascade(sf_dir: str):
    """Curation filter-funnel audit (stages/profile.filter_cascade):
    per-gate n_in/n_kept with first-fail attribution over a 3-gate
    cascade (language allowlist → min chars → min tokens) — one
    streaming pass, (k+1)-row partials, no data shuffle. The oracle
    reproduces the funnel with a first-fail CASE + window-free
    count arithmetic."""
    from .stages.profile import filter_cascade

    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars", "text"])

    def _lang(batch):
        return pc.is_in(
            batch.column("lang"),
            value_set=pa.array(["en", "de", "fr"])
        ).to_numpy(zero_copy_only=False)

    def _chars(batch):
        return pc.greater_equal(
            batch.column("n_chars"), 120
        ).to_numpy(zero_copy_only=False)

    def _tokens(batch):
        n_tok = pc.add(pc.count_substring(
            batch.column("text"), " "), 1)
        return pc.greater_equal(n_tok, 25).to_numpy(
            zero_copy_only=False)

    return filter_cascade(ds, [
        ("lang_gate", _lang),
        ("min_chars", _chars),
        ("min_tokens", _tokens),
    ])


ORACLE_SQL["filter_cascade"] = (
    "WITH ff AS (SELECT CASE "
    "WHEN NOT (lang IN ('en', 'de', 'fr')) THEN 0 "
    "WHEN NOT (n_chars >= 120) THEN 1 "
    "WHEN NOT (len(string_split(text, ' ')) >= 25) THEN 2 "
    "ELSE 3 END AS f FROM documents), "
    "c AS (SELECT f, CAST(count(*) AS BIGINT) AS n FROM ff "
    "GROUP BY 1), "
    "tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM documents), "
    "s AS (SELECT unnest(generate_series(0, 2)) AS stage) "
    "SELECT CAST(s.stage AS BIGINT) AS stage, "
    "CASE s.stage WHEN 0 THEN 'lang_gate' WHEN 1 THEN 'min_chars' "
    "ELSE 'min_tokens' END AS stage_name, "
    "CAST(tot.t - COALESCE((SELECT sum(n) FROM c "
    "WHERE f < s.stage), 0) AS BIGINT) AS n_in, "
    "CAST(tot.t - COALESCE((SELECT sum(n) FROM c "
    "WHERE f <= s.stage), 0) AS BIGINT) AS n_kept "
    "FROM s, tot ORDER BY s.stage"
)
QUERIES["filter_cascade"] = q_filter_cascade


def q_coreset_select(sf_dir: str):
    """Greedy k-center coreset (stages/similarity.kcenter_select,
    k=4, Gonzalez farthest-point): diverse exemplar selection over
    the embeddings table. Per round one broadcast-centers map scan
    emits block-local candidates; sims grid-quantized BEFORE
    min/argmax so the greedy trajectory is bit-deterministic; the
    oracle replays all rounds as chained GREATEST CTEs."""
    from .stages.similarity import kcenter_select

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    return kcenter_select(emb, k=4)


_KC_SIM = ("CAST(FLOOR(list_cosine_similarity(e.v, {c}.v) * 1e6 "
           "+ 0.5) AS BIGINT)")
ORACLE_SQL["coreset_select"] = (
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v "
    "FROM embeddings), "
    "c0 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1), "
    "s1 AS (SELECT e.vec_id AS id, " + _KC_SIM.format(c="c0")
    + " AS m FROM e, c0 WHERE e.vec_id <> c0.vec_id), "
    "p1 AS (SELECT id FROM s1 ORDER BY m ASC, id ASC LIMIT 1), "
    "c1 AS (SELECT e.vec_id, e.v FROM e JOIN p1 ON e.vec_id = p1.id), "
    "s2 AS (SELECT e.vec_id AS id, GREATEST("
    + _KC_SIM.format(c="c0") + ", " + _KC_SIM.format(c="c1")
    + ") AS m FROM e, c0, c1 "
    "WHERE e.vec_id NOT IN (c0.vec_id, c1.vec_id)), "
    "p2 AS (SELECT id FROM s2 ORDER BY m ASC, id ASC LIMIT 1), "
    "c2 AS (SELECT e.vec_id, e.v FROM e JOIN p2 ON e.vec_id = p2.id), "
    "s3 AS (SELECT e.vec_id AS id, GREATEST("
    + _KC_SIM.format(c="c0") + ", " + _KC_SIM.format(c="c1") + ", "
    + _KC_SIM.format(c="c2")
    + ") AS m FROM e, c0, c1, c2 "
    "WHERE e.vec_id NOT IN (c0.vec_id, c1.vec_id, c2.vec_id)), "
    "p3 AS (SELECT id FROM s3 ORDER BY m ASC, id ASC LIMIT 1), "
    "c3 AS (SELECT e.vec_id FROM e JOIN p3 ON e.vec_id = p3.id) "
    "SELECT CAST(0 AS BIGINT) AS round, vec_id FROM c0 "
    "UNION ALL SELECT 1, vec_id FROM c1 "
    "UNION ALL SELECT 2, vec_id FROM c2 "
    "UNION ALL SELECT 3, vec_id FROM c3 ORDER BY round"
)
QUERIES["coreset_select"] = q_coreset_select


def q_frontier_pipeline(sf_dir: str):
    """END-TO-END crawl-frontier build, every stage load-bearing and
    checked as ONE oracle hash: augmented urls (deep paths + query
    strings) → robots disallow gate (web.robots_filter, broadcast
    rules) → URL features (web.url_features_fn) → per-host crawl
    budget of 3, shallowest-first (dedup.group_cap) → politeness-
    preserving fetcher placement (hashing.rendezvous_pick on the
    HOST, so one host never splits across fetchers)."""
    from .functions.hashing import rendezvous_pick
    from .stages.dedup import group_cap
    from .stages.web import robots_filter, url_features_fn, url_host_fn

    hosts, prefixes = [], []
    for h in range(97):
        host = f"host{h}.example.com"
        if h % 3 == 0:
            hosts.append(host)
            prefixes.append("/p/1")
        if h % 5 == 0:
            hosts.append(host)
            prefixes.append("/p/2")
        if h % 7 == 0:
            hosts.append(host)
            prefixes.append("/p/33")
    rules = pa.table({"host": pa.array(hosts, pa.string()),
                      "prefix": pa.array(prefixes, pa.string())})

    def _extend(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        url = batch.column("url")
        deep = pc.equal(_int_mod(ids, 5), 2)
        url = pc.if_else(
            deep,
            pc.binary_join_element_wise(url, "/long/tail/seg", ""),
            url)
        q = pc.equal(_int_mod(ids, 4), 1)
        url = pc.if_else(
            q,
            pc.binary_join_element_wise(
                url, "?utm_source=feed&ref=rss", ""),
            url)
        return pa.table({"doc_id": ids, "url": url})

    nodes = [f"fetcher-{i}" for i in range(4)]

    def _place(batch: pa.Table) -> pa.Table:
        host = batch.column("host").to_pylist()
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "host": batch.column("host"),
            "node": pa.array(rendezvous_pick(host, nodes),
                             pa.string()),
        })

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(_extend, batch_format="pyarrow")
    ds = robots_filter(ds, rules)
    ds = ds.map_batches(lambda b: url_features_fn(b),
                        batch_format="pyarrow")
    ds = ds.map_batches(lambda b: url_host_fn(b),
                        batch_format="pyarrow")
    ds = group_cap(ds, "host", order_col=["path_depth", "doc_id"],
                   k=3)
    return ds.map_batches(_place, batch_format="pyarrow").sort(
        "doc_id")


ORACLE_SQL["frontier_pipeline"] = (
    "WITH hs AS (SELECT unnest(range(0, 97)) AS h), "
    "rules AS ("
    "SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' AS host, "
    "'/p/1' AS prefix FROM hs WHERE h % 3 = 0 "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com', "
    "'/p/2' FROM hs WHERE h % 5 = 0 "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com', "
    "'/p/33' FROM hs WHERE h % 7 = 0), "
    "u AS (SELECT doc_id, "
    "'host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) || '.example.com' "
    "AS host, '/p/' || CAST(doc_id AS VARCHAR) AS path_head, "
    "'http://host' || CAST(" + _HOST_ID_SQL + " AS VARCHAR) || "
    "'.example.com/p/' || CAST(doc_id AS VARCHAR) || "
    "CASE WHEN doc_id % 5 = 2 THEN '/long/tail/seg' ELSE '' END "
    "AS base FROM documents), "
    "allowed AS (SELECT * FROM u WHERE NOT EXISTS ("
    "SELECT 1 FROM rules r WHERE r.host = u.host "
    "AND starts_with(u.path_head, r.prefix))), "
    "feats AS (SELECT doc_id, host, "
    "length(base) - length(replace(base, '/', '')) - 2 AS path_depth "
    "FROM allowed), "
    "budget AS (SELECT doc_id, host FROM feats QUALIFY row_number() "
    "OVER (PARTITION BY host ORDER BY path_depth ASC, doc_id ASC) "
    "<= 3), "
    "nodes AS (SELECT unnest(['fetcher-0','fetcher-1','fetcher-2',"
    "'fetcher-3']) AS node) "
    "SELECT b.doc_id, b.host, n.node FROM budget b, nodes n "
    "QUALIFY row_number() OVER (PARTITION BY b.doc_id ORDER BY "
    "CAST(('0x' || substr(md5(b.host || '|' || n.node), 1, 16)) "
    "AS UBIGINT) DESC, n.node ASC) = 1 ORDER BY b.doc_id"
)
QUERIES["frontier_pipeline"] = q_frontier_pipeline


def q_ppr_scores(sf_dir: str):
    """PERSONALIZED PageRank (stages/graph.pagerank_int with
    seed_ids — TrustRank-style crawl prioritization): teleport mass
    lands only on the seed set (doc_id % 50 == 0), same all-int64
    exchange plan as q_pagerank, bit-exact vs the seeded join-chain
    twin. Documents unreachable from seeds score 0 — the
    spam-demotion property uniform PageRank lacks."""
    import numpy as np

    from .stages.graph import pagerank_int

    docs = _docs(sf_dir, columns=["doc_id"])
    n = docs.count()

    def _edges(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        m1, m2 = ids % 3 >= 1, ids % 3 == 2
        src = np.concatenate([ids, ids[m1], ids[m2]])
        dst = np.concatenate([(ids * 7 + 1) % n,
                              (ids[m1] * 13 + 2) % n,
                              (ids[m2] * 29 + 5) % n])
        return pa.table({"src": pa.array(src, pa.int64()),
                         "dst": pa.array(dst, pa.int64())})

    def _as_node(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("doc_id")})

    seeds = np.arange(0, n, 50, dtype=np.int64)
    ranks = pagerank_int(
        docs.map_batches(_as_node, batch_format="pyarrow"),
        docs.map_batches(_edges, batch_format="pyarrow"),
        iters=3, n_buckets=32, seed_ids=seeds)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("node"),
                         "ppr_score": batch.column("rank")})

    return ranks.map_batches(_rename, batch_format="pyarrow").sort(
        "doc_id")


ORACLE_SQL["ppr_scores"] = (
    "WITH nn AS (SELECT count(*) AS c FROM documents), "
    "nodes AS (SELECT doc_id AS node FROM documents), "
    "edges AS ("
    "SELECT node AS src, (node*7+1) % nn.c AS dst FROM nodes, nn "
    "UNION ALL SELECT node, (node*13+2) % nn.c FROM nodes, nn "
    "WHERE node % 3 >= 1 "
    "UNION ALL SELECT node, (node*29+5) % nn.c FROM nodes, nn "
    "WHERE node % 3 = 2), "
    "deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src), "
    "r0 AS (SELECT node, CAST(CASE WHEN node % 50 = 0 "
    "THEN 1000000000 ELSE 0 END AS BIGINT) AS r FROM nodes), "
    "s1 AS (SELECT e.dst AS node, sum(r.r // g.d) AS s "
    "FROM edges e JOIN r0 r ON r.node = e.src "
    "JOIN deg g ON g.src = e.src GROUP BY e.dst), "
    "r1 AS (SELECT n2.node, CASE WHEN n2.node % 50 = 0 "
    "THEN 150000000 ELSE 0 END + 85 * coalesce(s1.s, 0) // 100 AS r "
    "FROM nodes n2 LEFT JOIN s1 USING (node)), "
    "s2 AS (SELECT e.dst AS node, sum(r.r // g.d) AS s "
    "FROM edges e JOIN r1 r ON r.node = e.src "
    "JOIN deg g ON g.src = e.src GROUP BY e.dst), "
    "r2 AS (SELECT n2.node, CASE WHEN n2.node % 50 = 0 "
    "THEN 150000000 ELSE 0 END + 85 * coalesce(s2.s, 0) // 100 AS r "
    "FROM nodes n2 LEFT JOIN s2 USING (node)), "
    "s3 AS (SELECT e.dst AS node, sum(r.r // g.d) AS s "
    "FROM edges e JOIN r2 r ON r.node = e.src "
    "JOIN deg g ON g.src = e.src GROUP BY e.dst), "
    "r3 AS (SELECT n2.node, CASE WHEN n2.node % 50 = 0 "
    "THEN 150000000 ELSE 0 END + 85 * coalesce(s3.s, 0) // 100 AS r "
    "FROM nodes n2 LEFT JOIN s3 USING (node)) "
    "SELECT node AS doc_id, CAST(r AS BIGINT) AS ppr_score "
    "FROM r3 ORDER BY node"
)
QUERIES["ppr_scores"] = q_ppr_scores


def q_robots_parse(sf_dir: str):
    """robots.txt PARSING (stages/web.parse_robots): raw per-host
    robots text — with a badbot group that must be scoped OUT,
    comments, blank lines, Crawl-delay noise and an empty Disallow —
    parsed into the (host, rule_idx, allow, prefix) rows the REP
    evaluators consume. The text derives from host-id formulas, so
    the oracle rebuilds the expected rules directly: a parser that
    mis-scopes groups or miscounts rules cannot pass. Host count
    follows the corpus' 97-host layout; row-local, no shuffle."""
    from .stages.web import parse_robots

    def _mk(batch: pa.Table) -> pa.Table:
        hs = batch.column("id").to_pylist()
        hosts, texts = [], []
        for h in hs:
            lines = [
                "# synthetic robots for tests",
                "User-agent: badbot",
                "Disallow: /",
                "",
                "User-agent: *",
            ]
            if h % 3 == 0:
                lines.append("Disallow: /p/1")
                lines.append("Allow: /p/12")
            if h % 5 == 0:
                lines.append("Disallow: /p/2")
            lines.append("Crawl-delay: 5")
            lines.append("Disallow:")  # empty value: allow-all noop
            lines.append("Disallow: /tmp")
            hosts.append(f"host{h}.example.com")
            texts.append("\n".join(lines))
        return pa.table({
            "host": pa.array(hosts, pa.string()),
            "robots_txt": pa.array(texts, pa.string()),
        })

    ds = ray.data.range(97).map_batches(_mk, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: parse_robots(b), batch_format="pyarrow"
    ).sort(["host", "rule_idx"])


ORACLE_SQL["robots_parse"] = (
    "WITH hs AS (SELECT unnest(range(0, 97)) AS h), "
    "rules AS ("
    "SELECT h, 0 AS pos, FALSE AS allow, '/p/1' AS prefix FROM hs "
    "WHERE h % 3 = 0 "
    "UNION ALL SELECT h, 1, TRUE, '/p/12' FROM hs WHERE h % 3 = 0 "
    "UNION ALL SELECT h, 2, FALSE, '/p/2' FROM hs WHERE h % 5 = 0 "
    "UNION ALL SELECT h, 3, FALSE, '/tmp' FROM hs) "
    "SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' AS host, "
    "CAST(row_number() OVER (PARTITION BY h ORDER BY pos) - 1 "
    "AS BIGINT) AS rule_idx, allow, prefix "
    "FROM rules ORDER BY host, rule_idx"
)
QUERIES["robots_parse"] = q_robots_parse


def q_lang_host_mi(sf_dir: str):
    """Dataset-bias audit: MUTUAL INFORMATION between language and
    host over the crawl — near-zero MI means languages spread evenly
    across hosts; high MI flags host-language lock-in (single-lang
    mirror farms), the selection-bias companion to host_entropy /
    host_gini. One (lang,host) pair exchange (pairs-scale, tiny);
    MI folded from exact integer counts in a single final task,
    compared on the 1e-6 grid."""
    import numpy as np

    from .stages.web import url_host_fn

    ds = _docs(sf_dir, columns=["doc_id", "lang"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(lambda b: url_host_fn(b), batch_format="pyarrow")

    def _pairs(batch: pa.Table) -> pa.Table:
        g = batch.select(["lang", "host"]).group_by(
            ["lang", "host"]).aggregate([([], "count_all")])
        key = pc.binary_join_element_wise(
            g.column("lang"), g.column("host"), "\x00")
        return pa.table({
            "lh": key,
            "n": pc.cast(g.column("count_all"), pa.int64()),
        })

    agg = ds.map_batches(_pairs, batch_format="pyarrow").groupby(
        "lh").aggregate(Sum("n", alias_name="n"))

    def _mi(batch: pa.Table) -> pa.Table:
        keys = batch.column("lh").to_pylist()
        n = batch.column("n").to_numpy(zero_copy_only=False).astype(
            np.float64)
        langs = np.array([k.split("\x00")[0] for k in keys])
        hosts = np.array([k.split("\x00")[1] for k in keys])
        total = n.sum()
        ul, li = np.unique(langs, return_inverse=True)
        uh, hi = np.unique(hosts, return_inverse=True)
        nl = np.zeros(len(ul)); np.add.at(nl, li, n)
        nh = np.zeros(len(uh)); np.add.at(nh, hi, n)
        mi = float(np.sum(
            (n / total) * np.log((n * total) / (nl[li] * nh[hi]))))
        mi = math.floor(mi * 1e6 + 0.5) / 1e6
        return pa.table({
            "n_docs": pa.array([int(total)], pa.int64()),
            "n_langs": pa.array([len(ul)], pa.int64()),
            "n_hosts": pa.array([len(uh)], pa.int64()),
            "mi": pa.array([mi], pa.float64()),
        })

    return agg.repartition(1).map_batches(
        _mi, batch_format="pyarrow", batch_size=None)


ORACLE_SQL["lang_host_mi"] = (
    "WITH d AS (SELECT lang, 'host' || CAST(" + _HOST_ID_SQL
    + " AS VARCHAR) || '.example.com' AS host FROM documents), "
    "c AS (SELECT lang, host, CAST(count(*) AS BIGINT) AS n FROM d "
    "GROUP BY 1, 2), "
    "tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM c), "
    "ml AS (SELECT lang, CAST(sum(n) AS BIGINT) AS nl FROM c "
    "GROUP BY 1), "
    "mh AS (SELECT host, CAST(sum(n) AS BIGINT) AS nh FROM c "
    "GROUP BY 1) "
    "SELECT tot.nn AS n_docs, "
    "(SELECT CAST(count(*) AS BIGINT) FROM ml) AS n_langs, "
    "(SELECT CAST(count(*) AS BIGINT) FROM mh) AS n_hosts, "
    "FLOOR(SUM((CAST(c.n AS DOUBLE) / tot.nn) * "
    "ln((CAST(c.n AS DOUBLE) * tot.nn) / "
    "(CAST(ml.nl AS DOUBLE) * mh.nh))) * 1e6 + 0.5) / 1e6 AS mi "
    "FROM c JOIN ml USING (lang) JOIN mh USING (host), tot "
    "GROUP BY tot.nn"
)
QUERIES["lang_host_mi"] = q_lang_host_mi


def q_stitch_chains(sf_dir: str):
    """Split-document CHAIN reassembly — composition of session-9
    stitching with the functional-graph collapser: stitch_pairs
    finds seam edges, two pair-scale reductions make the edge set
    FUNCTIONAL (min successor per doc, then unique predecessor per
    successor), and graph.resolve_chains pointer-doubles every page
    to its chain's terminal in log depth. Output: (doc_id, chain_id)
    for every resolved chain member, terminals included; cycle-bound
    rows are dropped on both sides (depth-capped recursive CTE)."""
    from ray.data.aggregate import Min

    from .stages.dedup import stitch_pairs
    from .stages.graph import resolve_chains
    from .stages.join import repartition_join

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        out = []
        for i, t in zip(ids, batch.column("text").to_pylist()):
            t = t or ""
            if i % 10 == 1:
                t = f"{t} stitch pg{i} marker"
            elif i % 10 == 2:
                t = f"stitch pg{i - 1} marker {t}"
            out.append(t)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(out, pa.string()),
        })

    docs = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _aug, batch_format="pyarrow")
    pairs = stitch_pairs(docs, k=3)

    def _m1(batch: pa.Table) -> pa.Table:
        return pa.table({"src": batch.column("a_id"),
                         "dst": batch.column(f"min(b_id)")})

    m1 = pairs.groupby("a_id").aggregate(Min("b_id")).map_batches(
        _m1, batch_format="pyarrow")
    pred = m1.groupby("dst").aggregate(Min("src"))

    def _keep(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch.column("src"),
                        batch.column("min(src)"))
        sub = batch.filter(keep)
        return pa.table({"src": sub.column("src"),
                         "dst": sub.column("dst")})

    # pair-scale by construction: pin it so the pointer-doubling
    # rounds (which scan the mapping twice per round) do not re-run
    # the whole seam-shuffle plan every scan
    mapping = repartition_join(m1, pred, on="dst").map_batches(
        _keep, batch_format="pyarrow").materialize()
    resolved = resolve_chains(mapping, key_col="src", ptr_col="dst",
                              n_buckets=8)

    def _members(batch: pa.Table) -> pa.Table:
        ok = batch.filter(batch.column("resolved"))
        return pa.table({"doc_id": ok.column("src"),
                         "chain_id": ok.column("final")})

    members = resolved.map_batches(
        _members, batch_format="pyarrow").materialize()

    def _terminals(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_id": batch.column("chain_id"),
                         "chain_id": batch.column("chain_id")})

    terminals = members.groupby("chain_id").aggregate(
        Count()).map_batches(_terminals, batch_format="pyarrow")
    return members.union(terminals).sort("doc_id")


ORACLE_SQL["stitch_chains"] = (
    "WITH RECURSIVE aug AS (SELECT doc_id, CASE "
    "WHEN doc_id % 10 = 1 THEN coalesce(text, '') || ' stitch pg' || "
    "CAST(doc_id AS VARCHAR) || ' marker' "
    "WHEN doc_id % 10 = 2 THEN 'stitch pg' || "
    "CAST(doc_id - 1 AS VARCHAR) || ' marker ' || coalesce(text, '') "
    "ELSE coalesce(text, '') END AS text FROM documents), "
    "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM aug), "
    "ht AS (SELECT doc_id, array_to_string(toks[1:3], ' ') AS head, "
    "array_to_string(toks[-3:], ' ') AS tail FROM t "
    "WHERE len(toks) >= 3), "
    "p AS (SELECT a.doc_id AS a, b.doc_id AS b FROM ht a JOIN ht b "
    "ON a.tail = b.head AND a.doc_id <> b.doc_id), "
    "m1 AS (SELECT a, min(b) AS b FROM p GROUP BY a), "
    "m2 AS (SELECT a, b FROM m1 "
    "QUALIFY a = min(a) OVER (PARTITION BY b)), "
    "r AS (SELECT a AS src, b AS cur, 1 AS depth FROM m2 "
    "UNION ALL SELECT r.src, m.b, r.depth + 1 FROM r "
    "JOIN m2 m ON m.a = r.cur WHERE r.depth < 40), "
    "fin AS (SELECT src AS doc_id, cur AS chain_id FROM r "
    "WHERE cur NOT IN (SELECT a FROM m2)), "
    "term AS (SELECT DISTINCT chain_id AS doc_id, chain_id FROM fin) "
    "SELECT doc_id, chain_id FROM fin "
    "UNION ALL SELECT doc_id, chain_id FROM term ORDER BY doc_id"
)
QUERIES["stitch_chains"] = q_stitch_chains


def q_syndication_sources(sf_dir: str):
    """Copy-direction provenance over the near-dup graph: orient
    every bit-exact MinHash candidate pair by crawl TIMESTAMP
    (deterministic scrambled ts so direction isn't the id order) —
    the earlier side is the SOURCE, the later side the copy; ties
    break to the smaller doc_id. Output: per-source copy counts,
    the "who gets syndicated" ranking feeding canonical-document
    election and crawl-priority boosts. Pair-scale all the way:
    orientation is row-local on the pair set, map-side combine
    feeds one tiny groupby."""
    pairs = minhash_dup_pairs(_docs(sf_dir))

    def _orient(batch: pa.Table) -> pa.Table:
        d1, d2 = batch.column("d1"), batch.column("d2")
        t1 = _int_mod(pc.multiply(d1, pa.scalar(131, pa.int64())),
                      10007)
        t2 = _int_mod(pc.multiply(d2, pa.scalar(131, pa.int64())),
                      10007)
        # d1 < d2 by pair construction, so the tie rule is "ties
        # keep d1" — mirrored in the SQL CASE
        src = pc.if_else(
            pc.or_(pc.less(t1, t2),
                   pc.and_(pc.equal(t1, t2), pc.less(d1, d2))),
            d1, d2)
        g = pa.table({"doc_id": src}).group_by(["doc_id"]).aggregate(
            [([], "count_all")])
        return pa.table({
            "doc_id": g.column("doc_id"),
            "n_copies": pc.cast(g.column("count_all"), pa.int64()),
        })

    return pairs.map_batches(_orient, batch_format="pyarrow").groupby(
        "doc_id"
    ).aggregate(Sum("n_copies", alias_name="n_copies")).sort("doc_id")


ORACLE_SQL["syndication_sources"] = (
    "WITH " + SIG_CTE + ", cand AS (" + CAND_SELECT + "), "
    "o AS (SELECT CASE WHEN (d1 * 131) % 10007 < (d2 * 131) % 10007 "
    "OR ((d1 * 131) % 10007 = (d2 * 131) % 10007 AND d1 < d2) "
    "THEN d1 ELSE d2 END AS doc_id FROM cand) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_copies FROM o "
    "GROUP BY doc_id ORDER BY doc_id"
)
QUERIES["syndication_sources"] = q_syndication_sources


def q_calibration_bins(sf_dir: str):
    """Quality-classifier CALIBRATION audit
    (stages/profile.score_calibration): the reliability diagram's
    exact sufficient statistics for the fastText-style linear scorer
    (same weights/bias as `quality_classifier`), against the
    independent ground label ``lang = 'en'``. Fixed-width logit bins
    (floor division, width 16) × integer (n_docs, n_pos, sum_score)
    — bit-exact, the ECE fold happens downstream. One row-local
    scoring pass fused with binning partials, one tiny groupby."""
    from .stages.profile import score_calibration
    from .stages.textstats import _hash_embed_matrix

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "lang"])
    import numpy as np
    w = np.array([((d * 37) % 21) - 10 for d in range(64)], np.int64)

    def _score(batch: pa.Table) -> pa.Table:
        mat = _hash_embed_matrix(batch.column("text"), 64)
        logit = mat @ w + 3
        return pa.table({
            "logit": pa.array(logit, pa.int64()),
            "label_true": pc.equal(batch.column("lang"), "en"),
        })

    return score_calibration(
        docs.map_batches(_score, batch_format="pyarrow"), width=16)


ORACLE_SQL["calibration_bins"] = (
    "WITH toks AS (SELECT doc_id, "
    "unnest(string_split(text, ' ')) AS tok FROM documents), "
    "h AS (SELECT doc_id, CAST(CAST(('0x' || substr(md5(tok), 1, "
    "8)) AS UBIGINT) AS BIGINT) AS hv FROM toks), "
    "cells AS (SELECT doc_id, hv % 64 AS d, CASE WHEN "
    "(hv // 65536) % 2 = 1 THEN 1 ELSE -1 END AS sgn FROM h), "
    "dots AS (SELECT doc_id, sum(sgn * (((d * 37) % 21) - 10)) "
    "AS dot FROM cells GROUP BY doc_id), "
    "scored AS (SELECT d.doc_id, "
    "CAST(COALESCE(dt.dot, 0) + 3 AS BIGINT) AS logit, "
    "(d.lang = 'en') AS pos FROM documents d "
    "LEFT JOIN dots dt ON d.doc_id = dt.doc_id) "
    "SELECT CAST(floor(logit / 16.0) AS BIGINT) AS bin, "
    "CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos, "
    "CAST(sum(logit) AS BIGINT) AS sum_score "
    "FROM scored GROUP BY 1 ORDER BY bin"
)
QUERIES["calibration_bins"] = q_calibration_bins


def q_type_hour_bursts(sf_dir: str):
    """Traffic burst detection (stages/temporal.rate_bursts): hours
    where an event type's count exceeds its OWN hourly baseline by
    more than 2σ — the crawl-rate anomaly monitor (bot floods,
    scraper storms, recrawl loops). The z-test runs as the
    all-integer predicate (c·H−S)² > 4·(H·S2−S²) with c·H−S > 0 —
    no sqrt, no float — in Python ints engine-side and HUGEINT in
    the oracle."""
    from .stages.temporal import rate_bursts

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "ts"])
    return rate_bursts(ds, key_col="event_type", ts_col="ts", z=2)


ORACLE_SQL["type_hour_bursts"] = (
    "WITH c AS (SELECT event_type, date_trunc('hour', ts) AS hour, "
    "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
    "s AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS h, "
    "CAST(sum(n) AS HUGEINT) AS s, "
    "sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS s2, "
    "CAST(max(n) AS BIGINT) AS max_n FROM c GROUP BY 1) "
    "SELECT c.event_type, CAST(s.h AS BIGINT) AS n_hours, "
    "CAST(sum(CASE WHEN CAST(c.n AS HUGEINT) * s.h - s.s > 0 AND "
    "(CAST(c.n AS HUGEINT) * s.h - s.s) * "
    "(CAST(c.n AS HUGEINT) * s.h - s.s) > "
    "4 * (s.h * s.s2 - s.s * s.s) THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_bursts, s.max_n "
    "FROM c JOIN s USING (event_type) "
    "GROUP BY c.event_type, s.h, s.max_n ORDER BY c.event_type"
)
QUERIES["type_hour_bursts"] = q_type_hour_bursts


def q_script_mix(sf_dir: str):
    """Unicode-script mix audit (stages/textstats.script_mix_fn):
    per-doc Latin / Cyrillic / digit / other codepoint counts plus a
    ``mixed`` flag — the mojibake and homoglyph-spam detector that
    catches what stopword language-ID cannot (a 'Latin' page whose
    letters are partly Cyrillic confusables). The same homoglyph
    plant as `deobfuscate` (every 4th doc gets 'a'→'а', 'e'→'е')
    makes the signal load-bearing. Row-local, no shuffle."""
    from .stages.textstats import script_mix_fn

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        t = pc.fill_null(batch.column("text"), "")
        dirty = pc.replace_substring(
            pc.replace_substring(t, "a", "а"), "e", "е")
        text = pc.if_else(pc.equal(_int_mod(ids, 4), 0), dirty, t)
        return pa.table({"doc_id": ids, "text": text})

    return _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow"
    ).map_batches(script_mix_fn, batch_format="pyarrow")


ORACLE_SQL["script_mix"] = (
    "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0 THEN "
    "replace(replace(coalesce(text, ''), 'a', 'а'), 'e', 'е') "
    "ELSE coalesce(text, '') END AS text FROM documents), "
    "ch AS (SELECT doc_id, unicode(unnest(string_split(text, ''))) "
    "AS cp FROM aug WHERE text != ''), "
    "agg AS (SELECT doc_id, "
    "sum(CASE WHEN (cp BETWEEN 65 AND 90) OR (cp BETWEEN 97 AND 122) "
    "THEN 1 ELSE 0 END) AS n_latin, "
    "sum(CASE WHEN cp BETWEEN 1024 AND 1279 THEN 1 ELSE 0 END) "
    "AS n_cyrillic, "
    "sum(CASE WHEN cp BETWEEN 48 AND 57 THEN 1 ELSE 0 END) "
    "AS n_digit, "
    "sum(CASE WHEN NOT ((cp BETWEEN 65 AND 90) OR "
    "(cp BETWEEN 97 AND 122) OR (cp BETWEEN 1024 AND 1279) OR "
    "(cp BETWEEN 48 AND 57)) THEN 1 ELSE 0 END) AS n_other "
    "FROM ch GROUP BY doc_id) "
    "SELECT d.doc_id, CAST(coalesce(a.n_latin, 0) AS BIGINT) "
    "AS n_latin, CAST(coalesce(a.n_cyrillic, 0) AS BIGINT) "
    "AS n_cyrillic, CAST(coalesce(a.n_digit, 0) AS BIGINT) "
    "AS n_digit, CAST(coalesce(a.n_other, 0) AS BIGINT) AS n_other, "
    "(coalesce(a.n_latin, 0) > 0 AND coalesce(a.n_cyrillic, 0) > 0) "
    "AS mixed FROM documents d LEFT JOIN agg a "
    "ON d.doc_id = a.doc_id ORDER BY d.doc_id"
)
QUERIES["script_mix"] = q_script_mix


def q_adaptive_join_orders(sf_dir: str):
    """Adaptive physical join planning (stages/join.adaptive_join):
    orders enriched with customer — the engine MEASURES the right
    side (a parquet-footer metadata fold) and picks broadcast vs
    co-shuffle itself, instead of a hand-chosen operator. customer
    sits far under the broadcast limit at every test SF, so the
    plan resolves to "broadcast" (left side never shuffles); the
    emitted ``strategy`` column pins the decision rule in the
    oracle (CASE over count(*)), and the choice cannot change
    values — both operators share one join contract."""
    from .stages.join import adaptive_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_mktsegment"])

    def _key(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("c_custkey"),
            "c_name": batch.column("c_name"),
            "c_mktsegment": batch.column("c_mktsegment"),
        })

    joined, strategy = adaptive_join(
        orders, cust.map_batches(_key, batch_format="pyarrow"),
        on="o_custkey", right_cols=["c_name", "c_mktsegment"],
        broadcast_limit_rows=2_000_000)

    def _tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "strategy", pa.array([strategy] * batch.num_rows,
                                 pa.string()))

    return joined.map_batches(_tag, batch_format="pyarrow").sort(
        "o_orderkey")


ORACLE_SQL["adaptive_join_orders"] = (
    "SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, "
    "c.c_name, c.c_mktsegment, "
    "CASE WHEN (SELECT count(*) FROM customer) <= 2000000 "
    "THEN 'broadcast' ELSE 'shuffle' END AS strategy "
    "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
    "ORDER BY o.o_orderkey"
)
QUERIES["adaptive_join_orders"] = q_adaptive_join_orders


def q_agg_refresh(sf_dir: str):
    """Incremental aggregate-view maintenance
    (stages/stats.agg_refresh): the per-type (count, sum(value))
    view is STORED once over the history partition (event_id % 10
    < 9, staged to parquet — the materialized view), then refreshed
    with only the new delta partition (event_id % 10 = 9). Work is
    |delta| + |keys|; history is never rescanned. The oracle
    recomputes the same view over ALL events — refresh must equal
    recompute (sums on the 1e-6 grid)."""
    from .stages.stats import agg_refresh, partial_sum_count
    from .state.lineage import publish_dataset, store_root

    label = os.path.basename(os.path.normpath(sf_dir))
    stage = os.path.join(store_root(),
                         f"ocr_ray_aggbase_{os.getpid()}_{label}")
    base_path = os.path.join(stage, "base.parquet")
    if not os.path.exists(base_path):
        os.makedirs(stage, exist_ok=True)
        hist = ray.data.read_parquet(
            f"{sf_dir}/events.parquet",
            columns=["event_id", "event_type", "value"]
        ).map_batches(
            lambda b: b.filter(pc.less(
                _int_mod(b.column("event_id"), 10), 9)),
            batch_format="pyarrow",
        ).map_batches(
            lambda b: partial_sum_count(
                b.select(["event_type", "value"]), ["event_type"],
                "value", sum_name="sum_value", count_name="n"),
            batch_format="pyarrow",
        ).groupby("event_type").aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value", alias_name="sum_value"))
        publish_dataset(hist, base_path)

    delta = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "event_type", "value"]
    ).map_batches(
        lambda b: b.filter(pc.equal(
            _int_mod(b.column("event_id"), 10), 9)),
        batch_format="pyarrow",
    ).select_columns(["event_type", "value"])
    refreshed = agg_refresh(
        ray.data.read_parquet(base_path), delta,
        keys=["event_type"], value_col="value",
        count_name="n", sum_name="sum_value")

    def _grid(batch: pa.Table) -> pa.Table:
        s = batch.column("sum_value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_type": batch.column("event_type"),
            "n": batch.column("n"),
            "sum_value": pa.array(
                [math.floor(x * 1e6 + 0.5) / 1e6 for x in s],
                pa.float64()),
        })

    return refreshed.map_batches(
        _grid, batch_format="pyarrow").sort("event_type")


ORACLE_SQL["agg_refresh"] = (
    "SELECT event_type, CAST(count(*) AS BIGINT) AS n, "
    "FLOOR(sum(value) * 1e6 + 0.5) / 1e6 AS sum_value "
    "FROM events GROUP BY event_type ORDER BY event_type"
)
QUERIES["agg_refresh"] = q_agg_refresh


def q_compaction_plan(sf_dir: str):
    """Small-file compaction planning
    (stages/bucketed.compaction_plan): documents staged ONCE into 24
    files with quadratically skewed row counts (the real small-file
    pathology: a few big files, a long tiny tail), then planned into
    ~total/6-row merge groups from FOOTER row counts only — no data
    pages read. The oracle reproduces the per-file row counts from
    the quadratic cut rule and replays the same (n_rows DESC,
    file_id) window packing."""
    import pyarrow.parquet as pq_

    from .stages.bucketed import compaction_plan
    from .state.lineage import publish_table, store_root

    label = os.path.basename(os.path.normpath(sf_dir))
    stage = os.path.join(store_root(),
                         f"ocr_ray_compact_{os.getpid()}_{label}")
    n_files = 24
    paths = [os.path.join(stage, f"part-{i:02d}.parquet")
             for i in range(n_files)]
    if not all(os.path.exists(p) for p in paths):
        os.makedirs(stage, exist_ok=True)
        tbl = pq_.read_table(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"])
        tbl = tbl.sort_by([("doc_id", "ascending")])
        n = tbl.num_rows
        cuts = [n * i * i // (n_files * n_files)
                for i in range(n_files + 1)]
        for i, p in enumerate(paths):
            publish_table(tbl.slice(cuts[i], cuts[i + 1] - cuts[i]), p)
    total = pq_.read_metadata(
        f"{sf_dir}/documents.parquet").num_rows
    plan, _n_groups = compaction_plan(paths, max(total // 6, 1))
    return plan


ORACLE_SQL["compaction_plan"] = (
    "WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n "
    "FROM documents), "
    "f AS (SELECT i AS file_id, "
    "(tot.n * (i + 1) * (i + 1)) // 576 - (tot.n * i * i) // 576 "
    "AS n_rows FROM (SELECT unnest(range(0, 24)) AS i), tot), "
    "o AS (SELECT file_id, n_rows, "
    "coalesce(sum(n_rows) OVER (ORDER BY n_rows DESC, file_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum "
    "FROM f) "
    "SELECT CAST(file_id AS BIGINT) AS file_id, "
    "CAST(n_rows AS BIGINT) AS n_rows, "
    "CAST(cum // greatest((SELECT n FROM tot) // 6, 1) AS BIGINT) "
    "AS group_id FROM o ORDER BY file_id"
)
QUERIES["compaction_plan"] = q_compaction_plan


def q_audio_silence(sf_dir: str):
    """Audio silence segmentation / VAD gate
    (stages/multimodal.SilenceDetector): every doc gets a REAL mono
    16-bit PCM WAV whose 40-sample segments alternate tone/silence
    by a doc_id formula; the actor-pool stage decodes the actual
    bytes and extracts contiguous silence RUNS from the decoded
    sample values with boundary masks. The oracle recomputes run
    structure from the generator formula via gaps-and-islands SQL —
    a header-faking decoder cannot reproduce run counts or lengths.
    Small batches for binary rows; payloads dropped after analysis."""
    from .stages.multimodal import encode_wav, silence_stage

    SEG = 40

    def _to_audio(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for i in ids:
            n_segs = 10 + i % 20
            amp = 1000 + i % 100
            segs = np.arange(n_segs, dtype=np.int64)
            active = (segs + i) % 3 == 0
            samples = np.repeat(
                np.where(active, amp, 0).astype(np.int16), SEG)
            payloads.append(encode_wav(samples))
        return pa.table({
            "media_id": pa.array([f"m{i}" for i in ids], pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    audio = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _to_audio, batch_format="pyarrow")
    return silence_stage(audio, threshold=16).select_columns(
        ["media_id", "n_samples", "n_active", "n_silence_runs",
         "longest_silence_ms"])


ORACLE_SQL["audio_silence"] = (
    "WITH seg AS (SELECT doc_id, "
    "unnest(range(0, 10 + doc_id % 20)) AS s FROM documents), "
    "sil AS (SELECT doc_id, s, ((s + doc_id) % 3 <> 0) AS silent "
    "FROM seg), "
    "isl AS (SELECT doc_id, s, "
    "s - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) AS g "
    "FROM sil WHERE silent), "
    "runs AS (SELECT doc_id, g, count(*) AS seglen FROM isl "
    "GROUP BY 1, 2), "
    "r AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_runs, "
    "CAST(max(seglen) AS BIGINT) AS longest_segs FROM runs "
    "GROUP BY 1), "
    "act AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_act_segs "
    "FROM sil WHERE NOT silent GROUP BY 1) "
    "SELECT 'm' || CAST(d.doc_id AS VARCHAR) AS media_id, "
    "CAST((10 + d.doc_id % 20) * 40 AS BIGINT) AS n_samples, "
    "CAST(coalesce(a.n_act_segs, 0) * 40 AS BIGINT) AS n_active, "
    "CAST(coalesce(r.n_runs, 0) AS BIGINT) AS n_silence_runs, "
    "CAST(coalesce(r.longest_segs, 0) * 40 * 1000 // 8000 AS BIGINT) "
    "AS longest_silence_ms "
    "FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id "
    "LEFT JOIN act a ON d.doc_id = a.doc_id ORDER BY media_id"
)
QUERIES["audio_silence"] = q_audio_silence


def q_semantic_blocklist(sf_dir: str):
    """Seed-set semantic blocklist (stages/similarity.seed_filter):
    embedding-level DECONTAMINATION — every corpus vector scores its
    max cosine against the 5 seed embeddings (vec_id < 5, standing
    in for eval-set exemplars / unsafe-topic centroids); rows above
    0.25 are flagged dropped (the synthetic corpus's top tail). Paraphrase-robust where the n-gram
    `decontaminate` gate is verbatim-only. Seeds broadcast once in
    the closure; one (rows × seeds) matmul per batch, NO shuffle;
    the full auditable (id, max_sim, kept) gate table is emitted."""
    from .stages.similarity import seed_filter

    seed_rows = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 5").take(5)
    )
    seeds = [r["embedding"] for r in
             sorted(seed_rows, key=lambda r: r["vec_id"])]
    corpus = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"]
    ).filter(expr="vec_id >= 5")
    return seed_filter(corpus, seeds, threshold=0.25).sort("vec_id")


ORACLE_SQL["semantic_blocklist"] = (
    "WITH s AS (SELECT vec_id AS sid, "
    "CAST(embedding AS DOUBLE[]) AS sv FROM embeddings "
    "WHERE vec_id < 5), "
    "m AS (SELECT e.vec_id, floor(max(list_cosine_similarity("
    "CAST(e.embedding AS DOUBLE[]), s.sv)) * 1000000.0 + 0.5) "
    "/ 1000000.0 AS max_sim "
    "FROM embeddings e, s WHERE e.vec_id >= 5 GROUP BY e.vec_id) "
    "SELECT vec_id, max_sim, NOT (max_sim > 0.25) AS kept FROM m "
    "ORDER BY vec_id"
)
QUERIES["semantic_blocklist"] = q_semantic_blocklist


def q_hard_negatives(sf_dir: str):
    """Contrastive hard-negative mining
    (stages/similarity.hard_negatives): per anchor (vec_id 0 and 1),
    the top-5 corpus vectors with cosine in the (0.05, 0.25] band —
    confusably similar but below the near-dup line, the DPR/SimCSE
    training-pair op. Anchors ship once in the closure; one
    (rows × anchors) matmul + band mask + local top-k per batch;
    the global finish sorts blocks × anchors × 5 candidate rows.
    Sims grid-quantize BEFORE banding/ranking (ties → ascending id)
    so selection matches the QUALIFY twin bit-for-bit."""
    from .stages.similarity import hard_negatives

    rows = (
        ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"])
        .filter(expr="vec_id < 2").take(2)
    )
    anchors = [(r["vec_id"], r["embedding"])
               for r in sorted(rows, key=lambda r: r["vec_id"])]
    corpus = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"])
    return hard_negatives(corpus, anchors, lo=0.05, hi=0.25, k=5)


ORACLE_SQL["hard_negatives"] = (
    "WITH a AS (SELECT vec_id AS anchor_id, "
    "CAST(embedding AS DOUBLE[]) AS av FROM embeddings "
    "WHERE vec_id < 2), "
    "s AS (SELECT a.anchor_id, e.vec_id, "
    "floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), "
    "a.av) * 1000000.0 + 0.5) / 1000000.0 AS sim "
    "FROM embeddings e, a WHERE e.vec_id <> a.anchor_id) "
    "SELECT anchor_id, vec_id, sim FROM s "
    "WHERE sim > 0.05 AND sim <= 0.25 "
    "QUALIFY row_number() OVER (PARTITION BY anchor_id "
    "ORDER BY sim DESC, vec_id) <= 5 "
    "ORDER BY anchor_id, sim DESC, vec_id"
)
QUERIES["hard_negatives"] = q_hard_negatives


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary growth (stages/textstats.vocab_growth):
    total vs DISTINCT token counts at 8 corpus-prefix checkpoints —
    the tokenizer-sizing / dedup-health curve. Distinct-at-cp folds
    from each token's FIRST document (one vocab-scale exchange, the
    top_tokens shape); totals fold from block partials; only
    checkpoints × blocks rows move after the map side."""
    import pyarrow.parquet as pq_

    from .stages.textstats import vocab_growth

    n = pq_.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    cps = [n * k // 8 for k in range(1, 9)]
    return vocab_growth(_docs(sf_dir), cps)


ORACLE_SQL["vocab_growth"] = (
    "WITH tot AS (SELECT CAST(count(*) AS BIGINT) AS n "
    "FROM documents), "
    "toks AS (SELECT doc_id, unnest(string_split(coalesce(text, "
    "''), ' ')) AS tok FROM documents), "
    "fd AS (SELECT tok, min(doc_id) AS first_doc FROM toks "
    "GROUP BY tok), "
    "cps AS (SELECT CAST((tot.n * k) // 8 AS BIGINT) AS cp "
    "FROM (SELECT unnest(range(1, 9)) AS k), tot) "
    "SELECT cp, "
    "(SELECT CAST(count(*) AS BIGINT) FROM toks WHERE doc_id < cp) "
    "AS n_tokens, "
    "(SELECT CAST(count(*) AS BIGINT) FROM fd WHERE first_doc < cp) "
    "AS n_distinct FROM cps ORDER BY cp"
)
QUERIES["vocab_growth"] = q_vocab_growth


def q_inference_buckets(sf_dir: str):
    """Length-bucketed inference batching plan: docs bin to the
    smallest power-of-2 token-length cap and the plan reports per
    bucket the doc count, real token total and PADDING WASTE
    (cap·n − tokens) — the batch-shaping economics of padded model
    inference/training (pad-to-bucket beats pad-to-global-max; this
    table says by how much). Map-side Arrow partials per (cap) key,
    one tiny groupby; all-integer output."""
    import numpy as np

    CAPS = np.array([1 << k for k in range(1, 17)], np.int64)

    def _partial(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column("text"), "")
        parts = pc.split_pattern(col, " ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        ntok = np.diff(parts.offsets.to_numpy(
            zero_copy_only=False).astype(np.int64))
        # clamp to the top cap (SQL coalesce twin) so a
        # beyond-range outlier doc cannot crash the plan
        caps = CAPS[np.minimum(np.searchsorted(CAPS, ntok),
                               len(CAPS) - 1)]
        t = pa.table({
            "bucket_cap": pa.array(caps, pa.int64()),
            "ntok": pa.array(ntok, pa.int64()),
            "one": pa.array(np.ones(len(ntok), np.int64)),
        })
        g = t.group_by(["bucket_cap"]).aggregate(
            [("one", "sum"), ("ntok", "sum")])
        return pa.table({
            "bucket_cap": g.column("bucket_cap"),
            "n_docs": pc.cast(g.column("one_sum"), pa.int64()),
            "n_tokens": pc.cast(g.column("ntok_sum"), pa.int64()),
        })

    agg = _docs(sf_dir, columns=["text"]).map_batches(
        _partial, batch_format="pyarrow"
    ).groupby("bucket_cap").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("n_tokens", alias_name="n_tokens"))

    def _waste(batch: pa.Table) -> pa.Table:
        waste = pc.subtract(
            pc.multiply(batch.column("bucket_cap"),
                        batch.column("n_docs")),
            batch.column("n_tokens"))
        return batch.append_column("padding_waste", waste)

    return agg.map_batches(_waste, batch_format="pyarrow").sort(
        "bucket_cap")


ORACLE_SQL["inference_buckets"] = (
    "WITH caps AS (SELECT CAST(power(2, k) AS BIGINT) AS cap "
    "FROM (SELECT unnest(range(1, 17)) AS k)), "
    "lens AS (SELECT len(string_split(coalesce(text, ''), ' ')) "
    "AS ntok FROM documents), "
    "b AS (SELECT ntok, coalesce((SELECT min(cap) FROM caps "
    "WHERE cap >= ntok), 65536) AS bucket_cap FROM lens) "
    "SELECT bucket_cap, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(ntok) AS BIGINT) AS n_tokens, "
    "CAST(bucket_cap * count(*) - sum(ntok) AS BIGINT) "
    "AS padding_waste FROM b GROUP BY bucket_cap ORDER BY bucket_cap"
)
QUERIES["inference_buckets"] = q_inference_buckets


def q_domain_holdout_split(sf_dir: str):
    """Domain-grouped train/test split: EVERY doc of a host lands in
    the same split (md5 of the host, 90/10) — the domain-
    generalization eval protocol (`dataset_split` hashes content,
    `split_leakage_safe` hashes near-dup clusters; this one holds
    out whole DOMAINS so eval measures transfer to unseen hosts).
    Row-local, no shuffle, dup-safe and deterministic."""

    from .stages.web import url_host_fn

    def _fn(batch: pa.Table) -> pa.Table:
        b = url_host_fn(_url_augment(batch))
        splits = []
        for host in b.column("host").to_pylist():
            hv = int(hashlib.md5(host.encode()).hexdigest()[:8], 16)
            splits.append("train" if hv % 10 < 9 else "test")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "split": pa.array(splits, pa.string()),
        })

    return _docs(sf_dir, columns=["doc_id"]).map_batches(
        _fn, batch_format="pyarrow")


ORACLE_SQL["domain_holdout_split"] = (
    "WITH h AS (SELECT doc_id, 'host' || CAST(" + _HOST_ID_SQL
    + " AS VARCHAR) || '.example.com' AS host FROM documents) "
    "SELECT doc_id, CASE WHEN CAST(('0x' || substr(md5(host), 1, 8)) "
    "AS UBIGINT) % 10 < 9 THEN 'train' ELSE 'test' END AS split "
    "FROM h ORDER BY doc_id"
)
QUERIES["domain_holdout_split"] = q_domain_holdout_split


def _sitemap_fixture(batch: pa.Table,
                     with_optional: bool) -> pa.Table:
    """Shared 97-host sitemap.xml corpus for `sitemap_parse` and
    `seed_pipeline` — ONE generator so the fixture formulas cannot
    drift between the two oracles. ``with_optional`` adds the XML
    declaration, a loc-less entry (must be skipped) and the
    lastmod/priority branches."""
    hs = batch.column("id").to_pylist()
    hosts, xmls = [], []
    for h in hs:
        parts = []
        if with_optional:
            parts.append('<?xml version="1.0" encoding="UTF-8"?>')
        parts.append(
            '<urlset xmlns='
            '"http://www.sitemaps.org/schemas/sitemap/0.9">')
        if with_optional:
            # a url element with no <loc>: must be skipped
            parts.append("<url><priority>0.1</priority></url>")
        for j in range(1, 2 + h % 4):
            entry = (f"<url><loc>http://host{h}.example.com"
                     f"/p/{j}</loc>")
            if with_optional:
                if (h + j) % 2 == 0:
                    entry += (f"<lastmod>2024-01-"
                              f"{(h + j) % 28 + 1:02d}</lastmod>")
                if (h + j) % 3 == 0:
                    entry += f"<priority>0.{(h + j) % 10}</priority>"
            entry += "</url>"
            parts.append(entry)
        parts.append("</urlset>")
        hosts.append(f"host{h}.example.com")
        xmls.append("".join(parts))
    return pa.table({
        "host": pa.array(hosts, pa.string()),
        "sitemap_xml": pa.array(xmls, pa.string()),
    })


def q_sitemap_parse(sf_dir: str):
    """sitemap.xml PARSING (stages/web.parse_sitemap): per-host
    urlset documents — default-namespace XML with optional
    lastmod/priority per entry and one no-loc entry that must be
    skipped — parsed into (host, entry_idx, loc, lastmod, priority)
    seed rows. Entry fields derive from host-id formulas, so the
    oracle rebuilds the expected rows directly: a parser that
    drops the namespace handling, misorders entries or keeps
    loc-less rows cannot pass. 97-host layout; row-local."""
    from .stages.web import parse_sitemap

    ds = ray.data.range(97).map_batches(
        lambda b: _sitemap_fixture(b, with_optional=True),
        batch_format="pyarrow")
    return ds.map_batches(
        lambda b: parse_sitemap(b), batch_format="pyarrow"
    ).sort(["host", "entry_idx"])


ORACLE_SQL["sitemap_parse"] = (
    "WITH h AS (SELECT unnest(range(0, 97)) AS hid), "
    "e AS (SELECT hid, unnest(range(1, 2 + hid % 4)) AS j FROM h) "
    "SELECT 'host' || CAST(hid AS VARCHAR) || '.example.com' AS host, "
    "CAST(j - 1 AS BIGINT) AS entry_idx, "
    "'http://host' || CAST(hid AS VARCHAR) || '.example.com/p/' || "
    "CAST(j AS VARCHAR) AS loc, "
    "CASE WHEN (hid + j) % 2 = 0 THEN '2024-01-' || "
    "lpad(CAST((hid + j) % 28 + 1 AS VARCHAR), 2, '0') END "
    "AS lastmod, "
    "CASE WHEN (hid + j) % 3 = 0 THEN '0.' || "
    "CAST((hid + j) % 10 AS VARCHAR) END AS priority "
    "FROM e ORDER BY host, entry_idx"
)
QUERIES["sitemap_parse"] = q_sitemap_parse


def q_fix_mojibake(sf_dir: str):
    """Mojibake repair (stages/normalize.fix_mojibake_fn):
    double-encoded UTF-8 — text written as UTF-8 but read back as
    cp1252 ('Ã©' for 'é', 'â€™' for the right single quote) — is
    repaired by the ordered literal replace chain over the COMPUTED
    digraph table (every pair derived from target.utf8→cp1252, not
    hand-typed). Every 5th doc gets two planted digraphs; the oracle
    replays the identical plant + the identical repair chain, so a
    wrong pair, wrong order, or partial table cannot pass.
    Row-local, no shuffle."""
    from .stages.normalize import fix_mojibake_fn

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        t = pc.fill_null(batch.column("text"), "")
        dirty = pc.replace_substring(
            pc.replace_substring(t, "a", "Ã¡"), "o", "Ã³")
        text = pc.if_else(pc.equal(_int_mod(ids, 5), 0), dirty, t)
        return pa.table({"doc_id": ids, "text": text})

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow")
    return ds.map_batches(
        fix_mojibake_fn, batch_format="pyarrow"
    ).select_columns(["doc_id", "text_fixed"])


def _mojibake_sql() -> str:
    from .stages.normalize import MOJIBAKE, MOJIBAKE_ORDER

    expr = "text"
    for moji in MOJIBAKE_ORDER:
        m = moji.replace("'", "''")
        t = MOJIBAKE[moji].replace("'", "''")
        expr = f"replace({expr}, '{m}', '{t}')"
    return (
        "WITH aug AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0 THEN "
        "replace(replace(coalesce(text, ''), 'a', 'Ã¡'), 'o', 'Ã³') "
        "ELSE coalesce(text, '') END AS text FROM documents) "
        f"SELECT doc_id, {expr} AS text_fixed FROM aug "
        "ORDER BY doc_id"
    )


ORACLE_SQL["fix_mojibake"] = _mojibake_sql()
QUERIES["fix_mojibake"] = q_fix_mojibake


def q_seed_pipeline(sf_dir: str):
    """END-TO-END crawl SEED ingestion, every stage load-bearing
    under ONE oracle: per-host sitemap.xml documents (the
    `sitemap_parse` corpus) → real XML parse
    (web.parse_sitemap) → full REP robots gate over the parsed locs
    (web.robots_rep_filter, the `robots_rep` rule set: longest
    match, Allow beats Disallow on ties) → politeness-preserving
    fetcher placement (hashing.rendezvous_pick on the HOST). The
    publisher ASK side (sitemaps) meeting the DENY side (robots) —
    the front half of a crawler's frontier; `frontier_pipeline`
    owns the budget/features back half."""
    from .functions.hashing import rendezvous_pick
    from .stages.web import (
        parse_sitemap,
        robots_rep_filter,
        url_host_fn,
    )

    seeds = ray.data.range(97).map_batches(
        lambda b: _sitemap_fixture(b, with_optional=False),
        batch_format="pyarrow"
    ).map_batches(lambda b: parse_sitemap(b), batch_format="pyarrow")

    def _as_url(batch: pa.Table) -> pa.Table:
        # url only: robots_rep_filter derives its own host column
        return pa.table({"url": batch.column("loc")})

    seeds = seeds.map_batches(_as_url, batch_format="pyarrow")

    # the robots_rep rule set: disallow /p/1, allow /p/12,
    # even hosts disallow /p/4, host0 disallow /p/123
    hosts, dirs, prefixes = [], [], []
    for h in range(97):
        host = f"host{h}.example.com"
        hosts += [host, host]
        dirs += ["disallow", "allow"]
        prefixes += ["/p/1", "/p/12"]
        if h % 2 == 0:
            hosts.append(host)
            dirs.append("disallow")
            prefixes.append("/p/4")
    hosts.append("host0.example.com")
    dirs.append("disallow")
    prefixes.append("/p/123")
    rules = pa.table({"host": pa.array(hosts, pa.string()),
                      "directive": pa.array(dirs, pa.string()),
                      "prefix": pa.array(prefixes, pa.string())})

    allowed = robots_rep_filter(seeds, rules, url_col="url")
    nodes = [f"fetcher-{i}" for i in range(4)]

    def _place(batch: pa.Table) -> pa.Table:
        b = url_host_fn(batch)
        host = b.column("host").to_pylist()
        return pa.table({
            "host": b.column("host"),
            "loc": batch.column("url"),
            "node": pa.array(rendezvous_pick(host, nodes),
                             pa.string()),
        })

    return allowed.map_batches(_place, batch_format="pyarrow").sort(
        "loc")


ORACLE_SQL["seed_pipeline"] = (
    "WITH hs AS (SELECT unnest(range(0, 97)) AS h), "
    "e AS (SELECT h, unnest(range(1, 2 + h % 4)) AS j FROM hs), "
    "s AS (SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' "
    "AS host, '/p/' || CAST(j AS VARCHAR) AS path, "
    "'http://host' || CAST(h AS VARCHAR) || '.example.com/p/' || "
    "CAST(j AS VARCHAR) AS loc FROM e), "
    "rules AS ("
    "SELECT 'host' || CAST(h AS VARCHAR) || '.example.com' AS host, "
    "'disallow' AS d, '/p/1' AS p FROM hs "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com',"
    " 'allow', '/p/12' FROM hs "
    "UNION ALL SELECT 'host' || CAST(h AS VARCHAR) || '.example.com',"
    " 'disallow', '/p/4' FROM hs WHERE h % 2 = 0 "
    "UNION ALL SELECT 'host0.example.com', 'disallow', '/p/123'), "
    "ok AS (SELECT host, loc FROM s WHERE COALESCE(("
    "SELECT r.d = 'allow' FROM rules r WHERE r.host = s.host "
    "AND starts_with(s.path, r.p) "
    "ORDER BY length(r.p) DESC, r.d LIMIT 1), TRUE)), "
    "nd AS (SELECT unnest(['fetcher-0','fetcher-1','fetcher-2',"
    "'fetcher-3']) AS node) "
    "SELECT host, loc, node FROM (SELECT ok.host, ok.loc, nd.node, "
    "row_number() OVER (PARTITION BY ok.loc ORDER BY "
    "CAST(('0x' || substr(md5(ok.host || '|' || nd.node), 1, 16)) "
    "AS UBIGINT) DESC, nd.node ASC) AS rk FROM ok, nd) "
    "WHERE rk = 1 ORDER BY loc"
)
QUERIES["seed_pipeline"] = q_seed_pipeline


def q_homoglyph_hosts(sf_dir: str):
    """Homoglyph-SPAM host detection: the per-host rollup of the
    script-mix signal — hosts whose pages systematically mix Latin
    and Cyrillic letters are confusable-obfuscation farms (the plant
    is HOST-correlated here: every doc of hosts with id % 7 == 3 is
    obfuscated, so the report discriminates hosts, not docs).
    Row-local script classification (textstats.script_mix_fn), then
    map-side (host, n, n_mixed) partials into ONE tiny groupby —
    the host_stats shape; content never shuffles."""
    from .stages.textstats import script_mix_fn
    from .stages.web import url_host_fn

    def _plant(batch: pa.Table) -> pa.Table:
        b = url_host_fn(_url_augment(batch))
        ids = b.column("doc_id")
        hot = pc.equal(_int_mod(pc.if_else(
            pc.equal(_int_mod(ids, 3), 0),
            pa.scalar(0, pa.int64()), _int_mod(ids, 97)), 7), 3)
        t = pc.fill_null(b.column("text"), "")
        dirty = pc.replace_substring(
            pc.replace_substring(t, "a", "а"), "e", "е")
        return pa.table({
            "doc_id": ids,
            "host": b.column("host"),
            "text": pc.if_else(hot, dirty, t),
        })

    ds = _docs(sf_dir, columns=["doc_id", "text"]).map_batches(
        _plant, batch_format="pyarrow")

    def _partial(batch: pa.Table) -> pa.Table:
        mix = script_mix_fn(batch)
        t = pa.table({
            "host": batch.column("host"),
            "one": pa.array([1] * batch.num_rows, pa.int64()),
            "mixed": pc.cast(mix.column("mixed"), pa.int64()),
        })
        g = t.group_by(["host"]).aggregate(
            [("one", "sum"), ("mixed", "sum")])
        return pa.table({
            "host": g.column("host"),
            "n_docs": pc.cast(g.column("one_sum"), pa.int64()),
            "n_mixed": pc.cast(g.column("mixed_sum"), pa.int64()),
        })

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby(
        "host"
    ).aggregate(Sum("n_docs", alias_name="n_docs"),
                Sum("n_mixed", alias_name="n_mixed"))

    def _flag(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.greater(batch.column("n_mixed"), 0))

    return agg.map_batches(_flag, batch_format="pyarrow").sort("host")


ORACLE_SQL["homoglyph_hosts"] = (
    "WITH d AS (SELECT doc_id, " + _HOST_ID_SQL + " AS hid, "
    "coalesce(text, '') AS text FROM documents), "
    "p AS (SELECT doc_id, 'host' || CAST(hid AS VARCHAR) || "
    "'.example.com' AS host, CASE WHEN hid % 7 = 3 THEN "
    "replace(replace(text, 'a', 'а'), 'e', 'е') ELSE text END "
    "AS text FROM d), "
    "ch AS (SELECT doc_id, unicode(unnest(string_split(text, ''))) "
    "AS cp FROM p WHERE text != ''), "
    "m AS (SELECT doc_id, "
    "sum(CASE WHEN (cp BETWEEN 65 AND 90) OR (cp BETWEEN 97 AND "
    "122) THEN 1 ELSE 0 END) > 0 AND "
    "sum(CASE WHEN cp BETWEEN 1024 AND 1279 THEN 1 ELSE 0 END) > 0 "
    "AS mixed FROM ch GROUP BY doc_id) "
    "SELECT p.host, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(CASE WHEN coalesce(m.mixed, FALSE) THEN 1 ELSE 0 "
    "END) AS BIGINT) AS n_mixed FROM p LEFT JOIN m "
    "ON p.doc_id = m.doc_id GROUP BY p.host "
    "HAVING sum(CASE WHEN coalesce(m.mixed, FALSE) THEN 1 ELSE 0 "
    "END) > 0 ORDER BY p.host"
)
QUERIES["homoglyph_hosts"] = q_homoglyph_hosts


# --------------------------------------------- TPC-H Q1 pricing summary

# TPC-H Q1 shape: the classic wide multi-aggregate scan — eight
# aggregates per (returnflag, linestatus) group over the filtered
# fact table.  The reference's analyze() (ocr_pipeline.py:238-246)
# is the one-key analogue; this is the engine-completeness version.
PRICING_CUTOFF = "2000-09-02 00:00:00"


def q_pricing_summary(sf_dir: str):
    """TPC-H Q1 pricing summary over ``lineitem``.

    Scale shape: the date filter prunes at the scan, then each block
    reduces to ≤ |flag×status| rows of ALL-INTEGER sufficient
    statistics (values are exact at 2 decimals, so ×100 int64 cents
    make every sum order-free and bit-exact vs SQL); ONE tiny groupby
    moves keys × blocks rows; the finish math is single float
    divisions shared operation-for-operation with the oracle.

    int64 bound: the charge sum carries cents × 10^4 scaling — at
    10^12 rows a per-group sum needs the decimal128 variant; at any
    bench scale here it is exact with ~10^2 headroom.
    """
    import numpy as np

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax",
                 "l_shipdate"],
    )
    cutoff = pa.scalar(PRICING_CUTOFF).cast(pa.timestamp("us"))

    def _partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.less_equal(batch.column("l_shipdate"), cutoff))
        if batch.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty_c": pa.array([], pa.int64()),
                "sum_ext_c": pa.array([], pa.int64()),
                "sum_disc_c": pa.array([], pa.int64()),
                "sum_dp": pa.array([], pa.int64()),
                "sum_ch": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            })

        def cents(col):
            return pc.cast(pc.round(pc.multiply(
                batch.column(col), 100.0)), pa.int64())

        qty, ext = cents("l_quantity"), cents("l_extendedprice")
        disc, tax = cents("l_discount"), cents("l_tax")
        # disc_price = ext * (1 - discount)  -> ext_c * (100-disc_c),
        # scale 10^-4 dollars; charge adds * (100+tax_c), 10^-6.
        dp = pc.multiply(ext, pc.subtract(pa.scalar(100, pa.int64()),
                                          disc))
        ch = pc.multiply(dp, pc.add(pa.scalar(100, pa.int64()), tax))
        t = pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "qty": qty, "ext": ext, "disc": disc, "dp": dp, "ch": ch,
        })
        agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty", "sum"), ("ext", "sum"), ("disc", "sum"),
             ("dp", "sum"), ("ch", "sum"), ([], "count_all")])
        return pa.table({
            "l_returnflag": agg.column("l_returnflag"),
            "l_linestatus": agg.column("l_linestatus"),
            "sum_qty_c": agg.column("qty_sum"),
            "sum_ext_c": agg.column("ext_sum"),
            "sum_disc_c": agg.column("disc_sum"),
            "sum_dp": agg.column("dp_sum"),
            "sum_ch": agg.column("ch_sum"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("sum_qty_c"), Sum("sum_ext_c"),
                   Sum("sum_disc_c"), Sum("sum_dp"), Sum("sum_ch"),
                   Sum("n"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        qty = batch.column("sum(sum_qty_c)").to_pylist()
        ext = batch.column("sum(sum_ext_c)").to_pylist()
        dsc = batch.column("sum(sum_disc_c)").to_pylist()
        dp = batch.column("sum(sum_dp)").to_pylist()
        ch = batch.column("sum(sum_ch)").to_pylist()
        n = batch.column("sum(n)").to_pylist()
        # every float below = float(exact int) / float literal — the
        # same two IEEE ops the SQL twin performs.
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": pa.array([float(v) / 100.0 for v in qty]),
            "sum_base_price": pa.array(
                [float(v) / 100.0 for v in ext]),
            "sum_disc_price": pa.array(
                [float(v) / 10000.0 for v in dp]),
            "sum_charge": pa.array(
                [float(v) / 1000000.0 for v in ch]),
            "avg_qty": pa.array(
                [float(q) / (100.0 * c) for q, c in zip(qty, n)]),
            "avg_price": pa.array(
                [float(e) / (100.0 * c) for e, c in zip(ext, n)]),
            "avg_disc": pa.array(
                [float(d) / (100.0 * c) for d, c in zip(dsc, n)]),
            "count_order": pc.cast(batch.column("sum(n)"),
                                   pa.int64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow").sort(
        ["l_returnflag", "l_linestatus"])


ORACLE_SQL["pricing_summary"] = f"""
WITH c AS (
  SELECT l_returnflag, l_linestatus,
    CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_c,
    CAST(round(l_extendedprice * 100.0) AS BIGINT) AS ext_c,
    CAST(round(l_discount * 100.0) AS BIGINT) AS disc_c,
    CAST(round(l_tax * 100.0) AS BIGINT) AS tax_c
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF}'
), s AS (
  SELECT l_returnflag, l_linestatus,
    sum(qty_c) AS sq, sum(ext_c) AS se, sum(disc_c) AS sd,
    sum(ext_c * (100 - disc_c)) AS sdp,
    sum(ext_c * (100 - disc_c) * (100 + tax_c)) AS sch,
    count(*) AS n
  FROM c GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus,
  CAST(sq AS DOUBLE) / 100.0 AS sum_qty,
  CAST(se AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(sdp AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(sch AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(sq AS DOUBLE) / (100.0 * n) AS avg_qty,
  CAST(se AS DOUBLE) / (100.0 * n) AS avg_price,
  CAST(sd AS DOUBLE) / (100.0 * n) AS avg_disc,
  CAST(n AS BIGINT) AS count_order
FROM s ORDER BY l_returnflag, l_linestatus
"""
QUERIES["pricing_summary"] = q_pricing_summary


# --------------------------------------- weighted shortest paths (SSSP)

def q_sssp(sf_dir: str):
    """Weighted SSSP (8 Bellman-Ford rounds) over the shared formula
    link graph with deterministic integer weights
    ``w = (src*3 + dst*5) % 9 + 1`` from seeds {0, 1}.

    `stages/graph.sssp_int`: after k rounds every reached node holds
    the exact min weight over <=k-edge paths — all-int64, so the
    depth-bounded recursive-CTE oracle is bit-exact (the weighted
    generalization of `crawl_depth`).
    """
    import numpy as np

    from .stages.graph import sssp_int

    def _weighted_edges(batch: pa.Table) -> pa.Table:
        t = _formula_edges_fn(batch)
        src = t.column("src").combine_chunks().to_numpy(
            zero_copy_only=False)
        dst = t.column("dst").combine_chunks().to_numpy(
            zero_copy_only=False)
        return t.append_column(
            "w", pa.array((src * 3 + dst * 5) % 9 + 1, pa.int64()))

    edges = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _weighted_edges, batch_format="pyarrow")
    return sssp_int(edges, seeds=[0, 1], rounds=8).sort("node")


ORACLE_SQL["sssp"] = """
WITH RECURSIVE e AS (
  SELECT doc_id % 200 AS src, (doc_id * 7) % 200 AS dst FROM documents
  UNION ALL
  SELECT doc_id % 200, (doc_id % 200 + 3) % 200 FROM documents
), we AS (
  SELECT DISTINCT src, dst, (src * 3 + dst * 5) % 9 + 1 AS w FROM e
), walk(node, dist, depth) AS (
  SELECT unnest([0, 1]) AS node, 0 AS dist, 0 AS depth
  UNION
  SELECT we.dst, w.dist + we.w, w.depth + 1 FROM walk w
  JOIN we ON we.src = w.node WHERE w.depth < 8
)
SELECT CAST(node AS BIGINT) AS node, CAST(min(dist) AS BIGINT) AS dist
FROM walk GROUP BY node ORDER BY node
"""
QUERIES["sssp"] = q_sssp


# --------------------------------------------- URL canonicalization

def _aliased_urls(batch: pa.Table) -> pa.Table:
    """Deterministic alias-variant urls: shared paths (collisions),
    tracking params, trailing slashes, fragments, www labels, :80
    ports, uppercased hosts — one plant family per modulus so every
    canonicalization rule is load-bearing."""
    ids = batch.column("doc_id")
    hot = pc.equal(_int_mod(ids, 3), 0)
    hid = pc.if_else(hot, pa.scalar(0, pa.int64()), _int_mod(ids, 97))
    host = pc.binary_join_element_wise(
        "host", pc.cast(hid, pa.string()), ".example.com", "")
    host = pc.if_else(pc.equal(_int_mod(ids, 8), 6),
                      pc.utf8_upper(host), host)
    host = pc.if_else(
        pc.equal(_int_mod(ids, 7), 3),
        pc.binary_join_element_wise("www.", host, ""), host)
    port = pc.if_else(pc.equal(_int_mod(ids, 9), 5),
                      pa.scalar(":80"), pa.scalar(""))
    path = pc.if_else(
        pc.less(_int_mod(ids, 10), 2), pa.scalar("/home"),
        pc.binary_join_element_wise(
            "/p/", pc.cast(ids, pa.string()), ""))
    path = pc.if_else(
        pc.equal(_int_mod(ids, 5), 2),
        pc.binary_join_element_wise(path, "/", ""), path)
    q = pc.if_else(pc.equal(_int_mod(ids, 4), 1),
                   pa.scalar("?utm_source=feed&b=2&a=1"),
                   pa.scalar(""))
    frag = pc.if_else(pc.equal(_int_mod(ids, 6), 4),
                      pa.scalar("#frag"), pa.scalar(""))
    url = pc.binary_join_element_wise(
        "http://", host, port, path, q, frag, "")
    return pa.table({"doc_id": ids, "url": url})


def q_canonical_url(sf_dir: str):
    """URL canonicalization (`stages/web.canonical_url_fn`): the
    alias-collapsing dedup key over a crawl with planted fragment /
    www / port / case / tracking-param / trailing-slash variants."""
    from .stages.web import canonical_url_fn

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aliased_urls, batch_format="pyarrow")
    return ds.map_batches(
        lambda b: canonical_url_fn(b), batch_format="pyarrow"
    ).select_columns(["doc_id", "canonical"]).sort("doc_id")


def q_canonical_dup_groups(sf_dir: str):
    """Alias groups: canonical keys claimed by more than one raw url
    — what exact URL dedup MISSES without canonicalization. Map-side
    partial combine, one canonical-key groupby."""
    from .stages.web import canonical_url_fn

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _aliased_urls, batch_format="pyarrow").map_batches(
        lambda b: canonical_url_fn(b), batch_format="pyarrow")

    def _partial(batch: pa.Table) -> pa.Table:
        agg = batch.select(["canonical", "doc_id"]).group_by(
            ["canonical"]).aggregate([("doc_id", "count"),
                                      ("doc_id", "min")])
        return pa.table({
            "canonical": agg.column("canonical"),
            "n": pc.cast(agg.column("doc_id_count"), pa.int64()),
            "m": pc.cast(agg.column("doc_id_min"), pa.int64()),
        })

    agg = (ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("canonical")
           .aggregate(Sum("n"), ray.data.aggregate.Min("m")))

    def _finish(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "canonical": batch.column("canonical"),
            "n_docs": pc.cast(batch.column("sum(n)"), pa.int64()),
            "min_doc": pc.cast(batch.column("min(m)"), pa.int64()),
        })
        return t.filter(pc.greater(t.column("n_docs"), 1))

    return agg.map_batches(
        _finish, batch_format="pyarrow").sort("canonical")


# SQL twin of _aliased_urls + canonical_url_fn (same RE2 chain)
_ALIASED_URL_SQL = (
    "'http://' || CASE WHEN doc_id % 7 = 3 THEN 'www.' ELSE '' END "
    "|| CASE WHEN doc_id % 8 = 6 THEN upper(h) ELSE h END "
    "|| CASE WHEN doc_id % 9 = 5 THEN ':80' ELSE '' END "
    "|| p || CASE WHEN doc_id % 5 = 2 THEN '/' ELSE '' END "
    "|| CASE WHEN doc_id % 4 = 1 THEN '?utm_source=feed&b=2&a=1' "
    "ELSE '' END "
    "|| CASE WHEN doc_id % 6 = 4 THEN '#frag' ELSE '' END"
)

_CANONICAL_SQL = r"""
WITH u0 AS (
  SELECT doc_id,
    'host' || CAST(CASE WHEN doc_id % 3 = 0 THEN 0
                   ELSE doc_id % 97 END AS VARCHAR)
      || '.example.com' AS h,
    CASE WHEN doc_id % 10 < 2 THEN '/home'
         ELSE '/p/' || CAST(doc_id AS VARCHAR) END AS p
  FROM documents
), u AS (
  SELECT doc_id, {alias} AS url FROM u0
), s1 AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u1 FROM u
), s2 AS (
  SELECT doc_id, url,
    lower(regexp_extract(u1,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*'))
    || regexp_replace(u1,
      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*', '') AS u2
  FROM s1
), s3 AS (
  SELECT doc_id, url, regexp_replace(regexp_replace(regexp_replace(
    u2, '^(http://[^:/?]+):80([/?]|$)', '\1\2'),
        '^(https://[^:/?]+):443([/?]|$)', '\1\2'),
        '^(https?://)www\.', '\1') AS u3
  FROM s2
), s4 AS (
  SELECT doc_id, url,
    CASE WHEN contains(u3, '?') THEN
      string_split(u3, '?')[1] ||
      CASE WHEN qf <> '' THEN '?' || qf ELSE '' END
    ELSE u3 END AS u4
  FROM (
    SELECT doc_id, url, u3,
      CASE WHEN contains(u3, '?') THEN array_to_string(
        list_sort(list_filter(
          string_split(string_split(u3, '?')[2], '&'),
          x -> x <> '' AND NOT regexp_matches(x,
            '^(utm_[a-z0-9]*|fbclid|gclid|ref)='))), '&')
      ELSE '' END AS qf
    FROM s3)
)
SELECT doc_id, url,
  regexp_replace(regexp_replace(u4, '/$', ''), '/\?', '?')
    AS canonical
FROM s4
""".format(alias=_ALIASED_URL_SQL)

ORACLE_SQL["canonical_url"] = (
    "WITH c AS (" + _CANONICAL_SQL + ") "
    "SELECT doc_id, canonical FROM c ORDER BY doc_id"
)
QUERIES["canonical_url"] = q_canonical_url

ORACLE_SQL["canonical_dup_groups"] = (
    "WITH c AS (" + _CANONICAL_SQL + ") "
    "SELECT canonical, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(min(doc_id) AS BIGINT) AS min_doc FROM c "
    "GROUP BY canonical HAVING count(*) > 1 ORDER BY canonical"
)
QUERIES["canonical_dup_groups"] = q_canonical_dup_groups


# --------------------------------- intra-document repeated paragraphs

def q_intradoc_dedup(sf_dir: str):
    """Within-doc repeated-paragraph removal
    (`stages/dedup.intradoc_dedup_fn` — the Dolma/RefinedWeb page-
    internal dedup rule, row-local complement of `paragraph_dedup`).
    Plant: every doc gets a promo paragraph twice, and every third
    doc repeats its own body."""
    from .stages.dedup import intradoc_dedup_fn

    sep = "\n\n"

    def _aug(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        body = pc.fill_null(batch.column("text"), "")
        rep = pc.if_else(
            pc.equal(_int_mod(ids, 3), 0),
            pc.binary_join_element_wise(sep, body, ""),
            pa.scalar(""))
        t = pc.binary_join_element_wise(
            "promo", sep, body, sep, "promo", rep, sep,
            "tail ", pc.cast(_int_mod(ids, 5), pa.string()), "")
        return pa.table({"doc_id": ids, "text": t})

    return _docs(sf_dir).map_batches(
        _aug, batch_format="pyarrow"
    ).map_batches(
        lambda b: intradoc_dedup_fn(b), batch_format="pyarrow"
    ).sort("doc_id")


ORACLE_SQL["intradoc_dedup"] = """
WITH aug AS (
  SELECT doc_id, 'promo' || chr(10) || chr(10) ||
    coalesce(text, '') || chr(10) || chr(10) || 'promo' ||
    CASE WHEN doc_id % 3 = 0
         THEN chr(10) || chr(10) || coalesce(text, '')
         ELSE '' END ||
    chr(10) || chr(10) || 'tail ' || CAST(doc_id % 5 AS VARCHAR)
    AS t
  FROM documents
), p AS (
  SELECT doc_id, g - 1 AS para_idx, paras[g] AS para
  FROM (SELECT doc_id, string_split(t, chr(10) || chr(10)) AS paras
        FROM aug),
  LATERAL unnest(range(1, len(paras) + 1)) AS r(g)
), f AS (
  SELECT doc_id, para_idx, para, row_number() OVER
    (PARTITION BY doc_id, para ORDER BY para_idx) AS rn,
    count(*) OVER (PARTITION BY doc_id) AS n_paras
  FROM p
)
SELECT doc_id,
  string_agg(para, chr(10) || chr(10) ORDER BY para_idx)
    AS text_dedup,
  CAST(count(*) AS BIGINT) AS n_kept,
  CAST(any_value(n_paras) - count(*) AS BIGINT) AS n_dropped
FROM f WHERE rn = 1 GROUP BY doc_id ORDER BY doc_id
"""
QUERIES["intradoc_dedup"] = q_intradoc_dedup


# ------------------------------------------ JL random projection

def q_random_projection(sf_dir: str):
    """±1 random-projection codes (16 dims) over the embedding
    corpus (`stages/similarity.random_projection`): the JL
    dim-reduction front end, exact-int64 so the unnest-join twin is
    bit-exact."""
    from .stages.similarity import random_projection

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return random_projection(ds, d_out=16).sort(["vec_id", "dim"])


ORACLE_SQL["random_projection"] = """
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS j,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         AS BIGINT) AS x
  FROM embeddings
), p AS (
  SELECT j.j, k.k,
    CASE WHEN substr(md5(CAST(j.j AS VARCHAR) || ':' ||
      CAST(k.k AS VARCHAR)), 1, 1)
      IN ('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END AS s
  FROM (SELECT unnest(range(1, 65)) AS j) j,
       (SELECT unnest(range(1, 17)) AS k) k
)
SELECT v.vec_id, CAST(p.k AS BIGINT) AS dim,
  CAST(sum(v.x * p.s) AS BIGINT) AS x
FROM v JOIN p ON p.j = v.j
GROUP BY v.vec_id, p.k ORDER BY v.vec_id, p.k
"""
QUERIES["random_projection"] = q_random_projection


# --------------------------------------- real image resize (NN pixels)

def q_image_resize(sf_dir: str):
    """REAL nearest-neighbor image resize over real decoded pixels
    (`stages/multimodal.ImageResizer` actor pool): every doc becomes
    a deterministic gradient PGM with formula-driven dims (plus a
    pass-through small-image plant), the pool decodes, resamples with
    exact-integer geometry and emits an order-sensitive pixel
    checksum the DuckDB twin recomputes from the FORMULA — a
    header-faking resizer cannot match it."""
    import numpy as np

    from .stages.multimodal import encode_pgm, image_resize_stage

    def _to_images(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        payloads = []
        for i in ids:
            if i % 11 == 5:
                w, h = 9, 6
            else:
                w, h = 12 + (i % 5) * 3, 8 + (i % 7) * 2
            ys, xs = np.mgrid[0:h, 0:w]
            payloads.append(
                encode_pgm(w, h, (11 * i + 7 * xs + 13 * ys) % 83))
        return pa.table({
            "media_id": pa.array([f"m{i:06d}" for i in ids],
                                 pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    imgs = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _to_images, batch_format="pyarrow")
    return image_resize_stage(imgs, max_side=10).select_columns(
        ["media_id", "width", "height", "target_w", "target_h",
         "checksum"]).sort("media_id")


ORACLE_SQL["image_resize"] = """
WITH d AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 5 THEN 9
         ELSE 12 + (doc_id % 5) * 3 END AS w,
    CASE WHEN doc_id % 11 = 5 THEN 6
         ELSE 8 + (doc_id % 7) * 2 END AS h
  FROM documents
), t AS (
  SELECT doc_id, w, h,
    CASE WHEN greatest(w, h) <= 10 THEN w
         ELSE greatest(1, w * 10 // greatest(w, h)) END AS tw,
    CASE WHEN greatest(w, h) <= 10 THEN h
         ELSE greatest(1, h * 10 // greatest(w, h)) END AS th
  FROM d
), g AS (
  SELECT doc_id, w, h, tw, th, xp.x, yp.y,
    (xp.x * w) // tw AS sx, (yp.y * h) // th AS sy
  FROM t,
  LATERAL unnest(range(0, tw)) AS xp(x),
  LATERAL unnest(range(0, th)) AS yp(y)
)
SELECT 'm' || lpad(CAST(doc_id AS VARCHAR), 6, '0') AS media_id,
  CAST(any_value(w) AS BIGINT) AS width,
  CAST(any_value(h) AS BIGINT) AS height,
  CAST(any_value(tw) AS BIGINT) AS target_w,
  CAST(any_value(th) AS BIGINT) AS target_h,
  CAST(sum(((11 * doc_id + 7 * sx + 13 * sy) % 83)
           * (1 + x + 31 * y)) AS BIGINT) AS checksum
FROM g GROUP BY doc_id ORDER BY media_id
"""
QUERIES["image_resize"] = q_image_resize


# ------------------------------------------ crawl politeness slots

def q_politeness_plan(sf_dir: str):
    """Per-host rate-limited fetch-slot scheduling
    (`stages/web.politeness_plan`, rate 3/slot) over the skewed
    synthetic crawl — the dispatch-plan load curve whose tail slot
    count is the hot host's makespan."""
    from .stages.web import politeness_plan, url_host_fn

    ds = _docs(sf_dir, columns=["doc_id"]).map_batches(
        _url_augment, batch_format="pyarrow"
    ).map_batches(lambda b: url_host_fn(b), batch_format="pyarrow")
    return politeness_plan(
        ds, rate=3).sort("slot")


ORACLE_SQL["politeness_plan"] = (
    "WITH u AS (SELECT doc_id, 'host' || CAST(" + _HOST_ID_SQL +
    " AS VARCHAR) || '.example.com' AS host FROM documents), "
    "r AS (SELECT doc_id, host, row_number() OVER "
    "(PARTITION BY host ORDER BY doc_id) - 1 AS rn FROM u), "
    "s AS (SELECT host, rn // 3 AS slot, count(*) AS n FROM r "
    "GROUP BY host, rn // 3) "
    "SELECT CAST(slot AS BIGINT) AS slot, "
    "CAST(sum(n) AS BIGINT) AS n_fetches, "
    "CAST(count(*) AS BIGINT) AS n_hosts "
    "FROM s GROUP BY slot ORDER BY slot"
)
QUERIES["politeness_plan"] = q_politeness_plan


# ------------------------------------ streaming watermark windows

def q_watermark_windows(sf_dir: str):
    """Event-time tumbling windows with watermark semantics
    (`stages/temporal.watermark_windows`, lateness 2h): planted
    disorder — every 13th event arrives with a 3h-stale event time
    (LATE), every 11th with 1h (reordered but inside the watermark,
    stays on-time). The batch replay of streaming window/late-data
    handling; bit-exact vs the running-max window twin."""
    from .stages.temporal import watermark_windows

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "event_type"])

    h_us = 3_600_000_000

    def _plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id")
        ts = pc.cast(pc.cast(batch.column("ts"), pa.timestamp("us")),
                     pa.int64())
        ts = pc.if_else(
            pc.equal(_int_mod(ids, 13), 7),
            pc.subtract(ts, pa.scalar(3 * h_us, pa.int64())),
            pc.if_else(
                pc.equal(_int_mod(ids, 11), 4),
                pc.subtract(ts, pa.scalar(h_us, pa.int64())), ts))
        return pa.table({
            "event_id": ids,
            "ts": pc.cast(ts, pa.timestamp("us")),
            "event_type": batch.column("event_type"),
        })

    planted = ds.map_batches(_plant, batch_format="pyarrow")
    return watermark_windows(
        planted, lateness_us=2 * h_us).sort(["hour", "event_type"])


ORACLE_SQL["watermark_windows"] = """
WITH p AS (
  SELECT event_id,
    CASE WHEN event_id % 13 = 7 THEN ts - INTERVAL 3 HOUR
         WHEN event_id % 11 = 4 THEN ts - INTERVAL 1 HOUR
         ELSE ts END AS ts,
    event_type
  FROM events
), w AS (
  SELECT event_id, ts, event_type,
    max(ts) OVER (ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
  FROM p
), f AS (
  SELECT date_trunc('hour', ts) AS hour, event_type,
    CASE WHEN wm IS NOT NULL AND ts + INTERVAL 2 HOUR < wm
         THEN 1 ELSE 0 END AS late
  FROM w
)
SELECT CAST(hour AS TIMESTAMP) AS hour, event_type,
  CAST(sum(1 - late) AS BIGINT) AS n_ontime,
  CAST(sum(late) AS BIGINT) AS n_late
FROM f GROUP BY hour, event_type ORDER BY hour, event_type
"""
QUERIES["watermark_windows"] = q_watermark_windows


# ------------------------------------------ Merkle bucket repair plan

def q_store_repair_plan(sf_dir: str):
    """Anti-entropy repair plan between two replicas of the orders
    table (`stages/stats.bucket_checksums`): the replica drops every
    97th order and corrupts every 89th order's status; per-bucket
    Merkle checksums disagree exactly where damage landed, and the
    plan lists ONLY those buckets — matching data never rescanned."""
    from .stages.stats import bucket_checksums

    cols = ["o_orderkey", "o_custkey", "o_orderstatus",
            "o_orderpriority"]
    src = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=cols)

    def _replica(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(
            _int_mod(batch.column("o_orderkey"), 97), 13))
        b = batch.filter(keep)
        corrupt = pc.equal(_int_mod(b.column("o_orderkey"), 89), 7)
        status = pc.if_else(corrupt, pa.scalar("X"),
                            b.column("o_orderstatus"))
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "o_orderstatus": status,
            "o_orderpriority": b.column("o_orderpriority"),
        })

    dst = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=cols).map_batches(
        _replica, batch_format="pyarrow")

    a = bucket_checksums(src, "o_orderkey", cols, n_buckets=32
                         ).to_pandas().set_index("bucket")
    b = bucket_checksums(dst, "o_orderkey", cols, n_buckets=32
                         ).to_pandas().set_index("bucket")
    # buckets-scale driver fold: the whole point of the Merkle level
    rows = []
    for bk in sorted(set(a.index) | set(b.index)):
        an = int(a["n_rows"].get(bk, 0))
        bn = int(b["n_rows"].get(bk, 0))
        ac = int(a["checksum"].get(bk, -1))
        bc = int(b["checksum"].get(bk, -1))
        if an != bn or ac != bc:
            rows.append((bk, an, bn, ac, bc))
    return pa.table({
        "bucket": pa.array([r[0] for r in rows], pa.int64()),
        "n_src": pa.array([r[1] for r in rows], pa.int64()),
        "n_dst": pa.array([r[2] for r in rows], pa.int64()),
        "src_checksum": pa.array([r[3] for r in rows], pa.int64()),
        "dst_checksum": pa.array([r[4] for r in rows], pa.int64()),
    })


_BUCKET_CHECKSUM_SQL = (
    "SELECT o_orderkey % 32 AS bucket, "
    "CAST(count(*) AS BIGINT) AS n, "
    "CAST(sum(CAST(('0x' || substr(md5("
    "COALESCE(CAST(o_orderkey AS VARCHAR), chr(30)) || chr(31) || "
    "COALESCE(CAST(o_custkey AS VARCHAR), chr(30)) || chr(31) || "
    "COALESCE(o_orderstatus, chr(30)) || chr(31) || "
    "COALESCE(o_orderpriority, chr(30)) || chr(31)), 1, 15)) "
    "AS UBIGINT)) % 9223372036854775808 AS BIGINT) AS cs "
    "FROM {src} GROUP BY o_orderkey % 32"
)

ORACLE_SQL["store_repair_plan"] = (
    "WITH replica AS (SELECT o_orderkey, o_custkey, "
    "CASE WHEN o_orderkey % 89 = 7 THEN 'X' ELSE o_orderstatus END "
    "AS o_orderstatus, o_orderpriority "
    "FROM orders WHERE o_orderkey % 97 != 13), "
    "a AS (" + _BUCKET_CHECKSUM_SQL.format(src="orders") + "), "
    "b AS (" + _BUCKET_CHECKSUM_SQL.format(src="replica") + ") "
    "SELECT COALESCE(a.bucket, b.bucket) AS bucket, "
    "COALESCE(a.n, 0) AS n_src, COALESCE(b.n, 0) AS n_dst, "
    "COALESCE(a.cs, -1) AS src_checksum, "
    "COALESCE(b.cs, -1) AS dst_checksum "
    "FROM a FULL JOIN b ON a.bucket = b.bucket "
    "WHERE COALESCE(a.n, 0) != COALESCE(b.n, 0) "
    "OR COALESCE(a.cs, -1) != COALESCE(b.cs, -1) "
    "ORDER BY bucket"
)
QUERIES["store_repair_plan"] = q_store_repair_plan


# -------------------------------------------- Bloom runtime filter

def q_bloom_join_revenue(sf_dir: str):
    """Runtime-filter (Bloom-pushdown) join
    (`stages/join.bloom_join`): urgent orders (selective dim side)
    join the lineitem fact side; fact rows that cannot match are cut
    AT SCAN SPEED before the shuffle, the survivors take the exact
    repartition join, and revenue rolls up by order status —
    integer-cents exact."""
    from .stages.join import bloom_join

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_orderpriority"])
    urgent = orders.filter(
        expr="o_orderpriority == '1-URGENT'").select_columns(
        ["o_orderkey", "o_orderstatus"])
    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice"])

    def _prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": batch.column("l_orderkey"),
            "price_c": pc.cast(pc.round(pc.multiply(
                batch.column("l_extendedprice"), 100.0)),
                pa.int64()),
        })

    joined = bloom_join(
        items.map_batches(_prep, batch_format="pyarrow"), urgent,
        on="o_orderkey", how="inner", n_bits=1 << 16)

    def _partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(["o_orderstatus"]).aggregate(
            [("price_c", "sum"), ([], "count_all")])
        return pa.table({
            "o_orderstatus": agg.column("o_orderstatus"),
            "s": agg.column("price_c_sum"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = joined.map_batches(
        _partial, batch_format="pyarrow").groupby(
        "o_orderstatus").aggregate(Sum("s"), Sum("n"))

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": batch.column("o_orderstatus"),
            "n_items": pc.cast(batch.column("sum(n)"), pa.int64()),
            "revenue": pa.array(
                [float(v) / 100.0
                 for v in batch.column("sum(s)").to_pylist()],
                pa.float64()),
        })

    return agg.map_batches(
        _finish, batch_format="pyarrow").sort("o_orderstatus")


ORACLE_SQL["bloom_join_revenue"] = """
WITH urgent AS (
  SELECT o_orderkey, o_orderstatus FROM orders
  WHERE o_orderpriority = '1-URGENT'
), j AS (
  SELECT u.o_orderstatus,
    CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS price_c
  FROM lineitem l JOIN urgent u ON l.l_orderkey = u.o_orderkey
)
SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_items,
  CAST(sum(price_c) AS DOUBLE) / 100.0 AS revenue
FROM j GROUP BY o_orderstatus ORDER BY o_orderstatus
"""
QUERIES["bloom_join_revenue"] = q_bloom_join_revenue


# ------------------------------------------ embedding Gram matrix

def q_embedding_covariance(sf_dir: str):
    """Second-moment (Gram) matrix over the embedding corpus
    (`stages/similarity.embedding_second_moment`) — the PCA /
    whitening sufficient statistic, one matrix-partial per block,
    driver fold, no shuffle; exact int64 so the unnest self-join
    twin is bit-exact."""
    from .stages.similarity import embedding_second_moment

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["embedding"])
    return embedding_second_moment(ds)


ORACLE_SQL["embedding_covariance"] = """
WITH v AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS d,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         AS BIGINT) AS x
  FROM embeddings
)
SELECT a.d AS i, b.d AS j, CAST(sum(a.x * b.x) AS BIGINT) AS s
FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.d <= b.d
GROUP BY a.d, b.d ORDER BY i, j
"""
QUERIES["embedding_covariance"] = q_embedding_covariance


# --------------------------------------- stratified weighted sample

def q_stratified_priority_sample(sf_dir: str):
    """Per-language weighted exact-k sample
    (`stages/stats.grouped_priority_sample`, k=7 per lang, weight =
    n_chars): the training-mix stratified sampler — hash coins, no
    RNG, layout-independent."""
    from .stages.stats import grouped_priority_sample

    ds = _docs(sf_dir, columns=["doc_id", "lang", "n_chars"])
    return grouped_priority_sample(
        ds, k=7, group_col="lang", key_col="doc_id",
        weight_col="n_chars").select_columns(
        ["doc_id", "lang", "n_chars"]).sort("doc_id")


ORACLE_SQL["stratified_priority_sample"] = (
    "WITH p AS (SELECT doc_id, lang, n_chars, "
    "-ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    " AS UBIGINT) + 1.0) / 1152921504606846976.0) / n_chars AS pri "
    "FROM documents WHERE lang IS NOT NULL AND n_chars > 0) "
    "SELECT doc_id, lang, n_chars FROM p "
    "QUALIFY row_number() OVER (PARTITION BY lang "
    "ORDER BY pri, doc_id) <= 7 ORDER BY doc_id"
)
QUERIES["stratified_priority_sample"] = q_stratified_priority_sample


# ------------------------------------------ rolling percentile (p95)

def q_rolling_p95(sf_dir: str):
    """Rolling p95 of event values over the trailing 6 hours per
    event type (`stages/temporal.rolling_percentile`, bin width 25 —
    bin-exact, all-integer): the ops-monitoring window statistic,
    windows anchored on hours with activity."""
    from .stages.temporal import rolling_percentile

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "event_type", "value"])
    return rolling_percentile(ds).sort(["event_type", "hour"])


ORACLE_SQL["rolling_p95"] = """
WITH b AS (
  SELECT event_type AS k, date_trunc('hour', ts) AS h,
    CAST(floor(value / 25.0) AS BIGINT) AS bin, count(*) AS n
  FROM events GROUP BY 1, 2, 3
), anchors AS (
  SELECT DISTINCT k, h FROM b
), w AS (
  SELECT a.k, a.h, b.bin, sum(b.n) AS n
  FROM anchors a JOIN b ON b.k = a.k
    AND b.h BETWEEN a.h - INTERVAL 5 HOUR AND a.h
  GROUP BY a.k, a.h, b.bin
), c AS (
  SELECT k, h, bin, n,
    sum(n) OVER (PARTITION BY k, h ORDER BY bin) AS cum,
    sum(n) OVER (PARTITION BY k, h) AS tot
  FROM w
)
SELECT k AS event_type, CAST(h AS TIMESTAMP) AS hour,
  CAST(any_value(tot) AS BIGINT) AS n_window,
  CAST(min(bin) FILTER (WHERE cum * 100 >= tot * 95) AS BIGINT)
    AS p_bin
FROM c GROUP BY k, h ORDER BY event_type, hour
"""
QUERIES["rolling_p95"] = q_rolling_p95


# ------------------------------------------ embedding outlier gate

def q_embedding_outliers(sf_dir: str):
    """Embedding outlier detection — vectors far from their own
    label's centroid (the mislabeled/garbage-vector curation gate):
    integer centroids (trunc-div of exact sums — one blocks-scale
    partial fold, no shuffle), exact int64 squared-L2 per vector
    with the labels×dim centroid table in the closure, exact global
    p90 cut (`stages/stats.exact_quantiles` percentile_disc
    semantics), one scan-speed flag pass. Everything integer ⇒ the
    SQL twin is bit-exact."""
    import numpy as np

    from .stages.similarity import _to_matrix
    from .stages.stats import exact_quantiles

    scale = 1_000_000
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "label", "embedding"])

    def _cent_partial(batch: pa.Table) -> pa.Table:
        labels = batch.column("label").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        q = np.floor(_to_matrix(batch.column("embedding")) * scale
                     ).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), q.shape[1]), np.int64)
        np.add.at(sums, inv, q)
        counts = np.bincount(inv, minlength=len(uniq))
        dim = q.shape[1]
        return pa.table({
            "label": pa.array(np.repeat(uniq, dim), pa.int64()),
            "d": pa.array(np.tile(np.arange(dim), len(uniq)),
                          pa.int64()),
            "s": pa.array(sums.reshape(-1), pa.int64()),
            "n": pa.array(np.repeat(counts, dim), pa.int64()),
        })

    sums: dict = {}
    ns: dict = {}
    for b in ds.map_batches(_cent_partial,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        for lb, d, s, n in zip(b.column("label").to_pylist(),
                               b.column("d").to_pylist(),
                               b.column("s").to_pylist(),
                               b.column("n").to_pylist()):
            sums[(lb, d)] = sums.get((lb, d), 0) + s
            ns[(lb, d)] = ns.get((lb, d), 0) + n
    labels = sorted({lb for lb, _ in sums})
    dim = 1 + max(d for _, d in sums)
    cent = np.zeros((max(labels) + 1, dim), np.int64)
    for (lb, d), s in sums.items():
        n = ns[(lb, d)]
        # DuckDB // truncates toward zero; Python // floors
        cent[lb, d] = abs(s) // n * (1 if s >= 0 else -1)

    def _dist(batch: pa.Table) -> pa.Table:
        lb = batch.column("label").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        q = np.floor(_to_matrix(batch.column("embedding")) * scale
                     ).astype(np.int64)
        diff = q - cent[lb]
        return pa.table({
            "vec_id": batch.column("vec_id"),
            "label": pa.array(lb, pa.int64()),
            "d2": pa.array((diff * diff).sum(axis=1), pa.int64()),
        })

    # two consumers (p90 cut + outlier filter) over a
    # corpus-row-count distance table: checkpoint, don't pin
    from .stages.bucketed import checkpoint_bucketed
    dist = checkpoint_bucketed(
        ds.map_batches(_dist, batch_format="pyarrow"),
        f"embout_{os.path.basename(os.path.normpath(sf_dir))}",
        key_col="vec_id")
    cut = int(exact_quantiles(dist, "d2", [0.9])
              .column("value")[0].as_py())
    return dist.filter(
        expr=f"d2 > {cut}").select_columns(
        ["vec_id", "label", "d2"]).sort("vec_id")


ORACLE_SQL["embedding_outliers"] = """
WITH v AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) AS d,
    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         AS BIGINT) AS x
  FROM embeddings
), c AS (
  SELECT label, d, sum(x) // count(*) AS cx
  FROM v GROUP BY label, d
), dist AS (
  SELECT v.vec_id, CAST(v.label AS BIGINT) AS label,
    CAST(sum((v.x - c.cx) * (v.x - c.cx)) AS BIGINT) AS d2
  FROM v JOIN c ON c.label = v.label AND c.d = v.d
  GROUP BY v.vec_id, v.label
), q AS (
  SELECT percentile_disc(0.9) WITHIN GROUP (ORDER BY d2) AS t
  FROM dist
)
SELECT vec_id, label, d2 FROM dist, q WHERE d2 > t ORDER BY vec_id
"""
QUERIES["embedding_outliers"] = q_embedding_outliers


# ------------------------------------------ multi-touch attribution

def q_multi_touch_attribution(sf_dir: str):
    """Linear multi-touch attribution
    (`stages/temporal.linear_attribution`, 24h lookback): every
    purchase splits its cents equally across the user's preceding
    clicks — the budget-allocation complement of the last-touch
    `click_attribution`. All-integer credits, bit-exact twin."""
    from .stages.temporal import linear_attribution

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"])
    return linear_attribution(ds).sort("user_id")


ORACLE_SQL["multi_touch_attribution"] = """
WITH c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), p AS (
  SELECT event_id, user_id, ts,
    CAST(round(coalesce(value, 0) * 100.0) AS BIGINT) AS vc
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT p.event_id, p.user_id, p.vc, count(c.ts) AS n
  FROM p LEFT JOIN c ON c.user_id = p.user_id
    AND c.ts >= p.ts - INTERVAL 24 HOUR AND c.ts < p.ts
  GROUP BY p.event_id, p.user_id, p.vc
)
SELECT user_id,
  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_conv_attr,
  CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_conv_orphan,
  CAST(sum(CASE WHEN n > 0 THEN (vc // n) * n ELSE 0 END)
    AS BIGINT) AS attributed_c
FROM t GROUP BY user_id ORDER BY user_id
"""
QUERIES["multi_touch_attribution"] = q_multi_touch_attribution


# ------------------------------------------ column-granular CDC diff

def q_column_diff(sf_dir: str):
    """Column-granular snapshot reconciliation
    (`stages/diff.column_diff`): the replica corrupts status on
    every 89th order and priority on every 83rd (and drops every
    97th — added/removed keys are snapshot_diff's business and stay
    out); the diff names exactly which column changed per key."""
    from .stages.diff import column_diff

    cols = ["o_custkey", "o_orderstatus", "o_orderpriority"]
    src = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey"] + cols)

    def _replica(batch: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(
            _int_mod(batch.column("o_orderkey"), 97), 13))
        b = batch.filter(keep)
        k = b.column("o_orderkey")
        status = pc.if_else(pc.equal(_int_mod(k, 89), 7),
                            pa.scalar("X"), b.column("o_orderstatus"))
        prio = pc.if_else(pc.equal(_int_mod(k, 83), 11),
                          pa.scalar("9-NONE"),
                          b.column("o_orderpriority"))
        return pa.table({
            "o_orderkey": k,
            "o_custkey": b.column("o_custkey"),
            "o_orderstatus": status,
            "o_orderpriority": prio,
        })

    dst = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey"] + cols).map_batches(
        _replica, batch_format="pyarrow")
    return column_diff(src, dst, "o_orderkey", cols).sort(
        ["o_orderkey", "col"])


ORACLE_SQL["column_diff"] = """
WITH replica AS (
  SELECT o_orderkey, o_custkey,
    CASE WHEN o_orderkey % 89 = 7 THEN 'X'
         ELSE o_orderstatus END AS o_orderstatus,
    CASE WHEN o_orderkey % 83 = 11 THEN '9-NONE'
         ELSE o_orderpriority END AS o_orderpriority
  FROM orders WHERE o_orderkey % 97 != 13
), j AS (
  SELECT a.o_orderkey,
    a.o_custkey IS DISTINCT FROM b.o_custkey AS c1,
    a.o_orderstatus IS DISTINCT FROM b.o_orderstatus AS c2,
    a.o_orderpriority IS DISTINCT FROM b.o_orderpriority AS c3
  FROM orders a JOIN replica b USING (o_orderkey)
)
SELECT o_orderkey, col FROM (
  SELECT o_orderkey, 'o_custkey' AS col FROM j WHERE c1
  UNION ALL
  SELECT o_orderkey, 'o_orderstatus' FROM j WHERE c2
  UNION ALL
  SELECT o_orderkey, 'o_orderpriority' FROM j WHERE c3
) ORDER BY o_orderkey, col
"""
QUERIES["column_diff"] = q_column_diff


# ------------------------------------------ TPC-H Q3 shipping priority

Q3_CUTOFF = "1998-06-01 00:00:00"


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape — the classic 3-way join + grouped revenue +
    top-k: BUILDING-segment customers semi-gate orders (broadcast —
    the dimension default), date filters prune both fact scans,
    lineitem revenue joins order keys (broadcast of the filtered
    order side; at 100 TB swap in `bloom_join`/`repartition_join`),
    map-side partial combine per order, tiny groupby, exact-int64
    top-10. Revenue in cents×(100−disc) units ⇒ ordering and values
    bit-exact vs SQL."""
    from .stages.join import broadcast_join

    cutoff = pa.scalar(Q3_CUTOFF).cast(pa.timestamp("us"))

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]).filter(
        expr="c_mktsegment == 'BUILDING'").select_columns(
        ["c_custkey"])

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def _ord_prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less(batch.column("o_orderdate"),
                                 cutoff))
        return pa.table({
            "c_custkey": b.column("o_custkey"),
            "o_orderkey": b.column("o_orderkey"),
            "o_orderdate": b.column("o_orderdate"),
        })

    o_building = broadcast_join(
        orders.map_batches(_ord_prep, batch_format="pyarrow"),
        cust, on="c_custkey", how="semi").select_columns(
        ["o_orderkey", "o_orderdate"])

    items = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"])

    def _item_prep(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch.column("l_shipdate"),
                                    cutoff))
        ext = pc.cast(pc.round(pc.multiply(
            b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            b.column("l_discount"), 100.0)), pa.int64())
        return pa.table({
            "o_orderkey": b.column("l_orderkey"),
            "rev": pc.multiply(ext, pc.subtract(
                pa.scalar(100, pa.int64()), disc)),
        })

    joined = broadcast_join(
        items.map_batches(_item_prep, batch_format="pyarrow"),
        o_building, on="o_orderkey", how="inner")

    def _partial(batch: pa.Table) -> pa.Table:
        agg = batch.group_by(
            ["o_orderkey", "o_orderdate"]).aggregate(
            [("rev", "sum")])
        return pa.table({
            "o_orderkey": agg.column("o_orderkey"),
            "o_orderdate": agg.column("o_orderdate"),
            "rev": agg.column("rev_sum"),
        })

    agg = joined.map_batches(
        _partial, batch_format="pyarrow").groupby(
        ["o_orderkey", "o_orderdate"]).aggregate(Sum("rev"))

    top = agg.sort(
        ["sum(rev)", "o_orderdate", "o_orderkey"],
        descending=[True, False, False]).limit(10)

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(batch.column("o_orderkey"),
                                  pa.int64()),
            "o_orderdate": pc.cast(batch.column("o_orderdate"),
                                   pa.timestamp("us")),
            "revenue": pa.array(
                [float(v) / 10000.0
                 for v in batch.column("sum(rev)").to_pylist()],
                pa.float64()),
        })

    return top.map_batches(_finish, batch_format="pyarrow")


ORACLE_SQL["shipping_priority"] = f"""
WITH c AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
), o AS (
  SELECT o_orderkey, o_orderdate FROM orders
  JOIN c ON o_custkey = c_custkey
  WHERE o_orderdate < TIMESTAMP '{Q3_CUTOFF}'
), l AS (
  SELECT l_orderkey,
    CAST(round(l_extendedprice * 100.0) AS BIGINT)
      * (100 - CAST(round(l_discount * 100.0) AS BIGINT)) AS rev
  FROM lineitem WHERE l_shipdate > TIMESTAMP '{Q3_CUTOFF}'
)
SELECT o.o_orderkey, CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate,
  CAST(sum(l.rev) AS DOUBLE) / 10000.0 AS revenue
FROM l JOIN o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY sum(l.rev) DESC, o.o_orderdate, o.o_orderkey LIMIT 10
"""
QUERIES["shipping_priority"] = q_shipping_priority


# ------------------------------------------ TPC-H Q6 revenue delta

def q_forecast_revenue(sf_dir: str):
    """TPC-H Q6 shape — the pure filter + scalar aggregate: one
    pruned scan, row-local integer-cents revenue terms
    (`ext_c · disc_c`, exact), one-row block partials, driver-side
    exact fold, a single shared float division at the end."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])
    lo = pa.scalar("1999-01-01 00:00:00").cast(pa.timestamp("us"))
    hi = pa.scalar("2000-01-01 00:00:00").cast(pa.timestamp("us"))

    def _partial(batch: pa.Table) -> pa.Table:
        def cents(col):
            return pc.cast(pc.round(pc.multiply(
                batch.column(col), 100.0)), pa.int64())

        disc = cents("l_discount")
        qty = cents("l_quantity")
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(batch.column("l_shipdate"), lo),
                pc.less(batch.column("l_shipdate"), hi)),
            pc.and_(
                pc.and_(pc.greater_equal(disc, 5),
                        pc.less_equal(disc, 7)),
                pc.less(qty, 2400)))
        ext = pc.cast(pc.round(pc.multiply(
            batch.column("l_extendedprice"), 100.0)), pa.int64())
        rev = pc.multiply(ext, disc).filter(keep)
        s = pc.sum(rev).as_py() or 0
        return pa.table({"s": pa.array([s], pa.int64()),
                         "n": pa.array([rev.length()], pa.int64())})

    total = 0
    n = 0
    for b in ds.map_batches(_partial,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow", batch_size=None):
        total += sum(b.column("s").to_pylist())
        n += sum(b.column("n").to_pylist())
    return pa.table({
        "revenue": pa.array([float(total) / 10000.0], pa.float64()),
        "n_items": pa.array([n], pa.int64()),
    })


ORACLE_SQL["forecast_revenue"] = """
WITH f AS (
  SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT)
         * CAST(round(l_discount * 100.0) AS BIGINT) AS rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '2000-01-01 00:00:00'
    AND CAST(round(l_discount * 100.0) AS BIGINT) BETWEEN 5 AND 7
    AND CAST(round(l_quantity * 100.0) AS BIGINT) < 2400
)
SELECT CAST(coalesce(sum(rev), 0) AS DOUBLE) / 10000.0 AS revenue,
  CAST(count(*) AS BIGINT) AS n_items
FROM f
"""
QUERIES["forecast_revenue"] = q_forecast_revenue


# ------------------------------------------ grouped geometric mean

def q_events_geomean(sf_dir: str):
    """Geometric mean of event values per type — the
    multiplicative-scale aggregate (latencies, ratios): map-side
    (type, Σln, n) partials, one tiny groupby, finish =
    ``exp(s/n)`` on the repo-wide 1e-6 grid (the `events_hourly`
    float contract: order-dependent ulps live far below the grid).
    Non-positive values are excluded (SQL ln domain)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_type", "value"])

    def _partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.greater(batch.column("value"), 0.0))
        t = pa.table({
            "event_type": b.column("event_type"),
            "lv": pc.ln(pc.cast(b.column("value"), pa.float64())),
        })
        agg = t.group_by(["event_type"]).aggregate(
            [("lv", "sum"), ([], "count_all")])
        return pa.table({
            "event_type": agg.column("event_type"),
            "s": agg.column("lv_sum"),
            "n": pc.cast(agg.column("count_all"), pa.int64()),
        })

    agg = ds.map_batches(_partial, batch_format="pyarrow").groupby(
        "event_type").aggregate(Sum("s"), Sum("n"))

    def _finish(batch: pa.Table) -> pa.Table:
        s = batch.column("sum(s)").to_pylist()
        n = batch.column("sum(n)").to_pylist()
        gm = [math.floor(math.exp(a / b) * 1e6 + 0.5) / 1e6
              for a, b in zip(s, n)]
        return pa.table({
            "event_type": batch.column("event_type"),
            "n_events": pc.cast(batch.column("sum(n)"), pa.int64()),
            "geo_mean": pa.array(gm, pa.float64()),
        })

    return agg.map_batches(
        _finish, batch_format="pyarrow").sort("event_type")


ORACLE_SQL["events_geomean"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
  floor(exp(sum(ln(value)) / count(*)) * 1000000.0 + 0.5)
    / 1000000.0 AS geo_mean
FROM events WHERE value > 0
GROUP BY event_type ORDER BY event_type
"""
QUERIES["events_geomean"] = q_events_geomean
