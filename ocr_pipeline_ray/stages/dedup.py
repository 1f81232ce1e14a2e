"""Deduplication operators: exact, MinHash/LSH, SimHash, n-gram Jaccard.

Scale shape (10^12-row design notes):

* Exact dedup hash-partitions on the content fingerprint — the ONE
  shuffle — then keeps the first row per group (D1 first-wins
  semantics, `/root/reference/ocr_pipeline.py:335`).
* MinHash near-dup shuffles only ``(band_hash → doc_id)`` pairs
  (bytes per doc, not the documents), groups by band, and emits
  candidate pairs inside each bucket; a hot bucket is bounded by
  ``max_bucket`` to keep the pair blow-up polynomial-safe.
* Hash functions are md5-based so the DuckDB oracle can reproduce
  them exactly (md5 hex strings compare lexicographically the same
  in Python and SQL).
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional

import pyarrow as pa

from ray.data.aggregate import Count, Min


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


# ---------------------------------------------------------------- exact

def fingerprint_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append ``fp`` = md5(text) (hex) — the exact-dedup key."""
    texts = batch.column(text_col).to_pylist()
    fps = [_md5(t or "") for t in texts]
    return batch.append_column("fp", pa.array(fps, pa.string()))


def exact_dedup_summary(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-content-group summary: fp, keep_id=min(id), n_dups=count.

    One hash-partition shuffle on ``fp``; the map side ships only
    (fp, id) — content never moves.
    """
    with_fp = ds.map_batches(
        lambda b: fingerprint_fn(b, text_col), batch_format="pyarrow"
    ).select_columns(["fp", id_col])
    agg = with_fp.groupby("fp").aggregate(Min(id_col), Count())

    def _rename(batch: pa.Table) -> pa.Table:
        mapping = {
            f"min({id_col})": "keep_id",
            "count()": "n_dups",
        }
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names]
        )

    return agg.map_batches(_rename, batch_format="pyarrow")


def dedup_first(ds, key_col: str = "url", order_col: str = "warc_ts"):
    """Keep one full row per key: the minimum ``order_col`` wins.

    The engine's D1 analogue for duplicate urls. Shuffles full rows
    once, hash-partitioned by key.
    """
    import pandas as pd

    def _first(group: pd.DataFrame) -> pd.DataFrame:
        idx = group[order_col].idxmin()
        return group.loc[[idx]]

    return ds.groupby(key_col).map_groups(_first)


# -------------------------------------------------------------- minhash

def shingles(tokens: List[str], k: int = 3) -> List[str]:
    return [
        " ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)
    ] if len(tokens) >= k else []


def minhash_signature(text: str, n_hashes: int = 4, k: int = 3) -> List[Optional[str]]:
    """Bottom-1 md5 minhash per salt — ``n_hashes`` band values.

    min() over hex digests = lexicographic min, matching DuckDB's
    ``list_min(list_transform(shingles, s -> md5(salt || '|' || s)))``.
    """
    toks = text.split(" ")
    sh = shingles(toks, k)
    if not sh:
        return [None] * n_hashes
    return [min(_md5(f"{i}|{s}") for s in sh) for i in range(n_hashes)]


def minhash_fn(batch: pa.Table, text_col: str = "text", n_hashes: int = 4, k: int = 3) -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    sigs = [minhash_signature(t or "", n_hashes, k) for t in texts]
    out = batch
    for i in range(n_hashes):
        out = out.append_column(
            f"h{i}", pa.array([s[i] for s in sigs], pa.string())
        )
    return out


def minhash_signatures(ds, id_col: str = "doc_id", text_col: str = "text",
                       n_hashes: int = 4, k: int = 3):
    """doc_id + h0..h{n-1} minhash band values (no shuffle)."""
    return ds.map_batches(
        lambda b: minhash_fn(b, text_col, n_hashes, k),
        batch_format="pyarrow",
    ).select_columns([id_col] + [f"h{i}" for i in range(n_hashes)])


def minhash_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      n_hashes: int = 4, k: int = 3, max_bucket: int = 1000):
    """Candidate near-duplicate pairs: docs sharing ANY band value.

    band explode → groupby(band_hash) → in-bucket pair expansion →
    global pair dedup. Two small shuffles over (hash, id) pairs only.
    ``max_bucket`` caps degenerate buckets (hot-key guard).
    """
    import pandas as pd

    sigs = minhash_signatures(ds, id_col, text_col, n_hashes, k)

    def _explode(batch: pa.Table) -> pa.Table:
        ids, bands = [], []
        id_vals = batch.column(id_col).to_pylist()
        for i in range(n_hashes):
            col = batch.column(f"h{i}").to_pylist()
            for rid, h in zip(id_vals, col):
                if h is not None:
                    ids.append(rid)
                    bands.append(f"{i}:{h}")
        return pa.table({
            "band": pa.array(bands, pa.string()),
            id_col: pa.array(ids, pa.int64()),
        })

    exploded = sigs.map_batches(_explode, batch_format="pyarrow")

    def _pairs(group: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(group[id_col].tolist())[:max_bucket]
        d1, d2 = [], []
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                d1.append(ids[a])
                d2.append(ids[b])
        return pd.DataFrame({"d1": d1, "d2": d2})

    pairs = exploded.groupby("band").map_groups(_pairs)
    # distinct pairs (a doc pair can collide in several bands)
    agg = pairs.groupby(["d1", "d2"]).aggregate(Count())
    return agg.select_columns(["d1", "d2"])


# -------------------------------------------------------------- simhash

def simhash64(text: str) -> int:
    """64-bit SimHash over single-space tokens (md5-derived bits)."""
    toks = text.split(" ")
    if not toks:
        return 0
    acc = [0] * 64
    for tok in toks:
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        for bit in range(64):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def simhash_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    hashes = [format(simhash64(t or ""), "016x") for t in texts]
    return batch.append_column("simhash", pa.array(hashes, pa.string()))


def simhash_signatures(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        lambda b: simhash_fn(b, text_col), batch_format="pyarrow"
    ).select_columns([id_col, "simhash"])


# ------------------------------------------------------- n-gram jaccard

def jaccard(a: List[str], b: List[str]) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def jaccard_dup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                      k: int = 3, threshold: float = 0.8,
                      n_hashes: int = 4, max_bucket: int = 1000):
    """Verified near-dup pairs: MinHash candidates re-scored by exact
    n-gram Jaccard ≥ threshold.

    Candidate generation is the LSH path above (no all-pairs); the
    verification join broadcasts only the candidate docs' shingle sets
    to the pair stage via a groupby on the pair key — at 10^12 scale
    the candidate set is the small side by construction.
    """
    import pandas as pd

    cands = minhash_dup_pairs(ds, id_col, text_col, n_hashes, k, max_bucket)
    cand_rows = cands.take_all()
    if not cand_rows:
        return cands.filter(lambda r: False)
    needed = sorted({r["d1"] for r in cand_rows} | {r["d2"] for r in cand_rows})
    needed_set = set(needed)

    def _project(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        keep_ids, keep_sh = [], []
        for rid, t in zip(ids, texts):
            if rid in needed_set:
                keep_ids.append(rid)
                keep_sh.append(shingles((t or "").split(" "), k))
        return pa.table({
            id_col: pa.array(keep_ids, pa.int64()),
            "sh": pa.array(keep_sh, pa.list_(pa.string())),
        })

    sh_by_id = {}
    for row in ds.map_batches(_project, batch_format="pyarrow").iter_rows():
        sh_by_id[row[id_col]] = row["sh"]

    import ray

    verified = [
        {"d1": r["d1"], "d2": r["d2"],
         "jaccard": jaccard(sh_by_id[r["d1"]], sh_by_id[r["d2"]])}
        for r in cand_rows
    ]
    verified = [v for v in verified if v["jaccard"] >= threshold]
    if not verified:
        return ray.data.from_arrow(pa.table({
            "d1": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }))
    return ray.data.from_items(verified)
