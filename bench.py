"""Benchmark harness — headline extraction throughput + query timings.

Usage:
    python bench.py                 # full bench, one JSON line to stdout
    python bench.py --headline-only # just the extraction pipeline
    python bench.py --scaling       # run headline at 2/4/8/16/32 CPUs
                                    # in fresh processes, report N->4N
                                    # scaling efficiencies

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1),
     RAY_GRAFT_CPUS (default 32).

The headline pipeline is the flagship HTML extraction chain over a
deterministic synthetic Common-Crawl-style corpus sized by the sf dir
(generated in parallel once, cached under /tmp). Throughput is
reported as docs/s and MB/s of html payload, measured over the
streaming execution into a parquet sink.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_SF_DIR = "/root/testdata/sf0.1"
BENCH_ROOT = "/tmp/ocr_ray_bench"

# queries timed in the full bench (one per operator family)
BENCH_QUERIES = [
    "replace_chars", "sanitize_chars", "nfc_normalize", "token_count",
    "quality_report",
    "dedup_exact", "dedup_first_rows", "minhash_signatures",
    "minhash_dup_pairs", "dup_clusters", "dedup_canonical",
    "jaccard_dup_pairs", "prefix_jaccard_pairs", "simhash",
    "dedup_incremental_bloom",
    "paragraph_dedup", "substring_dedup",
    "winnow_fingerprint", "ann_topk", "embedding_near_dup",
    "semantic_dedup",
    "pii_redact", "host_stats", "host_skew_stats", "host_cap", "heavy_hitters",
    # pagerank (Dataset plan) is oracle-gated but benched via its
    # Pregel twin: the Dataset plan pays one sort-barrier exchange
    # per iteration (~10s fixed each at toy scale — amortized at
    # real scale, pathological in a wall-clock bench)
    "inverted_index", "pagerank_pregel", "triangle_count",
    "events_hourly", "events_by_type_salted", "user_sessions",
    "event_gaps", "events_rollup", "events_pivot",
    "events_cube", "events_frame_window",
    "events_sliding_window", "click_attribution", "peak_sessions",
    "events_value_histogram",
    "campaign_attribution", "sequence_packing", "revenue_by_nation",
    "customers_no_orders", "customer_running_spend",
    "corpus_filter", "corpus_quantiles", "profile_table",
    "tfidf_top_terms",
    "top_tokens",
    "kmeans_assign", "lm_score", "skew_join_enrich",
    "shuffle_shards", "doc_embed", "mix_sample", "packed_windows",
    "lm_buckets", "split_leakage_safe",
    "quality_rank", "source_overlap",
    "sample_exact_k", "approx_quantiles", "docs_except",
    "docs_union",
    "bucketed_join_orders", "bucketed_order_counts",
    "bucket_point_lookup", "customer_orders_full",
    "distinct_users_by_type", "events_value_stats",
    "doc_chunks", "cms_sketch", "approx_users_by_type",
    "hll_users_by_type",
    "lang_doc_rank", "source_extract", "quality_classifier",
    "fuzzy_name_pairs", "user_event_trail", "docs_checksum", "user_retention",
    "near_dup_incremental",
    "extraction_flagship",
    "extraction_boilerplate", "media_decode", "training_pipeline",
    # session-3 additions
    "snapshot_diff_summary", "locf_fill", "bucketed_upsert",
    "interval_union", "interval_coverage", "events_value_zscore",
    "priority_sample", "bm25_search", "hybrid_search", "event_funnel",
    "event_funnel_windowed", "sliding_distinct_users",
    "join_size_estimate", "dup_cluster_sizes", "collocations",
    "label_centroids", "containment_pairs", "recency_user_scores",
    "churned_users", "value_outliers", "lang_confusion",
    "host_entropy", "lang_doc_rank_dist", "ks_drift", "chi2_drift",
    "doc_novelty", "asof_last_purchase", "extraction_pdf_roundtrip",
    "link_graph", "events_value_corr",
    # session-5 additions
    "event_transitions", "dq_audit", "dsir_weights", "anchor_texts",
    "events_winsorized", "image_dhash",
    "scd2_build", "user_mode_event", "robots_allowed",
    "distinctive_terms",
    "lang_top_tokens", "host_components", "host_gini",
    "dedup_best_survivor",
    "wordlist_gate", "minhash_jaccard_estimate", "mirror_hosts",
    "cocitation_pairs", "polyglot_hosts", "event_type_affinity",
    # session-7 additions
    "url_churn", "embedding_quantize", "host_boilerplate",
    "pq_codes", "ann_topk_pq", "interval_overlap",
    "video_scene_cuts", "zonemap_scan", "range_shards",
    "url_latest_k", "phrase_match", "simhash_near_pairs",
    "schema_evolution", "deobfuscate", "lang_approx_quantiles",
    "curation_pipeline", "meta_extract", "html_tables",
    "url_path_rollup",
    # session-8 additions
    "minhash_banded_pairs", "dictionary_tag", "prefix_dup",
    "char_entropy", "oov_rate", "events_by_type_adaptive",
    "sparse_cosine_pairs", "rarity_dispersion", "paragraph_lang_mix",
    # session-9 additions
    "zorder_scan", "stitch_pairs", "user_skyline", "events_trend",
    "mutual_nn_pairs", "golden_record", "rendezvous_shards",
    "url_features", "filter_cascade",
    "coreset_select", "frontier_pipeline", "robots_parse",
    # session-10 additions
    "lang_host_mi", "script_mix", "calibration_bins",
    "type_hour_bursts", "syndication_sources",
    "adaptive_join_orders", "agg_refresh", "compaction_plan",
    "audio_silence", "semantic_blocklist", "hard_negatives",
    "vocab_growth", "inference_buckets", "domain_holdout_split",
    "sitemap_parse", "fix_mojibake", "seed_pipeline",
    "homoglyph_hosts",
    # session-11 additions (sssp is iterative — excluded like
    # crawl_depth; see the note below)
    "pricing_summary", "canonical_url", "canonical_dup_groups",
    "politeness_plan",
    "intradoc_dedup", "random_projection", "image_resize",
    "watermark_windows", "store_repair_plan", "bloom_join_revenue",
    "embedding_covariance", "stratified_priority_sample",
    "rolling_p95", "embedding_outliers", "multi_touch_attribution",
    "column_diff", "shipping_priority", "forecast_revenue",
    "events_geomean",
    # communities (label propagation), ppr_scores (seeded pagerank)
    # and stitch_chains (pointer-doubling reassembly) are
    # oracle-gated but excluded like pagerank/
    # crawl_depth: their barrier exchanges per round/iteration are
    # fixed-cost-dominated at toy scale, amortized at real scale
    # crawl_depth (BFS) is oracle-gated but excluded like pagerank:
    # iterative exchanges pay ~2 barrier fixed costs per hop at toy
    # scale - amortized at real scale, pathological in a wall bench
]


# the sf1 scale tier (--families): one representative query per
# operator family, runnable against a gen_sf.py-synthesized dir where
# the full 215-query bench would take hours. Shuffle-heavy operators
# lead each family — they are where scale regressions hide (the
# 50-query correctness sample can't see a 10x slowdown).
FAMILY_BENCH = {
    "extraction": ["extraction_flagship", "quality_report"],
    "dedup_exact": ["dedup_exact", "dedup_first_rows"],
    "dedup_near": ["minhash_dup_pairs", "prefix_jaccard_pairs",
                   "simhash_near_pairs"],
    "dedup_cluster": ["dup_clusters", "dedup_canonical",
                      "dedup_best_survivor"],
    "similarity": ["ann_topk", "embedding_near_dup", "kmeans_assign"],
    "graph": ["pagerank_pregel", "triangle_count", "link_graph"],
    "text_stats": ["token_count", "tfidf_top_terms", "lm_buckets"],
    "events": ["events_hourly", "events_pivot", "user_sessions",
               "events_by_type_salted"],
    "joins": ["bloom_join_revenue", "bucketed_join_orders",
              "skew_join_enrich"],
    "training_tail": ["sequence_packing", "split_leakage_safe",
                      "mix_sample"],
}


def run_families(sf_dir: str):
    """Per-family timings at the given scale: {family: {query: sec}}."""
    import pandas as pd
    import pyarrow as pa

    from ocr_pipeline_ray.queries import QUERIES

    out = {}
    for family, names in FAMILY_BENCH.items():
        fam = {}
        for name in names:
            t0 = time.time()
            result = QUERIES[name](sf_dir)
            if isinstance(result, (pd.DataFrame, pa.Table)):
                _ = len(result)
            else:
                for _ in result.iter_batches(batch_size=4096):
                    pass
            fam[name] = round(time.time() - t0, 3)
        out[family] = fam
    return out


def family_run(num_cpus: int, sf_dir: str) -> dict:
    import ray

    from ocr_pipeline_ray import silence_ray_cosmetic_warnings

    silence_ray_cosmetic_warnings()
    os.environ.setdefault("OCR_RAY_SCRATCH", "/dev/shm/ocr_ray_scratch")
    os.makedirs(os.environ["OCR_RAY_SCRATCH"], exist_ok=True)
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().op_resource_reservation_enabled = False
    t0 = time.time()
    try:
        families = run_families(sf_dir)
    finally:
        ray.shutdown()
    return {
        "metric": "family_bench_wall_seconds",
        "value": round(time.time() - t0, 3),
        "unit": "sec",
        "queries": {q: s for fam in families.values()
                    for q, s in fam.items()},
        "families": families,
        "sf": sf_label(sf_dir),
        "num_cpus": num_cpus,
    }


def sf_label(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base else sf_dir.replace("/", "_")


def corpus_rows_for(sf_dir: str) -> int:
    label = sf_label(sf_dir)
    try:
        sf = float(label.replace("sf", ""))
    except ValueError:
        sf = 0.1
    return max(8000, int(3_000_000 * sf))


def ensure_corpus(sf_dir: str, pdf_fraction: float = 0.0):
    """Parallel, deterministic, cached corpus generation."""
    import ray

    from ocr_pipeline_ray.corpus import generate_pages_table

    rows = corpus_rows_for(sf_dir)
    # fine-grained shards: block count >> max worker count, so the
    # fused read→extract→write tasks load-balance without stragglers
    n_shards = max(64, rows // 1000)
    # v2: corpus generator now emits ALTO/PAGE XML document kinds too
    tag = f"_pdf{int(pdf_fraction * 100)}" if pdf_fraction > 0 else ""
    out_dir = os.path.join(
        BENCH_ROOT, f"pages_{sf_label(sf_dir)}_{rows}_{n_shards}_v2{tag}"
    )
    os.makedirs(out_dir, exist_ok=True)
    per_shard = [rows // n_shards] * n_shards
    for k in range(rows % n_shards):
        per_shard[k] += 1
    paths = [
        os.path.join(out_dir, f"pages-{s:05d}.parquet")
        for s in range(n_shards)
    ]
    meta_path = os.path.join(out_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path, encoding="UTF-8") as fh:
            meta = json.load(fh)
        if all(os.path.exists(p) for p in paths):
            return paths, meta["html_mb"]

    @ray.remote
    def _gen(shard: int, n: int, path: str) -> float:
        import pyarrow.parquet as pq

        table = generate_pages_table(n, seed=42, shard=shard,
                                     pdf_fraction=pdf_fraction)
        pq.write_table(table, path + ".tmp", compression="zstd")
        os.replace(path + ".tmp", path)
        return sum(len(x) for x in table.column("html").to_pylist()) / 1e6

    html_mb = sum(
        ray.get([
            _gen.remote(s, per_shard[s], paths[s]) for s in range(n_shards)
        ])
    )
    with open(meta_path, "w", encoding="UTF-8") as fh:
        json.dump({"rows": rows, "html_mb": html_mb}, fh)
    return paths, html_mb


def run_headline(paths, html_mb: float, num_cpus: int):
    from ocr_pipeline_ray.config import PipelineContext
    from ocr_pipeline_ray.pipelines.extraction import (
        build_pipeline,
        read_pages,
    )

    import pyarrow.parquet as pq

    # sink on tmpfs: the sandbox disk writes at ~44 MB/s and its
    # write-back stalls would measure the disk, not the engine (a real
    # cluster writes to a distributed FS with aggregate bandwidth)
    out_dir = "/dev/shm/ocr_ray_bench_headline_out"
    # fused chain runs as a task pool: scales with every CPU, and Ray
    # fuses read → extract-chain → write into a single pass per block.
    # GRAFT_BATCH_SIZE / GRAFT_TARGET_BLOCK_MB exist for the saturation
    # sweep (BASELINE.md): default batch 256 rows, default Ray block
    # size untouched.
    import ray.data

    blk_mb = os.environ.get("GRAFT_TARGET_BLOCK_MB")
    if blk_mb:
        ray.data.DataContext.get_current().target_max_block_size = (
            int(blk_mb) * 1024 * 1024)
    # default 512 after the round-4 sweep (BASELINE.md): best cell at
    # 32 CPUs, ~4% over 256 (within ambient noise; the sweep's real
    # finding is that sizing has NO large effect — the host saturates)
    ctx = PipelineContext(
        batch_size=int(os.environ.get("GRAFT_BATCH_SIZE", "512")))

    def _one_run() -> float:
        shutil.rmtree(out_dir, ignore_errors=True)
        ds = build_pipeline(read_pages(paths), ctx=ctx)
        t0 = time.time()
        ds.write_parquet(out_dir, compression="zstd")
        return time.time() - t0

    _one_run()  # warmup: spawn worker pool + imports, fill page cache
    n_timed = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))
    wall = min(_one_run() for _ in range(n_timed))
    n_docs = 0
    for f in os.listdir(out_dir):
        if f.endswith(".parquet"):
            n_docs += pq.ParquetFile(os.path.join(out_dir, f)).metadata.num_rows
    shutil.rmtree(out_dir, ignore_errors=True)
    return {
        "seconds": round(wall, 3),
        "n_docs": n_docs,
        "html_mb": round(html_mb, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "mb_per_sec": round(html_mb / wall, 2),
    }


def run_queries(sf_dir: str):
    import pandas as pd
    import pyarrow as pa

    from ocr_pipeline_ray.queries import QUERIES

    timings = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name]
        t0 = time.time()
        result = fn(sf_dir)
        if isinstance(result, (pd.DataFrame, pa.Table)):
            _ = len(result)
        else:
            for _ in result.iter_batches(batch_size=4096):
                pass
        timings[name] = round(time.time() - t0, 3)
    return timings


def single_run(num_cpus: int, sf_dir: str, headline_only: bool) -> dict:
    import ray

    from ocr_pipeline_ray import silence_ray_cosmetic_warnings

    silence_ray_cosmetic_warnings()
    # checkpoint/store scratch on tmpfs for the same reason as the
    # headline sink: the sandbox disk writes at ~44 MB/s and would
    # measure the disk, not the engine (a real cluster's OCR_RAY_STORE
    # is a distributed FS with aggregate bandwidth)
    os.environ.setdefault("OCR_RAY_SCRATCH", "/dev/shm/ocr_ray_scratch")
    os.makedirs(os.environ["OCR_RAY_SCRATCH"], exist_ok=True)
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import ray.data

    # one heavy operator dominates this pipeline: don't reserve 50% of
    # the CPUs for the (trivial) read operator
    ray.data.DataContext.get_current().op_resource_reservation_enabled = False
    try:
        paths, html_mb = ensure_corpus(sf_dir)
        headline = run_headline(paths, html_mb, num_cpus)
        queries = {} if headline_only else run_queries(sf_dir)
    finally:
        ray.shutdown()
    return {
        "metric": "extraction_pipeline_wall_seconds",
        "value": headline["seconds"],
        "unit": "sec",
        "queries": queries,
        "sf": sf_label(sf_dir),
        "num_cpus": num_cpus,
        "n_docs": headline["n_docs"],
        "html_mb": headline["html_mb"],
        "docs_per_sec": headline["docs_per_sec"],
        "mb_per_sec": headline["mb_per_sec"],
    }


def scaling_run(sf_dir: str) -> dict:
    """The same headline job at N and 4N CPUs in fresh processes.

    Primary pair (2, 8): both ends sit in the host's uncontended
    regime (per-core throughput is flat from 2 to 8 busy cores), which
    models an N-node vs 4N-node cluster where every node keeps its own
    frequency/memory envelope. The full 2/4/8/16/32 curve and the
    (4,16)/(8,32) efficiencies are reported too: beyond ~8 busy cores
    this single box saturates its memory/frequency envelope (per-task
    UDF time inflates 35-40% with all cores busy; see BASELINE.md) —
    a single-host artifact a real 4N-node cluster does not share.
    """
    results = {}
    # primary pair (2, 8) measured back-to-back: the shared host's
    # ambient speed drifts over minutes, so adjacent measurement keeps
    # the pair comparable
    for cpus in (2, 8, 4, 16, 32):
        env = dict(os.environ)
        env["RAY_GRAFT_CPUS"] = str(cpus)
        env.setdefault("GRAFT_BENCH_REPEATS", "2")
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only",
             "--sf-dir", sf_dir],
            capture_output=True, text=True, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.strip().splitlines()
                if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    def _eff(lo, hi):
        return round(
            (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / 4.0,
            3,
        )

    cpus_list = (2, 4, 8, 16, 32)
    return {
        "metric": "scaling_efficiency_N_to_4N",
        "value": _eff(2, 8),
        "unit": "ratio",
        "queries": {},
        "sf": sf_label(sf_dir),
        "num_cpus": 32,
        "pair_primary": "2->8",
        "efficiency_2_to_8": _eff(2, 8),
        "efficiency_4_to_16": _eff(4, 16),
        "efficiency_8_to_32": _eff(8, 32),
        "docs_per_sec": {
            str(c): results[c]["docs_per_sec"] for c in cpus_list
        },
        "mb_per_sec": {
            str(c): results[c]["mb_per_sec"] for c in cpus_list
        },
        "wall_sec": {str(c): results[c]["value"] for c in cpus_list},
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--scaling", action="store_true")
    parser.add_argument("--headline-only", action="store_true")
    parser.add_argument(
        "--families", action="store_true",
        help="per-family scale tier (run against a gen_sf.py sf1 dir)")
    parser.add_argument(
        "--sf-dir", default=os.environ.get("GRAFT_SF_DIR", DEFAULT_SF_DIR)
    )
    args = parser.parse_args()
    if args.scaling:
        out = scaling_run(args.sf_dir)
    elif args.families:
        out = family_run(int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                         args.sf_dir)
    else:
        cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
        out = single_run(cpus, args.sf_dir, args.headline_only)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
