"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_user_behavior_analysis_spark import queries as Q
from flink_user_behavior_analysis_spark.session import get_spark

HEADLINE = [
    "hot_items",
    "hot_pages",
    "page_views",
    "unique_visitors",
    "unique_visitors_approx",
    "marketing_by_channel",
    "ad_stats_by_province",
    "login_fail",
    "order_timeout",
    "tx_match",
    "blacklist_warnings",
    "sessionize_users",
    "purchase_attribution",
    "pricing_summary",
    "revenue_by_nation",
    "top_customers_per_segment",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_clusters",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lsh",
    "ann_topk",
    "ann_topk_lsh",
    "ann_topk_lsh_mp",
    "ann_topk_ivf",
    "quantize_embeddings",
    "lang_centroids",
    "text_stats",
    "token_vocab",
    "repetition_stats",
    "tfidf_top_terms",
    "contamination",
    "chunk_docs",
    "pack_sequences",
    "dedup_keeper_quality",
    "dedup_incremental",
    "curation_pipeline",
    "doc_fingerprints",
    "doc_split",
    "multimodal_decode",
    # round-4 additions (PERF.md: r3-comparable subtotal excludes these)
    "bm25_topk",
    "source_stats",
    "chunk_containment",
    "dedup_clusters_star",
    "lm_score",
    "mixture_sample",
    "winnow_fingerprints",
    "winnow_overlap",
    "pca_embed",
    "heavy_hitters",
    # round-5 additions: stored-artifact probe paths. The first call
    # builds+writes the index/LM tables; min-of-2 timing therefore
    # reports the steady-state PROBE wall — the flat production shape
    # (compare with the inline bm25_topk / lm_score entries above)
    "bm25_topk_stored",
    "lm_score_stored",
    "duplicated_spans",
    "gopher_quality",
    "ann_topk_pq",
    "hybrid_retrieval",
    "source_quantiles",
    "ann_topk_ivfpq",
    "funnel_conversion",
    "retention_weekly",
    "ann_topk_pq_stored",
    "duplicated_spans_inc",
    "error_spikes",
    "shipping_priority",
    "returned_customers",
    # round-6 additions: the two stored-serving twins that close r5's
    # perf-weak findings (compare ann_topk_ivfpq / hybrid_retrieval
    # inline entries above — the stored probes should be near-flat),
    # plus the substring-cut transform
    "ann_topk_ivfpq_stored",
    "hybrid_retrieval_stored",
    "remove_dup_spans",
    "large_volume_orders",
    "priority_late_orders",
    # round-6 product-analytics rollups (trailing-window distinct,
    # session telemetry, ntile LTV deciles, JSON-props parse)
    "dau_stickiness",
    "session_stats",
    "revenue_deciles",
    "props_topk",
    # round-6 stored-corpus incremental probes (compare the inline
    # dedup_incremental / duplicated_spans_inc entries — the probe
    # pays only batch-side work)
    "dedup_incremental_stored",
    "duplicated_spans_inc_stored",
    "source_overlap",
    # round-7 additions: SemDeDup (literal-centroid projection +
    # cluster-local pair join) and the Q7-shape broadcast-dim rollup
    "dedup_semantic",
    "nation_trade_flows",
    # round-8 additions: regex PII redaction (shuffle-free scan
    # projection — the map-only floor for a text pass) and the
    # second-batch relational shapes (Q15 scalar-max reuse, Q19
    # disjunctive pushdown, Q2 per-group-min decorrelation)
    "pii_scrub",
    "top_revenue_supplier",
    "discounted_band_revenue",
    "cheapest_supplier_per_part",
    "promo_revenue_share",
    "nation_market_share",
    "forecast_revenue_change",
    "customer_order_distribution",
]

# Queries whose signature hashing routes through operators.dedup.sig_hash
# — the only code the SPARK_GRAFT_FAST_HASH knob changes. Timed a second
# time with the knob on; reported under "fast_hash" in the JSON line.
FAST_HASH_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_incremental",
]

# Train-vs-serve split (VERDICT r7 #3): these inline entries refit
# their model — and rescan brute-force truth — on EVERY call; they are
# self-certifying correctness forms, not the serving path. Their
# stored twins are the serving path: the twin's FIRST timed run at the
# bench SF is build-inclusive (fresh session -> empty catalog -> the
# gated rebuild fires), the min-of-2 is the steady-state probe. The
# JSON's "train_vs_serve" block reports all three walls so the 2x
# perf gate can track the probe (what a cluster serves) while the
# fit cost stays visible instead of polluting the headline row.
TRAIN_INCLUSIVE = {
    "ann_topk_pq": "ann_topk_pq_stored",
    "ann_topk_ivfpq": "ann_topk_ivfpq_stored",
    "hybrid_retrieval": "hybrid_retrieval_stored",
    "bm25_topk": "bm25_topk_stored",
    "lm_score": "lm_score_stored",
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app="fuba-bench")
    # Warm every plan shape on the smallest SF first: whole-stage
    # codegen + JIT compilation is per-plan-shape and one-time per JVM
    # (measured: simhash 8.3s cold vs 2.8s warm for identical data).
    # The warmup runs on sf0.001 (~1000 rows) so it compiles the same
    # generated classes without doing the measured work; timings below
    # then reflect steady-state data processing, which is what a
    # long-running cluster actually sees.
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    from flink_user_behavior_analysis_spark.operators.dedup import (
        release_signature_cache,
    )

    # Spawn the full Python-worker pool and pay the numpy/pandas import
    # ONCE before any timing: the sf0.001 query warmup below touches
    # only 1-2 partitions, so without this the first sf0.1 Arrow query
    # measured (ann_topk in r3: +155%) absorbs ~30 worker cold-starts.
    def _touch_numpy(batches):
        import numpy as np  # noqa: F401

        for pdf in batches:
            yield pdf

    n_workers = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    (spark.range(0, n_workers * 100, 1, n_workers)
     .mapInPandas(_touch_numpy, "id long").count())

    for name in HEADLINE:
        fn = Q.QUERIES.get(name)
        if fn is not None:
            try:
                fn(spark, warm_dir).count()
                release_signature_cache()
            except Exception as exc:  # pragma: no cover
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    per_query: dict[str, float] = {}
    first_run: dict[str, float] = {}
    for name in HEADLINE:
        fn = Q.QUERIES.get(name)
        if fn is None:
            continue
        # min of 2 timed runs: this container is a shared VM and
        # single-shot walls vary ~1.5x with neighbor load; the min is
        # the reproducible number (plans are warmed above, so neither
        # run pays JIT)
        best, n = None, 0
        for i in range(2):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            dt = time.perf_counter() - t0
            if i == 0:
                first_run[name] = dt
            best = dt if best is None else min(best, dt)
            # drop persisted signature frames between timings — a
            # long-lived session must not accumulate blocks, and run 2
            # must not read run 1's cache
            release_signature_cache()
        per_query[name] = round(best, 3)
        print(f"# {name}: {per_query[name]:.3f}s rows={n}", file=sys.stderr)

    # fit/probe decomposition for the train-per-call entries: the
    # stored twin's first run rebuilt the index (build + probe), so
    # build ~= first_run - steady probe. A near-zero build means the
    # artifact was shared with an earlier entry (hybrid reuses bm25's
    # index) — honest, since the serving fleet shares it too.
    train_vs_serve: dict[str, dict[str, float | None]] = {}
    # when the warmup fell back to sf_dir, the warmup pass already
    # built every stored artifact at the bench SF, so first-run minus
    # probe measures nothing — report the build as unknown (None)
    # rather than a misleading ~0
    build_measurable = warm_dir != sf_dir
    for inline, stored in TRAIN_INCLUSIVE.items():
        if inline not in per_query or stored not in per_query:
            continue
        build = (round(max(0.0, first_run.get(stored, 0.0)
                           - per_query[stored]), 3)
                 if build_measurable else None)
        train_vs_serve[inline] = {
            "inline_fit_inclusive": per_query[inline],
            "stored_build": build,
            "serving_probe": per_query[stored],
        }
        print(f"# train_vs_serve {inline}: inline={per_query[inline]:.3f}s "
              f"build={build} probe={per_query[stored]:.3f}s",
              file=sys.stderr)

    # Production-hash column (VERDICT r4 item 8): re-time the queries
    # whose signatures route through the sig_hash seam with
    # SPARK_GRAFT_FAST_HASH=1 (xxhash64 instead of oracle-portable
    # md5), so the production speedup is tracked per-round instead of
    # as a one-off PERF.md note. Same warm+min-of-2 protocol; the
    # xxhash64 plans are distinct codegen classes, so they get their
    # own sf0.001 warmup pass.
    fast_hash: dict[str, float] = {}
    os.environ["SPARK_GRAFT_FAST_HASH"] = "1"
    try:
        for name in FAST_HASH_QUERIES:
            fn = Q.QUERIES.get(name)
            if fn is None:
                continue
            try:
                fn(spark, warm_dir).count()
                release_signature_cache()
            except Exception as exc:  # pragma: no cover
                print(f"# fast-hash warmup {name} failed: {exc}",
                      file=sys.stderr)
                continue
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
                release_signature_cache()
            fast_hash[name] = round(best, 3)
            print(f"# fast_hash {name}: {fast_hash[name]:.3f}s "
                  f"(md5 {per_query.get(name, float('nan')):.3f}s)",
                  file=sys.stderr)
    finally:
        os.environ.pop("SPARK_GRAFT_FAST_HASH", None)

    total = round(sum(per_query.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "fast_hash": fast_hash,
        "train_vs_serve": train_vs_serve,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(payload)
    print(line)
    # durability (VERDICT r6 #5): the driver captures stdout's tail,
    # which truncated BENCH_r06's 78-entry line mid-stream — also
    # land the same dict in a committed file so the headline numbers
    # are never tail-dependent
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
    with open(out_path, "w") as fh:
        fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
