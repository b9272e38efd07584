"""Degenerate-cluster worst case for dedup_semantic (VERDICT r6 #6).

SemDeDup's pair comparison is cluster-local, so its cost is
sum over cells of |cell|^2 — the worst case is a corpus whose
embeddings all collapse into ONE k-means cell (every pair compared).
This measures that wall directly: N synthetic vectors that are (a)
spread over k well-separated directions (balanced cells) vs (b) one
dominant direction plus noise (one cell swallows ~everything), same
N, same operator, best of 2.

Vectors are deterministic (hash-seeded trig mix, no RNG) so reruns
are comparable. Prints a markdown row and one JSON line for PERF.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_user_behavior_analysis_spark.operators.similarity import (  # noqa: E402
    kmeans_fit,
    semantic_dedup,
)
from flink_user_behavior_analysis_spark.session import get_spark  # noqa: E402

_POS = [a for a in sys.argv[1:] if not a.startswith("-")]
N = int(_POS[0]) if _POS else 20_000
# --kernel=sql|gemm for the inline (main) mode — gemm is the
# registered query's kernel since r12, sql is the oracle-parity twin
KERNEL = next((a.split("=", 1)[1] for a in sys.argv[1:]
               if a.startswith("--kernel=")), "gemm")
DIMS = 16
K = 8
EPS = 0.92


def synth(spark, mode: str):
    """Deterministic synthetic embeddings. balanced: 8 orthogonal-ish
    base directions round-robin (cells ~N/8 each); degenerate: 95% of
    ids on ONE direction, the rest spread over the 7 minority
    directions — k-means pins ~one centroid per direction, so one
    cell swallows ~0.95N and the pair join goes quadratic in it."""
    if mode == "balanced":
        base = F.col("id") % K
    else:
        base = F.when(F.col("id") % 20 == 0,
                      (F.col("id") % 7) + 1).otherwise(F.lit(0))
    cols = []
    for d in range(DIMS):
        # direction template: 1 for the matching block of dims, ~0 else
        tmpl = F.when((base * (DIMS // K) <= d)
                      & (d < (base + 1) * (DIMS // K)),
                      F.lit(1.0)).otherwise(F.lit(0.05))
        jitter = F.sin(F.col("id") * F.lit(0.7718) + F.lit(d) * F.lit(1.3)) * 0.02
        cols.append((tmpl + jitter).cast("double"))
    return (spark.range(N)
            .select(F.col("id").alias("vec_id"), F.array(*cols).alias("embedding")))


def consume(df) -> int:
    """Full-column consumer (r13): timing `.count()` lets Catalyst
    ELIMINATE provably-unique-keyed left joins from the counted plan
    — the probe's SQL vs-corpus leg vanished entirely under count()
    (measured 1.3 s for a 5k x 45k one-cell pair join that reads
    19.8 s under this consumer). Same xxhash64-of-all-columns form as
    bench._consume."""
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*[F.col(c) for c in df.columns])
              % F.lit(10**6)).alias("h"),
    ).collect()[0]
    return int(row["n"])


def best_of(fn, n: int = 2) -> float:
    best = math.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def drift_demo() -> None:
    """Show the drift MONITOR catches the stale-model hazard this
    harness measures, before the quadratic wall is hit: store the
    corpus under a model fit on the balanced distribution, then
    monitor a drifted (95/5 degenerate) batch — the dominant cell's
    mass_ratio explodes and overall sim quality drops, which is the
    refit signal. Run with: python tools/semdedup_stress.py --drift
    """
    from flink_user_behavior_analysis_spark.operators.similarity import (
        semdedup_drift,
        semdedup_store_corpus,
    )

    spark = get_spark(app="semdedup-drift-demo")
    prefix = "t_drift_demo"
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")
    corpus = synth(spark, "balanced")
    cents = kmeans_fit(corpus, K, iters=3, metric="cosine")
    semdedup_store_corpus(corpus, cents, prefix)

    for mode in ("balanced", "degenerate"):
        batch = synth(spark, mode).withColumn(
            "vec_id", F.col("vec_id") + N)  # disjoint ids
        rows = semdedup_drift(spark, prefix, batch, cents).collect()
        worst_mass = max((r.mass_ratio for r in rows
                          if r.mass_ratio is not None), default=None)
        worst_drift = min((r.sim_drift for r in rows
                           if r.sim_drift is not None), default=None)
        print(f"  batch={mode}: worst mass_ratio={worst_mass} "
              f"worst sim_drift={worst_drift}")
        print(json.dumps({"op": "semdedup_drift", "batch": mode,
                          "worst_mass_ratio": worst_mass,
                          "worst_sim_drift": worst_drift}))
    for t in spark.catalog.listTables():
        if t.name.startswith(prefix):
            spark.sql(f"DROP TABLE {t.name}")
    spark.stop()


def probe_stress() -> None:
    """Adversarial shape for the r13 probe GEMM kernel: a STALE model
    over a drifted corpus collapses ~95% of the STORED cells into one
    partition, and the probe batch lands ~95% in that same cell — the
    one-cogroup-task worst case (the within-cell analog is guarded by
    max_cell; the probe's cost is batch-slice x cell density inside
    ONE blocked GEMM task). Measures GEMM vs SQL kernels at that
    shape. Run: python tools/semdedup_stress.py --probe [N]"""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        semdedup_probe,
        semdedup_store_corpus,
    )

    spark = get_spark(app="semdedup-probe-stress")
    prefix = "t_stress_probe"
    for t in ("cells", "modelfp", "manifest"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
    allv = synth(spark, "degenerate")
    corpus = allv.where(F.col("vec_id") % 10 != 0)
    batch = allv.where(F.col("vec_id") % 10 == 0).persist()
    nb = batch.count()
    cents = kmeans_fit(synth(spark, "balanced"), K, iters=3,
                       metric="cosine")  # stale model
    semdedup_store_corpus(corpus, cents, prefix)
    dense = (spark.table(f"{prefix}_cells").groupBy("cell").count()
             .agg(F.max("count")).collect()[0][0])
    print(f"corpus={N - nb} batch={nb} densest_cell={dense}", flush=True)
    out = {}
    for kernel in ("gemm", "sql"):
        wall = best_of(lambda: consume(semdedup_probe(
            spark, prefix, batch, cents, EPS,
            pair_kernel=kernel)))
        out[kernel] = round(wall, 2)
        print(f"  {kernel}: {wall:.2f}s", flush=True)
    print(json.dumps({"op": "semdedup_probe_stale_one_cell", "n": N,
                      "batch": nb, "densest_cell": int(dense), **out}))
    for t in ("cells", "modelfp", "manifest"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
    spark.stop()


def main() -> None:
    if "--drift" in sys.argv:
        drift_demo()
        return
    if "--probe" in sys.argv:
        probe_stress()
        return
    spark = get_spark(app="semdedup-stress")
    out = {}
    for mode in ("balanced", "degenerate"):
        vecs = synth(spark, mode).persist()
        vecs.count()
        if mode == "degenerate":
            # the realistic wall: a STALE model (fit on yesterday's
            # balanced corpus) applied to a drifted 95/5 corpus — the
            # majority direction maps onto ONE of the old cells, which
            # then swallows ~0.95N. A fresh fit on the skewed corpus
            # does NOT show this: k-means re-splits dense regions
            # (measured below), so the hazard is model staleness /
            # under-provisioned k, not skewed data per se.
            cents = kmeans_fit(synth(spark, "balanced"), K, iters=3,
                               metric="cosine")
        else:
            cents = kmeans_fit(vecs, K, iters=3, metric="cosine")
        wall = best_of(lambda: consume(semantic_dedup(
            vecs, cents, EPS, pair_kernel=KERNEL)))
        # stats in ONE extra execution (the pair join is the cost)
        stats = (semantic_dedup(vecs, cents, EPS, pair_kernel=KERNEL)
                 .groupBy("cell")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum(F.when(F.col("status") == "dropped", 1)
                            .otherwise(0)).alias("d"))
                 .agg(F.max("n"), F.sum("d")).collect()[0])
        out[mode] = {"wall_s": round(wall, 2), "max_cell": int(stats[0]),
                     "dropped": int(stats[1])}
        print(f"  {mode}: {wall:.2f}s max_cell={stats[0]} "
              f"dropped={stats[1]}", flush=True)
        vecs.unpersist()
    ratio = round(out["degenerate"]["wall_s"] / out["balanced"]["wall_s"], 2)
    print("\n| op | balanced | degenerate (1 cell) | ratio | note |")
    print("|---|---|---|---|---|")
    print(f"| dedup_semantic N={N} | {out['balanced']['wall_s']}s "
          f"(max cell {out['balanced']['max_cell']}) | "
          f"{out['degenerate']['wall_s']}s "
          f"(max cell {out['degenerate']['max_cell']}) | {ratio} | "
          "pair join is cluster-local; one-cell collapse is the "
          "quadratic wall — raise k or fall back to the blocked-GEMM "
          "pair kernel (cosine_pairs_lsh) |")
    print(json.dumps({"op": "dedup_semantic", "n": N, "kernel": KERNEL, **out, "ratio": ratio}))
    spark.stop()


if __name__ == "__main__":
    main()
