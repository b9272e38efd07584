"""A/B the r14 count-window rewrites against the groupBy+join-back
form on UNIFORM vs SKEWED key distributions (VERDICT r14 #1).

The r14 rewrites compute per-key counts with
``count().over(Window.partitionBy(key))`` — one exchange, but NO
map-side partial aggregation and no AQE skew handling (skew-join
splitting applies to joins only), so a hot key serializes into one
window task. The pre-r14 form (groupBy(key).count + join back) pays
a second exchange but partial-aggregates before the shuffle and its
join is AQE-skew-splittable. This harness measures both forms on
both distributions at sf1-like volume so the surviving form is
chosen by data, not plan aesthetics.

Fixtures (synthesized in-memory, deterministic):
  clusters: (id, component) labelings, N rows.
    uniform: components of size ~2 (near-dup pairs; the common case)
             plus singletons — what LSH dedup graphs look like.
    skewed:  ONE component holding 30% of all rows (the giant-
             component worst case), rest uniform.
  spans: (id, pos, fp) instances, M rows.
    uniform: fp frequencies ~1-3 (md5-uniform span text).
    skewed:  ONE fp owning 10% of all instances (corpus-wide
             boilerplate span), rest uniform.

Forms timed (each consumed with bench's fullhash consumer):
  cluster_window : count().over(Window.partitionBy(component))
  cluster_aggjoin: groupBy(component).count(>=2 only) + LEFT join
                   back + coalesce(n, 1) — singleton components never
                   enter the join (they dominate real dedup graphs),
                   so the count side stays small/broadcastable.
  span_window    : filter on count().over(Window.partitionBy(fp)) >= 2
  span_aggjoin   : groupBy(fp).count HAVING >= 2, semi-join back.

Usage: python tools/skew_window_ab.py [n_cluster_rows] [n_span_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from bench import _consume  # noqa: E402
from flink_user_behavior_analysis_spark.session import get_spark  # noqa: E402

N_CLUSTER = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_SPAN = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
RUNS = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))


def make_clusters(spark, n: int, skewed: bool):
    """(id, component): skewed -> ids [0, 0.3n) share component 0;
    uniform -> pair components (id - id%2) for 40% of ids, singleton
    components for the rest. Deterministic, no rand()."""
    base = spark.range(0, n, 1, 64).select(F.col("id"))
    if skewed:
        comp = F.when(F.col("id") < int(0.3 * n), F.lit(0)).otherwise(
            F.col("id") - (F.col("id") % 2))
    else:
        comp = F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 4,
                      F.col("id") - (F.col("id") % 2)).otherwise(F.col("id"))
    return base.select("id", comp.cast("long").alias("component"))


def make_spans(spark, n: int, skewed: bool):
    """(id, pos, fp): skewed -> 10% of instances share fp 0; rest
    md5-uniform over ~n/2 values (so duplicate fps exist either way)."""
    base = spark.range(0, n, 1, 64).select(
        (F.col("id") % 5000).alias("doc_id"),
        (F.col("id") / 5000).cast("long").alias("pos"),
        F.col("id"))
    uni_fp = F.pmod(F.xxhash64(F.col("id") % (n // 2)), F.lit(1 << 60))
    if skewed:
        fp = F.when(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(10)) < 1,
                    F.lit(0)).otherwise(uni_fp)
    else:
        fp = uni_fp
    return base.select("doc_id", "pos", fp.cast("long").alias("fp"))


def cluster_window(df):
    w = Window.partitionBy("component")
    return df.select(
        "id", "component",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"))


def cluster_aggjoin(df):
    sizes = (df.groupBy("component")
             .agg(F.count(F.lit(1)).alias("_n"))
             .where(F.col("_n") >= 2))
    return (df.join(sizes, "component", "left")
            .select("id", "component",
                    F.coalesce("_n", F.lit(1)).cast("long")
                    .alias("cluster_size")))


def span_window(df):
    w = Window.partitionBy("fp")
    return (df.withColumn("n_occ", F.count(F.lit(1)).over(w))
            .where(F.col("n_occ") >= 2)
            .select("doc_id", "pos"))


def span_aggjoin(df):
    dup = (df.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") >= 2).select("fp"))
    return df.join(dup, "fp", "left_semi").select("doc_id", "pos")


def timed(tag, fn, df):
    best = None
    rows = None
    for _ in range(RUNS):
        t0 = time.perf_counter()
        rows = _consume(fn(df))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"# {tag}: {best:.3f}s rows={rows}", flush=True)
    return best


def main():
    spark = get_spark(app="skew-window-ab")
    res = {}
    for dist in ("uniform", "skewed"):
        cdf = make_clusters(spark, N_CLUSTER, dist == "skewed") \
            .localCheckpoint(eager=True)
        res[f"cluster_window/{dist}"] = timed(
            f"cluster_window/{dist}", cluster_window, cdf)
        res[f"cluster_aggjoin/{dist}"] = timed(
            f"cluster_aggjoin/{dist}", cluster_aggjoin, cdf)
        # equivalence: identical (id, component, cluster_size) sets
        a = cluster_window(cdf)
        b = cluster_aggjoin(cdf)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
            f"cluster forms disagree on {dist}"
        cdf.unpersist()
        sdf = make_spans(spark, N_SPAN, dist == "skewed") \
            .localCheckpoint(eager=True)
        res[f"span_window/{dist}"] = timed(
            f"span_window/{dist}", span_window, sdf)
        res[f"span_aggjoin/{dist}"] = timed(
            f"span_aggjoin/{dist}", span_aggjoin, sdf)
        a = span_window(sdf)
        b = span_aggjoin(sdf)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, \
            f"span forms disagree on {dist}"
        sdf.unpersist()
    print("# summary (window/aggjoin ratio; >1 means aggjoin wins)")
    for fam in ("cluster", "span"):
        for dist in ("uniform", "skewed"):
            w = res[f"{fam}_window/{dist}"]
            j = res[f"{fam}_aggjoin/{dist}"]
            print(f"# {fam}/{dist}: window={w:.3f}s aggjoin={j:.3f}s "
                  f"ratio={w / j:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
