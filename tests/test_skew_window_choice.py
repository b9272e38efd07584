"""Pin the r14 count-window form against the groupBy+join-back
alternative (VERDICT r14 #1): the window form was kept after a
skewed-fixture A/B (tools/skew_window_ab.py), so (a) the two forms
must stay output-equivalent on a SKEWED labeling — one key owning 30%
of rows, the giant-component worst case — and (b) the shipped
operators must keep the one-exchange window plan shape the A/B
certified.

Measured basis (r15, local[32]; min-of-3, fullhash consumer):
  2M rows  (0.6M-row hot component): window 0.91s vs aggjoin 1.24s
  20M rows (6M-row hot component):   window 3.43s vs aggjoin 3.15s
  uniform at both scales: window wins 1.7-3.4x
The crossover needs a single component in the many-millions of rows;
below that the window's single exchange beats the aggjoin's partial
agg + broadcast join-back on both distributions, and at the crossover
the two are within the 1.2x adjudication band. If this pin is ever
revisited, rerun tools/skew_window_ab.py and keep the winner.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark.operators import dedup_clusters
from flink_user_behavior_analysis_spark.operators.chunking import (
    _dup_span_instances,
)


def _skewed_labels(spark, n=2000, hot_frac=0.3):
    hot = int(n * hot_frac)
    comp = F.when(F.col("id") < hot, F.lit(0)).otherwise(
        F.col("id") - (F.col("id") % 2))
    return spark.range(0, n, 1, 8).select(
        "id", comp.cast("long").alias("component"))


def test_cluster_size_window_equals_aggjoin_on_skewed(spark):
    df = _skewed_labels(spark)
    w = Window.partitionBy("component")
    win = df.select(
        "id", "component",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"))
    sizes = (df.groupBy("component").agg(F.count(F.lit(1)).alias("_n"))
             .where(F.col("_n") >= 2))
    agg = (df.join(sizes, "component", "left")
           .select("id", "component",
                   F.coalesce("_n", F.lit(1)).cast("long")
                   .alias("cluster_size")))
    assert win.exceptAll(agg).count() == 0
    assert agg.exceptAll(win).count() == 0


def test_span_dup_window_equals_aggjoin_on_skewed(spark):
    # one fp owns ~10% of instances; the rest are near-unique
    n = 3000
    uni = F.pmod(F.xxhash64(F.col("id") % (n // 2)), F.lit(1 << 40))
    fp = F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 1, F.lit(0)) \
        .otherwise(uni)
    spans = spark.range(0, n, 1, 8).select(
        (F.col("id") % 100).alias("doc_id"),
        (F.col("id") / 100).cast("long").alias("pos"),
        fp.cast("string").alias("fp"))
    win = _dup_span_instances(spans, 2, "doc_id")
    dup = (spans.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
           .where(F.col("_n") >= 2).select("fp"))
    agg = spans.join(dup, "fp", "left_semi").select("doc_id", "pos")
    assert win.exceptAll(agg).count() == 0
    assert agg.exceptAll(win).count() == 0


def test_dedup_clusters_keeps_window_plan_shape(spark):
    """The certified form: cluster sizes from ONE count window over
    component (no groupBy+join-back) — a second component exchange or
    a join reappearing here should fail loudly, not drift in."""
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    plan = dedup_clusters(docs, pairs)._jdf.queryExecution() \
        .executedPlan().toString()
    # the size column must come from a window over component ...
    assert "windowspecdefinition(component" in plan
    # ... not from a count aggregate joined back (the alternative form)
    assert "count(1) AS cluster_size" not in plan
