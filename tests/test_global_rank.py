"""Distributed global rank / ntile equivalence (VERDICT r6 #1).

queries.global_rank replaces unpartitioned row_number/ntile windows
with a range-partition + per-partition-offset two-pass rank. These
tests pin its contract against the single-window formulations it
replaces, including the ANSI ntile bucket-size distribution for
every (n mod buckets) residue class.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark.queries import (
    _global_rank_with_total,
    _ntile_from_rank,
    global_rank,
)


def _synthetic(spark, n: int, n_dupes: int = 3):
    """n rows with deliberately duplicated sort values (ties must be
    broken by the id tiebreak, the strict-total-order contract)."""
    return (spark.range(n)
            .select(F.col("id"),
                    (F.col("id") % (max(1, n // n_dupes))).alias("v")))


@pytest.mark.parametrize("n", [1, 7, 100, 1000])
def test_global_rank_equals_single_window_row_number(spark, n):
    df = _synthetic(spark, n)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {r.id: r._rnk
           for r in global_rank(df, order, num_partitions=8).collect()}
    w = Window.orderBy(*order)
    ref = {r.id: r.rn
           for r in df.withColumn("rn", F.row_number().over(w)).collect()}
    assert got == ref


@pytest.mark.parametrize("n", [0, 1, 5, 9, 10, 11, 95, 100, 101, 1000])
@pytest.mark.parametrize("buckets", [7, 10])
def test_distributed_ntile_equals_window_ntile(spark, n, buckets):
    """Every residue class of n mod buckets, plus n < buckets and
    n == 0: the rank-derived bucket must reproduce F.ntile exactly
    (both Spark and DuckDB implement the same ANSI distribution —
    first n%b buckets take one extra row)."""
    df = _synthetic(spark, n)
    order = [F.col("v").desc(), F.col("id").asc()]
    ranked, total, _ = _global_rank_with_total(df, order, num_partitions=8)
    assert total == n
    got = {r.id: r.b for r in ranked.withColumn(
        "b", _ntile_from_rank(F.col("_rnk"), total, buckets)).collect()}
    w = Window.orderBy(*order)
    ref = {r.id: r.b for r in df.withColumn(
        "b", F.ntile(buckets).over(w).cast("long")).collect()}
    assert got == ref


def test_global_rank_plan_has_no_single_partition_exchange(spark):
    df = _synthetic(spark, 1000)
    ranked = global_rank(df, [F.col("v").desc(), F.col("id").asc()],
                         num_partitions=8)
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


@pytest.mark.parametrize("n", [1, 2, 10, 101, 997])
def test_distributed_quantile_cont_equals_percentile(spark, n):
    """Nonzero, near-unique values: the boundary-rank interpolation
    must reproduce Spark's exact percentile aggregate (and therefore
    DuckDB's quantile_cont) bit-for-bit."""
    from flink_user_behavior_analysis_spark.queries import (
        distributed_quantile_cont,
    )

    probs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    df = spark.range(n).select(
        (F.sin(F.col("id") * 12.9898) * 43758.5453).alias("v"))
    got = distributed_quantile_cont(df, "v", probs, num_partitions=8)
    ref = df.agg(*[F.percentile("v", p).alias(f"p{i}")
                   for i, p in enumerate(probs)]).collect()[0]
    for i, p in enumerate(probs):
        assert got[p] == ref[i], (p, got[p], ref[i])


def test_distributed_quantile_cont_empty(spark):
    from flink_user_behavior_analysis_spark.queries import (
        distributed_quantile_cont,
    )

    df = spark.range(0).select(F.col("id").cast("double").alias("v"))
    assert distributed_quantile_cont(df, "v", [0.5]) == {0.5: None}


def test_distributed_quantile_cont_ignores_nulls(spark):
    """percentile ignores NULLs; the distributed form must too —
    ranking them (nulls-first) would shift every boundary position
    and poison the interpolation with None arithmetic."""
    from flink_user_behavior_analysis_spark.queries import (
        distributed_quantile_cont,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,), (None,), (10.0,)], "v DOUBLE")
    probs = [0.0, 0.5, 1.0]
    got = distributed_quantile_cont(df, "v", probs, num_partitions=4)
    ref = df.agg(*[F.percentile("v", p).alias(f"p{i}")
                   for i, p in enumerate(probs)]).collect()[0]
    for i, p in enumerate(probs):
        assert got[p] == ref[i], (p, got[p], ref[i])
    # all-null column behaves like empty
    dfn = spark.createDataFrame([(None,), (None,)], "v DOUBLE")
    assert distributed_quantile_cont(dfn, "v", [0.5]) == {0.5: None}
