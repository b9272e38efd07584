"""Unit tests for deterministic sampling/splitting
(operators/sampling.py): reproducibility, stability under
repartitioning, weight normalization, and seed independence.
"""

from flink_user_behavior_analysis_spark.operators import (
    hash_sample,
    hash_split,
)

SPLITS = [("train", 8.0), ("val", 1.0), ("test", 1.0)]  # unnormalized


def _ids(spark, n=500):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_split_deterministic_and_partition_stable(spark):
    df = _ids(spark)
    a = {r["doc_id"]: r["split"]
         for r in hash_split(df, SPLITS, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(17), SPLITS, "doc_id").collect()}
    assert a == b
    # unnormalized weights behave as 0.8/0.1/0.1
    from collections import Counter
    c = Counter(a.values())
    assert set(c) == {"train", "val", "test"}
    assert c["train"] > c["val"] and c["train"] > c["test"]


def test_subset_rows_keep_assignments(spark):
    # adding/removing rows never migrates existing ids between splits
    full = {r["doc_id"]: r["split"]
            for r in hash_split(_ids(spark, 500), SPLITS, "doc_id").collect()}
    half = {r["doc_id"]: r["split"]
            for r in hash_split(_ids(spark, 250), SPLITS, "doc_id").collect()}
    assert all(full[i] == s for i, s in half.items())


def test_sample_rate_and_seed(spark):
    df = _ids(spark, 1000)
    kept = hash_sample(df, 0.3, "doc_id").count()
    assert 200 < kept < 400
    s1 = {r["doc_id"] for r in hash_sample(df, 0.3, "doc_id", "a").collect()}
    s2 = {r["doc_id"] for r in hash_sample(df, 0.3, "doc_id", "b").collect()}
    assert s1 != s2  # different seeds give different samples
