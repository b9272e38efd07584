"""Benchmark decontamination: flag training documents that share
token n-grams with a held-out evaluation set.

The standard pre-training hygiene step (cf. GPT-3 appendix C /
PaLM app. D: 8-13-token n-gram collision => drop or redact the
training doc). The eval membership here is a deterministic hash
split of the same corpus — in production it would be the benchmark
suite loaded as its own table; the operator shape is identical.

Scale shape: the eval side is tiny by construction (benchmarks are
MBs; the corpus is TBs), so its distinct n-gram set BROADCASTS and
the contamination check is a map-side semi-join on the exploded
training stream — the 100 TB side is never shuffled. One small
shuffle remains: the per-doc hit-count aggregation on (doc_id),
whose input is only the colliding grams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingles
from .sampling import hash_uniform


def ngram_contamination(
    docs: DataFrame,
    eval_rate: float = 0.05,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: str = "eval",
) -> DataFrame:
    """Training docs (u(id) >= eval_rate) that share >=1 distinct
    token ``n``-gram with any eval doc (u(id) < eval_rate).

    Returns (id, n_hits) for contaminated training docs only —
    n_hits = number of distinct n-grams of the doc that also occur
    anywhere in the eval set. Deterministic: the eval split is the
    portable hash of sampling.hash_uniform, so the output is
    oracle-checkable.
    """
    sh = with_shingles(docs, id_col, text_col, n).withColumn(
        "_is_eval", hash_uniform(id_col, seed) < eval_rate
    )
    grams = sh.select(
        F.col(id_col), "_is_eval", F.explode_outer("shingles").alias("gram")
    ).where(F.col("gram").isNotNull())
    # shingles are distinct per doc (with_shingles contract), so the
    # eval union only needs a distinct() and per-doc hits are count(*)
    eval_grams = grams.where(F.col("_is_eval")).select("gram").distinct()
    train = grams.where(~F.col("_is_eval"))
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
