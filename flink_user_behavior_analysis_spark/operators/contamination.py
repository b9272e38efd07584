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


def source_overlap_matrix(docs: DataFrame, n: int = 5,
                          id_col: str = "doc_id",
                          source_col: str = "source",
                          text_col: str = "text") -> DataFrame:
    """Cross-SOURCE contamination matrix: for every unordered source
    pair, how many distinct token ``n``-grams appear in BOTH — the
    diagnostic a mixture pipeline reads before weighting sources
    (heavy overlap means double-counting the same content under two
    names; Common Crawl vs a curated subset is the classic case).

    Output: (source_a, source_b, n_shared_grams), source_a <
    source_b lexicographically, pairs with zero overlap omitted.

    Scale shape (100 TB): one (gram, source) distinct aggregation
    (uniform md5-ish keys), then per-gram the DISTINCT SOURCE SET —
    bounded by #sources, which is small by definition — exploded
    into unordered pairs (<= |sources|^2 rows per gram, typically
    1) and counted. NO doc-pair or gram-pair join ever exists; a
    gram shared by millions of docs in two sources still contributes
    exactly one (pair, gram) row.
    """
    gs = (
        with_shingles(docs, id_col, text_col, n)
        .join(docs.select(F.col(id_col),
                          F.col(source_col).alias("_src")), id_col)
        .select("_src", F.explode_outer("shingles").alias("gram"))
        .where(F.col("gram").isNotNull())
        .distinct()
    )
    per_gram = gs.groupBy("gram").agg(
        F.array_sort(F.collect_set("_src")).alias("_srcs"))
    pairs = per_gram.select(
        F.explode(F.expr(
            "flatten(transform(_srcs, (a, i) -> "
            "transform(slice(_srcs, i + 2, size(_srcs)), "
            "b -> struct(a AS source_a, b AS source_b))))"
        )).alias("p")
    ).select("p.source_a", "p.source_b")
    return (
        pairs.groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_grams"))
    )
