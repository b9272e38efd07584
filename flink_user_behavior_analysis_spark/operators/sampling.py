"""Deterministic sampling and dataset splitting for training-data
pipelines: every row's fate is a pure function of (seed, id), so
splits are reproducible across runs, engines, and cluster sizes —
no RNG state, no per-partition seeds, no reshuffle sensitivity.

u(id) = md5_long(seed || ':' || id) / 2^60 is uniform on [0, 1); both
Spark and DuckDB compute it bit-identically (the repo's portable
60-bit md5 hash), so assignments are oracle-checkable. At 100 TB this
is a narrow projection + scan (no shuffle, no state): the split
column can be computed at read time or written once as a partition
column.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import md5_long

_HASH_SPACE = float(1 << 60)


def hash_uniform(id_col: str, seed: str) -> Column:
    """Deterministic uniform [0, 1) from (seed, id)."""
    return md5_long(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    ) / F.lit(_HASH_SPACE)


def hash_sample(df: DataFrame, rate: float, id_col: str,
                seed: str = "sample") -> DataFrame:
    """Keep ~rate of rows, deterministically (u < rate)."""
    return df.where(hash_uniform(id_col, seed) < rate)


def hash_split(df: DataFrame, splits: Sequence[tuple[str, float]],
               id_col: str, seed: str = "split") -> DataFrame:
    """Assign each row to a named split with the given weights.

    ``splits`` is [(name, weight), ...]; weights are normalized.
    Returns df plus a ``split`` column. Rows never migrate between
    splits when data is added, repartitioned, or reprocessed — the
    property training pipelines need to avoid train/test leakage
    across dataset versions.
    """
    total = sum(w for _, w in splits)
    u = hash_uniform(id_col, seed)
    expr = None
    acc = 0.0
    for name, w in splits[:-1]:
        acc += w / total
        cond = u < acc
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = splits[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def stratified_sample_k(df: DataFrame, key_cols: Sequence[str], k: int,
                        id_col: str, seed: str = "strat") -> DataFrame:
    """Exactly min(k, |stratum|) rows per key group, deterministically:
    rank rows within each stratum by the portable hash of (seed, id)
    (id tiebreak) and keep rank <= k — a reproducible, engine-portable
    replacement for reservoir sampling (balanced per-class subsets,
    eval-set carving).

    Scale shape: ONE shuffle on the stratum key; the rank is a
    row_number window, which Spark evaluates streaming per partition
    (no buffering beyond the sort). Skew caveat: a stratum lives in
    one task — for few/huge strata at 100 TB, pre-filter with an
    approximate per-stratum hash threshold (hash_uniform < ~k/n_s)
    before the exact rank so the sort input is O(k) per stratum.

    Returns df plus ``strat_rank`` (1-based within stratum).
    """
    from pyspark.sql import Window

    h = md5_long(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        h.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("strat_rank", F.row_number().over(w).cast("long"))
        .where(F.col("strat_rank") <= k)
    )


def frequency_cap(df: DataFrame, key_cols: Sequence[str], cap: int,
                  order_cols: Sequence[Column]) -> DataFrame:
    """Per-key frequency cap, quality-ordered: at most ``cap`` rows
    KEPT per key, preferring rows earliest in ``order_cols`` order —
    the C4 / RefinedWeb-style domain cap (no single site may dominate
    the corpus; when it would, keep its best documents, not a random
    subset — that is the difference from stratified_sample_k's
    hash-ordered variant above). Returns every input row plus
    ``cap_rank`` (1-based within key) and ``kept`` (rank <= cap), so
    callers can audit the dropped slice instead of silently losing it.

    Callers must make ``order_cols`` total (unique tiebreak last) or
    the keep set is nondeterministic under Spark's unstable sort.

    Scale shape: ONE shuffle on the key; row_number streams per
    partition. Hot domains are exactly the rows this operator exists
    to bound, so the skew is structural — AQE's skew-split handles the
    sort, and the post-filter output is <= cap rows per key either
    way. For extreme single-domain skew, pre-truncate per input split
    with the same window under a (split_id, key) partition first: the
    global top-cap is a subset of any per-split top-cap union.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(
        *order_cols)
    return (
        df.withColumn("cap_rank", F.row_number().over(w).cast("long"))
        .withColumn("kept", F.col("cap_rank") <= cap)
    )


def mixture_sample(df: DataFrame, rates: dict[str, float],
                   group_col: str = "source",
                   id_col: str = "doc_id",
                   seed: str = "mix",
                   default_rate: float = 0.0) -> DataFrame:
    """Deterministic data mixing: keep each group at its own sampling
    rate — how a pre-training run hits a target source mixture (e.g.
    downweight a crawl, keep all of a curated source). Rows keep or
    drop by hash(seed, id) < rate[group], so mixtures are REPRODUCIBLE
    and monotone: raising a group's rate only ADDS documents (the
    kept set at rate r is a subset of the kept set at r' > r) — the
    property that lets mixture ablations share a cache.

    Groups absent from ``rates`` get ``default_rate``. Pure scan
    predicate (one small CASE expression, no join, no shuffle).
    """
    u = hash_uniform(id_col, seed)
    rate = F.lit(float(default_rate))
    for g, r in sorted(rates.items()):
        rate = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(rate)
    return df.where(u < rate)


def temperature_mixture(df: DataFrame, alpha: float = 0.5,
                        group_col: str = "source",
                        id_col: str = "doc_id",
                        seed: str = "tmix") -> DataFrame:
    """Temperature-scaled source mixing [the mT5/multilingual-T5
    alpha-sampling scheme, Xue et al. 2021, arXiv:2010.11934 §3.1]:
    resample so the kept distribution over groups is ∝ n_g^alpha —
    alpha < 1 upweights tail sources relative to their raw share
    (alpha=1 keeps the corpus mixture, alpha=0 targets uniform).
    Per-group keep rate r_g = n_g^(alpha-1) / max_h n_h^(alpha-1),
    normalized so the MOST-upweighted (smallest) group keeps
    everything and no rate exceeds 1; rows then keep/drop by the
    same portable hash(seed, id) < r_g rule as mixture_sample, so
    the draw is reproducible, monotone in alpha per group, and
    oracle-checkable.

    Scale shape: one tiny groupBy count (|groups| rows), the max as
    a broadcast 1-row aggregate, the rates broadcast-joined back —
    the fact table never shuffles. Rates are rounded to 6 decimals
    IN BOTH ENGINES so the keep predicate compares the identical
    double (pow() may differ in the last ulp across engines).
    Returns the kept rows plus their group's ``rate``."""
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n"))
    raw = counts.select(
        group_col, F.pow("_n", F.lit(float(alpha) - 1.0)).alias("_r"))
    mx = raw.agg(F.max("_r").alias("_mx"))
    rates = raw.crossJoin(F.broadcast(mx)).select(
        group_col,
        F.round(F.col("_r") / F.col("_mx"), 6).alias("rate"))
    u = hash_uniform(id_col, seed)
    return (df.join(F.broadcast(rates), group_col)
            .where(u < F.col("rate")))


def gumbel_key(id_col: str, seed: str, weight_col: str,
               temperature: float = 1.0) -> Column:
    """Perturbed log-weight for Gumbel-top-k sampling:
    key = w/temperature + G(seed, id), with G a standard Gumbel
    (-ln(-ln(u))) whose uniform comes from a 48-BIT portable hash —
    48 bits (not the usual 60) so (h + 0.5) / 2^48 is exact double
    arithmetic with u strictly inside (0, 1) in BOTH engines (a
    60-bit h can round up to 2^60 as a double, pushing u to 1.0 and
    the Gumbel to a log-of-zero). ``weight_col`` must hold a LOG
    weight (e.g. dsir_weights.logw).

    DuckDB equivalent of the uniform:
    (('0x' || substr(md5(seed || ':' || id::VARCHAR), 1, 12))::BIGINT
     + 0.5) / 281474976710656.0
    """
    h48 = F.conv(
        F.substring(F.md5(F.concat(
            F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))),
            1, 12), 16, 10).cast("long")
    u = (h48.cast("double") + F.lit(0.5)) / F.lit(float(1 << 48))
    g = -F.log(-F.log(u))
    return F.col(weight_col) / F.lit(float(temperature)) + g


def weighted_sample_k(df: DataFrame, weight_col: str, k: int,
                      id_col: str = "doc_id",
                      temperature: float = 1.0,
                      seed: str = "gumbel") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement via the
    Gumbel-top-k trick [Efraimidis & Spirakis 2006; Kool et al. 2019,
    arXiv:1903.06059]: the k rows with the largest
    ``w/temperature + Gumbel(seed, id)`` are an exact sample from the
    softmax(w/temperature)-weighted without-replacement distribution.
    Unlike a plain top-k (which returns only the head and kills
    diversity), the perturbation admits every row with the right
    probability — DSIR's resampling step, here derandomized through
    the portable hash so the draw is REPRODUCIBLE, layout-invariant,
    and oracle-checkable (rerunning with the same seed reproduces the
    sample; changing the seed redraws).

    Scale shape: one scan projecting the key, then a distributed
    top-k (TakeOrderedAndProject — per-partition heads, no global
    sort, no shuffle of the losers). Returns the sampled rows with
    their perturbed ``skey`` and 1-based ``rnk``."""
    from pyspark.sql import Window

    keyed = df.withColumn(
        "skey", F.round(gumbel_key(id_col, seed, weight_col,
                                   temperature), 4))
    win = Window.orderBy(F.col("skey").desc(), F.col(id_col).asc())
    return (keyed.withColumn("rnk", F.row_number().over(win))
            .where(F.col("rnk") <= int(k))
            .withColumn("rnk", F.col("rnk").cast("long")))
