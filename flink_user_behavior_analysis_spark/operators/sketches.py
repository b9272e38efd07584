"""Frequency sketches: count-min heavy hitters.

Third sketch family alongside HLL++ distinct counts (operators/uv.py)
and the GK quantile sketch (operators/text.py:corpus_quantiles_approx)
— the approximate counting toolbox a 100 TB pipeline runs where exact
aggregation is too expensive or the stream is unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters_cms(df: DataFrame, key_col: str, k: int = 10,
                      eps: float = 1e-4, confidence: float = 0.99,
                      seed: int = 42) -> DataFrame:
    """Top-``k`` keys by exact count, each carrying a count-min-sketch
    estimate certificate — the hot-key detector at stream scale
    (Spark's `count_min_sketch` aggregate is mergeable across
    partitions and time, so the sketch exists where exact counts
    can't; reference domain: HotItem's per-window counts).

    Output: (key, cnt, rnk, est_ok) with est_ok = 1 iff the sketch
    estimate e satisfies cnt <= e <= cnt + ceil(eps * N) — the CMS
    guarantee (one-sided overestimation, bounded by eps * total with
    probability ``confidence``). Like corpus_quantiles_approx, the
    oracle pins the EXACT top-k and demands every certificate be 1,
    so a broken sketch hash-mismatches instead of passing silently.

    Scale shape: the exact top-k is TakeOrderedAndProject (map-side
    partial top-k); the sketch is ONE mergeable aggregate; estimate
    probes are k driver-side lookups against the deserialized sketch
    (public org.apache.spark.util.sketch.CountMinSketch API) —
    bounded by k, never by |df|.
    """
    import math

    spark = df.sparkSession
    top = (
        df.groupBy(key_col).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(k)
        .collect()
    )
    row = df.agg(
        F.expr(f"count_min_sketch({key_col}, {eps}d, {confidence}d, {seed})")
        .alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    jvm = spark._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytes(row.s))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    bound = math.ceil(eps * row.n)
    out = []
    for rnk, r in enumerate(top, start=1):
        key, cnt = r[0], r[1]
        est = cms.estimateCount(key)
        out.append((key, cnt, rnk, 1 if cnt <= est <= cnt + bound else 0))
    key_type = df.schema[key_col].dataType
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([
        StructField(key_col, key_type),
        StructField("cnt", LongType()),
        StructField("rnk", LongType()),
        StructField("est_ok", LongType()),
    ])
    return spark.createDataFrame(out, schema)
