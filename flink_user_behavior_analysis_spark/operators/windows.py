"""Event-time window aggregations (SURVEY.md section 2.4, A1-A9).

The reference hand-writes partial+final aggregation per window
(AggregateFunction with add/merge, e.g. HotItem.java:94-114 plus a
WindowFunction stamping window.getEnd()). In Spark a single
``groupBy(window(...), keys).agg(...)`` gives the same semantics with
built-in partial aggregation (HashAggregate partial -> final), so the
reference's manual salting / two-stage tricks (PageView.java:66-80)
are unnecessary — see SURVEY.md section 4.

Window alignment: Spark's window() aligns to the epoch exactly like
Flink timeWindow (start = ts - (ts - offset) mod slide), so results
match the reference 1:1 given UTC session time.

All outputs expose ``window_start_us``/``window_end_us`` as epoch
microseconds (bigint) — timezone-proof, oracle-friendly, and matching
the reference's habit of emitting window.getEnd() millis.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str | Column],
    size: str,
    slide: str | None = None,
    aggs: Sequence[Column] | None = None,
    include_start: bool = False,
) -> DataFrame:
    """Sliding (or tumbling when slide is None) event-time window agg.

    One shuffle on (window, keys); map-side partial aggregation is
    automatic. At 100 TB this is the canonical scalable shape: the
    window expression fans each row out size/slide times *after* scan
    filters, and AQE coalesces the post-shuffle partitions.
    """
    win = F.window(F.col(ts_col), size, slide or size)
    agg_list = list(aggs) if aggs else [F.count(F.lit(1)).alias("cnt")]
    out_cols = [F.unix_micros(F.col("w.end")).alias("window_end_us")]
    if include_start:
        out_cols.insert(0, F.unix_micros(F.col("w.start")).alias("window_start_us"))
    key_cols = [F.col(k) if isinstance(k, str) else k for k in keys]
    grouped = df.groupBy(win.alias("w"), *key_cols)
    res = grouped.agg(*agg_list)
    keep = [c for c in res.columns if c != "w"]
    return res.select(*out_cols, *keep)


def windowed_count(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str | Column],
    size: str,
    slide: str | None = None,
    count_alias: str = "cnt",
) -> DataFrame:
    """Per-key sliding-window count — A1/A2/A3/A5 shape
    (reference HotItem.java:70-75, HotPage.java:68-78,
    AppMarketingByChannel.java:47-51, AdStatisticsByProvince.java:49-52).
    """
    return windowed_agg(
        df, ts_col, keys, size, slide, [F.count(F.lit(1)).alias(count_alias)]
    )


def windowed_global_count(
    df: DataFrame, ts_col: str, size: str, slide: str | None = None,
    count_alias: str = "cnt",
) -> DataFrame:
    """Global (keyless) windowed count — A4/A6 shape
    (reference AppMarketingStatistics.java:49-59 constant-key map M2,
    PageView.java:66-80 salted two-stage total; both collapse to one
    Spark operator because partial aggregation handles the hot key).
    """
    return windowed_agg(df, ts_col, [], size, slide,
                        [F.count(F.lit(1)).alias(count_alias)])


def salted_two_stage_count(
    df: DataFrame, ts_col: str, size: str, slide: str | None = None,
    buckets: int = 10, salt_col: str | None = None,
    count_alias: str = "cnt",
) -> DataFrame:
    """Explicit salted two-stage windowed count — the reference's M1
    skew-mitigation pattern made first-class (PageView.java:66-80:
    map to (randomSalt, 1) -> per-salt window count -> re-key by
    windowEnd -> final sum).

    Spark's map-side partial aggregation already handles the
    hot-constant-key case, so windowed_global_count is the normal
    path; this operator exists for (a) reference parity and (b) the
    genuinely pathological case where one *group key* (not the
    constant) dominates — salt on a deterministic hash of a
    high-cardinality column so results stay reproducible, unlike the
    reference's random.nextInt(10).
    """
    # default: hash every column — deterministic in row content alone
    # (monotonically_increasing_id would change with partition layout,
    # breaking the reproducibility this operator promises)
    salt = (
        F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
        if salt_col is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )
    salted = df.withColumn("_salt", salt)
    partial = windowed_agg(
        salted, ts_col, ["_salt"], size, slide,
        [F.count(F.lit(1)).alias("_partial")],
    )
    return (
        partial.groupBy("window_end_us")
        .agg(F.sum("_partial").alias(count_alias))
    )
