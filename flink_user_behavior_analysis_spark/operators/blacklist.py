"""Stateful cap filter with warnings (SURVEY.md F6).

Reference: AdStatisticsByProvinceWithoutBlacklist.java:54-179 — per
(userId, adId), pass clicks while the daily count < cap; at the cap
emit ONE BlacklistUserWarning to a side output and drop the rest; a
daily timer clears state at midnight (UTC+8 in the reference; the
period timezone is a parameter here, default UTC to match the oracle).

Batch formulation: running rank per (keys, period-day) ordered by
event time; rows with rank <= cap pass, the single rank == cap+1 row
becomes the warning (dedup-free by construction). One shuffle on
(keys + day). Streaming-exact variant (timer at midnight) lives in
streaming/stateful.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cap_filter_with_warnings(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    cap: int,
    order_tiebreak: Sequence[str] = (),
) -> dict[str, DataFrame]:
    """Per (keys, day): pass the first `cap` events, warn once at cap+1.

    Returns {'passed': rows that survive, 'warnings': one row per
    (keys, day) that crossed the cap}.
    """
    day = F.date_format(F.date_trunc("day", F.col(ts_col)), "yyyy-MM-dd")
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(*key_cols, "day").orderBy(*order)
    ranked = df.withColumn("day", day).withColumn("_rn", F.row_number().over(w))
    passed = ranked.where(F.col("_rn") <= cap).drop("_rn")
    warnings = (
        ranked.where(F.col("_rn") == cap + 1)
        .select(
            *key_cols,
            "day",
            F.lit(f"click over {cap} times today").alias("warning_msg"),
        )
    )
    return {"passed": passed, "warnings": warnings}
