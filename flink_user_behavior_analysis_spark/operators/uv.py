"""Unique-visitor counting, exact and approximate (SURVEY.md A7/A8).

Reference:
- exact UV: UniqueVisitor.java:48-51,64-79 — AllWindowFunction dumping
  every userId of a 1h tumbling window into a HashSet (driver-memory
  bound; does not scale).
- approx UV: UniqueVisitorWithBloomFilter.java:50-171 — custom bloom
  filter in a Redis bitmap (2^29 bits for 1e8 users, single polynomial
  hash seed 61), per-element FIRE_AND_PURGE trigger.

Spark-first rebuild: exact = count_distinct (internally a two-phase
partial-distinct aggregate — distributed, unlike the HashSet);
approx = approx_count_distinct (HyperLogLog++, constant memory per
window regardless of cardinality — the idiomatic replacement for the
bloom-filter design; error is symmetric where the reference's bloom
undercounts on collision, documented in SURVEY.md section 7d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import windowed_agg


def unique_visitors(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    size: str,
    slide: str | None = None,
    mode: str = "exact",
    rsd: float = 0.05,
    alias: str = "uv",
) -> DataFrame:
    """Distinct users per event-time window.

    mode='exact'   -> count_distinct (shuffle on (window, user) then
                      count; Catalyst expands to partial aggregation)
    mode='approx'  -> approx_count_distinct(rsd) (HLL++, single shuffle
                      of constant-size sketches — the 100 TB path)
    """
    if mode == "exact":
        agg = F.count_distinct(F.col(user_col)).alias(alias)
    elif mode == "approx":
        agg = F.approx_count_distinct(F.col(user_col), rsd).alias(alias)
    else:
        raise ValueError(f"unknown mode {mode!r}; use 'exact' or 'approx'")
    return windowed_agg(df, ts_col, [], size, slide, [agg])
