"""Sequence/pattern detection (SURVEY.md sections 2.6 J3 and 2.7 C1-C3).

The reference implements these twice each — hand-rolled
KeyedProcessFunction state machines (LoginFail.java:65-196,
OrderTimeoutWithoutCEP.java:52-161) and Flink CEP patterns
(LoginFailWithCEP.java:62-112, OrderTimeout.java:52-88). Semantics,
not mechanism, are owed: both collapse to one operator each here.

Batch formulation is pure window-function SQL (lag / conditional
aggregation) — fully Catalyst-optimizable and DuckDB-oracle-checkable.
Exact streaming-timer semantics live in streaming/stateful.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def consecutive_events(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    match: Column,
    n: int = 2,
    within_seconds: float | None = None,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Detect n consecutive matching events per key within a time span.

    Reference semantics (LoginFailWithCEP.java:62-74:
    ``times(n).consecutive().within(t)`` keyed by userId): n matching
    events with NO non-matching event between them, first-to-last
    timestamp span <= t. A non-matching event resets the run — captured
    here because the rows-window counts *all* events, so any
    interleaved non-match makes the match-count < n.

    Output: key cols + first_ts/last_ts of the run (epoch micros) —
    the LoginFailWarning shape (LoginFailWarning.java:10-13).

    One shuffle on key_cols; the window sort is per-key. Skew-safe at
    scale as long as a single key's history fits a partition (true for
    per-user streams).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    run_w = w.rowsBetween(-(n - 1), 0)
    flagged = df.withColumn("_m", match.cast("int"))
    runs = flagged.select(
        *key_cols,
        F.unix_micros(F.lag(F.col(ts_col), n - 1).over(w)).alias("first_fail_us"),
        F.unix_micros(F.col(ts_col)).alias("last_fail_us"),
        F.sum("_m").over(run_w).alias("_run"),
    )
    cond = F.col("_run") == n
    if within_seconds is not None:
        cond = cond & (
            (F.col("last_fail_us") - F.col("first_fail_us"))
            <= int(within_seconds * 1_000_000)
        )
    return runs.where(cond).drop("_run")


def followed_by(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    first: Column,
    second: Column,
    within_seconds: float,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """General two-step CEP with RELAXED contiguity: per key, each
    event matching ``first`` pairs with the EARLIEST strictly-later
    event matching ``second`` when the gap is <= within_seconds —
    Flink's ``begin(A).followedBy(B).within(t)`` (OrderTimeout.java:
    52-60 uses exactly this contiguity; the commented two-step login
    pattern LoginFailWithCEP.java:48-59 is the n=2 shape). Unlike
    consecutive_events (strict ``next`` contiguity), non-matching
    events BETWEEN the two steps do not break the match.

    Window-function form: one shuffle on key_cols; for every row the
    next ``second``-match timestamp comes from a min over the
    strictly-following frame in (ts, tiebreak) order, so each
    qualifying A emits exactly one row — the first-following-B match
    Flink's NO_SKIP strategy produces. Output: key cols + first_us /
    second_us (epoch micros).
    """
    ts_us = F.unix_micros(F.col(ts_col))
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = (Window.partitionBy(*key_cols).orderBy(*order)
         .rowsBetween(1, Window.unboundedFollowing))
    flagged = df.withColumn("_ts_us", ts_us)
    next_b = F.min(F.when(second, F.col("_ts_us"))).over(w)
    return (
        flagged.withColumn("_next_b_us", next_b)
        .where(
            first
            & F.col("_next_b_us").isNotNull()
            & (F.col("_next_b_us") - F.col("_ts_us")
               <= int(within_seconds * 1_000_000))
        )
        .select(
            *key_cols,
            F.col("_ts_us").alias("first_us"),
            F.col("_next_b_us").alias("second_us"),
        )
    )


def match_create_pay(
    events: DataFrame,
    key_cols: Sequence[str],
    type_col: str,
    ts_col: str,
    create_value: str,
    pay_value: str,
    timeout_seconds: float,
) -> DataFrame:
    """Order-payment timeout detection (reference J3/C3:
    OrderTimeout.java:52-88 CEP ``create followedBy pay within 15min``
    and OrderTimeoutWithoutCEP.java:68-161 stateful variant).

    Per key: create_ts = earliest create; pay_ts = earliest pay at or
    after create_ts. States mirror the reference's four outcomes
    (OrderTimeoutWithoutCEP.java:95-135):
      payed            - pay within timeout of create
      timeout_no_pay   - create but no (later) pay      ("order pay timeout")
      timeout_payed_late - pay exists but after deadline ("payed but already timeout")
      payed_not_created  - pay with no create            ("already payed but not found created log")

    Boundary is strict-less-or-equal ... the reference uses
    ``pay < create + timeout`` strictly (OrderTimeoutWithoutCEP.java:115)
    — preserved: payed iff pay_us < create_us + timeout.

    Single shuffle on key_cols (window functions + final groupBy reuse
    the same hash partitioning — one Exchange in the physical plan).
    """
    timeout_us = int(timeout_seconds * 1_000_000)
    is_create = F.col(type_col) == create_value
    is_pay = F.col(type_col) == pay_value
    wk = Window.partitionBy(*key_cols)
    ts_us = F.unix_micros(F.col(ts_col))
    enriched = (
        events.where(is_create | is_pay)
        .withColumn("_ts_us", ts_us)
        .withColumn("_create_us", F.min(F.when(is_create, F.col("_ts_us"))).over(wk))
    )
    pay_after = F.min(
        F.when(is_pay & (F.col("_ts_us") >= F.col("_create_us")), F.col("_ts_us"))
    ).over(wk)
    enriched = enriched.withColumn("_pay_us", pay_after)
    per_key = enriched.groupBy(*key_cols).agg(
        F.min("_create_us").alias("create_us"),
        F.min("_pay_us").alias("pay_us"),
    )
    state = (
        F.when(F.col("create_us").isNull(), F.lit("payed_not_created"))
        .when(F.col("pay_us").isNull(), F.lit("timeout_no_pay"))
        .when(
            F.col("pay_us") < F.col("create_us") + F.lit(timeout_us),
            F.lit("payed"),
        )
        .otherwise(F.lit("timeout_payed_late"))
    )
    return per_key.withColumn("result_state", state)
