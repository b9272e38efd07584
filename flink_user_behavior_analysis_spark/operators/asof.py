"""As-of join: for each left row, the most recent right row at or
before it (per key), optionally within a tolerance window — or, with
``direction='forward'``, the earliest right row at or after it.

Spark has no built-in as-of join (pandas does; Flink/kdb users expect
it). The scalable formulation here avoids any per-row range probe:

  1. tag both inputs and UNION them (right rows sort before left rows
     at equal timestamps so "at or before" includes ties),
  2. one window over (key ORDER BY ts, tag): ``last(right_val,
     ignorenulls=True)`` carries the latest right row forward,
  3. keep the left rows; optionally null out matches older than the
     tolerance.

One shuffle on the key, one sort within partitions — the same cost
profile as a sort-merge join, regardless of how many right rows
precede each left row (a naive join+max-per-left explodes on dense
right sides). Skew follows the key distribution; salt with
operators.skew if one key dominates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str] = (),
    tolerance_seconds: float | None = None,
    suffix: str = "_asof",
    order_tiebreak: Sequence[str] = (),
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the nearest right row per key: the latest with
    right.ts <= left.ts (``direction='backward'``, default) or the
    earliest with right.ts >= left.ts (``'forward'`` — next-event
    semantics: time-to-next-error, next shipment after an order).

    Output: every left column, plus ``{right_ts}{suffix}`` (epoch us,
    null when no match) and each requested right column as
    ``{col}{suffix}``. Ties (right.ts == left.ts) match in both
    directions.

    order_tiebreak columns (present on BOTH sides) give same-timestamp
    right rows a deterministic carry order — required whenever right
    timestamps can repeat per key. The max-tiebreak row wins in either
    direction.

    ``direction`` only flips the scan order of the same single window
    pass — the cost profile is identical.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward': {direction!r}")
    on = list(on)
    rcols = list(right_cols)
    passthrough = set(on) | set(order_tiebreak)
    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(0).alias("_is_right"),
        F.unix_micros(F.col(left_ts)).alias("_evt_us"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in rcols],
        F.lit(None).cast("long").alias("_r_ts_us"),
    )
    r_tagged = right.select(
        *[F.col(c) if c in passthrough
          else F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns],
        F.lit(1).alias("_is_right"),
        F.unix_micros(F.col(right_ts)).alias("_evt_us"),
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
        F.unix_micros(F.col(right_ts)).alias("_r_ts_us"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows sort BEFORE left rows at the same timestamp so the
    # carried value includes ties ("at or before" / "at or after");
    # forward simply scans time in reverse, turning the carried
    # "latest at-or-before" into "earliest at-or-after"
    ts_order = (F.col("_evt_us").asc() if direction == "backward"
                else F.col("_evt_us").desc())
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, F.col("_is_right").desc(),
                 *[F.col(c).asc() for c in order_tiebreak])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("_is_right"),
        F.col("_evt_us"),
        F.last("_r_ts_us", ignorenulls=True).over(w).alias("_m_ts_us"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_m_{c}")
          for c in rcols],
    )
    out = carried.where(F.col("_is_right") == 0)
    match_ts = F.col("_m_ts_us")
    if tolerance_seconds is not None:
        tol_us = int(tolerance_seconds * 1_000_000)
        # the match is on the past side (backward) or future side
        # (forward) by construction, so |gap| covers both directions
        in_tol = F.abs(F.col("_evt_us") - F.col("_m_ts_us")) <= tol_us
        match_ts = F.when(in_tol, F.col("_m_ts_us"))
        out = out.select(
            *[F.col(c) for c in left.columns],
            match_ts.alias(f"{right_ts}{suffix}"),
            *[F.when(in_tol, F.col(f"_m_{c}")).alias(f"{c}{suffix}")
              for c in rcols],
        )
    else:
        out = out.select(
            *[F.col(c) for c in left.columns],
            match_ts.alias(f"{right_ts}{suffix}"),
            *[F.col(f"_m_{c}").alias(f"{c}{suffix}") for c in rcols],
        )
    return out
