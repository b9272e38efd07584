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
right sides).

Skew follows the key distribution, and a window carry cannot be
row-salted (the carry crosses any within-key split): a dominant key
puts its whole history into ONE task's sort. ``slice_seconds``
parallelizes that with the standard segmented-scan decomposition
(r12, measured: the hot-key penalty grows with data size — 1.14x at
4M rows, 1.33x at 32M with a 20%-hot key, a straggler/spill risk at
cluster scale): partition by (key, time-slice) so the hot key splits
across span/width tasks, compute the per-slice carry locally, reduce
each slice to its end-of-slice carry (one row per (key, slice) — the
skew-free summary), prefix-scan the summaries per key, and stitch
with a per-column coalesce(local, inherited). Identical output to the
single-window pass (per-column independent last-non-null carry,
test-asserted), at the cost of a second within-partition sort and a
small co-partitioned join.
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
    slice_seconds: float | None = None,
    hot_key_threshold: int | None = None,
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

    ``slice_seconds`` (r12): opt-in segmented-scan parallelization
    for skewed keys — see the module docstring. None (default) keeps
    the single window pass; a skew-prone deployment picks a width
    giving ~executor-count slices over the hot key's time span.
    Output is identical either way (test-asserted).

    ``hot_key_threshold`` (r12, requires slice_seconds): HYBRID
    routing — slicing every key pays the summary/stitch overhead
    across the whole key space to fix a handful of keys (measured
    10x slower than plain on an 82k-key table with one hot key), so
    with a threshold only keys whose row count exceeds it are sliced
    (one map-combined count + a broadcast membership tag); the rest
    take the plain single-window pass and the two halves union. Keys
    are disjoint between the halves, so output is again identical
    (test-asserted). Pick roughly rows-per-healthy-task (e.g. 2-5M):
    the count scan is the only added cost when no key is hot.
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
    if hot_key_threshold is not None and slice_seconds is None:
        raise ValueError("hot_key_threshold requires slice_seconds")

    def _plain_carry(rows: DataFrame) -> DataFrame:
        w = (
            Window.partitionBy(*on)
            .orderBy(ts_order, F.col("_is_right").desc(),
                     *[F.col(c).asc() for c in order_tiebreak])
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return rows.select(
            *[F.col(c) for c in left.columns],
            F.col("_is_right"),
            F.col("_evt_us"),
            F.last("_r_ts_us", ignorenulls=True).over(w)
            .alias("_m_ts_us"),
            *[F.last(f"_r_{c}", ignorenulls=True).over(w)
              .alias(f"_m_{c}")
              for c in rcols],
        )

    if slice_seconds is None:
        carried = _plain_carry(unioned)
    elif hot_key_threshold is None:
        carried = _sliced_carry(unioned, on, rcols,
                                list(order_tiebreak), direction,
                                slice_seconds, left.columns)
    else:
        # hybrid: broadcast the (small) hot-key list, slice only
        # those keys, plain-window the rest, union — key-disjoint
        # halves, so the union IS the full result
        hot = (unioned.groupBy(*on)
               .agg(F.count(F.lit(1)).alias("_kc"))
               .where(F.col("_kc") > hot_key_threshold)
               .select(*on, F.lit(True).alias("_hot")))
        tagged = unioned.join(F.broadcast(hot), list(on), "left")
        hot_rows = tagged.where(F.col("_hot")).drop("_hot")
        cold_rows = tagged.where(F.col("_hot").isNull()).drop("_hot")
        carried = _plain_carry(cold_rows).unionByName(
            _sliced_carry(hot_rows, on, rcols,
                          list(order_tiebreak), direction,
                          slice_seconds, left.columns))
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


def _sliced_carry(unioned: DataFrame, on: Sequence[str],
                  rcols: Sequence[str],
                  order_tiebreak: Sequence[str], direction: str,
                  slice_seconds: float,
                  left_cols: Sequence[str]) -> DataFrame:
    """Segmented-scan carry over (key, time-slice) partitions — the
    skew-parallel twin of the single window pass (module docstring).

    Three skew-free stages replace the one skewed window:
      local    — the same ordered carry, additionally partitioned by
                 _slice = floor(ts / width): the hot key's sort
                 splits across its time slices;
      summary  — each (key, slice) reduced to its scan-order-LAST
                 row's carried values (row_number over the reversed
                 order), i.e. exactly what the next slice inherits;
                 one row per (key, slice), so the prefix scan below
                 sees slice-count rows per key, never row counts;
      stitch   — prefix last-non-null over summaries (strictly
                 previous slices in scan direction), joined back
                 co-partitioned, with a PER-COLUMN coalesce(local,
                 inherited) — per-column because the single-window
                 semantics carry each column's last non-null
                 independently, and equivalence must hold even when
                 right payload columns contain nulls.

    Ties (right.ts == left.ts) share a slice by construction
    (floor of the same timestamp), so tie resolution stays local and
    identical to the unsliced pass."""
    width_us = int(slice_seconds * 1_000_000)
    if width_us <= 0:
        raise ValueError(f"slice_seconds must be positive: "
                         f"{slice_seconds!r}")
    sliced = unioned.withColumn(
        "_slice", F.floor(F.col("_evt_us") / F.lit(width_us)))
    backward = direction == "backward"
    ts_order = (F.col("_evt_us").asc() if backward
                else F.col("_evt_us").desc())
    scan = [ts_order, F.col("_is_right").desc(),
            *[F.col(c).asc() for c in order_tiebreak]]
    rev = [(F.col("_evt_us").desc() if backward
            else F.col("_evt_us").asc()),
           F.col("_is_right").asc(),
           *[F.col(c).desc() for c in order_tiebreak]]
    w_local = (Window.partitionBy(*on, "_slice").orderBy(*scan)
               .rowsBetween(Window.unboundedPreceding,
                            Window.currentRow))
    local = sliced.select(
        *[F.col(c) for c in left_cols],
        F.col("_is_right"), F.col("_evt_us"), F.col("_slice"),
        F.last("_r_ts_us", ignorenulls=True).over(w_local)
        .alias("_l_ts_us"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w_local)
          .alias(f"_l_{c}") for c in rcols],
    )
    w_rev = Window.partitionBy(*on, "_slice").orderBy(*rev)
    summary = (
        local.withColumn("_rn", F.row_number().over(w_rev))
        .where(F.col("_rn") == 1)
        .select(*on, "_slice",
                F.col("_l_ts_us").alias("_s_ts_us"),
                *[F.col(f"_l_{c}").alias(f"_s_{c}") for c in rcols])
    )
    slice_order = (F.col("_slice").asc() if backward
                   else F.col("_slice").desc())
    w_prefix = (Window.partitionBy(*on).orderBy(slice_order)
                .rowsBetween(Window.unboundedPreceding, -1))
    incoming = summary.select(
        *on, "_slice",
        F.last("_s_ts_us", ignorenulls=True).over(w_prefix)
        .alias("_in_ts_us"),
        *[F.last(f"_s_{c}", ignorenulls=True).over(w_prefix)
          .alias(f"_in_{c}") for c in rcols],
    )
    return local.join(incoming, [*on, "_slice"], "left").select(
        *[F.col(c) for c in left_cols],
        F.col("_is_right"), F.col("_evt_us"),
        F.coalesce(F.col("_l_ts_us"), F.col("_in_ts_us"))
        .alias("_m_ts_us"),
        *[F.coalesce(F.col(f"_l_{c}"), F.col(f"_in_{c}"))
          .alias(f"_m_{c}") for c in rcols],
    )
