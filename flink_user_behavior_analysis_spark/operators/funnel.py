"""Funnel conversion and cohort retention — the two classic
user-behavior rollups the reference's domain implies but never ships
(its CEP operators detect per-user sequences; these AGGREGATE them:
LoginFailWithCEP.java:62-74 shapes the per-user step matching,
AppMarketingStatistics.java:49-59 the conversion-counting).

Both are pure DataFrame compositions — per-user min-aggregations and
integer week arithmetic — so they hold at 100 TB: every stage is a
user-keyed groupBy/join (uniform key, map-side partials) and the
outputs are step- or week-sized, never user-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(events: DataFrame, steps: Sequence[str], within: str,
           ts_col: str = "ts", user_col: str = "user_id",
           type_col: str = "event_type") -> DataFrame:
    """First-touch funnel: users completing each prefix of ``steps``
    IN ORDER, with every later step inside ``within`` (an INTERVAL
    string) of the user's FIRST occurrence of step 1.

    Semantics are greedy-earliest (first-touch): step i+1 matches the
    user's earliest step-(i+1) event at-or-after their matched step-i
    time and inside the window anchored at t1. Deterministic and
    SQL-expressible; NOT maximal matching — a user who only converts
    via a later step-1 occurrence does not count, the standard
    product-analytics convention.

    Output: k rows (step_idx, step, n_users, conversion), conversion
    = n_users / step-1 users rounded to 4 decimals (0.0 throughout
    when no user reaches step 1).

    Scale shape: one filtered scan per step, each a user-keyed
    min-agg joined to the survivors so far — k-1 shuffles on the
    uniform user key for a k-step funnel. The whole funnel is ONE
    lazy plan (per-step counts union into the result; the step-1
    count rides along as a broadcast 1-row aggregate), no driver
    actions; output is k rows.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    iv = F.expr(f"INTERVAL {within}")
    ev = events.select(F.col(user_col).alias("_u"),
                       F.col(type_col).alias("_t"),
                       F.col(ts_col).alias("_ts"))
    cur = (ev.where(F.col("_t") == steps[0])
           .groupBy("_u").agg(F.min("_ts").alias("_t1")))
    cur = cur.withColumn("_prev", F.col("_t1"))
    stages = [cur]
    for st in steps[1:]:
        cur = (
            ev.where(F.col("_t") == st)
            .join(cur.select("_u", "_t1", "_prev"), "_u")
            .where((F.col("_ts") >= F.col("_prev"))
                   & (F.col("_ts") <= F.col("_t1") + iv))
            .groupBy("_u", "_t1")
            .agg(F.min("_ts").alias("_prev"))
        )
        stages.append(cur)
    from functools import reduce

    counted = [
        s.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i + 1).cast("long").alias("step_idx"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, s in enumerate(stages)
    ]
    u = reduce(lambda a, b: a.unionByName(b), counted)
    base = counted[0].select(F.col("n_users").alias("_base"))
    return (
        u.crossJoin(F.broadcast(base))
        .select(
            "step_idx", "step", "n_users",
            F.when(F.col("_base") > 0,
                   F.round(F.col("n_users").cast("double")
                           / F.col("_base"), 4))
            .otherwise(F.lit(0.0)).alias("conversion"),
        )
    )


def retention_cohorts(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id",
                      max_weeks: int = 8) -> DataFrame:
    """Weekly cohort retention: users bucketed by the epoch-week of
    their FIRST event; for each (cohort, week offset) the count and
    fraction of the cohort active that week.

    Weeks are floor(epoch_days / 7) — plain integer arithmetic, no
    calendar/timezone semantics to disagree across engines. Offset 0
    is the cohort week itself (retention 1.0 by construction — kept
    as the sanity row).

    Output: (cohort_week, week_offset, n_active, cohort_size,
    retention), offsets 0..max_weeks.

    Scale shape: one user-keyed min-agg (first event), one distinct
    (user, week) dedupe, one join back on user, one (cohort, offset)
    count — all uniform keys; output is #cohorts x max_weeks rows.
    """
    return retention_from_user_weeks(
        user_week_activity(events, ts_col, user_col), max_weeks)


def user_week_activity(events: DataFrame, ts_col: str = "ts",
                       user_col: str = "user_id") -> DataFrame:
    """Distinct (_u, _w) epoch-week activity pairs — the SUFFICIENT
    STATISTIC for cohort retention (first week = min over them;
    activity counts = counts over them), and the stage that runs as
    a streaming dedup in the production form: the stream maintains
    only distinct (user, week) state (bounded by users x weeks, not
    events) and retention_from_user_weeks re-aggregates the drained
    pairs to the k-row output per batch."""
    week = (F.floor(F.unix_micros(F.col(ts_col))
                    / F.lit(7 * 86400 * 10**6))).cast("long")
    return events.select(F.col(user_col).alias("_u"),
                         week.alias("_w")).distinct()


def retention_from_user_weeks(uw: DataFrame,
                              max_weeks: int = 8) -> DataFrame:
    """The aggregation half of retention_cohorts over an
    already-distinct (_u, _w) frame — separated so the streaming
    form composes (stream dedup ≡ batch distinct implies stream
    retention ≡ batch retention, test-asserted)."""
    # the join key is RENAMED on the aggregate side: `first` derives
    # from `uw`, and when `uw` is a materialized view (the streaming
    # drain) the self-join would otherwise carry conflicting
    # attribute ids into the analyzer
    first = (uw.groupBy("_u").agg(F.min("_w").alias("_cohort"))
             .withColumnRenamed("_u", "_fu"))
    sizes = first.groupBy("_cohort").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size"))
    active = (
        uw.join(first, uw["_u"] == first["_fu"])
        .select("_cohort", (F.col("_w") - F.col("_cohort")).alias("_off"))
        .where((F.col("_off") >= 0) & (F.col("_off") <= max_weeks))
        .groupBy("_cohort", "_off")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return (
        active.join(sizes, "_cohort")
        .select(
            F.col("_cohort").alias("cohort_week"),
            F.col("_off").cast("long").alias("week_offset"),
            "n_active", "cohort_size",
            F.round(F.col("n_active").cast("double")
                    / F.col("cohort_size"), 4).alias("retention"),
        )
    )


def error_spikes(events: DataFrame, window: str = "1 hour",
                 error_pred=None, threshold: float = 3.0,
                 ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Robust anomaly detection over windowed error counts: a window
    is a spike when its count's MODIFIED z-score against the
    median/MAD of all windows clears ``threshold`` — median/MAD, not
    mean/stddev, so the spikes being hunted don't inflate the
    baseline that judges them.

    z = (cnt - median) / max(MAD, 1); the max(,1) floor keeps the
    score finite on constant series (MAD 0). Exact percentile ==
    quantile_cont engine parity (the corpus_quantiles contract).

    Output: (window_end_us, n_errors, med, mad, z_score, is_spike)
    for every window with >= 1 error event.

    Scale shape: one filtered windowed count (map-side combined), a
    two-row global stats pass over the WINDOW COUNTS (not the
    events — thousands of rows at any corpus size), broadcast back.
    """
    from .windows import windowed_agg

    pred = (F.col(type_col) == "error") if error_pred is None else error_pred
    cnts = windowed_agg(
        events.where(pred), ts_col, [], window, None,
        [F.count(F.lit(1)).cast("long").alias("n_errors")],
    )
    return score_window_counts(cnts, threshold)


def score_window_counts(cnts: DataFrame,
                        threshold: float = 3.0) -> DataFrame:
    """The scoring half of error_spikes, over an already-computed
    (window_end_us, n_errors) frame — separated so the STREAMING form
    composes: the windowed count runs as a streaming aggregation into
    a sink, and this stage re-scores the (tiny, window-granular)
    counts table per batch or on read. Stream counts ≡ batch counts
    implies stream scores ≡ batch scores, test-asserted."""
    med = cnts.agg(F.percentile("n_errors", 0.5).alias("_med"))
    dev = cnts.crossJoin(F.broadcast(med)).select(
        F.abs(F.col("n_errors") - F.col("_med")).alias("_d"))
    mad = dev.agg(F.percentile("_d", 0.5).alias("_mad"))
    z = (F.col("n_errors") - F.col("_med")) / F.greatest(
        F.col("_mad"), F.lit(1.0))
    return (
        cnts.crossJoin(F.broadcast(med)).crossJoin(F.broadcast(mad))
        .select(
            "window_end_us", "n_errors",
            F.round("_med", 4).alias("med"),
            F.round("_mad", 4).alias("mad"),
            F.round(z, 4).alias("z_score"),
            (z >= F.lit(float(threshold))).cast("long").alias("is_spike"),
        )
    )


def user_day_activity(events: DataFrame, ts_col: str = "ts",
                      user_col: str = "user_id") -> DataFrame:
    """Distinct (_u, _d) epoch-day activity pairs — the sufficient
    statistic for DAU/WAU rollups, and the streaming-dedup state in
    the production form (the user_week_activity pattern at day
    grain)."""
    day = (F.floor(F.unix_micros(F.col(ts_col))
                   / F.lit(86400 * 10**6))).cast("long")
    return events.select(F.col(user_col).alias("_u"),
                         day.alias("_d")).distinct()


def dau_stickiness_from_user_days(ud: DataFrame) -> DataFrame:
    """The aggregation half of the DAU / trailing-7-day WAU /
    stickiness rollup over an already-distinct (_u, _d) frame —
    each pair explodes into its seven report days with a self
    marker, one (user, report-day) dedup carries both counts
    (queries.dau_stickiness documents the plan shape; split out so
    the streaming form composes, stream ≡ batch test-asserted)."""
    contrib = ud.select(
        "_u", "_d",
        F.explode(F.sequence(F.col("_d"), F.col("_d") + 6)).alias("_rd"))
    per_user_day = (
        contrib.groupBy("_u", "_rd")
        .agg(F.max((F.col("_d") == F.col("_rd")).cast("long"))
             .alias("_self"))
    )
    return (
        per_user_day.groupBy("_rd")
        .agg(F.sum("_self").cast("long").alias("dau"),
             F.count(F.lit(1)).cast("long").alias("wau"))
        .where(F.col("dau") > 0)
        .select(
            F.col("_rd").alias("day"), "dau", "wau",
            F.round(F.col("dau").cast("double") / F.col("wau"), 4)
            .alias("stickiness"),
        )
    )
