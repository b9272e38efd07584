"""Gap-based sessionization (engine extension; not in the reference's
inventory but a first-class primitive for behavior analytics and the
batch analogue of Spark's streaming session_window).

Classic lag+cumsum: a new session starts when the gap from the
previous event of the same key exceeds the threshold. Two window
passes over one shuffle on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    gap_seconds: float,
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign session ids and aggregate per session.

    Output: keys + session_start_us + session_end_us + n_events.
    """
    gap_us = int(gap_seconds * 1_000_000)
    order = [F.col(ts_col)] + [F.col(c) for c in order_tiebreak]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    ts_us = F.unix_micros(F.col(ts_col))
    marked = df.withColumn("_ts_us", ts_us).withColumn(
        "_new",
        F.when(
            F.col("_ts_us") - F.lag("_ts_us").over(w) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)),
    )
    sessioned = marked.withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessioned.groupBy(*key_cols, "session_id").agg(
        F.min("_ts_us").alias("session_start_us"),
        F.max("_ts_us").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
