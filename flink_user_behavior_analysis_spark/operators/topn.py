"""Top-N per window (SURVEY.md section 2.5, T1/T2).

The reference buffers per-window rows in keyed ListState/MapState and
sorts on an event-time timer (HotItem.java:134-192 top-3 items;
HotPage.java:140-204 top-5 urls with late-update upsert). The batch
equivalent is a rank-over-partition; MapState upsert semantics (late
rows replacing earlier counts) are exactly what a batch recompute
produces, so no special handling is needed here. Streaming gets the
same ranking applied per micro-batch via foreachBatch (streaming/jobs).

Scale note: row_number over (window_end) partitions shuffles once on
window_end; with W windows and K keys per window the partitions are
W-wide, never data-wide. For extreme K, pre-aggregation has already
reduced cardinality to distinct keys, so the sort per partition is
O(K log K) on counts, not raw events.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_window(
    counts: DataFrame,
    n: int,
    partition_cols: Sequence[str] = ("window_end_us",),
    order_cols: Sequence[Column] | None = None,
    rank_alias: str = "rank",
) -> DataFrame:
    """Keep the top-n rows per window partition.

    order_cols must be a deterministic total order (pass a tiebreak
    column, e.g. [desc(cnt), asc(item_id)]) so results are stable and
    oracle-comparable.
    """
    order = list(order_cols) if order_cols else [F.col("cnt").desc()]
    w = Window.partitionBy(*partition_cols).orderBy(*order)
    return (
        counts.withColumn(rank_alias, F.row_number().over(w))
        .where(F.col(rank_alias) <= n)
    )
