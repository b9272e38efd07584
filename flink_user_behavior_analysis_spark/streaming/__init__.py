from .jobs import (
    STREAMING_QUERIES,
    exact_dedup_stream,
    hot_items_counts_stream,
    marketing_by_channel_stream,
    page_views_stream,
    run_available_now,
    run_topn_foreach_batch,
    run_with_late_channel,
    sessionize_stream,
    stream_events,
    tx_interval_join_stream,
    unique_visitors_stream,
)
from .stateful import (
    cap_filter_stateful,
    consecutive_fail_stateful,
    order_timeout_stateful,
    reconcile_stateful,
)

__all__ = [
    "STREAMING_QUERIES",
    "exact_dedup_stream",
    "cap_filter_stateful",
    "consecutive_fail_stateful",
    "reconcile_stateful",
    "hot_items_counts_stream",
    "marketing_by_channel_stream",
    "order_timeout_stateful",
    "page_views_stream",
    "run_available_now",
    "run_topn_foreach_batch",
    "run_with_late_channel",
    "sessionize_stream",
    "stream_events",
    "tx_interval_join_stream",
    "unique_visitors_stream",
]
