from .blacklist import cap_filter_with_warnings
from .joins import interval_join, reconcile
from .patterns import consecutive_events, match_create_pay
from .sessionize import sessionize
from .topn import top_n_per_window
from .uv import unique_visitors
from .windows import windowed_agg, windowed_count, windowed_global_count

__all__ = [
    "cap_filter_with_warnings",
    "consecutive_events",
    "interval_join",
    "match_create_pay",
    "reconcile",
    "sessionize",
    "top_n_per_window",
    "unique_visitors",
    "windowed_agg",
    "windowed_count",
    "windowed_global_count",
]
