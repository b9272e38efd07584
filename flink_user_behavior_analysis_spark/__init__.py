"""PySpark-native analytics engine with the query capabilities of
JustxYHG/flink-user-behavior-analysis (see SURVEY.md), rebuilt
Spark-first: DataFrame/SQL plans optimized by Catalyst, Structured
Streaming for event-time streams, Pandas UDFs only where built-ins
cannot express the semantics.
"""

from .session import ensure_utc, get_spark

__all__ = ["get_spark", "ensure_utc"]
