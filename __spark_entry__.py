"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship hot-items query on sf0.001
queries()     -> every implemented operator from SURVEY.md section 2
oracle_sql()  -> matching DuckDB SQL per query (omitted only for
                 sketch-based / streaming ops, which get rows-only checks)
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_user_behavior_analysis_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["hot_items"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (keys match queries())."""
    return dict(_q.ORACLES)
