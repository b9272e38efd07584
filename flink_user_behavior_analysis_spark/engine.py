"""User-facing engine facade: one object that loads the tables, runs
the named analytics (batch or streaming), and exposes Spark SQL over
the registered views.

The reference's user experience is "pick one of 13 main() classes and
run it" (SURVEY.md section 3); here the equivalent is:

    from flink_user_behavior_analysis_spark.engine import Engine
    eng = Engine(sf_dir="/root/testdata/sf0.01")
    eng.query("hot_items").show()          # any SURVEY section 2 query
    eng.sql("SELECT count(*) FROM events") # free SQL over the views
    eng.reference_query("ref_hot_pages")   # the reference's own fixtures
    eng.list_queries()

SQL over registered tables is a capability the reference lacks
(SURVEY.md section 2.10) — Spark gives it for free once the views are
registered, so the engine exposes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import queries as _q
from . import queries_reference as _qr
from .session import ensure_utc, get_spark
from .sources import load_table, register_views


class Engine:
    def __init__(self, sf_dir: str, spark: SparkSession | None = None,
                 register_sql_views: bool = True):
        self.sf_dir = sf_dir
        self.spark = spark or get_spark()
        ensure_utc(self.spark)
        if register_sql_views:
            register_views(self.spark, sf_dir)

    # ------------------------------------------------------------ queries

    def list_queries(self) -> list[str]:
        return sorted(_q.QUERIES)

    def query(self, name: str) -> DataFrame:
        """Run a named analytic from the SURVEY section 2 registry."""
        try:
            fn = _q.QUERIES[name]
        except KeyError:
            raise KeyError(
                f"unknown query {name!r}; one of {', '.join(self.list_queries())}"
            ) from None
        return fn(self.spark, self.sf_dir)

    def oracle_sql(self, name: str) -> str | None:
        """The DuckDB-oracle SQL for a query (None for sketch/stateful
        rows-only queries)."""
        return _q.ORACLES.get(name)

    def reference_query(self, name: str, **paths) -> DataFrame:
        """Run one of the reference-fixture parity queries
        (queries_reference.REFERENCE_QUERIES)."""
        try:
            fn = _qr.REFERENCE_QUERIES[name]
        except KeyError:
            raise KeyError(
                f"unknown reference query {name!r}; one of "
                f"{', '.join(sorted(_qr.REFERENCE_QUERIES))}"
            ) from None
        return fn(self.spark, **paths)

    # ---------------------------------------------------------------- sql

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        """Spark SQL over the registered testdata views."""
        return self.spark.sql(query)
