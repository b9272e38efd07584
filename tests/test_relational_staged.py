"""STAGED r8 relational queries (see the _GATE_HEAD rotation plan in
queries.py): three TPC-H shapes the registry did not yet cover —
Q17 correlated per-group aggregate, Q21 EXISTS + NOT-EXISTS double
correlation, Q22 scalar subquery + anti join. Until the r8 rotation
registers them, each runs the exact driver-style comparison against
its DuckDB oracle here; the oracles deliberately keep the textbook
correlated-subquery forms so the rows also prove the Spark-side
decorrelations equivalent.
"""

from __future__ import annotations

from flink_user_behavior_analysis_spark.queries import (
    IDLE_RICH_CUSTOMERS_SQL,
    SMALL_QTY_REVENUE_SQL,
    SOLE_LATE_SUPPLIERS_SQL,
    SUPPLIER_PART_VARIETY_SQL,
    idle_rich_customers,
    small_qty_revenue,
    sole_late_suppliers,
    supplier_part_variety,
)

from .oracle_util import compare


def test_small_qty_revenue_matches_oracle(spark, oracle_sf_dir):
    df = small_qty_revenue(spark, oracle_sf_dir)
    compare(df, SMALL_QTY_REVENUE_SQL, oracle_sf_dir)
    assert df.count() == 1


def test_sole_late_suppliers_matches_oracle(spark, oracle_sf_dir):
    """The single-pass conditional aggregation must reproduce the
    double-EXISTS formulation the oracle uses."""
    df = sole_late_suppliers(spark, oracle_sf_dir)
    compare(df, SOLE_LATE_SUPPLIERS_SQL, oracle_sf_dir)
    rows = df.collect()
    assert rows, "expected at least one sole-late supplier at sf0.01"
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))


def test_idle_rich_customers_matches_oracle(spark, oracle_sf_dir):
    df = idle_rich_customers(spark, oracle_sf_dir)
    compare(df, IDLE_RICH_CUSTOMERS_SQL, oracle_sf_dir)
    # the recency-scoped NOT EXISTS must not be vacuously empty (the
    # unscoped version was: every customer in this corpus has SOME
    # order, so r7's formulation certified nothing)
    assert df.count() > 0


def test_supplier_part_variety_matches_oracle(spark, oracle_sf_dir):
    """Q16 shape: NOT IN -> broadcast left-anti, count(DISTINCT) as
    the two-level distinct aggregate."""
    df = supplier_part_variety(spark, oracle_sf_dir)
    compare(df, SUPPLIER_PART_VARIETY_SQL, oracle_sf_dir)
    assert df.count() > 0


# (plan hygiene for the staged queries lives in test_plan_audit.py's
# test_staged_queries_free_of_python_and_cartesian — one audit, not
# two drifting copies)
