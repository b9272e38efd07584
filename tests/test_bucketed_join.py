"""Bucketing for co-located joins (build brief: 'broadcast() for small
dims, repartition()/bucketing for co-located joins'): two fact tables
bucketed on the join key with equal bucket counts must join with ZERO
shuffle Exchange on either side, producing the same rows as the plain
join that shuffles both."""

from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark.sources import load_table
from flink_user_behavior_analysis_spark.sources.readers import (
    write_bucketed,
)


def test_bucketed_fact_join_is_exchange_free(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice")

    write_bucketed(orders, "t_orders_b", "o_orderkey", 8,
                   sort_col="o_orderkey")
    write_bucketed(lineitem, "t_lineitem_b", "l_orderkey", 8,
                   sort_col="l_orderkey")
    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the fact-to-fact (sort-merge) path: at sf0.001 the small
    # side would broadcast and hide the property under test
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ob = spark.table("t_orders_b")
        lb = spark.table("t_lineitem_b")
        joined = ob.join(lb, F.col("o_orderkey") == F.col("l_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            "bucketed fact-to-fact join must not shuffle:\n" + plan)
        assert "SortMergeJoin" in plan

        want = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")).count()
        assert joined.count() == want
        # and the same join WITHOUT bucketing does shuffle — the test
        # is meaningless if Exchange never appears at this size
        plain = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_save_as_table_survives_orphaned_location(spark):
    """A table directory left by a PREVIOUS process (whose in-memory
    catalog died with it) must not wedge saveAsTable: overwrite
    semantics make the orphan garbage, so save_as_table clears it and
    retries (this is exactly what a restarted driver hits when
    SPARK_GRAFT_WAREHOUSE points at a persistent dir)."""
    import os

    from flink_user_behavior_analysis_spark.sources.readers import (
        save_as_table,
    )

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix(
        "file:")
    orphan = os.path.join(warehouse, "t_orphan")
    spark.sql("DROP TABLE IF EXISTS t_orphan")
    os.makedirs(orphan, exist_ok=True)
    with open(os.path.join(orphan, "part-stale.parquet"), "wb") as f:
        f.write(b"stale")
    try:
        df = spark.range(5).withColumnRenamed("id", "k")
        save_as_table(df.write.mode("overwrite").format("parquet"),
                      "t_orphan")
        assert spark.table("t_orphan").count() == 5
        assert not os.path.exists(os.path.join(orphan, "part-stale.parquet"))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orphan")
