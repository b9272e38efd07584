"""Engine facade + CLI entry point."""

import pytest

from flink_user_behavior_analysis_spark.__main__ import main as cli_main
from flink_user_behavior_analysis_spark.engine import Engine


def test_engine_query_and_sql(spark, sf_dir):
    eng = Engine(sf_dir, spark=spark)
    assert "hot_items" in eng.list_queries()
    assert eng.query("hot_items").count() > 0
    assert eng.sql("SELECT count(*) AS n FROM events").collect()[0].n > 0
    assert eng.oracle_sql("hot_items") is not None
    assert eng.oracle_sql("unique_visitors_approx") is not None
    with pytest.raises(KeyError, match="unknown query"):
        eng.query("nope")


def test_engine_reference_query(spark, sf_dir):
    eng = Engine(sf_dir, spark=spark, register_sql_views=False)
    assert eng.reference_query("ref_login_fail").count() > 0


def test_cli_list_and_run(spark, sf_dir, capsys):
    assert cli_main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "hot_items" in out and "ref_hot_pages" in out
    assert cli_main(["page_views", "--sf-dir", sf_dir, "--limit", "3"]) == 0
    assert "window_end_us" in capsys.readouterr().out
    assert cli_main(
        ["--sql", "SELECT count(*) AS n FROM events", "--sf-dir", sf_dir, "--json"]
    ) == 0
    assert '"n"' in capsys.readouterr().out
