"""Reference-fixture parity: the engine's operators, run with the
reference's own parameters over the reference's own resource CSVs,
must match a DuckDB oracle expressing the same reference semantics.

This is the strongest parity evidence available (SURVEY section 5: the
reference ships fixtures but no tests) — same inputs the reference's
main() methods consume, deterministic oracle instead of its eyeballed
print output."""

import os

import duckdb
import pandas as pd
import pytest

from flink_user_behavior_analysis_spark.queries_reference import (
    FIXTURES,
    REFERENCE_QUERIES,
)

from .oracle_util import _normalize

pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in FIXTURES.values()),
    reason="reference fixtures not available",
)

US = 1_000_000


def _duck() -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(f"""
        CREATE VIEW login AS SELECT * FROM read_csv('{FIXTURES["login"]}',
            columns={{'user_id':'BIGINT','ip':'VARCHAR','login_state':'VARCHAR','ts_sec':'BIGINT'}},
            header=false)
    """)
    con.execute(f"""
        CREATE VIEW orders_log AS SELECT * FROM read_csv('{FIXTURES["order"]}',
            columns={{'order_id':'BIGINT','event_type':'VARCHAR','tx_id':'VARCHAR','ts_sec':'BIGINT'}},
            header=false, nullstr='')
    """)
    con.execute(f"""
        CREATE VIEW receipts AS SELECT * FROM read_csv('{FIXTURES["receipt"]}',
            columns={{'tx_id':'VARCHAR','pay_channel':'VARCHAR','ts_sec':'BIGINT'}},
            header=false)
    """)
    con.execute(f"""
        CREATE VIEW adclick AS SELECT * FROM read_csv('{FIXTURES["adclick"]}',
            columns={{'user_id':'BIGINT','ad_id':'BIGINT','province':'VARCHAR','city':'VARCHAR','ts_sec':'BIGINT'}},
            header=false)
    """)
    con.execute(f"""
        CREATE VIEW apache AS
        SELECT str_split(column0, ' ') AS f FROM read_csv('{FIXTURES["apache"]}',
            columns={{'column0':'VARCHAR'}}, header=false, delim=chr(1))
    """)
    return con


def _cmp(spark_df, con, sql, cols=None):
    sp = spark_df.toPandas()
    dk = con.execute(sql).df()
    assert len(sp) == len(dk), f"rows: spark={len(sp)} duck={len(dk)}"
    assert sorted(sp.columns) == sorted(dk.columns)
    nsp, ndk = _normalize(sp), _normalize(dk)
    pd.testing.assert_frame_equal(nsp, ndk, check_dtype=False)


def test_ref_login_fail(spark):
    got = REFERENCE_QUERIES["ref_login_fail"](spark)
    sql = f"""
    WITH seq AS (
        SELECT user_id,
               lag(ts_sec * {US}, 1) OVER w AS first_fail_us,
               ts_sec * {US} AS last_fail_us,
               sum(CASE WHEN login_state = 'fail' THEN 1 ELSE 0 END)
                   OVER wr AS run
        FROM login
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, ip),
               wr AS (PARTITION BY user_id ORDER BY ts_sec, ip
                      ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, first_fail_us, last_fail_us
    FROM seq WHERE run = 2 AND last_fail_us - first_fail_us <= {2 * US}
    """
    with _duck() as con:
        _cmp(got, con, sql)
    assert got.count() > 0  # the fixture contains planted fail bursts


def test_ref_login_fail_cep(spark):
    got = REFERENCE_QUERIES["ref_login_fail_cep"](spark)
    sql = f"""
    WITH seq AS (
        SELECT user_id,
               lag(ts_sec * {US}, 2) OVER w AS first_fail_us,
               ts_sec * {US} AS last_fail_us,
               sum(CASE WHEN login_state = 'fail' THEN 1 ELSE 0 END)
                   OVER wr AS run
        FROM login
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, ip),
               wr AS (PARTITION BY user_id ORDER BY ts_sec, ip
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, first_fail_us, last_fail_us
    FROM seq WHERE run = 3 AND last_fail_us - first_fail_us <= {5 * US}
    """
    with _duck() as con:
        _cmp(got, con, sql)


def test_ref_order_timeout(spark):
    got = REFERENCE_QUERIES["ref_order_timeout"](spark)
    sql = f"""
    WITH ev AS (
        SELECT order_id, event_type, ts_sec * {US} AS ts_us FROM orders_log
    ), w1 AS (
        SELECT *, min(CASE WHEN event_type = 'create' THEN ts_us END)
                  OVER (PARTITION BY order_id) AS create_us
        FROM ev
    ), w2 AS (
        SELECT *, min(CASE WHEN event_type = 'pay' AND ts_us >= create_us
                           THEN ts_us END)
                  OVER (PARTITION BY order_id) AS pay_us
        FROM w1
    ), per_key AS (
        SELECT order_id, min(create_us) AS create_us, min(pay_us) AS pay_us
        FROM w2 GROUP BY 1
    )
    SELECT order_id, create_us, pay_us,
           CASE WHEN create_us IS NULL THEN 'payed_not_created'
                WHEN pay_us IS NULL THEN 'timeout_no_pay'
                WHEN pay_us < create_us + {15 * 60 * US} THEN 'payed'
                ELSE 'timeout_payed_late' END AS result_state
    FROM per_key
    """
    with _duck() as con:
        _cmp(got, con, sql)
        # the doc narrates both outcomes; assert both appear
        states = {r.result_state for r in got.collect()}
    assert "payed" in states and "timeout_no_pay" in states


def test_ref_tx_interval_join(spark):
    got = REFERENCE_QUERIES["ref_tx_interval_join"](spark)
    sql = f"""
    SELECT p.tx_id AS tx_id, p.order_id AS order_id,
           p.ts_sec * {US} AS pay_us, r.pay_channel AS pay_channel,
           r.ts_sec * {US} AS receipt_us
    FROM (SELECT * FROM orders_log
          WHERE event_type = 'pay' AND tx_id IS NOT NULL AND tx_id <> '') p
    JOIN receipts r ON p.tx_id = r.tx_id
     AND r.ts_sec * {US} >= p.ts_sec * {US} - {3 * US}
     AND r.ts_sec * {US} <= p.ts_sec * {US} + {5 * US}
    """
    with _duck() as con:
        _cmp(got, con, sql)
    assert got.count() > 0


def test_ref_tx_match(spark):
    got = REFERENCE_QUERIES["ref_tx_match"](spark)
    sql = f"""
    WITH p AS (SELECT tx_id, ts_sec * {US} AS pay_us FROM orders_log
               WHERE event_type = 'pay' AND tx_id IS NOT NULL AND tx_id <> ''),
         r AS (SELECT tx_id, ts_sec * {US} AS receipt_us FROM receipts)
    SELECT 'matched' AS kind, p.tx_id AS tx_id, p.pay_us, r.receipt_us
    FROM p JOIN r ON p.tx_id = r.tx_id
     AND r.receipt_us >= p.pay_us - {3 * US} AND r.receipt_us <= p.pay_us + {5 * US}
    UNION ALL
    SELECT 'unmatched_pay', p.tx_id, p.pay_us, NULL::BIGINT FROM p
    WHERE NOT EXISTS (SELECT 1 FROM r WHERE p.tx_id = r.tx_id
     AND r.receipt_us >= p.pay_us - {3 * US} AND r.receipt_us <= p.pay_us + {5 * US})
    UNION ALL
    SELECT 'unmatched_receipt', r.tx_id, NULL::BIGINT, r.receipt_us FROM r
    WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.tx_id = r.tx_id
     AND r.receipt_us >= p.pay_us - {3 * US} AND r.receipt_us <= p.pay_us + {5 * US})
    """
    with _duck() as con:
        _cmp(got, con, sql)
    kinds = {r.kind for r in got.collect()}
    assert kinds == {"matched", "unmatched_pay", "unmatched_receipt"}


def test_ref_ad_stats_by_province(spark):
    got = REFERENCE_QUERIES["ref_ad_stats_by_province"](spark)
    slide, size = 5 * US, 3600 * US
    sql = f"""
    WITH exploded AS (
        SELECT province,
               unnest(generate_series(
                   (ts_sec * {US} // {slide}) * {slide} + {slide},
                   (ts_sec * {US} // {slide}) * {slide} + {size}, {slide}))
                   AS window_end_us
        FROM adclick
    )
    SELECT window_end_us, province, COUNT(*)::BIGINT AS cnt
    FROM exploded GROUP BY 1, 2
    """
    with _duck() as con:
        _cmp(got, con, sql)


def test_ref_hot_pages(spark):
    got = REFERENCE_QUERIES["ref_hot_pages"](spark)
    slide, size = 5 * US, 600 * US
    sql = f"""
    WITH ev AS (
        SELECT f[6] AS method, f[7] AS url,
               epoch_us(strptime(f[4], '%d/%m/%Y:%H:%M:%S')) AS ts_us
        FROM apache
        WHERE f[6] = 'GET' AND NOT regexp_matches(f[7], '\\.(css|js|png|ico)$')
    ), exploded AS (
        SELECT url,
               unnest(generate_series(
                   (ts_us // {slide}) * {slide} + {slide},
                   (ts_us // {slide}) * {slide} + {size}, {slide}))
                   AS window_end_us
        FROM ev
    ), counts AS (
        SELECT window_end_us, url, COUNT(*)::BIGINT AS cnt
        FROM exploded GROUP BY 1, 2
    ), ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY window_end_us ORDER BY cnt DESC, url) AS rnk
        FROM counts
    )
    SELECT window_end_us, url, cnt, rnk::BIGINT AS rnk
    FROM ranked WHERE rnk <= 5
    """
    with _duck() as con:
        _cmp(got, con, sql)
    assert got.count() > 0
