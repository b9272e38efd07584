"""Driver-gate replica: every registered query with an oracle must
hash-match the DuckDB formulation on sf0.001 (fast inner loop; the
driver runs the same comparison at sf0.01)."""

import pytest

from flink_user_behavior_analysis_spark import queries as Q

from .oracle_util import compare

ORACLED = sorted(Q.ORACLES)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    compare(df, Q.ORACLES[name], sf_dir)


def test_every_query_runs(spark, sf_dir):
    for name, fn in Q.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_nonempty_results(spark, sf_dir):
    """Queries should produce rows on the smoke data (guards against
    vacuous filters making the oracle comparison trivially pass)."""
    must_be_nonempty = [
        "hot_items", "hot_pages", "page_views", "unique_visitors",
        "marketing_by_channel", "marketing_total", "ad_stats_by_province",
        "login_fail", "order_timeout", "tx_match",
        "sessionize_users", "pricing_summary", "revenue_by_nation",
        "top_customers_per_segment",
        "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "ann_topk", "ann_topk_lsh", "text_stats", "language_id",
        "doc_fingerprints", "multimodal_meta", "multimodal_decode",
        "frame_sample",
    ]
    for name in must_be_nonempty:
        assert Q.QUERIES[name](spark, sf_dir).count() > 0, name
