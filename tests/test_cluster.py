"""Unit tests for connected components / dedup clustering
(operators/cluster.py): chains longer than one hop, singletons,
multiple components, and keeper flags.
"""

from flink_user_behavior_analysis_spark.operators import (
    connected_components,
    dedup_clusters,
)


def test_chain_and_singletons(spark):
    # chain 1-2-3-4 (diameter 3 > one round), pair {10, 11}, singleton 20
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"] for r in
           connected_components(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_dedup_clusters_sizes_and_keepers(spark):
    docs = spark.createDataFrame([(i,) for i in [5, 6, 7, 9]], "doc_id long")
    pairs = spark.createDataFrame([(6, 7), (5, 6)], "id_a long, id_b long")
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs).collect()}
    assert all(rows[i]["cluster_id"] == 5 for i in (5, 6, 7))
    assert all(rows[i]["cluster_size"] == 3 for i in (5, 6, 7))
    assert rows[9]["cluster_id"] == 9 and rows[9]["cluster_size"] == 1
    assert sorted(i for i, r in rows.items() if r["is_keeper"]) == [5, 9]


def test_connected_components_raises_on_nonconvergence(spark):
    """A chain needs ~diameter rounds; exhausting max_iter must raise
    rather than silently returning wrong labels."""
    import pytest

    from flink_user_behavior_analysis_spark.operators import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(12)], "id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=2)
    # and with enough rounds the same chain converges to one component
    out = connected_components(nodes, edges, max_iter=12)
    assert {r.component for r in out.collect()} == {0}
