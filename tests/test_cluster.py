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


def test_star_cc_handles_deep_chain_min_label_rejects(spark):
    """The property large-star/small-star exists for (VERDICT r3 item
    8): a chain whose diameter exceeds min-label's max_iter budget.
    min-label must REFUSE (RuntimeError); the star variant must
    converge well inside the same round budget and label every node
    with the component minimum."""
    import pytest

    from flink_user_behavior_analysis_spark.operators import (
        connected_components_star,
    )

    n = 120
    # permuted labels so the chain is not id-ordered (worst case for
    # naive "min flows one hop per round" along increasing ids)
    perm = [(i * 53) % n for i in range(n)]
    nodes = spark.createDataFrame([(p,) for p in perm], "id long")
    edges = spark.createDataFrame(
        [(perm[i], perm[i + 1]) for i in range(n - 1)],
        "id_a long, id_b long",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=20)
    out = connected_components_star(nodes, edges, max_iter=20).collect()
    assert len(out) == n
    assert {r.component for r in out} == {0}


def test_star_cc_agrees_with_min_label_on_shallow_graph(spark):
    """On a shallow multi-component graph (the near-dup shape) both
    algorithms must produce identical labelings, including
    singletons."""
    from flink_user_behavior_analysis_spark.operators import (
        connected_components_star,
    )

    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20, 31, 32, 33]], "id long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (31, 33), (32, 33), (31, 32)],
        "id_a long, id_b long",
    )
    want = {r["id"]: r["component"]
            for r in connected_components(nodes, edges).collect()}
    got_rows = connected_components_star(nodes, edges).collect()
    got = {r["id"]: r["component"] for r in got_rows}
    assert len(got_rows) == len(got), "duplicate labels per node"
    assert got == want


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
