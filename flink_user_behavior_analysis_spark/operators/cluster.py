"""Connected components over near-duplicate pairs — the clustering
step a training-data dedup pipeline runs after pair generation (keep
one exemplar per component, drop the rest).

Min-label propagation: every node starts labeled with its own id; each
round takes the min label over itself and its neighbors; fixpoint =
min node id reachable in the component. Rounds needed = component
diameter, and near-dup components are shallow (a cluster of mutual
near-dups has diameter 1-2), so the loop terminates in a handful of
rounds.

Scale shape (100 TB): per round, one shuffle to join labels onto the
symmetric edge list + one groupBy(node) min — both keyed on node id,
uniform. Labels and edges are persisted between rounds so each round
reads materialized state instead of replaying the whole lineage
(Pregel-style iteration; without this round N recomputes rounds
1..N-1). Convergence is checked with a 1-row aggregate (labels only
ever decrease, so an unchanged sum is a fixpoint). For graphs with
deep chains (not the near-dup case) use connected_components_star —
the alternating large-star/small-star algorithm [Kiveris et al.,
"Connected Components in MapReduce and Beyond"], which contracts
paths in O(log^2 n) rounds of the same two shuffle primitives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node; component = min reachable node id.

    ``nodes`` must contain every id referenced by ``edges``; isolated
    nodes form singleton components.
    """
    # localCheckpoint (not bare persist): iterative plans GROW — round
    # N's logical plan embeds rounds 1..N-1 plus the whole edge
    # pipeline, and Catalyst re-optimizes the full tree every round
    # (measured: 1.5 s -> 8 s/round by round 3 on unchanged tiny
    # data). Checkpointing cuts lineage to a materialized RDD so every
    # round optimizes a constant-size plan. On a cluster this is the
    # GraphFrames/GraphX pattern for the same reason.
    # LAZY checkpoints (r14, guide §1.2): eager=True ran one job per
    # materialization and the convergence aggregate ran ANOTHER job
    # over the just-materialized frame — two driver round-trips per
    # round. With eager=False the plan is already truncated to a
    # LogicalRDD and the 1-row convergence aggregate's action is what
    # materializes the checkpoint (an aggregate reads every
    # partition, so the checkpoint is complete) — one job per round,
    # same lineage-cut, bit-identical labels.
    # pre-partition the symmetric edge list by the round-join key "m"
    # BEFORE the checkpoint (r14, guide §2.4): localCheckpoint
    # preserves outputPartitioning in the LogicalRDD, so every round's
    # sym⋈labels join sees the edge side already hash-distributed on
    # "m" and exchanges only the (much smaller, shrinking) label frame.
    # Without this, each round re-shuffles the full edge list — the
    # BIG side at 100 TB — once per round. At local/bench scale the
    # label side broadcasts and the join never needed sym moved, so
    # this costs one edge-sized exchange at materialization and is
    # wall-neutral locally; at cluster scale it converts O(rounds)
    # edge shuffles into one.
    # symmetrize via ONE explode, not a 2-branch union (r15, §2.4):
    # the union form evaluated the whole EDGE subtree twice in the
    # materialization job — for LSH pairs that is the bucket self-join
    # + Jaccard verify running once per branch (A/B same-window
    # min-of-3 at sf0.1, full dedup_clusters shape: 2.11 -> 1.84 s /
    # 2.67 -> 1.73 s across two interleavings). Same rows, same
    # downstream partitioning.
    sym = (
        edges.select(F.explode(F.array(
            F.struct(F.col(src_col).alias("n"), F.col(dst_col).alias("m")),
            F.struct(F.col(dst_col).alias("n"), F.col(src_col).alias("m")),
        )).alias("e"))
        .select("e.n", "e.m")
        .repartition("m")
        .localCheckpoint(eager=False)
    )
    # propagate only over nodes that touch an edge — isolated nodes are
    # fixpoints from round 0, and in a dedup graph they are the vast
    # majority (label frame shrinks from |docs| to |docs in pairs|)
    labels = (
        sym.select("n").distinct()
        .select(F.col("n"), F.col("n").cast("long").alias("comp"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum(F.col("comp").cast("decimal(38,0)"))).first()[0]
    converged = False
    for _ in range(max_iter):
        # one join + one groupBy-min per round (r15, guide §2.4): the
        # former two-join form (neighbor-min groupBy, then a LEFT join
        # back onto labels for least(own, nbr)) paid an extra
        # labels-side exchange/broadcast-join every round. Unioning
        # the node's OWN label into the neighbor-label stream makes
        # the single min aggregate compute least(own, nbr-min)
        # directly — identical labels by definition of min, one fewer
        # join per round (A/B same-window min-of-3 at sf0.1:
        # 1.41 -> 1.15 s for the dedup_clusters fixpoint).
        labels = (
            sym.join(labels.select(F.col("n").alias("m"), "comp"), "m")
            .select("n", "comp")
            .unionByName(labels)
            .groupBy("n")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(
            F.sum(F.col("comp").cast("decimal(38,0)"))
        ).first()[0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        # min-label propagation needs ~graph-diameter rounds; returning
        # silently here would hand back WRONG cluster ids for any
        # component with diameter > max_iter (e.g. a long chain)
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "the graph has a component with diameter > max_iter — raise "
            "max_iter, or switch to connected_components_star (the "
            "large-star/small-star variant built for deep graphs)"
        )
    singletons = nodes.select(F.col(id_col).alias("n")).join(
        labels.select("n"), "n", "left_anti"
    ).select("n", F.col("n").cast("long").alias("comp"))
    return labels.unionByName(singletons).select(
        F.col("n").alias(id_col), F.col("comp").alias("component")
    )


def connected_components_star(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 60,
) -> DataFrame:
    """(id, component) via alternating large-star/small-star rounds —
    the O(log^2 n)-round variant for graphs with DEEP components,
    where plain min-label propagation (connected_components) needs
    diameter rounds and its max_iter guard would fire.

    Public algorithm: Kiveris, Lattanzi, Mirrokni, Rastogi,
    Vassilvitskii, "Connected Components in MapReduce and Beyond"
    (SoCC 2014). Per round over the current edge multiset:

      large-star(v): link every neighbor u > v to
          m(v) = min(neighbors(v) + {v})
      small-star(v): link every neighbor u < v, and v itself, to
          m(v) = min(smaller neighbors + {v})

    Both are ONE groupBy(center).min + one join keyed on the center
    id — the same two shuffle primitives per round as min-label, but
    path lengths contract geometrically instead of by 1, so a
    1000-deep chain converges in ~10 rounds instead of 1000. At the
    fixpoint the edge set is a disjoint union of stars rooted at
    component minima; labels read off the star edges directly.

    Same contracts as connected_components: ``nodes`` covers every
    id in ``edges``; isolated nodes are singleton components;
    RuntimeError (not a wrong answer) on non-convergence.
    """
    # lazy checkpoints, same one-job-per-round rationale as
    # connected_components: the round's checksum aggregate is the
    # action that materializes the round's checkpoint
    ecur = (
        edges.select(F.col(src_col).cast("long").alias("a"),
                     F.col(dst_col).cast("long").alias("b"))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _checksum(e: DataFrame):
        return e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")),
                       F.lit(0).cast("decimal(38,0)")).alias("h"),
        ).first()

    prev = None
    converged = False
    # symmetrize/emit via ONE explode each, never a 2-branch union
    # (r15, §2.4 — the connected_components sym fix): a union's two
    # branches each re-evaluate their input subtree, and here `large`
    # and `linked` are UNcheckpointed join outputs, so the union form
    # ran the large-star join and the small-star link join twice per
    # round. The explode emits both directed rows in one pass over
    # the same subtree — identical row multiset.
    def _sym2(e: DataFrame) -> DataFrame:
        return e.select(F.explode(F.array(
            F.struct(F.col("a").alias("n"), F.col("b").alias("m")),
            F.struct(F.col("b").alias("n"), F.col("a").alias("m")),
        )).alias("e")).select("e.n", "e.m")

    for _ in range(max_iter):
        # large-star: center n, neighbors m
        g = _sym2(ecur)
        mins = g.groupBy("n").agg(F.min("m").alias("mn"))
        large = (
            g.join(mins, "n")
            .where(F.col("m") > F.col("n"))
            .select(F.col("m").alias("a"),
                    F.least(F.col("mn"), F.col("n")).alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        # small-star over the large-star output
        sm = _sym2(large).where(F.col("m") < F.col("n"))
        mins2 = sm.groupBy("n").agg(F.min("m").alias("mn"))
        linked = sm.join(mins2, "n")
        small = (
            linked.select(F.explode(F.array(
                F.struct(F.col("m").alias("a"), F.col("mn").alias("b")),
                F.struct(F.col("n").alias("a"), F.col("mn").alias("b")),
            )).alias("e"))
            .select("e.a", "e.b")
            .where(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=False)  # same lineage-cut rationale
        )
        ecur = small
        cur = _checksum(ecur)
        if prev is not None and (cur.n, cur.h) == (prev.n, prev.h):
            converged = True
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "alternating rounds — not expected for any graph of "
            "< 2^max_iter nodes; check the edge list for pathological "
            "duplication"
        )
    # fixpoint edges are (member -> component min) stars
    labels = ecur.select(F.col("a").alias("n"), F.col("b").alias("comp"))
    singletons = nodes.select(F.col(id_col).cast("long").alias("n")).join(
        labels.select("n"), "n", "left_anti"
    ).select("n", F.col("n").alias("comp"))
    return labels.unionByName(singletons).select(
        F.col("n").alias(id_col), F.col("comp").alias("component")
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    cc_fn=None,
) -> DataFrame:
    """Cluster assignment per document from near-dup pairs.

    Output: (doc_id, cluster_id, cluster_size, is_keeper) — keeper is
    the min-id doc of each cluster (the row a dedup pipeline retains).

    ``cc_fn`` selects the components algorithm: min-label propagation
    by default (diameter rounds — right for shallow near-dup graphs),
    or connected_components_star for deep graphs (O(log^2 n) rounds).
    Both produce identical (id, component) labelings, so the output —
    and the DuckDB oracle — is algorithm-independent.
    """
    from pyspark.sql import Window

    cc = cc_fn or connected_components
    comp = cc(docs.select(id_col), pairs, id_col=id_col)
    # cluster size as ONE count window over component (r14, guide
    # §2.4): the groupBy+join form read comp twice and paid two
    # component exchanges; the window computes the same count in one
    # pass over one shuffle — same rewrite as duplicated_spans /
    # chunk_containment, same output bit for bit
    w = Window.partitionBy("component")
    return comp.select(
        F.col(id_col),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        (F.col(id_col) == F.col("component")).alias("is_keeper"),
    )


def keeper_by_quality(
    docs: DataFrame,
    pairs: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "quality_score",
) -> DataFrame:
    """Cluster assignment with QUALITY-based keeper selection: within
    each near-dup cluster keep the highest-``score_col`` document
    (min id on ties) — what a curation pipeline actually retains (the
    best copy), vs dedup_clusters' positional min-id keeper.

    ``quality`` is any (id, score) frame, e.g. text.text_stats output;
    ranking on an already-rounded score keeps the argmax
    engine-portable.

    Scale shape: components as in connected_components, one join to
    the (small, per-doc) quality frame, then a single shuffle on
    cluster_id where one window pass computes both the cluster size
    and the rank. Near-dup clusters are tiny (bounded by the LSH
    verify threshold), so no skew concern on the window key.
    """
    from pyspark.sql import Window

    comp = connected_components(docs.select(id_col), pairs, id_col=id_col)
    j = comp.join(quality.select(id_col, score_col), id_col)
    w = Window.partitionBy("component")
    rk = Window.partitionBy("component").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return j.select(
        F.col(id_col),
        F.col("component").alias("cluster_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        F.col(score_col),
        (F.row_number().over(rk) == 1).alias("is_keeper"),
    )
