"""Iterative graph analytics over similarity/interaction edge sets.

Complements operators/dedup.py::dedup_components (which labels
components): PageRank scores node CENTRALITY — on a near-dup graph the
high-rank nodes are the canonical/most-copied documents, the natural
survivor choice when "keep the most central copy" beats "keep min id".

Spark-first design, same loop discipline as dedup_components:
  - edges symmetrized once, degrees precomputed (one aggregation);
  - each iteration is one join (ranks onto edge sources) + one
    groupBy(dst) aggregation — both shuffle on node id, so successive
    iterations reuse the same hash partitioning;
  - loop-carried rank table is checkpointed via cache.materialize
    (localCheckpoint by default, reliable dir for cluster runs) so the
    plan does not nest iteration-over-iteration;
  - dangling mass (nodes with no out-edges cannot exist here — the
    symmetrized similarity graph has deg ≥ 1 for every node in an
    edge) so no dangling-redistribution term is needed.

Float iteration ⇒ results are engine-order-dependent in the last ulps
⇒ registered rows-only with the driver; absolute values pinned by
pytest on closed-form graphs (star, cycle) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import materialize, tracked_persist


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair set (each pair becomes two
    directed edges). Returns (id, rank); ranks over the edge-covered
    nodes sum to ~1."""
    p0 = materialize(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
        checkpoint_dir,
    )
    edges = materialize(
        p0.union(p0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct(),
        checkpoint_dir,
    )
    # deg feeds BOTH eager materializations below (nodes, the weighted
    # edge table) — persist it so the full-edge groupBy shuffle runs
    # once per call, not twice (same discipline kcore applies to its
    # identical degree table)
    deg = tracked_persist(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    )
    nodes = materialize(deg.select(F.col("src").alias("id")), checkpoint_dir)
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    out = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w")
    )
    out = materialize(out, checkpoint_dir)
    for _ in range(iterations):
        contribs = (
            out.join(
                ranks.select(F.col("id").alias("src"), "rank"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("in_mass"))
        )
        ranks = materialize(
            nodes.join(
                contribs.select(F.col("dst").alias("id"), "in_mass"),
                "id",
                "left",
            ).select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            ),
            checkpoint_dir,
        )
    return ranks


def kcore(
    pairs: DataFrame,
    k: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly remove
    nodes of degree < k (with their edges) until the graph is stable;
    the survivors are the k-core. On a similarity/interaction graph
    the dense core is the spam-farm / template-cluster signal the
    degree histogram (q_degree_hist) only hints at — SEO link farms
    and mass-produced boilerplate form tight cores; organic content
    does not.

    Returns (id,) — the nodes of the k-core. Deterministic for any
    input (the k-core is unique: it is the maximal subgraph with
    min-degree ≥ k, independent of peel order).

    Scale shape, same loop discipline as pagerank/dedup_components:
    each round is one degree aggregation + one semi-join edge filter,
    both shuffling on node id (AQE coalesces the tail rounds as the
    frontier collapses); the loop-carried edge set is checkpointed so
    plans don't nest. Rounds needed = peel depth, typically O(10) on
    heavy-tailed graphs; every round strictly shrinks the edge set or
    terminates, and each round's cost is proportional to the CURRENT
    (shrinking) edge set, not the input."""
    p0 = materialize(
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst")),
        checkpoint_dir,
    )
    edges = materialize(
        p0.union(p0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct(),
        checkpoint_dir,
    )
    for _ in range(max_iter):
        # persisted: the degree table feeds BOTH the stop-check count
        # and the keep-filter semi-joins — unpersisted it would be
        # recomputed (one extra shuffle over the frontier) per round
        deg = tracked_persist(
            edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        )
        n_weak = deg.filter(F.col("deg") < k).count()
        if n_weak == 0:
            deg.unpersist()
            break
        keep = deg.filter(F.col("deg") >= k).select("src")
        new_edges = materialize(
            edges.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            ),
            checkpoint_dir,
        )
        deg.unpersist()
        edges = new_edges
    else:
        raise RuntimeError(
            f"kcore: not stable after {max_iter} peel rounds; raise max_iter"
        )
    return edges.select(F.col("src").alias("id")).distinct()
