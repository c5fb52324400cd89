"""Iterative graph analytics over relational edge tables — the second
iterative family next to ``dedup.connected_components`` (no reference
analogue; extension surface for behavioral/link analysis on the same
tables the pipeline already owns).

``pagerank`` runs a FIXED number of synchronous power iterations so the
result is a pure deterministic function of the edge table — which is
what makes it oracle-checkable (DuckDB replays the same iterations in a
recursive CTE) and replay-safe in production (re-running a round on a
retried partition converges to identical ranks).

Scale shape per iteration: one equi-join of the rank vector against the
edge list on src (shuffle keyed by node id — both sides can be
pre-partitioned on it so the join is Exchange-free after round 1), one
grouped sum on dst (map-side combined). State between rounds is one
(node, rank) row per node. Lineage is truncated per round with
``localCheckpoint`` exactly as connected_components does — without it
round N's plan contains N copies of the join tree and the driver, not
the cluster, becomes the bottleneck. Dangling nodes (no out-edges)
redistribute uniformly via one scalar aggregate per round, keeping the
rank mass at exactly 1.0 like the canonical formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank with dangling-mass redistribution.

    ``edges`` rows are (src, dst[, weight]); parallel edges are allowed
    (their weights add). Returns (node, rank) over every node appearing
    as src or dst, with ranks summing to 1.0 (up to float noise).

    Transition probability src->dst = weight / total out-weight of src.
    Each round: rank_next(d) = (1-a)/N + a * (sum of incoming
    rank*P(s,d) + dangling_mass/N), the standard stochastic-matrix
    formulation, run for exactly ``iterations`` rounds.
    """
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"), w.alias("w")
    )
    # collapse parallel edges, compute per-src transition probabilities.
    # Checkpoint the collapsed edge frame FIRST: out/trans/nodes all
    # derive from it, and without this the caller's upstream edge DAG
    # (a 5-table join for the trade graph) executes once per reference.
    e = e.groupBy("src", "dst").agg(F.sum("w").alias("w")).localCheckpoint(eager=True)
    out = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = e.join(out, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    dangling = nodes.join(
        out.select(F.col("src").alias("node")), "node", "left_anti"
    ).select("node")

    # size the iteration's partitioning to the GRAPH, not the session
    # default: per-round state is one (node, rank) row per node, and a
    # 25-node graph iterated over 32 shuffle partitions spends the whole
    # round on empty-task overhead.
    # ~100k nodes per partition keeps rank rows cache-resident per task;
    # a billion-node graph still gets 10k-way parallelism.
    n_part = max(1, -(-n_nodes // 100_000))
    # checkpoint EVERY loop-invariant input — nodes is referenced in
    # each round's rank update, and without its own checkpoint the whole
    # upstream edge expression (a 5-table join for the trade graph)
    # re-executes once per iteration
    nodes = nodes.repartition(n_part, "node").localCheckpoint(eager=True)
    trans = trans.repartition(n_part, "src").localCheckpoint(eager=True)
    dangling = dangling.localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for _ in range(iterations):
        # dangling mass as a broadcast one-row frame, not a .first():
        # the whole round stays ONE job (the eager localCheckpoint), no
        # extra driver action per iteration
        dang = ranks.join(dangling, "node").agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dmass")
        )
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_rank"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_rank"), F.lit(0.0))
                        + F.col("dmass") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
