"""PageRank over the canonicalized entity graph.

The reference has no graph analytics (SURVEY §1.3) — this is an engine
addition in the same family as stage 5's connected components: an
ITERATIVE DataFrame algorithm with explicit lineage hygiene. Rank over the
(subj_id -> obj_id) triple graph surfaces hub entities (what a KG curator
reads first) and is the standard graph-quality signal a corpus-scale KG
pipeline reports.

Variant: sink nodes get a SELF-LOOP instead of the dangling-mass
redistribution term — a published PageRank variant (sinks retain rank
through the damping walk) chosen here because it removes the global
dangling-mass scalar, whose float summation order is the one part of the
classic formulation that cannot be made deterministic without a
single-row collect.

Determinism: with ``deterministic=True`` (default) each node's incoming
contributions are collected, sorted by source id, and folded in that fixed
order (``aggregate`` over ``array_sort``), so the result is bit-identical
across partition counts and runs — the property the golden-digest gate
requires. The row holding a node's contributions is bounded by in-degree;
at production scale a hub entity makes that row hot, so
``deterministic=False`` switches to a plain ``sum`` aggregation
(map-side partial combine, no hot row) whose result differs only in
float last-bits — the same trade every production PageRank makes.

Iteration hygiene mirrors kgforge.canon: the tiny per-node rank frame is
``localCheckpoint``ed each round (a K-round loop would otherwise build a
K-deep join plan) and the retired round's blocks are freed eagerly via
canon's ``_release_local_checkpoint``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .canon import _release_local_checkpoint

DAMPING = 0.85


def pagerank(edges: DataFrame, iters: int = 10, damping: float = DAMPING,
             deterministic: bool = True) -> DataFrame:
    """Iterate PageRank over a directed edge list (``src``, ``dst``).

    Returns (node, rank). Edges are deduplicated; sinks get self-loops
    (see module docstring). ``iters`` fixed rounds — at corpus scale a
    fixed small K is the norm (convergence tests cost a full pass each)."""
    # Materialization boundaries matter: edges may carry an ARBITRARILY
    # expensive lineage (kg_pagerank feeds the full pipeline's triples in),
    # and the loop runs one job per round — so the deduped edge set is
    # persisted and the node set localCheckpointed (lineage CUT) before the
    # first round, or every round would recompute the upstream plan.
    e0 = (edges.select(F.col("src").cast("string").alias("src"),
                       F.col("dst").cast("string").alias("dst"))
          .distinct().persist())
    nodes = (e0.select(F.col("src").alias("node"))
             .union(e0.select(F.col("dst").alias("node"))).distinct()
             .localCheckpoint(eager=True))   # also materializes e0
    sinks = nodes.join(e0.select(F.col("src").alias("node")).distinct(),
                       "node", "left_anti")
    full = e0.union(sinks.select(F.col("node").alias("src"),
                                 F.col("node").alias("dst")))
    deg = full.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    e = full.join(deg, "src").persist()
    n_nodes = nodes.count()          # bounded: one long per task partial
    if n_nodes == 0:
        e.unpersist()
        e0.unpersist()
        # nodes' zero-row checkpoint is not released: the returned frame
        # still reads through it (released frames are dead)
        return nodes.select("node", F.lit(0.0).alias("rank"))
    ranks = (nodes.select("node", (F.lit(1.0) / n_nodes).alias("rank"))
             .localCheckpoint(eager=True))
    base = (1.0 - damping) / n_nodes
    for _ in range(iters):
        contribs = (e.join(ranks, e["src"] == ranks["node"])
                    .select("dst", "src",
                            (F.col("rank") / F.col("out_deg"))
                            .alias("contrib")))
        if deterministic:
            summed = (contribs.groupBy("dst")
                      .agg(F.aggregate(
                          F.array_sort(F.collect_list(
                              F.struct("src", "contrib"))),
                          F.lit(0.0),
                          lambda acc, s: acc + s["contrib"]).alias("s")))
        else:
            summed = contribs.groupBy("dst").agg(F.sum("contrib").alias("s"))
        nxt = (nodes.join(summed, nodes["node"] == summed["dst"], "left")
               .select("node",
                       (F.lit(base) + F.lit(damping)
                        * F.coalesce(F.col("s"), F.lit(0.0))).alias("rank"))
               .localCheckpoint(eager=True))
        _release_local_checkpoint(ranks)
        ranks = nxt
    e.unpersist()
    e0.unpersist()
    _release_local_checkpoint(nodes)     # final ranks hold their own blocks
    return ranks
