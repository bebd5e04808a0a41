"""Connected components — near-dup PAIRS → dedup GROUPS.

LSH/SimHash stages emit candidate pairs; corpus dedup keeps one document
per connected component of the pair graph. This is the second iterative
class beside PageRank (operators/pagerank.py), with exact integer labels:

    label(v) ← min(label(v), min over neighbors(label(u)))

iterated to fixpoint — min-label propagation. Labels are node ids
(int64), min is associative ⇒ identical at any partitioning and engine.
Each round is ONE shuffle (edges ⋈ labels → groupBy(node).min); the
minimum label advances ONE hop per round, so rounds = O(graph diameter)
— ``max_iters`` bounds the loop, the driver stops early when a round
changes nothing (an aggregate count, not a collect of data rows), and
exhausting ``max_iters`` while labels are still changing RAISES rather
than returning silently-wrong components (ADVICE r3: a 20+-hop near-dup
chain is exactly the dedup use case).

The q68 oracle is DuckDB's recursive CTE computing the reachability
closure and taking min per node — a DIRECT SQL check of an iterative
Spark algorithm, no golden file needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst",
                         max_iters: int = 20) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id reachable. Edges are treated as undirected."""
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .unionByName(edges.select(F.col(dst).alias("a"),
                                     F.col(src).alias("b")))
           .distinct().localCheckpoint())
    # localCheckpoint (not persist): persist caches DATA but the LOGICAL
    # plan still grows each round, and Catalyst re-analyzes the whole
    # thing per iteration — analysis cost compounds until a 12-round loop
    # takes an hour. Checkpointing truncates lineage so every round plans
    # against a flat scan. (On a real cluster prefer reliable
    # checkpoint() for fault tolerance at depth.)
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint())
    if max_iters < 1:
        raise ValueError("connected_components: max_iters must be >= 1")
    # max_iters productive rounds are allowed, PLUS one verification round
    # (a run whose last permitted round reaches the fixpoint still needs a
    # no-change round to prove it — without the +1 a correct result at the
    # boundary would be discarded, r4 review)
    changed = 0
    for _ in range(max_iters + 1):
        neigh = (sym.join(labels, sym["b"] == labels["node"])
                 .select(F.col("a").alias("node"), F.col("label")))
        merged = (labels.unionByName(neigh)
                  .groupBy("node").agg(F.min("label").alias("label"))
                  .localCheckpoint())
        changed = (merged.alias("m")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("m.label") != F.col("o.label"))
                   .count())
        labels = merged
        if changed == 0:
            break
    if changed:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing): the graph diameter exceeds "
            f"max_iters — raise max_iters (rounds needed = O(diameter))")
    return labels.select("node", F.col("label").alias("component"))
