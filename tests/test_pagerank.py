"""Exact fixed-point PageRank (operators/pagerank.py). The bit-exactness
of the full 10-iteration run vs the independent numpy replay is covered
by the q67 golden parity test; these cover structure + invariance on a
small graph (each Spark iteration is a real join+shuffle, so iteration
counts are kept low)."""

from __future__ import annotations

from air_health_gis_tools_spark.operators.pagerank import (
    SCALE, pagerank_fixed_point)


def _star_edges(spark):
    """0,1,2 each give ALL their rank to 3, which keeps it (self-loop) —
    3 dominates monotonically (no bipartite oscillation), so ordering
    holds at ANY iteration count."""
    return spark.createDataFrame(
        [(0, 3), (1, 3), (2, 3), (3, 3)], "src long, dst long")


def test_authority_order_and_partition_invariance(spark):
    edges = _star_edges(spark)
    base = 15 * SCALE // 100 // 4
    a = {r["node"]: r["rank_fp"] for r in
         pagerank_fixed_point(edges, 4, iterations=6).collect()}
    assert max(a, key=a.get) == 3          # the authority
    assert a[0] == a[1] == a[2] == base    # leaves hold the base only
    assert 0.9 * SCALE < sum(a.values()) <= SCALE   # mass conserved
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {r["node"]: r["rank_fp"] for r in
             pagerank_fixed_point(edges.repartition(5), 4,
                                  iterations=6).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b                          # exact at any partitioning


def test_sink_free_nodes_get_base_only(spark):
    """A node nobody links to converges to the damping base."""
    edges = spark.createDataFrame(
        [(0, 1), (1, 0), (2, 0)], "src long, dst long")
    r = {row["node"]: row["rank_fp"] for row in
         pagerank_fixed_point(edges, 3, iterations=6).collect()}
    base = 15 * SCALE // 100 // 3
    assert r[2] == base
    assert r[0] > r[2] and r[1] > r[2]
