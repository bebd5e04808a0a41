"""Connected components (operators/components.py)."""

from __future__ import annotations

from air_health_gis_tools_spark.operators.components import \
    connected_components


def test_chain_ring_and_singleton_pair(spark):
    """A 12-node chain (multi-round convergence), a 4-ring, and an
    isolated pair — labels are the component minima."""
    chain = [(i, i + 1) for i in range(11)]          # 0..11
    ring = [(20, 21), (21, 22), (22, 23), (23, 20)]
    pair = [(30, 31)]
    edges = spark.createDataFrame(chain + ring + pair,
                                  "src long, dst long")
    got = {r["node"]: r["component"] for r in
           connected_components(edges).collect()}
    assert all(got[i] == 0 for i in range(12))
    assert all(got[i] == 20 for i in (20, 21, 22, 23))
    assert got[30] == got[31] == 30
    assert len(got) == 18


def test_non_convergence_raises(spark):
    """Exhausting max_iters while labels still change must RAISE, not
    return wrong components (ADVICE r3): an 8-hop chain cannot converge
    in 3 rounds of one-hop min-label propagation."""
    import pytest
    chain = spark.createDataFrame([(i, i + 1) for i in range(8)],
                                  "src long, dst long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iters=3)
    got = {r["node"]: r["component"] for r in
           connected_components(chain, max_iters=10).collect()}
    assert all(got[i] == 0 for i in range(9))
    # boundary: EXACTLY max_iters productive rounds must still return
    # (the +1 verification round proves the fixpoint, r4 review)
    got = {r["node"]: r["component"] for r in
           connected_components(chain, max_iters=8).collect()}
    assert all(got[i] == 0 for i in range(9))
    with pytest.raises(ValueError, match="max_iters"):
        connected_components(chain, max_iters=0)


def test_partition_invariance(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 40) for i in range(0, 40, 2)],
        "src long, dst long")
    a = sorted(connected_components(edges).collect())
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = sorted(connected_components(edges.repartition(7)).collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
