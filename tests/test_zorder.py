"""Z-order layout (functions/zorder.py): bit-interleave correctness vs an
independent Python reference, the quadtree-prefix property, and the
payoff — partition pruning of a bbox query through a morton directory
layout (PartitionFilters visible in the plan, files actually skipped)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _morton_ref(cx: int, cy: int) -> int:
    """Independent reference: bit-at-a-time interleave."""
    out = 0
    for i in range(16):
        out |= ((cx >> i) & 1) << (2 * i)
        out |= ((cy >> i) & 1) << (2 * i + 1)
    return out


def test_morton_sql_matches_reference(spark):
    from air_health_gis_tools_spark.functions.zorder import morton_sql
    rng = np.random.default_rng(5)
    cx = rng.integers(0, 65536, 300)
    cy = rng.integers(0, 65536, 300)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(cx, cy)], "cx long, cy long")
    got = [r["m"] for r in
           df.select(F.expr(morton_sql("cx", "cy", "spark")).alias("m"))
           .collect()]
    assert got == [_morton_ref(int(a), int(b))
                   for a, b in zip(cx, cy)]


def test_quadtree_prefix_property(spark):
    """Cells share their first d quadtree levels iff the mortons agree on
    the top 2d bits."""
    from air_health_gis_tools_spark.functions.zorder import morton_sql
    rng = np.random.default_rng(6)
    pairs = [(int(a), int(b), int(c), int(d)) for a, b, c, d in
             rng.integers(0, 65536, (200, 4))]
    df = spark.createDataFrame(pairs, "ax long, ay long, bx long, by long")
    rows = df.select(
        "ax", "ay", "bx", "by",
        F.expr(morton_sql("ax", "ay", "spark")).alias("ma"),
        F.expr(morton_sql("bx", "by", "spark")).alias("mb")).collect()
    for r in rows:
        for d in (2, 4, 8):
            same_quad = (r["ax"] >> (16 - d) == r["bx"] >> (16 - d)
                         and r["ay"] >> (16 - d) == r["by"] >> (16 - d))
            same_prefix = (r["ma"] >> (32 - 2 * d)
                           == r["mb"] >> (32 - 2 * d))
            assert same_quad == same_prefix


def test_partition_pruning_payoff(spark, tmp_path):
    """Write a table partitioned by the morton quad prefix; a bbox query
    plans PartitionFilters and reads a strict subset of the files."""
    from air_health_gis_tools_spark.functions.zorder import morton_sql
    n = 5000
    df = (spark.range(n)
          .select((F.pmod(F.xxhash64("id"), 65536)).alias("cx"),
                  (F.pmod(F.xxhash64(F.col("id") + 1), 65536)).alias("cy"),
                  F.col("id"))
          .withColumn("m", F.expr(morton_sql("cx", "cy", "spark")))
          .withColumn("quad", F.expr("CAST(m DIV 268435456 AS INT)")))
    out = str(tmp_path / "z")
    df.write.partitionBy("quad").parquet(out)
    t = spark.read.parquet(out)
    # bbox = one top-level quadrant: cx,cy < 32768 ⇒ quad in 0..3
    q = t.filter((F.col("cx") < 32768) & (F.col("cy") < 32768)
                 & (F.col("quad") < 4))
    # Catalyst pushes the quad predicate into the scan's PartitionFilters
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(quad" in plan
    assert "quad#" in plan.split("PartitionFilters")[1][:120]
    # layout-level payoff: the bbox lives entirely in quad dirs 0..3 —
    # under half the directories (16 top-level quads) hold it, so a
    # pruned read touches a strict subset of files on disk
    import os
    dirs = [d for d in os.listdir(out) if d.startswith("quad=")]
    hit_dirs = [d for d in dirs if int(d.split("=")[1]) < 4]
    assert len(dirs) > 8 and len(hit_dirs) <= len(dirs) / 2
    pruned = spark.read.parquet(*[f"{out}/{d}" for d in hit_dirs])
    expected = t.filter((F.col("cx") < 32768)
                        & (F.col("cy") < 32768)).count()
    assert (pruned.filter((F.col("cx") < 32768)
                          & (F.col("cy") < 32768)).count()
            == q.count() == expected)