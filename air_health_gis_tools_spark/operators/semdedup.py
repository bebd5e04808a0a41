"""SemDeDup-style semantic deduplication — cluster-local cosine near-dup
over an embedding column (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication").

q37 computes embedding-cosine near-dup pairs EXACTLY with an all-pairs
join — the correctness baseline, quadratic in the corpus. SemDeDup's
published recipe makes the same operation tractable at web scale by
restricting the pair search to k-means cluster neighborhoods: train k
centroids on a sample, assign every vector to its nearest centroid
(embarrassingly parallel), and compare pairs only WITHIN a cluster. Cost
drops from O(n²) to O(Σ|c|²) ≈ O(n²/k) with uniform clusters; pairs that
straddle a cluster boundary are missed by design (the paper's documented
approximation — raise k-probe or lower k to trade recall for cost).

Spark-first construction, reusing the IVF machinery
(operators/similarity.py):

    1. centroids: deterministic Lloyd's on an ``orderBy(id).limit(4096)``
       sample (pinned membership AND order — a bare LIMIT has neither);
    2. assignment: broadcast centroids, one batched-matmul Arrow kernel —
       narrow, no shuffle;
    3. pair generation: self-equi-join on the cluster id — ONE hash
       shuffle keyed on (cluster), never a cross product;
    4. the near-dup predicate is EXACT INTEGER arithmetic end-to-end:
       embeddings quantize to int64 (×1000, the engine-wide scheme), and
       cos(u,v) ≥ τ with τ = num/den tests as

           dot > 0  AND  dot²·den² ≥ num²·‖u‖²·‖v‖²

       — no float anywhere, so results are bit-identical across engines,
       partitionings and summation orders. int64 bounds (dim 64, |q| ≤
       ~1000): dot ≤ 6.4e7 ⇒ dot²·den² ≤ 1.7e18 < 2^63 for den ≤ 20, and
       num²·n1·n2 ≤ 3.4e17 for num ≤ 9 — asserted at call time.
    5. keep policy: a vector is DROPPED iff a lower-id near-duplicate
       exists in its cluster (deterministic representative = min id; the
       paper keeps one exemplar per duplicate group — min-id is the
       reproducible choice, and id-agnostic policies plug into the same
       edge set).

At 100 TB: centroid training reads a bounded sample; assignment is
map-only; the only shuffle carries (cluster, id, quantized vector) once.
Cluster skew is bounded by k-means itself at web scale (clusters are
size-balanced in the paper's regime); a degenerate corpus collapsing into
one cluster degrades toward q37's exact join — cap cluster size upstream
(the LSH hot-bucket defense pattern, operators/dedup.py) if that matters.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .similarity import _quant_expr, ivf_assign, ivf_train_centroids

TAU_NUM = 9          # τ = 9/20 = 0.45 — q37's corpus-calibrated threshold
TAU_DEN = 20
SAMPLE_N = 4096


def _quant_cols(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col("cluster"),
        F.col(id_col),
        F.expr(_quant_expr(vec_col)).alias("qv"),
        F.expr(f"aggregate(transform({_quant_expr(vec_col)}, e -> e * e), "
               f"0L, (acc, v) -> acc + v)").alias("n2"))


def semantic_neardup_edges(emb: DataFrame, n_lists: int = 8,
                           tau_num: int = TAU_NUM, tau_den: int = TAU_DEN,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           centroids: np.ndarray | None = None,
                           seed: int = 42) -> DataFrame:
    """Cluster-local near-dup edges (id1 < id2, same cluster,
    cos ≥ tau_num/tau_den exact-integer). Columns: cluster, id1, id2."""
    if not (0 < tau_num <= tau_den <= 20):
        raise ValueError("tau must be in (0, 1] with den <= 20 "
                         "(int64 overflow bound, module docstring)")
    if centroids is None:
        sample = np.stack(
            [r[0] for r in emb.select(vec_col, id_col).orderBy(id_col)
             .limit(SAMPLE_N).select(vec_col).collect()])
        centroids = ivf_train_centroids(sample, n_lists, seed=seed)
    assigned = (ivf_assign(emb, centroids, vec_col)
                .withColumnRenamed("ivf_list", "cluster"))
    q = _quant_cols(assigned, id_col, vec_col)
    a = q.select("cluster", F.col(id_col).alias("id1"),
                 F.col("qv").alias("qv1"), F.col("n2").alias("n21"))
    b = q.select("cluster", F.col(id_col).alias("id2"),
                 F.col("qv").alias("qv2"), F.col("n2").alias("n22"))
    pairs = (a.join(b, "cluster")
             .filter(F.col("id1") < F.col("id2"))
             .withColumn("dot", F.expr(
                 "aggregate(zip_with(qv1, qv2, (x, y) -> x * y), 0L, "
                 "(acc, v) -> acc + v)")))
    near = pairs.filter(
        (F.col("dot") > 0)
        & (F.col("dot") * F.col("dot") * F.lit(tau_den * tau_den)
           >= F.lit(tau_num * tau_num) * F.col("n21") * F.col("n22")))
    return near.select("cluster", "id1", "id2")


def semantic_neardup_edges_np(emb: DataFrame, n_lists: int = 8,
                              tau_num: int = TAU_NUM,
                              tau_den: int = TAU_DEN,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              centroids: np.ndarray | None = None,
                              seed: int = 42) -> DataFrame:
    """The throughput twin of ``semantic_neardup_edges``: one
    ``applyInPandas`` per cluster running the within-cluster pair search
    as a blocked int64 matmul (2048-row dot blocks — cache-resident, the
    zonal-gather lesson) instead of a per-pair Catalyst expression.
    IDENTICAL result set: the same ×1000 quantization and the same exact
    integer predicate, just evaluated c×c at a time. This is the kernel
    the 100 TB run uses — the expression form pays per-pair higher-order-
    function evaluation; this pays one BLAS-shaped pass per cluster.
    Parallelism = n_lists (size your cluster count ≥ executor slots; a
    degenerate giant cluster serializes into one task — cap upstream)."""
    if not (0 < tau_num <= tau_den <= 20):
        raise ValueError("tau must be in (0, 1] with den <= 20 "
                         "(int64 overflow bound, module docstring)")
    if centroids is None:
        sample = np.stack(
            [r[0] for r in emb.select(vec_col, id_col).orderBy(id_col)
             .limit(SAMPLE_N).select(vec_col).collect()])
        centroids = ivf_train_centroids(sample, n_lists, seed=seed)
    assigned = (ivf_assign(emb, centroids, vec_col)
                .withColumnRenamed("ivf_list", "cluster")
                .select("cluster", F.col(id_col), F.col(vec_col)))
    num2, den2 = tau_num * tau_num, tau_den * tau_den

    def _pairs(pdf):
        import pandas as pd
        ids = pdf[id_col].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        m = np.stack(pdf[vec_col].to_numpy()[order])
        q = np.floor(m.astype(np.float64) * 1000 + 0.5).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        cl = int(pdf["cluster"].iloc[0])
        out1, out2 = [], []
        for s in range(0, len(q), 2048):
            e = min(s + 2048, len(q))
            dot = q[s:e] @ q.T                       # (block, c) int64
            ok = ((dot > 0)
                  & (dot * dot * den2 >= num2 * n2[s:e, None] * n2[None, :]))
            # strict upper triangle in id order: i < j globally
            ok &= (np.arange(s, e)[:, None] < np.arange(len(q))[None, :])
            bi, bj = np.nonzero(ok)
            out1.append(ids[bi + s])
            out2.append(ids[bj])
        id1 = np.concatenate(out1) if out1 else np.empty(0, np.int64)
        id2 = np.concatenate(out2) if out2 else np.empty(0, np.int64)
        return pd.DataFrame({"cluster": np.full(len(id1), cl, np.int64),
                             "id1": id1, "id2": id2})

    return assigned.groupBy("cluster").applyInPandas(
        _pairs, schema="cluster bigint, id1 bigint, id2 bigint")


def semantic_dedup(emb: DataFrame, n_lists: int = 8,
                   tau_num: int = TAU_NUM, tau_den: int = TAU_DEN,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   centroids: np.ndarray | None = None,
                   seed: int = 42) -> DataFrame:
    """Per-vector SemDeDup verdict: (vec_id, cluster, n_nbrs, keep) —
    n_nbrs = near-dup neighbors in the cluster (either direction), keep =
    0 iff a lower-id near-duplicate exists. All-integer output (hash-safe
    across engines)."""
    if centroids is None:
        sample = np.stack(
            [r[0] for r in emb.select(vec_col, id_col).orderBy(id_col)
             .limit(SAMPLE_N).select(vec_col).collect()])
        centroids = ivf_train_centroids(sample, n_lists, seed=seed)
    assigned = (ivf_assign(emb, centroids, vec_col)
                .withColumnRenamed("ivf_list", "cluster"))
    edges = semantic_neardup_edges(
        emb, n_lists, tau_num, tau_den, id_col, vec_col,
        centroids=centroids, seed=seed)
    # per-vector rollup of the (already cluster-bounded) edge set: one
    # map-side-combined aggregate over exploded endpoints
    nbrs = (edges.select(F.col("id1").alias(id_col),
                         F.lit(0).alias("has_lower"))
            .unionAll(edges.select(F.col("id2").alias(id_col),
                                   F.lit(1).alias("has_lower")))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_nbrs"),
                 F.max("has_lower").alias("dropped")))
    return (assigned.select(id_col, "cluster")
            .join(nbrs, id_col, "left")
            .select(id_col, F.col("cluster").cast("bigint").alias("cluster"),
                    F.coalesce("n_nbrs", F.lit(0)).cast("bigint")
                    .alias("n_nbrs"),
                    (F.lit(1) - F.coalesce("dropped", F.lit(0)))
                    .cast("bigint").alias("keep")))
