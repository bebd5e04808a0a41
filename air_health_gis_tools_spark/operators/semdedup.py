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
Cluster skew is NOT hypothetical: a coarse quantizer trained on a small
sample leaves heavy Voronoi-mass tails (measured on 4.1M uniform vectors
with k=2048 from a 4096 sample: max cluster 106k vectors, sum(|c|^2) 11x
the balanced value), and one giant cluster is one applyInPandas GROUP —
a quadratic single-task straggler that caps thread scaling no matter how
fast the kernel is. ``max_cluster`` is the LSH hot-bucket defense
(operators/dedup.py `_cap_band_buckets`) applied here: clusters past the
cap deterministically sub-split by ``pmod(id, ceil(|c|/cap))``; pairs
are tested within a sub-bucket only (documented recall trade, measurable
via `cluster_overflow_report`), bounding every task at O(cap^2) and the
total at O(n*cap). Default off — the exact SemDeDup semantics (and the
q84 golden) are unchanged unless the caller opts in.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .similarity import (_quant_expr, ivf_assign, ivf_assign_topp,
                         ivf_train_centroids)

TAU_NUM = 9          # τ = 9/20 = 0.45 — q37's corpus-calibrated threshold
TAU_DEN = 20
SAMPLE_N = 4096


def _quant16_expr(col: str) -> str:
    """SQL: array<float> -> array<smallint> with the engine-wide
    floor(e·1000 + 0.5) quantization — bit-identical to ``_quant_expr``
    but shipped at 2 bytes/component through the cluster shuffle (half
    the Arrow volume of the raw float32 vector). A component with
    |e| > 32 would overflow int16; it raises instead — the guard is
    folded into the produced VALUE so Catalyst cannot prune it (the
    rangejoin lesson).

    NOTE (ADVICE r5): int16 representability is NOT the binding limit —
    the exact-integer cosine predicate needs ‖q‖² ≤ _N2_MAX (≈1.5e8, see
    ``_n2_bound_ok``), i.e. |e| ≲ sqrt(_N2_MAX/dim)/1000 (~1.5 at dim
    64). The predicate-level guard is enforced per batch in the kernel
    and in-expression in ``_quant_cols``; this int16 guard only protects
    the shuffle encoding."""
    return (f"transform({col}, e -> CASE WHEN abs(CAST(e AS DOUBLE)) <= 32.0"
            f" THEN CAST(floor(CAST(e AS DOUBLE) * 1000 + 0.5) AS SMALLINT)"
            f" ELSE CAST(raise_error('semdedup: |component| > 32 overflows"
            f" the int16 quantized shuffle — use the expression kernel')"
            f" AS SMALLINT) END)")


# Exact-predicate operand bound (ADVICE r5): the test
#   dot²·den² ≥ num²·n2i·n2j   with |dot| ≤ √(n2i·n2j) ≤ max n2
# stays inside int64 iff (max n2)² · den² < 2⁶³ with den ≤ 20 —
# i.e. max n2 ≤ floor(√(2⁶³/400)). This also implies dot < 2⁵³, the
# float64-dgemm exactness requirement, with ~45 bits to spare.
_N2_MAX = int((2 ** 63 // 400) ** 0.5)


def _n2_bound_ok(n2_max: int) -> None:
    if n2_max > _N2_MAX:
        raise ValueError(
            f"semdedup: max ‖q‖² = {n2_max} exceeds {_N2_MAX}; the exact "
            "int64 cosine predicate would overflow (component bound is "
            "|e| <= sqrt(_N2_MAX/dim)/1000, not the int16 limit)")


def _quant_cols(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # the ‖q‖² guard is folded into the produced n2 VALUE (rangejoin
    # lesson: Catalyst prunes unevaluated guard columns) so the Catalyst
    # pair path fails fast instead of wrapping int64 in the predicate
    n2 = (f"aggregate(transform({_quant_expr(vec_col)}, e -> e * e), "
          f"0L, (acc, v) -> acc + v)")
    return df.select(
        F.col("cluster"),
        F.col(id_col),
        F.expr(_quant_expr(vec_col)).alias("qv"),
        F.expr(f"CASE WHEN {n2} <= {_N2_MAX} THEN {n2} ELSE "
               f"CAST(raise_error('semdedup: ||q||^2 overflows the exact "
               f"int64 cosine predicate') AS BIGINT) END").alias("n2"))


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


def _cap_cluster_salt(assigned: DataFrame, id_col: str,
                      max_cluster: int) -> DataFrame:
    """Add a deterministic ``_salt`` sub-bucket key: 0 for clusters within
    the cap, ``pmod(id, ceil(|c|/cap))`` past it. The size dim is ≤
    n_lists rows — always broadcastable; the salt derives from DATA only,
    so every parallelism level runs the identical plan (the scaling-leg
    invariant)."""
    sizes = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("_csz"))
    return (assigned
            .join(F.broadcast(sizes), "cluster")
            .withColumn(
                "_salt",
                F.when(F.col("_csz") <= max_cluster, F.lit(0).cast("long"))
                .otherwise(F.pmod(
                    F.col(id_col),
                    F.ceil(F.col("_csz") / F.lit(max_cluster))
                    .cast("long"))))
            .drop("_csz"))


def cluster_overflow_report(emb: DataFrame, n_lists: int = 8,
                            max_cluster: int = 65536,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            centroids: np.ndarray | None = None,
                            seed: int = 42) -> DataFrame:
    """Which clusters the ``max_cluster`` cap would sub-split, and how much
    pair work the cap removes: (cluster, n_vecs, n_subbuckets,
    pairs_uncapped, pairs_capped_max). The LSH `band_overflow_report`
    twin — run it before committing a cap on a new corpus."""
    if centroids is None:
        sample = np.stack(
            [r[0] for r in emb.select(vec_col, id_col).orderBy(id_col)
             .limit(SAMPLE_N).select(vec_col).collect()])
        centroids = ivf_train_centroids(sample, n_lists, seed=seed)
    sizes = (ivf_assign(emb, centroids, vec_col)
             .withColumnRenamed("ivf_list", "cluster")
             .groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vecs")))
    nsb = F.ceil(F.col("n_vecs") / F.lit(max_cluster)).cast("long")
    return (sizes.filter(F.col("n_vecs") > max_cluster)
            .select("cluster", "n_vecs", nsb.alias("n_subbuckets"),
                    (F.col("n_vecs") * (F.col("n_vecs") - 1) / 2)
                    .cast("long").alias("pairs_uncapped"),
                    (nsb * (F.lit(max_cluster)
                            * (F.lit(max_cluster) - 1) / 2).cast("long"))
                    .alias("pairs_capped_max")))


def semantic_neardup_edges_np(emb: DataFrame, n_lists: int = 8,
                              tau_num: int = TAU_NUM,
                              tau_den: int = TAU_DEN,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding",
                              centroids: np.ndarray | None = None,
                              seed: int = 42,
                              n_probe: int = 1,
                              max_cluster: int | None = None) -> DataFrame:
    """The throughput twin of ``semantic_neardup_edges``: one
    ``applyInPandas`` per cluster running the within-cluster pair search
    as a blocked matmul (2048-row dot blocks — cache-resident, the
    zonal-gather lesson) instead of a per-pair Catalyst expression.
    IDENTICAL result set at ``n_probe=1``: the same ×1000 quantization and
    the same exact integer predicate, just evaluated c×c at a time. This
    is the kernel the 100 TB run uses — the expression form pays per-pair
    higher-order-function evaluation; this pays one BLAS pass per cluster.
    Parallelism = n_lists (size your cluster count ≥ executor slots; a
    degenerate giant cluster serializes into one task — cap upstream).

    ``max_cluster`` (module docstring) sub-splits oversized clusters by
    ``pmod(id, ceil(|c|/cap))`` before the pair search — the skew defense
    that bounds every task at O(cap^2); pairs across sub-buckets of a
    split cluster are the documented recall trade (None = off, exact).

    ``n_probe`` is the recall knob for SemDeDup's documented boundary-pair
    approximation: each vector RESIDES in its nearest list and VISITS its
    next ``n_probe - 1`` lists; pairs are tested resident×resident and
    resident×visitor, so a pair straddling a centroid boundary is caught
    whenever either side's probe set reaches the other's home list (the
    IVF multi-probe search semantics). Every surviving edge still passes
    the EXACT cosine predicate — extra probes add recall, never false
    positives. A pair that could meet in both homes is emitted only in
    the LOWER-numbered one (canonical-emission rule, checked against the
    visitor's probe set in-kernel) — no post-hoc dedup shuffle, the
    interval-join lesson. Shuffle volume scales ×n_probe."""
    if not (0 < tau_num <= tau_den <= 20):
        raise ValueError("tau must be in (0, 1] with den <= 20 "
                         "(int64 overflow bound, module docstring)")
    if centroids is None:
        sample = np.stack(
            [r[0] for r in emb.select(vec_col, id_col).orderBy(id_col)
             .limit(SAMPLE_N).select(vec_col).collect()])
        centroids = ivf_train_centroids(sample, n_lists, seed=seed)
    # the cluster shuffle ships the QUANTIZED int16 vector, not the raw
    # float32: the same floor(e*1000+0.5) the kernel used to compute —
    # moved into Catalyst so the shuffled bytes halve (2 B/component).
    # The q84_semdedup_big scaling row is Arrow/shuffle-bound once the
    # matmul runs in dgemm, so shuffle bytes are the scaling lever here.
    if n_probe <= 1:
        assigned = (ivf_assign(emb, centroids, vec_col)
                    .withColumnRenamed("ivf_list", "cluster")
                    .select("cluster", F.col(id_col),
                            F.expr(_quant16_expr(vec_col)).alias("qv")))
    else:
        assigned = (ivf_assign_topp(emb, centroids, vec_col, n_probe)
                    .select(F.col(id_col),
                            F.expr(_quant16_expr(vec_col)).alias("qv"),
                            F.col("ivf_probes"),
                            F.col("ivf_probes")[0].alias("primary"),
                            F.explode("ivf_probes").alias("cluster")))
    num2, den2 = tau_num * tau_num, tau_den * tau_den
    # mirror-based single emission is only valid when home lists are whole
    # cogroup groups (see the in-kernel comment); capped multi-probe runs
    # emit per meeting and canonicalize downstream
    suppress_mirror = max_cluster is None

    def _pairs(pdf):
        import pandas as pd
        ids = pdf[id_col].to_numpy(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        multi = "ivf_probes" in pdf.columns
        if multi:
            prim = pdf["primary"].to_numpy(np.int64)[order]
            probes = np.stack(pdf["ivf_probes"].to_numpy()[order]) \
                .astype(np.int64)                  # (n, n_probe)
        q = np.stack(pdf["qv"].to_numpy()[order]).astype(np.int64)
        n2 = (q * q).sum(axis=1)
        # Per-batch operand guard (ADVICE r5): ‖q‖² ≤ _N2_MAX bounds BOTH
        # the exact int64 predicate (|dot| ≤ max n2 by Cauchy–Schwarz, so
        # dot²·den² < 2⁶³) AND float64-dgemm exactness (dot < 2⁵³). An
        # explicit raise, not an assert — the guarantee must survive
        # executors running under python -O.
        if len(n2):
            _n2_bound_ok(int(n2.max()))
        # The dot runs in float64 dgemm, NOT int64: NumPy integer matmul
        # never reaches BLAS (generic memory-bound loop — measured 0.517
        # thread-scaling efficiency at the 4N leg). The guard above keeps
        # every dot exactly representable in float64, so casting the
        # dgemm result back to int64 is bit-identical to integer matmul.
        qf = q.astype(np.float64)
        cl = int(pdf["cluster"].iloc[0])
        gj = np.arange(len(q))[None, :]
        if multi:
            res = prim == cl                       # resident vs visitor
        out1, out2 = [], []
        for s in range(0, len(q), 2048):
            e = min(s + 2048, len(q))
            dot = (qf[s:e] @ qf.T).astype(np.int64)  # exact — see above
            ok = ((dot > 0)
                  & (dot * dot * den2 >= num2 * n2[s:e, None] * n2[None, :]))
            tri = np.arange(s, e)[:, None] < gj
            if multi:
                # resident×resident once (strict upper triangle in id
                # order); resident row × visitor col: the mirror meeting
                # exists in the visitor's HOME list iff this resident
                # also probes it — emit only in the lower-numbered list.
                # ADVICE r5: the mirror rule is only sound when home
                # lists are whole groups — under ``max_cluster`` the
                # mirror meeting can land in a DIFFERENT sub-bucket of
                # the home list and the pair would be emitted nowhere.
                # Capped runs therefore emit on every meeting and the
                # caller dedups (min-cluster canonicalization) instead.
                rr = res[s:e, None] & res[None, :] & tri
                rv = res[s:e, None] & ~res[None, :]
                if suppress_mirror:
                    mem = np.zeros_like(rv)
                    for t in range(probes.shape[1]):
                        mem |= probes[s:e, t][:, None] == prim[None, :]
                    rv &= ~((prim[None, :] < cl) & mem)
                ok &= rr | rv
            else:
                ok &= tri
            bi, bj = np.nonzero(ok)
            i1, i2 = ids[bi + s], ids[bj]
            out1.append(np.minimum(i1, i2))
            out2.append(np.maximum(i1, i2))
        id1 = np.concatenate(out1) if out1 else np.empty(0, np.int64)
        id2 = np.concatenate(out2) if out2 else np.empty(0, np.int64)
        return pd.DataFrame({"cluster": np.full(len(id1), cl, np.int64),
                             "id1": id1, "id2": id2})

    # partition the group stage by a DATA-derived count (never the session
    # shuffle default): pair work is QUADRATIC in group size while shuffle
    # bytes are linear, so size-based AQE coalescing and a cores-sized
    # task count both leave one wave of hash-placement-unlucky tasks as
    # the stage tail. ~4+ tasks per executor slot at any cluster size
    # restores work-stealing; the count depends only on n_lists, so every
    # parallelism level runs the identical plan (the scaling-leg
    # invariant).
    n_parts = int(min(2048, max(32, n_lists)))
    if max_cluster is not None:
        if max_cluster < 1:
            raise ValueError("max_cluster must be >= 1")
        # the sizes dim and the salted main path both consume the
        # assignment kernel — persist it once (disk-spillable, the
        # triangle-count oriented-table pattern) instead of running the
        # n x k x d kernel twice per action
        from pyspark import StorageLevel
        assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
        salted = (_cap_cluster_salt(assigned, id_col, max_cluster)
                  .repartition(n_parts, "cluster", "_salt"))
        edges = salted.groupBy("cluster", "_salt").applyInPandas(
            _pairs, schema="cluster bigint, id1 bigint, id2 bigint")
        if n_probe > 1:
            # capped multi-probe emits a pair at EVERY resident×visitor
            # meeting (mirror suppression off — see _pairs); canonicalize
            # to one row per edge, attributed to the lowest meeting list.
            # The dedup shuffle moves only edges, never vectors.
            edges = (edges.groupBy("id1", "id2")
                     .agg(F.min("cluster").alias("cluster"))
                     .select("cluster", "id1", "id2"))
        return edges
    return (assigned.repartition(n_parts, "cluster")
            .groupBy("cluster").applyInPandas(
                _pairs, schema="cluster bigint, id1 bigint, id2 bigint"))


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
