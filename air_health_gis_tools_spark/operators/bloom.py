"""Distributed Bloom filter — the O(1)-memory membership probe for
decontamination at 100 TB.

The exact decontamination join (q46) broadcasts the probe set's shingles
verbatim; that stops working once the benchmark suite grows past broadcast
size, and a semi-join keyed on 13-gram strings shuffles the full corpus
shingle stream. The standard scale answer (CCNet, Dolma, RefinedWeb all do
a variant) is a Bloom filter: k hash positions per shingle, a fixed m-bit
bitmap, membership = all k bits set. Memory is m/8 bytes REGARDLESS of
probe-set cardinality; false positives are tunable ((1-e^{-kn/m})^k), false
negatives impossible — the safe direction for decontamination (over-flag,
never miss).

Spark-first construction, no driver-side hashing:

    1. position columns are pure Catalyst (``pmod(conv(md5(...)))`` — the
       same engine-identical md5→int64 scheme the MinHash/stratified-sample
       surfaces use, so a DuckDB oracle can recompute them bit-for-bit);
    2. the bitmap is built DISTRIBUTED: explode the k positions, map each
       to (word = pos >> 6, mask = 1 << (pos & 63)), aggregate
       ``bit_or(mask)`` by word — one map-side-combined shuffle of 16-byte
       rows, at most m/64 rows out, collected and densified to numpy;
    3. the probe is an Arrow-batched pandas_udf over the broadcast bitmap
       testing the k precomputed position columns — no string leaves the
       corpus executor, no join, no shuffle.

At 1000 executors the build's bit_or shuffle is bounded by min(k·n, m/64)
rows and the probe is embarrassingly parallel. ``max_bits`` gates the
driver densify the same way tile_table_to_array gates ``max_px``; past it,
``bloom_word_table`` + ``bloom_contains_join`` keep the bitmap as the
(word, bits) table and turn step 3 into an equi-join on the word — same
semantics bit-for-bit, never driver-resident.

Semantics note for oracles: membership through the bitmap is EXACTLY
"every position ∈ the set of probe positions" — a bit is set iff some
probe element hashed to it — so a SQL oracle that materializes the
distinct probe positions and semi-joins k times reproduces the bitmap
path bit-for-bit, false positives included.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_M = 1 << 14      # 16384 bits = 2 KiB — sized for test corpora
DEFAULT_K = 3
MAX_BITS = 1 << 27       # 128 Mbit = 16 MiB bitmap, 2 M collected words


def position_expr(col: str, i: int, m: int, dialect: str = "spark") -> str:
    """SQL for hash position ``i`` of ``col`` — identical int64 in Spark
    and DuckDB (md5 hex prefix 15 nibbles < 2^60, salted by ``#i``)."""
    if dialect == "spark":
        return (f"pmod(CAST(conv(substring(md5(concat({col}, '#{i}')), "
                f"1, 15), 16, 10) AS BIGINT), {m})")
    return (f"CAST('0x' || substring(md5({col} || '#{i}'), 1, 15) "
            f"AS BIGINT) % {m}")


def position_cols(col: str, m: int = DEFAULT_M, k: int = DEFAULT_K
                  ) -> list[Column]:
    return [F.expr(position_expr(col, i, m)) for i in range(k)]


def bloom_word_table(probe: DataFrame, col: str, m: int = DEFAULT_M,
                     k: int = DEFAULT_K) -> DataFrame:
    """The distributed (word:int64, bits:int64) form of the m-bit filter
    over ``probe[col]`` — bit j of word w = position 64w+j. At most m/64
    rows, produced by one map-side-combined bit_or shuffle. This is the
    scale-path representation: it never touches the driver, so m is
    unbounded; ``bloom_build`` densifies it (gated) and
    ``bloom_contains_join`` probes it without densifying."""
    pos = probe.select(F.explode(F.array(
        *position_cols(col, m, k))).alias("pos"))
    return (pos
            .select(F.shiftright("pos", 6).alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(pos & 63 AS INT))").alias("mask"))
            .groupBy("word")
            .agg(F.bit_or("mask").alias("bits")))


def bloom_build(probe: DataFrame, col: str, m: int = DEFAULT_M,
                k: int = DEFAULT_K, max_bits: int = MAX_BITS) -> np.ndarray:
    """Build the m-bit filter over ``probe[col]`` distributed; return it as
    an int64[m/64] word array (bit j of word w = position 64w+j)."""
    if m > max_bits:
        raise ValueError(
            f"bloom_build: m={m} exceeds max_bits={max_bits}; a bitmap "
            "this large should stay distributed — use bloom_word_table + "
            "bloom_contains_join (equi-join on the word, same semantics)")
    words = bloom_word_table(probe, col, m, k).collect()
    bitmap = np.zeros(m >> 6, dtype=np.int64)
    for row in words:
        bitmap[row["word"]] = row["bits"]
    return bitmap


def bloom_contains(df: DataFrame, pos_cols: list[str],
                   bitmap: np.ndarray) -> Column:
    """Boolean membership column testing the precomputed position columns
    of ``df`` against a broadcast bitmap (Arrow-batched, no shuffle)."""
    bc = df.sparkSession.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def _probe(*pos: pd.Series) -> pd.Series:
        bm = bc.value
        ok = np.ones(len(pos[0]), dtype=bool)
        for p in pos:
            v = p.to_numpy(np.int64)
            # int64 arithmetic shift keeps the tested low bit correct
            ok &= ((bm[v >> 6] >> (v & 63)) & 1).astype(bool)
        return pd.Series(ok)

    return _probe(*[F.col(c) for c in pos_cols])


def bloom_contains_join(df: DataFrame, id_col: str, pos_cols: list[str],
                        words: DataFrame) -> DataFrame:
    """Large-m membership probe: test the k precomputed position columns
    of ``df`` against the distributed (word, bits) table from
    ``bloom_word_table`` WITHOUT densifying it on the driver. Returns
    (id_col, bloom_hit:boolean), one row per distinct ``id_col``.

    Plan: explode the k positions → (id, word, bit), ONE left equi-join
    on the word (bits absent ⇒ bit unset), bool_and by id. Two keyed
    shuffles total regardless of k; at 1000 executors the word table is
    m/64-row bounded and AQE picks shuffle-hash (or broadcast, if the
    bitmap happens to be small) — this is exactly the fallback the
    ``bloom_build`` max_bits gate points at, with bit-identical semantics
    to the bitmap path (a bit is set iff some probe element hashed to
    it)."""
    probes = (df.select(id_col, F.explode(F.array(
        *[F.col(c) for c in pos_cols])).alias("pos"))
              .select(id_col,
                      F.shiftright("pos", 6).alias("word"),
                      F.expr("CAST(pos & 63 AS INT)").alias("bit")))
    return (probes
            .join(words, "word", "left")
            .select(F.col(id_col),
                    F.coalesce(
                        F.expr("(shiftright(bits, bit) & 1) = 1"),
                        F.lit(False)).alias("hit"))
            .groupBy(id_col)
            .agg(F.bool_and("hit").alias("bloom_hit")))
