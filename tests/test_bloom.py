"""Bloom filter operator (operators/bloom.py): bitmap/set equivalence, the
no-false-negative guarantee, measurable false positives, and the densify
gate."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from air_health_gis_tools_spark.operators import bloom as BL


def _py_positions(value: str, m: int, k: int) -> list[int]:
    """Independent reimplementation of the position scheme (hashlib, not
    Spark/DuckDB SQL)."""
    out = []
    for i in range(k):
        h = hashlib.md5(f"{value}#{i}".encode()).hexdigest()
        out.append(int(h[:15], 16) % m)
    return out


def _probe_df(spark, values):
    return spark.createDataFrame([(v,) for v in values], ["v"])


def test_positions_match_independent_md5(spark):
    m, k = 1 << 10, 3
    vals = [f"shingle-{i}" for i in range(50)]
    got = (_probe_df(spark, vals)
           .select("v", *[c.alias(f"p{i}") for i, c in
                          enumerate(BL.position_cols("v", m, k))])
           .collect())
    for row in got:
        assert [row[f"p{i}"] for i in range(k)] == _py_positions(
            row["v"], m, k)


def test_bitmap_equals_position_set_semantics(spark):
    """Membership via the bitmap == 'all k positions in the probe position
    set' — the equivalence the q81 oracle relies on."""
    m, k = 1 << 10, 3
    probe_vals = [f"probe-{i}" for i in range(120)]
    corpus_vals = probe_vals[:40] + [f"fresh-{i}" for i in range(200)]
    bitmap = BL.bloom_build(_probe_df(spark, probe_vals), "v", m=m, k=k)

    pos_set = {p for v in probe_vals for p in _py_positions(v, m, k)}
    expected = {v: all(p in pos_set for p in _py_positions(v, m, k))
                for v in corpus_vals}

    corpus = _probe_df(spark, corpus_vals).select(
        "v", *[c.alias(f"p{i}") for i, c in
               enumerate(BL.position_cols("v", m, k))])
    got = corpus.withColumn("hit", BL.bloom_contains(
        corpus, [f"p{i}" for i in range(k)], bitmap)).collect()
    assert {r["v"]: r["hit"] for r in got} == expected
    # no false negatives: every probe member present in corpus hits
    assert all(expected[v] for v in probe_vals[:40])
    # the m chosen here is tight enough that the set-semantics table
    # contains at least one false positive — the measured-FP surface q81
    # reports is non-degenerate
    assert any(expected[v] for v in corpus_vals if v.startswith("fresh-"))


def test_bloom_build_gate(spark):
    with pytest.raises(ValueError, match="max_bits"):
        BL.bloom_build(_probe_df(spark, ["x"]), "v",
                       m=1 << 28, max_bits=1 << 27)


def test_bitmap_word_layout(spark):
    """Bit j of word w must be position 64w+j (the contract bloom_contains
    reads with int64 arithmetic shifts, sign bit included)."""
    m, k = 1 << 8, 1
    vals = [f"w-{i}" for i in range(64)]
    bitmap = BL.bloom_build(_probe_df(spark, vals), "v", m=m, k=k)
    expected_bits = {_py_positions(v, m, k)[0] for v in vals}
    got_bits = {64 * w + j for w in range(m >> 6) for j in range(64)
                if (int(bitmap[w]) >> j) & 1}
    assert got_bits == expected_bits


def test_word_table_join_probe_matches_bitmap(spark):
    """bloom_contains_join over the distributed (word, bits) table must be
    bit-identical to the broadcast-bitmap probe — it is the documented
    max_bits fallback for 100 TB probe sets."""
    m, k = 1 << 10, 3
    probe_vals = [f"probe-{i}" for i in range(120)]
    corpus_vals = probe_vals[:40] + [f"fresh-{i}" for i in range(200)]
    probe = _probe_df(spark, probe_vals)
    bitmap = BL.bloom_build(probe, "v", m=m, k=k)
    words = BL.bloom_word_table(probe, "v", m=m, k=k)

    corpus = _probe_df(spark, corpus_vals).select(
        "v", *[c.alias(f"p{i}") for i, c in
               enumerate(BL.position_cols("v", m, k))])
    via_bitmap = {r["v"]: r["hit"] for r in corpus.withColumn(
        "hit", BL.bloom_contains(
            corpus, [f"p{i}" for i in range(k)], bitmap)).collect()}
    via_join = {r["v"]: r["bloom_hit"] for r in BL.bloom_contains_join(
        corpus, "v", [f"p{i}" for i in range(k)], words).collect()}
    assert via_join == via_bitmap
    assert all(via_join[v] for v in probe_vals[:40])  # no false negatives
