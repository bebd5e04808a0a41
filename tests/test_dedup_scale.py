"""Hot-bucket defense for the LSH/SimHash band joins (VERDICT r3): a
degenerate band value must not make candidate generation quadratic."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from air_health_gis_tools_spark.operators import dedup as DD
from air_health_gis_tools_spark.operators.components import \
    connected_components


def _docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
        "doc_id long, text string")


def test_bucket_cap_excludes_hot_bucket(spark):
    """200 identical docs + 4 distinct: uncapped emits ~200²/2 pairs from
    the hot bucket; the cap drops it while small buckets still pair."""
    texts = (["common boilerplate page body text here"] * 200
             + ["alpha unique", "alpha unique", "beta text", "gamma text"])
    sig = DD.minhash_signature(_docs_df(spark, texts), n=5, k=4)
    uncapped = DD.lsh_candidate_pairs(sig, bands=4).count()
    assert uncapped >= 200 * 199 // 2
    capped = DD.lsh_candidate_pairs(sig, bands=4, max_bucket=16)
    got = {(r["id1"], r["id2"]) for r in capped.collect()}
    assert (200, 201) in got               # the small exact-dup pair kept
    assert all(not (i1 < 200 and i2 < 200) for i1, i2 in got)
    # overflow report names the dropped bucket(s), linear-size job
    banded = DD.lsh_banded(sig, bands=4)
    over = DD.band_overflow_report(banded, max_bucket=16).collect()
    assert over and all(r["n"] >= 200 for r in over)


def test_simhash_bucket_cap(spark):
    """64 identical fingerprints (one degenerate bucket per band) + a
    nearby pair: the cap removes the quadratic bucket only."""
    rows = [(i, 0x0F0F) for i in range(64)] + [(100, 0x1F0F), (101, 0x1F0E)]
    sig = spark.createDataFrame(rows, "doc_id long, simhash long")
    uncapped = DD.simhash_banded_pairs(sig, bits=16, ham_max=3).count()
    assert uncapped >= 64 * 63 // 2
    capped = DD.simhash_banded_pairs(sig, bits=16, ham_max=3,
                                     max_bucket=8)
    got = {(r["id1"], r["id2"]) for r in capped.collect()}
    assert (100, 101) in got and len(got) < 64


def test_collapsed_edges_linear_on_degenerate_corpus(spark):
    """The 10k-identical-docs case from VERDICT r3: candidate-edge count
    stays LINEAR (here exactly n-1 exact edges, zero band pairs)."""
    n = 10_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same exact boilerplate document").alias("text"))
    edges = DD.collapsed_neardup_edges(docs, max_bucket=64)
    assert edges.count() == n - 1
    assert edges.filter(F.col("id1") == 0).count() == n - 1


def test_winnowing_guarantee(spark):
    """Winnowing's defining property (Schleimer et al. §3): two documents
    sharing any substring of length >= w + k - 1 share at least one
    fingerprint, regardless of where the substring sits."""
    from air_health_gis_tools_spark.plans.queries import (
        Q76_K, Q76_W, winnow_fps_cte_spark)
    # MINIMAL length run (exactly w + k - 1) — including at a document's
    # very tail, the case a filter-before-window implementation drops
    # (caught in r4 review: the last w-1 k-grams never entered a window)
    shared = "zqxjvkwp"
    assert len(shared) == Q76_W + Q76_K - 1
    texts = ["AAAA" + shared + "BBBBBBBBBB",
             "cccccccccccccc" + shared,          # run at the TAIL
             shared + "ddddddddddddddddddddddd",  # run at the head
             "totally unrelated content with no common run at all x"]
    _docs_df(spark, texts).createOrReplaceTempView("w_docs")
    rows = spark.sql(
        f"WITH {winnow_fps_cte_spark('w_docs')} "
        "SELECT doc_id, fp FROM fps").collect()
    fps: dict[int, set] = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    for a in (0, 1, 2):
        for b in (0, 1, 2):
            if a < b:
                assert fps[a] & fps[b], (a, b)
    assert not (fps[0] & fps[3])


def test_collapsed_components_match_uncollapsed(spark):
    """Exact-dup collapse preserves the dedup GROUPS: components from the
    collapsed edge list equal components from the raw LSH pair list."""
    x = "shared near duplicate body with many common shingles indeed"
    near = x.replace("many", "several")
    texts = [x, x, x, near, near, "totally different text about cats",
             "another unrelated document entirely", x]
    docs = _docs_df(spark, texts)
    sig = DD.minhash_signature(docs, n=5, k=4)
    raw_pairs = DD.lsh_candidate_pairs(sig, bands=4)
    collapsed = DD.collapsed_neardup_edges(docs, max_bucket=1024)

    def comp_sets(edges):
        nodes = docs.select(F.col("doc_id").alias("node"))
        labs = (nodes.join(connected_components(edges, src="id1",
                                                dst="id2"),
                           "node", "left")
                .select("node", F.coalesce("component", "node")
                        .alias("component")))
        out: dict[int, set] = {}
        for r in labs.collect():
            out.setdefault(r["component"], set()).add(r["node"])
        return sorted(tuple(sorted(s)) for s in out.values())

    assert comp_sets(raw_pairs) == comp_sets(collapsed)
