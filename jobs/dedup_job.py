#!/usr/bin/env python3
"""spark-submit entry point: corpus near-dup deduplication at scale.

The training-data pipeline's dedup stage as a production job, composing
the round-4 scale machinery end-to-end:

    documents → exact-dup collapse (digest groups — a million identical
    boilerplate pages become ONE representative) → MinHash-LSH candidate
    pairs over representatives, band buckets capped (hot-bucket defense)
    → connected components (min-label propagation, localCheckpoint per
    round) → keep min-id per group → deduplicated parquet + metrics
    (group-size histogram, overflow-bucket report).

Usage (cluster):
    zip -r ahgts.zip air_health_gis_tools_spark
    spark-submit --py-files ahgts.zip jobs/dedup_job.py \
        --input /data/documents.parquet --output /out/dedup \
        --max-bucket 4096

Usage (sandbox smoke — driver testdata):
    python jobs/dedup_job.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/dedup_out

Plan shape at 100 TB: the digest collapse and the MIN-signature groupBy
are the only corpus-scale shuffles (both map-side combined, 8-byte keys);
the band join moves representatives only; components iterate over the
candidate-pair EDGE LIST (small relative to the corpus), one shuffle per
round. Nothing corpus-sized crosses the wire twice.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def dedup(spark, docs, n: int, k: int, bands: int, max_bucket: int,
          max_iters: int):
    from air_health_gis_tools_spark.operators import dedup as DD
    from air_health_gis_tools_spark.operators.components import \
        connected_components

    edges = DD.collapsed_neardup_edges(docs, n=n, k=k, bands=bands,
                                       max_bucket=max_bucket)
    comp = connected_components(edges, src="id1", dst="id2",
                                max_iters=max_iters)
    labels = (docs.select(F.col("doc_id").alias("node"))
              .join(comp, "node", "left")
              .select("node",
                      F.coalesce("component", "node").alias("component")))
    keep = (labels.groupBy("component")
            .agg(F.min("node").alias("doc_id"),
                 F.count(F.lit(1)).alias("group_size")))
    deduped = docs.join(keep.select("doc_id", "group_size"), "doc_id")
    return edges, labels, keep, deduped


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--shingle", type=int, default=5)
    p.add_argument("--minhash-k", type=int, default=8)
    p.add_argument("--bands", type=int, default=2)
    p.add_argument("--max-bucket", type=int, default=4096)
    p.add_argument("--max-iters", type=int, default=40)
    args = p.parse_args(argv)

    from air_health_gis_tools_spark.operators.dedup import (
        band_overflow_report, lsh_banded, minhash_signature)
    from air_health_gis_tools_spark.session import get_spark
    spark = SparkSession.getActiveSession() or get_spark("dedup_job")

    docs = spark.read.parquet(args.input).select("doc_id", "text")
    t0 = time.time()
    edges, labels, keep, deduped = dedup(
        spark, docs, args.shingle, args.minhash_k, args.bands,
        args.max_bucket, args.max_iters)
    out = os.path.join(args.output, "deduped")
    deduped.write.mode("overwrite").parquet(out)
    n_out = spark.read.parquet(out).count()
    # group-size histogram: the curation signal reviewers actually read
    hist = {int(r["group_size"]): int(r["n"]) for r in
            keep.groupBy("group_size").agg(F.count(F.lit(1)).alias("n"))
            .collect()}
    # overflow audit: which band buckets the cap excluded (linear job)
    over = band_overflow_report(
        lsh_banded(minhash_signature(docs, args.shingle, args.minhash_k),
                   args.bands), args.max_bucket).count()
    metrics = {
        "n_docs": docs.count(),
        "n_edges": edges.count(),
        "n_groups": keep.count(),
        "n_deduped": n_out,
        "group_size_hist": dict(sorted(hist.items())),
        "n_overflow_buckets": int(over),
        "wall_s": round(time.time() - t0, 2),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
