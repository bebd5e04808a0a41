#!/usr/bin/env python3
"""spark-submit entry point: WARC crawl segment → curated pages table.

The webtext-axis production job (north_rule: "ships as spark-submit
--py-files modules", Common-Crawl-style input): WARC files → distributed
record scan (one task per file) → HTML→text extraction → URL
canonicalization → exact dedup (first capture per canonical url by
warc_ts, then by text digest) → quality filter → curated parquet + a
per-stage metrics manifest.

Usage (cluster):
    zip -r ahgts.zip air_health_gis_tools_spark
    spark-submit --py-files ahgts.zip jobs/warc_curation_job.py \
        --warc-glob '/crawl/segment-*/warc/*.warc.gz' \
        --output /out/curated --min-tokens 5

Usage (sandbox smoke — deterministic fixture segment):
    python jobs/warc_curation_job.py --synthetic-pages 2048 \
        --output /tmp/curated_out

Plan shape at crawl scale: the file list is the parallelism unit (60k
files/segment); extraction and canonicalization are per-partition Arrow
kernels (no shuffle); the two dedups are the only shuffles — url dedup
keys on the canonical url, text dedup on an md5 digest, both plain
groupBys that map-side combine. Quality filtering is pure Catalyst and
runs before the text-digest shuffle so filtered rows never move.
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def curate(spark, paths, min_tokens: int):
    from air_health_gis_tools_spark.functions.html_text import html_to_text_udf
    from air_health_gis_tools_spark.functions.url import canonicalize_url_udf
    from air_health_gis_tools_spark.sources.warc import read_warc

    raw = read_warc(spark, paths, responses_only=True)
    pages = (raw.filter(F.col("http_status") == 200)
             .withColumn("text", html_to_text_udf(F.col("html")))
             .withColumn("_c", canonicalize_url_udf(F.col("url")))
             .select(F.col("_c.url_norm").alias("url_norm"),
                     F.col("_c.host").alias("host"),
                     "warc_ts", "text", "n_bytes"))
    # first capture per canonical url (recrawl dedup): min (warc_ts, text)
    # struct per url — one shuffle, map-side combined
    first = (pages.groupBy("url_norm")
             .agg(F.min(F.struct("warc_ts", "host", "text", "n_bytes"))
                  .alias("f"))
             .select("url_norm", "f.warc_ts", "f.host", "f.text",
                     "f.n_bytes"))
    scored = (first.withColumn("tokens", F.size(F.split("text", " ")))
              .filter(F.col("tokens") >= min_tokens))
    # exact text dedup across urls: keep lexicographically-first url per
    # digest (deterministic, engine-independent)
    keep = (scored.groupBy(F.md5(F.col("text")).alias("dig"))
            .agg(F.min("url_norm").alias("url_norm")))
    curated = scored.join(keep.select("url_norm"), "url_norm")
    return raw, pages, scored, curated


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--warc-glob", help="glob of .warc/.warc.gz files")
    p.add_argument("--synthetic-pages", type=int, default=0,
                   help="build a deterministic fixture segment instead")
    p.add_argument("--output", required=True)
    p.add_argument("--min-tokens", type=int, default=5)
    args = p.parse_args(argv)

    from air_health_gis_tools_spark.session import get_spark
    spark = SparkSession.getActiveSession() or get_spark("warc_curation")

    if args.synthetic_pages:
        from air_health_gis_tools_spark.sources.warc import ensure_pages_warc
        paths = ensure_pages_warc(
            os.path.join(args.output, "_fixture_warc"),
            args.synthetic_pages, max(args.synthetic_pages // 256, 1))
    elif args.warc_glob:
        paths = sorted(_glob.glob(args.warc_glob))
        if not paths:
            raise SystemExit(f"no files match {args.warc_glob}")
    else:
        raise SystemExit("need --warc-glob or --synthetic-pages")

    t0 = time.time()
    raw, pages, scored, curated = curate(spark, paths, args.min_tokens)
    out = os.path.join(args.output, "curated")
    curated.write.mode("overwrite").parquet(out)
    n_out = spark.read.parquet(out).count()
    metrics = {
        "n_warc_files": len(paths),
        "n_responses": raw.count(),
        "n_pages_200": pages.count(),
        "n_after_quality": scored.count(),
        "n_curated": n_out,
        "wall_s": round(time.time() - t0, 2),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
