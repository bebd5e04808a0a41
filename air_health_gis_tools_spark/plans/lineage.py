"""Per-partition lineage + metrics checkpointing and mid-run resume.

north_rule: "per-partition lineage + row-count/latency metrics checkpointed
to Iceberg so any stage resumes mid-run." This sandbox has no Iceberg
runtime jar, so the checkpoint store is a partitioned parquet table with an
atomically-committed manifest — the same mechanics (snapshot manifest +
immutable data files) Iceberg provides; swap ``CheckpointStore`` for
``writeTo(catalog.table)`` on a real cluster (documented seam, one method).

Design:
- work is partitioned by an explicit ``part_key`` column (e.g. H3-prefix
  salt bucket, geo_synth-style);
- ``run_stage`` executes only the buckets missing from the manifest,
  appending one parquet file per bucket + a metrics row
  (rows, wall seconds, attempt) — so a killed run re-executes only
  unfinished buckets;
- results are read back as one DataFrame; metrics are a queryable table.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.manifest = os.path.join(root, "_manifest.json")

    def done_buckets(self) -> dict[str, dict]:
        if not os.path.exists(self.manifest):
            return {}
        with open(self.manifest) as f:
            return json.load(f)

    def commit_bucket(self, bucket: str, metrics: dict) -> None:
        done = self.done_buckets()
        done[bucket] = metrics
        tmp = self.manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f, indent=1, sort_keys=True)
        os.replace(tmp, self.manifest)  # atomic snapshot commit

    def bucket_path(self, bucket: str) -> str:
        return os.path.join(self.root, f"bucket={bucket}")


def run_stage(df: DataFrame, part_col: str, store: CheckpointStore,
              buckets: list | None = None) -> DataFrame:
    """Execute ``df`` bucket-by-bucket with resume.

    Each bucket is an independent Spark job writing an immutable parquet
    dir, committed to the manifest with row count + latency. Already-done
    buckets are skipped (resume). Returns the full result DataFrame.
    """
    spark = df.sparkSession
    if buckets is None:
        buckets = [r[0] for r in
                   df.select(part_col).distinct().orderBy(part_col).collect()]
    done = store.done_buckets()
    for b in buckets:
        key = str(b)
        if key in done:
            continue
        t0 = time.perf_counter()
        part = df.filter(F.col(part_col) == F.lit(b))
        path = store.bucket_path(key)
        part.write.mode("overwrite").parquet(path)
        n = spark.read.parquet(path).count()
        store.commit_bucket(key, {
            "rows": n,
            "seconds": round(time.perf_counter() - t0, 3),
            "attempt_epoch": len(done),
        })
    return spark.read.parquet(*[store.bucket_path(str(b)) for b in buckets])


def metrics_df(spark: SparkSession, store: CheckpointStore) -> DataFrame:
    rows = [(k, v["rows"], v["seconds"])
            for k, v in store.done_buckets().items()]
    return spark.createDataFrame(rows, "bucket string, rows long, seconds double")


def salted_bucket(col_expr: str, n_buckets: int):
    """Salt key for skew-defeating repartition (SURVEY.md §7.4.4):
    bucket = pmod(xxhash64(key), n)."""
    return F.pmod(F.xxhash64(F.expr(col_expr)), F.lit(n_buckets))
