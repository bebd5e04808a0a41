"""Streaming incremental WARC ingest — crawl segments land continuously;
each micro-batch parses only the NEW files and commits one snapshot.

Composition of three existing pieces:
- Structured Streaming's file source (``binaryFile`` format) discovers
  newly-arrived ``.warc.gz`` files exactly once per checkpoint — the
  stream's file index is the "what have I ingested" state, no bespoke
  bookkeeping;
- the batch WARC codec (sources/warc.py) parses each file executor-side
  inside ``foreachBatch`` (records never pass through the driver — the
  binaryFile rows carry paths; content is re-read per-task via the same
  byte-range-friendly reader as batch);
- ``plans.lineage.SnapshotTable`` receives one append commit per
  micro-batch, so downstream readers get snapshot isolation and can
  time-travel to any ingest point; a crashed batch re-runs from the
  stream checkpoint without double-committing completed batch ids.

Exactly-once mechanics (ADVICE r3, refined r4): the LATEST committed
batch id is recorded as a SNAPSHOT PROPERTY inside the manifest, so
"rows visible" and "batch id covered" are ONE atomic pointer swap — a
crash at any point either committed both or neither, and the replayed
micro-batch checks the manifest (not a separate journal, which could lag
the commit) before appending. Batch ids are strictly increasing per
stream checkpoint and a replay is always the most recent batch, so one
watermark key is sufficient AND keeps manifests O(1) (a key per batch
would grow them quadratically in total). ``_stream_batches.json``
remains as an observability sidecar only. This mirrors how Iceberg's
streaming sink stores the batch id in the snapshot summary.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..plans.lineage import SnapshotTable


def read_warc_file_stream(spark: SparkSession, src_dir: str,
                          max_files: int = 4) -> DataFrame:
    """File-discovery stream over a landing directory (paths only — the
    1 GB payloads are NOT carried through the stream; tasks re-read
    bytes with the batch reader)."""
    return (spark.readStream.format("binaryFile")
            .schema("path string, modificationTime timestamp, "
                    "length long, content binary")
            .option("pathGlobFilter", "*.warc.gz")
            .option("maxFilesPerTrigger", max_files)
            .load(src_dir)
            .select("path", "length"))


LAST_BATCH_KEY = "stream-last-batch-id"


def commit_warc_batch(spark: SparkSession, table: SnapshotTable,
                      paths: list[str], batch_id: int,
                      min_tokens: int = 0) -> int | None:
    """Idempotently commit one micro-batch of WARC files. Returns the new
    snapshot version, or None if the current manifest already covers
    ``batch_id`` (crash-replay: rows and the batch id swapped in
    atomically together, so 'id covered' ⇔ 'rows visible').

    The manifest stores only the LATEST committed batch id — Structured
    Streaming batch ids are strictly increasing per checkpoint and a
    replay is always the most recent uncommitted batch, so one watermark
    gives exactly-once in O(1) manifest bytes (a key per batch would grow
    every manifest linearly and total bytes quadratically — r4 review;
    this mirrors Iceberg's snapshot-summary batch-id check). A FRESH
    checkpoint restarts ids at 0 against a non-empty table and must pair
    with a fresh table root, as with any Iceberg streaming sink."""
    from ..functions.html_text import html_to_text_udf
    from ..functions.url import canonicalize_url_udf
    from ..sources.warc import read_warc

    last = table.properties().get(LAST_BATCH_KEY)
    if last is not None and batch_id <= int(last):
        return None                  # replayed batch after crash: skip
    if not paths:
        return None                  # empty batch: replay is a no-op
    pages = (read_warc(spark, paths, responses_only=True)
             .filter(F.col("http_status") == 200)
             .withColumn("text", html_to_text_udf(F.col("html")))
             .withColumn("_c", canonicalize_url_udf(F.col("url")))
             .select(F.col("_c.url_norm").alias("url_norm"),
                     F.col("_c.host").alias("host"),
                     "warc_ts", "text", "n_bytes"))
    if min_tokens:
        pages = pages.filter(F.size(F.split("text", " ")) >= min_tokens)
    return table.commit(pages, "host", op="append",
                        properties={LAST_BATCH_KEY: int(batch_id)})


def ingest_warc_stream_once(spark: SparkSession, src_dir: str,
                            table_root: str, checkpoint: str,
                            min_tokens: int = 0) -> SnapshotTable:
    """Drain all currently-available files (``availableNow``) into the
    snapshot table: one append commit per micro-batch, rows =
    extracted pages partitioned by host."""
    table = SnapshotTable(table_root)
    done_path = os.path.join(table_root, "_stream_batches.json")

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        paths = [r["path"].removeprefix("file:")
                 for r in batch_df.select("path").collect()]
        version = commit_warc_batch(spark, table, paths, batch_id,
                                    min_tokens)
        if version is None:
            return
        # observability sidecar ONLY — the manifest is the dedup truth
        done = {}
        if os.path.exists(done_path):
            with open(done_path) as f:
                done = json.load(f)
        done[str(batch_id)] = {"version": version, "n_files": len(paths)}
        tmp = done_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(done, f, indent=1, sort_keys=True)
        os.replace(tmp, done_path)

    q = (read_warc_file_stream(spark, src_dir)
         .writeStream.foreachBatch(_commit_batch)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return table
