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

The streaming engine's exactly-once file tracking + the table's atomic
pointer swap give end-to-end at-least-parse / exactly-one-visible
semantics — the same contract a real Iceberg streaming sink documents.
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


def ingest_warc_stream_once(spark: SparkSession, src_dir: str,
                            table_root: str, checkpoint: str,
                            min_tokens: int = 0) -> SnapshotTable:
    """Drain all currently-available files (``availableNow``) into the
    snapshot table: one append commit per micro-batch, rows =
    extracted pages partitioned by host."""
    from ..functions.html_text import html_to_text_udf
    from ..functions.url import canonicalize_url_udf
    from ..sources.warc import read_warc

    table = SnapshotTable(table_root)
    done_path = os.path.join(table_root, "_stream_batches.json")

    def _done() -> dict:
        if os.path.exists(done_path):
            with open(done_path) as f:
                return json.load(f)
        return {}

    def _commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        done = _done()
        if str(batch_id) in done:    # replayed batch after crash: skip
            return
        paths = [r["path"].removeprefix("file:")
                 for r in batch_df.select("path").collect()]
        if paths:
            pages = (read_warc(spark, paths, responses_only=True)
                     .filter(F.col("http_status") == 200)
                     .withColumn("text",
                                 html_to_text_udf(F.col("html")))
                     .withColumn("_c",
                                 canonicalize_url_udf(F.col("url")))
                     .select(F.col("_c.url_norm").alias("url_norm"),
                             F.col("_c.host").alias("host"),
                             "warc_ts", "text", "n_bytes"))
            if min_tokens:
                pages = pages.filter(
                    F.size(F.split("text", " ")) >= min_tokens)
            version = table.commit(pages, "host", op="append")
        else:
            version = table.current_version()
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
