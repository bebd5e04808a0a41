"""Streaming exact deduplication — the incremental form of
operators/dedup.exact_dedup_groups.

A web-scale ingest dedups documents AS THEY ARRIVE: the content digest is
the state key, the first arrival wins, later duplicates are dropped. On a
stream, Spark's ``dropDuplicates`` carries exactly this state; with an
event-time column, ``dropDuplicatesWithinWatermark`` bounds the state to
the watermark horizon (the standard production configuration — identity
content rarely re-arrives outside an ingest window).

Batch parity: the surviving digest SET equals the batch distinct-digest
set for any arrival order (tests assert it); the chosen survivor row can
differ between runs — by design, first-arrival semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_SCHEMA = ("doc_id long, source string, lang string, n_chars long, "
               "text string")


def read_docs_stream(spark: SparkSession, path: str,
                     schema: str = DOCS_SCHEMA) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(path))


def dedup_stream(docs: DataFrame, watermark_col: str | None = None,
                 horizon: str = "24 hours") -> DataFrame:
    """First-arrival exact dedup keyed by content digest.

    ``watermark_col`` (an event-time column, when the schema has one)
    switches to ``dropDuplicatesWithinWatermark`` so the digest state is
    evicted past the horizon — bounded state at 100 TB/day ingest.
    """
    keyed = docs.withColumn("digest", F.md5(F.col("text")))
    if watermark_col is not None:
        return (keyed.withWatermark(watermark_col, horizon)
                .dropDuplicatesWithinWatermark(["digest"]))
    return keyed.dropDuplicates(["digest"])


def run_dedup_stream_once(spark: SparkSession, src_path: str,
                          out_path: str, checkpoint: str) -> None:
    """Drain with availableNow, append survivors to parquet (restartable
    via the checkpoint — re-running with no new input appends nothing)."""
    q = (dedup_stream(read_docs_stream(spark, src_path))
         .writeStream.format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
