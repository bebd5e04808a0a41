"""Structured Streaming ingest of the events table.

The reference is purely batch (SURVEY.md §2.7); streaming here covers the
incremental-arrival case a web-scale pipeline needs: events land as files,
are read with ``readStream``, windowed-aggregated with a watermark, and
folded into the same relational shapes the batch queries use. Batch parity:
``events_hourly_batch`` computes the identical result, and tests assert
stream (availableNow) == batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_events_stream(spark: SparkSession, path: str,
                       schema: str = ("event_id long, ts timestamp, "
                                      "user_id long, event_type string, "
                                      "value double, props string"),
                       ) -> DataFrame:
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(path))


def hourly_rollup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1 h window per event_type with late-data watermark."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value"))
            .select(F.col("w.start").alias("hour"), "event_type",
                    "n", "min_value", "max_value"))


def events_hourly_batch(events: DataFrame) -> DataFrame:
    return (events
            .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


def run_stream_once(spark: SparkSession, src_path: str, out_path: str,
                    checkpoint: str) -> None:
    """Drain the source with availableNow (bounded run), append to parquet.
    Restartable: the checkpoint dir carries stream progress (the streaming
    analogue of plans/lineage resume)."""
    stream = read_events_stream(spark, src_path)
    q = (hourly_rollup(stream)
         .writeStream.format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", checkpoint)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
