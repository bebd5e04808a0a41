"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-user aggregates over the events stream: for every user, the
cumulative event count and value sum (cents-quantized — the engine's exact-
sum rule) maintained as explicit state across micro-batches. The batch
oracle is a plain groupBy; tests assert the availableNow drain's final
state equals the batch result, and that a two-stage drain (half the files,
then the rest, same checkpoint) converges to the same state — the
stateful analogue of plans/lineage's resume guarantee.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, sum_cents long"
STATE_SCHEMA = "n long, cents long"


def _update(key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
            ) -> Iterator[pd.DataFrame]:
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100 + 0.5).astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "sum_cents": [cents]})


def running_user_totals_stream(events_stream: DataFrame) -> DataFrame:
    """Stateful running totals per user (update mode)."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                _update, OUT_SCHEMA, STATE_SCHEMA,
                "update", GroupStateTimeout.NoTimeout))


def running_user_totals_batch(events: DataFrame) -> DataFrame:
    """The relational oracle for the final state."""
    return (events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.expr("CAST(value * 100 + 0.5 AS BIGINT)"))
                 .cast("long").alias("sum_cents")))


def run_stateful_once(spark: SparkSession, src_path: str, out_path: str,
                      checkpoint: str,
                      schema: str = ("event_id long, ts timestamp, "
                                     "user_id long, event_type string, "
                                     "value double, props string")) -> None:
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 2)
              .parquet(src_path))

    def _sink(df: DataFrame, epoch_id: int) -> None:
        # update-mode stateful output → file sink via foreachBatch (the
        # standard pattern: each micro-batch's updated rows appended;
        # the latest row per key is the current state)
        df.write.mode("append").parquet(out_path)

    q = (running_user_totals_stream(stream)
         .writeStream.foreachBatch(_sink)
         .outputMode("update")
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
