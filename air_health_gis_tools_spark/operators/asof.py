"""As-of (temporal) join — latest event at or before each probe timestamp.

Spark has no ASOF JOIN physical operator (DuckDB/QuestDB/kdb do); the
100 TB-safe re-expression is the union-tag trick, pure Catalyst:

    1. tag both sides and union them on the shared (key, ts) axis;
    2. one window pass per key ordered by (ts, side) — side orders the
       event BEFORE the probe at equal timestamps, which is exactly the
       ``<=`` as-of bound;
    3. ``last(event_struct, ignorenulls=True)`` carries the most recent
       event's attributes forward onto every probe row — ONE struct, so a
       probe never mixes attributes of two different events even when some
       carried column is legitimately NULL;
    4. keep the probe rows.

Cost shape: ONE shuffle of events+probes on the key (identical to a sorted
merge join's), no range explosion, no per-key collect. Skewed keys ride the
same AQE machinery as any window since the pass partitions by key. This
beats the naive ``probe JOIN events ON key AND ts <= pts`` + argmax form,
which materializes every earlier event per probe (quadratic per key).

Equal-timestamp events tie-break by greatest carry struct (deterministic);
a probe at exactly an event's timestamp sees that event (``<=`` bound).

The paired oracle (q57) uses DuckDB's NATIVE ``ASOF LEFT JOIN`` — an
independent physical algorithm (per-key ordered search) checking the same
semantics.

Reference parity: the reference's temporal alignment is year-matching of
annual rasters (extract_raster_buffer.py year filter); event-grade as-of
alignment is the webtext/training-pipeline generalization (session
snapshots, latest-capture-per-url joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(probes: DataFrame, events: DataFrame, key: str,
              probe_ts: str, event_ts: str,
              carry: list[str]) -> DataFrame:
    """Left as-of join: for each probe row, attach ``carry`` columns of the
    latest event with ``event_ts <= probe_ts`` and the same ``key``, as
    ``ev_<name>`` columns (NULL when no event precedes the probe)."""
    ev = events.select(
        F.col(key).alias("_k"),
        F.col(event_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in carry]).alias("_ev"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(c)
          for c in probes.columns])
    pr = probes.select(
        F.col(key).alias("_k"),
        F.col(probe_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(ev.schema["_ev"].dataType).alias("_ev"),
        *probes.columns)
    w = (Window.partitionBy("_k").orderBy("_ts", "_side", "_ev")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    joined = pr.unionByName(ev).withColumn(
        "_hit", F.last("_ev", ignorenulls=True).over(w))
    return (joined.filter(F.col("_side") == 1)
            .select(*probes.columns,
                    *[F.col(f"_hit.{c}").alias(f"ev_{c}") for c in carry]))
