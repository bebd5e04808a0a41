"""Bucketed-table layout — shuffle-free co-located joins at 100 TB.

The north_star's partitioning surface includes pre-bucketed storage: when
two fact tables are written ``bucketBy(N, key)`` with the same N, a join on
the key needs NO exchange on either side — the scan itself reports the
hash distribution, so a 100 TB × 100 TB join moves zero bytes of shuffle
and the sort is per-bucket. This module is the thin, explicit seam over
Spark's bucketing (``saveAsTable`` is required — bucket metadata lives in
the catalog, not in parquet footers).

At crawl scale the natural bucket keys are the canonical-url digest (join
captures ↔ curation verdicts) and the H3 prefix (join points ↔ per-cell
aggregates); ``n_buckets`` should be sized so bucket ≈ one HDFS block
(128-256 MB) at the table's steady-state size.

tests/test_bucketing.py proves the property mechanically: the joined plan
contains no Exchange ahead of the SortMergeJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int, path: str,
                   sort_col: str | None = None) -> None:
    """Write ``df`` as an external bucketed+sorted table at ``path``."""
    (df.write.mode("overwrite").format("parquet")
     .bucketBy(n_buckets, bucket_col)
     .sortBy(sort_col or bucket_col)
     .option("path", path)
     .saveAsTable(table))


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: str | list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket counts Spark plans a SortMergeJoin with NO exchange —
    verify with ``.explain()`` / tests/test_bucketing.py."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
