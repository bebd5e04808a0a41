"""Bucketed-table co-located joins: the shuffle-free property, proven on
the physical plan, plus result parity with a plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from air_health_gis_tools_spark.plans.bucketing import (bucketed_join,
                                                        write_bucketed)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    left = docs.select("doc_id", "lang", "n_chars")
    right = docs.select("doc_id", F.md5("text").alias("dig"))
    write_bucketed(left, "b_left", "doc_id", 8, str(tmp_path / "l"))
    write_bucketed(right, "b_right", "doc_id", 8, str(tmp_path / "r"))
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # the fixture tables are broadcast-small; the property under test
        # is the 100 TB regime where NEITHER side broadcasts
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_left", "b_right", "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed join must not shuffle:\n" + plan)
        # parity with the plain (shuffling) join
        expected = left.join(right, "doc_id")
        assert joined.count() == expected.count() == left.count()
        a = joined.agg(F.sum(F.crc32(F.col("dig")))).head()[0]
        b = expected.agg(F.sum(F.crc32(F.col("dig")))).head()[0]
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.sql("DROP TABLE IF EXISTS b_left")
        spark.sql("DROP TABLE IF EXISTS b_right")


def test_bucketed_aggregation_has_no_exchange(spark, tmp_path):
    """A groupBy on the bucket key also rides the bucket distribution."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_bucketed(docs.select("doc_id", "lang", "n_chars"),
                   "b_agg", "doc_id", 8, str(tmp_path / "a"))
    try:
        agg = (spark.table("b_agg").groupBy("doc_id")
               .agg(F.sum("n_chars").alias("s")))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert agg.count() == docs.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_agg")
