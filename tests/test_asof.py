"""As-of join (operators/asof.py): bound, NULL and tie semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from air_health_gis_tools_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


def test_asof_semantics(spark):
    events = spark.createDataFrame(
        [(1, _ts(10), 100, 1.0),
         (1, _ts(20), 101, 2.0),
         (2, _ts(15), 200, None),     # NULL value must carry with its id
         (3, _ts(30), 300, 9.0),
         (3, _ts(30), 301, 8.0)],     # equal-ts tie -> greatest struct
        "user_id long, ts timestamp, event_id long, value double")
    probes = spark.createDataFrame(
        [(0, 1, _ts(9)),     # before first event -> NULLs
         (1, 1, _ts(10)),    # exactly at event -> sees it (<= bound)
         (2, 1, _ts(25)),    # after both -> latest
         (3, 2, _ts(50)),    # carried struct keeps (200, NULL) intact
         (4, 3, _ts(30)),    # tie at 30 -> (301, 8.0): greatest struct
         (5, 9, _ts(99))],   # key with no events -> NULLs
        "probe_id long, user_id long, probe_ts timestamp")
    got = {r["probe_id"]: (r["ev_event_id"], r["ev_value"])
           for r in asof_join(probes, events, "user_id", "probe_ts", "ts",
                              ["event_id", "value"]).collect()}
    assert got == {0: (None, None),
                   1: (100, 1.0),
                   2: (101, 2.0),
                   3: (200, None),
                   4: (301, 8.0),
                   5: (None, None)}


def test_asof_partition_invariant(spark):
    """Result is identical at different partition counts (the window is
    the only stateful stage)."""
    from air_health_gis_tools_spark.plans.queries import q57_asof_join
    a = (q57_asof_join(spark, "/root/testdata/sf0.001")
         .toPandas().sort_values("doc_id").reset_index(drop=True))
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = (q57_asof_join(spark, "/root/testdata/sf0.001")
             .toPandas().sort_values("doc_id").reset_index(drop=True))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a.equals(b)
