"""SnapshotTable (plans/lineage.py): snapshot isolation, time travel,
append vs overwrite, and expire_snapshots file GC."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from air_health_gis_tools_spark.plans.lineage import SnapshotTable


def _df(spark, lo, hi, tag):
    return (spark.range(lo, hi)
            .select(F.col("id"),
                    (F.col("id") % 3).cast("string").alias("b"),
                    F.lit(tag).alias("tag")))


def test_time_travel_and_ops(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    v1 = t.commit(_df(spark, 0, 30, "first"), "b")
    v2 = t.commit(_df(spark, 100, 110, "second"), "b", op="append")
    v3 = t.commit(_df(spark, 200, 206, "third"), "b", op="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)

    # current = fully overwritten
    cur = t.read(spark)
    assert cur.count() == 6
    assert set(r["tag"] for r in cur.select("tag").distinct().collect()) \
        == {"third"}
    # v2 = first + appended second
    at2 = t.read(spark, as_of=2)
    assert at2.count() == 40
    assert set(r["tag"] for r in at2.select("tag").distinct().collect()) \
        == {"first", "second"}
    # v1 = original only
    assert t.read(spark, as_of=1).count() == 30

    hist = t.history()
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert [h["rows"] for h in hist] == [30, 40, 6]


def test_commit_is_atomic_for_pinned_readers(spark, tmp_path):
    """A reader pinned to v1 sees identical rows before and after later
    commits (immutable data files + manifest isolation)."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 20, "a"), "b")
    before = sorted(r["id"] for r in t.read(spark, as_of=1).collect())
    t.commit(_df(spark, 50, 55, "b"), "b", op="overwrite")
    t.commit(_df(spark, 60, 61, "c"), "b", op="append")
    after = sorted(r["id"] for r in t.read(spark, as_of=1).collect())
    assert before == after == list(range(20))


def test_expire_snapshots_gc(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.commit(_df(spark, 0, 30, "a"), "b")
    t.commit(_df(spark, 40, 46, "b"), "b", op="overwrite")
    removed = t.expire_snapshots(keep_last=1)
    assert removed, "v1-only files should be deleted"
    # current still reads fine; the expired version is gone
    assert t.read(spark).count() == 6
    with pytest.raises(FileNotFoundError):
        t.manifest(1)
    # no dangling data dirs outside the live set
    live = {p for e in t.manifest()["buckets"].values()
            for p in e["paths"]}
    data_dir = os.path.join(str(tmp_path / "tbl"), "data")
    on_disk = {os.path.join(data_dir, v, b)
               for v in os.listdir(data_dir)
               for b in os.listdir(os.path.join(data_dir, v))
               if os.path.isdir(os.path.join(data_dir, v, b))}
    assert on_disk == live


def test_compact_rewrites_multi_prefix_buckets(spark, tmp_path):
    """Streaming-style appends fragment each bucket across version
    prefixes; compact() rewrites them into one prefix per bucket with
    identical rows, as a NEW snapshot the old versions survive."""
    from pyspark.sql import functions as F
    t = SnapshotTable(str(tmp_path / "tbl"))
    for lo in (0, 30, 60):
        t.commit(_df(spark, lo, lo + 30, f"b{lo}"), "b", op="append")
    pre = t.read(spark)
    pre_rows = sorted(r["id"] for r in pre.collect())
    man = t.manifest()
    assert any(len(e["paths"]) > 1 for e in man["buckets"].values())

    v = t.compact(spark)
    assert v == 4 and t.manifest()["op"] == "compact"
    man2 = t.manifest()
    assert all(len(e["paths"]) == 1 for e in man2["buckets"].values())
    post_rows = sorted(r["id"] for r in t.read(spark).collect())
    assert post_rows == pre_rows
    # pre-compaction snapshot still time-travels
    assert t.read(spark, as_of=3).count() == 90
    # idempotent: a second compact is a no-op (no new snapshot)
    assert t.compact(spark) == v
    # GC then leaves only the compacted files; current still reads
    t.expire_snapshots(keep_last=1)
    assert sorted(r["id"] for r in t.read(spark).collect()) == pre_rows
    assert (t.read(spark).groupBy("b").count().count() == 3)
