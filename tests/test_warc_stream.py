"""Streaming WARC ingest: incremental file discovery, snapshot-per-batch
commits, exactly-once across restarts, stream==batch row parity."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from air_health_gis_tools_spark.sources.warc import ensure_pages_warc
from air_health_gis_tools_spark.streaming.warc_ingest import (
    commit_warc_batch, ingest_warc_stream_once)


def _land(tmp_path, src, names):
    """Move fixture files into the landing dir (simulates crawl arrival)."""
    land = str(tmp_path / "landing")
    os.makedirs(land, exist_ok=True)
    for n in names:
        shutil.copy(src[n], os.path.join(land, os.path.basename(src[n])))
    return land


def test_incremental_ingest_and_parity(spark, tmp_path):
    fx = ensure_pages_warc(str(tmp_path / "fx"), 512, 4)
    land = _land(tmp_path, fx, [0, 1])
    troot = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    t = ingest_warc_stream_once(spark, land, troot, ckpt)
    v_first = t.current_version()
    n_first = t.read(spark).count()
    assert n_first == 256          # 2 files x 128 responses

    # two more files arrive; only THEY are processed (file-index state)
    _land(tmp_path, fx, [2, 3])
    t = ingest_warc_stream_once(spark, land, troot, ckpt)
    assert t.read(spark).count() == 512
    assert t.current_version() > v_first
    # time travel back to the first ingest point
    assert t.read(spark, as_of=v_first).count() == 256

    # restart with NO new files: no new snapshot, no duplicates
    v = t.current_version()
    t = ingest_warc_stream_once(spark, land, troot, ckpt)
    assert t.current_version() == v
    assert t.read(spark).count() == 512

    # stream == batch parity on the extracted text
    from air_health_gis_tools_spark.sources.pages import _gen_pages
    pdf = next(_gen_pages([pd.DataFrame(
        {"id": np.arange(512, dtype=np.int64)})]))
    got = set(r["text"] for r in
              t.read(spark).select("text").distinct().collect())
    assert got == set(pdf["text"])
    # host partitioning drove the snapshot layout
    hosts = t.read(spark).select("host").distinct().count()
    assert hosts > 100


def test_crash_replay_is_exactly_once(spark, tmp_path):
    """ADVICE r3: batch id and rows swap in atomically — replaying a
    committed micro-batch (crash AFTER the manifest commit, with or
    without the sidecar journal) must not append the rows again."""
    from air_health_gis_tools_spark.plans.lineage import SnapshotTable
    fx = ensure_pages_warc(str(tmp_path / "fx"), 256, 2)
    table = SnapshotTable(str(tmp_path / "tbl"))

    v1 = commit_warc_batch(spark, table, fx, batch_id=0)
    assert v1 == 1
    n = table.read(spark).count()
    assert n == 256
    # crash-replay of the same batch: manifest already records it → no-op
    assert commit_warc_batch(spark, table, fx, batch_id=0) is None
    assert table.current_version() == v1
    assert table.read(spark).count() == n
    # a genuinely NEW batch still appends
    v2 = commit_warc_batch(spark, table, fx[:1], batch_id=1)
    assert v2 == 2 and table.read(spark).count() == n + 128
    # replays of ANY already-covered batch id skip (monotonic watermark)
    assert commit_warc_batch(spark, table, fx, batch_id=0) is None
    assert commit_warc_batch(spark, table, fx, batch_id=1) is None
    # the watermark survives compaction (carried forward, not dropped),
    # and stays O(1): one key regardless of batch count
    table.compact(spark)
    from air_health_gis_tools_spark.streaming.warc_ingest import \
        LAST_BATCH_KEY
    assert int(table.properties()[LAST_BATCH_KEY]) == 1
    assert len(table.properties()) == 1
