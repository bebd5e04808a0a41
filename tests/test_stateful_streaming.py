"""applyInPandasWithState: final state == batch oracle; two-stage drain
with a shared checkpoint converges to the same state (stateful resume)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from air_health_gis_tools_spark.streaming.stateful import (
    run_stateful_once, running_user_totals_batch)
from tests.conftest import SF_DIR


def _final_state(spark, out_path):
    df = spark.read.parquet(out_path)
    return (df.groupBy("user_id")
            .agg(F.max("n_events").alias("n_events"),
                 F.max("sum_cents").alias("sum_cents"))
            .orderBy("user_id").toPandas())


def test_stateful_final_equals_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", src / "p0.parquet")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_stateful_once(spark, str(src), out, ck)
    got = _final_state(spark, out)
    want = (running_user_totals_batch(spark.read.parquet(str(src)))
            .orderBy("user_id").toPandas())
    assert got.equals(want[got.columns.tolist()])


def test_stateful_resume_across_drains(spark, tmp_path):
    """Drain half the input, then add the rest and drain again with the
    SAME checkpoint: the final state must equal one-shot processing."""
    import pandas as pd
    src = tmp_path / "src"
    src.mkdir()
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet")
    half = len(ev) // 2
    ev.iloc[:half].to_parquet(src / "p0.parquet")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    run_stateful_once(spark, str(src), out, ck)
    ev.iloc[half:].to_parquet(src / "p1.parquet")
    run_stateful_once(spark, str(src), out, ck)
    got = _final_state(spark, out)
    want = (running_user_totals_batch(spark.createDataFrame(ev))
            .orderBy("user_id").toPandas())
    assert got.equals(want[got.columns.tolist()])
