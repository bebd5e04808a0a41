"""Smoke: driver contract (entry/queries/oracle_sql) + rows-only queries."""

from __future__ import annotations

import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "spark_entry",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"))
entry_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(entry_mod)

from tests.conftest import SF_DIR  # noqa: E402


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert "mean_10000" in df.columns


def test_every_oracle_key_has_query():
    qs = entry_mod.queries()
    for k in entry_mod.oracle_sql():
        assert k in qs


@pytest.mark.parametrize("name", ["q22_lang_id", "q23_simhash_nn",
                                  "q24_ann_lsh", "q30_s2_cells",
                                  "q31_multimodal_features"])
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    df.collect()  # must execute without error (row count may be 0)
