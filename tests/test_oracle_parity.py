"""Spark-vs-DuckDB parity for every oracle-paired query — the same check the
driver runs, executed locally at sf0.001 so regressions surface immediately.

Comparison mirrors the driver: sort columns by name, sort rows, compare
values exactly (floats must be bit-identical by construction — geo_synth
keeps every float either an exact-integer-valued double or a single-rounded
sqrt/division)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from air_health_gis_tools_spark.plans import queries as Q
from tests.conftest import SF_DIR

# golden-parquet oracles are pinned to the driver's correctness scale
# (sf0.01) — running them here at sf0.001 would compare different corpora.
# tests/test_golden_oracles.py covers them at the pinned scale.
ORACLE_KEYS = sorted(k for k, sql in Q.ORACLES.items()
                     if Q.GOLDEN_DIR not in sql)


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame, name: str):
    a, b = _normalize(sdf), _normalize(odf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: columns {list(a.columns)} != {list(b.columns)}")
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        # nullable ints surface as float on either side; i~f is acceptable
        # only when the value sets still compare equal below AND one side
        # has nulls — otherwise require identical kinds (catches HUGEINT
        # and decimal drift in oracle SQL that would break the driver hash)
        if ka != kb and not ({ka, kb} == {"i", "f"}
                             and (a[c].isna().any() or b[c].isna().any())):
            raise AssertionError(f"{name}.{c}: dtype kind {ka} != {kb}")
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or (isinstance(x, float) and math.isnan(x)):
                ok = y is None or (isinstance(y, float) and math.isnan(y))
            else:
                ok = x == y
            assert ok, f"{name}.{c}[{i}]: spark={x!r} oracle={y!r}"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(name, spark, duck):
    sdf = Q.QUERIES[name](spark, SF_DIR).toPandas()
    odf = duck.execute(Q.ORACLES[name]).df()
    _compare(sdf, odf, name)
