"""Golden digests: committed value-hashes of flagship outputs at sf0.001.

Catches semantic drift across rounds even if Spark and the DuckDB oracle
drift together (both-sides-wrong regressions). Digest = sha256 over the
column-name-sorted, row-sorted repr stream — same normalization as the
driver's value hash."""

from __future__ import annotations

import hashlib
import json
import math
import os

import pytest

from air_health_gis_tools_spark.plans import queries as Q
from tests.conftest import SF_DIR

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "digests_sf0001.json")

GOLDEN_QUERIES = ["q01_buffered_stats", "q02_hex_cells", "q06_knn",
                  "q07_pip_counts", "q14_exact_dedup", "q16_minhash",
                  "q33_convolve_gather"]


def value_digest(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    h = hashlib.sha256()
    for c in pdf.columns:
        for v in pdf[c].tolist():
            if v is None or (isinstance(v, float) and math.isnan(v)):
                h.update(b"<null>")
            else:
                h.update(repr(v).encode())
    return h.hexdigest()


@pytest.mark.skipif("sf0.001" not in SF_DIR,
                    reason="golden digests are pinned at sf0.001")
@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_digest(name, spark):
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    got = value_digest(Q.QUERIES[name](spark, SF_DIR).toPandas())
    assert got == golden[name], (
        f"{name}: output drifted from committed golden digest")
