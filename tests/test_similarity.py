"""Similarity-search strategies: exact baselines agree; ANN variants
(IVF, sign-LSH) measured for recall against brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from air_health_gis_tools_spark.operators.similarity import (
    ann_topk_ivf, ann_topk_lsh, cosine_topk, cosine_topk_udf,
    ivf_assign, ivf_train_centroids)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def qvec(emb):
    return list(emb.filter(F.col("vec_id") == 0).head()["embedding"])


def test_expression_and_kernel_topk_agree(emb, qvec):
    a = cosine_topk(emb, qvec, k=10).toPandas()
    b = cosine_topk_udf(emb, qvec, k=10).toPandas()
    assert a["vec_id"].tolist() == b["vec_id"].tolist()
    assert np.allclose(a["cosine"], b["cosine"], rtol=0, atol=0)


def test_ivf_assignment_is_nearest_centroid(spark, emb):
    sample = np.stack([r[0] for r in emb.select("embedding")
                       .limit(256).collect()])
    cents = ivf_train_centroids(sample, n_lists=8)
    got = ivf_assign(emb, cents).select("vec_id", "ivf_list").toPandas()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    for _, row in got.sample(50, random_state=1).iterrows():
        v = vecs[row["vec_id"]]
        d = ((cents - v[None, :]) ** 2).sum(axis=1)
        assert int(np.argmin(d)) == row["ivf_list"]


def test_ivf_full_probe_equals_exact(emb, qvec):
    exact = cosine_topk(emb, qvec, k=10).toPandas()["vec_id"].tolist()
    full = ann_topk_ivf(emb, qvec, k=10, n_lists=8,
                        n_probe=8).toPandas()["vec_id"].tolist()
    assert full == exact


def test_ann_recall_reported(emb, qvec):
    """ANN variants must reach reasonable recall@10 on this corpus; the
    exact threshold is a property of the data — we pin a floor and print
    the measured values for BENCH notes."""
    exact = set(cosine_topk(emb, qvec, k=10).toPandas()["vec_id"])
    ivf = set(ann_topk_ivf(emb, qvec, k=10, n_lists=8,
                           n_probe=2).toPandas()["vec_id"])
    lsh = set(ann_topk_lsh(emb, qvec, k=10).toPandas()["vec_id"])
    r_ivf = len(ivf & exact) / 10
    r_lsh = len(lsh & exact) / 10
    print(f"recall@10 — ivf(nprobe=2/8): {r_ivf}, lsh(8 planes): {r_lsh}")
    assert r_ivf >= 0.5
