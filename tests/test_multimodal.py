"""Multimodal plumbing: schema/batch-shape real, decode stubbed."""

from __future__ import annotations

import pytest

from air_health_gis_tools_spark.operators.multimodal import (decode_image,
                                                             extract_features,
                                                             synthetic_media)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01", fake=False)


def test_decode_fake_deterministic():
    a = decode_image(b"payload", fake=True)
    b = decode_image(b"payload", fake=True)
    assert a.shape == (8, 8, 3) and (a == b).all()
    assert (decode_image(b"other", fake=True) != a).any()


def test_feature_extraction_plumbing(spark):
    media = synthetic_media(spark, 150)
    feats = extract_features(media).collect()
    assert len(feats) == 150
    kinds = {r["kind"] for r in feats}
    assert kinds == {"image", "audio", "video"}
    for r in feats:
        assert len(r["feature"]) == 8
        assert r["n_bytes"] > 0 and len(r["digest"]) == 64
    # determinism across runs
    feats2 = extract_features(media).collect()
    d1 = {r["media_id"]: (r["digest"], list(r["feature"])) for r in feats}
    d2 = {r["media_id"]: (r["digest"], list(r["feature"])) for r in feats2}
    assert d1 == d2
