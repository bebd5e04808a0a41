"""Structural invariants of the S2 implementation (no s2 library in env):
Hilbert adjacency, parent-child containment, round-trip decode, and the
documented 64-bit id layout."""

from __future__ import annotations

import numpy as np

from air_health_gis_tools_spark.functions.s2 import (cellid_to_face_ij,
                                                     face_ij_to_cellid,
                                                     s2_cell_np, st_to_ij,
                                                     uv_to_st)


def test_roundtrip_face_ij():
    rng = np.random.default_rng(5)
    face = rng.integers(0, 6, 1000).astype(np.uint64)
    i = rng.integers(0, 1 << 30, 1000).astype(np.uint64)
    j = rng.integers(0, 1 << 30, 1000).astype(np.uint64)
    cid = face_ij_to_cellid(face, i, j)
    f2, i2, j2 = cellid_to_face_ij(cid)
    assert np.array_equal(face, f2)
    assert np.array_equal(i, i2)
    assert np.array_equal(j, j2)


def test_hilbert_adjacency():
    """Consecutive Hilbert positions within one face must be edge-adjacent
    cells: |di| + |dj| == 1. This pins the traversal tables."""
    level = 5
    n = 1 << level
    ii, jj = np.meshgrid(np.arange(n, dtype=np.uint64),
                         np.arange(n, dtype=np.uint64), indexing="ij")
    for face in (0, 1, 5):
        f = np.full(n * n, face, dtype=np.uint64)
        cid = face_ij_to_cellid(f, ii.ravel(), jj.ravel(), level)
        pos = (cid >> np.uint64(1)) >> np.uint64(2 * (30 - level))
        order = np.argsort(pos)
        oi = ii.ravel()[order].astype(np.int64)
        oj = jj.ravel()[order].astype(np.int64)
        step = np.abs(np.diff(oi)) + np.abs(np.diff(oj))
        assert (step == 1).all(), f"face {face} breaks Hilbert adjacency"


def test_parent_contains_child():
    rng = np.random.default_rng(6)
    lat = rng.uniform(-60, 60, 500)
    lng = rng.uniform(-179, 179, 500)
    child = s2_cell_np(lat, lng, level=14).astype(np.uint64)
    parent = s2_cell_np(lat, lng, level=10).astype(np.uint64)
    # parent range: [parent - span + lsb, parent + span - lsb] where
    # lsb(parent) = 2^(2*(30-10)); child must fall inside
    lsb_p = np.uint64(1) << np.uint64(2 * (30 - 10))
    lo = parent - lsb_p + np.uint64(1)
    hi = parent + lsb_p - np.uint64(1)
    assert ((child >= lo) & (child <= hi)).all()


def test_id_layout_sentinel():
    cid = s2_cell_np(np.array([10.0]), np.array([20.0]), level=12)
    u = np.uint64(cid[0])
    lsb = u & (~u + np.uint64(1))
    assert lsb == np.uint64(1) << np.uint64(2 * (30 - 12))  # sentinel at level
    assert (u >> np.uint64(61)) < 6  # valid face


def test_st_projection_monotonic_and_bounded():
    u = np.linspace(-1, 1, 1001)
    s = uv_to_st(u)
    assert (np.diff(s) > 0).all()
    assert s.min() >= 0 and s.max() <= 1
    ij = st_to_ij(s)
    assert ij.min() >= 0 and ij.max() <= (1 << 30) - 1
