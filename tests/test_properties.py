"""Property-based tests (hypothesis) for the pure-NumPy kernels.

No Spark here — these pin kernel invariants across the whole input domain,
complementing the fixed-seed golden tests."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from air_health_gis_tools_spark import geo_synth as G
from air_health_gis_tools_spark.functions.cells import (hex_assign_np,
                                                        hex_cell_decode)
from air_health_gis_tools_spark.functions.ref_compat import (
    ref_circle_pixel_offsets)
from air_health_gis_tools_spark.functions.s2 import (cellid_to_face_ij,
                                                     face_ij_to_cellid)

coord = st.integers(min_value=G.MARGIN_M, max_value=G.MARGIN_M + G.SPAN - 1)


@settings(max_examples=200, deadline=None)
@given(x=coord, y=coord, res=st.sampled_from([7, 8, 9]))
def test_hex_cell_is_nearest_center(x, y, res):
    w, h = G.HEX_PITCH[res]
    cell = hex_assign_np(np.array([x]), np.array([y]), res)
    _, i, j = hex_cell_decode(cell)
    d_best = (x - int(i[0]) * w) ** 2 + (y - int(j[0]) * h) ** 2
    i0, j0 = x // w, y // h
    for di in range(-3, 4):
        for dj in range(-3, 4):
            ii, jj = i0 + di, j0 + dj
            if (ii + jj) % 2 == 0:
                d = (x - ii * w) ** 2 + (y - jj * h) ** 2
                assert d_best <= d


@settings(max_examples=100, deadline=None)
@given(r=st.floats(min_value=0.5, max_value=25.0,
                   allow_nan=False, allow_infinity=False))
def test_ref_circle_offsets_inside_closed_disk(r):
    """Every offset of the reference pixel set lies within the closed disk
    of radius r (the loop can exclude boundary pixels but never include
    pixels outside r)."""
    dr, dc = ref_circle_pixel_offsets(r)
    if len(dr):
        assert ((dr.astype(float) ** 2 + dc.astype(float) ** 2)
                <= r * r + 1e-9).all()


@settings(max_examples=100, deadline=None)
@given(face=st.integers(min_value=0, max_value=5),
       i=st.integers(min_value=0, max_value=(1 << 30) - 1),
       j=st.integers(min_value=0, max_value=(1 << 30) - 1),
       level=st.sampled_from([4, 10, 18, 30]))
def test_s2_roundtrip_any_level(face, i, j, level):
    fi = np.array([face], dtype=np.uint64)
    ii = np.array([i >> (30 - level)], dtype=np.uint64)
    jj = np.array([j >> (30 - level)], dtype=np.uint64)
    cid = face_ij_to_cellid(fi, ii, jj, level)
    f2, i2, j2 = cellid_to_face_ij(cid, level)
    assert (f2[0], i2[0], j2[0]) == (fi[0], ii[0], jj[0])


@settings(max_examples=50, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**12),
                    min_size=1, max_size=50))
def test_point_derivation_in_bounds(ids):
    x, y = G.point_xy_np(np.array(ids, dtype=np.int64))
    assert (x >= G.MARGIN_M).all() and (x < G.MARGIN_M + G.SPAN).all()
    assert (y >= G.MARGIN_M).all() and (y < G.MARGIN_M + G.SPAN).all()
