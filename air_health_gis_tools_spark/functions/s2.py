"""S2 cell ids (spherical quad-tree, Hilbert-curve leaf ordering) in NumPy.

Implemented from the public S2 geometry specification (s2geometry.io:
face/UV/ST/IJ coordinate ladder, quadratic ST projection, Hilbert traversal
tables, 64-bit cell-id layout face(3) | position(2·level) | sentinel-1).
No s2 library exists in this environment; correctness is established by
structural invariants in tests (Hilbert adjacency, parent containment,
round-trip decode, center error < cell size) rather than cross-library
comparison.

All kernels are batched ``uint64`` NumPy — usable directly inside
``pandas_udf`` (north_star F12: "batched NumPy cell-encode kernels").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

_SWAP, _INVERT = 1, 2
# kIJtoPos[orientation][i*2+j] and kPosToIJ[orientation][pos] from the S2 spec
_IJ_TO_POS = np.array([[0, 1, 3, 2],
                       [0, 3, 1, 2],
                       [2, 3, 1, 0],
                       [2, 1, 3, 0]], dtype=np.uint64)
_POS_TO_IJ = np.array([[0, 1, 3, 2],
                       [0, 2, 3, 1],
                       [3, 2, 0, 1],
                       [3, 1, 0, 2]], dtype=np.uint64)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.uint64)
_MAX_LEVEL = 30


def latlng_to_xyz(lat_deg: np.ndarray, lng_deg: np.ndarray):
    phi = np.radians(lat_deg)
    theta = np.radians(lng_deg)
    cos = np.cos(phi)
    return cos * np.cos(theta), cos * np.sin(theta), np.sin(phi)


def xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= np.maximum(ay, az),
                    np.where(x >= 0, 0, 3),
                    np.where(ay >= az,
                             np.where(y >= 0, 1, 4),
                             np.where(z >= 0, 2, 5)))
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve, de) in enumerate([
            (lambda: y / x, lambda: z / x, None),        # face 0 (+x)
            (lambda: -x / y, lambda: z / y, None),       # face 1 (+y)
            (lambda: -x / z, lambda: -y / z, None),      # face 2 (+z)
            (lambda: z / x, lambda: y / x, None),        # face 3 (-x)
            (lambda: z / y, lambda: -x / y, None),       # face 4 (-y)
            (lambda: -y / z, lambda: -x / z, None)]):    # face 5 (-z)
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = ue()[m]
                v[m] = ve()[m]
    return face.astype(np.uint64), u, v


def uv_to_st(u: np.ndarray) -> np.ndarray:
    """Quadratic projection (the S2 default)."""
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0,
                        0.5 * np.sqrt(1.0 + 3.0 * np.abs(u)),
                        1.0 - 0.5 * np.sqrt(1.0 + 3.0 * np.abs(u)))


def st_to_ij(s: np.ndarray, level: int = _MAX_LEVEL) -> np.ndarray:
    n = np.uint64(1) << np.uint64(level)
    return np.clip((s * float(n)).astype(np.int64), 0,
                   int(n) - 1).astype(np.uint64)


def face_ij_to_cellid(face: np.ndarray, i: np.ndarray, j: np.ndarray,
                      level: int = _MAX_LEVEL) -> np.ndarray:
    """Hilbert-order position, per-level table walk (vectorized)."""
    orient = face & np.uint64(_SWAP)
    pos = np.zeros_like(face, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        ib = (i >> np.uint64(k)) & np.uint64(1)
        jb = (j >> np.uint64(k)) & np.uint64(1)
        ij = ib * np.uint64(2) + jb
        p = _IJ_TO_POS[orient.astype(np.int64), ij.astype(np.int64)]
        pos = (pos << np.uint64(2)) | p
        orient = orient ^ _POS_TO_ORIENT[p.astype(np.int64)]
    # id layout: face(3) | pos(2*level) | 1 | zeros to 64 bits
    shift = np.uint64(2 * (_MAX_LEVEL - level))
    pos_full = pos << shift
    cid = ((face << np.uint64(61))
           | (pos_full << np.uint64(1))
           | (np.uint64(1) << shift))
    return cid


def cellid_to_face_ij(cid: np.ndarray, level: int = _MAX_LEVEL):
    """Inverse walk (for round-trip tests)."""
    face = (cid >> np.uint64(61)).astype(np.uint64)
    shift = np.uint64(2 * (_MAX_LEVEL - level))
    pos = (cid >> np.uint64(1)) >> shift
    orient = face & np.uint64(_SWAP)
    i = np.zeros_like(cid, dtype=np.uint64)
    j = np.zeros_like(cid, dtype=np.uint64)
    for k in range(level - 1, -1, -1):
        p = (pos >> np.uint64(2 * k)) & np.uint64(3)
        ij = _POS_TO_IJ[orient.astype(np.int64), p.astype(np.int64)]
        i = (i << np.uint64(1)) | (ij >> np.uint64(1))
        j = (j << np.uint64(1)) | (ij & np.uint64(1))
        orient = orient ^ _POS_TO_ORIENT[p.astype(np.int64)]
    return face, i, j


def s2_cell_np(lat_deg: np.ndarray, lng_deg: np.ndarray,
               level: int = 12) -> np.ndarray:
    x, y, z = latlng_to_xyz(np.asarray(lat_deg, float),
                            np.asarray(lng_deg, float))
    face, u, v = xyz_to_face_uv(x, y, z)
    i = st_to_ij(uv_to_st(u), _MAX_LEVEL) >> np.uint64(_MAX_LEVEL - level)
    j = st_to_ij(uv_to_st(v), _MAX_LEVEL) >> np.uint64(_MAX_LEVEL - level)
    return face_ij_to_cellid(face, i, j, level).astype(np.int64)


# planar frame → lat/lng (SURVEY.md F1)
# mode='linear': deterministic affine for the synthetic positive-quadrant
#   extent (oracle-stable — q30's rows-only check needs reproducibility,
#   not geodesy).
# mode='albers': the REAL EPSG:3577 inverse (functions/crs.py implements
#   the reference's pyproj.Transformer.from_crs("EPSG:3577", …) transform
#   from the published Snyder equations — no pyproj in this env).
def planar_to_latlng(x: np.ndarray, y: np.ndarray, mode: str = "linear"):
    if mode == "albers":
        from .crs import albers_inverse
        return albers_inverse(x, y)
    lng = (np.asarray(x, float) - 2_000_000.0) / 100_000.0
    lat = (np.asarray(y, float) - 2_000_000.0) / 100_000.0
    return lat, lng


def s2_cell_udf(level: int = 12):
    @F.pandas_udf(LongType())
    def _udf(x: pd.Series, y: pd.Series) -> pd.Series:
        lat, lng = planar_to_latlng(x.to_numpy(), y.to_numpy())
        return pd.Series(s2_cell_np(lat, lng, level))
    return _udf
