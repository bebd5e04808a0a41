"""Reference-exact semantics, reproduced from documented behavior.

The reference has two historic circle-membership definitions that differ
from each other AND from our engine-canonical rule (d² ≤ rpx², zonal.py):

1. ``points_in_circle`` loop bounds (Archived_scripts/utils.py:69-87):
   rows i ∈ [ceil(i0-r), ceil(i0+r)), per-row chord half-width
   ri = sqrt(r² - (i-i0)²), cols j ∈ [ceil(j0-ri), ceil(j0+ri)) — an
   asymmetric pixel set (upper bounds excluded), clipped at array edges.
   ``coregRaster`` (utils.py:89-117) then takes nansum/valid-count.

2. ``create_buffer`` mask (extract_raster_buffer.py:94-102): on a
   (2r-1)² window, dist = sqrt((X-r+1)² + (Y-r+1)²) + 1 ≤ r — the ``+1``
   shrinks the effective radius to r-1.

Both are kept as selectable membership modes so tile-assignment parity with
the reference can be asserted bit-for-bit (SURVEY.md §7.4 risk 2). These are
*re-implementations from the documented contract*, vectorized NumPy — the
reference's are scalar generator loops under numba.
"""

from __future__ import annotations

import math

import numpy as np


def ref_circle_pixel_offsets(r: float) -> tuple[np.ndarray, np.ndarray]:
    """(dr, dc) offsets of the reference's ``points_in_circle`` pixel set
    for an integer-centered point (i0=j0=0), row-major yield order."""
    drs = []
    dcs = []
    for i in range(math.ceil(-r), math.ceil(r)):
        ri = math.sqrt(r * r - i * i)
        for j in range(math.ceil(-ri), math.ceil(ri)):
            drs.append(i)
            dcs.append(j)
    return np.asarray(drs, dtype=np.int64), np.asarray(dcs, dtype=np.int64)


def ref_coreg_raster(i0: int, j0: int, data: np.ndarray, r: float) -> float:
    """Reference A1 semantics at one point: nansum/valid-count over the
    points_in_circle set, with edge clipping (utils.py:89-117)."""
    dr, dc = ref_circle_pixel_offsets(r)
    ii = i0 + dr
    jj = j0 + dc
    ok = (ii >= 0) & (ii < data.shape[0]) & (jj >= 0) & (jj < data.shape[1])
    pts = data[ii[ok], jj[ok]]
    n = np.count_nonzero(~np.isnan(pts))
    if n == 0:
        return float("nan")
    return float(np.nansum(pts) / n)


def ref_create_buffer_mask(r: int) -> np.ndarray:
    """The (2r-1)² convolution kernel with the +1 radius-shrink quirk
    (extract_raster_buffer.py:94-102). Returns float 0/1 array."""
    y, x = np.ogrid[0:2 * r - 1, 0:2 * r - 1]
    dist = np.sqrt((x - r + 1) ** 2 + (y - r + 1) ** 2) + 1
    return (dist <= r).astype(np.float64)


def ref_buffer_convolve(arr: np.ndarray, r: int) -> np.ndarray:
    """Reference A2 semantics (extract_raster_buffer.py:68-80): convolve
    with the create_buffer kernel, NaNs filled with 0, edges replicated
    (astropy boundary='extend'), divided by count_nonzero(kernel).

    Implemented as shift-accumulate (deterministic offset order) so the
    distributed tile version can reproduce it bit-for-bit.
    """
    kernel = ref_create_buffer_mask(r)
    return convolve_extend(arr, kernel)


def convolve_extend(arr: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """sum-convolution/area with NaN→0 fill and edge-replicate padding.

    Offset accumulation runs in row-major kernel order; every partition
    strategy must use this same function on its (haloed) window so results
    are bit-identical regardless of tiling.
    """
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    filled = np.nan_to_num(arr, nan=0.0)
    padded = np.pad(filled, ((ph, kh - 1 - ph), (pw, kw - 1 - pw)),
                    mode="edge")
    out = np.zeros_like(filled)
    h, w = filled.shape
    for di in range(kh):
        for dj in range(kw):
            if kernel[di, dj] != 0:
                out += padded[di:di + h, dj:dj + w]
    return out / np.count_nonzero(kernel)
