"""Raster↔raster alignment (warp/resample) over tile tables — SURVEY J8.

The reference aligns rasters with ``rasterio.warp.reproject`` /
``rio.reproject_match`` (extract_raster_buffer.py:192-201;
srg-dev/calculate_focal_mean.py:83-85): every destination pixel pulls from
the source pixel(s) under an affine map — "an as-of/nearest join in 2-D".

Distributed form for integer downsample factor f with nearest resampling
(the deterministic kernel the reference recommends for exact-match tests,
extract_raster_buffer.py:28-35): each source tile belongs to exactly one
output tile (src (tr, tc) → out (tr//f, tc//f)); group the f² source tiles
per output tile, assemble, and gather centers. One narrow shuffle keyed by
output tile; no pixel is read twice. Bilinear/cubic variants swap the
gather kernel (parameter seam, as in the reference's Resampling enum).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..geo_synth import RASTER_H, RASTER_W
from ..sources.raster import TILE_SCHEMA, tile_id_of


def resample_tiles_nearest(tiles: DataFrame, factor: int, tile_px: int,
                           height: int = RASTER_H, width: int = RASTER_W,
                           sample_offset: int | None = None) -> DataFrame:
    """Downsample a tile table by integer ``factor`` (nearest centers).

    Output pixel (R, C) pulls source pixel (R*f + off, C*f + off) where
    ``off`` defaults to f//2 — the source pixel containing the output
    pixel center (exact integer math). ``sample_offset=0`` selects the
    corner convention GDAL's nearest overviews use (the reference's .ovr
    pyramid matches ``full[0::2, 0::2]`` — see operators/pyramid.py).
    Output tiling keeps ``tile_px`` pixels per tile. ``height``/``width``
    are the SOURCE raster dims; edge output tiles are trimmed to the true
    downsampled extent (ceil(height/f) × ceil(width/f)).
    """
    assert factor >= 1
    f = int(factor)
    off = f // 2 if sample_offset is None else int(sample_offset)
    assert 0 <= off < f
    out_h = -(-height // f)
    out_w = -(-width // f)

    out_tr = ((F.col("row0") / tile_px).cast("long") / f).cast("long")
    out_tc = ((F.col("col0") / tile_px).cast("long") / f).cast("long")
    keyed = tiles.withColumn(
        "out_tile", out_tr * F.lit(1 << 32) + out_tc)

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out_tile = int(key[0])
        otr, otc = out_tile >> 32, out_tile & 0xFFFFFFFF
        # source window covered by this output tile
        src_r0 = otr * tile_px * f
        src_c0 = otc * tile_px * f
        span = tile_px * f
        win = np.full((span, span), np.nan)
        for t in pdf.itertuples():
            arr = np.asarray(t.data).reshape(t.h, t.w)
            rr = int(t.row0) - src_r0
            cc = int(t.col0) - src_c0
            win[rr:rr + t.h, cc:cc + t.w] = arr
        # trim edge tiles to the true downsampled extent so h/w metadata
        # matches the output raster dims (no phantom NaN-padded pixels)
        h = min(tile_px, out_h - otr * tile_px)
        w = min(tile_px, out_w - otc * tile_px)
        # nearest gather at output pixel centers; absolute source index
        # clamped to the raster extent (edge replication), matching the
        # bilinear/Lanczos clamp and rasterio's Resampling.nearest — else
        # the last output row/col goes phantom-NaN whenever R*f + f//2
        # falls past the source extent (e.g. height=997, f=4)
        idx_r = np.clip(
            np.arange(otr * tile_px, otr * tile_px + h, dtype=np.int64)
            * f + off, 0, height - 1) - src_r0
        idx_c = np.clip(
            np.arange(otc * tile_px, otc * tile_px + w, dtype=np.int64)
            * f + off, 0, width - 1) - src_c0
        out = win[np.ix_(idx_r, idx_c)]
        return pd.DataFrame([{
            "tile_id": tile_id_of(otr, otc),
            "row0": otr * tile_px, "col0": otc * tile_px,
            "h": h, "w": w, "data": out.ravel()}])

    return keyed.groupBy("out_tile").applyInPandas(_assemble, TILE_SCHEMA)


def resample_tiles_bilinear(tiles: DataFrame, factor: int, tile_px: int,
                            height: int = RASTER_H, width: int = RASTER_W
                            ) -> DataFrame:
    """Bilinear downsample by integer ``factor`` (O10 second resampling
    mode — the reference picks among nearest/bilinear/Lanczos,
    extract_raster_buffer.py:28-35).

    Output pixel center maps to source coords s = (R + 0.5)·f − 0.5 (the
    standard area-alignment convention); the value is the 2×2 bilinear
    blend around s, coordinates clamped at the raster edge (edge
    replication). NaN contributors propagate to NaN — nodata does not
    bleed a fabricated value.

    Plan shape: unlike nearest (each source tile feeds exactly one output
    tile), the 2×2 stencil needs one extra pixel beyond the window, so
    boundary source tiles feed ≤ 2 output tiles per axis — still a single
    narrow shuffle keyed by output tile.
    """
    assert factor >= 1
    f = int(factor)
    span = tile_px * f
    out_h = -(-height // f)
    out_w = -(-width // f)
    ntr_out = (out_h + tile_px - 1) // tile_px
    ntc_out = (out_w + tile_px - 1) // tile_px

    @F.pandas_udf("array<long>")
    def _out_tiles(row0: pd.Series, col0: pd.Series) -> pd.Series:
        out = []
        for r0, c0 in zip(row0.to_numpy(), col0.to_numpy()):
            # output tile otr needs source rows [otr*span, otr*span+span+1)
            r_lo = max(0, (int(r0) - span - 1) // span + 1)
            r_hi = min(ntr_out - 1, (int(r0) + tile_px - 1) // span)
            c_lo = max(0, (int(c0) - span - 1) // span + 1)
            c_hi = min(ntc_out - 1, (int(c0) + tile_px - 1) // span)
            out.append([tr * (1 << 32) + tc
                        for tr in range(r_lo, r_hi + 1)
                        for tc in range(c_lo, c_hi + 1)])
        return pd.Series(out)

    keyed = tiles.withColumn(
        "out_tile", F.explode(_out_tiles(F.col("row0"), F.col("col0"))))

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out_tile = int(key[0])
        otr, otc = out_tile >> 32, out_tile & 0xFFFFFFFF
        src_r0 = otr * span
        src_c0 = otc * span
        win = np.full((span + 1, span + 1), np.nan)
        for t in pdf.itertuples():
            arr = np.asarray(t.data).reshape(t.h, t.w)
            rr = int(t.row0) - src_r0
            cc = int(t.col0) - src_c0
            a0, a1 = max(0, -rr), min(t.h, win.shape[0] - rr)
            b0, b1 = max(0, -cc), min(t.w, win.shape[1] - cc)
            if a0 < a1 and b0 < b1:
                win[rr + a0:rr + a1, cc + b0:cc + b1] = arr[a0:a1, b0:b1]
        h = min(tile_px, out_h - otr * tile_px)
        w = min(tile_px, out_w - otc * tile_px)
        if h <= 0 or w <= 0:
            return pd.DataFrame(
                {fld.name: pd.Series(dtype="object" if fld.name == "data"
                                     else "int64")
                 for fld in TILE_SCHEMA})
        out = bilinear_gather_np(win, src_r0, src_c0, otr * tile_px,
                                 otc * tile_px, h, w, f, height, width)
        return pd.DataFrame([{
            "tile_id": tile_id_of(otr, otc),
            "row0": otr * tile_px, "col0": otc * tile_px,
            "h": h, "w": w, "data": out.ravel()}])

    return keyed.groupBy("out_tile").applyInPandas(_assemble, TILE_SCHEMA)


LANCZOS_A = 3


def _lanczos_axis_weights(out0: int, n_out: int, f: int, size: int,
                          win_lo: int) -> np.ndarray:
    """(n_out, win_len) weight matrix for one axis: taps at source indices
    clamped to [0, size-1] (edge replication), kernel L((i−s)/f) with
    s = (R+0.5)·f − 0.5 (anti-aliased: support scales with the downsample
    factor), rows normalized to Σw = 1."""
    a = LANCZOS_A
    R = np.arange(out0, out0 + n_out, dtype=np.float64)
    s = (R + 0.5) * f - 0.5
    i0 = np.floor(s).astype(np.int64) - a * f + 1
    taps = i0[:, None] + np.arange(2 * a * f, dtype=np.int64)[None, :]
    t = (taps - s[:, None]) / f
    w = np.sinc(t) * np.sinc(t / a)
    w[np.abs(t) >= a] = 0.0
    w /= w.sum(axis=1, keepdims=True)
    clamped = np.clip(taps, 0, size - 1) - win_lo
    win_len = int(clamped.max()) + 1 if n_out else 0
    dense = np.zeros((n_out, max(win_len, 1)))
    np.add.at(dense, (np.repeat(np.arange(n_out), taps.shape[1]),
                      clamped.ravel()), w.ravel())
    return dense


def lanczos_gather_np(win: np.ndarray, win_r0: int, win_c0: int,
                      out_r0: int, out_c0: int, h: int, w: int, f: int,
                      height: int, width: int) -> np.ndarray:
    """Separable Lanczos-3 resample of one output block from a source
    window (absolute origin win_r0/win_c0). NaN in any non-zero-weight tap
    propagates (nodata is never invented); shared by the distributed
    kernel and the numpy oracle."""
    Wy = _lanczos_axis_weights(out_r0, h, f, height, win_r0)
    Wx = _lanczos_axis_weights(out_c0, w, f, width, win_c0)
    sub = win[:Wy.shape[1], :Wx.shape[1]]
    return Wy @ sub @ Wx.T


def resample_tiles_lanczos(tiles: DataFrame, factor: int, tile_px: int,
                           height: int = RASTER_H, width: int = RASTER_W
                           ) -> DataFrame:
    """Lanczos-3 downsample by integer ``factor`` — O10 third resampling
    mode (the reference's Resampling enum: nearest/bilinear/Lanczos,
    extract_raster_buffer.py:28-35). Same single narrow shuffle keyed by
    output tile as the other modes, with a 3f-pixel halo."""
    assert factor >= 1
    f = int(factor)
    span = tile_px * f
    halo = LANCZOS_A * f
    out_h = -(-height // f)
    out_w = -(-width // f)
    ntr_out = (out_h + tile_px - 1) // tile_px
    ntc_out = (out_w + tile_px - 1) // tile_px

    @F.pandas_udf("array<long>")
    def _out_tiles(row0: pd.Series, col0: pd.Series) -> pd.Series:
        out = []
        for r0, c0 in zip(row0.to_numpy(), col0.to_numpy()):
            # output tile otr reads source rows [otr*span−halo,
            # otr*span+span+halo)
            r_lo = max(0, (int(r0) - span - halo) // span + 1)
            r_hi = min(ntr_out - 1, (int(r0) + tile_px - 1 + halo) // span)
            c_lo = max(0, (int(c0) - span - halo) // span + 1)
            c_hi = min(ntc_out - 1, (int(c0) + tile_px - 1 + halo) // span)
            out.append([tr * (1 << 32) + tc
                        for tr in range(r_lo, r_hi + 1)
                        for tc in range(c_lo, c_hi + 1)])
        return pd.Series(out)

    keyed = tiles.withColumn(
        "out_tile", F.explode(_out_tiles(F.col("row0"), F.col("col0"))))

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out_tile = int(key[0])
        otr, otc = out_tile >> 32, out_tile & 0xFFFFFFFF
        win_r0 = max(0, otr * span - halo)
        win_c0 = max(0, otc * span - halo)
        win_r1 = min(height, otr * span + span + halo)
        win_c1 = min(width, otc * span + span + halo)
        win = np.full((win_r1 - win_r0, win_c1 - win_c0), np.nan)
        for t in pdf.itertuples():
            rr = int(t.row0) - win_r0
            cc = int(t.col0) - win_c0
            arr = np.asarray(t.data).reshape(t.h, t.w)
            a0, a1 = max(0, -rr), min(t.h, win.shape[0] - rr)
            b0, b1 = max(0, -cc), min(t.w, win.shape[1] - cc)
            if a0 < a1 and b0 < b1:
                win[rr + a0:rr + a1, cc + b0:cc + b1] = arr[a0:a1, b0:b1]
        h = min(tile_px, out_h - otr * tile_px)
        w = min(tile_px, out_w - otc * tile_px)
        out = lanczos_gather_np(win, win_r0, win_c0, otr * tile_px,
                                otc * tile_px, h, w, f, height, width)
        return pd.DataFrame([{
            "tile_id": tile_id_of(otr, otc),
            "row0": otr * tile_px, "col0": otc * tile_px,
            "h": h, "w": w, "data": out.ravel()}])

    return keyed.groupBy("out_tile").applyInPandas(_assemble, TILE_SCHEMA)


def bilinear_gather_np(win: np.ndarray, win_r0: int, win_c0: int,
                       out_r0: int, out_c0: int, h: int, w: int, f: int,
                       height: int, width: int) -> np.ndarray:
    """Bilinear sample of output block [out_r0, out_r0+h) × [out_c0, …+w)
    from a source window whose [0,0] is absolute (win_r0, win_c0).
    Shared by the distributed assemble kernel and the numpy test oracle so
    parity is by-construction arithmetic identity."""
    rr = np.arange(out_r0, out_r0 + h, dtype=np.float64)
    cc = np.arange(out_c0, out_c0 + w, dtype=np.float64)
    sy = np.clip((rr + 0.5) * f - 0.5, 0.0, height - 1.0)
    sx = np.clip((cc + 0.5) * f - 0.5, 0.0, width - 1.0)
    y0 = np.floor(sy).astype(np.int64)
    x0 = np.floor(sx).astype(np.int64)
    y1 = np.minimum(y0 + 1, height - 1)
    x1 = np.minimum(x0 + 1, width - 1)
    wy = (sy - y0)[:, None]
    wx = (sx - x0)[None, :]
    g = lambda ys, xs: win[np.ix_(ys - win_r0, xs - win_c0)]  # noqa: E731

    def term(wgt, val):
        # a zero-weight neighbor contributes 0 even when it is NaN
        # (0·NaN = NaN would otherwise bleed nodata into exact-grid hits);
        # NaN under positive weight propagates — nodata is never invented
        return np.where(wgt > 0, wgt * val, 0.0)

    return (term((1 - wy) * (1 - wx), g(y0, x0))
            + term((1 - wy) * wx, g(y0, x1))
            + term(wy * (1 - wx), g(y1, x0))
            + term(wy * wx, g(y1, x1)))
