"""Distributed focal/convolution statistics over raster tile tables.

The reference's A2 operator (``buffer_convolve``, extract_raster_buffer.py:
68-80) convolves the WHOLE raster in one resident ndarray. The scale path
here is tile + halo exchange (SURVEY.md A2 row): every tile is exploded to
the (≤ 9) output tiles whose halo window it intersects, grouped by output
tile, assembled into a padded window, and convolved with the SAME
shift-accumulate kernel order as the single-node reference implementation
(functions/ref_compat.convolve_extend) — so the distributed result is
bit-identical to the whole-array result, any tiling.

Shuffle cost: each tile's pixels move ≤ 9× (in practice ~1 + 4·halo/tile_px);
nothing else shuffles. At 100 TB the tile table is the raster's native COG
layout and this is a single self-join-shaped stage.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from pyspark.sql import types as T

from ..geo_synth import RASTER_H, RASTER_W, XRES
from ..sources.raster import TILE_SCHEMA, tile_id_of


def convolve_valid(window: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Shift-accumulate sum-convolution/area over a pre-padded window.

    Same accumulation order as ref_compat.convolve_extend; NaN→0 fill.
    Output shape = window - kernel + 1.
    """
    kh, kw = kernel.shape
    h = window.shape[0] - kh + 1
    w = window.shape[1] - kw + 1
    filled = np.nan_to_num(window, nan=0.0)
    out = np.zeros((h, w))
    for di in range(kh):
        for dj in range(kw):
            if kernel[di, dj] != 0:
                out += filled[di:di + h, dj:dj + w]
    return out / np.count_nonzero(kernel)


def convolve_tiles(tiles: DataFrame, kernel: np.ndarray, tile_px: int,
                   height: int = RASTER_H, width: int = RASTER_W
                   ) -> DataFrame:
    """Focal sum/area convolution over a tile table with halo exchange.

    Returns a tile table of the same tiling containing convolved values.
    Requires halo (kernel//2) ≤ tile_px.
    """
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    assert ph <= tile_px and pw <= tile_px, "halo larger than tile"
    spark = tiles.sparkSession
    bc_kernel = spark.sparkContext.broadcast(kernel)
    ntr = (height + tile_px - 1) // tile_px
    ntc = (width + tile_px - 1) // tile_px

    # explode: every input tile → the output-tile groups its pixels feed
    offs = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]
    off_col = F.array(*[F.struct(F.lit(a).alias("di"), F.lit(b).alias("dj"))
                        for a, b in offs])
    trow = (F.col("row0") / tile_px).cast("int")
    tcol = (F.col("col0") / tile_px).cast("int")
    contrib = (tiles
               .withColumn("_o", F.explode(off_col))
               .withColumn("_tr", trow + F.col("_o.di"))
               .withColumn("_tc", tcol + F.col("_o.dj"))
               .filter((F.col("_tr") >= 0) & (F.col("_tr") < ntr)
                       & (F.col("_tc") >= 0) & (F.col("_tc") < ntc))
               .withColumn("out_tile",
                           F.col("_tr").cast("long") * F.lit(1 << 32)
                           + F.col("_tc"))
               .drop("_o", "_tr", "_tc"))

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        out_tile = int(key[0])
        otr, otc = out_tile >> 32, out_tile & 0xFFFFFFFF
        r0 = otr * tile_px
        c0 = otc * tile_px
        h = min(tile_px, height - r0)
        w = min(tile_px, width - c0)
        kernel = bc_kernel.value
        kh, kw = kernel.shape
        ph, pw = kh // 2, kw // 2
        win = np.full((h + kh - 1, w + kw - 1), np.nan)
        wr0 = r0 - ph  # absolute raster row of win[0, 0]
        wc0 = c0 - pw
        for t in pdf.itertuples():
            arr = np.asarray(t.data).reshape(t.h, t.w)
            rr = t.row0 - wr0
            cc = t.col0 - wc0
            a0, a1 = max(0, -rr), min(t.h, win.shape[0] - rr)
            b0, b1 = max(0, -cc), min(t.w, win.shape[1] - cc)
            if a0 < a1 and b0 < b1:
                win[rr + a0:rr + a1, cc + b0:cc + b1] = arr[a0:a1, b0:b1]
        # replicate at raster boundary (astropy boundary='extend' semantics)
        top = max(0, -wr0)
        left = max(0, -wc0)
        bot = max(0, (wr0 + win.shape[0]) - height)
        right = max(0, (wc0 + win.shape[1]) - width)
        if top:
            win[:top, :] = win[top, :]
        if bot:
            win[-bot:, :] = win[-(bot + 1), :]
        if left:
            win[:, :left] = win[:, left][:, None]
        if right:
            win[:, -right:] = win[:, -(right + 1)][:, None]
        out = convolve_valid(win, kernel)
        return pd.DataFrame([{
            "tile_id": tile_id_of(otr, otc), "row0": r0, "col0": c0,
            "h": h, "w": w, "data": out.ravel()}])

    return (contrib.groupBy("out_tile")
            .applyInPandas(_assemble, TILE_SCHEMA))


def gather_point_values(points: DataFrame, tiles: DataFrame,
                        id_col: str = "doc_id",
                        x_col: str = "x", y_col: str = "y",
                        out_col: str = "value",
                        tile_px: int = 256, xres: int = XRES) -> DataFrame:
    """Per-point single-pixel gather from a tile table (J2 on tiles).

    Each point reads exactly the tile containing its pixel: cogroup on
    tile_id, one array index per point. The 'gather many' half of the
    reference's Method 1 — convolve once, then every point is a cheap
    lookup (extract_raster_buffer.py:220-245). Points whose tile is absent
    gather NULL.
    """
    pts = points.select(id_col, x_col, y_col).withColumn(
        "tile_id",
        ((F.col(y_col) / xres).cast("long") / tile_px).cast("long")
        * F.lit(1 << 32)
        + ((F.col(x_col) / xres).cast("long") / tile_px).cast("long"))
    schema = T.StructType([T.StructField(id_col, T.LongType()),
                           T.StructField(out_col, T.DoubleType())])

    def _gather(key, pdf_points: pd.DataFrame, pdf_tiles: pd.DataFrame
                ) -> pd.DataFrame:
        if pdf_points.empty:
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 out_col: pd.Series(dtype="float64")})
        ids = pdf_points[id_col].to_numpy()
        if pdf_tiles.empty:
            return pd.DataFrame({id_col: ids,
                                 out_col: np.full(len(ids), np.nan)})
        t = pdf_tiles.iloc[0]
        arr = np.asarray(t["data"], dtype=np.float64).reshape(
            int(t["h"]), int(t["w"]))
        rr = (pdf_points[y_col].to_numpy().astype(np.int64) // xres
              - int(t["row0"]))
        cc = (pdf_points[x_col].to_numpy().astype(np.int64) // xres
              - int(t["col0"]))
        return pd.DataFrame({id_col: ids, out_col: arr[rr, cc]})

    return (pts.groupBy("tile_id")
            .cogroup(tiles.groupBy("tile_id"))
            .applyInPandas(_gather, schema))


def convolve_sum_count_tiles(tiles: DataFrame, kernels: dict,
                             tile_px: int,
                             height: int = RASTER_H, width: int = RASTER_W,
                             sb_tiles: int = 2) -> DataFrame:
    """Multi-kernel focal SUM + VALID-COUNT convolution in ONE halo pass.

    ``kernels``: {name: 0/1 ndarray}. The window is assembled once per
    output tile; each kernel then produces two planes — nansum and valid
    count — A1 semantics (sum/valid-count, not sum/kernel-area).

    Role split (r3): this is the plane-MATERIALIZING variant — use it when
    the convolved raster itself is the product (the reference's
    calculate_focal_mean writes the focal-mean raster to disk; feed these
    planes to ``sources/geotiff.write_geotiff``). For per-POINT extraction
    the planner's Method-1 path is ``zonal.buffered_mean_convolve_all``,
    which fuses the convolution and the gather into one superblock cogroup
    and never ships the planes (~25 GB less movement per 201 M px).

    Boundary: outside-extent pixels stay NaN (A1 clips at the raster edge,
    utils.py:82-84) — unlike ``convolve_tiles``'s 'extend' replication
    (A2/astropy semantics).
    """
    halos = {k: (v.shape[0] // 2, v.shape[1] // 2)
             for k, v in kernels.items()}
    ph = max(h for h, _ in halos.values())
    pw = max(w for _, w in halos.values())
    assert ph <= tile_px and pw <= tile_px, "halo larger than tile"
    spark = tiles.sparkSession
    bc_kernels = spark.sparkContext.broadcast(
        {k: np.asarray(v, dtype=np.float64) for k, v in kernels.items()})
    sb_px = sb_tiles * tile_px
    nsr = (height + sb_px - 1) // sb_px
    nsc = (width + sb_px - 1) // sb_px

    fields = [T.StructField("tile_id", T.LongType()),
              T.StructField("row0", T.IntegerType()),
              T.StructField("col0", T.IntegerType()),
              T.StructField("h", T.IntegerType()),
              T.StructField("w", T.IntegerType())]
    for k in kernels:
        fields += [T.StructField(f"s_{k}", T.ArrayType(T.DoubleType())),
                   T.StructField(f"c_{k}", T.ArrayType(T.LongType()))]
    out_schema = T.StructType(fields)

    # r3: SUPERBLOCK grouping (sb_tiles x sb_tiles tiles per task) replaces
    # the per-tile 9x halo fan-out: only tiles within the halo of a
    # superblock border fan out (~1 + 4*halo/sb_px per tile), so the input
    # shuffle carries the raster ~1.1x instead of 9x — the stage's cost is
    # then its unavoidable output planes, which serialize per-worker.
    # sb_tiles=2 (512 px superblocks, ~12 MB output per group) measured
    # fastest at local[32]: 2x the per-tile fan-out version; sb_tiles=4
    # forms 50 MB groups (memory pressure + last-wave imbalance).
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sbs(row0: pd.Series, col0: pd.Series, h: pd.Series, w: pd.Series
             ) -> pd.Series:
        out = []
        for r0, c0, hh, ww in zip(row0.to_numpy(), col0.to_numpy(),
                                  h.to_numpy(), w.to_numpy()):
            r_lo = max(0, (int(r0) - ph)) // sb_px
            r_hi = min(height - 1, int(r0) + int(hh) - 1 + ph) // sb_px
            c_lo = max(0, (int(c0) - pw)) // sb_px
            c_hi = min(width - 1, int(c0) + int(ww) - 1 + pw) // sb_px
            out.append([sr * (1 << 32) + sc
                        for sr in range(r_lo, min(r_hi, nsr - 1) + 1)
                        for sc in range(c_lo, min(c_hi, nsc - 1) + 1)])
        return pd.Series(out)

    contrib = tiles.withColumn(
        "sb", F.explode(_sbs(F.col("row0"), F.col("col0"),
                             F.col("h"), F.col("w"))))

    def _assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        sb = int(key[0])
        sbr, sbc = sb >> 32, sb & 0xFFFFFFFF
        r0 = sbr * sb_px
        c0 = sbc * sb_px
        sb_h = min(sb_px, height - r0)
        sb_w = min(sb_px, width - c0)
        win = np.full((sb_h + 2 * ph, sb_w + 2 * pw), np.nan)
        wr0, wc0 = r0 - ph, c0 - pw
        for t in pdf.itertuples():
            arr = np.asarray(t.data).reshape(t.h, t.w)
            rr = t.row0 - wr0
            cc = t.col0 - wc0
            a0, a1 = max(0, -rr), min(t.h, win.shape[0] - rr)
            b0, b1 = max(0, -cc), min(t.w, win.shape[1] - cc)
            if a0 < a1 and b0 < b1:
                win[rr + a0:rr + a1, cc + b0:cc + b1] = arr[a0:a1, b0:b1]
        filled = np.nan_to_num(win, nan=0.0)
        valid = (~np.isnan(win)).astype(np.float64)
        # CHORD DECOMPOSITION: a circle kernel is one contiguous column
        # run [lo, hi] per kernel row, so with a row-wise prefix sum each
        # kernel row costs ONE subtraction per output pixel instead of
        # (hi-lo+1) adds — 2r+1 ops/pixel instead of ~πr² (15× fewer at
        # r=10). Exact for integer-valued rasters (our synthetic corpus
        # and any counting raster): prefix sums stay below 2^53 so every
        # subtraction is lossless; float rasters see ≤1 ulp-scale drift
        # vs shift-accumulate order.
        pf = np.cumsum(filled, axis=1)
        pv = np.cumsum(valid, axis=1)
        pf = np.concatenate([np.zeros((pf.shape[0], 1)), pf], axis=1)
        pv = np.concatenate([np.zeros((pv.shape[0], 1)), pv], axis=1)
        planes = {}
        for name, kern in bc_kernels.value.items():
            kh, kw = kern.shape
            hh, hw = kh // 2, kw // 2
            fr0, fc0 = ph - hh, pw - hw
            s = np.zeros((sb_h, sb_w))
            c = np.zeros((sb_h, sb_w))
            for di in range(kh):
                nz = np.flatnonzero(kern[di])
                if not len(nz):
                    continue
                lo, hi = int(nz[0]), int(nz[-1])
                assert (kern[di, lo:hi + 1] != 0).all(), \
                    "chord decomposition requires row-convex kernels"
                r_ = fr0 + di
                s += (pf[r_:r_ + sb_h, fc0 + hi + 1:fc0 + hi + 1 + sb_w]
                      - pf[r_:r_ + sb_h, fc0 + lo:fc0 + lo + sb_w])
                c += (pv[r_:r_ + sb_h, fc0 + hi + 1:fc0 + hi + 1 + sb_w]
                      - pv[r_:r_ + sb_h, fc0 + lo:fc0 + lo + sb_w])
            planes[name] = (s, c)
        rows = []
        for tr in range(sbr * sb_tiles,
                        min((sbr + 1) * sb_tiles,
                            (height + tile_px - 1) // tile_px)):
            for tc in range(sbc * sb_tiles,
                            min((sbc + 1) * sb_tiles,
                                (width + tile_px - 1) // tile_px)):
                tr0, tc0 = tr * tile_px, tc * tile_px
                th = min(tile_px, height - tr0)
                tw = min(tile_px, width - tc0)
                lr, lc = tr0 - r0, tc0 - c0
                row = {"tile_id": tile_id_of(tr, tc), "row0": tr0,
                       "col0": tc0, "h": th, "w": tw}
                for name, (s, c) in planes.items():
                    row[f"s_{name}"] = s[lr:lr + th, lc:lc + tw].ravel()
                    row[f"c_{name}"] = c[lr:lr + th, lc:lc + tw].ravel() \
                        .astype(np.int64)
                rows.append(row)
        return pd.DataFrame(rows)

    return (contrib.groupBy("sb")
            .applyInPandas(_assemble, out_schema))
