"""J8 warp/resample parity: distributed tile resample == numpy oracle,
both resampling modes (nearest / bilinear), incl. non-multiple edge dims."""

from __future__ import annotations

import numpy as np

from air_health_gis_tools_spark.operators.warp import (bilinear_gather_np,
                                                       resample_tiles_bilinear,
                                                       resample_tiles_nearest)
from air_health_gis_tools_spark.sources.raster import (materialize_raster,
                                                       synthetic_tile_table)


def _assemble(out, oh, ow):
    got = np.full((oh, ow), np.nan)
    for t in out.itertuples():
        arr = np.asarray(t.data).reshape(t.h, t.w)
        got[t.row0:t.row0 + t.h, t.col0:t.col0 + t.w] = arr
    return got


def test_resample_nearest_matches_numpy(spark):
    h = w = 1024
    f = 4
    tiles = synthetic_tile_table(spark, tile_px=128, height=h, width=w)
    out = resample_tiles_nearest(tiles, factor=f, tile_px=128,
                                 height=h, width=w).toPandas()
    got = _assemble(out, h // f, w // f)
    src = materialize_raster(h, w)
    idx = np.arange(h // f) * f + f // 2
    want = src[np.ix_(idx, idx)]
    assert np.array_equal(np.nan_to_num(got, nan=-1),
                          np.nan_to_num(want, nan=-1))


def test_resample_nearest_trims_edge_tiles(spark):
    """Non-multiple dims: edge output tiles must report true h/w (no
    phantom NaN padding past the raster extent)."""
    h, w, f = 1000, 900, 4     # out 250 x 225; tile_px 128 → edge tiles
    tiles = synthetic_tile_table(spark, tile_px=128, height=h, width=w)
    out = resample_tiles_nearest(tiles, factor=f, tile_px=128,
                                 height=h, width=w).toPandas()
    oh, ow = -(-h // f), -(-w // f)
    assert out["h"].sum() * 0 == 0  # frame shape sanity
    assert (out["row0"] + out["h"]).max() == oh
    assert (out["col0"] + out["w"]).max() == ow
    got = _assemble(out, oh, ow)
    src = materialize_raster(h, w)
    idx_r = np.minimum(np.arange(oh) * f + f // 2, h - 1)
    idx_c = np.minimum(np.arange(ow) * f + f // 2, w - 1)
    want = src[np.ix_(idx_r, idx_c)]
    assert np.array_equal(np.nan_to_num(got, nan=-1),
                          np.nan_to_num(want, nan=-1))


def test_resample_nearest_clamps_past_extent(spark):
    """ADVICE r2: when the sample center R*f + f//2 falls past the source
    extent (height % f in 1..f//2), nearest must clamp to the last source
    row/col (edge replication) — not emit a phantom all-NaN output row."""
    for h, w, f in ((401, 402, 4), (97, 99, 8), (101, 103, 2)):
        tiles = synthetic_tile_table(spark, tile_px=64, height=h, width=w)
        out = resample_tiles_nearest(tiles, factor=f, tile_px=64,
                                     height=h, width=w).toPandas()
        oh, ow = -(-h // f), -(-w // f)
        got = _assemble(out, oh, ow)
        src = materialize_raster(h, w)
        idx_r = np.minimum(np.arange(oh) * f + f // 2, h - 1)
        idx_c = np.minimum(np.arange(ow) * f + f // 2, w - 1)
        want = src[np.ix_(idx_r, idx_c)]
        assert np.array_equal(np.nan_to_num(got, nan=-1),
                              np.nan_to_num(want, nan=-1)), (h, w, f)


def test_resample_bilinear_matches_numpy(spark):
    h, w, f = 1000, 900, 4
    tiles = synthetic_tile_table(spark, tile_px=128, height=h, width=w)
    out = resample_tiles_bilinear(tiles, factor=f, tile_px=128,
                                  height=h, width=w).toPandas()
    oh, ow = -(-h // f), -(-w // f)
    got = _assemble(out, oh, ow)
    src = materialize_raster(h, w)
    want = bilinear_gather_np(src, 0, 0, 0, 0, oh, ow, f, h, w)
    assert np.array_equal(np.nan_to_num(got, nan=-1),
                          np.nan_to_num(want, nan=-1))


def test_resample_lanczos_matches_numpy(spark):
    """Lanczos-3 distributed == numpy oracle on a dense (no-nodata)
    raster; also sanity: constant raster resamples to the constant
    (normalized kernel)."""
    from air_health_gis_tools_spark.operators.warp import (
        lanczos_gather_np, resample_tiles_lanczos)
    from air_health_gis_tools_spark.sources.raster import \
        tile_table_from_array
    rng = np.random.default_rng(13)
    h, w, f = 500, 460, 4
    src = rng.uniform(0.0, 100.0, (h, w))
    tiles = tile_table_from_array(spark, src, tile_px=64)
    out = resample_tiles_lanczos(tiles, factor=f, tile_px=64,
                                 height=h, width=w).toPandas()
    oh, ow = -(-h // f), -(-w // f)
    got = _assemble(out, oh, ow)
    want = lanczos_gather_np(src, 0, 0, 0, 0, oh, ow, f, h, w)
    assert np.allclose(got, want, rtol=1e-12, atol=1e-12, equal_nan=True)
    # constant-preservation (kernel rows normalized)
    const = np.full((256, 256), 7.25)
    tiles_c = tile_table_from_array(spark, const, tile_px=64)
    out_c = resample_tiles_lanczos(tiles_c, factor=2, tile_px=64,
                                   height=256, width=256).toPandas()
    got_c = _assemble(out_c, 128, 128)
    assert np.allclose(got_c, 7.25, rtol=1e-12)


def test_bilinear_exact_on_multiple_of_factor_grid(spark):
    """With f=1 bilinear must be the identity (weights collapse to the
    exact source pixel)."""
    h = w = 256
    tiles = synthetic_tile_table(spark, tile_px=128, height=h, width=w)
    out = resample_tiles_bilinear(tiles, factor=1, tile_px=128,
                                  height=h, width=w).toPandas()
    got = _assemble(out, h, w)
    src = materialize_raster(h, w)
    assert np.array_equal(np.nan_to_num(got, nan=-1),
                          np.nan_to_num(src, nan=-1))
