"""J8 warp/resample parity: distributed tile resample == numpy oracle."""

from __future__ import annotations

import numpy as np

from air_health_gis_tools_spark.operators.warp import resample_tiles_nearest
from air_health_gis_tools_spark.sources.raster import (materialize_raster,
                                                       synthetic_tile_table)


def test_resample_nearest_matches_numpy(spark):
    h = w = 1024
    f = 4
    tiles = synthetic_tile_table(spark, tile_px=128, height=h, width=w)
    out = resample_tiles_nearest(tiles, factor=f, tile_px=128).toPandas()
    got = np.full((h // f, w // f), np.nan)
    for t in out.itertuples():
        arr = np.asarray(t.data).reshape(t.h, t.w)
        got[t.row0:t.row0 + t.h, t.col0:t.col0 + t.w] = arr
    src = materialize_raster(h, w)
    idx = np.arange(h // f) * f + f // 2
    want = src[np.ix_(idx, idx)]
    assert np.array_equal(np.nan_to_num(got, nan=-1),
                          np.nan_to_num(want, nan=-1))
