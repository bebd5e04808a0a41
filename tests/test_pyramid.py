"""Overview pyramid (operators/pyramid.py): the distributed level-1 vs
the reference's OWN committed .ovr, exact nearest semantics, pyramid
chaining, and the GeoTIFF sink round-trip of an overview level."""

from __future__ import annotations

import os

import numpy as np
import pytest

from air_health_gis_tools_spark.operators.pyramid import (build_overview,
                                                          build_pyramid)
from air_health_gis_tools_spark.sources.raster import (tile_table_from_array,
                                                       tile_table_to_array)

TIF = "/root/reference/data/apg18e_1_0_0_20210512.tif"
OVR = TIF + ".ovr"

needs_fixture = pytest.mark.skipif(not os.path.exists(OVR),
                                   reason="reference fixture absent")


@needs_fixture
def test_distributed_overview_matches_reference_ovr(spark):
    """Level-1 built DISTRIBUTED from the base tiles agrees with the
    reference's GDAL-generated .ovr file at > 98 % of pixels (same bar as
    the decode cross-validation; the residual is GDAL's own handling of
    mixed-validity blocks) and EXACTLY equals the corner-convention
    subsample of the full-resolution decode."""
    from air_health_gis_tools_spark.sources.geotiff import (
        geotiff_tile_table, read_geotiff, read_ifd)
    info = read_ifd(TIF)
    tiles = geotiff_tile_table(spark, TIF)
    lvl1 = build_overview(tiles, info.tile_w, info.height, info.width)
    got = tile_table_to_array(lvl1)

    full, _ = read_geotiff(TIF)
    exact = full[0::2, 0::2]
    assert got.shape == exact.shape
    a = np.nan_to_num(got, nan=-1.0)
    assert (a == np.nan_to_num(exact, nan=-1.0)).all()

    ovr, _ = read_geotiff(OVR)
    b = np.nan_to_num(ovr[:got.shape[0], :got.shape[1]], nan=-1.0)
    assert (a == b).mean() > 0.98


def test_pyramid_levels_exact_on_synthetic(spark):
    rng = np.random.default_rng(9)
    base = rng.integers(0, 1000, (333, 517)).astype(float)
    base[rng.random(base.shape) < 0.1] = np.nan
    tiles = tile_table_from_array(spark, base, tile_px=64)
    pyr = build_pyramid(tiles, 64, 333, 517, levels=3)
    for lvl, (t, h, w) in enumerate(pyr, start=1):
        got = tile_table_to_array(t)
        exp = base[0::2 ** lvl, 0::2 ** lvl]
        assert (h, w) == exp.shape == got.shape
        assert np.array_equal(got, exp, equal_nan=True)


def test_overview_geotiff_sink_roundtrip(spark, tmp_path):
    """An overview level writes through the GeoTIFF sink and reads back
    bit-exact — the .ovr-file production path."""
    from air_health_gis_tools_spark.sources.geotiff import (read_geotiff,
                                                            write_geotiff)
    rng = np.random.default_rng(10)
    base = rng.integers(0, 100, (200, 300)).astype(float)
    tiles = tile_table_from_array(spark, base, tile_px=64)
    lvl1, h, w = build_pyramid(tiles, 64, 200, 300, levels=1)[0]
    path = str(tmp_path / "ovr.tif")
    write_geotiff(lvl1, path, h, w, tile_px=64)
    back, info = read_geotiff(path)
    assert (info.height, info.width) == (h, w)
    assert np.array_equal(back, base[0::2, 0::2], equal_nan=True)
