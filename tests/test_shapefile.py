"""S5 shapefile point scan: spec-conformant writer ↔ reader round-trip,
cross-checked against the .rds grids (same points, different container)."""

from __future__ import annotations

import numpy as np

from air_health_gis_tools_spark.sources.rds import rds_to_pandas
from air_health_gis_tools_spark.sources.shapefile import (
    read_dbf, read_shp_points, read_shp_points_spark, write_shp_points)


def test_roundtrip_random_points(tmp_path):
    rng = np.random.default_rng(23)
    xs = rng.uniform(-2e6, 2e6, 500)
    ys = rng.uniform(-5e6, -1e6, 500)
    p = str(tmp_path / "pts.shp")
    write_shp_points(p, xs, ys, fids=range(10, 510))
    df = read_shp_points(p)
    assert np.array_equal(df["X"].to_numpy(), xs)      # doubles bit-exact
    assert np.array_equal(df["Y"].to_numpy(), ys)
    assert df["FID"].tolist() == list(range(10, 510))


def test_rds_grid_through_shapefile_container(tmp_path):
    """The reference's testing_points grid exported to .shp and re-read:
    the two containers must agree bit-for-bit on coordinates."""
    src = rds_to_pandas("/root/reference/data/grids/testing_points.rds")
    p = str(tmp_path / "grid.shp")
    write_shp_points(p, src["X"], src["Y"], fids=src["FID"])
    back = read_shp_points(p)
    assert np.array_equal(back["X"].to_numpy(), src["X"].to_numpy())
    assert np.array_equal(back["Y"].to_numpy(), src["Y"].to_numpy())
    assert np.array_equal(back["FID"].to_numpy(), src["FID"].to_numpy())
    dbf = read_dbf(str(tmp_path / "grid.dbf"))
    assert len(dbf) == len(src)


def test_spark_scan(spark, tmp_path):
    p = str(tmp_path / "s.shp")
    write_shp_points(p, [1.5, 2.5], [-3.0, -4.0], fids=[7, 8])
    df = read_shp_points_spark(spark, p)
    assert df.count() == 2
    assert set(df.columns) == {"X", "Y", "FID"}
