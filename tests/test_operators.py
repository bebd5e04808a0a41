"""Cross-strategy equivalence tests: every operator's scale-path physical
strategy must produce bit-identical results to its oracle-verified default
(SURVEY.md §5 items 2 and 4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from air_health_gis_tools_spark import geo_synth as G
from air_health_gis_tools_spark.functions.cells import hex_assign_np
from air_health_gis_tools_spark.functions.geocode import with_xy
from air_health_gis_tools_spark.operators.knn import (knn_broadcast_np,
                                                      knn_cell_join,
                                                      knn_ring_np)
from air_health_gis_tools_spark.operators.pip import (pip_polygon_counts,
                                                      points_in_polygon_np)
from air_health_gis_tools_spark.operators.zonal import (buffered_stats,
                                                        buffered_stats_tiled)
from air_health_gis_tools_spark.sources.raster import synthetic_tile_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def pts(spark):
    df = with_xy(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    return df.select("doc_id", "x", "y").cache()


def _sorted_pdf(df):
    pdf = df.toPandas()
    return pdf.sort_values("doc_id").reset_index(drop=True)


def test_tiled_zonal_equals_formula_kernel(spark, pts):
    """Scale path (tile table + cogroup partial/final agg) == broadcast/
    formula kernel, bit for bit."""
    tiles = synthetic_tile_table(spark, tile_px=256)
    a = _sorted_pdf(buffered_stats_tiled(pts, tiles, list(G.BUFFERS_M), 256))
    b = _sorted_pdf(buffered_stats(pts, list(G.BUFFERS_M))
                    .select(a.columns.tolist()))
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.array_equal(np.nan_to_num(av, nan=-1.0),
                                  np.nan_to_num(bv, nan=-1.0)), c
        else:
            assert np.array_equal(av, bv), c


def test_tiled_zonal_salting_is_transparent(spark, pts):
    """Force the hot-tile path (tiny hot_group_rows → every tile salted,
    several salt groups each): outputs must be bit-identical — salting only
    regroups (point, tile) partials, it never splits one."""
    tiles = synthetic_tile_table(spark, tile_px=256)
    a = _sorted_pdf(buffered_stats_tiled(pts, tiles, list(G.BUFFERS_M), 256,
                                         hot_group_rows=8, max_salt=4))
    b = _sorted_pdf(buffered_stats_tiled(pts, tiles, list(G.BUFFERS_M), 256))
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f":
            assert np.array_equal(np.nan_to_num(av, nan=-1.0),
                                  np.nan_to_num(bv, nan=-1.0)), c
        else:
            assert np.array_equal(av, bv), c


def test_tiled_zonal_keeps_points_outside_coverage(spark, pts):
    """A point whose buffers fall entirely on missing tiles (out-of-coverage
    raster) must still appear in the output with n_valid = 0 and NULL stats
    — row-count parity with the broadcast-kernel strategy."""
    tiles = synthetic_tile_table(spark, tile_px=256)
    # drop the tiles under the first point's neighborhood
    one = pts.orderBy("doc_id").limit(1).collect()[0]
    tr = (one["y"] // G.XRES) // 256
    tc = (one["x"] // G.XRES) // 256
    drop = [int((tr + i) * (1 << 32) + (tc + j))
            for i in (-1, 0, 1) for j in (-1, 0, 1)]
    holey = tiles.filter(~F.col("tile_id").isin(drop))
    out = _sorted_pdf(
        buffered_stats_tiled(pts, holey, list(G.BUFFERS_M), 256))
    assert len(out) == pts.count(), "every point keeps a row"
    row = out[out["doc_id"] == one["doc_id"]].iloc[0]
    assert row["n_valid_10000"] == 0 or np.isfinite(row["mean_10000"])


def test_knn_three_strategies_agree(spark, pts):
    ids = np.arange(G.N_MONITORS, dtype=np.int64)
    mx, my = G.monitor_xy_np(ids)
    from air_health_gis_tools_spark.plans.queries import monitors_df
    a = _sorted_pdf(knn_cell_join(pts, monitors_df(spark), G.KNN_BOUND_M)
                    .select("doc_id", "monitor_id", "dist_m"))
    b = _sorted_pdf(knn_broadcast_np(pts, (mx, my, ids), G.KNN_BOUND_M)
                    .select("doc_id", "monitor_id", "dist_m"))
    c = _sorted_pdf(knn_ring_np(pts, (mx, my, ids), G.KNN_BOUND_M)
                    .select("doc_id", "monitor_id", "dist_m"))
    for other, name in ((b, "broadcast"), (c, "ring")):
        pd.testing.assert_frame_equal(a, other, check_dtype=False,
                                      obj=f"cell_join vs {name}")


def test_radius_kernel_equals_cell_join(spark, pts):
    from air_health_gis_tools_spark.operators.pip import (radius_count,
                                                          radius_count_np)
    from air_health_gis_tools_spark.plans.queries import monitors_df
    ids = np.arange(G.N_MONITORS, dtype=np.int64)
    mx, my = G.monitor_xy_np(ids)
    a = _sorted_pdf(radius_count(pts, monitors_df(spark), 25_000))
    b = _sorted_pdf(radius_count_np(pts, (mx, my), 25_000))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_knn_auto_picks_kernel_and_matches(spark, pts):
    from air_health_gis_tools_spark.operators.knn import knn_auto
    from air_health_gis_tools_spark.plans.queries import monitors_df
    a = _sorted_pdf(knn_auto(pts, monitors_df(spark), G.KNN_BOUND_M)
                    .select("doc_id", "monitor_id", "dist_m"))
    b = _sorted_pdf(knn_cell_join(pts, monitors_df(spark), G.KNN_BOUND_M)
                    .select("doc_id", "monitor_id", "dist_m"))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_knn_ring_expands_past_first_hit():
    """A nearer monitor in ring k+1 must beat a ring-k hit (SURVEY §7.4.6)."""
    # point near the right edge of its cell; monitor A in same cell but far
    # left; monitor B in next cell, just across the boundary (closer).
    cell = 50_000
    px, py = 2 * cell - 10, cell // 2          # 10 m left of cell border
    ax, ay = cell + 5, cell // 2               # same cell, ~49 995 m away
    bx, by = 2 * cell + 500, cell // 2         # next cell, 510 m away
    import pandas as pdl
    from air_health_gis_tools_spark.session import get_spark
    spark = get_spark("ring-test", cpus=2)
    pdf = spark.createDataFrame(pdl.DataFrame(
        {"doc_id": [1], "x": [px], "y": [py]}))
    out = knn_ring_np(pdf, (np.array([ax, bx]), np.array([ay, by]),
                            np.array([10, 20])), bound_m=cell,
                      cell_m=cell).toPandas()
    assert out["monitor_id"].iloc[0] == 20
    assert out["dist_m"].iloc[0] == pytest.approx(510.0)


def _octagon(cx, cy, r):
    ang = np.arange(8) * (2 * np.pi / 8)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


def test_ray_casting_matches_scalar_reference():
    rng = np.random.default_rng(7)
    poly = _octagon(0.0, 0.0, 10.0)
    px = rng.uniform(-15, 15, 500)
    py = rng.uniform(-15, 15, 500)
    got = points_in_polygon_np(px, py, poly[:, 0], poly[:, 1])

    def scalar_pip(x, y):  # classic crossing-number reference
        inside = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > y) != (y2 > y):
                xi = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
                if x < xi:
                    inside = not inside
        return inside

    want = np.array([scalar_pip(x, y) for x, y in zip(px, py)])
    assert np.array_equal(got, want)


def test_pip_polygon_counts_vs_bruteforce(spark, pts):
    ids = np.arange(10, dtype=np.int64)
    cx, cy, r = G.poly_circle_np(ids)
    polys = {int(i): _octagon(float(cx[i]), float(cy[i]), float(r[i]))
             for i in ids}
    got = pip_polygon_counts(pts, polys).toPandas() \
        .set_index("poly_id")["n_points"].to_dict()
    pdf = pts.toPandas()
    for i in ids:
        v = polys[int(i)]
        want = int(points_in_polygon_np(
            pdf["x"].to_numpy(), pdf["y"].to_numpy(),
            v[:, 0], v[:, 1]).sum())
        assert got.get(int(i), 0) == want, f"poly {i}"


def test_hex_expr_equals_kernel(spark, pts):
    """The Catalyst-expression hex assignment (whole-stage codegen, the
    100 TB path) must equal the Arrow kernel bit-for-bit at every res."""
    from pyspark.sql import functions as F2
    from air_health_gis_tools_spark.functions.cells import (hex_cell_expr,
                                                            hex_cell_udf)
    for res in (7, 8, 9):
        bad = (pts.withColumn("a", hex_cell_udf(res)(F2.col("x"),
                                                     F2.col("y")))
               .withColumn("b", hex_cell_expr(res))
               .filter(F2.col("a") != F2.col("b")).count())
        assert bad == 0, res


def test_hex_expr_equals_kernel_negative_coords(spark):
    """ADVICE r2: Spark DIV truncates toward zero while the Arrow kernel
    floors — the expression must floor too, so negative-quadrant frames
    (a reprojected CRS can go negative) agree bit-for-bit."""
    from pyspark.sql import functions as F2
    from air_health_gis_tools_spark.functions.cells import (hex_cell_expr,
                                                            hex_cell_udf)
    rng = np.random.default_rng(11)
    rows = [(int(a), int(b)) for a, b in zip(
        rng.integers(-500_000, 500_000, 2000),
        rng.integers(-500_000, 500_000, 2000))]
    df = spark.createDataFrame(rows, "x long, y long")
    for res in (7, 8, 9):
        bad = (df.withColumn("a", hex_cell_udf(res)(F2.col("x"),
                                                    F2.col("y")))
               .withColumn("b", hex_cell_expr(res))
               .filter(F2.col("a") != F2.col("b")).count())
        assert bad == 0, res


def test_hex_assignment_is_true_nearest_center():
    """Voronoi property: the chosen center is the argmin over a wide brute-
    force neighborhood (not just the 16-candidate window)."""
    rng = np.random.default_rng(3)
    x = rng.integers(50_000, 200_000, 300).astype(np.int64)
    y = rng.integers(50_000, 200_000, 300).astype(np.int64)
    for res, (w, h) in G.HEX_PITCH.items():
        cell = hex_assign_np(x, y, res)
        i = (cell >> G.HEX_I_SHIFT) & ((1 << G.HEX_I_SHIFT) - 1)
        j = cell & ((1 << G.HEX_I_SHIFT) - 1)
        d_best = (x - i * w) ** 2 + (y - j * h) ** 2
        # brute force over a 9x9 center neighborhood
        i0 = x // w
        j0 = y // h
        best = np.full(len(x), np.iinfo(np.int64).max)
        for di in range(-4, 5):
            for dj in range(-4, 5):
                ii, jj = i0 + di, j0 + dj
                ok = (ii + jj) % 2 == 0
                d = (x - ii * w) ** 2 + (y - jj * h) ** 2
                best = np.where(ok & (d < best), d, best)
        assert np.array_equal(d_best, best), f"res {res}"


def test_zonal_deterministic_across_partitionings(spark, pts):
    outs = []
    for n in (1, 8):
        df = buffered_stats(pts.repartition(n), list(G.BUFFERS_M))
        outs.append(_sorted_pdf(df.select("doc_id", "mean_10000",
                                          "n_valid_10000")))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_pip_kernel_equals_join_strategy(spark, pts):
    """r3: the map-side-partial PIP kernel must return exactly the
    cell-explode join plan's counts (same integer predicate), including
    zero-filled empty polygons."""
    from air_health_gis_tools_spark.operators.pip import pip_circle_counts
    from air_health_gis_tools_spark.plans.queries import polys_df
    polys = polys_df(spark)
    a = {r["poly_id"]: r["n_points"] for r in
         pip_circle_counts(pts, polys, strategy="join").collect()}
    b = {r["poly_id"]: r["n_points"] for r in
         pip_circle_counts(pts, polys, strategy="kernel").collect()}
    c = {r["poly_id"]: r["n_points"] for r in
         pip_circle_counts(pts, polys).collect()}   # auto -> join
    assert a == b == c
    assert len(a) == polys.count()


def test_pip_kernel_refuses_large_dim(spark, pts):
    """VERDICT r3 #8: the CSR-grid kernel builds a driver-side structure
    over the polygon dim — a large dim must be refused explicitly, not
    accepted and OOMed."""
    import pytest
    from air_health_gis_tools_spark.operators.pip import \
        pip_circle_counts_np
    from air_health_gis_tools_spark.plans.queries import polys_df
    polys = polys_df(spark)
    with pytest.raises(ValueError, match="max_polys"):
        pip_circle_counts_np(pts, polys, max_polys=polys.count() - 1)


def test_convolve_plane_variant_matches_zonal_means(spark):
    """convolve_sum_count_tiles (the plane-materializing Method-1 half,
    used when the focal raster itself is the product) must agree with the
    broadcast zonal kernel at interior pixels: mean = s/c, count = c."""
    from air_health_gis_tools_spark.operators.convolve import (
        convolve_sum_count_tiles)
    from air_health_gis_tools_spark.operators.zonal import (circle_offsets,
                                                            radius_px)
    from air_health_gis_tools_spark.sources.raster import (
        materialize_raster, synthetic_tile_table)
    h = w = 512
    b = 10_000
    rpx = radius_px(b)
    tiles = synthetic_tile_table(spark, tile_px=128, height=h, width=w)
    rng = np.arange(-rpx, rpx + 1)
    kr, kc = np.meshgrid(rng, rng, indexing="ij")
    kern = (kr * kr + kc * kc <= rpx * rpx).astype(np.float64)
    conv = convolve_sum_count_tiles(tiles, {str(b): kern}, 128,
                                    height=h, width=w).toPandas()
    s_plane = np.full((h, w), np.nan)
    c_plane = np.zeros((h, w), dtype=np.int64)
    for t in conv.itertuples():
        s_plane[t.row0:t.row0 + t.h, t.col0:t.col0 + t.w] = \
            np.asarray(getattr(t, f"s_{b}")).reshape(t.h, t.w)
        c_plane[t.row0:t.row0 + t.h, t.col0:t.col0 + t.w] = \
            np.asarray(getattr(t, f"c_{b}")).reshape(t.h, t.w)
    src = materialize_raster(h, w)
    dr, dc = circle_offsets(rpx)
    rs = np.arange(rpx, h - rpx, 37)
    cs = np.arange(rpx, w - rpx, 41)
    rr, cc = np.meshgrid(rs, cs, indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    vals = src[rr[:, None] + dr[None, :], cc[:, None] + dc[None, :]]
    valid = ~np.isnan(vals)
    want_c = valid.sum(axis=1)
    want_s = np.where(valid, vals, 0.0).sum(axis=1)
    assert np.array_equal(c_plane[rr, cc], want_c)
    assert np.allclose(s_plane[rr, cc], want_s, rtol=0, atol=0)
