"""F1 real CRS transform: EPSG:3577 Australian Albers (Snyder ellipsoidal
equal-area conic) — property-tested without pyproj."""

from __future__ import annotations

import numpy as np

from air_health_gis_tools_spark.functions.crs import (A, E2, LON0,
                                                      albers_forward,
                                                      albers_inverse)


def test_origin_maps_to_false_origin():
    x, y = albers_forward(np.array([0.0]), np.array([LON0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6


def test_central_meridian_has_zero_x_and_symmetry():
    lats = np.linspace(-44.0, -9.0, 30)
    x, y = albers_forward(lats, np.full_like(lats, LON0))
    assert np.abs(x).max() < 1e-6
    # east/west symmetry about the central meridian
    xe, ye = albers_forward(lats, np.full_like(lats, LON0 + 7.5))
    xw, yw = albers_forward(lats, np.full_like(lats, LON0 - 7.5))
    assert np.allclose(xe, -xw, atol=1e-6)
    assert np.allclose(ye, yw, atol=1e-6)


def test_roundtrip_identity_over_australia():
    rng = np.random.default_rng(11)
    lat = rng.uniform(-44.0, -9.0, 5000)
    lon = rng.uniform(96.0, 169.0, 5000)
    x, y = albers_forward(lat, lon)
    lat2, lon2 = albers_inverse(x, y)
    assert np.abs(lat2 - lat).max() < 1e-9
    assert np.abs(lon2 - lon).max() < 1e-9


def test_equal_area_jacobian_identity():
    """THE defining property: |∂(x,y)/∂(λ,φ)| must equal the ellipsoidal
    area element a²(1−e²)cosφ/(1−e²sin²φ)² everywhere — true iff the
    implemented formulas are a genuine ellipsoidal equal-area projection
    (catches any wrong constant, sign, or series)."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(-43.0, -10.0, 400)
    lon = rng.uniform(100.0, 165.0, 400)
    dd = 1e-6     # degrees
    x0, y0 = albers_forward(lat, lon)
    xlam, ylam = albers_forward(lat, lon + dd)
    xphi, yphi = albers_forward(lat + dd, lon)
    rad = np.deg2rad(dd)
    dxdl, dydl = (xlam - x0) / rad, (ylam - y0) / rad
    dxdp, dydp = (xphi - x0) / rad, (yphi - y0) / rad
    det = np.abs(dxdl * dydp - dydl * dxdp)
    s = np.sin(np.deg2rad(lat))
    want = A * A * (1 - E2) * np.cos(np.deg2rad(lat)) / (1 - E2 * s * s) ** 2
    assert np.allclose(det, want, rtol=5e-5)


def test_s2_cells_from_real_albers_coords():
    """F1→F12 chain: EPSG:3577 meters → Albers inverse → S2 cell ids.
    Nearby points share coarse cells; distant points do not."""
    from air_health_gis_tools_spark.functions.s2 import (planar_to_latlng,
                                                         s2_cell_np)
    x = np.array([1_540_000.0, 1_540_100.0, -1_200_000.0])
    y = np.array([-3_950_000.0, -3_950_100.0, -3_100_000.0])
    lat, lon = planar_to_latlng(x, y, mode="albers")
    coarse = s2_cell_np(lat, lon, level=8)
    fine = s2_cell_np(lat, lon, level=18)
    assert coarse[0] == coarse[1] != coarse[2]
    assert fine[0] != fine[1]


def test_raster_frame_lands_in_australia():
    """The reference raster's EPSG:3577 extent must invert to plausible
    Australian lat/lon (sanity binding between the GeoTIFF transform and
    the CRS math)."""
    xs = np.array([-1_500_000.0, 0.0, 1_500_000.0, 2_000_000.0])
    ys = np.array([-1_500_000.0, -3_000_000.0, -4_500_000.0, -2_500_000.0])
    lat, lon = albers_inverse(xs, ys)
    assert (lat > -50).all() and (lat < -5).all()
    assert (lon > 90).all() and (lon < 175).all()


def test_gda2020_datum_shift_structure():
    """GDA94->GDA2020 is ~1.8 m of NE plate motion over Australia (ICSM
    magnitude), an exact similarity (roundtrip identity), and scale-true
    to the published -0.01 ppm."""
    import numpy as np
    from air_health_gis_tools_spark.functions import crs
    lat = np.array([-10.0, -25.0, -37.0, -43.0])
    lon = np.array([115.0, 133.0, 145.0, 152.0])
    la2, lo2 = crs.gda94_to_gda2020(lat, lon)
    d = np.hypot((la2 - lat) * 111320.0,
                 (lo2 - lon) * 111320.0 * np.cos(np.radians(lat)))
    assert ((d > 1.2) & (d < 2.2)).all(), d
    assert (la2 > lat).all() and (lo2 > lon).all()   # north-east motion
    la3, lo3 = crs.gda2020_to_gda94(la2, lo2)
    assert np.abs(la3 - lat).max() < 1e-11
    assert np.abs(lo3 - lon).max() < 1e-11


def test_epsg9473_chain_roundtrip_and_magnitude():
    import numpy as np
    from air_health_gis_tools_spark.functions import crs
    rng = np.random.default_rng(5)
    lat = rng.uniform(-43.0, -11.0, 300)
    lon = rng.uniform(114.0, 153.0, 300)
    x94, y94 = crs.albers_forward(lat, lon)
    x20, y20 = crs.epsg3577_to_epsg9473(x94, y94)
    d = np.hypot(x20 - x94, y20 - y94)
    assert ((d > 1.2) & (d < 2.2)).all()
    xb, yb = crs.epsg9473_to_epsg3577(x20, y20)
    assert np.hypot(xb - x94, yb - y94).max() < 1e-6   # metres


def test_ecef_roundtrip():
    import numpy as np
    from air_health_gis_tools_spark.functions import crs
    rng = np.random.default_rng(6)
    lat = rng.uniform(-80.0, 80.0, 500)
    lon = rng.uniform(-179.0, 179.0, 500)
    la, lo = crs.ecef_to_geodetic(crs.geodetic_to_ecef(lat, lon))
    assert np.abs(la - lat).max() < 1e-11
    assert np.abs(lo - lon).max() < 1e-11
