"""Web tile indexes: published test vectors (real interop, unlike the
engine-canonical lattices), plus q60/q61/q62 cross-engine parity."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from air_health_gis_tools_spark.functions.geohash import (
    geohash_decode_bbox, geohash_encode_np)

# Published vectors: Wikipedia "Geohash" worked example and the
# geohash.org reference pair.
GEOHASH_VECTORS = [
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (42.605, -5.603, 5, "ezs42"),
]


@pytest.mark.parametrize("lat,lng,prec,expect", GEOHASH_VECTORS)
def test_geohash_published_vectors(lat, lng, prec, expect):
    got = geohash_encode_np(np.array([lat]), np.array([lng]), prec)[0]
    assert got == expect


def test_geohash_decode_roundtrip():
    rng = np.random.default_rng(3)
    lat = rng.uniform(-89, 89, 200)
    lng = rng.uniform(-179, 179, 200)
    ghs = geohash_encode_np(lat, lng, 9)
    for a, b, g in zip(lat, lng, ghs):
        lo1, hi1, lo2, hi2 = geohash_decode_bbox(g)
        assert lo1 <= a <= hi1 and lo2 <= b <= hi2
        # prefix property: shorter geohash is a cell containing the point
        lo1, hi1, lo2, hi2 = geohash_decode_bbox(g[:4])
        assert lo1 <= a <= hi1 and lo2 <= b <= hi2


def test_slippy_formula_anchors_and_reference_impl(spark):
    """Anchors derivable by hand from the published formula (equator →
    ytile 2^(z−1); antimeridian → xtile 0) + agreement with the OSM
    wiki's reference Python implementation over a point sweep."""
    import math

    from air_health_gis_tools_spark.functions.webtiles import tile_xy_sql

    def ref(lat_deg, lon_deg, zoom):     # OSM wiki deg2num, verbatim
        lat_rad = math.radians(lat_deg)
        n = 1 << zoom
        xtile = int((lon_deg + 180.0) / 360.0 * n)
        ytile = int((1.0 - math.asinh(math.tan(lat_rad)) / math.pi)
                    / 2.0 * n)
        return xtile, ytile

    cases = [(0.0, 0.0, 1), (0.0, -180.0, 3), (51.5, -0.1, 17),
             (-33.86, 151.2, 12), (84.9, 179.9, 8), (-84.9, -179.9, 8)]
    rows = []
    for lat, lng, z in cases:
        xt, yt = tile_xy_sql(str(lat), str(lng), z, "spark")
        rows.append(spark.range(1).selectExpr(
            f"{xt} AS x", f"{yt} AS y").head())
    assert (rows[0]["x"], rows[0]["y"]) == (1, 1)       # equator/prime
    assert rows[1]["x"] == 0                            # antimeridian
    for (lat, lng, z), r in zip(cases, rows):
        assert (r["x"], r["y"]) == ref(lat, lng, z), (lat, lng, z)


def test_quadkey_published_vector(spark):
    """Bing Maps Tile System doc: tile (3, 5) at level 3 → quadkey '213'."""
    from air_health_gis_tools_spark.functions.webtiles import quadkey_sql
    qk = quadkey_sql("CAST(3 AS BIGINT)", "CAST(5 AS BIGINT)", 3, "spark")
    assert spark.range(1).selectExpr(f"{qk} AS q").head()["q"] == "213"


def _duck(sf):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    return con


@pytest.mark.parametrize("qname", ["q60_web_tiles", "q62_bm25_topk"])
def test_sql_parity(spark, qname):
    from air_health_gis_tools_spark.plans import queries as Q
    sf = "/root/testdata/sf0.001"
    s = (Q.QUERIES[qname](spark, sf).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    o = (_duck(sf).execute(Q.ORACLES[qname]).df()
         .sort_values("doc_id").reset_index(drop=True))
    assert len(s) == len(o)
    for c in s.columns:
        a, b = s[c], o[c]
        if a.dtype == np.float64:
            assert (a.to_numpy() == b.to_numpy()).all(), c  # bit parity
        else:
            assert (a == b).all(), c


def test_geohash_golden_parity(spark):
    from air_health_gis_tools_spark.plans import queries as Q
    import pandas as pd
    import os
    sf = "/root/testdata/sf0.01"
    s = (Q.QUERIES["q61_geohash_cells"](spark, sf).toPandas()
         .sort_values("doc_id").reset_index(drop=True))
    g = pd.read_parquet(os.path.join(Q.GOLDEN_DIR,
                                     "q61_geohash_cells.parquet")) \
        .sort_values("doc_id").reset_index(drop=True)
    assert (s["gh9"] == g["gh9"]).all() and (s["gh5"] == g["gh5"]).all()
    assert (s["is_prefix"] == 1).all()
