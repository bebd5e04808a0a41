"""Web-map tile indexes from the published formulas — real interop ids.

Unlike the engine-canonical hex lattice (and the orientation-seamed H3),
these indexes are fully pinned by public spec, so the ids interoperate
with any mapping stack:

- slippy tiles (OSM wiki "Slippy map tilenames"):
    xtile = floor((lng + 180) / 360 · 2^z)
    ytile = floor((1 − ln(tan φ + sec φ)/π) / 2 · 2^z)
- Bing quadkey (Schwartz, "Bing Maps Tile System"): base-4 string, digit
  i = bit i of xtile + 2·bit i of ytile, most-significant first.

Both are closed-form arithmetic ⇒ emitted as dialect-parameterized SQL
(pure Catalyst on Spark, the identical expression on the DuckDB oracle).
Geohash (the third public index) needs iterative bisection → it lives in
``functions/geohash.py`` as an Arrow kernel with published test vectors.
"""

from __future__ import annotations


def _shr(e: str, n: int, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftright({e}, {n})"
    return f"({e} >> {n})"


def tile_xy_sql(lat: str, lng: str, z: int, dialect: str
                ) -> tuple[str, str]:
    """(xtile, ytile) expressions at zoom ``z`` for lat/lng expressions.
    Clamped to [0, 2^z − 1] (the spec's pole/antimeridian behavior)."""
    n = 1 << z
    xt = (f"CAST(least(greatest(floor((({lng}) + 180.0) / 360.0 * {n}), "
          f"0), {n - 1}) AS BIGINT)")
    merc = (f"(1.0 - ln(tan(radians({lat})) + 1.0 / cos(radians({lat})))"
            f" / pi()) / 2.0")
    yt = (f"CAST(least(greatest(floor({merc} * {n}), 0), {n - 1}) "
          f"AS BIGINT)")
    return xt, yt


def quadkey_sql(xtile: str, ytile: str, z: int, dialect: str) -> str:
    """Base-4 quadkey string of a (xtile, ytile, z) triple."""
    digits = []
    for i in range(z, 0, -1):
        xb = f"({_shr(xtile, i - 1, dialect)} & 1)"
        yb = f"({_shr(ytile, i - 1, dialect)} & 1)"
        digits.append(f"CAST({xb} + 2 * {yb} AS STRING)"
                      if dialect == "spark"
                      else f"CAST({xb} + 2 * {yb} AS VARCHAR)")
    return "concat(" + ", ".join(digits) + ")"
