"""Raster overview pyramid — the reference ships one (.ovr beside the
apg18e GeoTIFF); this builds the same thing distributed.

``build_overview`` produces one overview level as a tile table (nearest,
GDAL's corner convention: overview pixel (R, C) = source (R·f, C·f) — the
reference's own .ovr matches ``full[0::2, 0::2]`` at > 98 % of pixels, the
residual being GDAL's handling of mixed-validity blocks; see
tests/test_pyramid.py where the DISTRIBUTED level-1 is compared against
the reference's committed .ovr file directly). ``build_pyramid`` chains
levels (each level downsamples the previous — factor 2 per level, the
standard power-of-2 pyramid), so level L costs one narrow shuffle of
level L−1's tiles, and the whole pyramid is ~1/3 extra storage
(Σ 4^-L).

Pyramids are what make web-tile serving and coarse-first analytics cheap
at 100 TB: a zoomed-out query reads the overview, not the base raster.
The level tables write straight back through ``write_geotiff`` (S-sink) —
round-trip asserted bit-exact in tests.

Reference parity: data/apg18e_1_0_0_20210512.tif.ovr (GDAL-generated
overview the reference's rasterio opens transparently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .warp import resample_tiles_nearest


def build_overview(tiles: DataFrame, tile_px: int, height: int, width: int,
                   factor: int = 2) -> DataFrame:
    """One overview level (nearest, corner convention) as a tile table."""
    return resample_tiles_nearest(tiles, factor, tile_px,
                                  height=height, width=width,
                                  sample_offset=0)


def build_pyramid(tiles: DataFrame, tile_px: int, height: int, width: int,
                  levels: int = 3) -> list[tuple[DataFrame, int, int]]:
    """Chain of overview levels: [(tiles_L, height_L, width_L)] for
    L = 1..levels, each level a 2× nearest downsample of the previous."""
    out = []
    cur, h, w = tiles, height, width
    for _ in range(levels):
        nh, nw = -(-h // 2), -(-w // 2)
        cur = build_overview(cur, tile_px, h, w, factor=2)
        out.append((cur, nh, nw))
        h, w = nh, nw
    return out
