"""Z-order (Morton) spatial layout — data clustering for 100 TB scans.

Interleaving the bits of the two cell coordinates gives a 1-D sort key
under which spatially-near rows land in the same parquet files/partitions,
so a bbox predicate prunes most of the table (the technique behind
Delta/Iceberg ``ZORDER BY``). The spread is the classic magic-number bit
dilation (public domain, e.g. "Bit Twiddling Hacks"):

    x = (x | x<<8) & 0x00FF00FF
    x = (x | x<<4) & 0x0F0F0F0F
    x = (x | x<<2) & 0x33333333
    x = (x | x<<1) & 0x55555555
    morton = spread(cx) | spread(cy) << 1          (16-bit coords → 32-bit)

Pure integer arithmetic ⇒ emitted as dialect-shared SQL (whole-stage
codegen on Spark; the DuckDB oracle evaluates the identical expression).
Quadtree containment falls out for free: two cells share their first
``d`` quadtree levels iff their mortons agree on the top ``2d`` bits —
tested in tests/test_zorder.py, along with partition pruning through a
``morton >> k`` directory layout.
"""

from __future__ import annotations


def _shl(e: str, n: int, dialect: str) -> str:
    if dialect == "spark":
        return f"shiftleft({e}, {n})"
    return f"({e} << {n})"


def spread_bits_sql(e: str, dialect: str) -> str:
    """Dilate a 16-bit value so its bits occupy even positions of 32."""
    masks = ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
             (2, 0x33333333), (1, 0x55555555))
    out = f"({e})"
    for sh, m in masks:
        out = f"(({out} | {_shl(out, sh, dialect)}) & {m})"
    return out


def morton_sql(cx: str, cy: str, dialect: str) -> str:
    """Interleaved Morton code of two 16-bit cell coordinates."""
    sx = spread_bits_sql(cx, dialect)
    sy = spread_bits_sql(cy, dialect)
    return f"CAST(({sx} | {_shl(sy, 1, dialect)}) AS BIGINT)"
