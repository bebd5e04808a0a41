"""S5 realism: ESRI shapefile POINT reader/writer (pure Python).

The reference loads point grids with ``gpd.read_file('AUS_points_5km.shp')``
(Examples/ExamplesOriginal/1 - Population Density.py:23). No geopandas/
fiona here, so this implements the public ESRI Shapefile Technical
Description (July 1998) for shape type 1 (Point) plus the dBASE III .dbf
attribute table — enough to round-trip the reference's point-grid shape
(FID + X/Y) through the engine. The writer exists so tests can fabricate
spec-conformant fixtures and prove the reader against them (and against
the .rds grids via coordinate equality).
"""

from __future__ import annotations

import os
import struct

import pandas as pd
from pyspark.sql import DataFrame, SparkSession


def read_shp_points(path: str) -> pd.DataFrame:
    """.shp (+ sibling .dbf if present) → DataFrame with X, Y (+ attrs)."""
    d = open(path, "rb").read()
    code, = struct.unpack(">i", d[:4])
    if code != 9994:
        raise ValueError("not a shapefile (bad file code)")
    file_len_words, = struct.unpack(">i", d[24:28])
    shape_type, = struct.unpack("<i", d[32:36])
    if shape_type not in (1, 11, 21):       # Point / PointZ / PointM
        raise ValueError(f"only point shapefiles supported, got "
                         f"type {shape_type}")
    xs, ys, recnos = [], [], []
    pos = 100
    end = file_len_words * 2
    while pos < end:
        recno, content_words = struct.unpack(">ii", d[pos:pos + 8])
        st, = struct.unpack("<i", d[pos + 8:pos + 12])
        if st == shape_type:
            x, y = struct.unpack("<2d", d[pos + 12:pos + 28])
            recnos.append(recno)
            xs.append(x)
            ys.append(y)
        pos += 8 + content_words * 2
    out = pd.DataFrame({"X": xs, "Y": ys})
    dbf = os.path.splitext(path)[0] + ".dbf"
    if os.path.exists(dbf):
        attrs = read_dbf(dbf)
        if len(attrs) == len(out):
            for c in attrs.columns:
                out[c] = attrs[c].to_numpy()
    return out


def read_dbf(path: str) -> pd.DataFrame:
    """dBASE III attribute table: numeric (N/F) and character (C) fields."""
    d = open(path, "rb").read()
    n_rec, = struct.unpack("<I", d[4:8])
    hdr_len, rec_len = struct.unpack("<HH", d[8:12])
    fields = []
    pos = 32
    while d[pos] != 0x0D:
        name = d[pos:pos + 11].split(b"\x00")[0].decode("ascii")
        ftype = chr(d[pos + 11])
        flen = d[pos + 16]
        fields.append((name, ftype, flen))
        pos += 32
    cols: dict[str, list] = {f[0]: [] for f in fields}
    for i in range(n_rec):
        rp = hdr_len + i * rec_len + 1          # +1 deletion flag
        for name, ftype, flen in fields:
            raw = d[rp:rp + flen].decode("ascii", "replace").strip()
            rp += flen
            if ftype in ("N", "F"):
                if raw == "":
                    cols[name].append(None)
                elif "." in raw:
                    cols[name].append(float(raw))
                else:
                    cols[name].append(int(raw))
            else:
                cols[name].append(raw)
    return pd.DataFrame(cols)


def write_shp_points(path: str, xs, ys, fids=None) -> None:
    """Spec-conformant Point shapefile (+ .shx, + .dbf with FID column)."""
    n = len(xs)
    xs = [float(v) for v in xs]
    ys = [float(v) for v in ys]
    rec = b"".join(
        struct.pack(">ii", i + 1, 10) + struct.pack("<i2d", 1, x, y)
        for i, (x, y) in enumerate(zip(xs, ys)))
    bbox = (min(xs), min(ys), max(xs), max(ys)) if n else (0, 0, 0, 0)
    header = (struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0,
                          (100 + len(rec)) // 2)
              + struct.pack("<ii", 1000, 1)
              + struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0))
    with open(path, "wb") as f:
        f.write(header + rec)
    # .shx index
    shx_rec = b"".join(struct.pack(">ii", (100 + i * 28) // 2, 10)
                       for i in range(n))
    shx_hdr = (struct.pack(">i5ii", 9994, 0, 0, 0, 0, 0,
                           (100 + len(shx_rec)) // 2)
               + struct.pack("<ii", 1000, 1)
               + struct.pack("<4d", *bbox) + struct.pack("<4d", 0, 0, 0, 0))
    with open(os.path.splitext(path)[0] + ".shx", "wb") as f:
        f.write(shx_hdr + shx_rec)
    # .dbf with one numeric FID column
    if fids is None:
        fids = range(n)
    field = (b"FID".ljust(11, b"\x00") + b"N" + b"\x00" * 4
             + bytes([18, 0]) + b"\x00" * 14)
    hdr_len = 32 + 32 + 1
    rec_len = 1 + 18
    dbf_hdr = (bytes([3, 124, 1, 1]) + struct.pack("<I", n)
               + struct.pack("<HH", hdr_len, rec_len) + b"\x00" * 20
               + field + b"\x0d")
    body = b"".join(b" " + str(int(fid)).rjust(18).encode()
                    for fid in fids)
    with open(os.path.splitext(path)[0] + ".dbf", "wb") as f:
        f.write(dbf_hdr + body + b"\x1a")


def read_shp_points_spark(spark: SparkSession, path: str) -> DataFrame:
    return spark.createDataFrame(read_shp_points(path))
