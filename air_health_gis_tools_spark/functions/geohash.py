"""Geohash (Niemeyer 2008) — the public base-32 interleaved-bisection
geocode, vectorized. Fully spec-pinned (published test vectors in
tests/test_webtiles.py), so ids interoperate with every geohash library.

Encoding: alternately bisect the longitude [−180, 180] and latitude
[−90, 90] intervals; each bisection emits one bit (1 = upper half),
starting with longitude; 5 bits → one character of the alphabet
``0123456789bcdefghjkmnpqrstuvwxyz``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode_np(lat: np.ndarray, lng: np.ndarray,
                      precision: int = 9) -> np.ndarray:
    """Vectorized encode → array of strings. Interval bisection carried
    for all rows at once; one pass per bit."""
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    n = len(lat)
    lat_lo = np.full(n, -90.0)
    lat_hi = np.full(n, 90.0)
    lng_lo = np.full(n, -180.0)
    lng_hi = np.full(n, 180.0)
    nbits = precision * 5
    bits = np.zeros((n, nbits), dtype=np.int64)
    for i in range(nbits):
        if i % 2 == 0:                       # even bit: longitude
            mid = (lng_lo + lng_hi) / 2.0
            up = lng >= mid
            bits[:, i] = up
            lng_lo = np.where(up, mid, lng_lo)
            lng_hi = np.where(up, lng_hi, mid)
        else:                                # odd bit: latitude
            mid = (lat_lo + lat_hi) / 2.0
            up = lat >= mid
            bits[:, i] = up
            lat_lo = np.where(up, mid, lat_lo)
            lat_hi = np.where(up, lat_hi, mid)
    vals = bits.reshape(n, precision, 5)
    idx = (vals * np.array([16, 8, 4, 2, 1])[None, None, :]).sum(axis=2)
    lut = np.array(list(BASE32))
    return np.array(["".join(row) for row in lut[idx]])


def geohash_decode_bbox(gh: str) -> tuple[float, float, float, float]:
    """(lat_lo, lat_hi, lng_lo, lng_hi) of a geohash cell."""
    lat_lo, lat_hi = -90.0, 90.0
    lng_lo, lng_hi = -180.0, 180.0
    even = True
    for ch in gh:
        v = BASE32.index(ch)
        for b in (16, 8, 4, 2, 1):
            if even:
                mid = (lng_lo + lng_hi) / 2.0
                if v & b:
                    lng_lo = mid
                else:
                    lng_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2.0
                if v & b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lng_lo, lng_hi


def geohash_udf(precision: int = 9):
    @F.pandas_udf(T.StringType())
    def _udf(lat: pd.Series, lng: pd.Series) -> pd.Series:
        return pd.Series(geohash_encode_np(lat.to_numpy(), lng.to_numpy(),
                                           precision))
    return _udf
