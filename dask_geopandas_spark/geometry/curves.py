"""Space-filling-curve encoders: Hilbert, Morton (Z-order), Geohash.

Mirrors the reference's encoders (hilbert_distance.py, morton_distance.py,
geohash.py) which operate on *bounds midpoints* scaled into global total
bounds.  Implemented from the classic public-domain algorithms (Hilbert:
the iterative rotate/flip xy→d walk; Morton: magic-number bit spreading;
Geohash: standard base-32 bisection), fully vectorized over numpy arrays.

Golden values pinned in tests (FIXTURES.md): hilbert of (0,0),(1,1),(1,0),
(.5,.5) in bounds (0,0,1,1) = [0,10,15,2] @level 2, [0,42,63,10] @3,
[0,2863311530,4294967295,715827882] @16.

Error contract (reference hilbert_distance.py:32-36 etc.): null or empty
geometries are rejected by the callers before encoding.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 16  # matches reference limit (hilbert_distance.py:120)


def discretize_mid(mid: np.ndarray, lo: float, hi: float, level: int) -> np.ndarray:
    """Scale continuous values into integer cells [0, 2^level - 1]."""
    cells = (1 << level) - 1
    width = hi - lo
    if width <= 0:
        return np.zeros(len(mid), dtype=np.uint32)
    frac = np.clip((mid - lo) / width, 0.0, 1.0)
    return np.floor(frac * cells).astype(np.uint32)


def hilbert_d(x: np.ndarray, y: np.ndarray, level: int) -> np.ndarray:
    """Vectorized Hilbert curve distance of integer cells at ``level``."""
    if not 1 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [1, {MAX_LEVEL}]")
    n = np.uint64(1 << level)
    x = x.astype(np.uint64).copy()
    y = y.astype(np.uint64).copy()
    d = np.zeros(len(x), dtype=np.uint64)
    s = np.uint64(1 << (level - 1))
    one = np.uint64(1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant: only where ry == 0
        rot = ry == 0
        flip = rot & (rx == 1)
        x[flip] = n - one - x[flip]
        y[flip] = n - one - y[flip]
        xt = x[rot].copy()
        x[rot] = y[rot]
        y[rot] = xt
        s >>= one
    return d


def hilbert_from_bounds(minx, miny, maxx, maxy, total_bounds, level: int = 16) -> np.ndarray:
    """Hilbert distance of bbox midpoints in global ``total_bounds``."""
    tminx, tminy, tmaxx, tmaxy = total_bounds
    midx = (np.asarray(minx) + np.asarray(maxx)) / 2.0
    midy = (np.asarray(miny) + np.asarray(maxy)) / 2.0
    cx = discretize_mid(midx, tminx, tmaxx, level)
    cy = discretize_mid(midy, tminy, tmaxy, level)
    return hilbert_d(cx, cy, level)


def _spread_bits_u32(v: np.ndarray) -> np.ndarray:
    """Insert a zero bit between each bit of a 16-bit value (u32 out)."""
    v = v.astype(np.uint64)
    v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
    v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
    return v


def morton_d(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Z-order interleave: even bits ← x, odd bits ← y."""
    return _spread_bits_u32(x) | (_spread_bits_u32(y) << np.uint64(1))


def morton_from_bounds(minx, miny, maxx, maxy, total_bounds, level: int = 16) -> np.ndarray:
    tminx, tminy, tmaxx, tmaxy = total_bounds
    midx = (np.asarray(minx) + np.asarray(maxx)) / 2.0
    midy = (np.asarray(miny) + np.asarray(maxy)) / 2.0
    cx = discretize_mid(midx, tminx, tmaxx, level)
    cy = discretize_mid(midy, tminy, tmaxy, level)
    return morton_d(cx, cy)


_BASE32 = np.frombuffer(b"0123456789bcdefghjkmnpqrstuvwxyz", dtype="S1")


def geohash_uint64(lon: np.ndarray, lat: np.ndarray, precision: int = 12) -> np.ndarray:
    """Geohash as packed uint64 (5 bits per character, left-aligned is NOT
    applied — value is the integer of precision*5 interleaved bits)."""
    if not 1 <= precision <= 12:
        raise ValueError("precision must be in [1, 12]")
    nbits = precision * 5
    lon_bits = (nbits + 1) // 2  # even bit positions start with lon
    lat_bits = nbits // 2
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    qlon = np.minimum(
        np.floor((lon + 180.0) / 360.0 * (1 << lon_bits)).astype(np.uint64),
        np.uint64((1 << lon_bits) - 1),
    )
    qlat = np.minimum(
        np.floor((lat + 90.0) / 180.0 * (1 << lat_bits)).astype(np.uint64),
        np.uint64((1 << lat_bits) - 1),
    )
    out = np.zeros(len(lon), dtype=np.uint64)
    # interleave MSB-first: bit 0 of output stream is lon's MSB
    for i in range(nbits):
        if i % 2 == 0:
            src = qlon
            bit = lon_bits - 1 - i // 2
        else:
            src = qlat
            bit = lat_bits - 1 - i // 2
        out = (out << np.uint64(1)) | ((src >> np.uint64(bit)) & np.uint64(1))
    return out


def geohash_strings(lon: np.ndarray, lat: np.ndarray, precision: int = 12) -> np.ndarray:
    vals = geohash_uint64(lon, lat, precision)
    n = len(vals)
    chars = np.empty((n, precision), dtype="S1")
    for c in range(precision):
        shift = np.uint64((precision - 1 - c) * 5)
        idx = ((vals >> shift) & np.uint64(31)).astype(np.intp)
        chars[:, c] = _BASE32[idx]
    return chars.view(f"S{precision}").reshape(n).astype(str)
