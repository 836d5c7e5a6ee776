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


def _discretize_point(v: np.ndarray, lo: float, hi: float,
                      level: int) -> np.ndarray:
    """discretize_mid for already-midpointed coordinates (one array)."""
    return discretize_mid(np.asarray(v, dtype=np.float64), lo, hi, level)


def _ragged_expand(counts: np.ndarray):
    """(row_index, within_row_offset) arrays that expand per-row counts
    into one flat dimension — the vectorized replacement for a Python
    loop over variable-length ranges."""
    counts = counts.astype(np.int64)
    idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    off = (np.arange(int(counts.sum()), dtype=np.int64)
           - np.repeat(np.cumsum(counts) - counts, counts))
    return idx, off


def bucket_sets_from_bounds(minx, miny, maxx, maxy, total_bounds,
                            boundaries, by: str = "hilbert",
                            level: int = 16,
                            coarse: int = 8) -> list:
    """Per-row list of EVERY range bucket a bbox can meet under
    `spatial_shuffle(boundaries=)`'s convention (bucket = count of
    boundaries <= curve key, keys = curve index of the level-``level``
    cell containing a point).

    Exactness rests on the hierarchy property of both supported curves
    (pinned in tests): a ``coarse``-level block (a, b) covers EXACTLY
    the contiguous fine-key interval
    [curve(a, b, coarse) * 4^(level-coarse), +4^(level-coarse)), so a
    bbox's candidate buckets are the union over its covered blocks of
    the buckets overlapping each block's interval — a SUPERSET of the
    buckets of cells the bbox truly covers (block granularity may add
    neighbors), never a subset.  Two overlapping bboxes always share a
    fine cell, hence always share that cell's bucket: a co-bucketed
    equi-join on these sets misses no intersecting pair.  Degenerate
    (single-cell) bboxes — points — short-circuit to their exact home
    bucket.  Fully vectorized: block fan-out and bucket-range fan-out
    are ragged numpy expands, never per-row Python."""
    if by not in ("hilbert", "morton"):
        raise ValueError(f"bucket sets need hilbert or morton, got {by!r}")
    if not 1 <= coarse <= level:
        raise ValueError(f"coarse must be in [1, level], got {coarse}")
    tminx, tminy, tmaxx, tmaxy = total_bounds
    bs = np.asarray(list(boundaries), dtype=np.int64)
    cx0 = _discretize_point(minx, tminx, tmaxx, level)
    cx1 = _discretize_point(maxx, tminx, tmaxx, level)
    cy0 = _discretize_point(miny, tminy, tmaxy, level)
    cy1 = _discretize_point(maxy, tminy, tmaxy, level)
    n = len(cx0)
    out: list = [None] * n

    def keys_of(x, y, lvl):
        if by == "hilbert":
            return hilbert_d(x.astype(np.uint64), y.astype(np.uint64),
                             lvl).astype(np.int64)
        return morton_d(x.astype(np.uint64),
                        y.astype(np.uint64)).astype(np.int64)

    single = (cx0 == cx1) & (cy0 == cy1)
    if single.any():
        keys = keys_of(cx0[single], cy0[single], level)
        bkt = np.searchsorted(bs, keys, side="right")
        for i, b in zip(np.flatnonzero(single), bkt):
            out[i] = [int(b)]
    multi = ~single
    if multi.any():
        delta = level - coarse
        mrows = np.flatnonzero(multi)
        ax0 = (cx0[multi].astype(np.int64) >> delta)
        ax1 = (cx1[multi].astype(np.int64) >> delta)
        ay0 = (cy0[multi].astype(np.int64) >> delta)
        ay1 = (cy1[multi].astype(np.int64) >> delta)
        nb = (ax1 - ax0 + 1) * (ay1 - ay0 + 1)
        ny = (ay1 - ay0 + 1)
        ridx, off = _ragged_expand(nb)
        axx = ax0[ridx] + off // ny[ridx]
        ayy = ay0[ridx] + off % ny[ridx]
        pref = keys_of(axx, ayy, coarse)
        span = np.int64(1) << np.int64(2 * delta)
        lo = pref * span
        hi = lo + span - 1
        blo = np.searchsorted(bs, lo, side="right")
        bhi = np.searchsorted(bs, hi, side="right")
        r2, o2 = _ragged_expand(bhi - blo + 1)
        pairs = np.stack([ridx[r2], blo[r2] + o2], axis=1)
        pairs = np.unique(pairs, axis=0)
        splits = np.searchsorted(pairs[:, 0], np.arange(len(nb) + 1))
        for k in range(len(nb)):
            out[mrows[k]] = [int(v)
                             for v in pairs[splits[k]:splits[k + 1], 1]]
    return out
