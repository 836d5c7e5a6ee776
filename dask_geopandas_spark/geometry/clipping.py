"""Convex clipping kernels: Sutherland–Hodgman polygons, half-plane line
clipping.  Exact when the clip region is convex (the common case for
clip-by-box / clip-by-envelope; the reference's general concave masks go
through GEOS which is unavailable here).
"""

from __future__ import annotations

import numpy as np


def _ensure_ccw(x: np.ndarray, y: np.ndarray):
    area2 = np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
    if area2 < 0:
        return x[::-1].copy(), y[::-1].copy()
    return x, y


def is_convex_ring(x: np.ndarray, y: np.ndarray) -> bool:
    if len(x) < 4:
        return True
    if x[0] == x[-1] and y[0] == y[-1]:
        x = x[:-1]; y = y[:-1]
    n = len(x)
    sign = 0
    for i in range(n):
        ax, ay = x[i], y[i]
        bx, by = x[(i + 1) % n], y[(i + 1) % n]
        cx, cy = x[(i + 2) % n], y[(i + 2) % n]
        cr = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        if cr != 0:
            s = 1 if cr > 0 else -1
            if sign == 0:
                sign = s
            elif s != sign:
                return False
    return True


def sutherland_hodgman(sub_x: np.ndarray, sub_y: np.ndarray,
                       clip_x: np.ndarray, clip_y: np.ndarray):
    """Clip a subject ring by a convex CCW clip ring. Returns (x, y) of the
    clipped ring (open, possibly empty)."""
    cx, cy = _ensure_ccw(clip_x, clip_y)
    if cx[0] == cx[-1] and cy[0] == cy[-1]:
        cx = cx[:-1]; cy = cy[:-1]
    px = np.asarray(sub_x, dtype=float)
    py = np.asarray(sub_y, dtype=float)
    if px[0] == px[-1] and py[0] == py[-1]:
        px = px[:-1]; py = py[:-1]
    n = len(cx)
    for i in range(n):
        if len(px) == 0:
            break
        ex1, ey1 = cx[i], cy[i]
        ex2, ey2 = cx[(i + 1) % n], cy[(i + 1) % n]
        # inside = left of directed edge
        dx, dy = ex2 - ex1, ey2 - ey1
        side = dx * (py - ey1) - dy * (px - ex1)
        inside = side >= 0
        nx, ny = [], []
        m = len(px)
        for j in range(m):
            k = (j + 1) % m
            if inside[j]:
                nx.append(px[j]); ny.append(py[j])
            if inside[j] != inside[k]:
                # intersection of subject edge with clip line
                sx1, sy1, sx2, sy2 = px[j], py[j], px[k], py[k]
                denom = dx * (sy2 - sy1) - dy * (sx2 - sx1)
                if denom != 0:
                    t = (dy * (sx1 - ex1) - dx * (sy1 - ey1)) / denom
                    nx.append(sx1 + t * (sx2 - sx1))
                    ny.append(sy1 + t * (sy2 - sy1))
        px = np.asarray(nx); py = np.asarray(ny)
    return px, py


def clip_segment_convex(x1, y1, x2, y2, clip_x, clip_y):
    """Clip one segment to a convex CCW ring via Cyrus–Beck parametric
    clipping. Returns (t0, t1) in [0,1] or None if fully outside."""
    cx, cy = _ensure_ccw(np.asarray(clip_x, float), np.asarray(clip_y, float))
    if cx[0] == cx[-1] and cy[0] == cy[-1]:
        cx = cx[:-1]; cy = cy[:-1]
    t0, t1 = 0.0, 1.0
    dx, dy = x2 - x1, y2 - y1
    n = len(cx)
    for i in range(n):
        ex1, ey1 = cx[i], cy[i]
        ex2, ey2 = cx[(i + 1) % n], cy[(i + 1) % n]
        # inward normal of CCW edge
        nx_, ny_ = -(ey2 - ey1), ex2 - ex1
        num = nx_ * (x1 - ex1) + ny_ * (y1 - ey1)
        den = nx_ * dx + ny_ * dy
        if den == 0:
            if num < 0:
                return None
            continue
        t = -num / den
        if den > 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
        if t0 > t1:
            return None
    return t0, t1


def clip_line_to_convex(x: np.ndarray, y: np.ndarray, clip_x, clip_y):
    """Clip a polyline; returns list of (x, y) pieces."""
    pieces = []
    cur_x, cur_y = [], []
    for i in range(len(x) - 1):
        res = clip_segment_convex(x[i], y[i], x[i + 1], y[i + 1], clip_x, clip_y)
        if res is None:
            if cur_x:
                pieces.append((np.asarray(cur_x), np.asarray(cur_y)))
                cur_x, cur_y = [], []
            continue
        t0, t1 = res
        ax = x[i] + t0 * (x[i + 1] - x[i]); ay = y[i] + t0 * (y[i + 1] - y[i])
        bx = x[i] + t1 * (x[i + 1] - x[i]); by = y[i] + t1 * (y[i + 1] - y[i])
        if not cur_x or cur_x[-1] != ax or cur_y[-1] != ay:
            if cur_x:
                pieces.append((np.asarray(cur_x), np.asarray(cur_y)))
            cur_x, cur_y = [ax], [ay]
        cur_x.append(bx); cur_y.append(by)
        if t1 < 1.0:
            pieces.append((np.asarray(cur_x), np.asarray(cur_y)))
            cur_x, cur_y = [], []
    if cur_x:
        pieces.append((np.asarray(cur_x), np.asarray(cur_y)))
    return pieces
