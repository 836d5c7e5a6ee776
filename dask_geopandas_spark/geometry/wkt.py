"""WKT parse/format (reference from_wkt/to_wkt, expr.py:897-919, 545-553).

Small recursive-descent parser; no external deps.  Output format matches
shapely's default (`POINT (1 2)`, 15 significant digits trimmed).
"""

from __future__ import annotations

import math
import re

import numpy as np

from . import wkb as W

_TYPE_BY_NAME = {
    "POINT": W.POINT,
    "LINESTRING": W.LINESTRING,
    "POLYGON": W.POLYGON,
    "MULTIPOINT": W.MULTIPOINT,
    "MULTILINESTRING": W.MULTILINESTRING,
    "MULTIPOLYGON": W.MULTIPOLYGON,
    "GEOMETRYCOLLECTION": W.GEOMETRYCOLLECTION,
}
_NAME_BY_TYPE = {v: k for k, v in _TYPE_BY_NAME.items()}

_HEAD_RE = re.compile(r"\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*(EMPTY)?\s*", re.I)


def _parse_coords_block(s: str) -> np.ndarray:
    pts = s.split(",")
    rows = [[float(v) for v in p.split()] for p in pts]
    width = max(len(r) for r in rows)
    arr = np.full((len(rows), width), np.nan)
    for i, r in enumerate(rows):
        arr[i, : len(r)] = r
    return arr


def _split_groups(s: str) -> list[str]:
    """Return the depth-2 parenthesized sub-group contents of ``s``.

    ``"((a), (b))"`` → ``["a", "b"]``; inner parens of each group are kept
    verbatim so callers can recurse (MULTIPOLYGON rings)."""
    out, depth, cur = [], 0, []
    for ch in s:
        if ch == "(":
            depth += 1
            if depth == 2:
                cur = []
                continue
        elif ch == ")":
            depth -= 1
            if depth == 1:
                out.append("".join(cur))
                continue
        if depth >= 2:
            cur.append(ch)
    return out


def wkt_to_wkb(text: str | None) -> bytes | None:
    if text is None or (isinstance(text, float) and np.isnan(text)):
        return None
    m = _HEAD_RE.match(text)
    if not m:
        raise ValueError(f"invalid WKT: {text[:60]!r}")
    name = m.group(1).upper()
    zm = (m.group(2) or "").upper()
    empty = bool(m.group(3))
    kind = _TYPE_BY_NAME.get(name)
    if kind is None:
        raise ValueError(f"unknown WKT type {name!r}")
    has_z = "Z" in zm
    body = text[m.end():].strip()
    if empty:
        if kind == W.POINT:
            return W.serialize_geometry(W.POINT, np.full((1, 3 if has_z else 2), np.nan), has_z)
        return W.serialize_geometry(kind, [] if kind != W.MULTIPOINT else np.empty((0, 2)), has_z)
    inner = body[1:-1] if body.startswith("(") else body

    if kind == W.POINT:
        arr = _parse_coords_block(inner)
        has_z = has_z or arr.shape[1] >= 3
        return W.serialize_geometry(W.POINT, arr[0, :3 if has_z else 2], has_z)
    if kind == W.LINESTRING:
        arr = _parse_coords_block(inner)
        has_z = has_z or arr.shape[1] >= 3
        return W.serialize_geometry(W.LINESTRING, arr[:, :3 if has_z else 2], has_z)
    if kind == W.POLYGON:
        rings = [_parse_coords_block(g) for g in _split_groups(body)]
        has_z = has_z or any(r.shape[1] >= 3 for r in rings)
        return W.serialize_geometry(W.POLYGON, [r[:, :3 if has_z else 2] for r in rings], has_z)
    if kind == W.MULTIPOINT:
        # both "MULTIPOINT (1 2, 3 4)" and "MULTIPOINT ((1 2), (3 4))"
        if "(" in inner:
            pts = [_parse_coords_block(g)[0] for g in _split_groups(body)]
            arr = np.vstack(pts)
        else:
            arr = _parse_coords_block(inner)
        has_z = has_z or arr.shape[1] >= 3
        return W.serialize_geometry(W.MULTIPOINT, arr[:, :3 if has_z else 2], has_z)
    if kind == W.MULTILINESTRING:
        lines = [_parse_coords_block(g) for g in _split_groups(body)]
        has_z = has_z or any(l.shape[1] >= 3 for l in lines)
        return W.serialize_geometry(W.MULTILINESTRING, [l[:, :3 if has_z else 2] for l in lines], has_z)
    if kind == W.MULTIPOLYGON:
        polys = []
        for g in _split_groups(body):
            rings = [_parse_coords_block(r) for r in _split_groups("(" + g + ")")]
            polys.append(rings)
        has_z = has_z or any(r.shape[1] >= 3 for p in polys for r in p)
        return W.serialize_geometry(
            W.MULTIPOLYGON, [[r[:, :3 if has_z else 2] for r in p] for p in polys], has_z
        )
    if kind == W.GEOMETRYCOLLECTION:
        # split member geometries at depth-0 commas of the body
        members = []
        depth = 0
        cur = []
        assert body.startswith("(")
        for ch in body[1:-1]:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                members.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            members.append("".join(cur))
        blobs = [wkt_to_wkb(mm.strip()) for mm in members]
        batch = W.parse_wkb(blobs)
        parts = []
        for bi in range(batch.n):
            t = int(batch.types[bi])
            sel = np.flatnonzero(batch.path_geom == bi)
            def seg(p):
                s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
                return np.column_stack([batch.xs[s:e], batch.ys[s:e]])
            if t == W.POINT:
                parts.append((W.POINT, seg(sel[0])))
            elif t == W.LINESTRING:
                parts.append((W.LINESTRING, seg(sel[0])))
            elif t == W.POLYGON:
                parts.append((W.POLYGON, [seg(p) for p in sel]))
            else:
                raise ValueError("nested multi in GEOMETRYCOLLECTION unsupported")
        return W.serialize_geometry(W.GEOMETRYCOLLECTION, parts, has_z)
    raise ValueError(f"unhandled WKT type {name}")


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        # keep the sign bit of -0.0 so the text trip is bit-exact
        if v == 0 and math.copysign(1.0, v) < 0:
            return "-0"
        return str(int(v))
    return repr(float(v))


def _coords_text(arr_x, arr_y, arr_z=None) -> str:
    if arr_z is not None and not np.all(np.isnan(arr_z)):
        return ", ".join(
            f"{_fmt(x)} {_fmt(y)} {_fmt(z)}" for x, y, z in zip(arr_x, arr_y, arr_z)
        )
    return ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in zip(arr_x, arr_y))


def wkb_to_wkt(blob: bytes | None) -> str | None:
    if blob is None:
        return None
    batch = W.parse_wkb([blob])
    return _row_wkt(batch, 0)


def _row_wkt(batch: W.GeometryBatch, i: int) -> str | None:
    t = int(batch.types[i])
    if t == 0:
        return None
    name = _NAME_BY_TYPE[t]
    sel = np.flatnonzero(batch.path_geom == i)
    hz = bool(batch.has_z[i]) and batch.zs is not None

    def seg(p):
        s, e = batch.path_offsets[p], batch.path_offsets[p + 1]
        return (batch.xs[s:e], batch.ys[s:e], batch.zs[s:e] if hz else None)

    if batch.is_empty()[i]:
        return f"{name} EMPTY"
    if t == W.POINT:
        return f"{name} ({_coords_text(*seg(sel[0]))})"
    if t == W.LINESTRING:
        return f"{name} ({_coords_text(*seg(sel[0]))})"
    if t == W.POLYGON:
        rings = ", ".join(f"({_coords_text(*seg(p))})" for p in sel)
        return f"{name} ({rings})"
    if t == W.MULTIPOINT:
        pts = ", ".join(f"({_coords_text(*seg(p))})" for p in sel)
        return f"{name} ({pts})"
    if t == W.MULTILINESTRING:
        lines = ", ".join(f"({_coords_text(*seg(p))})" for p in sel)
        return f"{name} ({lines})"
    if t == W.MULTIPOLYGON:
        by_part: dict[int, list] = {}
        for p in sel:
            by_part.setdefault(int(batch.path_part[p]), []).append(p)
        polys = ", ".join(
            "(" + ", ".join(f"({_coords_text(*seg(p))})" for p in ps) + ")"
            for ps in by_part.values()
        )
        return f"{name} ({polys})"
    if t == W.GEOMETRYCOLLECTION:
        members = []
        for p in sel:
            k = batch.path_kind[p]
            if k == W.PK_POINT:
                members.append(f"POINT ({_coords_text(*seg(p))})")
            elif k == W.PK_LINE:
                members.append(f"LINESTRING ({_coords_text(*seg(p))})")
            else:
                members.append(f"POLYGON (({_coords_text(*seg(p))}))")
        return f"{name} ({', '.join(members)})"
    raise ValueError(f"bad type {t}")
