"""S3 — coordinate-projection override at ingest.

The reference accepts a proj4 string to fix feeds whose stop/shape
coordinates are in a non-WGS84 projection (README.md:175-187). No
proj library ships in this sandbox, so the engine implements the two
projection families that cover the documented use case (meter-grid
national systems) from scratch, vectorized:

* ``tmerc`` — transverse Mercator (the core of UTM / Gauss-Krüger /
  national grids), spherical form
* ``lcc`` — Lambert conformal conic, ELLIPSOIDAL 1SP/2SP (EPSG method
  9801/9802 formulas), with ``+pm`` prime-meridian and 3/7-parameter
  ``+towgs84`` Helmert datum shift — covers the reference README's own
  example config (NTF Lambert II étendu, README.md:175-187)
* ``affine`` — arbitrary affine correction (scale/rotate/translate)

Applied as one Arrow-batched pandas UDF over (x, y) at ingest — the
same shape a pyproj-backed version would have, so swapping the kernel
for pyproj when available is a one-function change.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tmerc_inverse(x: np.ndarray, y: np.ndarray, lon0_deg: float, k0: float = 0.9996,
                  false_easting: float = 500_000.0, false_northing: float = 0.0,
                  radius: float = 6_371_008.8) -> tuple[np.ndarray, np.ndarray]:
    """Spherical transverse-Mercator (x, y) meters → (lon, lat) degrees."""
    x = (np.asarray(x, dtype=np.float64) - false_easting) / (k0 * radius)
    y = (np.asarray(y, dtype=np.float64) - false_northing) / (k0 * radius)
    D = y
    lon = np.degrees(np.arctan2(np.sinh(x), np.cos(D))) + lon0_deg
    lat = np.degrees(np.arcsin(np.sin(D) / np.cosh(x)))
    return lon, lat


def tmerc_forward(lon: np.ndarray, lat: np.ndarray, lon0_deg: float, k0: float = 0.9996,
                  false_easting: float = 500_000.0, false_northing: float = 0.0,
                  radius: float = 6_371_008.8) -> tuple[np.ndarray, np.ndarray]:
    lon = np.radians(np.asarray(lon, dtype=np.float64) - lon0_deg)
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    B = np.cos(lat) * np.sin(lon)
    x = k0 * radius * np.arctanh(np.clip(B, -1 + 1e-15, 1 - 1e-15)) + false_easting
    y = k0 * radius * np.arctan2(np.tan(lat), np.cos(lon)) + false_northing
    return x, y


# ---------------------------------------------------------------------------
# Ellipsoidal Lambert conformal conic (+pm, +towgs84) — reference
# README.md:175-187 uses NTF Lambert II étendu, which needs all three.
# Formulas: EPSG Guidance Note 7-2 methods 9801 (1SP) / 9802 (2SP);
# PROJ semantics (k_0 multiplies in both, lat_2 defaults to lat_1).
# ---------------------------------------------------------------------------

_PRIME_MERIDIANS = {
    "greenwich": 0.0,
    "paris": 2.337229166666667,  # 2°20′14.025″E
    "lisbon": -9.131906111111112,
    "bogota": -74.08091666666667,
    "madrid": -3.687938888888889,
    "rome": 12.452333333333334,
    "bern": 7.439583333333333,
    "jakarta": 106.80771944444444,
    "ferro": -17.666666666666668,
    "brussels": 4.367975,
    "stockholm": 18.058277777777778,
    "athens": 23.7163375,
    "oslo": 10.722916666666666,
}

_WGS84_A, _WGS84_RF = 6_378_137.0, 298.257223563


def _ellipsoid(p: dict) -> tuple[float, float]:
    """(a, e²) from +a/+b/+rf/+f (or +R / default WGS84)."""
    if "R" in p:
        return float(p["R"]), 0.0
    a = float(p.get("a", _WGS84_A))
    if "b" in p:
        b = float(p["b"])
        e2 = 1.0 - (b * b) / (a * a)
    elif "rf" in p:
        f = 1.0 / float(p["rf"])
        e2 = f * (2.0 - f)
    elif "f" in p:
        f = float(p["f"])
        e2 = f * (2.0 - f)
    elif "a" in p:
        e2 = 0.0  # sphere of radius a
    else:
        f = 1.0 / _WGS84_RF
        e2 = f * (2.0 - f)
    return a, e2


def _geodetic_to_geocentric(lon_rad, lat_rad, a: float, e2: float):
    """(lon, lat, h=0) on ellipsoid (a, e2) → cartesian XYZ meters."""
    sphi, cphi = np.sin(lat_rad), np.cos(lat_rad)
    N = a / np.sqrt(1.0 - e2 * sphi * sphi)
    return N * cphi * np.cos(lon_rad), N * cphi * np.sin(lon_rad), N * (1.0 - e2) * sphi


def _geocentric_to_geodetic(X, Y, Z, a: float, e2: float):
    """Cartesian XYZ → (lon, lat) radians on ellipsoid (a, e2);
    fixed-point iteration on φ (5 rounds ≪ 1e-11 rad for h≈0)."""
    lon = np.arctan2(Y, X)
    pr = np.hypot(X, Y)
    lat = np.arctan2(Z, pr * (1.0 - e2))
    for _ in range(5):
        sphi = np.sin(lat)
        N = a / np.sqrt(1.0 - e2 * sphi * sphi)
        lat = np.arctan2(Z + e2 * N * sphi, pr)
    return lon, lat


def _parse_towgs84(p: dict) -> tuple[float, ...] | None:
    if "towgs84" not in p:
        return None
    vals = [float(v) for v in str(p["towgs84"]).split(",")]
    vals += [0.0] * (7 - len(vals))
    dx, dy, dz, rx, ry, rz, ppm = vals[:7]
    arc = math.pi / (180.0 * 3600.0)
    return dx, dy, dz, rx * arc, ry * arc, rz * arc, 1.0 + ppm * 1e-6


def _helmert(X, Y, Z, t, inverse: bool = False):
    """7-parameter position-vector Helmert (the +towgs84 convention)."""
    dx, dy, dz, rx, ry, rz, m = t
    if not inverse:
        X2 = dx + m * (X - rz * Y + ry * Z)
        Y2 = dy + m * (rz * X + Y - rx * Z)
        Z2 = dz + m * (-ry * X + rx * Y + Z)
        return X2, Y2, Z2
    # exact inverse of the (small-angle) forward matrix is well within
    # towgs84 accuracy when applied as the transposed rotation / m
    Xs, Ys, Zs = (X - dx) / m, (Y - dy) / m, (Z - dz) / m
    X2 = Xs + rz * Ys - ry * Zs
    Y2 = -rz * Xs + Ys + rx * Zs
    Z2 = ry * Xs - rx * Ys + Zs
    return X2, Y2, Z2


class LccProjection:
    """Ellipsoidal Lambert conformal conic with optional prime-meridian
    and towgs84 datum shift; forward = WGS84 lon/lat degrees → projected
    meters, inverse = projected meters → WGS84 lon/lat degrees.

    1SP (lat_2 absent or == lat_1): n = sin φ1 with k_0 scale (EPSG
    9801); 2SP: n from the two standard parallels (EPSG 9802). Both use
    ρ(φ) = a·k0·F·t(φ)ⁿ, matching PROJ's lcc (k_0 multiplies in both,
    default 1)."""

    def __init__(self, p: dict):
        self.a, self.e2 = _ellipsoid(p)
        self.e = math.sqrt(self.e2)
        lat0 = math.radians(float(p.get("lat_0", 0.0)))
        lat1 = math.radians(float(p.get("lat_1", p.get("lat_0", 0.0))))
        lat2 = math.radians(float(p["lat_2"])) if "lat_2" in p else lat1
        self.lon0 = float(p.get("lon_0", 0.0))
        self.k0 = float(p.get("k_0", p.get("k", 1.0)))
        self.x0 = float(p.get("x_0", 0.0))
        self.y0 = float(p.get("y_0", 0.0))
        pm = p.get("pm", 0.0)
        self.pm = _PRIME_MERIDIANS[str(pm).lower()] if isinstance(pm, str) and not _is_float(pm) else float(pm)
        self.towgs84 = _parse_towgs84(p)

        t1, m1 = self._t(lat1), self._m(lat1)
        if abs(lat1 - lat2) > 1e-12:
            t2, m2 = self._t(lat2), self._m(lat2)
            self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        else:
            self.n = math.sin(lat1)
        if abs(self.n) < 1e-12:
            raise NotImplementedError("lcc with standard parallel at the equator")
        self.F = m1 / (self.n * t1**self.n)
        self.rho0 = self.a * self.k0 * self.F * self._t(lat0) ** self.n

    def _t(self, phi):
        s = np.sin(phi)
        return np.tan(np.pi / 4.0 - np.asarray(phi) / 2.0) / (
            (1.0 - self.e * s) / (1.0 + self.e * s)
        ) ** (self.e / 2.0)

    def _m(self, phi):
        s = math.sin(phi)
        return math.cos(phi) / math.sqrt(1.0 - self.e2 * s * s)

    # -- native ellipsoid <-> projected plane --------------------------------
    def _fwd_native(self, lon_deg, lat_deg):
        """lon/lat degrees on the SOURCE datum (Greenwich-referenced) →
        projected x/y meters."""
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64) - self.pm - self.lon0)
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        rho = self.a * self.k0 * self.F * self._t(phi) ** self.n
        th = self.n * lam
        return self.x0 + rho * np.sin(th), self.y0 + self.rho0 - rho * np.cos(th)

    def _inv_native(self, x, y):
        xs = np.asarray(x, dtype=np.float64) - self.x0
        ys = self.rho0 - (np.asarray(y, dtype=np.float64) - self.y0)
        sgn = 1.0 if self.n >= 0 else -1.0
        rho = sgn * np.hypot(xs, ys)
        th = np.arctan2(sgn * xs, sgn * ys)
        lon = np.degrees(th / self.n) + self.lon0 + self.pm
        tp = (rho / (self.a * self.k0 * self.F)) ** (1.0 / self.n)
        phi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        for _ in range(8):
            s = self.e * np.sin(phi)
            phi = np.pi / 2.0 - 2.0 * np.arctan(
                tp * ((1.0 - s) / (1.0 + s)) ** (self.e / 2.0)
            )
        return lon, np.degrees(phi)

    # -- datum shift ---------------------------------------------------------
    def _to_wgs84(self, lon_deg, lat_deg):
        if self.towgs84 is None:
            return lon_deg, lat_deg
        X, Y, Z = _geodetic_to_geocentric(
            np.radians(lon_deg), np.radians(lat_deg), self.a, self.e2
        )
        X, Y, Z = _helmert(X, Y, Z, self.towgs84)
        f = 1.0 / _WGS84_RF
        lon, lat = _geocentric_to_geodetic(X, Y, Z, _WGS84_A, f * (2.0 - f))
        return np.degrees(lon), np.degrees(lat)

    def _from_wgs84(self, lon_deg, lat_deg):
        if self.towgs84 is None:
            return np.asarray(lon_deg, dtype=np.float64), np.asarray(lat_deg, dtype=np.float64)
        f = 1.0 / _WGS84_RF
        X, Y, Z = _geodetic_to_geocentric(
            np.radians(lon_deg), np.radians(lat_deg), _WGS84_A, f * (2.0 - f)
        )
        X, Y, Z = _helmert(X, Y, Z, self.towgs84, inverse=True)
        lon, lat = _geocentric_to_geodetic(X, Y, Z, self.a, self.e2)
        return np.degrees(lon), np.degrees(lat)

    # -- public --------------------------------------------------------------
    def forward(self, lon_deg, lat_deg):
        """WGS84 lon/lat degrees → projected x/y meters."""
        return self._fwd_native(*self._from_wgs84(lon_deg, lat_deg))

    def inverse(self, x, y):
        """Projected x/y meters → WGS84 lon/lat degrees."""
        return self._to_wgs84(*self._inv_native(x, y))


def _is_float(v) -> bool:
    try:
        float(v)
        return True
    except (TypeError, ValueError):
        return False


def parse_proj(proj: str) -> dict:
    """Minimal proj4-string parser for the supported families."""
    parts = dict(
        kv.split("=", 1) if "=" in kv else (kv, True)
        for kv in (p.lstrip("+") for p in proj.split())
    )
    return parts


def reproject_columns(df: DataFrame, x_col: str, y_col: str, proj: str) -> DataFrame:
    """Replace projected (x, y) columns with WGS84 (lon, lat) — the
    ingest-time analog of the reference's projection option. The UDF
    is Series→DataFrame (one Arrow pass)."""
    p = parse_proj(proj)
    name = p.get("proj")
    if name in ("tmerc", "utm"):
        if name == "utm":
            zone = int(p["zone"])
            lon0 = zone * 6.0 - 183.0
            k0, fe, fn = 0.9996, 500_000.0, 0.0
        else:
            lon0 = float(p.get("lon_0", 0.0))
            k0 = float(p.get("k", p.get("k_0", 1.0)))
            fe = float(p.get("x_0", 0.0))
            fn = float(p.get("y_0", 0.0))

        @F.pandas_udf("lon double, lat double")
        def inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
            lon, lat = tmerc_inverse(x.to_numpy(), y.to_numpy(), lon0, k0, fe, fn)
            return pd.DataFrame({"lon": lon, "lat": lat})

    elif name == "lcc":
        lcc = LccProjection(p)  # validated once, driver-side

        @F.pandas_udf("lon double, lat double")
        def inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
            lon, lat = lcc.inverse(x.to_numpy(), y.to_numpy())
            return pd.DataFrame({"lon": lon, "lat": lat})

    elif name == "affine":
        # +proj=affine +xoff= +yoff= +s11= +s12= +s21= +s22= (degrees out)
        s11, s12 = float(p.get("s11", 1.0)), float(p.get("s12", 0.0))
        s21, s22 = float(p.get("s21", 0.0)), float(p.get("s22", 1.0))
        xoff, yoff = float(p.get("xoff", 0.0)), float(p.get("yoff", 0.0))

        @F.pandas_udf("lon double, lat double")
        def inv(x: pd.Series, y: pd.Series) -> pd.DataFrame:
            xv, yv = x.to_numpy(), y.to_numpy()
            return pd.DataFrame(
                {"lon": xoff + s11 * xv + s12 * yv, "lat": yoff + s21 * xv + s22 * yv}
            )

    else:
        raise NotImplementedError(
            f"projection {name!r} not supported without pyproj; "
            "supported: tmerc, utm, lcc, affine"
        )

    out = df.withColumn("_ll", inv(F.col(x_col), F.col(y_col)))
    return out.withColumn(x_col, F.col("_ll.lon")).withColumn(y_col, F.col("_ll.lat")).drop("_ll")


def reproject_feed(feed: dict, proj: str) -> dict:
    """Apply the override to stops and shapes (the two coordinate-
    bearing GTFS tables the reference transforms)."""
    out = dict(feed)
    out["stops"] = reproject_columns(feed["stops"], "stop_lon", "stop_lat", proj)
    out["shapes"] = reproject_columns(feed["shapes"], "shape_pt_lon", "shape_pt_lat", proj)
    return out
