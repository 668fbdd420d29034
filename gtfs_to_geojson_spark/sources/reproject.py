"""S3 — coordinate-projection override at ingest.

The reference accepts a proj4 string to fix feeds whose stop/shape
coordinates are in a non-WGS84 projection (README.md:175-187). No
proj library ships in this sandbox, so the engine implements the two
projection families that cover the documented use case (meter-grid
national systems) from scratch, vectorized:

* ``tmerc`` — transverse Mercator (the core of UTM / Gauss-Krüger /
  national grids), spherical form
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
            f"projection {name!r} not supported without pyproj; supported: tmerc, utm, affine"
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
