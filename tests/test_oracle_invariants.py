"""Margin pins for the r4 exact-oracle promotions (VERDICT r3 item 6).

g5b_polygon_clip and a3_dissolve compare a geometry-kernel result
against a closed-form / graph-closure DuckDB oracle through a rounding
or a geometric-tolerance seam.  Both seams are safe only because the
deterministic supplier layout keeps every true value WELL AWAY from
the seam — these tests measure that margin directly (pure arithmetic
on the key-derivation formulas, no Spark), so a future change to the
coordinate derivation or the supplier key range fails HERE with a
readable message instead of as a driver hash mismatch.
"""

from __future__ import annotations

import numpy as np

from gtfs_to_geojson_spark.plans.oracle_queries import (
    LAT0,
    LAT_SPAN,
    LON0,
    LON_SPAN,
    M1,
    M2,
    MOD,
)

MAX_SUPPKEY = 10_000  # supplier count at sf1; every tested sf is a prefix


def _lon(key: np.ndarray) -> np.ndarray:
    return LON0 + ((key * M1) % MOD).astype(np.float64) / MOD * LON_SPAN


def _lat(key: np.ndarray) -> np.ndarray:
    return LAT0 + ((key * M2) % MOD).astype(np.float64) / MOD * LAT_SPAN


def test_g5b_rounding_margin():
    """Every closed-form piece area sits far from a round(·, -3)
    boundary (odd multiples of 500 µdeg²), and every cut position u
    sits far from the piece-existence boundaries ±w and the formula
    knots ±w/2 — so the ≲0.1 µdeg² kernel float drift can never flip
    a rounded value or a row's existence."""
    s = np.arange(0, 61, dtype=np.int64)
    cx = _lon(s * 13 + 7)
    w = ((s % 13) + 2).astype(np.float64) * 0.004
    h = ((s % 7) + 2).astype(np.float64) * 0.003
    x0 = _lon(np.asarray([7], dtype=np.int64))[0]  # min suppkey 0 -> key 7
    u = x0 - cx

    # (1) u clear of the row-existence / branch boundaries, except the
    # first octagon's own exact u == 0 center cut (a formula point, not
    # a boundary).
    for knot in (-w, -w / 2, w / 2, w):
        d = np.abs(u - knot)
        assert d.min() > 1e-4, f"cut within {d.min()} deg of a knot at s={s[d.argmin()]}"

    inter = np.where(
        u <= -w, 3.5 * h * w,
        np.where(
            u <= -w / 2, 3.5 * h * w - (h / w) * (2 * w + u) * (w + u),
            np.where(
                u <= w / 2, 1.75 * h * w - 2 * h * u,
                np.where(u < w, (h / w) * (2 * w - u) * (w - u), 0.0),
            ),
        ),
    )
    diff = 3.5 * h * w - inter
    areas = np.concatenate([inter[u < w], diff[u > -w]]) * 1e12  # µdeg²
    # distance to the nearest odd multiple of 500 (round-half boundary)
    frac = np.abs(((areas / 1000.0) % 1.0) - 0.5) * 1000.0
    assert frac.min() > 10.0, (
        f"area within {frac.min():.3f} µdeg² of a rounding boundary "
        f"(drift budget is ~0.1 µdeg²)"
    )


def test_a3_dissolve_tangency_band():
    """No supplier pair's center distance falls in the polygon/circle
    tangency band: the 16-gon buffer's inradius is 400·cos(π/16) ≈
    392.3 m, so pairs in (784.6 m, 800 m] overlap as circles (the SQL
    oracle's edge rule) but possibly not as polygons (the kernel).
    The deterministic layout keeps every pair ≥ 20 m clear of the
    whole band, both sides."""
    s = np.arange(0, 41, dtype=np.int64)
    lon, lat = _lon(s * 13 + 7), _lat(s * 11 + 5)
    la = np.radians(lat)
    dlat = la[:, None] - la[None, :]
    dlon = np.radians(lon[:, None] - lon[None, :])
    hav = (
        np.sin(dlat / 2) ** 2
        + np.cos(la[:, None]) * np.cos(la[None, :]) * np.sin(dlon / 2) ** 2
    )
    d = 2.0 * 6371008.8 * np.arcsin(np.sqrt(np.minimum(hav, 1.0)))
    iu = np.triu_indices(len(s), k=1)
    pair_d = d[iu]
    in_band = (pair_d > 2 * 400.0 * np.cos(np.pi / 16) - 20.0) & (
        pair_d < 800.0 + 20.0
    )
    assert not in_band.any(), (
        f"{int(in_band.sum())} supplier pair(s) inside the tangency band, "
        f"e.g. d={pair_d[in_band][:3]} m"
    )


def test_diamond_overlay_lattice_margin():
    """The j11/j11b/j12 diamond fixtures (r5): derived centers sit on
    an exact-decimal 1e-8 grid (LON0/LAT0 cancel in every Δ), so plain
    1e-3-multiple half-diagonal sums produce EXACT corner tangencies
    |Δv| = h1+h2 in the lattice — the sf0.1 sweep caught two, with
    double rounding splitting the tie differently between the Arrow
    kernels and the closed-form oracle. The +1.3e-9/+2.4e-9 h offsets
    push every decision boundary off the grid; this pins the minima
    over ALL sf0.1 pairs (15M for j11, 150M for j12 — smaller SFs are
    key prefixes) at >= 2e-9, five orders above double rounding."""
    ck = np.arange(1, 15001, dtype=np.int64)
    sk = np.arange(1, 1001, dtype=np.int64)
    ok = np.arange(1, 150001, dtype=np.int64)
    acx, acy = _lon(ck * 17 + 3), _lat(ck * 29 + 11)
    bcx, bcy = _lon(sk * 13 + 7), _lat(sk * 11 + 5)
    au, av = acx + acy, acx - acy
    bu, bv = bcx + bcy, bcx - bcy
    ha = ((ck % 9) + 1).astype(np.float64) * 0.003 + 1.3e-9
    hb = ((sk % 7) + 2).astype(np.float64) * 0.004 + 2.4e-9
    s = ha[:, None] + hb[None, :]
    du = np.abs(np.abs(au[:, None] - bu[None, :]) - s).min()
    dv = np.abs(np.abs(av[:, None] - bv[None, :]) - s).min()
    assert min(du, dv) > 2e-9, f"j11 boundary margin collapsed: {min(du, dv)}"

    sx0 = _lon(ok * 19 + 3)
    sy = _lat(ok * 7 + 1)
    slen = ((ok % 13) + 2).astype(np.float64) * 0.003
    m = np.inf
    for i in range(0, len(ok), 20000):
        x0, y = sx0[i:i + 20000, None], sy[i:i + 20000, None]
        x1 = x0 + slen[i:i + 20000, None]
        lo = np.maximum(np.maximum(x0, (bu[None, :] - hb[None, :]) - y),
                        (bv[None, :] - hb[None, :]) + y)
        hi = np.minimum(np.minimum(x1, (bu[None, :] + hb[None, :]) - y),
                        (bv[None, :] + hb[None, :]) + y)
        m = min(m, np.abs(hi - lo).min())
    assert m > 2e-9, f"j12 boundary margin collapsed: {m}"
