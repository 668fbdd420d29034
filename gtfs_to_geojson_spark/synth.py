"""Deterministic synthetic fixtures (seed=42, no wall-clock).

Generates (FIXTURES.md §1–§2):

* a GTFS-shaped feed — agency, routes, trips, stops, stop_times,
  shapes, calendar, route_attributes, feed_info — with every edge case
  the reference's observable behavior depends on: orphan stops, parent
  stations, NULL shape_id trips (stop-derived-line fallback), dup
  (agency_id, route_id) filename collisions, out-of-order
  shape_pt_sequence rows, services straddling the date window, trips
  sharing a headsign (uniqBy first-wins);
* the image+caption table per BASELINE.json ``input_hint`` —
  ``(image_id, bytes, w, h, fmt, caption, phash)`` with phash computed
  from the actual encoded pixels and ~30% of geotags skewed into one
  dense cell.

Returned as pandas DataFrames; ``write_feed``/``write_images`` persist
parquet for Spark/DuckDB readers.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from . import images as img

BBOX = img.DEFAULT_BBOX  # (min_lon, min_lat, max_lon, max_lat)


def make_gtfs_feed(
    n_routes: int = 12,
    n_stops: int = 60,
    trips_per_route: int = 4,
    stops_per_trip: int = 8,
    shape_pts: int = 40,
    seed: int = 42,
) -> dict[str, pd.DataFrame]:
    rng = np.random.default_rng(seed)
    min_lon, min_lat, max_lon, max_lat = BBOX

    agency = pd.DataFrame(
        {"agency_id": ["AG1", "AG2"], "agency_name": ["Metro Test Transit", "Bay Ferry"]}
    )

    route_ids = [f"R{i:03d}" for i in range(n_routes)]
    routes = pd.DataFrame(
        {
            "route_id": route_ids,
            "agency_id": ["AG1" if i % 5 else "AG2" for i in range(n_routes)],
            "route_short_name": [f"{i % 6}" for i in range(n_routes)],  # dup short names
            "route_long_name": [f"Route {i} Line" for i in range(n_routes)],
            "route_type": [int(x) for x in rng.integers(0, 4, n_routes)],
            "route_color": [None if i % 7 == 3 else f"{i * 1234567 % 0xFFFFFF:06X}" for i in range(n_routes)],
            "route_text_color": [None if i % 3 == 0 else "FFFFFF" for i in range(n_routes)],
            "route_url": [None if i % 2 else f"https://example.test/r/{i}" for i in range(n_routes)],
        }
    )
    routes["agency_id"] = routes["agency_id"].astype(object)
    routes.loc[n_routes - 1, "agency_id"] = None  # null agency_id filename branch

    # stops: grid + jitter; last 6 are orphans; 3 parent stations
    stop_ids = [f"S{i:04d}" for i in range(n_stops)]
    stops = pd.DataFrame(
        {
            "stop_id": stop_ids,
            "stop_name": [f"Stop {i} & Main" for i in range(n_stops)],
            "stop_lat": rng.uniform(min_lat, max_lat, n_stops),
            "stop_lon": rng.uniform(min_lon, max_lon, n_stops),
            "location_type": [1 if i % 20 == 19 else 0 for i in range(n_stops)],
            "parent_station": [f"S{(i // 20) * 20 + 19:04d}" if i % 20 < 19 and i % 4 == 0 else None for i in range(n_stops)],
            "zone_id": [None if i % 3 else f"Z{i % 4}" for i in range(n_stops)],
            "stop_url": [None if i % 2 else f"https://example.test/s/{i}" for i in range(n_stops)],
        }
    )

    # calendar: 6 services with varied windows around 2026-03
    calendar = pd.DataFrame(
        {
            "service_id": [f"SVC{i}" for i in range(6)],
            "start_date": ["20260101", "20260201", "20260301", "20260401", "20250101", "20260315"],
            "end_date": ["20261231", "20260228", "20260331", "20260430", "20250601", "20260320"],
        }
    )

    # trips: per route, alternating directions; some NULL shape_id;
    # two trips share a headsign to exercise uniqBy-first
    trips_rows = []
    for ri, rid in enumerate(route_ids):
        for t in range(trips_per_route):
            has_shape = not (ri % 4 == 3)  # every 4th route has no shapes
            trips_rows.append(
                {
                    "trip_id": f"T{ri:03d}_{t}",
                    "route_id": rid,
                    "service_id": f"SVC{(ri + t) % 6}",
                    "direction_id": None if (ri == 2 and t == 0) else t % 2,
                    "trip_headsign": f"Downtown via {ri}" if t < 2 else f"Uptown via {ri}",
                    "shape_id": f"SH{ri:03d}_{t % 2}" if has_shape else None,
                }
            )
    trips = pd.DataFrame(trips_rows)

    # stop_times: each trip visits a deterministic stop subset in order;
    # trips of the same route share a prefix then branch (toposort food)
    usable = [s for i, s in enumerate(stop_ids) if stops.loc[i, "location_type"] == 0 and i < n_stops - 6]
    st_rows = []
    for ri in range(n_routes):
        base = rng.permutation(usable)[: stops_per_trip + 4]
        for t in range(trips_per_route):
            seq_stops = list(base[:3]) + list(base[3 + (t % 2) :: 2])[: stops_per_trip - 3]
            for si, sid in enumerate(seq_stops):
                st_rows.append(
                    {
                        "trip_id": f"T{ri:03d}_{t}",
                        "stop_id": sid,
                        "stop_sequence": (si + 1) * 10,
                    }
                )
    stop_times = pd.DataFrame(st_rows)

    # shapes: smooth polylines; rows deliberately shuffled (out-of-order
    # shape_pt_sequence proves window-ordered assembly, FIXTURES.md §1)
    sh_rows = []
    for ri in range(n_routes):
        if ri % 4 == 3:
            continue
        for v in range(2):
            sid = f"SH{ri:03d}_{v}"
            t0 = rng.uniform(0, 2 * np.pi)
            cx = rng.uniform(min_lon + 0.02, max_lon - 0.02)
            cy = rng.uniform(min_lat + 0.02, max_lat - 0.02)
            ts = np.linspace(0, 1, shape_pts)
            lons = cx + 0.03 * np.cos(t0 + ts * 2.5) * (0.5 + ts)
            lats = cy + 0.02 * np.sin(t0 + ts * 2.5) * (0.5 + ts)
            dist = np.concatenate([[0.0], np.cumsum(np.hypot(np.diff(lons), np.diff(lats)))])
            for k in range(shape_pts):
                sh_rows.append(
                    {
                        "shape_id": sid,
                        "shape_pt_lat": float(lats[k]),
                        "shape_pt_lon": float(lons[k]),
                        "shape_pt_sequence": int(k) * 5,
                        "shape_dist_traveled": float(dist[k]),
                    }
                )
    shapes = pd.DataFrame(sh_rows)
    shapes = shapes.sample(frac=1.0, random_state=seed).reset_index(drop=True)

    route_attributes = pd.DataFrame(
        {
            "route_id": route_ids[: n_routes // 2],
            "category": ["rail" if i % 2 else "bus" for i in range(n_routes // 2)],
            "subcategory": [f"sub{i % 3}" for i in range(n_routes // 2)],
            "running_way": [f"way{i % 2}" for i in range(n_routes // 2)],
        }
    )
    feed_info = pd.DataFrame({"feed_version": ["synthetic-42.1"]})

    return {
        "agency": agency,
        "routes": routes,
        "trips": trips,
        "stops": stops,
        "stop_times": stop_times,
        "shapes": shapes,
        "calendar": calendar,
        "route_attributes": route_attributes,
        "feed_info": feed_info,
    }


def make_images(n: int = 200, seed: int = 42) -> pd.DataFrame:
    """Image+caption table per input_hint, phash from real encoded pixels."""
    rng = np.random.default_rng(seed)
    sizes = np.asarray([16, 32, 64])
    rows = []
    for i in range(n):
        w = int(sizes[rng.integers(0, 3)])
        h = int(sizes[rng.integers(0, 3)])
        fmt = img.FORMATS[i % 3]
        pixels = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = img.encode(pixels, fmt)
        ph = img.phash64(pixels)
        rows.append(
            {
                "image_id": f"img_{i:012d}",
                "bytes": data,
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": f"synthetic scene {i}: {['street','bridge','station','park'][i % 4]} at tile {i % 97}",
                "phash": ph,
            }
        )
    df = pd.DataFrame(rows)
    df["w"] = df["w"].astype("int32")
    df["h"] = df["h"].astype("int32")
    df["phash"] = df["phash"].astype("int64")
    return df


def write_feed(feed: dict[str, pd.DataFrame], out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name, df in feed.items():
        df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)


def write_images(df: pd.DataFrame, out_dir: str, name: str = "images") -> None:
    os.makedirs(out_dir, exist_ok=True)
    df.to_parquet(os.path.join(out_dir, f"{name}.parquet"), index=False)
