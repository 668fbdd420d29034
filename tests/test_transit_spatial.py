"""North-star compositions on the GTFS feed, checked against
brute-force oracles over the synthetic fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from gtfs_to_geojson_spark import geometry as g
from gtfs_to_geojson_spark.operators import transit_spatial as TS
from gtfs_to_geojson_spark.operators.filters import BaseQuery


def test_stops_in_route_envelopes_exact(feed, feed_pd):
    got = {
        (r["stop_id"], r["route_id"])
        for r in TS.stops_in_route_envelopes(feed).collect()
    }
    # brute force from the pandas fixture
    sh, tr, st = feed_pd["shapes"], feed_pd["trips"], feed_pd["stop_times"]
    pairs = tr[tr.shape_id.notna()][["shape_id", "route_id"]].drop_duplicates()
    env = (
        sh.merge(pairs, on="shape_id")
        .groupby("route_id")
        .agg(
            min_lon=("shape_pt_lon", "min"),
            min_lat=("shape_pt_lat", "min"),
            max_lon=("shape_pt_lon", "max"),
            max_lat=("shape_pt_lat", "max"),
        )
        .reset_index()
    )
    used_ids = set(st["stop_id"])
    stops = feed_pd["stops"]
    used = stops[stops.stop_id.isin(used_ids) | (stops.location_type == 1)]
    # parent stations only included if referenced by a used child
    child_parents = set(stops[stops.stop_id.isin(used_ids)]["parent_station"].dropna())
    used = used[(used.location_type == 0) & used.stop_id.isin(used_ids) | (
        (used.location_type == 1) & used.stop_id.isin(child_parents)
    )]
    want = set()
    for _, e in env.iterrows():
        m = (
            (used.stop_lon >= e.min_lon) & (used.stop_lon <= e.max_lon)
            & (used.stop_lat >= e.min_lat) & (used.stop_lat <= e.max_lat)
        )
        want |= {(s, e.route_id) for s in used.stop_id[m]}
    assert got == want
    assert len(got) > 0


def test_snap_stops_to_shapes_matches_bruteforce(feed, feed_pd):
    out = TS.snap_stops_to_shapes(feed).toPandas()
    # brute force: nearest shape vertex by haversine, tie-break target_id
    sh, tr, st = feed_pd["shapes"], feed_pd["trips"], feed_pd["stop_times"]
    shape_ids = set(tr[tr.shape_id.notna()]["shape_id"])
    verts = sh[sh.shape_id.isin(shape_ids)].copy()
    verts["target_id"] = verts["shape_id"] + ":" + verts["shape_pt_sequence"].astype(str)
    stops = feed_pd["stops"].set_index("stop_id")
    assert len(out) > 0
    for _, row in out.sample(n=min(25, len(out)), random_state=1).iterrows():
        s = stops.loc[row["stop_id"]]
        d = g.haversine_m(
            s.stop_lat, s.stop_lon, verts["shape_pt_lat"].to_numpy(), verts["shape_pt_lon"].to_numpy()
        )
        order = np.lexsort((verts["target_id"].to_numpy(), d))
        best = verts.iloc[order[0]]
        assert (row["shape_id"], row["shape_pt_sequence"]) == (
            best["shape_id"], best["shape_pt_sequence"]
        ), row["stop_id"]


def test_assign_images_to_routes_containment(feed, images_df, images_pd):
    assigned = TS.assign_images_to_routes(images_df, feed).toPandas()
    # no duplicate (image, route) pairs
    assert not assigned.duplicated(["image_id", "route_id"]).any()
    # every assignment's geotag must be inside ANY of that route's
    # buffer polygons (a route has one polygon per shape line)
    polys_pd = TS.route_buffer_polygons(feed).toPandas()
    by_route: dict = {}
    for _, prow in polys_pd.iterrows():
        rings = [np.asarray([[p[0], p[1]] for p in r], dtype=float) for r in prow["polygon"]]
        by_route.setdefault(prow["route_id"], []).append(rings)
    for _, row in assigned.sample(n=min(30, len(assigned)), random_state=2).iterrows() if len(assigned) else []:
        assert g.points_in_multipolygon([row["lon"]], [row["lat"]], by_route[row["route_id"]])[0]
    # caption equality invariant
    if len(assigned):
        cap = images_pd.set_index("image_id")["caption"]
        for _, row in assigned.head(20).iterrows():
            assert row["caption"] == cap[row["image_id"]]


def test_image_density_rollup(feed, images_df):
    out = TS.image_density_per_route_cell(images_df, feed, rollup_res=10).toPandas()
    assigned = TS.assign_images_to_routes(images_df, feed).count()
    assert out["n_images"].sum() == assigned  # rollup preserves mass
    from gtfs_to_geojson_spark import cells

    if len(out):
        res_bits = (out["cell"].to_numpy() >> 58)
        assert set(res_bits.tolist()) == {10}  # rolled to the coarse res


def test_image_tiles_in_route_corridors_exact(spark, feed, images_df):
    from gtfs_to_geojson_spark import cells
    from gtfs_to_geojson_spark.operators import spatial

    tile_res = 16
    got = {
        (r["tile"], r["route_id"])
        for r in TS.image_tiles_in_route_corridors(
            images_df, feed, tile_res=tile_res, join_res=13
        ).collect()
    }
    # brute force: every occupied tile rectangle × every corridor ring
    tiles = (
        spatial.assign_images_to_tiles(images_df, tile_res)
        .groupBy("tile").count().collect()
    )
    corridors = TS.route_buffer_polygons(feed).collect()
    want = set()
    for t in tiles:
        mnx, mny, mxx, mxy = (float(v[0]) for v in cells.cell_bounds(
            np.array([t["tile"]], dtype=np.int64)))
        rect = [np.array(
            [[mnx, mny], [mxx, mny], [mxx, mxy], [mnx, mxy], [mnx, mny]], dtype=float
        )]
        for c in corridors:
            rings = [np.asarray([[p[0], p[1]] for p in ring]) for ring in c["polygon"]]
            if g.polygons_intersect(rect, rings):
                want.add((t["tile"], c["route_id"]))
    assert got == want
    assert len(got) > 0
    # n_images must equal the per-tile histogram
    hist = {t["tile"]: t["count"] for t in tiles}
    for r in TS.image_tiles_in_route_corridors(
        images_df, feed, tile_res=tile_res, join_res=13
    ).collect():
        assert r["n_images"] == hist[r["tile"]]
