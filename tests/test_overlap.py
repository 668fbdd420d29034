"""J10/J11 overlay joins: envelope⋈envelope and polygon⋈polygon
intersects — brute-force equivalence, dedup-free uniqueness, salting,
grid-edge clamping, and the geometry predicate's closed-form checks."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_to_geojson_spark import geometry as geom
from gtfs_to_geojson_spark.operators import overlap


def _boxes(n, seed, lon0=-122.5, lat0=37.7, span=0.6, wmax=0.05):
    rng = np.random.RandomState(seed)
    cx = lon0 + rng.rand(n) * span
    cy = lat0 + rng.rand(n) * span
    hw = rng.rand(n) * wmax + 1e-4
    hh = rng.rand(n) * wmax + 1e-4
    return pd.DataFrame(
        {
            "bid": np.arange(n, dtype=np.int64),
            "min_lon": cx - hw,
            "min_lat": cy - hh,
            "max_lon": cx + hw,
            "max_lat": cy + hh,
        }
    )


def _brute_pairs(a: pd.DataFrame, b: pd.DataFrame) -> set:
    out = set()
    for _, ra in a.iterrows():
        hit = (
            (ra.min_lon <= b.max_lon)
            & (b.min_lon <= ra.max_lon)
            & (ra.min_lat <= b.max_lat)
            & (b.min_lat <= ra.max_lat)
        )
        for rb_id in b.bid[hit]:
            out.add((int(ra.bid), int(rb_id)))
    return out


@pytest.mark.parametrize("res", [10, 13])
def test_envelope_join_matches_brute_force(spark, res):
    # res 13 cell ≈ 0.044° — smaller than the biggest boxes, so covers
    # span many cells and the canonical-cell dedup is really exercised
    a, b = _boxes(300, seed=1), _boxes(200, seed=2)
    da, db = spark.createDataFrame(a), spark.createDataFrame(b)
    got = overlap.envelope_intersect_join(da, db, res=res).select("bid_a", "bid_b").collect()
    pairs = [(r.bid_a, r.bid_b) for r in got]
    assert len(pairs) == len(set(pairs)), "canonical-cell dedup emitted duplicates"
    assert set(pairs) == _brute_pairs(a, b)


def test_envelope_join_salted_identical_pairs(spark):
    a, b = _boxes(150, seed=3), _boxes(150, seed=4)
    da, db = spark.createDataFrame(a), spark.createDataFrame(b)
    plain = overlap.envelope_intersect_join(da, db, res=12)
    # target of 3 rows/cell forces multi-lane factors on many cells
    salted = overlap.envelope_intersect_join(
        da, db, res=12, salt_target_rows=3, left_id="bid"
    )
    p = {(r.bid_a, r.bid_b) for r in plain.select("bid_a", "bid_b").collect()}
    s_rows = salted.select("bid_a", "bid_b").collect()
    s = {(r.bid_a, r.bid_b) for r in s_rows}
    assert len(s_rows) == len(s)
    assert p == s


def test_envelope_join_grid_edge_clamp(spark):
    # boxes straddling lon=180 / lat near pole: covers clamp, the exact
    # predicate doesn't — pairs must still match brute force exactly
    a = _boxes(80, seed=5, lon0=179.7, lat0=89.2, span=0.5, wmax=0.2)
    b = _boxes(80, seed=6, lon0=179.7, lat0=89.2, span=0.5, wmax=0.2)
    got = overlap.envelope_intersect_join(
        spark.createDataFrame(a), spark.createDataFrame(b), res=9
    )
    pairs = [(r.bid_a, r.bid_b) for r in got.select("bid_a", "bid_b").collect()]
    assert len(pairs) == len(set(pairs))
    assert set(pairs) == _brute_pairs(a, b)


def test_envelope_join_plan_is_jvm_only(spark):
    a, b = _boxes(10, seed=7), _boxes(10, seed=8)
    df = overlap.envelope_intersect_join(
        spark.createDataFrame(a), spark.createDataFrame(b), res=12
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "ArrowEval" not in plan and "BatchEval" not in plan
    # dedup is the canonical-cell filter, not an aggregate
    assert "HashAggregate" not in plan


# ---------------------------------------------------------------------------
# polygons_intersect predicate
# ---------------------------------------------------------------------------


def _diamond(cx, cy, h):
    return [
        np.array(
            [[cx, cy - h], [cx + h, cy], [cx, cy + h], [cx - h, cy], [cx, cy - h]],
            dtype=np.float64,
        )
    ]


def test_polygons_intersect_diamond_closed_form():
    # |u1-u2| <= h1+h2 AND |v1-v2| <= h1+h2 in rotated coords (u=x+y, v=x-y)
    rng = np.random.RandomState(11)
    for _ in range(200):
        c1 = rng.rand(2) * 2.0
        c2 = rng.rand(2) * 2.0
        h1, h2 = rng.rand() * 0.5 + 0.01, rng.rand() * 0.5 + 0.01
        want = (
            abs((c1[0] + c1[1]) - (c2[0] + c2[1])) <= h1 + h2
            and abs((c1[0] - c1[1]) - (c2[0] - c2[1])) <= h1 + h2
        )
        got = geom.polygons_intersect(_diamond(*c1, h1), _diamond(*c2, h2))
        assert got == want, (c1, c2, h1, h2)


def _sat_convex_intersect(pa: np.ndarray, pb: np.ndarray) -> bool:
    """Independent reference: separating-axis test for convex polygons
    (different algorithm from the vertex-in + edge-cross kernel)."""
    for poly in (pa, pb):
        r = geom.close_ring(poly)
        edges = r[1:] - r[:-1]
        for ex, ey in edges:
            ax = np.array([-ey, ex])
            proj_a = pa @ ax
            proj_b = pb @ ax
            if proj_a.max() < proj_b.min() or proj_b.max() < proj_a.min():
                return False
    return True


def test_polygons_intersect_vs_sat_random_convex():
    rng = np.random.RandomState(17)
    hulls = []
    for _ in range(30):
        pts = rng.rand(12, 2) * 1.5 + rng.rand(2) * 1.0
        h = geom.convex_hull(pts)
        assert h is not None
        hulls.append(h)
    n_hit = 0
    for i in range(len(hulls)):
        for j in range(i + 1, len(hulls)):
            want = _sat_convex_intersect(hulls[i][:-1], hulls[j][:-1])
            got = geom.polygons_intersect([hulls[i]], [hulls[j]])
            assert got == want, (i, j)
            n_hit += want
    assert 0 < n_hit < len(hulls) * (len(hulls) - 1) // 2  # both outcomes exercised


def test_polygons_intersect_edge_cases():
    sq = [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)]
    inner = [np.array([[0.5, 0.5], [1.5, 0.5], [1.5, 1.5], [0.5, 1.5], [0.5, 0.5]], dtype=float)]
    # containment without edge crossing, both directions
    assert geom.polygons_intersect(sq, inner)
    assert geom.polygons_intersect(inner, sq)
    # cross shape: no vertex of either inside the other, edges cross
    tall = [np.array([[0.8, -1], [1.2, -1], [1.2, 3], [0.8, 3], [0.8, -1]], dtype=float)]
    wide = [np.array([[-1, 0.8], [3, 0.8], [3, 1.2], [-1, 1.2], [-1, 0.8]], dtype=float)]
    assert geom.polygons_intersect(tall, wide)
    # shared edge only (touch)
    right = [np.array([[2, 0], [4, 0], [4, 2], [2, 2], [2, 0]], dtype=float)]
    assert geom.polygons_intersect(sq, right)
    # disjoint
    far = [np.array([[5, 5], [6, 5], [6, 6], [5, 6], [5, 5]], dtype=float)]
    assert not geom.polygons_intersect(sq, far)
    # B inside A's hole: no intersection
    donut = [
        np.array([[-1, -1], [3, -1], [3, 3], [-1, 3], [-1, -1]], dtype=float),
        np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float),
    ]
    assert not geom.polygons_intersect(donut, inner)
    # but a polygon spanning hole AND annulus does intersect
    assert geom.polygons_intersect(donut, tall)


# ---------------------------------------------------------------------------
# polygon⋈polygon join
# ---------------------------------------------------------------------------


def _diamond_rows(n, seed, lon0=-122.5, lat0=37.7, span=0.4, hmax=0.04):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        cx = lon0 + rng.rand() * span
        cy = lat0 + rng.rand() * span
        h = rng.rand() * hmax + 1e-4
        rows.append(
            {
                "pid": i,
                "cx": cx,
                "cy": cy,
                "h": h,
                "polygon": [[[float(x), float(y)] for x, y in _diamond(cx, cy, h)[0]]],
            }
        )
    return rows


def test_polygon_join_matches_diamond_closed_form(spark):
    ra, rb = _diamond_rows(120, seed=21), _diamond_rows(100, seed=22)
    schema = "pid long, cx double, cy double, h double, polygon array<array<array<double>>>"
    da = spark.createDataFrame(ra, schema=schema)
    db = spark.createDataFrame(rb, schema=schema)
    got = overlap.polygon_intersect_join(da, db, res=12)
    pairs = [(r.pid_a, r.pid_b) for r in got.select("pid_a", "pid_b").collect()]
    assert len(pairs) == len(set(pairs))
    want = set()
    for a in ra:
        for b in rb:
            if (
                abs((a["cx"] + a["cy"]) - (b["cx"] + b["cy"])) <= a["h"] + b["h"]
                and abs((a["cx"] - a["cy"]) - (b["cx"] - b["cy"])) <= a["h"] + b["h"]
            ):
                want.add((a["pid"], b["pid"]))
    assert set(pairs) == want
    # the bbox prefilter passes near-miss corner pairs that the exact
    # residual must reject — make sure the rejection path actually ran
    n_bbox = len(
        overlap.envelope_intersect_join(
            da.withColumns(overlap.polygon_bbox_cols(F.col("polygon"))),
            db.withColumns(overlap.polygon_bbox_cols(F.col("polygon"))),
            res=12,
        ).collect()
    )
    assert n_bbox > len(want)


# ---------------------------------------------------------------------------
# linestring_intersects_polygon + line⋈polygon join
# ---------------------------------------------------------------------------


def test_linestring_intersects_polygon_cases():
    sq = [np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)]
    # crossing through without any vertex inside
    assert geom.linestring_intersects_polygon(np.array([[-1.0, 1.0], [3.0, 1.0]]), sq)
    # vertex inside
    assert geom.linestring_intersects_polygon(np.array([[1.0, 1.0], [5.0, 5.0]]), sq)
    # disjoint
    assert not geom.linestring_intersects_polygon(np.array([[3.0, 3.0], [4.0, 4.0]]), sq)
    # collinear slide along the boundary, endpoints beyond the edge
    assert geom.linestring_intersects_polygon(np.array([[-1.0, 0.0], [3.0, 0.0]]), sq)
    # touch at a single corner
    assert geom.linestring_intersects_polygon(np.array([[2.0, 2.0], [3.0, 3.0]]), sq)
    # multi-vertex polyline bending around the square without touching
    path = np.array([[-0.5, -0.5], [2.5, -0.5], [2.5, 2.5], [-0.5, 2.5]])
    assert not geom.linestring_intersects_polygon(path, sq)
    # diagonal clip through the bottom edge, no vertex inside
    assert geom.linestring_intersects_polygon(np.array([[1.0, -0.5], [2.5, 1.0]]), sq)
    # line entirely inside a hole: no intersection
    donut = [
        np.array([[-1, -1], [3, -1], [3, 3], [-1, 3], [-1, -1]], dtype=float),
        np.array([[0, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float),
    ]
    assert not geom.linestring_intersects_polygon(np.array([[0.5, 0.5], [1.5, 1.5]]), donut)
    # line from hole into the annulus: intersects
    assert geom.linestring_intersects_polygon(np.array([[0.5, 0.5], [2.9, 0.5]]), donut)


def _h_segments(n, seed, lon0=-122.5, lat0=37.7, span=0.4, lmax=0.05):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        x0 = lon0 + rng.rand() * span
        y = lat0 + rng.rand() * span
        ln = rng.rand() * lmax + 1e-4
        rows.append(
            {"lid": i, "x0": x0, "x1": x0 + ln, "y": y,
             "line": [[x0, y], [x0 + ln, y]]}
        )
    return rows


def test_line_polygon_join_matches_closed_form(spark):
    # horizontal segment vs diamond |u-uc|<=h, |v-vc|<=h has the exact
    # closed form: [x0,x1] ∩ [uc-h-y, uc+h-y] ∩ [vc-h+y, vc+h+y] ≠ ∅
    segs = _h_segments(150, seed=31)
    dias = _diamond_rows(120, seed=32)
    lines = spark.createDataFrame(
        segs, schema="lid long, x0 double, x1 double, y double, line array<array<double>>"
    ).select("lid", "line")
    polys = spark.createDataFrame(
        dias, schema="pid long, cx double, cy double, h double, polygon array<array<array<double>>>"
    ).select("pid", "polygon")
    got = overlap.line_polygon_intersect_join(lines, polys, res=12)
    pairs = [(r.lid_a, r.pid_b) for r in got.select("lid_a", "pid_b").collect()]
    assert len(pairs) == len(set(pairs))
    want = set()
    for s in segs:
        for d in dias:
            uc, vc = d["cx"] + d["cy"], d["cx"] - d["cy"]
            lo = max(s["x0"], uc - d["h"] - s["y"], vc - d["h"] + s["y"])
            hi = min(s["x1"], uc + d["h"] - s["y"], vc + d["h"] + s["y"])
            if lo <= hi:
                want.add((s["lid"], d["pid"]))
    assert set(pairs) == want


# ---------------------------------------------------------------------------
# batched convex SAT kernel + convex join fast path
# ---------------------------------------------------------------------------


def test_convex_batch_matches_general_kernel():
    rng = np.random.RandomState(41)
    hulls = []
    while len(hulls) < 40:
        pts = rng.rand(10, 2) * 1.5 + rng.rand(2) * 1.2
        h = geom.convex_hull(pts)
        if h is not None and len(h) >= 4:
            hulls.append(h)
    pa_l, pb_l, want = [], [], []
    for i in range(len(hulls)):
        for j in range(i + 1, len(hulls)):
            pa_l.append(hulls[i])
            pb_l.append(hulls[j])
            want.append(geom.polygons_intersect([hulls[i]], [hulls[j]]))
    def pad(rings):
        open_r = [r[:-1] for r in rings]
        m = max(len(r) for r in open_r)
        out = np.empty((len(open_r), m, 2))
        for i, r in enumerate(open_r):
            out[i, : len(r)] = r
            out[i, len(r):] = r[-1]
        return out
    got = geom.convex_polygons_intersect_batch(pad(pa_l), pad(pb_l))
    assert got.tolist() == want
    assert 0 < sum(want) < len(want)
    # touching squares and containment
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    cases = np.stack([sq + [2, 0], sq + [2.1, 0], sq * 0.25 + 0.5, sq + [1, 1]])
    base = np.broadcast_to(sq, cases.shape)
    assert geom.convex_polygons_intersect_batch(base, cases).tolist() == [
        True, False, True, True
    ]


def test_polygon_join_convex_fast_path_identical(spark):
    ra, rb = _diamond_rows(120, seed=21), _diamond_rows(100, seed=22)
    schema = "pid long, cx double, cy double, h double, polygon array<array<array<double>>>"
    da = spark.createDataFrame(ra, schema=schema)
    db = spark.createDataFrame(rb, schema=schema)
    slow = overlap.polygon_intersect_join(da, db, res=12)
    fast = overlap.polygon_intersect_join(da, db, res=12, assume_convex=True)
    s = {(r.pid_a, r.pid_b) for r in slow.select("pid_a", "pid_b").collect()}
    f_rows = fast.select("pid_a", "pid_b").collect()
    f = {(r.pid_a, r.pid_b) for r in f_rows}
    assert len(f_rows) == len(f)
    assert s == f


# ---------------------------------------------------------------------------
# streaming overlay: stream of boxes × static zones
# ---------------------------------------------------------------------------


def test_streaming_envelope_assign_matches_batch_and_resumes(spark, tmp_path):
    """Stream-static overlay: drop 1 → drain; drop 2 → restart drains
    ONLY the new file (checkpoint), and the accumulated output equals
    the batch overlay join over everything."""
    import os

    from gtfs_to_geojson_spark.streaming.stream_assign import (
        run_envelope_stream_to_parquet,
    )

    boxes = _boxes(240, seed=51)
    zones = _boxes(60, seed=52)
    zones_df = spark.createDataFrame(zones)

    in_dir, out_dir, ckpt = tmp_path / "in", tmp_path / "out", tmp_path / "ckpt"
    os.makedirs(in_dir)
    half = len(boxes) // 2
    boxes.iloc[:half].to_parquet(in_dir / "drop1.parquet", index=False)

    q = run_envelope_stream_to_parquet(
        spark, str(in_dir), zones_df, str(out_dir), str(ckpt), res=12, timeout_s=120
    )
    q.stop()
    n1 = spark.read.parquet(str(out_dir)).count()

    boxes.iloc[half:].to_parquet(in_dir / "drop2.parquet", index=False)
    q2 = run_envelope_stream_to_parquet(
        spark, str(in_dir), zones_df, str(out_dir), str(ckpt), res=12, timeout_s=120
    )
    q2.stop()

    out = spark.read.parquet(str(out_dir))
    got = [(r.bid_a, r.bid_b) for r in out.select("bid_a", "bid_b").collect()]
    assert len(got) == len(set(got)), "restart reprocessed old drops"
    assert n1 < len(got)
    batch = overlap.envelope_intersect_join(
        spark.createDataFrame(boxes), zones_df, res=12
    )
    want = {(r.bid_a, r.bid_b) for r in batch.select("bid_a", "bid_b").collect()}
    assert set(got) == want == _brute_pairs(boxes, zones)


# ---------------------------------------------------------------------------
# polylines_intersect + line⋈line join
# ---------------------------------------------------------------------------


def test_polylines_intersect_cases():
    h = np.array([[0.0, 0.0], [2.0, 0.0]])
    # proper cross
    assert geom.polylines_intersect(h, np.array([[1.0, -1.0], [1.0, 1.0]]))
    # endpoint touch on interior
    assert geom.polylines_intersect(h, np.array([[1.0, 0.0], [1.0, 3.0]]))
    # endpoint-to-endpoint touch
    assert geom.polylines_intersect(h, np.array([[2.0, 0.0], [3.0, 1.0]]))
    # collinear overlap
    assert geom.polylines_intersect(h, np.array([[1.0, 0.0], [5.0, 0.0]]))
    # parallel, offset — disjoint
    assert not geom.polylines_intersect(h, np.array([[0.0, 0.1], [2.0, 0.1]]))
    # multi-vertex zigzag crossing on its third segment only
    zig = np.array([[0.0, 1.0], [0.5, 2.0], [1.0, 1.0], [1.5, -1.0]])
    assert geom.polylines_intersect(h, zig)
    # same zigzag lifted clear
    assert not geom.polylines_intersect(h, zig + [0.0, 3.0])


def _v_segments(n, seed, lon0=-122.5, lat0=37.7, span=0.4, lmax=0.05):
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        x = lon0 + rng.rand() * span
        y0 = lat0 + rng.rand() * span
        ln = rng.rand() * lmax + 1e-4
        rows.append(
            {"vid": i, "x": x, "y0": y0, "y1": y0 + ln,
             "line": [[x, y0], [x, y0 + ln]]}
        )
    return rows


def test_line_line_join_matches_closed_form(spark):
    # horizontal [x0,x1]×{y} meets vertical {x}×[y0,y1] iff
    # x ∈ [x0,x1] and y ∈ [y0,y1] — exact, no geometry kernel needed
    hs = _h_segments(200, seed=61)
    vs = _v_segments(150, seed=62)
    lines_h = spark.createDataFrame(
        hs, schema="lid long, x0 double, x1 double, y double, line array<array<double>>"
    ).select("lid", "line")
    lines_v = spark.createDataFrame(
        vs, schema="vid long, x double, y0 double, y1 double, line array<array<double>>"
    ).select("vid", "line")
    got = overlap.line_line_intersect_join(lines_h, lines_v, res=12)
    pairs = [(r.lid_a, r.vid_b) for r in got.select("lid_a", "vid_b").collect()]
    assert len(pairs) == len(set(pairs))
    want = {
        (s["lid"], v["vid"])
        for s in hs
        for v in vs
        if s["x0"] <= v["x"] <= s["x1"] and v["y0"] <= s["y"] <= v["y1"]
    }
    assert set(pairs) == want
    assert len(want) > 0


def test_segments_batch_matches_polylines_kernel():
    rng = np.random.RandomState(71)
    B = 4000
    a0 = rng.rand(B, 2) * 2
    a1 = a0 + rng.randn(B, 2) * 0.6
    b0 = rng.rand(B, 2) * 2
    b1 = b0 + rng.randn(B, 2) * 0.6
    got = geom.segments_intersect_batch(a0, a1, b0, b1)
    want = np.array([
        geom.polylines_intersect(np.stack([a0[i], a1[i]]), np.stack([b0[i], b1[i]]))
        for i in range(B)
    ])
    assert np.array_equal(got, want)
    assert 0 < got.sum() < B
    # touch + collinear overlap cases
    h0, h1 = np.array([[0.0, 0.0]]), np.array([[2.0, 0.0]])
    cases = [
        (np.array([[1.0, 0.0]]), np.array([[1.0, 1.0]]), True),   # endpoint on interior
        (np.array([[1.0, 0.0]]), np.array([[5.0, 0.0]]), True),   # collinear overlap
        (np.array([[2.0, 0.0]]), np.array([[3.0, 1.0]]), True),   # endpoint touch
        (np.array([[0.0, 0.1]]), np.array([[2.0, 0.1]]), False),  # parallel offset
    ]
    for c0, c1, want_v in cases:
        assert geom.segments_intersect_batch(h0, h1, c0, c1)[0] == want_v


def test_line_polygon_join_convex_fast_path_identical(spark):
    segs = _h_segments(150, seed=31)
    dias = _diamond_rows(120, seed=32)
    lines = spark.createDataFrame(
        segs, schema="lid long, x0 double, x1 double, y double, line array<array<double>>"
    ).select("lid", "line")
    polys = spark.createDataFrame(
        dias, schema="pid long, cx double, cy double, h double, polygon array<array<array<double>>>"
    ).select("pid", "polygon")
    slow = overlap.line_polygon_intersect_join(lines, polys, res=12)
    fast = overlap.line_polygon_intersect_join(lines, polys, res=12, assume_convex=True)
    s = {(r.lid_a, r.pid_b) for r in slow.select("lid_a", "pid_b").collect()}
    f = {(r.lid_a, r.pid_b) for r in fast.select("lid_a", "pid_b").collect()}
    assert s == f and len(s) > 0
