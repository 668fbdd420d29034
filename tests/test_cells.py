"""Cell-grid index unit + property tests (SURVEY.md §5 item 1/4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from gtfs_to_geojson_spark import cells


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(42)
    lat = rng.uniform(-89.9, 89.9, 2000)
    lon = rng.uniform(-179.9, 179.9, 2000)
    for res in (0, 5, 12, 20, 28):
        c = cells.encode(lat, lon, res)
        r, x, y = cells.decode(c)
        assert np.all(r == res)
        mnx, mny, mxx, mxy = cells.cell_bounds(c)
        assert np.all((lon >= mnx - 1e-9) & (lon <= mxx + 1e-9))
        assert np.all((lat >= mny - 1e-9) & (lat <= mxy + 1e-9))


def test_parent_consistency():
    rng = np.random.default_rng(7)
    lat = rng.uniform(-89, 89, 500)
    lon = rng.uniform(-179, 179, 500)
    c12 = cells.encode(lat, lon, 12)
    assert np.array_equal(cells.parent(c12, 8), cells.encode(lat, lon, 8))


def test_children_invert_parent():
    c = int(cells.encode(np.asarray([37.7]), np.asarray([-122.4]), 6)[0])
    kids = cells.children(c, 9)
    assert len(kids) == 64
    assert np.all(cells.parent(kids, 6) == c)


def test_kring_sizes_and_membership():
    c = int(cells.encode(np.asarray([37.7]), np.asarray([-122.4]), 10)[0])
    k0 = cells.kring(c, 0)
    assert list(k0) == [c]
    k1 = cells.kring(c, 1)
    assert c in k1 and len(k1) == 9
    assert len(cells.ring(c, 1)) == 8


def test_kring_pole_clamp_and_wrap():
    # near the pole: rows above clamp away
    c = int(cells.encode(np.asarray([89.99]), np.asarray([0.0]), 10)[0])
    k = cells.kring(c, 1)
    assert len(k) == 6  # top row clamped
    # antimeridian wrap
    c2 = int(cells.encode(np.asarray([0.0]), np.asarray([-179.999]), 10)[0])
    k2 = cells.kring(c2, 1)
    assert len(k2) == 9  # wrapped, not clamped


def test_cover_bbox_superset():
    rng = np.random.default_rng(3)
    for _ in range(50):
        mnx, mny = rng.uniform(-179, 178), rng.uniform(-89, 88)
        mxx, mxy = mnx + rng.uniform(0, 1), mny + rng.uniform(0, 1)
        cov = set(cells.cover_bbox(mnx, mny, mxx, mxy, 10).tolist())
        pts_lon = rng.uniform(mnx, mxx, 50)
        pts_lat = rng.uniform(mny, mxy, 50)
        enc = cells.encode(pts_lat, pts_lon, 10)
        assert set(enc.tolist()) <= cov


@given(
    lat=st.floats(-90, 90, allow_nan=False),
    lon=st.floats(-180, 180, allow_nan=False),
    res=st.integers(0, 28),
)
@settings(max_examples=200, deadline=None)
def test_encode_in_bounds_hypothesis(lat, lon, res):
    c = cells.encode(np.asarray([lat]), np.asarray([lon]), res)
    r, x, y = cells.decode(c)
    n = 1 << res
    assert 0 <= x[0] < n and 0 <= y[0] < n and r[0] == res


def test_spark_column_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(11)
    pdf = pd.DataFrame({"lat": rng.uniform(-89, 89, 1000), "lon": rng.uniform(-179, 179, 1000)})
    df = spark.createDataFrame(pdf)
    for res in (4, 12, 20):
        got = np.asarray(
            [r[0] for r in df.select(cells.cell_col(F.col("lat"), F.col("lon"), res)).collect()]
        )
        want = cells.encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), res)
        assert np.array_equal(got, want)
        # parent_col matches too
        pc = df.select(
            cells.parent_col(cells.cell_col(F.col("lat"), F.col("lon"), res), res, res - 3)
        ).collect()
        assert np.array_equal(np.asarray([r[0] for r in pc]), cells.encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), res - 3))


def test_morton_interleave_and_hierarchy():
    # known value: x=0b101 at odd bits, y=0b011 at even bits
    assert int(cells.morton(np.asarray([0b101]), np.asarray([0b011]))[0]) == 0b100111
    rng = np.random.default_rng(11)
    lat = rng.uniform(-89.9, 89.9, 1000)
    lon = rng.uniform(-179.9, 179.9, 1000)
    m14 = cells.morton_encode(lat, lon, 14)
    # hierarchy: coarse morton == fine morton >> 2d
    assert np.array_equal(cells.morton_encode(lat, lon, 8), m14 >> 12)
    # morton is a bijection of (x, y): decode odd/even bits back
    _, x, y = cells.decode(cells.encode(lat, lon, 14))
    assert np.array_equal(cells.morton(x, y), m14)


def test_morton_range_covers_exactly_children():
    c = int(cells.encode(np.asarray([48.85]), np.asarray([2.35]), 9)[0])
    lo, hi = cells.morton_range_for_cell(c, 13)
    kids = cells.children(c, 13)
    _, kx, ky = cells.decode(kids)
    km = np.sort(cells.morton(kx, ky))
    assert km[0] == lo and km[-1] == hi
    assert len(km) == hi - lo + 1  # contiguous, no gaps
    # a sibling cell's range is disjoint
    sib = int(cells.pack(9, (int(kx[0]) >> 4) + 1, int(ky[0]) >> 4))
    lo2, hi2 = cells.morton_range_for_cell(sib, 13)
    assert hi < lo2 or hi2 < lo


def test_morton_col_matches_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-89.9, 89.9, 500), "lon": rng.uniform(-179.9, 179.9, 500)}
    )
    df = spark.createDataFrame(pdf)
    got = (
        df.select(cells.morton_col(F.col("lat"), F.col("lon"), 14).alias("m"))
        .toPandas()["m"]
        .to_numpy()
    )
    assert np.array_equal(got, cells.morton_encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 14))


def test_cell_sql_is_valid_spark_sql_too(spark):
    """cell_sql/morton_sql are written in the common SQL dialect: the
    same text runs under Spark SQL and matches the Column
    implementations — the DataFrame/SQL duality the engine promises
    (one function, three engines: numpy, Column, SQL)."""
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(23)
    pdf = pd.DataFrame(
        {"lat": rng.uniform(-89.9, 89.9, 300), "lon": rng.uniform(-179.9, 179.9, 300)}
    )
    spark.createDataFrame(pdf).createOrReplaceTempView("pts_sqltest")
    got = spark.sql(
        f"SELECT {cells.cell_sql('lat', 'lon', 12)} AS c, "
        f"{cells.morton_sql('lat', 'lon', 12)} AS m FROM pts_sqltest"
    ).toPandas()
    want_c = cells.encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 12)
    want_m = cells.morton_encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 12)
    assert np.array_equal(got["c"].to_numpy(), want_c)
    assert np.array_equal(got["m"].to_numpy(), want_m)


@settings(max_examples=200, deadline=None)
@given(
    lat=st.floats(min_value=-89.99, max_value=89.99),
    lon=st.floats(min_value=-179.99, max_value=179.99),
    res=st.integers(min_value=2, max_value=24),
    d=st.integers(min_value=0, max_value=6),
)
def test_morton_hierarchy_property(lat, lon, res, d):
    """∀ point, res, d ≤ res: morton at res−d == morton at res >> 2d,
    and the point's fine Morton key lies inside its own parent cell's
    Morton range — the algebra the layout pruning relies on."""
    fine = int(cells.morton_encode(np.asarray([lat]), np.asarray([lon]), res)[0])
    coarse_res = res - min(d, res)
    coarse = int(cells.morton_encode(np.asarray([lat]), np.asarray([lon]), coarse_res)[0])
    assert coarse == fine >> (2 * (res - coarse_res))
    parent_cell = int(cells.encode(np.asarray([lat]), np.asarray([lon]), coarse_res)[0])
    lo, hi = cells.morton_range_for_cell(parent_cell, res)
    assert lo <= fine <= hi
