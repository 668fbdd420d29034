"""Z-order layout: clustered write → stats-pruned range read
(operators/layout.py). Verifies (1) exactness of the range read vs a
brute-force cell filter, (2) the range predicate reaches the parquet
scan (PushedFilters), (3) the written files carry disjoint sorted key
ranges — the physical property file/row-group pruning relies on."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_to_geojson_spark import cells
from gtfs_to_geojson_spark.operators import layout


@pytest.fixture(scope="module")
def sorted_path(spark, tmp_path_factory):
    rng = np.random.default_rng(21)
    n = 20_000
    pdf = pd.DataFrame(
        {
            "pid": np.arange(n),
            "lon": rng.uniform(-122.52, -122.35, n),
            "lat": rng.uniform(37.70, 37.84, n),
        }
    )
    path = str(tmp_path_factory.mktemp("layout") / "pts_sorted.parquet")
    layout.write_spatial_sorted(spark.createDataFrame(pdf), path, res=16, n_files=8)
    return path, pdf


def test_read_cell_exact(spark, sorted_path):
    path, pdf = sorted_path
    # pick the cell of a known point at a coarse res
    cell = int(cells.encode(np.asarray([37.78]), np.asarray([-122.41]), 12)[0])
    got = sorted(layout.read_cell(spark, path, cell, data_res=16).toPandas()["pid"])
    want_cells = cells.encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 12)
    want = sorted(pdf["pid"].to_numpy()[want_cells == cell])
    assert got == want and len(want) > 0


def test_range_predicate_pushed_down(spark, sorted_path):
    path, _ = sorted_path
    cell = int(cells.encode(np.asarray([37.78]), np.asarray([-122.41]), 12)[0])
    df = layout.read_cell(spark, path, cell, data_res=16)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThanOrEqual(_mkey" in plan


def test_files_have_disjoint_sorted_ranges(sorted_path):
    import glob

    import pyarrow.parquet as pq

    path, _ = sorted_path
    ranges = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index(
            layout.MORTON_COL
        )
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (range partitioning) and sorted


def test_cover_range_predicate_merges(spark, sorted_path):
    path, pdf = sorted_path
    # two adjacent res-12 cells -> predicate should still be exact
    c0 = int(cells.encode(np.asarray([37.78]), np.asarray([-122.41]), 12)[0])
    _, x, y = cells.decode(np.asarray([c0]))
    c1 = int(cells.pack(12, int(x[0]) + 1, int(y[0])))
    pred = layout.cover_range_predicate([c0, c1], data_res=16)
    got = sorted(spark.read.parquet(path).filter(pred).toPandas()["pid"])
    want_cells = cells.encode(pdf["lat"].to_numpy(), pdf["lon"].to_numpy(), 12)
    want = sorted(pdf["pid"].to_numpy()[np.isin(want_cells, [c0, c1])])
    assert got == want


def test_scan_pruned_polygon_join_is_exact(spark, sorted_path):
    """Layout-pruned J7 == full-table J7: pruning changes the scan,
    not the join result."""
    from gtfs_to_geojson_spark.operators import spatial

    path, pdf = sorted_path
    # a polygon inside the fixture's bbox
    poly = [[
        [-122.45, 37.74], [-122.39, 37.74], [-122.39, 37.80],
        [-122.45, 37.80], [-122.45, 37.74],
    ]]
    polys_df = spark.createDataFrame(
        pd.DataFrame({"poly_id": [0], "polygon": [poly]}),
        schema="poly_id long, polygon array<array<array<double>>>",
    )
    pruned_pts = layout.read_polygon_candidates(
        spark, path, [poly], cover_res=12, data_res=16
    )
    n_pruned = pruned_pts.count()
    assert 0 < n_pruned < 20_000  # genuinely pruned
    full_pts = spark.read.parquet(path)
    got = sorted(
        spatial.point_in_polygon_join(pruned_pts, polys_df, res=14)
        .toPandas()["pid"]
    )
    want = sorted(
        spatial.point_in_polygon_join(full_pts, polys_df, res=14)
        .toPandas()["pid"]
    )
    assert got == want and len(want) > 0
