"""Spatial data layout: Z-order (Morton) clustered writes + range-pruned
reads (engine-new; no reference analog — the reference's SQLite storage
has no spatial layout at all).

Why this exists at 100 TB: every spatial operator in this engine
(J6–J9) starts by prejoining on grid cells. On a table that large the
dominant cost is the SCAN, and the scan only gets cheap if rows that
are close in space are close in storage. Sorting by the packed cell id
(row-major x·2^29+y) gives locality in x only; sorting by the Morton
key gives two-dimensional locality AND the contiguity property
(cells.morton_range_for_cell): any coarser cell = one contiguous key
range, so "rows inside this cell / this cover" becomes a BETWEEN
predicate that the parquet reader prunes with min/max statistics at
file and row-group granularity — before any spatial predicate runs.

The write path is plain Spark: repartitionByRange on the key (range
partitioning = globally sorted file boundaries) + sortWithinPartitions
(sorted row groups inside each file). No custom committer, no
metastore: the layout IS the index, carried entirely by parquet stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cells

MORTON_COL = "_mkey"


def with_morton_key(
    df: DataFrame,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    key_col: str = MORTON_COL,
) -> DataFrame:
    """Attach the Z-order key (pure Column expression — codegen)."""
    return df.withColumn(key_col, cells.morton_col(F.col(lat_col), F.col(lon_col), res))


def write_spatial_sorted(
    df: DataFrame,
    path: str,
    res: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    n_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` Z-order-clustered: range-repartition on the Morton
    key (one shuffle — the same shuffle any global sort pays) then sort
    within partitions, so both the file set and each file's row groups
    carry tight, disjoint min/max key ranges."""
    keyed = with_morton_key(df, res, lon_col, lat_col)
    (
        keyed.repartitionByRange(n_files, MORTON_COL)
        .sortWithinPartitions(MORTON_COL)
        .write.mode(mode)
        .parquet(path)
    )


def cell_range_predicate(cell: int, data_res: int, key_col: str = MORTON_COL) -> Column:
    """BETWEEN predicate selecting every row whose data-res Morton key
    falls inside ``cell`` (any resolution <= data_res). Pushed down to
    the parquet scan (shows as PushedFilters: GreaterThanOrEqual/
    LessThanOrEqual on the key column)."""
    lo, hi = cells.morton_range_for_cell(cell, data_res)
    return (F.col(key_col) >= F.lit(lo)) & (F.col(key_col) <= F.lit(hi))


def read_cell(
    spark: SparkSession, path: str, cell: int, data_res: int
) -> DataFrame:
    """Scan only the rows inside ``cell`` from a spatial-sorted table —
    candidate superset via the range predicate (stats-pruned scan);
    compose an exact residual on top exactly like the cell prejoins."""
    return spark.read.parquet(path).filter(cell_range_predicate(cell, data_res))


def cover_range_predicate(
    cover_cells, data_res: int, key_col: str = MORTON_COL
) -> Column:
    """OR of Morton ranges for a list of cover cells, coalescing
    adjacent/overlapping ranges first — a polygon's cover at a coarse
    res becomes a handful of BETWEENs, each independently prunable."""
    ranges = sorted(
        cells.morton_range_for_cell(int(c), data_res) for c in cover_cells
    )
    merged: list[list[int]] = []
    for lo, hi in ranges:
        if merged and lo <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], hi)
        else:
            merged.append([lo, hi])
    pred = None
    for lo, hi in merged:
        p = (F.col(key_col) >= F.lit(lo)) & (F.col(key_col) <= F.lit(hi))
        pred = p if pred is None else pred | p
    return pred if pred is not None else F.lit(False)


def read_polygon_candidates(
    spark: SparkSession,
    path: str,
    polygons,
    cover_res: int,
    data_res: int,
):
    """Scan-pruned spatial-join front end: given polygon rings (driver-
    side list — the broadcast-dim side), compute their cell cover at
    ``cover_res``, coalesce to Morton ranges at ``data_res``, and read
    ONLY the matching slices of a Z-order-clustered point table. The
    result is a candidate superset of any join against those polygons —
    feed it to point_in_polygon_join / point_in_envelope_join exactly
    as if it were the full table; pruning changed the scan, not the
    semantics. At 10^12 rows this is the difference between scanning
    the planet and scanning the city the polygons live in."""
    import numpy as np

    from .. import geometry as geom

    cover: set[int] = set()
    for rings in polygons:
        outer = np.asarray(
            [[float(c[0]), float(c[1])] for c in rings[0]], dtype=np.float64
        )
        mnx, mny, mxx, mxy = geom.bbox(outer)
        cover.update(cells.cover_bbox(mnx, mny, mxx, mxy, cover_res).tolist())
    pred = cover_range_predicate(sorted(cover), data_res)
    return spark.read.parquet(path).filter(pred)
