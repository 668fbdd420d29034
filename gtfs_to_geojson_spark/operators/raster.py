"""R1 — rasterization: point sets → per-tile pixel-count grids → image
tiles (the geospatial→image direction of the graft; the inverse of
operators/multimodal.py's image→geotag path).

The reference renders GTFS geometry to GeoJSON for a map client to
rasterize (src/lib/formats/lines.ts, stops.ts); a 100-TB engine
renders the density heat-map itself: 10^12 points → bounded tile
pyramid. The op is deliberately TWO stages with different shapes:

* :func:`rasterize_counts` — the scale stage: every point maps to
  (tile, px_x, px_y) with pure bit arithmetic on the cells.py grid
  (a pixel IS a grid cell at ``tile_res + px_bits``; the tile is its
  ancestor), then ONE partially-aggregating groupBy counts pixels.
  Nothing leaves whole-stage codegen; output is at most
  tiles·(2^px_bits)² rows — bounded by the raster, not the input.
  Exact SQL mirror (same floor/shift math) → DuckDB oracle
  ``r1_rasterize_density``.
* :func:`density_tiles` — the render stage: the already-bounded count
  frame groups per tile and an Arrow kernel paints a (2^px_bits)²
  uint8 grid, encoded with the repo's own codecs (images.encode_png —
  no external imaging library in this sandbox, images.py:124). Pixel
  value is min(count, 255) — deterministic, no normalization that
  would couple tiles; a log/percentile stretch belongs client-side.
  Pinned by decode-roundtrip pytest (tests/test_linear_raster.py),
  not by the SQL oracle (DuckDB has no PNG).

y-orientation: row 0 of the image is the NORTHERNMOST pixel row
(standard raster convention), so py = (2^px_bits - 1) - (y_f & mask).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import cells, images


def rasterize_counts(
    points: DataFrame, tile_res: int, px_bits: int = 4
) -> DataFrame:
    """(lon, lat) rows → (tile, px_x, px_y, n) pixel counts. The fine
    grid at ``tile_res + px_bits`` must fit cells.py's 28-res ceiling;
    px_x runs west→east, px_y north→south (raster row order)."""
    fine = tile_res + px_bits
    if fine > cells.MAX_RES:
        raise ValueError(
            f"tile_res {tile_res} + px_bits {px_bits} exceeds MAX_RES {cells.MAX_RES}"
        )
    mask = (1 << px_bits) - 1
    x_f, y_f = cells.xy_col(F.col("lat"), F.col("lon"), fine)
    tile = (
        F.lit(tile_res).cast("long") * F.lit(1 << 58).cast("long")
        + F.shiftright(x_f, px_bits) * F.lit(1 << 29).cast("long")
        + F.shiftright(y_f, px_bits)
    )
    px_x = x_f.bitwiseAND(F.lit(mask))
    px_y = F.lit(mask) - y_f.bitwiseAND(F.lit(mask))
    return (
        points.select(
            tile.alias("tile"), px_x.alias("px_x"), px_y.alias("px_y")
        )
        .groupBy("tile", "px_x", "px_y")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def rasterize_sql(lat_expr: str, lon_expr: str, tile_res: int, px_bits: int = 4) -> str:
    """ANSI-SQL mirror of :func:`rasterize_counts`'s per-point mapping:
    a SELECT-list fragment `tile, px_x, px_y` (DuckDB-oracle parity,
    same style as cells.cell_sql)."""
    fine = tile_res + px_bits
    n = 1 << fine
    mask = (1 << px_bits) - 1
    x = f"CAST(least(greatest(floor(({lon_expr} + 180.0) / 360.0 * {n}), 0), {n - 1}) AS BIGINT)"
    y = f"CAST(least(greatest(floor(({lat_expr} + 90.0) / 180.0 * {n}), 0), {n - 1}) AS BIGINT)"
    tile = (
        f"(CAST({tile_res} AS BIGINT) * {1 << 58} "
        f"+ ({x} // {1 << px_bits}) * {1 << 29} + ({y} // {1 << px_bits}))"
    )
    return (
        f"{tile} AS tile, ({x} % {1 << px_bits}) AS px_x, "
        f"({mask} - ({y} % {1 << px_bits})) AS px_y"
    )


def density_tiles(
    counts: DataFrame, px_bits: int = 4, fmt: str = "png"
) -> DataFrame:
    """Pixel-count rows → one encoded grayscale-in-RGB image per tile.
    Input is :func:`rasterize_counts` output (already raster-bounded);
    the per-tile kernel paints counts clipped at 255 into a
    (2^px_bits)² grid and encodes with the repo codec. Output:
    (tile, image bytes, n_points, max_count)."""
    side = 1 << px_bits
    schema = T.StructType(
        [
            T.StructField("tile", T.LongType()),
            T.StructField("image", T.BinaryType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("max_count", T.LongType()),
        ]
    )

    def paint(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        grid = np.zeros((side, side), dtype=np.int64)
        grid[pdf["px_y"].to_numpy(), pdf["px_x"].to_numpy()] = pdf["n"].to_numpy()
        px = np.minimum(grid, 255).astype(np.uint8)
        rgb = np.repeat(px[:, :, None], 3, axis=2)
        return pd.DataFrame(
            {
                "tile": [key[0]],
                "image": [images.encode(rgb, fmt)],
                "n_points": [int(pdf["n"].sum())],
                "max_count": [int(grid.max())],
            }
        )

    return counts.groupBy("tile").applyInPandas(paint, schema)
