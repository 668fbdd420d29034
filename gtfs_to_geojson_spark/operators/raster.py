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


def pyramid_counts(
    counts: DataFrame, tile_res: int | None = None, px_bits: int = 4
) -> DataFrame:
    """One pyramid level up: (tile, px_x, px_y, n) → the same raster
    one resolution coarser. A parent pixel covers a 2×2 block of child
    pixels, so the rollup is pure integer arithmetic on the GLOBAL
    fine-grid coordinates (x_f = tile_x·2^b + px_x, halved) plus ONE
    partially-aggregating sum — count-preserving by construction (the
    driver oracle's GROUP BY re-derives it from the same child table).
    Iterate for a full pyramid; each level's output is 4× smaller, so
    a z0..z14 pyramid costs ~4/3 of one level — measured exactly at
    2^30 points / 20 levels (BENCH/ROBUSTNESS.md §full pyramid).

    When iterating MANY levels, break lineage at each level (eager
    ``localCheckpoint`` or a per-level parquet write, which a tile
    server does anyway): the data shrinks 4× per level but the chained
    Catalyst plan deepens, and past ~14 unbroken levels analysis cost
    explodes super-linearly (measured 1374 s vs 21.6 s for the same
    20-level pyramid — the ROBUSTNESS lineage-cliff row).

    The child resolution is DERIVED from each tile id's own res bits
    (shiftright(tile, 58)), same contract as :func:`pyramid_tiles` —
    so heterogeneous inputs roll up correctly and a caller can't emit
    parents with an inconsistent res prefix (ADVICE r4). Passing
    ``tile_res`` adds a per-row assertion that every tile actually is
    at that res; res-0 children raise (nothing coarser exists).

    The north-up pixel convention survives the halving: px_y stores
    (mask − y_f&mask), so y_f is recovered, halved, and re-flipped —
    pinned against rasterize_counts at the coarser res by pytest.
    """
    mask = (1 << px_bits) - 1
    tres = F.shiftright(F.col("tile"), 58)
    ok = tres >= F.lit(1)
    msg = "pyramid_counts: child tiles at res 0 have no parent"
    if tile_res is not None:
        if tile_res < 1:
            raise ValueError(msg)
        ok = ok & (tres == F.lit(int(tile_res)))
        msg = f"pyramid_counts: tile res bits != declared tile_res {tile_res}"
    tile_x = F.shiftright(F.col("tile"), 29).bitwiseAND(F.lit((1 << 29) - 1))
    tile_y = F.col("tile").bitwiseAND(F.lit((1 << 29) - 1))
    x_f = F.shiftleft(tile_x, px_bits) + F.col("px_x")
    y_f = F.shiftleft(tile_y, px_bits) + (F.lit(mask) - F.col("px_y"))
    xp, yp = F.shiftright(x_f, 1), F.shiftright(y_f, 1)
    parent = F.when(
        ok,
        (tres - F.lit(1)).cast("long") * F.lit(1 << 58).cast("long")
        + F.shiftright(xp, px_bits) * F.lit(1 << 29).cast("long")
        + F.shiftright(yp, px_bits),
    ).otherwise(F.raise_error(F.lit(msg)))
    return (
        counts.select(
            parent.alias("tile"),
            xp.bitwiseAND(F.lit(mask)).alias("px_x"),
            (F.lit(mask) - yp.bitwiseAND(F.lit(mask))).alias("px_y"),
            "n",
        )
        .groupBy("tile", "px_x", "px_y")
        .agg(F.sum("n").alias("n"))
    )


def pyramid_sql(tile_res: int, px_bits: int = 4) -> str:
    """ANSI-SQL mirror of :func:`pyramid_counts`'s index arithmetic
    over a child table with columns (tile, px_x, px_y, n)."""
    mask = (1 << px_bits) - 1
    tx = f"((tile // {1 << 29}) % {1 << 29})"
    ty = f"(tile % {1 << 29})"
    xf = f"({tx} * {1 << px_bits} + px_x)"
    yf = f"({ty} * {1 << px_bits} + ({mask} - px_y))"
    xp, yp = f"({xf} // 2)", f"({yf} // 2)"
    parent = (
        f"(CAST({tile_res - 1} AS BIGINT) * {1 << 58} "
        f"+ ({xp} // {1 << px_bits}) * {1 << 29} + ({yp} // {1 << px_bits}))"
    )
    return (
        f"{parent} AS tile, ({xp} % {1 << px_bits}) AS px_x, "
        f"({mask} - ({yp} % {1 << px_bits})) AS px_y"
    )


def pyramid_tiles(tiles: DataFrame, px_bits: int = 4, fmt: str = "png") -> DataFrame:
    """One IMAGE pyramid level up: rendered (tile, image) rows at some
    tile_res → parent tiles at tile_res − 1. Each parent decodes its
    ≤4 children, mosaics them into a 2·side × 2·side quadrant grid
    (absent children are black), and downsamples 2×2 blocks by floor
    mean — deterministic integer math, decode/encode via the repo
    codec only. Grouping is by parent tile id (pure bit arithmetic),
    so a level is ONE shuffle of the already-raster-bounded tile set.
    """
    side = 1 << px_bits
    mask = (1 << px_bits) - 1

    tile_x = F.shiftright(F.col("tile"), 29).bitwiseAND(F.lit((1 << 29) - 1))
    tile_y = F.col("tile").bitwiseAND(F.lit((1 << 29) - 1))
    tres = F.shiftright(F.col("tile"), 58)
    # res-0 children have no parent — tres-1 would pack -1 into the
    # res bit field and emit a garbage tile id (ADVICE r4)
    parent = F.when(
        tres >= F.lit(1),
        (tres - F.lit(1)).cast("long") * F.lit(1 << 58).cast("long")
        + F.shiftright(tile_x, 1) * F.lit(1 << 29).cast("long")
        + F.shiftright(tile_y, 1),
    ).otherwise(
        F.raise_error(F.lit("pyramid_tiles: child tiles at res 0 have no parent"))
    )
    # child quadrant inside the parent: qx = tile_x & 1 (west/east),
    # qy = tile_y & 1 (south/north; row 0 of the mosaic is NORTH)
    kids = tiles.select(
        parent.alias("tile"),
        tile_x.bitwiseAND(F.lit(1)).cast("int").alias("_qx"),
        tile_y.bitwiseAND(F.lit(1)).cast("int").alias("_qy"),
        "image",
    )
    schema = T.StructType(
        [
            T.StructField("tile", T.LongType()),
            T.StructField("image", T.BinaryType()),
            T.StructField("n_children", T.IntegerType()),
        ]
    )

    def merge(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        mosaic = np.zeros((2 * side, 2 * side, 3), dtype=np.uint8)
        for _, row in pdf.iterrows():
            img = images.decode(bytes(row["image"]), fmt)
            r0 = (1 - row["_qy"]) * side  # north (qy=1) is the top rows
            c0 = row["_qx"] * side
            mosaic[r0 : r0 + side, c0 : c0 + side] = img
        m = mosaic.astype(np.uint32)
        down = (
            m[0::2, 0::2] + m[0::2, 1::2] + m[1::2, 0::2] + m[1::2, 1::2]
        ) // 4
        return pd.DataFrame(
            {
                "tile": [key[0]],
                "image": [images.encode(down.astype(np.uint8), fmt)],
                "n_children": [len(pdf)],
            }
        )

    return kids.groupBy("tile").applyInPandas(merge, schema)


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
