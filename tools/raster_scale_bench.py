"""1B-point rasterization run (operators/raster.py scale evidence).

Points sit on pixel centers: id → fine-grid pixel (id % 2^24) with a
replication factor of 64 → EVERY occupied pixel must count exactly 64
and the output must be exactly 2^24 rows — the raster-bounded shape
that makes density rasterization viable at 10^12 points (output is
bounded by the raster, input collapses 64× in the map-side partial
aggregate before the only shuffle).

    SPARK_GRAFT_CPUS=8  python tools/raster_scale_bench.py
    SPARK_GRAFT_CPUS=32 python tools/raster_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 32g pyspark-shell")

TILE_RES = 20  # + px_bits 4 → fine res 24; 2^12 × 2^12 pixel region
PX_BITS = 4
GRID = 1 << 12  # occupied region: GRID × GRID fine pixels = 2^24
REPL = 64  # points per pixel → 2^30 ≈ 1.07B points


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import raster
    from gtfs_to_geojson_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="raster-scale-bench",
        shuffle_partitions=cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_px = GRID * GRID
    n_pts = n_px * REPL
    fine = TILE_RES + PX_BITS
    width = 360.0 / (1 << fine)  # fine-cell width in lon degrees
    height = 180.0 / (1 << fine)

    # layout=clustered (default): consecutive ids share a pixel, the
    # way a spatially-written point table arrives — the map-side
    # partial agg collapses REPL× before the shuffle. layout=scattered
    # cycles pixels so NO two rows in a map partition share one (the
    # worst case: the partial agg is pure overhead and the exchange
    # carries ~every row).
    if os.environ.get("SPARK_GRAFT_RASTER_LAYOUT", "clustered") == "scattered":
        pix = F.col("id") % n_px
    else:
        pix = (F.col("id") / REPL).cast("long")
    px = pix % GRID
    py = (pix / GRID).cast("long")
    # pixel centers of a GRID×GRID block starting at fine cell (2^23, 2^23)
    pts = spark.range(n_pts).select(
        ((px + F.lit(1 << 23)).cast("double") + 0.5) * width - 180.0,
        ((py + F.lit(1 << 23)).cast("double") + 0.5) * height - 90.0,
    ).toDF("lon", "lat")

    # warm untimed (JIT + heap growth; see linear_ref_scale_bench.py)
    raster.rasterize_counts(
        spark.range(n_px).select(
            ((F.col("id") % GRID + F.lit(1 << 23)).cast("double") + 0.5) * width - 180.0,
            (((F.col("id") / GRID).cast("long") + F.lit(1 << 23)).cast("double") + 0.5) * height - 90.0,
        ).toDF("lon", "lat"),
        TILE_RES, PX_BITS,
    ).count()

    reps = int(os.environ.get("SPARK_GRAFT_RASTER_REPS", "2"))  # 0 -> pyramid-only
    walls = []
    agg = None
    for _ in range(reps):
        t0 = time.time()
        counts = raster.rasterize_counts(pts, TILE_RES, PX_BITS)
        agg = counts.agg(
            F.count(F.lit(1)).alias("pixels"),
            F.min("n").alias("min_n"),
            F.max("n").alias("max_n"),
            F.sum("n").alias("total"),
        ).collect()[0]
        walls.append(time.time() - t0)
        ok = (
            agg["pixels"] == n_px
            and agg["min_n"] == REPL
            and agg["max_n"] == REPL
            and agg["total"] == n_pts
        )
        if not ok:
            raise SystemExit(f"closed-form check FAILED: {agg}")
    wall = min(walls) if walls else None
    out = {
        "n_points": n_pts,
        "n_pixels": n_px,
        "cpus": cpus,
        "wall_s": round(wall, 2) if wall else None,
        "walls": [round(w, 2) for w in walls],
        "points_per_sec": int(n_pts / wall) if wall else None,
        "exact": agg is not None,
    }

    # ---- full-pyramid pass (VERDICT r4 item 4): iterate
    # pyramid_counts from TILE_RES all the way to res 1, persisting
    # each level (serialized — the NOTES_r4 localCheckpoint lesson)
    # and validating the closed form per level: totals are count-
    # preserving at EVERY level, and the aligned GRID×GRID region
    # (offset 2^23) collapses to exactly max(1, 2^(12-d))² pixels at
    # depth d with a uniform per-pixel count. The level-row total is
    # the ~4/3-of-one-level cost claim, measured.
    # lineage=checkpoint (default) truncates the logical plan per level
    # with an eager localCheckpoint — REQUIRED for a deep iteration:
    # with persist alone the data shrinks 4× per level but the Catalyst
    # plan chain deepens, and analysis/canonicalization goes
    # super-linear (measured level walls with persist: 6.9 s at level 1
    # falling to 0.9 s by level 9, then 95/210/424/481 s at levels
    # 16-20 — 1374 s total for 22M rows). localCheckpoint is safe here
    # because each level is raster-bounded and shrinking (the NOTES_r4
    # 400M-row deserialized-heap caveat doesn't bite); a production
    # tile pipeline writes each level to parquet, which truncates too.
    from pyspark import StorageLevel

    lineage = os.environ.get("SPARK_GRAFT_RASTER_LINEAGE", "checkpoint")

    def freeze(df):
        if lineage == "checkpoint":
            return df.localCheckpoint(eager=True)
        return df.persist(StorageLevel.MEMORY_AND_DISK)

    base = freeze(raster.rasterize_counts(pts, TILE_RES, PX_BITS))
    base.count()  # materialize OUTSIDE the timed pyramid chain
    t0 = time.time()
    level_rows = []
    level_walls = []
    cur = base
    prev = None
    for d in range(1, TILE_RES + 1):
        lt0 = time.time()
        cur = freeze(raster.pyramid_counts(cur, px_bits=PX_BITS))
        agg = cur.agg(
            F.count(F.lit(1)).alias("pixels"),
            F.min("n").alias("min_n"),
            F.max("n").alias("max_n"),
            F.sum("n").alias("total"),
        ).collect()[0]
        if prev is not None and lineage != "checkpoint":
            prev.unpersist()
        prev = cur
        side = max(1, 1 << (12 - d)) if d <= 12 else 1
        want_px = side * side
        want_n = n_pts // want_px
        ok = (
            agg["pixels"] == want_px
            and agg["min_n"] == want_n
            and agg["max_n"] == want_n
            and agg["total"] == n_pts
        )
        level_rows.append(agg["pixels"])
        level_walls.append(round(time.time() - lt0, 2))
        if not ok:
            raise SystemExit(f"pyramid closed-form FAILED at depth {d}: {agg}")
    pyr_wall = time.time() - t0
    if lineage != "checkpoint":
        base.unpersist()
        if prev is not None:
            prev.unpersist()
    out["pyramid"] = {
        "levels": TILE_RES,
        "lineage": lineage,
        "wall_s": round(pyr_wall, 2),
        "level_walls": level_walls,
        "rows_processed": n_px + sum(level_rows[:-1]),
        "rows_vs_one_level": round((n_px + sum(level_rows[:-1])) / n_px, 4),
        "exact_all_levels": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
