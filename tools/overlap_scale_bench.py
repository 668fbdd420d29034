"""Heavy overlay-join run (operators/overlap.py scale evidence).

Synthesizes two A×A lattices of boxes (left on integer lattice points,
right offset by half a step — each right box overlaps exactly its 4
surrounding left boxes), plus a deterministic hot cell (h duplicate
boxes stacked on one interior lattice point on BOTH sides), runs
envelope_intersect_join at local[$SPARK_GRAFT_CPUS], and validates the
pair count against the exact closed form

    pairs = (2A - 1)^2 + 8h + h^2

(the (2A-1)^2 term is the lattice: each of the A^2 right boxes matches
its in-range subset of 4 neighbors, which telescopes to (2A-1)^2; each
hot-side duplicate re-matches the 4 originals → 8h; the duplicates
cross-match each other → h^2). A second run with
SPARK_GRAFT_OVERLAP_SALT_TARGET set splits the hot cell's h×h
candidate block across adaptive salt lanes and must return the
identical count.

Run once per parallelism level (fresh JVM each, same methodology as
tools/bench_scaling.py) and paste both JSON lines into
BENCH/ROBUSTNESS.md:

    SPARK_GRAFT_CPUS=8  python tools/overlap_scale_bench.py
    SPARK_GRAFT_CPUS=32 python tools/overlap_scale_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

# plain `python` launch gets a 1g driver heap (NOTES_r4 lesson) — the
# 20M-polygon shuffled-hash build needs real memory on this 128 GiB host
os.environ.setdefault("PYSPARK_SUBMIT_ARGS", "--driver-memory 16g pyspark-shell")

STEP = 0.001  # lattice spacing in degrees
HALF = 0.0003  # box half-width: 2*HALF=0.0006 >= STEP/2 → 4-neighbor overlap
LON0, LAT0 = -60.0, 10.0
RES = 18  # cell ≈ 0.00137° — each box covers 1-2 cells per axis


HALF_D = 0.0003  # left diamond half-diagonal
H_EVEN = 0.0003  # right half-diagonal, even-parity cells: candidate but reject
H_ODD = 0.00075  # right half-diagonal, odd-parity cells: accept


def main():
    import numpy as np
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import overlap
    from gtfs_to_geojson_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    a = int(os.environ.get("SPARK_GRAFT_OVERLAP_A", "3163"))  # A^2 ≈ 10M per side
    hot = int(os.environ.get("SPARK_GRAFT_OVERLAP_HOT", "10000"))
    salt_target = int(os.environ.get("SPARK_GRAFT_OVERLAP_SALT_TARGET", "0"))
    # mode=diamond: polygon_intersect_join over diamonds whose
    # half-diagonal alternates with cell parity, sized so EVERY
    # neighbor pair is a bbox candidate but only odd-parity right
    # diamonds pass the exact residual — the rejection path runs on
    # ~half the candidate stream. convex=1 uses the batched SAT kernel.
    mode = os.environ.get("SPARK_GRAFT_OVERLAP_MODE", "box")
    convex = os.environ.get("SPARK_GRAFT_OVERLAP_CONVEX", "0") == "1"

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="overlap-scale-bench",
        shuffle_partitions=cpus * 4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
            "spark.python.worker.faulthandler.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    def lattice(n_side: int, offset: float, id_base: int):
        ids = spark.range(0, n_side * n_side, 1, cpus * 4)
        i = (F.col("id") % n_side).cast("double")
        j = (F.col("id") / n_side).cast("long").cast("double")
        cx = F.lit(LON0) + (i + F.lit(offset)) * F.lit(STEP)
        cy = F.lit(LAT0) + (j + F.lit(offset)) * F.lit(STEP)
        return ids.select(
            (F.col("id") + id_base).alias("bid"),
            (cx - F.lit(HALF)).alias("min_lon"),
            (cx + F.lit(HALF)).alias("max_lon"),
            (cy - F.lit(HALF)).alias("min_lat"),
            (cy + F.lit(HALF)).alias("max_lat"),
        )

    def hot_dups(n: int, offset: float, id_base: int):
        # n duplicates of the box at interior lattice point (A//2, A//2)
        i0 = a // 2
        cx = LON0 + (i0 + offset) * STEP
        cy = LAT0 + (i0 + offset) * STEP
        return spark.range(0, n, 1, cpus).select(
            (F.col("id") + id_base).alias("bid"),
            F.lit(cx - HALF).alias("min_lon"),
            F.lit(cx + HALF).alias("max_lon"),
            F.lit(cy - HALF).alias("min_lat"),
            F.lit(cy + HALF).alias("max_lat"),
        )

    if mode == "segment":
        # left: horizontal segments of length 0.7·STEP at every lattice
        # point. right, by cell parity: odd → vertical segment through
        # the matching h-segment (exactly one hit, never a neighbor);
        # even → a diagonal whose bbox overlaps the h-segment's but
        # which passes beyond its right end (candidate, exact reject).
        # candidates = A², accepted = #odd-parity cells.
        def h_segments():
            ids = spark.range(0, a * a, 1, cpus * 4)
            i = (F.col("id") % a).cast("double")
            j = (F.col("id") / a).cast("long").cast("double")
            x0 = F.lit(LON0) + i * F.lit(STEP)
            y = F.lit(LAT0) + j * F.lit(STEP)
            pt = lambda x, yy: F.array(x, yy)  # noqa: E731
            return ids.select(
                F.col("id").alias("bid"),
                F.array(pt(x0, y), pt(x0 + F.lit(0.7 * STEP), y)).alias("line"),
            )

        def r_segments():
            ids = spark.range(0, a * a, 1, cpus * 4)
            il = F.col("id") % a
            jl = (F.col("id") / a).cast("long")
            i = il.cast("double")
            j = jl.cast("double")
            odd = (il + jl) % 2 == 1
            pt = lambda x, yy: F.array(x, yy)  # noqa: E731
            vx = F.lit(LON0) + (i + F.lit(0.25)) * F.lit(STEP)
            vy0 = F.lit(LAT0) + (j - F.lit(0.25)) * F.lit(STEP)
            vy1 = F.lit(LAT0) + (j + F.lit(0.25)) * F.lit(STEP)
            dx0 = F.lit(LON0) + (i + F.lit(0.6)) * F.lit(STEP)
            dx1 = F.lit(LON0) + (i + F.lit(0.9)) * F.lit(STEP)
            dy0 = F.lit(LAT0) + (j - F.lit(0.1)) * F.lit(STEP)
            dy1 = F.lit(LAT0) + (j + F.lit(0.1)) * F.lit(STEP)
            line = F.when(odd, F.array(pt(vx, vy0), pt(vx, vy1))).otherwise(
                F.array(pt(dx0, dy0), pt(dx1, dy1))
            )
            return ids.select(F.col("id").alias("bid"), line.alias("line"))

        ii, jj = np.meshgrid(np.arange(a), np.arange(a), indexing="ij")
        want = int(((ii + jj) % 2 == 1).sum())

        t0 = time.time()
        joined = overlap.line_line_intersect_join(h_segments(), r_segments(), res=RES)
        got = joined.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        wall = round(time.time() - t0, 3)
        print(
            json.dumps(
                {
                    "metric": "overlap_segment_join",
                    "cpus": cpus,
                    "A": a,
                    "n_segments": 2 * a * a,
                    "candidates": a * a,
                    "pairs": got,
                    "pairs_expected": want,
                    "exact": got == want,
                    "wall_s": wall,
                    "candidates_per_sec": round(a * a / wall, 1),
                }
            )
        )
        if got != want:
            raise SystemExit(f"pair count mismatch: got {got} want {want}")
        return

    if mode == "diamond":
        def diamonds(n_side: int, offset: float):
            ids = spark.range(0, n_side * n_side, 1, cpus * 4)
            i = (F.col("id") % n_side).cast("double")
            j = (F.col("id") / n_side).cast("long").cast("double")
            cx = F.lit(LON0) + (i + F.lit(offset)) * F.lit(STEP)
            cy = F.lit(LAT0) + (j + F.lit(offset)) * F.lit(STEP)
            if offset == 0.0:
                h = F.lit(HALF_D)
            else:
                odd = (F.col("id") % n_side + (F.col("id") / n_side).cast("long")) % 2 == 1
                h = F.when(odd, F.lit(H_ODD)).otherwise(F.lit(H_EVEN))
            pt = lambda x, y: F.array(x, y)  # noqa: E731
            ring = F.array(
                pt(cx, cy - h), pt(cx + h, cy), pt(cx, cy + h), pt(cx - h, cy), pt(cx, cy - h)
            )
            return ids.select(F.col("id").alias("bid"), F.array(ring).alias("polygon"))

        # exact ground truth, vectorized: only odd-parity right diamonds
        # pass (h_l + h_odd >= STEP); each counts its in-range neighbors
        ii, jj = np.meshgrid(np.arange(a), np.arange(a), indexing="ij")
        odd = (ii + jj) % 2 == 1
        n_nb = (2 - (ii == a - 1)) * (2 - (jj == a - 1))
        want = int(n_nb[odd].sum())
        assert HALF_D + H_ODD >= STEP > HALF_D + H_EVEN >= STEP / 2

        t0 = time.time()
        joined = overlap.polygon_intersect_join(
            diamonds(a, 0.0), diamonds(a, 0.5), res=RES, assume_convex=convex
        )
        got = joined.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
        wall = round(time.time() - t0, 3)
        candidates = (2 * a - 1) ** 2
        print(
            json.dumps(
                {
                    "metric": "overlap_polygon_join",
                    "cpus": cpus,
                    "A": a,
                    "convex_kernel": convex,
                    "n_polygons": 2 * a * a,
                    "candidates": candidates,
                    "pairs": got,
                    "pairs_expected": want,
                    "exact": got == want,
                    "wall_s": wall,
                    "candidates_per_sec": round(candidates / wall, 1),
                }
            )
        )
        if got != want:
            raise SystemExit(f"pair count mismatch: got {got} want {want}")
        return

    left = lattice(a, 0.0, 0).unionAll(hot_dups(hot, 0.0, 10 * a * a))
    right = lattice(a, 0.5, 0).unionAll(hot_dups(hot, 0.5, 10 * a * a))
    # hot duplicates sit at lattice (A//2)+offset — the left dups copy
    # left box (A//2, A//2), the right dups copy right box (A//2, A//2),
    # and those two overlap each other, so the closed form applies.

    want = (2 * a - 1) ** 2 + 8 * hot + hot * hot

    t0 = time.time()
    joined = overlap.envelope_intersect_join(
        left,
        right,
        res=RES,
        salt_target_rows=salt_target or None,
        left_id="bid" if salt_target else None,
    )
    got = joined.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
    wall = round(time.time() - t0, 3)

    ok = got == want
    n_boxes = 2 * (a * a + hot)
    print(
        json.dumps(
            {
                "metric": "overlap_envelope_join",
                "cpus": cpus,
                "A": a,
                "hot": hot,
                "salt_target": salt_target,
                "n_boxes": n_boxes,
                "pairs": got,
                "pairs_expected": want,
                "exact": ok,
                "wall_s": wall,
                "boxes_per_sec": round(n_boxes / wall, 1),
            }
        )
    )
    if not ok:
        raise SystemExit(f"pair count mismatch: got {got} want {want}")


if __name__ == "__main__":
    main()
