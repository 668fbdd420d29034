"""kNN strategy-regime comparison → BENCH/KNN_REGIMES.md.

Times every applicable kNN physical strategy on the same (points,
targets) input at several target-side sizes AND at several point-side
densities, so the auto-selector's thresholds
(spatial.KNN_BROADCAST_MAX_TARGETS < grid ≤ spatial.KNN_GRID_MAX_TARGETS
< ring) are evidence, not guesses — the r2 VERDICT flagged that the
grid↔ring crossover was calibrated at one density only (the ×9 target
replication is fixed-cost, but ring round count is density-dependent).
Run manually per round:

    python tools/knn_regime_bench.py [--cpus 16] [--n-points 600000,6000000]

Inputs are well-chunked /tmp parquet caches (same single-file-source
rationale as bench.py); each (strategy, size) is best-of-2 fresh runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cache_points(spark, n: int, tag: str, id_col: str, lon: str, lat: str) -> str:
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.plans import oracle_queries as OQ

    path = f"/tmp/spark_graft_knnreg_{tag}_{n}.parquet"
    if os.path.exists(path):
        return path
    key = F.col("id") * 7 + 3 if tag == "tgt" else F.col("id") * 37 + 11
    spark.range(n).select(
        F.col("id").alias(id_col),
        OQ.lon_col(key).alias(lon),
        OQ.lat_col(key).alias(lat),
    ).repartition(64).write.mode("overwrite").parquet(path)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument(
        "--n-points", type=str, default="600000,6000000",
        help="comma-separated point-side densities to sweep",
    )
    ap.add_argument("--k", type=int, default=1)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    densities = [int(x) for x in args.n_points.split(",")]

    from gtfs_to_geojson_spark.operators import spatial
    from gtfs_to_geojson_spark.session import get_spark

    spark = get_spark(
        app_name="knn-regime-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    sizes = [50_000, 200_000, 1_000_000, 4_000_000]
    # the product-cap cell (4.8M x 1k, product 4.8e9) is pinned into
    # every regeneration: it is the measured evidence that the
    # broadcast cutoff is a points-x-targets PRODUCT (r3) — a tiny
    # target side must broadcast even against a multi-million-point
    # side (measured: broadcast 5.2s vs grid 12.7s vs ring 22.9s)
    extra_cells = [(4_800_000, 1_000)]
    rows = []  # (n_pts, n_t, strategy, sec, out_rows)
    cells = [(n_p, n_t) for n_p in densities for n_t in sizes] + extra_cells
    last_np = None
    for n_p, n_t in cells:
        if n_p != last_np:
            p_path = cache_points(spark, n_p, "pts", "point_id", "lon", "lat")
            pts = spark.read.parquet(p_path)
            last_np = n_p
        t_path = cache_points(spark, n_t, "tgt", "target_id", "t_lon", "t_lat")
        tgt = spark.read.parquet(t_path)
        strategies = ["grid", "ring"] + (
            ["broadcast"] if n_t <= spatial.KNN_BROADCAST_MAX_TARGETS * 2 else []
        )
        counts = {}
        for s in strategies:
            best = None
            for _ in range(args.reps):
                t0 = time.time()
                n = spatial.knn_join(
                    pts, tgt, res=None, k=args.k, strategy=s
                ).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                counts[s] = n
            rows.append((n_p, n_t, s, round(best, 2), n))
            print(
                f"points={n_p} targets={n_t} strategy={s}: "
                f"{best:.2f}s rows={n}", flush=True,
            )
        assert len(set(counts.values())) == 1, (
            f"row-count mismatch at points={n_p} targets={n_t}: {counts}"
        )

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/KNN_REGIMES.md", "w") as f:
        f.write(
            "# kNN strategy regimes (local[%d], k=%d, best-of-%d)\n\n"
            % (args.cpus, args.k, args.reps)
        )
        f.write(
            "Same input, forced strategies, identical output row counts "
            "(asserted), swept over point-side density AND target-side "
            "size. Density-aware auto rule derived FROM this table "
            "(spatial._knn_auto_strategy, unit-tested against every "
            "cell): broadcast when targets <= "
            f"{spatial.KNN_BROADCAST_MAX_TARGETS:,} AND points x targets "
            f"<= {spatial.KNN_BROADCAST_MAX_PRODUCT:,}; grid when targets "
            f"<= max({spatial.KNN_GRID_MAX_TARGETS:,}, "
            f"{spatial.KNN_GRID_TARGET_RATIO} x points); ring beyond "
            "(targets dense relative to points resolve the ring search "
            "in ~one round while grid pays the x9 target replication).\n"
        )
        seen = list(dict.fromkeys(rp for rp, *_ in rows))
        for n_p in seen:  # densities plus the pinned extra cells
            f.write(f"\n## {n_p:,} points\n\n")
            f.write("| targets | strategy | sec |\n|---|---|---|\n")
            for rp, n_t, s, dt, _ in rows:
                if rp == n_p:
                    f.write(f"| {n_t:,} | {s} | {dt} |\n")
    print("wrote BENCH/KNN_REGIMES.md")


if __name__ == "__main__":
    main()
