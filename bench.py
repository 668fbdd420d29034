"""Benchmark harness (driver contract: ONE JSON line to stdout).

Headline workload = the BASELINE.json metric: cell-indexed
point-in-envelope spatial join + image tile/polygon assignment
throughput (rows/sec), at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default all cores).
Secondary queries (kNN, relational, dedup, decode) are timed and
reported but kept out of the headline throughput.

Scale notes baked in:
* the sf parquet files are single ~20 MB files — one scan partition at
  default maxPartitionBytes, which would put a serial one-task stage at
  the head of every timed job; the synthetic point/knn tables are
  therefore materialized ONCE into well-chunked /tmp parquet caches
  (the cluster analog of a properly-chunked source layout) and every
  timed query is a fully-parallel scan of them;
* per-query numbers are best-of-N fresh executions (N =
  SPARK_GRAFT_BENCH_REPS, default 3) — the shared sandbox host carries
  phantom load, and first executions pay one-time codegen compilation;
* the image table is synthesized once per size (real encoded bytes +
  phash, deterministic) and cached as parquet in /tmp across runs;
  tile assignment reads only the phash column — columnar pruning means
  the binary payload never leaves disk, which is the design point.

Usage: python bench.py            → one JSON line
       python bench.py --explain  → also dump physical plans to BENCH/
"""

from __future__ import annotations

import json
import os
import sys
import time

N_BENCH_IMAGES = int(os.environ.get("SPARK_GRAFT_BENCH_IMAGES", "400000"))
IMG_REPLICATE = int(os.environ.get("SPARK_GRAFT_IMG_REPLICATE", "8"))  # assignment rows = images × this
POINT_FACTOR = int(os.environ.get("SPARK_GRAFT_POINT_FACTOR", "16"))  # points per lineitem row
DECODE_REPLICATE = int(os.environ.get("SPARK_GRAFT_DECODE_REPLICATE", "1"))  # decode rows = subset × this
KNN_RES = 16


def build_images_cache(spark, n: int) -> str:
    path = f"/tmp/spark_graft_bench_images_{n}.parquet"
    if os.path.exists(path):
        return path
    import numpy as np
    import pandas as pd

    from gtfs_to_geojson_spark import images as I

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                rng = np.random.default_rng(42 + int(i))
                w = h = 16
                px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                fmt = I.FORMATS[int(i) % 3]
                rows.append(
                    (
                        f"img_{int(i):012d}",
                        I.encode(px, fmt),
                        w,
                        h,
                        fmt,
                        f"synthetic scene {int(i)}",
                        I.phash64(px),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    schema = "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
    df = spark.range(n).repartition(64).mapInPandas(gen, schema)
    df.write.mode("overwrite").parquet(path)
    return path


def build_points_cache(spark, sf_dir: str, factor: int) -> str:
    """Materialize the synthetic point table ONCE as a well-chunked
    parquet (256 files) shared across parallelism levels. The sf
    parquet inputs are single files, so deriving points inline puts a
    one-task scan→Exchange at the head of every timed job — a serial
    stage that exists only because of the sandbox's single-file layout.
    A real cluster source is chunked; this cache is that analog, and
    the timed job is the operator under test (scan → cell encode →
    broadcast join → agg), all fully parallel."""
    sf_tag = sf_dir.rstrip("/").replace("/", "_")
    path = f"/tmp/spark_graft_bench_points_{sf_tag}_{factor}.parquet"
    if os.path.exists(path):
        return path
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.plans import oracle_queries as OQ

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    base = li.select("l_orderkey", "l_linenumber").repartition(256)
    exp = base.select(
        F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep"),
        "l_orderkey",
        "l_linenumber",
    )
    key = F.col("l_orderkey") * 37 + F.col("l_linenumber") * 5 + F.col("rep")
    pts = exp.select(
        key.alias("point_id"),
        OQ.lon_col(key).alias("lon"),
        OQ.lat_col(key).alias("lat"),
    )
    pts.write.mode("overwrite").parquet(path)
    return path


def main():
    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else (os.cpu_count() or 8)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    explain = "--explain" in sys.argv

    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import dedup, multimodal, spatial
    from gtfs_to_geojson_spark.plans import oracle_queries as OQ
    from gtfs_to_geojson_spark.session import get_spark

    spark = get_spark(
        app_name="spark-graft-bench",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    img_path = build_images_cache(spark, N_BENCH_IMAGES)
    images = spark.read.parquet(img_path)
    # assignment throughput is measured over IMG_REPLICATE epochs of the
    # image table (distinct ids, same phash distribution) — identical
    # per-row work to a table IMG_REPLICATE× the size, without paying
    # one-time synthesis for gigabytes of pixel payload
    # no repartition: the table is written as 64 files, so the explode
    # runs 64-way in place — a shuffle here would move IMG_REPLICATE×
    # the table for nothing
    images_rep = (
        images.select("caption", "phash")
        .withColumn("_ep", F.explode(F.sequence(F.lit(0), F.lit(IMG_REPLICATE - 1))))
        .drop("_ep")
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n_lineitem = li.count()
    n_points = n_lineitem * POINT_FACTOR
    points_path = build_points_cache(spark, sf_dir, POINT_FACTOR)

    timings: dict[str, float] = {}
    reps_env = os.environ.get("SPARK_GRAFT_BENCH_REPS")
    reps = int(reps_env) if reps_env is not None else 3

    def run(name, fn, best_of: int = 1):
        # VERDICT r2 item 4: sub-2s queries showed 10-20% r1→r2 drift
        # from host load despite best-of-3 — they are cheap enough to
        # buy two extra reps, so extend adaptively once the measured
        # best confirms the query is in the noise-dominated regime.
        # An explicit SPARK_GRAFT_BENCH_REPS is a user override and
        # disables the extension (so REPS=1 really means one rep).
        best = None
        done = 0
        budget = max(1, best_of)
        while done < budget:
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            done += 1
            if (done == budget and best < 2.0
                    and budget == max(1, best_of) and reps_env is None):
                budget += 2
        timings[name] = round(best, 3)
        return out, best

    # -------------------- headline phase --------------------
    # points: POINT_FACTOR per lineitem row, pre-materialized as a
    # 256-file parquet (see build_points_cache) — the timed job is a
    # fully-parallel scan → cell encode → broadcast join → agg
    def li_points():
        return spark.read.parquet(points_path)

    # benchmark boxes: supplier-derived, shrunk 5× so join output stays
    # ~0.3% selective (the oracle query keeps the big ones for row parity)
    def bench_boxes():
        s = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        cx = OQ.lon_col(F.col("s_suppkey") * 13 + 7)
        cy = OQ.lat_col(F.col("s_suppkey") * 11 + 5)
        hw = ((F.col("s_suppkey") % 13) + 2).cast("double") * F.lit(0.0008)
        hh = ((F.col("s_suppkey") % 7) + 2).cast("double") * F.lit(0.0006)
        return s.select(
            "s_suppkey",
            (cx - hw).alias("min_lon"),
            (cx + hw).alias("max_lon"),
            (cy - hh).alias("min_lat"),
            (cy + hh).alias("max_lat"),
        )

    def j6():
        j = spatial.point_in_envelope_join(li_points(), bench_boxes(), res=16)
        return j.groupBy("s_suppkey").agg(F.count(F.lit(1)).alias("n")).count()

    if explain:
        os.makedirs("BENCH", exist_ok=True)
        import contextlib
        import io

        plan = spatial.point_in_envelope_join(li_points(), bench_boxes(), res=16)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            plan.explain("formatted")
        with open("BENCH/plan_j6.txt", "w") as f:
            f.write(buf.getvalue())

    _, t_j6 = run("j6_envelope_join", j6, best_of=reps)

    def j9():
        tiled = spatial.assign_images_to_tiles(images_rep, res=OQ.TILE_RES)
        return tiled.groupBy("tile").agg(F.count(F.lit(1)).alias("n_images")).count()

    _, t_j9 = run("j9_tile_assign", j9, best_of=reps)

    def j9b():
        import pandas as pd

        from gtfs_to_geojson_spark import images as I

        d = I.DENSE_BOX
        b = I.DEFAULT_BBOX
        mx = (b[0] + b[2]) / 2
        polys = spark.createDataFrame(
            pd.DataFrame(
                {
                    "poly_id": [0, 1],
                    "polygon": [
                        [[[d[0], d[1]], [d[2], d[1]], [d[2], d[3]], [d[0], d[3]], [d[0], d[1]]]],
                        [[[b[0], b[1]], [mx, b[1]], [mx, b[3]], [b[0], b[3]], [b[0], b[1]]]],
                    ],
                }
            ),
            schema="poly_id long, polygon array<array<array<double>>>",
        )
        # res 18: polygon rims are ~3% of cover cells, so ≥97% of
        # candidates take the interior fast path (never touch Python)
        return spatial.assign_images_to_polygons(images_rep, polys, res=18).select(
            F.count(F.lit(1)), F.count_distinct("caption")
        ).collect()

    _, t_j9b = run("j9b_image_in_polygon", j9b, best_of=reps)

    # J9 full-integrity decode→verify→assign (the Arrow pixel path)
    n_decode = int(os.environ.get("SPARK_GRAFT_BENCH_DECODE_N", "100000"))

    # NOTE: .limit(n) would collapse to ONE partition and serialize the
    # decode — subset with a hash predicate to keep the scan parallel
    decode_subset = images.filter(
        F.pmod(F.xxhash64("image_id"), F.lit(max(1, N_BENCH_IMAGES // n_decode))) == 0
    )
    if DECODE_REPLICATE > 1:
        # deepen the decode workload (scaling runs): each epoch repeats
        # the identical per-row decode+verify work
        decode_subset = decode_subset.withColumn(
            "_ep", F.explode(F.sequence(F.lit(0), F.lit(DECODE_REPLICATE - 1)))
        ).drop("_ep")

    def j9c():
        return (
            multimodal.decode_tile_assign(decode_subset, res=OQ.TILE_RES)
            .filter(F.col("phash_match"))
            .groupBy("tile")
            .agg(F.count(F.lit(1)).alias("n"))
            .count()
        )

    _, t_j9c = run("j9c_decode_tile_assign", j9c, best_of=reps)

    # headline = the BASELINE.json metric verbatim: the envelope join
    # plus tile assignment of the image table with decoded-pixel
    # verification (j9c). The trusted-phash JVM variants (j9/j9b) are
    # reported as the fast path but are too cheap to carry a scaling
    # signal (~1-3s of pure codegen — overhead-bound by design).
    headline_sec = round(t_j6 + t_j9c, 3)
    headline_rows = n_points + n_decode * DECODE_REPLICATE
    headline_rps = round(headline_rows / headline_sec, 1)

    # -------------------- secondary suite --------------------
    headline_only = os.environ.get("SPARK_GRAFT_HEADLINE_ONLY") == "1"

    knn_factor = int(os.environ.get("SPARK_GRAFT_KNN_FACTOR", "1"))

    def knn_points_cache() -> str:
        # same well-chunked-source rationale as build_points_cache.
        # v2: the synthetic lineitem repeats (l_orderkey, l_linenumber)
        # pairs, so the old arithmetic key collided for ~24% of rows —
        # kNN is a keyed join (k rows per distinct point key), so the
        # ids must be unique for the row count to equal the point count.
        sf_tag = sf_dir.rstrip("/").replace("/", "_")
        path = f"/tmp/spark_graft_bench_knnpts_v2_{sf_tag}_{knn_factor}.parquet"
        if os.path.exists(path):
            return path
        from pyspark.sql import Window

        base = li.select("l_orderkey", "l_linenumber")
        if knn_factor > 1:
            base = base.select(
                "l_orderkey",
                "l_linenumber",
                F.explode(F.sequence(F.lit(0), F.lit(knn_factor - 1))).alias("rep"),
            )
        else:
            base = base.withColumn("rep", F.lit(0))
        # unique id via a global row_number — a one-off sort at cache
        # build time (outside every timed region)
        key = F.row_number().over(
            Window.orderBy("l_orderkey", "l_linenumber", "rep")
        ).cast("long")
        base.select(key.alias("point_id")).select(
            "point_id",
            OQ.lon_col(F.col("point_id")).alias("lon"),
            OQ.lat_col(F.col("point_id")).alias("lat"),
        ).repartition(64).write.mode("overwrite").parquet(path)
        return path

    def li_points_1x():
        return spark.read.parquet(knn_points_cache())

    if headline_only:
        sys.stderr.write("headline-only mode: skipping secondary suite\n")

    def run_secondary():
        knn_points_cache()  # build the cache OUTSIDE the timed region
        run(
            "j8_knn",
            lambda: spatial.knn_join(
                li_points_1x(), OQ.supplier_points(spark, sf_dir), res=KNN_RES, k=1,
                point_key="point_id", target_key="s_suppkey",
            ).count(),
            best_of=reps,
        )
        # j8c: the ring (large-target) strategy in ITS regime — 4M
        # targets, past the grid ceiling, where the auto-selector
        # actually uses it (r1 benched ring at 200k targets, but that
        # size now routes to the grid strategy — BENCH/KNN_REGIMES.md).
        # res=None derives the grid from target density.
        def ring_targets_cache() -> str:
            path = "/tmp/spark_graft_bench_ringtgt_4m.parquet"
            if os.path.exists(path):
                return path
            ids = spark.range(4_000_000).select(F.col("id").alias("target_id"))
            tkey = F.col("target_id") * 7 + 3
            ids.select(
                "target_id",
                OQ.lon_col(tkey).alias("t_lon"),
                OQ.lat_col(tkey).alias("t_lat"),
            ).repartition(64).write.mode("overwrite").parquet(path)
            return path

        ring_targets_cache()  # build outside the timed region

        def j8c_ring():
            pts = li_points_1x()
            tgt = spark.read.parquet(ring_targets_cache())
            return spatial.knn_join(pts, tgt, res=None, k=1, strategy="ring").count()

        run("j8c_knn_ring_4m", j8c_ring, best_of=reps)

        # j8d: the grid-cogroup (mid-regime) strategy in ITS regime —
        # 1M targets, too big to broadcast, small enough to ×9-replicate.
        # Strategy-vs-strategy evidence lives in BENCH/KNN_REGIMES.md
        # (tools/knn_regime_bench.py); this row tracks the regime the
        # auto-selector actually uses for 100k–10M targets.
        def grid_targets_cache() -> str:
            path = "/tmp/spark_graft_bench_gridtgt_1m.parquet"
            if os.path.exists(path):
                return path
            ids = spark.range(1_000_000).select(F.col("id").alias("target_id"))
            key = F.col("target_id") * 7 + 3
            ids.select(
                "target_id",
                OQ.lon_col(key).alias("t_lon"),
                OQ.lat_col(key).alias("t_lat"),
            ).repartition(64).write.mode("overwrite").parquet(path)
            return path

        grid_targets_cache()  # build outside the timed region

        def j8d_grid():
            pts = li_points_1x()
            tgt = spark.read.parquet(grid_targets_cache())
            return spatial.knn_join(pts, tgt, res=None, k=1, strategy="grid").count()

        run("j8d_knn_grid_1m", j8d_grid, best_of=reps)

        # j10: both-sides-extended overlay join (PBSM canonical-cell) —
        # two 1000² box lattices offset half a step, each right box
        # overlapping exactly its 4 in-range neighbors; the count is
        # asserted against the exact closed form (2A−1)² every run, so
        # this row is a correctness gate as well as a timing.
        from gtfs_to_geojson_spark.operators import linear_ref as LR
        from gtfs_to_geojson_spark.operators import overlap as OV

        j10_a = 1000

        def box_lattice_cache(offset: float) -> str:
            tag = str(offset).replace(".", "p")
            path = f"/tmp/spark_graft_bench_boxlat_{j10_a}_{tag}.parquet"
            if os.path.exists(path):
                return path
            step, half = 0.001, 0.0003
            ids = spark.range(j10_a * j10_a)
            i = (F.col("id") % j10_a).cast("double")
            jj = (F.col("id") / j10_a).cast("long").cast("double")
            cx = F.lit(-60.0) + (i + F.lit(offset)) * F.lit(step)
            cy = F.lit(10.0) + (jj + F.lit(offset)) * F.lit(step)
            ids.select(
                F.col("id").alias("bid"),
                (cx - F.lit(half)).alias("min_lon"),
                (cx + F.lit(half)).alias("max_lon"),
                (cy - F.lit(half)).alias("min_lat"),
                (cy + F.lit(half)).alias("max_lat"),
            ).repartition(64).write.mode("overwrite").parquet(path)
            return path

        la_path, rb_path = box_lattice_cache(0.0), box_lattice_cache(0.5)

        def j10_overlay():
            j = OV.envelope_intersect_join(
                spark.read.parquet(la_path), spark.read.parquet(rb_path), res=18
            )
            n = j.count()
            assert n == (2 * j10_a - 1) ** 2, f"overlay pair count {n} != closed form"
            return n

        run("j10_box_lattice_1m", j10_overlay, best_of=reps)

        # J14 nearest-segment snap: 1M lattice segments × 4M points,
        # every point provably snaps to its OWN segment (closed form
        # asserted every run; tools/linear_ref_scale_bench.py is the
        # 100M-point twin with the dist/along value checks)
        j14_a, j14_p = 1000, 4

        def snap_lattice_cache() -> tuple[str, str]:
            sp = f"/tmp/spark_graft_bench_snapseg_{j14_a}.parquet"
            pp = f"/tmp/spark_graft_bench_snappts_{j14_a}_{j14_p}.parquet"
            step, seg_len = 0.001, 0.0006
            if not os.path.exists(sp):
                sid = F.col("id")
                r, c = (sid / j14_a).cast("long"), sid % j14_a
                spark.range(j14_a * j14_a).select(
                    sid.alias("line_id"),
                    F.lit(0).cast("long").alias("seg_idx"),
                    (F.lit(-60.0) + c * step).alias("ax"),
                    (F.lit(10.0) + r * step).alias("ay"),
                    (F.lit(-60.0) + c * step + F.lit(seg_len)).alias("bx"),
                    (F.lit(10.0) + r * step).alias("by"),
                    F.lit(0.0).alias("cum0"),
                ).repartition(64).write.mode("overwrite").parquet(sp)
            if not os.path.exists(pp):
                pid = F.col("id")
                own = (pid / j14_p).cast("long")
                p = (pid % j14_p).cast("double")
                pr, pc = (own / j14_a).cast("long"), own % j14_a
                spark.range(j14_a * j14_a * j14_p).select(
                    pid.alias("point_id"),
                    (F.lit(-60.0) + pc * step
                     + F.lit(seg_len) * (p + 1) / F.lit(float(j14_p + 1))).alias("lon"),
                    (F.lit(10.0) + pr * step
                     + (p + 1) * F.lit(step / (4.0 * j14_p))).alias("lat"),
                ).repartition(64).write.mode("overwrite").parquet(pp)
            return sp, pp

        j14_sp, j14_pp = snap_lattice_cache()

        def j14_snap():
            snapped = LR.snap_points_to_segments(
                spark.read.parquet(j14_pp), spark.read.parquet(j14_sp),
                max_dist=0.001 / 3.0, res=18,
            )
            own = (F.col("point_id") / j14_p).cast("long")
            agg = snapped.agg(
                F.count(F.lit(1)).alias("rows"),
                F.sum((F.col("line_id") == own).cast("long")).alias("own"),
            ).collect()[0]
            n_want = j14_a * j14_a * j14_p
            assert agg["rows"] == n_want and agg["own"] == n_want, f"snap closed form: {agg}"
            return agg["rows"]

        run("j14_snap_lattice_4m", j14_snap, best_of=reps)

        # r5: rasterization family rows — pixel-center lattice with a
        # replication factor (the raster_scale_bench fixture at bench
        # size: 2^20 pixels × 16 = 16.8M points), so EVERY run asserts
        # the exact closed form (every pixel counts exactly REPL; the
        # pyramid parent exactly 4·REPL) — correctness gates as much
        # as timings, like the j10/j14 lattice rows.
        from gtfs_to_geojson_spark.operators import raster as RA

        r_grid, r_repl, r_tres, r_pb = 1 << 10, 16, 20, 4
        r_npx = r_grid * r_grid
        r_fine = r_tres + r_pb
        r_w, r_h = 360.0 / (1 << r_fine), 180.0 / (1 << r_fine)

        def raster_pts():
            pix = (F.col("id") / r_repl).cast("long")
            px, py = pix % r_grid, (pix / r_grid).cast("long")
            return spark.range(r_npx * r_repl).select(
                ((px + F.lit(1 << 23)).cast("double") + 0.5) * r_w - 180.0,
                ((py + F.lit(1 << 23)).cast("double") + 0.5) * r_h - 90.0,
            ).toDF("lon", "lat")

        def r1_raster():
            counts = RA.rasterize_counts(raster_pts(), r_tres, r_pb)
            agg = counts.agg(
                F.count(F.lit(1)).alias("px"), F.min("n").alias("mn"),
                F.max("n").alias("mx"), F.sum("n").alias("tot"),
            ).collect()[0]
            assert (agg["px"], agg["mn"], agg["mx"], agg["tot"]) == (
                r_npx, r_repl, r_repl, r_npx * r_repl
            ), f"raster closed form: {agg}"
            return agg["px"]

        run("r1_rasterize_16m", r1_raster, best_of=reps)

        def r2_pyramid():
            up = RA.pyramid_counts(
                RA.rasterize_counts(raster_pts(), r_tres, r_pb), px_bits=r_pb
            )
            agg = up.agg(
                F.count(F.lit(1)).alias("px"), F.min("n").alias("mn"),
                F.max("n").alias("mx"), F.sum("n").alias("tot"),
            ).collect()[0]
            assert (agg["px"], agg["mn"], agg["mx"], agg["tot"]) == (
                r_npx // 4, 4 * r_repl, 4 * r_repl, r_npx * r_repl
            ), f"pyramid closed form: {agg}"
            return agg["px"]

        run("r2_pyramid_16m", r2_pyramid, best_of=reps)

        run("j1_multiway_join", lambda: OQ.j1_multiway_join(spark, sf_dir).count(), best_of=reps)
        run(
            "a7_ordered_collect", lambda: OQ.a7_ordered_collect(spark, sf_dir).count(), best_of=reps
        )
        run(
            "minhash_signatures",
            # single-file source → repartition so the shingle explode +
            # 16× md5 min-agg (the heavy map side) runs on all cores
            lambda: dedup.minhash_signatures(
                spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(cpus * 2),
                n_hashes=16,
                shingle_n=4,
            ).count(),
            best_of=reps,
        )
        run(
            "image_decode_stats",
            lambda: multimodal.decode_pixel_stats(
                images.filter(
                    F.pmod(F.xxhash64("image_id"), F.lit(N_BENCH_IMAGES // 20000)) == 0
                )
            ).filter(F.col("phash_match")).count(),
            best_of=reps,
        )

        # temporal operators at scale: events replicated EVENT_FACTOR×
        # with shifted timestamps (distinct event streams per replica)
        event_factor = int(os.environ.get("SPARK_GRAFT_EVENT_FACTOR", "64"))

        def events_cache() -> str:
            sf_tag = sf_dir.rstrip("/").replace("/", "_")
            path = f"/tmp/spark_graft_bench_events_{sf_tag}_{event_factor}.parquet"
            if os.path.exists(path):
                return path
            ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
                "event_id", "ts", "user_id", "event_type"
            )
            rep = ev.withColumn(
                "_ep", F.explode(F.sequence(F.lit(0), F.lit(event_factor - 1)))
            )
            out = rep.select(
                (F.col("event_id") * event_factor + F.col("_ep")).alias("event_id"),
                F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
                (F.col("user_id") + F.col("_ep") * F.lit(1000)).alias("user_id"),
                "event_type",
            ).repartition(64)
            out.write.mode("overwrite").parquet(path)
            return path

        events_cache()  # build outside the timed region

        def bench_asof():
            from gtfs_to_geojson_spark.operators import relational

            ev = spark.read.parquet(events_cache())
            clicks = ev.filter(F.col("event_type") == "click").select(
                "user_id", F.col("t_us").alias("t"), F.col("event_id").alias("click_id")
            )
            purch = ev.filter(F.col("event_type") == "purchase").select(
                "user_id", F.col("t_us").alias("t"), F.col("event_id").alias("pid")
            )
            return relational.asof_join(
                purch, clicks, key_col="user_id", ts_col="t",
                right_payload_cols=["click_id"],
            ).count()

        run("asof_join", bench_asof, best_of=reps)

        def bench_interval():
            from gtfs_to_geojson_spark.operators import relational

            ev = spark.read.parquet(events_cache())
            signups = ev.filter(F.col("event_type") == "signup").select(
                F.col("event_id").alias("sid"), "user_id",
                F.col("t_us").alias("t0"),
                (F.col("t_us") + F.lit(3600000000).cast("long")).alias("t1"),
            )
            clicks = ev.filter(F.col("event_type") == "click").select(
                F.col("event_id").alias("cid"), "user_id", F.col("t_us").alias("t")
            )
            return relational.interval_point_join(
                signups, clicks, "t0", "t1", "t",
                bucket_width=3600000000, key_cols=["user_id"],
            ).count()

        run("interval_join", bench_interval, best_of=reps)

        def bench_kmv():
            # 1/16 sample: kmv is md5-bound (~1M rows/s/core — the price
            # of engine-stable hashes), so full-factor input makes this
            # secondary row dominate the suite; the sample measures the
            # same plan at rep-affordable size.
            pts = (
                spark.read.parquet(points_path)
                .filter(F.pmod(F.col("point_id"), F.lit(16)) == 0)
                .withColumn("_g", F.pmod(F.col("point_id"), F.lit(64)))
            )
            # sum over the estimates, NOT count(): count() over the
            # sketch aggregate lets RemoveRedundantAggregates collapse
            # the whole pipeline into count-distinct-of-group — r1's
            # kmv bench numbers measured exactly that pruned plan
            return dedup.kmv_distinct(
                pts, group_cols=["_g"], value_col="point_id", k=256
            ).agg(F.sum("est_distinct")).collect()[0][0]

        run("kmv_distinct", bench_kmv, best_of=reps)

    if not headline_only:
        run_secondary()

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "cell-indexed point-in-envelope join + image tile-assignment throughput",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "headline_sec": headline_sec,
                "headline_rows": headline_rows,
                "headline_rows_per_sec": headline_rps,
                "n_points": n_points,
                "n_images": N_BENCH_IMAGES, "img_replicate": IMG_REPLICATE,
            }
        )
    )


if __name__ == "__main__":
    main()
