"""Structured Streaming throughput evidence → BENCH/STREAMING.md.

Measures the file-arrival tile-assignment stream (readStream parquet →
JVM geotag+cell encode → parquet sink with checkpoint) end-to-end with
an availableNow trigger: all input drops are processed to completion
exactly once, so rows / wall-clock is a fair micro-batch throughput
number, including sink + checkpoint overhead.

Usage: python tools/stream_bench.py   (env: SPARK_GRAFT_CPUS,
SPARK_GRAFT_STREAM_IMAGES default 400000, SPARK_GRAFT_STREAM_REP 8)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")


def main():
    from pyspark.sql import functions as F

    import bench as B
    from gtfs_to_geojson_spark.session import get_spark
    from gtfs_to_geojson_spark.streaming import stream_assign as SA

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else (os.cpu_count() or 8)
    n_images = int(os.environ.get("SPARK_GRAFT_STREAM_IMAGES", "400000"))
    rep = int(os.environ.get("SPARK_GRAFT_STREAM_REP", "8"))

    spark = get_spark(
        app_name="stream-bench",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    img_path = B.build_images_cache(spark, n_images)
    in_dir = f"/tmp/spark_graft_stream_in_{n_images}_{rep}"
    if not os.path.exists(in_dir):
        # rep drops of the metadata columns (the stream processes
        # phash→geotag→cell, trusting stored phash — the JVM-only path)
        base = spark.read.parquet(img_path).select("image_id", "caption", "phash")
        for i in range(rep):
            base.withColumn("image_id", F.concat(F.lit(f"ep{i}_"), "image_id")).write.mode(
                "append"
            ).parquet(in_dir)

    out_dir = "/tmp/spark_graft_stream_out"
    ckpt = "/tmp/spark_graft_stream_ckpt"
    shutil.rmtree(out_dir, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)

    n_rows = n_images * rep
    rows_md = []
    for label, mfpt in (("latency-oriented (8 files/batch)", 8),
                        ("throughput-oriented (512 files/batch)", 512)):
        shutil.rmtree(out_dir, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        t0 = time.time()
        q = SA.run_stream_to_parquet(
            spark, in_dir, out_dir, ckpt, res=14, max_files_per_trigger=mfpt
        )
        q.awaitTermination()
        dt = time.time() - t0
        got = spark.read.parquet(out_dir).count()
        assert got == n_rows, (got, n_rows)
        rows_md.append(f"| {label} | {n_rows:,} | {dt:.2f} | {n_rows / dt:,.0f} |")

    md = [
        "# Structured Streaming throughput (tile-assignment stream)",
        "",
        f"local[{cpus}] · {n_rows:,} rows across {rep} parquet drops "
        f"({rep * 64} files) · availableNow trigger (processes the full "
        "backlog exactly once, including sink + checkpoint overhead).",
        "",
        "| trigger sizing | rows | wall (s) | rows/sec |",
        "|---|---|---|---|",
        *rows_md,
        "",
        "maxFilesPerTrigger is the latency/throughput dial: small batches",
        "bound end-to-end latency, large batches amortize per-micro-batch",
        "planning + commit overhead when draining a backlog.",
        "",
        "Identical operator chain as the batch J9a path (the stream is",
        "the same DataFrame composition behind readStream); restart",
        "resumes from the checkpoint's processed-files log with no",
        "recompute (tested in test_reproject_stream.py).",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/STREAMING.md", "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
