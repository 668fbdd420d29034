"""Heavy image-batch-layout run (multimodal.aspect_bucket +
scan.pack_batches scale evidence).

Synthesizes n rows (default 400M) of image metadata with
deterministic (w, h) — w = 64·(1 + id·M1 % 28), h = 64·(1 + id·M2 % 31),
so the (w, h) pattern cycles with period lcm(28, 31) = 868 and every
row's bucket, in-bucket rank, batch id, and batch position have a
CLOSED FORM the driver can check exactly:

    rank(id in bucket b) = (id // 868)·|R_b| + #{r ∈ R_b : r < id % 868}

where R_b is the set of residues (mod 868) whose (w, h) maps to
bucket b. Validates (a) per-bucket counts exactly, (b) per-bucket
sum(batch_id) and sum(pos_in_batch) against the closed form (pins the
whole layout distributionally), (c) 1,000 sampled rows' (bucket,
batch_id, pos_in_batch) exactly. Bucket sizes are naturally skewed
(square-ish aspects absorb many (w,h) combos) — the grouped scan's
range partitioner must split the hot buckets across tasks.

Run once per parallelism level (fresh JVM each, same methodology as
tools/bench_scaling.py) and paste both JSON lines into
BENCH/ROBUSTNESS.md:

    SPARK_GRAFT_CPUS=8  python tools/batch_layout_bench.py
    SPARK_GRAFT_CPUS=32 python tools/batch_layout_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

M1, M2 = 2654435761, 40503
PERIOD = 868  # lcm(28, 31)
BATCH = 64


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import multimodal
    from gtfs_to_geojson_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_BATCH_ROWS", "400000000"))

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="batch-layout-bench",
        shuffle_partitions=cpus * 4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
            "spark.python.worker.faulthandler.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    src = spark.range(0, n, 1, cpus * 4).select(
        F.col("id").alias("image_id"),
        (64 * (1 + (F.col("id") * M1) % 28)).cast("int").alias("w"),
        (64 * (1 + (F.col("id") * M2) % 31)).cast("int").alias("h"),
    )

    sorted_path = os.environ.get("SPARK_GRAFT_BATCH_SORTED", "1") == "1"
    t0 = time.time()
    out = multimodal.bucketed_batches(
        src, batch_size=BATCH, num_partitions=cpus * 4,
        assume_sorted=sorted_path,
    )
    per_bucket = {
        r["bucket_id"]: r
        for r in out.groupBy("bucket_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("batch_id").alias("sum_batch"),
            F.sum("pos_in_batch").alias("sum_pos"),
            F.max("batch_id").alias("max_batch"),
        ).collect()
    }
    wall = time.time() - t0

    # ---- closed-form ground truth ----
    bks = multimodal.DEFAULT_ASPECT_BUCKETS
    scale = 1_000_000
    res = np.arange(PERIOD, dtype=np.int64)
    w = 64 * (1 + (res * M1) % 28)
    h = 64 * (1 + (res * M2) % 31)
    ar = (w * scale) // h
    bars = np.array([(bw * scale) // bh for bw, bh in bks], dtype=np.int64)
    bucket_of_res = np.abs(ar[:, None] - bars[None, :]).argmin(axis=1)

    full_cycles, rem = divmod(n, PERIOD)
    counts = {}
    residues = {}
    for b in np.unique(bucket_of_res):
        rb = np.flatnonzero(bucket_of_res == b)
        residues[int(b)] = rb
        counts[int(b)] = int(full_cycles * len(rb) + (rb < rem).sum())

    def layout_sums(cnt: int):
        """sum(batch_id) and sum(pos) over a bucket of cnt rows."""
        full, r = divmod(cnt, BATCH)
        sum_batch = BATCH * (full * (full - 1)) // 2 + r * full
        sum_pos = full * (BATCH * (BATCH - 1)) // 2 + r * (r - 1) // 2
        max_batch = (cnt - 1) // BATCH if cnt else None
        return sum_batch, sum_pos, max_batch

    ok_counts = set(per_bucket) == set(counts) and all(
        per_bucket[b]["n"] == c for b, c in counts.items()
    )
    ok_sums = all(
        (per_bucket[b]["sum_batch"], per_bucket[b]["sum_pos"], per_bucket[b]["max_batch"])
        == layout_sums(c)
        for b, c in counts.items()
    )

    # ---- exact spot probes ----
    probe_ids = np.arange(n, dtype=np.int64)[:: max(n // 1000, 1)][:1000]
    got = {
        r["image_id"]: (r["bucket_id"], r["batch_id"], r["pos_in_batch"])
        for r in out.filter(
            F.col("image_id").isin([int(i) for i in probe_ids])
        ).collect()
    }
    ok_probes = True
    for i in probe_ids:
        b = int(bucket_of_res[i % PERIOD])
        rb = residues[b]
        rank = (i // PERIOD) * len(rb) + int((rb < i % PERIOD).sum())
        exp = (b, rank // BATCH, rank % BATCH)
        if got[int(i)] != exp:
            ok_probes = False
            break

    print(
        json.dumps(
            {
                "n_rows": n,
                "cpus": cpus,
                "path": "sorted_zero_shuffle" if sorted_path else "range_shuffle",
                "batch_size": BATCH,
                "n_buckets": len(counts),
                "hot_bucket_rows": max(counts.values()),
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n / wall, 0),
                "counts_exact": ok_counts,
                "layout_sums_exact": ok_sums,
                "probes_exact": ok_probes,
            }
        )
    )
    sys.exit(0 if (ok_counts and ok_sums and ok_probes) else 1)


if __name__ == "__main__":
    main()
