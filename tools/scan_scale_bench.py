"""Heavy prefix-scan run (operators/scan.py scale evidence).

Synthesizes n rows (default 400M) of (id, deterministic skewed
weight), runs pack_shards end-to-end at local[$SPARK_GRAFT_CPUS], and
validates against an independent numpy ground truth computed in the
driver: the exact global total, contiguous shard ids, and 1,000
sampled rows' running totals compared exactly. Run once per
parallelism level (fresh JVM each, same methodology as
tools/bench_scaling.py) and paste both JSON lines into
BENCH/ROBUSTNESS.md:

    SPARK_GRAFT_CPUS=8  python tools/scan_scale_bench.py
    SPARK_GRAFT_CPUS=32 python tools/scan_scale_bench.py

Weights: w(id) = (id*37 mod 290) + 1, plus 1,000,000 for every
id ≡ 0 (mod 100003) — a deterministic heavy tail ~3,500× the median,
exercising the range partitioner under value skew (key density stays
uniform; weight skew does not move rows, which is the point: the scan
shuffles on the KEY, so weight skew cannot unbalance it).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SHARD = 10_000_000
HEAVY_MOD = 100003
HEAVY_W = 1_000_000


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import scan
    from gtfs_to_geojson_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_SCAN_ROWS", "400000000"))

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="scan-scale-bench",
        shuffle_partitions=cpus * 4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # surface Python-worker crashes as tracebacks, not broken pipes
            "spark.sql.execution.pyspark.udf.faulthandler.enabled": "true",
            "spark.python.worker.faulthandler.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    w_expr = (F.col("id") * 37 % 290 + 1 + F.when(
        F.col("id") % HEAVY_MOD == 0, HEAVY_W
    ).otherwise(0)).cast("long")
    src = spark.range(0, n, 1, cpus * 4).withColumn("w", w_expr)

    t0 = time.time()
    out = scan.pack_shards(src, "id", "w", shard_size=SHARD, num_partitions=cpus * 4)
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.max("running_total").alias("max_rt"),
        F.countDistinct("shard_id").alias("n_shards"),
        F.max("shard_id").alias("max_shard"),
    ).collect()[0]
    wall = time.time() - t0

    # independent ground truth (numpy, closed-form weights)
    ids = np.arange(n, dtype=np.int64)
    w = ids * 37 % 290 + 1
    w[ids % HEAVY_MOD == 0] += HEAVY_W
    total = int(w.sum())
    ok_total = agg["max_rt"] == total and agg["rows"] == n
    # all weights < SHARD ⇒ shard ids are contiguous 0..max
    ok_shards = agg["n_shards"] == agg["max_shard"] + 1

    # exact spot check: 1,000 sampled rows' running totals vs cumsum
    rt = np.cumsum(w)
    probe_ids = ids[:: n // 1000][:1000]
    probes = {
        r["id"]: r["running_total"]
        for r in out.filter(F.col("id").isin([int(i) for i in probe_ids])).collect()
    }
    ok_probes = all(probes[int(i)] == int(rt[i]) for i in probe_ids)

    print(
        json.dumps(
            {
                "n_rows": n,
                "cpus": cpus,
                "shard_size": SHARD,
                "wall_sec": round(wall, 2),
                "rows_per_sec": round(n / wall, 0),
                "total_weight": total,
                "n_shards": agg["n_shards"],
                "exact_total": ok_total,
                "contiguous_shards": ok_shards,
                "probes_exact": ok_probes,
            }
        )
    )
    sys.exit(0 if (ok_total and ok_shards and ok_probes) else 1)


if __name__ == "__main__":
    main()
