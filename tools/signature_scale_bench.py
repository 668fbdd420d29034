"""Banded-Hamming near-pairs at corpus scale: the ``combos`` dial.

The 50M-doc MinHash run (BENCH/ROBUSTNESS.md) recorded the lesson
"size bands to the corpus"; for 64-bit signatures (simhash / image
phash) the equivalent dial is ``signature_near_pairs(combos=)``:
bucket on every ``combos``-subset of the bit-chunks so the key widens
from 64/n_bands bits to combos·(64/n_bands) bits while the pigeonhole
bound keeps results EXACT for max_hamming ≤ n_bands − combos.

This tool EXECUTES that at 10^8 signatures:

1. Candidate accounting from the production bucket keys
   (dedup.signature_bucket_keys — the same Columns the operator
   explodes): per-combos histogram Σ c·(c−1)/2 over bucket sizes.
   At 10^8 rows, combos=1 (16-bit keys) is shown to be ~10^11
   candidate pairs — infeasible by measurement, not assertion —
   while combos=2 (32-bit keys) collapses it ~4 orders of magnitude.
2. The feasible setting end-to-end: signature_near_pairs(combos=2)
   over the full corpus, wall-clock + planted-pair recall.

Corpus (deterministic, id-arithmetic only, no RNG): ``n_sigs`` base
signatures sig(i) = xxhash64(i); the first ``n_planted`` ids get a
partner row id+n_sigs whose signature flips exactly one bit
(hamming 1). Random 64-bit pairs sit at expected hamming 32 with
P(hamming ≤ 2) ≈ 2081/2^64 ≈ 1.1e-16, so ~C(1e8,2)·1.1e-16 ≈ 0.6
accidental TRUE pairs corpus-wide: recall is checked exactly against
the planted set and extras are counted (any extra passed the exact
popcount filter, i.e. is a real near-pair, not a false positive).

Usage: python tools/signature_scale_bench.py
(env: SPARK_GRAFT_SIG_ROWS default 100_000_000, SPARK_GRAFT_SIG_PLANTED
default 2_000_000, SPARK_GRAFT_CPUS). Prints one JSON line; paste the
section into BENCH/ROBUSTNESS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import dedup
    from gtfs_to_geojson_spark.session import get_spark

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else (os.cpu_count() or 8)
    n_sigs = int(os.environ.get("SPARK_GRAFT_SIG_ROWS", "100000000"))
    n_planted = int(os.environ.get("SPARK_GRAFT_SIG_PLANTED", "2000000"))
    n_bands = 4

    spark = get_spark(
        app_name="signature-scale-bench",
        shuffle_partitions=cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = f"/tmp/spark_graft_sigs_{n_sigs}_{n_planted}.parquet"
    if not os.path.exists(path):
        base = spark.range(n_sigs).select(
            F.col("id").alias("sid"), F.xxhash64("id").alias("sig")
        )
        planted = spark.range(n_planted).select(
            (F.col("id") + n_sigs).alias("sid"),
            F.expr(
                "xxhash64(id) ^ shiftleft(1L, cast(pmod(id, 64) as int))"
            ).alias("sig"),
        )
        base.unionByName(planted).repartition(256).write.parquet(path)
    sigs = spark.read.parquet(path)

    out: dict = {
        "n_sigs": n_sigs + n_planted, "n_planted": n_planted,
        "n_bands": n_bands, "cpus": cpus,
    }

    # ---- 1. candidate accounting per combos, production keys ----
    for combos in (1, 2):
        keys = dedup.signature_bucket_keys("sig", n_bands, combos)
        t0 = time.time()
        row = (
            sigs.select(F.explode(F.array(*keys)).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                F.sum(F.expr("c * (c - 1) / 2")).alias("cand_pairs"),
                F.count(F.lit(1)).alias("n_buckets"),
                F.max("c").alias("max_bucket"),
            )
            .first()
        )
        out[f"combos{combos}_candidate_pairs"] = int(row["cand_pairs"])
        out[f"combos{combos}_buckets"] = int(row["n_buckets"])
        out[f"combos{combos}_max_bucket"] = int(row["max_bucket"])
        out[f"combos{combos}_histogram_sec"] = round(time.time() - t0, 1)
        sys.stderr.write(
            f"combos={combos}: {row['cand_pairs']:.3g} candidate pairs, "
            f"{row['n_buckets']} buckets, max {row['max_bucket']} "
            f"({out[f'combos{combos}_histogram_sec']}s)\n"
        )

    # ---- 2. the feasible setting end-to-end ----
    t0 = time.time()
    pairs = dedup.signature_near_pairs(
        sigs, "sig", "sid", max_hamming=2, n_bands=n_bands, combos=2
    )
    planted_found, total_pairs = (
        pairs.agg(
            F.sum(
                F.when(
                    (F.col("id_b") - F.col("id_a") == n_sigs)
                    & (F.col("hamming") == 1),
                    1,
                ).otherwise(0)
            ),
            F.count(F.lit(1)),
        ).first()
    )
    t_pairs = time.time() - t0
    out["pairs_wall_sec"] = round(t_pairs, 1)
    out["sigs_per_sec"] = round((n_sigs + n_planted) / t_pairs, 0)
    out["planted_recovered"] = int(planted_found)
    out["planted_recall"] = round(planted_found / n_planted, 6)
    out["extra_true_pairs"] = int(total_pairs - planted_found)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
