"""Heavy run for the EXACT embedding near-dup join (near_dup_pairs_ivf).

The sign-LSH near-dup generator is quadratic past ~10⁷ rows (256
buckets total); ``similarity.near_dup_pairs_ivf`` replaces it with a
Voronoi partition + radius-expanded probe that stays EXACT. This tool
executes that claim 4 orders above the sf0.01 oracle scale:

* corpus: the ANN bench's 10M × d=64 deterministic clustered vectors
  (reused from /tmp if present) + 100k PLANTED near-dup rows — each a
  copy of every 100th base vector, perturbed by a deterministic unit
  direction scaled to 5% of the vector norm, so the planted cosine is
  in [sqrt(1−0.05²) ≈ 0.998749, 1.0] (minimum at perturbation·v̂ = −δ)
  — strictly above the 0.99 threshold with margin, verified in-run
  before the join;
* run near_dup_pairs_ivf(threshold=0.99, 4096 seeded centroids) over
  all 10.1M rows and assert EVERY planted pair is recovered (the
  operator is exact — recall must be 1.0, not "high");
* report wall, rows/s, pair counts (planted vs organic), home-bucket
  skew (p50/p99/max), and probe amplification (assignments per vector,
  measured on a 1% sample) — the numbers that show the Voronoi probe
  is selective where the old LSH was quadratic.

Usage: python tools/embed_dedup_scale_bench.py
(env: SPARK_GRAFT_NDUP_VECS default 10_000_000, SPARK_GRAFT_CPUS).
Prints one JSON line; paste into BENCH/ROBUSTNESS.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from ann_scale_bench import D, _PRIMES, build_embeddings  # noqa: E402

THRESHOLD = 0.99
N_CENTROIDS = 4096
PLANT_STRIDE = 100  # one planted dup per 100 base vectors
DELTA = 0.05        # perturbation = 5% of |v| ⇒ cosine ≥ sqrt(1−δ²) ≈ 0.998749


def build_planted(spark, n_base: int, base_path: str, path: str) -> None:
    import pandas as pd
    from pyspark.sql import functions as F

    if os.path.exists(path):
        return
    roots4 = np.asarray(_PRIMES[:D], dtype=np.float64) ** 0.25

    def gen(batches):
        for pdf in batches:
            base = np.asarray(list(pdf["embedding"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.float64)
            u = np.modf(np.outer(ids + 3.0, roots4))[0] * 2.0 - 1.0
            u = u / np.maximum(np.linalg.norm(u, axis=1, keepdims=True), 1e-12)
            vn = np.linalg.norm(base, axis=1, keepdims=True)
            out = base + DELTA * vn * u
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy() + np.int64(n_base),
                    "embedding": [r.tolist() for r in out],
                }
            )

    (
        spark.read.parquet(base_path)
        .filter(F.col("vec_id") % PLANT_STRIDE == 0)
        .repartition(64)
        .mapInPandas(gen, "vec_id long, embedding array<double>")
        .write.parquet(path)
    )


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import similarity
    from gtfs_to_geojson_spark.session import get_spark

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else (os.cpu_count() or 8)
    n_base = int(os.environ.get("SPARK_GRAFT_NDUP_VECS", "10000000"))
    base_path = f"/tmp/spark_graft_ann_emb_{n_base}_{D}.parquet"
    plant_path = f"/tmp/spark_graft_ndup_plant_{n_base}_{D}.parquet"

    spark = get_spark(
        app_name="embed-dedup-scale-bench",
        shuffle_partitions=cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    build_embeddings(spark, n_base, base_path)
    build_planted(spark, n_base, base_path, plant_path)
    base = spark.read.parquet(base_path)
    plant = spark.read.parquet(plant_path)
    emb = base.unionByName(plant)
    n_plant = plant.count()
    n_total = n_base + n_plant

    out: dict = {
        "n_base": n_base, "n_planted": n_plant, "dim": D,
        "threshold": THRESHOLD, "n_centroids": N_CENTROIDS, "cpus": cpus,
    }

    # planted-cosine floor, verified not assumed (construction math:
    # cos = (1+δc)/sqrt(1+2δc+δ²) over c = v̂·û is minimized at c=−δ,
    # giving sqrt(1−δ²); any generator bug would surface here)
    cosp = (
        plant.withColumn("_bid", F.col("vec_id") - F.lit(n_base))
        .join(
            base.select(F.col("vec_id").alias("_bid"), F.col("embedding").alias("bv")),
            "_bid",
        )
        .select(similarity._cos_col("embedding", "bv").alias("c"))
        .agg(F.min("c"), F.max("c"))
        .first()
    )
    out["planted_cos_min"] = round(float(cosp[0]), 6)
    out["planted_cos_max"] = round(float(cosp[1]), 6)
    assert cosp[0] >= math.sqrt(1.0 - DELTA * DELTA) - 1e-9

    t0 = time.time()
    diag: dict = {}
    pairs = similarity.near_dup_pairs_ivf(
        emb, threshold=THRESHOLD, n_centroids=N_CENTROIDS, train_iters=0,
        diagnostics=diag,
    )
    pairs.write.mode("overwrite").parquet("/tmp/spark_graft_ndup_pairs.parquet")
    wall = time.time() - t0
    got = spark.read.parquet("/tmp/spark_graft_ndup_pairs.parquet")
    n_pairs = got.count()
    out["wall_sec"] = round(wall, 1)
    out["rows_per_sec"] = round(n_total / wall, 0)
    out["pairs_found"] = n_pairs

    # exactness at scale: every planted (base, base+n_base) pair present
    want = plant.select(
        (F.col("vec_id") - F.lit(n_base)).alias("id_a"),
        F.col("vec_id").alias("id_b"),
    )
    n_hit = got.join(want, ["id_a", "id_b"], "left_semi").count()
    out["planted_recovered"] = n_hit
    out["planted_recall"] = round(n_hit / n_plant, 6)
    out["organic_pairs"] = n_pairs - n_hit

    # home-bucket skew + probe amplification on a 1% sample, using the
    # operator's OWN grown codebook + per-bucket radii (diagnostics
    # hook) and its exact probe rule min(d_home + 2ε, r(c) + ε)
    cn = diag["codebook"]
    rbuf = diag["home_radius"]
    out["n_centroids_final"] = int(len(cn))
    out["coverage_growth_rounds"] = diag["growth_rounds"]
    sample = np.asarray(
        list(
            emb.sample(0.01, seed=1)
            .select("embedding")
            .toPandas()["embedding"]
        ),
        dtype=np.float64,
    )
    sn = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    eps = math.sqrt(2.0 - 2.0 * THRESHOLD)
    lim_b = rbuf + eps + 1e-9
    probes_per_vec = []
    homes = []
    for lo in range(0, len(sn), 4096):
        dist = np.sqrt(np.maximum(2.0 - 2.0 * (sn[lo : lo + 4096] @ cn.T), 0.0))
        lim = np.minimum(dist.min(axis=1)[:, None] + 2 * eps + 1e-9, lim_b[None, :])
        probes_per_vec.append((dist <= lim).sum(axis=1))
        homes.append(dist.argmin(axis=1))
    ppv = np.concatenate(probes_per_vec)
    hc = np.bincount(np.concatenate(homes), minlength=len(cn)) * 100  # scale sample→pop
    out["probes_per_vector_mean"] = round(float(ppv.mean()), 3)
    out["probes_per_vector_max"] = int(ppv.max())
    out["home_bucket_p50"] = int(np.percentile(hc, 50))
    out["home_bucket_p99"] = int(np.percentile(hc, 99))
    out["home_bucket_max"] = int(hc.max())

    print(json.dumps(out))
    if n_hit != n_plant:
        sys.exit(1)


if __name__ == "__main__":
    main()
