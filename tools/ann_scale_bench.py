"""Heavy ANN robustness run (similarity family's scale evidence).

The ANN operators' scale story was structural until now (broadcast
queries, n_probe-bounded buckets, partial top-k); this tool EXECUTES
it ~3 orders above the sf0.1 bench embeddings: synthesize 10M d=64
vectors, run trained-IVF retrieval and a brute-force ground-truth
subset at local[32], and measure

* IVF query throughput (scored candidates/sec) with the per-partition
  partial top-k ON vs OFF — the A/B that justifies `_topk_select`
  (OFF shuffles every scored candidate into the per-query window;
  ON shuffles only partitions x |Q| x k survivors);
* brute-force scan rate over N x |Q_sub| scored pairs;
* recall@k of IVF vs the brute ground truth on the query subset.

Vectors are a deterministic clustered mixture (no RNG, vectorized,
partition-independent): cluster center = Weyl sequence of (id mod
N_CLUSTERS) via frac(c*sqrt(prime_j)), plus a 0.3-amplitude per-id
Weyl perturbation via cbrt(prime_j) — the realistic embedding shape
(local neighborhoods) rather than uniform vectors, which at d=64 are
all near-orthogonal and defeat ANY ivf partitioning. Every
(N/queries)-th vector is reused verbatim as a query so self-retrieval
is a built-in correctness check (rank-1 hit must be the query id).

Usage: python tools/ann_scale_bench.py   (env: SPARK_GRAFT_ANN_VECS
default 10_000_000, SPARK_GRAFT_ANN_QUERIES default 256,
SPARK_GRAFT_CPUS). Prints one JSON line; paste into BENCH/ROBUSTNESS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

D = 64
N_CENTROIDS = 1024
N_PROBE = 16
K = 10
BRUTE_QUERIES = 32  # ground-truth subset (N x this scored pairs)

_PRIMES = [
    2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61,
    67, 71, 73, 79, 83, 89, 97, 101, 103, 107, 109, 113, 127, 131, 137,
    139, 149, 151, 157, 163, 167, 173, 179, 181, 191, 193, 197, 199,
    211, 223, 227, 229, 233, 239, 241, 251, 257, 263, 269, 271, 277,
    281, 283, 293, 307, 311,
]


N_CLUSTERS = 4096


def build_embeddings(spark, n: int, path: str) -> None:
    import pandas as pd

    if os.path.exists(path):
        return
    roots = np.sqrt(np.asarray(_PRIMES[:D], dtype=np.float64))
    roots2 = np.cbrt(np.asarray(_PRIMES[:D], dtype=np.float64))

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.float64)
            cid = np.mod(pdf["id"].to_numpy(dtype=np.int64), N_CLUSTERS).astype(np.float64)
            center = np.modf(np.outer(cid + 1.0, roots))[0] * 2.0 - 1.0
            noise = np.modf(np.outer(ids + 1.0, roots2))[0] * 2.0 - 1.0
            x = center + 0.3 * noise
            yield pd.DataFrame(
                {"vec_id": pdf["id"], "embedding": [row.tolist() for row in x]}
            )

    df = spark.range(n).repartition(256).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )
    df.write.mode("overwrite").parquet(path)


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import similarity
    from gtfs_to_geojson_spark.session import get_spark

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else (os.cpu_count() or 8)
    n_vecs = int(os.environ.get("SPARK_GRAFT_ANN_VECS", "10000000"))
    n_queries = int(os.environ.get("SPARK_GRAFT_ANN_QUERIES", "256"))
    emb_path = f"/tmp/spark_graft_ann_emb_{n_vecs}_{D}.parquet"

    spark = get_spark(
        app_name="ann-scale-bench",
        shuffle_partitions=cpus * 4,
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # a worker death at 320M-row fan-out should leave a Python
            # traceback, not just "exited unexpectedly"
            "spark.python.worker.faulthandler.enabled": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    build_embeddings(spark, n_vecs, emb_path)
    emb = spark.read.parquet(emb_path)

    stride = n_vecs // n_queries
    queries = (
        emb.filter(F.col("vec_id") % stride == 0)
        .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    )
    q_pdf = queries.toPandas()  # |Q| rows; reused across stages
    # ids 0, stride, ... — ceil(n/stride) of them, which is n_queries+1
    # when stride divides short (the 10M/256 case yields 257)
    n_queries = len(q_pdf)
    q_small = spark.createDataFrame(
        q_pdf.head(BRUTE_QUERIES), schema="q_id long, q_vec array<double>"
    )
    q_full = spark.createDataFrame(q_pdf, schema="q_id long, q_vec array<double>")

    out: dict = {
        "n_vecs": n_vecs, "dim": D, "n_queries": n_queries, "cpus": cpus,
        "n_centroids": N_CENTROIDS, "n_probe": N_PROBE, "k": K,
    }

    # ---- IVF retrieval, partial top-k ON vs OFF (interleaved best-of-2) ----
    avg_bucket = n_vecs / N_CENTROIDS
    scored_rows = int(n_queries * N_PROBE * avg_bucket)  # expected candidate volume
    walls: dict[str, float] = {}
    results: dict[str, object] = {}
    for rep in range(2):
        for label, partial in (("ivf_partial_topk", True), ("ivf_window_topk", False)):
            t0 = time.time()
            res = similarity.ivf_topk(
                emb, q_full, k=K, n_centroids=N_CENTROIDS, n_probe=N_PROBE,
                train_iters=1, partial_topk=partial, dim=D,
            )
            rows = res.collect()
            dt = time.time() - t0
            walls[label] = min(walls.get(label, float("inf")), dt)
            results[label] = {(r["q_id"], r["vec_id"]) for r in rows}
            sys.stderr.write(f"{label} rep{rep}: {dt:.1f}s ({len(rows)} rows)\n")
    assert results["ivf_partial_topk"] == results["ivf_window_topk"], "partial != window"
    out["ivf_partial_topk_sec"] = round(walls["ivf_partial_topk"], 1)
    out["ivf_window_topk_sec"] = round(walls["ivf_window_topk"], 1)
    out["ivf_scored_candidates"] = scored_rows
    out["ivf_candidates_per_sec"] = round(scored_rows / walls["ivf_partial_topk"], 0)

    # self-retrieval: every query IS a stored vector → rank-1 must be itself
    ivf_hits = results["ivf_partial_topk"]
    self_hits = sum(1 for (q, v) in ivf_hits if q == v)
    out["self_retrieval_hits"] = self_hits
    out["self_retrieval_ok"] = self_hits == n_queries

    if os.environ.get("SPARK_GRAFT_ANN_AB_ONLY"):
        # kernel A/B re-measurement: skip the (expensive, unchanged)
        # brute-force ground truth + recall stages
        print(json.dumps(out))
        sys.exit(0 if out["self_retrieval_ok"] else 1)

    # ---- brute-force ground truth on the subset ----
    t0 = time.time()
    brute = similarity.brute_force_topk(emb, q_small, k=K, dim=D).collect()
    t_brute = time.time() - t0
    out["brute_sec"] = round(t_brute, 1)
    out["brute_scored_pairs"] = n_vecs * BRUTE_QUERIES
    out["brute_pairs_per_sec"] = round(n_vecs * BRUTE_QUERIES / t_brute, 0)

    truth = {(r["q_id"], r["vec_id"]) for r in brute}
    sub_ids = set(q_pdf.head(BRUTE_QUERIES)["q_id"])
    ivf_sub = {(q, v) for (q, v) in ivf_hits if q in sub_ids}
    out["recall_at_k"] = round(len(truth & ivf_sub) / len(truth), 4)

    print(json.dumps(out))
    if not out["self_retrieval_ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
