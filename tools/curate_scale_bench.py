"""End-to-end corpus-curation pipeline at scale, with closed-form
per-stage ground truth (jobs/curate_corpus_job.py).

Corpus layout (N docs, deterministic):
  - ids [0, hot):            one hot group — identical lowercase text
                             (exact dedup must keep id 0 only)
  - ids [hot, hot+4G):       G groups of 4 — members 0,1 lowercase,
                             members 2,3 UPPERCASE of the same text:
                             exact dedup keeps {m0, m2}; MinHash
                             shingles are lowercased, so (m0, m2) is a
                             J=1 LSH pair and clustering keeps m0 only
  - ids [hot+4G, N):         S singletons, globally unique text
Every word is 'a' + 15 md5-hex chars ('a' pins a letter so the UPPER
variant always differs byte-wise — a letterless hex word would make
upper(text) == text and silently merge a group at the exact stage).
Eval set: E docs copying singleton text (e·7919 mod S — injective for
E·7919 < S·two-wraps; asserted) → decontamination must drop exactly E.

Expected survivors: s1 = 1 + 2G + S, s2 = s3 = 1 + G + S,
s4 = s2 − E, shards = ceil(2·s4 / shard_tokens). The run FAILS unless
every stage matches exactly. After the full run, stages ≥4 are
deleted and the job re-runs with --resume: stages 1–3 must be read
back (resumed=true), 4–6 recomputed, and the final shard digest
(count + sum + xor of doc_id) must be identical.

Usage: python tools/curate_scale_bench.py
(env: SPARK_GRAFT_CURATE_DOCS default 5_000_000, _HOT default 10_000,
_EVAL default 10_000, _SHARD_TOKENS default 1_000_000)
Prints one JSON line; paste into BENCH/ROBUSTNESS.md.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, ".")


def build_corpus(spark, n_docs: int, hot: int, path: str, eval_path: str, n_eval: int):
    from pyspark.sql import functions as F

    g4 = (n_docs // 10) // 4 * 4
    first_single = hot + g4
    n_single = n_docs - first_single
    if os.path.exists(path) and os.path.exists(eval_path):
        return g4 // 4, n_single

    def word(salt, gid):
        return F.concat(
            F.lit("a"), F.substring(F.md5(F.concat_ws(":", F.lit(salt), gid.cast("string"))), 1, 15)
        )

    ids = spark.range(n_docs).select(F.col("id"))
    gid = (
        F.when(F.col("id") < hot, F.lit(0))
        .when(F.col("id") < first_single, 1 + F.floor((F.col("id") - hot) / 4))
        .otherwise(1 + g4 // 4 + (F.col("id") - first_single))
    )
    base = F.concat_ws(" ", word("w0", gid), word("w1", gid))
    member = F.when(
        (F.col("id") >= hot) & (F.col("id") < first_single), (F.col("id") - hot) % 4
    ).otherwise(F.lit(0))
    text = F.when(member >= 2, F.upper(base)).otherwise(base)
    ids.select(F.col("id").alias("doc_id"), text.alias("text")).repartition(128).write.mode(
        "overwrite"
    ).parquet(path)

    # eval docs copy singleton texts (lowercase) — e·7919 mod n_single
    ev = spark.range(n_eval)
    sid = 1 + g4 // 4 + (F.col("id") * 7919) % n_single
    ev.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", word("w0", sid), word("w1", sid)).alias("text"),
    ).coalesce(1).write.mode("overwrite").parquet(eval_path)
    return g4 // 4, n_single


def run_job(docs, out, ev, resume=False):
    cmd = [
        sys.executable, "jobs/curate_corpus_job.py",
        "--docs", docs, "--out", out, "--eval", ev,
        "--decontam-n", "2", "--min-words", "2", "--max-dup-word-frac", "0.9",
        # 8-gram shingles, not the 4-gram default: the corpus-sizing
        # lesson from the 50M dedup run (BENCH/ROBUSTNESS.md) measured
        # live here too — at 5M hex-word docs, 4-gram background
        # similarity (universe 17^4) let ~113 accidental pairs through
        # 16-hash/4-band LSH and broke the closed-form stage counts;
        # 8-gram shingles push expected accidentals corpus-wide to ~1e-4
        "--shingle-n", "8",
        "--shard-tokens", os.environ.get("SPARK_GRAFT_SHARD_TOKENS", "1000000"),
        "--shuffle-partitions", "64",
    ] + (["--resume"] if resume else [])
    # stand-ins for what spark-submit provides on a real cluster:
    # --py-files (import path) and --driver-memory (the job sets only
    # engine-required confs; memory is the submitter's call — without
    # this a plain `python` launch gets the 1g default heap and the
    # 5M LSH stage dies in the block manager)
    env = dict(os.environ, PYTHONPATH=".")
    mem = env.get("SPARK_GRAFT_DRIVER_MEM", "48g")
    env.setdefault("PYSPARK_SUBMIT_ARGS", f"--driver-memory {mem} pyspark-shell")
    t0 = time.time()
    res = subprocess.run(cmd, capture_output=True, text=True, env=env)
    if res.returncode != 0:
        sys.stderr.write(res.stdout[-4000:] + res.stderr[-4000:])
        raise SystemExit(f"job failed rc={res.returncode}")
    line = [ln for ln in res.stdout.splitlines() if ln.startswith('{"job"')][-1]
    return json.loads(line), round(time.time() - t0, 1)


def digest(spark, path):
    from pyspark.sql import functions as F

    row = (
        spark.read.parquet(path)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("doc_id").alias("s"),
            F.expr("bit_xor(doc_id)").alias("x"),
            F.count_distinct("shard_id").alias("shards"),
        )
        .collect()[0]
    )
    return (row["n"], row["s"], row["x"], row["shards"])


def main():
    from gtfs_to_geojson_spark.session import get_spark

    n_docs = int(os.environ.get("SPARK_GRAFT_CURATE_DOCS", "5000000"))
    hot = int(os.environ.get("SPARK_GRAFT_CURATE_HOT", "10000"))
    n_eval = int(os.environ.get("SPARK_GRAFT_CURATE_EVAL", "10000"))
    shard_tokens = int(os.environ.get("SPARK_GRAFT_SHARD_TOKENS", "1000000"))
    docs_path = f"/tmp/spark_graft_curate_docs_{n_docs}_{hot}.parquet"
    eval_path = f"/tmp/spark_graft_curate_eval_{n_eval}_{n_docs}.parquet"
    out = "/tmp/spark_graft_curate_out"

    spark = get_spark(
        app_name="curate-bench-driver",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_groups, n_single = build_corpus(spark, n_docs, hot, docs_path, eval_path, n_eval)
    # e → (e·7919) mod n_single collides iff (e1−e2) is a multiple of
    # n_single/gcd(7919, n_single); 7919 is prime so gcd is 1 unless
    # n_single is a multiple of 7919
    assert n_eval <= n_single // math.gcd(7919, n_single), "eval map not injective"

    exp_s1 = 1 + 2 * n_groups + n_single
    exp_s2 = 1 + n_groups + n_single
    exp_s4 = exp_s2 - n_eval
    exp_shards = math.ceil(2 * exp_s4 / shard_tokens)

    shutil.rmtree(out, ignore_errors=True)
    m1, wall1 = run_job(docs_path, out, eval_path)
    got = {s["stage"]: s["rows"] for s in m1["stages"]}
    checks = {
        "s1_exact": (got["s1_exact"], exp_s1),
        "s2_neardup": (got["s2_neardup"], exp_s2),
        "s3_quality": (got["s3_quality"], exp_s2),
        "s4_decontam": (got["s4_decontam"], exp_s4),
        "shards_rows": (got["shards"], exp_s4),
        "n_shards": (m1["n_shards"], exp_shards),
    }
    exact = all(a == b for a, b in checks.values())
    d1 = digest(spark, f"{out}/shards")

    # resume semantics: drop stages >= 4, rerun with --resume
    for st in ("s4_decontam", "shards"):
        shutil.rmtree(f"{out}/{st}", ignore_errors=True)
    m2, wall2 = run_job(docs_path, out, eval_path, resume=True)
    resumed = {s["stage"]: s["resumed"] for s in m2["stages"]}
    resume_ok = (
        resumed["s1_exact"] and resumed["s2_neardup"] and resumed["s3_quality"]
        and not resumed["s4_decontam"] and not resumed["shards"]
    )
    d2 = digest(spark, f"{out}/shards")

    result = {
        "n_docs": n_docs, "n_groups": n_groups, "n_singletons": n_single,
        "n_eval": n_eval, "cpus": os.cpu_count(),
        "full_run_sec": wall1, "stage_secs": {s["stage"]: s["sec"] for s in m1["stages"]},
        "docs_per_sec": round(n_docs / wall1, 0),
        "docs_out": m1["docs_out"], "n_shards": m1["n_shards"],
        "per_stage_exact_match": exact,
        "resume_run_sec": wall2, "resume_stage_skips_ok": resume_ok,
        "digest_identical_after_resume": d1 == d2,
    }
    print(json.dumps(result))
    if not (exact and resume_ok and d1 == d2):
        for k, (a, b) in checks.items():
            if a != b:
                sys.stderr.write(f"MISMATCH {k}: got {a} expected {b}\n")
        raise SystemExit("curation pipeline ground truth NOT recovered")


if __name__ == "__main__":
    main()
