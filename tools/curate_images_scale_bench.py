"""Heavy run + kill-free stage-resume check for the image-curation
job (jobs/curate_images_job.py), with an EXACT numpy ground truth.

Corpus (deterministic, id-arithmetic only): n images (default 20M).
- ids < 4·G are near-dup groups of 4: member m of group g has
  phash = xxhash64('g'||g) XOR (1 << m) — pairwise hamming 2 within a
  group, ~32 across (P(accidental ≤ 2) ≈ 1.1e-16 per pair, same
  argument as tools/signature_scale_bench.py; any deviation from the
  closed-form survivor counts fails the run, so accidentals cannot
  pass silently). Captions grow with m ('x' × (10 + 3m)), so the
  best-caption canonical is ALWAYS member 3.
- ids ≥ 4·G are singletons: phash = xxhash64('s'||id), caption
  'x' × (10 + (id % 5)·3) — the id%5==0 fifth has 10 chars and is
  dropped by --min-caption-chars 12.
- (w, h) = 64·(1 + id·M1 % 28), 64·(1 + id·M2 % 31) — the 64-px rows
  are dropped by --min-side 128; bucket/batch layout then has the
  same closed form as tools/batch_layout_bench.py.

Ground truth: numpy materializes the survivor mask over all n ids
(member-of-group? canonical? caption length? min-side?), buckets the
survivors, ranks them per bucket, and checks per-stage row counts,
per-bucket batch layout sums, and 1,000 exact (bucket, batch, pos)
probes. Then stages ≥ s3 are deleted and the job re-runs with
--resume: stages 1–2 must be read back (resumed=true) and the final
batches output must be digest-identical to the first run.

Usage: python tools/curate_images_scale_bench.py
(env: SPARK_GRAFT_IMG_ROWS default 20_000_000, SPARK_GRAFT_IMG_GROUPS
default n//8 (so half the corpus sits in near-dup groups),
SPARK_GRAFT_CPUS). Prints one JSON line; paste into
BENCH/ROBUSTNESS.md."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

M1, M2 = 2654435761, 40503
BATCH = 64
MIN_SIDE = 128
MIN_CAP = 12


def _write_corpus(path: str, n: int, g4: int, cpus: int):
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", app_name="curate-images-synth",
        shuffle_partitions=cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, n, 1, cpus * 4).select(
        F.col("id").alias("image_id"),
        (64 * (1 + (F.col("id") * M1) % 28)).cast("int").alias("w"),
        (64 * (1 + (F.col("id") * M2) % 31)).cast("int").alias("h"),
        F.lit("raw").alias("fmt"),
        F.when(
            F.col("id") < 4 * g4,
            F.repeat(F.lit("x"), (10 + 3 * (F.col("id") % 4)).cast("int")),
        ).otherwise(
            F.repeat(F.lit("x"), (10 + 3 * (F.col("id") % 5)).cast("int"))
        ).alias("caption"),
        F.when(
            F.col("id") < 4 * g4,
            F.xxhash64(F.concat(F.lit("g"), (F.col("id") / 4).cast("long").cast("string")))
            .bitwiseXOR(F.expr("shiftleft(cast(1 as bigint), cast(id % 4 as int))")),
        ).otherwise(
            F.xxhash64(F.concat(F.lit("s"), F.col("id").cast("string")))
        ).alias("phash"),
    )
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def _ground_truth(n: int, g4: int):
    from gtfs_to_geojson_spark.operators import multimodal

    ids = np.arange(n, dtype=np.int64)
    w = 64 * (1 + (ids * M1) % 28)
    h = 64 * (1 + (ids * M2) % 31)
    in_group = ids < 4 * g4
    cap_len = np.where(in_group, 10 + 3 * (ids % 4), 10 + 3 * (ids % 5))

    # s1 exact (phash-equality: all phashes distinct) → no drops
    # s2 near-dup canonical: group member 3 survives, 0..2 dropped
    canonical = ~in_group | (ids % 4 == 3)
    # s3 quality: min-side + caption length
    quality = (w >= MIN_SIDE) & (h >= MIN_SIDE) & (cap_len >= MIN_CAP)
    surv = canonical & quality

    bks = multimodal.DEFAULT_ASPECT_BUCKETS
    scale = 1_000_000
    ar = (w * scale) // h
    bars = np.array([(bw * scale) // bh for bw, bh in bks], dtype=np.int64)
    bucket = np.abs(ar[:, None] - bars[None, :]).argmin(axis=1)

    sids = ids[surv]
    sbucket = bucket[surv]
    counts = {}
    layout = {}
    rank = np.empty(len(sids), dtype=np.int64)
    for b in np.unique(sbucket):
        m = sbucket == b
        c = int(m.sum())
        counts[int(b)] = c
        rank[m] = np.arange(c)  # sids ascending ⇒ rank = position
        full, r = divmod(c, BATCH)
        layout[int(b)] = (
            BATCH * (full * (full - 1)) // 2 + r * full,
            full * (BATCH * (BATCH - 1)) // 2 + r * (r - 1) // 2,
            (c - 1) // BATCH,
        )
    probe_idx = np.arange(len(sids))[:: max(len(sids) // 1000, 1)][:1000]
    probes = {
        int(sids[i]): (int(sbucket[i]), int(rank[i] // BATCH), int(rank[i] % BATCH))
        for i in probe_idx
    }
    stage_rows = {
        "s1_exact": n,
        "s2_neardup": int(canonical.sum()),
        "s3_quality": int(surv.sum()),
        "batches": int(surv.sum()),
    }
    return stage_rows, counts, layout, probes


def _run_job(images: str, out: str, cpus: int, resume: bool) -> dict:
    env = dict(os.environ)
    env["PYSPARK_SUBMIT_ARGS"] = (
        f"--master local[{cpus}] --driver-memory 48g pyspark-shell"
    )
    env["PYTHONPATH"] = os.getcwd()
    cmd = [
        sys.executable, "jobs/curate_images_job.py",
        "--images", images, "--out", out,
        "--min-side", str(MIN_SIDE), "--min-caption-chars", str(MIN_CAP),
        "--batch-size", str(BATCH),
        "--shuffle-partitions", str(cpus * 4),
    ] + (["--resume"] if resume else [])
    r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=7200)
    if r.returncode != 0:
        print(r.stdout[-4000:], file=sys.stderr)
        print(r.stderr[-4000:], file=sys.stderr)
        raise RuntimeError(f"job failed rc={r.returncode}")
    return json.loads([ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1])


def _digest(path: str, cpus: int, probes_want=None):
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]", app_name="curate-images-verify",
        shuffle_partitions=cpus * 4,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(f"{path}/batches")
    per_bucket = {
        r["bucket_id"]: (r["n"], r["sb"], r["sp"], r["mb"])
        for r in df.groupBy("bucket_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("batch_id").alias("sb"),
            F.sum("pos_in_batch").alias("sp"),
            F.max("batch_id").alias("mb"),
        ).collect()
    }
    dig = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("image_id") * 131 + F.col("batch_id") * 7 + F.col("pos_in_batch")).alias("s"),
        F.bit_xor(F.xxhash64("image_id", "bucket_id", "batch_id", "pos_in_batch")).alias("x"),
    ).collect()[0]
    got = {
        r["image_id"]: (r["bucket_id"], r["batch_id"], r["pos_in_batch"])
        for r in df.filter(
            F.col("image_id").isin([int(k) for k in probes_want])
        ).collect()
    } if probes_want else {}
    spark.stop()
    return per_bucket, (dig["n"], dig["s"], dig["x"]), got


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n = int(os.environ.get("SPARK_GRAFT_IMG_ROWS", "20000000"))
    g4 = int(os.environ.get("SPARK_GRAFT_IMG_GROUPS", str(n // 8)))

    images = f"/tmp/spark_graft_curate_images_{n}_{g4}.parquet"
    out = f"/tmp/spark_graft_curate_images_out_{n}_{g4}"
    if not os.path.exists(f"{images}/_SUCCESS"):
        _write_corpus(images, n, g4, cpus)

    stage_rows, counts, layout, probes = _ground_truth(n, g4)

    t0 = time.time()
    res = _run_job(images, out, cpus, resume=False)
    full_wall = time.time() - t0

    ok_stages = all(
        next(s["rows"] for s in res["stages"] if s["stage"] == k) == v
        for k, v in stage_rows.items()
    )

    per_bucket, dig1, got = _digest(out, cpus, probes)
    ok_counts = set(per_bucket) == set(counts) and all(
        per_bucket[b][0] == c for b, c in counts.items()
    )
    ok_layout = all(
        (per_bucket[b][1], per_bucket[b][2], per_bucket[b][3]) == layout[b]
        for b in counts
    )
    ok_probes = all(got.get(k) == tuple(v) for k, v in probes.items())

    # stage-level resume: delete s3 onward, re-run with --resume
    for st in ("s3_quality", "batches"):
        shutil.rmtree(f"{out}/{st}", ignore_errors=True)
    t1 = time.time()
    res2 = _run_job(images, out, cpus, resume=True)
    resume_wall = time.time() - t1
    resumed_ok = all(
        s["resumed"] for s in res2["stages"] if s["stage"] in ("s1_exact", "s2_neardup")
    )
    _, dig2, _ = _digest(out, cpus, None)

    print(
        json.dumps(
            {
                "n_images": n,
                "n_groups": g4,
                "cpus": cpus,
                "full_wall_sec": round(full_wall, 1),
                "job_wall_sec": res["wall_sec"],
                "images_per_sec": round(n / res["wall_sec"], 0),
                "stage_secs": {s["stage"]: s["sec"] for s in res["stages"]},
                "images_out": res["images_out"],
                "stage_rows_exact": ok_stages,
                "bucket_counts_exact": ok_counts,
                "layout_sums_exact": ok_layout,
                "probes_exact": ok_probes,
                "resume_wall_sec": round(resume_wall, 1),
                "resume_stage_skips_ok": resumed_ok,
                "digest_identical_after_resume": dig1 == dig2,
            }
        )
    )
    ok = all([ok_stages, ok_counts, ok_layout, ok_probes, resumed_ok, dig1 == dig2])
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
