"""Kill-and-resume robustness run for the lineage manifest (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

tests/test_lineage.py proves resume semantics on a toy frame; this tool
EXECUTES the failure the design exists for, at bench scale: launch the
spark-submit-shaped job (jobs/tile_assign_job.py) over tens of millions
of images, SIGKILL the whole process group mid-run (driver + JVM — a
real preemption, not a graceful stop), then rerun with ``--resume`` and
verify:

* the resumed run SKIPS every bucket whose manifest row committed
  before the kill (its own JSON reports buckets_skipped_resume);
* the final assignments output is IDENTICAL to an uninterrupted
  control run — row count, per-row value hash, and no duplicate
  image_ids (dynamic partition overwrite makes the killed wave's
  partial bucket directories safe to rewrite);
* wall-clock accounting: control wall vs (killed fraction + resume
  wall), i.e. how much work the manifest actually saved.

Input is the input_hint-shaped image table reduced to the columns the
tile path needs (image_id, phash — the job tolerates pre-projected
tables); phash = xxhash64(id) exercises the full deterministic
geotag→tile→bucket chain. bucket-res 13 over the warp's city-scale
extent yields ~40 buckets with realistic skew (38 .. 3e5 rows per
bucket at 1M inputs).

Usage: python tools/resume_bench.py
(env: SPARK_GRAFT_RESUME_ROWS default 50_000_000,
SPARK_GRAFT_RESUME_KILL_FRAC default 0.5). Prints one JSON line;
paste the section into BENCH/ROBUSTNESS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

sys.path.insert(0, ".")

RES, BUCKET_RES, WAVE = 14, 13, 4


def job_cmd(images: str, out: str, resume: bool) -> list[str]:
    cmd = [
        sys.executable, "jobs/tile_assign_job.py",
        "--images", images, "--out", out,
        "--res", str(RES), "--bucket-res", str(BUCKET_RES),
        "--wave-size", str(WAVE),
    ]
    if resume:
        cmd.append("--resume")
    return cmd


def _env() -> dict:
    # stand-ins for what spark-submit provides on a real cluster:
    # --py-files (import path) and --driver-memory (the job itself
    # sets only engine-required confs; memory is the submitter's call)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    mem = env.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    env.setdefault("PYSPARK_SUBMIT_ARGS", f"--driver-memory {mem} pyspark-shell")
    return env


def run_to_end(cmd: list[str]) -> tuple[dict, float]:
    t0 = time.time()
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=3600, env=_env()
    )
    wall = time.time() - t0
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"job produced no JSON line:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1]), wall


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.session import get_spark

    n_rows = int(os.environ.get("SPARK_GRAFT_RESUME_ROWS", "50000000"))
    kill_frac = float(os.environ.get("SPARK_GRAFT_RESUME_KILL_FRAC", "0.5"))
    images = f"/tmp/spark_graft_resume_imgs_{n_rows}.parquet"
    out_a, out_b = "/tmp/spark_graft_resume_A", "/tmp/spark_graft_resume_B"

    spark = get_spark(
        app_name="resume-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(images):
        spark.range(n_rows).select(
            F.col("id").cast("string").alias("image_id"),
            F.xxhash64("id").alias("phash"),
        ).repartition(128).write.parquet(images)

    res: dict = {"n_rows": n_rows, "bucket_res": BUCKET_RES, "wave_size": WAVE}

    # ---- control: uninterrupted run ----
    shutil.rmtree(out_a, ignore_errors=True)
    ctl, wall_a = run_to_end(job_cmd(images, out_a, resume=False))
    res["control"] = {"buckets": ctl["buckets_processed"], "rows": ctl["rows"],
                      "wall_sec": round(wall_a, 1)}
    sys.stderr.write(f"control: {ctl}\n")

    # ---- interrupted run: SIGKILL the whole process group mid-run.
    # The kill is triggered by the manifest itself (poll until ~half
    # the buckets have committed), so it deterministically lands
    # inside the wave loop — not in startup, not after completion. ----
    import pandas as pd

    shutil.rmtree(out_b, ignore_errors=True)
    manifest_dir = f"{out_b}/_lineage"
    kill_target = max(1, int(ctl["buckets_processed"] * kill_frac))

    def manifest_done() -> int:
        try:
            files = [f for f in os.listdir(manifest_dir) if f.endswith(".parquet")]
            return sum(len(pd.read_parquet(os.path.join(manifest_dir, f))) for f in files)
        except (FileNotFoundError, OSError):
            return 0

    t0 = time.time()
    proc = subprocess.Popen(
        job_cmd(images, out_b, resume=False),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True, env=_env(),
    )
    while proc.poll() is None and manifest_done() < kill_target:
        time.sleep(0.5)
    if proc.poll() is not None:
        raise RuntimeError(
            f"job finished before reaching the kill target ({kill_target} "
            "buckets) — enlarge SPARK_GRAFT_RESUME_ROWS"
        )
    os.killpg(proc.pid, signal.SIGKILL)
    proc.wait()
    killed_wall = time.time() - t0
    done_files = [f for f in os.listdir(manifest_dir) if f.endswith(".parquet")]
    done_before_kill = (
        spark.read.parquet(manifest_dir).filter(F.col("status") == "done").count()
        if done_files else 0
    )
    res["killed"] = {"after_sec": round(killed_wall, 1),
                     "buckets_done_before_kill": done_before_kill}
    sys.stderr.write(f"killed at {killed_wall:.1f}s, {done_before_kill} buckets committed\n")

    # ---- resume ----
    rsm, wall_r = run_to_end(job_cmd(images, out_b, resume=True))
    res["resume"] = {
        "buckets_skipped": rsm["buckets_skipped_resume"],
        "buckets_recomputed": rsm["buckets_processed"],
        "wall_sec": round(wall_r, 1),
    }
    if rsm["buckets_skipped_resume"] != done_before_kill:
        raise RuntimeError(
            f"resume skipped {rsm['buckets_skipped_resume']} buckets but the "
            f"manifest committed {done_before_kill} before the kill"
        )

    # ---- equality vs control: count, value hash, no duplicate ids ----
    def digest(path):
        df = spark.read.parquet(f"{path}/assignments")
        row_hash = F.xxhash64(F.concat_ws("|", *[F.col(c).cast("string") for c in sorted(df.columns)]))
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            # xor is order-insensitive; the decimal sum breaks the
            # xor blind spot for rows duplicated an even number of
            # times (count_distinct guards ids separately)
            F.bit_xor(row_hash).alias("h"),
            F.sum(row_hash.cast("decimal(38,0)")).alias("hsum"),
            F.count_distinct("image_id").alias("ids"),
        ).first()
    da, db = digest(out_a), digest(out_b)
    res["identical_output"] = (da["n"] == db["n"] == da["ids"] == db["ids"]
                               and da["h"] == db["h"] and da["hsum"] == db["hsum"])
    res["rows_checked"] = da["n"]
    if not res["identical_output"]:
        raise RuntimeError(f"control {da} != resumed {db}")

    res["work_saved_frac"] = round(1.0 - wall_r / wall_a, 3)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
