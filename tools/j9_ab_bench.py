"""A/B bench for the j9 family drift (VERDICT r3 item 2).

BENCH_r03 showed j9_tile_assign +36%, j9c_decode_tile_assign +25%,
j9b_image_in_polygon +15% vs BENCH_r02, while the rest of the suite got
faster. Hypotheses: (a) host noise, (b) the r3 corrupt-byte hardening
(try/except normalization in the Arrow kernels, operators/multimodal.py).
This tool decides it by running the SAME j9 workload against two
checkouts of the engine, interleaved A B A B ... in one session, so any
host drift hits both sides equally.

Usage:
    python tools/j9_ab_bench.py <repoA> <repoB> [rounds]

Each round spawns one subprocess per side (fresh JVM — codegen
compilation is paid identically), which runs j9 / j9b / j9c twice and
reports per-query minima. Both sides read the SAME image cache parquet
(built beforehand by bench.py or a prior run), so inputs are bit-equal.
Output: one JSON line with per-side minima over rounds + row counts
(count mismatch between sides would invalidate the comparison).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from pyspark.sql import functions as F
from gtfs_to_geojson_spark.operators import multimodal, spatial
from gtfs_to_geojson_spark.session import get_spark

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="j9-ab", shuffle_partitions=cpus * 2,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

img_path = sys.argv[2]
IMG_REPLICATE = 8
TILE_RES = 14  # = plans.oracle_queries.TILE_RES (hardcoded: both sides must agree)
images = spark.read.parquet(img_path)
images_rep = (images.select("caption", "phash")
              .withColumn("_ep", F.explode(F.sequence(F.lit(0), F.lit(IMG_REPLICATE - 1))))
              .drop("_ep"))
n_images = 400000
n_decode = 100000
decode_subset = images.filter(
    F.pmod(F.xxhash64("image_id"), F.lit(max(1, n_images // n_decode))) == 0)

def j9():
    t = spatial.assign_images_to_tiles(images_rep, res=TILE_RES)
    return t.groupBy("tile").agg(F.count(F.lit(1)).alias("n")).count()

def j9b():
    import pandas as pd
    from gtfs_to_geojson_spark import images as I
    d = I.DENSE_BOX; b = I.DEFAULT_BBOX; mx = (b[0] + b[2]) / 2
    polys = spark.createDataFrame(pd.DataFrame({
        "poly_id": [0, 1],
        "polygon": [
            [[[d[0], d[1]], [d[2], d[1]], [d[2], d[3]], [d[0], d[3]], [d[0], d[1]]]],
            [[[b[0], b[1]], [mx, b[1]], [mx, b[3]], [b[0], b[3]], [b[0], b[1]]]],
        ]}), schema="poly_id long, polygon array<array<array<double>>>")
    return spatial.assign_images_to_polygons(images_rep, polys, res=18).select(
        F.count(F.lit(1)).alias("n"), F.count_distinct("caption")).collect()[0][0]

def j9c():
    return (multimodal.decode_tile_assign(decode_subset, res=TILE_RES)
            .filter(F.col("phash_match"))
            .groupBy("tile").agg(F.count(F.lit(1)).alias("n")).count())

out = {}
for name, fn in (("j9", j9), ("j9b", j9b), ("j9c", j9c)):
    best, cnt = None, None
    for _ in range(2):
        t0 = time.time(); cnt = fn(); dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    out[name] = round(best, 3)
    out[name + "_rows"] = cnt
print("J9AB " + json.dumps(out))
"""


def run_side(repo: str, img_path: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, repo, img_path],
        capture_output=True, text=True, env=env, cwd=repo,
    )
    for line in p.stdout.splitlines():
        if line.startswith("J9AB "):
            return json.loads(line[5:])
    raise RuntimeError(f"side {repo} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    img_path = "/tmp/spark_graft_bench_images_400000.parquet"
    if not os.path.exists(img_path):
        raise SystemExit("image cache missing — run bench.py once first")
    acc: dict[str, dict] = {"A": {}, "B": {}}
    for r in range(rounds):
        for tag, repo in (("A", repo_a), ("B", repo_b)):
            res = run_side(repo, img_path)
            sys.stderr.write(f"round {r} side {tag} ({repo}): {res}\n")
            for k, v in res.items():
                if k.endswith("_rows"):
                    prev = acc[tag].get(k)
                    if prev is not None and prev != v:
                        raise SystemExit(f"row-count drift {k} side {tag}: {prev} vs {v}")
                    acc[tag][k] = v
                else:
                    acc[tag][k] = min(v, acc[tag].get(k, float("inf")))
    summary = {
        "rounds": rounds, "repo_a": repo_a, "repo_b": repo_b,
        "A": acc["A"], "B": acc["B"],
        "ratio_B_over_A": {
            k: round(acc["B"][k] / acc["A"][k], 3)
            for k in ("j9", "j9b", "j9c")
        },
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
