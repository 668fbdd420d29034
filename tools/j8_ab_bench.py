"""A/B bench for the j8_knn drift (VERDICT r4 item 3).

BENCH_r04 showed j8_knn 1.40→2.16 s (+54%) vs BENCH_r03 while its code
path gained only optional row-count hints that default to the old
probes (operators/spatial.py auto mode) — and the whole r4 suite
drifted +8% including untouched pure-JVM paths, which smells like host
load during the driver run (exactly the j9 story that
tools/j9_ab_bench.py settled in r4: HEAD effect ≤2.8%). This tool
decides it the same way: the SAME j8 workload against two checkouts of
the engine, interleaved A B A B ... in one session, so host drift hits
both sides equally.

Usage:
    python tools/j8_ab_bench.py <repoA> <repoB> [rounds] [sf_dir]

Each round spawns one subprocess per side (fresh JVM — codegen
compilation is paid identically), which runs the bench.py j8_knn
workload (cached unique-id point table × supplier points, res 16, k=1,
auto strategy) twice and reports the per-round minimum. Both sides
read the SAME points cache parquet (built beforehand by bench.py), so
inputs are bit-equal; a row-count mismatch between sides aborts.
Output: one JSON line with per-side minima over rounds + the ratio.
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
from gtfs_to_geojson_spark.operators import spatial
from gtfs_to_geojson_spark.plans import oracle_queries as OQ
from gtfs_to_geojson_spark.session import get_spark

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="j8-ab", shuffle_partitions=cpus * 2,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

pts_path, sf_dir = sys.argv[2], sys.argv[3]
KNN_RES = 16  # = bench.py KNN_RES (hardcoded: both sides must agree)

def j8():
    return spatial.knn_join(
        spark.read.parquet(pts_path), OQ.supplier_points(spark, sf_dir),
        res=KNN_RES, k=1, point_key="point_id", target_key="s_suppkey",
    ).count()

best, cnt = None, None
for _ in range(2):
    t0 = time.time(); cnt = j8(); dt = time.time() - t0
    best = dt if best is None else min(best, dt)
print("J8AB " + json.dumps({"j8": round(best, 3), "j8_rows": cnt}))
"""


def run_side(repo: str, pts_path: str, sf_dir: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    p = subprocess.run(
        [sys.executable, "-c", CHILD, repo, pts_path, sf_dir],
        capture_output=True, text=True, env=env, cwd=repo,
    )
    for line in p.stdout.splitlines():
        if line.startswith("J8AB "):
            return json.loads(line[5:])
    raise RuntimeError(f"side {repo} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")


def main():
    repo_a, repo_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    sf_tag = sf_dir.rstrip("/").replace("/", "_")
    pts_path = f"/tmp/spark_graft_bench_knnpts_v2_{sf_tag}_1.parquet"
    if not os.path.exists(pts_path):
        raise SystemExit("points cache missing — run bench.py once first")
    acc: dict[str, dict] = {"A": {}, "B": {}}
    for r in range(rounds):
        for tag, repo in (("A", repo_a), ("B", repo_b)):
            res = run_side(repo, pts_path, sf_dir)
            sys.stderr.write(f"round {r} side {tag} ({repo}): {res}\n")
            for k, v in res.items():
                if k.endswith("_rows"):
                    prev = acc[tag].get(k)
                    if prev is not None and prev != v:
                        raise SystemExit(f"row-count drift {k} side {tag}: {prev} vs {v}")
                    acc[tag][k] = v
                else:
                    acc[tag][k] = min(v, acc[tag].get(k, float("inf")))
    if acc["A"]["j8_rows"] != acc["B"]["j8_rows"]:
        raise SystemExit(f"row-count mismatch A={acc['A']['j8_rows']} B={acc['B']['j8_rows']}")
    summary = {
        "metric": "j8_knn A/B (interleaved, fresh JVM per side per round, best over rounds)",
        "rounds": rounds,
        "A": repo_a,
        "B": repo_b,
        "a_sec": acc["A"]["j8"],
        "b_sec": acc["B"]["j8"],
        "rows": acc["A"]["j8_rows"],
        "b_over_a": round(acc["B"]["j8"] / acc["A"]["j8"], 3),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
