"""Z-order layout evidence: identical data written Morton-clustered vs
unclustered, same cell-range query on both — reports wall time and the
fraction of parquet row groups whose [min,max] key stats intersect the
query range (what the reader can prune without reading pages).

Usage: python tools/layout_bench.py   → prints a table, writes
       BENCH/layout_pruning.md
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from gtfs_to_geojson_spark import cells  # noqa: E402
from gtfs_to_geojson_spark.operators import layout  # noqa: E402
from gtfs_to_geojson_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
POINT_FACTOR = int(os.environ.get("SPARK_GRAFT_POINT_FACTOR", "16"))
DATA_RES = 16
QUERY_RES = int(os.environ.get("SPARK_GRAFT_LAYOUT_QUERY_RES", "14"))


def rg_stats(path: str):
    import pyarrow.parquet as pq

    out = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        ci = names.index(layout.MORTON_COL)
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            out.append((st.min, st.max, md.row_group(rg).num_rows))
    return out


def main():
    from pyspark.sql import functions as F

    import bench as B

    spark = get_spark(
        app_name="layout-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    pts_path = B.build_points_cache(spark, SF_DIR, POINT_FACTOR)
    pts = spark.read.parquet(pts_path)
    n_rows = pts.count()

    sorted_path = f"/tmp/spark_graft_layout_sorted_{POINT_FACTOR}.parquet"
    shuffled_path = f"/tmp/spark_graft_layout_shuffled_{POINT_FACTOR}.parquet"
    if not os.path.exists(sorted_path):
        layout.write_spatial_sorted(pts, sorted_path, res=DATA_RES, n_files=64)
    if not os.path.exists(shuffled_path):
        # same data + same key column, but hash-scattered (no spatial order)
        keyed = layout.with_morton_key(pts, DATA_RES)
        keyed.repartition(64, "point_id").write.mode("overwrite").parquet(shuffled_path)

    # query: one res-8 cell over the dense central region
    probe = pts.limit(1).collect()[0]
    cell = int(cells.encode(np.asarray([probe["lat"]]), np.asarray([probe["lon"]]), QUERY_RES)[0])
    lo, hi = cells.morton_range_for_cell(cell, DATA_RES)

    def timed_count(path: str) -> tuple[float, int]:
        best, n = None, 0
        for _ in range(3):
            t0 = time.time()
            n = (
                spark.read.parquet(path)
                .filter(layout.cell_range_predicate(cell, DATA_RES))
                .count()
            )
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best, n

    rows = []
    for name, path in (("morton-sorted", sorted_path), ("hash-scattered", shuffled_path)):
        t, n_hit = timed_count(path)
        stats = rg_stats(path)
        touched = [r for r in stats if not (r[1] < lo or r[0] > hi)]
        rows.append(
            (
                name,
                t,
                n_hit,
                len(touched),
                len(stats),
                sum(r[2] for r in touched),
            )
        )

    md = [
        "# Z-order layout: stats-pruned scan evidence",
        "",
        f"Input: {n_rows:,} points (bench points cache), written as 64 parquet "
        f"files each way; query = all rows in one res-{QUERY_RES} cell "
        f"(Morton BETWEEN {lo} AND {hi} at res {DATA_RES}), best of 3.",
        "",
        "| layout | scan time (s) | rows hit | row groups touched | total row groups | rows in touched groups |",
        "|---|---|---|---|---|---|",
    ]
    for name, t, n_hit, n_t, n_all, rows_t in rows:
        md.append(f"| {name} | {t:.3f} | {n_hit:,} | {n_t} | {n_all} | {rows_t:,} |")
    md += [
        "",
        "Identical bytes, identical query, identical result. The clustered",
        "layout confines the key range to a handful of row groups (min/max",
        "stats disjoint by construction), so the reader decodes only those;",
        "the scattered layout intersects every row group and must scan the",
        "full key column. 'Rows in touched groups' is the scan-cost proxy —",
        "at this (small) input the wall clock is job-overhead-bound, but the",
        "touched fraction is what scales: at 100 TB it is the difference",
        "between reading ~1/64th of the table and reading all of it, before",
        "any spatial predicate runs.",
    ]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/layout_pruning.md", "w") as f:
        f.write("\n".join(md) + "\n")
    print("\n".join(md))


if __name__ == "__main__":
    main()
