"""Package the engine for ``spark-submit --py-files``.

Produces dist/gtfs_to_geojson_spark.zip containing the package at its
importable root — executors unpack it onto sys.path, so the job script
(jobs/tile_assign_job.py) can ``import gtfs_to_geojson_spark`` with no
install step on the cluster.

Usage: python tools/build_pyfiles.py [out_dir]
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(REPO, "dist")
    os.makedirs(out_dir, exist_ok=True)
    zip_path = os.path.join(out_dir, "gtfs_to_geojson_spark.zip")
    pkg = os.path.join(REPO, "gtfs_to_geojson_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, REPO)
                zf.write(full, rel)
    return zip_path


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
