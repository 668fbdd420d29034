"""GeoJSON sinks S6–S10 (SURVEY.md §2.1).

The reference writes ``JSON.stringify(featureCollection)`` to one file
per group — per agency, per (route, direction), or per shape
(src/lib/gtfs-to-geojson.ts:160-162,225-228,239-243). The distributed
equivalent of strict one-file-per-group is a grouped-map sink: each
group's features land in one task which writes its file and returns a
manifest row — the write itself is the parallel unit, no driver
collect of feature payloads.
"""

from __future__ import annotations

import os
import shutil
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .functions.geo import filename_parts, sanitize_filename

MANIFEST_SCHEMA = "filename string, n_features long, bytes long"


def prep_directory(path: str, overwrite: bool = True) -> None:
    """S10 — mkdir; refuse non-empty unless overwrite (reference
    src/lib/file-utils.ts:82-112)."""
    if os.path.isdir(path) and os.listdir(path):
        if not overwrite:
            raise FileExistsError(f"output dir not empty: {path}")
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def with_group_filename(df: DataFrame, part_cols: list, suffix: str = ".geojson") -> DataFrame:
    """S7 — sanitized ``_``-joined filename with duplicate-uniquifying
    index (reference appends an index when two routes collide after
    sanitizing, src/lib/gtfs-to-geojson.ts:203-227)."""
    name = sanitize_filename(filename_parts(*[F.col(c).cast("string") for c in part_cols]))
    out = df.withColumn("_base", name)
    w = Window.partitionBy("_base").orderBy(*[F.col(c).cast("string").asc_nulls_first() for c in part_cols])
    dup = Window.partitionBy("_base")
    out = out.withColumn("_n", F.count(F.lit(1)).over(dup)).withColumn(
        "_i", F.dense_rank().over(w)
    )
    return out.withColumn(
        "filename",
        F.when(F.col("_n") > 1, F.concat(F.col("_base"), F.lit("_"), F.col("_i").cast("string")))
        .otherwise(F.col("_base")),
    ).withColumn("filename", F.concat(F.col("filename"), F.lit(suffix))).drop("_base", "_n", "_i")


def write_geojson_grouped(features: DataFrame, out_dir: str, filename_col: str = "filename") -> pd.DataFrame:
    """S6 — one ``FeatureCollection`` file per distinct filename.
    Grouped-map: each group serializes + writes inside its task.
    Returns the manifest (filename, n_features, bytes) as pandas."""
    os.makedirs(out_dir, exist_ok=True)

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        fname = key[0]
        payload = (
            '{"type":"FeatureCollection","features":['
            + ",".join(pdf["feature_json"].tolist())
            + "]}"
        )
        path = os.path.join(out_dir, fname)
        with open(path, "w") as f:
            f.write(payload)
        return pd.DataFrame(
            {"filename": [fname], "n_features": [len(pdf)], "bytes": [len(payload)]}
        )

    manifest = (
        features.select(filename_col, "feature_json")
        .groupBy(filename_col)
        .applyInPandas(write_group, MANIFEST_SCHEMA)
    )
    return manifest.toPandas()


def write_single_geojson(features: DataFrame, path: str) -> dict:
    """S6 agency-level: one file for the whole run.

    Streams via ``toLocalIterator`` — the driver holds ONE partition of
    feature JSON at a time, never the whole collection (VERDICT r1: the
    previous ``collect()`` was an unbounded driver buffer on the
    agency-output hot path). Byte-identical output: same row order
    (partition order), same separators."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = 0
    with open(path, "w") as f:
        f.write('{"type":"FeatureCollection","features":[')
        for r in features.select("feature_json").toLocalIterator():
            if n:
                f.write(",")
            f.write(r["feature_json"])
            n += 1
        f.write("]}")
    return {
        "filename": os.path.basename(path),
        "n_features": n,
        "bytes": os.path.getsize(path),
    }


def zip_outputs(out_dir: str, zip_path: str) -> int:
    """S8 — zip *.json/*.geojson outputs (reference
    src/lib/file-utils.ts:47-77 filters the same extensions).
    Driver-side post-process, as in the reference."""
    n = 0
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(out_dir):
            for fn in files:
                if fn.endswith((".json", ".geojson")):
                    zf.write(os.path.join(root, fn), os.path.relpath(os.path.join(root, fn), out_dir))
                    n += 1
    return n
