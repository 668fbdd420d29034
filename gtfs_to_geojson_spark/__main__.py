"""CLI — config-file driven, same config surface as the reference
(``gtfs-to-geojson --configPath ./config.json --skipImport``,
reference src/bin/gtfs-to-geojson.ts:13-27; config keys
README.md:88-310):

    python -m gtfs_to_geojson_spark --configPath config.json [--skipImport]

Config keys honored (reference name → behavior here):

* ``agencies[]``            — {agencyKey, path|url, exclude, proj};
                              path may be a directory of GTFS
                              .txt/.parquet files or a .zip (unzipped
                              like the reference's import,
                              src/lib/gtfs-to-geojson.ts:287-295);
                              ``exclude`` skips GTFS files at import
                              (README.md:161-169) — excluding shapes
                              forces the stop-derived-lines fallback;
                              ``proj`` is a proj4 override applied to
                              stop/shape coordinates at ingest
                              (README.md:171-187; tmerc/utm/lcc/affine)
* ``bufferSizeMeters``      — default 400 (ts:34)
* ``coordinatePrecision``   — unset = no rounding/simplify
* ``outputType``            — agency | route | shape
* ``outputFormat``          — the nine formats
* ``outputPath``            — default ./geojson
* ``overwriteExistingFiles``— default true (file-utils.ts:82-112)
* ``startDate``/``endDate`` — YYYYMMDD calendar window (ts:49-71)
* ``zipOutput``             — zip the generated files (ts:335-345)
* ``warehousePath``         — materialized-table dir (the sqlitePath
                              analog, README.md:249-254); with
                              ``--skipImport`` tables are read from
                              there without re-ingest (ts:287)
* ``verbose``               — print per-agency stats (log-utils.ts)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import zipfile


def _resolve_feed_dir(agency: dict, tmp_root: str) -> str:
    path = agency.get("path")
    url = agency.get("url")
    if path and path.endswith(".zip"):
        out = os.path.join(tmp_root, agency["agencyKey"])
        with zipfile.ZipFile(path) as zf:
            zf.extractall(out)
        return out
    if path:
        return path
    if url:
        import urllib.request

        zpath = os.path.join(tmp_root, agency["agencyKey"] + ".zip")
        urllib.request.urlretrieve(url, zpath)  # noqa: S310 — explicit user config
        out = os.path.join(tmp_root, agency["agencyKey"])
        with zipfile.ZipFile(zpath) as zf:
            zf.extractall(out)
        return out
    raise ValueError(f"agency {agency.get('agencyKey')}: need path or url")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="gtfs_to_geojson_spark")
    ap.add_argument("--configPath", "-c", default="./config.json")
    ap.add_argument(
        "--skipImport", "-s", action="store_true",
        help="reuse previously imported warehouse tables",
    )
    args = ap.parse_args(argv)

    with open(args.configPath) as f:
        cfg = json.load(f)

    from .plans.pipeline import run
    from .plans.run_spec import RunSpec
    from .session import get_spark
    from .sources.gtfs import GTFS_SCHEMAS, read_feed

    spark = get_spark(app_name="gtfs-to-geojson-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    verbose = cfg.get("verbose", True)
    out_root = cfg.get("outputPath", "./geojson")
    warehouse = cfg.get("warehousePath")

    rc = 0
    with tempfile.TemporaryDirectory() as tmp_root:
        for agency in cfg.get("agencies", []):
            key = agency.get("agencyKey", "agency")
            try:
                exclude = agency.get("exclude") or []
                if args.skipImport and warehouse:
                    feed_dir = os.path.join(warehouse, key)
                else:
                    feed_dir = _resolve_feed_dir(agency, tmp_root)
                feed = read_feed(spark, feed_dir, exclude=exclude)
                if agency.get("proj"):
                    from .sources.reproject import reproject_feed

                    feed = reproject_feed(feed, agency["proj"])
                if warehouse and not args.skipImport:
                    # materialize typed tables (S4/S5 — the sqlitePath analog)
                    wdir = os.path.join(warehouse, key)
                    for name in GTFS_SCHEMAS:
                        feed[name].write.mode("overwrite").parquet(
                            os.path.join(wdir, f"{name}.parquet")
                        )
                    feed = read_feed(spark, wdir)
                spec = RunSpec(
                    output_format=cfg.get("outputFormat", "lines-and-stops"),
                    output_type=cfg.get("outputType", "agency"),
                    buffer_size_meters=float(cfg.get("bufferSizeMeters", 400)),
                    coordinate_precision=cfg.get("coordinatePrecision"),
                    start_date=cfg.get("startDate"),
                    end_date=cfg.get("endDate"),
                    out_dir=os.path.join(out_root, key),
                    zip_output=bool(cfg.get("zipOutput", False)),
                    overwrite=bool(cfg.get("overwriteExistingFiles", True)),
                )
                stats = run(spark, feed, spec)
                if verbose:
                    print(
                        f"[{key}] {stats['files']} files, {stats['features']} features, "
                        f"{stats['seconds']}s (feed {stats['feed_version']})"
                    )
            except Exception as e:  # continue to next agency, like the reference loop
                print(f"[{key}] ERROR: {type(e).__name__}: {e}", file=sys.stderr)
                rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
