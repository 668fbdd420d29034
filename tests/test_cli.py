"""CLI end-to-end: config file → per-agency GeoJSON outputs
(reference entry point parity, src/bin/gtfs-to-geojson.ts)."""

import json
import os
import zipfile

import pytest


@pytest.fixture(scope="module")
def feed_dir(tmp_path_factory, feed_pd):
    from gtfs_to_geojson_spark.synth import write_feed

    d = tmp_path_factory.mktemp("feedpq")
    write_feed(feed_pd, str(d))
    return str(d)


def _run_cli(tmp_path, config: dict, *extra):
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(config))
    from gtfs_to_geojson_spark.__main__ import main

    return main(["--configPath", str(cfg_path), *extra])


def test_cli_directory_feed(spark, feed_dir, tmp_path):
    out = tmp_path / "out"
    rc = _run_cli(
        tmp_path,
        {
            "agencies": [{"agencyKey": "test", "path": feed_dir}],
            "outputFormat": "stops",
            "outputType": "agency",
            "coordinatePrecision": 5,
            "outputPath": str(out),
        },
    )
    assert rc == 0
    files = [f for f in os.listdir(out / "test") if f.endswith(".geojson")]
    assert len(files) == 1
    gj = json.loads((out / "test" / files[0]).read_text())
    assert gj["type"] == "FeatureCollection" and len(gj["features"]) > 0


def test_cli_zip_feed_and_zip_output(spark, feed_dir, tmp_path):
    # zip the feed like a real GTFS download (S1 unzip path)
    zpath = tmp_path / "gtfs.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for fn in os.listdir(feed_dir):
            zf.write(os.path.join(feed_dir, fn), fn)
    out = tmp_path / "out2"
    rc = _run_cli(
        tmp_path,
        {
            "agencies": [{"agencyKey": "zipped", "path": str(zpath)}],
            "outputFormat": "envelope",
            "outputPath": str(out),
            "zipOutput": True,
        },
    )
    assert rc == 0
    assert (out / "zipped" / "geojson.zip").exists()


def test_cli_warehouse_and_skip_import(spark, feed_dir, tmp_path):
    wh = tmp_path / "warehouse"
    out = tmp_path / "out3"
    base = {
        "agencies": [{"agencyKey": "wh", "path": feed_dir}],
        "outputFormat": "stops",
        "outputPath": str(out),
        "warehousePath": str(wh),
    }
    assert _run_cli(tmp_path, base) == 0
    assert os.path.isdir(wh / "wh" / "stops.parquet")
    # second run: --skipImport reads materialized tables only (S5)
    assert _run_cli(tmp_path, base, "--skipImport") == 0


def test_cli_missing_feed_errors_but_continues(spark, tmp_path, feed_dir):
    out = tmp_path / "out4"
    rc = _run_cli(
        tmp_path,
        {
            "agencies": [
                {"agencyKey": "missing", "path": str(tmp_path / "nope")},
                {"agencyKey": "good", "path": feed_dir},
            ],
            "outputFormat": "stops",
            "outputPath": str(out),
        },
    )
    assert rc == 1  # error reported
    assert os.path.isdir(out / "good")  # later agency still processed
