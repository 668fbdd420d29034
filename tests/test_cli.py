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


def test_cli_exclude_shapes_forces_stop_derived_lines(spark, feed_dir, tmp_path):
    """Per-agency `exclude` (reference README.md:161-169): excluding
    shapes must still produce lines — via the stop-sequence-derived
    fallback — and those lines must differ from the shape-built ones."""
    out_a, out_b = tmp_path / "with_shapes", tmp_path / "no_shapes"
    base = {
        "outputFormat": "lines",
        "outputType": "agency",
        "coordinatePrecision": 5,
    }
    assert _run_cli(
        tmp_path,
        {**base, "agencies": [{"agencyKey": "a", "path": feed_dir}],
         "outputPath": str(out_a)},
    ) == 0
    assert _run_cli(
        tmp_path,
        {**base, "agencies": [{"agencyKey": "a", "path": feed_dir,
                               "exclude": ["shapes"]}],
         "outputPath": str(out_b)},
    ) == 0
    fa = [f for f in os.listdir(out_a / "a") if f.endswith(".geojson")]
    fb = [f for f in os.listdir(out_b / "a") if f.endswith(".geojson")]
    ga = json.loads((out_a / "a" / fa[0]).read_text())
    gb = json.loads((out_b / "a" / fb[0]).read_text())
    assert len(gb["features"]) > 0  # fallback produced lines
    na = sum(len(seg) for f in ga["features"]
             for seg in f["geometry"]["coordinates"])
    nb = sum(len(seg) for f in gb["features"]
             for seg in f["geometry"]["coordinates"])
    assert nb < na  # stop-derived lines are coarser than shape points


def test_cli_exclude_optional_table_noop(spark, feed_dir, tmp_path):
    """Excluding a table a format doesn't need changes nothing."""
    out = tmp_path / "out_excl_opt"
    rc = _run_cli(
        tmp_path,
        {
            "agencies": [{"agencyKey": "t", "path": feed_dir,
                          "exclude": ["route_attributes", "frequencies.txt"]}],
            "outputFormat": "stops",
            "outputPath": str(out),
        },
    )
    assert rc == 0
    files = [f for f in os.listdir(out / "t") if f.endswith(".geojson")]
    gj = json.loads((out / "t" / files[0]).read_text())
    assert len(gj["features"]) > 0
