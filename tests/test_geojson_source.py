"""GeoJSON source round-trip: pipeline sink output → read_geojson rows
(S6 sink ↔ engine-new source; VARIANT-based heterogeneous parse)."""

import json

import pytest
from pyspark.sql import functions as F

from gtfs_to_geojson_spark.plans import pipeline
from gtfs_to_geojson_spark.plans.run_spec import RunSpec
from gtfs_to_geojson_spark.sources import geojson as gj


@pytest.fixture(scope="module")
def written(spark, feed, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gjsrc"))
    pipeline.run(
        spark,
        feed,
        RunSpec(
            output_format="lines-and-stops",
            output_type="agency",
            coordinate_precision=5,
            out_dir=out,
        ),
    )
    return out


def test_roundtrip_counts_and_types(spark, written):
    df = gj.read_geojson(spark, written + "/*.geojson")
    import glob

    fc = json.load(open(glob.glob(written + "/*.geojson")[0]))
    counts = df.groupBy("geometry_type").count().toPandas().set_index("geometry_type")
    want = {}
    for f in fc["features"]:
        want[f["geometry"]["type"]] = want.get(f["geometry"]["type"], 0) + 1
    assert {k: int(v) for k, v in counts["count"].items()} == want
    assert set(want) == {"Point", "MultiLineString"}


def test_typed_columns_match_declared_type(spark, written):
    df = gj.read_geojson(spark, written + "/*.geojson")
    bad = df.filter(
        (F.col("geometry_type") == "Point") & F.col("point_coords").isNull()
        | (F.col("geometry_type") == "MultiLineString")
        & F.col("multiline_coords").isNull()
    ).count()
    assert bad == 0
    # cross-type columns are nulled
    assert df.filter(
        (F.col("geometry_type") == "Point") & F.col("multiline_coords").isNotNull()
    ).count() == 0


def test_properties_roundtrip(spark, written):
    df = gj.read_geojson(spark, written + "/*.geojson")
    stops = df.filter(F.col("geometry_type") == "Point").select(
        gj.property_col(df, "stop_id").alias("stop_id"),
        gj.property_col(df, "stop_name").alias("stop_name"),
    )
    pdf = stops.toPandas()
    assert pdf["stop_id"].notna().all() and pdf["stop_name"].notna().all()
    assert pdf["stop_id"].is_unique


def test_multiline_pretty_printed_external_file(spark, written, tmp_path):
    """Pretty-printed (indented, multi-line) FeatureCollection — the
    common external format — reads via multiline=True with identical
    rows to the one-line original (ADVICE r1)."""
    import glob

    src = glob.glob(written + "/*.geojson")[0]
    fc = json.load(open(src))
    pretty = tmp_path / "pretty.geojson"
    pretty.write_text(json.dumps(fc, indent=2))
    a = (
        gj.read_geojson(spark, src)
        .select("geometry_type", "properties_json", "coordinates_json")
        .toPandas()
        .sort_values(["geometry_type", "properties_json"])
        .reset_index(drop=True)
    )
    b = (
        gj.read_geojson(spark, str(pretty), multiline=True)
        .select("geometry_type", "properties_json", "coordinates_json")
        .toPandas()
        .sort_values(["geometry_type", "properties_json"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b) > 0
    assert (a["geometry_type"] == b["geometry_type"]).all()
    # property VALUES round-trip (key serialization order may differ)
    for x, y in zip(a["properties_json"], b["properties_json"]):
        assert json.loads(x) == json.loads(y)
    for x, y in zip(a["coordinates_json"], b["coordinates_json"]):
        assert json.loads(x) == json.loads(y)


def test_unparseable_line_degrades_not_throws(spark, tmp_path):
    """A corrupt line yields one parse_ok=false row instead of a
    runtime exception; good lines still parse."""
    p = tmp_path / "mixed.geojson"
    good = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"a": 1},
                "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
            }
        ],
    }
    p.write_text(json.dumps(good) + "\n{not json at all\n")
    # collect(), not toPandas(): pyarrow 16.1 segfaults converting a
    # Spark-produced depth-3 list column (multiline_coords etc.) whose
    # chunk holds a null row — env bug, tracked in docs/pitfalls
    rows = gj.read_geojson(spark, str(p)).collect()
    assert len(rows) == 2
    ok = [r for r in rows if r["parse_ok"]]
    bad = [r for r in rows if not r["parse_ok"]]
    assert len(ok) == 1 and ok[0]["geometry_type"] == "Point"
    assert ok[0]["point_coords"] == [1.0, 2.0]
    assert len(bad) == 1 and bad[0]["geometry_type"] is None


def test_nonarray_features_degrades_not_throws(spark, tmp_path):
    """ADVICE r2: valid JSON whose features field is NOT an array
    ({"features": 123}) must yield a parse_ok=false placeholder row,
    not throw at execution (strict variant_get did)."""
    p = tmp_path / "badfeat.geojson"
    p.write_text('{"type": "FeatureCollection", "features": 123}\n')
    rows = gj.read_geojson(spark, str(p)).collect()
    assert len(rows) == 1
    assert rows[0]["parse_ok"] is False
    assert rows[0]["geometry_type"] is None
