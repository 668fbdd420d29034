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
