"""GeoJSON source — read FeatureCollection files back into rows.

The reference only *writes* GeoJSON (S6); this source makes the sink
round-trippable, so a downstream Spark job can consume the engine's own
outputs (or any GeoJSON produced elsewhere) as a table.

Design: one FeatureCollection per line (exactly what the sink and the
reference's ``JSON.stringify`` emit) → ``parse_json`` into Spark 4
VARIANT → ``explode`` the features. VARIANT is the right type here
because one collection mixes geometry types (lines-and-stops holds
Points and MultiLineStrings): per-row ``try_variant_get`` extracts each
geometry's coordinates at ITS depth, instead of forcing one inferred
schema over heterogeneous nesting (which plain ``spark.read.json``
would garble). Everything stays JVM-side — no Python in the parse path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# GeoJSON coordinate depths (SURVEY.md §1.2)
_COORD_TYPES = {
    "Point": "array<double>",
    "LineString": "array<array<double>>",
    "MultiLineString": "array<array<array<double>>>",
    "Polygon": "array<array<array<double>>>",
    "MultiPolygon": "array<array<array<array<double>>>>",
}


def read_geojson(spark: SparkSession, path: str) -> DataFrame:
    """Read .geojson FeatureCollection file(s) → one row per Feature.

    Columns: ``src_file``, ``feature_type``, ``geometry_type``,
    ``properties_json`` (null-free JSON object, as written),
    ``coordinates_json`` (raw), and one typed column per geometry
    family (``point_coords``, ``line_coords``, ``multiline_coords``,
    ``polygon_coords``, ``multipolygon_coords``) — non-null only for
    rows of that type, so downstream ops select the typed column they
    need with zero parsing UDFs."""
    raw = spark.read.text(path).select(
        F.input_file_name().alias("src_file"), F.col("value")
    ).filter(F.length(F.trim("value")) > 0)
    v = F.parse_json(F.col("value"))
    feats = raw.select(
        "src_file",
        F.explode(F.variant_get(v, "$.features", "array<variant>")).alias("f"),
    )
    gtype = F.variant_get("f", "$.geometry.type", "string")
    out = feats.select(
        "src_file",
        F.variant_get("f", "$.type", "string").alias("feature_type"),
        gtype.alias("geometry_type"),
        F.to_json(F.variant_get("f", "$.properties", "variant")).alias("properties_json"),
        F.to_json(F.variant_get("f", "$.geometry.coordinates", "variant")).alias(
            "coordinates_json"
        ),
        F.try_variant_get(
            "f", "$.geometry.coordinates", _COORD_TYPES["Point"]
        ).alias("point_coords"),
        F.try_variant_get(
            "f", "$.geometry.coordinates", _COORD_TYPES["LineString"]
        ).alias("line_coords"),
        F.try_variant_get(
            "f", "$.geometry.coordinates", _COORD_TYPES["MultiLineString"]
        ).alias("multiline_coords"),
        F.try_variant_get(
            "f", "$.geometry.coordinates", _COORD_TYPES["Polygon"]
        ).alias("polygon_coords"),
        F.try_variant_get(
            "f", "$.geometry.coordinates", _COORD_TYPES["MultiPolygon"]
        ).alias("multipolygon_coords"),
    )
    # depth ambiguity: MultiLineString and Polygon share a depth, as do
    # LineString/“ring list” — null out the typed columns that don't
    # match the declared geometry type
    def only(col: str, *types: str):
        return F.when(gtype_out.isin(*types), F.col(col)).alias(col)

    gtype_out = F.col("geometry_type")
    return out.select(
        "src_file",
        "feature_type",
        "geometry_type",
        "properties_json",
        "coordinates_json",
        only("point_coords", "Point"),
        only("line_coords", "LineString"),
        only("multiline_coords", "MultiLineString"),
        only("polygon_coords", "Polygon"),
        only("multipolygon_coords", "MultiPolygon"),
    )


def property_col(df: DataFrame, key: str, dtype: str = "string"):
    """Extract one property from ``properties_json`` (JVM-side)."""
    return F.get_json_object(F.col("properties_json"), f"$.{key}").cast(dtype)
