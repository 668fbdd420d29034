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


def read_geojson(
    spark: SparkSession, path: str, multiline: bool = False
) -> DataFrame:
    """Read .geojson FeatureCollection file(s) → one row per Feature.

    ``multiline=False`` (default): one FeatureCollection per LINE — the
    exact format this engine's sink and the reference's
    ``JSON.stringify`` emit. ``multiline=True``: one FeatureCollection
    per FILE (``wholetext``) — handles pretty-printed / multi-line
    GeoJSON produced elsewhere. Parsing is ``try_parse_json`` either
    way: an unparseable collection yields one row with null
    ``geometry_type`` and ``parse_ok=false`` instead of throwing, so
    callers can audit bad inputs (ADVICE r1).

    Columns: ``src_file``, ``parse_ok``, ``feature_type``,
    ``geometry_type``, ``properties_json`` (null-free JSON object, as
    written), ``coordinates_json`` (raw), and one typed column per
    geometry family (``point_coords``, ``line_coords``,
    ``multiline_coords``, ``polygon_coords``, ``multipolygon_coords``)
    — non-null only for rows of that type, so downstream ops select the
    typed column they need with zero parsing UDFs."""
    # NB: must be the text() kwarg — .option("wholetext", ...) is
    # silently ignored by the Spark 4 text reader
    raw = spark.read.text(path, wholetext=multiline).select(
        F.input_file_name().alias("src_file"), F.col("value")
    ).filter(F.length(F.trim("value")) > 0)
    v = F.try_parse_json(F.col("value"))
    # A failed parse keeps its row (flagged parse_ok=false) instead of
    # throwing or vanishing: substitute a single JSON-null feature for
    # the missing array. The placeholder is a VARIANT null literal, not
    # a SQL-null variant — Arrow toPandas segfaults (Spark 4.1) when a
    # null variant value reaches the exploded column.
    # try_variant_get (ADVICE r2): valid JSON whose features field is
    # not an array (e.g. {"features": 123}) must surface as an
    # auditable parse_ok=false row like unparseable input, not throw at
    # execution the way strict variant_get does.
    extracted = F.try_variant_get(v, "$.features", "array<variant>")
    feat_arr = F.coalesce(
        extracted,
        F.array(F.parse_json(F.lit("null"))),
    )
    feats = raw.select(
        "src_file",
        extracted.isNotNull().alias("parse_ok"),
        F.explode(feat_arr).alias("f"),
    )
    gtype = F.try_variant_get("f", "$.geometry.type", "string")

    # Typed extraction is gated INSIDE the when(): (a) depth ambiguity —
    # MultiLineString and Polygon share a coordinate depth, so only the
    # column matching the declared geometry type is populated; (b) the
    # lazy CaseWhen branch keeps variant extraction from ever running on
    # null/foreign rows — try_variant_get of a VARIANT null to a depth-3
    # array type produces a value that segfaults Arrow toPandas
    # (Spark 4.1), while the plain null this emits is safe.
    def typed(geom_type: str, alias: str):
        return F.when(
            gtype == geom_type,
            F.try_variant_get("f", "$.geometry.coordinates", _COORD_TYPES[geom_type]),
        ).alias(alias)

    return feats.select(
        "src_file",
        "parse_ok",
        F.try_variant_get("f", "$.type", "string").alias("feature_type"),
        gtype.alias("geometry_type"),
        F.to_json(F.try_variant_get("f", "$.properties", "variant")).alias(
            "properties_json"
        ),
        F.to_json(F.try_variant_get("f", "$.geometry.coordinates", "variant")).alias(
            "coordinates_json"
        ),
        typed("Point", "point_coords"),
        typed("LineString", "line_coords"),
        typed("MultiLineString", "multiline_coords"),
        typed("Polygon", "polygon_coords"),
        typed("MultiPolygon", "multipolygon_coords"),
    )


def property_col(df: DataFrame, key: str, dtype: str = "string"):
    """Extract one property from ``properties_json`` (JVM-side)."""
    return F.get_json_object(F.col("properties_json"), f"$.{key}").cast(dtype)
