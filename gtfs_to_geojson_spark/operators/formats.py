"""The nine output formats (reference ``src/formats/*.ts``), each a
pure function ``(feed, config, query) → DataFrame[feature_json, …]``.

Dispatch mirrors the reference's static format table
(src/lib/gtfs-to-geojson.ts:73-113). Every format returns features as
JSON strings (``to_json`` drops null properties — F5, the reference's
``omitBy(props, isNil)`` at geojson-utils.ts:34) plus grouping columns
for the sink.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import geo
from . import geoagg, relational
from .filters import BaseQuery, apply_query, filter_used_stops


def feature_json(props: Column, geom_type: str, coords: Column) -> Column:
    return F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            props.alias("properties"),
            F.struct(
                F.lit(geom_type).alias("type"), coords.alias("coordinates")
            ).alias("geometry"),
        )
    )


STOP_PROP_COLS = [
    "stop_id", "stop_name", "location_type", "parent_station", "zone_id", "stop_url",
]
ROUTE_PROP_COLS = relational.ROUTE_STRUCT_COLS + ["category", "subcategory", "running_way"]


def _agency_name(feed) -> str | None:
    """First agency's name (reference falls back to agencies[0],
    src/lib/gtfs-to-geojson.ts:297-308)."""
    row = feed["agency"].orderBy("agency_id").limit(1).collect()
    return row[0]["agency_name"] if row else None


def _stop_features(feed, cfg, q: BaseQuery, agency_name: str | None) -> DataFrame:
    sw = relational.stops_with_routes(
        feed["stops"], feed["stop_times"], feed["trips"], feed["routes"], q
    ).withColumn("agency_name", F.lit(agency_name))
    coords = geo.round_coords_point(
        F.array("stop_lon", "stop_lat"), cfg.coordinate_precision
    )
    props = F.struct(
        *[F.col(c) for c in STOP_PROP_COLS], F.col("routes"), F.col("agency_name")
    )
    return sw.select(
        feature_json(props, "Point", coords).alias("feature_json"),
        F.lit("Point").alias("geom_type"),
        "stop_id",
    )


def _shapes_exist(feed, q: BaseQuery) -> bool:
    """Early-exit probe (reference geojson-utils.ts:212-215: if the
    shapes query yields anything, stop-derived lines are skipped).
    Probes the shapes TABLE, not just trips.shape_id — a feed whose
    shapes file is missing or excluded at import (README.md:161-169)
    still carries shape_ids on trips, and must fall back."""
    pairs = relational.route_shape_pairs(feed["trips"], q)
    return not pairs.join(feed["shapes"], "shape_id", "left_semi").limit(1).isEmpty()


def _line_features(feed, cfg, q: BaseQuery, agency_name: str | None) -> DataFrame:
    """Lines: MultiLineString per route from shapes; global fallback to
    stop-derived LineStrings when the feed/query has no shapes."""
    simp = geoagg.simplify_lines_udf(cfg.coordinate_precision)
    if _shapes_exist(feed, q):
        ml = relational.route_multilinestrings(
            feed["shapes"], feed["trips"], feed["routes"], feed.get("route_attributes"), q
        ).withColumn("agency_name", F.lit(agency_name))
        if simp is not None:
            # simplify each member line (pandas UDF is per-LineString):
            # posexplode → RDP → re-collect in position order
            ml = (
                ml.select(
                    *[c for c in ml.columns if c != "coordinates"],
                    F.posexplode("coordinates").alias("_pos", "_line"),
                )
                .withColumn("_line", simp(F.col("_line")))
                .groupBy(*[c for c in ml.columns if c != "coordinates"])
                .agg(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct(F.col("_pos"), F.col("_line").alias("l")))),
                        lambda x: x["l"],
                    ).alias("coordinates")
                )
            )
        out_coords = geo.round_coords_multiline(F.col("coordinates"), cfg.coordinate_precision)
        props = F.struct(*[F.col(c) for c in ROUTE_PROP_COLS], F.col("agency_name"))
        return ml.select(
            feature_json(props, "MultiLineString", out_coords).alias("feature_json"),
            F.lit("MultiLineString").alias("geom_type"),
            "route_id",
        )
    sd = relational.stop_derived_linestrings(
        feed["stops"], feed["stop_times"], feed["trips"], feed["routes"],
        feed.get("route_attributes"), q,
    ).withColumn("agency_name", F.lit(agency_name))
    if simp is not None:
        sd = sd.withColumn("coordinates", simp(F.col("coordinates")))
    out_coords = geo.round_coords_line(F.col("coordinates"), cfg.coordinate_precision)
    props = F.struct(*[F.col(c) for c in ROUTE_PROP_COLS], F.col("agency_name"))
    return sd.select(
        feature_json(props, "LineString", out_coords).alias("feature_json"),
        F.lit("LineString").alias("geom_type"),
        "route_id",
    )


def _route_lines_coords(feed, cfg, q: BaseQuery) -> DataFrame:
    """Per-route LineString rows (exploded from shapes, or
    stop-derived) — input to envelope / lines-buffer / lines-dissolved."""
    if _shapes_exist(feed, q):
        ml = relational.route_multilinestrings(
            feed["shapes"], feed["trips"], feed["routes"], feed.get("route_attributes"), q
        )
        return ml.select(
            *[c for c in ml.columns if c != "coordinates"],
            F.explode("coordinates").alias("coordinates"),
        )
    return relational.stop_derived_linestrings(
        feed["stops"], feed["stop_times"], feed["trips"], feed["routes"],
        feed.get("route_attributes"), q,
    )


def fmt_stops(feed, cfg, q: BaseQuery) -> DataFrame:
    return _stop_features(feed, cfg, q, _agency_name(feed))


def fmt_lines(feed, cfg, q: BaseQuery) -> DataFrame:
    return _line_features(feed, cfg, q, _agency_name(feed))


def fmt_lines_and_stops(feed, cfg, q: BaseQuery) -> DataFrame:
    """A12 — merged FeatureCollections (reference
    formats/lines-and-stops.ts:16-17 via mergeGeojson,
    geojson-utils.ts:112-114): union-all of line + stop features."""
    an = _agency_name(feed)
    lines = _line_features(feed, cfg, q, an).select("feature_json", "geom_type")
    stops = _stop_features(feed, cfg, q, an).select("feature_json", "geom_type")
    return lines.unionByName(stops)


def fmt_envelope(feed, cfg, q: BaseQuery) -> DataFrame:
    """A1/G4 — single Polygon Feature = bbox of all route lines, props
    ``{agency_name}`` only (reference formats/envelope.ts;
    examples/envelope.geojson)."""
    lines = _route_lines_coords(feed, cfg, q)
    b = geoagg.envelope_bounds(lines)
    p = cfg.coordinate_precision
    rnd = (lambda c: F.round(c, p)) if p is not None else (lambda c: c)
    coords = geoagg.bbox_polygon_col(
        rnd(F.col("min_lon")), rnd(F.col("min_lat")), rnd(F.col("max_lon")), rnd(F.col("max_lat"))
    )
    props = F.struct(F.lit(_agency_name(feed)).alias("agency_name"))
    return b.where(F.col("min_lon").isNotNull()).select(
        feature_json(props, "Polygon", coords).alias("feature_json"),
        F.lit("Polygon").alias("geom_type"),
    )


def fmt_convex(feed, cfg, q: BaseQuery) -> DataFrame:
    """A2 — convex hull Polygon over used stops; empty result when
    degenerate (<3 distinct points — reference warns and emits null,
    formats/convex.ts:13-22)."""
    spark = feed["stops"].sparkSession
    used = filter_used_stops(feed["stops"], feed["stop_times"], feed["trips"], q)
    ring = geoagg.convex_hull_agg(used)
    if ring is None:
        return spark.createDataFrame([], "feature_json string, geom_type string")
    if cfg.coordinate_precision is not None:
        import numpy as np

        ring = np.round(np.asarray(ring), cfg.coordinate_precision).tolist()
    import json

    fj = json.dumps(
        {
            "type": "Feature",
            "properties": {"agency_name": _agency_name(feed)},
            "geometry": {"type": "Polygon", "coordinates": [ring]},
        },
        separators=(",", ":"),
    )
    return spark.createDataFrame([(fj, "Polygon")], "feature_json string, geom_type string")


def fmt_stops_buffer(feed, cfg, q: BaseQuery) -> DataFrame:
    """G3 — Polygon per used stop, radius bufferSizeMeters (default 400,
    reference src/lib/gtfs-to-geojson.ts:34; formats/stops-buffer.ts:9).
    Ring construction is a pure Column expression — stays in codegen."""
    an = _agency_name(feed)
    sw = relational.stops_with_routes(
        feed["stops"], feed["stop_times"], feed["trips"], feed["routes"], q
    ).withColumn("agency_name", F.lit(an))
    ring = geoagg.stop_buffer_ring_col(
        F.col("stop_lat"), F.col("stop_lon"), cfg.buffer_size_meters
    )
    coords = geo.round_coords_polygon(F.array(ring), cfg.coordinate_precision)
    props = F.struct(*[F.col(c) for c in STOP_PROP_COLS], F.col("routes"), F.col("agency_name"))
    return sw.select(
        feature_json(props, "Polygon", coords).alias("feature_json"),
        F.lit("Polygon").alias("geom_type"),
        "stop_id",
    )


def fmt_lines_buffer(feed, cfg, q: BaseQuery) -> DataFrame:
    """G3 — Polygon per route buffering its line
    (reference formats/lines-buffer.ts:12)."""
    lines = _route_lines_coords(feed, cfg, q)
    keys = [c for c in lines.columns if c != "coordinates"]
    buf = geoagg.line_buffer_polygons(lines, cfg.buffer_size_meters, keys)
    coords = geo.round_coords_polygon(F.col("polygon"), cfg.coordinate_precision)
    prop_cols = [c for c in ROUTE_PROP_COLS if c in buf.columns]
    props = F.struct(*[F.col(c) for c in prop_cols], F.lit(_agency_name(feed)).alias("agency_name"))
    return buf.select(
        feature_json(props, "Polygon", coords).alias("feature_json"),
        F.lit("Polygon").alias("geom_type"),
        "route_id",
    )


def _dissolved_features(feed, cfg, polys: DataFrame) -> DataFrame:
    """Shared tail of the two dissolved formats: A3 union → one Feature
    per resulting polygon, props ``{agency_name}`` (row-set semantics
    contract, SURVEY.md §5)."""
    spark = polys.sparkSession
    parts = geoagg.dissolve_polygons(polys)
    import json

    import numpy as np

    an = _agency_name(feed)
    rows = []
    for poly in parts:
        coords = poly
        if cfg.coordinate_precision is not None:
            coords = [np.round(np.asarray(r), cfg.coordinate_precision).tolist() for r in poly]
        fj = json.dumps(
            {
                "type": "Feature",
                "properties": {"agency_name": an},
                "geometry": {"type": "Polygon", "coordinates": coords},
            },
            separators=(",", ":"),
        )
        rows.append((fj, "Polygon"))
    if not rows:
        return spark.createDataFrame([], "feature_json string, geom_type string")
    return spark.createDataFrame(rows, "feature_json string, geom_type string")


def fmt_stops_dissolved(feed, cfg, q: BaseQuery) -> DataFrame:
    """A3 — union of all stop buffers (reference
    formats/stops-dissolved.ts:12-14 via unionGeojson)."""
    used = filter_used_stops(feed["stops"], feed["stop_times"], feed["trips"], q)
    ring = geoagg.stop_buffer_ring_col(F.col("stop_lat"), F.col("stop_lon"), cfg.buffer_size_meters)
    polys = used.select(F.array(ring).alias("polygon"))
    return _dissolved_features(feed, cfg, polys)


def fmt_lines_dissolved(feed, cfg, q: BaseQuery) -> DataFrame:
    """A3 — union of all route-line buffers (reference
    formats/lines-dissolved.ts:16-22: buffer → simplify → union)."""
    lines = _route_lines_coords(feed, cfg, q)
    keys = [c for c in lines.columns if c != "coordinates"]
    buf = geoagg.line_buffer_polygons(lines, cfg.buffer_size_meters, keys)
    return _dissolved_features(feed, cfg, buf.select("polygon"))


FORMATS = {
    "stops": fmt_stops,
    "lines": fmt_lines,
    "lines-and-stops": fmt_lines_and_stops,
    "envelope": fmt_envelope,
    "convex": fmt_convex,
    "stops-buffer": fmt_stops_buffer,
    "lines-buffer": fmt_lines_buffer,
    "stops-dissolved": fmt_stops_dissolved,
    "lines-dissolved": fmt_lines_dissolved,
}
