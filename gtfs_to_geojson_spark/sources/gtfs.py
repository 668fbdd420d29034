"""GTFS feed source: CSV/parquet → typed DataFrames, with import pruning.

Reference behavior re-expressed (SURVEY.md §2.1):

* S1 import — the reference unzips CSV and loads SQLite per agency
  (src/lib/gtfs-to-geojson.ts:287-295); here each GTFS file is a typed
  ``spark.read.csv`` (or parquet mirror) — schema-on-read, no copy.
* S2 table pruning — the reference skips 14 files at import
  (src/lib/gtfs-to-geojson.ts:269-285); we simply never read them.
* S4 warehouse — SQLite :memory: vs file (ts:121,256) maps to reading
  in place vs ``saveAsTable`` into the warehouse/catalog (Iceberg when
  a catalog is configured; plain parquet layout here).
* S5 skipImport (ts:287) — reuse already-materialized tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# GTFS files the reference explicitly excludes at import
# (src/lib/gtfs-to-geojson.ts:269-285)
EXCLUDED_FILES = [
    "areas", "attributions", "booking_rules", "fare_attributes",
    "fare_leg_rules", "fare_media", "fare_products", "fare_rules",
    "fare_transfer_rules", "frequencies", "levels", "location_groups",
    "pathways", "stop_areas", "timeframes", "transfers", "translations",
]

_S, _I, _D = T.StringType(), T.IntegerType(), T.DoubleType()


def _schema(*fields: tuple[str, T.DataType]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


GTFS_SCHEMAS: dict[str, T.StructType] = {
    "agency": _schema(("agency_id", _S), ("agency_name", _S)),
    "routes": _schema(
        ("route_id", _S), ("agency_id", _S), ("route_short_name", _S),
        ("route_long_name", _S), ("route_type", _I), ("route_color", _S),
        ("route_text_color", _S), ("route_url", _S),
    ),
    "trips": _schema(
        ("trip_id", _S), ("route_id", _S), ("service_id", _S),
        ("direction_id", _I), ("trip_headsign", _S), ("shape_id", _S),
    ),
    "stops": _schema(
        ("stop_id", _S), ("stop_name", _S), ("stop_lat", _D), ("stop_lon", _D),
        ("location_type", _I), ("parent_station", _S), ("zone_id", _S),
        ("stop_url", _S),
    ),
    "stop_times": _schema(("trip_id", _S), ("stop_id", _S), ("stop_sequence", _I)),
    "shapes": _schema(
        ("shape_id", _S), ("shape_pt_lat", _D), ("shape_pt_lon", _D),
        ("shape_pt_sequence", _I), ("shape_dist_traveled", _D),
    ),
    "calendar": _schema(("service_id", _S), ("start_date", _S), ("end_date", _S)),
    "route_attributes": _schema(
        ("route_id", _S), ("category", _S), ("subcategory", _S), ("running_way", _S)
    ),
    "feed_info": _schema(("feed_version", _S)),
}

OPTIONAL_TABLES = {"route_attributes", "feed_info", "calendar", "shapes"}


def read_feed(
    spark: SparkSession, path: str, exclude: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read a GTFS feed directory (``<table>.txt`` CSV or
    ``<table>.parquet``) into typed DataFrames. Missing optional tables
    come back as empty frames with the right schema (the reference
    tolerates absent route_attributes/shapes — geojson-utils.ts:217-220,
    238-239).

    ``exclude``: per-agency config key (reference README.md:161-169) —
    listed tables are never scanned and come back as EMPTY typed
    frames, so downstream degrades exactly like a feed missing that
    file (e.g. ``exclude: ["shapes"]`` forces the stop-derived-lines
    fallback). Names accepted with or without the ``.txt`` suffix."""
    skip = {str(e).removesuffix(".txt") for e in (exclude or [])}
    out: dict[str, DataFrame] = {}
    for name, schema in GTFS_SCHEMAS.items():
        if name in skip:
            out[name] = spark.createDataFrame([], schema)
            continue
        csv_p = os.path.join(path, f"{name}.txt")
        pq_p = os.path.join(path, f"{name}.parquet")
        if os.path.exists(pq_p):
            df = spark.read.parquet(pq_p)
            # align column types/subset to schema
            cols = [
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in schema.fields
                if f.name in df.columns
            ]
            missing = [
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in schema.fields
                if f.name not in df.columns
            ]
            out[name] = df.select(*cols, *missing)
        elif os.path.exists(csv_p):
            out[name] = spark.read.csv(csv_p, header=True, schema=schema)
        elif name in OPTIONAL_TABLES:
            out[name] = spark.createDataFrame([], schema)
        else:
            raise FileNotFoundError(f"required GTFS table missing: {name} under {path}")
    return out


def feed_from_pandas(spark: SparkSession, frames: dict) -> dict[str, DataFrame]:
    """Synthetic fixture (synth.make_gtfs_feed) → typed Spark DFs.

    Nullable int columns arrive from pandas as float (NaN promotion);
    normalize to object-with-None so the conversion works whether or
    not Arrow is enabled."""
    import pandas as pd

    out = {}
    for name, schema in GTFS_SCHEMAS.items():
        if name in frames:
            import numpy as np

            pdf = frames[name].astype(object).where(pd.notnull(frames[name]), None)
            int_cols = [f.name for f in schema.fields if f.dataType.simpleString() == "int"]
            for c in int_cols:
                if c in pdf.columns:
                    # keep dtype=object: int+None in a plain Series re-promotes to float64
                    pdf[c] = np.asarray(
                        [int(v) if v is not None and not pd.isna(v) else None for v in pdf[c]],
                        dtype=object,
                    )
            out[name] = spark.createDataFrame(pdf, schema=schema)
        else:
            out[name] = spark.createDataFrame([], schema)
    return out
