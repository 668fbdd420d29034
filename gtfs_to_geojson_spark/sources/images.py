"""Image-table provider — the BASELINE.json ``input_hint`` contract.

The north rule runs the engine "over Iceberg tables of image + caption
pairs at 10^12-image scale". This sandbox has no Iceberg runtime jar,
so the provider abstracts the table behind one seam:

* **Iceberg path** (taken automatically when the Iceberg Spark
  extension is on the session): ``spark.table(name)`` /
  ``writeTo(name)`` — the catalog owns layout, and the bucket spec is
  Iceberg's own ``bucket(N, image_id)`` partition transform.
* **Parquet fallback** (this sandbox): a directory layout with the
  IDENTICAL logical schema plus an explicit ``bucket=<k>`` partition
  column computed as ``pmod(xxhash64(image_id), N)`` — the same
  hash-bucket semantics, expressed as hive-style partitioning so
  Spark's partition pruning replaces Iceberg's (a read filtered on
  ``bucket`` scans only that directory).

Schema (BASELINE.json input_hint, verbatim):
    image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash long
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)

_CORE_COLS = [f.name for f in IMAGE_SCHEMA.fields]


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark extension is configured on this
    session (the runtime jar is present and wired)."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return "IcebergSparkSessionExtensions" in ext


def validate_schema(df: DataFrame) -> DataFrame:
    """Check the input_hint contract (names + types, order-insensitive;
    extra columns like ``bucket`` allowed) and project to canonical
    column order."""
    have = {f.name: f.dataType for f in df.schema.fields}
    problems = []
    for f in IMAGE_SCHEMA.fields:
        if f.name not in have:
            problems.append(f"missing column {f.name}:{f.dataType.simpleString()}")
        elif have[f.name] != f.dataType:
            problems.append(
                f"column {f.name} is {have[f.name].simpleString()}, "
                f"expected {f.dataType.simpleString()}"
            )
    if problems:
        raise ValueError(
            "image table does not match the input_hint schema: " + "; ".join(problems)
        )
    extra = [c for c in df.columns if c not in _CORE_COLS]
    return df.select(*_CORE_COLS, *extra)


def read_images(spark: SparkSession, location: str) -> DataFrame:
    """Read an image table. ``location`` is an Iceberg table name when
    the extension is active (no '/' in it), else a parquet directory.
    Always returns the validated input_hint schema."""
    if iceberg_available(spark) and "/" not in location:
        df = spark.table(location)
    else:
        df = spark.read.parquet(location)
    return validate_schema(df)


def write_images(
    df: DataFrame,
    location: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Write an image table with hash-bucket partitioning.

    Iceberg: ``bucket(n_buckets, image_id)`` partition transform via
    writeTo — the catalog stores the spec, readers prune on it.
    Parquet fallback: explicit ``bucket`` column + ``partitionBy`` —
    hive-style directories give the same pruning under a ``bucket =``
    filter, and co-partitioned joins on bucket need no shuffle of this
    side after a one-time layout."""
    df = validate_schema(df)
    spark = df.sparkSession
    if iceberg_available(spark) and "/" not in location:
        w = df.writeTo(location).using("iceberg").partitionedBy(
            F.bucket(n_buckets, F.col("image_id"))
        )
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    out = df.withColumn("bucket", F.pmod(F.xxhash64("image_id"), F.lit(n_buckets)))
    out.write.mode(mode).partitionBy("bucket").parquet(location)


def write_images_bucketed_table(
    df: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Spark-native bucketed table (``bucketBy(image_id)`` +
    ``saveAsTable``): joins and aggregations keyed on image_id read
    this side pre-shuffled — the plan shows no Exchange over it
    (asserted in test_image_table.py). This is the co-located-join
    layout for repeated image_id joins (pixels re-attach, phash
    verify) at 10^12-row scale, where re-shuffling the binary payload
    per query is the dominant cost."""
    validate_schema(df).write.mode(mode).bucketBy(n_buckets, "image_id").sortBy(
        "image_id"
    ).format("parquet").saveAsTable(table_name)


def read_bucket(spark: SparkSession, location: str, bucket: int) -> DataFrame:
    """One bucket's rows. Under the parquet fallback the ``bucket =``
    filter is a hive partition predicate — Spark prunes to that single
    directory (verify with ``df.inputFiles()``). Under Iceberg the
    table has no materialized bucket column; the equivalent recomputed
    predicate is pushed to the scan and pruned via the table's
    ``bucket(N, image_id)`` transform metadata."""
    df = read_images(spark, location)
    if "bucket" in df.columns:
        return df.filter(F.col("bucket") == F.lit(bucket))
    n_buckets = int(spark.conf.get("spark.gtfs2gj.image.buckets", "64"))
    return df.filter(F.pmod(F.xxhash64("image_id"), F.lit(n_buckets)) == F.lit(bucket))


def write_images_spatial(
    images: DataFrame,
    path: str,
    res: int = 16,
    n_files: int = 64,
    mode: str = "overwrite",
) -> None:
    """North-star layout: the image table written Z-order-clustered by
    its geotag's Morton key (operators/layout.py). At 10^12 images the
    spatial queries (tile ranges, polygon covers, per-city sweeps)
    then prune at file/row-group level from parquet min/max stats
    alone — even though the payload column is opaque binary, the scan
    only decodes the slices whose key range intersects the query.
    Pair with ``layout.read_cell`` / ``cover_range_predicate`` for
    reads; ``_mkey`` is persisted so readers never recompute geotags."""
    from ..operators import layout
    from ..operators.spatial import image_geotags

    tagged = image_geotags(images, keep_bytes=True)
    layout.write_spatial_sorted(
        tagged, path, res=res, lon_col="lon", lat_col="lat",
        n_files=n_files, mode=mode,
    )
