"""Structured Streaming tile assignment (SURVEY.md §2.10 stretch).

The reference is strictly batch; this is the optional file-arrival
mode: new image parquet drops land in a directory, ``readStream``
picks them up, and the SAME assignment operators run per micro-batch —
the operator suite is stream/batch agnostic because it is pure
DataFrame composition. Late data needs no watermark here (assignment
is stateless per row); the windowed-count variant shows where a
watermark plugs in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def stream_images(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.schema(IMAGE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def stream_tile_assignments(spark: SparkSession, input_dir: str, res: int = 14) -> DataFrame:
    """Streaming J9a: identical operator call as the batch path."""
    from ..operators.spatial import assign_images_to_tiles

    return assign_images_to_tiles(stream_images(spark, input_dir), res=res)


def run_stream_to_parquet(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    res: int = 14,
    timeout_s: float | None = None,
):
    """Sink assignments to parquet with exactly-once file semantics —
    the streaming twin of the lineage manifest (checkpoint_dir holds
    the processed-files log, so a restart resumes without recompute).
    Returns the StreamingQuery (caller stops it / awaits timeout)."""
    assigned = stream_tile_assignments(spark, input_dir, res)
    q = (
        assigned.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if timeout_s is not None:
        q.awaitTermination(timeout_s)
    return q
