"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship cell-indexed point-in-envelope spatial join
(J6) at sf0.001; ``queries``/``oracle_sql`` expose every implemented
operator from SURVEY.md §2 with DuckDB twins (see
gtfs_to_geojson_spark/plans/oracle_queries.py for the definitions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gtfs_to_geojson_spark.plans import oracle_queries as OQ  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: H3-style cell-indexed stop-in-route-envelope join —
    customer-derived points against supplier-derived envelopes at
    sf0.001, grouped per envelope (the BASELINE.json headline metric's
    join, at smoke scale)."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    pts = OQ.customer_points(spark, sf_dir)
    boxes = OQ.supplier_boxes(spark, sf_dir)
    from gtfs_to_geojson_spark.operators.spatial import point_in_envelope_join

    joined = point_in_envelope_join(pts, boxes, res=OQ.CELL_RES)
    return (
        joined.groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_points_in_envelope"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .orderBy("s_suppkey")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return OQ.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for the SQL-expressible subset — 58 of 60 after the
    r2 recursive-CTE promotions (toposort, RDP simplify) and the r3
    trained-IVF promotion (n_probe = n_centroids degenerates to exact
    brute force). The remaining rows-only ops (distributed
    dissolve/overlay ring traces) are intentionally omitted — the
    driver records the weaker check."""
    return OQ.all_oracle_sql()
