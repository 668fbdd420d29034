"""Physical-plan quality checks — the scale story has to be visible in
the plan, not just asserted in docstrings:

* predicate/projection pushdown reaches the parquet scan
* small dimension sides broadcast
* the cell prejoin path of J6 contains no Python evaluation at all
* tile assignment (trusted path) is whole-stage-codegen JVM
* binary image payload is pruned from the assignment scan
"""

import pytest
from pyspark.sql import functions as F


def _capture_explain(df, mode) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _plan(df) -> str:
    return _capture_explain(df, "extended")


def _formatted(df) -> str:
    return _capture_explain(df, "formatted")


SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    df = li.filter(F.col("l_quantity") > 40).select("l_orderkey", "l_quantity")
    plan = _formatted(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]" in plan
    # column pruning: scan schema only has the two needed columns
    assert "l_extendedprice" not in plan


def test_dimension_broadcast_in_multiway_join(spark):
    from gtfs_to_geojson_spark.plans import oracle_queries as OQ

    plan = _plan(OQ.j1_multiway_join(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_j6_cell_prejoin_is_jvm_only(spark):
    """The flagship join must contain NO Python/Arrow eval nodes — the
    cell cover, encode, and residual are all Column expressions."""
    from gtfs_to_geojson_spark.operators import spatial
    from gtfs_to_geojson_spark.plans import oracle_queries as OQ

    pts = OQ.customer_points(spark, SF)
    boxes = OQ.supplier_boxes(spark, SF)
    joined = spatial.point_in_envelope_join(pts, boxes, res=12)
    plan = _plan(joined)
    assert "Python" not in plan and "Arrow" not in plan and "BatchEval" not in plan
    assert "BroadcastHashJoin" in plan  # cell equi-prejoin became a hash join
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_tile_assign_trusted_path_is_jvm_only(spark, images_df):
    from gtfs_to_geojson_spark.operators import spatial

    tiled = spatial.assign_images_to_tiles(images_df, res=14).groupBy("tile").count()
    plan = _plan(tiled)
    assert "Python" not in plan and "Arrow" not in plan
    assert "HashAggregate" in plan  # map-side partial agg present


def test_assignment_prunes_binary_payload(spark, images_pd, tmp_path):
    """Reading the image table for tile counting must not read
    ``bytes`` from parquet at all (ReadSchema check)."""
    from gtfs_to_geojson_spark.operators import spatial

    p = str(tmp_path / "imgs.parquet")
    images_pd.to_parquet(p, index=False)
    images = spark.read.parquet(p)
    tiled = spatial.assign_images_to_tiles(images, res=14).groupBy("tile").count()
    plan = _formatted(tiled)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema and "bytes" not in read_schema[0]


def test_semi_join_pushdown_shape(spark, feed):
    """The threaded base-query becomes a broadcast left-semi join."""
    from gtfs_to_geojson_spark.operators.filters import BaseQuery, apply_query, service_window

    svc = service_window(feed["calendar"], "20260301", "20260331")
    df = apply_query(feed["trips"], BaseQuery(service_ids=svc))
    plan = _plan(df)
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_asof_join_plan_shape(spark):
    """asof_join must stay JVM-only with exactly one shuffle Exchange
    (the per-key window) — no range-join blowup, no Python."""
    import pandas as pd

    from gtfs_to_geojson_spark.operators import relational

    left = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [1], "lid": [1]}), schema="k long, t long, lid long"
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1], "t": [1], "rid": [1]}), schema="k long, t long, rid long"
    )
    plan = _plan(relational.asof_join(left, right, "k", "t", ["rid"]))
    assert "Python" not in plan and "Arrow" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 2  # one shuffle (+ AQE wrappers)


def test_interval_join_plan_is_hash_join(spark):
    """The bucket prejoin must plan as a hash join, never a nested
    loop over the range predicate."""
    import pandas as pd

    from gtfs_to_geojson_spark.operators import relational

    iv = spark.createDataFrame(
        pd.DataFrame({"iid": [1], "k": [1], "t0": [0], "t1": [10]}),
        schema="iid long, k long, t0 long, t1 long",
    )
    pt = spark.createDataFrame(
        pd.DataFrame({"pid": [1], "k": [1], "t": [5]}), schema="pid long, k long, t long"
    )
    plan = _plan(relational.interval_point_join(iv, pt, "t0", "t1", "t", 8, ["k"]))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan and "Python" not in plan
