"""Distributed prefix scan (operators/scan.py): the two-phase global
running total and the shard packer built on it. Ground truth is the
serial fold over the same rows — what a single-partition window (or
any SQL engine's SUM OVER ORDER BY) would produce."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from gtfs_to_geojson_spark.operators import scan


def _serial(pdf: pd.DataFrame, order: str, weight: str) -> pd.Series:
    s = pdf.sort_values(order)
    return s[weight].fillna(0).cumsum()


@pytest.fixture(scope="module")
def docs_pd():
    # deterministic, skewed weights (a few huge docs), shuffled ids so
    # input order disagrees with scan order
    n = 5000
    ids = np.arange(n, dtype=np.int64)
    w = (ids * 37 % 290 + 1).astype(np.int64)
    w[ids % 613 == 0] = 50_000  # heavy-tail rows
    pdf = pd.DataFrame({"doc_id": ids, "n_tok": w, "tag": (ids % 7).astype(str)})
    return pdf.sample(frac=1.0, random_state=7).reset_index(drop=True)


def test_running_total_matches_serial_fold(spark, docs_pd):
    df = spark.createDataFrame(docs_pd).repartition(13)
    out = scan.running_total(df, "doc_id", "n_tok", num_partitions=7).toPandas()
    assert len(out) == len(docs_pd)
    got = out.sort_values("doc_id")["running_total"].to_numpy()
    want = _serial(docs_pd, "doc_id", "n_tok").to_numpy()
    assert (got == want).all()
    # passthrough columns survive the Arrow kernel untouched
    assert set(out.columns) == {"doc_id", "n_tok", "tag", "running_total"}
    merged = out.merge(docs_pd, on="doc_id", suffixes=("", "_in"))
    assert (merged["tag"] == merged["tag_in"]).all()


def test_running_total_partitioning_invariant(spark, docs_pd):
    df = spark.createDataFrame(docs_pd)
    a = (
        scan.running_total(df.repartition(3), "doc_id", "n_tok", num_partitions=2)
        .toPandas()
        .sort_values("doc_id")["running_total"]
        .to_numpy()
    )
    b = (
        scan.running_total(df.repartition(17), "doc_id", "n_tok", num_partitions=16)
        .toPandas()
        .sort_values("doc_id")["running_total"]
        .to_numpy()
    )
    assert (a == b).all()


def test_running_total_null_weights_count_zero(spark):
    pdf = pd.DataFrame({"id": [1, 2, 3, 4], "w": [10.0, None, 5.0, None]})
    df = spark.createDataFrame(pdf).withColumn("w", F.col("w").cast("long"))
    out = (
        scan.running_total(df, "id", "w", num_partitions=3)
        .toPandas()
        .sort_values("id")["running_total"]
        .tolist()
    )
    assert out == [10, 10, 15, 15]


def test_running_total_float_weights(spark, docs_pd):
    pdf = docs_pd.assign(fw=docs_pd["n_tok"] * 0.25)
    df = spark.createDataFrame(pdf).repartition(5)
    out = scan.running_total(df, "doc_id", "fw", num_partitions=6).toPandas()
    got = out.sort_values("doc_id")["running_total"].to_numpy()
    want = _serial(pdf, "doc_id", "fw").to_numpy()
    # float addition is not associative; the two-phase decomposition
    # may differ from the serial fold in the last ulps only
    assert np.allclose(got, want, rtol=1e-12, atol=0)


def test_running_total_empty_and_single(spark):
    empty = spark.createDataFrame([], "id long, w long")
    assert scan.running_total(empty, "id", "w", num_partitions=4).count() == 0
    one = spark.createDataFrame([(9, 42)], "id long, w long")
    row = scan.running_total(one, "id", "w", num_partitions=4).collect()[0]
    assert row["running_total"] == 42


def test_running_total_guards(spark):
    df = spark.createDataFrame([(1, 2)], "id long, running_total long")
    with pytest.raises(ValueError):
        scan.running_total(df, "id", "running_total")
    sdf = spark.createDataFrame([(1, "x")], "id long, w string")
    with pytest.raises(TypeError):
        scan.running_total(sdf, "id", "w")


def test_pack_shards_contract(spark, docs_pd):
    df = spark.createDataFrame(docs_pd).repartition(11)
    out = (
        scan.pack_shards(df, "doc_id", "n_tok", shard_size=100_000, num_partitions=8)
        .toPandas()
        .sort_values("doc_id")
    )
    want_rt = _serial(docs_pd, "doc_id", "n_tok").to_numpy()
    start = want_rt - docs_pd.sort_values("doc_id")["n_tok"].to_numpy()
    assert (out["shard_id"].to_numpy() == start // 100_000).all()
    # shards are contiguous in id order and every shard's weight is
    # ~shard_size: it exceeds capacity by at most one row's weight
    # (the row straddling the boundary) and underfills only the tail
    sizes = out.groupby("shard_id")["n_tok"].sum()
    max_w = docs_pd["n_tok"].max()
    assert (sizes.iloc[:-1] >= 100_000 - max_w + 1).all()
    assert (sizes <= 100_000 + max_w - 1).all()
    assert (out.groupby("shard_id")["doc_id"].max().sort_index().diff().dropna() > 0).all()


def test_pack_shards_rejects_bad_size(spark):
    df = spark.createDataFrame([(1, 2)], "id long, w long")
    with pytest.raises(ValueError):
        scan.pack_shards(df, "id", "w", shard_size=0)
