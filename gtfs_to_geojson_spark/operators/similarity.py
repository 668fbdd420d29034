"""Similarity search over an embedding column (engine-new).

* brute-force cosine top-k — the exactness baseline: JVM-side dot
  product (``aggregate``/``zip_with``), window top-k; broadcast the
  query set.
* IVF-style bucketed ANN — the scale path: deterministic coarse
  centroids (seeded from stable ids), vectors assigned to nearest
  centroid in a vectorized pandas UDF; queries probe ``n_probe``
  nearest centroids; exact cosine within probed buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast


def _cos_col(a: str, b: str, dim: int | None = None):
    """Cosine between two array<double> columns.

    ``dim=None`` uses ``aggregate``/``zip_with`` — correct for any
    length, but Spark evaluates higher-order lambdas interpreted,
    per element. With a known fixed ``dim`` the three folds unroll to
    static ``element_at`` expression chains that whole-stage-codegen
    compiles (measured ~40× on the heavy ANN run, BENCH/ROBUSTNESS.md).
    Both variants fold strictly left-to-right, so the float64 results
    are bit-identical; callers must pass the TRUE array length (a
    shorter array would turn ``element_at`` null)."""
    if dim is None:
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
        na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
        nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
        return dot / (na * nb)
    ea = [F.element_at(a, i + 1) for i in range(dim)]
    eb = [F.element_at(b, i + 1) for i in range(dim)]
    dot, sa, sb = F.lit(0.0), F.lit(0.0), F.lit(0.0)
    for i in range(dim):
        dot = dot + ea[i] * eb[i]
        sa = sa + ea[i] * ea[i]
        sb = sb + eb[i] * eb[i]
    return dot / (F.sqrt(sa) * F.sqrt(sb))


def _partial_topk_kernel(k: int, q_col: str, i_col: str):
    """Per-partition running top-k (mapInPandas). State is at most
    |Q|·k rows; each Arrow batch is merged into it and re-selected, so
    a partition streams through without ever materializing all its
    candidate rows at once."""

    def fn(batches):
        kept = None
        for pdf in batches:
            cur = pdf if kept is None else pd.concat((kept, pdf), ignore_index=True)
            # Spark DESC sorts NaN above every real value; map NaN to
            # +inf so the numpy sort agrees bit-for-bit with the window
            key = cur["cosine"].to_numpy(dtype=np.float64, copy=True)
            key[np.isnan(key)] = np.inf
            cur = cur.assign(_key=-key).sort_values(["_key", i_col], kind="mergesort")
            kept = cur.groupby(q_col, sort=False).head(k).drop(columns="_key")
        if kept is not None and len(kept):
            yield kept

    return fn


def _topk_select(scored: DataFrame, k: int, q_id: str, id_col: str, partial: bool) -> DataFrame:
    """Exact top-k per query over scored candidate rows.

    ``partial=True`` (default) pre-selects top-k per *input partition*
    in one Arrow pass before the global window, so the shuffle carries
    ≤ partitions·|Q|·k survivor rows instead of every candidate — the
    difference between shuffling ~10⁸ scored rows and ~10⁶ at heavy
    fan-out (see tools/ann_scale_bench.py). Selection key is identical
    to the window's (cosine DESC with Spark's NaN-greatest semantics,
    id ASC), so the result is bit-identical to the plain-window plan.
    Precondition: non-null cosine (null embedding elements would sort
    differently from NaN; all engine sources guarantee non-null)."""
    cand = scored.select(q_id, id_col, "cosine")
    if partial:
        cand = cand.mapInPandas(_partial_topk_kernel(k, q_id, id_col), cand.schema)
    w = Window.partitionBy(q_id).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(q_id, F.col(id_col), F.round("cosine", 6).alias("cosine"), F.col("_rn").alias("rank"))
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    partial_topk: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine for each query vector; ties broken by id.
    Queries are broadcast (small side), so the scan of the big
    embedding table is a single map-side pass; per-partition partial
    top-k (``_topk_select``) keeps the only shuffle at survivor size
    instead of |emb|·|Q| scored rows. Pass the embedding ``dim`` to
    unroll the cosine into codegen (bit-identical, ~40× — _cos_col)."""
    joined = emb.crossJoin(broadcast(queries))
    scored = joined.withColumn("cosine", _cos_col(vec_col, q_vec, dim))
    return _topk_select(scored, k, q_id, id_col, partial_topk)


def ivf_assign_udf(centroids: np.ndarray):
    """Vectorized: embedding batch → nearest-centroid index (argmax
    cosine against the centroid matrix in one matmul per Arrow batch)."""
    c = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.IntegerType())
    def assign(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype(np.int32))

    return assign


def seeded_centroids(emb: DataFrame, n_centroids: int, id_col: str, vec_col: str) -> np.ndarray:
    """Deterministic IVF codebook: the vectors with the n smallest
    md5-derived hash of id — stable, data-dependent, no RNG, and
    reproducible bit-for-bit in any engine with md5 (the DuckDB
    oracle for ``ann_ivf_topk`` re-derives the identical codebook;
    a k-means refinement slots in via ``kmeans_centroids``).
    Centroid index = rank in (hash, id) order — the SQL twin's
    ``row_number() - 1``."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    rows = (
        emb.select(F.col(id_col), F.col(vec_col))
        .withColumn("_h", h)
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .collect()
    )
    return np.asarray([list(r[vec_col]) for r in rows], dtype=np.float64)


def kmeans_centroids(
    emb: DataFrame,
    n_centroids: int,
    n_iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd's) for the IVF codebook.

    Each iteration is one Spark pass: assign every vector to its
    nearest centroid (vectorized matmul UDF, centroids in the
    closure), then recompute per-centroid means with
    ``posexplode(vec) → groupBy(cluster, dim).avg`` — partial
    aggregation keeps the shuffle at k·d rows regardless of table
    size. Only the (k × d) centroid matrix crosses the driver
    boundary per iteration. Deterministic: init from seeded_centroids,
    no RNG; empty clusters keep their previous centroid."""
    cents = seeded_centroids(emb, n_centroids, id_col, vec_col)
    for _ in range(max(0, n_iters)):
        assign = ivf_assign_udf(cents)
        assigned = emb.select(assign(F.col(vec_col)).alias("_c"), F.col(vec_col))
        sums = (
            assigned.select("_c", F.posexplode(vec_col).alias("_dim", "_v"))
            .groupBy("_c", "_dim")
            .agg(F.avg("_v").alias("_mean"))
            .collect()
        )
        new = cents.copy()  # clusters with no members keep their centroid
        for r in sums:
            new[r["_c"], r["_dim"]] = r["_mean"]
        norms = np.maximum(np.linalg.norm(new, axis=1, keepdims=True), 1e-12)
        cents = new / norms
    return cents


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id: str = "q_id",
    q_vec: str = "q_vec",
    train_iters: int = 0,
    partial_topk: bool = True,
    dim: int | None = None,
) -> DataFrame:
    """IVF-bucketed ANN: exact cosine, restricted to the n_probe
    nearest centroid buckets per query. Approximate (recall < 1 when
    the true neighbor lives in an unprobed bucket) — the scale path
    for 10^12-row tables where brute force is off the table.
    ``train_iters > 0`` refines the codebook with distributed k-means
    (better-balanced buckets → higher recall at the same n_probe)."""
    if train_iters > 0:
        cents = kmeans_centroids(emb, n_centroids, train_iters, id_col, vec_col)
    else:
        cents = seeded_centroids(emb, n_centroids, id_col, vec_col)
    assign = ivf_assign_udf(cents)
    bucketed = emb.withColumn("_bucket", assign(F.col(vec_col)))

    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe(vecs: pd.Series) -> pd.Series:
        m = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ cn.T), axis=1)[:, :n_probe]
        return pd.Series([row.astype(np.int32).tolist() for row in order])

    q = queries.withColumn("_bucket", F.explode(probe(F.col(q_vec))))
    joined = bucketed.join(broadcast(q), "_bucket")
    scored = joined.withColumn("cosine", _cos_col(vec_col, q_vec, dim))
    return _topk_select(scored, k, q_id, id_col, partial_topk)
