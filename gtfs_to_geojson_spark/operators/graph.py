"""Distributed connected components over an edge list.

Engine-new (no reference analog — the reference has no graph path):
the transitive-closure step a training-data pipeline needs between
near-duplicate PAIRS (MinHash/SimHash/embedding candidate generators
in ``dedup.py``) and per-document CLUSTER ids ("keep one doc per
duplicate cluster"), and the component-count invariant behind the
buffer-dissolve geometry kernel (``geoagg.dissolve_polygons``).

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014 — public).
Both steps are one shuffle each (groupBy node + shuffle join back);
the edge set monotonically contracts toward star graphs rooted at
each component's minimum id, converging in O(log n) rounds on any
graph — unlike plain label propagation, whose round count is the
graph DIAMETER (a 100 TB edge set with a long chain never finishes).
Skewed (high-degree) nodes are exactly what the star-contraction
steps flatten; the per-round joins are plain equi-joins on node id,
so AQE skew-split applies on top.

Determinism: pure min-aggregation — no RNG, no floating point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
    mins = mins.select("u", F.least("u", "_mn").alias("_m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Direct edges large→small, then connect each node's smaller
    neighbors (and the node itself) to their collective minimum."""
    d = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = d.groupBy("u").agg(F.min("v").alias("_m"))  # _m < u by construction
    out = (
        d.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("_m").alias("v"))
        .union(mins.select(F.col("u"), F.col("_m").alias("v")))
    )
    return out.filter(F.col("u") != F.col("v")).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iters: int = 30,
) -> DataFrame:
    """(node, component) for the undirected graph given by ``edges``;
    ``component`` is the minimum node id in the node's component.

    ``nodes`` (optional) supplies the full vertex set so isolated
    nodes come back as singleton components (component = themselves) —
    the shape near-dup clustering needs: every document gets a cluster
    id, most their own.

    Per round the edge set is eagerly ``localCheckpoint``-ed — the
    iterative plan would otherwise double in depth every round, and
    NOTES_r2 documents AQE-cached broadcast builds as the flaky path
    in this Spark; the checkpoint also gives a cheap convergence
    signature (count + xxhash sum) with no extra job.
    """
    e = edges.select(
        F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct()

    prev_sig = None
    prev_e = None
    converged = False
    for _ in range(max_iters):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("u", "v")).alias("h"),  # order-insensitive, overflow-free
        ).first()
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            # The (count, bit_xor) signature is a fast filter, not proof:
            # two distinct consecutive edge sets could collide. Confirm the
            # fixpoint exactly — both frames are localCheckpoint-ed distinct
            # sets with equal counts, so one-sided exceptAll-empty ⇒ equal.
            if e.exceptAll(prev_e).isEmpty():
                converged = True
                break
        prev_sig = sig
        prev_e = e
    if not converged:
        # Falling through with a non-star edge set would silently assign
        # wrong (split / non-minimal) component ids downstream.
        raise RuntimeError(
            f"connected_components did not converge within max_iters="
            f"{max_iters} star-contraction rounds; raise max_iters "
            "(rounds needed grow O(log n) in the node count)"
        )

    # converged: star graphs (child → root). Roots map to themselves;
    # min() collapses any duplicate (node, root) rows.
    assign = (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    if nodes is not None:
        allnodes = nodes.select(F.col(node_col).cast("long").alias("node")).distinct()
        assign = allnodes.join(assign, "node", "left").select(
            "node", F.coalesce("component", "node").alias("component")
        )
    return assign
