"""Driver-contract queries: every SURVEY.md §2 operator expressed over
the driver's TPC-H-ish tables, each with an exact DuckDB-SQL twin.

Conventions that make the side-by-side hash check deterministic:

* every computed column is aliased identically on both sides;
* geo coordinates are *derived* from integer keys with pure integer
  arithmetic + one float division — bit-identical in Spark and DuckDB;
* engine-stable digests only (md5 → first-15-hex → int64), never
  Spark-internal hash();
* float aggregations are rounded where the underlying grid makes
  rounding stable, and omitted from outputs where two engines' trig
  could flip a boundary (kNN emits ids, not distances);
* Spark side uses the real engine operators (cells.cell_col,
  spatial.point_in_envelope_join, spatial.knn_join, dedup.*, text.*,
  similarity.*) — the SQL twin is an independent reformulation, so a
  match validates the operator, not a copy of it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from .. import cells
from ..functions.geo import haversine_m, sanitize_filename, yyyymmdd
from ..operators import (
    dedup,
    linear_ref,
    multimodal,
    overlap,
    raster,
    relational,
    scan,
    similarity,
    spatial,
    text,
)

# ---------------------------------------------------------------------------
# deterministic key → coordinate derivation (identical in SQL)
# ---------------------------------------------------------------------------

LON0, LON_SPAN = -122.52, 0.17
LAT0, LAT_SPAN = 37.70, 0.14
M1, M2, MOD = 2654435761, 40503, 1000000
CELL_RES = 12
TILE_RES = 14


def lon_col(key):
    return F.lit(LON0) + ((key * F.lit(M1)) % F.lit(MOD)).cast("double") / F.lit(float(MOD)) * F.lit(LON_SPAN)


def lat_col(key):
    return F.lit(LAT0) + ((key * F.lit(M2)) % F.lit(MOD)).cast("double") / F.lit(float(MOD)) * F.lit(LAT_SPAN)


def lon_sql(key: str) -> str:
    return f"({LON0} + CAST(({key} * {M1}) % {MOD} AS DOUBLE) / {MOD}.0 * {LON_SPAN})"


def lat_sql(key: str) -> str:
    return f"({LAT0} + CAST(({key} * {M2}) % {MOD} AS DOUBLE) / {MOD}.0 * {LAT_SPAN})"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _ring_cand_cells(px, py, ring: int, res: int, n: int):
    """Candidate-cell id array for a (2·ring+1)² k-ring around (px, py)
    on the n×n cells.py grid, matching spatial.py's kNN cover exactly:
    x WRAPS modulo n (antimeridian — ADVICE r3: the old greatest/least
    clamp silently dropped the far-side cells for data near ±180°),
    y clamps at the poles (no wrap), duplicates from a ring wider than
    the grid collapse via array_distinct."""
    res_term = F.lit(res).cast("long") * F.lit(1 << 58).cast("long")
    return F.array_distinct(
        F.flatten(
            F.transform(
                F.sequence(px - F.lit(ring), px + F.lit(ring)),
                lambda x: F.transform(
                    F.sequence(
                        F.greatest(py - F.lit(ring), F.lit(0)),
                        F.least(py + F.lit(ring), F.lit(n - 1)),
                    ),
                    lambda y: res_term
                    + F.pmod(x, F.lit(n)).cast("long") * F.lit(1 << 29).cast("long")
                    + y,
                ),
            )
        )
    )


def customer_points(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        lon_col(F.col("c_custkey")).alias("lon"),
        lat_col(F.col("c_custkey")).alias("lat"),
    )


CUSTOMER_POINTS_SQL = (
    f"SELECT c_custkey, {lon_sql('c_custkey')} AS lon, {lat_sql('c_custkey')} AS lat FROM customer"
)


def supplier_boxes(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    cx = lon_col(F.col("s_suppkey") * 13 + 7)
    cy = lat_col(F.col("s_suppkey") * 11 + 5)
    hw = ((F.col("s_suppkey") % 13) + 2).cast("double") * F.lit(0.004)
    hh = ((F.col("s_suppkey") % 7) + 2).cast("double") * F.lit(0.003)
    return s.select(
        "s_suppkey",
        (cx - hw).alias("min_lon"),
        (cx + hw).alias("max_lon"),
        (cy - hh).alias("min_lat"),
        (cy + hh).alias("max_lat"),
    )


SUPPLIER_BOXES_SQL = f"""
SELECT s_suppkey,
       ({lon_sql('(s_suppkey * 13 + 7)')} - CAST((s_suppkey % 13) + 2 AS DOUBLE) * 0.004) AS min_lon,
       ({lon_sql('(s_suppkey * 13 + 7)')} + CAST((s_suppkey % 13) + 2 AS DOUBLE) * 0.004) AS max_lon,
       ({lat_sql('(s_suppkey * 11 + 5)')} - CAST((s_suppkey % 7) + 2 AS DOUBLE) * 0.003) AS min_lat,
       ({lat_sql('(s_suppkey * 11 + 5)')} + CAST((s_suppkey % 7) + 2 AS DOUBLE) * 0.003) AS max_lat
FROM supplier
"""


def supplier_points(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        lon_col(F.col("s_suppkey") * 13 + 7).alias("t_lon"),
        lat_col(F.col("s_suppkey") * 11 + 5).alias("t_lat"),
    )


SUPPLIER_POINTS_SQL = (
    f"SELECT s_suppkey, {lon_sql('(s_suppkey * 13 + 7)')} AS t_lon, "
    f"{lat_sql('(s_suppkey * 11 + 5)')} AS t_lat FROM supplier"
)


# ---------------------------------------------------------------------------
# the queries — (spark_fn, oracle_sql | None)
# ---------------------------------------------------------------------------

_QUERIES: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        _QUERIES[name] = (fn, sql.strip() if sql else None)
        return fn

    return deco


# ---- F1/G12: date-window filter (lexicographic YYYYMMDD compare) ----
@q(
    "f1_date_window",
    """
SELECT DISTINCT o_custkey AS service_key
FROM orders
WHERE strftime(o_orderdate, '%Y%m%d') <= '19951231'
  AND strftime(o_orderdate, '%Y%m%d') >= '19950101'
""",
)
def f1_date_window(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = yyyymmdd(F.col("o_orderdate"))
    return (
        o.filter((d <= F.lit("19951231")) & (d >= F.lit("19950101")))
        .select(F.col("o_custkey").alias("service_key"))
        .distinct()
    )


# ---- F2: semi-join pushdown of the window ----
@q(
    "f2_semi_join",
    """
SELECT l_returnflag, count(*) AS n_rows, CAST(sum(l_quantity) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE strftime(o_orderdate, '%Y%m%d') BETWEEN '19950101' AND '19951231'
)
GROUP BY l_returnflag
""",
)
def f2_semi_join(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    d = yyyymmdd(F.col("o_orderdate"))
    keys = o.filter((d >= F.lit("19950101")) & (d <= F.lit("19951231"))).select("o_orderkey")
    return (
        li.join(broadcast(keys), li.l_orderkey == keys.o_orderkey, "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_quantity").cast("double").alias("sum_qty"),
        )
    )


# ---- F4: existence filter ----
@q(
    "f4_exists_filter",
    """
SELECT c_mktsegment, count(*) AS n_customers
FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY c_mktsegment
""",
)
def f4_exists_filter(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---- J1: 4-way equi join + grouped agg (broadcast dims) ----
@q(
    "j1_multiway_join",
    """
SELECT n_name, o_orderpriority, count(*) AS n_items,
       round(CAST(sum(l_extendedprice) AS DOUBLE), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name, o_orderpriority
""",
)
def j1_multiway_join(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
        )
    )


# ---- A10: nested collect (sorted, deterministic) ----
@q(
    "a10_nested_collect",
    """
SELECT o_custkey AS custkey,
       string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority) AS priorities
FROM orders GROUP BY o_custkey
""",
)
def a10_nested_collect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.concat_ws(",", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities")
    )


# ---- A7/A8/O1: window-ordered collect (LineString assembly analog) ----
@q(
    "a7_ordered_collect",
    """
SELECT l_orderkey AS orderkey,
       string_agg(l_partkey::VARCHAR, '-' ORDER BY l_linenumber, l_partkey) AS part_chain
FROM lineitem GROUP BY l_orderkey
""",
)
def a7_ordered_collect(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    # (l_linenumber can repeat within an order in this synthetic data —
    # tie-break on l_partkey numerically in BOTH engines)
    return li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.concat_ws(
            "-",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("l_linenumber").alias("n"),
                            F.col("l_partkey").alias("pk"),
                        )
                    )
                ),
                lambda x: x["pk"].cast("string"),
            ),
        ).alias("part_chain")
    )


# ---- A5: first-per-key dedup (uniqBy analog) ----
@q(
    "a5_first_per_key",
    """
SELECT o_custkey AS custkey, o_orderkey AS first_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def a5_first_per_key(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("first_orderkey"))
    )


# ---- A6/O3: argmax (maxBy analog) ----
@q(
    "a6_argmax",
    """
SELECT o_custkey AS custkey, o_orderkey AS top_orderkey FROM (
  SELECT o_custkey, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn = 1
""",
)
def a6_argmax(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(F.col("o_custkey").alias("custkey"), F.col("o_orderkey").alias("top_orderkey"))
    )


# ---- A4: DISTINCT ----
@q(
    "a4_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def a4_distinct(spark, sf_dir):
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---- A12: union-all merge ----
@q(
    "a12_union_all",
    """
SELECT o_orderstatus, count(*) AS n FROM (
  SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
  UNION ALL
  SELECT o_orderstatus FROM orders WHERE o_totalprice > 100000
) GROUP BY o_orderstatus
""",
)
def a12_union_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    u = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus")
    h = o.filter(F.col("o_totalprice") > 100000).select("o_orderstatus")
    return u.unionByName(h).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


# ---- J3: left outer join with null default ----
@q(
    "j3_left_join",
    """
SELECT c_custkey AS custkey, CAST(coalesce(n_orders, 0) AS BIGINT) AS n_orders
FROM customer LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
) ON c_custkey = o_custkey
""",
)
def j3_left_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return c.join(agg, c.c_custkey == agg.o_custkey, "left").select(
        F.col("c_custkey").alias("custkey"),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("n_orders"),
    )


# ---- P3/G11: hex formatting ----
@q(
    "g11_hex_format",
    """
SELECT c_custkey AS custkey,
       '#' || upper(to_hex(c_custkey % 16777216)) AS color
FROM customer
""",
)
def g11_hex_format(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.lit("#"), F.upper(F.hex(F.col("c_custkey") % 16777216))).alias("color"),
    )


# ---- S7/G7/G8: filename sanitize + uniquify ----
@q(
    "s7_filenames",
    """
SELECT p_partkey AS partkey,
       CASE WHEN cnt > 1 THEN base || '_' || rk ELSE base END AS filename
FROM (
  SELECT p_partkey,
         regexp_replace(p_brand || '_' || p_type, '[\\\\/:*?"<>|]', '', 'g') AS base,
         count(*) OVER (PARTITION BY regexp_replace(p_brand || '_' || p_type, '[\\\\/:*?"<>|]', '', 'g')) AS cnt,
         row_number() OVER (PARTITION BY regexp_replace(p_brand || '_' || p_type, '[\\\\/:*?"<>|]', '', 'g') ORDER BY p_partkey) AS rk
  FROM part
)
""",
)
def s7_filenames(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    base = sanitize_filename(F.concat_ws("_", F.col("p_brand"), F.col("p_type")))
    df = p.withColumn("base", base)
    wc = Window.partitionBy("base")
    wr = Window.partitionBy("base").orderBy("p_partkey")
    return (
        df.withColumn("cnt", F.count(F.lit(1)).over(wc))
        .withColumn("rk", F.row_number().over(wr))
        .select(
            F.col("p_partkey").alias("partkey"),
            F.when(F.col("cnt") > 1, F.concat(F.col("base"), F.lit("_"), F.col("rk").cast("string")))
            .otherwise(F.col("base"))
            .alias("filename"),
        )
    )


# ---- A1/G4: envelope over derived points ----
@q(
    "a1_envelope",
    f"""
SELECT round(min(lon), 9) AS min_lon, round(min(lat), 9) AS min_lat,
       round(max(lon), 9) AS max_lon, round(max(lat), 9) AS max_lat
FROM ({CUSTOMER_POINTS_SQL})
""",
)
def a1_envelope(spark, sf_dir):
    pts = customer_points(spark, sf_dir)
    return pts.agg(
        F.round(F.min("lon"), 9).alias("min_lon"),
        F.round(F.min("lat"), 9).alias("min_lat"),
        F.round(F.max("lon"), 9).alias("max_lon"),
        F.round(F.max("lat"), 9).alias("max_lat"),
    )


# ---- cell encoding (the grid index itself, JVM-side) ----
@q(
    "cell_encode",
    f"""
SELECT {cells.cell_sql('lat', 'lon', CELL_RES)} AS cell, count(*) AS n_points
FROM ({CUSTOMER_POINTS_SQL})
GROUP BY 1
""",
)
def cell_encode(spark, sf_dir):
    pts = customer_points(spark, sf_dir)
    return pts.groupBy(
        cells.cell_col(F.col("lat"), F.col("lon"), CELL_RES).alias("cell")
    ).agg(F.count(F.lit(1)).alias("n_points"))


# ---- Z-order (Morton) layout key + hierarchy algebra ----
# mkey: the interleaved-bit spatial layout key (operators/layout.py).
# mkey_parent cross-validates the hierarchy property the layout relies
# on: Spark derives the coarse key by shifting the fine key right 2d
# bits, the oracle encodes it directly from (lat, lon) at the coarse
# res — both must agree for "parent cell = contiguous Morton range"
# (cells.morton_range_for_cell) to hold.
@q(
    "cell_morton",
    f"""
SELECT c_custkey AS custkey,
       {cells.morton_sql('lat', 'lon', 14)} AS mkey,
       {cells.morton_sql('lat', 'lon', 8)} AS mkey_parent
FROM ({CUSTOMER_POINTS_SQL})
""",
)
def cell_morton(spark, sf_dir):
    pts = customer_points(spark, sf_dir)
    mk = cells.morton_col(F.col("lat"), F.col("lon"), 14)
    return pts.select(
        F.col("c_custkey").alias("custkey"),
        mk.alias("mkey"),
        F.shiftright(mk, 2 * (14 - 8)).alias("mkey_parent"),
    )


# ---- J6: point-in-envelope spatial join (cell prejoin + residual) ----
@q(
    "j6_point_in_envelope",
    f"""
SELECT c_custkey AS custkey, s_suppkey AS suppkey
FROM ({CUSTOMER_POINTS_SQL}) p JOIN ({SUPPLIER_BOXES_SQL}) b
  ON p.lon >= b.min_lon AND p.lon <= b.max_lon
 AND p.lat >= b.min_lat AND p.lat <= b.max_lat
""",
)
def j6_point_in_envelope(spark, sf_dir):
    pts = customer_points(spark, sf_dir)
    boxes = supplier_boxes(spark, sf_dir)
    joined = spatial.point_in_envelope_join(pts, boxes, res=CELL_RES)
    return joined.select(F.col("c_custkey").alias("custkey"), F.col("s_suppkey").alias("suppkey"))


# ---- J8: kNN join (ring expansion vs brute-force oracle) ----
@q(
    "j8_knn",
    f"""
SELECT c_custkey AS custkey, s_suppkey AS nearest_suppkey FROM (
  SELECT c_custkey, s_suppkey,
         row_number() OVER (
           PARTITION BY c_custkey
           ORDER BY 2.0 * 6371008.8 * asin(sqrt(least(
             pow(sin(radians(t_lat - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(t_lat)) * pow(sin(radians(t_lon - lon) / 2), 2),
             1.0))), s_suppkey
         ) AS rn
  FROM ({CUSTOMER_POINTS_SQL}) p CROSS JOIN ({SUPPLIER_POINTS_SQL}) t
) WHERE rn = 1
""",
)
def j8_knn(spark, sf_dir):
    pts = customer_points(spark, sf_dir)
    tgt = supplier_points(spark, sf_dir)
    out = spatial.knn_join(
        pts, tgt, res=CELL_RES, k=1,
        point_key="c_custkey", target_key="s_suppkey",
    )
    return out.select(F.col("c_custkey").alias("custkey"), F.col("s_suppkey").alias("nearest_suppkey"))


# ---- J9: tile assignment at image scale (arithmetic geotag analog) ----
@q(
    "j9_tile_assign",
    f"""
SELECT {cells.cell_sql('lat', 'lon', TILE_RES)} AS tile, count(*) AS n_images
FROM (
  SELECT {lon_sql('(l_orderkey * 6 + l_linenumber)')} AS lon,
         {lat_sql('(l_orderkey * 6 + l_linenumber)')} AS lat
  FROM lineitem
)
GROUP BY 1
""",
)
def j9_tile_assign(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 6 + F.col("l_linenumber")
    pts = li.select(lon_col(key).alias("lon"), lat_col(key).alias("lat"))
    return pts.groupBy(
        cells.cell_col(F.col("lat"), F.col("lon"), TILE_RES).alias("tile")
    ).agg(F.count(F.lit(1)).alias("n_images"))


# ---- dedup: exact ----
@q(
    "dedup_exact",
    """
SELECT md5(text) AS digest, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1
""",
)
def dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs)


# ---- dedup: n-gram jaccard pairs ----
@q(
    "dedup_ngram_jaccard",
    """
WITH sh0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
                               s -> substr(lower(text), s, 3))) AS shingle
  FROM documents
  WHERE doc_id < 120
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE length(shingle) = 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.65
""",
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    return dedup.ngram_jaccard_pairs(docs, n=3, threshold=0.65)


# ---- dedup: minhash signatures (engine-stable hashes) ----
@q(
    "minhash_signatures",
    """
WITH sh0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 3, 1) + 1),
                               s -> substr(lower(text), s, 4))) AS shingle
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE length(shingle) = 4
)
SELECT doc_id,
       min(('0x' || substr(md5('seed0:' || shingle), 1, 15))::BIGINT) AS h0,
       min(('0x' || substr(md5('seed1:' || shingle), 1, 15))::BIGINT) AS h1,
       min(('0x' || substr(md5('seed2:' || shingle), 1, 15))::BIGINT) AS h2,
       min(('0x' || substr(md5('seed3:' || shingle), 1, 15))::BIGINT) AS h3
FROM sh GROUP BY doc_id
""",
)
def minhash_signatures(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dedup.minhash_signatures(docs, n_hashes=4, shingle_n=4)


# ---- text: language id ----
_LANG_SCORE_SQL = {
    lang: " + ".join(
        f"(length(pad) - length(replace(pad, '{m}', ''))) / {len(m)}.0" for m in markers
    )
    for lang, markers in text.LANG_MARKERS.items()
}

@q(
    "text_lang_id",
    f"""
WITH scored AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS pad FROM documents
), s AS (
  SELECT doc_id,
         {_LANG_SCORE_SQL['de']} AS s_de,
         {_LANG_SCORE_SQL['en']} AS s_en,
         {_LANG_SCORE_SQL['es']} AS s_es,
         {_LANG_SCORE_SQL['fr']} AS s_fr
  FROM scored
), unp AS (
  SELECT doc_id, 'de' AS lang, s_de AS score FROM s
  UNION ALL SELECT doc_id, 'en', s_en FROM s
  UNION ALL SELECT doc_id, 'es', s_es FROM s
  UNION ALL SELECT doc_id, 'fr', s_fr FROM s
)
SELECT doc_id, lang AS pred_lang, CAST(score AS DOUBLE) AS pred_score FROM (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM unp
) WHERE rn = 1
""",
)
def text_lang_id(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.lang_id(docs)


# ---- text: quality scoring ----
@q(
    "text_quality",
    r"""
SELECT doc_id,
       length(text) AS n_chars,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_words,
       round(CAST(length(text) AS DOUBLE) / greatest(len(string_split_regex(trim(text), '\s+')), 1), 4) AS mean_word_len,
       round(CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio
FROM documents
""",
)
def text_quality(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = text.quality_score(docs)
    return out.select("doc_id", "n_chars", "n_words", "mean_word_len", "punct_ratio")


# ---- text: token counting ----
@q(
    "text_token_count",
    r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])')) AS BIGINT) AS bpe_ish_tokens
FROM documents
""",
)
def text_token_count(spark, sf_dir):
    return text.token_count(_t(spark, sf_dir, "documents"))


# ---- text: fingerprint (min-shingle md5) ----
@q(
    "text_fingerprint",
    """
WITH g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 7, 1) + 1),
                               s -> substr(lower(text), s, 8))) AS gram
  FROM documents
)
SELECT doc_id, min(md5(gram)) AS fingerprint
FROM g WHERE length(gram) = 8
GROUP BY doc_id
""",
)
def text_fingerprint(spark, sf_dir):
    return text.fingerprint(_t(spark, sf_dir, "documents"), shingle_n=8)


# ---- similarity: brute-force cosine top-k ----
@q(
    "ann_brute_topk",
    """
SELECT q_id, vec_id, rank FROM (
  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                    e.vec_id
         ) AS rank
  FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
) WHERE rank <= 5
""",
)
def ann_brute_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = similarity.brute_force_topk(emb, queries, k=5)
    return out.select("q_id", "vec_id", "rank")


# ---- dedup: embedding near-dup pairs (brute-force exact) ----
@q(
    "embed_near_dup",
    """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id
 AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
""",
)
def embed_near_dup(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    cos = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda acc, x: acc + x * x))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", cos / (na * nb))
        .filter(F.col("cosine") >= 0.35)
        .select("id_a", "id_b")
    )


# ---- dedup: EXACT near-dup pairs via Voronoi/IVF partition (r4) ----
# Same truth set as embed_near_dup — the operator is exact, so the
# oracle is threshold-only, independent of codebook internals. The
# registered parameters force every interesting path at driver scale:
# train_iters=1 (distributed k-means), max_home_per_task=64 (hot-
# bucket salting engages on ~62-row home buckets), and 0.35 sits in
# the degenerate-probe regime (2ε > sphere diameter ⇒ all-centroid
# probing) so pruning cannot hide a kernel bug. The selective-probe
# regime is pinned by tests/test_dedup_text.py and the 10M-row run
# in BENCH/ROBUSTNESS.md.
@q(
    "embed_near_dup_ivf",
    """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id
 AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
""",
)
def embed_near_dup_ivf(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    out = similarity.near_dup_pairs_ivf(
        emb, threshold=0.35, n_centroids=8, train_iters=1, max_home_per_task=64
    )
    return out.select("id_a", "id_b")


# ---- dedup: MinHash+LSH candidate pairs (exact oracle) ----
# The whole pipeline — shingles → 16 md5-min hashes → 4 banded md5
# bucket keys → intra-bucket pairs → agreement fraction — is
# deterministic and engine-stable, so the DuckDB twin reproduces it
# bit-for-bit (est_jaccard = k/16 is dyadic → exact FP equality).
_MH_HASHES = ",\n       ".join(
    f"min(('0x' || substr(md5('seed{i}:' || shingle), 1, 15))::BIGINT) AS h{i}"
    for i in range(16)
)
_MH_BANDS = ",\n       ".join(
    "md5(concat_ws('_', " + ", ".join(f"h{b * 4 + r}" for r in range(4)) + f")) AS band{b}"
    for b in range(4)
)
_MH_AGREE = " + ".join(f"CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END" for i in range(16))

# shared by minhash_lsh_pairs and dedup_clusters (which runs connected
# components over this pair graph)
_LSH_PAIRS_SQL = f"""
WITH sh0 AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(length(text) - 3, 1) + 1),
                               s -> substr(lower(text), s, 4))) AS shingle
  FROM documents WHERE doc_id < 200
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE length(shingle) = 4
), sig AS (
  SELECT doc_id,
       {_MH_HASHES}
  FROM sh GROUP BY doc_id
), banded AS (
  SELECT doc_id,
       {_MH_BANDS}
  FROM sig
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.doc_id < b.doc_id
   AND (a.band0 = b.band0 OR a.band1 = b.band1 OR a.band2 = b.band2 OR a.band3 = b.band3)
)
SELECT id_a, id_b, est_jaccard FROM (
  SELECT p.id_a, p.id_b, ({_MH_AGREE}) / 16.0 AS est_jaccard
  FROM pairs p
  JOIN sig sa ON sa.doc_id = p.id_a
  JOIN sig sb ON sb.doc_id = p.id_b
) WHERE est_jaccard >= 0.5
"""


@q("minhash_lsh_pairs", _LSH_PAIRS_SQL)
def minhash_lsh_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.minhash_lsh_pairs(docs, n_hashes=16, bands=4, threshold=0.5)


# ---- dedup: near-dup CLUSTERS (pairs → transitive closure) ----
@q(
    "dedup_clusters",
    f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_LSH_PAIRS_SQL}) lsh
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
), comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
)
SELECT d.doc_id,
       CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
FROM documents d LEFT JOIN comp c USING (doc_id)
WHERE d.doc_id < 200
""",
)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate clustering — the step a training pipeline runs
    between candidate PAIRS and "keep one doc per duplicate group":
    distributed connected components (large-star/small-star,
    operators/graph.py) over the MinHash+LSH pair graph; every doc
    gets a cluster id (min doc_id in its component; singletons map to
    themselves). Oracle: recursive-CTE transitive closure over the
    identical pair SQL."""
    from ..operators import graph

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = dedup.minhash_lsh_pairs(docs, n_hashes=16, bands=4, threshold=0.5)
    return graph.connected_components(
        pairs, src="id_a", dst="id_b", nodes=docs, node_col="doc_id"
    ).select(F.col("node").alias("doc_id"), F.col("component").alias("cluster_id"))


# ---- dedup: SimHash near-dup pairs (exact oracle) ----
# The 64-bit simhash (per-token md5 bits summed ±1 per position) is
# re-derived in pure SQL: token hash = first 8 md5 bytes big-endian
# (two 8-hex-char BIGINT parts assembled into a HUGEINT), bit b of the
# signature set iff sum over tokens of ±1 at b is > 0, bit 63 mapped to
# the int64 sign bit. Candidate restriction (agree on ≥1 of four
# 16-bit bands) and the exact hamming filter both replicated.
@q(
    "simhash_pairs",
    """
WITH toks AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents WHERE doc_id < 200
  ) WHERE tok <> ''
), th AS (
  SELECT doc_id,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT::HUGEINT * 4294967296
           + ('0x' || substr(md5(tok), 9, 8))::BIGINT AS hv
  FROM toks
), acc AS (
  SELECT doc_id, b, sum(CASE WHEN (hv >> b) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM th CROSS JOIN generate_series(0, 63) t(b)
  GROUP BY doc_id, b
), sim AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN
               CASE WHEN b = 63 THEN -9223372036854775808::HUGEINT
                    ELSE (1::HUGEINT << b) END
             ELSE 0::HUGEINT END)::BIGINT AS simhash
  FROM acc GROUP BY doc_id
), u AS (
  SELECT doc_id, simhash,
         simhash::HUGEINT
           + CASE WHEN simhash < 0 THEN 18446744073709551616::HUGEINT
                  ELSE 0::HUGEINT END AS uh
  FROM sim
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM u a JOIN u b ON a.doc_id < b.doc_id
   AND (  (a.uh % 65536) = (b.uh % 65536)
       OR ((a.uh >> 16) % 65536) = ((b.uh >> 16) % 65536)
       OR ((a.uh >> 32) % 65536) = ((b.uh >> 32) % 65536)
       OR ((a.uh >> 48) % 65536) = ((b.uh >> 48) % 65536))
)
SELECT id_a, id_b, bit_count(xor(sh_a, sh_b)) AS hamming
FROM pairs WHERE bit_count(xor(sh_a, sh_b)) <= 12
""",
)
def simhash_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.simhash_near_pairs(docs, max_hamming=12)


# ---- image phash near-dup (banded Hamming over the input-hint phash
# column; dedup.phash_near_pairs). The synthetic phash plants near-dup
# groups the same way j9 plants geotags: base = md5-derived 64-bit of
# the group key (doc_id % 120), then one planted bit flip at
# (doc_id % 63) — within-group pairs have hamming ∈ {0, 2}, cross-group
# pairs ~32. max_hamming=2 ≤ n_bands−combos=2, so the pigeonhole
# guarantee makes the banded result EXACT and the oracle is the honest
# brute-force all-pairs filter (stronger than replicating the bands).
# combos=2 (the r4 corpus-scale key-width dial, measured at 10^8 sigs
# in BENCH/ROBUSTNESS.md) so the driver pins that path every round.
@q(
    "phash_near_dup",
    """
WITH ph AS (
  SELECT doc_id AS image_id,
         xor(
           (('0x' || substr(md5((doc_id % 120)::VARCHAR), 1, 8))::BIGINT::HUGEINT
              * 4294967296
            + ('0x' || substr(md5((doc_id % 120)::VARCHAR), 9, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5((doc_id % 120)::VARCHAR), 1, 8))::BIGINT
                        >= 2147483648
                   THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT,
           (1::BIGINT << (doc_id % 63))
         ) AS phash
  FROM documents
)
SELECT a.image_id AS id_a, b.image_id AS id_b,
       bit_count(xor(a.phash, b.phash)) AS hamming
FROM ph a JOIN ph b ON a.image_id < b.image_id
WHERE bit_count(xor(a.phash, b.phash)) <= 2
""",
)
def phash_near_dup(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    g = (F.col("doc_id") % 120).cast("string")
    hi = F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(g), 9, 8), 16, 10).cast("long")
    imgs = docs.select(
        F.col("doc_id").alias("image_id"),
        (F.shiftleft(hi, 32) + lo).bitwiseXOR(
            F.expr("shiftleft(cast(1 as bigint), cast(doc_id % 63 as int))")
        ).alias("phash"),
    )
    return dedup.phash_near_pairs(imgs, max_hamming=2, id_col="image_id", combos=2)


# ---- ANN: IVF top-k with the seeded codebook (exact oracle) ----
# seeded_centroids picks the 8 vectors with smallest md5-hash of id —
# SQL-reproducible; assignment/probe/top-k are rank orderings over
# cosine, emitted without the raw float (same convention as
# ann_brute_topk: FP summation order differs across engines, rank
# ordering does not unless two cosines tie within ~1e-15).
@q(
    "ann_ivf_topk",
    """
WITH emb AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  SELECT v, row_number() OVER (
           ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
         ) - 1 AS cidx
  FROM emb
  ORDER BY ('0x' || substr(md5(vec_id::VARCHAR), 1, 15))::BIGINT, vec_id
  LIMIT 8
), assigned AS (
  SELECT vec_id, v, cidx AS bucket FROM (
    SELECT e.vec_id, e.v, c.cidx,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY list_cosine_similarity(e.v, c.v) DESC, c.cidx ASC) AS rn
    FROM emb e CROSS JOIN cents c
  ) WHERE rn = 1
), queries AS (
  SELECT vec_id AS q_id, v AS qv FROM emb WHERE vec_id < 5
), probes AS (
  SELECT q_id, qv, cidx AS bucket FROM (
    SELECT q.q_id, q.qv, c.cidx,
           row_number() OVER (PARTITION BY q.q_id
                              ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.cidx ASC) AS rn
    FROM queries q CROSS JOIN cents c
  ) WHERE rn <= 3
)
SELECT q_id, vec_id, rank FROM (
  SELECT p.q_id, a.vec_id,
         row_number() OVER (PARTITION BY p.q_id
                            ORDER BY list_cosine_similarity(a.v, p.qv) DESC, a.vec_id ASC) AS rank
  FROM probes p JOIN assigned a USING (bucket)
) WHERE rank <= 5
""",
)
def ann_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3)
    return out.select("q_id", "vec_id", "rank")


# ---- as-of join (engine-new temporal operator; oracle = DuckDB's
# native ASOF JOIN) ----
# Most recent click at-or-before each purchase, per user. The Spark
# side is the union+running-window formulation (one shuffle, no range
# blowup — relational.asof_join); DuckDB validates it with its native
# ASOF LEFT JOIN. Right side pre-deduplicated on (user, ts) keeping
# max event_id — the tie rule both engines then agree on. Timestamps
# emitted as integer µs (cross-engine serialization convention).
@q(
    "asof_join",
    """
WITH clicks AS (
  SELECT user_id, ts, event_id AS click_id, value AS click_value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'click'
), c AS (
  SELECT user_id, ts, click_id, click_value FROM clicks WHERE rn = 1
), p AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id AS purchase_id, p.user_id AS user_id,
       epoch_us(p.ts) AS purchase_us,
       c.click_id AS click_id, c.click_value AS click_value
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
)
def asof_join_q(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
            ),
        )
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("event_id").alias("click_id"),
            F.col("value").alias("click_value"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = relational.asof_join(
        purchases, clicks, key_col="user_id", ts_col="ts",
        right_payload_cols=["click_id", "click_value"],
    )
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("purchase_us"),
        F.col("_asof.click_id").alias("click_id"),
        F.col("_asof.click_value").alias("click_value"),
    )


# ---- interval-point temporal join (1D bucket prejoin + residual) ----
# Clicks landing within one hour after a signup, per user: intervals
# [signup_ts, signup_ts + 1h] ⋈ click points. The Spark side is the
# bucket-prejoin formulation (the 1D twin of J6's cell prejoin); the
# oracle is the plain theta join.
@q(
    "t1_interval_join",
    """
SELECT s.event_id AS signup_id, c.event_id AS click_id, s.user_id AS user_id
FROM (SELECT event_id, user_id, epoch_us(ts) AS t0 FROM events WHERE event_type = 'signup') s
JOIN (SELECT event_id, user_id, epoch_us(ts) AS t FROM events WHERE event_type = 'click') c
  ON s.user_id = c.user_id AND c.t >= s.t0 AND c.t <= s.t0 + 3600000000
""",
)
def t1_interval_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        "user_id",
        us.alias("t0"),
        (us + F.lit(3600000000).cast("long")).alias("t1"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", us.alias("t")
    )
    out = relational.interval_point_join(
        signups, clicks, start_col="t0", end_col="t1", ts_col="t",
        bucket_width=3600000000, key_cols=["user_id"],
    )
    return out.select("signup_id", "click_id", "user_id")


# ---- KMV distinct-count sketch (mergeable sketch, exact oracle) ----
# The sketch state (k smallest md5 hashes) is deterministic, so the
# oracle recomputes the identical sketch and the ESTIMATE matches
# exactly — a sketch gated on equality, not tolerance.
@q(
    "kmv_distinct",
    """
WITH h AS (
  SELECT DISTINCT l_returnflag AS flag,
         ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT AS hv
  FROM lineitem
), r AS (
  SELECT flag, hv, row_number() OVER (PARTITION BY flag ORDER BY hv) AS rn FROM h
), sel AS (
  SELECT flag, hv, rn FROM r WHERE rn <= 64
), agg AS (
  SELECT flag, count(*) AS n_sketch, max(hv) AS kth FROM sel GROUP BY flag
)
SELECT flag, CAST(n_sketch AS INT) AS n_sketch,
       round(
         CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
              ELSE 63.0 / (CAST(kth AS DOUBLE) / 1152921504606846976.0) END,
         4
       ) AS est_distinct
FROM agg
""",
)
def kmv_distinct_q(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    out = dedup.kmv_distinct(
        li, group_cols=["l_returnflag"], value_col="l_partkey", k=64
    )
    return out.withColumnRenamed("l_returnflag", "flag")


# ---- deterministic stratified sampling (training-data downsampling) ----
# Hash-threshold sampling: a row survives iff md5(id) mod 10^6 falls
# under its stratum's per-million rate — deterministic, re-runnable,
# engine-stable (the standard way to cut a reproducible training
# subset without a global shuffle or RNG state).
@q(
    "sample_stratified",
    """
SELECT doc_id, lang
FROM (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN 'en' WHEN doc_id % 3 = 1 THEN 'de' ELSE 'fr' END AS lang
      FROM documents)
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 1000000
      < CASE lang WHEN 'en' THEN 250000 WHEN 'de' THEN 500000 ELSE 1000000 END
""",
)
def sample_stratified_q(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "en")
        .when(F.col("doc_id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang"),
    )
    from ..operators.text import stratified_sample

    return stratified_sample(
        docs, stratum_col="lang", id_col="doc_id",
        rates_per_million={"en": 250000, "de": 500000, "fr": 1000000},
    )


# ---- exact per-group quantiles (order statistics, not approx) ----
# Spark's percentile() is the exact order-statistic aggregate (linear
# interpolation), matching DuckDB quantile_cont bit-for-bit on integer
# inputs — deterministic cross-engine, unlike approx_percentile.
@q(
    "q1_group_quantiles",
    """
SELECT lang,
       quantile_cont(n_tok, 0.5) AS p50_tokens,
       quantile_cont(n_tok, 0.9) AS p90_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'en' WHEN doc_id % 3 = 1 THEN 'de' ELSE 'fr' END AS lang,
         length(text) - length(replace(text, ' ', '')) + 1 AS n_tok
  FROM documents
)
GROUP BY lang
""",
)
def q1_group_quantiles(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    n_tok = (
        F.length("text") - F.length(F.regexp_replace("text", " ", "")) + F.lit(1)
    ).alias("n_tok")
    lang = (
        F.when(F.col("doc_id") % 3 == 0, "en")
        .when(F.col("doc_id") % 3 == 1, "de")
        .otherwise("fr")
        .alias("lang")
    )
    return (
        docs.select(lang, n_tok)
        .groupBy("lang")
        .agg(
            F.percentile("n_tok", F.lit(0.5)).alias("p50_tokens"),
            F.percentile("n_tok", F.lit(0.9)).alias("p90_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# kmeans-trained IVF, EXACT oracle (promoted from rows-only, r3 —
# VERDICT r2 item 5): the trained codebook itself is the fixpoint of an
# iterative distributed Lloyd's loop and is not SQL-expressible, but
# with n_probe = n_centroids every query probes every bucket, so the
# retrieval result degenerates to EXACT brute-force cosine top-k
# regardless of where training placed the centroids — pinnable with the
# same DuckDB list_cosine_similarity oracle as ann_brute_topk.  The
# full pipeline still runs end-to-end (2 Lloyd's iterations: assign
# matmul UDF + posexplode mean shuffle, then bucket assignment, probe
# routing, per-bucket scoring), so the driver row now proves the
# trained path computes the right answer, not just the right row
# count.  The probe-BOUNDED approximate path (n_probe < n_centroids)
# stays covered by ann_ivf_topk's exact oracle (seeded centroids
# re-derived in SQL) and by the recall tests in test_similarity.py.
@q(
    "ann_ivf_trained",
    """
SELECT q_id, vec_id, rank FROM (
  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                    e.vec_id
         ) AS rank
  FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
) WHERE rank <= 5
""",
)
def ann_ivf_trained(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, n_probe=8, train_iters=2
    )
    return out.select("q_id", "vec_id", "rank")


def _g5_aoi(octs):
    """AOI rectangle shared by g5b/g5c: the bbox of the first octagon,
    shifted half a width — cuts through a deterministic subset of
    octagons. Returns None when the table is empty."""
    import numpy as np

    from .. import geometry as geom

    row = octs.orderBy("s_suppkey").first()
    if row is None:
        return None
    ring0 = np.asarray([[c[0], c[1]] for c in row["polygon"][0]])
    mnx, mny, mxx, mxy = geom.bbox(ring0)
    w = mxx - mnx
    return [[
        [mnx + 0.5 * w, mny - 1.0], [mxx + 2.0, mny - 1.0],
        [mxx + 2.0, mxy + 1.0], [mnx + 0.5 * w, mxy + 1.0],
        [mnx + 0.5 * w, mny - 1.0],
    ]]


def _centered_shoelace_udeg2(poly_col, cx, cy):
    """Σ signed shoelace areas over every ring of a MultiRing polygon
    column, coordinates shifted to (cx, cy) before the cross products
    (shifting is load-bearing: shoelace on raw lon/lat cancels ~9
    digits — measured drift drops to ≲0.1 µdeg²). Returns deg²·1e12
    (µdeg²) as an unrounded double. Pure Column expression."""
    return (
        F.aggregate(
            F.transform(
                poly_col,
                lambda ring: F.aggregate(
                    F.zip_with(
                        F.slice(ring, 1, F.size(ring) - 1),
                        F.slice(ring, 2, F.size(ring) - 1),
                        lambda a, b: (a[0] - cx) * (b[1] - cy)
                        - (b[0] - cx) * (a[1] - cy),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        * F.lit(0.5e12)
    )


# g5b closed-form oracle (VERDICT r3 item 6 — the old rows-only trace is
# now exact): the _g5_aoi rectangle's bottom/top/right edges all clear
# every s_suppkey<=60 octagon by construction (y edges are octagon 1's
# bbox ±1° against a 0.14°+0.024° data extent; the right edge is bbox
# +2° against 0.17°+0.052°), so the overlay degenerates to a HALF-PLANE
# cut at x0 = mnx + bbox_w/2 = cx(first octagon) = lon(min suppkey
# ·13+7) — the scalar subquery below, NOT a hard-coded key: supplier
# keys start at 0 in this testdata.  The
# octagon's height profile is 2h for |t|<=w/2 then linear to h at |t|=w
# (t = x − cx), so the area right of the cut is piecewise quadratic in
# u = x0 − cx — closed form, checked continuous at every knot:
#   u<=-w: 3.5hw;  -w..-w/2: 3.5hw − (h/w)(2w+u)(w+u);
#   -w/2..w/2: 1.75hw − 2hu;  w/2..w: (h/w)(2w−u)(w−u);  u>=w: 0.
# Empty pieces are DROPPED by the kernel (clip_polygons contract), so
# the intersection row exists iff u<w and the difference row iff u>-w.
# Rounded to thousands of µdeg² — float drift through the kernel is
# ≲0.1 µdeg² (centered shoelace), and test_g5b_rounding_margin pins
# every true value ≥ tens of µdeg² away from a rounding boundary.
_G5B_SQL = f"""
WITH s AS (
  SELECT s_suppkey,
         {lon_sql('(s_suppkey * 13 + 7)')} AS cx,
         CAST((s_suppkey % 13) + 2 AS DOUBLE) * 0.004 AS w,
         CAST((s_suppkey % 7) + 2 AS DOUBLE) * 0.003 AS h
  FROM supplier WHERE s_suppkey <= 60
), x0 AS (
  SELECT {lon_sql('((SELECT min(s_suppkey) FROM s) * 13 + 7)')} AS x0
), cut AS (
  SELECT s_suppkey, w, h, ((SELECT x0 FROM x0) - cx) AS u FROM s
), a AS (
  SELECT s_suppkey, w, h, u,
    CASE WHEN u <= -w       THEN 3.5 * h * w
         WHEN u <= -w / 2   THEN 3.5 * h * w - (h / w) * (2 * w + u) * (w + u)
         WHEN u <= w / 2    THEN 1.75 * h * w - 2 * h * u
         WHEN u < w         THEN (h / w) * (2 * w - u) * (w - u)
         ELSE 0.0 END AS ainter
  FROM cut
)
SELECT s_suppkey, op, CAST(1 AS INT) AS n_rings,
       CAST(round(area * 1e12, -3) AS BIGINT) AS area_udeg2
FROM (
  SELECT s_suppkey, 'intersection' AS op, ainter AS area FROM a WHERE u < w
  UNION ALL
  SELECT s_suppkey, 'difference' AS op, 3.5 * h * w - ainter AS area
  FROM a WHERE u > -w
)
"""


@q("g5b_polygon_clip", _G5B_SQL)
def g5b_polygon_clip(spark, sf_dir):
    """G5b — boolean overlay (A ∩ clip / A − clip) of the arithmetic
    supplier octagons against the _g5_aoi rectangle, which by
    construction acts as a half-plane cut at x0 = cx(first octagon);
    emits per-(supplier, op) piece areas (µdeg² rounded to thousands)
    + ring count, pinned by the closed-form piecewise-quadratic oracle
    above (EXACT since r4 — was rows-only; VERDICT r3 item 6). Every
    half-plane cut of a convex octagon is one convex ring, so n_rings
    is a kernel-checked constant 1. Conservation twin:
    g5c_clip_conservation; ring/vertex traces stay property-tested in
    test_geometry.py."""
    from ..operators import geoagg

    octs = supplier_octagons(spark, sf_dir).filter(F.col("s_suppkey") <= 60)
    clip = _g5_aoi(octs)
    if clip is None:
        return octs.select(
            F.col("s_suppkey"), F.lit("x").alias("op"),
            F.lit(0).cast("int").alias("n_rings"),
            F.lit(0).cast("long").alias("area_udeg2"),
        ).limit(0)
    cx = lon_col(F.col("s_suppkey") * 13 + 7)
    cy = lat_col(F.col("s_suppkey") * 11 + 5)
    outs = []
    for op in ("intersection", "difference"):
        cut = geoagg.clip_polygons(octs, clip, op=op)
        outs.append(
            cut.select(
                "s_suppkey",
                F.lit(op).alias("op"),
                F.size("polygon").cast("int").alias("n_rings"),
                F.round(_centered_shoelace_udeg2(F.col("polygon"), cx, cy), -3)
                .cast("long")
                .alias("area_udeg2"),
            )
        )
    return outs[0].unionByName(outs[1])


_ROWS_ONLY: dict = {}


# ---- G5c: clip area conservation (exact oracle for the overlay
# kernel — VERDICT r2 item 5) ----
@q(
    "g5c_clip_conservation",
    """
SELECT s_suppkey,
       CAST(round(3.5 * (CAST((s_suppkey % 13) + 2 AS DOUBLE) * 0.004)
                      * (CAST((s_suppkey % 7) + 2 AS DOUBLE) * 0.003)
                      * 1e12, -2) AS BIGINT) AS area_udeg2
FROM supplier WHERE s_suppkey <= 60
""",
)
def g5c_clip_conservation(spark, sf_dir):
    """Area conservation through the boolean-overlay kernel:
    area(A ∩ C) + area(A − C) must equal area(A) exactly. The Spark
    side sums signed shoelace areas over every ring of every clip
    piece; the oracle recomputes area(A) in closed form — the octagon
    is the 2w×2h box minus four half-extent corner cuts, 3.5·w·h —
    which is an exact multiple of 100 µdeg², so rounding to hundreds
    leaves ~50 µdeg² of margin against float drift (measured drift
    ≲0.1 µdeg² with center-shifted shoelace; shifting is load-bearing —
    shoelace on raw lon/lat coordinates cancels ~9 digits).
    Rows-only sibling g5b pins the ring/vertex structure."""
    from ..operators import geoagg

    octs = supplier_octagons(spark, sf_dir).filter(F.col("s_suppkey") <= 60)
    clip = _g5_aoi(octs)
    if clip is None:
        return octs.select(
            "s_suppkey", F.lit(0).cast("long").alias("area_udeg2")
        ).limit(0)

    cx = lon_col(F.col("s_suppkey") * 13 + 7)
    cy = lat_col(F.col("s_suppkey") * 11 + 5)

    pieces = geoagg.clip_polygons(octs, clip, op="intersection").unionByName(
        geoagg.clip_polygons(octs, clip, op="difference")
    )
    return (
        pieces.select(
            "s_suppkey",
            _centered_shoelace_udeg2(F.col("polygon"), cx, cy).alias("_a"),
        )
        .groupBy("s_suppkey")
        .agg(F.round(F.sum("_a"), -2).cast("long").alias("area_udeg2"))
    )


# ---------------------------------------------------------------------------
# image-training batch layout (r4 session 5): aspect bucketing, grouped
# prefix-scan batch packing, cross-modal canonicalization
# ---------------------------------------------------------------------------

# deterministic (w, h) per image, derived from doc_id with the same
# integer-only convention as the geo coordinates: 64·(1 + k·M % 30)
# spans 64..1920 px in both engines bit-identically.
def _img_w_col(key):
    return (F.lit(64) * (F.lit(1) + (key * F.lit(M1)) % F.lit(30))).cast("int")


def _img_h_col(key):
    return (F.lit(64) * (F.lit(1) + (key * F.lit(M2)) % F.lit(30))).cast("int")


def _img_w_sql(key: str) -> str:
    return f"CAST(64 * (1 + ({key} * {M1}) % 30) AS INT)"


def _img_h_sql(key: str) -> str:
    return f"CAST(64 * (1 + ({key} * {M2}) % 30) AS INT)"


def _synth_images(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    return docs.select(
        F.col("doc_id").alias("image_id"),
        _img_w_col(k).alias("w"),
        _img_h_col(k).alias("h"),
    )


_BUCKET_VALUES_SQL = ", ".join(
    f"({i}, {bw}, {bh}, {(bw * 1_000_000) // bh})"
    for i, (bw, bh) in enumerate(multimodal.DEFAULT_ASPECT_BUCKETS)
)

_IMG_SYNTH_SQL = f"""
  SELECT doc_id AS image_id,
         {_img_w_sql('doc_id')} AS w,
         {_img_h_sql('doc_id')} AS h
  FROM documents
"""

# The oracle reformulates the argmin independently: cross join against
# the bucket VALUES list, rank by (|ar_q − bar_q|, idx) — pure int64
# arithmetic on both sides, so ties and boundaries cannot flip.
_ASPECT_BUCKET_SQL = f"""
WITH imgs AS ({_IMG_SYNTH_SQL}),
b(idx, bw, bh, bar) AS (VALUES {_BUCKET_VALUES_SQL}),
ranked AS (
  SELECT image_id, w, h, idx, bw, bh,
         row_number() OVER (
           PARTITION BY image_id
           ORDER BY abs((CAST(w AS BIGINT) * 1000000) // h - bar), idx
         ) AS rn
  FROM imgs CROSS JOIN b
)
SELECT image_id, w, h,
       CAST(idx AS INT) AS bucket_id,
       CAST(bw AS INT) AS bucket_w,
       CAST(bh AS INT) AS bucket_h
FROM ranked WHERE rn = 1
"""


@q("image_aspect_bucket", _ASPECT_BUCKET_SQL)
def image_aspect_bucket(spark, sf_dir):
    """Aspect-ratio bucketing of the (input-hint-shaped) image table —
    the batch-shape-homogeneity prerequisite for image training. The
    Spark side is multimodal.aspect_bucket's codegen array_min argmin;
    the oracle is an independent cross-join + window reformulation."""
    return multimodal.aspect_bucket(_synth_images(spark, sf_dir))


_PACK_BATCHES_SQL = f"""
WITH imgs AS ({_IMG_SYNTH_SQL}),
b(idx, bw, bh, bar) AS (VALUES {_BUCKET_VALUES_SQL}),
ranked AS (
  SELECT image_id, idx,
         row_number() OVER (
           PARTITION BY image_id
           ORDER BY abs((CAST(w AS BIGINT) * 1000000) // h - bar), idx
         ) AS rn
  FROM imgs CROSS JOIN b
), assigned AS (
  SELECT image_id, CAST(idx AS INT) AS bucket_id FROM ranked WHERE rn = 1
), pos AS (
  SELECT image_id, bucket_id,
         row_number() OVER (PARTITION BY bucket_id ORDER BY image_id) - 1 AS rk
  FROM assigned
)
SELECT image_id, bucket_id,
       CAST(rk // 8 AS BIGINT) AS batch_id,
       CAST(rk % 8 AS INT) AS pos_in_batch
FROM pos
"""


@q("image_pack_batches", _PACK_BATCHES_SQL)
def image_pack_batches(spark, sf_dir):
    """Per-bucket training-batch packing via the GROUPED distributed
    prefix scan (scan.grouped_running_total → pack_batches): ~19 huge
    buckets is the low-cardinality regime where Spark's own
    partitioned window would serialize each bucket into one task, so
    the scan's range-shuffle + bounded-collect + map-only-cumsum path
    is the 10^12-image plan. Oracle: the equivalent serial window."""
    out = multimodal.bucketed_batches(
        _synth_images(spark, sf_dir), batch_size=8
    )
    return out.select("image_id", "bucket_id", "batch_id", "pos_in_batch")


# phash synthesis shared in spirit with phash_near_dup (same planted
# group structure: base 64-bit md5 hash of (doc_id % 120), one bit
# flipped at (doc_id % 63) — within-group hamming ∈ {0, 2}); bounded
# to doc_id < 600 so the oracle's brute-force all-pairs + recursive
# closure stays cheap while every group has 5 members at sf ≥ 0.001.
_CROSSMODAL_SQL = """
WITH RECURSIVE ph AS (
  SELECT doc_id AS image_id, text,
         xor(
           (('0x' || substr(md5((doc_id % 120)::VARCHAR), 1, 8))::BIGINT::HUGEINT
              * 4294967296
            + ('0x' || substr(md5((doc_id % 120)::VARCHAR), 9, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5((doc_id % 120)::VARCHAR), 1, 8))::BIGINT
                        >= 2147483648
                   THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT,
           (1::BIGINT << (doc_id % 63))
         ) AS phash
  FROM documents WHERE doc_id < 600
), sym AS (
  SELECT a.image_id AS u, b.image_id AS v
  FROM ph a JOIN ph b ON a.image_id <> b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 2
), reach(a, b) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
), comp AS (
  SELECT a AS image_id, least(a, min(b)) AS component FROM reach GROUP BY a
), assigned AS (
  SELECT p.image_id, p.text,
         CAST(coalesce(c.component, p.image_id) AS BIGINT) AS component
  FROM ph p LEFT JOIN comp c USING (image_id)
), ranked AS (
  SELECT component, image_id, length(text) AS cl,
         row_number() OVER (
           PARTITION BY component ORDER BY length(text) DESC, image_id
         ) AS rn,
         count(*) OVER (PARTITION BY component) AS nm
  FROM assigned
)
SELECT component, image_id AS canonical_id,
       CAST(cl AS INT) AS canonical_caption_len,
       CAST(nm AS BIGINT) AS n_members
FROM ranked WHERE rn = 1
"""


# image-curation composition: the full jobs/curate_images_job.py chain
# re-derived independently — components (recursive CTE), best-caption
# canonical pick, metadata quality filter, aspect bucket, batch pack.
# A hash match pins every drop/keep decision AND the final batch
# layout in one driver row. (Same synthesis as crossmodal_canonical;
# w/h from the _img_*_sql derivation, min-side 128 drops the 64-px
# rows deterministically.)
_CURATE_IMAGES_SQL = f"""
WITH RECURSIVE ph AS (
  SELECT doc_id AS image_id, text,
         {_img_w_sql('doc_id')} AS w,
         {_img_h_sql('doc_id')} AS h,
         xor(
           (('0x' || substr(md5((doc_id % 120)::VARCHAR), 1, 8))::BIGINT::HUGEINT
              * 4294967296
            + ('0x' || substr(md5((doc_id % 120)::VARCHAR), 9, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5((doc_id % 120)::VARCHAR), 1, 8))::BIGINT
                        >= 2147483648
                   THEN 18446744073709551616::HUGEINT ELSE 0::HUGEINT END)::BIGINT,
           (1::BIGINT << (doc_id % 63))
         ) AS phash
  FROM documents WHERE doc_id < 600
), sym AS (
  SELECT a.image_id AS u, b.image_id AS v
  FROM ph a JOIN ph b ON a.image_id <> b.image_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 2
), reach(a, b) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
), assigned AS (
  SELECT p.image_id, p.text, p.w, p.h,
         CAST(coalesce(c.component, p.image_id) AS BIGINT) AS component
  FROM ph p LEFT JOIN (
    SELECT a AS image_id, least(a, min(b)) AS component FROM reach GROUP BY a
  ) c USING (image_id)
), canon AS (
  SELECT image_id, w, h FROM (
    SELECT image_id, w, h,
           row_number() OVER (
             PARTITION BY component ORDER BY length(text) DESC, image_id
           ) AS rn
    FROM assigned
  ) WHERE rn = 1
), clean AS (
  SELECT image_id, w, h FROM canon
  WHERE w >= 128 AND h >= 128
), b(idx, bw, bh, bar) AS (VALUES {_BUCKET_VALUES_SQL}),
bucketed AS (
  SELECT image_id, CAST(idx AS INT) AS bucket_id FROM (
    SELECT image_id, idx,
           row_number() OVER (
             PARTITION BY image_id
             ORDER BY abs((CAST(w AS BIGINT) * 1000000) // h - bar), idx
           ) AS rn
    FROM clean CROSS JOIN b
  ) WHERE rn = 1
), pos AS (
  SELECT image_id, bucket_id,
         row_number() OVER (PARTITION BY bucket_id ORDER BY image_id) - 1 AS rk
  FROM bucketed
)
SELECT image_id, bucket_id,
       CAST(rk // 8 AS BIGINT) AS batch_id,
       CAST(rk % 8 AS INT) AS pos_in_batch
FROM pos
"""


@q("curate_images_pipeline", _CURATE_IMAGES_SQL)
def curate_images_pipeline(spark, sf_dir):
    """END-TO-END image curation composition (the
    jobs/curate_images_job.py chain minus the byte-digest stage, which
    needs real bytes): phash near-dup clustering → best-caption
    canonical survivors → metadata quality filter → aspect bucketing →
    shape-homogeneous batch packing. Every stage runs the real engine
    operator; the oracle re-derives all of it independently in SQL."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    g = (F.col("doc_id") % 120).cast("string")
    hi = F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(g), 9, 8), 16, 10).cast("long")
    k = F.col("doc_id")
    imgs = docs.select(
        F.col("doc_id").alias("image_id"),
        (F.shiftleft(hi, 32) + lo).bitwiseXOR(
            F.expr("shiftleft(cast(1 as bigint), cast(doc_id % 63 as int))")
        ).alias("phash"),
        F.col("text").alias("caption"),
        _img_w_col(k).alias("w"),
        _img_h_col(k).alias("h"),
    )
    canon = multimodal.crossmodal_canonical(
        imgs, max_hamming=2, combos=2
    ).select(F.col("canonical_id").alias("image_id"))
    surv = imgs.join(canon, "image_id", "left_semi")
    clean = surv.filter((F.col("w") >= 128) & (F.col("h") >= 128))
    out = multimodal.bucketed_batches(clean, batch_size=8)
    return out.select("image_id", "bucket_id", "batch_id", "pos_in_batch")


@q("crossmodal_canonical", _CROSSMODAL_SQL)
def crossmodal_canonical(spark, sf_dir):
    """Cross-modal duplicate-cluster canonicalization: banded phash
    near-dup pairs → distributed connected components → best-captioned
    member per cluster (multimodal.crossmodal_canonical). The oracle
    recomputes components via brute-force pairs + recursive-CTE
    closure (the a3b pattern) and the canonical pick via a window —
    fully independent of the banded/star-contraction machinery."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 600)
    g = (F.col("doc_id") % 120).cast("string")
    hi = F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(F.md5(g), 9, 8), 16, 10).cast("long")
    imgs = docs.select(
        F.col("doc_id").alias("image_id"),
        (F.shiftleft(hi, 32) + lo).bitwiseXOR(
            F.expr("shiftleft(cast(1 as bigint), cast(doc_id % 63 as int))")
        ).alias("phash"),
        F.col("text").alias("caption"),
    )
    return multimodal.crossmodal_canonical(imgs, max_hamming=2, combos=2)


# Driver-window rotation: the driver records at most 50 of the 86
# registered queries, in dict order, so the rest lean on selfcheck +
# prior-round driver rows instead of a fresh row.  Round-5 rotation
# (VERDICT r4 item 2): ALL 35 r4-rested queries return to the window
# — the 10 r3-era veterans' second cycle plus the heavy hitters
# (j6_point_in_envelope, j9_tile_assign, j1_multiway_join,
# minhash_lsh_pairs, ann_brute_topk/ann_ivf_topk, simhash_pairs, ...)
# — so no query goes two consecutive rounds unwitnessed.  The tail
# below rests 36 queries that ALL have fresh green rows in
# CORRECTNESS_r04: 25 multi-round-green veterans, plus 11 r4
# first-rowers whose machinery keeps an in-window representative
# (ann_ivf_sq <- ann_brute_topk/ann_ivf_topk return; decontam_ngrams
# <- decontam_bloom's verify join stays; image_aspect_bucket /
# image_pack_batches <- scan_pack_shards runs the same grouped scan;
# j10 <- bench's closed-form j10_box_lattice_1m gate every round +
# j6's envelope machinery returns; j11/j11b/j12 <- j7_point_in_polygon
# returns with the same exact polygon residual; phash_near_dup <-
# simhash_pairs returns on the same signature_near_pairs path;
# text_pii_scrub/text_repetition <- four text veterans return).
# Staying in-window for a second consecutive row: the r4 red rows
# (a15_zonal_stats, r2_raster_pyramid — oracle casts fixed this
# round), the session-8 newcomers (j14/g14/g15/r1/r2), the once-green
# compositions (curate_*, crossmodal_canonical, j13, embed_near_dup_ivf,
# decontam_bloom, scan_pack_shards, tfidf_topk), and the new
# r3_raster_pyramid_full.
_DRIVER_TAIL = [
    # 25 multi-round-green veterans (r4 row + >=1 earlier round)
    "a10_nested_collect",
    "a12_union_all",
    "a13_cell_rollup",
    "a14_cube",
    "a3_dissolve",
    "a3b_dissolve_components",
    "a4_distinct",
    "a5_first_per_key",
    "a6_argmax",
    "ann_ivf_trained",
    "dedup_clusters",
    "f2_semi_join",
    "g11_hex_format",
    "g2_simplify_rdp",
    "g5b_polygon_clip",
    "g5c_clip_conservation",
    "j3_left_join",
    "j4_ordered_lookup",
    "j8_knn",
    "kmv_distinct",
    "o2_toposort",
    "q1_group_quantiles",
    "s11_session_window",
    "s7_filenames",
    "text_stopword_ratio",
    # 11 r4 first-rowers with in-window family coverage (see above)
    "ann_ivf_sq",
    "decontam_ngrams",
    "image_aspect_bucket",
    "image_pack_batches",
    "j10_box_join",
    "j11_polygon_join",
    "j11b_polygon_join_convex",
    "j12_line_polygon_join",
    "phash_near_dup",
    "text_pii_scrub",
    "text_repetition",
]


def _rotated(names):
    head = [n for n in names if n not in _DRIVER_TAIL]
    return head + [n for n in _DRIVER_TAIL if n in names]


def all_queries():
    out = {name: fn for name, (fn, _sql) in _QUERIES.items()}
    out.update(_ROWS_ONLY)
    return {n: out[n] for n in _rotated(list(out))}


def all_oracle_sql():
    out = {name: sql for name, (fn, sql) in _QUERIES.items() if sql is not None}
    return {n: out[n] for n in _rotated(list(out))}


# ---------------------------------------------------------------------------
# coverage round 2: J7, A2, A8, A9, J4, G1 with SQL oracles;
# O2/G2/G3/A3 as rows-only geometry-kernel checks
# ---------------------------------------------------------------------------


def supplier_octagons(spark, sf_dir):
    """Convex octagon per supplier with *rational-arithmetic* vertices
    (no trig — bit-identical in Spark and DuckDB). Same centers/extents
    as supplier_boxes; corners cut at half-extent, so containment is
    exactly {|dx|<=w, |dy|<=h, |dx|/w+|dy|/h<=1.5}."""
    s = _t(spark, sf_dir, "supplier")
    cx = lon_col(F.col("s_suppkey") * 13 + 7)
    cy = lat_col(F.col("s_suppkey") * 11 + 5)
    w = ((F.col("s_suppkey") % 13) + 2).cast("double") * F.lit(0.004)
    h = ((F.col("s_suppkey") % 7) + 2).cast("double") * F.lit(0.003)
    w2, h2 = w * 0.5, h * 0.5

    def pt(x, y):
        return F.array(x, y)

    ring = F.array(
        pt(cx + w, cy - h2), pt(cx + w, cy + h2), pt(cx + w2, cy + h),
        pt(cx - w2, cy + h), pt(cx - w, cy + h2), pt(cx - w, cy - h2),
        pt(cx - w2, cy - h), pt(cx + w2, cy - h), pt(cx + w, cy - h2),
    )
    return s.select("s_suppkey", F.array(ring).alias("polygon"))


# ---- J7: exact point-in-polygon join (cell cover + ray-cast residual) ----
@q(
    "j7_point_in_polygon",
    f"""
WITH polys AS (
  SELECT s_suppkey,
         {lon_sql('(s_suppkey * 13 + 7)')} AS cx,
         {lat_sql('(s_suppkey * 11 + 5)')} AS cy,
         CAST((s_suppkey % 13) + 2 AS DOUBLE) * 0.004 AS w,
         CAST((s_suppkey % 7) + 2 AS DOUBLE) * 0.003 AS h
  FROM supplier
)
SELECT c_custkey AS custkey, s_suppkey AS suppkey
FROM ({CUSTOMER_POINTS_SQL}) p JOIN polys b
  ON abs(p.lon - b.cx) <= b.w
 AND abs(p.lat - b.cy) <= b.h
 AND abs(p.lon - b.cx) / b.w + abs(p.lat - b.cy) / b.h <= 1.5
""",
)
def j7_point_in_polygon(spark, sf_dir):
    pts = customer_points(spark, sf_dir)
    polys = supplier_octagons(spark, sf_dir)
    joined = spatial.point_in_polygon_join(pts, polys, res=CELL_RES)
    return joined.select(F.col("c_custkey").alias("custkey"), F.col("s_suppkey").alias("suppkey"))


# ---- A2: distributed convex hull; oracle = n^3 hull-vertex characterization ----
@q(
    "a2_convex_hull",
    f"""
WITH pts AS (
  SELECT c_custkey,
         lon + CAST((c_custkey * c_custkey * 7919) % 997 AS DOUBLE) / 1e10 AS lon,
         lat + CAST((c_custkey * c_custkey * 6271) % 991 AS DOUBLE) / 1e10 AS lat
  FROM ({CUSTOMER_POINTS_SQL}) WHERE c_custkey <= 300
)
SELECT DISTINCT p.c_custkey AS custkey
FROM pts p JOIN pts q ON q.c_custkey <> p.c_custkey
WHERE NOT EXISTS (
  SELECT 1 FROM pts r
  WHERE (q.lon - p.lon) * (r.lat - p.lat) - (q.lat - p.lat) * (r.lon - p.lon) < 0
)
""",
)
def a2_convex_hull(spark, sf_dir):
    """Engine hull (partial monotone chain per batch + final merge);
    hull vertex coords are input coords verbatim, so mapping back to
    custkey by exact double equality is lossless. The oracle is the
    independent O(n^3) characterization: p is a hull vertex iff some
    directed edge p->q has every point on its left.

    The base derivation is a rational lattice, which produces exactly
    collinear triples — the SQL characterization keeps an on-edge
    point, Andrew's monotone chain (correctly) drops it. A key-squared
    jitter at 1e-10 deg puts the points in general position (identical
    integer arithmetic both engines)."""
    from ..operators import geoagg

    base = customer_points(spark, sf_dir).filter(F.col("c_custkey") <= 300)
    k = F.col("c_custkey")
    pts = base.select(
        "c_custkey",
        (F.col("lon") + ((k * k * 7919) % 997).cast("double") / F.lit(1e10)).alias("lon"),
        (F.col("lat") + ((k * k * 6271) % 991).cast("double") / F.lit(1e10)).alias("lat"),
    )
    hull = geoagg.convex_hull_agg(pts, lon_col="lon", lat_col="lat")
    if hull is None:
        return pts.select(F.col("c_custkey").alias("custkey")).limit(0)
    verts = spark.createDataFrame(
        [(float(x), float(y)) for x, y in hull[:-1]], schema="hlon double, hlat double"
    )
    return (
        pts.join(broadcast(verts), (F.col("lon") == F.col("hlon")) & (F.col("lat") == F.col("hlat")))
        .select(F.col("c_custkey").alias("custkey"))
        .distinct()
    )


# ---- A8/O1: window-ordered LineString assembly, verified point-by-point ----
@q(
    "a8_linestring_assembly",
    f"""
SELECT l_orderkey AS shape_key,
       CAST(row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, lon, lat) - 1 AS BIGINT) AS pos,
       lon, lat
FROM (
  SELECT l_orderkey, l_linenumber,
         {lon_sql('(l_orderkey * 29 + l_linenumber * 3)')} AS lon,
         {lat_sql('(l_orderkey * 29 + l_linenumber * 3)')} AS lat
  FROM lineitem
)
""",
)
def a8_linestring_assembly(spark, sf_dir):
    """Engine A8 operator (relational.shape_linestrings: sort_array of
    struct(seq, coord) — no wide sort), then posexplode back to rows so
    the oracle can pin every coordinate's position."""
    from ..operators import relational

    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 29 + F.col("l_linenumber") * 3
    shapes = li.select(
        F.col("l_orderkey").alias("shape_id"),
        F.col("l_linenumber").alias("shape_pt_sequence"),
        lon_col(key).alias("shape_pt_lon"),
        lat_col(key).alias("shape_pt_lat"),
    )
    ls = relational.shape_linestrings(shapes)
    return ls.select(
        F.col("shape_id").alias("shape_key"),
        F.posexplode("coordinates").alias("pos", "coord"),
    ).select(
        "shape_key",
        F.col("pos").cast("long").alias("pos"),
        F.col("coord")[0].alias("lon"),
        F.col("coord")[1].alias("lat"),
    )


# ---- A9: MultiLineString per route (two-level ordered assembly) ----
@q(
    "a9_multilinestring",
    """
SELECT o_custkey AS custkey,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_lines,
       CAST(count(*) AS BIGINT) AS n_points
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
""",
)
def a9_multilinestring(spark, sf_dir):
    """Second-level assembly: per-shape LineStrings (A8) collected into
    one MultiLineString per route analog (custkey), sorted by shape key
    for determinism — the structure sizes are the verifiable surface."""
    from ..operators import relational

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    key = F.col("l_orderkey") * 29 + F.col("l_linenumber") * 3
    shapes = li.select(
        F.col("l_orderkey").alias("shape_id"),
        F.col("l_linenumber").alias("shape_pt_sequence"),
        lon_col(key).alias("shape_pt_lon"),
        lat_col(key).alias("shape_pt_lat"),
    )
    ls = relational.shape_linestrings(shapes)
    per_route = (
        ls.join(broadcast(o.select(F.col("o_orderkey").alias("shape_id"), "o_custkey")), "shape_id")
        .groupBy("o_custkey")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("shape_id"), F.col("coordinates").alias("c")))),
                lambda x: x["c"],
            ).alias("multiline")
        )
    )
    return per_route.select(
        F.col("o_custkey").alias("custkey"),
        F.size("multiline").cast("long").alias("n_lines"),
        F.size(F.flatten("multiline")).cast("long").alias("n_points"),
    )


# ---- J4: position-preserving ordered id-list lookup ----
@q(
    "j4_ordered_lookup",
    """
SELECT l_orderkey AS orderkey,
       string_agg(p_name, '|' ORDER BY l_linenumber, l_partkey) AS name_chain
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY l_orderkey
""",
)
def j4_ordered_lookup(spark, sf_dir):
    """orderedStopIds.map(id => stops.find(...)) analog
    (geojson-utils.ts:235-237): assemble the ordered id list, posexplode,
    equi-join the dimension, re-assemble by position."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    ordered = li.groupBy("l_orderkey").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("l_linenumber").alias("n"), F.col("l_partkey").alias("pk")))
            ),
            lambda x: x["pk"],
        ).alias("pks")
    )
    pe = ordered.select("l_orderkey", F.posexplode("pks").alias("pos", "p_partkey"))
    looked = pe.join(broadcast(part.select("p_partkey", "p_name")), "p_partkey")
    return looked.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.concat_ws(
            "|",
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("p_name").alias("nm")))),
                lambda x: x["nm"],
            ),
        ).alias("name_chain")
    )


# ---- G1: coordinate rounding at precision ----
@q(
    "g1_round_coords",
    f"""
SELECT c_custkey AS custkey,
       floor({lon_sql('c_custkey')} * 100000 + 0.5) / 100000 AS lon5,
       floor({lat_sql('c_custkey')} * 100000 + 0.5) / 100000 AS lat5
FROM customer
""",
)
def g1_round_coords(spark, sf_dir):
    """G1 coordinate truncation with the reference's exact semantic:
    turf truncate uses JS Math.round = floor(x*10^p + 0.5)/10^p (half
    toward +inf). floor/multiply/add are bit-deterministic doubles in
    both engines, unlike engine-native round() whose tie-handling
    differs (Spark BigDecimal HALF_UP vs DuckDB float rounding) on the
    exact decimal ties this lattice derivation produces."""
    pts = customer_points(spark, sf_dir)
    p10 = F.lit(100000.0)
    return pts.select(
        F.col("c_custkey").alias("custkey"),
        (F.floor(F.col("lon") * p10 + F.lit(0.5)) / p10).alias("lon5"),
        (F.floor(F.col("lat") * p10 + F.lit(0.5)) / p10).alias("lat5"),
    )


# ---- O2: toposort, EXACT oracle (promoted from rows-only, r2) ----
# The Python kernel is Kahn's algorithm with a min-heap (lexicographic
# smallest ready node first) and a longest-trip cycle fallback. The
# DuckDB twin is a recursive-CTE state machine: one row per route
# carrying the visited list; each iteration appends the MINIMUM
# unvisited node all of whose predecessors are visited — provably the
# same order as heap-Kahn (a node's remaining indegree is zero iff all
# its predecessors are visited). Recursion stalls on a cycle; routes
# whose walk is shorter than their node count fall back to the longest
# trip (ties → smallest trip_id), exactly like the kernel.
_O2_BASE = """
  SELECT DISTINCT (o.o_custkey % 20) AS route_key,
         CAST(l.l_orderkey AS VARCHAR) AS trip_id,
         l.l_linenumber AS stop_sequence,
         CAST(l.l_partkey AS VARCHAR) AS stop_id
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_custkey <= 60
"""


@q(
    "o2_toposort",
    f"""
WITH RECURSIVE st AS ({_O2_BASE}),
tord AS (
  SELECT route_key, trip_id,
         list(stop_id ORDER BY stop_sequence, stop_id) AS stops
  FROM st GROUP BY route_key, trip_id
),
edges AS (
  SELECT DISTINCT route_key, a, b FROM (
    SELECT route_key, stops[i] AS a, stops[i+1] AS b
    FROM tord, unnest(range(1, len(stops))) AS t(i)
  ) WHERE a <> b
),
nodes AS (SELECT DISTINCT route_key, stop_id FROM st),
ncnt AS (SELECT route_key, count(*) AS n FROM nodes GROUP BY route_key),
walk(route_key, visited) AS (
  SELECT route_key, CAST([] AS VARCHAR[]) FROM ncnt
  UNION ALL
  SELECT route_key, list_append(visited, nxt) FROM (
    SELECT w.route_key, w.visited, (
        SELECT min(n.stop_id) FROM nodes n
        WHERE n.route_key = w.route_key
          AND NOT list_contains(w.visited, n.stop_id)
          AND NOT EXISTS (
            SELECT 1 FROM edges e
            WHERE e.route_key = w.route_key AND e.b = n.stop_id
              AND NOT list_contains(w.visited, e.a)
          )
    ) AS nxt
    FROM walk w
  ) WHERE nxt IS NOT NULL
),
best AS (
  SELECT route_key, visited,
         row_number() OVER (PARTITION BY route_key ORDER BY len(visited) DESC) AS rk
  FROM walk
),
acyclic AS (
  SELECT b.route_key, b.visited FROM best b JOIN ncnt c USING (route_key)
  WHERE b.rk = 1 AND len(b.visited) = c.n
),
cyc AS (
  SELECT b.route_key FROM best b JOIN ncnt c USING (route_key)
  WHERE b.rk = 1 AND len(b.visited) < c.n
),
fb AS (
  SELECT route_key, stops AS visited FROM (
    SELECT t.route_key, t.stops,
           row_number() OVER (PARTITION BY t.route_key
                              ORDER BY len(t.stops) DESC, t.trip_id ASC) AS rk
    FROM tord t JOIN cyc USING (route_key)
  ) WHERE rk = 1
),
final AS (SELECT * FROM acyclic UNION ALL SELECT * FROM fb)
SELECT route_key, CAST(i - 1 AS BIGINT) AS pos, visited[i] AS stop_key
FROM final, unnest(range(1, len(visited) + 1)) AS t(i)
""",
)
def o2_toposort(spark, sf_dir):
    """O2 — deterministic Kahn toposort of a stop graph synthesized
    from lineitem (route = custkey band, trip = order, stop = part),
    cycle fallback to the longest trip. Emits (route_key, pos,
    stop_key). Rows deduped first: the synthetic lineitem repeats
    (l_orderkey, l_linenumber) pairs, and both engines must see the
    same multiset."""
    import pandas as pd  # noqa: F811

    from ..operators.relational import _toposort_stop_order

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    st = (
        li.join(o.select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey"), "l_orderkey")
        .filter(F.col("o_custkey") <= 60)
        .select(
            (F.col("o_custkey") % 20).alias("route_key"),
            F.col("l_orderkey").cast("string").alias("trip_id"),
            F.col("l_linenumber").alias("stop_sequence"),
            F.col("l_partkey").cast("string").alias("stop_id"),
        )
        .dropDuplicates(["route_key", "trip_id", "stop_sequence", "stop_id"])
    )

    def kernel(key, pdf):
        order = _toposort_stop_order(pdf)
        return pd.DataFrame(
            {"route_key": key[0], "pos": range(len(order)), "stop_key": order}
        )

    return st.groupBy("route_key").applyInPandas(
        kernel, "route_key long, pos long, stop_key string"
    )


# The n-gon's per-step factors (meters·cos a, meters·sin a / m-per-deg)
# are Python-computed constants embedded VERBATIM (repr → shortest
# round-trip float) in both the Spark plan (F.lit) and the SQL text, so
# no cross-engine trig parity is needed for them; only cos(radians(lat))
# is evaluated on data in both engines, and its ≤1-ulp libm difference
# vanishes under the 1e-6 rounding.
def _g3_angle_rows(meters: float = 400.0, steps: int = 32) -> str:
    import math as _m

    rows = []
    for pos, a in enumerate([2.0 * _m.pi * i / steps for i in range(steps)] + [0.0]):
        rows.append(
            f"({pos}, {repr(meters * _m.cos(a))}, "
            f"{repr(meters * _m.sin(a) / 111320.0)})"
        )
    return ", ".join(rows)


@q(
    "g3_point_buffer",
    f"""
WITH ang(pos, dx_m, dy_deg) AS (VALUES {_g3_angle_rows()}),
sp AS (
  SELECT s_suppkey, t_lon, t_lat,
         greatest(cos(radians(t_lat)), 1e-9) * 111320.0 AS sx
  FROM ({SUPPLIER_POINTS_SQL})
)
SELECT s_suppkey, CAST(pos AS BIGINT) AS pos,
       round(t_lon + dx_m / sx, 6) AS v_lon,
       round(t_lat + dy_deg, 6) AS v_lat
FROM sp CROSS JOIN ang
""",
)
def g3_point_buffer(spark, sf_dir):
    """G3 — geodesic point-buffer n-gon (pure Column, no Python):
    ring vertices for supplier points at 400 m."""
    from ..operators import geoagg

    s = supplier_points(spark, sf_dir)
    ring = geoagg.stop_buffer_ring_col(F.col("t_lat"), F.col("t_lon"), 400.0, steps=32)
    return s.select("s_suppkey", F.posexplode(ring).alias("pos", "vertex")).select(
        "s_suppkey",
        F.col("pos").cast("long").alias("pos"),
        F.round(F.col("vertex")[0], 6).alias("v_lon"),
        F.round(F.col("vertex")[1], 6).alias("v_lat"),
    )


# ---- G2: RDP simplify, EXACT oracle (promoted from rows-only, r2) ----
# The DuckDB twin re-derives Douglas–Peucker with a recursive CTE over
# (shape_key, i, j) segments: each iteration finds the max-distance
# interior vertex (first index on ties — numpy argmax), splits when
# d > tol, and the survivor set is exactly the union of all segment
# endpoints. Distance = clamped-projection segment distance, the same
# arithmetic as geometry.rdp_mask. The lattice-derived points are in
# general position, so no distance sits near the tolerance and no
# argmax ties occur — FP-safe across engines (verified at 3 SFs).
_G2_KEY = "(l_orderkey * 29 + l_linenumber * 3)"
_G2_TOL = 0.001  # 1/10^3 — simplify_lines_udf(precision=3)
_G2_D = (
    "CASE WHEN (b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y) = 0.0 "
    "THEN sqrt((p.x-a.x)*(p.x-a.x)+(p.y-a.y)*(p.y-a.y)) "
    "ELSE sqrt("
    "(p.x-(a.x+least(greatest(((p.x-a.x)*(b.x-a.x)+(p.y-a.y)*(b.y-a.y))/((b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y)),0.0),1.0)*(b.x-a.x)))"
    "*(p.x-(a.x+least(greatest(((p.x-a.x)*(b.x-a.x)+(p.y-a.y)*(b.y-a.y))/((b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y)),0.0),1.0)*(b.x-a.x)))"
    "+"
    "(p.y-(a.y+least(greatest(((p.x-a.x)*(b.x-a.x)+(p.y-a.y)*(b.y-a.y))/((b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y)),0.0),1.0)*(b.y-a.y)))"
    "*(p.y-(a.y+least(greatest(((p.x-a.x)*(b.x-a.x)+(p.y-a.y)*(b.y-a.y))/((b.x-a.x)*(b.x-a.x)+(b.y-a.y)*(b.y-a.y)),0.0),1.0)*(b.y-a.y)))"
    ") END"
)


@q(
    "g2_simplify_rdp",
    f"""
WITH RECURSIVE pts AS (
  SELECT shape_key,
         CAST(row_number() OVER (PARTITION BY shape_key ORDER BY seq) - 1 AS BIGINT) AS idx,
         x, y
  FROM (
    SELECT DISTINCT l_orderkey AS shape_key, l_linenumber AS seq,
           {lon_sql(_G2_KEY)} AS x, {lat_sql(_G2_KEY)} AS y
    FROM lineitem
  )
), nn AS (SELECT shape_key, count(*) AS n FROM pts GROUP BY shape_key),
seg(shape_key, i, j) AS (
  SELECT shape_key, CAST(0 AS BIGINT), n - 1 FROM nn WHERE n >= 2
  UNION ALL
  SELECT u.shape_key,
         CASE WHEN u.side = 0 THEN u.i ELSE u.m END,
         CASE WHEN u.side = 0 THEN u.m ELSE u.j END
  FROM (
    SELECT w.shape_key, w.i, w.j, w.m, sides.side
    FROM (
      SELECT shape_key, i, j, m, d,
             row_number() OVER (PARTITION BY shape_key, i, j ORDER BY d DESC, m ASC) AS rk
      FROM (
        SELECT s.shape_key, s.i, s.j, p.idx AS m, {_G2_D} AS d
        FROM seg s
        JOIN pts a ON a.shape_key = s.shape_key AND a.idx = s.i
        JOIN pts b ON b.shape_key = s.shape_key AND b.idx = s.j
        JOIN pts p ON p.shape_key = s.shape_key AND p.idx > s.i AND p.idx < s.j
      )
    ) w CROSS JOIN (SELECT 0 AS side UNION ALL SELECT 1) sides
    WHERE w.rk = 1 AND w.d > {_G2_TOL}
  ) u
)
SELECT shape_key, kept_idx FROM (
  SELECT shape_key, i AS kept_idx FROM seg
  UNION
  SELECT shape_key, j FROM seg
  UNION
  SELECT p.shape_key, p.idx FROM pts p JOIN nn ON nn.shape_key = p.shape_key AND nn.n = 1
)
""",
)
def g2_simplify_rdp(spark, sf_dir):
    """G2 — RDP simplify: surviving vertex INDICES per lattice-derived
    per-order line, via the product kernel (geometry.rdp_mask in a
    grouped pandas UDF). Distinct (key, seq) first — duplicate
    synthetic rows carry identical derived coordinates."""
    import pandas as pd  # noqa: F811

    from .. import geometry as geom_mod

    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 29 + F.col("l_linenumber") * 3
    pts = (
        li.select(
            F.col("l_orderkey").alias("shape_key"),
            F.col("l_linenumber").alias("seq"),
            lon_col(key).alias("x"),
            lat_col(key).alias("y"),
        )
        .dropDuplicates(["shape_key", "seq"])
    )

    def kernel(gkey, pdf):
        import numpy as np  # noqa: F811

        pdf = pdf.sort_values("seq")
        arr = pdf[["x", "y"]].to_numpy(dtype=np.float64)
        if len(arr) <= 2:
            idx = np.arange(len(arr))
        else:
            idx = np.nonzero(geom_mod.rdp_mask(arr, _G2_TOL))[0]
        return pd.DataFrame({"shape_key": gkey[0], "kept_idx": idx})

    return pts.groupBy("shape_key").applyInPandas(
        kernel, "shape_key long, kept_idx long"
    )


# a3_dissolve's exact oracle (VERDICT r3 item 6 — was rows-only): the
# same recursive-CTE transitive closure as a3b_dissolve_components.
# Shared because the two queries pin the SAME invariant through two
# DIFFERENT Spark paths: a3b derives components from the overlap EDGE
# set via the distributed connected-components operator; a3_dissolve
# derives them from the GEOMETRY — run the buffer-union dissolve
# kernel, then assign each supplier center to its containing dissolved
# blob (ray-cast), so a kernel that wrongly merges or splits blobs
# diverges from the oracle even when a3b stays green.
_A3_COMPONENTS_SQL = f"""
WITH RECURSIVE pts AS (
  SELECT s_suppkey, t_lon, t_lat FROM ({SUPPLIER_POINTS_SQL}) sp
  WHERE s_suppkey <= 40
), sym AS (
  SELECT a.s_suppkey AS u, b.s_suppkey AS v
  FROM pts a JOIN pts b ON a.s_suppkey <> b.s_suppkey
  WHERE 2.0 * 6371008.8 * asin(sqrt(least(
          pow(sin(radians(b.t_lat - a.t_lat) / 2), 2)
          + cos(radians(a.t_lat)) * cos(radians(b.t_lat))
            * pow(sin(radians(b.t_lon - a.t_lon) / 2), 2),
          1.0))) <= 800.0
), reach(a, b) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
), comp AS (
  SELECT a AS s_suppkey, least(a, min(b)) AS component FROM reach GROUP BY a
), assigned AS (
  SELECT p.s_suppkey,
         CAST(coalesce(c.component, p.s_suppkey) AS BIGINT) AS component
  FROM pts p LEFT JOIN comp c USING (s_suppkey)
)
SELECT s_suppkey, component,
       CAST(count(*) OVER (PARTITION BY component) AS BIGINT) AS n_members
FROM assigned
"""


@q("a3_dissolve", _A3_COMPONENTS_SQL)
def a3_dissolve(spark, sf_dir):
    """A3/G5 — distributed buffer-union dissolve over supplier-point
    buffers (per-cell union kernel + tree merge), made EXACT (r4,
    VERDICT r3 item 6) by reading the component structure back off the
    dissolved geometry: every supplier center lies inside exactly one
    dissolved blob, so (member -> min member id, member count) per blob
    must equal the transitive closure of the circle-overlap graph —
    the recursive-CTE oracle above. The dissolve itself and the
    membership ray-casts run through the geometry kernels; only the
    bounded (<=40 supplier) membership table is assembled driver-side.
    The 16-gon buffer underestimates the 400 m circle by cos(pi/16)
    (~392 m inradius), so a center pair in (784.6 m, 800 m] could
    overlap as circles but not as polygons — the deterministic
    supplier layout has no pair in that band (pinned alongside the
    rounding margins in tests/test_oracle_invariants.py).
    Ring/vertex traces of the dissolved parts stay pinned by
    test_geoagg_dissolve_components and the geometry property tests."""
    import numpy as np

    from .. import geometry as geom
    from ..operators import geoagg

    s = supplier_points(spark, sf_dir).filter(F.col("s_suppkey") <= 40)
    ring = geoagg.stop_buffer_ring_col(F.col("t_lat"), F.col("t_lon"), 400.0, steps=16)
    polys = s.select(F.array(ring).alias("polygon"))
    parts = geoagg.dissolve_polygons(polys, poly_col="polygon", cell_res=10)
    centers = s.select("s_suppkey", "t_lon", "t_lat").collect()  # bounded <=40
    schema = "s_suppkey long, component long, n_members long"
    if not centers:
        return spark.createDataFrame([], schema=schema)
    members: dict[int, list[int]] = {}
    for r in centers:
        hit = -1  # "in no blob" stays visible as component -1 -> loud mismatch
        for pi, poly in enumerate(parts):
            rings = [np.asarray(rg, dtype=np.float64) for rg in poly]
            if bool(
                geom.points_in_polygon(
                    np.asarray([r["t_lon"]]), np.asarray([r["t_lat"]]), rings
                )[0]
            ):
                hit = pi
                break
        members.setdefault(hit, []).append(int(r["s_suppkey"]))
    rows = []
    for pi, ks in members.items():
        comp = min(ks) if pi >= 0 else -1
        for k in ks:
            rows.append((k, comp, len(ks)))
    return spark.createDataFrame(rows, schema=schema)


# ---------------------------------------------------------------------------
# coverage round 3: event-stream operators re-expressed as batch
# (tumbling window, sessionization, JSON extraction) over the events
# table — the batch twins of streaming/stream_assign.py's windowed agg
# ---------------------------------------------------------------------------


# ---- W1: tumbling-window aggregation (streaming windowed agg, batch twin) ----
@q(
    "w1_tumbling_window",
    """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start, event_type,
       count(*) AS n_events,
       round(CAST(sum(value) AS DOUBLE), 4) AS sum_value
FROM events
GROUP BY 1, 2
""",
)
def w1_tumbling_window(spark, sf_dir):
    # win_start emitted as a formatted string — timestamp columns are
    # the one type whose serialization differs across compare harnesses
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.window("ts", "1 hour").start, "yyyy-MM-dd HH:mm:ss").alias(
                "win_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value").cast("double"), 4).alias("sum_value"),
        )
    )


# ---- W2: sessionization (30-min inactivity gap per user) ----
@q(
    "w2_sessionize",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events, min(event_id) AS first_event
FROM numbered GROUP BY user_id, session_no
""",
)
def w2_sessionize(spark, sf_dir):
    """Session windows via lag + cumulative flag-sum — the batch
    formulation of streaming session_window; gap compares integer
    microseconds (unix_micros/epoch_us) so the boundary is exact in
    both engines."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # parquet reads as TIMESTAMP_NTZ
    flagged = ev.withColumn(
        "new_sess",
        F.when(
            F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) > 1800 * 1_000_000),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return numbered.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("first_event"),
    )


# ---- G13: JSON property extraction ----
@q(
    "g13_json_extract",
    """
SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
       count(*) AS n
FROM events
GROUP BY 1, 2
""",
)
def g13_json_extract(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        (F.get_json_object("props", "$.k").cast("int") % 10).alias("k_bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# coverage round 4: k>1 kNN, within-radius join, stopword ratio
# ---------------------------------------------------------------------------


# ---- J8b: kNN with k=3 (multi-neighbor ranking path) ----
@q(
    "j8b_knn3",
    f"""
SELECT c_custkey AS custkey, s_suppkey AS suppkey, CAST(rn AS INT) AS rank FROM (
  SELECT c_custkey, s_suppkey,
         row_number() OVER (
           PARTITION BY c_custkey
           ORDER BY 2.0 * 6371008.8 * asin(sqrt(least(
             pow(sin(radians(t_lat - lat) / 2), 2)
             + cos(radians(lat)) * cos(radians(t_lat)) * pow(sin(radians(t_lon - lon) / 2), 2),
             1.0))), s_suppkey
         ) AS rn
  FROM ({CUSTOMER_POINTS_SQL}) p CROSS JOIN ({SUPPLIER_POINTS_SQL}) t
) WHERE rn <= 3
""",
)
def j8b_knn3(spark, sf_dir):
    pts = customer_points(spark, sf_dir)
    tgt = supplier_points(spark, sf_dir)
    out = spatial.knn_join(
        pts, tgt, res=CELL_RES, k=3,
        point_key="c_custkey", target_key="s_suppkey",
    )
    w = Window.partitionBy("c_custkey").orderBy(F.asc("_dist_m"), F.asc("s_suppkey"))
    return out.withColumn("rank", F.row_number().over(w)).select(
        F.col("c_custkey").alias("custkey"),
        F.col("s_suppkey").alias("suppkey"),
        F.col("rank").cast("int").alias("rank"),
    )


# ---- J6b: within-radius spatial join (distance theta join) ----
@q(
    "j6b_radius_join",
    f"""
SELECT c_custkey AS custkey, s_suppkey AS suppkey
FROM ({CUSTOMER_POINTS_SQL}) p CROSS JOIN ({SUPPLIER_POINTS_SQL}) t
WHERE 2.0 * 6371008.8 * asin(sqrt(least(
        pow(sin(radians(t_lat - lat) / 2), 2)
        + cos(radians(lat)) * cos(radians(t_lat)) * pow(sin(radians(t_lon - lon) / 2), 2),
        1.0))) <= 2500.0
""",
)
def j6b_radius_join(spark, sf_dir):
    """Within-2500m join: k-ring cell-cover equi-prejoin (ring sized
    from the radius and cell extent at the data's latitude) + exact
    haversine residual — the distance-join sibling of J6. The oracle
    is the brute-force cross join with the identical formula (both
    engines evaluate IEEE sin/cos; the boundary set is measure-zero)."""
    import math

    from .. import geometry as geom
    from ..functions.geo import haversine_m

    res = CELL_RES
    n = 1 << res
    radius_m = 2500.0
    # cell height in meters; ring count that guarantees coverage
    cell_h_m = 180.0 / n * geom.EARTH_M_PER_DEG_LAT
    max_lat = LAT0 + LAT_SPAN
    # cells.py grid is n x n: columns are 360/n lon-degrees wide
    # (narrowest in meters at the data's max latitude)
    cell_w_m = 360.0 / n * geom.EARTH_M_PER_DEG_LAT * math.cos(math.radians(max_lat))
    ring = max(1, math.ceil(radius_m / min(cell_h_m, cell_w_m)))

    pts = customer_points(spark, sf_dir)
    tgt = supplier_points(spark, sf_dir).withColumn(
        "_tcell", cells.cell_col(F.col("t_lat"), F.col("t_lon"), res)
    )
    px, py = cells.xy_col(F.col("lat"), F.col("lon"), res)
    cand_cells = _ring_cand_cells(px, py, ring, res, n)
    probe = pts.withColumn("_tcell", F.explode(cand_cells))
    joined = probe.join(broadcast(tgt), "_tcell")
    return (
        joined.filter(
            haversine_m(F.col("lat"), F.col("lon"), F.col("t_lat"), F.col("t_lon"))
            <= F.lit(radius_m)
        )
        .select(F.col("c_custkey").alias("custkey"), F.col("s_suppkey").alias("suppkey"))
        .distinct()
    )


# ---- A3b: dissolve component structure (edge-set path — the same
# invariant as a3_dissolve, derived via connected components instead
# of the geometry kernel; shared oracle _A3_COMPONENTS_SQL) ----
@q("a3b_dissolve_components", _A3_COMPONENTS_SQL)
def a3b_dissolve_components(spark, sf_dir):
    """Component structure of the a3_dissolve input under the circle
    model: suppliers whose 400 m buffer circles overlap (center
    distance <= 800 m) belong to one dissolved blob. Edges come from
    the same cell-cover + haversine-residual self-join as
    j6b_radius_join; components from the distributed large-star/
    small-star operator. The component COUNT equals the dissolve
    kernel's polygon count away from polygon/circle tangency (pinned
    by test_geoagg_dissolve_components), making this the exact-oracle
    invariant for the rows-only a3_dissolve."""
    import math

    from .. import geometry as geom

    res = CELL_RES
    n = 1 << res
    radius_m = 800.0
    cell_h_m = 180.0 / n * geom.EARTH_M_PER_DEG_LAT
    max_lat = LAT0 + LAT_SPAN
    # cells.py grid is n x n: columns are 360/n lon-degrees wide
    # (narrowest in meters at the data's max latitude)
    cell_w_m = 360.0 / n * geom.EARTH_M_PER_DEG_LAT * math.cos(math.radians(max_lat))
    ring = max(1, math.ceil(radius_m / min(cell_h_m, cell_w_m)))

    s = supplier_points(spark, sf_dir).filter(F.col("s_suppkey") <= 40)
    tgt = s.select(
        F.col("s_suppkey").alias("b_key"),
        F.col("t_lon").alias("b_lon"),
        F.col("t_lat").alias("b_lat"),
    ).withColumn("_tcell", cells.cell_col(F.col("b_lat"), F.col("b_lon"), res))
    px, py = cells.xy_col(F.col("t_lat"), F.col("t_lon"), res)
    cand_cells = _ring_cand_cells(px, py, ring, res, n)
    probe = s.withColumn("_tcell", F.explode(cand_cells))
    edges = (
        probe.join(broadcast(tgt), "_tcell")
        .filter(
            (F.col("s_suppkey") != F.col("b_key"))
            & (
                haversine_m(F.col("t_lat"), F.col("t_lon"), F.col("b_lat"), F.col("b_lon"))
                <= F.lit(radius_m)
            )
        )
        .select("s_suppkey", "b_key")
        .distinct()
    )
    from ..operators import graph as _g

    assigned = _g.connected_components(
        edges, src="s_suppkey", dst="b_key", nodes=s, node_col="s_suppkey"
    ).select(F.col("node").alias("s_suppkey"), "component")
    w = Window.partitionBy("component")
    return assigned.select(
        "s_suppkey", "component", F.count(F.lit(1)).over(w).alias("n_members")
    )


# ---- text: stopword ratio (quality-scoring family) ----
_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "be", "this", "was", "are",
]
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in _STOPWORDS) + "]"

@q(
    "text_stopword_ratio",
    rf"""
SELECT doc_id,
       CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                            w -> list_contains({_SW_SQL}, w))) AS BIGINT) AS n_stopwords,
       round(CAST(len(list_filter(string_split_regex(lower(trim(text)), '\s+'),
                                  w -> list_contains({_SW_SQL}, w))) AS DOUBLE)
             / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6) AS stopword_ratio
FROM documents
""",
)
def text_stopword_ratio(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_words = F.greatest(F.size(F.split(F.trim(F.col("text")), r"\s+")), F.lit(1))
    n_stop = F.size(F.filter(words, lambda w: w.isin(*_STOPWORDS)))
    return docs.select(
        "doc_id",
        n_stop.cast("long").alias("n_stopwords"),
        F.round(n_stop.cast("double") / n_words, 6).alias("stopword_ratio"),
    )


# ---- A13: hierarchical cell rollup (hypertable-style multi-res counts) ----
@q(
    "a13_cell_rollup",
    f"""
SELECT coarse, fine, count(*) AS n, CAST(grouping(fine) AS INT) AS is_rollup
FROM (
  SELECT {cells.cell_sql('lat', 'lon', 12)} AS coarse,
         {cells.cell_sql('lat', 'lon', 16)} AS fine
  FROM ({CUSTOMER_POINTS_SQL})
)
GROUP BY ROLLUP (coarse, fine)
""",
)
def a13_cell_rollup(spark, sf_dir):
    """Multi-resolution rollup: counts at fine cells, per coarse cell,
    and grand total in one pass (partial aggregation reuse — the
    hypertable-rollup pattern on the cell hierarchy)."""
    pts = customer_points(spark, sf_dir)
    cells_df = pts.select(
        cells.cell_col(F.col("lat"), F.col("lon"), 12).alias("coarse"),
        cells.cell_col(F.col("lat"), F.col("lon"), 16).alias("fine"),
    )
    return cells_df.rollup("coarse", "fine").agg(
        F.count(F.lit(1)).alias("n"),
        F.grouping("fine").cast("int").alias("is_rollup"),
    )


# ---- A14: CUBE over (event_type, hour-of-day) — completes the
# grouping-sets family (A13 = ROLLUP on the cell hierarchy) ----
@q(
    "a14_cube",
    """
SELECT event_type, hod,
       count(*) AS n,
       round(CAST(sum(value) AS DOUBLE), 4) AS sum_value,
       CAST(grouping(event_type) AS INT) AS g_type,
       CAST(grouping(hod) AS INT) AS g_hod
FROM (SELECT event_type, CAST(hour(ts) AS INT) AS hod, value FROM events)
GROUP BY CUBE (event_type, hod)
""",
)
def a14_cube(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    if dict(ev.dtypes)["ts"] == "timestamp_ntz":
        # NTZ wall clock — hour() is session-timezone-independent
        # (verified: hour(ts)==0 under America/New_York session too)
        hod = F.hour("ts").cast("int")
    else:
        # A session with parquet-NTZ inference off reads ts as LTZ with
        # the raw stored micros; hour() would then shift by session tz.
        # Derive hour-of-day by integer arithmetic on the raw micros —
        # timezone-free, identical to DuckDB's naive hour(ts).
        hod = ((F.unix_micros("ts") / F.lit(3_600_000_000)).cast("long") % 24).cast(
            "int"
        )
    ev = ev.select("event_type", hod.alias("hod"), "value")
    return ev.cube("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value").cast("double"), 4).alias("sum_value"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("hod").cast("int").alias("g_hod"),
    )


# ---- S11: native session_window (streaming session op, batch mode) ----
@q(
    "s11_session_window",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       count(*) AS n_events
FROM numbered GROUP BY user_id, session_no
""",
)
def s11_session_window(spark, sf_dir):
    """Spark's native session_window (the streaming session operator,
    usable in batch) vs the independent lag+flag-sum SQL formulation —
    two different algorithms for the same 30-min-gap session semantics.
    session_window's window start IS the first event time, so the
    (user, session_start) keys and counts must agree exactly."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# coverage round 4: distributed prefix scan / training-shard packing
# ---------------------------------------------------------------------------


@q(
    "scan_pack_shards",
    """
WITH t AS (
  SELECT doc_id, COALESCE(n_chars, 0) AS w,
         SUM(COALESCE(n_chars, 0))
           OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS rt
  FROM documents
)
SELECT doc_id,
       CAST(rt AS BIGINT) AS running_total,
       CAST((rt - w) // 5000 AS BIGINT) AS shard_id
FROM t
""",
)
def scan_pack_shards(spark, sf_dir):
    """Global running character total + fixed-capacity shard ids over
    documents (operators/scan.py): the engine side is the two-phase
    distributed scan (one range shuffle, ≤P-row offset collect, map-
    only Arrow cumsum), the SQL twin is the serial window formulation
    DuckDB executes in one task — int64 addition is associative, so
    the decomposition must match the serial fold bit-for-bit."""
    docs = _t(spark, sf_dir, "documents")
    out = scan.pack_shards(docs, "doc_id", "n_chars", shard_size=5000, num_partitions=8)
    return out.select("doc_id", "running_total", "shard_id")


# ---- ANN: int8 scalar-quantized IVF with exact rescore ----
# Same oracle-promotion trick as ann_ivf_trained: with n_probe =
# n_centroids (all buckets probed) and k·refine ≥ |corpus| the int8
# approximate stage only SHORTLISTS — and shortlists everything — so
# the exact float64 rescore determines the result and the whole
# quantize → int8-GEMM → rescore pipeline must reproduce brute-force
# cosine top-k exactly, independent of quantization error. The
# production regime (bounded n_probe/refine, where int8 error could
# in principle cost recall) is pinned by
# test_dedup_text.py::test_ivf_topk_sq_recall_production_regime.
@q(
    "ann_ivf_sq",
    """
SELECT q_id, vec_id, rank FROM (
  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
                    e.vec_id
         ) AS rank
  FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
) WHERE rank <= 5
""",
)
def ann_ivf_sq(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = similarity.ivf_topk_sq(
        emb, queries, k=5, n_centroids=8, n_probe=8, refine=100
    )
    return out.select("q_id", "vec_id", "rank")


# ---- dedup: test-set decontamination (word n-gram overlap) ----
# Training docs (doc_id % 97 != 0) sharing >=1 word 3-gram with the
# deterministic "benchmark" slice (doc_id % 97 == 0); n=3 because the
# synthetic corpus' 31-word vocabulary makes longer exact grams
# vanishingly rare (real pipelines run n=8-13 with the same plan).
@q(
    "decontam_ngrams",
    r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                               i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS gram
  FROM toks
), tg AS (
  SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 != 0
), eg AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
)
SELECT doc_id, count(*) AS n_contaminated
FROM tg JOIN eg USING (gram)
GROUP BY doc_id
""",
)
def decontam_ngrams(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    return dedup.decontaminate(train, eval_docs, n=3)


# ---- dedup: Bloom-prefiltered decontamination (huge-eval regime) ----
# Same oracle as decontam_ngrams because the operator is EXACT by
# construction: the Bloom prefilter (built as a DataFrame aggregation,
# broadcast as a one-row dense word array, probed in codegen — dedup.bloom_build /
# bloom_probe) admits false positives but never false negatives, and
# survivors are verified by an equi-join against the true eval gram
# set.  n_bits is deliberately undersized (2^12 bits for ~1-2k eval
# grams at sf0.01 → double-digit-% fp rate) so the driver row pins the
# verify path actually removing Bloom false positives, not a
# passthrough.
@q(
    "decontam_bloom",
    r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                        i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS gram
  FROM toks
), tg AS (
  SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 != 0
), eg AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
)
SELECT doc_id, count(*) AS n_contaminated
FROM tg JOIN eg USING (gram)
GROUP BY doc_id
""",
)
def decontam_bloom(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    return dedup.decontaminate_bloom(train, eval_docs, n=3, n_bits=1 << 12, n_hashes=3)


# ---- text: repetition quality stats (Gopher-style filters) ----
@q(
    "text_repetition",
    r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM documents
), bg AS (
  SELECT doc_id, t,
         list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                        i -> array_to_string(list_slice(t, i, i + 1), ' ')) AS b
  FROM toks
), top AS (
  SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS n_bg FROM (
    SELECT doc_id, gram, count(*) AS cnt
    FROM (SELECT doc_id, unnest(b) AS gram FROM bg)
    GROUP BY 1, 2
  ) GROUP BY doc_id
)
SELECT bg.doc_id,
       CAST(len(t) AS BIGINT) AS n_words,
       round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / greatest(len(t), 1), 6)
         AS dup_word_frac,
       round(coalesce(CAST(top_cnt AS DOUBLE) / greatest(n_bg, 1), 0.0), 6)
         AS top_bigram_frac
FROM bg LEFT JOIN top ON bg.doc_id = top.doc_id
""",
)
def text_repetition(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return text.repetition_stats(docs)


# ---- END-TO-END corpus curation pipeline (exact oracle) ----
# The full training-data curation chain as ONE driver-checked query —
# the composition jobs/curate_corpus_job.py runs at cluster scale:
#   exact dedup → MinHash-LSH near-dup clustering (keep the min-id
#   member per component) → repetition quality filter → test-set
#   decontamination → token counting → greedy shard packing.
# Every stage reuses the operator already pinned by its own oracle
# (dedup_exact, minhash_lsh_pairs, dedup_clusters, text_repetition,
# decontam_ngrams, text_token_count, scan_pack_shards); this query
# pins the COMPOSITION — survivor sets feeding the next stage, and
# the final (doc_id, running_total, shard_id) assignment, which is
# sensitive to every upstream drop decision. doc_id < 200 bounds the
# recursive-CTE transitive closure like dedup_clusters; the eval
# "benchmark" slice is the deterministic doc_id % 97 == 0 split like
# decontam_ngrams.
_CURATE_SQL = rf"""
WITH RECURSIVE d AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200 AND doc_id % 97 != 0
), ev AS (
  SELECT text FROM documents WHERE doc_id < 200 AND doc_id % 97 = 0
), exact AS (
  SELECT d.doc_id, d.text FROM d
  JOIN (SELECT min(doc_id) AS doc_id FROM d GROUP BY md5(text)) k USING (doc_id)
), sh0 AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(length(text) - 3, 1) + 1),
                        s -> substr(lower(text), s, 4))) AS shingle
  FROM exact
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM sh0 WHERE length(shingle) = 4
), sig AS (
  SELECT doc_id,
       {_MH_HASHES}
  FROM sh GROUP BY doc_id
), banded AS (
  SELECT doc_id,
       {_MH_BANDS}
  FROM sig
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.doc_id < b.doc_id
   AND (a.band0 = b.band0 OR a.band1 = b.band1 OR a.band2 = b.band2 OR a.band3 = b.band3)
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT c.id_a, c.id_b, ({_MH_AGREE}) / 16.0 AS ej
    FROM cand c JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b
  ) WHERE ej >= 0.5
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(a, b) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.a, s.v FROM reach r JOIN sym s ON r.b = s.u
), comp AS (
  SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a
), near AS (
  SELECT e.doc_id, e.text FROM exact e LEFT JOIN comp c USING (doc_id)
  WHERE coalesce(c.cluster_id, e.doc_id) = e.doc_id
), rep AS (
  SELECT doc_id, text,
         len(string_split_regex(trim(lower(text)), '\s+')) AS n_words,
         round(1.0 - CAST(len(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS DOUBLE)
               / greatest(len(string_split_regex(trim(lower(text)), '\s+')), 1), 6) AS dwf
  FROM near
), clean AS (
  SELECT doc_id, text FROM rep WHERE n_words >= 2 AND dwf <= 0.9
), ctoks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t FROM clean
), etoks AS (
  SELECT string_split_regex(trim(lower(text)), '\s+') AS t FROM ev
), tg AS (
  SELECT DISTINCT doc_id, gram FROM (
    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                          i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS gram
    FROM ctoks)
), eg AS (
  SELECT DISTINCT gram FROM (
    SELECT unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                  i -> array_to_string(list_slice(t, i, i + 2), ' '))) AS gram
    FROM etoks)
), contaminated AS (
  SELECT DISTINCT doc_id FROM tg JOIN eg USING (gram)
), surv AS (
  SELECT c.doc_id, c.text FROM clean c LEFT JOIN contaminated x USING (doc_id)
  WHERE x.doc_id IS NULL
), w AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens
  FROM surv
), t2 AS (
  SELECT doc_id, ws_tokens,
         sum(ws_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rt
  FROM w
)
SELECT doc_id, CAST(rt AS BIGINT) AS running_total,
       CAST((rt - ws_tokens) // 1000 AS BIGINT) AS shard_id
FROM t2
"""


@q("curate_pipeline", _CURATE_SQL)
def curate_pipeline(spark, sf_dir):
    """End-to-end curation composition (jobs/curate_corpus_job.py) as
    one DataFrame: survivors of exact dedup → LSH near-dup clustering
    → repetition filter → decontamination, packed into ~1000-token
    shards. The SQL twin re-derives every stage independently, so a
    hash match pins the whole pipeline's drop/keep decisions and the
    final shard assignment."""
    from ..operators import graph

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)

    keep = dedup.exact_dedup(train).select(F.col("keep_id").alias("doc_id"))
    exact = train.join(keep, "doc_id", "left_semi")

    lsh_pairs = dedup.minhash_lsh_pairs(exact, n_hashes=16, bands=4, threshold=0.5)
    cc = graph.connected_components(lsh_pairs, src="id_a", dst="id_b")
    non_canonical = cc.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    near = exact.join(non_canonical, "doc_id", "left_anti")

    feats = text.repetition_stats(near, append=True)
    clean = feats.filter(
        (F.col("n_words") >= 2) & (F.col("dup_word_frac") <= 0.9)
    ).select("doc_id", "text")

    hits = dedup.decontaminate(clean, eval_docs, n=3).select("doc_id")
    surv = clean.join(hits, "doc_id", "left_anti")

    toks = text.token_count(surv, append=True)
    out = scan.pack_shards(
        toks, order_col="doc_id", weight_col="ws_tokens", shard_size=1000,
        num_partitions=8,
    )
    return out.select("doc_id", "running_total", "shard_id")


# ---- TF-IDF top-k characteristic terms per document ----
# log_idf=False in the pinned config: the score tf·(N+1)/(df+1) is
# pure IEEE rational arithmetic (division + multiplication, both
# correctly-rounded and engine-identical), so ranking AND the rounded
# score hash-match exactly. The ln variant (operator default) is
# pinned in pytest against math.log instead — transcendentals stay out
# of the cross-engine hash gate. Positive scores only, so Spark
# HALF_UP and DuckDB half-away-from-zero rounding agree.
_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM toks WHERE term != '' GROUP BY doc_id, term
), dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         -- parenthesized to mirror the engine's tf * ((N+1)/(df+1))
         -- association exactly: (tf*(N+1))/(df+1) differs by 1 ulp on
         -- some inputs and 72 sf0.1 rows straddled the round(,6)
         -- boundary (r5 full-SF sweep finding)
         tf.tf * ((n.n_docs + 1.0) / (dfreq.df + 1.0)) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
), ranked AS (
  SELECT doc_id, term, tf, df, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term ASC) AS term_rank
  FROM scored
)
SELECT doc_id, CAST(term_rank AS INT) AS term_rank, term,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       round(score, 6) AS tfidf
FROM ranked WHERE term_rank <= 3
"""


@q("tfidf_topk", _TFIDF_SQL)
def tfidf_topk(spark, sf_dir):
    """Top-3 characteristic terms per document by TF-IDF
    (operators/text.py:tfidf_topk) — keyword extraction over the
    documents table, deterministic (score DESC, term ASC) ranking."""
    docs = _t(spark, sf_dir, "documents")
    return text.tfidf_topk(docs, k=3, log_idf=False, broadcast_vocab=True)


# ---- text: PII detection + redaction ----
# The synthetic documents carry no PII, so the query plants it
# deterministically (doc_id % 7 selects which kind gets appended, the
# id itself parameterizes the value) IDENTICALLY in both engines, then
# runs the operator / the equivalent RE2 chain.  The patterns live in
# the Java∩RE2 regex subset (operators/text.py:PII_PATTERNS) precisely
# so this cross-engine oracle is exact — counts on the original text,
# redaction applied in the fixed email→ssn→ipv4→phone order.
_PII_AUG_SQL = """
  SELECT doc_id,
         text || CASE doc_id % 7
           WHEN 0 THEN ' reach user' || CAST(doc_id AS VARCHAR) || '@example.com today'
           WHEN 1 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' on file'
           WHEN 2 THEN ' from host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17 port 80'
           WHEN 3 THEN ' call +1415555' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
           ELSE ''
         END AS text
  FROM documents
"""


@q(
    "text_pii_scrub",
    rf"""
WITH aug AS ({_PII_AUG_SQL})
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}')) AS BIGINT) AS n_email,
  CAST(len(regexp_extract_all(text, '\b\d{{3}}-\d{{2}}-\d{{4}}\b')) AS BIGINT) AS n_ssn,
  CAST(len(regexp_extract_all(text, '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b')) AS BIGINT) AS n_ipv4,
  CAST(len(regexp_extract_all(text, '\+\d{{7,15}}\b')) AS BIGINT) AS n_phone,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
        '\b\d{{3}}-\d{{2}}-\d{{4}}\b', '<SSN>', 'g'),
      '\b\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\.\d{{1,3}}\b', '<IP>', 'g'),
    '\+\d{{7,15}}\b', '<PHONE>', 'g') AS redacted
FROM aug
""",
)
def text_pii_scrub(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    sel = F.col("doc_id") % 7
    did = F.col("doc_id").cast("string")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(sel == 0, F.concat(F.lit(" reach user"), did, F.lit("@example.com today")))
            .when(
                sel == 1,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit(" on file"),
                ),
            )
            .when(
                sel == 2,
                F.concat(
                    F.lit(" from host 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".17 port 80"),
                ),
            )
            .when(
                sel == 3,
                F.concat(
                    F.lit(" call +1415555"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit(" now"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return text.pii_scrub(aug)


# ---- J10: envelope⋈envelope intersects join (both sides extended —
# PBSM cell partitioning, canonical-cell dedup-free reporting) ----
CUSTOMER_BOXES_SQL = f"""
SELECT c_custkey,
       ({lon_sql('(c_custkey * 17 + 3)')} - CAST((c_custkey % 11) + 1 AS DOUBLE) * 0.002) AS min_lon,
       ({lon_sql('(c_custkey * 17 + 3)')} + CAST((c_custkey % 11) + 1 AS DOUBLE) * 0.002) AS max_lon,
       ({lat_sql('(c_custkey * 29 + 11)')} - CAST((c_custkey % 5) + 1 AS DOUBLE) * 0.002) AS min_lat,
       ({lat_sql('(c_custkey * 29 + 11)')} + CAST((c_custkey % 5) + 1 AS DOUBLE) * 0.002) AS max_lat
FROM customer
"""


def customer_boxes(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    cx = lon_col(F.col("c_custkey") * 17 + 3)
    cy = lat_col(F.col("c_custkey") * 29 + 11)
    hw = ((F.col("c_custkey") % 11) + 1).cast("double") * F.lit(0.002)
    hh = ((F.col("c_custkey") % 5) + 1).cast("double") * F.lit(0.002)
    return c.select(
        "c_custkey",
        (cx - hw).alias("min_lon"),
        (cx + hw).alias("max_lon"),
        (cy - hh).alias("min_lat"),
        (cy + hh).alias("max_lat"),
    )


@q(
    "j10_box_join",
    f"""
SELECT a.c_custkey AS custkey, b.s_suppkey AS suppkey
FROM ({CUSTOMER_BOXES_SQL}) a JOIN ({SUPPLIER_BOXES_SQL}) b
  ON a.min_lon <= b.max_lon AND b.min_lon <= a.max_lon
 AND a.min_lat <= b.max_lat AND b.min_lat <= a.max_lat
""",
)
def j10_box_join(spark, sf_dir):
    """J10 — box⋈box intersects join where BOTH sides are extended
    objects (the reference only ever emits envelopes per feed,
    formats/envelope.ts:14 — joining two envelope sets is engine-new).
    One cell equi-join + canonical-cell filter, zero dedup shuffle,
    pure JVM (plan audited in tests). Oracle: brute-force interval
    overlap — both engines compute boxes with identical double
    arithmetic off integer keys."""
    a = customer_boxes(spark, sf_dir)
    b = supplier_boxes(spark, sf_dir)
    out = overlap.envelope_intersect_join(a, b, res=CELL_RES)
    return out.select(
        F.col("c_custkey_a").alias("custkey"), F.col("s_suppkey_b").alias("suppkey")
    )


# ---- J11: polygon⋈polygon intersects join — diamonds (45°-rotated
# squares) so the exact residual really rejects bbox-overlap
# candidates, while DuckDB checks the closed form: two diamonds of
# half-diagonals h1/h2 intersect iff the rotated-frame (u = x+y,
# v = x−y) center offsets both stay within h1+h2.
#
# The h constants carry sub-lattice offsets (+1.3e-9 / +2.4e-9; r5):
# the derived centers live on an exact-decimal 1e-8 grid (coordinates
# are multiples of LON_SPAN/MOD = 1.7e-9·100 with LON0 cancelling in
# every Δ) while plain h sums are multiples of 1e-3, so |Δv| = h1+h2
# EXACT corner tangencies occur in the lattice — the sf0.1 sweep found
# two, where double rounding split the tie differently between the
# kernel and the closed form. The offsets push every boundary
# 2.4–3.7e-9 off the grid (verified minima over all 15M sf0.1 pairs:
# 3.7e-9 both axes; j12 2.4e-9 — test_oracle_invariants.py pins it),
# five orders above double rounding, so both engines agree exactly ----
_DIAMONDS_A_SQL = f"""
SELECT c_custkey,
       {lon_sql('(c_custkey * 17 + 3)')} AS cx,
       {lat_sql('(c_custkey * 29 + 11)')} AS cy,
       CAST((c_custkey % 9) + 1 AS DOUBLE) * 0.003 + 1.3e-9 AS h
FROM customer
"""
_DIAMONDS_B_SQL = f"""
SELECT s_suppkey,
       {lon_sql('(s_suppkey * 13 + 7)')} AS cx,
       {lat_sql('(s_suppkey * 11 + 5)')} AS cy,
       CAST((s_suppkey % 7) + 2 AS DOUBLE) * 0.004 + 2.4e-9 AS h
FROM supplier
"""


def _diamond_frame(base: DataFrame, key: str, cx, cy, h) -> DataFrame:
    pt = lambda x, y: F.array(x, y)  # noqa: E731
    ring = F.array(
        pt(cx, cy - h), pt(cx + h, cy), pt(cx, cy + h), pt(cx - h, cy), pt(cx, cy - h)
    )
    return base.select(key, F.array(ring).alias("polygon"))


@q(
    "j11_polygon_join",
    f"""
SELECT a.c_custkey AS custkey, b.s_suppkey AS suppkey
FROM ({_DIAMONDS_A_SQL}) a JOIN ({_DIAMONDS_B_SQL}) b
  ON abs((a.cx + a.cy) - (b.cx + b.cy)) <= a.h + b.h
 AND abs((a.cx - a.cy) - (b.cx - b.cy)) <= a.h + b.h
""",
)
def j11_polygon_join(spark, sf_dir):
    """J11 — polygon⋈polygon intersects join: J10's dedup-free bbox
    cell candidates + the exact polygons_intersect Arrow residual.
    Diamond fixtures make the residual load-bearing: bboxes of two
    diamonds overlap strictly more often than the diamonds do, so the
    oracle match proves the Python kernel rejected the corner misses
    (the boundary set |Δu| = h1+h2 is measure-zero on the derived
    double grid — same convention as j6b's haversine threshold)."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    da = _diamond_frame(
        c,
        "c_custkey",
        lon_col(F.col("c_custkey") * 17 + 3),
        lat_col(F.col("c_custkey") * 29 + 11),
        ((F.col("c_custkey") % 9) + 1).cast("double") * F.lit(0.003) + F.lit(1.3e-9),
    )
    db = _diamond_frame(
        s,
        "s_suppkey",
        lon_col(F.col("s_suppkey") * 13 + 7),
        lat_col(F.col("s_suppkey") * 11 + 5),
        ((F.col("s_suppkey") % 7) + 2).cast("double") * F.lit(0.004) + F.lit(2.4e-9),
    )
    out = overlap.polygon_intersect_join(da, db, res=CELL_RES)
    return out.select(
        F.col("c_custkey_a").alias("custkey"), F.col("s_suppkey_b").alias("suppkey")
    )


# ---- J12: polyline⋈polygon intersects join — horizontal segments ×
# diamonds, where the exact SQL form comes from parameterizing the
# segment by x: it meets the diamond iff
# [x0,x1] ∩ [uc−h−y, uc+h−y] ∩ [vc−h+y, vc+h+y] ≠ ∅ (u=x+y, v=x−y) ----
_SEGMENTS_SQL = f"""
SELECT o_orderkey,
       {lon_sql('(o_orderkey * 19 + 3)')} AS x0,
       {lon_sql('(o_orderkey * 19 + 3)')} + CAST((o_orderkey % 13) + 2 AS DOUBLE) * 0.003 AS x1,
       {lat_sql('(o_orderkey * 7 + 1)')} AS y
FROM orders
"""


@q(
    "j12_line_polygon_join",
    f"""
SELECT a.o_orderkey AS orderkey, b.s_suppkey AS suppkey
FROM ({_SEGMENTS_SQL}) a JOIN ({_DIAMONDS_B_SQL}) b
  ON greatest(a.x0, (b.cx + b.cy) - b.h - a.y, (b.cx - b.cy) - b.h + a.y)
     <= least(a.x1, (b.cx + b.cy) - a.y + b.h, (b.cx - b.cy) + a.y + b.h)
""",
)
def j12_line_polygon_join(spark, sf_dir):
    """J12 — polyline⋈polygon intersects join (route corridors × zones
    at scale; the reference draws LineStrings but never joins them,
    formats/lines.ts). Same dedup-free bbox-cell candidates as J10 +
    the exact linestring_intersects_polygon Arrow residual. Horizontal
    2-vertex segment fixtures give DuckDB a closed form while the
    general multi-vertex kernel executes (general polylines are pinned
    by test_overlap.py against crossing/touch/hole cases)."""
    o = _t(spark, sf_dir, "orders")
    x0 = lon_col(F.col("o_orderkey") * 19 + 3)
    x1 = x0 + ((F.col("o_orderkey") % 13) + 2).cast("double") * F.lit(0.003)
    y = lat_col(F.col("o_orderkey") * 7 + 1)
    lines = o.select(
        "o_orderkey", F.array(F.array(x0, y), F.array(x1, y)).alias("line")
    )
    s = _t(spark, sf_dir, "supplier")
    polys = _diamond_frame(
        s,
        "s_suppkey",
        lon_col(F.col("s_suppkey") * 13 + 7),
        lat_col(F.col("s_suppkey") * 11 + 5),
        ((F.col("s_suppkey") % 7) + 2).cast("double") * F.lit(0.004) + F.lit(2.4e-9),
    )
    out = overlap.line_polygon_intersect_join(lines, polys, res=CELL_RES)
    return out.select(
        F.col("o_orderkey_a").alias("orderkey"), F.col("s_suppkey_b").alias("suppkey")
    )


# ---- J11b: the convex (batched SAT) residual on the same diamond
# fixtures and the same closed-form oracle — the fast path must emit
# the identical pair set as the general kernel ----
@q(
    "j11b_polygon_join_convex",
    f"""
SELECT a.c_custkey AS custkey, b.s_suppkey AS suppkey
FROM ({_DIAMONDS_A_SQL}) a JOIN ({_DIAMONDS_B_SQL}) b
  ON abs((a.cx + a.cy) - (b.cx + b.cy)) <= a.h + b.h
 AND abs((a.cx - a.cy) - (b.cx - b.cy)) <= a.h + b.h
""",
)
def j11b_polygon_join_convex(spark, sf_dir):
    """J11b — assume_convex=True routes the residual through the
    batched separating-axis kernel (no per-pair Python loop); the
    unchanged closed-form oracle pins its exactness every round."""
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    da = _diamond_frame(
        c,
        "c_custkey",
        lon_col(F.col("c_custkey") * 17 + 3),
        lat_col(F.col("c_custkey") * 29 + 11),
        ((F.col("c_custkey") % 9) + 1).cast("double") * F.lit(0.003) + F.lit(1.3e-9),
    )
    db = _diamond_frame(
        s,
        "s_suppkey",
        lon_col(F.col("s_suppkey") * 13 + 7),
        lat_col(F.col("s_suppkey") * 11 + 5),
        ((F.col("s_suppkey") % 7) + 2).cast("double") * F.lit(0.004) + F.lit(2.4e-9),
    )
    out = overlap.polygon_intersect_join(da, db, res=CELL_RES, assume_convex=True)
    return out.select(
        F.col("c_custkey_a").alias("custkey"), F.col("s_suppkey_b").alias("suppkey")
    )


# ---- A15: zonal statistics over the overlay join — per-zone envelope
# counts + weighted sum, no count-distinct (the canonical-cell filter
# already made pairs unique) ----
@q(
    "a15_zonal_stats",
    f"""
SELECT b.s_suppkey AS suppkey,
       count(*) AS n_left,
       CAST(sum(a.c_custkey) AS BIGINT) AS sum_w
FROM ({CUSTOMER_BOXES_SQL}) a JOIN ({SUPPLIER_BOXES_SQL}) b
  ON a.min_lon <= b.max_lon AND b.min_lon <= a.max_lon
 AND a.min_lat <= b.max_lat AND b.min_lat <= a.max_lat
GROUP BY 1
""",
)
def a15_zonal_stats(spark, sf_dir):
    """A15 — zonal aggregation composed on J10: count + weighted sum of
    customer envelopes per supplier zone. The oracle's plain GROUP BY
    over the brute-force pair set doubles as proof that the overlay
    emitted each pair exactly once (any duplicate would break n_left)."""
    a = customer_boxes(spark, sf_dir).withColumn(
        "w", F.col("c_custkey").cast("long")
    )
    b = supplier_boxes(spark, sf_dir)
    out = overlap.zonal_counts(a, b, res=CELL_RES, zone_cols=["s_suppkey"], weight_col="w")
    return out.select(
        F.col("s_suppkey").alias("suppkey"), "n_left", F.col("sum_w").alias("sum_w")
    )


# ---- J13: polyline⋈polyline intersects join — horizontal orders
# segments × vertical part segments; a pair meets iff x ∈ [x0,x1] AND
# y ∈ [y0,y1], which DuckDB checks with two BETWEENs ----
_VSEGMENTS_SQL = f"""
SELECT p_partkey,
       {lon_sql('(p_partkey * 23 + 5)')} AS x,
       {lat_sql('(p_partkey * 31 + 9)')} AS y0,
       {lat_sql('(p_partkey * 31 + 9)')} + CAST((p_partkey % 11) + 2 AS DOUBLE) * 0.002 AS y1
FROM part
"""


@q(
    "j13_line_line_join",
    f"""
SELECT a.o_orderkey AS orderkey, b.p_partkey AS partkey
FROM ({_SEGMENTS_SQL}) a JOIN ({_VSEGMENTS_SQL}) b
  ON b.x >= a.x0 AND b.x <= a.x1
 AND a.y >= b.y0 AND a.y <= b.y1
""",
)
def j13_line_line_join(spark, sf_dir):
    """J13 — polyline⋈polyline intersects (route crossings; completes
    the {point, box, line, polygon} join matrix). Horizontal × vertical
    segment fixtures give DuckDB a two-BETWEEN closed form while the
    general crossing/touch/collinear kernel executes (general zigzags
    pinned by test_overlap.py)."""
    o = _t(spark, sf_dir, "orders")
    x0 = lon_col(F.col("o_orderkey") * 19 + 3)
    x1 = x0 + ((F.col("o_orderkey") % 13) + 2).cast("double") * F.lit(0.003)
    y = lat_col(F.col("o_orderkey") * 7 + 1)
    lines_h = o.select(
        "o_orderkey", F.array(F.array(x0, y), F.array(x1, y)).alias("line")
    )
    p = _t(spark, sf_dir, "part")
    vx = lon_col(F.col("p_partkey") * 23 + 5)
    vy0 = lat_col(F.col("p_partkey") * 31 + 9)
    vy1 = vy0 + ((F.col("p_partkey") % 11) + 2).cast("double") * F.lit(0.002)
    lines_v = p.select(
        "p_partkey", F.array(F.array(vx, vy0), F.array(vx, vy1)).alias("line")
    )
    out = overlap.line_line_intersect_join(lines_h, lines_v, res=CELL_RES)
    return out.select(
        F.col("o_orderkey_a").alias("orderkey"), F.col("p_partkey_b").alias("partkey")
    )


# ---- J14: radius-bounded nearest-segment snap (linear referencing,
# unkeyed) — customers snap to horizontal orders segments. The general
# clamped-projection kernel executes in Spark; the oracle reproduces
# the SAME formula (structurally identical IEEE-754 expression order,
# the cell_sql/cell_col parity discipline) over a brute-force cross
# join, then argmins with the kernel's exact (dist2, line, seg) order.
# seg fixtures: line_id=o_orderkey, one segment each, cum0=0 ----
_SNAP_RADIUS = 0.004
_SNAP_CAND_SQL = f"""
SELECT c_custkey, o_orderkey,
       (wx - t * ex) * (wx - t * ex) + (wy - t * ey) * (wy - t * ey) AS d2,
       t * sqrt(ex * ex + ey * ey) AS along
FROM (
  SELECT c_custkey, o_orderkey, ex, ey, wx, wy,
         least(greatest(CASE WHEN ex * ex + ey * ey > 0.0
                             THEN (wx * ex + wy * ey) / (ex * ex + ey * ey)
                             ELSE 0.0 END, 0.0), 1.0) AS t
  FROM (
    SELECT p.c_custkey, s.o_orderkey,
           (s.x1 - s.x0) * 1.0 AS ex, (s.y - s.y) * 1.0 AS ey,
           (p.lon - s.x0) * 1.0 AS wx, (p.lat - s.y) * 1.0 AS wy
    FROM ({CUSTOMER_POINTS_SQL}) p CROSS JOIN ({_SEGMENTS_SQL}) s
  )
)
"""


@q(
    "j14_snap_nearest_segment",
    f"""
SELECT c_custkey AS custkey, o_orderkey AS orderkey,
       round(along, 6) AS along_r, round(sqrt(d2), 6) AS dist_r
FROM (
  SELECT c_custkey, o_orderkey, d2, along,
         row_number() OVER (PARTITION BY c_custkey ORDER BY d2, o_orderkey) AS rn
  FROM ({_SNAP_CAND_SQL})
  WHERE d2 <= {_SNAP_RADIUS} * {_SNAP_RADIUS}
) WHERE rn = 1
""",
)
def j14_snap_nearest_segment(spark, sf_dir):
    """J14 — nearest-segment snap + linear reference within a radius
    (map-matching primitive; GTFS stop→shape matching at web scale —
    the reference carries shapes but never derives the match,
    src/lib/formats/lines.ts). Cell-cover candidates with the radius
    folded into the segment bbox pad, then ONE map-side-combinable
    argmin (operators/linear_ref.py). Horizontal single-segment
    fixtures give DuckDB the brute-force mirror while the general
    polyline kernel executes (general zigzags, clamps, ties and the
    scaled metric are pinned by tests/test_linear_raster.py)."""
    pts = customer_points(spark, sf_dir).withColumnRenamed("c_custkey", "point_id")
    o = _t(spark, sf_dir, "orders")
    x0 = lon_col(F.col("o_orderkey") * 19 + 3)
    x1 = x0 + ((F.col("o_orderkey") % 13) + 2).cast("double") * F.lit(0.003)
    y = lat_col(F.col("o_orderkey") * 7 + 1)
    segs = o.select(
        F.col("o_orderkey").alias("line_id"),
        F.lit(0).cast("long").alias("seg_idx"),
        x0.alias("ax"),
        y.alias("ay"),
        x1.alias("bx"),
        y.alias("by"),
        F.lit(0.0).alias("cum0"),
    )
    out = linear_ref.snap_points_to_segments(pts, segs, max_dist=_SNAP_RADIUS, res=16)
    return out.select(
        F.col("point_id").alias("custkey"),
        F.col("line_id").alias("orderkey"),
        F.round(F.col("along"), 6).alias("along_r"),
        F.round(F.col("dist"), 6).alias("dist_r"),
    )


# ---- G14: keyed linear referencing (shape_dist_traveled) — customers
# locate along their NATION's polyline (suppliers ordered by suppkey
# are the vertices). The oracle rebuilds segments with lead()/window
# cumsum and mirrors the projection formula expression-for-expression ----
@q(
    "g14_locate_along",
    f"""
WITH v AS (
  SELECT s_nationkey % 5 AS line_id, s_suppkey AS seq,
         {lon_sql('(s_suppkey * 37 + 11)')} AS x,
         {lat_sql('(s_suppkey * 41 + 17)')} AS y
  FROM supplier
), seg0 AS (
  SELECT line_id,
         CAST(row_number() OVER w - 1 AS BIGINT) AS seg_idx,
         x AS ax, y AS ay,
         lead(x) OVER w AS bx, lead(y) OVER w AS by
  FROM v WINDOW w AS (PARTITION BY line_id ORDER BY seq)
), seg AS (
  SELECT line_id, seg_idx, ax, ay, bx, by,
         coalesce(sum(sqrt((bx - ax) * 1.0 * ((bx - ax) * 1.0)
                           + (by - ay) * 1.0 * ((by - ay) * 1.0)))
                  OVER (PARTITION BY line_id ORDER BY seg_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0.0) AS cum0
  FROM seg0 WHERE bx IS NOT NULL
), cand AS (
  SELECT c_custkey, line_id, seg_idx,
         (wx - t * ex) * (wx - t * ex) + (wy - t * ey) * (wy - t * ey) AS d2,
         cum0 + t * sqrt(ex * ex + ey * ey) AS along
  FROM (
    SELECT c_custkey, line_id, seg_idx, cum0, ex, ey, wx, wy,
           least(greatest(CASE WHEN ex * ex + ey * ey > 0.0
                               THEN (wx * ex + wy * ey) / (ex * ex + ey * ey)
                               ELSE 0.0 END, 0.0), 1.0) AS t
    FROM (
      SELECT p.c_custkey, s.line_id, s.seg_idx, s.cum0,
             (s.bx - s.ax) * 1.0 AS ex, (s.by - s.ay) * 1.0 AS ey,
             (p.lon - s.ax) * 1.0 AS wx, (p.lat - s.ay) * 1.0 AS wy
      FROM (SELECT c_custkey, c_nationkey % 5 AS c_linekey,
                   {lon_sql('c_custkey')} AS lon, {lat_sql('c_custkey')} AS lat
            FROM customer) p
      JOIN seg s ON s.line_id = p.c_linekey
    )
  )
)
SELECT c_custkey AS custkey, line_id AS linekey, seg_idx,
       round(along, 6) AS along_r, round(sqrt(d2), 6) AS dist_r
FROM (
  SELECT c_custkey, line_id, seg_idx, d2, along,
         row_number() OVER (PARTITION BY c_custkey ORDER BY d2, seg_idx) AS rn
  FROM cand
) WHERE rn = 1
""",
)
def g14_locate_along(spark, sf_dir):
    """G14 — keyed linear referencing: distance along the line to the
    snapped foot (the GTFS ``shape_dist_traveled`` derivation; transit
    wrapper transit_spatial.stop_shape_dist_traveled). One hash join on
    the line key + one partial-aggregating argmin; the per-line lead +
    running-length windows build the segment table
    (linear_ref.segments_from_vertices)."""
    sup = _t(spark, sf_dir, "supplier")
    verts = sup.select(
        (F.col("s_nationkey") % 5).alias("line_id"),
        F.col("s_suppkey").alias("seq"),
        lon_col(F.col("s_suppkey") * 37 + 11).alias("x"),
        lat_col(F.col("s_suppkey") * 41 + 17).alias("y"),
    )
    segs = linear_ref.segments_from_vertices(verts, x="x", y="y")
    cust = _t(spark, sf_dir, "customer")
    pts = cust.select(
        F.col("c_custkey").alias("point_id"),
        (F.col("c_nationkey") % 5).alias("line_key"),
        lon_col(F.col("c_custkey")).alias("lon"),
        lat_col(F.col("c_custkey")).alias("lat"),
    )
    out = linear_ref.locate_along_keyed(pts, segs, key="line_key")
    return out.select(
        F.col("point_id").alias("custkey"),
        F.col("line_id").alias("linekey"),
        "seg_idx",
        F.round(F.col("along"), 6).alias("along_r"),
        F.round(F.col("dist"), 6).alias("dist_r"),
    )


# ---- R1: rasterization — per-tile pixel-count grids from the image
# geotag point cloud (the geospatial→image direction; the PNG render of
# the same counts is pinned by decode-roundtrip pytest, DuckDB has no
# codec). Pure bit arithmetic on the cells.py grid; exact SQL mirror ----
@q(
    "r1_rasterize_density",
    f"""
SELECT tile, px_x, px_y, count(*) AS n
FROM (
  SELECT {raster.rasterize_sql(lat_sql('(l_orderkey * 6 + l_linenumber)'),
                               lon_sql('(l_orderkey * 6 + l_linenumber)'),
                               TILE_RES, 4)}
  FROM lineitem
)
GROUP BY 1, 2, 3
""",
)
def r1_rasterize_density(spark, sf_dir):
    """R1 — density rasterization: every point maps to (tile, pixel)
    with shift/mask arithmetic (a pixel IS a grid cell at
    tile_res+px_bits), ONE partially-aggregating groupBy counts — the
    output is bounded by the raster, not the 10^12-point input
    (operators/raster.py; density_tiles paints + PNG-encodes the same
    frame, tests/test_linear_raster.py)."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 6 + F.col("l_linenumber")
    pts = li.select(lon_col(key).alias("lon"), lat_col(key).alias("lat"))
    return raster.rasterize_counts(pts, TILE_RES, 4)


# ---- R2: raster pyramid rollup — the r1 density raster one zoom
# level up. A parent pixel is a 2×2 block of child pixels, so the
# rollup is integer halving on global fine-grid coords + ONE sum;
# the oracle re-derives the identical arithmetic over the same child
# subquery (raster.pyramid_sql). The IMAGE-level pyramid twin
# (pyramid_tiles: decode → quadrant mosaic → 2×2 floor-mean) is
# pytest-pinned — DuckDB has no codec ----
@q(
    "r2_raster_pyramid",
    f"""
SELECT tile, px_x, px_y, CAST(sum(n) AS BIGINT) AS n
FROM (
  SELECT {raster.pyramid_sql(TILE_RES, 4)}, n
  FROM (
    SELECT tile, px_x, px_y, count(*) AS n
    FROM (
      SELECT {raster.rasterize_sql(lat_sql('(l_orderkey * 6 + l_linenumber)'),
                                   lon_sql('(l_orderkey * 6 + l_linenumber)'),
                                   TILE_RES, 4)}
      FROM lineitem
    )
    GROUP BY 1, 2, 3
  )
)
GROUP BY 1, 2, 3
""",
)
def r2_raster_pyramid(spark, sf_dir):
    """R2 — tile-pyramid rollup (operators/raster.py pyramid_counts):
    z→z−1 in one partial-aggregating shuffle, count-preserving by
    construction; pyramid_counts(rasterize(res)) ==
    rasterize(res−1) is pinned exactly in tests/test_linear_raster.py,
    and the rendered-image pyramid (pyramid_tiles) is pinned against
    an independent numpy mosaic+downsample build."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 6 + F.col("l_linenumber")
    pts = li.select(lon_col(key).alias("lon"), lat_col(key).alias("lat"))
    child = raster.rasterize_counts(pts, TILE_RES, 4)
    return raster.pyramid_counts(child, TILE_RES, 4)


# ---- R3: FULL pyramid path — r2 pins one z→z−1 level; this iterates
# pyramid_counts three levels (z→z−3, each level 4× smaller, whole
# pyramid ~4/3 the cost of one level) so the claimed full-pyramid
# serving path is driver-pinned end-to-end. Uses the derived-res
# contract (no tile_res argument — res comes from each tile id's own
# bits, ADVICE r4). The oracle nests the identical halving arithmetic
# three times ----
@q(
    "r3_raster_pyramid_full",
    f"""
WITH c0 AS (
  SELECT tile, px_x, px_y, count(*) AS n
  FROM (
    SELECT {raster.rasterize_sql(lat_sql('(l_orderkey * 6 + l_linenumber)'),
                                 lon_sql('(l_orderkey * 6 + l_linenumber)'),
                                 TILE_RES, 4)}
    FROM lineitem
  )
  GROUP BY 1, 2, 3
), c1 AS (
  SELECT tile, px_x, px_y, CAST(sum(n) AS BIGINT) AS n
  FROM (SELECT {raster.pyramid_sql(TILE_RES, 4)}, n FROM c0)
  GROUP BY 1, 2, 3
), c2 AS (
  SELECT tile, px_x, px_y, CAST(sum(n) AS BIGINT) AS n
  FROM (SELECT {raster.pyramid_sql(TILE_RES - 1, 4)}, n FROM c1)
  GROUP BY 1, 2, 3
)
SELECT tile, px_x, px_y, CAST(sum(n) AS BIGINT) AS n
FROM (SELECT {raster.pyramid_sql(TILE_RES - 2, 4)}, n FROM c2)
GROUP BY 1, 2, 3
""",
)
def r3_raster_pyramid_full(spark, sf_dir):
    """R3 — full-pyramid rollup: three iterated pyramid_counts levels
    (z→z−3) on the derived-res contract, one partial-aggregating
    shuffle per level and geometrically shrinking level sizes — the
    tile-pyramid serving format for the north-star image table
    (operators/raster.py pyramid_counts; level-wise exactness is r2,
    this pins the composition)."""
    li = _t(spark, sf_dir, "lineitem")
    key = F.col("l_orderkey") * 6 + F.col("l_linenumber")
    pts = li.select(lon_col(key).alias("lon"), lat_col(key).alias("lat"))
    out = raster.rasterize_counts(pts, TILE_RES, 4)
    for _ in range(3):
        out = raster.pyramid_counts(out, px_bits=4)
    return out


# ---- G15: inverse linear referencing — (line, along) → the point
# that far along the polyline (the other half of g14; schedule →
# position interpolation). Same nation%5 polylines; along values are
# deterministic and deliberately include negatives (clamp to start)
# and beyond-total (clamp to end). The oracle re-derives the covering
# segment with the kernel's exact (not_cover, ±cum0, seg_idx DESC)
# order — cum0 ties break toward the LARGEST seg_idx so the real
# segment after a zero-length one wins (ADVICE r4) ----
@q(
    "g15_position_along",
    f"""
WITH v AS (
  SELECT s_nationkey % 5 AS line_id, s_suppkey AS seq,
         {lon_sql('(s_suppkey * 37 + 11)')} AS x,
         {lat_sql('(s_suppkey * 41 + 17)')} AS y
  FROM supplier
), seg0 AS (
  SELECT line_id,
         CAST(row_number() OVER w - 1 AS BIGINT) AS seg_idx,
         x AS ax, y AS ay,
         lead(x) OVER w AS bx, lead(y) OVER w AS by
  FROM v WINDOW w AS (PARTITION BY line_id ORDER BY seq)
), seg AS (
  SELECT line_id, seg_idx, ax, ay, bx, by,
         coalesce(sum(sqrt((bx - ax) * 1.0 * ((bx - ax) * 1.0)
                           + (by - ay) * 1.0 * ((by - ay) * 1.0)))
                  OVER (PARTITION BY line_id ORDER BY seg_idx
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0.0) AS cum0
  FROM seg0 WHERE bx IS NOT NULL
), m AS (
  SELECT c_custkey, c_nationkey % 5 AS line_id,
         CAST(c_custkey % 97 AS DOUBLE) * 0.003 - 0.01 AS along
  FROM customer
), pick AS (
  SELECT c_custkey, line_id, along, seg_idx, ax, ay, bx, by, cum0,
         row_number() OVER (
           PARTITION BY c_custkey
           ORDER BY CASE WHEN cum0 > along THEN 1 ELSE 0 END,
                    CASE WHEN cum0 <= along THEN -cum0 ELSE cum0 END,
                    seg_idx DESC
         ) AS rn
  FROM m JOIN seg USING (line_id)
)
SELECT c_custkey AS custkey, line_id AS linekey, seg_idx,
       round(ax + t * (bx - ax), 6) AS lon_r,
       round(ay + t * (by - ay), 6) AS lat_r
FROM (
  SELECT c_custkey, line_id, seg_idx, ax, ay, bx, by,
         least(greatest(CASE WHEN sqrt((bx - ax) * 1.0 * ((bx - ax) * 1.0)
                                       + (by - ay) * 1.0 * ((by - ay) * 1.0)) > 0.0
                             THEN (along - cum0)
                                  / sqrt((bx - ax) * 1.0 * ((bx - ax) * 1.0)
                                         + (by - ay) * 1.0 * ((by - ay) * 1.0))
                             ELSE 0.0 END, 0.0), 1.0) AS t
  FROM pick WHERE rn = 1
)
""",
)
def g15_position_along(spark, sf_dir):
    """G15 — inverse linear referencing
    (linear_ref.position_along_keyed): along → interpolated position,
    covering-segment argmin via the same partial min(struct) shape as
    the forward op; forward∘inverse roundtrip pinned in
    tests/test_linear_raster.py."""
    sup = _t(spark, sf_dir, "supplier")
    verts = sup.select(
        (F.col("s_nationkey") % 5).alias("line_id"),
        F.col("s_suppkey").alias("seq"),
        lon_col(F.col("s_suppkey") * 37 + 11).alias("x"),
        lat_col(F.col("s_suppkey") * 41 + 17).alias("y"),
    )
    segs = linear_ref.segments_from_vertices(verts, x="x", y="y")
    cust = _t(spark, sf_dir, "customer")
    meas = cust.select(
        F.col("c_custkey").alias("measure_id"),
        (F.col("c_nationkey") % 5).alias("line_key"),
        ((F.col("c_custkey") % 97).cast("double") * F.lit(0.003) - F.lit(0.01)).alias("along"),
    )
    out = linear_ref.position_along_keyed(meas, segs, key="line_key")
    return out.select(
        F.col("measure_id").alias("custkey"),
        F.col("line_id").alias("linekey"),
        "seg_idx",
        F.round(F.col("lon"), 6).alias("lon_r"),
        F.round(F.col("lat"), 6).alias("lat_r"),
    )
