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
from ..operators import dedup, similarity, spatial, text

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


# ---- rows-only checks (non-SQL-expressible ops; driver records weaker check) ----


def simhash_pairs_rowsonly(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.simhash_near_pairs(docs, max_hamming=12)


def minhash_lsh_rowsonly(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return dedup.minhash_lsh_pairs(docs, n_hashes=16, bands=4, threshold=0.5)


def ivf_ann_rowsonly(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return similarity.ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3)


_ROWS_ONLY = {
    "simhash_pairs": simhash_pairs_rowsonly,
    "minhash_lsh_pairs": minhash_lsh_rowsonly,
    "ann_ivf_topk": ivf_ann_rowsonly,
}


def all_queries():
    out = {name: fn for name, (fn, _sql) in _QUERIES.items()}
    out.update(_ROWS_ONLY)
    return out


def all_oracle_sql():
    return {name: sql for name, (fn, sql) in _QUERIES.items() if sql is not None}
