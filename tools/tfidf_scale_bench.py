"""TF-IDF keyword extraction at corpus scale, with a closed-form
structural ground truth.

Reuses the dedup-bench corpus (tools/dedup_scale_bench.py:build_docs):
every doc is exactly two distinct md5-hex terms, a pure function of
its duplicate-group id — so document frequencies are known exactly by
construction (one 10k-member hot group, n_grouped/4 groups of 4, the
rest singletons), giving a web-shaped vocabulary: ~2·(1 + n_grouped/4
+ singletons) distinct terms, df skewed 1 / 4 / 10,000.

What this measures (the one text op with a real shuffle): the
(id, term) tf groupBy, the per-term df aggregate, the tf⋈df SHUFFLED
vocabulary join (broadcast_vocab=False — the web-scale unbounded-vocab
path the operator defaults to), and the per-doc top-k window, at
~2·n_docs tf rows. Ground truth checked exactly:

* output rows = 2·n_docs (k=3 > 2 distinct terms per doc; ranks 1-2)
* df histogram of output rows = {10000: 2·hot_m, 4: 2·n_grouped,
  1: 2·singletons} — pins the df aggregate AND the join fan-out
* rank-1 row count = n_docs (window correctness)

Usage: python tools/tfidf_scale_bench.py  (env: SPARK_GRAFT_DEDUP_DOCS
default 50_000_000, SPARK_GRAFT_DEDUP_HOT default 10_000).
Prints one JSON line; paste into BENCH/ROBUSTNESS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import text
    from gtfs_to_geojson_spark.session import get_spark

    sys.path.insert(0, "tools")
    from dedup_scale_bench import build_docs

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else (os.cpu_count() or 8)
    n_docs = int(os.environ.get("SPARK_GRAFT_DEDUP_DOCS", "50000000"))
    hot_m = int(os.environ.get("SPARK_GRAFT_DEDUP_HOT", "10000"))
    docs_path = f"/tmp/spark_graft_dedup_docs_{n_docs}_{hot_m}.parquet"

    n_grouped = (n_docs // 10) // 4 * 4
    singletons = n_docs - hot_m - n_grouped

    spark = get_spark(
        app_name="tfidf-scale-bench",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_docs(spark, n_docs, hot_m, docs_path)
    docs = spark.read.parquet(docs_path)

    out_df = text.tfidf_topk(docs, k=3, log_idf=False)
    t0 = time.time()
    # one aggregate forces full evaluation and yields every check at
    # once: total rows, rank-1 rows, and the df histogram
    rows = (
        out_df.groupBy("df")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("term_rank") == 1, 1).otherwise(0)).alias("n_rank1"),
            F.max("term_rank").alias("max_rank"),
        )
        .collect()
    )
    dt = time.time() - t0

    hist = {int(r["df"]): int(r["n_rows"]) for r in rows}
    n_rank1 = sum(int(r["n_rank1"]) for r in rows)
    max_rank = max(int(r["max_rank"]) for r in rows)
    expect_hist = {10000: 2 * hot_m, 4: 2 * n_grouped, 1: 2 * singletons}
    ok = hist == expect_hist and n_rank1 == n_docs and max_rank == 2

    out = {
        "n_docs": n_docs,
        "hot_m": hot_m,
        "cpus": cpus,
        "tf_rows": 2 * n_docs,
        "tfidf_sec": round(dt, 1),
        "docs_per_sec": round(n_docs / dt, 0),
        "df_histogram": {str(k): v for k, v in sorted(hist.items())},
        "df_histogram_exact_match": hist == expect_hist,
        "rank1_rows": n_rank1,
        "structural_ground_truth_ok": bool(ok),
    }
    print(json.dumps(out))
    if not ok:
        raise SystemExit(f"structural ground truth NOT recovered: {out}")


if __name__ == "__main__":
    main()
