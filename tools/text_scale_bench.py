"""Composed text-analysis throughput at corpus scale.

One pass over the dedup-bench corpus (reuses its parquet; see
tools/dedup_scale_bench.py) computing ALL text-family features in a
single projection — lang-id, quality score, stopword ratio, token
counts, fingerprint — the way a training-data pipeline actually runs
them (one scan, one output), not one job per feature. Everything is
pure-Column JVM (COVERAGE.md), so this is a map-only job: no shuffle,
wall time scales with rows/cores, and the aggregate at the end is a
few doubles.

Usage: python tools/text_scale_bench.py  (env: SPARK_GRAFT_DEDUP_DOCS
default 50_000_000, SPARK_GRAFT_DEDUP_HOT default 10_000 — must match
an existing dedup-bench corpus, or it will be built).
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

    spark = get_spark(
        app_name="text-scale-bench",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_docs(spark, n_docs, hot_m, docs_path)
    docs = spark.read.parquet(docs_path)

    t0 = time.time()
    # .drop("n_words"): quality_score and repetition_stats both emit it
    # (same formula) — the append-collision guard would fire; the drop
    # is a projection inside the same map stage
    feats = text.pii_scrub(
        text.repetition_stats(
            text.fingerprint(
                text.token_count(
                    text.quality_score(text.lang_id(docs, append=True), append=True),
                    append=True,
                ),
                append=True,
            ).drop("n_words"),
            append=True,
        ),
        append=True,
    )
    # aggregate instead of count(): count() would let Catalyst prune
    # every feature column out of the plan (same lesson as the r1 KMV
    # bench) — summing each feature forces full evaluation
    row = feats.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("quality").cast("double")).alias("q"),
        F.sum("ws_tokens").alias("t"),
        F.sum(F.col("stopword_ratio").cast("double")).alias("s"),
        F.count_distinct("fingerprint").alias("fp"),
        F.count_distinct("pred_lang").alias("langs"),
        F.sum("dup_word_frac").alias("dw"),
        F.sum("top_bigram_frac").alias("tb"),
        # pii columns summed (and redacted length) so the scrub's
        # regexes can't be pruned out of the measured pass
        (F.sum("n_email") + F.sum("n_ssn") + F.sum("n_ipv4") + F.sum("n_phone")).alias("pii"),
        F.sum(F.length("redacted")).alias("red_len"),
    ).collect()[0]
    dt = time.time() - t0

    out = {
        "n_docs": n_docs, "cpus": cpus,
        "text_all_features_sec": round(dt, 1),
        "docs_per_sec": round(n_docs / dt, 0),
        "distinct_fingerprints": row["fp"],
        "distinct_langs": row["langs"],
        "mean_dup_word_frac": round(row["dw"] / n_docs, 4),
        "mean_top_bigram_frac": round(row["tb"] / n_docs, 4),
        "pii_hits": int(row["pii"]),
        "redacted_chars": int(row["red_len"]),
    }
    assert row["n"] == n_docs
    assert row["pii"] == 0  # md5-hex corpus: any hit is a regex bug
    print(json.dumps(out))


if __name__ == "__main__":
    main()
