"""Test-set decontamination throughput at corpus scale, with an exact
planted ground truth.

Corpus: N train docs of W words each, every word globally unique
(md5(doc,pos) prefix) — so natural gram collisions are impossible and
the expected answer is closed-form. Eval set: E docs, each copying a
contiguous 5-word window from train doc T(e) = (e·4999) mod N
(4999 ∤ N ⇒ injective) plus 10 unique filler words. With word
3-grams, exactly E train docs are contaminated, each with exactly
5−3+1 = 3 matching grams; every other train doc shares none.

What this measures (the 100-TB plan shape from COVERAGE.md): the
train side is scan → explode (~(W−2)·N grams) → broadcast hash join
→ partial agg, with NO train-side shuffle before the join — the only
exchange carries per-doc hit counts of join survivors (E·1 rows).

Usage: python tools/decontam_scale_bench.py
(env: SPARK_GRAFT_DECON_DOCS default 10_000_000, SPARK_GRAFT_DECON_EVAL
default 10_000, SPARK_GRAFT_DECON_WORDS default 24).
Prints one JSON line; paste into BENCH/ROBUSTNESS.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")


def build_train(spark, n_docs: int, n_words: int, path: str):
    from pyspark.sql import functions as F

    if os.path.exists(path):
        return
    ids = spark.range(n_docs)
    words = [
        F.substring(F.md5(F.concat_ws(":", F.lit("w"), F.col("id"), F.lit(j))), 1, 8)
        for j in range(n_words)
    ]
    ids.select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    ).repartition(256).write.mode("overwrite").parquet(path)


def build_eval(spark, n_eval: int, n_docs: int, path: str):
    """Eval doc e = words 10..14 of train doc (e·4999) mod n_docs + 10
    unique fillers (same md5 derivation as build_train for the copied
    window, different salt for fillers)."""
    from pyspark.sql import functions as F

    if os.path.exists(path):
        return
    ids = spark.range(n_eval)
    t = (F.col("id") * 4999) % n_docs
    copied = [
        F.substring(F.md5(F.concat_ws(":", F.lit("w"), t, F.lit(j))), 1, 8)
        for j in range(10, 15)
    ]
    filler = [
        F.substring(F.md5(F.concat_ws(":", F.lit("e"), F.col("id"), F.lit(j))), 1, 8)
        for j in range(10)
    ]
    ids.select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *(copied + filler)).alias("text"),
    ).coalesce(1).write.mode("overwrite").parquet(path)


def main():
    from pyspark.sql import functions as F

    from gtfs_to_geojson_spark.operators import dedup
    from gtfs_to_geojson_spark.session import get_spark

    cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
    cpus = int(cpus_env) if cpus_env else (os.cpu_count() or 8)
    n_docs = int(os.environ.get("SPARK_GRAFT_DECON_DOCS", "10000000"))
    n_eval = int(os.environ.get("SPARK_GRAFT_DECON_EVAL", "10000"))
    n_words = int(os.environ.get("SPARK_GRAFT_DECON_WORDS", "24"))
    train_path = f"/tmp/spark_graft_decon_train_{n_docs}_{n_words}.parquet"
    eval_path = f"/tmp/spark_graft_decon_eval_{n_eval}_{n_docs}.parquet"

    spark = get_spark(
        app_name="decontam-scale-bench",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_train(spark, n_docs, n_words, train_path)
    build_eval(spark, n_eval, n_docs, eval_path)
    train = spark.read.parquet(train_path)
    ev = spark.read.parquet(eval_path)

    out_df = dedup.decontaminate(train, ev, n=3)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, "train side must consume eval grams via BHJ"

    t0 = time.time()
    agg = out_df.agg(
        F.count(F.lit(1)).alias("n_contaminated_docs"),
        F.sum("n_contaminated").alias("total_gram_hits"),
        F.min("n_contaminated").alias("min_hits"),
        F.max("n_contaminated").alias("max_hits"),
    ).collect()[0]
    dt = time.time() - t0

    expect_docs = n_eval  # T(e) injective: 4999 must not divide n_docs
    ok = (
        agg["n_contaminated_docs"] == expect_docs
        and agg["min_hits"] == 3
        and agg["max_hits"] == 3
        and agg["total_gram_hits"] == 3 * expect_docs
    )
    out = {
        "n_train_docs": n_docs,
        "n_eval_docs": n_eval,
        "words_per_doc": n_words,
        "train_grams": (n_words - 2) * n_docs,
        "cpus": cpus,
        "decontam_sec": round(dt, 1),
        "train_docs_per_sec": round(n_docs / dt, 0),
        "contaminated_docs": agg["n_contaminated_docs"],
        "gram_hits": agg["total_gram_hits"],
        "exact_planted_recovery": bool(ok),
    }

    # ---- Bloom-prefiltered variant (huge-eval regime), same ground
    # truth.  Sized at ~16 bits/eval-gram (k=5 -> fp ~0.1%): the
    # interesting measured number is the survivor count -- how many of
    # the train_grams reach the exact verify join (true hits + fp)
    # instead of all of them reaching a sort-merge join in the
    # no-broadcast-possible regime this variant exists for.
    if os.environ.get("SPARK_GRAFT_DECON_BLOOM", "1") == "1":
        from gtfs_to_geojson_spark.operators.dedup import (
            bloom_build,
            bloom_probe,
            word_ngrams,
        )

        eval_grams = 13 * n_eval  # 15 words -> 13 word-3-grams per eval doc
        n_bits = 1 << max(10, (16 * eval_grams - 1).bit_length())
        bdf = dedup.decontaminate_bloom(train, ev, n=3, n_bits=n_bits, n_hashes=5)
        bplan = bdf._jdf.queryExecution().executedPlan().toString()
        # the probe must be a plain codegen filter — the ONLY join in
        # the plan is the survivor verify equi-join (a BNLJ attach ran
        # interpreted, 10x slower)
        assert "BroadcastNestedLoopJoin" not in bplan, "probe regressed to BNLJ attach"
        assert "BatchEvalPython" not in bplan and "ArrowEval" not in bplan
        t0 = time.time()
        bagg = bdf.agg(
            F.count(F.lit(1)).alias("n_contaminated_docs"),
            F.sum("n_contaminated").alias("total_gram_hits"),
            F.min("n_contaminated").alias("min_hits"),
            F.max("n_contaminated").alias("max_hits"),
        ).collect()[0]
        bdt = time.time() - t0
        bok = (
            bagg["n_contaminated_docs"] == expect_docs
            and bagg["min_hits"] == 3
            and bagg["max_hits"] == 3
            and bagg["total_gram_hits"] == 3 * expect_docs
        )
        # separate pass: survivors of the prefilter alone (what the
        # verify join actually has to consume)
        eg = word_ngrams(ev, n=3).select("gram").distinct()
        bloom = bloom_build(eg, "gram", n_bits=n_bits, n_hashes=5)
        tg = word_ngrams(train, n=3)
        t0 = time.time()
        n_surv = bloom_probe(tg, "gram", bloom, n_bits=n_bits, n_hashes=5).count()
        sdt = time.time() - t0
        out.update(
            {
                "bloom_n_bits": n_bits,
                "bloom_mib": round(n_bits / 8 / 1048576, 2),
                "bloom_decontam_sec": round(bdt, 1),
                "bloom_exact_planted_recovery": bool(bok),
                "bloom_survivor_grams": n_surv,
                "bloom_survivor_frac": round(n_surv / ((n_words - 2) * n_docs), 8),
                "bloom_probe_only_sec": round(sdt, 1),
            }
        )
        ok = ok and bok

    print(json.dumps(out))
    if not ok:
        raise SystemExit(f"planted ground truth NOT recovered: {out}")


if __name__ == "__main__":
    main()
