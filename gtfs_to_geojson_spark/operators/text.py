"""Text-analysis operators for training-data pipelines (engine-new).

All pure Column expressions (JVM-side, codegen) — language ID
heuristic, quality scoring, token counting, and a min-shingle document
fingerprint. Each has an exact ANSI-SQL twin in __spark_entry__'s
oracle_sql (same formulas), so every operator is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# marker words per language for the n-gram/stopword language-ID
# heuristic; deliberately tiny and deterministic
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " ist "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " los ", " que ", " y "],
}


def _emit(docs: DataFrame, id_col: str, cols: list[Column], append: bool) -> DataFrame:
    """``append=False`` (default): project to (id, features) — the
    oracle-checked shape. ``append=True``: keep every input column and
    add the features, so a pipeline can chain all text ops in ONE scan
    (each op is pure-Column, so the composition stays a single map
    stage — no joins, no shuffle; tools/text_scale_bench.py)."""
    if append:
        # fail fast on name collisions: select("*", dup) would create a
        # duplicate column that only errors (AMBIGUOUS_REFERENCE) at
        # first downstream use, far from the cause (r4 review finding)
        clash = set(docs.select(*cols).columns) & set(docs.columns)
        if clash:
            raise ValueError(
                f"append=True would duplicate existing column(s) {sorted(clash)}; "
                "drop or rename them first"
            )
        return docs.select("*", *cols)
    return docs.select(F.col(id_col), *cols)


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — (len(x) − len(replace(x,
    needle, ''))) / len(needle); identical formula in SQL."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit("")))
    ) / F.lit(len(needle))


def lang_scores(text: Column) -> dict[str, Column]:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    return {
        lang: sum(_count_occurrences(padded, m) for m in markers)
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", append: bool = False
) -> DataFrame:
    """Predicted language = argmax marker-hit count, deterministic
    tie-break on language code (greatest-of-structs trick, JVM-side)."""
    scores = lang_scores(F.col(text_col))
    structs = [
        F.struct(s.alias("score"), F.lit(-i).alias("prio"), F.lit(lang).alias("lang"))
        for i, (lang, s) in enumerate(sorted(scores.items()))
    ]
    best = F.greatest(*structs)
    return _emit(
        docs,
        id_col,
        [
            best["lang"].alias("pred_lang"),
            best["score"].cast("double").alias("pred_score"),
        ],
        append,
    )


def quality_score(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", append: bool = False
) -> DataFrame:
    """Heuristic quality features + composite score: length, word
    count, mean word length, punctuation ratio, stopword ratio,
    uppercase ratio. Everything regexp/length arithmetic — codegen."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = F.size(F.split(F.trim(t), r"\s+"))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    n_upper = F.length(t) - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    n_stop = sum(_count_occurrences(padded, m) for m in LANG_MARKERS["en"])
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    upper_ratio = n_upper / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    mean_wlen = n_chars / F.greatest(n_words, F.lit(1))
    score = (
        F.lit(1.0)
        - F.least(punct_ratio * 4, F.lit(0.5))
        - F.least(upper_ratio * 2, F.lit(0.3))
        + F.least(stop_ratio, F.lit(0.3))
    )
    return _emit(
        docs,
        id_col,
        [
            n_chars.cast("long").alias("n_chars"),
            n_words.cast("long").alias("n_words"),
            F.round(mean_wlen, 4).alias("mean_word_len"),
            F.round(punct_ratio, 6).alias("punct_ratio"),
            F.round(stop_ratio, 6).alias("stopword_ratio"),
            F.round(score, 6).alias("quality"),
        ],
        append,
    )


def token_count(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", append: bool = False
) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (runs of letters /
    digits / single other chars) — both as pure regexp Columns."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe_ish = F.size(F.regexp_extract_all(t, F.lit(r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"), 1))
    return _emit(
        docs,
        id_col,
        [ws.cast("long").alias("ws_tokens"), bpe_ish.cast("long").alias("bpe_ish_tokens")],
        append,
    )


def fingerprint(
    docs: DataFrame,
    shingle_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    append: bool = False,
) -> DataFrame:
    """Document fingerprint = min md5 over rolling character shingles
    (winnowing-style min-sampling, engine-stable md5 so the oracle
    reproduces it)."""
    s = F.lower(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - shingle_n + 1, F.lit(1))),
        lambda i: s.substr(i, F.lit(shingle_n)),
    )
    return _emit(
        docs,
        id_col,
        [F.array_min(F.transform(grams, lambda g: F.md5(g))).alias("fingerprint")],
        append,
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", append: bool = False
) -> DataFrame:
    """Repetition-based quality signals (Gopher-style filters):
    duplicate-word fraction (1 − |distinct words|/|words|) and
    top-bigram fraction (occurrences of the most frequent word bigram
    / total bigrams). Both pure Column — zero shuffle, zero UDF: the
    bigram mode is a single O(B log B) pass per row (sort the row's
    bigram array, longest equal-run via ``aggregate``), so a
    corpus-wide pass stays one map stage. The run-scan matters:
    Spark's lambda HOFs are interpreted, and a nested
    transform(distinct, b -> filter(bg, …)) form re-evaluates the
    whole ``bg`` construction per OUTER element — measured 42 ms/doc
    on 30-token docs vs ~0.1 ms for this form. An explode→groupBy
    twin would trade the per-row scan for a corpus-wide shuffle."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    n_words = F.size(toks)
    dup_word_frac = F.lit(1.0) - F.size(F.array_distinct(toks)) / F.greatest(n_words, F.lit(1))
    bg = F.when(
        n_words >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_words - 1, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def _merge(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_cnt = F.aggregate(F.array_sort(bg), acc0, _merge, lambda acc: acc["best"])
    top_bigram_frac = top_cnt / F.greatest(F.size(bg), F.lit(1))
    return _emit(
        docs,
        id_col,
        [
            n_words.cast("long").alias("n_words"),
            F.round(dup_word_frac, 6).alias("dup_word_frac"),
            F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
        ],
        append,
    )


# PII patterns restricted to the regex subset where Java (Spark) and
# RE2 (DuckDB, the oracle) agree exactly: character classes, bounded/
# unbounded counted repeats, ASCII \b. No backrefs, no lookaround.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{7,15}\b", "<PHONE>"),
]


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", append: bool = False
) -> DataFrame:
    """PII detection + redaction — per doc, the match count of each
    pattern on the ORIGINAL text (n_email, n_ssn, n_ipv4, n_phone) and
    the text with every match replaced by its typed placeholder, in
    the fixed PII_PATTERNS order (email first, so its digit runs are
    gone before the phone/ip patterns scan).

    Pure-Column (regexp_count + chained regexp_replace), so it fuses
    into the same single map stage as the other text ops under
    ``append=True`` — a 100-TB scrub is a scan with zero shuffle.
    Counts may overlap when one substring matches two patterns; both
    engines count identically, and redaction (sequential) never
    double-replaces."""
    t = F.col(text_col)
    counts = [
        F.regexp_count(t, F.lit(pat)).cast("long").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    red = t
    for _, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return _emit(docs, id_col, counts + [red.alias("redacted")], append)


def tfidf_topk(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    log_idf: bool = True,
    broadcast_vocab: bool = False,
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF (keyword
    extraction / topicality scoring for corpus curation). Returns
    (id, term_rank, term, tf, df, tfidf) — ``term_rank`` is 1-based,
    ordered by score DESC with an exact deterministic tie-break on
    term ASC.

    Scale shape: term counts are one (id, term) groupBy with map-side
    partial aggregation; the document-frequency side has ONE row per
    term, so the tf⋈df join can never explode — by default it is a
    shuffled join (AQE handles any residual skew; the right choice
    when the token vocabulary is web-scale unbounded), or pass
    ``broadcast_vocab=True`` when the vocabulary is known-bounded to
    skip the corpus-side term shuffle entirely. The corpus size N
    enters as a broadcast 1-row aggregate (crossJoin) — never a
    driver-side collect. Per-doc top-k is a row_number window keyed
    on the id.

    ``log_idf=False`` scores tf·(N+1)/(df+1) — pure IEEE rational
    arithmetic, bit-identical across engines, so the DuckDB oracle
    pins it exactly (`tfidf_topk` in oracle_queries). ``log_idf=True``
    is the standard tf·(ln((N+1)/(df+1))+1), pinned in pytest against
    math.log (ln is correctly-rounded-per-libm, not cross-engine
    bit-stable, so it stays out of the hash gate)."""
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))

    ratio = (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    idf = (F.log(ratio) + F.lit(1.0)) if log_idf else ratio
    dim = F.broadcast(dfreq) if broadcast_vocab else dfreq
    scored = (
        tf.join(dim, "term")
        .join(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("term"),
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            (F.col("tf") * idf).alias("score"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(
            F.col(id_col),
            F.col("term_rank"),
            F.col("term"),
            F.col("tf"),
            F.col("df"),
            F.round(F.col("score"), 6).alias("tfidf"),
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates_per_million: dict[str, int],
    default_rate: int = 0,
) -> DataFrame:
    """Deterministic stratified downsampling (training-data op): a row
    survives iff its md5-derived id hash lands under its stratum's
    per-million rate. No RNG state, no shuffle, re-runnable — the same
    subset falls out on every engine and every run (the property that
    makes a training-data cut auditable). Rates are integers per
    million, so the threshold compare is exact integer arithmetic."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast("long")
    bucket = F.pmod(h, F.lit(1_000_000))
    rate = F.lit(default_rate)
    for stratum, r in rates_per_million.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(int(r))).otherwise(rate)
    return df.filter(bucket < rate)
