"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, heuristic language ID, and rolling-hash fingerprints.

All hot-path logic is column expressions (split / filter / transform /
aggregate) inside whole-stage codegen — no Python UDFs. Ratios are exact
divisions of BIGINT counts, so differential oracles need no quantization.

These cover the training-pipeline text-analysis surface of the brief
(language-ID heuristic, quality scoring, token counting, document
fingerprinting); the reference app itself has no document corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Minimal English function-word list for the stopword-ratio heuristic.
# (A deliberately small, public list — the heuristic needs a stable set,
# not linguistic completeness.)
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "as", "at", "by", "be", "this", "that", "with", "from",
]

# Same idea for Spanish/French, for the language-ID argmax.
ES_STOPWORDS = [
    "el", "la", "los", "las", "de", "en", "que", "y", "un", "una",
    "es", "por", "con", "para", "del", "se", "no", "al", "lo", "como",
]
FR_STOPWORDS = [
    "le", "la", "les", "de", "des", "un", "une", "et", "en", "que",
    "est", "pour", "dans", "qui", "par", "sur", "au", "pas", "ce", "il",
]

FP_P = 2_147_483_647  # fingerprint modulus (2^31-1)


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the documents table is single-space
    separated; real corpora would regex-split first)."""
    return F.split(col, " ")


def word_token_count(col: Column) -> Column:
    """BPE-ish token proxy: count of maximal [a-z0-9]+ runs, lowercase.
    Uses regexp_count so the scan never materializes the match array."""
    return F.regexp_count(F.lower(col), F.lit("[a-z0-9]+"))


def stopword_ratio(tok_col: Column, stopwords: list[str]) -> Column:
    """Fraction of tokens that are function words — exact BIGINT/BIGINT
    division."""
    hits = F.size(F.filter(tok_col, lambda t: t.isin(stopwords)))
    return hits.cast("double") / F.size(tok_col)


def doc_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Per-document quality metrics + pass/fail decision.

    Metrics follow the usual corpus-filter recipe: token count bounds,
    mean token length bounds, stopword-ratio ceiling. One projection over
    the scan; no shuffle.
    """
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    mean_len = (
        F.aggregate(t, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x))
        .cast("double")
        / n_tok
    )
    sw = stopword_ratio(t, EN_STOPWORDS)
    passed = (
        (n_tok >= 10)
        & (n_tok <= 400)
        & (mean_len >= 2.0)
        & (mean_len <= 12.0)
        & (sw <= 0.5)
    )
    return docs.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in (keep_cols or [])],
        n_tok.alias("n_tokens"),
        mean_len.alias("mean_token_len"),
        sw.alias("stopword_ratio"),
        passed.alias("quality_pass"),
    )


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: stopword-hit ratio per language, argmax with
    an 'unknown' floor. Deterministic ties break by language code order
    (en < es < fr by construction below).

    Plan shape: explode the tokens once and count hits per language with
    conditional sums (``isin`` against a literal set compiles to an InSet
    inside whole-stage codegen), then a single shuffle of four BIGINTs per
    document. The earlier formulation — three higher-order ``filter``
    lambdas per row — fell out of codegen and re-tokenized each row ~7×.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("tok"),
    )
    hits = toks.groupBy("doc_id").agg(
        F.sum(F.when(F.col("tok").isin(EN_STOPWORDS), 1).otherwise(0)).alias("h_en"),
        F.sum(F.when(F.col("tok").isin(ES_STOPWORDS), 1).otherwise(0)).alias("h_es"),
        F.sum(F.when(F.col("tok").isin(FR_STOPWORDS), 1).otherwise(0)).alias("h_fr"),
        F.count(F.lit(1)).alias("n_tok"),
    )
    scored = hits.select(
        "doc_id",
        (F.col("h_en").cast("double") / F.col("n_tok")).alias("score_en"),
        (F.col("h_es").cast("double") / F.col("n_tok")).alias("score_es"),
        (F.col("h_fr").cast("double") / F.col("n_tok")).alias("score_fr"),
    )
    best = F.greatest(F.col("score_en"), F.col("score_es"), F.col("score_fr"))
    pred = F.when(best < 0.05, F.lit("unknown"))
    for code in ("en", "es", "fr"):  # first max wins → ties break en<es<fr
        pred = pred.when(F.col(f"score_{code}") == best, F.lit(code))
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        F.col("score_en"),
    )


def doc_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Rolling-hash document fingerprint: min over token-trigram window
    hashes h = (tid1·31² + tid2·31 + tid3) mod p.

    Two token-ID modes, mirroring operators/dedup.py:

    - ``xxhash64`` (default, the scale path): tid = xxhash64(tok) folded
      to 31 bits — no dictionary, no global sort, embarrassingly
      parallel. Not oracle-reproducible (DuckDB hashes differ);
      pytest-covered.
    - ``dictionary`` (differential-testing opt-in): tid = rank of the
      token in the sorted distinct-token dictionary; engine-portable
      integer arithmetic the DuckDB oracle reproduces bit-for-bit. The
      global row_number is a single-partition sort — never the default.

    The min-of-window-hashes is the 1-fingerprint special case of
    winnowing.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokens(F.col(text_col))).alias("pos", "tok"),
    )
    if hash_mode == "dictionary":
        d = (
            toks.select("tok")
            .distinct()
            .withColumn("tid", F.row_number().over(Window.orderBy("tok")))
        )
        ids = toks.join(d, "tok").select("doc_id", "pos", "tid")
    elif hash_mode == "xxhash64":
        ids = toks.select(
            "doc_id", "pos", F.pmod(F.xxhash64("tok"), F.lit(FP_P)).alias("tid")
        )
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    seq = ids.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "tid"))), lambda s: s["tid"]
        ).alias("tids")
    )
    w = F.when(
        F.size(F.col("tids")) < window, F.array().cast("array<bigint>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(F.col("tids")) - (window - 1)),
            lambda i: (
                F.element_at(F.col("tids"), i).cast("bigint") * 961
                + F.element_at(F.col("tids"), i + 1) * 31
                + F.element_at(F.col("tids"), i + 2)
            )
            % FP_P,
        )
    )
    return seq.select(
        "doc_id", F.array_min(w).cast("bigint").alias("fingerprint")
    )
