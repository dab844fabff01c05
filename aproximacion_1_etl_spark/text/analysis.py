"""Text analysis for training-data pipelines (SURVEY.md §2.10):
language-ID, quality scoring, token counting, document fingerprinting.

All pure Column expressions (JVM-side, codegen-friendly) and all
deterministic, so every metric is DuckDB-oracle-checkable. Heuristics
are intentionally simple and documented — the point is the engine
plumbing (each runs as one scan + narrow projections, no shuffles
except final aggregation), not linguistic accuracy.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# Tiny per-language stopword markers for the n-gram/stopword heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "es": ["el", "la", "de", "que", "los", "una"],
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "fr": ["le", "les", "des", "est", "une", "dans"],
    "en": ["the", "and", "of", "is", "that", "with"],
}

# BPE-ish pretokenizer: letter runs | digit runs | single non-alnum
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(F.split(F.trim(text), "\\s+"))


def regex_token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, and punctuation
    each count as one token (a cheap proxy for subword token budgets)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0)))


def _marker_hits(text: Column, words: list[str]) -> Column:
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    hits: Column = F.lit(0)
    for w in words:
        hits = hits + F.when(padded.contains(f" {w} "), 1).otherwise(0)
    return hits


def lang_id(text: Column) -> Column:
    """Heuristic language ID: CJK char presence -> 'zh'; else the
    language whose stopword markers hit most (>=1); else 'und'.

    Deterministic tie-break: fixed evaluation order es > de > fr > en
    (first max wins).
    """
    zh = text.rlike("[\\u4e00-\\u9fff]")
    scores = {lang: _marker_hits(text, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    expr = F.when(zh, F.lit("zh"))
    for lang in ("es", "de", "fr", "en"):
        expr = expr.when(
            (best >= 1) & (scores[lang] == best), F.lit(lang)
        )
    return expr.otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Quality score in [0,1]: length band + punctuation ratio +
    alpha ratio + mean word length band. Deterministic arithmetic only.

    score = 0.25*len_ok + 0.25*(1 - punct_ratio) + 0.25*alpha_ratio
          + 0.25*wordlen_ok, rounded to 4 decimals.
    """
    n = F.length(text)
    n_safe = F.greatest(n, F.lit(1))
    punct = F.size(
        F.regexp_extract_all(text, F.lit("[^A-Za-z0-9\\s]"), F.lit(0))
    )
    alpha = F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]"), F.lit(0)))
    words = F.size(F.split(F.trim(text), "\\s+"))
    mean_wl = n / F.greatest(words, F.lit(1))
    len_ok = F.when((n >= 100) & (n <= 20000), 1.0).otherwise(0.0)
    wordlen_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 12.0), 1.0).otherwise(0.0)
    score = (
        0.25 * len_ok
        + 0.25 * (1.0 - punct / n_safe)
        + 0.25 * (alpha / n_safe)
        + 0.25 * wordlen_ok
    )
    # portable floor-round (engines disagree on native round() halves)
    return F.floor(score * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def fingerprint(text: Column) -> Column:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set of the normalized text. Two docs with the same
    bag-of-words (ignoring order/multiplicity) collide — the classic
    cheap near-dup key, one narrow projection per doc."""
    toks = F.array_sort(
        F.array_distinct(
            F.split(F.trim(F.regexp_replace(F.lower(text), "\\s+", " ")), " ")
        )
    )
    return F.md5(F.concat_ws("\x01", toks))


def tfidf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_k: int = 5,
) -> DataFrame:
    """Per-language top-k terms by corpus TF-IDF.

    tokens = lowercase [a-z]+ runs; per (lang, term):
    score = total_tf * ln((n_docs_lang + 1) / (df + 1)), floor-rounded
    to 4 decimals; rank by (score desc, term asc) — fully deterministic
    so both engines agree. Three aggregations, each keyed and
    partial-agg shrunk (per-doc term counts -> per-lang term stats ->
    per-lang top-k window over |distinct terms| rows, never raw
    tokens).
    """
    from pyspark.sql import Window

    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit("[a-z]+"), F.lit(0)
    )
    term_doc = (
        docs.select("doc_id", F.col(lang_col).alias("lang"), toks.alias("t"))
        .select("doc_id", "lang", F.explode("t").alias("term"))
        .groupBy("lang", "doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    term_stats = term_doc.groupBy("lang", "term").agg(
        F.sum("tf").alias("total_tf"),
        F.count("*").alias("df"),
    )
    n_docs = docs.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count("*").alias("n_docs")
    )
    scored = term_stats.join(F.broadcast(n_docs), "lang").select(
        "lang",
        "term",
        F.col("total_tf").cast("bigint").alias("total_tf"),
        F.col("df").cast("bigint").alias("df"),
        (
            F.floor(
                F.col("total_tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("tfidf"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("lang", "term", "total_tf", "df", "tfidf", "rank")
    )


def document_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All metrics in one scan — the per-document profile table."""
    t = F.col(text_col)
    return docs.select(
        "*",
        token_count(t).alias("n_tokens"),
        regex_token_count(t).alias("n_bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )
