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


# The catalog's BM25 benchmark query sets (q_bm25_topk and its
# generated oracle both derive from this single definition).
BM25_QUERIES: dict[int, list[str]] = {
    0: ["join", "hash", "scan"],
    1: ["merge", "sort"],
    2: ["customer", "order", "filter", "slow"],
}


def bm25_topk(
    docs: DataFrame,
    queries: dict[int, list[str]],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed BM25 retrieval scoring: top-``k`` documents per
    query-term set. The index statistics (per-doc term frequencies,
    per-term document frequencies, corpus size / average length) are
    computed in-plan; no materialized inverted index is needed for
    batch scoring, which is exactly the shape of a
    retrieval-for-deduplication or RAG-corpus-construction pass.

    Plan: ONE shuffle builds tf over (doc, term) — the doc length rides
    the explode so it needs no second pass — then everything downstream
    is filtered to the query terms first (a broadcast semi-join against
    the tiny query relation), so df/score/rank operate on
    |matching docs| rows, never the corpus. Corpus stats enter as an
    in-plan broadcast 1-row aggregate. Score sums are decimal-cast
    (order-independent) and idf/length normalization mirror the DuckDB
    oracle operand-for-operand, so the key is fully value-checked.
    """
    from pyspark.sql import Window

    spark = docs.sparkSession
    qrows = [
        (qid, t) for qid, terms in sorted(queries.items())
        for t in sorted(set(terms))
    ]
    qdf = spark.createDataFrame(qrows, "query_id INT, term STRING")

    splitc = F.split(F.col(text_col), " ")
    # rebalance before the token fan-out (single-file local inputs scan
    # as one partition; see lm_trigram_score for the rule)
    spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    toks = spread.select(
        id_col, F.size(splitc).alias("dl"), F.explode(splitc).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(
        F.max("dl").alias("dl"), F.count("*").alias("tf")
    )
    qterms = qdf.select("term").distinct()
    qtf = tf.join(F.broadcast(qterms), "term")
    df0 = qtf.groupBy("term").agg(F.count("*").alias("df"))
    # Corpus stats off the SAME rebalance exchange the tf branch reads —
    # not a second scan of docs (at 100 TB that would re-read and
    # re-tokenize the corpus for two scalars). ``spread`` has one row
    # per doc, so a direct agg needs no per-doc groupBy, and AQE's
    # stage reuse materializes the repartition exchange once and feeds
    # all three consumers (tf, df0's tf, stats) from it: the executed
    # plan shows ONE FileScan of documents + ReusedExchange markers.
    # avg is computed as exact-int sum / exact count in one double
    # division, bit-identical to the oracle's avg(len(string_split)).
    stats = spread.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.size(splitc)).alias("avgdl"),
    )
    return bm25_score_from_index(
        qtf, df0, stats, qdf, k=k, k1=k1, b=b, id_col=id_col
    )


def bm25_score_from_index(
    qtf: DataFrame,
    df0: DataFrame,
    stats: DataFrame,
    qdf: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
) -> DataFrame:
    """The BM25 scoring tail over INDEX RELATIONS — extracted from
    ``bm25_topk`` so a MAINTAINED index (persisted postings / df /
    corpus stats folded forward per batch, fold_bm25_index) scores
    through the IDENTICAL expressions as the from-scratch pass:
    ``qtf`` = (term, <id_col>, dl, tf) postings already restricted to
    query terms, ``df0`` = (term, df), ``stats`` = one row
    (n_docs, avgdl), ``qdf`` = (query_id, term). idf / length-norm
    mirror the DuckDB oracle operand-for-operand; score sums are
    decimal-cast (order-independent); ties break on ascending id."""
    from pyspark.sql import Window

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    norm = F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / F.col("avgdl")
    contrib = (
        qtf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(df0), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            id_col,
            (
                idf
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (F.col("tf") + F.lit(k1) * norm)
            ).alias("c"),
        )
    )
    score = contrib.groupBy("query_id", id_col).agg(
        F.sum(F.col("c").cast("decimal(38,18)")).cast("double").alias("s")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col(id_col).asc()
    )
    return (
        score.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            (F.floor(F.col("s") * 10000.0 + 0.5) / 10000.0).alias("score"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def bm25_index(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """MATERIALIZED BM25 inverted-index relations from a document
    batch — what a maintained retrieval index persists (bm25_topk
    computes the same statistics in-plan for one-shot scoring):
    (postings, df, stats) where postings = (term, <id_col>, dl, tf),
    df = (term, df), and stats = one row (n_docs, total_dl) with
    total_dl an EXACT integer sum — the fold stores totals, never
    averages, so the folded avgdl (one double division of exact
    integers) is bit-identical to a from-scratch pass at any fold
    depth. One shuffle builds the postings; df is a reduce of them;
    at 100 TB the persisted postings bucket by term so query-term
    lookups are pruned reads."""
    splitc = F.split(F.col(text_col), " ")
    spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    toks = spread.select(
        id_col, F.size(splitc).alias("dl"), F.explode(splitc).alias("term")
    )
    postings = toks.groupBy(id_col, "term").agg(
        F.max("dl").alias("dl"), F.count("*").alias("tf")
    )
    df0 = postings.groupBy("term").agg(F.count("*").alias("df"))
    # coalesce: SUM over zero rows is NULL, and an EMPTY batch is
    # normal in a maintained deployment (a no-new-docs day) — without
    # it fold_bm25_index would add NULL into the running total_dl and
    # permanently poison avgdl (ADVICE r10 #1); an empty batch must
    # fold as (0 docs, 0 tokens), a no-op.
    stats = spread.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(F.size(splitc)), F.lit(0))
        .cast("bigint")
        .alias("total_dl"),
    )
    return postings, df0, stats


def fold_bm25_index(
    postings: DataFrame,
    df0: DataFrame,
    stats: DataFrame,
    new_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    guard_redelivery: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fold a batch of NEW documents into a maintained BM25 index —
    the retrieval-freshness member of the maintained-state family:
    only the batch is tokenized; postings append, per-term dfs ADD
    through a full-outer coalesce join (O(|store terms| + |batch
    terms|), never a corpus rescan), and the 1-row totals add.
    Scoring the folded index through ``bm25_score_from_index`` must
    equal a from-scratch ``bm25_topk`` over the full corpus — the
    catalog key's oracle is exactly that rebuild.

    RE-DELIVERY GUARD (``guard_redelivery``, default on — VERDICT r10
    task 1): under at-least-once delivery a micro-batch can arrive
    twice, and an unguarded append would silently double-count
    df/tf/totals and drift the index — the failure class the TTL
    stream's ``assert_watermark_monotone`` and the notify sink's
    exactly-once ledger already guard elsewhere. Before tokenizing,
    the batch is anti-joined against the store's doc ids: ``seen`` is
    the store-side semi-join of postings against the BROADCAST batch
    ids, so both joins are map-side and the intermediate relation is
    bounded by the batch's key count, never the store's. A fully
    re-delivered batch folds as empty — a no-op (the empty-batch
    stats coalesce in ``bm25_index`` makes the totals add 0, not
    NULL). The one store-postings scan is the local-mode cost; a
    production deployment reads a doc-id ledger relation (the
    bucketed sidecar the notify sink's ledger models) instead of the
    postings themselves. The guard also dedups WITHIN the batch
    (ADVICE r11 #3): two deliveries compacted into ONE trigger — the
    same doc twice in one micro-batch — would pass a store-only
    anti-join and still double-count tf/df/totals, so the batch is
    ``dropDuplicates(id)``-ed first (batch-bounded, one shuffle of
    the batch). Disjointness is thus ENFORCED, not assumed: a doc can
    only ever be counted once, whatever the delivery semantics."""
    if guard_redelivery:
        new_docs = new_docs.dropDuplicates([id_col])
        batch_ids = new_docs.select(id_col).distinct()
        seen = (
            postings.join(F.broadcast(batch_ids), id_col, "left_semi")
            .select(id_col)
            .distinct()
        )
        # lineage cut: the guarded batch feeds three outputs
        # (postings/df/stats) — without the cut each replans the
        # store-scan guard subtree (+10 exchanges on the catalog key's
        # plan contract); lazy so the fold stays action-free until the
        # caller evaluates
        new_docs = new_docs.join(
            F.broadcast(seen), id_col, "left_anti"
        ).localCheckpoint(eager=False)
    np_, ndf, nst = bm25_index(new_docs, text_col=text_col, id_col=id_col)
    postings2 = postings.unionByName(np_)
    df2 = (
        df0.withColumnRenamed("df", "_a")
        .join(ndf.withColumnRenamed("df", "_b"), "term", "full_outer")
        .select(
            "term",
            (
                F.coalesce(F.col("_a"), F.lit(0))
                + F.coalesce(F.col("_b"), F.lit(0))
            ).alias("df"),
        )
    )
    stats2 = (
        stats.select(
            F.col("n_docs").alias("_n1"), F.col("total_dl").alias("_t1")
        )
        .crossJoin(
            nst.select(
                F.col("n_docs").alias("_n2"),
                F.col("total_dl").alias("_t2"),
            )
        )
        .select(
            (F.col("_n1") + F.col("_n2")).alias("n_docs"),
            (F.col("_t1") + F.col("_t2")).cast("bigint").alias("total_dl"),
        )
    )
    return postings2, df2, stats2


def forget_bm25_index(
    postings: DataFrame,
    df0: DataFrame,
    stats: DataFrame,
    deleted_ids: DataFrame,
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """DELETE documents from a maintained BM25 index — the governance
    edge of the retrieval family (pairs with ``fold_bm25_index`` the
    way ``forget_doc_clusters`` pairs with ``fold_dup_clusters``): an
    RTBF wave must disappear from retrieval without a corpus rescan.

    All three relations shrink through the deleted docs' OWN postings,
    bounded by the wave (the fold guard's semi/anti device): postings
    anti-join the broadcast deleted ids; per-term dfs DECREMENT by the
    removed docs' term counts (a left join of the full-vocab df
    against the |deleted terms|-sized broadcast decrement relation —
    terms whose df reaches 0 drop out, exactly what a from-scratch
    build over the remaining corpus produces); and the 1-row totals
    subtract the removed docs' exact-integer counts. Scoring the
    shrunk index through ``bm25_score_from_index`` must equal a
    from-scratch ``bm25_topk`` over the post-delete corpus — the
    catalog key's oracle IS that rebuild (forget == rebuild).

    Naturally idempotent: forgetting an id with no postings removes
    nothing, so a re-delivered RTBF wave is a no-op. Returns the next
    (postings, df, stats)."""
    del_ids = deleted_ids.select(id_col).distinct()
    removed = postings.join(F.broadcast(del_ids), id_col, "left_semi")
    removed = removed.localCheckpoint(eager=False)
    rm_df = removed.groupBy("term").agg(F.count("*").alias("_rm"))
    rm_stats = (
        removed.groupBy(id_col)
        .agg(F.max("dl").alias("_dl"))
        .agg(
            F.count("*").alias("_n_rm"),
            F.coalesce(F.sum("_dl"), F.lit(0))
            .cast("bigint")
            .alias("_dl_rm"),
        )
    )
    postings2 = postings.join(F.broadcast(del_ids), id_col, "left_anti")
    df2 = (
        df0.join(F.broadcast(rm_df), "term", "left")
        .select(
            "term",
            (F.col("df") - F.coalesce(F.col("_rm"), F.lit(0))).alias(
                "df"
            ),
        )
        .filter(F.col("df") > 0)
    )
    stats2 = stats.crossJoin(F.broadcast(rm_stats)).select(
        (F.col("n_docs") - F.col("_n_rm")).alias("n_docs"),
        (F.col("total_dl") - F.col("_dl_rm"))
        .cast("bigint")
        .alias("total_dl"),
    )
    return postings2, df2, stats2


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    a_rank_name: str = "lex_rank",
    b_rank_name: str = "sem_rank",
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked retrieval lists — the
    standard hybrid-retrieval combiner (Cormack et al., SIGIR'09):
    ``score(d) = sum over systems of 1 / (rrf_k + rank_system(d))``,
    summed only over the systems that retrieved ``d``. Rank-based
    fusion needs no score calibration between BM25 and cosine space,
    which is why it is the default in RAG corpus construction.

    Inputs are two DataFrames shaped (query_id, <id_col>, ..., rank) —
    e.g. ``bm25_topk`` output and ``ann_topk_bruteforce`` output. Both
    are top-``depth``-per-query relations: bounded by |queries| x depth
    rows regardless of corpus size, so the fusion join, window, and
    output never touch corpus-sized data — at 100 TB the expensive
    work happened upstream in the retrievers; fusion is broadcast-scale
    by construction.

    Determinism: 1/(rrf_k + rank) is one double division of exact
    integers, the two-term sum is a single IEEE addition — bit-identical
    on any engine — and ties break on ascending id.
    """
    a = ranked_a.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col(id_col).cast("bigint").alias(id_col),
        F.col("rank").cast("bigint").alias("rank_a"),
    )
    b = ranked_b.select(
        F.col("query_id").cast("bigint").alias("query_id"),
        F.col(id_col).cast("bigint").alias(id_col),
        F.col("rank").cast("bigint").alias("rank_b"),
    )
    fused = a.join(b, ["query_id", id_col], "full_outer")
    score = F.coalesce(
        F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_a")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(rrf_k) + F.col("rank_b")), F.lit(0.0))
    scored = fused.select(
        "query_id",
        id_col,
        score.alias("s"),
        F.col("rank_a").alias(a_rank_name),
        F.col("rank_b").alias(b_rank_name),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("s").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            (F.floor(F.col("s") * 1000000.0 + 0.5) / 1000000.0).alias(
                "rrf_score"
            ),
            a_rank_name,
            b_rank_name,
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def lm_trigram_score(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Perplexity-style quality scoring with a corpus-trained character
    trigram LM — the classic cheap filter for training-data curation
    (documents that score far below their language's typical log-prob
    are boilerplate/garbage candidates).

    Model and scoring in ONE plan, no separate training artifact:
    per-language conditional probabilities p(c3 | c1c2) =
    count(trigram) / count(prefix-bigram-starting-a-trigram), both read
    from the same trigram-count relation (the prefix marginal is the
    trigram table re-aggregated by its 2-char prefix — no second corpus
    pass). Per-doc score = mean ln p over the doc's trigrams, decimal-
    cast sum so the mean is order-independent and engine-portable.

    Plan shape: char-trigram explode (fan-out ~|chars| per doc) ->
    groupBy (lang, tri) model counts -> broadcast the model (bounded by
    alphabet^3 per language, it IS the model) back onto per-doc
    trigrams -> one keyed groupBy per doc. Two shuffles total; the
    model broadcast replaces a corpus-sized join at any scale.
    """
    doc_tri_counts = _doc_tri_counts(docs, text_col, id_col, lang_col)
    tri_counts = doc_tri_counts.groupBy("lang", "tri").agg(
        F.sum("cnt").alias("c3")
    )
    return lm_score_from_counts(doc_tri_counts, tri_counts, id_col)


def _doc_tri_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """(doc, lang, tri, cnt) — the per-doc character-trigram counts
    that feed BOTH the model aggregation and the scoring join. ONE
    corpus explode: halves the fan-out work vs exploding once per
    branch, and the scoring join runs on distinct doc-trigrams, not
    raw instances. Factored out (r11) so the maintained-LM fold
    tokenizes only its batch through the same definition."""
    t = F.col(text_col)
    tris = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.length(t) - F.lit(2)),
            lambda i: t.substr(i, F.lit(3)),
        )
    )
    # Rebalance BEFORE the trigram fan-out (same rule as the minhash
    # shingle explode): a single-file local input scans as one
    # partition, which would serialize the ~|chars|-per-doc explode on
    # one core; the explicit spread costs one tiny shuffle of the raw
    # docs and buys full-width CPU for the heavy stage.
    spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    # Short-doc guard: for len(text) < 3, sequence(1, len-2) would be
    # DESCENDING (e.g. [1, 0] for a 2-char doc) and emit bogus sub-3-char
    # "trigrams" that pollute the model, while the oracle's
    # generate_series(1, len-2) is simply empty. Drop such docs before
    # the explode so both engines agree (same precedent as word_shingles
    # filtering F.size(toks) >= n in dedup.py).
    return (
        spread.filter(F.length(t) >= 3)
        .select(
            id_col, F.col(lang_col).alias("lang"), tris.alias("tri")
        )
        .groupBy(id_col, "lang", "tri")
        .agg(F.count("*").alias("cnt"))
    )


def lm_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """MATERIALIZED trigram-LM state from a document batch — what a
    maintained LM persists: (lang, tri, c3) exact counts. The prefix
    marginal c2 is DERIVED (the trigram table re-aggregated by its
    2-char prefix), so one relation is the whole model state and the
    fold is a single additive merge."""
    return (
        _doc_tri_counts(docs, text_col, id_col, lang_col)
        .groupBy("lang", "tri")
        .agg(F.sum("cnt").alias("c3"))
    )


def fold_lm_counts(store: DataFrame, batch_counts: DataFrame) -> DataFrame:
    """Fold a batch's trigram counts into the maintained LM state —
    the language-model member of the maintained-state family: exact
    integer counts ADD through a full-outer coalesce merge
    (O(|store triples| + |batch triples|), never a corpus rescan);
    because c2 derives from c3, one merge maintains the whole model,
    and scoring through the folded counts is bit-identical to a
    from-scratch pass (the catalog key's oracle).

    Re-delivery: this function is the RAW additive merge — counts
    carry no doc ids, so IT cannot tell a re-delivered batch from a
    new one. ALL production callers go through
    ``fold_lm_counts_guarded`` (VERDICT r11 'What's wrong' #1 and
    r12 #3), which maintains a doc-id ledger next to the counts and
    anti-joins every batch against it (the BM25/IVF folds' device),
    making a re-delivered micro-batch — and a duplicate doc WITHIN
    one batch — a bit-exact no-op. Since r13 this raw merge is the
    guarded fold's INTERNAL merge step: no query-code caller invokes
    it directly any more (the catalog keys route through the guard
    even though their doc_id-band slices are disjoint by
    construction, so the delivery contract is enforced, not
    assumed)."""
    a = store.select(
        "lang", "tri", F.col("c3").alias("_a")
    )
    b = batch_counts.select(
        "lang", "tri", F.col("c3").alias("_b")
    )
    return a.join(b, ["lang", "tri"], "full_outer").select(
        "lang",
        "tri",
        (
            F.coalesce(F.col("_a"), F.lit(0))
            + F.coalesce(F.col("_b"), F.lit(0))
        ).cast("bigint").alias("c3"),
    )


def fold_lm_counts_guarded(
    store: DataFrame,
    seen_ids: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    doc_counts: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """The DELIVERY-GUARDED maintained-LM fold (VERDICT r11 'What's
    wrong' #1): the raw ``fold_lm_counts`` merge is additive and
    carries no doc ids, so under at-least-once delivery a re-delivered
    micro-batch would silently double-count trigrams and skew every
    subsequent quality score — the exact failure class the BM25/IVF
    folds got guards for in r10. Because the counts relation itself
    cannot carry provenance, the store pairs a DOC-ID LEDGER with the
    counts (the processed-batch-ledger device of sources/notify.py,
    kept as a relation so the guard is one anti-join, never a driver
    round-trip): the batch first drops WITHIN-batch duplicate doc ids
    (two deliveries compacted into one trigger), then anti-joins the
    ledger restricted to the batch's own ids (``already`` is the
    ledger-side semi-join against the BROADCAST batch ids, so both
    joins are map-side and the intermediate is batch-bounded, never
    ledger-sized). A fully re-delivered batch folds as a bit-exact
    no-op. Returns (counts2, ledger2) — the caller persists both
    (two small parquet swaps in the streaming twin).

    ``seen_ids``: 1-column (id_col) relation of every doc id ever
    folded. In production a bucketed sidecar table; |corpus|-keyed but
    only ever probed by batch-bounded broadcast semi-joins.

    ``doc_counts``: optional PER-DOC trigram counts of the (already
    id-unique) batch — ``_doc_tri_counts(batch)`` — when the caller
    needs them anyway for scoring (q_incremental_lm_index scores the
    batch through the folded model): the fold then derives the fresh
    c3 by anti-joining the same pre-computed relation instead of
    tokenizing the batch a second time. Must come from a batch with
    unique ids (a duplicated doc row would double its counts before
    the guard could drop it)."""
    batch = batch.dropDuplicates([id_col])
    batch_ids = batch.select(id_col).distinct()
    already = (
        seen_ids.join(F.broadcast(batch_ids), id_col, "left_semi")
        .select(id_col)
        .distinct()
    )
    fresh = batch.join(
        F.broadcast(already), id_col, "left_anti"
    ).localCheckpoint(eager=False)
    if doc_counts is None:
        fresh_counts = lm_counts(
            fresh, text_col=text_col, id_col=id_col, lang_col=lang_col
        )
    else:
        fresh_counts = (
            doc_counts.join(F.broadcast(already), id_col, "left_anti")
            .groupBy("lang", "tri")
            .agg(F.sum("cnt").alias("c3"))
        )
    counts2 = fold_lm_counts(store, fresh_counts)
    # no .distinct() (ADVICE r12 #3): seen_ids is unique by this
    # function's own output invariant and fresh ids are anti-joined
    # disjoint from it, so the union IS the next unique ledger — a
    # distinct here re-shuffled the whole |corpus|-sized ledger per
    # micro-batch for nothing; the per-wave swap stays
    # O(|ledger| append), shuffle-free
    ledger2 = seen_ids.unionByName(fresh.select(id_col))
    return counts2, ledger2


def forget_lm_counts(
    store: DataFrame, deleted_counts: DataFrame
) -> DataFrame:
    """DELETE documents' trigram counts from the maintained LM state —
    the RTBF edge of the LM member (pairs with ``fold_lm_counts`` the
    way forget_bm25_index pairs with its fold): exact integer counts
    SUBTRACT through the same full-outer merge, and trigrams whose
    count reaches 0 drop out (exactly what retraining on the
    post-delete corpus produces, so forget == rebuild). The deleted
    docs' counts come from their text at delete time (an RTBF request
    carries the doc being erased) — no corpus rescan.

    LOUD on imbalance (VERDICT r11 'What's wrong' #2 — the old
    ``filter(c3 > 0)`` alone was the SILENT behavior its docstring
    denied): subtracting counts that were never folded in — a
    double-delete, or a delete racing its own append — drives some
    trigram below zero, and shared counts corrupted that way only
    surface if an oracle rebuild happens to run. The subtract is now
    guarded by the ``_chunk_key`` in-plan ``raise_error`` device: any
    post-subtract count < 0 raises USER_RAISED_EXCEPTION naming the
    (lang, trigram) instead of silently dropping it — one integer
    compare per row inside whole-stage codegen. Rows that land
    EXACTLY at 0 drop out (the legitimate retrain-match case)."""
    a = store.select("lang", "tri", F.col("c3").alias("_a"))
    b = deleted_counts.select("lang", "tri", F.col("c3").alias("_b"))
    c3 = (
        F.coalesce(F.col("_a"), F.lit(0))
        - F.coalesce(F.col("_b"), F.lit(0))
    ).cast("bigint")
    guarded = F.when(
        c3 < 0,
        F.raise_error(
            F.concat(
                F.lit(
                    "forget_lm_counts underflow: subtracting counts "
                    "never folded in (double-delete, or a delete "
                    "racing its own append) for (lang, tri)=("
                ),
                F.col("lang"),
                F.lit(", "),
                F.col("tri"),
                F.lit(") — each delete wave must be delivered once"),
            )
        ),
    ).otherwise(c3)
    return (
        a.join(b, ["lang", "tri"], "full_outer")
        .select("lang", "tri", guarded.alias("c3"))
        .filter(F.col("c3") > 0)
    )


def lm_score_from_counts(
    doc_tri_counts: DataFrame,
    tri_counts: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """The exact scoring tail shared by the one-shot
    ``lm_trigram_score`` and the maintained-LM key: derive the prefix
    marginal from the (lang, tri, c3) state, broadcast the bounded
    model (alphabet^3 per language — it IS the model) onto the
    per-doc trigram counts, and take the decimal-exact weighted mean
    ln p per doc."""
    bi_counts = (
        tri_counts.groupBy("lang", F.substring("tri", 1, 2).alias("bi"))
        .agg(F.sum("c3").alias("c2"))
        .select(F.col("lang").alias("b_lang"), "bi", "c2")
    )
    model = tri_counts.join(
        bi_counts,
        (tri_counts["lang"] == bi_counts["b_lang"])
        & (F.substring(tri_counts["tri"], 1, 2) == bi_counts["bi"]),
    ).select(
        "lang", "tri", F.log(F.col("c3") / F.col("c2")).alias("lp")
    )
    scored = doc_tri_counts.join(F.broadcast(model), ["lang", "tri"])
    # weighted mean in exact decimal arithmetic (decimal(lp) * cnt ==
    # the sum of cnt copies of decimal(lp), so the instance mean is
    # reproduced exactly and order-independently in both engines)
    return (
        scored.groupBy(id_col, "lang")
        .agg(
            F.sum("cnt").alias("n_tri"),
            (
                F.sum(
                    F.col("lp").cast("decimal(38,18)") * F.col("cnt")
                ).cast("double")
                / F.sum("cnt")
            ).alias("avg_lp"),
        )
        .select(
            id_col,
            "lang",
            F.col("n_tri").cast("bigint").alias("n_tri"),
            (F.floor(F.col("avg_lp") * 10000.0 + 0.5) / 10000.0).alias(
                "avg_logp"
            ),
        )
    )


def bpe_merge_pairs(
    docs: DataFrame,
    k: int = 30,
    text_col: str = "text",
) -> DataFrame:
    """One round of BPE tokenizer training: the top-``k`` most frequent
    adjacent character pairs across the corpus — the statistic a
    byte-pair-encoding trainer computes to pick its next merge.

    The scale trick is the classic one from BPE training: pair counts
    are computed over DISTINCT words weighted by word frequency, never
    over raw corpus positions. At 100 TB the distinct-word relation is
    orders of magnitude smaller than the token stream (Zipf), so the
    quadratic-ish pair fan-out (len-1 pairs per word) runs on the small
    relation; the corpus-sized work is one tokenize+groupBy. Plan:
    explode words -> word counts (shuffle 1, corpus-sized with map-side
    combine) -> per-distinct-word pair explode (narrow) -> weighted
    pair counts (shuffle 2, vocabulary-sized) -> global top-k window.
    Deterministic tie-break (count desc, pair asc) keeps the result
    engine-portable.
    """
    spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, "doc_id"
    )
    words = spread.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") >= 2)
    wc = words.groupBy("word").agg(F.count("*").alias("cnt"))
    pairs = wc.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
        "cnt",
    )
    from pyspark.sql import Window

    agg = pairs.groupBy("pair").agg(F.sum("cnt").alias("n"))
    # global ranking window: single-task by construction, but its input
    # is the PAIR alphabet (bounded by charset^2, a few thousand rows at
    # any corpus size), never the corpus
    w = Window.orderBy(F.col("n").desc(), F.col("pair").asc())
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "pair",
            F.col("n").cast("bigint").alias("n"),
            F.col("rank").cast("int").alias("rank"),
        )
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


def bpe_train_merges(
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Distributed BPE tokenizer TRAINING loop: ``n_merges`` rounds of
    (count adjacent symbol pairs) -> (pick the most frequent pair) ->
    (greedily merge it everywhere), returning the learned merge table —
    the actual artifact a BPE tokenizer ships. ``bpe_merge_pairs`` is
    one round of the statistic; this is the full trainer.

    Scale shape (the SentencePiece/HF-trainer decomposition):
    - Pair counts run over the DISTINCT-WORD relation weighted by word
      frequency (Zipf: vocabulary-sized, not corpus-sized). The corpus
      is tokenized ONCE; every training round after that touches only
      the vocabulary.
    - Each round is one vocabulary-sized shuffle (pair groupBy) plus a
      top-1 TakeOrdered. The single collected row per round IS the
      model (the merge rule) — driver-held merge tables are how every
      production BPE trainer works; nothing corpus-sized ever collects.
    - The merge applies as a greedy left-to-right fold
      (``F.aggregate``) over each word's symbol array: narrow, no
      shuffle. Words reduced to one symbol can never pair again and are
      dropped from the working set, so the relation shrinks as training
      proceeds.
    - ``localCheckpoint`` truncates lineage each round — otherwise the
      fold nests ``n_merges`` lambdas deep and Catalyst re-derives
      every prior round per job (same rule as ``dedup_clusters``).

    Determinism: counts are exact integer sums; rank ties break on
    (count desc, p1 asc, p2 asc); the greedy fold is order-defined. The
    DuckDB oracle unrolls the same rounds with ``list_reduce``, so the
    whole training trajectory is value-checked.

    Output: (step, p1, p2, n) — merge rule learned at each round.
    """
    spark = docs.sparkSession
    spread = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    words = spread.select(
        F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") >= 2)
    wc = words.groupBy("word").agg(F.count("*").alias("cnt"))
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    cur = wc.select(chars.alias("syms"), "cnt").localCheckpoint()
    # Size the training loop's partitioning to the VOCABULARY, not the
    # cluster (same rule as dedup_clusters): the distinct-word relation
    # is Zipf-small, and per-round task scheduling dominates when a few
    # thousand words spread over defaultParallelism partitions. The
    # count is ~free (cur was just checkpointed), coalesce is narrow,
    # and at real vocab sizes n//50k returns full parallelism.
    n_vocab = cur.count()
    parts = max(
        2,
        min(
            docs.sparkSession.sparkContext.defaultParallelism,
            n_vocab // 50_000 + 1,
        ),
    )
    cur = cur.coalesce(parts)
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, n_merges + 1):
        live = cur.filter(F.size("syms") >= 2)
        prs = live.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at(F.col("syms"), i).alias("p1"),
                        F.element_at(F.col("syms"), i + 1).alias("p2"),
                    ),
                )
            ).alias("pr"),
            "cnt",
        )
        top = (
            prs.groupBy("pr.p1", "pr.p2")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), F.col("p1").asc(), F.col("p2").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        p1, p2, n = top[0]["p1"], top[0]["p2"], int(top[0]["n"])
        merges.append((step, p1, p2, n))
        fold = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(p1))
                & (s == F.lit(p2)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(p1 + p2))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        cur = (
            cur.filter(F.size("syms") >= 2)
            .select(fold.alias("syms"), "cnt")
            .coalesce(parts)
            .localCheckpoint()
        )
    return spark.createDataFrame(
        merges, "step INT, p1 STRING, p2 STRING, n BIGINT"
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned BPE merge table (``bpe_train_merges`` output) to
    the corpus and report per-document token budgets — the consumer
    side of tokenizer training, and the statistic every sequence-packing
    / context-length-budgeting stage needs.

    The merge rules are plan literals (the model rides the plan exactly
    like the IVF codebook does), and application is the same greedy
    left-to-right fold as training, chained once per rule — per-row
    narrow expressions, embarrassingly parallel. The only shuffle is
    the final per-doc rollup of the word explode; at 100 TB tokenizer
    application adds ZERO exchanges beyond that one map-side-combined
    groupBy.

    Output: (doc_id, n_words, n_chars, n_tokens, compression) where
    compression = chars per emitted token (floor-rounded to 4).
    """
    spread = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, id_col
    )
    words = spread.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.length("word") >= 1)
    chars = F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.col("word").substr(i, F.lit(1)),
    )
    def fold_rule(arr: Column, p1: str, p2: str) -> Column:
        # built eagerly per rule (F.aggregate resolves the lambda at
        # call time, so closing over the loop vars is safe)
        return F.aggregate(
            arr,
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(p1))
                & (s == F.lit(p2)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(p1 + p2))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )

    cur = chars
    for p1, p2 in merges:
        cur = fold_rule(cur, p1, p2)
    enc = words.select(
        id_col,
        F.length("word").alias("wlen"),
        F.size(cur).alias("n_syms"),
    )
    agg = enc.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_words"),
        F.sum("wlen").cast("bigint").alias("n_chars"),
        F.sum("n_syms").cast("bigint").alias("n_tokens"),
    )
    return agg.select(
        id_col,
        "n_words",
        "n_chars",
        "n_tokens",
        (
            F.floor(
                F.col("n_chars").cast("double") / F.col("n_tokens") * 10000.0
                + 0.5
            )
            / 10000.0
        ).alias("compression"),
    )


def retrieval_eval(
    ranked: DataFrame,
    truth: DataFrame,
    query_ids: list[int],
    system: str,
    depth: int,
    truth_k: int,
) -> DataFrame:
    """Ranking-quality metrics of one retrieval system against a
    relevance set — the measurement gate every retrieval stack needs
    next to ann_recall_at_k's index gate: MRR (mean reciprocal rank of
    the first relevant hit; 0 for queries with none), precision@depth
    (relevant retrieved / retrieved) and recall (relevant retrieved /
    relevant). ``ranked`` is (query_id, doc_id, rank); ``truth`` is
    (query_id, doc_id).

    Exactness: hit counts are integers; each query contributes ONE
    1/first_rank division (exact operands), summed as decimals
    (order-independent — the engine's cross-row double-sum rule), and
    the three means are one division each — all engine-identical.
    Shape: one broadcast-sized join per system (both relations are
    |Q|·depth at most), one |Q|-row aggregate — evaluation is free at
    any corpus scale because it only ever touches the ranked lists."""
    spark = ranked.sparkSession
    nq = len(query_ids)
    qs = spark.createDataFrame(
        [(int(q),) for q in query_ids], "query_id BIGINT"
    )
    hits = ranked.join(truth, ["query_id", "doc_id"])
    perq = hits.groupBy("query_id").agg(
        F.count("*").alias("n_hits"), F.min("rank").alias("first_rank")
    )
    full = qs.join(perq, "query_id", "left")
    agg = full.agg(
        F.sum(
            F.when(
                F.col("first_rank").isNotNull(),
                (F.lit(1.0) / F.col("first_rank")).cast("decimal(38,20)"),
            ).otherwise(F.lit(0).cast("decimal(38,20)"))
        ).alias("_mrr_sum"),
        F.sum(F.coalesce(F.col("n_hits"), F.lit(0)))
        .cast("bigint")
        .alias("_tot_hits"),
    )
    def _fr6(c):
        # portable floor-round (engines disagree on native round halves)
        return F.floor(c * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)

    return agg.select(
        F.lit(system).alias("system"),
        _fr6(F.col("_mrr_sum").cast("double") / nq).alias("mrr"),
        _fr6(F.col("_tot_hits") * F.lit(1.0) / (nq * depth)).alias(
            "precision_at_k"
        ),
        _fr6(F.col("_tot_hits") * F.lit(1.0) / (nq * truth_k)).alias(
            "recall_at_k"
        ),
    )
