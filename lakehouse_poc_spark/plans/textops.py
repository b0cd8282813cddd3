"""Text-analysis queries over the documents table: token stats,
quality scoring, language-ID, fingerprinting, exact dedup.

Every query here is fully oracle-checked — the implementations use
only portable primitives (see functions/text.py) and the SQL twins
mirror the arithmetic term-by-term so doubles match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    avg_word_len,
    bpe_token_count,
    fingerprint_md5,
    lang_id,
    punct_count,
    quality_score,
    rolling_hash,
    stopword_count,
    token_count,
)
from ..operators.dedup import exact_dedup
from ..sources.readers import read_parquet_table
from . import query

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
@query(
    "text_token_stats",
    oracle=r"""
    WITH t AS (SELECT doc_id, n_chars, string_split_regex(text, '\s+') AS w FROM documents)
    SELECT doc_id,
           CAST(len(w) AS BIGINT) AS n_tokens,
           n_chars,
           CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w) AS avg_word_len
    FROM t
    ORDER BY doc_id
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        "n_chars",
        avg_word_len("text").alias("avg_word_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
@query(
    "text_quality_scores",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok,
               CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                                    x -> x IN ({_STOPLIST_SQL}))) AS BIGINT) AS n_stop,
               length(text) AS n_chars
        FROM documents
    )
    SELECT doc_id, n_tok, n_punct, n_stop,
           0.5 * least(CAST(n_tok AS DOUBLE) / 200.0, 1.0)
         + 0.3 * least(CAST(n_stop AS DOUBLE) / greatest(CAST(n_tok AS DOUBLE), 1.0) * 3, 1.0)
         + 0.2 * (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 10, 1.0))
           AS quality
    FROM t
    ORDER BY doc_id
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count("text").alias("n_tok"),
        punct_count("text").alias("n_punct"),
        stopword_count("text").alias("n_stop"),
        quality_score("text").alias("quality"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
def _lang_sql_score(lang: str) -> str:
    terms = [
        f"CAST((length(p) - length(replace(p, '{m}', ''))) / {len(m)} AS BIGINT)"
        for m in LANG_MARKERS[lang]
    ]
    return " + ".join(terms)


def _langid_case_sql() -> str:
    order = list(LANG_MARKERS)
    clauses = []
    for i, lang in enumerate(order[:-1]):
        conds = " AND ".join(
            f"s_{lang} >= s_{other}" for other in order[i + 1 :]
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{order[-1]}' END"


@query(
    "text_langid",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {", ".join(f"{_lang_sql_score(lang)} AS s_{lang}" for lang in LANG_MARKERS)}
        FROM (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents)
    )
    SELECT doc_id, lang, {_langid_case_sql()} AS lang_pred
    FROM scored
    ORDER BY doc_id
    """,
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", lang_id("text").alias("lang_pred")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
@query(
    "text_fingerprints",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5("text").alias("fp")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# End-to-end curation pipeline — the ops composed the way a training-
# data pipeline uses them: quality gate → exact dedup (docs cloned
# first so the dedup stage has real work) → per-language corpus
# stats. Fully oracle-checked stage by stage.
@query(
    "docs_curation_pipeline",
    oracle=rf"""
    WITH scored AS (
        SELECT doc_id, text, lang,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok,
               0.5 * least(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) / 200.0, 1.0)
             + 0.3 * least(CAST(len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x IN ({_STOPLIST_SQL}))) AS DOUBLE)
                           / greatest(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 1.0) * 3, 1.0)
             + 0.2 * (1.0 - least(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                                  / CAST(greatest(length(text), 1) AS DOUBLE) * 10, 1.0))
               AS quality
        FROM documents
    ),
    gated AS (
        SELECT * FROM scored WHERE quality >= 0.5
    ),
    cloned AS (
        SELECT doc_id, text, lang, n_tok FROM gated
        UNION ALL
        SELECT doc_id + 1000000, text, lang, n_tok FROM gated
    ),
    deduped AS (
        -- arg_min on doc_id: real duplicate texts may carry different
        -- lang labels; the surviving row is the min-id one
        SELECT MIN(doc_id) AS doc_id,
               arg_min(lang, doc_id) AS lang,
               arg_min(n_tok, doc_id) AS n_tok
        FROM cloned
        GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    )
    SELECT lang, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens
    FROM deduped
    GROUP BY lang
    ORDER BY lang
    """,
)
def docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    gated = docs.filter(quality_score("text") >= 0.5).select(
        "doc_id", "text", "lang", token_count("text").alias("n_tok")
    )
    cloned = gated.unionByName(
        gated.withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    deduped = exact_dedup(cloned, text_col="text", id_col="doc_id")
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# BPE-ish token counting next to the whitespace baseline.
@query(
    "text_bpe_tokens",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT)
               AS n_bpe_tokens,
           CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_ws_tokens
    FROM documents
    ORDER BY doc_id
    """,
)
def text_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        bpe_token_count("text").alias("n_bpe_tokens"),
        token_count("text").alias("n_ws_tokens"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Polynomial rolling-hash fingerprint (Rabin-Karp fold over chars).
@query(
    "text_rolling_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_transform(generate_series(1, length(text)),
                              j -> CAST(ascii(substr(text, j, 1)) AS BIGINT)),
               (acc, c) -> (acc * 131 + c) % 2147483647
           ) AS rhash
    FROM documents
    ORDER BY doc_id
    """,
)
def text_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", rolling_hash("text").alias("rhash")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Exact dedup: clone every doc under a shifted id, dedup by content
# fingerprint keeping the min id → exactly the original ids survive.
@query(
    "dedup_exact_documents",
    oracle=r"""
    -- keep-min-id per normalized-content group over docs + clones
    -- (NOT just "all original ids": larger fixtures contain real
    -- duplicate texts, where only the smallest id survives)
    SELECT MIN(doc_id) AS doc_id
    FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text FROM documents
    ) t
    GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    ORDER BY doc_id
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    unioned = docs.unionByName(clones)
    return exact_dedup(unioned, text_col="text", id_col="doc_id").select(
        "doc_id"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Incremental corpus dedup: a new batch (fresh docs + re-crawled
# duplicates + an in-batch double) joins against the historical
# fingerprint store; only genuinely new content survives. The
# continuous-ingest twin of dedup_exact_documents.
@query(
    "dedup_incremental_docs",
    oracle=r"""
    WITH b AS (
        SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bk, text
        FROM documents
    ),
    corpus AS (SELECT doc_id, text FROM b WHERE bk < 'cc'),
    batch AS (
        SELECT doc_id, text FROM b WHERE bk >= 'cc'
        UNION ALL
        SELECT doc_id + 2000000, text FROM corpus WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 3000000, text FROM b WHERE bk >= 'cc'
    ),
    wb AS (
        SELECT MIN(doc_id) AS doc_id,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        FROM batch
        GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
    )
    SELECT doc_id FROM wb
    WHERE fp NOT IN (
        SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        FROM corpus
    )
    ORDER BY doc_id
    """,
)
def dedup_incremental_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import fingerprint_store, incremental_dedup

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("bk"),
        "text",
    )
    corpus = docs.filter(F.col("bk") < "cc").select("doc_id", "text")
    fresh = docs.filter(F.col("bk") >= "cc").select("doc_id", "text")
    batch = (
        fresh.unionByName(
            corpus.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 2000000).alias("doc_id"), "text"
            )
        )
        .unionByName(
            fresh.select((F.col("doc_id") + 3000000).alias("doc_id"), "text")
        )
    )
    store = fingerprint_store(corpus, "text")
    return (
        incremental_dedup(batch, store, text_col="text", id_col="doc_id")
        .select("doc_id")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rule-set (Rae et al. 2021 §A1.1, public paper):
# hard per-document filters with one boolean per rule plus the
# composite keep flag. All ratio thresholds are evaluated in exact
# integer micro-units (value·1e6 floor-divided) so both engines make
# identical keep/drop decisions — no float comparisons at the
# decision boundary.
@query(
    "gopher_quality_flags",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(text, '\s+') AS w,
               length(text) AS n_chars_raw
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(w) AS BIGINT) AS n_words,
               CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
                   AS sum_word_len,
               CAST(len(list_filter(w, x -> regexp_full_match(x, '[A-Za-z]+')))
                    AS BIGINT) AS n_alpha_words,
               CAST(len(list_filter(w, x -> x IN ({_STOPLIST_SQL})))
                    AS BIGINT) AS n_stop,
               CAST(n_chars_raw AS BIGINT) AS n_chars
        FROM t
    )
    SELECT doc_id, n_words,
           (sum_word_len * 1000000) // greatest(n_words, 1)
               AS mean_word_len_micro,
           (n_alpha_words * 1000000) // greatest(n_words, 1)
               AS alpha_frac_micro,
           n_stop >= 2 AS has_stopwords,
           (n_words BETWEEN 50 AND 100000) AS ok_length,
           ((sum_word_len * 1000000) // greatest(n_words, 1)
                BETWEEN 3000000 AND 10000000) AS ok_word_len,
           ((n_alpha_words * 1000000) // greatest(n_words, 1) >= 800000)
               AS ok_alpha,
           ((n_words BETWEEN 50 AND 100000)
            AND ((sum_word_len * 1000000) // greatest(n_words, 1)
                 BETWEEN 3000000 AND 10000000)
            AND ((n_alpha_words * 1000000) // greatest(n_words, 1) >= 800000)
            AND n_stop >= 2) AS keep
    FROM m
    ORDER BY doc_id
    """,
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    from ..functions.text import tokens

    w = tokens("text")
    n_words = F.size(w).cast("bigint")
    sum_word_len = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_alpha = F.size(
        F.filter(w, lambda x: x.rlike(r"^[A-Za-z]+$"))
    ).cast("bigint")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("bigint")
    g1 = F.greatest(n_words, F.lit(1).cast("bigint"))
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        sum_word_len.alias("sum_word_len"),
        n_alpha.alias("n_alpha_words"),
        n_stop.alias("n_stop"),
        g1.alias("g1"),
    )
    mwl = F.expr("sum_word_len * 1000000 div g1")
    afr = F.expr("n_alpha_words * 1000000 div g1")
    ok_length = F.col("n_words").between(50, 100000)
    ok_word_len = mwl.between(3000000, 10000000)
    ok_alpha = afr >= 800000
    has_stop = F.col("n_stop") >= 2
    return m.select(
        "doc_id",
        "n_words",
        mwl.alias("mean_word_len_micro"),
        afr.alias("alpha_frac_micro"),
        has_stop.alias("has_stopwords"),
        ok_length.alias("ok_length"),
        ok_word_len.alias("ok_word_len"),
        ok_alpha.alias("ok_alpha"),
        (ok_length & ok_word_len & ok_alpha & has_stop).alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Language-ID confusion matrix: the n-gram classifier's predictions
# against the ground-truth lang column — per (true, predicted) cell
# counts plus per-true-language recall. The eval that turns
# text_langid from a prediction into a measured component (its
# overall accuracy is the sum of the diagonal over the total).
@query(
    "langid_confusion_docs",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {", ".join(f"{_lang_sql_score(lang)} AS s_{lang}" for lang in LANG_MARKERS)}
        FROM (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents)
    ),
    pred AS (
        SELECT lang AS true_lang, {_langid_case_sql()} AS pred_lang
        FROM scored
    ),
    cells AS (
        SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY true_lang, pred_lang
    ),
    totals AS (
        SELECT true_lang, CAST(SUM(n) AS BIGINT) AS n_true
        FROM cells GROUP BY true_lang
    )
    SELECT c.true_lang, c.pred_lang, c.n,
           CAST(c.n AS DOUBLE) / CAST(t.n_true AS DOUBLE) AS frac_of_true
    FROM cells c JOIN totals t USING (true_lang)
    ORDER BY true_lang, pred_lang
    """,
)
def langid_confusion_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pred = docs.select(
        F.col("lang").alias("true_lang"), lang_id("text").alias("pred_lang")
    )
    cells = pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = cells.groupBy("true_lang").agg(
        F.sum("n").cast("bigint").alias("n_true")
    )
    return (
        cells.join(F.broadcast(totals), "true_lang")
        .select(
            "true_lang",
            "pred_lang",
            "n",
            (F.col("n").cast("double") / F.col("n_true").cast("double")).alias(
                "frac_of_true"
            ),
        )
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (r7; McCallum & Nigam
# 1998, public) — unlike the gradient-trained quality classifier
# (whose training is declared rows-only), NB training is pure
# counting, so TRAIN AND SCORE are both oracle-exact end to end:
# P(lang) and add-1-smoothed P(token|lang) come from exact BIGINT
# counts on the even-doc_id half; held-out docs score
# argmax_lang [log P(lang) + Σ tf·log P(token|lang)] with per-token
# logs micro-rounded to BIGINT before the doc sum (the repo's LM
# determinism scheme), ties to the lexicographically smaller lang.
# Output: the confusion matrix over the held-out half.
#
# Scale shape: the model is (lang × vocab)-sized from one train-half
# shuffle; scoring joins doc-token tfs to the model on the token key
# and reduces per (doc, lang) — token-keyed shuffles, AQE broadcasts
# the lang-prior side. Nothing iterates.
@query(
    "naive_bayes_lang_docs",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(text, '\s+')) AS token
        FROM documents
    ),
    tcnt AS (
        SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok WHERE doc_id % 2 = 0 GROUP BY 1, 2
    ),
    lcnt AS (
        SELECT lang, CAST(SUM(c) AS BIGINT) AS n_tok FROM tcnt GROUP BY 1
    ),
    prior AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    ndocs AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
        WHERE doc_id % 2 = 0
    ),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v FROM tcnt
    ),
    dtf AS (
        SELECT doc_id, lang AS actual, token,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok WHERE doc_id % 2 = 1 GROUP BY 1, 2, 3
    ),
    scored AS (
        SELECT d.doc_id, d.actual, l.lang AS cand,
               CAST(ROUND(ln(CAST(p.n_docs AS DOUBLE)
                             / CAST(nd.n AS DOUBLE)) * 1000000.0)
                    AS BIGINT)
               + CAST(SUM(d.tf * CAST(ROUND(ln(
                     (CAST(COALESCE(t.c, 0) AS DOUBLE) + 1.0)
                     / (CAST(l.n_tok AS DOUBLE) + CAST(vb.v AS DOUBLE))
                 ) * 1000000.0) AS BIGINT)) AS BIGINT) AS score
        FROM dtf d
        CROSS JOIN lcnt l
        JOIN prior p ON p.lang = l.lang
        CROSS JOIN ndocs nd
        CROSS JOIN vocab vb
        LEFT JOIN tcnt t ON t.lang = l.lang AND t.token = d.token
        GROUP BY d.doc_id, d.actual, l.lang, p.n_docs, nd.n
    ),
    pred AS (
        SELECT doc_id, actual, cand AS predicted FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY score DESC, cand) AS rk
            FROM scored
        ) WHERE rk = 1
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
    FROM pred GROUP BY 1, 2
    ORDER BY actual, predicted
    """,
)
def naive_bayes_lang_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.col("text"), r"\s+")).alias("token"),
    )
    tcnt = (
        tok.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lcnt = tcnt.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n_tok")
    )
    prior = (
        docs.filter(F.col("doc_id") % 2 == 0)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    ndocs = docs.filter(F.col("doc_id") % 2 == 0).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    vocab = tcnt.agg(F.countDistinct("token").cast("bigint").alias("v"))
    dtf = (
        tok.filter(F.col("doc_id") % 2 == 1)
        .groupBy("doc_id", F.col("lang").alias("actual"), "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    prior_micro = F.round(
        F.log(F.col("n_docs").cast("double") / F.col("n").cast("double"))
        * F.lit(1_000_000.0)
    ).cast("bigint")
    tok_micro = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(1.0))
            / (F.col("n_tok").cast("double") + F.col("v").cast("double"))
        )
        * F.lit(1_000_000.0)
    ).cast("bigint")
    scored = (
        dtf.crossJoin(F.broadcast(lcnt))
        .join(F.broadcast(prior), "lang")
        .crossJoin(F.broadcast(ndocs))
        .crossJoin(F.broadcast(vocab))
        .join(
            tcnt.withColumnRenamed("lang", "__tl"),
            (F.col("__tl") == F.col("lang"))
            & (tcnt["token"] == dtf["token"]),
            "left",
        )
        .groupBy(
            "doc_id", "actual", F.col("lang").alias("cand"),
            "n_docs", "n",
        )
        .agg(F.sum(F.col("tf") * tok_micro).cast("bigint").alias("tsum"))
        .select(
            "doc_id",
            "actual",
            "cand",
            (prior_micro + F.col("tsum")).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand")
    )
    pred = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("actual", F.col("cand").alias("predicted"))
    )
    return (
        pred.groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("actual", "predicted")
    )


# ---------------------------------------------------------------------------
# Cross-source dedup with a PROVENANCE-PRIORITY keep rule (r8): when
# a content cluster spans sources, keep the copy from the
# highest-priority source (curated > crawled — the keep rule every
# production dedup pipeline applies; plain min-id keep is the
# dedup_exact_documents twin). Scenario: the corpus plus a full
# 'recrawl' clone set (priority 999) — every cluster must keep its
# original-source copy, and organic in-corpus dups resolve by
# (source priority, doc_id). One fingerprint shuffle + one per-cluster
# window, same scale shape as exact dedup.
@query(
    "dedup_keep_priority_docs",
    oracle=r"""
    WITH u AS (
        SELECT doc_id, source,
               CAST(substr(source, 4) AS INTEGER) AS prio,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS h
        FROM documents
        UNION ALL
        SELECT doc_id + 1000000, 'recrawl', 999,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, h,
               row_number() OVER (
                   PARTITION BY h ORDER BY prio, doc_id
               ) AS rk,
               COUNT(*) OVER (PARTITION BY h) AS n_members
        FROM u
    )
    SELECT r.doc_id AS kept_doc_id, r.source AS kept_source,
           CAST(r.n_members AS BIGINT) AS n_members,
           CAST(s.n_sources AS BIGINT) AS n_sources
    FROM ranked r
    JOIN (SELECT h, COUNT(DISTINCT source) AS n_sources
          FROM u GROUP BY h) s ON r.h = s.h
    WHERE r.rk = 1
    ORDER BY kept_doc_id
    """,
)
def dedup_keep_priority_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    recrawl = docs.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("recrawl").alias("source"),
        "text",
    )
    u = (
        docs.unionByName(recrawl)
        .select(
            "doc_id",
            "source",
            F.when(F.col("source") == "recrawl", F.lit(999))
            .otherwise(F.substring("source", 4, 10).cast("int"))
            .alias("prio"),
            F.md5(
                F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")
            ).alias("h"),
        )
    )
    w = Window.partitionBy("h").orderBy("prio", "doc_id")
    ranked = u.withColumn("rk", F.row_number().over(w)).withColumn(
        "n_members", F.count(F.lit(1)).over(Window.partitionBy("h"))
    )
    srcs = u.groupBy("h").agg(
        F.countDistinct("source").cast("bigint").alias("n_sources")
    )
    return (
        ranked.filter(F.col("rk") == 1)
        .join(srcs, "h")
        .select(
            F.col("doc_id").alias("kept_doc_id"),
            F.col("source").alias("kept_source"),
            F.col("n_members").cast("bigint").alias("n_members"),
            "n_sources",
        )
        .orderBy("kept_doc_id")
    )


# ---------------------------------------------------------------------------
# Corpus-scale BLEU-2 (r8, Papineni et al. 2002 — public): the
# generation-eval metric, computed set-wide as a DataFrame op (every
# even doc scored against its successor as reference — the pairing a
# self-consistency / round-trip eval produces). Clipped n-gram
# matches are exact integer sums (per-gram MIN of candidate/reference
# counts via one gram-keyed join); the log composition
# log_bleu2 = min(0, 1 − r/c) + ½ln p1 + ½ln p2 stays log-domain (no
# exp) and each term is micro-rounded to BIGINT BEFORE the integer
# combination (the unigram_logprob_docs discipline — last-bit ln
# differences between engines cannot reach the hash). NULL when either
# precision is zero (undefined without smoothing — reported, not
# hidden). Scale: gram-domain shuffles only (counts per (doc, gram)),
# one equi-join per order, no quadratic term.
@query(
    "bleu2_pairs_docs",
    oracle=r"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS t
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS l
              FROM documents)
    ),
    uni AS MATERIALIZED (
        SELECT doc_id, t AS g, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY doc_id, t
    ),
    big AS MATERIALIZED (
        SELECT a.doc_id, a.t || ' ' || b.t AS g,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM tok a JOIN tok b
          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        GROUP BY a.doc_id, a.t || ' ' || b.t
    ),
    lens AS MATERIALIZED (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok
        FROM tok GROUP BY doc_id
    ),
    pairs AS (
        SELECT doc_id AS cand_id, doc_id + 1 AS ref_id
        FROM documents WHERE doc_id % 2 = 0
    ),
    clip1 AS (
        SELECT p.cand_id,
               CAST(SUM(LEAST(cu.c, ru.c)) AS BIGINT) AS m1
        FROM pairs p
        JOIN uni cu ON cu.doc_id = p.cand_id
        JOIN uni ru ON ru.doc_id = p.ref_id AND ru.g = cu.g
        GROUP BY p.cand_id
    ),
    clip2 AS (
        SELECT p.cand_id,
               CAST(SUM(LEAST(cb.c, rb.c)) AS BIGINT) AS m2
        FROM pairs p
        JOIN big cb ON cb.doc_id = p.cand_id
        JOIN big rb ON rb.doc_id = p.ref_id AND rb.g = cb.g
        GROUP BY p.cand_id
    )
    SELECT p.cand_id, p.ref_id,
           COALESCE(c1.m1, 0) AS clipped1,
           COALESCE(c2.m2, 0) AS clipped2,
           lc.n_tok AS cand_len, lr.n_tok AS ref_len,
           CASE WHEN COALESCE(c1.m1, 0) = 0 OR COALESCE(c2.m2, 0) = 0
                THEN NULL
                ELSE CAST(2 * CAST(ROUND(LEAST(CAST(0 AS DOUBLE),
                              1.0 - CAST(lr.n_tok AS DOUBLE)
                                    / CAST(lc.n_tok AS DOUBLE))
                              * 1000000.0) AS BIGINT)
                     + CAST(ROUND(ln(CAST(c1.m1 AS DOUBLE)
                                     / CAST(lc.n_tok AS DOUBLE))
                                  * 1000000.0) AS BIGINT)
                     + CAST(ROUND(ln(CAST(c2.m2 AS DOUBLE)
                                     / CAST(lc.n_tok - 1 AS DOUBLE))
                                  * 1000000.0) AS BIGINT) AS DOUBLE)
                     / 2000000.0
           END AS log_bleu2
    FROM pairs p
    JOIN lens lc ON lc.doc_id = p.cand_id
    JOIN lens lr ON lr.doc_id = p.ref_id
    LEFT JOIN clip1 c1 ON c1.cand_id = p.cand_id
    LEFT JOIN clip2 c2 ON c2.cand_id = p.cand_id
    ORDER BY p.cand_id
    """,
)
def bleu2_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.split(F.lower(F.trim("text")), r"\s+")
        ).alias("pos0", "t"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    uni = tok.groupBy("doc_id", F.col("t").alias("g")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ta, tb = tok.alias("a"), tok.alias("b")
    big = (
        ta.join(
            tb,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_id"),
            F.concat_ws(" ", F.col("a.t"), F.col("b.t")).alias("g"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    lens = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tok")
    )
    pairs = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("cand_id"),
        (F.col("doc_id") + 1).alias("ref_id"),
    )

    def clipped(grams, out):
        cu = grams.select(
            F.col("doc_id").alias("cand_id"), "g", F.col("c").alias("cc")
        )
        ru = grams.select(
            F.col("doc_id").alias("ref_id"), "g", F.col("c").alias("rc")
        )
        return (
            pairs.join(cu, "cand_id")
            .join(ru, ["ref_id", "g"])
            .groupBy("cand_id")
            .agg(F.sum(F.least("cc", "rc")).cast("bigint").alias(out))
        )

    c1 = clipped(uni, "m1")
    c2 = clipped(big, "m2")
    lc = lens.select(F.col("doc_id").alias("cand_id"), F.col("n_tok").alias("cand_len"))
    lr = lens.select(F.col("doc_id").alias("ref_id"), F.col("n_tok").alias("ref_len"))
    m1 = F.coalesce(F.col("m1"), F.lit(0)).cast("bigint")
    m2 = F.coalesce(F.col("m2"), F.lit(0)).cast("bigint")
    return (
        pairs.join(lc, "cand_id")
        .join(lr, "ref_id")
        .join(c1, "cand_id", "left")
        .join(c2, "cand_id", "left")
        .select(
            "cand_id",
            "ref_id",
            m1.alias("clipped1"),
            m2.alias("clipped2"),
            "cand_len",
            "ref_len",
            F.when((m1 == 0) | (m2 == 0), F.lit(None).cast("double"))
            .otherwise(
                (
                    F.lit(2)
                    * F.round(
                        F.least(
                            F.lit(0.0),
                            F.lit(1.0)
                            - F.col("ref_len").cast("double")
                            / F.col("cand_len").cast("double"),
                        )
                        * F.lit(1e6)
                    ).cast("bigint")
                    + F.round(
                        F.log(
                            m1.cast("double")
                            / F.col("cand_len").cast("double")
                        )
                        * F.lit(1e6)
                    ).cast("bigint")
                    + F.round(
                        F.log(
                            m2.cast("double")
                            / (F.col("cand_len") - 1).cast("double")
                        )
                        * F.lit(1e6)
                    ).cast("bigint")
                ).cast("double")
                / F.lit(2000000.0)
            )
            .alias("log_bleu2"),
        )
        .orderBy("cand_id")
    )


# ---------------------------------------------------------------------------
# Cohen's kappa for the language-ID heuristic (r8): chance-corrected
# agreement between the n-gram-marker predictor (text_langid) and the
# ground-truth lang column — the one-number companion to
# langid_confusion_docs (a 95%-observed-agreement classifier whose
# classes are imbalanced can still have mediocre kappa; curation
# pipelines gate on kappa for exactly that reason). All inputs are
# integer marginals; po, pe, and kappa compose in one fixed-order
# float expression on both engines.
@query(
    "cohens_kappa_langid",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               {", ".join(f"{_lang_sql_score(lang)} AS s_{lang}" for lang in LANG_MARKERS)}
        FROM (SELECT doc_id, lang, ' ' || text || ' ' AS p FROM documents)
    ),
    pred AS (
        SELECT doc_id, lang, {_langid_case_sql()} AS lang_pred FROM scored
    ),
    n_t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN lang = lang_pred THEN 1 ELSE 0 END)
                        AS BIGINT) AS agree
            FROM pred),
    marg AS (
        SELECT CAST(SUM(t.row_n * p.col_n) AS BIGINT) AS sp
        FROM (SELECT lang AS c, CAST(COUNT(*) AS BIGINT) AS row_n
              FROM pred GROUP BY lang) t
        JOIN (SELECT lang_pred AS c, CAST(COUNT(*) AS BIGINT) AS col_n
              FROM pred GROUP BY lang_pred) p
          ON t.c = p.c
    )
    SELECT n, agree,
           CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
           CAST(sp AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
           (CAST(agree AS DOUBLE) / CAST(n AS DOUBLE)
            - CAST(sp AS DOUBLE)
              / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
           / (1.0 - CAST(sp AS DOUBLE)
                    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS kappa
    FROM n_t CROSS JOIN marg
    """,
)
def cohens_kappa_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    pred = docs.select("doc_id", "lang", lang_id("text").alias("lang_pred"))
    pred = pred.persist()
    n_t = pred.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(
            F.when(F.col("lang") == F.col("lang_pred"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("agree"),
    )
    rowm = pred.groupBy(F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("row_n")
    )
    colm = pred.groupBy(F.col("lang_pred").alias("c")).agg(
        F.count(F.lit(1)).cast("bigint").alias("col_n")
    )
    marg = (
        rowm.join(colm, "c")
        .agg(F.sum(F.col("row_n") * F.col("col_n")).cast("bigint").alias("sp"))
    )
    n_d = F.col("n").cast("double")
    po = F.col("agree").cast("double") / n_d
    pe = F.col("sp").cast("double") / (n_d * n_d)
    return n_t.crossJoin(F.broadcast(marg)).select(
        "n",
        "agree",
        po.alias("po"),
        pe.alias("pe"),
        ((po - pe) / (F.lit(1.0) - pe)).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (r8): Rapid Automatic Keyword Extraction
# (Rose et al. 2010) — candidate phrases are maximal stopword-free
# token runs (gaps-and-islands per document: island id = pos − per-
# doc row_number, a bounded per-doc window); a word scores
# degree/frequency where degree sums the lengths of every phrase the
# word occurs in; a phrase scores the sum of its member words'
# scores. Corpus-level: word statistics aggregate over ALL documents
# (vocab-domain shuffle), identical phrases collapse with an
# occurrence count, top-20 by score via TakeOrdered (no global
# sort). Per-word deg/freq ratios are micro-rounded BIGINTs before
# the per-phrase sum (BLEU-2 discipline), so both engines agree
# bit-for-bit.
@query(
    "rake_keywords_docs",
    oracle=r"""
    WITH tok AS MATERIALIZED (
        SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS t
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\s+') AS l
              FROM documents)
    ),
    ns AS MATERIALIZED (
        SELECT doc_id, pos, t,
               pos - ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY pos) AS grp
        FROM tok
        WHERE t NOT IN ('the', 'a', 'of', 'and', 'to', 'in', 'is',
                        'on', 'for', 'with')
    ),
    ph AS MATERIALIZED (
        SELECT doc_id, grp, CAST(COUNT(*) AS BIGINT) AS plen,
               string_agg(t, ' ' ORDER BY pos) AS phrase
        FROM ns GROUP BY 1, 2
    ),
    wstat AS (
        SELECT ns.t,
               CAST(SUM(ph.plen) AS BIGINT) AS deg,
               CAST(COUNT(*) AS BIGINT) AS freq
        FROM ns JOIN ph USING (doc_id, grp)
        GROUP BY ns.t
    ),
    term AS (
        SELECT t,
               CAST(ROUND(CAST(deg AS DOUBLE) * 1000000.0 / freq)
                    AS BIGINT) AS tm
        FROM wstat
    ),
    pscore AS (
        SELECT ph.doc_id, ph.grp, ph.phrase, ph.plen,
               CAST(SUM(term.tm) AS BIGINT) AS sm
        FROM ns JOIN ph USING (doc_id, grp)
        JOIN term ON ns.t = term.t
        GROUP BY 1, 2, 3, 4
    )
    SELECT phrase,
           CAST(MAX(plen) AS BIGINT) AS n_words,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MAX(sm) AS DOUBLE) / 1000000.0 AS score
    FROM pscore
    GROUP BY phrase
    ORDER BY score DESC, phrase
    LIMIT 20
    """,
)
def rake_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos0", "t"
        ),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    ns = (
        tok.filter(~F.col("t").isin(*STOPWORDS))
        .withColumn(
            "grp",
            F.col("pos")
            - F.row_number().over(
                Window.partitionBy("doc_id").orderBy("pos")
            ),
        )
    )
    # The phrase relation is the ONLY consumer of the tokenize+window
    # subtree (r10 optimization round, guide §1.2): the old plan
    # re-joined ns onto ph for both the word-stat and phrase-score
    # passes, re-running the scan + posexplode + row_number window
    # three times. A phrase's tokens ARE split(phrase, ' ') — tokens
    # come from a \s+ split so none contains a space — so both passes
    # derive from ph alone (persisted: evaluated once, reused twice),
    # and the corpus-sized ns/window subtree runs exactly once.
    ph = ns.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("plen"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "t"))),
                lambda x: x["t"],
            ),
            " ",
        ).alias("phrase"),
    ).persist()
    ph_tok = ph.select(
        "doc_id", "grp", "phrase", "plen",
        F.explode(F.split(F.col("phrase"), " ")).alias("t"),
    )
    wstat = ph_tok.groupBy("t").agg(
        F.sum("plen").cast("bigint").alias("deg"),
        F.count(F.lit(1)).cast("bigint").alias("freq"),
    )
    term = wstat.select(
        "t",
        F.round(F.col("deg").cast("double") * F.lit(1000000.0) / F.col("freq"))
        .cast("bigint")
        .alias("tm"),
    )
    pscore = (
        ph_tok.join(term, "t")
        .groupBy("doc_id", "grp", "phrase", "plen")
        .agg(F.sum("tm").cast("bigint").alias("sm"))
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.max("plen").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            (F.max("sm").cast("double") / F.lit(1000000.0)).alias("score"),
        )
        .orderBy(F.col("score").desc(), "phrase")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Compression-ratio quality signal (r8): deflate ratio per document
# (compressed/raw bytes) — the classic dirt-cheap repetition/
# boilerplate detector used alongside Gopher-style rules in
# pretraining curation (highly compressible text = repeated
# boilerplate; near-incompressible = binary junk/random). zlib runs
# JVM-free in an Arrow-batched mapInPandas (the declared
# Python-at-the-codec-boundary surface, like the multimodal codecs);
# everything after the per-doc ratio is plain grouped aggregation.
# ⊘ rows-only by design: DuckDB has no deflate — the pytest twin
# recomputes ratios with the same zlib and the keep-flag contract.
@query("compression_ratio_docs")
def compression_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = read_parquet_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )

    def ratios(batches):
        import zlib

        for pdf in batches:
            raw = pdf["text"].str.encode("utf-8")
            comp = raw.map(lambda b: len(zlib.compress(b, 6)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "raw_len": raw.str.len().astype("int64"),
                    "comp_len": comp.astype("int64"),
                }
            )

    per_doc = docs.mapInPandas(
        ratios,
        schema="doc_id long, source string, raw_len long, comp_len long",
    )
    # ratio micro-rounded per doc, aggregated as exact integers
    r = per_doc.withColumn(
        "ratio_u",
        F.round(
            F.col("comp_len").cast("double")
            * F.lit(1000000.0)
            / F.col("raw_len")
        ).cast("bigint"),
    )
    return (
        r.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            (
                F.sum("ratio_u").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0)
            ).alias("mean_ratio"),
            F.sum(F.when(F.col("ratio_u") < 250000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_too_repetitive"),
            F.sum(F.when(F.col("ratio_u") > 900000, 1).otherwise(0))
            .cast("bigint")
            .alias("n_incompressible"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Heaps' law fit (r8): vocabulary growth V(N) ≈ K·N^β over the
# corpus — the companion to the Zipf fit (zipf_fit_tokens): β well
# below 1 says vocabulary saturates (natural text ~0.4–0.6); β ≈ 1
# flags ID-like/noisy token streams. Scale shape: each token's FIRST
# document (one vocab-domain min), new-token counts per doc, then the
# block-offset global rank + exact decimal cumulative sum
# (operators/linkage) give V at every prefix with no single-reducer
# window; the fit uses 10 decile sample points (ln-values nano-
# rounded to BIGINT before the tiny sums, so both engines agree).
@query(
    "heaps_law_docs",
    oracle=r"""
    WITH dt AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+'))
                     AS token
            FROM documents
        )
    ), firsts AS (
        SELECT token, MIN(doc_id) AS first_doc FROM dt GROUP BY 1
    ), newc AS (
        SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS new_tokens
        FROM firsts GROUP BY 1
    ), docs AS (
        SELECT d.doc_id,
               ROW_NUMBER() OVER (ORDER BY d.doc_id) AS n,
               COALESCE(nc.new_tokens, 0) AS new_tokens
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN newc nc ON nc.doc_id = d.doc_id
    ), cum AS (
        SELECT n,
               SUM(new_tokens) OVER (ORDER BY n
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS v
        FROM docs
    ), total AS (
        SELECT CAST(MAX(n) AS BIGINT) AS d_total FROM cum
    ), pts AS (
        SELECT CAST(ROUND(ln(CAST(n AS DOUBLE)) * 1000000000.0)
                    AS BIGINT) AS x,
               CAST(ROUND(ln(CAST(v AS DOUBLE)) * 1000000000.0)
                    AS BIGINT) AS y
        FROM cum CROSS JOIN total
        WHERE n IN (SELECT CAST(CEIL(d_total * k / 10.0) AS BIGINT)
                    FROM total, (SELECT UNNEST(RANGE(1, 11)) AS k))
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS np,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy
        FROM pts
    )
    SELECT np AS n_points,
           (SELECT d_total FROM total) AS n_docs,
           (SELECT CAST(MAX(v) AS BIGINT) FROM cum) AS vocab,
           (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta,
           (CAST(sy AS DOUBLE)
            - (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * CAST(sx AS DOUBLE))
             / CAST(np AS DOUBLE) / 1000000000.0 AS ln_k
    FROM s
    """,
)
def heaps_law_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.linkage import global_cumsum, global_rank

    docs = read_parquet_table(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("token"),
    ).distinct()
    newc = (
        dt.groupBy("token")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_tokens"))
    )
    base = (
        docs.select("doc_id")
        .distinct()
        .join(newc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("new_tokens", F.lit(0))
            .cast("decimal(20,0)")
            .alias("new_tokens"),
        )
        # one row per doc — tiny. Without this checkpoint the
        # explode+distinct token pipeline above re-executes for EVERY
        # downstream action (global_rank's offset collect, global_cumsum's
        # totals collect, the d_total count, and the two final-action
        # branches): 5 full corpus tokenizations for one result
        # (r11 optimization round, guide §1.2 "don't recompute what you
        # already have"). Lazy: global_rank's collect materializes it.
        .localCheckpoint(eager=False)
    )
    ranked = global_rank(
        base,
        ["doc_id"],
        (F.col("doc_id") / F.lit(1024)).cast("bigint"),
        rank_col="n",
    )
    cum = global_cumsum(
        ranked,
        ["doc_id"],
        (F.col("doc_id") / F.lit(1024)).cast("bigint"),
        "new_tokens",
        cum_col="v",
    )
    d_total = cum.count()
    targets = sorted({math.ceil(d_total * k / 10.0) for k in range(1, 11)})
    pts = cum.filter(F.col("n").isin(targets)).select(
        F.round(F.log(F.col("n").cast("double")) * F.lit(1000000000.0))
        .cast("bigint")
        .alias("x"),
        F.round(
            F.log(F.col("v").cast("double")) * F.lit(1000000000.0)
        )
        .cast("bigint")
        .alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("np"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    vocab = cum.agg(
        F.max(F.col("v")).cast("bigint").alias("vocab")
    )
    npd = F.col("np").cast("double")
    beta = (
        npd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / (
        npd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    return (
        s.crossJoin(F.broadcast(vocab))
        .select(
            F.col("np").alias("n_points"),
            F.lit(d_total).cast("bigint").alias("n_docs"),
            "vocab",
            beta.alias("beta"),
            (
                (F.col("sy").cast("double") - beta * F.col("sx").cast("double"))
                / npd
                / F.lit(1000000000.0)
            ).alias("ln_k"),
        )
    )


# ---------------------------------------------------------------------------
# Chao1 richness estimate (r8): how much vocabulary HAVEN'T we seen —
# the ecology species-richness estimator applied to tokens:
# Chao1 = V + f1²/(2·f2) with f1/f2 = singleton/doubleton counts
# (Chao 1984). The sampling-completeness gate next to Heaps/Zipf: if
# Chao1 ≈ V the corpus has exhausted its vocabulary (true for this
# fixture's ~31-token stream); a large gap means more data keeps
# paying. One token-count aggregate + one frequency-of-frequency
# aggregate — vocab-domain only.
@query(
    "chao1_vocab_docs",
    oracle=r"""
    WITH tf AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                     AS token
            FROM documents
        ) GROUP BY token
    ), fof AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS v,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f1,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f2,
               CAST(SUM(c) AS BIGINT) AS n_tokens
        FROM tf
    )
    SELECT v AS vocab, f1 AS singletons, f2 AS doubletons, n_tokens,
           CASE WHEN f2 > 0
                THEN v + CAST(f1 AS DOUBLE) * f1 / (2.0 * f2)
                ELSE v + CAST(f1 AS DOUBLE) * (f1 - 1.0) / 2.0
           END AS chao1
    FROM fof
    """,
)
def chao1_vocab_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    fof = tf.agg(
        F.count(F.lit(1)).cast("bigint").alias("v"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("f2"),
        F.sum("c").cast("bigint").alias("n_tokens"),
    )
    chao = F.when(
        F.col("f2") > 0,
        F.col("v")
        + F.col("f1").cast("double")
        * F.col("f1")
        / (F.lit(2.0) * F.col("f2")),
    ).otherwise(
        F.col("v")
        + F.col("f1").cast("double") * (F.col("f1") - F.lit(1.0)) / F.lit(2.0)
    )
    return fof.select(
        F.col("v").alias("vocab"),
        F.col("f1").alias("singletons"),
        F.col("f2").alias("doubletons"),
        "n_tokens",
        chao.alias("chao1"),
    )


# ---------------------------------------------------------------------------
# Token diversity per source (r8): Shannon entropy H = −Σ pᵢ ln pᵢ
# over each source's token distribution plus Pielou evenness
# J = H / ln V — the corpus-mix health stat (a source whose evenness
# collapses is template spam). Each −p·ln p term is nano-rounded to
# a BIGINT before the sum (ln is the only libm call; BLEU
# discipline), so both engines agree bit-for-bit. Vocab-domain
# aggregates only.
@query(
    "token_diversity_sources",
    oracle=r"""
    WITH tf AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT source,
                   unnest(string_split_regex(lower(trim(text)), '\s+'))
                     AS token
            FROM documents
        ) GROUP BY 1, 2
    ), tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM tf GROUP BY 1
    ), terms AS (
        SELECT tf.source,
               CAST(ROUND(0.0 - (CAST(tf.c AS DOUBLE) / tot.n)
                          * ln(CAST(tf.c AS DOUBLE) / tot.n)
                          * 1000000000.0) AS BIGINT) AS t
        FROM tf JOIN tot ON tot.source = tf.source
    )
    SELECT terms.source,
           tot.v AS vocab, tot.n AS n_tokens,
           CAST(SUM(terms.t) AS DOUBLE) / 1000000000.0 AS shannon_h,
           CAST(SUM(terms.t) AS DOUBLE) / 1000000000.0
             / ln(CAST(tot.v AS DOUBLE)) AS evenness
    FROM terms JOIN tot ON tot.source = terms.source
    GROUP BY terms.source, tot.v, tot.n
    ORDER BY terms.source
    """,
)
def token_diversity_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = tf.groupBy("source").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    p = F.col("c").cast("double") / F.col("n")
    terms = tf.join(tot, "source").select(
        "source",
        F.round((F.lit(0.0) - p * F.log(p)) * F.lit(1000000000.0))
        .cast("bigint")
        .alias("t"),
    )
    return (
        terms.groupBy("source")
        .agg(F.sum("t").alias("st"))
        .join(tot, "source")
        .select(
            "source",
            F.col("v").alias("vocab"),
            F.col("n").alias("n_tokens"),
            (F.col("st").cast("double") / F.lit(1000000000.0)).alias(
                "shannon_h"
            ),
            (
                F.col("st").cast("double")
                / F.lit(1000000000.0)
                / F.log(F.col("v").cast("double"))
            ).alias("evenness"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Weighted Jaccard / Ruzicka similarity between sources (r8): the
# MULTISET overlap Σmin(cₐ,c_b)/Σmax(cₐ,c_b) — set-Jaccard ignores
# how often tokens repeat, JSD is a divergence; Ruzicka is the
# frequency-aware similarity retrieval stacks use for corpus-mix
# near-duplication. Identity Σmax = nₐ + n_b − Σmin means only the
# SHARED-token join is ever computed (token-keyed self-join on the
# vocab-domain tf relation); top-10 most similar pairs.
@query(
    "ruzicka_similarity_sources",
    oracle=r"""
    WITH tf AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c FROM (
            SELECT source,
                   unnest(string_split_regex(lower(trim(text)), '\s+'))
                     AS token
            FROM documents
        ) GROUP BY 1, 2
    ), tot AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM tf GROUP BY 1
    ), shared AS (
        SELECT a.source AS src_a, b.source AS src_b,
               CAST(SUM(LEAST(a.c, b.c)) AS BIGINT) AS sum_min
        FROM tf a JOIN tf b
          ON a.token = b.token AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.src_a, s.src_b, s.sum_min,
           ta.n + tb.n - s.sum_min AS sum_max,
           CAST(s.sum_min AS DOUBLE) / (ta.n + tb.n - s.sum_min)
             AS ruzicka
    FROM shared s
    JOIN tot ta ON ta.source = s.src_a
    JOIN tot tb ON tb.source = s.src_b
    ORDER BY ruzicka DESC, src_a, src_b
    LIMIT 10
    """,
)
def ruzicka_similarity_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "source",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .groupBy("source", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = tf.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    a, b = tf.alias("a"), tf.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.token") == F.col("b.token"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"),
            F.col("b.source").alias("src_b"),
        )
        .agg(
            F.sum(F.least(F.col("a.c"), F.col("b.c")))
            .cast("bigint")
            .alias("sum_min")
        )
    )
    ta = tot.select(F.col("source").alias("src_a"), F.col("n").alias("na"))
    tb = tot.select(F.col("source").alias("src_b"), F.col("n").alias("nb"))
    return (
        shared.join(ta, "src_a")
        .join(tb, "src_b")
        .select(
            "src_a",
            "src_b",
            "sum_min",
            (F.col("na") + F.col("nb") - F.col("sum_min"))
            .cast("bigint")
            .alias("sum_max"),
            (
                F.col("sum_min").cast("double")
                / (F.col("na") + F.col("nb") - F.col("sum_min"))
            ).alias("ruzicka"),
        )
        .orderBy(F.col("ruzicka").desc(), "src_a", "src_b")
        .limit(10)
    )
