"""Keyword-search operators: inverted index construction and BM25
ranking over a document corpus.

The reference has no search surface; this is part of the declared
LLM-data-pipeline extension (SURVEY.md §7): corpus indexing and
lexical retrieval are the workhorses of decontamination audits,
eval-set mining, and quality spot-checks over training corpora.

Everything here is pure DataFrame expressions — explode / groupBy /
broadcast joins; no Python UDFs.

Determinism: BM25 involves ``ln`` (the one libm-variable op), so each
per-term score is rounded to a micro-int (BIGINT) before the per-doc
sum — integer addition is exact and order-independent, making the
result bit-identical across engines (same convention as
plans/corpus.py tfidf_top_terms).

Scale shape (100 TB corpus):
- postings: explode → one shuffle on (doc, token) for tf counts; the
  downstream token shuffle carries (token, doc_id, tf) — vocabulary ×
  avg-postings-sized, not corpus-sized.
- bm25: query terms are filtered BEFORE any shuffle (predicate on the
  exploded token reaches the scan side of the agg), so only rows for
  the handful of query terms ever shuffle; doc lengths are a map-side
  expression on the scan; N / avgdl / per-term df are tiny aggregates
  broadcast back. No corpus-sized shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokens


def term_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, token) term frequencies — the atom of the inverted index."""
    return (
        docs.select(id_col, F.explode(tokens(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """Posting lists: one row per token with the sorted doc-id list it
    appears in, document frequency, and total term frequency.

    ``max_postings`` caps the materialized list per token (stop-word
    postings dominate index size; real systems cap or tier them) —
    the cap keeps the lowest doc ids, deterministically.
    """
    tc = term_counts(docs, id_col, text_col)
    postings = tc.groupBy("token").agg(
        F.array_sort(F.collect_list(id_col)).alias("postings"),
        F.count(F.lit(1)).alias("doc_freq"),
        F.sum("tf").alias("total_tf"),
    )
    if max_postings is not None:
        postings = postings.withColumn(
            "postings", F.slice("postings", 1, max_postings)
        )
    return postings.filter(F.col("doc_freq") >= min_df)


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k lexical retrieval for one query (Robertson/Sparck
    Jones; the Lucene ``ln(1 + (N - df + .5)/(df + .5))`` idf form).

    Output: (doc_id, n_terms_hit, score_micro, score) — ``score_micro``
    is the exact BIGINT sum of per-term micro-rounded scores (the
    cross-engine-stable rank key); ``score`` is its double rendering.
    """
    terms = list(query_terms)
    # Per-doc length (map-side expression, no explode) + corpus stats.
    lengths = docs.select(
        F.col(id_col), token_count(text_col).alias("dl")
    )
    stats = lengths.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("total_dl"),
    )
    # Only the query terms' rows survive past the explode — the filter
    # sits under the aggregation, so the shuffle carries just matches.
    tc = (
        docs.select(id_col, F.explode(tokens(text_col)).alias("token"))
        .filter(F.col("token").isin(terms))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))

    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    tf_d = F.col("tf").cast("double")
    dl_norm = F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl
    term_score = idf * tf_d * F.lit(k1 + 1.0) / (tf_d + F.lit(k1) * dl_norm)

    # dfreq/stats are term-count-sized → broadcast. lengths is
    # corpus-sized — NOT broadcast; AQE turns this into a broadcast of
    # the (tiny, query-term-filtered) tc side at runtime.
    scored = (
        tc.join(F.broadcast(dfreq), "token")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_micro",
            F.round(term_score * F.lit(1_000_000.0)).cast("bigint"),
        )
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("term_micro").alias("score_micro"),
    )
    w = Window.orderBy(F.desc("score_micro"), id_col)
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "n_terms_hit",
            "score_micro",
            (F.col("score_micro").cast("double") / F.lit(1_000_000.0)).alias(
                "score"
            ),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def phrase_match(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase containment with first-hit position and occurrence
    count (substring semantics — the post-filter a positional index
    would verify candidates with)."""
    c = F.col(text_col)
    n_occ = (
        (F.length(c) - F.length(F.replace(c, F.lit(phrase), F.lit(""))))
        / F.lit(len(phrase))
    ).cast("bigint")
    return (
        docs.select(
            id_col,
            F.instr(c, phrase).cast("bigint").alias("first_pos"),
            n_occ.alias("n_occurrences"),
        )
        .filter(F.col("first_pos") > 0)
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009 —
    public paper): fused score = Σ over input lists of 1/(k + rank).
    The standard way to combine a lexical (BM25) and a dense (ANN)
    ranking without score calibration — only ranks matter.

    Scores are exact nano-units (floor(1e9/(k+rank) + 0.5), BIGINT
    sum), so the fused ordering is engine-stable; ties break on the
    lower id. Output: (id, n_lists, rrf_nano, rank).

    Scale shape: the inputs are top-k lists — already tiny — so the
    union + groupBy + final ordering window all operate on at most
    Σ|list| rows; the bare global window is result-sized by
    construction, not corpus-sized."""
    from pyspark.sql import Window

    parts = [
        r.select(
            F.col(id_col),
            F.floor(
                F.lit(1_000_000_000.0)
                / (F.lit(float(k)) + F.col("rank").cast("double"))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("__c"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    agg = u.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum("__c").alias("rrf_nano"),
    )
    w = Window.orderBy(F.desc("rrf_nano"), F.asc(id_col))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
    )
