r"""Keyword-search & corpus-LM query surface: inverted index, BM25
retrieval, phrase search, and unigram-LM document scoring.

Part of the LLM-data-pipeline extension (SURVEY.md §7): lexical
retrieval over the corpus is how decontamination audits, eval-mining,
and quality spot-checks are actually run at training-data scale.

Determinism: ``ln`` is the only libm-variable op; every ln-derived
per-term value is rounded to a micro-int BIGINT before any sum, so
cross-engine results are bit-identical (tfidf convention,
plans/corpus.py).

Scale notes (100 TB corpus):
- bm25_topk_docs: query-term filter sits UNDER the aggregation —
  only matching tokens shuffle; df/N/avgdl are tiny broadcasts; the
  only corpus-sized shuffle is the (doc, term) tf count, which is the
  index-build cost itself.
- inverted_index_tokens: vocabulary-sized output; posting lists are
  capped in real deployments (operators/search.py max_postings).
- unigram_logprob_docs: vocab logprobs are vocabulary-sized and
  broadcast back onto per-doc term counts — one corpus shuffle total.
- phrase_search_docs: pure map-side scan expression, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.search import bm25_topk, inverted_index, phrase_match, term_counts
from ..sources.readers import read_parquet_table
from . import query
from .simops import _sql_cosine

BM25_TERMS = ("spark", "merge", "window")
PHRASE = "fast merge"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Inverted index: posting lists for the core vocabulary (df ≥ 100).
@query(
    "inverted_index_tokens",
    oracle=r"""
    WITH tc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
            FROM documents
        ) GROUP BY doc_id, token
    )
    SELECT token,
           array_to_string(list(doc_id ORDER BY doc_id), ',') AS postings,
           CAST(COUNT(*) AS BIGINT) AS doc_freq,
           CAST(SUM(tf) AS BIGINT) AS total_tf
    FROM tc
    GROUP BY token
    HAVING COUNT(*) >= 100
    ORDER BY token
    """,
)
def inverted_index_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # The operator returns real array<long> posting lists; the gated
    # query projects them to a CSV string because the driver's value
    # hash is only proven on scalar columns.
    return (
        inverted_index(docs, min_df=100)
        .withColumn("postings", F.array_join(F.col("postings"), ","))
        .orderBy("token")
    )


# ---------------------------------------------------------------------------
# BM25 top-10 for a fixed conjunctive query. k1=1.2, b=0.75 (the
# standard defaults); idf is the Lucene ln(1 + (N-df+.5)/(df+.5))
# form. Per-term scores are micro-rounded then BIGINT-summed.
@query(
    "bm25_topk_docs",
    oracle=rf"""
    WITH lens AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS dl
        FROM documents
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_dl
        FROM lens
    ),
    tc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
            FROM documents
        ) WHERE token IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}', '{BM25_TERMS[2]}')
        GROUP BY doc_id, token
    ),
    dfreq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tc GROUP BY token
    ),
    scored AS (
        SELECT tc.doc_id,
               CAST(ROUND(
                   ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                            / (CAST(d.df AS DOUBLE) + 0.5))
                   * CAST(tc.tf AS DOUBLE) * 2.2
                   / (CAST(tc.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE)
                               / (CAST(s.total_dl AS DOUBLE)
                                  / CAST(s.n_docs AS DOUBLE))))
                   * 1000000.0) AS BIGINT) AS term_micro
        FROM tc
        JOIN dfreq d USING (token)
        JOIN lens l USING (doc_id)
        CROSS JOIN stats s
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
               CAST(SUM(term_micro) AS BIGINT) AS score_micro
        FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_terms_hit, score_micro,
           CAST(score_micro AS DOUBLE) / 1000000.0 AS score, rank
    FROM (
        SELECT *, CAST(row_number() OVER (
                      ORDER BY score_micro DESC, doc_id) AS INTEGER) AS rank
        FROM per_doc
    )
    WHERE rank <= 10
    ORDER BY rank
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=10).orderBy("rank")


# ---------------------------------------------------------------------------
# Exact-phrase search: substring containment with first position and
# occurrence count — a pure map-side scan expression.
@query(
    "phrase_search_docs",
    oracle=f"""
    SELECT doc_id,
           CAST(strpos(text, '{PHRASE}') AS BIGINT) AS first_pos,
           CAST((length(text) - length(replace(text, '{PHRASE}', '')))
                / {len(PHRASE)} AS BIGINT) AS n_occurrences
    FROM documents
    WHERE strpos(text, '{PHRASE}') > 0
    ORDER BY doc_id
    """,
)
def phrase_search_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return phrase_match(docs, PHRASE).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Unigram-LM document scoring: mean log p(token) under the corpus's own
# unigram distribution — the cheap perplexity proxy used to rank
# documents for curation (out-of-distribution docs score low). Vocab
# logprobs are micro-rounded; the per-doc sum Σ tf·logp_micro is exact
# BIGINT; the mean divides twice in a fixed order.
@query(
    "unigram_logprob_docs",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
    lp AS (
        SELECT token,
               CAST(ROUND(ln(CAST(cnt AS DOUBLE) / CAST(t.total AS DOUBLE))
                          * 1000000.0) AS BIGINT) AS logp_micro
        FROM vocab CROSS JOIN tot t
    ),
    tc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tok,
           CAST(SUM(tf * logp_micro) AS BIGINT) AS logp_sum_micro,
           CAST(SUM(tf * logp_micro) AS DOUBLE) / 1000000.0
               / CAST(SUM(tf) AS DOUBLE) AS mean_logprob
    FROM tc JOIN lp USING (token)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tc = term_counts(docs)
    vocab = tc.groupBy("token").agg(F.sum("tf").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double"))
            * F.lit(1_000_000.0)
        )
        .cast("bigint")
        .alias("logp_micro"),
    )
    return (
        tc.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tok"),
            F.sum(F.col("tf") * F.col("logp_micro")).alias("logp_sum_micro"),
        )
        .select(
            "doc_id",
            "n_tok",
            "logp_sum_micro",
            (
                F.col("logp_sum_micro").cast("double")
                / F.lit(1_000_000.0)
                / F.col("n_tok").cast("double")
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Bigram-LM document scoring: mean log p(w2|w1) under an add-1-smoothed
# bigram model trained on the corpus itself — the classic C4/CCNet-style
# perplexity filter one notch above the unigram proxy (fluent text
# scores high; shuffled/boilerplate text scores low even when its
# unigram mix looks normal). Same determinism scheme: each conditional
# logprob is micro-rounded to BIGINT, per-doc sums are exact integers,
# the mean divides twice in a fixed order.
#
# Scale shape (100 TB corpus): two corpus-sized shuffles — the bigram
# count (the model build itself) and the per-doc bigram count — plus a
# bigram-vocabulary join that AQE sizes (NOT forced broadcast: bigram
# vocab grows ~linearly with corpus token diversity, unlike the unigram
# vocab). Context counts derive from the bigram counts (no extra pass),
# and V is a one-row broadcast.
@query(
    "bigram_logprob_docs",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
    ),
    pos AS (
        SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok
    ),
    big AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM pos
    ),
    cnt12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM big GROUP BY w1, w2
    ),
    cnt1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM cnt12 GROUP BY w1),
    vocab AS (
        SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v
        FROM (SELECT unnest(toks) AS token FROM tok)
    ),
    lp AS (
        SELECT w1, w2,
               CAST(ROUND(ln((CAST(c12 AS DOUBLE) + 1.0)
                             / (CAST(c1 AS DOUBLE) + CAST(vb.v AS DOUBLE)))
                          * 1000000.0) AS BIGINT) AS logp_micro
        FROM cnt12 JOIN cnt1 USING (w1) CROSS JOIN vocab vb
    ),
    dbig AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
        FROM big GROUP BY doc_id, w1, w2
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(tf * logp_micro) AS BIGINT) AS logp_sum_micro,
           CAST(SUM(tf * logp_micro) AS DOUBLE) / 1000000.0
               / CAST(SUM(tf) AS DOUBLE) AS mean_logprob
    FROM dbig JOIN lp USING (w1, w2)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.col("text"), r"\s+").alias("toks"))
    # Guard size>=2 BEFORE sequence(): Spark's sequence(1, 0) yields a
    # DESCENDING [1, 0], not empty (DuckDB's range(1, 1) is empty).
    big = (
        tok.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    cnt12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    cnt1 = cnt12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = tok.select(F.explode("toks").alias("token")).agg(
        F.countDistinct("token").alias("v")
    )
    lp = (
        cnt12.join(cnt1, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "w1",
            "w2",
            F.round(
                F.log(
                    (F.col("c12").cast("double") + F.lit(1.0))
                    / (F.col("c1").cast("double") + F.col("v").cast("double"))
                )
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("logp_micro"),
        )
    )
    dbig = big.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    return (
        dbig.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("logp_micro")).alias("logp_sum_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "logp_sum_micro",
            (
                F.col("logp_sum_micro").cast("double")
                / F.lit(1_000_000.0)
                / F.col("n_bigrams").cast("double")
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Retrieval-quality evaluation: reciprocal rank @10 per query — the
# metric loop that closes the search family (index → rank → EVALUATE).
# Deterministic setup: queries are five fixed terms; relevance label =
# "document's first token equals the term" (a synthetic but exact
# label); ranking = tf DESC, doc_id ASC (tie-stable). rr_micro =
# 1e6 // first_relevant_rank, 0 when no relevant doc ranks in the top
# 10. One tf shuffle + one per-term window; query set broadcasts at
# any corpus size.
_MRR_TERMS = ("spark", "merge", "window", "table", "key")


@query(
    "mrr_eval_docs",
    oracle=rf"""
    WITH q AS (SELECT unnest({list(_MRR_TERMS)!r}) AS term),
    first_tok AS (
      SELECT doc_id, string_split_regex(text, '\s+')[1] AS ft FROM documents
    ),
    tf AS (
      SELECT doc_id, token AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents
      ) WHERE token IN {tuple(_MRR_TERMS)!r}
      GROUP BY doc_id, token
    ),
    ranked AS (
      SELECT term, doc_id, tf,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id) AS rnk
      FROM tf
    ),
    rel AS (
      SELECT r.term, MIN(r.rnk) AS first_rel_rank
      FROM ranked r JOIN first_tok f USING (doc_id)
      WHERE f.ft = r.term AND r.rnk <= 10
      GROUP BY r.term
    )
    SELECT q.term,
           CAST(COALESCE(first_rel_rank, 0) AS BIGINT) AS first_rel_rank,
           CAST(CASE WHEN first_rel_rank IS NULL THEN 0
                     ELSE 1000000 // first_rel_rank END AS BIGINT) AS rr_micro
    FROM q LEFT JOIN rel USING (term)
    ORDER BY term
    """,
)
def mrr_eval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    first_tok = docs.select(
        "doc_id", F.element_at(toks, 1).alias("ft")
    )
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*_MRR_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    ranked = tf.withColumn("rnk", F.row_number().over(w))
    rel = (
        ranked.join(first_tok, "doc_id")
        .filter((F.col("ft") == F.col("term")) & (F.col("rnk") <= 10))
        .groupBy("term")
        .agg(F.min("rnk").alias("first_rel_rank"))
    )
    q = spark.createDataFrame([(t,) for t in _MRR_TERMS], ["term"])
    return (
        q.join(rel, "term", "left")
        .select(
            "term",
            F.coalesce("first_rel_rank", F.lit(0))
            .cast("bigint")
            .alias("first_rel_rank"),
            F.when(
                F.col("first_rel_rank").isNull(), F.lit(0).cast("bigint")
            )
            .otherwise(F.expr("1000000 div first_rel_rank"))
            .alias("rr_micro"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval via Reciprocal Rank Fusion (r7; Cormack et al.
# 2009): fuse the BM25 top-20 for the fixed term query with the dense
# cosine top-20 around document 0's embedding (documents and
# embeddings share the 0..N-1 id space). RRF needs no score
# calibration — only ranks — which is why it is the standard lexical
# × dense combiner. Both rankers and the fusion arithmetic are
# reproduced in the oracle (nano-unit reciprocal ranks, BIGINT sums),
# so the hash pins the full hybrid pipeline.
@query(
    "hybrid_rrf_docs",
    oracle=rf"""
    WITH lens AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS dl
        FROM documents
    ),
    stats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS BIGINT) AS total_dl
        FROM lens
    ),
    tc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
            FROM documents
        ) WHERE token IN ('{BM25_TERMS[0]}', '{BM25_TERMS[1]}', '{BM25_TERMS[2]}')
        GROUP BY doc_id, token
    ),
    dfreq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tc GROUP BY token
    ),
    scored AS (
        SELECT tc.doc_id,
               CAST(ROUND(
                   ln(1.0 + (CAST(s.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5)
                            / (CAST(d.df AS DOUBLE) + 0.5))
                   * CAST(tc.tf AS DOUBLE) * 2.2
                   / (CAST(tc.tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * CAST(l.dl AS DOUBLE)
                               / (CAST(s.total_dl AS DOUBLE)
                                  / CAST(s.n_docs AS DOUBLE))))
                   * 1000000.0) AS BIGINT) AS term_micro
        FROM tc
        JOIN dfreq d USING (token)
        JOIN lens l USING (doc_id)
        CROSS JOIN stats s
    ),
    sparse AS (
        SELECT doc_id, rank FROM (
            SELECT doc_id,
                   CAST(row_number() OVER (
                       ORDER BY SUM(term_micro) DESC, doc_id) AS INTEGER) AS rank
            FROM scored GROUP BY doc_id
        ) WHERE rank <= 20
    ),
    dense AS (
        SELECT doc_id, rank FROM (
            SELECT c.vec_id AS doc_id,
                   CAST(row_number() OVER (
                       ORDER BY {_sql_cosine('c.embedding', 'q.embedding')} DESC, c.vec_id) AS INTEGER) AS rank
            FROM embeddings c JOIN embeddings q ON q.vec_id = 0
            WHERE c.vec_id <> 0
        ) WHERE rank <= 20
    ),
    fused AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lists,
               CAST(SUM(c) AS BIGINT) AS rrf_nano
        FROM (
            SELECT doc_id,
                   CAST(ROUND(1000000000.0 / (60 + rank)) AS BIGINT) AS c
            FROM sparse
            UNION ALL
            SELECT doc_id,
                   CAST(ROUND(1000000000.0 / (60 + rank)) AS BIGINT)
            FROM dense
        ) GROUP BY doc_id
    )
    SELECT doc_id, n_lists, rrf_nano, rank FROM (
        SELECT *, CAST(row_number() OVER (
                      ORDER BY rrf_nano DESC, doc_id) AS INTEGER) AS rank
        FROM fused
    ) WHERE rank <= 10
    ORDER BY rank
    """,
)
def hybrid_rrf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.search import rrf_fuse
    from ..operators.similarity import brute_force_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    sparse = bm25_topk(docs, BM25_TERMS, k=20).select("doc_id", "rank")
    q0 = emb.filter(F.col("vec_id") == 0)
    dense = brute_force_topk(
        emb, q0, vec_col="embedding", id_col="vec_id",
        query_id_col="vec_id", k=20,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([sparse, dense], "doc_id", k=60, topk=10).orderBy("rank")


# ---------------------------------------------------------------------------
# Stupid Backoff LM scoring (r7; Brants et al. 2007, "Large Language
# Models in Machine Translation" — public paper): S(w2|w1) = c12/c1
# when the bigram was seen in TRAINING, else 0.4 · unigram backoff.
# Unlike bigram_logprob_docs (model == corpus, so every scored bigram
# is in-model), the model here trains on the EVEN doc ids and scores
# ALL docs — held-out scoring, so the backoff path genuinely fires on
# odd docs' unseen bigrams. The terminal unigram uses add-1 over the
# training mass ((c(w2)+1)/(N+V)) so unseen words stay finite — a
# documented deviation from the paper's raw c(w)/N, which is log(0)
# for OOV. Same determinism scheme as the other LM scores:
# micro-rounded per-step logs, exact BIGINT doc sums, fixed-order
# double division at the end.
#
# Scale shape: two train-half shuffles build the model (bigram +
# unigram counts); scoring is one doc-bigram shuffle plus two
# vocab-keyed LEFT joins that AQE sizes. The 0.4 factor is a literal;
# nothing iterates.
@query(
    "stupid_backoff_logprob_docs",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
    ),
    big AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok)
    ),
    tbig AS (SELECT w1, w2 FROM big WHERE doc_id % 2 = 0),
    cnt12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM tbig GROUP BY w1, w2
    ),
    cnt1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM cnt12 GROUP BY w1),
    tuni AS (
        SELECT token AS w2, CAST(COUNT(*) AS BIGINT) AS cw FROM (
            SELECT unnest(toks) AS token FROM tok WHERE doc_id % 2 = 0
        ) GROUP BY token
    ),
    tstats AS (
        SELECT CAST(SUM(cw) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS v
        FROM tuni
    ),
    dbig AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
        FROM big GROUP BY doc_id, w1, w2
    ),
    lp AS (
        SELECT d.doc_id, d.tf,
               (c12.c12 IS NULL) AS backed_off,
               CAST(ROUND(CASE
                   WHEN c12.c12 IS NOT NULL THEN
                       ln(CAST(c12.c12 AS DOUBLE) / CAST(c1.c1 AS DOUBLE))
                   ELSE
                       ln(0.4 * (CAST(coalesce(u.cw, 0) AS DOUBLE) + 1.0)
                          / (CAST(s.n AS DOUBLE) + CAST(s.v AS DOUBLE)))
               END * 1000000.0) AS BIGINT) AS logp_micro
        FROM dbig d
        LEFT JOIN cnt12 c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
        LEFT JOIN cnt1 c1 ON d.w1 = c1.w1
        LEFT JOIN tuni u ON d.w2 = u.w2
        CROSS JOIN tstats s
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN backed_off THEN tf ELSE 0 END) AS BIGINT)
               AS n_backoff,
           CAST(SUM(tf * logp_micro) AS BIGINT) AS logp_sum_micro,
           CAST(SUM(tf * logp_micro) AS DOUBLE) / 1000000.0
               / CAST(SUM(tf) AS DOUBLE) AS mean_logprob
    FROM lp
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def stupid_backoff_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.col("text"), r"\s+").alias("toks"))
    big = (
        tok.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    tbig = big.filter(F.col("doc_id") % 2 == 0)
    cnt12 = tbig.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    cnt1 = cnt12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    tuni = (
        tok.filter(F.col("doc_id") % 2 == 0)
        .select(F.explode("toks").alias("w2"))
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    tstats = tuni.agg(
        F.sum("cw").alias("n"), F.count(F.lit(1)).alias("v")
    )
    dbig = big.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).alias("tf")
    )
    lp = (
        dbig.join(cnt12, ["w1", "w2"], "left")
        .join(cnt1, "w1", "left")
        .join(tuni, "w2", "left")
        .crossJoin(F.broadcast(tstats))
        .select(
            "doc_id",
            "tf",
            F.col("c12").isNull().alias("backed_off"),
            F.round(
                F.when(
                    F.col("c12").isNotNull(),
                    F.log(
                        F.col("c12").cast("double")
                        / F.col("c1").cast("double")
                    ),
                ).otherwise(
                    F.log(
                        F.lit(0.4)
                        * (
                            F.coalesce(F.col("cw"), F.lit(0)).cast("double")
                            + F.lit(1.0)
                        )
                        / (
                            F.col("n").cast("double")
                            + F.col("v").cast("double")
                        )
                    )
                )
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("logp_micro"),
        )
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.when(F.col("backed_off"), F.col("tf")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_backoff"),
            F.sum(F.col("tf") * F.col("logp_micro"))
            .cast("bigint")
            .alias("logp_sum_micro"),
            (
                F.sum(F.col("tf") * F.col("logp_micro")).cast("double")
                / F.lit(1_000_000.0)
                / F.sum("tf").cast("double")
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# CCNet-style perplexity bucketing (Wenzek et al. 2020, public): score
# every document under a language model trained on a REFERENCE corpus
# (CCNet uses Wikipedia; here the deterministic doc_id%2==0 half — the
# stupid-backoff train/score split), then cut the ranking into
# head / middle / tail terciles. CCNet keeps "head" for pretraining and
# drops or down-weights "tail"; the bucket label is the curation signal.
#
# Model: add-1-smoothed unigram LM — p(w) = (cnt(w)+1)/(N+V+1), unseen
# tokens get 1/(N+V+1) — so scoring is total (never NULL) on the held
# half. Determinism: each logprob micro-rounds to BIGINT before the
# per-doc integer sum; the mean divides twice in a fixed order; the
# tercile is cut on (mean_logprob DESC, doc_id).
#
# Scale: the LM is vocabulary-sized (broadcast); the only corpus
# shuffle is the (doc, token) tf count. The tercile does NOT use a
# global NTILE window (single-reducer hole) — it reuses the
# block-offset exact global rank (operators/linkage.py::global_rank)
# over a score-coarsened block key, then computes NTILE's bucket
# boundaries arithmetically from the total count: bit-identical to the
# window at any partitioning.
@query(
    "perplexity_buckets_docs",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents
    ),
    tc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM tok GROUP BY doc_id, token
    ),
    train AS (
        SELECT token, CAST(SUM(tf) AS BIGINT) AS cnt
        FROM tc WHERE doc_id % 2 = 0 GROUP BY token
    ),
    ts AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
        FROM train
    ),
    lp AS (
        SELECT t.doc_id, t.tf,
               CAST(ROUND(ln(
                   (CAST(COALESCE(tr.cnt, 0) AS DOUBLE) + 1.0)
                   / (CAST(s.n AS DOUBLE) + CAST(s.v AS DOUBLE) + 1.0))
                   * 1000000.0) AS BIGINT) AS logp_micro
        FROM tc t LEFT JOIN train tr USING (token) CROSS JOIN ts s
    ),
    pd AS (
        SELECT doc_id,
               CAST(SUM(tf) AS BIGINT) AS n_tok,
               CAST(SUM(tf * logp_micro) AS BIGINT) AS logp_sum_micro,
               CAST(SUM(tf * logp_micro) AS DOUBLE) / 1000000.0
                   / CAST(SUM(tf) AS DOUBLE) AS mean_logprob
        FROM lp GROUP BY doc_id
    )
    SELECT doc_id, n_tok, logp_sum_micro, mean_logprob,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS bucket
    FROM (
        SELECT *, ntile(3) OVER (ORDER BY mean_logprob DESC, doc_id) AS nt
        FROM pd
    ) t
    ORDER BY doc_id
    """,
)
def perplexity_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import global_rank

    docs = _t(spark, sf_dir, "documents")
    tc = term_counts(docs)
    train = (
        tc.filter(F.col("doc_id") % 2 == 0)
        .groupBy("token")
        .agg(F.sum("tf").cast("bigint").alias("cnt"))
    )
    ts = train.agg(
        F.sum("cnt").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    lp = (
        tc.join(F.broadcast(train), "token", "left")
        .crossJoin(F.broadcast(ts))
        .select(
            "doc_id",
            "tf",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(1.0))
                    / (F.col("n").cast("double") + F.col("v").cast("double") + F.lit(1.0))
                )
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("logp_micro"),
        )
    )
    pd_ = (
        lp.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tok"),
            F.sum(F.col("tf") * F.col("logp_micro"))
            .cast("bigint")
            .alias("logp_sum_micro"),
        )
        .select(
            "doc_id",
            "n_tok",
            "logp_sum_micro",
            (
                F.col("logp_sum_micro").cast("double")
                / F.lit(1_000_000.0)
                / F.col("n_tok").cast("double")
            ).alias("mean_logprob"),
        )
        .withColumn("__negmean", -F.col("mean_logprob"))
        .persist()
    )
    n_docs = pd_.count()
    q, r = divmod(n_docs, 3)
    ranked = global_rank(
        pd_,
        ["__negmean", "doc_id"],
        F.floor(F.col("__negmean") * F.lit(4.0)),
        rank_col="__rk",
    )
    # NTILE(3) arithmetic: the first r buckets hold q+1 rows each.
    # When n_docs < 3 (q == 0) every rank lands in the <= cut branch;
    # the otherwise-divisor still must be non-zero under ANSI, and
    # using max(q, 1) there is safe because that branch is unreachable.
    cut = r * (q + 1)
    nt = F.when(
        F.col("__rk") <= F.lit(cut),
        ((F.col("__rk") - 1) / F.lit(q + 1)).cast("long") + 1,
    ).otherwise(
        F.lit(r)
        + ((F.col("__rk") - F.lit(cut) - 1) / F.lit(max(q, 1))).cast("long")
        + 1
    )
    return (
        ranked.select(
            "doc_id",
            "n_tok",
            "logp_sum_micro",
            "mean_logprob",
            F.when(nt == 1, F.lit("head"))
            .when(nt == 2, F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# NDCG@10 (Järvelin & Kekäläinen 2002, public) for the same eval
# harness as mrr_eval_docs: tf-ranked top-10 per term, graded
# relevance (2 = doc's first token IS the term, 1 = tf >= 3, else 0),
# gain (2^rel - 1), position discount 1/log2(r+1). The discount
# micro-rounds to BIGINT per position (log2 is the only libm op);
# DCG/IDCG are exact integer sums, the final normalization is one
# double division. IDCG re-ranks the SAME retrieved@10 list by rel
# desc (ideal-ordering-of-retrieved, the standard eval variant).
@query(
    "ndcg_eval_docs",
    oracle=rf"""
    WITH q AS (SELECT unnest({list(_MRR_TERMS)!r}) AS term),
    first_tok AS (
      SELECT doc_id, string_split_regex(text, '\s+')[1] AS ft FROM documents
    ),
    tf AS (
      SELECT doc_id, token AS term, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents
      ) WHERE token IN {tuple(_MRR_TERMS)!r}
      GROUP BY doc_id, token
    ),
    ranked AS (
      SELECT term, doc_id, tf,
             row_number() OVER (PARTITION BY term
                                ORDER BY tf DESC, doc_id) AS rnk
      FROM tf
    ),
    graded AS (
      SELECT r.term, r.rnk,
             CASE WHEN f.ft = r.term THEN 2
                  WHEN r.tf >= 3 THEN 1 ELSE 0 END AS rel
      FROM ranked r JOIN first_tok f USING (doc_id)
      WHERE r.rnk <= 10
    ),
    dcg AS (
      SELECT term,
             CAST(SUM((POW(2, rel) - 1)
                      * ROUND(1000000.0 / log2(rnk + 1))) AS BIGINT)
                 AS dcg_micro
      FROM graded GROUP BY term
    ),
    ideal AS (
      SELECT term,
             row_number() OVER (PARTITION BY term
                                ORDER BY rel DESC, rnk) AS irnk,
             rel
      FROM graded
    ),
    idcg AS (
      SELECT term,
             CAST(SUM((POW(2, rel) - 1)
                      * ROUND(1000000.0 / log2(irnk + 1))) AS BIGINT)
                 AS idcg_micro
      FROM ideal GROUP BY term
    )
    SELECT q.term,
           CAST(COALESCE(dcg_micro, 0) AS BIGINT) AS dcg_micro,
           CAST(COALESCE(idcg_micro, 0) AS BIGINT) AS idcg_micro,
           CASE WHEN COALESCE(idcg_micro, 0) = 0 THEN 0.0
                ELSE CAST(dcg_micro AS DOUBLE) / CAST(idcg_micro AS DOUBLE)
           END AS ndcg
    FROM q LEFT JOIN dcg USING (term) LEFT JOIN idcg USING (term)
    ORDER BY term
    """,
)
def ndcg_eval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), r"\s+")
    first_tok = docs.select("doc_id", F.element_at(toks, 1).alias("ft"))
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*_MRR_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    w = Window.partitionBy("term").orderBy(F.desc("tf"), F.asc("doc_id"))
    graded = (
        tf.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .join(first_tok, "doc_id")
        .select(
            "term",
            "rnk",
            F.when(F.col("ft") == F.col("term"), F.lit(2))
            .when(F.col("tf") >= 3, F.lit(1))
            .otherwise(F.lit(0))
            .alias("rel"),
        )
    )

    def dcg_sum(rank_col):
        return (
            F.sum(
                (F.pow(F.lit(2), F.col("rel")) - F.lit(1))
                * F.round(F.lit(1_000_000.0) / F.log2(F.col(rank_col) + 1))
            )
            .cast("bigint")
        )

    dcg = graded.groupBy("term").agg(dcg_sum("rnk").alias("dcg_micro"))
    wi = Window.partitionBy("term").orderBy(F.desc("rel"), F.asc("rnk"))
    idcg = (
        graded.withColumn("irnk", F.row_number().over(wi))
        .groupBy("term")
        .agg(dcg_sum("irnk").alias("idcg_micro"))
    )
    q = spark.createDataFrame([(t,) for t in _MRR_TERMS], ["term"])
    return (
        q.join(dcg, "term", "left")
        .join(idcg, "term", "left")
        .select(
            "term",
            F.coalesce("dcg_micro", F.lit(0)).cast("bigint").alias("dcg_micro"),
            F.coalesce("idcg_micro", F.lit(0))
            .cast("bigint")
            .alias("idcg_micro"),
            F.when(F.coalesce("idcg_micro", F.lit(0)) == 0, F.lit(0.0))
            .otherwise(
                F.col("dcg_micro").cast("double")
                / F.col("idcg_micro").cast("double")
            )
            .alias("ndcg"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram LM scoring (r7; Kneser & Ney 1995 /
# Chen & Goodman 1999, public papers) — completes the LM triad
# (MLE bigram, Stupid Backoff, KN). Fixed discount D = 0.75:
#
#   P_KN(w2|w1) = max(c12 - D, 0)/c1  +  (D * n1p_fw(w1) / c1) * Pc(w2)
#   Pc(w2)      = (n1p_bw(w2) + 1) / (n_bigram_types + V)
#
# where n1p_fw(w1) = |{w2 : c(w1,w2)>0}| (distinct continuations of
# w1), n1p_bw(w2) = |{w1 : c(w1,w2)>0}| (distinct histories of w2).
# The +1/+V on the continuation distribution is a documented
# deviation from the paper (same convention as this repo's Stupid
# Backoff terminal): raw KN assigns P=0 to OOV w2, which is log(0)
# on the held-out half. Unseen w1 (no history mass to discount)
# backs off to the smoothed continuation distribution alone.
#
# Trains on doc_id%2==0 and scores ALL docs, so the discount,
# interpolation, and OOV paths all genuinely fire. Determinism: all
# counts are exact BIGINTs; each bigram's logprob is computed once in
# fixed-order double arithmetic and micro-rounded to BIGINT before
# the per-doc sum (order-independent across partitionings).
#
# Scale shape: the model is three vocab/bigram-type-sized aggregates
# off ONE train-half shuffle; scoring is one (doc,bigram) tf shuffle
# plus vocab-keyed LEFT joins AQE sizes (the model side is tiny
# relative to the corpus, so they broadcast at any real scale).
@query(
    "kneser_ney_logprob_docs",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
    ),
    big AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM tok)
    ),
    cnt12 AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        FROM big WHERE doc_id % 2 = 0 GROUP BY w1, w2
    ),
    cnt1 AS (
        SELECT w1,
               CAST(SUM(c12) AS BIGINT) AS c1,
               CAST(COUNT(*) AS BIGINT) AS n1p_fw
        FROM cnt12 GROUP BY w1
    ),
    contw AS (
        SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1p_bw
        FROM cnt12 GROUP BY w2
    ),
    tstats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(COUNT(DISTINCT w2) AS BIGINT) AS v
        FROM cnt12
    ),
    dbig AS (
        SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS tf
        FROM big GROUP BY doc_id, w1, w2
    ),
    lp AS (
        SELECT d.doc_id, d.tf,
               (c1.c1 IS NULL) AS oov_history,
               CAST(ROUND(ln(CASE
                   WHEN c1.c1 IS NOT NULL THEN
                       GREATEST(CAST(coalesce(c12.c12, 0) AS DOUBLE) - 0.75,
                                0.0) / CAST(c1.c1 AS DOUBLE)
                       + (0.75 * CAST(c1.n1p_fw AS DOUBLE)
                          / CAST(c1.c1 AS DOUBLE))
                         * ((CAST(coalesce(cw.n1p_bw, 0) AS DOUBLE) + 1.0)
                            / (CAST(s.n_types AS DOUBLE)
                               + CAST(s.v AS DOUBLE)))
                   ELSE
                       (CAST(coalesce(cw.n1p_bw, 0) AS DOUBLE) + 1.0)
                       / (CAST(s.n_types AS DOUBLE) + CAST(s.v AS DOUBLE))
               END) * 1000000.0) AS BIGINT) AS logp_micro
        FROM dbig d
        LEFT JOIN cnt12 c12 ON d.w1 = c12.w1 AND d.w2 = c12.w2
        LEFT JOIN cnt1 c1 ON d.w1 = c1.w1
        LEFT JOIN contw cw ON d.w2 = cw.w2
        CROSS JOIN tstats s
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN oov_history THEN tf ELSE 0 END) AS BIGINT)
               AS n_oov_history,
           CAST(SUM(tf * logp_micro) AS BIGINT) AS logp_sum_micro,
           CAST(SUM(tf * logp_micro) AS DOUBLE) / 1000000.0
               / CAST(SUM(tf) AS DOUBLE) AS mean_logprob
    FROM lp
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def kneser_ney_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.col("text"), r"\s+").alias("toks"))
    big = (
        tok.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    cnt12 = (
        big.filter(F.col("doc_id") % 2 == 0)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c12"))
    )
    cnt1 = cnt12.groupBy("w1").agg(
        F.sum("c12").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n1p_fw"),
    )
    contw = cnt12.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n1p_bw")
    )
    tstats = cnt12.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_types"),
        F.countDistinct("w2").cast("bigint").alias("v"),
    )
    dbig = big.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    pc = (
        (F.coalesce(F.col("n1p_bw"), F.lit(0)).cast("double") + F.lit(1.0))
        / (F.col("n_types").cast("double") + F.col("v").cast("double"))
    )
    seen_p = (
        F.greatest(
            F.coalesce(F.col("c12"), F.lit(0)).cast("double") - F.lit(0.75),
            F.lit(0.0),
        )
        / F.col("c1").cast("double")
        + (
            F.lit(0.75)
            * F.col("n1p_fw").cast("double")
            / F.col("c1").cast("double")
        )
        * pc
    )
    lp = (
        dbig.join(cnt12, ["w1", "w2"], "left")
        .join(cnt1, "w1", "left")
        .join(contw, "w2", "left")
        .crossJoin(F.broadcast(tstats))
        .select(
            "doc_id",
            "tf",
            F.col("c1").isNull().alias("oov_history"),
            F.round(
                F.log(F.when(F.col("c1").isNotNull(), seen_p).otherwise(pc))
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("logp_micro"),
        )
    )
    return (
        lp.groupBy("doc_id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(
                F.when(F.col("oov_history"), F.col("tf")).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_oov_history"),
            F.sum(F.col("tf") * F.col("logp_micro"))
            .cast("bigint")
            .alias("logp_sum_micro"),
            (
                F.sum(F.col("tf") * F.col("logp_micro")).cast("double")
                / F.lit(1_000_000.0)
                / F.sum("tf").cast("double")
            ).alias("mean_logprob"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Reverse search / percolation (r8): match DOCUMENTS against STORED
# QUERIES — the alerting/subscription direction (Elasticsearch
# percolator): saved searches fire as new docs arrive. Stored alerts
# are derived deterministically from the corpus itself (the 30 most
# document-frequent tokens, ranked (df DESC, token); alert i = terms
# ranked {i, i+10, i+20}, ALL-terms-must-match semantics). The match
# is a term-keyed join of the tiny broadcast alert-term table against
# the distinct (doc, term) relation, then a (alert, doc) count ==
# n_terms gate — vocab-domain + candidate-domain shuffles only, never
# docs × alerts. The streaming twin is the same join inside
# foreachBatch; here the batch form is oracle-gated.
@query(
    "reverse_search_alerts_docs",
    oracle=r"""
    WITH dt AS (
        SELECT DISTINCT doc_id, token FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+'))
                     AS token
            FROM documents
        )
    ), df AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1
    ), ranked AS (
        SELECT token, ROW_NUMBER() OVER (ORDER BY df DESC, token) AS r
        FROM df
    ), alert_terms AS (
        SELECT ((r - 1) % 10) + 1 AS alert_id, token
        FROM ranked WHERE r <= 30
    ), hits AS (
        SELECT a.alert_id, dt.doc_id, COUNT(*) AS matched
        FROM alert_terms a JOIN dt ON dt.token = a.token
        GROUP BY 1, 2
    )
    SELECT CAST(h.alert_id AS BIGINT) AS alert_id,
           (SELECT array_to_string(list(token ORDER BY token), ' ')
            FROM alert_terms t WHERE t.alert_id = h.alert_id) AS terms,
           CAST(COUNT(*) AS BIGINT) AS n_matching_docs
    FROM hits h
    WHERE h.matched = 3
    GROUP BY h.alert_id
    ORDER BY alert_id
    """,
)
def reverse_search_alerts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dt = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("token"),
    ).distinct()
    df = dt.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # rank over the vocab aggregate (bounded domain), keep top 30
    w = Window.orderBy(F.col("df").desc(), "token")
    alert_terms = (
        df.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= 30)
        .select(
            (((F.col("r") - 1) % 10) + 1).alias("alert_id"), "token"
        )
    )
    hits = (
        dt.join(F.broadcast(alert_terms), "token")
        .groupBy("alert_id", "doc_id")
        .agg(F.count(F.lit(1)).alias("matched"))
        .filter(F.col("matched") == 3)
        .groupBy("alert_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_matching_docs"))
    )
    terms = alert_terms.groupBy("alert_id").agg(
        F.array_join(F.array_sort(F.collect_list("token")), " ").alias(
            "terms"
        )
    )
    return (
        hits.join(terms, "alert_id")
        .select(
            F.col("alert_id").cast("bigint").alias("alert_id"),
            "terms",
            "n_matching_docs",
        )
        .orderBy("alert_id")
    )


# Rank-biased overlap weights p^(d-1) for p = 0.9, depth 20 —
# precomputed PYTHON literals injected into both engines' plans (pow
# is banned in-engine: not correctly rounded), so the weighted sum is
# built from identical constants on both sides.
_RBO_P = 0.9
_RBO_DEPTH = 20
_RBO_W = [_RBO_P**d for d in range(_RBO_DEPTH)]


# ---------------------------------------------------------------------------
# Rank-biased overlap (r8, Webber et al. 2010): how similar are two
# RANKINGS — here the corpus's top-20 terms by document frequency vs
# by total term frequency (the df-vs-tf disagreement is exactly what
# separates BM25-ish from raw-count retrieval). RBO's top-weighted
# geometric weighting (p = 0.9) is what NDCG/MRR don't give: a
# prefix-similarity score BETWEEN rankings, not against relevance.
# Per-depth overlaps are exact integers; each weighted term is
# nano-rounded before the integer sum (BLEU discipline), so both
# engines agree bit-for-bit. Everything runs on the 20-row ranked
# prefixes (vocab-domain aggregates underneath).
@query(
    "rbo_df_vs_tf_terms",
    oracle=rf"""
    WITH tf AS (
        SELECT token,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
               CAST(COUNT(*) AS BIGINT) AS ttf
        FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+'))
                     AS token
            FROM documents
        ) GROUP BY token
    ), ra AS (
        SELECT token, ROW_NUMBER() OVER (ORDER BY df DESC, token) AS r
        FROM tf QUALIFY r <= {_RBO_DEPTH}
    ), rb AS (
        SELECT token, ROW_NUMBER() OVER (ORDER BY ttf DESC, token) AS r
        FROM tf QUALIFY r <= {_RBO_DEPTH}
    ), joined AS (
        SELECT COALESCE(ra.token, rb.token) AS token,
               ra.r AS r_a, rb.r AS r_b
        FROM ra FULL OUTER JOIN rb ON rb.token = ra.token
    ), depths AS (
        SELECT UNNEST(RANGE(1, {_RBO_DEPTH + 1})) AS d,
               UNNEST([{", ".join(repr(w) for w in _RBO_W)}]) AS w
    ), terms AS (
        SELECT d.d, d.w,
               CAST(SUM(CASE WHEN j.r_a <= d.d AND j.r_b <= d.d
                             THEN 1 ELSE 0 END) AS BIGINT) AS ov
        FROM depths d CROSS JOIN joined j
        GROUP BY d.d, d.w
    )
    SELECT CAST({_RBO_DEPTH} AS BIGINT) AS depth,
           {_RBO_P} AS p,
           CAST(MAX(CASE WHEN d = {_RBO_DEPTH} THEN ov END) AS BIGINT)
             AS overlap_at_depth,
           CAST(SUM(CAST(ROUND(w * ov / d * 1000000000.0) AS BIGINT))
                AS DOUBLE) * {1.0 - _RBO_P} / 1000000000.0 AS rbo
    FROM terms
    """,
)
def rbo_df_vs_tf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tf = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("df"),
            F.count(F.lit(1)).cast("bigint").alias("ttf"),
        )
    )
    wa = Window.orderBy(F.col("df").desc(), "token")
    wb = Window.orderBy(F.col("ttf").desc(), "token")
    ra = (
        tf.withColumn("r_a", F.row_number().over(wa))
        .filter(F.col("r_a") <= _RBO_DEPTH)
        .select("token", "r_a")
    )
    rb = (
        tf.withColumn("r_b", F.row_number().over(wb))
        .filter(F.col("r_b") <= _RBO_DEPTH)
        .select("token", "r_b")
    )
    joined = ra.join(rb, "token", "full_outer")
    depths = spark.createDataFrame(
        [(d + 1, w) for d, w in enumerate(_RBO_W)], ["d", "w"]
    )
    terms = (
        depths.crossJoin(joined)
        .groupBy("d", "w")
        .agg(
            F.sum(
                F.when(
                    (F.col("r_a") <= F.col("d"))
                    & (F.col("r_b") <= F.col("d")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("ov")
        )
    )
    return terms.agg(
        F.lit(_RBO_DEPTH).cast("bigint").alias("depth"),
        F.lit(_RBO_P).alias("p"),
        F.max(F.when(F.col("d") == _RBO_DEPTH, F.col("ov")))
        .cast("bigint")
        .alias("overlap_at_depth"),
        (
            F.sum(
                F.round(
                    F.col("w") * F.col("ov") / F.col("d") * F.lit(1000000000.0)
                ).cast("bigint")
            ).cast("double")
            * F.lit(1.0 - _RBO_P)
            / F.lit(1000000000.0)
        ).alias("rbo"),
    )
