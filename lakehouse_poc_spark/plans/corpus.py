"""Corpus-level text analytics for training-data pipelines:
vocabulary construction, TF-IDF term weighting, Gopher-style
repetition screens, benchmark decontamination, and deterministic
global shuffle ordering.

These extend the per-document screens in plans/textops.py to
whole-corpus statistics — the operations a 100 TB pretraining
pipeline runs between raw ingestion and sequence packing. The
reference (lakehouse-poc) has no text surface at all; this family is part
of the SURVEY §7 extension plan.

Determinism: fractions are single IEEE divisions of exact integer
counts (bit-identical across engines). TF-IDF uses natural log —
the one transcendental in the repo's oracle surface — so the score
is rounded to 6 dp and the ranking key is the rounded micro-int,
making tie semantics identical in Spark and DuckDB.

100 TB shapes:
- vocab_top_tokens: explode → partial count (map-side combine) →
  one shuffle on token → global top-k. Vocabulary cardinality,
  not corpus size, bounds the shuffle.
- tfidf_top_terms: one shuffle to (doc, term) counts; document
  frequencies are vocabulary-sized and broadcast back.
- text_repetition_stats: per-doc grouped counts — shuffles on
  (doc_id, gram), never across documents.
- decontaminate_docs: eval-set grams are a small fraction of the
  corpus (held-out split); the gram join is the only shuffle, and
  AQE will broadcast the eval side when it fits.
- global_shuffle_documents: a range-partitioned sort on a uniform
  md5 key — the canonical distributed shuffle of training data
  (balanced partitions for free because the key is uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens, word_shingles
from ..sources.readers import read_parquet_table
from . import query

_TEXTOPS_STOPLIST = ", ".join(f"'{w}'" for w in STOPWORDS)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Vocabulary construction: global top-k tokens by occurrence count.
@query(
    "vocab_top_tokens",
    oracle=r"""
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents
    )
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .orderBy(F.desc("n_occurrences"), "token")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TF-IDF: top-3 most characteristic terms per document.
#
# score = tf * ln((N + 1) / (df + 1))  (smoothed IDF). ln is the one
# operation IEEE doesn't pin down bit-for-bit across libm
# implementations, so the published score is ROUND(.., 6) and the
# rank key is the rounded micro-int — tie handling is then exact and
# identical in both engines.
@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH tc AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS token
            FROM documents
        )
        GROUP BY doc_id, token
    ),
    dfreq AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tc GROUP BY token
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tc.doc_id, tc.token, tc.tf, dfreq.df,
               CAST(ROUND(CAST(tc.tf AS DOUBLE)
                    * ln((CAST(n.n_docs AS DOUBLE) + 1.0)
                         / (CAST(dfreq.df AS DOUBLE) + 1.0)) * 1000000.0)
                    AS BIGINT) AS score_micro
        FROM tc, dfreq, n
        WHERE tc.token = dfreq.token
    )
    SELECT doc_id, token, tf, df,
           CAST(score_micro AS DOUBLE) / 1000000.0 AS tfidf
    FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY doc_id
                   ORDER BY score_micro DESC, token) AS rk
        FROM scored
    )
    WHERE rk <= 3
    ORDER BY doc_id, token
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tc = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # Document frequencies: one row per (doc, term) already, so a
    # plain count per token is the distinct-doc count. Vocabulary-
    # sized → broadcast back onto the big relation.
    dfreq = tc.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tc.join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score_micro",
            F.round(
                F.col("tf").cast("double")
                * F.log(
                    (F.col("n_docs").cast("double") + F.lit(1.0))
                    / (F.col("df").cast("double") + F.lit(1.0))
                )
                * F.lit(1000000.0)
            ).cast("bigint"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_micro"), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (F.col("score_micro").cast("double") / F.lit(1000000.0)).alias("tfidf"),
        )
        .orderBy("doc_id", "token")
    )


# ---------------------------------------------------------------------------
# Gopher-style repetition screens: distinct-token ratio, most-common-
# token fraction, most-common-bigram fraction, and the resulting
# keep/drop flag. (Rae et al. 2021, "Scaling Language Models" §A1.1 —
# public paper; thresholds here are illustrative.)
@query(
    "text_repetition_stats",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
    ),
    tok_counts AS (
        SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT doc_id, unnest(w) AS token FROM toks)
        GROUP BY doc_id, token
    ),
    tok_stats AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_tok,
               CAST(COUNT(*) AS BIGINT) AS n_distinct,
               CAST(MAX(c) AS BIGINT) AS top_tok
        FROM tok_counts GROUP BY doc_id
    ),
    big_counts AS (
        SELECT doc_id, gram, CAST(COUNT(*) AS BIGINT) AS c
        FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(w)),
                          i -> w[i] || ' ' || w[i + 1])) AS gram
            FROM toks
        )
        GROUP BY doc_id, gram
    ),
    big_stats AS (
        SELECT doc_id,
               CAST(SUM(c) AS BIGINT) AS n_big,
               CAST(MAX(c) AS BIGINT) AS top_big
        FROM big_counts GROUP BY doc_id
    )
    SELECT t.doc_id,
           t.n_tok,
           CAST(t.n_distinct AS DOUBLE) / CAST(t.n_tok AS DOUBLE)
               AS distinct_frac,
           CAST(t.top_tok AS DOUBLE) / CAST(t.n_tok AS DOUBLE)
               AS top_token_frac,
           CAST(b.top_big AS DOUBLE) / CAST(b.n_big AS DOUBLE)
               AS top_bigram_frac,
           (CAST(t.n_distinct AS DOUBLE) / CAST(t.n_tok AS DOUBLE) >= 0.2
            AND CAST(t.top_tok AS DOUBLE) / CAST(t.n_tok AS DOUBLE) <= 0.2
            AND CAST(b.top_big AS DOUBLE) / CAST(b.n_big AS DOUBLE) <= 0.18)
               AS keep
    FROM tok_stats t JOIN big_stats b ON t.doc_id = b.doc_id
    ORDER BY t.doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok_counts = (
        docs.select("doc_id", F.explode(tokens("text")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tok_stats = tok_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_tok"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_tok"),
    )
    big_counts = (
        docs.select("doc_id", F.explode(word_shingles("text", 2)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big_stats = big_counts.groupBy("doc_id").agg(
        F.sum("c").alias("n_big"), F.max("c").alias("top_big")
    )
    distinct_frac = F.col("n_distinct").cast("double") / F.col("n_tok").cast("double")
    top_token_frac = F.col("top_tok").cast("double") / F.col("n_tok").cast("double")
    top_bigram_frac = F.col("top_big").cast("double") / F.col("n_big").cast("double")
    return (
        tok_stats.join(big_stats, "doc_id")
        .select(
            "doc_id",
            "n_tok",
            distinct_frac.alias("distinct_frac"),
            top_token_frac.alias("top_token_frac"),
            top_bigram_frac.alias("top_bigram_frac"),
            (
                (distinct_frac >= 0.2)
                & (top_token_frac <= 0.2)
                & (top_bigram_frac <= 0.18)
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training docs that share any token
# 8-gram with the held-out eval split. The split reuses the repo's
# md5-bucket convention (curation.py): bucket >= 'f0' (16/256 ≈ 6%)
# is "eval", the rest is the training corpus being screened.
_EVAL_LO = "f0"
_DECONTAM_N = 8


@query(
    "decontaminate_docs",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS b,
               string_split_regex(text, '\s+') AS w
        FROM documents
    ),
    g AS (
        SELECT DISTINCT doc_id, b,
               array_to_string(w[i.i:i.i + {_DECONTAM_N - 1}], ' ') AS gram
        FROM d, LATERAL unnest(range(1, len(w) - {_DECONTAM_N - 2})) AS i(i)
    ),
    eval_grams AS (
        SELECT DISTINCT gram FROM g WHERE b >= '{_EVAL_LO}'
    ),
    hits AS (
        SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
        FROM g JOIN eval_grams e USING (gram)
        WHERE g.b < '{_EVAL_LO}'
        GROUP BY g.doc_id
    )
    SELECT t.doc_id,
           CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_grams,
           COALESCE(h.n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM d WHERE b < '{_EVAL_LO}') t
    LEFT JOIN hits h ON t.doc_id = h.doc_id
    ORDER BY t.doc_id
    """,
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bucketed = docs.select(
        "doc_id",
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2).alias("b"),
        "text",
    )
    grams = bucketed.select(
        "doc_id",
        "b",
        F.explode(word_shingles("text", _DECONTAM_N)).alias("gram"),
    ).distinct()
    eval_grams = (
        grams.filter(F.col("b") >= _EVAL_LO).select("gram").distinct()
    )
    train_grams = grams.filter(F.col("b") < _EVAL_LO)
    # The eval split is a small fraction of the corpus; AQE broadcasts
    # it when it fits, otherwise this is one shuffle on gram.
    hits = (
        train_grams.join(eval_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    train = bucketed.filter(F.col("b") < _EVAL_LO).select("doc_id")
    return (
        train.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("bigint").alias(
                "n_shared_grams"
            ),
            (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Deterministic global shuffle: the training-order permutation as a
# range-partitioned sort on a salted md5 key. Uniform key → balanced
# partitions; same seed → same order on any cluster size.
_SHUFFLE_SEED = "seed42:"


@query(
    "global_shuffle_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5('{_SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_pos
    FROM documents
    ORDER BY doc_id
    """,
)
def global_shuffle_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(_SHUFFLE_SEED), F.col("doc_id").cast("string")))
    w = Window.orderBy(key, "doc_id")
    return docs.select(
        "doc_id", F.row_number().over(w).cast("bigint").alias("shuffle_pos")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Context-window chunking: overlapping fixed-width windows per doc —
# the step before embedding long documents or packing them into model
# context windows. Zero shuffle: pure codegen map over the scan
# (operators/chunking.py); the ORDER BY here is presentation-only.
@query(
    "chunk_documents_windows",
    oracle="""
    WITH t AS (
        SELECT doc_id, text,
               greatest(1, CAST(ceil((CAST(length(text) AS DOUBLE) - 16.0) / 48.0)
                                AS BIGINT)) AS n_win
        FROM documents
    )
    , e AS (
        SELECT doc_id, text, unnest(range(0, n_win)) AS i FROM t
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(i * 48 AS BIGINT) AS chunk_start,
           substr(text, CAST(i * 48 + 1 AS INT), 64) AS chunk_text,
           CAST(length(substr(text, CAST(i * 48 + 1 AS INT), 64)) AS BIGINT)
               AS chunk_len
    FROM e
    ORDER BY doc_id, chunk_id
    """,
)
def chunk_documents_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_text_windows

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_text_windows(docs, "text", chunk_chars=64, overlap=16).orderBy(
        "doc_id", "chunk_id"
    )


# ---------------------------------------------------------------------------
# Token co-occurrence PMI over the top-k vocabulary: which frequent
# tokens appear together in the same document more than chance.
#
# 100 TB shape: the vocabulary is a TakeOrdered top-k (tiny) and is
# BROADCAST back onto the exploded token stream, so the only real
# shuffle is the per-document self-join on doc_id — bounded at ≤k
# vocab tokens per document (≤ k·(k−1)/2 pairs), never tokens².
# PMI's ln is rounded to 6 dp (the corpus-family convention) so tie
# semantics match the oracle bit-for-bit.
_PMI_VOCAB_K = 40


@query(
    "token_cooccurrence_pmi",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\s+'))) AS token
        FROM documents
    ),
    freq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM tok GROUP BY token),
    vocab AS (SELECT token, doc_freq FROM freq ORDER BY doc_freq DESC, token LIMIT {_PMI_VOCAB_K}),
    tv AS (SELECT t.doc_id, t.token, v.doc_freq
           FROM tok t JOIN vocab v USING (token)),
    pc AS (
        SELECT a.token AS token_a, b.token AS token_b,
               a.doc_freq AS df_a, b.doc_freq AS df_b,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM tv a JOIN tv b ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2, 3, 4
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents)
    SELECT token_a, token_b, n_docs,
           ROUND(ln(CAST(n_docs * n_total AS DOUBLE) / CAST(df_a * df_b AS DOUBLE)), 6)
               AS pmi
    FROM pc, tot
    ORDER BY n_docs DESC, token_a, token_b
    LIMIT 30
    """,
)
def token_cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.array_distinct(tokens("text"))).alias("token")
    )
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("doc_freq"))
    vocab = freq.orderBy(F.desc("doc_freq"), "token").limit(_PMI_VOCAB_K)
    tv = tok.join(F.broadcast(vocab), "token")
    a, b = tv.alias("a"), tv.alias("b")
    pairs = a.join(b, on="doc_id").filter(F.col("a.token") < F.col("b.token"))
    pc = pairs.groupBy(
        F.col("a.token").alias("token_a"),
        F.col("b.token").alias("token_b"),
        F.col("a.doc_freq").alias("df_a"),
        F.col("b.doc_freq").alias("df_b"),
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        pc.crossJoin(F.broadcast(total))
        .select(
            "token_a",
            "token_b",
            "n_docs",
            F.round(
                F.log(
                    (F.col("n_docs") * F.col("n_total")).cast("double")
                    / (F.col("df_a") * F.col("df_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("n_docs"), "token_a", "token_b")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Repeated-passage detection (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better" — public paper): verbatim 8-gram
# spans appearing in MORE THAN ONE document are the memorization
# hazard sub-document dedup targets. One (doc, gram) explode + one
# groupBy — the same shuffle shape as decontaminate_docs but
# corpus-vs-itself. Output: each cross-doc repeated gram with its
# occurrence and document counts (the removal worklist).
_PASSAGE_N = 8


@query(
    "repeated_passages_docs",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
    ),
    g AS (
        SELECT doc_id,
               array_to_string(w[i.i:i.i + {_PASSAGE_N - 1}], ' ') AS gram
        FROM d, LATERAL unnest(range(1, len(w) - {_PASSAGE_N - 2})) AS i(i)
    )
    SELECT gram,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM g
    GROUP BY gram
    HAVING COUNT(DISTINCT doc_id) > 1
    ORDER BY gram
    """,
)
def repeated_passages_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import fan_out

    # fan_out: the corpus arrives as one small file = one input split;
    # the 8-gram explode is the per-row-expensive step, so widen first.
    docs = fan_out(_t(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.explode(word_shingles("text", _PASSAGE_N)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("gram")
    )


# ---------------------------------------------------------------------------
# BPE tokenizer TRAINING (operators/bpe.py): the learned merge table
# over the corpus. Rows-only like the k-means quantizer (iterative —
# not SQL-expressible); correctness is pinned by the exact
# merge-table-equality test against the pure-Python textbook loop
# (tests/test_corpus.py), determinism by the (count desc, pair asc)
# tie-break.
@query("bpe_train_docs")
def bpe_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=20)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# BPE tokenizer APPLICATION: encode the corpus with the trained merge
# table — the other half of the tokenizer lifecycle (train once,
# encode 100 TB). Rows-only (the merge table is data-derived, so the
# encoding isn't expressible as a static SQL twin); exact per-token
# parity with the pure-Python encoder is pinned in tests/test_corpus.py.
# Output is one row per document with its token count and a prefix of
# the token stream (deterministic).
@query("bpe_encode_docs")
def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bpe import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=20)
    return (
        bpe_encode(docs, "text", "doc_id", merges)
        .select(
            "doc_id",
            "n_tokens",
            F.concat_ws(" ", F.slice("toks", 1, 8)).alias("head_tokens"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Repeated-passage REMOVAL: the rewrite half of repeated_passages_docs
# (Lee et al. sub-document dedup). Every token covered by a cross-doc
# verbatim 8-gram is dropped and the survivors are reassembled in
# order; output carries before/removed counts and the md5 of the
# cleaned text so the differential hash pins the exact reassembly.
@query(
    "remove_repeated_passages_docs",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, i.i - 1 AS gpos,
               array_to_string(w[i.i:i.i + {_PASSAGE_N - 1}], ' ') AS gram
        FROM d, LATERAL unnest(range(1, len(w) - {_PASSAGE_N - 2})) AS i(i)
    ),
    rep AS (
        SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) > 1
    ),
    cov AS (
        SELECT DISTINCT g.doc_id, g.gpos + o.o AS pos
        FROM g JOIN rep USING (gram),
             LATERAL unnest(range(0, {_PASSAGE_N})) AS o(o)
    ),
    toks AS (
        SELECT doc_id, i.i - 1 AS pos, w[i.i] AS tok
        FROM d, LATERAL unnest(range(1, len(w) + 1)) AS i(i)
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.tok
        FROM toks t ANTI JOIN cov c
          ON t.doc_id = c.doc_id AND t.pos = c.pos
    )
    SELECT d.doc_id,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM toks t
             WHERE t.doc_id = d.doc_id) AS n_tokens_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cov c
             WHERE c.doc_id = d.doc_id) AS n_removed,
           md5(coalesce((SELECT string_agg(k.tok, ' ' ORDER BY k.pos)
                          FROM kept k WHERE k.doc_id = d.doc_id), ''))
               AS clean_md5
    FROM d
    ORDER BY d.doc_id
    """,
)
def remove_repeated_passages_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import remove_repeated_passages

    docs = _t(spark, sf_dir, "documents")
    return (
        remove_repeated_passages(docs, "text", "doc_id", n=_PASSAGE_N)
        .select(
            "doc_id",
            "n_tokens_before",
            "n_removed",
            F.md5("clean_text").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. 2021 ExactSubstr, r7 — VERDICT r6
# task 4): remove every token covered by a verbatim repeated substring
# of >= _SUBSTR_K tokens, counting ALL occurrence sites (within-doc
# repeats included — the passage detector above is cross-doc only).
# Suffix-array semantics via the k-gram coverage equivalence; brute
# suffix-LCP parity proven in tests/test_corpus.py. md5-pinned like
# remove_repeated_passages_docs so the hash check pins the reassembly.
_SUBSTR_K = 12


@query(
    "substring_dedup_docs",
    oracle=rf"""
    WITH d AS (
        SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                                   x -> x <> '') AS w
        FROM documents
    ),
    g AS (
        SELECT doc_id, i.i - 1 AS gpos,
               array_to_string(w[i.i:i.i + {_SUBSTR_K - 1}], ' ') AS gram
        FROM d, LATERAL unnest(range(1, len(w) - {_SUBSTR_K - 2})) AS i(i)
    ),
    rep AS (
        SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ),
    cov AS (
        SELECT DISTINCT g.doc_id, g.gpos + o.o AS pos
        FROM g JOIN rep USING (gram),
             LATERAL unnest(range(0, {_SUBSTR_K})) AS o(o)
    ),
    toks AS (
        SELECT doc_id, i.i - 1 AS pos, w[i.i] AS tok
        FROM d, LATERAL unnest(range(1, len(w) + 1)) AS i(i)
    ),
    kept AS (
        SELECT t.doc_id, t.pos, t.tok
        FROM toks t ANTI JOIN cov c
          ON t.doc_id = c.doc_id AND t.pos = c.pos
    )
    SELECT d.doc_id,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM toks t
             WHERE t.doc_id = d.doc_id) AS n_tokens_before,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cov c
             WHERE c.doc_id = d.doc_id) AS n_removed,
           md5(coalesce((SELECT string_agg(k.tok, ' ' ORDER BY k.pos)
                          FROM kept k WHERE k.doc_id = d.doc_id), ''))
               AS clean_md5
    FROM d
    ORDER BY d.doc_id
    """,
)
def substring_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import exact_substring_dedup

    docs = _t(spark, sf_dir, "documents")
    return (
        exact_substring_dedup(docs, "text", "doc_id", min_len=_SUBSTR_K)
        .select(
            "doc_id",
            "n_tokens_before",
            "n_removed",
            F.md5("clean_text").alias("clean_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Dataset card: the one-row corpus summary that ships WITH a training
# dataset (docs/tokens/chars, language & source breadth, exact-dup
# rate via content fingerprints) — the datasheet headline numbers,
# computed in two passes (one over docs, one distinct over
# fingerprints) and joined as literals. Every figure is integer or
# micro-int; nothing engine-variable.
@query(
    "dataset_card_docs",
    oracle=r"""
    WITH base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS n_chars,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM documents
    ),
    uniq AS (
        SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
        FROM documents
    )
    SELECT n_docs, n_tokens, n_chars, n_langs, n_sources, n_unique,
           CAST(ROUND((1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE))
                      * 1000000.0) AS BIGINT) AS dup_rate_micro
    FROM base CROSS JOIN uniq
    """,
)
def dataset_card_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).cast("bigint").alias("n_tokens"),
        F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
    )
    uniq = docs.agg(F.countDistinct(F.md5("text")).alias("n_unique"))
    return base.crossJoin(F.broadcast(uniq)).select(
        "n_docs",
        "n_tokens",
        "n_chars",
        "n_langs",
        "n_sources",
        "n_unique",
        F.round(
            (
                F.lit(1.0)
                - F.col("n_unique").cast("double") / F.col("n_docs").cast("double")
            )
            * F.lit(1_000_000.0)
        )
        .cast("bigint")
        .alias("dup_rate_micro"),
    )


# ---------------------------------------------------------------------------
# Per-source exact-duplicate rate: the dataset-card dup metric sliced
# by provenance — the first question after "the corpus is 4% dup" is
# "WHICH crawl is doing it". One fingerprint aggregation; a doc is a
# duplicate if its normalized-text md5 appeared under a lower doc_id
# anywhere in the corpus (cross-source dups charge the later source).
@query(
    "dup_rate_by_source",
    oracle=r"""
    WITH fp AS (
        SELECT doc_id, source,
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        FROM documents
    ),
    firsts AS (SELECT f, MIN(doc_id) AS keeper FROM fp GROUP BY f)
    SELECT fp.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN fp.doc_id <> firsts.keeper THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dups,
           CAST(SUM(CASE WHEN fp.doc_id <> firsts.keeper THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_rate
    FROM fp JOIN firsts USING (f)
    GROUP BY fp.source
    ORDER BY fp.source
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import fingerprint_md5

    docs = read_parquet_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", "source", fingerprint_md5("text").alias("f")
    )
    firsts = fp.groupBy("f").agg(F.min("doc_id").alias("keeper"))
    return (
        fp.join(firsts, "f")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_dups"),
            (
                F.sum(
                    F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("dup_rate"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Token-budget concentration: sources ranked by token count with each
# source's cumulative share — the "which sources fill 90% of the
# training budget" read-out. The cumulative sum reuses the
# block-offset cumsum (operators/stats.py::blocked_cumsum — no global
# window even though the per-source relation is small; the discipline
# is uniform). Share divisions run in a fixed order.
@query(
    "token_budget_report",
    oracle=r"""
    WITH per AS (
        SELECT source,
               CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per),
    cum AS (
        SELECT per.*, tot.total,
               SUM(n_tokens) OVER (
                   ORDER BY n_tokens DESC, source
                   ROWS UNBOUNDED PRECEDING) AS cum_tokens
        FROM per CROSS JOIN tot
    )
    SELECT source, n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens,
           CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           CAST(cum_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
    FROM cum
    ORDER BY n_tokens DESC, source
    """,
)
def token_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count
    from ..operators.stats import blocked_cumsum

    docs = read_parquet_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("bigint").alias("n_tokens")
    )
    tot = per.agg(F.sum("n_tokens").cast("bigint").alias("total"))
    # sort key: tokens DESC then source — encode as a single ascending
    # key (negated count) so blocked_cumsum's coarsening block works
    keyed = per.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_tokens",
        "total",
        (-F.col("n_tokens")).alias("__k"),
    )
    cum = blocked_cumsum(
        keyed.withColumn("__sk", F.concat_ws("|", F.lpad(F.col("__k") + 10**12, 13, "0"), "source")),
        "__sk",
        "n_tokens",
        F.floor(F.col("__k") / F.lit(1_000_000)).cast("long"),
        out_col="cum_before",
    )
    return (
        cum.select(
            "source",
            "n_tokens",
            (F.col("cum_before") + F.col("n_tokens"))
            .cast("bigint")
            .alias("cum_tokens"),
            (
                F.col("n_tokens").cast("double") / F.col("total").cast("double")
            ).alias("share"),
            (
                (F.col("cum_before") + F.col("n_tokens")).cast("double")
                / F.col("total").cast("double")
            ).alias("cum_share"),
        )
        .orderBy(F.desc("n_tokens"), F.asc("source"))
    )


# ---------------------------------------------------------------------------
# Signal-agreement audit: Pearson correlation between the two cheap
# quality signals this engine ships (the rule heuristic
# quality_score and the unigram-LM mean logprob). Low agreement means
# the gates disagree about which documents are good — the audit run
# before trusting either as a solo filter. Determinism follows
# corr_profile_lineitem: BOTH signals micro-round to BIGINT per doc
# before any sum (Pearson is affine-invariant, so correlating the
# micro-rounded signals IS the metric's definition here), the five
# sufficient statistics accumulate as exact DECIMAL(38,0) integer
# sums (per-doc products reach ~1e13), and the final correlation
# derives in one fixed double expression.
@query(
    "quality_signal_agreement_docs",
    oracle=rf"""
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
    ),
    lm AS (
        SELECT doc_id,
               CAST(ROUND(CAST(SUM(tf * logp_micro) AS DOUBLE) / 1000000.0
                   / CAST(SUM(tf) AS DOUBLE) * 1000000.0) AS BIGINT) AS y
        FROM tc JOIN lp USING (token) GROUP BY doc_id
    ),
    q AS (
        SELECT doc_id,
               0.5 * least(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) / 200.0, 1.0)
             + 0.3 * least(CAST(len(list_filter(string_split_regex(text, '\s+'),
                                   x -> x IN ({_TEXTOPS_STOPLIST}))) AS DOUBLE)
                           / greatest(CAST(len(string_split_regex(text, '\s+')) AS DOUBLE), 1.0) * 3, 1.0)
             + 0.2 * (1.0 - least(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                                  / CAST(greatest(length(text), 1) AS DOUBLE) * 10, 1.0))
               AS xr
        FROM documents
    ),
    qm AS (
        SELECT doc_id, CAST(ROUND(xr * 1000000.0) AS BIGINT) AS x FROM q
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * y) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(y AS DECIMAL(38,0)) * y) AS DOUBLE) AS syy
        FROM qm JOIN lm USING (doc_id)
    )
    SELECT n, sx, sy,
           (CAST(n AS DOUBLE) * sxy - sx * sy)
               / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                      * (CAST(n AS DOUBLE) * syy - sy * sy)) AS pearson_r
    FROM s
    """,
)
def quality_signal_agreement_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score
    from ..operators.search import term_counts

    docs = read_parquet_table(spark, sf_dir, "documents")
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
    lm = (
        tc.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("tf") * F.col("logp_micro")).cast("double")
                / F.lit(1_000_000.0)
                / F.sum("tf").cast("double")
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("y")
        )
    )
    q = docs.select(
        "doc_id",
        F.round(quality_score("text") * F.lit(1_000_000.0))
        .cast("bigint")
        .alias("x"),
    )

    def dec(c):
        return F.col(c).cast("decimal(38,0)")

    s = (
        q.join(lm, "doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(dec("x")).cast("double").alias("sx"),
            F.sum(dec("y")).cast("double").alias("sy"),
            F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
            F.sum(dec("x") * F.col("x")).cast("double").alias("sxx"),
            F.sum(dec("y") * F.col("y")).cast("double").alias("syy"),
        )
    )
    n_d = F.col("n").cast("double")
    return s.select(
        "n",
        "sx",
        "sy",
        (
            (n_d * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (n_d * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (n_d * F.col("syy") - F.col("sy") * F.col("sy"))
            )
        ).alias("pearson_r"),
    )


# ---------------------------------------------------------------------------
# Leave-one-source-out ablation (r7): for every source, what the
# corpus looks like WITHOUT it — remaining docs/tokens and the
# remaining mean quality score. The whole report is computed from
# ONE per-source aggregate plus broadcast corpus totals (complement
# = total − source, all exact BIGINTs; scores carried as
# micro-rounded integer sums) — never one scan per source. The
# standard data-valuation first pass: sources whose removal RAISES
# the remaining mean are negative-value candidates.
@query(
    "source_ablation_docs",
    oracle=r"""
    WITH d AS (
        SELECT source,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
                   AS n_tok,
               CAST(ROUND(
                   CAST(length(text) - length(regexp_replace(
                        text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) * 1000000.0)
                   AS BIGINT) AS score_micro
        FROM documents WHERE length(text) > 0
    ),
    per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
               CAST(SUM(score_micro) AS BIGINT) AS score_sum
        FROM d GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
               CAST(SUM(n_tokens) AS BIGINT) AS tt,
               CAST(SUM(score_sum) AS BIGINT) AS ts
        FROM per
    )
    SELECT p.source,
           p.n_docs AS docs_removed,
           p.n_tokens AS tokens_removed,
           t.tt - p.n_tokens AS remaining_tokens,
           CAST(t.ts - p.score_sum AS DOUBLE) / 1000000.0
               / CAST(t.td - p.n_docs AS DOUBLE) AS remaining_mean_score,
           CAST(t.ts AS DOUBLE) / 1000000.0 / CAST(t.td AS DOUBLE)
               AS full_mean_score
    FROM per p CROSS JOIN tot t
    ORDER BY p.source
    """,
)
def source_ablation_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    nchars = F.length("text")
    nalpha = nchars - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    d = docs.select(
        "source",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tok"),
        F.round(
            nalpha.cast("double") / nchars.cast("double") * F.lit(1e6)
        )
        .cast("bigint")
        .alias("score_micro"),
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("n_tokens"),
        F.sum("score_micro").cast("bigint").alias("score_sum"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("bigint").alias("td"),
        F.sum("n_tokens").cast("bigint").alias("tt"),
        F.sum("score_sum").cast("bigint").alias("ts"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("n_docs").alias("docs_removed"),
            F.col("n_tokens").alias("tokens_removed"),
            (F.col("tt") - F.col("n_tokens")).alias("remaining_tokens"),
            (
                (F.col("ts") - F.col("score_sum")).cast("double")
                / F.lit(1e6)
                / (F.col("td") - F.col("n_docs")).cast("double")
            ).alias("remaining_mean_score"),
            (
                F.col("ts").cast("double")
                / F.lit(1e6)
                / F.col("td").cast("double")
            ).alias("full_mean_score"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence per source (r7; Lin 1991, public): how
# far each source's token distribution sits from the corpus-wide
# distribution — the drift metric mixing pipelines cut on (bounded
# in [0, ln 2], symmetric, defined even where supports differ).
# JSD = ½Σ p·ln(p/m) + ½Σ q·ln(q/m), m=(p+q)/2, over the GLOBAL
# vocab support (tokens a source lacks still contribute the q side).
# Each token's contribution is one fixed-order double expression
# micro-rounded at 1e12 to a BIGINT before the per-source sum —
# order-independent exact. The grid is sources × vocab built from
# the two aggregate domains (the t-closeness discipline), with the
# per-source token counts LEFT-joined in; one token-keyed shuffle.
@query(
    "js_divergence_sources",
    oracle=r"""
    WITH tok AS (
        SELECT source, unnest(string_split_regex(text, '\s+')) AS token
        FROM documents
    ),
    st AS (
        SELECT source, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM tok GROUP BY 1, 2
    ),
    gt AS (
        SELECT token, CAST(SUM(c) AS BIGINT) AS cg FROM st GROUP BY 1
    ),
    ns AS (
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_s FROM st GROUP BY 1
    ),
    n AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM gt),
    grid AS (
        SELECT ns.source, ns.n_s, gt.token, gt.cg, n.n,
               COALESCE(st.c, 0) AS c
        FROM ns CROSS JOIN gt CROSS JOIN n
        LEFT JOIN st ON st.source = ns.source AND st.token = gt.token
    ),
    terms AS (
        SELECT source,
               (c > 0) AS covered,
               CAST(ROUND((
                   CASE WHEN c > 0 THEN
                       0.5 * (CAST(c AS DOUBLE) / CAST(n_s AS DOUBLE))
                       * ln((CAST(c AS DOUBLE) / CAST(n_s AS DOUBLE))
                            / ((CAST(c AS DOUBLE) / CAST(n_s AS DOUBLE)
                                + CAST(cg AS DOUBLE) / CAST(n AS DOUBLE))
                               / 2.0))
                   ELSE 0.0 END
                   + 0.5 * (CAST(cg AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln((CAST(cg AS DOUBLE) / CAST(n AS DOUBLE))
                          / ((CAST(c AS DOUBLE) / CAST(n_s AS DOUBLE)
                              + CAST(cg AS DOUBLE) / CAST(n AS DOUBLE))
                             / 2.0))
               ) * 1000000000000.0) AS BIGINT) AS term_pico
        FROM grid
    )
    SELECT source,
           CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
               AS tokens_covered,
           CAST(SUM(term_pico) AS DOUBLE) / 1000000000000.0 AS jsd
    FROM terms
    GROUP BY source
    ORDER BY source
    """,
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split(F.col("text"), r"\s+")).alias("token")
    )
    st = tok.groupBy("source", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    gt = st.groupBy("token").agg(F.sum("c").cast("bigint").alias("cg"))
    ns = st.groupBy("source").agg(F.sum("c").cast("bigint").alias("n_s"))
    n = gt.agg(F.sum("cg").cast("bigint").alias("n"))
    grid = (
        ns.crossJoin(gt)
        .crossJoin(F.broadcast(n))
        .join(st, ["source", "token"], "left")
        .select(
            "source",
            "n_s",
            "cg",
            "n",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    p = F.col("c").cast("double") / F.col("n_s").cast("double")
    q = F.col("cg").cast("double") / F.col("n").cast("double")
    m = (p + q) / F.lit(2.0)
    term = (
        F.when(
            F.col("c") > 0, F.lit(0.5) * p * F.log(p / m)
        ).otherwise(F.lit(0.0))
        + F.lit(0.5) * q * F.log(q / m)
    )
    terms = grid.select(
        "source",
        (F.col("c") > 0).alias("covered"),
        F.round(term * F.lit(1e12)).cast("bigint").alias("term_pico"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.sum(F.when(F.col("covered"), 1).otherwise(0))
            .cast("bigint")
            .alias("tokens_covered"),
            (F.sum("term_pico").cast("double") / F.lit(1e12)).alias("jsd"),
        )
        .orderBy("source")
    )
