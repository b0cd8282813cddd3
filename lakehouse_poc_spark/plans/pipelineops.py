"""LLM-corpus pipeline queries, round 6: cross-document passage
dedup (CCNet-style), DSIR importance weighting, and the curation
filter funnel.

These extend the training-data surface (SURVEY.md §7.1 stage 9) with
three ops every web-scale corpus pipeline runs between "crawled" and
"trainable": remove passages repeated ACROSS documents (boilerplate,
licence blocks — document-level dedup misses them), score raw
documents against a target domain (importance resampling), and report
how many documents each quality gate of the curation cascade costs
(the observability artifact reviewers ask for before a data freeze).

All three are exact-oracle-gated: md5 bucket hashing, integer
cross-multiplied ratio compares, and micro-rounded log-ratios keep
every output column engine-portable (plans/__init__.py conventions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query

_PD_BLOCK = 20  # passage block size (words)
_DSIR_B = 1024  # DSIR hashed-feature buckets


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Cross-document passage dedup: every 20-word passage keeps its
# globally-first occurrence (ordered by doc_id, block_id); later
# occurrences are dropped and the document re-assembled. One
# passage-keyed shuffle + one per-doc agg — the CCNet paragraph-hash
# shape, exact. At sf0.001 the fixture already contains 71 cross-doc
# repeated passages, so the query exercises real removals.
@query(
    "passage_dedup_docs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    blocks AS (
      SELECT doc_id,
             CAST(t.i AS BIGINT) AS block_id,
             array_to_string(
               list_slice(w, CAST(t.i AS BIGINT) * {_PD_BLOCK} + 1,
                          CAST(t.i AS BIGINT) * {_PD_BLOCK} + {_PD_BLOCK}),
               ' ') AS passage
      FROM toks,
           UNNEST(range(CAST(ceil(len(w) / {_PD_BLOCK}.0) AS BIGINT))) AS t(i)
    ),
    ranked AS (
      SELECT doc_id, block_id, passage,
             row_number() OVER (PARTITION BY passage
                                ORDER BY doc_id, block_id) AS rn
      FROM blocks
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           CAST(COALESCE(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_removed,
           COALESCE(string_agg(CASE WHEN rn = 1 THEN passage END,
                               ' ' ORDER BY block_id), '') AS text_clean
    FROM ranked
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def passage_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.passages import dedup_passages

    docs = _t(spark, sf_dir, "documents")
    return dedup_passages(docs, "text", "doc_id", block_words=_PD_BLOCK)


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023): per-doc
# log p_target − log p_raw over hashed unigram features; target =
# the 'src0' slice standing in for a curated in-domain set. Corpus
# shuffles twice (bucket agg, doc agg); the 1024-bucket model table
# broadcasts at any corpus size.
@query(
    "dsir_importance_docs",
    oracle=f"""
    WITH feats AS (
      SELECT doc_id,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS t,
             CAST(('0x' || substr(md5('dsir:' || tok), 1, 6)) AS BIGINT)
               % {_DSIR_B} AS bucket
      FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
    ),
    counts AS (
      SELECT bucket, SUM(t) AS ct, COUNT(*) AS cr FROM feats GROUP BY bucket
    ),
    totals AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM counts),
    ratio AS (
      SELECT bucket,
             CAST(round((ln((ct + 1.0) / (nt + {_DSIR_B}.0))
                         - ln((cr + 1.0) / (nr + {_DSIR_B}.0)))
                        * 1000000.0) AS BIGINT) AS logratio_micro
      FROM counts, totals
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(logratio_micro) AS BIGINT) AS importance_micro
    FROM feats JOIN ratio USING (bucket)
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def dsir_importance_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance(
        docs, "text", "doc_id", F.col("source") == "src0", n_buckets=_DSIR_B
    )


# ---------------------------------------------------------------------------
# Curation filter funnel: cumulative AND-cascade of quality gates with
# per-stage survivor counts — the "how much did each rule cost us"
# report that precedes every corpus freeze. One scan, per-doc booleans
# folded into conditional sums, unpivoted to (stage, n_docs) rows.
# All compares are integer cross-multiplied (no float thresholds).
@query(
    "filter_funnel_docs",
    oracle="""
    WITH d AS (
      SELECT n_chars,
             len(string_split(text, ' ')) AS nw,
             len(list_distinct(string_split(text, ' '))) AS uw
      FROM documents
    ),
    m AS (
      SELECT *,
             CASE WHEN n_chars BETWEEN 100 AND 1000 THEN 1 ELSE 0 END AS s1
      FROM d
    ),
    m2 AS (
      SELECT *, CASE WHEN s1 = 1 AND nw >= 30 THEN 1 ELSE 0 END AS s2 FROM m
    ),
    m3 AS (
      SELECT *,
             CASE WHEN s2 = 1
                   AND (n_chars - nw + 1) >= 2 * nw
                   AND (n_chars - nw + 1) <= 10 * nw
                  THEN 1 ELSE 0 END AS s3
      FROM m2
    ),
    m4 AS (
      SELECT *, CASE WHEN s3 = 1 AND 10 * uw >= 3 * nw THEN 1 ELSE 0 END AS s4
      FROM m3
    )
    SELECT stage, n_docs FROM (
      SELECT '0_all' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM m4
      UNION ALL SELECT '1_len', CAST(SUM(s1) AS BIGINT) FROM m4
      UNION ALL SELECT '2_words', CAST(SUM(s2) AS BIGINT) FROM m4
      UNION ALL SELECT '3_wordlen', CAST(SUM(s3) AS BIGINT) FROM m4
      UNION ALL SELECT '4_unique', CAST(SUM(s4) AS BIGINT) FROM m4
    ) ORDER BY stage
    """,
)
def filter_funnel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    d = docs.select(
        F.col("n_chars"),
        F.size(toks).alias("nw"),
        F.size(F.array_distinct(toks)).alias("uw"),
    )
    s1 = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 1000)
    s2 = s1 & (F.col("nw") >= 30)
    wl = F.col("n_chars") - F.col("nw") + 1  # total word chars
    s3 = s2 & (wl >= 2 * F.col("nw")) & (wl <= 10 * F.col("nw"))
    s4 = s3 & (10 * F.col("uw") >= 3 * F.col("nw"))
    agg = d.agg(
        F.count(F.lit(1)).alias("0_all"),
        F.sum(s1.cast("bigint")).alias("1_len"),
        F.sum(s2.cast("bigint")).alias("2_words"),
        F.sum(s3.cast("bigint")).alias("3_wordlen"),
        F.sum(s4.cast("bigint")).alias("4_unique"),
    )
    # unpivot the single row to (stage, n_docs) — stack stays JVM-side
    return agg.select(
        F.expr(
            "stack(5, '0_all', `0_all`, '1_len', `1_len`, "
            "'2_words', `2_words`, '3_wordlen', `3_wordlen`, "
            "'4_unique', `4_unique`) AS (stage, n_docs)"
        )
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# Epoch upsampling: the mixing move OPPOSITE to temperature_mix_docs
# (which samples abundant sources DOWN) — rare sources repeat for
# multiple epochs so the training stream approaches balance without
# discarding abundant data (the "epochs per dataset" knob in LLM
# pretraining mixes). epochs(source) = clamp(max_source_n // n, 1, 4),
# integer-exact; each doc emits one row per epoch with a copy index.
# Map-only after one broadcast of the per-source epoch table.
@query(
    "epoch_upsample_docs",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    mx AS (SELECT MAX(n) AS max_n FROM counts),
    epochs AS (
      SELECT source,
             LEAST(4, GREATEST(1, CAST(max_n // n AS BIGINT))) AS n_epochs
      FROM counts, mx
    )
    SELECT d.doc_id, CAST(t.i AS BIGINT) AS copy_id, d.source
    FROM documents d
    JOIN epochs e USING (source),
    UNNEST(range(e.n_epochs)) AS t(i)
    ORDER BY doc_id, copy_id
    """,
)
def epoch_upsample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("max_n"))
    epochs = counts.crossJoin(F.broadcast(mx)).select(
        "source",
        F.least(
            F.lit(4).cast("bigint"),
            F.greatest(F.lit(1).cast("bigint"), F.expr("max_n div n")),
        ).alias("n_epochs"),
    )
    return (
        docs.join(F.broadcast(epochs), "source")
        .select(
            "doc_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("bigint"), F.col("n_epochs") - 1
                )
            ).alias("copy_id"),
            "source",
        )
        .orderBy("doc_id", "copy_id")
    )


# ---------------------------------------------------------------------------
# Character-entropy quality signal: Shannon entropy of each document's
# character distribution — the cheap stand-in for compression-ratio
# screens (Gopher/RefinedWeb drop low-entropy boilerplate and
# high-entropy binary junk; natural text sits in a band). Exactness
# idiom: each -p·ln(p) term is micro-rounded to BIGINT BEFORE the sum,
# so the per-doc total is order-independent integer addition — engine
# identical (the bigram-LM convention). Two shuffles: (doc, char)
# count, per-doc sum.
@query(
    "char_entropy_docs",
    oracle="""
    WITH chars AS (
      SELECT doc_id, c
      FROM documents, UNNEST(string_split(text, '')) AS u(c)
    ),
    freq AS (
      SELECT doc_id, c, COUNT(*) AS n FROM chars GROUP BY doc_id, c
    ),
    tot AS (
      SELECT doc_id, SUM(n) AS nt FROM freq GROUP BY doc_id
    )
    SELECT f.doc_id,
           CAST(t.nt AS BIGINT) AS n_chars_counted,
           CAST(SUM(CAST(round(-(n / CAST(nt AS DOUBLE))
                                * ln(n / CAST(nt AS DOUBLE))
                                * 1000000.0) AS BIGINT)) AS BIGINT)
             AS entropy_micro
    FROM freq f JOIN tot t USING (doc_id)
    GROUP BY f.doc_id, t.nt
    ORDER BY f.doc_id
    """,
)
def char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    freq = (
        docs.select(
            "doc_id", F.explode(F.split(F.col("text"), "")).alias("c")
        )
        .groupBy("doc_id", "c")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = freq.groupBy("doc_id").agg(F.sum("n").alias("nt"))
    p = F.col("n").cast("double") / F.col("nt").cast("double")
    term = F.round(-p * F.log(p) * F.lit(1_000_000.0)).cast("bigint")
    return (
        freq.join(tot, "doc_id")
        .groupBy("doc_id", "nt")
        .agg(F.sum(term).alias("entropy_micro"))
        .select(
            "doc_id",
            F.col("nt").cast("bigint").alias("n_chars_counted"),
            "entropy_micro",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Source-overlap matrix: for every source pair, how many distinct
# PASSAGES (20-word blocks, the passage-dedup unit) they share — the
# "which crawls duplicate each other" panel that decides which source
# to drop when budgets bind. Whole-document digests are too coarse
# (cross-source exact-doc dups are rare; shared boilerplate passages
# are the real overlap). The join runs on distinct (source, passage)
# fingerprints — one shuffle, never document×document.
@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH blocks AS (
      SELECT DISTINCT source,
             md5(array_to_string(
               list_slice(w, CAST(t.i AS BIGINT) * {_PD_BLOCK} + 1,
                          CAST(t.i AS BIGINT) * {_PD_BLOCK} + {_PD_BLOCK}),
               ' ')) AS p
      FROM (SELECT source, string_split(text, ' ') AS w FROM documents),
           UNNEST(range(CAST(ceil(len(w) / {_PD_BLOCK}.0) AS BIGINT))) AS t(i)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(COUNT(*) AS BIGINT) AS shared_passages
    FROM blocks a JOIN blocks b
      ON a.p = b.p AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY source_a, source_b
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.passages import explode_passages

    docs = _t(spark, sf_dir, "documents")
    blocks = (
        explode_passages(
            docs.select(F.col("source").alias("sid"), "text"),
            "text",
            "sid",
            block_words=_PD_BLOCK,
        )
        .select(F.col("sid").alias("source"), F.md5("passage").alias("p"))
        .distinct()
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_passages"))
        .orderBy("source_a", "source_b")
    )


# ---------------------------------------------------------------------------
# N-gram novelty curve: per document (in doc_id ingest order), the
# fraction of its 3-gram shingles never seen in ANY earlier document —
# the marginal-new-content metric behind "this source has stopped
# adding anything" decisions. First-occurrence rule via one
# shingle-keyed min(doc_id) agg (the passage-dedup shape on the gram
# level); novelty is micro-int exact.
@query(
    "ngram_novelty_docs",
    oracle="""
    WITH grams AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(range(1, len(w) - 1)) AS t(i)
    ),
    firsts AS (
      SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    )
    SELECT g.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS novelty_micro
    FROM grams g JOIN firsts f USING (g)
    GROUP BY g.doc_id
    ORDER BY g.doc_id
    """,
)
def ngram_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import word_shingles

    docs = _t(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_shingles("text", 3))).alias("g"),
    ).distinct()
    firsts = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    return (
        grams.join(firsts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                (F.col("first_doc") == F.col("doc_id")).cast("bigint")
            ).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("n_novel * 1000000 div n_grams").alias("novelty_micro"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Incremental passage dedup (the continuous-ingest form): a new batch
# (doc_id % 10 == 0) is cleaned against the historical corpus (the
# rest) AND itself. The store side reduces to distinct passage
# fingerprints — the persisted 16-byte-per-passage relation at 100 TB
# (dedup_incremental_docs discipline); in id order this reproduces
# the one-shot corpus dedup exactly.
@query(
    "incremental_passage_dedup_docs",
    oracle=f"""
    WITH blocks AS (
      SELECT doc_id, (doc_id % 10 = 0) AS is_batch,
             CAST(t.i AS BIGINT) AS block_id,
             array_to_string(
               list_slice(w, CAST(t.i AS BIGINT) * {_PD_BLOCK} + 1,
                          CAST(t.i AS BIGINT) * {_PD_BLOCK} + {_PD_BLOCK}),
               ' ') AS passage
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
           UNNEST(range(CAST(ceil(len(w) / {_PD_BLOCK}.0) AS BIGINT))) AS t(i)
    ),
    store_fp AS (
      SELECT DISTINCT passage FROM blocks WHERE NOT is_batch
    ),
    ranked AS (
      SELECT doc_id, block_id, passage,
             row_number() OVER (PARTITION BY passage
                                ORDER BY doc_id, block_id) AS rn,
             passage IN (SELECT passage FROM store_fp) AS in_store
      FROM blocks WHERE is_batch
    )
    SELECT doc_id,
           COUNT(*) AS n_blocks,
           CAST(SUM(CASE WHEN rn > 1 OR in_store THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed,
           COALESCE(string_agg(
               CASE WHEN rn = 1 AND NOT in_store THEN passage END,
               ' ' ORDER BY block_id), '') AS text_clean
    FROM ranked
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def incremental_passage_dedup_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.passages import dedup_passages_incremental

    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    store = docs.filter(F.col("doc_id") % 10 != 0)
    return dedup_passages_incremental(
        batch, store, "text", "doc_id", block_words=_PD_BLOCK
    )
