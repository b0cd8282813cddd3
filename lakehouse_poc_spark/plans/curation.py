"""Training-data curation queries: deterministic hash-based
train/val/test splits, stratified sampling, and PII redaction.

Why hash-based: at 100 TB a split must be (a) reproducible across
runs and engines, (b) computable map-only with no shuffle, no RNG
state, and no driver coordination, and (c) stable under re-partitioning
and incremental appends (a doc's split never changes when more data
arrives). ``md5(key)`` gives all three — every row decides its own
split from its key alone. A ``rand()``-based split has none of these
properties. The same idiom realizes per-stratum sampling: the hash is
salted so the sample is independent of the split assignment.

All three queries are exact-oracle-checked: md5 hex, substring
compare, and regexp behavior are identical across Spark and DuckDB for
the patterns used here (character classes, quantifiers, alternation —
no lookaround, which RE2 lacks).

Extends the reference surface (SURVEY.md §7.1 stage 9: LLM-pipeline
ops); the reference itself has no sampling/redaction operators
(verified — its only filters are SCD2 flags, reference
notebooks/pipeline_core.py:160,210).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query

# hex-string thresholds on the first two md5 nibbles: 256 buckets,
# 'cc' = 204/256 = 79.7% train, 'e6' = 230/256 → 10.2% val, 10.2% test.
_TRAIN_HI = "cc"
_VAL_HI = "e6"
# independent salt for sampling (decorrelates sample from split)
_SAMPLE_SALT = "s1:"
_SAMPLE_HI = "34"  # 52/256 = 20.3% per-stratum sample


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


def _bucket(key: F.Column | str, salt: str = "") -> F.Column:
    """First two hex chars of md5(salt || key) — a uniform 256-bucket
    assignment computed row-local (map-only at any scale)."""
    k = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(F.concat(F.lit(salt), k.cast("string"))), 1, 2)


def split_column(key: F.Column | str) -> F.Column:
    """'train' / 'val' / 'test' ≈ 80/10/10 by key hash."""
    b = _bucket(key)
    return (
        F.when(b < _TRAIN_HI, F.lit("train"))
        .when(b < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def sampled_column(key: F.Column | str, hi: str = _SAMPLE_HI) -> F.Column:
    """Deterministic ~hi/256 Bernoulli sample flag by salted key hash."""
    return _bucket(key, _SAMPLE_SALT) < hi


# ---------------------------------------------------------------------------
@query(
    "hash_split_documents",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}' THEN 'train'
                WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    ORDER BY doc_id
    """,
)
def hash_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", split_column("doc_id").alias("split")
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Stratified sample: the same hash idiom per stratum. One map-only pass
# + one shuffle on the (low-cardinality) stratum key for the report.
@query(
    "stratified_sample_docs",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN substr(md5('{_SAMPLE_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2)
                              < '{_SAMPLE_HI}' THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(sampled_column("doc_id").cast("int")).cast("bigint").alias("n_sampled"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# PII redaction. The fixture corpus carries no real PII, so the query
# first *injects* synthetic identifiers derived from doc_id (making the
# redaction measurable and the oracle exact), then scrubs them with the
# production patterns. The patterns are RE2-safe (no lookaround) so the
# operator ports to any regex engine.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_pii(text: F.Column) -> F.Column:
    """Scrub emails then phones (order matters: email local parts may
    contain digit runs that would otherwise half-match phone shapes)."""
    return F.regexp_replace(
        F.regexp_replace(text, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )


@query(
    "pii_redaction_docs",
    oracle=rf"""
    WITH aug AS (
        SELECT doc_id,
               text || ' contact: user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +555-726-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    || ' office 212-555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0')
                   AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '\+?[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '\+?[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g')) AS red_fp,
           CAST(length(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '\+?[0-9]{{3}}-[0-9]{{3}}-[0-9]{{4}}', '<PHONE>', 'g')) AS BIGINT)
               AS red_len
    FROM aug
    ORDER BY doc_id
    """,
)
def pii_redaction_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +555-726-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" office 212-555-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    red = redact_pii(F.col("t"))
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_phones"),
        F.md5(red).alias("red_fp"),
        F.length(red).cast("bigint").alias("red_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Sequence packing: next-fit token-budget packing within md5-nibble
# groups (operators/packing.py). The DuckDB oracle replays the same
# sequential next-fit with a recursive CTE walking each group's docs in
# id order — row-for-row identical pack assignments.
_PACK_BUDGET = 512

@query(
    "pack_sequences_docs",
    oracle=rf"""
    WITH RECURSIVE d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS tokens,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS grp,
               ROW_NUMBER() OVER (
                   PARTITION BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   ORDER BY doc_id) AS rn
        FROM documents
    ),
    packed AS (
        SELECT grp, rn, doc_id, tokens,
               CAST(0 AS BIGINT) AS pack_id,
               CAST(0 AS BIGINT) AS pack_offset,
               tokens AS acc
        FROM d WHERE rn = 1
        UNION ALL
        SELECT d.grp, d.rn, d.doc_id, d.tokens,
               CASE WHEN p.acc > 0 AND p.acc + d.tokens > {_PACK_BUDGET}
                    THEN p.pack_id + 1 ELSE p.pack_id END,
               CASE WHEN p.acc > 0 AND p.acc + d.tokens > {_PACK_BUDGET}
                    THEN 0 ELSE p.acc END,
               CASE WHEN p.acc > 0 AND p.acc + d.tokens > {_PACK_BUDGET}
                    THEN d.tokens ELSE p.acc + d.tokens END
        FROM packed p JOIN d ON d.grp = p.grp AND d.rn = p.rn + 1
    )
    SELECT doc_id, tokens, grp, pack_id, pack_offset
    FROM packed
    ORDER BY doc_id
    """,
)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import token_count
    from ..operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(
        docs, id_col="doc_id", token_col=token_count("text"), budget=_PACK_BUDGET
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Quality-weighted sampling: keep a doc with probability equal to its
# quality score, DETERMINISTICALLY — u(doc_id) < quality(text) where u
# is a 24-bit uniform from salted md5. Same map-only/append-stable
# properties as the unweighted split; re-runs and engines agree
# bit-for-bit. The standard corpus-shaping move (upweight fluent prose,
# downweight fragment/punctuation soup) without RNG state.
from ..functions.text import STOPWORDS as _SW
_STOPLIST_SQL = ", ".join(f"'{w}'" for w in _SW)
_W_SALT = "w1:"


def weighted_keep(key, quality: F.Column) -> F.Column:
    """True iff salted-hash uniform in [0,1) < quality (map-only)."""
    k = F.col(key) if isinstance(key, str) else key
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(_W_SALT), k.cast("string"))), 1, 6),
            16,
            10,
        ).cast("double")
        / F.lit(16777216.0)
    )
    return u < quality


@query(
    "weighted_sample_docs",
    oracle=rf"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok,
               CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS BIGINT) AS n_punct,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                                    x -> x IN ({_STOPLIST_SQL}))) AS BIGINT) AS n_stop,
               length(text) AS n_chars
        FROM documents
    ),
    q AS (
        SELECT doc_id,
               0.5 * least(CAST(n_tok AS DOUBLE) / 200.0, 1.0)
             + 0.3 * least(CAST(n_stop AS DOUBLE) / greatest(CAST(n_tok AS DOUBLE), 1.0) * 3, 1.0)
             + 0.2 * (1.0 - least(CAST(n_punct AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) * 10, 1.0))
               AS quality
        FROM t
    )
    SELECT doc_id, quality,
           (CAST(('0x' || substr(md5('{_W_SALT}' || CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
              / 16777216.0) < quality AS sampled
    FROM q
    ORDER BY doc_id
    """,
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    q = quality_score("text")
    return docs.select(
        "doc_id",
        q.alias("quality"),
        weighted_keep("doc_id", q).alias("sampled"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Per-source quota sampling: cap each source at the K highest-quality
# docs (ties broken by doc_id) — the "per-domain cap" every crawl
# curation pipeline applies. One shuffle on source; the window
# computes rank map-side-sorted within each source partition.
@query(
    "quota_sample_docs",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, source,
               0.5 * least(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) / 200.0, 1.0)
             + 0.3 * least(CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                   x -> x IN ({_STOPLIST_SQL}))) AS DOUBLE)
                           / greatest(CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE), 1.0) * 3, 1.0)
             + 0.2 * (1.0 - least(CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE)
                                  / CAST(greatest(length(text), 1) AS DOUBLE) * 10, 1.0))
               AS quality
        FROM documents
    )
    SELECT doc_id, source, quality FROM (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id) AS rk
        FROM scored
    )
    WHERE rk <= 15
    ORDER BY doc_id
    """,
)
def quota_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import quality_score

    docs = read_parquet_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id", "source", quality_score("text").alias("quality")
    )
    w = Window.partitionBy("source").orderBy(F.desc("quality"), "doc_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 15)
        .select("doc_id", "source", "quality")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Group-aware (leakage-safe) split: hash the GROUP key (source), not
# the document id, so every document from one source lands in the
# same split — near-duplicates and templated pages cluster within
# sources, and hashing per-doc would leak them across train/test.
# Same map-only md5-bucket idiom as hash_split_documents; one row per
# (source, split) proves the invariant (each source → exactly one
# split) while keeping the compare small.
@query(
    "group_split_documents",
    oracle=f"""
    SELECT source,
           CASE WHEN substr(md5('grp:' || source), 1, 2) < '{_TRAIN_HI}' THEN 'train'
                WHEN substr(md5('grp:' || source), 1, 2) < '{_VAL_HI}' THEN 'val'
                ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def group_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    b = _bucket("source", salt="grp:")
    split = (
        F.when(b < _TRAIN_HI, F.lit("train"))
        .when(b < _VAL_HI, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.groupBy("source", split.alias("split"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Temperature-scaled source mixing (the multinomial-sampling-with-
# temperature recipe from multilingual/multi-domain LM training, e.g.
# mC4/XLM-R: sample source s with probability ∝ n_s^α, α=0.5). Target
# counts are computed in exact integer micro-weights (sqrt is
# correctly-rounded IEEE, so both engines produce the identical
# double; the ROUND→BIGINT→floor-div chain is then exact), and the
# per-source sample itself is the deterministic md5-rank prefix —
# append-stable and engine-independent.
#
# Scale: one vocabulary-small aggregate for the weights (broadcast
# back), one window rank per source partition — a single shuffle on
# source; the budget arithmetic never touches the driver.
_MIX_BUDGET = 200
_MIX_SALT = "t1:"


@query(
    "temperature_mix_docs",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total
        FROM documents GROUP BY source
    ),
    weights AS (
        SELECT source, n_total,
               CAST(ROUND(sqrt(CAST(n_total AS DOUBLE)) * 1000000.0) AS BIGINT)
                   AS w_micro
        FROM counts
    ),
    tot AS (SELECT CAST(SUM(w_micro) AS BIGINT) AS total_w FROM weights),
    targets AS (
        SELECT w.source, w.n_total, w.w_micro,
               ({_MIX_BUDGET} * w.w_micro) // t.total_w AS keep_n
        FROM weights w CROSS JOIN tot t
    ),
    ranked AS (
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_MIX_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.source, r.rk, tg.keep_n
    FROM ranked r JOIN targets tg ON r.source = tg.source
    WHERE r.rk <= tg.keep_n
    ORDER BY r.source, r.rk
    """,
)
def temperature_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    weights = counts.select(
        "source",
        "n_total",
        F.round(F.sqrt(F.col("n_total").cast("double")) * F.lit(1_000_000.0))
        .cast("bigint")
        .alias("w_micro"),
    )
    tot = weights.agg(F.sum("w_micro").alias("total_w"))
    targets = weights.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(f"{_MIX_BUDGET} * w_micro div total_w").alias("keep_n"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit(_MIX_SALT), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    ranked = docs.select(
        "doc_id", "source", F.row_number().over(w).cast("bigint").alias("rk")
    )
    return (
        ranked.join(F.broadcast(targets), "source")
        .filter(F.col("rk") <= F.col("keep_n"))
        .select("doc_id", "source", "rk", "keep_n")
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# PII match SPANS via the Python UDTF surface (SURVEY.md §2.12,
# operators/udtfs.py): one row per match with exact 1-based character
# offsets — what an audit needs to verify a redaction pass, and what
# built-in regexp functions cannot produce (no positions).
#
# The oracle never runs a regex: the PII augmentation is deterministic
# (same suffix layout as pii_redaction_docs), so every span position
# is *derived arithmetically* from length(text) and the doc_id's digit
# count — a stronger check than re-running the same regex twice.
@query(
    "pii_spans_docs",
    oracle="""
    WITH aug AS (
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS L,
               CAST(length(CAST(doc_id AS VARCHAR)) AS BIGINT) AS D,
               'user' || CAST(doc_id AS VARCHAR) || '@example.com' AS email,
               '+555-726-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS ph1,
               '212-555-' || lpad(CAST((doc_id * 7) % 10000 AS VARCHAR), 4, '0') AS ph2
        FROM documents
    )
    SELECT doc_id, kind, match, start, "end" FROM (
        SELECT doc_id, 'email' AS kind, email AS match,
               CAST(L + 11 AS INTEGER) AS start,
               CAST(L + D + 26 AS INTEGER) AS "end"
        FROM aug
        UNION ALL
        SELECT doc_id, 'phone', ph1,
               CAST(L + D + 31 AS INTEGER), CAST(L + D + 43 AS INTEGER)
        FROM aug
        UNION ALL
        SELECT doc_id, 'phone', ph2,
               CAST(L + D + 52 AS INTEGER), CAST(L + D + 63 AS INTEGER)
        FROM aug
    ) t
    ORDER BY doc_id, start
    """,
)
def pii_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.udtfs import regex_spans

    docs = _t(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +555-726-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" office 212-555-"),
            F.lpad(((F.col("doc_id") * 7) % 10000).cast("string"), 4, "0"),
        ).alias("t"),
    )
    return regex_spans(
        aug, "t", {"email": _EMAIL_RE, "phone": _PHONE_RE}
    ).orderBy("doc_id", "start")


# ---------------------------------------------------------------------------
# k-fold cross-validation assignment (k=5): the same map-only salted
# md5-range idiom as hash_split — reproducible, append-stable, no RNG.
# Fold boundaries split the 256 two-nibble buckets 51/51/51/51/52, so
# folds are balanced to within 0.4% by construction.
_KFOLD_SALT = "cv:"
_KFOLD_EDGES = ("33", "66", "99", "cc")  # 0x33=51, 0x66=102, ...


def kfold_column(key: F.Column | str) -> F.Column:
    b = _bucket(key, _KFOLD_SALT)
    expr = F.when(b < _KFOLD_EDGES[0], F.lit(0))
    for i, hi in enumerate(_KFOLD_EDGES[1:], start=1):
        expr = expr.when(b < hi, F.lit(i))
    return expr.otherwise(F.lit(len(_KFOLD_EDGES))).cast("int")


@query(
    "kfold_split_docs",
    oracle=f"""
    SELECT fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc
    FROM (
        SELECT doc_id, source,
               CASE WHEN substr(md5('{_KFOLD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < '33' THEN 0
                    WHEN substr(md5('{_KFOLD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < '66' THEN 1
                    WHEN substr(md5('{_KFOLD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < '99' THEN 2
                    WHEN substr(md5('{_KFOLD_SALT}' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cc' THEN 3
                    ELSE 4 END AS fold
        FROM documents
    ) t
    GROUP BY fold
    ORDER BY fold
    """,
)
def kfold_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", kfold_column("doc_id").alias("fold"))
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.min("doc_id").alias("min_doc"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# EXACT-proportion stratified split: hash_split above is proportional
# only in expectation (each row flips its own md5 coin); this variant
# ranks rows within each stratum by md5 and cuts at exact integer
# boundaries — ⌊0.8n⌋ train / ⌊0.1n⌋ val / rest test PER SOURCE,
# guaranteed. The window partitions on the stratum (never global), so
# the sort is per-source — the scalable shape. Integer boundary math
# is exact ((n*8) div 10 — no float proportions).
@query(
    "exact_split_documents",
    oracle="""
    WITH r AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM documents
    )
    SELECT doc_id, source,
           CASE WHEN rn <= (n * 8) // 10 THEN 'train'
                WHEN rn <= (n * 9) // 10 THEN 'val'
                ELSE 'test' END AS split
    FROM r
    ORDER BY doc_id
    """,
)
def exact_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    wn = Window.partitionBy("source")
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wn).alias("n"),
        )
        .select(
            "doc_id",
            "source",
            F.when(F.col("rn") <= F.expr("(n * 8) div 10"), F.lit("train"))
            .when(F.col("rn") <= F.expr("(n * 9) div 10"), F.lit("val"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Uniform negative sampling (contrastive-training prep): for each
# query document, k=5 deterministic pseudo-random negatives from a
# DIFFERENT source (the not-a-positive proxy), ranked by
# md5(query‖candidate) — every engine draws the same "random"
# negatives. Queries are a bounded set (broadcast); the corpus side
# is one map pass + a per-query top-k window, the same shape as
# brute-force retrieval. The hard-negative variant (similarity-
# ranked) is hard_negatives_embeddings in simops.
@query(
    "negative_samples_docs",
    oracle="""
    SELECT query_id, neg_id, rank FROM (
        SELECT q.doc_id AS query_id, c.doc_id AS neg_id,
               CAST(row_number() OVER (
                   PARTITION BY q.doc_id
                   ORDER BY md5(CAST(q.doc_id AS VARCHAR) || ':' || CAST(c.doc_id AS VARCHAR)),
                            c.doc_id
               ) AS INTEGER) AS rank
        FROM documents q JOIN documents c ON c.source <> q.source
        WHERE q.doc_id % 50 = 0
    ) t
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def negative_samples_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    q = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("__qsrc")
    )
    c = docs.select(F.col("doc_id").alias("neg_id"), "source")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("source") != F.col("__qsrc"))
        .select(
            "query_id",
            "neg_id",
            F.md5(
                F.concat(
                    F.col("query_id").cast("string"),
                    F.lit(":"),
                    F.col("neg_id").cast("string"),
                )
            ).alias("__r"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("__r", "neg_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neg_id", "rank")
        .orderBy("query_id", "rank")
    )


# ---------------------------------------------------------------------------
# Length-bucketed training batches: group documents into
# similar-length buckets (bucket = n_tok div 32), order each bucket
# deterministically, and cut fixed-size batches of 16 — the standard
# padding-minimization layout for sequence-model training. Output is
# per-batch padding accounting: a batch pads every member to its max
# length, so waste = max_len*n - sum_len (all integers → exact).
# Scale: the per-bucket row_number window shuffle-sorts each bucket;
# buckets are narrow length ranges so skew is bounded by construction.
# For a pathological single-length corpus, salt the bucket key (the
# global_shuffle_documents idiom) before the window.
@query(
    "length_bucket_batches_docs",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok
        FROM documents
    ),
    b AS (
        SELECT doc_id, n_tok, n_tok // 32 AS bucket,
               (CAST(row_number() OVER (
                   PARTITION BY n_tok // 32 ORDER BY n_tok, doc_id
               ) AS BIGINT) - 1) // 16 AS batch
        FROM t
    )
    SELECT bucket, batch,
           COUNT(*) AS n_docs,
           MAX(n_tok) AS max_len,
           SUM(n_tok) AS sum_len,
           MAX(n_tok) * COUNT(*) - SUM(n_tok) AS padding
    FROM b
    GROUP BY bucket, batch
    ORDER BY bucket, batch
    """,
)
def length_bucket_batches_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.text import token_count

    docs = read_parquet_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", token_count("text").alias("n_tok"))
    bucket = (F.col("n_tok") / 32).cast("bigint")
    w = Window.partitionBy("bucket").orderBy("n_tok", "doc_id")
    b = (
        t.withColumn("bucket", bucket)
        .withColumn(
            "batch",
            ((F.row_number().over(w).cast("bigint") - 1) / 16).cast("bigint"),
        )
    )
    return (
        b.groupBy("bucket", "batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tok").alias("max_len"),
            F.sum("n_tok").alias("sum_len"),
            (F.max("n_tok") * F.count(F.lit(1)) - F.sum("n_tok")).alias("padding"),
        )
        .orderBy("bucket", "batch")
    )


# ---------------------------------------------------------------------------
# k-anonymity suppression over quasi-identifiers: a released training
# corpus must not contain documents whose (lang, source) combination
# identifies fewer than k members — the group-size privacy floor that
# complements row-level PII redaction (pii_redaction_docs). One
# groupBy + one broadcast-back join; the suppressed flag drives the
# downstream filter.
@query(
    "k_anonymity_docs",
    oracle="""
    WITH g AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS group_n
        FROM documents GROUP BY lang, source
    )
    SELECT d.doc_id, d.lang, d.source, g.group_n,
           g.group_n < 10 AS suppressed
    FROM documents d JOIN g USING (lang, source)
    ORDER BY d.doc_id
    """,
)
def k_anonymity_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("group_n"))
    return (
        docs.join(F.broadcast(g), ["lang", "source"])
        .select(
            "doc_id", "lang", "source", "group_n",
            (F.col("group_n") < 10).alias("suppressed"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Tokenizer-vocabulary coverage: the OOV-rate eval run before shipping
# a vocab — top-100 corpus tokens by (count desc, token asc) form the
# vocab; each document reports its out-of-vocabulary token count and
# micro-int OOV rate. Corpus-side: one token groupBy + broadcast vocab
# semi-check; per-doc side: one explode + groupBy. All integers.
@query(
    "vocab_coverage_docs",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, t FROM (
            SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t
            FROM documents)
        WHERE t <> ''
    ),
    vocab AS (
        SELECT t FROM (
            SELECT t, row_number() OVER (ORDER BY COUNT(*) DESC, t) AS rk
            FROM tok GROUP BY t) v
        WHERE rk <= 100
    ),
    per_doc AS (
        SELECT tok.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tok,
               CAST(SUM(CASE WHEN v.t IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov
        FROM tok LEFT JOIN vocab v ON tok.t = v.t
        GROUP BY tok.doc_id
    )
    SELECT doc_id, n_tok, n_oov,
           n_oov * 1000000 // greatest(n_tok, 1) AS oov_rate_micro
    FROM per_doc
    ORDER BY doc_id
    """,
)
def vocab_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import fan_out

    docs = read_parquet_table(spark, sf_dir, "documents")
    tok = (
        fan_out(docs)
        .select("doc_id", F.explode(F.split("text", r"\s+")).alias("t"))
        .filter(F.col("t") != "")
    )
    # top-100 as TakeOrdered (orderBy+limit plans as a per-partition
    # top-k + driver merge), not a no-partition row_number window — the
    # window form sorts the whole token-type relation on one task.
    vocab = (
        tok.groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("t"))
        .limit(100)
        .select("t", F.lit(True).alias("in_vocab"))
    )
    per_doc = (
        tok.join(F.broadcast(vocab), "t", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_oov"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tok",
        "n_oov",
        F.floor(F.col("n_oov") * 1000000 / F.greatest(F.col("n_tok"), F.lit(1)))
        .cast("bigint")
        .alias("oov_rate_micro"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Next-token training-pair extraction: every stride-th position in each
# document becomes a (context window, target token) example — the
# sample-construction step between chunking (chunk_documents_windows)
# and packing (pack_sequences_docs) when the objective needs explicit
# (context, target) pairs (distillation, span-corruption targets,
# evaluation probes). Map-only: one transform/explode per doc, no
# shuffle at all — at 100 TB this is the cheapest possible pass, and
# stride directly controls the output volume (stride=4 → len/4
# examples per doc).
_NTP_CTX = 8
_NTP_STRIDE = 4


@query(
    "next_token_pairs_docs",
    oracle=rf"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
    ),
    pos AS (
        SELECT doc_id, toks,
               unnest(range({_NTP_CTX} + 1, len(toks) + 1, {_NTP_STRIDE})) AS i
        FROM tok
        WHERE len(toks) >= {_NTP_CTX} + 1
    )
    SELECT doc_id,
           CAST(i AS BIGINT) AS pos,
           array_to_string(toks[i - {_NTP_CTX} : i - 1], ' ') AS context,
           toks[i] AS target
    FROM pos
    ORDER BY doc_id, pos
    """,
)
def next_token_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    ctx, stride = _NTP_CTX, _NTP_STRIDE
    tok = docs.select(
        "doc_id", F.split(F.col("text"), r"\s+").alias("toks")
    ).filter(F.size("toks") >= ctx + 1)
    # sequence() is inclusive of the stop when it lands on a step, like
    # DuckDB range()'s exclusive stop at len+1 — same index set.
    pairs = F.expr(
        f"transform(sequence({ctx} + 1, size(toks), {stride}), "
        f"i -> struct(CAST(i AS BIGINT) AS pos, "
        f"array_join(slice(toks, i - {ctx}, {ctx}), ' ') AS context, "
        f"element_at(toks, i) AS target))"
    )
    return (
        tok.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.pos", "p.context", "p.target")
        .orderBy("doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# Deterministic source interleaving (stride scheduling): give every
# document a global TRAINING POSITION such that each source appears at
# its target rate throughout the stream — weight-2 sources every ~0.5
# units, weight-1 sources every ~1.0 — instead of in source-sized
# blocks. The ordering half of mixture weighting (temperature_mix
# decides HOW MUCH of each source; this decides WHERE it lands, so a
# checkpoint-resumed run has seen sources in proportion no matter when
# it stops). position = (rank_in_source − 0.5)/weight, the classic
# stride/WFQ virtual-finish-time formula; ranks come from a salted md5
# order so the within-source sequence is deterministic and
# append-stable. One shuffle (the per-source window); the global sort
# is the presentation order the trainer consumes.
_IL_SALT = "il:"


def _il_weight_sql(src: str) -> str:
    return f"CASE WHEN CAST(substr({src}, 4) AS INTEGER) % 2 = 0 THEN 2.0 ELSE 1.0 END"


@query(
    "interleave_sources_docs",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_IL_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS rk,
               {_il_weight_sql('source')} AS w
        FROM documents
    )
    SELECT doc_id, source, rk,
           (CAST(rk AS DOUBLE) - 0.5) / w AS pos
    FROM ranked
    ORDER BY pos, doc_id
    """,
)
def interleave_sources_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    w = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 0, F.lit(2.0)
    ).otherwise(F.lit(1.0))
    order_key = F.md5(F.concat(F.lit(_IL_SALT), F.col("doc_id").cast("string")))
    win = Window.partitionBy("source").orderBy(order_key, "doc_id")
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(win).cast("bigint").alias("rk"),
            w.alias("w"),
        )
        .select(
            "doc_id",
            "source",
            "rk",
            ((F.col("rk").cast("double") - F.lit(0.5)) / F.col("w")).alias("pos"),
        )
        .orderBy("pos", "doc_id")
    )


# ---------------------------------------------------------------------------
# Global shard assignment: documents packed into contiguous training
# shards of ~SHARD_TOKENS whitespace tokens by running-total cutoff
# over the deterministic (salted-md5) global order — the step that
# decides WHICH FILE each document lands in when a curated corpus is
# written out for the trainer (per-shard token counts stay within one
# document of the budget; next-fit packing *within* a sequence is
# pack_sequences_docs). The running total is a global-order window —
# realized with the same block-offset discipline as global_rank at
# scale; at fixture scale the single window is the measured-cheapest
# plan and the semantics are identical.
_SHARD_TOKENS = 20_000
_SHARD_SALT = "sh:"


@query(
    "shard_assignment_docs",
    oracle=rf"""
    WITH ordered AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok,
               md5('{_SHARD_SALT}' || CAST(doc_id AS VARCHAR)) AS ok
        FROM documents
    ),
    cum AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY ok, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum_tok
        FROM ordered
    )
    SELECT doc_id, n_tok,
           CAST((cum_tok - n_tok) // {_SHARD_TOKENS} AS BIGINT) AS shard
    FROM cum
    ORDER BY doc_id
    """,
)
def shard_assignment_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    ok = F.md5(F.concat(F.lit(_SHARD_SALT), F.col("doc_id").cast("string")))
    ordered = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tok"),
        ok.alias("ok"),
    )
    w = Window.orderBy("ok", "doc_id").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ordered.withColumn("cum_tok", F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "n_tok",
            F.floor((F.col("cum_tok") - F.col("n_tok")) / _SHARD_TOKENS)
            .cast("bigint")
            .alias("shard"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# l-diversity audit (Machanavajjhala et al. 2007, public): k-anonymity
# alone fails when an equivalence class is uniform in its SENSITIVE
# attribute — every member is re-identified semantically even at
# group size k. Each (nation, segment) quasi-identifier group must
# see >= l distinct sensitive values (banded account balance). One
# two-level aggregation, group-keyed; the per-group distinct is over
# the small band domain.
@query(
    "l_diversity_customers",
    oracle="""
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_n,
           CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 2500.0) AS INTEGER))
                AS BIGINT) AS n_sensitive,
           COUNT(DISTINCT CAST(floor(c_acctbal / 2500.0) AS INTEGER)) < 3
               AS violates_l3
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def l_diversity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_parquet_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(2500.0)).cast("int")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_n"),
            F.countDistinct(band).cast("bigint").alias("n_sensitive"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_n",
            "n_sensitive",
            (F.col("n_sensitive") < 3).alias("violates_l3"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Fill-in-the-middle transform (Bavarian et al. 2022, public): the
# PSM training format — split each document into deterministic
# thirds by character offset and emit
# <PRE>prefix<SUF>suffix<MID>middle. Pure row-local string
# arithmetic (map-only, no shuffle beyond the output sort); the
# split points derive from length(text) on BOTH engines, so the
# transform is bit-identical.
@query(
    "fim_transform_docs",
    oracle="""
    WITH d AS (
        SELECT doc_id, text, length(text) AS n,
               CAST(FLOOR(length(text) / 3) AS BIGINT) AS p_end,
               CAST(FLOOR(2 * length(text) / 3) AS BIGINT) AS m_end
        FROM documents
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_chars,
           '<PRE>' || substr(text, 1, p_end)
             || '<SUF>' || substr(text, m_end + 1, n - m_end)
             || '<MID>' || substr(text, p_end + 1, m_end - p_end) AS fim_text,
           CAST(n + 15 AS BIGINT) AS fim_len
    FROM d
    ORDER BY doc_id
    """,
)
def fim_transform_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = F.length("text")
    p_end = F.floor(n / 3).cast("bigint")
    m_end = F.floor(2 * n / 3).cast("bigint")
    fim = F.concat(
        F.lit("<PRE>"),
        F.substring(F.col("text"), F.lit(1), p_end),
        F.lit("<SUF>"),
        F.substring(F.col("text"), m_end + 1, n - m_end),
        F.lit("<MID>"),
        F.substring(F.col("text"), p_end + 1, m_end - p_end),
    )
    return docs.select(
        "doc_id",
        n.cast("bigint").alias("n_chars"),
        fim.alias("fim_text"),
        (n + 15).cast("bigint").alias("fim_len"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# t-closeness audit (Li et al. 2007, public) — completes the privacy
# triad (k-anonymity, l-diversity, t-closeness): an equivalence
# class can be l-diverse yet still leak if its sensitive-value
# DISTRIBUTION diverges from the table's. For the categorical
# banded-balance attribute the distance is total variation
# (equal-ground-distance EMD): ½·Σ_v |p_g(v) − p(v)|. Determinism:
# the per-band term |c_gv·n − c_v·n_g| is an exact BIGINT (no
# per-band float division, no order-dependent float sum); one
# fixed-order double division at the end. The zero-count bands a
# group is missing still contribute — the group×band grid is built
# from the two tiny aggregate domains, never the raw table.
@query(
    "t_closeness_customers",
    oracle="""
    WITH s AS (
        SELECT c_nationkey, c_mktsegment,
               CAST(floor(c_acctbal / 2500.0) AS INTEGER) AS band
        FROM customer
    ),
    gv AS (
        SELECT c_nationkey, c_mktsegment, band,
               CAST(COUNT(*) AS BIGINT) AS c_gv
        FROM s GROUP BY 1, 2, 3
    ),
    g AS (
        SELECT c_nationkey, c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_g
        FROM s GROUP BY 1, 2
    ),
    v AS (
        SELECT band, CAST(COUNT(*) AS BIGINT) AS c_v FROM s GROUP BY 1
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM s),
    terms AS (
        SELECT g.c_nationkey, g.c_mktsegment, g.n_g, tot.n,
               abs(COALESCE(gv.c_gv, 0) * tot.n - v.c_v * g.n_g) AS term
        FROM g CROSS JOIN v CROSS JOIN tot
        LEFT JOIN gv ON gv.c_nationkey = g.c_nationkey
                    AND gv.c_mktsegment = g.c_mktsegment
                    AND gv.band = v.band
    )
    SELECT c_nationkey, c_mktsegment,
           n_g AS group_n,
           CAST(SUM(term) AS BIGINT) AS tvd_num,
           CAST(SUM(term) AS DOUBLE) / 2.0
               / CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE) AS tvd,
           (CAST(SUM(term) AS DOUBLE) / 2.0
               / CAST(n_g AS DOUBLE) / CAST(n AS DOUBLE)) > 0.2
               AS violates_t02
    FROM terms
    GROUP BY c_nationkey, c_mktsegment, n_g, n
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def t_closeness_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_parquet_table(spark, sf_dir, "customer")
    s = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / F.lit(2500.0)).cast("int").alias("band"),
    )
    gv = s.groupBy("c_nationkey", "c_mktsegment", "band").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_gv")
    )
    g = s.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g")
    )
    v = s.groupBy("band").agg(F.count(F.lit(1)).cast("bigint").alias("c_v"))
    tot = s.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    terms = (
        g.crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(tot))
        .join(gv, ["c_nationkey", "c_mktsegment", "band"], "left")
        .select(
            "c_nationkey",
            "c_mktsegment",
            "n_g",
            "n",
            F.abs(
                F.coalesce(F.col("c_gv"), F.lit(0)) * F.col("n")
                - F.col("c_v") * F.col("n_g")
            ).alias("term"),
        )
    )
    tvd = (
        F.col("tvd_num").cast("double")
        / F.lit(2.0)
        / F.col("n_g").cast("double")
        / F.col("n").cast("double")
    )
    return (
        terms.groupBy("c_nationkey", "c_mktsegment", "n_g", "n")
        .agg(F.sum("term").cast("bigint").alias("tvd_num"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("n_g").alias("group_n"),
            "tvd_num",
            tvd.alias("tvd"),
            (tvd > F.lit(0.2)).alias("violates_t02"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Token-budget greedy selection (r7): fill a fixed token budget (25%
# of the corpus) with the highest-quality documents — the standard
# data-mixing primitive ("take the best N tokens", Gopher/LLaMA
# curation recipes). Quality here is the alpha ratio (letters /
# chars, both exact BIGINTs, one fixed-order double division);
# selection takes docs in (score DESC, doc_id) order while the
# running token total BEFORE the doc is under budget (the last doc
# may overshoot — greedy fill, deterministic). The running total is
# the block-offset global_cumsum (decimal, bit-identical to the
# single-window oracle at any partitioning) — no single-reducer
# global window touches the corpus.
@query(
    "budget_pack_docs",
    oracle=r"""
    WITH d AS (
        SELECT doc_id,
               CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
                   AS n_tok,
               CAST(length(text) - length(regexp_replace(
                        text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS score
        FROM documents WHERE length(text) > 0
    ),
    tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS t FROM d),
    c AS (
        SELECT doc_id, n_tok, score,
               CAST(SUM(n_tok) OVER (
                   ORDER BY score DESC, doc_id) AS BIGINT) AS cum_tokens
        FROM d
    )
    SELECT doc_id, n_tok, score, cum_tokens
    FROM c, tot
    WHERE cum_tokens - n_tok < CAST(FLOOR(0.25 * t) AS BIGINT)
    ORDER BY doc_id
    """,
)
def budget_pack_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import global_cumsum

    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    nchars = F.length("text")
    nalpha = nchars - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    d = docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), r"\s+")).cast("bigint").alias("n_tok"),
        (nalpha.cast("double") / nchars.cast("double")).alias("score"),
    ).withColumn("neg_score", -F.col("score"))
    d = d.withColumn("tok_dec", F.col("n_tok").cast("decimal(20,0)"))
    blk = F.floor(F.col("neg_score") * F.lit(20.0))
    c = global_cumsum(
        d, ["neg_score", "doc_id"], blk, "tok_dec", "cum"
    )
    tot = d.agg(F.sum("n_tok").cast("bigint").alias("t"))
    budget = F.floor(F.lit(0.25) * F.col("t")).cast("bigint")
    return (
        c.crossJoin(F.broadcast(tot))
        .withColumn("cum_tokens", F.col("cum").cast("bigint"))
        .filter(F.col("cum_tokens") - F.col("n_tok") < budget)
        .select("doc_id", "n_tok", "score", "cum_tokens")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# k-anonymization generalization ladder (r7; Sweeney 2002, public) —
# the TRANSFORM the k_anonymity/l_diversity/t_closeness audits
# motivate: coarsen the quasi-identifiers level by level (band width
# 2500 → 5000 → 10000; segment kept → dropped at the top rung) until
# every equivalence class reaches k ≥ 5, reporting each rung's
# min/median class size and violation count so the caller picks the
# minimal sufficient generalization. Each rung is one
# partial-combinable groupBy on its coarsened key; the ladder is a
# fixed 4-rung union, no iteration. The median class size reuses the
# percentile_disc rank rule on the (bounded) per-rung class-size
# relation.
@query(
    "k_anonymize_ladder_customers",
    oracle="""
    WITH g0 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM customer
        GROUP BY c_nationkey, c_mktsegment,
                 CAST(floor(c_acctbal / 2500.0) AS INTEGER)
    ),
    g1 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM customer
        GROUP BY c_nationkey, c_mktsegment,
                 CAST(floor(c_acctbal / 5000.0) AS INTEGER)
    ),
    g2 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM customer
        GROUP BY c_nationkey, c_mktsegment,
                 CAST(floor(c_acctbal / 10000.0) AS INTEGER)
    ),
    g3 AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS sz FROM customer
        GROUP BY c_nationkey, CAST(floor(c_acctbal / 10000.0) AS INTEGER)
    ),
    lv AS (
        SELECT 0 AS level, sz FROM g0
        UNION ALL SELECT 1, sz FROM g1
        UNION ALL SELECT 2, sz FROM g2
        UNION ALL SELECT 3, sz FROM g3
    ),
    ranked AS (
        SELECT level, sz,
               row_number() OVER (PARTITION BY level ORDER BY sz) AS rn,
               COUNT(*) OVER (PARTITION BY level) AS ng
        FROM lv
    )
    SELECT CAST(level AS INT) AS level,
           CAST(MAX(ng) AS BIGINT) AS n_groups,
           CAST(MIN(sz) AS BIGINT) AS min_group,
           CAST(MAX(CASE WHEN rn = greatest(1,
                CAST(ceil(0.5 * ng) AS BIGINT)) THEN sz END) AS BIGINT)
               AS median_group,
           CAST(SUM(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS groups_under_k5,
           (MIN(sz) >= 5) AS k5_ok
    FROM ranked
    GROUP BY level
    ORDER BY level
    """,
)
def k_anonymize_ladder_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    cust = read_parquet_table(spark, sf_dir, "customer")

    def rung(level: int, cols):
        return (
            cust.groupBy(*cols)
            .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
            .select(F.lit(level).alias("level"), "sz")
        )

    band = lambda w: F.floor(F.col("c_acctbal") / F.lit(w)).cast("int")  # noqa: E731
    lv = (
        rung(0, ["c_nationkey", "c_mktsegment", band(2500.0)])
        .unionByName(rung(1, ["c_nationkey", "c_mktsegment", band(5000.0)]))
        .unionByName(rung(2, ["c_nationkey", "c_mktsegment", band(10000.0)]))
        .unionByName(rung(3, ["c_nationkey", band(10000.0)]))
    )
    ranked = lv.select(
        "level",
        "sz",
        F.row_number()
        .over(W.partitionBy("level").orderBy("sz"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("level")).alias("ng"),
    )
    return (
        ranked.groupBy("level")
        .agg(
            F.max("ng").cast("bigint").alias("n_groups"),
            F.min("sz").cast("bigint").alias("min_group"),
            F.max(
                F.when(
                    F.col("rn")
                    == F.greatest(
                        F.lit(1),
                        F.ceil(F.lit(0.5) * F.col("ng")).cast("bigint"),
                    ),
                    F.col("sz"),
                )
            )
            .cast("bigint")
            .alias("median_group"),
            F.sum(F.when(F.col("sz") < 5, 1).otherwise(0))
            .cast("bigint")
            .alias("groups_under_k5"),
            (F.min("sz") >= 5).alias("k5_ok"),
        )
        .select(
            F.col("level").cast("int").alias("level"),
            "n_groups",
            "min_group",
            "median_group",
            "groups_under_k5",
            "k5_ok",
        )
        .orderBy("level")
    )


# ---------------------------------------------------------------------------
# Quantile normalization (r7): map each doc's quality score to its
# corpus percentile ((2·rank − 1) / 2n — the midpoint convention) —
# the rank transform mixing recipes use to make scores from
# different scorers comparable. Rank is the block-offset global_rank
# (never a corpus-sized global window); the percentile is one
# fixed-order division of exact integers.
@query(
    "quantile_normalize_docs",
    oracle=r"""
    WITH d AS (
        SELECT doc_id,
               CAST(length(text) - length(regexp_replace(
                        text, '[A-Za-z]', '', 'g')) AS DOUBLE)
                   / CAST(length(text) AS DOUBLE) AS score
        FROM documents WHERE length(text) > 0
    ),
    r AS (
        SELECT doc_id, score,
               CAST(row_number() OVER (ORDER BY score, doc_id)
                    AS BIGINT) AS rk,
               CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM d
    )
    SELECT doc_id, score,
           rk,
           CAST(2 * rk - 1 AS DOUBLE) / CAST(2 * n AS DOUBLE) AS pct
    FROM r
    ORDER BY doc_id
    """,
)
def quantile_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import global_rank

    docs = _t(spark, sf_dir, "documents").filter(F.length("text") > 0)
    nchars = F.length("text")
    nalpha = nchars - F.length(F.regexp_replace("text", "[A-Za-z]", ""))
    d = docs.select(
        "doc_id",
        (nalpha.cast("double") / nchars.cast("double")).alias("score"),
    )
    blk = F.floor(F.col("score") * F.lit(20.0)).cast("long")
    r = global_rank(d, ["score", "doc_id"], blk, "rk")
    n = d.count()
    return r.select(
        "doc_id",
        "score",
        F.col("rk").cast("bigint").alias("rk"),
        (
            (2 * F.col("rk") - 1).cast("double")
            / F.lit(float(2 * n))
        ).alias("pct"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Coverage-maximizing document selection — greedy set cover /
# facility-location selection (Nemhauser et al. 1978's (1−1/e) greedy,
# public; the coverage-based curation strategy of e.g. submodular
# data-subset selection): pick K=10 documents that together cover the
# most distinct corpus word TRIGRAMS (the unigram vocabulary of the synthetic fixture is ~31 tokens — trigrams give a meaningfully large universe), one greedy round at a time (argmax of
# NEW tokens, doc_id tie-break). The per-round pass is distributed —
# one anti-join of the distinct (token, doc) relation against the
# covered-token set plus a count argmax; the covered set
# localCheckpoints per round (bounded: ≤ corpus vocabulary). The
# oracle unrolls the identical 10 rounds as MATERIALIZED CTEs. Pure
# integer counts throughout.
_COVER_K = 10


def _cover_oracle() -> str:
    ctes = [
        r"""td AS MATERIALIZED (
        SELECT DISTINCT doc_id, g AS token FROM (
            SELECT doc_id,
                   unnest(list_transform(
                       generate_series(1, greatest(len(w) - 2, 0)),
                       i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                   )) AS g
            FROM (SELECT doc_id,
                         string_split_regex(lower(text), '\s+') AS w
                  FROM documents WHERE length(text) > 0)
        )
    )""",
        "cov0 AS MATERIALIZED (SELECT CAST(NULL AS VARCHAR) AS token WHERE FALSE)",
    ]
    picks = []
    for i in range(1, _COVER_K + 1):
        ctes.append(f"""
    gain{i} AS MATERIALIZED (
        SELECT td.doc_id, CAST(COUNT(*) AS BIGINT) AS new_tokens
        FROM td ANTI JOIN cov{i - 1} c ON td.token = c.token
        GROUP BY td.doc_id
    ),
    pick{i} AS MATERIALIZED (
        SELECT doc_id, new_tokens FROM gain{i}
        ORDER BY new_tokens DESC, doc_id LIMIT 1
    ),
    cov{i} AS MATERIALIZED (
        SELECT token FROM cov{i - 1}
        UNION
        SELECT td.token FROM td JOIN pick{i} p USING (doc_id)
    )""")
        picks.append(
            f"SELECT {i} AS round, doc_id, new_tokens,"
            f" (SELECT CAST(COUNT(*) AS BIGINT) FROM cov{i}) AS covered"
            f" FROM pick{i}"
        )
    return (
        "WITH " + ",".join(ctes) + "\n    SELECT CAST(round AS INT) AS round,"
        " doc_id, new_tokens, covered FROM (" + " UNION ALL ".join(picks) +
        ") ORDER BY round"
    )


@query("greedy_cover_docs", oracle=_cover_oracle())
def greedy_cover_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.length("text") > 0)
    # materialize the split ONCE as a column — element_at over the
    # raw split expression re-evaluates the regex split per element
    # (the sequential_triples lesson, measured 14 s -> ~2 s here)
    wdocs = docs.select(
        "doc_id", F.split(F.lower("text"), r"\s+").alias("w")
    )
    wcol = F.col("w")
    tris = F.when(
        F.size(wcol) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(wcol) - 3),
            lambda i: F.concat_ws(
                " ", F.element_at(wcol, i + 1),
                F.element_at(wcol, i + 2), F.element_at(wcol, i + 3)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    td = (
        wdocs.select("doc_id", F.explode(tris).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    picked_ids: list[int] = []
    rows = []
    for rnd in range(1, _COVER_K + 1):
        # covered = tokens of the <=9 already-picked docs, derived
        # from the checkpointed td each round — constant plan depth
        # with NO growing union lineage or per-round covered
        # materialization (the picked-id list is bounded by K)
        if picked_ids:
            cov = td.where(F.col("doc_id").isin(picked_ids)).select(
                "token"
            )
            remaining = td.join(cov, "token", "left_anti")
        else:
            remaining = td
        gain = remaining.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("new_tokens")
        )
        picked = gain.orderBy(
            F.col("new_tokens").desc(), "doc_id"
        ).limit(1).collect()
        if not picked:  # full coverage: both engines stop emitting rows
            break
        pick = picked[0]
        picked_ids.append(pick["doc_id"])
        # coverage identity: |cov_t| = |cov_{t-1}| + marginal gain of
        # the pick (disjointness of "new" tokens) — no extra action
        covered_n = (rows[-1][3] if rows else 0) + pick["new_tokens"]
        rows.append((rnd, pick["doc_id"], pick["new_tokens"], covered_n))
    return spark.createDataFrame(
        rows, "round int, doc_id bigint, new_tokens bigint, covered bigint"
    ).orderBy("round")
