"""Data-valuation & offline-evaluation wave (r8): exact KNN-Shapley
(Jia et al., VLDB 2019 — "Efficient Task-Specific Data Valuation for
Nearest Neighbor Algorithms"), IPS/SNIPS offline policy evaluation
(Horvitz & Thompson 1952; Dudík et al. 2011), a decision-stump Gini
split, Flesch–Kincaid readability, Dunning log-likelihood-ratio
collocations (Dunning 1993), and SymSpell delete-neighborhood fuzzy
match (Garbe 2012, public algorithm). SURVEY §7 extension scope —
training-data curation needs value attribution, policy evaluation
and typo-tolerant joins as much as dedup.

Determinism: the KNN-Shapley suffix recursion s_i = s_{i+1} +
(1[y_i=y]−1[y_{i+1}=y])/max(K,i) telescopes into a suffix sum of
per-rank rational terms — each term is nano-rounded to BIGINT, the
suffix sum is an ordered window, and the per-point value is a pure
BIGINT sum across queries. IPS/SNIPS group terms are per-context
rationals (24 contexts) nano-rounded before the sum. The stump's
weighted Gini is a mirrored double from exact cumulative integer
counts. LLR is the one transcendental surface: its four k·ln(k·N/
(R·C)) terms are combined in literal expression order and the final
statistic is MICRO-rounded (1e-6) — the measured cross-engine ln ulp
drift (~3% of args differ by 1 ulp) lands on a 1e-6 boundary with
probability ~1e-12 per value.

100 TB shapes:
- KNN-Shapley is the brute_force_topk shape (broadcast probe set ×
  corpus scan) followed by windows partitioned per query — the
  probe set is the small side by construction; at scale the scan
  side is the sharded corpus and the exact ranking can be replaced
  by any ANN shortlist without touching the valuation suffix sum.
- IPS/SNIPS is two partial-combined groupBys on (context, action) —
  the context domain is bounded (hour-of-day).
- The stump scans once into bounded buckets, then a window over the
  bucket domain; SymSpell joins on short delete keys (|vocab|·|w|
  keys, never |vocab|²); LLR joins bigram counts against two
  broadcast unigram maps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query
from .simops import _sql_cosine

_K = 5
_NANO = 1000000000.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Exact KNN-Shapley data valuation (Jia et al. 2019, Theorem 1): for
# each probe vector (vec_id % 25 = 0) rank the remaining corpus by
# cosine similarity (ties → vec_id); the Shapley value of the point
# at rank i for a K-NN classifier telescopes to the suffix sum of
# (1[y_i=y_q] − 1[y_{i+1}=y_q])/max(K, i) with tail term
# 1[y_N=y_q]/N. Points are scored by their mean value over probes;
# top 20 most valuable training points. O(n log n) per probe — the
# whole valuation is one ranking window, no Monte-Carlo permutations.
@query(
    "knn_shapley_embeddings",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS train_id,
               CASE WHEN c.label = q.label THEN 1 ELSE 0 END AS ind,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_sql_cosine('q.embedding', 'c.embedding')} DESC,
                            c.vec_id
               ) AS rn
        FROM embeddings q JOIN embeddings c ON c.vec_id % 25 <> 0
        WHERE q.vec_id % 25 = 0
    ),
    terms AS (
        SELECT query_id, train_id, rn,
               CAST(COUNT(*) OVER (PARTITION BY query_id) AS BIGINT) AS n,
               lead(ind) OVER (PARTITION BY query_id ORDER BY rn) AS ind_nxt,
               ind
        FROM scored
    ),
    nano AS (
        SELECT query_id, train_id, rn,
               CASE WHEN rn = n
                    THEN CAST(ROUND(CAST(ind AS DOUBLE) / CAST(n AS DOUBLE)
                                    * {_NANO}) AS BIGINT)
                    ELSE CAST(ROUND(CAST(ind - ind_nxt AS DOUBLE)
                                    / CAST(greatest({_K}, rn) AS DOUBLE)
                                    * {_NANO}) AS BIGINT)
               END AS term_nano
        FROM terms
    ),
    shap AS (
        SELECT query_id, train_id,
               CAST(SUM(term_nano) OVER (
                   PARTITION BY query_id ORDER BY rn DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_nano
        FROM nano
    ),
    agg AS (
        SELECT train_id,
               CAST(SUM(s_nano) AS BIGINT) AS v_sum,
               CAST(COUNT(*) AS BIGINT) AS n_queries
        FROM shap GROUP BY train_id
    )
    SELECT t.train_id, e.label,
           CAST(t.v_sum AS DOUBLE) / {_NANO}
             / CAST(t.n_queries AS DOUBLE) AS shapley
    FROM agg t JOIN embeddings e ON e.vec_id = t.train_id
    ORDER BY shapley DESC, t.train_id
    LIMIT 20
    """,
)
def knn_shapley_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vectors import cosine

    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    train = emb.filter(F.col("vec_id") % 25 != 0).select(
        F.col("vec_id").alias("train_id"),
        F.col("embedding").alias("cv"),
        F.col("label").alias("clabel"),
    )
    from ..functions.vectors import dot, norm

    scored = (
        train.withColumn("__cn", norm(F.col("cv")))
        .crossJoin(F.broadcast(probes.withColumn("__qn", norm(F.col("qv")))))
        .select(
            "query_id",
            "train_id",
            (F.col("clabel") == F.col("qlabel")).cast("int").alias("ind"),
            (
                dot(F.col("qv"), F.col("cv")) / (F.col("__qn") * F.col("__cn"))
            ).alias("cos_sim"),
        )
    )
    wrank = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("train_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(wrank))
    wq = Window.partitionBy("query_id")
    wlead = Window.partitionBy("query_id").orderBy("rn")
    terms = ranked.select(
        "query_id",
        "train_id",
        "rn",
        F.count(F.lit(1)).over(wq).cast("bigint").alias("n"),
        F.lead("ind").over(wlead).alias("ind_nxt"),
        "ind",
    )
    nano = terms.select(
        "query_id",
        "train_id",
        "rn",
        F.when(
            F.col("rn") == F.col("n"),
            F.round(
                F.col("ind").cast("double")
                / F.col("n").cast("double")
                * _NANO
            ).cast("bigint"),
        )
        .otherwise(
            F.round(
                (F.col("ind") - F.col("ind_nxt")).cast("double")
                / F.greatest(F.lit(_K), F.col("rn")).cast("double")
                * _NANO
            ).cast("bigint")
        )
        .alias("term_nano"),
    )
    wsuf = Window.partitionBy("query_id").orderBy(F.desc("rn")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    shap = nano.select(
        "query_id",
        "train_id",
        F.sum("term_nano").over(wsuf).cast("bigint").alias("s_nano"),
    )
    agg = shap.groupBy("train_id").agg(
        F.sum("s_nano").cast("bigint").alias("v_sum"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
    )
    lab = emb.select(F.col("vec_id").alias("train_id"), "label")
    return (
        agg.join(lab, "train_id")
        .select(
            "train_id",
            "label",
            (
                F.col("v_sum").cast("double")
                / _NANO
                / F.col("n_queries").cast("double")
            ).alias("shapley"),
        )
        .orderBy(F.desc("shapley"), "train_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# IPS / SNIPS offline policy evaluation: logging propensities
# p̂(a|x) are estimated on the FIRST half of the time range (context
# x = hour-of-day, action a = event_type), the target policy
# π(x) = 'purchase' for evening hours (≥18) else 'click' is replayed
# on the SECOND half: IPS = (1/n)Σ 1[a=π(x)]·r/p̂, SNIPS divides by
# Σ 1[a=π(x)]/p̂ instead of n. Per-context group terms are exact
# rationals over BIGINT counts and 2-decimal reward sums,
# nano-rounded before the (bounded, 24-row) sum.
@query(
    "ips_offline_eval_events",
    oracle="""
    WITH rng AS (
        SELECT epoch_us(min(ts))
                 + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        FROM events
    ),
    ev AS (
        SELECT CAST(hour(ts) AS BIGINT) AS x, event_type AS a,
               CAST(ROUND(value * 100) AS BIGINT) AS r100,
               epoch_us(ts) >= rng.mid AS is_test,
               CASE WHEN hour(ts) >= 18 THEN 'purchase' ELSE 'click' END
                   AS pi_a
        FROM events CROSS JOIN rng
    ),
    prop AS (
        SELECT x, a,
               CAST(COUNT(*) AS BIGINT) AS c1,
               CAST(SUM(CAST(COUNT(*) AS BIGINT))
                    OVER (PARTITION BY x) AS BIGINT) AS n1
        FROM ev WHERE NOT is_test GROUP BY x, a
    ),
    test AS (
        SELECT x, a,
               CAST(COUNT(*) AS BIGINT) AS c2,
               CAST(SUM(r100) AS BIGINT) AS sr100
        FROM ev WHERE is_test AND a = pi_a GROUP BY x, a
    ),
    n_test AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ev WHERE is_test
    ),
    terms AS (
        SELECT CAST(ROUND(CAST(t.sr100 AS DOUBLE) / 100.0
                          * CAST(p.n1 AS DOUBLE) / CAST(p.c1 AS DOUBLE)
                          * 1000000000.0) AS BIGINT) AS ips_nano,
               CAST(ROUND(CAST(t.c2 AS DOUBLE)
                          * CAST(p.n1 AS DOUBLE) / CAST(p.c1 AS DOUBLE)
                          * 1000000000.0) AS BIGINT) AS w_nano,
               t.c2
        FROM test t JOIN prop p ON p.x = t.x AND p.a = t.a
    ),
    s AS (
        SELECT CAST(SUM(ips_nano) AS BIGINT) AS ips_sum,
               CAST(SUM(w_nano) AS BIGINT) AS w_sum,
               CAST(SUM(c2) AS BIGINT) AS n_matched
        FROM terms
    )
    SELECT n_test.n AS n_test, s.n_matched,
           CAST(s.ips_sum AS DOUBLE) / 1000000000.0
             / CAST(n_test.n AS DOUBLE) AS ips_value,
           CAST(s.ips_sum AS DOUBLE) / CAST(s.w_sum AS DOUBLE)
               AS snips_value
    FROM s CROSS JOIN n_test
    """,
)
def ips_offline_eval_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev0 = _t(spark, sf_dir, "events")
    rng = ev0.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / 2
            ).cast("bigint")
        ).alias("mid")
    )
    ev = ev0.crossJoin(F.broadcast(rng)).select(
        F.hour("ts").cast("bigint").alias("x"),
        F.col("event_type").alias("a"),
        F.round(F.col("value") * 100).cast("bigint").alias("r100"),
        (F.unix_micros(F.col("ts")) >= F.col("mid")).alias("is_test"),
        F.when(F.hour("ts") >= 18, F.lit("purchase"))
        .otherwise(F.lit("click"))
        .alias("pi_a"),
    )
    wx = Window.partitionBy("x")
    prop = (
        ev.filter(~F.col("is_test"))
        .groupBy("x", "a")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
        .withColumn("n1", F.sum("c1").over(wx).cast("bigint"))
    )
    test = (
        ev.filter(F.col("is_test") & (F.col("a") == F.col("pi_a")))
        .groupBy("x", "a")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("c2"),
            F.sum("r100").cast("bigint").alias("sr100"),
        )
    )
    n_test = ev.filter("is_test").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    terms = test.join(prop, ["x", "a"]).select(
        F.round(d("sr100") / 100.0 * d("n1") / d("c1") * _NANO)
        .cast("bigint")
        .alias("ips_nano"),
        F.round(d("c2") * d("n1") / d("c1") * _NANO)
        .cast("bigint")
        .alias("w_nano"),
        "c2",
    )
    s = terms.agg(
        F.sum("ips_nano").cast("bigint").alias("ips_sum"),
        F.sum("w_nano").cast("bigint").alias("w_sum"),
        F.sum("c2").cast("bigint").alias("n_matched"),
    )
    return s.crossJoin(F.broadcast(n_test)).select(
        F.col("n").alias("n_test"),
        "n_matched",
        (F.col("ips_sum").cast("double") / _NANO / F.col("n").cast("double"))
        .alias("ips_value"),
        (F.col("ips_sum").cast("double") / F.col("w_sum").cast("double"))
        .alias("snips_value"),
    )


# ---------------------------------------------------------------------------
# Decision stump (CART depth-1, Breiman et al. 1984) on the documents
# table: best n_chars threshold separating lang='en'. Candidate
# splits are the bounded bucket domain (n_chars // 50); the weighted
# Gini of each split comes from cumulative integer counts via one
# window over the buckets, argmin with deterministic (gini, bucket)
# tie-break. No per-candidate rescan — one pass + one bounded window.
@query(
    "decision_stump_docs",
    oracle="""
    WITH b AS (
        SELECT n_chars // 50 AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                    AS BIGINT) AS pos
        FROM documents GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS pt
        FROM b
    ),
    cum AS (
        SELECT bucket,
               CAST(SUM(n) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
               CAST(SUM(pos) OVER (ORDER BY bucket
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pl,
               tot.nt, tot.pt
        FROM b CROSS JOIN tot
    ),
    g AS (
        SELECT bucket, nl, pl, nt, pt,
               CAST(nl AS DOUBLE) / CAST(nt AS DOUBLE)
                 * (1.0 - (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                          * (CAST(pl AS DOUBLE) / CAST(nl AS DOUBLE))
                        - (CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE))
                          * (CAST(nl - pl AS DOUBLE) / CAST(nl AS DOUBLE)))
             + CAST(nt - nl AS DOUBLE) / CAST(nt AS DOUBLE)
                 * (1.0 - (CAST(pt - pl AS DOUBLE)
                           / CAST(nt - nl AS DOUBLE))
                          * (CAST(pt - pl AS DOUBLE)
                           / CAST(nt - nl AS DOUBLE))
                        - (CAST((nt - nl) - (pt - pl) AS DOUBLE)
                           / CAST(nt - nl AS DOUBLE))
                          * (CAST((nt - nl) - (pt - pl) AS DOUBLE)
                           / CAST(nt - nl AS DOUBLE))) AS gini
        FROM cum WHERE nl < nt
    )
    SELECT CAST((bucket + 1) * 50 AS BIGINT) AS threshold_chars,
           nl AS n_left, pl AS pos_left, nt AS n_total, pt AS pos_total,
           gini AS weighted_gini
    FROM g
    ORDER BY gini, bucket
    LIMIT 1
    """,
)
def decision_stump_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    b = docs.groupBy(
        F.floor(F.col("n_chars") / 50).cast("bigint").alias("bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum((F.col("lang") == "en").cast("int")).cast("bigint").alias(
            "pos"
        ),
    )
    tot = b.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("pos").cast("bigint").alias("pt"),
    )
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = b.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.sum("n").over(wcum).cast("bigint").alias("nl"),
        F.sum("pos").over(wcum).cast("bigint").alias("pl"),
        "nt",
        "pt",
    )
    d = lambda c: c.cast("double")  # noqa: E731
    nl, pl = F.col("nl"), F.col("pl")
    nt, pt = F.col("nt"), F.col("pt")
    pr_l = d(pl) / d(nl)
    qr_l = d(nl - pl) / d(nl)
    pr_r = d(pt - pl) / d(nt - nl)
    qr_r = d((nt - nl) - (pt - pl)) / d(nt - nl)
    g = cum.filter(nl < nt).select(
        "bucket",
        "nl",
        "pl",
        "nt",
        "pt",
        (
            d(nl) / d(nt) * (F.lit(1.0) - pr_l * pr_l - qr_l * qr_l)
            + d(nt - nl) / d(nt) * (F.lit(1.0) - pr_r * pr_r - qr_r * qr_r)
        ).alias("gini"),
    )
    return (
        g.orderBy("gini", "bucket")
        .limit(1)
        .select(
            ((F.col("bucket") + 1) * 50).cast("bigint").alias(
                "threshold_chars"
            ),
            F.col("nl").alias("n_left"),
            F.col("pl").alias("pos_left"),
            F.col("nt").alias("n_total"),
            F.col("pt").alias("pos_total"),
            F.col("gini").alias("weighted_gini"),
        )
    )


# ---------------------------------------------------------------------------
# Flesch–Kincaid readability (Kincaid et al. 1975) per source: words
# = whitespace tokens, sentences = max(#[.!?], 1), syllables = vowel
# groups [aeiouy]+ — all exact BIGINT regexp counts. Reports the
# corpus-level grade 0.39·(ΣW/ΣS) + 11.8·(ΣSyl/ΣW) − 15.59 (mirrored
# double from the sums) plus the mean per-doc grade (per-doc
# rationals nano-rounded before the sum).
@query(
    "readability_docs",
    oracle=r"""
    WITH per AS (
        SELECT source,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
                   AS w,
               CAST(greatest(len(regexp_extract_all(text, '[.!?]')), 1)
                    AS BIGINT) AS s,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS syl
        FROM documents
    ),
    nano AS (
        SELECT source, w, s, syl,
               CAST(ROUND((0.39 * CAST(w AS DOUBLE) / CAST(s AS DOUBLE)
                           + 11.8 * CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)
                           - 15.59) * 1000000000.0) AS BIGINT) AS g_nano
        FROM per
    ),
    agg AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(w) AS BIGINT) AS sw,
               CAST(SUM(s) AS BIGINT) AS ss,
               CAST(SUM(syl) AS BIGINT) AS ssyl,
               CAST(SUM(g_nano) AS BIGINT) AS sg
        FROM nano GROUP BY source
    )
    SELECT source, n_docs, sw AS n_words,
           0.39 * CAST(sw AS DOUBLE) / CAST(ss AS DOUBLE)
             + 11.8 * CAST(ssyl AS DOUBLE) / CAST(sw AS DOUBLE)
             - 15.59 AS corpus_grade,
           CAST(sg AS DOUBLE) / 1000000000.0 / CAST(n_docs AS DOUBLE)
               AS mean_doc_grade
    FROM agg
    ORDER BY source
    """,
)
def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias(
            "w"
        ),
        F.greatest(
            F.regexp_count(F.col("text"), F.lit(r"[.!?]")), F.lit(1)
        )
        .cast("bigint")
        .alias("s"),
        F.regexp_count(F.lower(F.col("text")), F.lit("[aeiouy]+"))
        .cast("bigint")
        .alias("syl"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    nano = per.withColumn(
        "g_nano",
        F.round(
            (
                F.lit(0.39) * d("w") / d("s")
                + F.lit(11.8) * d("syl") / d("w")
                - F.lit(15.59)
            )
            * _NANO
        ).cast("bigint"),
    )
    agg = nano.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("sw"),
        F.sum("s").cast("bigint").alias("ss"),
        F.sum("syl").cast("bigint").alias("ssyl"),
        F.sum("g_nano").cast("bigint").alias("sg"),
    )
    return agg.select(
        "source",
        "n_docs",
        F.col("sw").alias("n_words"),
        (
            F.lit(0.39) * d("sw") / d("ss")
            + F.lit(11.8) * d("ssyl") / d("sw")
            - F.lit(15.59)
        ).alias("corpus_grade"),
        (F.col("sg").cast("double") / _NANO / d("n_docs")).alias(
            "mean_doc_grade"
        ),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Dunning log-likelihood-ratio collocations (Dunning 1993) over
# adjacent token bigrams: LLR = 2·Σ k·ln(k·N/(R·C)) over the 2×2
# contingency (k11 bigram count, row/col margins from the unigram
# counts of first/second position). The four terms are combined in
# literal expression order; the hashed statistic is micro-rounded
# (module docstring — the only transcendental surface in this wave).
# Top 20 by LLR with k11 ≥ 5. The join is bigram-counts × two
# broadcast position-margin maps — vocab-domain, never corpus-domain.
@query(
    "collocations_llr_docs",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS w
        FROM documents
    ),
    big AS (
        SELECT w[i] AS w1, w[i+1] AS w2
        FROM toks, LATERAL (
            SELECT unnest(generate_series(1, len(w) - 1)) AS i
        ) u
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM big),
    k AS (
        SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS k11
        FROM big GROUP BY w1, w2
    ),
    r AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS r FROM big GROUP BY w1),
    c AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS c FROM big GROUP BY w2),
    cont AS (
        SELECT k.w1, k.w2, k.k11,
               r.r - k.k11 AS k12, c.c - k.k11 AS k21,
               n.n - r.r - c.c + k.k11 AS k22,
               r.r, c.c, n.n
        FROM k JOIN r USING (w1) JOIN c USING (w2) CROSS JOIN n
    ),
    llr AS (
        SELECT w1, w2, k11,
               2.0 * (
                 (CASE WHEN k11 > 0 THEN CAST(k11 AS DOUBLE)
                     * ln(CAST(k11 AS DOUBLE) * CAST(n AS DOUBLE)
                          / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
                     ELSE 0.0 END)
               + (CASE WHEN k12 > 0 THEN CAST(k12 AS DOUBLE)
                     * ln(CAST(k12 AS DOUBLE) * CAST(n AS DOUBLE)
                          / (CAST(r AS DOUBLE)
                             * CAST(n - c AS DOUBLE)))
                     ELSE 0.0 END)
               + (CASE WHEN k21 > 0 THEN CAST(k21 AS DOUBLE)
                     * ln(CAST(k21 AS DOUBLE) * CAST(n AS DOUBLE)
                          / (CAST(n - r AS DOUBLE) * CAST(c AS DOUBLE)))
                     ELSE 0.0 END)
               + (CASE WHEN k22 > 0 THEN CAST(k22 AS DOUBLE)
                     * ln(CAST(k22 AS DOUBLE) * CAST(n AS DOUBLE)
                          / (CAST(n - r AS DOUBLE)
                             * CAST(n - c AS DOUBLE)))
                     ELSE 0.0 END)) AS llr
        FROM cont WHERE k11 >= 5
    )
    SELECT w1, w2, k11, ROUND(llr, 6) AS llr_micro
    FROM llr
    ORDER BY llr DESC, w1, w2
    LIMIT 20
    """,
)
def collocations_llr_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("w")
    )
    big = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> struct(w[i-1] AS w1, w[i] AS w2))"
            )
        ).alias("b")
    ).select("b.w1", "b.w2")
    n = big.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    k = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("k11")
    )
    r = big.groupBy("w1").agg(F.count(F.lit(1)).cast("bigint").alias("r"))
    c = big.groupBy("w2").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cont = (
        k.join(F.broadcast(r), "w1")
        .join(F.broadcast(c), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "k11",
            (F.col("r") - F.col("k11")).alias("k12"),
            (F.col("c") - F.col("k11")).alias("k21"),
            (F.col("n") - F.col("r") - F.col("c") + F.col("k11")).alias(
                "k22"
            ),
            "r",
            "c",
            "n",
        )
    )
    d = lambda c_: F.col(c_).cast("double")  # noqa: E731

    def term(kc: str, row_m, col_m) -> F.Column:
        return F.when(
            F.col(kc) > 0,
            d(kc) * F.log(d(kc) * d("n") / (row_m * col_m)),
        ).otherwise(F.lit(0.0))

    llr_col = F.lit(2.0) * (
        term("k11", d("r"), d("c"))
        + term("k12", d("r"), (d("n") - d("c")))
        + term("k21", (d("n") - d("r")), d("c"))
        + term("k22", (d("n") - d("r")), (d("n") - d("c")))
    )
    llr = cont.filter(F.col("k11") >= 5).select(
        "w1", "w2", "k11", llr_col.alias("llr")
    )
    return (
        llr.orderBy(F.desc("llr"), "w1", "w2")
        .limit(20)
        .select("w1", "w2", "k11", F.round(F.col("llr"), 6).alias("llr_micro"))
    )


# ---------------------------------------------------------------------------
# SymSpell delete-neighborhood fuzzy lookup (Garbe 2012): synthetic
# typos (each vocab token of length ≥ 4 with its middle character
# dropped) are matched back to the dictionary by joining on
# {token} ∪ single-deletes(token) keys — |vocab|·|w| short keys
# instead of an all-pairs levenshtein scan — then verified with
# edit distance ≤ 1 (the delete-key join admits distance-2 false
# positives like ab/ba). The quadratic twin is
# levenshtein_pairs_parts; this is the index-shaped path.
@query(
    "symspell_typos_docs",
    oracle=r"""
    WITH vocab AS (
        SELECT DISTINCT tok FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+'))
                AS tok
            FROM documents
        ) WHERE len(tok) >= 2
    ),
    typos AS (
        SELECT tok AS orig,
               substr(tok, 1, (len(tok) // 2) - 1)
                 || substr(tok, (len(tok) // 2) + 1) AS typo
        FROM vocab WHERE len(tok) >= 4
    ),
    dict_keys AS (
        SELECT tok, key FROM (
            SELECT tok,
                   unnest(list_append(
                       list_transform(
                           generate_series(1, len(tok)),
                           i -> substr(tok, 1, i - 1) || substr(tok, i + 1)
                       ), tok)) AS key
            FROM vocab
        )
    ),
    typo_keys AS (
        SELECT DISTINCT typo, key FROM (
            SELECT typo,
                   unnest(list_append(
                       list_transform(
                           generate_series(1, len(typo)),
                           i -> substr(typo, 1, i - 1)
                             || substr(typo, i + 1)
                       ), typo)) AS key
            FROM (SELECT DISTINCT typo FROM typos)
        )
    ),
    cand AS (
        SELECT DISTINCT t.typo, d.tok AS suggestion
        FROM typo_keys t JOIN dict_keys d ON d.key = t.key
        WHERE levenshtein(t.typo, d.tok) <= 1
    )
    SELECT typo, suggestion,
           CAST(levenshtein(typo, suggestion) AS BIGINT) AS dist
    FROM cand
    ORDER BY typo, suggestion
    """,
)
def symspell_typos_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("tok")
        )
        .filter(F.length("tok") >= 2)
        .distinct()
    )
    typos = vocab.filter(F.length("tok") >= 4).select(
        F.col("tok").alias("orig"),
        F.concat(
            F.expr("substr(tok, 1, CAST(length(tok) / 2 AS INT) - 1)"),
            F.expr("substr(tok, CAST(length(tok) / 2 AS INT) + 1)"),
        ).alias("typo"),
    )
    del_keys = (
        "array_union(transform(sequence(1, length({c})), "
        "i -> concat(substr({c}, 1, i - 1), substr({c}, i + 1))), "
        "array({c}))"
    )
    dict_keys = vocab.select(
        "tok", F.explode(F.expr(del_keys.format(c="tok"))).alias("key")
    )
    typo_keys = (
        typos.select("typo")
        .distinct()
        .select(
            "typo", F.explode(F.expr(del_keys.format(c="typo"))).alias("key")
        )
        .distinct()
    )
    cand = (
        typo_keys.join(F.broadcast(dict_keys), "key")
        .select("typo", F.col("tok").alias("suggestion"))
        .distinct()
        .filter(F.levenshtein(F.col("typo"), F.col("suggestion")) <= 1)
    )
    return cand.select(
        "typo",
        "suggestion",
        F.levenshtein(F.col("typo"), F.col("suggestion"))
        .cast("bigint")
        .alias("dist"),
    ).orderBy("typo", "suggestion")
