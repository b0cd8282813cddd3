"""Model-based document quality filtering: distributed logistic
regression (operators/classifier.py) that distills the rule-based
Gopher-style filter into a linear model, and codegen-only scoring with
a published weight vector.

Training is iterative (n_iter gradient jobs, each reducing to k+2
decimal-exact sums) → rows-only for the driver, with exact
numpy-parity and accuracy gates in tests/test_classifier.py.

Scoring is a pure linear expression over exact integer text
statistics; the margin is floored to micro-units so the differential
oracle hash-matches bit-for-bit (the weights are CAST AS DOUBLE
literals on both sides, combined in the same left-to-right order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens
from ..sources.readers import read_parquet_table
from . import query

_STOPLIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

# Feature definitions shared by training and scoring:
#   f_len   = n_words / 100          (length)
#   f_wlen  = mean word length / 10  (gibberish / boilerplate proxy)
#   f_alpha = alphabetic-word fraction
#   f_stop  = stopword fraction * 10 (natural-language-ness)
FEATURES = ("f_len", "f_wlen", "f_alpha", "f_stop")

# Published model artifact: full-batch GD (lr=2.0, 60 iters) on the
# sf0.01 corpus against the Gopher keep flag — 97.2% train agreement
# vs a 52.8% base rate. Constants, like the LSH hyperplanes.
WEIGHTS = (6.137217, -0.736549, -1.539512, 0.471571)
BIAS = -1.539512


def _feature_frame(docs: DataFrame) -> DataFrame:
    w = tokens("text")
    n_words = F.size(w).cast("double")
    swl = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    ).cast("double")
    n_alpha = F.size(F.filter(w, lambda x: x.rlike(r"^[A-Za-z]+$"))).cast("double")
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS))).cast("double")
    g1 = F.greatest(n_words, F.lit(1.0))
    keep = (
        n_words.between(50, 100000)
        & (swl / g1).between(3.0, 10.0)
        & (n_alpha / g1 >= 0.8)
        & (n_stop >= 2)
    )
    return docs.select(
        "doc_id",
        (n_words / F.lit(100.0)).alias("f_len"),
        (swl / g1 / F.lit(10.0)).alias("f_wlen"),
        (n_alpha / g1).alias("f_alpha"),
        (n_stop / g1 * F.lit(10.0)).alias("f_stop"),
        keep.alias("rule_keep"),
    )


_FEATURE_SQL = rf"""
    WITH t AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS w FROM documents
    ),
    m AS (
        SELECT doc_id,
               CAST(len(w) AS DOUBLE) AS n_words,
               CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
                   AS swl,
               CAST(len(list_filter(w, x -> regexp_full_match(x, '[A-Za-z]+')))
                    AS DOUBLE) AS n_alpha,
               CAST(len(list_filter(w, x -> x IN ({_STOPLIST_SQL})))
                    AS DOUBLE) AS n_stop
        FROM t
    ),
    f AS (
        SELECT doc_id,
               n_words / CAST(100.0 AS DOUBLE) AS f_len,
               swl / greatest(n_words, CAST(1.0 AS DOUBLE))
                   / CAST(10.0 AS DOUBLE) AS f_wlen,
               n_alpha / greatest(n_words, CAST(1.0 AS DOUBLE)) AS f_alpha,
               n_stop / greatest(n_words, CAST(1.0 AS DOUBLE))
                   * CAST(10.0 AS DOUBLE) AS f_stop,
               (n_words BETWEEN 50 AND 100000
                AND (swl / greatest(n_words, CAST(1.0 AS DOUBLE)))
                        BETWEEN CAST(3.0 AS DOUBLE) AND CAST(10.0 AS DOUBLE)
                AND n_alpha / greatest(n_words, CAST(1.0 AS DOUBLE))
                        >= CAST(0.8 AS DOUBLE)
                AND n_stop >= 2) AS rule_keep
        FROM m
    )
"""


def _margin(cols: tuple[str, ...] = FEATURES) -> Column:
    out: Column = F.lit(float(BIAS))
    for c, w in zip(cols, WEIGHTS):
        out = out + F.lit(float(w)) * F.col(c)
    return out


def _margin_sql() -> str:
    terms = "".join(
        f" + CAST({w} AS DOUBLE) * {c}" for c, w in zip(FEATURES, WEIGHTS)
    )
    return f"CAST({BIAS} AS DOUBLE){terms}"


# ---------------------------------------------------------------------------
# Apply the published quality model to every document — the 100 TB
# operation (training is rare; scoring is every-ingest). Margin in
# floored micro-units; pred is the sign. One map-only codegen pass.
@query(
    "quality_classifier_score_docs",
    oracle=f"""
    {_FEATURE_SQL}
    SELECT doc_id,
           CAST(floor(({_margin_sql()}) * 1000000) AS BIGINT) AS margin_micro,
           ({_margin_sql()}) >= 0 AS pred_keep,
           rule_keep
    FROM f
    ORDER BY doc_id
    """,
)
def quality_classifier_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    feat = _feature_frame(docs)
    m = _margin()
    return feat.select(
        "doc_id",
        F.floor(m * F.lit(1000000.0)).cast("bigint").alias("margin_micro"),
        (m >= 0).alias("pred_keep"),
        "rule_keep",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Train the distillation model on the corpus at hand. Iterative →
# rows-only (fixed 6-row output: bias, 4 weights, train agreement);
# exact numpy parity + accuracy >= 0.9 gates in tests.
@query("quality_classifier_train_docs")
def quality_classifier_train_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.classifier import logreg_train, margin_expr

    docs = read_parquet_table(spark, sf_dir, "documents")
    feat = _feature_frame(docs).withColumn(
        "y", F.col("rule_keep").cast("double")
    )
    w, b = logreg_train(feat, list(FEATURES), "y", lr=2.0, n_iter=60)
    m = margin_expr(list(FEATURES), w, b)
    acc = feat.agg(
        F.avg(((m >= 0) == F.col("rule_keep")).cast("double"))
    ).collect()[0][0]
    rows = (
        [("bias", float(b))]
        + [(c, float(wj)) for c, wj in zip(FEATURES, w)]
        + [("train_agreement", float(acc))]
    )
    return spark.createDataFrame(rows, "term string, value double").orderBy("term")


# ---------------------------------------------------------------------------
# Feature hashing (the "hashing trick", Weinberger et al. 2009, public
# paper): categorical event features are projected into a fixed
# D-dimensional signed-count vector without any vocabulary build —
# dim = md5(feature) % D, sign = parity of the next md5 nibble. The
# standard trick for unbounded-cardinality categoricals (ids, UA
# strings, domains) at 100 TB: map-only feature extraction (explode of
# a 2-element literal array), ONE shuffle on (user, dim), no dictionary
# state to maintain or broadcast. Deterministic via md5 (the repo's
# cross-engine hash), unlike murmur-based hashers that pin you to one
# engine. Output is the long-form (user_id, dim, weight) sparse vector.
_FH_D = 16
_FH_SALT = "fh:"


def _fh_dim_sql(feat: str) -> str:
    return (
        f"CAST(('0x' || substr(md5('{_FH_SALT}' || {feat}), 1, 6)) AS BIGINT) % {_FH_D}"
    )


def _fh_sign_sql(feat: str) -> str:
    return (
        f"CASE WHEN CAST(('0x' || substr(md5('{_FH_SALT}' || {feat}), 7, 1)) AS BIGINT) % 2 = 0 "
        f"THEN 1 ELSE -1 END"
    )


@query(
    "feature_hash_events",
    oracle=f"""
    WITH feat AS (
        SELECT user_id,
               unnest(['et:' || event_type,
                       'hr:' || CAST(hour(ts) AS VARCHAR)]) AS f
        FROM events
    )
    SELECT user_id,
           CAST({_fh_dim_sql('f')} AS BIGINT) AS dim,
           CAST(SUM({_fh_sign_sql('f')}) AS BIGINT) AS weight
    FROM feat
    GROUP BY user_id, dim
    ORDER BY user_id, dim
    """,
)
def feature_hash_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    feat = ev.select(
        "user_id",
        F.explode(
            F.array(
                F.concat(F.lit("et:"), F.col("event_type")),
                F.concat(F.lit("hr:"), F.hour("ts").cast("string")),
            )
        ).alias("f"),
    )
    h = F.md5(F.concat(F.lit(_FH_SALT), F.col("f")))
    dim = (F.conv(F.substring(h, 1, 6), 16, 10).cast("bigint") % _FH_D).alias(
        "dim"
    )
    sign = F.when(
        F.conv(F.substring(h, 7, 1), 16, 10).cast("bigint") % 2 == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        feat.select("user_id", dim, sign.alias("s"))
        .groupBy("user_id", "dim")
        .agg(F.sum("s").cast("bigint").alias("weight"))
        .orderBy("user_id", "dim")
    )


# ---------------------------------------------------------------------------
# Classifier eval: exact ROC AUC of the published quality model's
# margin against the Gopher rule label — Mann-Whitney U with midranks
# (tie-correct), all rank arithmetic in doubled integers, one final
# division. The margin prefix sum uses the block-offset cumsum (no
# global window; margin div 1e6 coarsens the sort). The oracle runs
# the textbook single-window formulation — bit-identical.
@query(
    "auc_quality_classifier",
    oracle=f"""
    {_FEATURE_SQL},
    scored AS (
        SELECT CAST(floor(({_margin_sql()}) * 1000000) AS BIGINT) AS s,
               rule_keep FROM f
    ),
    per AS (
        SELECT s, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN rule_keep THEN 1 ELSE 0 END) AS BIGINT) AS p
        FROM scored GROUP BY s
    ),
    cum AS (
        SELECT *, COALESCE(SUM(c) OVER (
                      ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS cum_before
        FROM per
    ),
    agg AS (
        SELECT CAST(SUM(p * (2 * cum_before + c + 1)) AS BIGINT) AS sum_rank2,
               CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(c - p) AS BIGINT) AS n_neg
        FROM cum
    )
    SELECT n_pos, n_neg,
           CAST(sum_rank2 - n_pos * (n_pos + 1) AS BIGINT) AS u2,
           CAST(sum_rank2 - n_pos * (n_pos + 1) AS DOUBLE)
               / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
    FROM agg
    """,
)
def auc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import auc_exact

    docs = read_parquet_table(spark, sf_dir, "documents")
    scored = _feature_frame(docs).select(
        F.floor(_margin() * F.lit(1_000_000)).cast("bigint").alias("s"),
        "rule_keep",
    )
    return auc_exact(
        scored,
        "s",
        "rule_keep",
        block=F.floor(F.col("s") / F.lit(1_000_000)).cast("long"),
    )


# ---------------------------------------------------------------------------
# Score-binned reliability table: margin bands vs observed positive
# rate — the calibration read-out that needs no sigmoid (exp is
# libm-variable cross-engine; the band is monotone in the
# probability, so monotonically increasing frac_pos IS the
# calibration signal). One aggregation; mean margin decimal-exact.
@query(
    "score_reliability_docs",
    oracle=f"""
    {_FEATURE_SQL},
    scored AS (
        SELECT CAST(floor(({_margin_sql()}) * 1000000) AS BIGINT) AS s,
               rule_keep FROM f
    )
    SELECT CAST(floor(CAST(s AS DOUBLE) / 2000000.0) AS BIGINT) AS band,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN rule_keep THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pos,
           CAST(SUM(CASE WHEN rule_keep THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE) AS frac_pos,
           CAST(SUM(CAST(s AS DECIMAL(30,6))) AS DOUBLE)
               / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS mean_margin
    FROM scored
    GROUP BY 1 ORDER BY band
    """,
)
def score_reliability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    scored = _feature_frame(docs).select(
        F.floor(_margin() * F.lit(1_000_000)).cast("bigint").alias("s"),
        "rule_keep",
    )
    return (
        scored.groupBy(
            F.floor(F.col("s").cast("double") / F.lit(2_000_000.0))
            .cast("bigint")
            .alias("band")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("rule_keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
            (
                F.sum(F.when(F.col("rule_keep"), 1).otherwise(0)).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("frac_pos"),
            (
                F.sum(F.col("s").cast("decimal(30,6)")).cast("double")
                / F.lit(1_000_000.0)
                / F.count(F.lit(1)).cast("double")
            ).alias("mean_margin"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Churn feature/label builder (r7): the standard temporal-split
# training-set construction — features from the observation window
# (first ⅔ of the data's day span), label from the holdout window
# (churned = zero events after the cutoff). The cutoff derives from
# the data's own min/max day (exact BIGINT arithmetic, broadcast
# scalar), so the query is scale-factor-agnostic; every feature is
# an exact count / BIGINT recency / fixed-order decimal mean. One
# user-keyed aggregation per window, one left join — the label side
# after combine is |churning users|-sized.
@query(
    "churn_features_users",
    oracle="""
    WITH d AS (
        SELECT user_id,
               CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 86400)
                    AS BIGINT) AS day,
               value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p
        FROM events
    ),
    span AS (
        SELECT MIN(day) AS d0,
               MIN(day) + CAST(FLOOR(0.66 * (MAX(day) - MIN(day)))
                               AS BIGINT) AS cutoff
        FROM d
    ),
    obs AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(is_p) AS BIGINT) AS n_purchases,
               CAST(COUNT(DISTINCT day) AS BIGINT) AS days_active,
               CAST(MIN(span.cutoff - day) AS BIGINT) AS recency_days,
               CAST(SUM(CAST(value AS DECIMAL(24,6))) AS DOUBLE)
                   / COUNT(*) AS mean_value
        FROM d, span WHERE day <= span.cutoff
        GROUP BY user_id
    ),
    fut AS (
        SELECT DISTINCT d.user_id
        FROM d, span WHERE d.day > span.cutoff
    )
    SELECT o.user_id, o.n_events, o.n_purchases, o.days_active,
           o.recency_days,
           o.mean_value,
           (f.user_id IS NULL) AS churned
    FROM obs o LEFT JOIN fut f ON o.user_id = f.user_id
    ORDER BY o.user_id
    """,
)
def churn_features_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    d = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / F.lit(86400))
        .cast("bigint")
        .alias("day"),
        "value",
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_p"),
    )
    span = d.agg(
        F.min("day").alias("d0"),
        (
            F.min("day")
            + F.floor(F.lit(0.66) * (F.max("day") - F.min("day"))).cast(
                "bigint"
            )
        ).alias("cutoff"),
    )
    dd = d.crossJoin(F.broadcast(span))
    obs = (
        dd.filter(F.col("day") <= F.col("cutoff"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("is_p").cast("bigint").alias("n_purchases"),
            F.countDistinct("day").cast("bigint").alias("days_active"),
            F.min(F.col("cutoff") - F.col("day"))
            .cast("bigint")
            .alias("recency_days"),
            (
                F.sum(F.col("value").cast("decimal(24,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_value"),
        )
    )
    fut = (
        dd.filter(F.col("day") > F.col("cutoff"))
        .select("user_id")
        .distinct()
        .withColumn("__active", F.lit(1))
    )
    return (
        obs.join(fut, "user_id", "left")
        .select(
            "user_id",
            "n_events",
            "n_purchases",
            "days_active",
            "recency_days",
            "mean_value",
            F.col("__active").isNull().alias("churned"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Decile lift & gains table (r8): the targeting read-out on the
# published quality model — rank all docs by margin (descending),
# split into 10 equal-rank deciles, report per-decile positive rate,
# lift vs the base rate, and cumulative gains (share of all positives
# captured through decile k). Completes the classifier-eval family
# (AUC = ranking quality, reliability = calibration, lift = business
# read-out). Ranking rides the block-offset global_rank (no global
# window); decile boundaries are pure integer arithmetic on the rank;
# every rate/lift composes integer counts in one fixed-order float
# expression.
@query(
    "lift_table_quality_docs",
    oracle=f"""
    {_FEATURE_SQL},
    scored AS (
        SELECT doc_id,
               CAST(floor(({_margin_sql()}) * 1000000) AS BIGINT) AS s,
               rule_keep
        FROM f
    ),
    ranked AS (
        SELECT s, rule_keep,
               row_number() OVER (ORDER BY s DESC, doc_id) AS rk,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM scored) AS n_total
        FROM scored
    ),
    dec AS (
        SELECT CAST((rk - 1) * 10 // n_total AS BIGINT) + 1 AS decile,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN rule_keep THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pos
        FROM ranked GROUP BY 1
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(n_pos) AS BIGINT) AS pt
        FROM dec
    )
    SELECT decile, n, n_pos,
           CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS pos_rate,
           (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
               / (CAST(t.pt AS DOUBLE) / CAST(t.nt AS DOUBLE)) AS lift,
           CAST(SUM(n_pos) OVER (ORDER BY decile) AS DOUBLE)
               / CAST(t.pt AS DOUBLE) AS cum_gain
    FROM dec CROSS JOIN tot t
    ORDER BY decile
    """,
)
def lift_table_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import global_rank

    docs = read_parquet_table(spark, sf_dir, "documents")
    scored = _feature_frame(docs).select(
        "doc_id",
        F.floor(_margin() * F.lit(1_000_000)).cast("bigint").alias("s"),
        "rule_keep",
    )
    # block = coarsened NEGATED margin so block order matches the
    # (s DESC, doc_id) sort the rank needs
    ranked = global_rank(
        scored.withColumn("__neg", -F.col("s")),
        sort_cols=["__neg", "doc_id"],
        block=F.floor(F.col("__neg") / F.lit(1_000_000)).cast("long"),
        rank_col="rk",
    )
    n_total = scored.count()
    dec = (
        ranked.withColumn(
            "decile",
            F.expr(f"((rk - 1) * 10) div {n_total}").cast("bigint") + 1,
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("rule_keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pos"),
        )
    )
    tot = dec.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("n_pos").cast("bigint").alias("pt"),
    )
    # decile domain is 10 rows — the window is bounded, not corpus-scale
    from pyspark.sql import Window as W

    wcum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    pos_rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    base = F.col("pt").cast("double") / F.col("nt").cast("double")
    return (
        dec.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            pos_rate.alias("pos_rate"),
            (pos_rate / base).alias("lift"),
            (
                F.sum("n_pos").over(wcum).cast("double")
                / F.col("pt").cast("double")
            ).alias("cum_gain"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# Out-of-fold target encoding (r8): the leakage-safe categorical
# encoder every tabular-ML pipeline needs — encode a category by the
# TARGET mean computed on the OTHER K-1 folds (plus m-smoothing
# toward the global mean, Micci-Barreca 2001), so a row never sees
# its own label. One partial aggregate per (category, fold) is the
# only shuffle; category and whole-table totals re-aggregate the
# partials (exact BIGINT micro-sums), so the out-of-fold mean is a
# subtraction, not a second scan. Smoothing m = 10 also guarantees a
# non-zero denominator for single-fold categories.
@query(
    "target_encode_orders",
    oracle="""
    WITH pf AS (
        SELECT o_orderpriority AS category,
               o_orderkey % 5 AS fold,
               CAST(SUM(CAST(ROUND(o_totalprice * 1000000.0) AS BIGINT))
                    AS BIGINT) AS s_cf,
               CAST(COUNT(*) AS BIGINT) AS n_cf
        FROM orders GROUP BY 1, 2
    ), pc AS (
        SELECT category, SUM(s_cf) AS s_c, SUM(n_cf) AS n_c
        FROM pf GROUP BY 1
    ), g AS (
        SELECT CAST(SUM(s_cf) AS DOUBLE) / SUM(n_cf) / 1000000.0 AS gm
        FROM pf
    )
    SELECT pf.category, CAST(pf.fold AS BIGINT) AS fold, pf.n_cf,
           CAST(pc.s_c AS DOUBLE) / pc.n_c / 1000000.0 AS cat_mean,
           (CAST(pc.s_c - pf.s_cf AS DOUBLE) / 1000000.0 + 10.0 * g.gm)
             / (CAST(pc.n_c - pf.n_cf AS DOUBLE) + 10.0) AS oof_mean
    FROM pf JOIN pc USING (category) CROSS JOIN g
    ORDER BY category, fold
    """,
)
def target_encode_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet_table(spark, sf_dir, "orders")
    pf = (
        o.select(
            F.col("o_orderpriority").alias("category"),
            (F.col("o_orderkey") % 5).alias("fold"),
            F.round(F.col("o_totalprice") * F.lit(1000000.0))
            .cast("bigint")
            .alias("vm"),
        )
        .groupBy("category", "fold")
        .agg(
            F.sum("vm").cast("bigint").alias("s_cf"),
            F.count(F.lit(1)).cast("bigint").alias("n_cf"),
        )
    )
    pc = pf.groupBy("category").agg(
        F.sum("s_cf").alias("s_c"), F.sum("n_cf").alias("n_c")
    )
    g = pf.agg(
        (
            F.sum("s_cf").cast("double")
            / F.sum("n_cf")
            / F.lit(1000000.0)
        ).alias("gm")
    )
    return (
        pf.join(pc, "category")
        .crossJoin(F.broadcast(g))
        .select(
            "category",
            F.col("fold").cast("bigint").alias("fold"),
            "n_cf",
            (
                F.col("s_c").cast("double")
                / F.col("n_c")
                / F.lit(1000000.0)
            ).alias("cat_mean"),
            (
                (
                    (F.col("s_c") - F.col("s_cf")).cast("double")
                    / F.lit(1000000.0)
                    + F.lit(10.0) * F.col("gm")
                )
                / ((F.col("n_c") - F.col("n_cf")).cast("double") + F.lit(10.0))
            ).alias("oof_mean"),
        )
        .orderBy("category", "fold")
    )


# ---------------------------------------------------------------------------
# Split conformal prediction intervals (r8): distribution-free 90%
# intervals around a group-conditional mean model (Vovk et al.;
# Papadopoulos et al. 2002). Train split fits the per-event-type
# mean; the calibration split's absolute residuals give the
# conformity scores; qhat is the ⌈0.9·(n+1)⌉-th smallest score, so
# [pred − qhat, pred + qhat] carries a finite-sample marginal
# coverage guarantee ≥ 90%. The model is exact integer micro-units;
# the global order statistic comes from the block-offset rank
# (operators/linkage.global_rank, block = value-range bucket) —
# never a single-reducer global window.
@query(
    "conformal_intervals_events",
    oracle="""
    WITH base AS (
        SELECT event_id, event_type,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS vm,
               event_id % 5 = 3 AS is_calib
        FROM events
    ), model AS (
        SELECT event_type,
               CAST(ROUND(CAST(SUM(vm) AS DOUBLE) / COUNT(*)) AS BIGINT)
                 AS pred_m,
               CAST(COUNT(*) AS BIGINT) AS n_train
        FROM base WHERE NOT is_calib GROUP BY 1
    ), scores AS (
        SELECT abs(b.vm - m.pred_m) AS resid, b.event_id
        FROM base b JOIN model m USING (event_type)
        WHERE b.is_calib
    ), nq AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
               LEAST(CAST(COUNT(*) AS BIGINT),
                     CAST(CEIL(0.9 * (COUNT(*) + 1)) AS BIGINT)) AS k
        FROM scores
    ), ranked AS (
        SELECT resid, ROW_NUMBER() OVER (ORDER BY resid, event_id) AS r
        FROM scores
    ), qhat AS (
        SELECT CAST(ranked.resid AS BIGINT) AS q_m, nq.n_cal
        FROM ranked CROSS JOIN nq WHERE ranked.r = nq.k
    )
    SELECT m.event_type, m.n_train, q.n_cal,
           CAST(m.pred_m AS DOUBLE) / 1000000.0 AS pred,
           CAST(q.q_m AS DOUBLE) / 1000000.0 AS qhat,
           CAST(m.pred_m - q.q_m AS DOUBLE) / 1000000.0 AS lo,
           CAST(m.pred_m + q.q_m AS DOUBLE) / 1000000.0 AS hi
    FROM model m CROSS JOIN qhat q
    ORDER BY m.event_type
    """,
)
def conformal_intervals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from ..operators.linkage import global_rank

    ev = read_parquet_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * F.lit(1000000.0)).cast("bigint").alias("vm"),
        (F.col("event_id") % 5 == 3).alias("is_calib"),
    )
    model = (
        ev.filter(~F.col("is_calib"))
        .groupBy("event_type")
        .agg(
            F.round(F.sum("vm").cast("double") / F.count(F.lit(1)))
            .cast("bigint")
            .alias("pred_m"),
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
        )
    )
    scores = (
        ev.filter(F.col("is_calib"))
        .join(F.broadcast(model.select("event_type", "pred_m")), "event_type")
        .select(
            F.abs(F.col("vm") - F.col("pred_m")).alias("resid"), "event_id"
        )
    )
    n_cal = scores.count()
    k = min(n_cal, math.ceil(0.9 * (n_cal + 1)))
    ranked = global_rank(
        scores,
        ["resid", "event_id"],
        (F.col("resid") / F.lit(1 << 24)).cast("bigint"),
        rank_col="r",
    )
    qhat = ranked.filter(F.col("r") == k).select(
        F.col("resid").alias("q_m"),
        F.lit(n_cal).cast("bigint").alias("n_cal"),
    )
    return (
        model.crossJoin(F.broadcast(qhat))
        .select(
            "event_type",
            "n_train",
            "n_cal",
            (F.col("pred_m").cast("double") / F.lit(1000000.0)).alias("pred"),
            (F.col("q_m").cast("double") / F.lit(1000000.0)).alias("qhat"),
            (
                (F.col("pred_m") - F.col("q_m")).cast("double")
                / F.lit(1000000.0)
            ).alias("lo"),
            (
                (F.col("pred_m") + F.col("q_m")).cast("double")
                / F.lit(1000000.0)
            ).alias("hi"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Item-item collaborative filtering (r8): classic co-occurrence
# recommender (Sarwar et al. 2001) over order baskets — for the 20
# most-ordered parts, the top-3 "customers also ordered" neighbors
# by cosine co(a,b)/√(n_a·n_b). The basket self-join is keyed on the
# order (never an unkeyed cross) and TPC-H baskets are ≤7 lines; at
# open-corpus scale the same mega-basket cap as the A-Priori family
# applies (operators/itemsets.py) — the per-basket pair expansion is
# the standard quadratic-in-basket-size cost, bounded by capping,
# not by hoping. Anchors come from TakeOrdered (no global sort);
# integer counts → one fixed-order cosine, ranks tie-broken by key.
@query(
    "itemcf_recs_parts",
    oracle="""
    WITH po AS (
        SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), np AS (
        SELECT p, CAST(COUNT(*) AS BIGINT) AS n FROM po GROUP BY 1
    ), anchors AS (
        SELECT p, n FROM np ORDER BY n DESC, p LIMIT 20
    ), co AS (
        SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS c
        FROM po a JOIN po b ON a.o = b.o AND a.p <> b.p
        WHERE a.p IN (SELECT p FROM anchors)
        GROUP BY 1, 2
    ), scored AS (
        SELECT co.pa, co.pb, co.c,
               CAST(co.c AS DOUBLE)
                 / sqrt(CAST(na.n AS DOUBLE) * CAST(nb.n AS DOUBLE))
                 AS cosine
        FROM co
        JOIN np na ON na.p = co.pa
        JOIN np nb ON nb.p = co.pb
    ), ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY pa
                                     ORDER BY cosine DESC, pb) AS rk
        FROM scored
    )
    SELECT CAST(pa AS BIGINT) AS part, CAST(pb AS BIGINT) AS rec,
           c AS co_orders, cosine, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 3
    ORDER BY part, rk
    """,
)
def itemcf_recs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem")
    po = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    np_ = po.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    anchors = np_.orderBy(F.col("n").desc(), "p").limit(20)
    co = (
        po.alias("a")
        .join(
            F.broadcast(anchors.select(F.col("p").alias("ap"))),
            F.col("a.p") == F.col("ap"),
        )
        .join(po.alias("b"), "o")
        .filter(F.col("a.p") != F.col("b.p"))
        .groupBy(
            F.col("a.p").alias("pa"), F.col("b.p").alias("pb")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    scored = (
        co.join(
            np_.select(F.col("p").alias("pa"), F.col("n").alias("na")), "pa"
        )
        .join(
            np_.select(F.col("p").alias("pb"), F.col("n").alias("nb")), "pb"
        )
        .select(
            "pa",
            "pb",
            "c",
            (
                F.col("c").cast("double")
                / F.sqrt(
                    F.col("na").cast("double") * F.col("nb").cast("double")
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("pa").orderBy(F.col("cosine").desc(), "pb")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("pa").cast("bigint").alias("part"),
            F.col("pb").cast("bigint").alias("rec"),
            F.col("c").alias("co_orders"),
            "cosine",
            F.col("rk").cast("bigint").alias("rk"),
        )
        .orderBy("part", "rk")
    )


# ---------------------------------------------------------------------------
# Lag-feature generation (r8): the feature-engineering staple for
# sequence models — per user, value lag-1, lag-2 and the trailing
# 3-event mean, generated with one user-keyed window pass (exact
# micro-integers; the trailing mean divides ONCE per row). The
# gated output aggregates the generated features per event type
# (count of rows with full history, exact means of each feature),
# proving generation correctness without shipping per-event rows
# through the hash gate.
@query(
    "lag_features_events",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               CAST(ROUND(value * 1000000.0) AS BIGINT) AS vm,
               lag(CAST(ROUND(value * 1000000.0) AS BIGINT), 1)
                 OVER w AS lag1,
               lag(CAST(ROUND(value * 1000000.0) AS BIGINT), 2)
                 OVER w AS lag2
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY epoch_us(ts), event_id)
    ), full_hist AS (
        SELECT event_type, vm, lag1, lag2,
               CAST(vm + lag1 + lag2 AS BIGINT) AS s3
        FROM seq WHERE lag2 IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(lag1) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_lag1,
           CAST(SUM(lag2) AS DOUBLE) / COUNT(*) / 1000000.0 AS mean_lag2,
           CAST(SUM(s3) AS DOUBLE) / COUNT(*) / 3.0 / 1000000.0
             AS mean_trailing3
    FROM full_hist
    GROUP BY event_type ORDER BY event_type
    """,
)
def lag_features_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * F.lit(1000000.0)).cast("bigint").alias("vm"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    feats = (
        ev.withColumn("lag1", F.lag("vm", 1).over(w))
        .withColumn("lag2", F.lag("vm", 2).over(w))
        .filter(F.col("lag2").isNotNull())
        .withColumn(
            "s3",
            (F.col("vm") + F.col("lag1") + F.col("lag2")).cast("bigint"),
        )
    )
    return (
        feats.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            (
                F.sum("lag1").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0)
            ).alias("mean_lag1"),
            (
                F.sum("lag2").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0)
            ).alias("mean_lag2"),
            (
                F.sum("s3").cast("double")
                / F.count(F.lit(1))
                / F.lit(3.0)
                / F.lit(1000000.0)
            ).alias("mean_trailing3"),
        )
        .orderBy("event_type")
    )
