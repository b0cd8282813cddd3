"""Exact statistical-modeling operators: OLS trend, autocorrelation,
higher-moment profiles, RFM segmentation, ABC/Pareto analysis,
node-similarity (Jaccard) between event types, Count-Min sketch,
exact PERCENTILE_CONT, per-group mode, NULL-comparison semantics,
and the calendar-function surface (SURVEY §7 extension scope — the
reference has no stats surface).

Determinism: every operator reduces to EXACT sums first — BIGINT for
integer series, DECIMAL for double series (repo convention:
order-independent, bit-identical across engines) — and only then
combines them with a mirrored double-arithmetic expression (IEEE ops
and ``sqrt`` are correctly rounded, so both engines produce identical
bits; ``pow`` is deliberately avoided — libm ``pow`` is NOT correctly
rounded, so x^1.5 is spelled ``x*sqrt(x)``).

100 TB shapes:
- OLS / moments: one partial-aggregable groupBy per query — sums of
  products are map-side combined; bytes ∝ #groups after combine.
- ACF: the window runs on the AGGREGATED hourly domain (#hours rows —
  a decade is <100k), never the raw events; the raw pass is one
  partial-combined groupBy on the hour key.
- RFM / ABC: global rank / running share use the two-phase
  block-offset idiom (operators/linkage.py), not a single-reducer
  global window; scalar totals broadcast.
- Jaccard: distinct on (user, type) then a type-pair co-occurrence
  join keyed on user — the same shape as token co-occurrence PMI;
  pair domain is #types², never #users².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# hour index since epoch; floor(floor(epoch)/3600) == floor(epoch/3600)
# for positive epochs, so the Spark (unix_timestamp is already
# truncated seconds) and DuckDB (epoch() is fractional) forms agree.
def _hour_idx() -> F.Column:
    return F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("bigint")


_SQL_HOUR = "CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 3600) AS BIGINT)"


# ---------------------------------------------------------------------------
# Per-type OLS trend of event value against time (hour index).
# slope/intercept/r² from the closed-form normal equations over exact
# sums: Σx, Σx² in BIGINT (x is an hour index — ~5e5 today, so Σx²
# fits BIGINT comfortably past sf1); Σy, Σy², Σxy in DECIMAL. The
# built-in regr_slope/regr_r2 aggregate in floats (order-dependent)
# — this formulation is the exact-sum twin, and is what a 1000-node
# run needs anyway: five map-side-combined sums, one tiny reduce.
@query(
    "ols_trend_events",
    oracle=f"""
    WITH s AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(x) AS sx,
               SUM(x * x) AS sxx,
               SUM(ydec) AS sy,
               SUM(CAST(y * y AS DECIMAL(24,6))) AS syy,
               SUM(CAST(x AS DECIMAL(12,0)) * ydec) AS sxy
        FROM (
            SELECT event_type,
                   {_SQL_HOUR} AS x,
                   value AS y,
                   CAST(value AS DECIMAL(18,6)) AS ydec
            FROM events
        )
        GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
           (CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
           ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                  - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
    FROM s
    ORDER BY event_type
    """,
)
def ols_trend_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ydec = F.col("value").cast("decimal(18,6)")
    base = ev.select(
        "event_type",
        _hour_idx().alias("x"),
        F.col("value").alias("y"),
        ydec.alias("ydec"),
    )
    s = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum("ydec").alias("sy"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(24,6)")).alias("syy"),
        F.sum(F.col("x").cast("decimal(12,0)") * F.col("ydec")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    sxxd = F.col("sxx").cast("double")
    syd = F.col("sy").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    num = nd * sxyd - sxd * syd
    denx = nd * sxxd - sxd * sxd
    deny = nd * syyd - syd * syd
    slope = num / denx
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope"),
        ((syd - slope * sxd) / nd).alias("intercept"),
        ((num * num) / (denx * deny)).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Autocorrelation of the hourly event-count series at lags 1..3:
# Pearson r between (c_t, c_{t-ℓ}) over consecutive rows of the
# hour-ordered aggregate. All sums are BIGINT over integer counts —
# exact — and the final r is one mirrored double expression. The lag
# window is single-partition BY DESIGN but runs on the aggregated
# hourly domain (bounded: a decade of hours < 100k rows), never the
# raw events; the events-sized pass is the partial-combined groupBy.
@query(
    "acf_hourly_events",
    oracle=f"""
    WITH hourly AS (
        SELECT {_SQL_HOUR} AS h, COUNT(*) AS c
        FROM events GROUP BY 1
    ),
    lagged AS (
        SELECT c,
               lag(c, 1) OVER (ORDER BY h) AS l1,
               lag(c, 2) OVER (ORDER BY h) AS l2,
               lag(c, 3) OVER (ORDER BY h) AS l3
        FROM hourly
    ),
    per_lag AS (
        SELECT 1 AS lag, COUNT(l1) AS np,
               SUM(CASE WHEN l1 IS NOT NULL THEN c END) AS sx,
               SUM(l1) AS sy,
               SUM(CASE WHEN l1 IS NOT NULL THEN c * c END) AS sxx,
               SUM(l1 * l1) AS syy,
               SUM(c * l1) AS sxy
        FROM lagged
        UNION ALL
        SELECT 2, COUNT(l2),
               SUM(CASE WHEN l2 IS NOT NULL THEN c END), SUM(l2),
               SUM(CASE WHEN l2 IS NOT NULL THEN c * c END),
               SUM(l2 * l2), SUM(c * l2)
        FROM lagged
        UNION ALL
        SELECT 3, COUNT(l3),
               SUM(CASE WHEN l3 IS NOT NULL THEN c END), SUM(l3),
               SUM(CASE WHEN l3 IS NOT NULL THEN c * c END),
               SUM(l3 * l3), SUM(c * l3)
        FROM lagged
    )
    SELECT CAST(lag AS INT) AS lag,
           CAST(np AS BIGINT) AS n_pairs,
           (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(np AS DOUBLE) * CAST(syy AS DOUBLE)
                      - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf
    FROM per_lag
    ORDER BY lag
    """,
)
def acf_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(_hour_idx().alias("h")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("h")
    lagged = hourly.select(
        "c",
        F.lag("c", 1).over(w).alias("l1"),
        F.lag("c", 2).over(w).alias("l2"),
        F.lag("c", 3).over(w).alias("l3"),
    )
    parts = []
    for lag in (1, 2, 3):
        lcol = F.col(f"l{lag}")
        present = lcol.isNotNull()
        parts.append(
            lagged.agg(
                F.lit(lag).alias("lag"),
                F.count(lcol).alias("np"),
                F.sum(F.when(present, F.col("c"))).alias("sx"),
                F.sum(lcol).alias("sy"),
                F.sum(F.when(present, F.col("c") * F.col("c"))).alias("sxx"),
                F.sum(lcol * lcol).alias("syy"),
                F.sum(F.col("c") * lcol).alias("sxy"),
            )
        )
    per_lag = parts[0].unionByName(parts[1]).unionByName(parts[2])
    npd = F.col("np").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    sxxd = F.col("sxx").cast("double")
    syyd = F.col("syy").cast("double")
    sxyd = F.col("sxy").cast("double")
    acf = (npd * sxyd - sxd * syd) / F.sqrt(
        (npd * sxxd - sxd * sxd) * (npd * syyd - syd * syd)
    )
    return per_lag.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("np").cast("bigint").alias("n_pairs"),
        acf.alias("acf"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# Higher-moment profile per event type: mean, population variance,
# skewness, excess kurtosis. The fixture's values are exact
# 2-decimal quantities, so the operator works in the INTEGER domain
# w = round(100·value): integer-valued-double powers are
# IEEE-deterministic and their DECIMAL(38,0) casts are EXACT (no
# fractional rounding — a scale-6 cast of v⁴ hits decimal ties that
# the two engines round differently), and the integer sums convert
# back to double with a single correctly-rounded conversion.
# Skewness/kurtosis are scale-invariant, so they come from w
# directly; mean and variance divide by the exact powers 1e2/1e4 at
# the end. x^1.5 is spelled x*sqrt(x): libm pow is not correctly
# rounded, sqrt is.
@query(
    "moments_profile_events",
    oracle="""
    WITH s AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(CAST(round(value * 100) AS DECIMAL(38,0))) AS s1,
               SUM(CAST(round(value * 100) * round(value * 100)
                        AS DECIMAL(38,0))) AS s2,
               SUM(CAST(round(value * 100) * round(value * 100)
                        * round(value * 100) AS DECIMAL(38,0))) AS s3,
               SUM(CAST(round(value * 100) * round(value * 100)
                        AS DECIMAL(19,0))
                   * CAST(round(value * 100) * round(value * 100)
                          AS DECIMAL(19,0))) AS s4
        FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / 100.0 AS mean,
           (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
             - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) / 10000.0
             AS var_pop,
           (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
              - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))) AS skewness,
           (CAST(CAST(s4 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
              - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
              + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
              - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
             / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                  - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                    * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
             - 3.0 AS kurtosis_excess
    FROM s
    ORDER BY event_type
    """,
)
def moments_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = F.round(F.col("value") * 100)
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(w.cast("decimal(38,0)")).alias("s1"),
        F.sum((w * w).cast("decimal(38,0)")).alias("s2"),
        F.sum((w * w * w).cast("decimal(38,0)")).alias("s3"),
        # w⁴ exceeds 2^53 in double, where the engines' double→decimal
        # casts can disagree — build it as an exact decimal product of
        # the exact (≤2^53, so cast-exact) w² instead
        F.sum(
            (w * w).cast("decimal(19,0)") * (w * w).cast("decimal(19,0)")
        ).alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    var_w = r2 - m1 * m1
    m3 = r3 - F.lit(3.0) * m1 * r2 + F.lit(2.0) * m1 * m1 * m1
    m4 = (
        r4
        - F.lit(4.0) * m1 * r3
        + F.lit(6.0) * m1 * m1 * r2
        - F.lit(3.0) * m1 * m1 * m1 * m1
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        (m1 / F.lit(100.0)).alias("mean"),
        (var_w / F.lit(10000.0)).alias("var_pop"),
        (m3 / (var_w * F.sqrt(var_w))).alias("skewness"),
        (m4 / (var_w * var_w) - F.lit(3.0)).alias("kurtosis_excess"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# RFM customer segmentation: recency (days since last order, vs the
# corpus max date), frequency (#orders), monetary (exact decimal sum
# of totalprice), each scored 1..4 by exact global rank —
# score = 4 - floor((rank-1)*4/n), rank ascending in
# goodness order (recent first / frequent first / big spender first,
# custkey tie-break). Ranks come from the two-phase block-offset
# idiom (operators/linkage.global_rank) — no single-reducer window;
# the oracle runs the textbook row_number form. n broadcasts as a
# one-row scalar.
@query(
    "rfm_segments_customers",
    oracle="""
    WITH m AS (
        SELECT o_custkey AS c_custkey,
               date_diff('day',
                         CAST(MAX(o_orderdate) AS DATE),
                         (SELECT CAST(MAX(o_orderdate) AS DATE) FROM orders))
                 AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
                 AS monetary
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT *,
               row_number() OVER (ORDER BY recency_days, c_custkey) AS rr,
               row_number() OVER (ORDER BY frequency DESC, c_custkey) AS rf,
               row_number() OVER (ORDER BY monetary DESC, c_custkey) AS rm,
               COUNT(*) OVER () AS n
        FROM m
    )
    SELECT c_custkey,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           monetary,
           CAST(4 - FLOOR((rr - 1) * 4 / n) AS INT) AS r_score,
           CAST(4 - FLOOR((rf - 1) * 4 / n) AS INT) AS f_score,
           CAST(4 - FLOOR((rm - 1) * 4 / n) AS INT) AS m_score,
           CAST(CAST(4 - FLOOR((rr - 1) * 4 / n) AS INT) AS VARCHAR)
             || CAST(CAST(4 - FLOOR((rf - 1) * 4 / n) AS INT) AS VARCHAR)
             || CAST(CAST(4 - FLOOR((rm - 1) * 4 / n) AS INT) AS VARCHAR)
             AS segment
    FROM ranked
    ORDER BY c_custkey
    """,
)
def rfm_segments_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import global_rank

    orders = _t(spark, sf_dir, "orders")
    maxd = orders.agg(
        F.to_date(F.max("o_orderdate")).alias("__maxd")
    )
    m = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.to_date(F.max("o_orderdate")).alias("last_order"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(maxd))
        .select(
            "c_custkey",
            F.datediff(F.col("__maxd"), F.col("last_order")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
            (-F.col("frequency")).alias("neg_f"),
            (-F.col("monetary")).alias("neg_m"),
        )
    )
    # three exact block-offset ranks; each block expression is a
    # prefix-coarsening of its sort order with bounded cardinality
    # (distinct day counts / negated counts / 1k-wide spend buckets)
    m = global_rank(
        m, ["recency_days", "c_custkey"], F.col("recency_days"), "rr"
    )
    m = global_rank(m, ["neg_f", "c_custkey"], F.col("neg_f"), "rf")
    m = global_rank(
        m, ["neg_m", "c_custkey"], F.floor(F.col("neg_m") / F.lit(1000.0)), "rm"
    )
    n_row = m.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    m = m.crossJoin(F.broadcast(n_row))

    def score(rank_col: str) -> F.Column:
        return (
            F.lit(4)
            - F.floor((F.col(rank_col) - 1) * 4 / F.col("__n"))
        ).cast("int")

    return m.select(
        "c_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        "monetary",
        score("rr").alias("r_score"),
        score("rf").alias("f_score"),
        score("rm").alias("m_score"),
        F.concat(
            score("rr").cast("string"),
            score("rf").cast("string"),
            score("rm").cast("string"),
        ).alias("segment"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# ABC / Pareto analysis of part revenue: rank parts by revenue
# descending, exact decimal running share of total, class A ≤ 70%,
# B ≤ 90%, C above. The running sum uses the block-offset prefix-sum
# twin of global_rank (operators/linkage.global_cumsum) — decimal
# addition is order-independent, so it is bit-identical to the
# textbook single-window form the oracle runs. Sort key is the DOUBLE
# cast of the decimal revenue on BOTH sides (so any decimal→double
# tie collapses identically), custkey-style tie-break on p_partkey.
@query(
    "abc_analysis_parts",
    oracle="""
    WITH rev AS (
        SELECT l_partkey AS p_partkey,
               SUM(CAST(l_extendedprice * (1 - l_discount)
                        AS DECIMAL(30,6))) AS rev_dec
        FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
        SELECT p_partkey,
               CAST(rev_dec AS DOUBLE) AS revenue,
               CAST(row_number() OVER
                 (ORDER BY CAST(rev_dec AS DOUBLE) DESC, p_partkey)
                 AS BIGINT) AS rev_rank,
               CAST(SUM(rev_dec) OVER
                      (ORDER BY CAST(rev_dec AS DOUBLE) DESC, p_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DECIMAL(38,6)) AS cum,
               (SELECT CAST(SUM(rev_dec) AS DECIMAL(38,6)) FROM rev) AS total
        FROM rev
    )
    SELECT p_partkey, revenue, rev_rank,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           CASE WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.70
                THEN 'A'
                WHEN CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.90
                THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    ORDER BY rev_rank
    """,
)
def abc_analysis_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import global_cumsum, global_rank

    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        ).alias("rev_dec")
    )
    rev = rev.withColumn("revenue", F.col("rev_dec").cast("double")).withColumn(
        "neg_rev", -F.col("revenue")
    )
    # block: 10k-wide buckets of descending revenue — a bounded
    # prefix-coarsening of (revenue DESC, p_partkey)
    blk = F.floor(F.col("neg_rev") / F.lit(10000.0))
    ranked = global_rank(rev, ["neg_rev", "p_partkey"], blk, "rev_rank")
    ranked = global_cumsum(
        ranked, ["neg_rev", "p_partkey"], blk, "rev_dec", "cum"
    )
    total = rev.agg(
        F.sum("rev_dec").cast("decimal(38,6)").alias("__total")
    )
    share = F.col("cum").cast("double") / F.col("__total").cast("double")
    return (
        ranked.crossJoin(F.broadcast(total))
        .select(
            "p_partkey",
            "revenue",
            F.col("rev_rank").cast("bigint").alias("rev_rank"),
            share.alias("cum_share"),
            F.when(share <= 0.70, F.lit("A"))
            .when(share <= 0.90, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc_class"),
        )
        .orderBy("rev_rank")
    )


# ---------------------------------------------------------------------------
# Node similarity between event types: Jaccard of their distinct-user
# sets, |A∩B| / (|A|+|B|-|A∩B|). One distinct on (user, type), one
# per-type size agg, one user-keyed co-occurrence self-join (pair
# domain = #types², never #users²) — the same shape as token
# co-occurrence PMI, with exact integer counts throughout.
@query(
    "node_jaccard_event_types",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    sizes AS (SELECT event_type, COUNT(*) AS sz FROM ut GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_common
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT i.type_a, i.type_b,
           CAST(sa.sz AS BIGINT) AS n_a,
           CAST(sb.sz AS BIGINT) AS n_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(i.n_common AS DOUBLE)
             / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    ORDER BY type_a, type_b
    """,
)
def node_jaccard_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("sz").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("sz").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("n_common").cast("bigint").alias("n_common"),
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters with an exact differential eval:
# d=4 hash rows h_i(u) = ((a_i·u + b_i) mod P) mod W with LCG
# constants both engines evaluate identically in BIGINT (no
# engine-native hash — Spark's murmur3 and DuckDB's hash() differ,
# the sketch contract is the hash FAMILY, not a specific function).
# Build: one partial-combined groupBy on (row, bucket) — map-side
# combine collapses each partition to ≤ d·W cells, which IS the CMS
# merge property at 1000 executors. Probe: the d·W table joins back
# to the distinct-user domain; estimate = min over rows. Output: the
# top-20 exact heavy hitters with their CMS estimate and the
# (always ≥ 0) overestimate — the sketch-error read-out.
_CMS_P = 2_147_483_647
_CMS_W = 512
_CMS_ROWS = [(1, 101, 17), (2, 2003, 89), (3, 40009, 251), (4, 700001, 733)]


@query(
    "cms_heavy_hitters_users",
    oracle=f"""
    WITH hs(i, a, b) AS (
        VALUES {", ".join(f"({i}, {a}, {b})" for i, a, b in _CMS_ROWS)}
    ),
    counts AS (
        SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id
    ),
    cells AS (
        SELECT h.i,
               ((h.a * e.user_id + h.b) % {_CMS_P}) % {_CMS_W} AS bkt,
               COUNT(*) AS bc
        FROM events e CROSS JOIN hs h
        GROUP BY h.i, bkt
    ),
    est AS (
        SELECT c.user_id, MIN(cl.bc) AS cms_est
        FROM counts c
        CROSS JOIN hs h
        JOIN cells cl
          ON cl.i = h.i
         AND cl.bkt = ((h.a * c.user_id + h.b) % {_CMS_P}) % {_CMS_W}
        GROUP BY c.user_id
    )
    SELECT c.user_id,
           CAST(c.c AS BIGINT) AS exact_count,
           CAST(e.cms_est AS BIGINT) AS cms_est,
           CAST(e.cms_est - c.c AS BIGINT) AS overestimate
    FROM counts c JOIN est e ON c.user_id = e.user_id
    ORDER BY exact_count DESC, c.user_id
    LIMIT 20
    """,
)
def cms_heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return cms_report(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c")),
        cms_cells(ev),
    )


def _cms_bkt(uid: F.Column) -> F.Column:
    return ((F.col("a") * uid + F.col("b")) % _CMS_P) % _CMS_W


def cms_cells(ev: DataFrame) -> DataFrame:
    """d×W CMS cell counts for a batch of events — additive, so cells
    from disjoint batches MERGE by summing (the property the
    streaming twin exercises)."""
    hs = ev.sparkSession.createDataFrame(_CMS_ROWS, ["i", "a", "b"])
    return (
        ev.crossJoin(F.broadcast(hs))
        .groupBy("i", _cms_bkt(F.col("user_id")).alias("bkt"))
        .agg(F.count(F.lit(1)).alias("bc"))
    )


def cms_report(counts: DataFrame, cells: DataFrame) -> DataFrame:
    """Top-20 exact heavy hitters with their CMS estimate from the
    given cell table (min over the d probed cells per user)."""
    hs = counts.sparkSession.createDataFrame(_CMS_ROWS, ["i", "a", "b"])
    est = (
        counts.crossJoin(F.broadcast(hs))
        .withColumn("bkt", _cms_bkt(F.col("user_id")))
        .join(F.broadcast(cells), ["i", "bkt"])
        .groupBy("user_id")
        .agg(F.min("bc").alias("cms_est"))
    )
    return (
        counts.join(est, "user_id")
        .select(
            "user_id",
            F.col("c").cast("bigint").alias("exact_count"),
            F.col("cms_est").cast("bigint").alias("cms_est"),
            (F.col("cms_est") - F.col("c")).cast("bigint").alias("overestimate"),
        )
        .orderBy(F.desc("exact_count"), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Exact interpolated percentiles (PERCENTILE_CONT semantics) per
# order priority — the continuous twin of percentiles_order_price
# (percentile_disc). Neither engine's built-in is trusted for the
# interpolation's last bits; both sides select the two bracketing
# ranked values and evaluate the IDENTICAL v0 + frac·(v1−v0)
# expression (q ∈ {0.25, 0.5, 0.75} are binary-exact, so frac is
# deterministic). Rank selection is a per-group window — partitioned
# by the group key, never global.
@query(
    "percentile_cont_order_price",
    oracle="""
    WITH ranked AS (
        SELECT o_orderpriority AS prio, o_totalprice AS v,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice, o_orderkey) - 1 AS r,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        FROM orders
    ),
    qs AS (
        SELECT prio, q, n,
               CAST(FLOOR((n - 1) * q) AS BIGINT) AS r0,
               (n - 1) * q - FLOOR((n - 1) * q) AS frac
        FROM (SELECT DISTINCT prio, n FROM ranked),
             (VALUES (0.25), (0.5), (0.75)) AS t(q)
    )
    SELECT qs.prio AS prio, qs.q AS q,
           v0.v + qs.frac * (v1.v - v0.v) AS pct_cont
    FROM qs
    JOIN ranked v0 ON v0.prio = qs.prio AND v0.r = qs.r0
    JOIN ranked v1 ON v1.prio = qs.prio
                  AND v1.r = LEAST(qs.r0 + 1, qs.n - 1)
    ORDER BY qs.prio, qs.q
    """,
)
def percentile_cont_order_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    ranked = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_totalprice").alias("v"),
        (F.row_number().over(w) - 1).alias("r"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .alias("n"),
    )
    qdf = orders.sparkSession.createDataFrame(
        [(0.25,), (0.5,), (0.75,)], ["q"]
    )
    groups = ranked.select("prio", "n").distinct().crossJoin(F.broadcast(qdf))
    nq = (F.col("n") - 1) * F.col("q")
    qs = groups.select(
        "prio",
        "q",
        "n",
        F.floor(nq).cast("bigint").alias("r0"),
        (nq - F.floor(nq)).alias("frac"),
    )
    v0 = ranked.select(
        F.col("prio").alias("p0"), F.col("r").alias("r_0"), F.col("v").alias("v0")
    )
    v1 = ranked.select(
        F.col("prio").alias("p1"), F.col("r").alias("r_1"), F.col("v").alias("v1")
    )
    return (
        qs.join(v0, (F.col("prio") == F.col("p0")) & (F.col("r0") == F.col("r_0")))
        .join(
            v1,
            (F.col("prio") == F.col("p1"))
            & (F.least(F.col("r0") + 1, F.col("n") - 1) == F.col("r_1")),
        )
        .select(
            "prio",
            "q",
            (F.col("v0") + F.col("frac") * (F.col("v1") - F.col("v0"))).alias(
                "pct_cont"
            ),
        )
        .orderBy("prio", "q")
    )


# ---------------------------------------------------------------------------
# Deterministic per-group mode: most frequent value per event type,
# ties broken by the smaller value — one count agg + one argmax
# window on the (type, value) domain.
@query(
    "mode_event_values",
    oracle="""
    WITH c AS (
        SELECT event_type, value, COUNT(*) AS cnt
        FROM events GROUP BY event_type, value
    ),
    ranked AS (
        SELECT event_type, value, cnt,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY cnt DESC, value) AS rn
        FROM c
    )
    SELECT event_type, value AS mode_value, CAST(cnt AS BIGINT) AS n_occurrences
    FROM ranked WHERE rn = 1
    ORDER BY event_type
    """,
)
def mode_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), F.asc("value"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("value").alias("mode_value"),
            F.col("cnt").cast("bigint").alias("n_occurrences"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# NULL-comparison semantics surface — the operator family behind the
# reference's change detection (SURVEY §2 F4: `!=` with a null-guard,
# notebooks/pipeline_core.py:167-183, and §7's decision to define
# change as NOT null-safe-equal). Two null-bearing projections of
# the same table are compared under (a) plain !=, (b) IS DISTINCT
# FROM (Spark's <=> negated), (c) the reference's null-guarded !=,
# counting TRUE rows of each — demonstrating exactly which NULL↔value
# transitions every predicate catches.
@query(
    "null_semantics_customers",
    oracle="""
    WITH a AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_mktsegment END AS v
        FROM customer
    ),
    b AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 3 = 0 THEN NULL
                    WHEN c_custkey % 7 = 0 THEN lower(c_mktsegment)
                    ELSE c_mktsegment END AS v
        FROM customer
    ),
    j AS (
        SELECT a.v AS va, b.v AS vb FROM a JOIN b USING (c_custkey)
    )
    SELECT
        CAST(COUNT(*) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN va <> vb THEN 1 ELSE 0 END) AS BIGINT)
            AS neq_true,
        CAST(SUM(CASE WHEN va IS DISTINCT FROM vb THEN 1 ELSE 0 END) AS BIGINT)
            AS distinct_from_true,
        CAST(SUM(CASE WHEN (va <> vb) AND (va IS NOT NULL OR vb IS NOT NULL)
                 THEN 1 ELSE 0 END) AS BIGINT) AS reference_guard_true,
        CAST(SUM(CASE WHEN va IS NULL AND vb IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS both_null
    FROM j
    """,
)
def null_semantics_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    a = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("c_mktsegment"))
        .alias("va"),
    )
    b = cust.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 3 == 0, F.lit(None))
        .when(F.col("c_custkey") % 7 == 0, F.lower("c_mktsegment"))
        .otherwise(F.col("c_mktsegment"))
        .alias("vb"),
    )
    j = a.join(b, "c_custkey")
    va, vb = F.col("va"), F.col("vb")
    as_long = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        as_long(va != vb).alias("neq_true"),
        as_long(~va.eqNullSafe(vb)).alias("distinct_from_true"),
        as_long((va != vb) & (va.isNotNull() | vb.isNotNull())).alias(
            "reference_guard_true"
        ),
        as_long(va.isNull() & vb.isNull()).alias("both_null"),
    )


# ---------------------------------------------------------------------------
# Calendar-function surface: quarter/week truncation, month-end
# arithmetic — the date-dimension toolkit over orders, aggregated per
# quarter. Exact: counts, integer day sums (avg = bigint sum / count
# in one double division), dates emitted as formatted strings (repo
# convention — raw DATE fetches as datetime64 from the oracle).
@query(
    "date_functions_orders",
    oracle="""
    WITH d AS (
        SELECT strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d')
                   AS quarter,
               strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS wk,
               date_diff('day', CAST(o_orderdate AS DATE),
                         last_day(CAST(o_orderdate AS DATE)))
                   AS days_to_month_end
        FROM orders
    )
    SELECT quarter,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(wk) AS first_week,
           MAX(wk) AS last_week,
           CAST(SUM(days_to_month_end) AS DOUBLE) / COUNT(*)
               AS avg_days_to_month_end
    FROM d
    GROUP BY quarter
    ORDER BY quarter
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    d = orders.select(
        F.date_format(F.date_trunc("quarter", "o_orderdate"), "yyyy-MM-dd")
        .alias("quarter"),
        F.date_format(F.date_trunc("week", "o_orderdate"), "yyyy-MM-dd")
        .alias("wk"),
        F.datediff(
            F.last_day(F.col("o_orderdate").cast("date")),
            F.col("o_orderdate").cast("date"),
        ).alias("days_to_month_end"),
    )
    return (
        d.groupBy("quarter")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("wk").alias("first_week"),
            F.max("wk").alias("last_week"),
            (
                F.sum("days_to_month_end").cast("double")
                / F.count(F.lit(1))
            ).alias("avg_days_to_month_end"),
        )
        .orderBy("quarter")
    )
