"""Third exact-stats wave (r8): log-rank test, Jarque–Bera,
Durbin–Watson, Ljung–Box, Cochran's Q, Friedman test, and a
Brier-score probability backtest (SURVEY §7 extension scope — the
reference has no stats surface; reference parity is the data
contract only, e.g. ``notebooks/pipeline_core.py`` table shapes).

Determinism (repo conventions, plans/__init__.py): every statistic
reduces to EXACT sums first — BIGINT for counts/ranks, DECIMAL for
value series — then combines them with a mirrored double-arithmetic
expression that both engines evaluate identically:
- log-rank hazard increments are nano-rounded BIGINTs before the
  (order-free) sum, the nelson_aalen discipline;
- Jarque–Bera uses the integer power-sum trick (w = round(100·value)
  is integral for the 2-decimal synthetic values) and m2·sqrt(m2)
  instead of pow(m2, 1.5) — sqrt is IEEE-correctly-rounded, pow is
  not;
- Durbin–Watson's numerator Σ(x_t−x_{t−1})² needs no mean at all
  (the mean cancels in differences) so it is a pure BIGINT sum;
- Ljung–Box works on centered-scaled integers c_t = n·x_t − Σx
  (always integral) and its 6-lag cumulative Q uses an ORDERED
  window sum so both engines add bit-identical terms in the same
  order;
- Cochran's Q and Friedman are pure integer-count / doubled-rank
  formulas (2·avg_rank = 2·RANK + ties − 1 is integral);
- the Brier backtest nano-rounds each user's exact-rational term
  n1(b−a)² + n0·a² over b² before the global BIGINT sum.

100 TB shapes: every query is one or two partial-combined groupBys
over the fact table followed by windows on BOUNDED aggregated
domains (event times, hours, days×types, users-with-both-halves) —
no raw-relation window, no driver loop, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


def _hour_idx() -> F.Column:
    return F.floor(F.unix_timestamp("ts") / F.lit(3600)).cast("bigint")


_SQL_HOUR = "CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 3600) AS BIGINT)"
_SQL_DAY = "CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)"


# ---------------------------------------------------------------------------
# Log-rank test (Mantel 1966, public) between two survival groups on
# the SAME inter-event/censoring construction as km_survival_events /
# nelson_aalen_events: observations are per-user inter-event gaps in
# hours (censored at the global max ts), group = user_id parity. At
# each event time: O = Σ d1, E = Σ d·n1/n, V = Σ d·(n1/n)(1−n1/n)
# ·(n−d)/(n−1); χ² = (O−E)²/V. The per-time E/V increments are
# nano-rounded BIGINTs (order-free sum); d, n, n1 are exact integers
# from one pivoted cumulative window over the bounded event-time
# domain.
@query(
    "logrank_test_events",
    oracle="""
    WITH m AS (SELECT max(ts) AS gmax FROM events),
    seq AS (
        SELECT user_id, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS nxt
        FROM events
    ),
    obs AS (
        SELECT CASE WHEN nxt IS NOT NULL
                    THEN (epoch_us(nxt) - epoch_us(ts)) // 3600000000
                    ELSE (epoch_us(gmax) - epoch_us(ts)) // 3600000000
               END AS t,
               nxt IS NOT NULL AS is_event,
               CAST(user_id % 2 AS BIGINT) AS g
        FROM seq CROSS JOIN m
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1_all
        FROM obs
    ),
    per AS (
        SELECT t,
               CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT)
                   AS d,
               CAST(SUM(CASE WHEN is_event AND g = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS d1,
               CAST(COUNT(*) AS BIGINT) AS leave_all,
               CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS leave1
        FROM obs GROUP BY t
    ),
    risk AS (
        SELECT t, d, d1,
               tot.n_all - (SUM(leave_all) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) - leave_all) AS n,
               tot.n1_all - (SUM(leave1) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) - leave1) AS n1
        FROM per CROSS JOIN tot
    ),
    inc AS (
        SELECT d, d1,
               CAST(ROUND(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
                          / CAST(n AS DOUBLE) * 1000000000.0)
                    AS BIGINT) AS e_nano,
               CASE WHEN n > 1 THEN
                   CAST(ROUND(CAST(d AS DOUBLE)
                              * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                              * (1.0 - CAST(n1 AS DOUBLE)
                                       / CAST(n AS DOUBLE))
                              * (CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
                              / (CAST(n AS DOUBLE) - 1.0)
                              * 1000000000.0) AS BIGINT)
               ELSE 0 END AS v_nano
        FROM risk WHERE d > 0
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
               CAST(SUM(d1) AS BIGINT) AS o1,
               CAST(SUM(e_nano) AS BIGINT) AS e_sum,
               CAST(SUM(v_nano) AS BIGINT) AS v_sum
        FROM inc
    )
    SELECT n_times, o1,
           CAST(e_sum AS DOUBLE) / 1000000000.0 AS e1,
           CAST(v_sum AS DOUBLE) / 1000000000.0 AS var_lr,
           (CAST(o1 AS DOUBLE) - CAST(e_sum AS DOUBLE) / 1000000000.0)
             * (CAST(o1 AS DOUBLE) - CAST(e_sum AS DOUBLE) / 1000000000.0)
             / (CAST(v_sum AS DOUBLE) / 1000000000.0) AS chi2
    FROM s
    """,
)
def logrank_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    gmax = ev.agg(F.max("ts").alias("gmax"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "ts", F.lead("ts").over(w).alias("nxt")
    ).crossJoin(F.broadcast(gmax))
    us = lambda c: F.unix_micros(F.col(c))  # noqa: E731
    obs = seq.select(
        F.when(
            F.col("nxt").isNotNull(),
            ((us("nxt") - us("ts")) / 3600000000).cast("bigint"),
        )
        .otherwise(((us("gmax") - us("ts")) / 3600000000).cast("bigint"))
        .alias("t"),
        F.col("nxt").isNotNull().alias("is_event"),
        (F.col("user_id") % 2).cast("bigint").alias("g"),
    )
    tot = obs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1_all"),
    )
    per = obs.groupBy("t").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
        F.sum(F.when(F.col("is_event") & (F.col("g") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("d1"),
        F.count(F.lit(1)).cast("bigint").alias("leave_all"),
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("leave1"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per.crossJoin(F.broadcast(tot)).select(
        "t",
        "d",
        "d1",
        (
            F.col("n_all")
            - (F.sum("leave_all").over(wcum) - F.col("leave_all"))
        ).alias("n"),
        (
            F.col("n1_all") - (F.sum("leave1").over(wcum) - F.col("leave1"))
        ).alias("n1"),
    )
    dd = F.col("d").cast("double")
    nn = F.col("n").cast("double")
    n1 = F.col("n1").cast("double")
    inc = risk.filter(F.col("d") > 0).select(
        "d1",
        F.round(dd * n1 / nn * 1000000000.0).cast("bigint").alias("e_nano"),
        F.when(
            F.col("n") > 1,
            F.round(
                dd
                * (n1 / nn)
                * (F.lit(1.0) - n1 / nn)
                * (nn - dd)
                / (nn - F.lit(1.0))
                * 1000000000.0
            ).cast("bigint"),
        )
        .otherwise(F.lit(0))
        .alias("v_nano"),
    )
    s = inc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_times"),
        F.sum("d1").cast("bigint").alias("o1"),
        F.sum("e_nano").cast("bigint").alias("e_sum"),
        F.sum("v_nano").cast("bigint").alias("v_sum"),
    )
    o1d = F.col("o1").cast("double")
    e1 = F.col("e_sum").cast("double") / 1000000000.0
    vv = F.col("v_sum").cast("double") / 1000000000.0
    return s.select(
        "n_times",
        "o1",
        e1.alias("e1"),
        vv.alias("var_lr"),
        ((o1d - e1) * (o1d - e1) / vv).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# Jarque–Bera normality test (Jarque & Bera 1980, public) on event
# values: JB = n/6·(S² + K²/4) from skewness S and excess kurtosis K.
# w = round(100·value) is integral for the 2-decimal synthetic
# values, so the four power sums are exact BIGINT/DECIMAL
# (statops.py moments discipline); the central moments and JB are one
# mirrored double expression — m2^1.5 is written m2·sqrt(m2) because
# sqrt is correctly rounded and pow is not.
@query(
    "jarque_bera_events",
    oracle="""
    WITH s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(round(value * 100) AS DECIMAL(38,0))) AS s1,
               SUM(CAST(round(value * 100) * round(value * 100)
                        AS DECIMAL(38,0))) AS s2,
               SUM(CAST(round(value * 100) * round(value * 100)
                        * round(value * 100) AS DECIMAL(38,0))) AS s3,
               SUM(CAST(round(value * 100) * round(value * 100)
                        AS DECIMAL(38,0))
                   * CAST(round(value * 100) * round(value * 100)
                        AS DECIMAL(38,0))) AS s4
        FROM events
    ),
    m AS (
        SELECT n,
               CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
               CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
               CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
               CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
        FROM s
    ),
    c AS (
        SELECT n, m1,
               r2 - m1 * m1 AS m2,
               r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
               r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2
                  - 3.0 * m1 * m1 * m1 * m1 AS m4
        FROM m
    ),
    k AS (
        SELECT n,
               m3 / (m2 * sqrt(m2)) AS skewness,
               m4 / (m2 * m2) - 3.0 AS ex_kurtosis
        FROM c
    )
    SELECT n, skewness, ex_kurtosis,
           CAST(n AS DOUBLE) / 6.0
             * (skewness * skewness
                + ex_kurtosis * ex_kurtosis / 4.0) AS jb_stat
    FROM k
    """,
)
def jarque_bera_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = F.round(F.col("value") * 100)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = ev.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec(w)).alias("s1"),
        F.sum(dec(w * w)).alias("s2"),
        F.sum(dec(w * w * w)).alias("s3"),
        F.sum(dec(w * w) * dec(w * w)).alias("s4"),
    )
    nd = F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / nd
    r2 = F.col("s2").cast("double") / nd
    r3 = F.col("s3").cast("double") / nd
    r4 = F.col("s4").cast("double") / nd
    c = s.select(
        "n",
        m1.alias("m1"),
        (r2 - m1 * m1).alias("m2"),
        (r3 - F.lit(3.0) * m1 * r2 + F.lit(2.0) * m1 * m1 * m1).alias("m3"),
        (
            r4
            - F.lit(4.0) * m1 * r3
            + F.lit(6.0) * m1 * m1 * r2
            - F.lit(3.0) * m1 * m1 * m1 * m1
        ).alias("m4"),
    )
    k = c.select(
        "n",
        (F.col("m3") / (F.col("m2") * F.sqrt(F.col("m2")))).alias(
            "skewness"
        ),
        (F.col("m4") / (F.col("m2") * F.col("m2")) - F.lit(3.0)).alias(
            "ex_kurtosis"
        ),
    )
    sk = F.col("skewness")
    ku = F.col("ex_kurtosis")
    return k.select(
        "n",
        "skewness",
        "ex_kurtosis",
        (
            F.col("n").cast("double")
            / F.lit(6.0)
            * (sk * sk + ku * ku / F.lit(4.0))
        ).alias("jb_stat"),
    )


# ---------------------------------------------------------------------------
# Durbin–Watson autocorrelation test (Durbin & Watson 1950, public)
# on the demeaned hourly click-count series: DW = Σ(e_t−e_{t−1})² /
# Σe_t². The mean CANCELS in the numerator differences, so the
# numerator is a pure BIGINT sum of squared integer lags; the
# denominator is the textbook n·Σx²−(Σx)² identity over n — both
# exact, combined in one double division. The lag window runs on the
# AGGREGATED hourly domain.
@query(
    "durbin_watson_events",
    oracle=f"""
    WITH hourly AS (
        SELECT {_SQL_HOUR} AS h,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events WHERE event_type = 'click'
        GROUP BY 1
    ),
    lagged AS (
        SELECT x, lag(x) OVER (ORDER BY h) AS xp FROM hourly
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
               SUM(CASE WHEN xp IS NULL THEN CAST(0 AS DECIMAL(38,0))
                        ELSE CAST((x - xp) AS DECIMAL(38,0)) * (x - xp)
                   END) AS sdd
        FROM lagged
    )
    SELECT n, sx,
           CAST(sdd AS DOUBLE) AS sum_sq_diff,
           CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS dw
    FROM s
    """,
)
def durbin_watson_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    hourly = ev.groupBy(_hour_idx().alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    wl = Window.orderBy("h")
    lagged = hourly.select("x", F.lag("x").over(wl).alias("xp"))
    d = F.col("x") - F.col("xp")
    s = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(
            F.when(F.col("xp").isNull(), F.lit(0).cast("decimal(38,0)"))
            .otherwise(d.cast("decimal(38,0)") * d)
        ).alias("sdd"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "n",
        "sx",
        F.col("sdd").cast("double").alias("sum_sq_diff"),
        (
            nd
            * F.col("sdd").cast("double")
            / (
                nd * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx").cast("double")
            )
        ).alias("dw"),
    )


# ---------------------------------------------------------------------------
# Ljung–Box portmanteau test (Ljung & Box 1978, public) at lags 1–6
# on the hourly event-count series. Centered-scaled integers
# c_t = n·x_t − Σx are always integral, so every autocovariance
# γ_k = Σ c_t·c_{t+k} is an exact DECIMAL sum and ρ_k = γ_k/γ_0 is a
# mirrored double. Q_m = n(n+2)·Σ_{k≤m} ρ_k²/(n−k) accumulates over
# an ORDERED window (both engines add bit-identical terms in lag
# order). Output: one row per lag with ρ_k and the running Q.
@query(
    "ljung_box_events",
    oracle=f"""
    WITH hourly AS (
        SELECT {_SQL_HOUR} AS h, CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    idx AS (
        SELECT ROW_NUMBER() OVER (ORDER BY h) AS t, x FROM hourly
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx
        FROM idx
    ),
    c AS (
        SELECT t, tot.n * x - tot.sx AS c FROM idx CROSS JOIN tot
    ),
    g0 AS (
        SELECT SUM(CAST(c AS DECIMAL(38,0)) * c) AS g FROM c
    ),
    lags AS (
        SELECT k.k,
               SUM(CAST(a.c AS DECIMAL(38,0)) * b.c) AS gk
        FROM (SELECT UNNEST(range(1, 7)) AS k) k
        JOIN c a ON TRUE
        JOIN c b ON b.t = a.t + k.k
        GROUP BY k.k
    ),
    rho AS (
        SELECT k,
               CAST(gk AS DOUBLE) / CAST(g0.g AS DOUBLE) AS rho_k,
               tot.n AS n
        FROM lags CROSS JOIN g0 CROSS JOIN tot
    )
    SELECT CAST(k AS BIGINT) AS lag_k, rho_k,
           CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)
             * SUM(rho_k * rho_k / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
               OVER (ORDER BY k ROWS UNBOUNDED PRECEDING) AS q_stat
    FROM rho
    ORDER BY lag_k
    """,
)
def ljung_box_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(_hour_idx().alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    idx = hourly.select(
        F.row_number().over(Window.orderBy("h")).alias("t"), "x"
    )
    tot = idx.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
    )
    c = idx.crossJoin(F.broadcast(tot)).select(
        "t", (F.col("n") * F.col("x") - F.col("sx")).alias("c"), "n"
    )
    g0 = c.agg(
        F.sum(F.col("c").cast("decimal(38,0)") * F.col("c")).alias("g")
    )
    ks = c.sparkSession.range(1, 7).select(F.col("id").alias("k"))
    a = c.alias("a")
    b = c.select(F.col("t").alias("bt"), F.col("c").alias("bc")).alias("b")
    lags = (
        F.broadcast(ks)
        .join(a, how="cross")
        .join(b, F.col("bt") == F.col("a.t") + F.col("k"))
        .groupBy("k")
        .agg(
            F.sum(F.col("a.c").cast("decimal(38,0)") * F.col("bc")).alias(
                "gk"
            )
        )
    )
    rho = (
        lags.crossJoin(F.broadcast(g0))
        .crossJoin(F.broadcast(tot.select("n")))
        .select(
            "k",
            (F.col("gk").cast("double") / F.col("g").cast("double")).alias(
                "rho_k"
            ),
            "n",
        )
    )
    nd = F.col("n").cast("double")
    kd = F.col("k").cast("double")
    wq = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    return (
        rho.select(
            F.col("k").cast("bigint").alias("lag_k"),
            "rho_k",
            (
                nd
                * (nd + F.lit(2.0))
                * F.sum(
                    F.col("rho_k") * F.col("rho_k") / (nd - kd)
                ).over(wq)
            ).alias("q_stat"),
        )
        .orderBy("lag_k")
    )


# ---------------------------------------------------------------------------
# Cochran's Q test (Cochran 1950, public) — do the k event types
# differ in per-user reach on the FIRST calendar day? Binary matrix
# x_ij = 1 iff user i did type j on day 0 (over the full range every
# user hits every type — k·N−ΣR² degenerates to 0 — so the test runs
# on the narrow window where reach actually varies);
# Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²) with column totals C_j,
# row totals R_i, N = ΣR. Pure integer aggregates over the distinct
# (user, type) relation — two partial-combined groupBys and one
# double division.
@query(
    "cochran_q_events",
    oracle="""
    WITH d0 AS (SELECT min(CAST(ts AS DATE)) AS d FROM events),
    ut AS (
        SELECT DISTINCT user_id, event_type
        FROM events CROSS JOIN d0 WHERE CAST(ts AS DATE) = d0.d
    ),
    k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM ut),
    rows_ AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS r FROM ut GROUP BY user_id
    ),
    cols AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS c FROM ut GROUP BY event_type
    ),
    s AS (
        SELECT (SELECT k FROM k) AS k,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_) AS n_users,
               (SELECT CAST(SUM(r) AS BIGINT) FROM rows_) AS big_n,
               (SELECT CAST(SUM(r * r) AS BIGINT) FROM rows_) AS sum_r2,
               (SELECT CAST(SUM(c * c) AS BIGINT) FROM cols) AS sum_c2
    )
    SELECT k, n_users, big_n,
           CAST((k - 1) * (k * sum_c2 - big_n * big_n) AS DOUBLE)
             / CAST(k * big_n - sum_r2 AS DOUBLE) AS q_stat
    FROM s
    """,
)
def cochran_q_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d0 = ev.agg(F.min(F.col("ts").cast("date")).alias("d"))
    ut = (
        ev.crossJoin(F.broadcast(d0))
        .filter(F.col("ts").cast("date") == F.col("d"))
        .select("user_id", "event_type")
        .distinct()
    )
    k = ut.agg(
        F.countDistinct("event_type").cast("bigint").alias("k")
    )
    rows_ = ut.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("r")
    )
    cols = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    ragg = rows_.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("r").cast("bigint").alias("big_n"),
        F.sum(F.col("r") * F.col("r")).cast("bigint").alias("sum_r2"),
    )
    cagg = cols.agg(
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("sum_c2")
    )
    s = (
        F.broadcast(k)
        .crossJoin(F.broadcast(ragg))
        .crossJoin(F.broadcast(cagg))
    )
    return s.select(
        "k",
        "n_users",
        "big_n",
        (
            (
                (F.col("k") - 1)
                * (
                    F.col("k") * F.col("sum_c2")
                    - F.col("big_n") * F.col("big_n")
                )
            ).cast("double")
            / (F.col("k") * F.col("big_n") - F.col("sum_r2")).cast("double")
        ).alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# Friedman rank test (Friedman 1937, public) — blocks = days,
# treatments = event types, response = daily count. Only COMPLETE
# blocks (days where every type occurs) enter; within-day average
# ranks stay INTEGRAL by doubling (2·avg_rank = 2·RANK + ties − 1,
# the spearman_hourly discipline). With doubled rank sums R2_j the
# uncorrected statistic is χ² = 3/(n·k·(k+1))·ΣR2_j² − 3·n·(k+1)
# (the 12/(…)·Σ(R2/2)² identity). One row per treatment with its
# doubled rank sum plus the shared χ².
@query(
    "friedman_test_events",
    oracle=f"""
    WITH daily AS (
        SELECT {_SQL_DAY} AS d, event_type,
               CAST(COUNT(*) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k
          FROM daily),
    full_days AS (
        SELECT d FROM daily GROUP BY d
        HAVING COUNT(*) = (SELECT k FROM k)
    ),
    ranked AS (
        SELECT daily.event_type,
               2 * RANK() OVER (PARTITION BY daily.d ORDER BY daily.x)
                 + COUNT(*) OVER (PARTITION BY daily.d, daily.x) - 1
                 AS r2
        FROM daily JOIN full_days USING (d)
    ),
    sums AS (
        SELECT event_type, CAST(SUM(r2) AS BIGINT) AS rank_sum2
        FROM ranked GROUP BY event_type
    ),
    nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM full_days),
    chi AS (
        SELECT 3.0 / (CAST(nb.n AS DOUBLE) * CAST(k.k AS DOUBLE)
                      * (CAST(k.k AS DOUBLE) + 1.0))
                 * (SELECT SUM(CAST(rank_sum2 AS DOUBLE)
                               * CAST(rank_sum2 AS DOUBLE)) FROM sums)
               - 3.0 * CAST(nb.n AS DOUBLE) * (CAST(k.k AS DOUBLE) + 1.0)
                 AS chi2,
               nb.n AS n_blocks
        FROM nb CROSS JOIN k
    )
    SELECT s.event_type, s.rank_sum2, c.n_blocks, c.chi2
    FROM sums s CROSS JOIN chi c
    ORDER BY s.event_type
    """,
)
def friedman_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("bigint")
    daily = ev.groupBy(day.alias("d"), "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    k = daily.agg(
        F.countDistinct("event_type").cast("bigint").alias("k")
    )
    full_days = (
        daily.groupBy("d")
        .agg(F.count(F.lit(1)).alias("ct"))
        .crossJoin(F.broadcast(k))
        .filter(F.col("ct") == F.col("k"))
        .select("d")
    )
    wd = Window.partitionBy("d").orderBy("x")
    wt = Window.partitionBy("d", "x")
    ranked = daily.join(full_days, "d").select(
        "event_type",
        (
            2 * F.rank().over(wd) + F.count(F.lit(1)).over(wt) - 1
        ).alias("r2"),
    )
    sums = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("rank_sum2")
    )
    nb = full_days.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    sr2 = sums.agg(
        F.sum(
            F.col("rank_sum2").cast("double")
            * F.col("rank_sum2").cast("double")
        ).alias("ss")
    )
    ndd = F.col("n").cast("double")
    kdd = F.col("k").cast("double")
    chi = (
        F.broadcast(nb)
        .crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(sr2))
        .select(
            (
                F.lit(3.0) / (ndd * kdd * (kdd + F.lit(1.0))) * F.col("ss")
                - F.lit(3.0) * ndd * (kdd + F.lit(1.0))
            ).alias("chi2"),
            F.col("n").alias("n_blocks"),
        )
    )
    return (
        sums.crossJoin(F.broadcast(chi))
        .select("event_type", "rank_sum2", "n_blocks", "chi2")
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Brier-score probability backtest (Brier 1950, public): per user,
# the first half of the time range trains p̂ = purchases/total; the
# second half scores mean (p̂ − 1[purchase])². Each user's
# contribution n1·(b−a)² + n0·a² over b² is an exact rational,
# nano-rounded to BIGINT before the (order-free) global sum. Also
# reports calibration-in-the-large: test-weighted mean p̂ vs the
# observed test purchase rate. Split point = integer-microsecond
# midpoint of the global ts range.
@query(
    "brier_score_events",
    oracle="""
    WITH rng AS (
        SELECT epoch_us(min(ts)) AS lo,
               epoch_us(min(ts))
                 + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS mid
        FROM events
    ),
    train AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS a,
               CAST(COUNT(*) AS BIGINT) AS b
        FROM events CROSS JOIN rng
        WHERE epoch_us(ts) < mid GROUP BY user_id
    ),
    test AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n1,
               CAST(COUNT(*) AS BIGINT) AS nt
        FROM events CROSS JOIN rng
        WHERE epoch_us(ts) >= mid GROUP BY user_id
    ),
    per AS (
        SELECT CAST(ROUND(
                   (CAST(n1 AS DOUBLE)
                      * CAST((b - a) AS DOUBLE) * CAST((b - a) AS DOUBLE)
                    + CAST((nt - n1) AS DOUBLE)
                      * CAST(a AS DOUBLE) * CAST(a AS DOUBLE))
                   / (CAST(b AS DOUBLE) * CAST(b AS DOUBLE))
                   * 1000000000.0) AS BIGINT) AS term_nano,
               CAST(ROUND(CAST(nt AS DOUBLE) * CAST(a AS DOUBLE)
                          / CAST(b AS DOUBLE) * 1000000000.0)
                    AS BIGINT) AS phat_nano,
               n1, nt
        FROM train JOIN test USING (user_id)
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(nt) AS BIGINT) AS n_test,
               CAST(SUM(n1) AS BIGINT) AS n_pos,
               CAST(SUM(term_nano) AS BIGINT) AS t_sum,
               CAST(SUM(phat_nano) AS BIGINT) AS p_sum
        FROM per
    )
    SELECT n_users, n_test,
           CAST(t_sum AS DOUBLE) / 1000000000.0 / CAST(n_test AS DOUBLE)
               AS brier,
           CAST(p_sum AS DOUBLE) / 1000000000.0 / CAST(n_test AS DOUBLE)
               AS mean_pred,
           CAST(n_pos AS DOUBLE) / CAST(n_test AS DOUBLE) AS obs_rate
    FROM s
    """,
)
def brier_score_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    rng = ev.agg(
        (
            F.unix_micros(F.min("ts"))
            + F.floor(
                (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                / 2
            ).cast("bigint")
        ).alias("mid")
    )
    base = ev.crossJoin(F.broadcast(rng)).select(
        "user_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
        (F.unix_micros(F.col("ts")) < F.col("mid")).alias("in_train"),
    )
    train = (
        base.filter("in_train")
        .groupBy("user_id")
        .agg(
            F.sum("is_p").cast("bigint").alias("a"),
            F.count(F.lit(1)).cast("bigint").alias("b"),
        )
    )
    test = (
        base.filter(~F.col("in_train"))
        .groupBy("user_id")
        .agg(
            F.sum("is_p").cast("bigint").alias("n1"),
            F.count(F.lit(1)).cast("bigint").alias("nt"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    ba = (F.col("b") - F.col("a")).cast("double")
    per = train.join(test, "user_id").select(
        F.round(
            (d("n1") * ba * ba + (F.col("nt") - F.col("n1")).cast("double")
             * d("a") * d("a"))
            / (d("b") * d("b"))
            * 1000000000.0
        )
        .cast("bigint")
        .alias("term_nano"),
        F.round(d("nt") * d("a") / d("b") * 1000000000.0)
        .cast("bigint")
        .alias("phat_nano"),
        "n1",
        "nt",
    )
    s = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("nt").cast("bigint").alias("n_test"),
        F.sum("n1").cast("bigint").alias("n_pos"),
        F.sum("term_nano").cast("bigint").alias("t_sum"),
        F.sum("phat_nano").cast("bigint").alias("p_sum"),
    )
    ntd = F.col("n_test").cast("double")
    return s.select(
        "n_users",
        "n_test",
        (F.col("t_sum").cast("double") / 1000000000.0 / ntd).alias("brier"),
        (F.col("p_sum").cast("double") / 1000000000.0 / ntd).alias(
            "mean_pred"
        ),
        (F.col("n_pos").cast("double") / ntd).alias("obs_rate"),
    )
