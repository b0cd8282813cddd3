"""Exact-ML wave (r8): betweenness centrality with exact shortest-
path counting (Freeman 1977; Brandes 2001 defines the σ algebra),
1-D k-means with unrolled integer-fixed-point Lloyd iterations
(Lloyd 1957/1982), and closed-form two-feature ridge regression
(Hoerl & Kennard 1970) via Cramer's rule on the normal equations.
SURVEY §7 extension scope.

Exactness:
- Betweenness runs on the bounded event-type transition graph:
  walk-count matrices A¹..A⁴ by repeated join (BIGINT counts),
  dist(s,t) = min k with Aᵏ[s,t] > 0, σ_st = A^dist[s,t] (minimal-
  length walks are exactly the shortest paths), and each pair-
  dependency σ_sv·σ_vt/σ_st (when dists add) is nano-rounded before
  the per-v BIGINT sum.
- k-means works on v = round(100·acctbal) − min (shifted NON-NEGATIVE
  so DuckDB's floor `//` and Spark's truncating `div` agree);
  centroids live at 1e6 fixed point, updates are
  (Σv·10⁶) // count — pure integer, three unrolled rounds, ties to
  the lower centroid id, empty clusters keep their centroid.
- Ridge solves (XᵀX + λI_{penalized})β = Xᵀy by literal cofactor
  expansion over exact BIGINT/DECIMAL sums (y enters as v100);
  the intercept is unpenalized; x₂ is a calendar-free week-phase
  bit (day_idx % 7 < 2) so both engines derive identical features.

100 TB shapes: betweenness's joins live on the node-domain
(event types — bounded metadata), never the event relation; k-means
assignment is a 4-row broadcast cross join + per-row argmin (the
at-scale shape of Lloyd on any corpus); ridge is one partial-
combined aggregate producing nine scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query

_NANO = 1000000000.0


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
_BET_ORACLE = """
    WITH seq AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    ed AS (
        SELECT DISTINCT prev_type AS s, event_type AS t
        FROM seq WHERE prev_type IS NOT NULL AND prev_type <> event_type
    ),
    nodes AS (SELECT s AS node FROM ed UNION SELECT t FROM ed),
    w1 AS (SELECT s, t, CAST(1 AS BIGINT) AS c FROM ed),
    w2 AS (SELECT a.s, b.t, CAST(SUM(a.c * b.c) AS BIGINT) AS c
           FROM w1 a JOIN w1 b ON a.t = b.s GROUP BY a.s, b.t),
    w3 AS (SELECT a.s, b.t, CAST(SUM(a.c * b.c) AS BIGINT) AS c
           FROM w2 a JOIN w1 b ON a.t = b.s GROUP BY a.s, b.t),
    w4 AS (SELECT a.s, b.t, CAST(SUM(a.c * b.c) AS BIGINT) AS c
           FROM w3 a JOIN w1 b ON a.t = b.s GROUP BY a.s, b.t),
    allw AS (
        SELECT 1 AS k, s, t, c FROM w1
        UNION ALL SELECT 2, s, t, c FROM w2
        UNION ALL SELECT 3, s, t, c FROM w3
        UNION ALL SELECT 4, s, t, c FROM w4
    ),
    sp AS (
        SELECT s, t, CAST(MIN(k) AS BIGINT) AS d
        FROM allw WHERE s <> t GROUP BY s, t
    ),
    sigma AS (
        SELECT sp.s, sp.t, sp.d, w.c AS sigma
        FROM sp JOIN allw w ON w.s = sp.s AND w.t = sp.t AND w.k = sp.d
    ),
    triples AS (
        SELECT sv.t AS v,
               CAST(ROUND(CAST(sv.sigma AS DOUBLE)
                          * CAST(vt.sigma AS DOUBLE)
                          / CAST(st.sigma AS DOUBLE)
                          * 1000000000.0) AS BIGINT) AS term_nano
        FROM sigma sv
        JOIN sigma vt ON vt.s = sv.t
        JOIN sigma st ON st.s = sv.s AND st.t = vt.t
        WHERE sv.s <> vt.t AND sv.d + vt.d = st.d
    ),
    bet AS (
        SELECT v, CAST(SUM(term_nano) AS BIGINT) AS b
        FROM triples GROUP BY v
    )
    SELECT n.node, CAST(COALESCE(bet.b, 0) AS BIGINT) AS bet_nano,
           CAST(COALESCE(bet.b, 0) AS DOUBLE) / 1000000000.0
               AS betweenness
    FROM nodes n LEFT JOIN bet ON bet.v = n.node
    ORDER BY n.node
"""


# Exact directed betweenness on the event-type transition graph:
# σ algebra via walk-count matrix powers (minimal-length walks ARE
# the shortest paths), pair-dependencies nano-rounded. The node
# domain is bounded (event types), so A²..A⁴ are metadata-sized
# joins; per-part/per-user graphs would use sampled Brandes instead.
@query("betweenness_event_types", oracle=_BET_ORACLE)
def betweenness_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    ed = (
        seq.filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.col("prev_type").alias("s"), F.col("event_type").alias("t")
        )
        .distinct()
    )
    nodes = (
        ed.select(F.col("s").alias("node"))
        .unionByName(ed.select(F.col("t").alias("node")))
        .distinct()
    )
    w1 = ed.select("s", "t", F.lit(1).cast("bigint").alias("c"))

    def step(wk: DataFrame) -> DataFrame:
        a = wk.select(
            F.col("s"), F.col("t").alias("mid"), F.col("c").alias("ca")
        )
        b = w1.select(
            F.col("s").alias("mid"), F.col("t"), F.col("c").alias("cb")
        )
        return (
            a.join(b, "mid")
            .groupBy("s", "t")
            .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("c"))
        )

    w2 = step(w1)
    w3 = step(w2)
    w4 = step(w3)
    allw = (
        w1.select(F.lit(1).alias("k"), "s", "t", "c")
        .unionByName(w2.select(F.lit(2).alias("k"), "s", "t", "c"))
        .unionByName(w3.select(F.lit(3).alias("k"), "s", "t", "c"))
        .unionByName(w4.select(F.lit(4).alias("k"), "s", "t", "c"))
    )
    sp = (
        allw.filter(F.col("s") != F.col("t"))
        .groupBy("s", "t")
        .agg(F.min("k").cast("bigint").alias("d"))
    )
    sigma = sp.join(
        allw.withColumnRenamed("c", "sigma"),
        (sp.s == allw.s) & (sp.t == allw.t) & (sp.d == allw.k),
    ).select(sp.s, sp.t, sp.d, "sigma")
    sv = sigma.select(
        F.col("s"), F.col("t").alias("v"),
        F.col("d").alias("d1"), F.col("sigma").alias("s1"),
    )
    vt = sigma.select(
        F.col("s").alias("v"), F.col("t"),
        F.col("d").alias("d2"), F.col("sigma").alias("s2"),
    )
    st = sigma.select(
        F.col("s"), F.col("t"),
        F.col("d").alias("d0"), F.col("sigma").alias("s0"),
    )
    triples = (
        sv.join(vt, "v")
        .join(st, ["s", "t"])
        .filter(
            (F.col("s") != F.col("t"))
            & (F.col("d1") + F.col("d2") == F.col("d0"))
        )
        .select(
            "v",
            F.round(
                F.col("s1").cast("double")
                * F.col("s2").cast("double")
                / F.col("s0").cast("double")
                * _NANO
            )
            .cast("bigint")
            .alias("term_nano"),
        )
    )
    bet = triples.groupBy("v").agg(
        F.sum("term_nano").cast("bigint").alias("b")
    )
    return (
        nodes.join(bet, nodes.node == bet.v, "left")
        .select(
            "node",
            F.coalesce(F.col("b"), F.lit(0)).cast("bigint").alias(
                "bet_nano"
            ),
            (F.coalesce(F.col("b"), F.lit(0)).cast("double") / _NANO).alias(
                "betweenness"
            ),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
def _kmeans_oracle(rounds: int = 3, k: int = 4) -> str:
    header = """
    WITH raw AS (
        SELECT c_custkey AS rid,
               CAST(ROUND(c_acctbal * 100) AS BIGINT) AS v0
        FROM customer
    ),
    shift AS (SELECT CAST(MIN(v0) AS BIGINT) AS lo,
                     CAST(MAX(v0) AS BIGINT) AS hi FROM raw),
    v AS (SELECT rid, v0 - shift.lo AS v FROM raw CROSS JOIN shift),
    c0 AS (
        SELECT i.cid,
               ((2 * i.cid + 1) * (shift.hi - shift.lo) // 8) * 1000000
                   AS c
        FROM (SELECT UNNEST(range(0, 4)) AS cid) i CROSS JOIN shift
    )"""
    iters = []
    for r in range(1, rounds + 1):
        iters.append(f""",
    a{r} AS (
        SELECT v.rid, v.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY v.rid
                   ORDER BY ABS(v.v * 1000000 - c.c), c.cid) AS rn
        FROM v CROSS JOIN c{r - 1} c
    ),
    u{r} AS (
        SELECT cid,
               CAST((SUM(v) * 1000000) // COUNT(*) AS BIGINT) AS c
        FROM a{r} WHERE rn = 1 GROUP BY cid
    ),
    c{r} AS (
        SELECT p.cid, COALESCE(u{r}.c, p.c) AS c
        FROM c{r - 1} p LEFT JOIN u{r} USING (cid)
    )""")
    footer = f"""
    SELECT f.cid AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n,
           (CAST(c.c AS DOUBLE) / 1000000.0 + CAST(shift.lo AS DOUBLE))
             / 100.0 AS centroid_balance,
           CAST(SUM(CAST(ABS(f.v * 1000000 - c.c) AS DECIMAL(38,0)))
                AS DOUBLE) / 1000000.0 / 100.0 AS sum_abs_dev
    FROM a{rounds} f
    JOIN c{rounds} c ON c.cid = f.cid
    CROSS JOIN shift
    WHERE f.rn = 1
    GROUP BY f.cid, c.c, shift.lo
    ORDER BY cluster
    """
    return header + "".join(iters) + footer


# Exact 1-D k-means (k=4, three unrolled Lloyd rounds) on customer
# account balances: integer fixed-point centroids, deterministic
# span-quantile init, ties to the lower centroid id. The oracle
# replays the identical unrolled recurrence. (The multi-dim trained
# k-means for IVF stays rows-only by design — THIS query is the
# exact-arithmetic member of the family.)
@query("kmeans_1d_acctbal", oracle=_kmeans_oracle())
def kmeans_1d_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    raw = cust.select(
        F.col("c_custkey").alias("rid"),
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("v0"),
    )
    shift = raw.agg(
        F.min("v0").cast("bigint").alias("lo"),
        F.max("v0").cast("bigint").alias("hi"),
    )
    v = raw.crossJoin(F.broadcast(shift)).select(
        "rid", (F.col("v0") - F.col("lo")).alias("v")
    )
    spark_ = cust.sparkSession
    ids = spark_.range(0, 4).select(F.col("id").cast("int").alias("cid"))
    cents = (
        F.broadcast(ids)
        .crossJoin(F.broadcast(shift))
        .select(
            "cid",
            (
                F.expr("(2 * cid + 1) * (hi - lo) div 8") * 1000000
            ).alias("c"),
        )
    )
    assigned = None
    for _ in range(3):
        scored = v.crossJoin(F.broadcast(cents))
        wr = Window.partitionBy("rid").orderBy(
            F.abs(F.col("v") * 1000000 - F.col("c")), F.col("cid")
        )
        assigned = scored.withColumn("rn", F.row_number().over(wr)).filter(
            F.col("rn") == 1
        )
        upd = assigned.groupBy("cid").agg(
            F.expr("CAST((SUM(v) * 1000000) div COUNT(*) AS BIGINT)").alias(
                "cn"
            )
        )
        cents = (
            cents.join(F.broadcast(upd), "cid", "left")
            .select("cid", F.coalesce(F.col("cn"), F.col("c")).alias("c"))
        )
    final = assigned.select("rid", "v", "cid").join(
        F.broadcast(cents), "cid"
    )
    return (
        final.crossJoin(F.broadcast(shift))
        .groupBy(F.col("cid").alias("cluster"), "c", "lo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(
                F.abs(F.col("v") * 1000000 - F.col("c")).cast(
                    "decimal(38,0)"
                )
            ).alias("sad"),
        )
        .select(
            "cluster",
            "n",
            (
                (F.col("c").cast("double") / 1000000.0
                 + F.col("lo").cast("double"))
                / 100.0
            ).alias("centroid_balance"),
            (F.col("sad").cast("double") / 1000000.0 / 100.0).alias(
                "sum_abs_dev"
            ),
        )
        .orderBy("cluster")
    )


# ---------------------------------------------------------------------------
# Two-feature ridge regression, closed form: y = event value,
# x1 = hour-of-day, x2 = week-phase bit (day_idx % 7 < 2 — calendar-
# API-free so both engines derive the identical feature). Solve
# (XᵀX + λ·diag(0,1,1))β = Xᵀy by Cramer's rule — nine exact sums,
# one mirrored double expression; the intercept is unpenalized.
@query(
    "ridge_two_feature_events",
    oracle="""
    WITH f AS (
        SELECT CAST(hour(ts) AS BIGINT) AS x1,
               CASE WHEN (CAST(FLOOR(epoch(ts)) AS BIGINT) // 86400) % 7
                         < 2 THEN 1 ELSE 0 END AS x2,
               CAST(ROUND(value * 100) AS BIGINT) AS y100
        FROM events
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x1) AS BIGINT) AS s1,
               CAST(SUM(x2) AS BIGINT) AS s2,
               CAST(SUM(x1 * x1) AS BIGINT) AS s11,
               CAST(SUM(x1 * x2) AS BIGINT) AS s12,
               CAST(SUM(x2 * x2) AS BIGINT) AS s22,
               SUM(CAST(y100 AS DECIMAL(38,0))) AS sy,
               SUM(CAST(x1 * y100 AS DECIMAL(38,0))) AS s1y,
               SUM(CAST(x2 * y100 AS DECIMAL(38,0))) AS s2y
        FROM f
    ),
    m AS (
        SELECT CAST(n AS DOUBLE) AS a11, CAST(s1 AS DOUBLE) AS a12,
               CAST(s2 AS DOUBLE) AS a13,
               CAST(s1 AS DOUBLE) AS a21,
               CAST(s11 AS DOUBLE) + 10.0 AS a22,
               CAST(s12 AS DOUBLE) AS a23,
               CAST(s2 AS DOUBLE) AS a31, CAST(s12 AS DOUBLE) AS a32,
               CAST(s22 AS DOUBLE) + 10.0 AS a33,
               CAST(sy AS DOUBLE) / 100.0 AS b1,
               CAST(s1y AS DOUBLE) / 100.0 AS b2,
               CAST(s2y AS DOUBLE) / 100.0 AS b3,
               n
        FROM s
    ),
    d AS (
        SELECT n, b1, b2, b3, a11, a12, a13, a21, a22, a23, a31, a32, a33,
               a11 * (a22 * a33 - a23 * a32)
             - a12 * (a21 * a33 - a23 * a31)
             + a13 * (a21 * a32 - a22 * a31) AS det
        FROM m
    )
    SELECT n,
           (b1 * (a22 * a33 - a23 * a32)
          - a12 * (b2 * a33 - a23 * b3)
          + a13 * (b2 * a32 - a22 * b3)) / det AS beta0,
           (a11 * (b2 * a33 - a23 * b3)
          - b1 * (a21 * a33 - a23 * a31)
          + a13 * (a21 * b3 - b2 * a31)) / det AS beta1,
           (a11 * (a22 * b3 - b2 * a32)
          - a12 * (a21 * b3 - b2 * a31)
          + b1 * (a21 * a32 - a22 * a31)) / det AS beta2,
           det
    FROM d
    """,
)
def ridge_two_feature_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    f = ev.select(
        F.hour("ts").cast("bigint").alias("x1"),
        (
            (
                F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast(
                    "bigint"
                )
                % 7
            )
            < 2
        )
        .cast("bigint")
        .alias("x2"),
        F.round(F.col("value") * 100).cast("bigint").alias("y100"),
    )
    s = f.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x1").cast("bigint").alias("s1"),
        F.sum("x2").cast("bigint").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("s22"),
        F.sum(F.col("y100").cast("decimal(38,0)")).alias("sy"),
        F.sum((F.col("x1") * F.col("y100")).cast("decimal(38,0)")).alias(
            "s1y"
        ),
        F.sum((F.col("x2") * F.col("y100")).cast("decimal(38,0)")).alias(
            "s2y"
        ),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    m = s.select(
        "n",
        d("n").alias("a11"),
        d("s1").alias("a12"),
        d("s2").alias("a13"),
        d("s1").alias("a21"),
        (d("s11") + F.lit(10.0)).alias("a22"),
        d("s12").alias("a23"),
        d("s2").alias("a31"),
        d("s12").alias("a32"),
        (d("s22") + F.lit(10.0)).alias("a33"),
        (d("sy") / 100.0).alias("b1"),
        (d("s1y") / 100.0).alias("b2"),
        (d("s2y") / 100.0).alias("b3"),
    )
    c = lambda n_: F.col(n_)  # noqa: E731
    det = (
        c("a11") * (c("a22") * c("a33") - c("a23") * c("a32"))
        - c("a12") * (c("a21") * c("a33") - c("a23") * c("a31"))
        + c("a13") * (c("a21") * c("a32") - c("a22") * c("a31"))
    )
    dd = m.withColumn("det", det)
    beta0 = (
        c("b1") * (c("a22") * c("a33") - c("a23") * c("a32"))
        - c("a12") * (c("b2") * c("a33") - c("a23") * c("b3"))
        + c("a13") * (c("b2") * c("a32") - c("a22") * c("b3"))
    ) / c("det")
    beta1 = (
        c("a11") * (c("b2") * c("a33") - c("a23") * c("b3"))
        - c("b1") * (c("a21") * c("a33") - c("a23") * c("a31"))
        + c("a13") * (c("a21") * c("b3") - c("b2") * c("a31"))
    ) / c("det")
    beta2 = (
        c("a11") * (c("a22") * c("b3") - c("b2") * c("a32"))
        - c("a12") * (c("a21") * c("b3") - c("b2") * c("a31"))
        + c("b1") * (c("a21") * c("a32") - c("a22") * c("a31"))
    ) / c("det")
    return dd.select(
        "n",
        beta0.alias("beta0"),
        beta1.alias("beta1"),
        beta2.alias("beta2"),
        F.col("det").alias("det"),
    )
