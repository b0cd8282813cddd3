"""Sequence-alignment wave (r8): exact dynamic-time-warping distance
(Sakoe & Chiba 1978, public) between each day's hourly click profile
and its purchase profile — "how far does purchase activity lag/warp
relative to clicks within the day". SURVEY §7 extension scope.

Exactness: costs are |x_i − y_j| over BIGINT hourly counts, so the
whole DP is integer arithmetic — no rounding anywhere. The Spark side
runs the 24×24 DP as a NESTED higher-order fold (``aggregate`` over
rows carrying the previous DP row as an array<bigint>, an inner
``aggregate`` building each row left-to-right) — one whole-stage-
codegen scalar expression per day, zero Python. The DuckDB oracle
cannot nest folds, so it unrolls the row recurrence as 24 chained
CTEs using the prefix decomposition

    D[i][j] = C_j + min_{k≤j}(A_k − C_k),
    A_k = min(D[i−1][k−1], D[i−1][k]) + c_ik,   C_j = Σ_{m≤j} c_im

(each row update = one prefix sum + one prefix min window) — the
same integers in a different evaluation order, hence hash-equal.

100 TB shape: the heavy input pass is ONE partial-combined groupBy
to (day, hour) counts; the DP itself is a per-day scalar expression
over a 24-element array — embarrassingly parallel, no shuffle, no
UDF, no driver loop. Longer series (e.g. 1440-minute profiles) keep
the same plan with a longer sequence(); a Sakoe–Chiba band is a
WHERE |i−j| ≤ r guard on the same fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query

_INF = 1099511627776  # 2^40 — DP boundary; real path costs are ≪ 2^40
_SQL_DAY = "CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 86400) AS BIGINT)"

_DTW_EXPR = f"""
element_at(
  aggregate(
    sequence(1, 24),
    concat(array(CAST(0 AS BIGINT)),
           array_repeat(CAST({_INF} AS BIGINT), 24)),
    (p, i) -> aggregate(
        sequence(1, 24),
        array(CAST({_INF} AS BIGINT)),
        (acc, j) -> concat(acc, array(
            abs(element_at(x, i) - element_at(y, j))
            + least(element_at(p, j), element_at(p, j + 1),
                    element_at(acc, -1))
        ))
    )
  ),
  25)
"""


def _dtw_oracle() -> str:
    header = f"""
    WITH days AS (SELECT DISTINCT {_SQL_DAY} AS day FROM events),
    hours AS (SELECT UNNEST(range(1, 25)) AS j),
    cnt AS (
        SELECT {_SQL_DAY} AS day, CAST(hour(ts) AS BIGINT) + 1 AS j,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT d.day, h.j, COALESCE(c.x, 0) AS x, COALESCE(c.y, 0) AS y
        FROM days d CROSS JOIN hours h
        LEFT JOIN cnt c ON c.day = d.day AND c.j = h.j
    ),
    cells AS (
        SELECT a.day, a.j AS i, b.j AS j, abs(a.x - b.y) AS c
        FROM grid a JOIN grid b USING (day)
    ),
    d0 AS (
        SELECT day, 0 AS j, CAST(0 AS BIGINT) AS d FROM days
        UNION ALL
        SELECT day, j, CAST({_INF} AS BIGINT) FROM grid
    )"""
    iters = []
    for i in range(1, 25):
        iters.append(f""",
    a{i} AS (
        SELECT q.day, q.j,
               SUM(c.c) OVER (PARTITION BY q.day ORDER BY q.j
                              ROWS UNBOUNDED PRECEDING) AS cum,
               least(q.d, q.pd) + c.c AS a
        FROM (SELECT day, j, d,
                     lag(d) OVER (PARTITION BY day ORDER BY j) AS pd
              FROM d{i - 1}) q
        JOIN cells c ON c.day = q.day AND c.i = {i} AND c.j = q.j
    ),
    d{i} AS (
        SELECT day, j,
               cum + MIN(a - cum) OVER (PARTITION BY day ORDER BY j
                            ROWS UNBOUNDED PRECEDING) AS d
        FROM a{i}
        UNION ALL SELECT day, 0, CAST({_INF} AS BIGINT) FROM days
    )""")
    footer = """
    SELECT CAST(day AS BIGINT) AS day, CAST(d AS BIGINT) AS dtw
    FROM d24 WHERE j = 24
    ORDER BY day
    """
    return header + "".join(iters) + footer


# ---------------------------------------------------------------------------
@query("dtw_click_purchase_daily", oracle=_dtw_oracle())
def dtw_click_purchase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("bigint")
    cnt = ev.groupBy(
        day.alias("day"), (F.hour("ts").cast("bigint") + 1).alias("j")
    ).agg(
        F.sum((F.col("event_type") == "click").cast("int"))
        .cast("bigint")
        .alias("x"),
        F.sum((F.col("event_type") == "purchase").cast("int"))
        .cast("bigint")
        .alias("y"),
    )
    arrs = cnt.groupBy("day").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("j"), F.col("x")))
        ).alias("mx"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("j"), F.col("y")))
        ).alias("my"),
    ).select(
        "day",
        F.expr(
            "transform(sequence(1, 24), "
            "j -> coalesce(element_at(mx, CAST(j AS BIGINT)), "
            "CAST(0 AS BIGINT)))"
        ).alias("x"),
        F.expr(
            "transform(sequence(1, 24), "
            "j -> coalesce(element_at(my, CAST(j AS BIGINT)), "
            "CAST(0 AS BIGINT)))"
        ).alias("y"),
    )
    return arrs.select(
        F.col("day").cast("bigint").alias("day"),
        F.expr(_DTW_EXPR).cast("bigint").alias("dtw"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Sequential-pattern support (the PrefixSpan/GSP counting semantics,
# public): for every ordered triple a→b→c of event types (adjacent
# repeats excluded), the number of users whose event SEQUENCE contains
# it as a subsequence — greedy matching (first a, first b after it,
# first c after that), which is exact for existence. One user-keyed
# pass builds type→positions maps; the candidate grid (≤ 80 rows)
# cross-joins the bounded per-user relation — model-domain work, the
# fact table is touched once. Pure integer positions and counts.
@query(
    "sequential_triples_users",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    pos AS (
        SELECT user_id,
               map_from_entries(
                   list(struct_pack(k := event_type,
                                    v := rns) ORDER BY event_type)
               ) AS m
        FROM (
            SELECT user_id, event_type,
                   list(rn ORDER BY rn) AS rns
            FROM seq GROUP BY user_id, event_type
        ) GROUP BY user_id
    ),
    types AS (SELECT DISTINCT event_type AS t FROM events),
    cand AS (
        SELECT a.t AS a, b.t AS b, c.t AS c
        FROM types a, types b, types c
        WHERE a.t <> b.t AND b.t <> c.t
    ),
    step1 AS (
        SELECT cand.a, cand.b, cand.c, pos.m,
               COALESCE(list_min(m[cand.a][1]), 2147483647) AS pa
        FROM cand CROSS JOIN pos
    ),
    step2 AS (
        SELECT a, b, c, m,
               COALESCE(list_min(list_filter(m[b][1], y -> y > pa)),
                        2147483647) AS pb
        FROM step1
    ),
    matched AS (
        SELECT a, b, c,
               list_min(list_filter(m[c][1], x -> x > pb)) IS NOT NULL
                   AS hit
        FROM step2
    )
    SELECT a, b, c,
           CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM matched
    GROUP BY a, b, c
    HAVING SUM(CASE WHEN hit THEN 1 ELSE 0 END) > 0
    ORDER BY n_users DESC, a, b, c
    """,
)
def sequential_triples_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.row_number().over(wu).alias("rn")
    )
    # (user, type) -> sorted positions: a SKINNY bounded relation
    # (|users| x |types| rows, one array each) joined per greedy step
    # — carrying the whole per-user map through an 80-way candidate
    # cross join copied every map 80x per user (measured 2-3x slower)
    pos = seq.groupBy("user_id", "event_type").agg(
        F.array_sort(F.collect_list("rn")).alias("rns")
    )
    n_total = pos.select("user_id").distinct().count()
    types = ev.select(F.col("event_type").alias("t")).distinct()
    a, b, c = types.alias("a"), types.alias("b"), types.alias("c")
    cand = (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            F.col("a.t").alias("ca"),
            F.col("b.t").alias("cb"),
            F.col("c.t").alias("cc"),
        )
        .where((F.col("ca") != F.col("cb")) & (F.col("cb") != F.col("cc")))
    )
    # users that lack a step's type can never match — inner joins
    # drop them, which only removes hit=false rows; n_total is the
    # full user count (the oracle's COUNT(*) per candidate).
    ra = pos.select(
        F.col("event_type").alias("ca"),
        "user_id",
        F.array_min("rns").alias("pa"),
    )
    step1 = F.broadcast(cand).join(ra, "ca")
    rb = pos.select(
        F.col("event_type").alias("tb"),
        F.col("user_id").alias("ub"),
        F.col("rns").alias("rns_b"),
    )
    step2 = (
        step1.join(
            F.broadcast(rb),
            (F.col("cb") == F.col("tb")) & (F.col("user_id") == F.col("ub")),
        )
        .drop("ub", "tb")
        .withColumn(
            "pb",
            F.array_min(
                F.filter(F.col("rns_b"), lambda y: y > F.col("pa"))
            ),
        )
        .where(F.col("pb").isNotNull())
        .drop("rns_b")
    )
    rc = pos.select(
        F.col("event_type").alias("tc"),
        F.col("user_id").alias("uc"),
        F.col("rns").alias("rns_c"),
    )
    matched = (
        step2.join(
            F.broadcast(rc),
            (F.col("cc") == F.col("tc")) & (F.col("user_id") == F.col("uc")),
        )
        .withColumn(
            "hit",
            F.array_min(
                F.filter(F.col("rns_c"), lambda x: x > F.col("pb"))
            ).isNotNull(),
        )
        .where(F.col("hit"))
    )
    return (
        matched.groupBy(
            F.col("ca").alias("a"),
            F.col("cb").alias("b"),
            F.col("cc").alias("c"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .withColumn("n_total", F.lit(n_total).cast("bigint"))
        .orderBy(F.col("n_users").desc(), "a", "b", "c")
    )
