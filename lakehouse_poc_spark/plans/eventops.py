"""Product-analytics operators over the events stream: funnel
conversion, cohort retention, and value histograms — the standard
event-warehouse query family (SURVEY §7 extension scope; the
reference has no event surface).

100 TB shapes:
- Funnel: three per-user conditional-min aggregations chained by
  joins, ALL on user_id — one logical shuffle key, so the exchanges
  reuse the same partitioning (and AQE coalesces); the stage tables
  shrink monotonically (users can only drop out).
- Cohort retention: two aggs on user_id (cohort assignment, weekly
  activity) then one on (cohort, offset) — bytes ∝ users + cells,
  never events, after the map-side combines.
- Histogram: bin id is a row-local expression; one partial-combined
  shuffle on ~#bins groups. The anti-pattern it replaces is
  collect-then-numpy on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query
from .tpch import dsum, sql_dsum


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Ordered funnel: first view → first later click → first later
# purchase, strictly increasing timestamps per user.
@query(
    "funnel_conversion_events",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS t_view FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, MIN(e.ts) AS t_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
        SELECT '1_view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
        UNION ALL
        SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
    )
    ORDER BY stage
    """,
)
def funnel_conversion_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )

    def _stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return (
        _stage(v, "1_view")
        .unionByName(_stage(c, "2_click"))
        .unionByName(_stage(p, "3_purchase"))
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention matrix: users grouped by first-activity
# week, counted in each subsequent week they return.
@query(
    "cohort_retention_events",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort,
               CAST(date_trunc('week', e.ts) AS DATE) AS wk
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM activity
    GROUP BY cohort, wk
    ORDER BY cohort_week, week_offset
    """,
)
def cohort_retention_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort")
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort",
            F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort", "wk")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("wk", "cohort") / 7).cast("bigint").alias("week_offset"),
            "n_users",
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram of event values: distributed binning (the
# declarative replacement for collect-then-histogram on the driver).
_BIN_WIDTH = 50


@query(
    "histogram_event_values",
    oracle=f"""
    SELECT CAST(FLOOR(value / {_BIN_WIDTH}) * {_BIN_WIDTH} AS DOUBLE) AS bin_lo,
           CAST(FLOOR(value / {_BIN_WIDTH}) * {_BIN_WIDTH} + {_BIN_WIDTH} AS DOUBLE) AS bin_hi,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY FLOOR(value / {_BIN_WIDTH})
    ORDER BY bin_lo
    """,
)
def histogram_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    b = F.floor(F.col("value") / _BIN_WIDTH)
    return (
        events.groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            (F.col("bin") * _BIN_WIDTH).cast("double").alias("bin_lo"),
            (F.col("bin") * _BIN_WIDTH + _BIN_WIDTH).cast("double").alias("bin_hi"),
            "n",
            "total_value",
        )
        .orderBy("bin_lo")
    )


# ---------------------------------------------------------------------------
# Nested-data operators: per-user ordered event arrays manipulated
# with higher-order functions (transform/filter/aggregate) — the
# API surface for array<struct> columns. The fold order is pinned
# (sort by ts, event_id) so the left-to-right double sum is
# bit-identical across engines.
@query(
    "nested_event_arrays",
    oracle="""
    WITH l AS (
        SELECT user_id,
               list(event_type ORDER BY ts, event_id) AS types,
               list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           CAST(len(list_filter(types, t -> t = 'purchase')) AS BIGINT)
               AS n_purchases,
           list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                   [vals[i] FOR i IN range(1, len(vals) + 1)
                    IF types[i] = 'purchase']),
               (acc, x) -> acc + x
           ) AS purchase_total
    FROM l
    ORDER BY user_id
    """,
)
def nested_event_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    rows = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type", "value"))
        ).alias("evs")
    )
    purchases = F.filter(F.col("evs"), lambda e: e["event_type"] == "purchase")
    return rows.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.size(purchases).cast("bigint").alias("n_purchases"),
        F.aggregate(
            F.transform(purchases, lambda e: e["value"]),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("purchase_total"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Winsorization: clip values to per-group [p05, p95] before averaging
# — the standard outlier-robust feature/metric transform. Percentiles
# are exact (percentile_disc) for bit-exact oracle comparison; at
# 100 TB the drop-in scale path is approx_percentile, which merges
# its sketch map-side instead of sorting each group. The percentile
# table is one row per event_type, so the join back onto events is a
# broadcast — the only shuffles are the two aggregations on the
# low-cardinality group key. Sums go through the repo's
# decimal(30,6) convention so both means are bit-identical to DuckDB.
@query(
    "winsorize_event_values",
    oracle="""
    WITH p AS (
        SELECT event_type,
               quantile_disc(value, 0.05) AS p05,
               quantile_disc(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_type, p.p05, p.p95,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS mean_raw,
           CAST(SUM(CAST(least(greatest(e.value, p.p05), p.p95) AS DECIMAL(30,6)))
                AS DOUBLE) / COUNT(*) AS mean_winsor,
           CAST(SUM(CASE WHEN e.value < p.p05 OR e.value > p.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clipped
    FROM events e JOIN p ON e.event_type = p.event_type
    GROUP BY e.event_type, p.p05, p.p95
    ORDER BY e.event_type
    """,
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    events.createOrReplaceTempView("__winsor_events")
    return spark.sql(
        """
        WITH p AS (
            SELECT event_type,
                   percentile_disc(0.05) WITHIN GROUP (ORDER BY value) AS p05,
                   percentile_disc(0.95) WITHIN GROUP (ORDER BY value) AS p95
            FROM __winsor_events GROUP BY event_type
        )
        SELECT /*+ BROADCAST(p) */
               e.event_type, p.p05, p.p95,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(e.value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS mean_raw,
               CAST(SUM(CAST(least(greatest(e.value, p.p05), p.p95) AS DECIMAL(30,6)))
                    AS DOUBLE) / COUNT(*) AS mean_winsor,
               CAST(SUM(CASE WHEN e.value < p.p05 OR e.value > p.p95 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clipped
        FROM __winsor_events e JOIN p ON e.event_type = p.event_type
        GROUP BY e.event_type, p.p05, p.p95
        ORDER BY e.event_type
        """
    )


# ---------------------------------------------------------------------------
# Time-series gap fill: a dense hourly spine per event_type (explode
# of sequence(min_hour, max_hour)) left-joined onto the aggregates,
# with counts zero-filled and totals forward-filled via
# last(ignorenulls) — the standard regularization before windowed
# models. 100 TB shape: the spine is (#types × #hours), tiny next to
# the events; bounds are a broadcast scalar; the only event-sized
# work is the first hourly aggregation (map-side combined). The
# forward-fill window partitions by event_type — state is one row.
@query(
    "gap_fill_hourly_events",
    oracle="""
    WITH h AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS total
        FROM events GROUP BY 1, 2
    ),
    b AS (SELECT min(hr) AS mn, max(hr) AS mx FROM h),
    types AS (SELECT DISTINCT event_type FROM events),
    spine AS (
        SELECT t.event_type, unnest(generate_series(b.mn, b.mx, INTERVAL 1 HOUR)) AS hr
        FROM types t, b
    ),
    j AS (
        SELECT s.event_type, s.hr, COALESCE(h.n, 0) AS n, h.total
        FROM spine s LEFT JOIN h ON s.event_type = h.event_type AND s.hr = h.hr
    )
    SELECT event_type,
           strftime(hr, '%Y-%m-%d %H:00') AS hour,
           CAST(n AS BIGINT) AS n,
           last_value(total IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS last_seen_total
    FROM j
    ORDER BY event_type, hour
    """,
)
def gap_fill_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = _t(spark, sf_dir, "events")
    h = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total"),
    )
    bounds = h.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    types = events.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 hour"))
        ).alias("hr"),
    )
    j = spine.join(h, ["event_type", "hr"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        F.date_format("hr", "yyyy-MM-dd HH:00").alias("hour"),
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
        F.last("total", ignorenulls=True).over(w).alias("last_seen_total"),
    ).orderBy("event_type", "hour")


# ---------------------------------------------------------------------------
# Robust dispersion: median + MAD (median absolute deviation) per
# event_type — outlier-insensitive alternatives to mean/stddev for
# monitoring skewed value streams. Exact percentile_disc for oracle
# bit-equality (approx_percentile is the 100 TB drop-in, as with
# winsorize); the median table is one row per type, broadcast back
# for the deviation pass.
@query(
    "mad_event_values",
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_disc(value, 0.5) AS median_value
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           med.median_value,
           quantile_disc(abs(e.value - med.median_value), 0.5) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events e JOIN med ON e.event_type = med.event_type
    GROUP BY e.event_type, med.median_value
    ORDER BY e.event_type
    """,
)
def mad_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    events.createOrReplaceTempView("__mad_events")
    return spark.sql(
        """
        WITH med AS (
            SELECT event_type,
                   percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS median_value
            FROM __mad_events GROUP BY event_type
        )
        SELECT /*+ BROADCAST(med) */
               e.event_type,
               med.median_value,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(e.value - med.median_value)) AS mad,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM __mad_events e JOIN med ON e.event_type = med.event_type
        GROUP BY e.event_type, med.median_value
        ORDER BY e.event_type
        """
    )


# ---------------------------------------------------------------------------
# Hopping (sliding) windows in batch: 1-hour windows every 15 minutes.
# Each event belongs to window/slide = 4 windows; F.window with a
# slide emits all of them as a row-local expression, so the plan is
# explode(4x) → map-side partial agg → ONE shuffle on (window, type).
# The oracle derives the same 4 hop starts per event arithmetically
# (epoch-aligned buckets, matching Spark's epoch-origin windows under
# the pinned UTC session).
@query(
    "hopping_window_events",
    oracle=f"""
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')}
    FROM (
        SELECT e.event_type, e.value,
               time_bucket(INTERVAL 15 MINUTE, e.ts) - k.k * INTERVAL 15 MINUTE AS w_start
        FROM events e
        CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) k
    )
    GROUP BY w_start, event_type
    ORDER BY window_start, event_type
    """,
)
def hopping_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("value"), "total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


# ---------------------------------------------------------------------------
# Exact heavy hitters (users with >= N/1000 of all events) via the
# two-pass Misra-Gries candidate filter — the scale path that shuffles
# candidates, not the full distinct-key space (operators/heavyhitters
# .py documents the superset guarantee). The threshold compare is
# integer (n*1000 >= N) on both engines, so no float boundary exists;
# the result is exact, which is why a plain SQL oracle applies.
@query(
    "heavy_hitter_users",
    oracle="""
    SELECT user_id, COUNT(*) AS n_rows
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) * 1000 >= (SELECT COUNT(*) FROM events)
    ORDER BY n_rows DESC, user_id
    """,
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavyhitters import heavy_hitters_exact

    events = _t(spark, sf_dir, "events")
    return heavy_hitters_exact(
        events, "user_id", phi_denominator=1000, capacity=1024
    ).orderBy(F.col("n_rows").desc(), "user_id")


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average of event values per user:
# s_0 = x_0, s_i = λ·s_{i-1} + (1-λ)·x_i over the user's events in
# (ts, event_id) order. EWMA is inherently order-recursive, so both
# engines evaluate the SAME left fold over the SAME pinned-order
# array — float results are bit-identical with no rounding tricks
# (fold order is part of the operator's contract, not an accident).
#
# Scale: one shuffle on user_id; each user's history materializes as
# one array, so this fits bounded per-key histories (the per-user /
# per-device case). For unbounded keys the streaming twin is
# applyInPandasWithState with the same recurrence.
_EWMA_LAMBDA = 0.9


@query(
    "ewma_event_values",
    oracle=f"""
    WITH seq AS (
        SELECT user_id,
               list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           vals[1] AS first_value,
           list_reduce(vals,
                       (acc, x) -> {_EWMA_LAMBDA} * acc
                                   + {1.0 - _EWMA_LAMBDA} * x) AS ewma
    FROM seq
    ORDER BY user_id
    """,
)
def ewma_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    seq = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda e: e["value"])
    # DuckDB's list_reduce seeds the fold with the first element;
    # mirror that exactly: fold the tail with vals[0] as the seed.
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(_EWMA_LAMBDA) * acc + F.lit(1.0 - _EWMA_LAMBDA) * x,
    )
    return seq.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.element_at(vals, 1).alias("first_value"),
        ewma.alias("ewma"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Equal-frequency quantile binning (ML feature prep): per event_type,
# NTILE(10) over (value, event_id) — the deterministic tie-break the
# repo convention requires — then per-bin edges and counts. The
# window sorts WITHIN each event_type group (partitioned, no global
# sort); the bin summary is a partial-aggregable groupBy. At 100 TB
# the per-group sort is the standard equal-frequency formulation;
# the approx path (winsorize's approx_percentile edges) trades rank
# exactness for a map-only pass.
@query(
    "quantile_bins_events",
    oracle="""
    WITH binned AS (
      SELECT event_type, value,
             ntile(10) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
      FROM events
    )
    SELECT event_type, CAST(bin AS INT) AS bin,
           COUNT(*) AS n,
           MIN(value) AS lo,
           MAX(value) AS hi
    FROM binned
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def quantile_bins_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.withColumn("bin", F.ntile(10).over(w))
        .groupBy("event_type", F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("event_type", "bin")
    )


# ---------------------------------------------------------------------------
# Weighted median per event type via a GROUPED_AGG pandas UDF
# (operators/stats.py) — synthetic integer weights (user_id % 5 + 1)
# exercise true weighted semantics. The oracle is the streaming
# SQL-window formulation of the identical definition: smallest value
# whose doubled cumulative weight reaches the group total (ties broken
# by event_id). The output value is copied from the data, not
# computed, so the differential hash is exact.
@query(
    "weighted_median_event_values",
    oracle="""
    WITH w AS (
        SELECT event_type, value, event_id,
               CAST(user_id % 5 + 1 AS BIGINT) AS wt
        FROM events
    ),
    c AS (
        SELECT event_type, value, wt, event_id,
               SUM(wt) OVER (
                   PARTITION BY event_type ORDER BY value, event_id
                   ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(wt) OVER (PARTITION BY event_type) AS tot
        FROM w
    )
    SELECT event_type, MIN(value) AS wmedian
    FROM c WHERE cw * 2 >= tot
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def weighted_median_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.udafs import weighted_median_udaf

    ev = read_parquet_table(spark, sf_dir, "events")
    wm = weighted_median_udaf()
    return (
        ev.select(
            "event_type",
            "value",
            "event_id",
            (F.col("user_id") % 5 + 1).cast("bigint").alias("wt"),
        )
        .groupBy("event_type")
        .agg(wm("value", "wt", "event_id").alias("wmedian"))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection (Page 1954, public method): the one-sided
# upper CUSUM  s_i = max(0, s_{i-1} + x_i − allowance)  per user over
# the (ts, event_id)-ordered value sequence, with an alarm when the
# running maximum crosses h — the classic "has this meter drifted"
# monitor over telemetry. Order-recursive like the EWMA fold (same
# harness): per-user sequences collect into bounded arrays, the fold
# is a codegen HOF with a struct accumulator, both engines fold the
# identical (0-seeded) sequence, so the doubles are bit-identical.
# One shuffle (the per-user collect); state is per-user-bounded.
_CUSUM_ALLOW = 60.0
_CUSUM_H = 200.0


@query(
    "cusum_event_values",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    ),
    -- NB: DuckDB evaluates the lambda's struct fields sequentially and
    -- REBINDS acc.<field> to the freshly computed value for later
    -- fields (measured: s-then-mx folds mx over the NEW s). The 'mx'
    -- field therefore comes FIRST so it sees the pre-update acc.s —
    -- element structs use the same field order (list_reduce requires
    -- acc and element types to match exactly).
    folded AS (
        SELECT user_id,
               CAST(len(vals) AS BIGINT) AS n_events,
               list_reduce(
                   list_transform(list_prepend(0.0, vals),
                                  v -> {{'mx': v, 's': v}}),
                   (acc, x) -> {{
                       'mx': greatest(acc.mx,
                                      greatest(0.0, acc.s + x.s - {_CUSUM_ALLOW})),
                       's': greatest(0.0, acc.s + x.s - {_CUSUM_ALLOW})
                   }}
               ) AS r
        FROM seq
    )
    SELECT user_id, n_events,
           r.s AS cusum_final,
           r.mx AS cusum_max,
           r.mx > {_CUSUM_H} AS alarm
    FROM folded
    ORDER BY user_id
    """,
)
def cusum_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    seq = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda e: e["value"])

    def step(acc, v):
        new_s = F.greatest(F.lit(0.0), acc["s"] + v - F.lit(_CUSUM_ALLOW))
        return F.struct(
            new_s.alias("s"), F.greatest(acc["mx"], new_s).alias("mx")
        )

    r = F.aggregate(
        vals,
        F.struct(F.lit(0.0).alias("s"), F.lit(0.0).alias("mx")),
        step,
    )
    return seq.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        r["s"].alias("cusum_final"),
        r["mx"].alias("cusum_max"),
        (r["mx"] > F.lit(_CUSUM_H)).alias("alarm"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Process-mining "eventually-follows" graph: for every ordered pair of
# event types (a, b), how many users have SOME a-event strictly before
# SOME b-event — the eventually-follows relation (the transition
# matrix above is its directly-follows sibling). The pair test reduces
# to per-user per-type (min_ts, max_ts): a eventually-follows b for a
# user iff min_ts(a) < max_ts(b) — so the fact table aggregates ONCE
# to user×type extremes (map-side combined) and the quadratic part
# runs on the tiny type dimension only. Ties (identical timestamps)
# count only when strictly before.
@query(
    "eventually_follows_events",
    oracle="""
    WITH ext AS (
        SELECT user_id, event_type,
               MIN(ts) AS min_ts, MAX(ts) AS max_ts
        FROM events GROUP BY user_id, event_type
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM ext a JOIN ext b
      ON a.user_id = b.user_id AND a.event_type <> b.event_type
    WHERE a.min_ts < b.max_ts
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
)
def eventually_follows_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ext = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("min_ts"), F.max("ts").alias("max_ts")
    )
    a, b = ext.alias("a"), ext.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") != F.col("b.event_type"))
            & (F.col("a.min_ts") < F.col("b.max_ts")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Capped sessionization: gap sessions (30 min) that also split at a
# 1-hour duration cap anchored at session start — the bot/idle-refresh
# guard. Summarized per capped session. The oracle replays the same
# lag→flag→cumsum → min-over-session → dense_rank chain in SQL.
_SES_GAP = 1800
_SES_CAP = 3600


@query(
    "sessionize_capped_events",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR CAST(FLOOR(epoch(ts)) AS BIGINT) - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > {_SES_GAP}
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts, event_id,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    sub AS (
        SELECT user_id, ts, event_id, session_id,
               CAST((CAST(FLOOR(epoch(ts)) AS BIGINT) - MIN(CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER
                     (PARTITION BY user_id, session_id)) // {_SES_CAP} AS BIGINT)
                   AS sub_id
        FROM sess
    ),
    capped AS (
        SELECT user_id, ts, session_id,
               CAST(dense_rank() OVER (PARTITION BY user_id
                                       ORDER BY session_id, sub_id) AS BIGINT)
                   AS capped_session_id
        FROM sub
    )
    SELECT user_id, capped_session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end
    FROM capped
    GROUP BY user_id, capped_session_id
    ORDER BY user_id, capped_session_id
    """,
)
def sessionize_capped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sessionize_capped

    ev = _t(spark, sf_dir, "events")
    s = sessionize_capped(
        ev, ["user_id"], "ts", gap=_SES_GAP, cap=_SES_CAP, tiebreak=["event_id"]
    )
    return (
        s.groupBy("user_id", F.col("capped_session_id").cast("bigint").alias("capped_session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        )
        .orderBy("user_id", "capped_session_id")
    )


# ---------------------------------------------------------------------------
# Seasonal-naive residuals: each hour's event count per type vs the
# SAME hour one day earlier (self-join on hour − 24 h, robust to gap
# hours, unlike a row-lag over existing hours) — the baseline anomaly
# monitor for traffic telemetry. One rollup shuffle + one small
# self-join on the hourly frame (hours × types sized, never events).
@query(
    "seasonal_residuals_events",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY h, event_type
    )
    SELECT strftime(a.h, '%Y-%m-%d %H:%M:%S') AS hour,
           a.event_type AS event_type,
           a.n,
           b.n AS n_prev_day,
           CAST(a.n AS BIGINT) - CAST(COALESCE(b.n, 0) AS BIGINT) AS residual
    FROM hourly a LEFT JOIN hourly b
      ON b.event_type = a.event_type AND b.h = a.h - INTERVAL 24 HOUR
    ORDER BY hour, event_type
    """,
)
def seasonal_residuals_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    a, b = hourly.alias("a"), hourly.alias("b")
    return (
        a.join(
            b,
            (F.col("b.event_type") == F.col("a.event_type"))
            & (F.col("b.h") == F.col("a.h") - F.expr("INTERVAL 24 HOURS")),
            "left",
        )
        .select(
            F.date_format("a.h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.col("a.event_type").alias("event_type"),
            F.col("a.n").alias("n"),
            F.col("b.n").alias("n_prev_day"),
            (F.col("a.n") - F.coalesce(F.col("b.n"), F.lit(0))).cast("bigint").alias("residual"),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# Rank-based feature normalization: percent_rank of value within each
# event type — the distribution-free scaling ML pipelines use when
# values are heavy-tailed (maps to [0,1], robust to outliers by
# construction). Deterministic: ties in value break on event_id for
# the row order, but percent_rank itself is tie-stable (equal values
# share a rank), so the output is engine-exact. One key shuffle.
@query(
    "percent_rank_events",
    oracle="""
    SELECT event_id, event_type, value,
           percent_rank() OVER (PARTITION BY event_type ORDER BY value)
               AS value_pctl
    FROM events
    ORDER BY event_id
    """,
)
def percent_rank_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.percent_rank().over(w).alias("value_pctl"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Chi-square independence profile: is event TYPE independent of HOUR
# OF DAY? Observed vs expected cell counts from one contingency pass —
# expected = row_total·col_total/n derived in fixed-order double
# arithmetic from exact integer marginals, the corr_profile pattern
# applied to categorical×categorical. Cells are (types × 24)-sized;
# the only corpus shuffle is the contingency count itself.
@query(
    "chisq_type_hour_events",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, hr
    ),
    rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS row_n FROM cells GROUP BY event_type),
    ct AS (SELECT hr, CAST(SUM(n) AS BIGINT) AS col_n FROM cells GROUP BY hr),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells)
    SELECT c.event_type, c.hr, c.n,
           CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
               / CAST(t.total AS DOUBLE) AS expected,
           (CAST(c.n AS DOUBLE)
            - CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
              / CAST(t.total AS DOUBLE))
           * (CAST(c.n AS DOUBLE)
              - CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
                / CAST(t.total AS DOUBLE))
           / (CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
              / CAST(t.total AS DOUBLE)) AS chi2_contrib
    FROM cells c
    JOIN rt USING (event_type) JOIN ct USING (hr) CROSS JOIN tot t
    ORDER BY event_type, hr
    """,
)
def chisq_type_hour_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    rt = cells.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    ct = cells.groupBy("hr").agg(F.sum("n").alias("col_n"))
    tot = cells.agg(F.sum("n").alias("total"))
    expected = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("total").cast("double")
    )
    diff = F.col("n").cast("double") - expected
    return (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hr")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "hr",
            "n",
            expected.alias("expected"),
            (diff * diff / expected).alias("chi2_contrib"),
        )
        .orderBy("event_type", "hr")
    )


# ---------------------------------------------------------------------------
# Hourly p95 trend: per (hour, event_type) exact 95th percentile of
# value — the latency/metric SLA trend panel. percentile_disc (exact,
# rank-based) keeps both engines identical where interpolating
# percentile_cont could differ in float math; the per-group sort is
# partitioned by (hour, type), never global. At 100 TB the exact
# per-group percentile is the reporting-tier shape; the streaming tier
# would use approx_percentile (accuracy bound pinned in
# tests/test_sketches.py).
@query(
    "hourly_p95_events",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           quantile_disc(value, 0.95) AS p95_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    ORDER BY hour, event_type
    """,
)
def hourly_p95_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)").alias(
                "p95_value"
            ),
        )
        .orderBy("hour", "event_type")
    )


# ---------------------------------------------------------------------------
# Conversion attribution: every purchase attributed to the same user's
# clicks — LAST-touch (the most recent click before the purchase,
# within 7 days) and FIRST-touch (the user's earliest click overall,
# if before the purchase). The marketing-analytics classic, built on
# the as-of machinery: last-touch IS an as-of backward join with
# tolerance (operators/asof.py semantics expressed per purchase);
# first-touch is a per-user min. Output: per event_type... summarized
# as attribution coverage counts (purchases with last/first/none).
@query(
    "attribution_events",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    last_touch AS (
        SELECT p.event_id, MAX(c.ts) AS lt
        FROM p LEFT JOIN c
          ON c.user_id = p.user_id
         AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 7 DAY
        GROUP BY p.event_id
    ),
    first_click AS (SELECT user_id, MIN(ts) AS fc FROM c GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(CASE WHEN lt.lt IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_last_touch,
           CAST(SUM(CASE WHEN f.fc IS NOT NULL AND f.fc <= p.ts
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_first_touch,
           CAST(SUM(CASE WHEN lt.lt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unattributed
    FROM p
    JOIN last_touch lt ON lt.event_id = p.event_id
    LEFT JOIN first_click f ON f.user_id = p.user_id
    """,
)
def attribution_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    last_touch = (
        p.join(
            c,
            (F.col("c_user") == F.col("user_id"))
            & (F.col("c_ts") <= F.col("ts"))
            & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.max("c_ts").alias("lt"))
    )
    first_click = c.groupBy("c_user").agg(F.min("c_ts").alias("fc"))
    joined = (
        p.join(last_touch, "event_id")
        .join(first_click, F.col("c_user") == F.col("user_id"), "left")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(F.when(F.col("lt").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_last_touch"),
        F.sum(
            F.when(F.col("fc").isNotNull() & (F.col("fc") <= F.col("ts")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_first_touch"),
        F.sum(F.when(F.col("lt").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unattributed"),
    )


# ---------------------------------------------------------------------------
# New vs returning users per day: every day's active users split by
# whether this is their first-ever active day — the daily growth
# panel. Two aggregates on user_id (first-day + daily activity), both
# map-side combined; the daily frame is days×users-sized only after
# the distinct, and the comparison is a broadcast-back join.
@query(
    "new_vs_returning_events",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS DATE) AS first_day
        FROM events GROUP BY user_id
    ),
    daily AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(SUM(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(SUM(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users
    FROM daily d JOIN firsts f ON f.user_id = d.user_id
    GROUP BY d.day
    ORDER BY day
    """,
)
def new_vs_returning_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("first_day")
    )
    daily = ev.select(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).distinct()
    return (
        daily.join(F.broadcast(firsts), "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .select(F.date_format("day", "yyyy-MM-dd").alias("day"), "new_users", "returning_users")
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Holt linear-trend (double-exponential) smoothing per user — the
# level+trend forecasting primitive one notch above ewma (level only):
# l_t = α·x_t + (1−α)·(l_{t−1}+b_{t−1});
# b_t = β·(l_t−l_{t−1}) + (1−β)·b_{t−1}; forecast_1 = l+b. Zero-seeded
# fold over the (ts, event_id)-pinned value order (the ewma/cusum
# determinism idiom). DuckDB's list_reduce rebinds struct fields
# sequentially, so the accumulator carries the previous level in a
# field computed BEFORE 'l' ('pl' sees the old acc.l; 'b' then reads
# the rebound new l and the old level from pl) — same quirk the cusum
# oracle documents. Spark computes the identical expressions with
# explicit locals, so every double matches bit-for-bit.
_HOLT_A = 0.5
_HOLT_B = 0.3


@query(
    "holt_trend_event_values",
    oracle=f"""
    WITH RECURSIVE seq AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
               CAST(len(list(value)) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    -- recursive CTE instead of list_reduce: DuckDB's struct-field
    -- lambda folds rebind interdependent fields in
    -- version-dependent order (measured three different behaviors),
    -- while the CTE's step expressions are unambiguous. The trend
    -- update inlines the new-level expression, matching Spark's
    -- expression tree op-for-op, so doubles are bit-identical.
    rec AS (
        SELECT user_id, 0 AS t, 0.0::DOUBLE AS l, 0.0::DOUBLE AS b, n, vs
        FROM seq
        UNION ALL
        SELECT user_id, t + 1,
               {_HOLT_A} * vs[t + 1] + {1.0 - _HOLT_A} * (l + b),
               {_HOLT_B} * (({_HOLT_A} * vs[t + 1]
                             + {1.0 - _HOLT_A} * (l + b)) - l)
                   + {1.0 - _HOLT_B} * b,
               n, vs
        FROM rec WHERE t < n
    )
    SELECT user_id, n AS n_events, l AS level, b AS trend,
           l + b AS forecast_1
    FROM rec WHERE t = n
    ORDER BY user_id
    """,
)
def holt_trend_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    seq = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda e: e["value"])

    def step(acc, v):
        # identical expressions to the oracle: new level from OLD
        # (l, b); trend from (new level − old level) with the new
        # level inlined — every double op matches the SQL fold
        new_l = F.lit(_HOLT_A) * v + F.lit(1.0 - _HOLT_A) * (
            acc["l"] + acc["b"]
        )
        new_b = F.lit(_HOLT_B) * (new_l - acc["l"]) + F.lit(
            1.0 - _HOLT_B
        ) * acc["b"]
        return F.struct(new_l.alias("l"), new_b.alias("b"))

    r = F.aggregate(
        vals,
        F.struct(F.lit(0.0).alias("l"), F.lit(0.0).alias("b")),
        step,
    )
    return seq.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        r["l"].alias("level"),
        r["b"].alias("trend"),
        (r["l"] + r["b"]).alias("forecast_1"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# A/B test read-out: Welch's unequal-variance t-test between the
# 'click' and 'purchase' arms' value metric. The only order-dependent
# sums accumulate in DECIMAL(30,6); ±/×/÷/sqrt are IEEE-correctly-
# rounded, so both engines produce bit-identical doubles with the
# SAME expression tree — the oracle mirrors every parenthesis.
@query(
    "ab_test_events",
    oracle="""
    WITH per AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS sx2
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY event_type
    ),
    j AS (
        SELECT a.n AS n_a, a.sx AS sx_a, a.sx2 AS sx2_a,
               b.n AS n_b, b.sx AS sx_b, b.sx2 AS sx2_b
        FROM (SELECT * FROM per WHERE event_type = 'click') a
        CROSS JOIN (SELECT * FROM per WHERE event_type = 'purchase') b
    ),
    s AS (
        SELECT 'click' AS group_a, 'purchase' AS group_b, n_a, n_b,
               sx_a / CAST(n_a AS DOUBLE) AS mean_a,
               sx_b / CAST(n_b AS DOUBLE) AS mean_b,
               (sx2_a - sx_a * (sx_a / CAST(n_a AS DOUBLE)))
                   / (CAST(n_a AS DOUBLE) - 1) AS var_a,
               (sx2_b - sx_b * (sx_b / CAST(n_b AS DOUBLE)))
                   / (CAST(n_b AS DOUBLE) - 1) AS var_b
        FROM j
    ),
    e AS (
        SELECT *, var_a / CAST(n_a AS DOUBLE) AS se_a,
                  var_b / CAST(n_b AS DOUBLE) AS se_b
        FROM s
    )
    SELECT group_a, group_b, n_a, n_b, mean_a, mean_b, var_a, var_b,
           (mean_a - mean_b) / sqrt(se_a + se_b) AS t_stat,
           (se_a + se_b) * (se_a + se_b)
               / (se_a * se_a / (CAST(n_a AS DOUBLE) - 1)
                  + se_b * se_b / (CAST(n_b AS DOUBLE) - 1)) AS dof,
           abs((mean_a - mean_b) / sqrt(se_a + se_b)) > 1.96 AS significant
    FROM e
    """,
)
def ab_test_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import welch_ttest

    ev = _t(spark, sf_dir, "events")
    return welch_ttest(ev, "event_type", "value", "click", "purchase")


# ---------------------------------------------------------------------------
# Survival analysis: Kaplan-Meier time-to-next-engagement. Every
# consecutive-event gap is an observed "death" (the user did return,
# after t hours); each user's final gap to the observation-window end
# is right-censored (they hadn't returned yet when the data stops) —
# the textbook censoring KM exists to handle; naive averaging of only
# observed gaps would bias engagement latency low. Durations are
# exact integer hours from microsecond epochs (floor division, both
# engines); the estimator follows the micro-rounded-ln convention.
@query(
    "km_survival_events",
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
               nxt IS NOT NULL AS is_event
        FROM seq CROSS JOIN m
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    per AS (
        SELECT t,
               CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_events,
               CAST(SUM(CASE WHEN is_event THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_censored
        FROM obs GROUP BY t
    ),
    risk AS (
        SELECT per.*,
               tot.n - (SUM(n_events + n_censored) OVER (
                            ORDER BY t ROWS UNBOUNDED PRECEDING)
                        - (n_events + n_censored)) AS n_risk
        FROM per CROSS JOIN tot
    ),
    fac AS (
        SELECT *,
               CASE WHEN n_events < n_risk THEN
                   CAST(ROUND(ln(1.0 - CAST(n_events AS DOUBLE)
                                       / CAST(n_risk AS DOUBLE))
                              * 1000000.0) AS BIGINT)
               END AS f,
               MAX(CASE WHEN n_events >= n_risk THEN 1 ELSE 0 END) OVER (
                   ORDER BY t ROWS UNBOUNDED PRECEDING) AS absorbed
        FROM risk
    )
    SELECT t, n_risk, n_events, n_censored,
           CASE WHEN absorbed = 0 THEN
               SUM(f) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
           END AS log_surv_micro,
           CASE WHEN absorbed = 0 THEN
               CAST(SUM(f) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE) / 1000000.0
           END AS log_survival
    FROM fac
    ORDER BY t
    """,
)
def km_survival_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.stats import km_survival

    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    gmax = ev.agg(F.max("ts").alias("__gmax"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    obs = (
        ev.withColumn("__next", F.lead("ts").over(w))
        .crossJoin(F.broadcast(gmax))
        .select(
            F.when(
                F.col("__next").isNotNull(),
                F.expr("(unix_micros(__next) - unix_micros(ts)) div 3600000000"),
            )
            .otherwise(
                F.expr("(unix_micros(__gmax) - unix_micros(ts)) div 3600000000")
            )
            .alias("duration"),
            F.col("__next").isNotNull().alias("is_event"),
        )
    )
    return km_survival(obs, "duration", "is_event")


# ---------------------------------------------------------------------------
# Mutual information I(event_type; value-band) — the feature-selection
# score (Cover & Thomas, public): how much does knowing the event type
# tell you about the value? Reported per event type as its additive
# contribution Σ_y p(x,y)·ln(p(x,y)/(p(x)p(y))), so the ranking reads
# off directly and Σ rows = I(X;Y). Counts are exact; each cell's ln
# micro-rounds to BIGINT and is weighted by the exact cell count, so
# the per-type sums are exact integers; the normalizing division runs
# once, in a fixed order. One (x,y) aggregation + two marginal aggs,
# all map-side combined; the cell table is |types|×|bands| — tiny.
@query(
    "mutual_info_events",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(floor(value / 10.0) AS INTEGER) AS band,
               CAST(COUNT(*) AS BIGINT) AS c_xy
        FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT event_type, CAST(SUM(c_xy) AS BIGINT) AS c_x
           FROM cells GROUP BY event_type),
    my AS (SELECT band, CAST(SUM(c_xy) AS BIGINT) AS c_y
           FROM cells GROUP BY band),
    n AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS total FROM cells),
    scored AS (
        SELECT c.event_type,
               c.c_xy,
               CAST(ROUND(ln((CAST(c.c_xy AS DOUBLE) * CAST(n.total AS DOUBLE))
                             / (CAST(mx.c_x AS DOUBLE) * CAST(my.c_y AS DOUBLE)))
                          * 1000000.0) AS BIGINT) AS pmi_micro
        FROM cells c
        JOIN mx USING (event_type) JOIN my USING (band) CROSS JOIN n
    )
    SELECT s.event_type,
           CAST(SUM(s.c_xy) AS BIGINT) AS n_x,
           CAST(SUM(s.c_xy * s.pmi_micro) AS BIGINT) AS mi_part_micro,
           CAST(SUM(s.c_xy * s.pmi_micro) AS DOUBLE) / 1000000.0
               / CAST(MAX(n.total) AS DOUBLE) AS mi_part
    FROM scored s CROSS JOIN n
    GROUP BY s.event_type
    ORDER BY s.event_type
    """,
)
def mutual_info_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(10.0)).cast("int").alias("band"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c_xy"))
    mx = cells.groupBy("event_type").agg(
        F.sum("c_xy").cast("bigint").alias("c_x")
    )
    my = cells.groupBy("band").agg(F.sum("c_xy").cast("bigint").alias("c_y"))
    n = cells.agg(F.sum("c_xy").cast("bigint").alias("total"))
    scored = (
        cells.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(my), "band")
        .crossJoin(F.broadcast(n))
        .select(
            "event_type",
            "c_xy",
            "total",
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") * F.col("total").cast("double"))
                    / (F.col("c_x").cast("double") * F.col("c_y").cast("double"))
                )
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.sum("c_xy").cast("bigint").alias("n_x"),
            F.sum(F.col("c_xy") * F.col("pmi_micro"))
            .cast("bigint")
            .alias("mi_part_micro"),
            (
                F.sum(F.col("c_xy") * F.col("pmi_micro")).cast("double")
                / F.lit(1_000_000.0)
                / F.max("total").cast("double")
            ).alias("mi_part"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Forecast backtest: one-step-ahead EWMA walk-forward per user — at
# each event, the previous EWMA state is the prediction and the
# absolute error accrues BEFORE the state updates; MAE over the n−1
# predictions is the model's honest backtest score (evaluating the
# smoother on the points it already absorbed would leak). Same pinned
# fold order as ewma/cusum, so doubles are engine-identical; the
# struct field computing the error comes FIRST (it must read the
# PRE-update state — DuckDB rebinds acc fields sequentially, the
# documented cusum quirk).
@query(
    "ewma_backtest_users",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vals
        FROM events GROUP BY user_id
    ),
    folded AS (
        SELECT user_id,
               CAST(len(vals) AS BIGINT) AS n_events,
               list_reduce(
                   list_prepend(
                       {{'e': 0.0, 's': vals[1]}},
                       list_transform(vals[2:], x -> {{'e': x, 's': x}})
                   ),
                   (acc, x) -> {{
                       'e': acc.e + abs(x.s - acc.s),
                       's': {_EWMA_LAMBDA} * acc.s
                            + {1.0 - _EWMA_LAMBDA} * x.s
                   }}
               ) AS r
        FROM seq
    )
    SELECT user_id, n_events,
           CAST(n_events - 1 AS BIGINT) AS n_preds,
           r.s AS ewma_final,
           CASE WHEN n_events >= 2
                THEN r.e / CAST(n_events - 1 AS DOUBLE) END AS mae
    FROM folded
    ORDER BY user_id
    """,
)
def ewma_backtest_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    seq = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda e: e["value"])
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.struct(
            F.lit(0.0).alias("e"), F.element_at(vals, 1).alias("s")
        ),
        lambda acc, x: F.struct(
            (acc["e"] + F.abs(x - acc["s"])).alias("e"),
            (
                F.lit(_EWMA_LAMBDA) * acc["s"]
                + F.lit(1.0 - _EWMA_LAMBDA) * x
            ).alias("s"),
        ),
    )
    n = F.size("evs").cast("bigint")
    return seq.select(
        "user_id",
        n.alias("n_events"),
        (n - 1).cast("bigint").alias("n_preds"),
        folded["s"].alias("ewma_final"),
        F.when(
            n >= 2, folded["e"] / (n - 1).cast("double")
        ).alias("mae"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Transitive closure of the event-type transition graph via a
# RECURSIVE CTE (Spark 4 WITH RECURSIVE; DuckDB runs the identical
# SQL text — shared constant below). min-hop reachability: seed with
# the distinct 1-hop edges, expand SIMPLE PATHS ONLY — each frontier
# row carries its delimited visited-node path and an edge extends it
# only to unvisited nodes. That replaces r9's literal 5-hop cap (r10
# ADVICE fix: it silently truncated graphs of diameter > 5) with a
# bound that is exact by construction: a shortest walk never revisits
# a node, so simple paths preserve MIN(hops), and recursion depth is
# ≤ #types with no explicit bound. (The node-count scalar-subquery
# alternative hangs DuckDB 1.x when the subquery references a CTE
# chain — measured this round.) Scale shape: the only event-scale
# pass is the lag window deriving edges; the recursion runs on the
# TYPE graph — a bounded dimension domain. Worst case is the simple-
# path count of a dense type graph; domains past ~10² types should
# use operators/graph.py's iterative min-label closure instead.
# Shared CTE text: the oracle derives `edges` inline from events; the
# Spark side derives THE SAME relation as a DataFrame once,
# checkpoints it (≤ |types|² rows) and feeds it to the identical
# recursive body through a temp view — Spark INLINES non-recursive
# CTEs, so the inline form re-ran the event-scale lag window + DISTINCT
# on every recursion step (measured: 77 Spark jobs, ~5 s; DuckDB
# materializes the CTE so its cost model never saw the problem).
# r10 optimization round, guide §2.4/§1.2.
_TRANSITION_EDGES_SQL = """
    WITH RECURSIVE seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    edges AS (
        SELECT DISTINCT prev_type AS src, event_type AS dst
        FROM seq
        WHERE prev_type IS NOT NULL AND prev_type <> event_type
    ),
"""

_REACH_BODY = """
    reach AS (
        SELECT src, dst, 1 AS hops,
               '|' || src || '|' || dst || '|' AS path
        FROM edges
        UNION ALL
        SELECT r.src, e.dst, r.hops + 1,
               r.path || e.dst || '|'
        FROM reach r JOIN edges e ON e.src = r.dst
        WHERE instr(r.path, '|' || e.dst || '|') = 0
    )
    SELECT src AS src_type, dst AS dst_type,
           CAST(MIN(hops) AS INT) AS min_hops
    FROM (
        SELECT src, dst, hops FROM reach
        UNION ALL
        -- self-reachability: every shortest cycle through src is a
        -- simple path src→…→b plus the closing edge b→src
        SELECT r.src, r.src AS dst, r.hops + 1 AS hops
        FROM reach r JOIN edges e ON e.src = r.dst AND e.dst = r.src
    ) walks
    GROUP BY src, dst
    ORDER BY src_type, dst_type
"""

_REACH_SQL = _TRANSITION_EDGES_SQL + _REACH_BODY


def _transition_edges_view(spark: SparkSession, sf_dir: str, view: str) -> None:
    """Materialize the event-type transition edge relation (the
    seq/edges CTE pair of _TRANSITION_EDGES_SQL, expression-for-
    expression) once, eagerly, into ``view``."""
    from pyspark.sql import Window as _W

    ev = _t(spark, sf_dir, "events")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    edges = (
        ev.select(
            "event_type", F.lag("event_type").over(w).alias("prev_type")
        )
        .filter(
            F.col("prev_type").isNotNull()
            & (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=True)  # bounded: ≤ |event types|² rows
    )
    edges.createOrReplaceTempView(view)


@query("reachability_event_types", oracle=_REACH_SQL)
def reachability_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    _transition_edges_view(spark, sf_dir, "reach_edges")
    return spark.sql(
        "WITH RECURSIVE edges AS (SELECT src, dst FROM reach_edges),"
        + _REACH_BODY
    )


# ---------------------------------------------------------------------------
# STRONGLY connected components of the DIRECTED event-type transition
# graph (r9) — the directed complement of the undirected CC family:
# two types are in the same SCC iff each reaches the other, so the
# components fall out of the same recursive closure reachability uses
# (mutual-pair join, min-member labeling — Tarjan's stack is a
# sequential algorithm; mutual reachability IS the distributed
# formulation on a bounded node domain). Scale shape: one event-scale
# lag window derives the edges; everything after runs on the
# #types-sized dimension graph. Identical SQL text on both engines
# (Spark 4 WITH RECURSIVE), the repo's shared-constant discipline.
_SCC_BODY = """
    reach AS (
        SELECT src, dst, 1 AS hops,
               '|' || src || '|' || dst || '|' AS path
        FROM edges
        UNION ALL
        SELECT r.src, e.dst, r.hops + 1,
               r.path || e.dst || '|'
        FROM reach r JOIN edges e ON e.src = r.dst
        WHERE instr(r.path, '|' || e.dst || '|') = 0
    ),
    pairs AS (SELECT DISTINCT src, dst FROM reach),
    mutual AS (
        SELECT p.src AS node, p.dst AS peer
        FROM pairs p JOIN pairs q ON q.src = p.dst AND q.dst = p.src
    ),
    nodes AS (
        SELECT src AS node FROM edges
        UNION
        SELECT dst FROM edges
    ),
    comp AS (
        SELECT n.node,
               LEAST(n.node, COALESCE(MIN(m.peer), n.node)) AS scc_id
        FROM nodes n LEFT JOIN mutual m ON m.node = n.node
        GROUP BY n.node
    )
    SELECT c.node AS event_type, c.scc_id,
           CAST(COUNT(*) OVER (PARTITION BY c.scc_id) AS BIGINT)
               AS scc_size
    FROM comp c
    ORDER BY event_type
"""

_SCC_SQL = _TRANSITION_EDGES_SQL + _SCC_BODY


@query("scc_event_types", oracle=_SCC_SQL)
def scc_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    _transition_edges_view(spark, sf_dir, "scc_edges")
    return spark.sql(
        "WITH RECURSIVE edges AS (SELECT src, dst FROM scc_edges),"
        + _SCC_BODY
    )


# ---------------------------------------------------------------------------
# Sequence-pattern matching (MATCH_RECOGNIZE-lite): per user, the
# chronologically ordered string of event-type initials, scanned for
# the funnel regex v+c+p (≥1 view, then ≥1 click, then a purchase —
# greedy non-overlapping count, identical RE2/Java semantics for
# this pattern class). The per-user sequence materializes as one
# string — bounded per-key histories, the same contract as the EWMA
# fold above; one user-keyed shuffle total.
@query(
    "event_pattern_match_users",
    oracle="""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, 'v+c+p')) AS BIGINT) AS n_funnels,
           len(regexp_extract_all(seq, 'v+c+p')) > 0 AS converted
    FROM seqs
    ORDER BY user_id
    """,
)
def event_pattern_match_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seqs = ev.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts", "event_id", F.substring("event_type", 1, 1).alias("c")
                        )
                    )
                ),
                lambda x: x["c"],
            ),
        ).alias("seq")
    )
    n_funnels = F.regexp_count(F.col("seq"), F.lit("v+c+p"))
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        n_funnels.cast("bigint").alias("n_funnels"),
        (n_funnels > 0).alias("converted"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Funnel time-to-convert: per user, seconds from the FIRST view to
# the first STRICTLY-LATER purchase; distribution summary in exact
# integer seconds (percentile_disc picks actual gap values — no
# interpolation float risk). Same two-conditional-min shape as
# funnel_conversion_events: both minima shuffle on user_id once.
@query(
    "funnel_time_to_convert_events",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS tv FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT v.user_id,
               CAST(FLOOR(epoch(MIN(e.ts))) AS BIGINT)
                 - CAST(FLOOR(epoch(v.tv)) AS BIGINT) AS gap_s
        FROM v JOIN events e
          ON e.user_id = v.user_id
         AND e.event_type = 'purchase' AND e.ts > v.tv
        GROUP BY v.user_id, v.tv
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewers,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(quantile_disc(gap_s, 0.5) AS BIGINT) AS median_gap_s,
           CAST(quantile_disc(gap_s, 0.9) AS BIGINT) AS p90_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM p
    """,
)
def funnel_time_to_convert_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("tv"))
    )
    p = (
        v.join(ev.filter(F.col("event_type") == "purchase"), "user_id")
        .filter(F.col("ts") > F.col("tv"))
        .groupBy("user_id", "tv")
        .agg(
            (
                F.unix_timestamp(F.min("ts")) - F.unix_timestamp(F.col("tv"))
            ).alias("gap_s")
        )
    )
    p.createOrReplaceTempView("__ttc_gaps")
    n_viewers = v.count()
    return spark.sql(
        f"""
        SELECT CAST({n_viewers} AS BIGINT) AS n_viewers,
               CAST(COUNT(*) AS BIGINT) AS n_converted,
               CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
               CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY gap_s)
                    AS BIGINT) AS median_gap_s,
               CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY gap_s)
                    AS BIGINT) AS p90_gap_s,
               CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
        FROM __ttc_gaps
        """
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (r7; Winters 1960, public)
# — extends holt_trend_event_values with a period-4 seasonal state
# carried as an ARRAY through the same order-recursive fold. Zero
# init (level, trend, seasonals), standard additive updates with the
# new level inlined into the trend and seasonal steps so the SQL
# recursive CTE matches Spark's expression tree op-for-op (the Holt
# determinism contract). The fold is per-user (parallel across
# users); the seasonal array update rebuilds the 4-slot list each
# step — both engines evaluate CASE i = k per slot.
_HW_G = 0.2


@query(
    "holt_winters_event_values",
    oracle=f"""
    WITH RECURSIVE seq AS (
        SELECT user_id, list(value ORDER BY ts, event_id) AS vs,
               CAST(len(list(value)) AS BIGINT) AS n
        FROM events GROUP BY user_id
    ),
    rec AS (
        SELECT user_id, 0 AS t, 0.0::DOUBLE AS l, 0.0::DOUBLE AS b,
               [0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE, 0.0::DOUBLE] AS s,
               n, vs
        FROM seq
        UNION ALL
        SELECT user_id, t + 1,
               {_HOLT_A} * (vs[t + 1] - s[(t % 4) + 1])
                   + {1.0 - _HOLT_A} * (l + b),
               {_HOLT_B} * (({_HOLT_A} * (vs[t + 1] - s[(t % 4) + 1])
                             + {1.0 - _HOLT_A} * (l + b)) - l)
                   + {1.0 - _HOLT_B} * b,
               list_transform(range(1, 5), i ->
                   CASE WHEN i = (t % 4) + 1 THEN
                       {_HW_G} * (vs[t + 1]
                                  - ({_HOLT_A} * (vs[t + 1] - s[(t % 4) + 1])
                                     + {1.0 - _HOLT_A} * (l + b)))
                       + {1.0 - _HW_G} * s[(t % 4) + 1]
                   ELSE s[i] END),
               n, vs
        FROM rec WHERE t < n
    )
    SELECT user_id, n AS n_events, l AS level, b AS trend,
           s[1] AS s1, s[2] AS s2, s[3] AS s3, s[4] AS s4,
           l + b + s[(CAST(n AS INTEGER) % 4) + 1] AS forecast_1
    FROM rec WHERE t = n
    ORDER BY user_id
    """,
)
def holt_winters_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    seq = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vals = F.transform(F.col("evs"), lambda e: e["value"])
    zero4 = F.array(*[F.lit(0.0) for _ in range(4)])

    def step(acc, v):
        k = (acc["t"] % 4) + 1
        sp = F.element_at(acc["s"], k)
        new_l = F.lit(_HOLT_A) * (v - sp) + F.lit(1.0 - _HOLT_A) * (
            acc["l"] + acc["b"]
        )
        new_b = F.lit(_HOLT_B) * (new_l - acc["l"]) + F.lit(
            1.0 - _HOLT_B
        ) * acc["b"]
        new_s = F.transform(
            F.sequence(F.lit(1), F.lit(4)),
            lambda i: F.when(
                i == k,
                F.lit(_HW_G) * (v - new_l) + F.lit(1.0 - _HW_G) * sp,
            ).otherwise(F.element_at(acc["s"], i)),
        )
        return F.struct(
            (acc["t"] + 1).alias("t"),
            new_l.alias("l"),
            new_b.alias("b"),
            new_s.alias("s"),
        )

    r = F.aggregate(
        vals,
        F.struct(
            F.lit(0).alias("t"),
            F.lit(0.0).alias("l"),
            F.lit(0.0).alias("b"),
            zero4.alias("s"),
        ),
        step,
    )
    n = F.size("evs")
    return seq.select(
        "user_id",
        n.cast("bigint").alias("n_events"),
        r["l"].alias("level"),
        r["b"].alias("trend"),
        F.element_at(r["s"], 1).alias("s1"),
        F.element_at(r["s"], 2).alias("s2"),
        F.element_at(r["s"], 3).alias("s3"),
        F.element_at(r["s"], 4).alias("s4"),
        (
            r["l"] + r["b"] + F.element_at(r["s"], (n % 4) + 1)
        ).alias("forecast_1"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# Directly-follows graph with bottleneck latency (r7; process mining,
# van der Aalst "Process Mining" 2011, public): per user the
# ts-ordered event sequence yields (prev_type → type) transitions;
# per transition edge report frequency, mean gap (exact BIGINT
# seconds / fixed-order division) and MEDIAN gap (the bottleneck
# signal — percentile_disc rank rule inside each transition group).
# The per-transition median window partitions on the 25-edge domain
# — n/25 rows per group, parallel across edges (the trimmed-mean
# pattern); the lag window partitions per user.
@query(
    "dfg_bottleneck_events",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec,
               lag(event_type) OVER w AS prev_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) - lag(
                   CAST(FLOOR(epoch(ts)) AS BIGINT)) OVER w AS gap
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id)
    ),
    e AS (
        SELECT prev_type AS src, event_type AS dst, gap
        FROM seq WHERE prev_type IS NOT NULL
    ),
    r AS (
        SELECT src, dst, gap,
               row_number() OVER (
                   PARTITION BY src, dst ORDER BY gap) AS rn,
               COUNT(*) OVER (PARTITION BY src, dst) AS n
        FROM e
    )
    SELECT src, dst,
           CAST(MAX(n) AS BIGINT) AS n_transitions,
           CAST(SUM(gap) AS DOUBLE) / MAX(n) AS mean_gap_secs,
           CAST(MAX(CASE WHEN rn = greatest(1,
                CAST(ceil(0.5 * n) AS BIGINT)) THEN gap END) AS BIGINT)
               AS median_gap_secs
    FROM r
    GROUP BY src, dst
    ORDER BY src, dst
    """,
)
def dfg_bottleneck_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
    )
    wu = W.partitionBy("user_id").orderBy("sec", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(wu).alias("prev_type"),
        (F.col("sec") - F.lag("sec").over(wu)).alias("gap"),
    ).filter(F.col("prev_type").isNotNull())
    e = seq.select(
        F.col("prev_type").alias("src"),
        F.col("event_type").alias("dst"),
        "gap",
    )
    wt = W.partitionBy("src", "dst").orderBy("gap")
    wn = W.partitionBy("src", "dst")
    r = e.select(
        "src",
        "dst",
        "gap",
        F.row_number().over(wt).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return (
        r.groupBy("src", "dst")
        .agg(
            F.max("n").cast("bigint").alias("n_transitions"),
            (F.sum("gap").cast("double") / F.max("n")).alias(
                "mean_gap_secs"
            ),
            F.max(
                F.when(
                    F.col("rn")
                    == F.greatest(
                        F.lit(1),
                        F.ceil(F.lit(0.5) * F.col("n")).cast("bigint"),
                    ),
                    F.col("gap"),
                )
            )
            .cast("bigint")
            .alias("median_gap_secs"),
        )
        .orderBy("src", "dst")
    )


# ---------------------------------------------------------------------------
# Markov next-event prediction accuracy (r7): train a first-order
# transition model on even-indexed users (argmax next event per
# current event, ties to the lexicographically smaller type), then
# score it on held-out users' actual transitions — per-type
# accuracy, the eval twin of event_transition_matrix. Everything is
# exact counting: the model is a 25-cell argmax, scoring is one
# transition-keyed join; accuracy divides exact BIGINTs once.
@query(
    "markov_next_event_accuracy",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT), event_id
               ) AS next_type
        FROM events
    ),
    tr AS (
        SELECT user_id, event_type AS src, next_type AS dst
        FROM seq WHERE next_type IS NOT NULL
    ),
    model AS (
        SELECT src, dst AS predicted FROM (
            SELECT src, dst, COUNT(*) AS c,
                   row_number() OVER (
                       PARTITION BY src ORDER BY COUNT(*) DESC, dst
                   ) AS rk
            FROM tr WHERE user_id % 2 = 0
            GROUP BY src, dst
        ) WHERE rk = 1
    )
    SELECT t.src,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           MAX(m.predicted) AS predicted,
           CAST(SUM(CASE WHEN t.dst = m.predicted THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(SUM(CASE WHEN t.dst = m.predicted THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS accuracy
    FROM tr t JOIN model m ON t.src = m.src
    WHERE t.user_id % 2 = 1
    GROUP BY t.src
    ORDER BY t.src
    """,
)
def markov_next_event_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_timestamp("ts").alias("sec"),
    )
    wu = W.partitionBy("user_id").orderBy("sec", "event_id")
    tr = (
        ev.select(
            "user_id",
            F.col("event_type").alias("src"),
            F.lead("event_type").over(wu).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
    )
    wr = W.partitionBy("src").orderBy(F.col("c").desc(), F.col("dst"))
    model = (
        tr.filter(F.col("user_id") % 2 == 0)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") == 1)
        .select("src", F.col("dst").alias("predicted"))
    )
    held = tr.filter(F.col("user_id") % 2 == 1)
    return (
        held.join(F.broadcast(model), "src")
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.max("predicted").alias("predicted"),
            F.sum(
                F.when(F.col("dst") == F.col("predicted"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
            (
                F.sum(
                    F.when(F.col("dst") == F.col("predicted"), 1)
                    .otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("accuracy"),
        )
        .orderBy("src")
    )


# ---------------------------------------------------------------------------
# Calendar seasonality profile (r7): hour-of-day × day-of-week event
# counts with each cell's share of its weekday — the load-profile
# heatmap behind partition-sizing and trigger-scheduling decisions.
# One partial-combinable groupBy on the 168-cell calendar domain; the
# share divides exact BIGINTs in fixed order. UTC on both engines
# (session convention), so bucketing is identical.
@query(
    "seasonality_profile_events",
    oracle="""
    WITH c AS (
        SELECT CAST(EXTRACT(dow FROM ts) AS INT) AS dow,
               CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    d AS (SELECT dow, CAST(SUM(n) AS BIGINT) AS day_total FROM c GROUP BY 1)
    SELECT c.dow, c.hod, c.n,
           CAST(c.n AS DOUBLE) / d.day_total AS share_of_day
    FROM c JOIN d ON c.dow = d.dow
    ORDER BY c.dow, c.hod
    """,
)
def seasonality_profile_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dow: 0=Sunday..6
    c = ev.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hod"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    d = c.groupBy("dow").agg(F.sum("n").cast("bigint").alias("day_total"))
    return (
        c.join(d, "dow")
        .select(
            "dow",
            "hod",
            "n",
            (F.col("n").cast("double") / F.col("day_total")).alias(
                "share_of_day"
            ),
        )
        .orderBy("dow", "hod")
    )


# ---------------------------------------------------------------------------
# Cramér's V (r8): the chi-square association strength of
# (event_type × hour) reduced to one chance-corrected effect size —
# the statistic the contingency panel (chisq_type_hour_events)
# motivates but never collapses to. Per-cell chi2 contributions are
# micro-rounded to BIGINT BEFORE the total (sum-of-doubles order can
# never reach the hash — the corpus-LM discipline); V =
# sqrt(chi2 / (n·min(r−1, c−1))) composes the integer totals in one
# fixed-order float expression. Shuffle domain: the (type, hour)
# contingency cells, never events.
@query(
    "cramers_v_type_hour",
    oracle="""
    WITH cells AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, hr
    ),
    rt AS (SELECT event_type, CAST(SUM(n) AS BIGINT) AS row_n
           FROM cells GROUP BY event_type),
    ct AS (SELECT hr, CAST(SUM(n) AS BIGINT) AS col_n FROM cells GROUP BY hr),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM cells),
    contrib AS (
        SELECT CAST(ROUND(
                   (CAST(c.n AS DOUBLE)
                    - CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
                      / CAST(t.total AS DOUBLE))
                   * (CAST(c.n AS DOUBLE)
                      - CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
                        / CAST(t.total AS DOUBLE))
                   / (CAST(rt.row_n AS DOUBLE) * CAST(ct.col_n AS DOUBLE)
                      / CAST(t.total AS DOUBLE))
                   * 1000000.0) AS BIGINT) AS c_micro
        FROM cells c
        JOIN rt USING (event_type) JOIN ct USING (hr) CROSS JOIN tot t
    )
    SELECT t.total AS n,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM rt) AS n_rows,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ct) AS n_cols,
           CAST(SUM(c_micro) AS DOUBLE) / 1000000.0 AS chi2,
           sqrt(CAST(SUM(c_micro) AS DOUBLE) / 1000000.0
                / (CAST(t.total AS DOUBLE)
                   * CAST(LEAST((SELECT COUNT(*) FROM rt) - 1,
                                (SELECT COUNT(*) FROM ct) - 1) AS DOUBLE)))
               AS cramers_v
    FROM contrib CROSS JOIN tot t
    GROUP BY t.total
    """,
)
def cramers_v_type_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hr")
    ).agg(F.count(F.lit(1)).alias("n"))
    cells = cells.persist()
    rt = cells.groupBy("event_type").agg(F.sum("n").alias("row_n"))
    ct = cells.groupBy("hr").agg(F.sum("n").alias("col_n"))
    tot = cells.agg(F.sum("n").cast("bigint").alias("total"))
    dims = rt.agg(F.count(F.lit(1)).cast("bigint").alias("n_rows")).crossJoin(
        ct.agg(F.count(F.lit(1)).cast("bigint").alias("n_cols"))
    )
    expected = (
        F.col("row_n").cast("double")
        * F.col("col_n").cast("double")
        / F.col("total").cast("double")
    )
    diff = F.col("n").cast("double") - expected
    contrib = (
        cells.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "hr")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(diff * diff / expected * F.lit(1e6))
            .cast("bigint")
            .alias("c_micro"),
            "total",
        )
    )
    out = (
        contrib.groupBy("total")
        .agg(F.sum("c_micro").cast("bigint").alias("s_micro"))
        .crossJoin(F.broadcast(dims))
        .select(
            F.col("total").alias("n"),
            "n_rows",
            "n_cols",
            (F.col("s_micro").cast("double") / F.lit(1e6)).alias("chi2"),
            F.sqrt(
                F.col("s_micro").cast("double")
                / F.lit(1e6)
                / (
                    F.col("total").cast("double")
                    * F.least(
                        F.col("n_rows") - 1, F.col("n_cols") - 1
                    ).cast("double")
                )
            ).alias("cramers_v"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# Top movers (r8): the period-over-period triage view — which users'
# activity changed most between the two halves of the observed range
# (the integer midpoint convention shared with did_estimator_events).
# One groupBy with conditional counts; top-20 by (|Δ|, user) via
# TakeOrdered. The panel an on-call analyst opens before dashboards:
# WHO moved, not just THAT the aggregate moved.
@query(
    "top_movers_users",
    oracle="""
    WITH base AS (
        SELECT user_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS s
        FROM events
    ), mid AS (
        SELECT CAST((MIN(s) + MAX(s)) / 2 AS BIGINT) AS m FROM base
    ), per_user AS (
        SELECT user_id,
               CAST(SUM(CASE WHEN s < (SELECT m FROM mid)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_first,
               CAST(SUM(CASE WHEN s >= (SELECT m FROM mid)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_second
        FROM base GROUP BY user_id
    )
    SELECT CAST(user_id AS BIGINT) AS user_id, n_first, n_second,
           n_second - n_first AS delta
    FROM per_user
    ORDER BY abs(n_second - n_first) DESC, user_id
    LIMIT 20
    """,
)
def top_movers_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").cast("bigint").alias("s")
    )
    mid = ev.agg(
        ((F.min("s") + F.max("s")) / F.lit(2)).cast("bigint").alias("m")
    )
    per_user = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("s") < F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_first"),
            F.sum(F.when(F.col("s") >= F.col("m"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_second"),
        )
    )
    delta = F.col("n_second") - F.col("n_first")
    return (
        per_user.select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "n_first",
            "n_second",
            delta.alias("delta"),
        )
        .orderBy(F.abs(F.col("delta")).desc(), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Bounce rate by entry point (r8): of the sessions OPENED with each
# event type, what fraction ended after that single event — the
# engagement read-out session_paths/funnels sit on top of. Sessions
# come from the shared gap rule (30-min, integer µs, event_id
# tiebreak); the opener is an exact struct-min over (ts, event_id).
@query(
    "bounce_rate_events",
    oracle="""
    WITH s AS (
        SELECT user_id, event_id, event_type, ts_us,
               SUM(CASE WHEN prev_us IS NULL
                        OR ts_us - prev_us > 1800000000
                        THEN 1 ELSE 0 END)
                 OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS session_id
        FROM (
            SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                   lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                           ORDER BY epoch_us(ts),
                                                    event_id) AS prev_us
            FROM events
        ) t
    ), sess AS (
        SELECT user_id, session_id,
               MIN(struct_pack(ts_us := ts_us, event_id := event_id,
                               t := event_type)).t AS entry_type,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM s GROUP BY 1, 2
    )
    SELECT entry_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS bounce_rate
    FROM sess
    GROUP BY entry_type
    ORDER BY entry_type
    """,
)
def bounce_rate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sessionize import sessionize

    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    with_sid = sessionize(
        ev,
        keys=["user_id"],
        ts_col="ts_us",
        gap=1800000000,
        tiebreak=["event_id"],
    )
    sess = with_sid.groupBy("user_id", "session_id").agg(
        F.min(F.struct("ts_us", "event_id", F.col("event_type").alias("t")))[
            "t"
        ].alias("entry_type"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    return (
        sess.groupBy("entry_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounces"),
            (
                F.sum(
                    F.when(F.col("n_events") == 1, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("bounce_rate"),
        )
        .orderBy("entry_type")
    )


# ---------------------------------------------------------------------------
# Growth accounting (r8): the weekly new / retained / resurrected /
# churned decomposition — the standard growth ledger that explains
# WHY the active-user line moved (its identity: active(w) = new +
# retained + resurrected; churned(w) = active(w−1) − retained(w)).
# One distinct (user, week) relation drives everything: first-week
# via min, week-over-week presence via a (user, week−1) self-join —
# user-keyed shuffles only.
@query(
    "growth_accounting_weekly",
    oracle="""
    WITH uw AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 604800)
                    AS BIGINT) AS w
        FROM events
    ), firsts AS (
        SELECT user_id, MIN(w) AS w0 FROM uw GROUP BY 1
    ), flags AS (
        SELECT uw.user_id, uw.w,
               f.w0 = uw.w AS is_new,
               p.user_id IS NOT NULL AS was_prev
        FROM uw
        JOIN firsts f ON f.user_id = uw.user_id
        LEFT JOIN uw p ON p.user_id = uw.user_id AND p.w = uw.w - 1
    ), act AS (
        SELECT w,
               CAST(COUNT(*) AS BIGINT) AS active,
               CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
                 AS new_users,
               CAST(SUM(CASE WHEN was_prev THEN 1 ELSE 0 END) AS BIGINT)
                 AS retained,
               CAST(SUM(CASE WHEN NOT is_new AND NOT was_prev
                             THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
        FROM flags GROUP BY w
    )
    SELECT a.w AS week,
           a.active, a.new_users, a.retained, a.resurrected,
           COALESCE(prev.active, 0) - a.retained AS churned
    FROM act a LEFT JOIN act prev ON prev.w = a.w - 1
    ORDER BY week
    """,
)
def growth_accounting_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts").cast("bigint") / F.lit(604800))
        .cast("bigint")
        .alias("w"),
    ).distinct()
    firsts = uw.groupBy("user_id").agg(F.min("w").alias("w0"))
    prev = uw.select("user_id", (F.col("w") + 1).alias("w")).withColumn(
        "was_prev", F.lit(True)
    )
    flags = (
        uw.join(firsts, "user_id")
        .join(prev, ["user_id", "w"], "left")
        .select(
            "w",
            (F.col("w0") == F.col("w")).alias("is_new"),
            F.coalesce("was_prev", F.lit(False)).alias("was_prev"),
        )
    )
    act = flags.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("active"),
        F.sum(F.when(F.col("is_new"), 1).otherwise(0))
        .cast("bigint")
        .alias("new_users"),
        F.sum(F.when(F.col("was_prev"), 1).otherwise(0))
        .cast("bigint")
        .alias("retained"),
        F.sum(
            F.when(~F.col("is_new") & ~F.col("was_prev"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("resurrected"),
    )
    p = act.select(
        (F.col("w") + 1).alias("w"), F.col("active").alias("prev_active")
    )
    return (
        act.join(p, "w", "left")
        .select(
            F.col("w").alias("week"),
            "active",
            "new_users",
            "retained",
            "resurrected",
            (F.coalesce("prev_active", F.lit(0)) - F.col("retained")).alias(
                "churned"
            ),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# Peak detection (r8): hours whose activity is a LOCAL MAXIMUM with
# sufficient prominence (strictly above both neighbors and ≥ 1.5× the
# type's median hourly count) — the alerting read-out between raw
# counts and changepoint/CUSUM: WHERE did load spike, per type. The
# lag/lead window runs over the hourly AGGREGATE (bounded hour
# domain); the exact median comes from the same counts relation.
@query(
    "peak_hours_events",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 3600) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, m FROM (
            SELECT event_type, c AS m,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY c, h) AS r,
                   COUNT(*) OVER (PARTITION BY event_type) AS n
            FROM hourly
        ) WHERE r = CAST(CEIL(n / 2.0) AS BIGINT)
    ), nb AS (
        SELECT event_type, h, c,
               lag(c) OVER (PARTITION BY event_type ORDER BY h) AS prev_c,
               lead(c) OVER (PARTITION BY event_type ORDER BY h) AS next_c
        FROM hourly
    )
    SELECT nb.event_type, nb.h AS hour_idx, nb.c AS n_events,
           med.m AS median_hourly,
           CAST(nb.c AS DOUBLE) / med.m AS prominence
    FROM nb JOIN med ON med.event_type = nb.event_type
    WHERE nb.prev_c IS NOT NULL AND nb.next_c IS NOT NULL
      AND nb.c > nb.prev_c AND nb.c > nb.next_c
      AND CAST(nb.c AS DOUBLE) >= 1.5 * med.m
    ORDER BY nb.event_type, nb.h
    """,
)
def peak_hours_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.unix_timestamp("ts").cast("bigint") / F.lit(3600))
        .cast("bigint")
        .alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wm = Window.partitionBy("event_type").orderBy("c", "h")
    med = (
        hourly.withColumn("r", F.row_number().over(wm))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        .filter(F.col("r") == F.ceil(F.col("n") / F.lit(2.0)).cast("bigint"))
        .select("event_type", F.col("c").alias("m"))
    )
    wh = Window.partitionBy("event_type").orderBy("h")
    nb = hourly.select(
        "event_type",
        "h",
        "c",
        F.lag("c").over(wh).alias("prev_c"),
        F.lead("c").over(wh).alias("next_c"),
    )
    return (
        nb.join(med, "event_type")
        .filter(
            F.col("prev_c").isNotNull()
            & F.col("next_c").isNotNull()
            & (F.col("c") > F.col("prev_c"))
            & (F.col("c") > F.col("next_c"))
            & (F.col("c").cast("double") >= F.lit(1.5) * F.col("m"))
        )
        .select(
            "event_type",
            F.col("h").alias("hour_idx"),
            F.col("c").alias("n_events"),
            F.col("m").alias("median_hourly"),
            (F.col("c").cast("double") / F.col("m")).alias("prominence"),
        )
        .orderBy("event_type", "hour_idx")
    )


# ---------------------------------------------------------------------------
# Conformance checking (r8): the process-mining step ABOVE the
# discovery views (dfg_bottleneck, eventually_follows) — replay every
# trace against a declared process model and report where reality
# deviates. The model here is derived deterministically (the 8 most
# frequent observed transitions = "the happy paths", ranked
# (count, src, dst)); a deviation is any adjacent transition outside
# it. Output: the top-10 deviating transitions with occurrence and
# affected-trace counts — the worklist a process owner triages.
# Transitions come from one per-user lag window (user-keyed, real
# cardinality); everything after is transition-domain.
@query(
    "conformance_deviations_events",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_id)
                 AS prev_type
        FROM events
    ), trans AS (
        SELECT user_id, prev_type AS src, event_type AS dst
        FROM seq WHERE prev_type IS NOT NULL
    ), freq AS (
        SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
        FROM trans GROUP BY 1, 2
    ), model AS (
        SELECT src, dst FROM (
            SELECT src, dst,
                   ROW_NUMBER() OVER (ORDER BY c DESC, src, dst) AS r
            FROM freq
        ) WHERE r <= 8
    ), dev AS (
        SELECT t.src, t.dst, t.user_id
        FROM trans t LEFT JOIN model m
          ON m.src = t.src AND m.dst = t.dst
        WHERE m.src IS NULL
    )
    SELECT src, dst,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_traces
    FROM dev
    GROUP BY src, dst
    ORDER BY n_occurrences DESC, src, dst
    LIMIT 10
    """,
)
def conformance_deviations_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros("ts")
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    trans = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .select(
            "user_id",
            F.col("prev_type").alias("src"),
            F.col("event_type").alias("dst"),
        )
    )
    freq = trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wm = Window.orderBy(F.col("c").desc(), "src", "dst")
    model = (
        freq.withColumn("r", F.row_number().over(wm))
        .filter(F.col("r") <= 8)
        .select("src", "dst")
    )
    dev = trans.join(F.broadcast(model), ["src", "dst"], "left_anti")
    return (
        dev.groupBy("src", "dst")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
            F.countDistinct("user_id").cast("bigint").alias("n_traces"),
        )
        .orderBy(F.col("n_occurrences").desc(), "src", "dst")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Timezone-shifted daily rollup (r8): the classic reporting bug made
# visible — daily counts under UTC vs UTC+05:30 day boundaries, side
# by side with the reassignment delta. Day indices are pure integer
# arithmetic on epoch seconds (no session-timezone dependence — the
# rollup is reproducible on any cluster config, which IS the point).
@query(
    "tz_daily_rollup_events",
    oracle="""
    WITH base AS (
        SELECT CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 86400)
                    AS BIGINT) AS day_utc,
               CAST(FLOOR((CAST(FLOOR(epoch(ts)) AS BIGINT) + 19800)
                          / 86400) AS BIGINT) AS day_ist
        FROM events
    ), u AS (
        SELECT day_utc AS day, CAST(COUNT(*) AS BIGINT) AS n_utc
        FROM base GROUP BY 1
    ), i AS (
        SELECT day_ist AS day, CAST(COUNT(*) AS BIGINT) AS n_ist
        FROM base GROUP BY 1
    )
    SELECT COALESCE(u.day, i.day) AS day_idx,
           COALESCE(u.n_utc, 0) AS n_utc,
           COALESCE(i.n_ist, 0) AS n_ist,
           COALESCE(i.n_ist, 0) - COALESCE(u.n_utc, 0) AS delta
    FROM u FULL OUTER JOIN i ON i.day = u.day
    ORDER BY day_idx
    """,
)
def tz_daily_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").cast("bigint").alias("s")
    )
    base = ev.select(
        F.floor(F.col("s") / F.lit(86400)).cast("bigint").alias("day_utc"),
        F.floor((F.col("s") + F.lit(19800)) / F.lit(86400))
        .cast("bigint")
        .alias("day_ist"),
    )
    u = base.groupBy(F.col("day_utc").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_utc")
    )
    i = base.groupBy(F.col("day_ist").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ist")
    )
    return (
        u.join(i, "day", "full_outer")
        .select(
            F.col("day").alias("day_idx"),
            F.coalesce("n_utc", F.lit(0)).cast("bigint").alias("n_utc"),
            F.coalesce("n_ist", F.lit(0)).cast("bigint").alias("n_ist"),
            (
                F.coalesce("n_ist", F.lit(0)) - F.coalesce("n_utc", F.lit(0))
            )
            .cast("bigint")
            .alias("delta"),
        )
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# Activity streaks (r8): longest run of CONSECUTIVE active days per
# user — the engagement metric behind every "7-day streak" badge.
# Classic gaps-and-islands on the distinct (user, day) relation
# (island id = day − per-user row_number; user-keyed windows, real
# cardinality), then the longest island per user; top-20 streaks
# with deterministic tie-breaks.
@query(
    "activity_streaks_users",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(FLOOR(CAST(FLOOR(epoch(ts)) AS BIGINT) / 86400)
                    AS BIGINT) AS d
        FROM events
    ), isl AS (
        SELECT user_id, d,
               d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                 AS grp
        FROM ud
    ), streaks AS (
        SELECT user_id, grp,
               CAST(COUNT(*) AS BIGINT) AS len,
               CAST(MIN(d) AS BIGINT) AS start_day
        FROM isl GROUP BY 1, 2
    ), best AS (
        SELECT user_id, len, start_day,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, start_day) AS r
        FROM streaks
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           len AS longest_streak_days, start_day
    FROM best WHERE r = 1
    ORDER BY longest_streak_days DESC, user_id
    LIMIT 20
    """,
)
def activity_streaks_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ud = ev.select(
        "user_id",
        F.floor(F.unix_timestamp("ts").cast("bigint") / F.lit(86400))
        .cast("bigint")
        .alias("d"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    isl = ud.withColumn("grp", F.col("d") - F.row_number().over(w))
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("len"),
        F.min("d").cast("bigint").alias("start_day"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), "start_day"
    )
    return (
        streaks.withColumn("r", F.row_number().over(wb))
        .filter(F.col("r") == 1)
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.col("len").alias("longest_streak_days"),
            "start_day",
        )
        .orderBy(F.col("longest_streak_days").desc(), "user_id")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Nelson–Aalen cumulative hazard (Nelson 1972 / Aalen 1978, public) —
# the estimator sibling of km_survival_events on the SAME
# inter-event/censoring construction: H(t) = Σ_{s≤t} d_s/n_s, with
# Aalen's variance Σ d_s/n_s². Each hazard increment is nano-rounded
# to a BIGINT before the ordered cumulative sum (the km micro-log
# discipline), so the running sums are exact on both engines. The
# Breslow survivor exp(−H) is left to the consumer — km_survival's
# log-domain rule: libm exp is not correctly rounded, so transformed
# outputs stay out of the hashed contract. First 40 event times.
@query(
    "nelson_aalen_events",
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
               nxt IS NOT NULL AS is_event
        FROM seq CROSS JOIN m
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    per AS (
        SELECT t,
               CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_events,
               CAST(COUNT(*) AS BIGINT) AS n_leaving
        FROM obs GROUP BY t
    ),
    risk AS (
        SELECT t, n_events,
               tot.n - (SUM(n_leaving) OVER (ORDER BY t
                            ROWS UNBOUNDED PRECEDING) - n_leaving)
                   AS n_risk
        FROM per CROSS JOIN tot
    ),
    inc AS (
        SELECT t, n_events, n_risk,
               CAST(ROUND(CAST(n_events AS DOUBLE)
                          / CAST(n_risk AS DOUBLE)
                          * 1000000000.0) AS BIGINT) AS h_nano,
               CAST(ROUND(CAST(n_events AS DOUBLE)
                          / (CAST(n_risk AS DOUBLE)
                             * CAST(n_risk AS DOUBLE))
                          * 1000000000.0) AS BIGINT) AS v_nano
        FROM risk WHERE n_events > 0
    ),
    cum AS (
        SELECT t, n_events, n_risk,
               CAST(SUM(h_nano) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ch,
               CAST(SUM(v_nano) OVER (ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cv
        FROM inc
    )
    SELECT t, n_risk, n_events,
           CAST(ch AS DOUBLE) / 1000000000.0 AS cum_hazard,
           CAST(cv AS DOUBLE) / 1000000000.0 AS hazard_var
    FROM cum
    ORDER BY t
    LIMIT 40
    """,
)
def nelson_aalen_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
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
    )
    tot = obs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    per = obs.groupBy("t").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_leaving"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = per.crossJoin(F.broadcast(tot)).select(
        "t",
        "n_events",
        (
            F.col("n")
            - (F.sum("n_leaving").over(wcum) - F.col("n_leaving"))
        ).alias("n_risk"),
    )
    nd = F.col("n_events").cast("double")
    rd = F.col("n_risk").cast("double")
    inc = risk.filter(F.col("n_events") > 0).select(
        "t",
        "n_events",
        "n_risk",
        F.round(nd / rd * 1000000000.0).cast("bigint").alias("h_nano"),
        F.round(nd / (rd * rd) * 1000000000.0).cast("bigint").alias("v_nano"),
    )
    cum = inc.select(
        "t",
        "n_events",
        "n_risk",
        F.sum("h_nano").over(wcum).cast("bigint").alias("ch"),
        F.sum("v_nano").over(wcum).cast("bigint").alias("cv"),
    )
    return (
        cum.select(
            "t",
            "n_risk",
            "n_events",
            (F.col("ch").cast("double") / 1000000000.0).alias("cum_hazard"),
            (F.col("cv").cast("double") / 1000000000.0).alias("hazard_var"),
        )
        .orderBy("t")
        .limit(40)
    )
