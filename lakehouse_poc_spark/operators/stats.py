"""ANALYZE-style table statistics in one pass: per-column row count,
null count, exact NDV, min and max — the inputs a cost-based
optimizer (and a data engineer eyeballing a new table) wants.

Scale shape: ONE wide aggregate over the scan. Multiple exact
count-distincts compile to a single Expand + two-stage aggregate —
one shuffle total, bytes ∝ distinct values — never one job per
column (the anti-pattern this replaces). For quick profiling of a
100 TB table swap ``approx_count_distinct`` in via ``approx=True``
(HLL, map-side combinable, no Expand blow-up, not oracle-exact).

Output is long-format (one row per column) with min/max rendered as
strings so heterogeneous column types coexist; dates format as
yyyy-MM-dd, matching the SQL oracle side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _render(col: F.Column, dtype: T.DataType) -> F.Column:
    if isinstance(dtype, T.DateType):
        return F.date_format(col, "yyyy-MM-dd")
    if isinstance(dtype, T.TimestampType):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def analyze_table(df: DataFrame, columns: list[str], approx: bool = False) -> DataFrame:
    """One-pass per-column profile: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value), one output row per column,
    sorted by column name."""
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n_rows")]
    for c in columns:
        ndv = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"__nulls_{c}"),
            ndv.cast("bigint").alias(f"__ndv_{c}"),
            _render(F.min(c), dtypes[c]).alias(f"__min_{c}"),
            _render(F.max(c), dtypes[c]).alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.selectExpr(
        "stack({}, {}) as (column, n_nulls, n_distinct, min_value, max_value)".format(
            len(columns),
            ", ".join(
                f"'{c}', __nulls_{c}, __ndv_{c}, __min_{c}, __max_{c}"
                for c in columns
            ),
        ),
        "__n_rows as n_rows",
    )
    return stacked.select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    ).orderBy("column")



def exact_quantiles(
    df: DataFrame, value_col: str, qs: list[float], block: "F.Column"
) -> DataFrame:
    """EXACT global order statistics without a global sort: (q, value)
    rows where value is percentile_disc(q) — the smallest v whose
    cumulative fraction of rows is ≥ q (1-based rank ⌈q·n⌉, min 1).

    ``percentile_disc`` / a global ``orderBy`` funnels the whole
    column through one task at 100 TB; approx_percentile trades the
    exactness away. This is the two-pass blocked selection instead:

    1. count rows per value-range block (one agg; #blocks rows to the
       driver — ``block`` must be a monotone function of the value
       with driver-bounded cardinality, e.g. ``floor(v/width)``);
    2. the driver walks the cumulative counts to find, per quantile,
       the block holding rank ⌈q·n⌉ and its in-block local rank; one
       more job ranks ONLY the needed blocks (window partitioned by
       block — each sort is block-sized, never table-sized) and joins
       the (block, local_rank, q) targets.

    Because ``block`` is a function of the value, ties always land in
    one block and blocked selection is exactly global selection.
    Nulls are excluded (SQL percentile semantics).
    """
    import math

    spark = df.sparkSession
    b = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__blk", block)
        .select(F.col(value_col).alias("__v"), "__blk")
    )
    counts = sorted(
        (r["__blk"], r["n"])
        for r in b.groupBy("__blk").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n = sum(c for _, c in counts)
    targets = []  # (blk, local_rank, q)
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile {q} outside [0, 1]")
        rank = max(1, math.ceil(q * n))
        acc = 0
        for blk, c in counts:
            if acc + c >= rank:
                targets.append((blk, rank - acc, float(q)))
                break
            acc += c
    tgt = spark.createDataFrame(
        targets,
        T.StructType(
            [
                T.StructField("__blk", b.schema["__blk"].dataType),
                T.StructField("__lr", T.LongType()),
                T.StructField("q", T.DoubleType()),
            ]
        ),
    )
    needed = [t[0] for t in targets]
    w = Window.partitionBy("__blk").orderBy("__v")
    ranked = (
        b.filter(F.col("__blk").isin(needed))
        .withColumn("__lr", F.row_number().over(w).cast("long"))
    )
    return (
        ranked.join(F.broadcast(tgt), ["__blk", "__lr"])
        .select("q", F.col("__v").alias("value"))
    )


def welch_ttest(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    crit: float = 1.96,
) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (Welch 1947,
    public) — the A/B-test workhorse: did treatment move the metric?

    Returns ONE row: per-group n/mean/variance, the t statistic, the
    Welch–Satterthwaite degrees of freedom, and a |t| > ``crit``
    significance flag (1.96 ≈ two-sided 5% at large df).

    Determinism: the only order-dependent quantities are the sums of
    value and value² — both accumulate in DECIMAL(30,6) (exact,
    commutative) and cast to double once; every downstream op
    (±, ×, ÷, sqrt) is IEEE-correctly-rounded, so results are
    bit-identical on any engine and any partitioning, with no
    micro-rounding needed.

    Scale shape: one map-side-combined aggregate over the scan, a
    2-row intermediate, scalar arithmetic after. Nothing else moves.
    """
    filt = df.filter(F.col(group_col).isin([group_a, group_b]))
    per = filt.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(30,6)")).alias("sx"),
        F.sum(
            (F.col(value_col) * F.col(value_col)).cast("decimal(30,6)")
        ).alias("sx2"),
    )

    def side(g, tag):
        return per.filter(F.col(group_col) == g).select(
            F.col("n").alias(f"n_{tag}"),
            F.col("sx").cast("double").alias(f"sx_{tag}"),
            F.col("sx2").cast("double").alias(f"sx2_{tag}"),
        )

    j = side(group_a, "a").crossJoin(side(group_b, "b"))

    def stats(tag):
        n = F.col(f"n_{tag}").cast("double")
        mean = F.col(f"sx_{tag}") / n
        var = (F.col(f"sx2_{tag}") - F.col(f"sx_{tag}") * mean) / (n - 1)
        return mean, var

    mean_a, var_a = stats("a")
    mean_b, var_b = stats("b")
    se_a = var_a / F.col("n_a").cast("double")
    se_b = var_b / F.col("n_b").cast("double")
    t = (mean_a - mean_b) / F.sqrt(se_a + se_b)
    dof = (se_a + se_b) * (se_a + se_b) / (
        se_a * se_a / (F.col("n_a").cast("double") - 1)
        + se_b * se_b / (F.col("n_b").cast("double") - 1)
    )
    return j.select(
        F.lit(str(group_a)).alias("group_a"),
        F.lit(str(group_b)).alias("group_b"),
        "n_a",
        "n_b",
        mean_a.alias("mean_a"),
        mean_b.alias("mean_b"),
        var_a.alias("var_a"),
        var_b.alias("var_b"),
        t.alias("t_stat"),
        dof.alias("dof"),
        (F.abs(t) > F.lit(crit)).alias("significant"),
    )


def km_survival(
    durations: DataFrame,
    duration_col: str = "duration",
    event_col: str = "is_event",
) -> DataFrame:
    """Kaplan–Meier product-limit estimator (Kaplan & Meier 1958,
    public) over right-censored durations: rows are observations with
    an integer ``duration`` and ``is_event`` (true = the event
    happened, false = censored at that duration).

    Returns one row per distinct duration t: (t, n_risk, n_events,
    n_censored, log_surv_micro, log_survival) where log_survival is
    ln Ŝ(t) = Σ_{t_i ≤ t} ln(1 − d_i/n_i). Determinism: each step's
    ln factor micro-rounds to BIGINT before the cumulative INTEGER
    sum (the logp_micro convention), so the estimate hash-matches on
    any engine; the survival curve itself is exp(log_survival) —
    left to the caller because exp is libm-variable cross-engine.
    If the risk set is absorbed (d_i == n_i, Ŝ hits exactly 0),
    log_survival is NULL from that step on.

    Scale shape: one duration-keyed aggregation collapses the
    observation table to ≤ #distinct-durations rows; the cumulative
    window runs over that tiny aggregate (duration grain bounds it —
    hours/days — never the observation count).
    """
    per_t = durations.groupBy(F.col(duration_col).alias("t")).agg(
        F.sum(F.when(F.col(event_col), 1).otherwise(0))
        .cast("bigint")
        .alias("n_events"),
        F.sum(F.when(F.col(event_col), 0).otherwise(1))
        .cast("bigint")
        .alias("n_censored"),
    )
    w = Window.orderBy("t")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = durations.count()
    out = per_t.withColumn(
        "n_risk",
        F.lit(total).cast("bigint")
        - (
            F.sum(F.col("n_events") + F.col("n_censored")).over(wcum)
            - (F.col("n_events") + F.col("n_censored"))
        ),
    )
    factor = F.when(
        F.col("n_events") < F.col("n_risk"),
        F.round(
            F.log(
                F.lit(1.0)
                - F.col("n_events").cast("double")
                / F.col("n_risk").cast("double")
            )
            * F.lit(1_000_000.0)
        ).cast("bigint"),
    )
    out = out.withColumn("__f", factor).withColumn(
        "__absorbed",
        F.max((F.col("n_events") >= F.col("n_risk")).cast("int")).over(wcum),
    )
    return (
        out.withColumn("log_surv_micro", F.sum("__f").over(wcum))
        .select(
            "t",
            "n_risk",
            "n_events",
            "n_censored",
            F.when(F.col("__absorbed") == 0, F.col("log_surv_micro")).alias(
                "log_surv_micro"
            ),
            F.when(
                F.col("__absorbed") == 0,
                F.col("log_surv_micro").cast("double") / F.lit(1_000_000.0),
            ).alias("log_survival"),
        )
        .orderBy("t")
    )


def blocked_cumsum(
    df: DataFrame,
    sort_col: str,
    value_col: str,
    block: "F.Column",
    out_col: str = "cum",
) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over ``sort_col`` order
    WITHOUT a global window: per-block partial sums collect to the
    driver (block cardinality is bounded by construction — it is a
    coarsening of the sort key), and each row gets its block's offset
    plus an in-block window sum. Bit-identical to the single-reducer
    ``SUM() OVER (ORDER BY …)`` at any partitioning — the cumulative
    twin of linkage.global_rank. ``block`` must coarsen ``sort_col``
    (block boundaries respect the sort order)."""
    b = df.withColumn("__blk", block)
    sums = sorted(
        (r["__blk"], r["s"])
        for r in b.groupBy("__blk")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for blk, sv in sums:
        offsets.append((blk, acc))
        acc += sv
    spark = df.sparkSession
    off = spark.createDataFrame(offsets, ["__blk", "__off"])
    w = (
        Window.partitionBy("__blk")
        .orderBy(sort_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        b.join(F.broadcast(off), "__blk")
        .withColumn(
            out_col,
            F.coalesce(F.sum(value_col).over(w), F.lit(0)) + F.col("__off"),
        )
        .drop("__blk", "__off")
    )


def auc_exact(
    scored: DataFrame, score_col: str, label_col: str, block: "F.Column"
) -> DataFrame:
    """Exact ROC AUC via the Mann–Whitney U statistic with midranks
    (the tie-correct formulation): one row
    (n_pos, n_neg, u2 = 2·U, auc). All rank arithmetic stays in
    doubled integers (midrank·2 is always integral), so the only
    float op is the final division — hash-exact on any engine.

    Scale shape: one (score → count, positives) aggregation collapses
    the corpus to distinct scores; the prefix sum over that relation
    uses :func:`blocked_cumsum` (no global window); the rest is one
    tiny aggregate."""
    per = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum(F.when(F.col(label_col), 1).otherwise(0))
        .cast("bigint")
        .alias("p"),
    )
    per = blocked_cumsum(per, "s", "c", block, out_col="cum_before")
    # midrank·2 of a tie group at [cum_before+1 .. cum_before+c]
    contrib = per.select(
        (F.col("p") * (2 * F.col("cum_before") + F.col("c") + 1)).alias(
            "pos_rank2"
        ),
        "p",
        (F.col("c") - F.col("p")).alias("n"),
    ).agg(
        F.sum("pos_rank2").cast("bigint").alias("sum_rank2"),
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum("n").cast("bigint").alias("n_neg"),
    )
    return contrib.select(
        "n_pos",
        "n_neg",
        (F.col("sum_rank2") - F.col("n_pos") * (F.col("n_pos") + 1)).alias(
            "u2"
        ),
        (
            (
                F.col("sum_rank2") - F.col("n_pos") * (F.col("n_pos") + 1)
            ).cast("double")
            / (F.lit(2.0) * F.col("n_pos").cast("double") * F.col("n_neg").cast("double"))
        ).alias("auc"),
    )


def exact_group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    block: "F.Column",
) -> DataFrame:
    """Per-GROUP exact order statistics without per-group sorts — the
    grouped twin of :func:`exact_quantiles`: (group, q, value) rows
    where value is the group's percentile_disc(q) (smallest v whose
    within-group rank ≥ ⌈q·n_g⌉, min 1).

    A window partitioned by a LOW-cardinality group (a handful of
    event types over billions of rows) is the skew trap: one reducer
    per group sorts the group's whole slice. Blocked selection keeps
    the shuffle keyed on (group, value-block) instead: counts per
    (group, block) come back to the driver (groups × blocks rows — a
    blocking-key contract, thousands not billions), the driver finds
    each target's (block, local rank), and one more job ranks ONLY
    the needed (group, block) slices — each sort is block-sized.
    ``block`` must be a monotone function of the value, as in the
    global variant. Nulls are excluded (SQL percentile semantics)."""
    import math

    spark = df.sparkSession
    b = (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__blk", block)
        .select(
            F.col(group_col).alias("__g"),
            F.col(value_col).alias("__v"),
            "__blk",
        )
    )
    counts: dict = {}
    for r in (
        b.groupBy("__g", "__blk").agg(F.count(F.lit(1)).alias("n")).collect()
    ):
        counts.setdefault(r["__g"], []).append((r["__blk"], r["n"]))
    targets = []  # (g, blk, local_rank, q)
    for g, blocks in counts.items():
        blocks.sort()
        n = sum(c for _, c in blocks)
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantile {q} outside [0, 1]")
            rank = max(1, math.ceil(q * n))
            acc = 0
            for blk, c in blocks:
                if acc + c >= rank:
                    targets.append((g, blk, rank - acc, float(q)))
                    break
                acc += c
    tgt = spark.createDataFrame(
        targets,
        T.StructType(
            [
                T.StructField("__g", b.schema["__g"].dataType),
                T.StructField("__blk", b.schema["__blk"].dataType),
                T.StructField("__lr", T.LongType()),
                T.StructField("q", T.DoubleType()),
            ]
        ),
    )
    needed = {(t[0], t[1]) for t in targets}
    need_df = F.broadcast(
        spark.createDataFrame(
            sorted(needed),
            T.StructType(
                [
                    T.StructField("__g", b.schema["__g"].dataType),
                    T.StructField("__blk", b.schema["__blk"].dataType),
                ]
            ),
        )
    )
    w = Window.partitionBy("__g", "__blk").orderBy("__v")
    ranked = b.join(need_df, ["__g", "__blk"]).withColumn(
        "__lr", F.row_number().over(w).cast("long")
    )
    return ranked.join(F.broadcast(tgt), ["__g", "__blk", "__lr"]).select(
        F.col("__g").alias(group_col), "q", F.col("__v").alias("value")
    )
