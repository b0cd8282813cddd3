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
