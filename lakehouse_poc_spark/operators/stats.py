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

from pyspark.sql import DataFrame
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

