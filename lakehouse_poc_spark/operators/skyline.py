"""2D skyline (Pareto frontier) as a distributed sweep, not a
dominance self-join.

The reference engine family exposes dominance/top-k analytics over its
tables (SURVEY.md §2 analytics surface); the skyline is the classic
one Spark lacks as a built-in. The naive formulation is a quadratic
NOT EXISTS self-join (that is exactly what the DuckDB oracle runs);
this operator computes the identical frontier with one aggregation and
one partitioned window via the 2D sweep:

  keep a point (x, y) — x minimized, y maximized — iff
    (a) y equals the max y among points with the SAME x, and
    (b) y strictly exceeds the max y over all points with SMALLER x.

(b) is a running prefix max over x-groups in x order. A bare
``Window.orderBy(x)`` would serialize that on one task (the classic
no-partition-window scale hole), so it is realized with the same
block-offset discipline as ``operators/linkage.py::global_rank``:
per-block maxima come to the driver (block cardinality is
driver-bounded by contract), the exclusive prefix max per block is
broadcast back, and the within-block running max is an ordinary
partitioned window. Shuffles: one x-group agg, one block agg
(metadata-sized), one x-keyed join back — no pair blowup at any
scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def skyline_2d(
    df: DataFrame, x_col: str, y_col: str, block: Column
) -> DataFrame:
    """Rows of ``df`` on the (minimize ``x_col``, maximize ``y_col``)
    Pareto frontier — every row for which no other row has x' ≤ x and
    y' ≥ y with at least one strict. Duplicate frontier points are all
    kept (neither strictly dominates the other). Flip orientations by
    negating a column upstream.

    ``block`` must be a monotone coarsening of ``x_col`` (e.g.
    ``F.floor(F.col(x)/width)``) with driver-bounded cardinality —
    thousands of blocks, not billions; it only shapes the prefix-max
    computation and never changes the result.
    """
    spark = df.sparkSession
    # dominance is undefined on missing coordinates: rows with a null
    # x or y are excluded (SQL aggregate-null convention)
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    g = (
        df.groupBy(x_col)
        .agg(F.max(y_col).alias("__gy"))
        .withColumn("__blk", block)
    )
    # exclusive prefix max per block (None for the first block)
    bm = sorted(
        (r["__blk"], r["__m"])
        for r in g.groupBy("__blk").agg(F.max("__gy").alias("__m")).collect()
    )
    rows, acc = [], None
    for blk, m in bm:
        rows.append((blk, acc))
        acc = m if acc is None else max(acc, m)
    schema = T.StructType(
        [
            T.StructField("__blk", g.schema["__blk"].dataType),
            T.StructField("__pre", g.schema["__gy"].dataType, True),
        ]
    )
    off = spark.createDataFrame(rows, schema)
    w = Window.partitionBy("__blk").orderBy(x_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # greatest() skips nulls: null/null → null (no cheaper point at all)
    rpre = F.greatest(F.max("__gy").over(w), F.col("__pre"))
    frontier_x = (
        g.join(F.broadcast(off), "__blk")
        .withColumn("__rpre", rpre)
        .filter(F.col("__rpre").isNull() | (F.col("__gy") > F.col("__rpre")))
        .select(x_col, "__gy")
    )
    return (
        df.join(frontier_x, x_col)
        .filter(F.col(y_col) == F.col("__gy"))
        .drop("__gy")
    )
