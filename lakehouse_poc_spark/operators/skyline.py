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


def skyline_nd(
    df: DataFrame,
    cols: list[str],
    buckets: int = 16,
    shell_budget: int = 2_000_000,
) -> DataFrame:
    """d-dimensional skyline, every column MINIMIZED (negate a column
    upstream to maximize it): rows for which no other row is <= in all
    ``cols`` and < in at least one. Exact — the grid only prunes.

    The 2D sweep does not generalize; this is the block-grid dominance
    filter of the MapReduce-skyline literature (grid partition → cell
    pruning → local skylines → merge):

    A. assign each row a grid cell per dimension (approxQuantile cut
       points — cut placement affects pruning power only, never the
       result);
    B. drop every cell for which some NON-EMPTY cell has a strictly
       smaller index in ALL dimensions (bucket boundaries are
       monotone, so any point there strictly dominates every point
       here) — the non-empty cell list is metadata-sized (<=
       buckets^d), so the pruning relation is computed driver-side
       and broadcast, exactly like the 2D block offsets;
    C. per-cell local skyline: an Arrow-batched numpy dominance
       kernel over each surviving cell (cell-bounded input);
    D. merge: the skyline of the union of local skylines, one final
       kernel call over the candidate SHELL. The shell is the thin
       Pareto boundary region — ``shell_budget`` guards the
       single-group merge with a clear error instead of a silent
       executor OOM (raise the bucket count to thin the shell).

    Shuffles: one cell-keyed exchange (C) and one single-key exchange
    of the shell (D); no pair blowup reaches the cluster. Rows with a
    null coordinate are excluded (dominance undefined — 2D rule).
    """
    import pandas as pd

    spark = df.sparkSession
    d = len(cols)
    if d < 2:
        raise ValueError("skyline needs >= 2 dimensions")
    cond = F.lit(True)
    for c in cols:
        cond = cond & F.col(c).isNotNull()
    base = df.filter(cond)

    # A. grid cells from quantile cuts (per-dim, metadata-sized)
    probs = [i / buckets for i in range(1, buckets)]
    cuts = {c: sorted(set(base.approxQuantile(c, probs, 0.01))) for c in cols}
    cell_cols = []
    for c in cols:
        expr = F.lit(0)
        for cut in cuts[c]:
            expr = expr + (F.col(c).cast("double") > F.lit(float(cut))).cast(
                "int"
            )
        cell_cols.append(expr.alias(f"__c_{c}"))
    g = base.select("*", *cell_cols)
    cnames = [f"__c_{c}" for c in cols]

    # B. driver-side cell pruning (non-empty cells <= buckets^d)
    cells = [tuple(r) for r in g.select(*cnames).distinct().collect()]
    keep_cells = [
        a
        for a in cells
        if not any(all(b[i] < a[i] for i in range(d)) for b in cells)
    ]
    keep_df = F.broadcast(
        spark.createDataFrame(
            keep_cells, ", ".join(f"{n} int" for n in cnames)
        )
    )
    surv = g.join(keep_df, cnames, "left_semi")

    # C+D. numpy dominance kernel, per cell then over the shell
    out_schema = surv.drop(*cnames).schema

    def _local_skyline(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        v = pdf[cols].to_numpy(dtype=float)
        m = len(v)
        keep = np.ones(m, dtype=bool)
        # vectorized pairwise dominance, row-chunked to bound memory
        for i in range(m):
            if not keep[i]:
                continue
            le = (v <= v[i]).all(axis=1)
            lt = (v < v[i]).any(axis=1)
            dominators = le & lt
            if dominators.any():
                keep[i] = False
        return pdf.loc[keep, [f.name for f in out_schema.fields]]

    local = surv.groupBy(*cnames).applyInPandas(
        lambda pdf: _local_skyline(pdf).assign(
            **{n: pdf[n].iloc[0] for n in cnames}
        )
        if len(pdf)
        else pdf,
        surv.schema,
    ).persist()  # the budget-guard count would otherwise re-run the
    # whole grid + per-cell kernel plan for the final merge
    n_shell = local.count()
    if n_shell > shell_budget:
        raise ValueError(
            f"candidate shell has {n_shell} rows (> budget "
            f"{shell_budget}); raise `buckets` to thin it"
        )
    return (
        local.drop(*cnames)
        .withColumn("__one", F.lit(0))
        .groupBy("__one")
        .applyInPandas(lambda pdf: _local_skyline(pdf), out_schema)
    )
