"""Incremental rollup maintenance: a continuously-maintained hourly
pre-aggregate over an append-only event stream (the lakehouse form of a
TimescaleDB continuous aggregate / materialized rollup).

Each batch upsert:

1. partially aggregates ONLY the batch (map-side combine, one shuffle
   of batch-sized data);
2. re-combines with the existing rollup rows of the AFFECTED day
   partitions only (mergeable aggregates: counts and decimal sums add;
   derived metrics like averages are computed at read time);
3. rewrites only those day partitions (dynamic partition overwrite).

At 100 TB: cost per upsert is O(batch + touched partitions), never
O(table). Sums are stored as DECIMAL so re-aggregation is exact and
order-insensitive — incremental maintenance produces bit-identical
results to a full recompute (asserted by the oracle query), which
float sums would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.warehouse import Warehouse


def _partial(batch: DataFrame, ts_col: str, dims: list[str], value_col: str) -> DataFrame:
    hour = F.date_trunc("hour", F.col(ts_col)).alias("hour")
    return (
        batch.groupBy(hour, *[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(30,6)"))
            .cast("decimal(38,6)")
            .alias("sum_value"),
        )
        .withColumn("day", F.date_format("hour", "yyyy-MM-dd"))
    )


def upsert_hourly_rollup(
    wh: Warehouse,
    table: str,
    batch: DataFrame,
    ts_col: str = "ts",
    dims: list[str] | None = None,
    value_col: str = "value",
) -> None:
    """Merge one batch of events into the hourly rollup ``table``."""
    dims = list(dims or [])
    part = _partial(batch, ts_col, dims, value_col)
    if wh.table_exists(table):
        # affected day partitions only: a bounded driver-side list (days
        # present in the batch), used for partition-pruned reads
        days = [r["day"] for r in part.select("day").distinct().collect()]
        existing = wh.read(table).filter(F.col("day").isin(days))
        part = (
            existing.unionByName(part)
            .groupBy("hour", *dims, "day")
            .agg(
                F.sum("n_events").cast("long").alias("n_events"),
                F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
            )
        )
    wh.overwrite_partitions(
        part.select("hour", *dims, "n_events", "sum_value", "day"), table, ["day"]
    )


def read_rollup(wh: Warehouse, table: str, dims: list[str] | None = None) -> DataFrame:
    """Rollup with derived metrics (avg from the mergeable pieces)."""
    dims = list(dims or [])
    return wh.read(table).select(
        "hour",
        *dims,
        F.col("n_events"),
        F.col("sum_value").cast("double").alias("sum_value"),
        (F.col("sum_value").cast("double") / F.col("n_events")).alias("avg_value"),
    )


def upsert_join_agg(
    wh: Warehouse,
    table: str,
    fact_batch: DataFrame,
    dim: DataFrame,
    join_key: str,
    group_cols: list[str],
    value_col: str,
) -> None:
    """Incremental maintenance of an AGG-OVER-JOIN materialized view
    (the join-view extension of the hourly rollup above): for an
    append-only fact stream, Δview = Δfact ⋈ dim, partially
    aggregated, added into the stored mergeable state.

    The standard delta-propagation identity (ΔA ⋈ B) — the dim side is
    treated as stable for the batch (dim churn would add the symmetric
    A ⋈ ΔB term plus retractions; SCD2 handles slowly-changing dims
    upstream, so fact-append is the overwhelmingly common case).
    Cost per batch is O(batch + view), never O(fact history); sums are
    DECIMAL so incremental == full recompute bit-for-bit (the oracle
    asserts exactly that).
    """
    delta = fact_batch.join(dim, join_key).groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col(value_col).cast("decimal(30,6)"))
        .cast("decimal(38,6)")
        .alias("sum_value"),
    )
    if wh.table_exists(table):
        delta = (
            wh.read(table)
            .unionByName(delta)
            .groupBy(*group_cols)
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("sum_value").cast("decimal(38,6)").alias("sum_value"),
            )
        )
    wh.overwrite_from_plan(delta, table)
