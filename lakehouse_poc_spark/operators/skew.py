"""Skew-mitigation patterns, expressed as result-identical rewrites.

AQE's skew-join splitting handles skewed JOINS at runtime; skewed
AGGREGATIONS (one giant group overwhelming a single reducer) need the
two-phase salted rewrite below. The salt is deterministic (hash of a
spreading column), so results are reproducible and oracle-comparable.

Scale note: phase 1 shuffles on (key, salt) — the giant group splits
across ``n_salts`` reducers; phase 2 shuffles ``n_salts`` rows per key.
For order-independent aggregates (count/sum/min/max) the rewrite is
exactly equivalent to the direct aggregation; the decimal-cast sum
convention keeps even float sums bit-identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    spread_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: count + exact decimal sum of
    ``spread_col``-adjacent ``value`` work, salted by a hash of
    ``spread_col``.

    Returns one row per key with ``n`` and ``total_value`` — identical
    to ``df.groupBy(keys).agg(count, dsum)`` for any salt count.
    """
    salt: Column = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("value").cast("decimal(30,6)")).alias("__v"),
        )
    )
    return (
        partial.groupBy(*keys)
        .agg(
            F.sum("__n").alias("n"),
            F.sum("__v").cast("double").alias("total_value"),
        )
    )
