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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: str,
    n_salts: int = 8,
) -> DataFrame:
    """Result-identical skew-safe equi-join: replicate the small side
    ``n_salts`` times and split the fact side's hot keys across salts.

    AQE's skew-join splitting handles most cases at runtime; this is
    the explicit rewrite for when a single join key is so hot that
    even split shuffle blocks land on one reducer's key, or when AQE
    is unavailable (e.g. inside foreachBatch micro-batches). The salt
    is a deterministic hash of ``salt_src`` (a fact column, e.g. its
    primary key), so the output is reproducible and equals the plain
    ``fact.join(dim, key)`` row-for-row for any ``n_salts``.

    Scale shape: the dim side grows ``n_salts``× (it is the SMALL
    side — replication is cheap and usually broadcast anyway); the
    fact shuffle key becomes (key, salt), spreading each hot key over
    ``n_salts`` reducers.
    """
    dim_rep = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    salted = fact.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)).cast("int"),
    )
    return salted.join(dim_rep, [key, "__salt"]).drop("__salt")
