"""Exact heavy hitters via a two-pass Misra-Gries candidate filter.

The naive plan for "keys with frequency >= phi * N" shuffles every
distinct key to count it — at 100 TB that is a full-fact exchange whose
size is the number of distinct keys (potentially billions). The classic
streaming remedy (Misra & Gries 1982, "Finding repeated elements")
makes the shuffle proportional to the number of *candidates* instead:

  pass 1 (map-only): each partition summarises its rows with a
    Misra-Gries sketch of ``capacity`` counters. A key missing from a
    partition's sketch has local count <= n_p / (capacity + 1), so a
    key missing from every sketch has global count < N / (capacity+1).
    With ``capacity + 1 >= 1 / phi`` every true heavy hitter therefore
    survives in at least one sketch — the union of sketch keys is a
    guaranteed superset.
  pass 2: exact recount of only the candidate keys (broadcast semi
    join against the fact), then the exact threshold filter. The
    result is EXACT — the sketch only ever prunes non-hitters.

Shuffle inventory: pass 1 is map-only (mapInPandas); the candidate
list is tiny (<= capacity * partitions) and broadcast; the recount
shuffles only rows whose key is a candidate, with map-side combine.

Reference scope: SURVEY §7 extension surface (the reference has no
frequency/sketch operators; its only aggregation is SCD2 merge stats,
``/root/reference/notebooks/pipeline_core.py:229-258``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(
    df: DataFrame, key_col: str, capacity: int = 1024
) -> DataFrame:
    """Map-only pass: per-partition Misra-Gries sketches, unioned.

    Returns a DataFrame of distinct candidate key values. Guarantee:
    contains every key whose global frequency exceeds
    ``N / (capacity + 1)``.
    """
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    spark_type = df.schema[key_col].dataType.simpleString()

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for k in pdf[key_col]:
                if k is None:
                    continue
                if k in counters:
                    counters[k] += 1
                elif len(counters) < capacity:
                    counters[k] = 1
                else:
                    # decrement-all step; drop zeroed counters
                    dead = []
                    for kk in counters:
                        counters[kk] -= 1
                        if counters[kk] == 0:
                            dead.append(kk)
                    for kk in dead:
                        del counters[kk]
        yield pd.DataFrame({key_col: list(counters.keys())})

    return (
        df.select(key_col)
        .mapInPandas(sketch, schema=f"{key_col} {spark_type}")
        .distinct()
    )


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    phi_denominator: int = 1000,
    capacity: int = 1024,
) -> DataFrame:
    """Keys with frequency >= N / phi_denominator, with EXACT counts.

    ``capacity + 1 >= phi_denominator`` must hold for the candidate
    superset guarantee (checked). The threshold compare is integer
    arithmetic (``count * phi_denominator >= N``) so there is no float
    boundary to disagree on.

    Output: (key_col, n_rows BIGINT), one row per heavy hitter.
    """
    if capacity + 1 < phi_denominator:
        raise ValueError(
            f"capacity + 1 = {capacity + 1} must be >= phi_denominator = "
            f"{phi_denominator} for the Misra-Gries superset guarantee"
        )
    candidates = misra_gries_candidates(df, key_col, capacity)
    total = df.agg(F.count(F.lit(1)).alias("__n_total"))
    return (
        df.join(F.broadcast(candidates), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_rows") * F.lit(phi_denominator) >= F.col("__n_total"))
        .drop("__n_total")
    )
