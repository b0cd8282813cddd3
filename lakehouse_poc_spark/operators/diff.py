"""Table reconciliation (data diff): full-outer compare of two
relations on a business key, classifying every key as only_left /
only_right / changed / same.

The migration-validation primitive: after re-platforming a pipeline
(exactly this repo's purpose), you diff the new engine's output table
against the old one's — key coverage AND value equality, in one pass.

Scale shape: ONE full-outer shuffle join on the key (both sides
shuffle once; AQE handles skew). The null-safe comparison `<=>` treats
NULL↔NULL as equal and NULL↔value as a change — the same null
semantics the SCD2 change detection uses (SURVEY.md §2.4 F4 note:
the reference's `!=` misses NULL transitions; we don't).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Row-level diff: one output row per key present on either side,
    with ``status`` ∈ {only_left, only_right, changed, same}."""
    keys = list(keys)
    lcols = [F.col(c).alias(f"l_{c}") for c in compare_cols]
    rcols = [F.col(c).alias(f"r_{c}") for c in compare_cols]
    l = left.select(*keys, *lcols).withColumn("__l", F.lit(1))
    r = right.select(*keys, *rcols).withColumn("__r", F.lit(1))
    joined = l.join(r, keys, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"l_{c}").eqNullSafe(F.col(f"r_{c}"))
    status = (
        F.when(F.col("__r").isNull(), F.lit("only_left"))
        .when(F.col("__l").isNull(), F.lit("only_right"))
        .when(changed, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return joined.select(*keys, status.alias("status"))


def diff_summary(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """(status, n) counts — the reconciliation report headline."""
    return (
        table_diff(left, right, keys, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )
