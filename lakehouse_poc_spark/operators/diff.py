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


def apply_changes(
    snapshot: DataFrame, changes: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """CDC replication apply — the consumer half of
    ``Warehouse.table_changes`` (Delta CDF shape): roll a replica
    snapshot forward by one version window.

      replica' = (replica ⟕̸ (deletes ∪ update_preimages) on keys)
                 ∪ inserts ∪ update_postimages

    ``keys`` must identify a row within the snapshot (for an SCD2
    dimension that's business key + valid_from). One anti-join (key
    co-shuffle, change side broadcast when small) + one union — cost
    is O(replica + changes), never a full diff. Applying the feed for
    (v_from, v_to) to the v_from snapshot reproduces v_to exactly,
    which is what the oracle asserts.
    """
    removed_keys = changes.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select(*keys)
    added = changes.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).drop("_change_type")
    kept = snapshot.join(removed_keys, list(keys), "left_anti")
    return kept.unionByName(added)
