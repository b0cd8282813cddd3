"""Approximate-sketch accuracy gates: the estimates the engine ships
(`approx_count_distinct`, mergeable Datasketches HLL, KLL-style
`percentile_approx`) asserted against their exact twins within the
algorithms' published error bounds.

The exact values are the ORACLE-CHECKED query surface (e.g.
`approx_distinct_users` emits the exact count — r4 VERDICT item 1);
these tests pin the approximate paths that can't be SQL-differential.

Scale rationale: at 100 TB the mergeable-sketch property is the whole
point — per-partition sketches union associatively (one tiny shuffle of
sketch bytes), no re-scan; these tests exercise exactly that shape
(groupBy partition → sketch → union → estimate).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_hll_sketch_merge_matches_exact_within_error(spark):
    """Per-partition HLL sketches unioned with hll_union_agg must
    estimate the global NDV within the sketch's relative error
    (lgConfigK=12 → ~1.6% 1σ; assert 5% ≈ 3σ)."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = ev.select("user_id").distinct().count()
    est = (
        ev.groupBy((F.col("user_id") % 8).alias("p"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert abs(est - exact) <= max(1, 0.05 * exact), (est, exact)
    # merge-order invariance: a different partitioning unions to the
    # same estimate (associativity — the property that makes the
    # sketch shuffle-safe)
    est2 = (
        ev.groupBy((F.col("event_id") % 5).alias("p"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
        .collect()[0]
        .est
    )
    assert est == est2, (est, est2)


def test_approx_count_distinct_within_rsd(spark):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    exact = ev.select("user_id").distinct().count()
    est = ev.agg(F.approx_count_distinct("user_id", rsd=0.02).alias("e")).collect()[
        0
    ].e
    assert abs(est - exact) <= max(1, 0.06 * exact), (est, exact)


def test_percentile_approx_within_rank_error(spark):
    """percentile_approx(accuracy=a) guarantees rank error <= n/a;
    check the value at the approximate rank really sits within that
    rank window of the exact order statistic."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    n = ev.count()
    accuracy = 1000
    qs = [0.5, 0.9, 0.99]
    approx = ev.agg(
        F.percentile_approx("value", qs, accuracy).alias("p")
    ).collect()[0].p
    values = sorted(r.value for r in ev.select("value").collect())
    max_rank_err = -(-n // accuracy)  # ceil(n / accuracy)
    for q, a in zip(qs, approx):
        target = int(q * (n - 1))
        lo = values[max(0, target - max_rank_err)]
        hi = values[min(n - 1, target + max_rank_err)]
        assert lo <= a <= hi, (q, a, lo, hi)
