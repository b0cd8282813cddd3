"""Partition-count independence: SCALE.md §7 claims every query is
bit-identical at any parallelism (decimal-cast sums, micro-rounded
logs, pinned fold orders). This runs the float-accumulation-heaviest
queries at two very different shuffle widths and asserts row-for-row
equality — the property that makes results stable when a 32-core
laptop plan moves to a 1000-executor cluster."""

from __future__ import annotations

import pytest

from lakehouse_poc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

# the queries where naive float sums WOULD diverge across partition
# counts: wide decimal aggregates, log-sum scores, window folds
CASES = [
    "q1_pricing_summary",
    "corr_profile_lineitem",
    "dsir_importance_docs",
    "char_entropy_docs",
    "unigram_logprob_docs",
    "ewma_event_values",
    "weighted_median_event_values",
]


@pytest.mark.parametrize("name", CASES)
def test_result_is_partition_count_independent(spark, name):
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        narrow = [tuple(r) for r in QUERIES[name](spark, SF).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        wide = [tuple(r) for r in QUERIES[name](spark, SF).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert narrow == wide  # bit-identical, not approximately equal
    assert len(narrow) > 0
