"""Bloom-filter join pruning: no false negatives ever, measurable
pruning, auto-sizing, and exact-join composition identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_poc_spark.operators.bloomjoin import (
    _auto_m_bits,
    bloom_build,
    bloom_prefilter,
)


def test_no_false_negatives(spark):
    dim = spark.range(0, 100).select((F.col("id") * 7).alias("k"))
    fact = spark.range(0, 1000).select((F.col("id")).alias("k"))
    kept = bloom_prefilter(fact, dim, "k", "k")
    dim_keys = {r.k for r in dim.collect()}
    kept_keys = {r.k for r in kept.collect()}
    # every true match survives
    assert dim_keys & set(range(1000)) <= kept_keys


def test_prunes_most_nonmatching_rows(spark):
    dim = spark.range(0, 50).select((F.col("id") + 10_000).alias("k"))
    fact = spark.range(0, 20_000).select(F.col("id").alias("k"))
    kept = bloom_prefilter(fact, dim, "k", "k")
    n_kept = kept.count()
    # 50 true matches; FP rate at 16 bits/key, k=5 is ~0.1% → well
    # under 1% of the 20k fact rows
    assert n_kept >= 50
    assert n_kept < 50 + 200, n_kept


def test_composed_join_is_exact(spark):
    dim = spark.range(0, 200).select((F.col("id") * 3).alias("k"), F.lit("d").alias("tag"))
    fact = spark.range(0, 5_000).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    plain = fact.join(dim, "k").groupBy("tag").agg(F.sum("v").alias("s"))
    pruned = bloom_prefilter(fact, dim, "k", "k").join(dim, "k").groupBy("tag").agg(
        F.sum("v").alias("s")
    )
    assert plain.collect() == pruned.collect()


def test_auto_sizing_and_build_shape(spark):
    assert _auto_m_bits(0) == 4096
    assert _auto_m_bits(100) == 4096
    assert _auto_m_bits(1000) == 16384
    assert _auto_m_bits(10**5) == 1 << 21
    dim = spark.range(0, 10).select(F.col("id").alias("k"))
    bm = bloom_build(dim, "k", m_bits=4096)
    assert len(bm) == 4096 // 64
    # 10 keys × 5 probes set at most 50 bits
    assert 0 < sum(bin(w & (2**64 - 1)).count("1") for w in bm) <= 50


def test_rejects_unaligned_m_bits(spark):
    import pytest as _pt

    dim = spark.range(0, 10).select(F.col("id").alias("k"))
    with _pt.raises(ValueError, match="multiple of 64"):
        bloom_build(dim, "k", m_bits=100)
