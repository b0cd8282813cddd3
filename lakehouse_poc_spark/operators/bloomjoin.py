"""Bloom-filter join pruning.

The big-join scale lever the reference never needed at notebook scale:
when a selective dimension filters a huge fact join, shuffling the
full fact table to discover most rows match nothing is the dominant
waste. A Bloom filter of the dim keys, applied to the fact side
BEFORE the shuffle, drops non-matching rows at the scan — the same
idea as Spark's runtime row-level filtering
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), made explicit
so it (a) works when the optimizer declines, (b) is testable, and
(c) documents its own false-positive/bit-budget math.

Everything is built-in expressions (whole-stage codegen): k probe
positions via ``xxhash64(key, i)``, the bitmap as an array<long>
literal baked into the filter. False positives only ever ADD rows to
the pre-filtered side; the exact join that follows removes them, so
the composed result is bit-identical to the plain join (the oracle).

Scale notes (100 TB): the bitmap costs m/8 bytes — 2²⁰ bits = 128 KB
handles ~10⁵ dim keys at k=5 with <1% FP; a 10⁸-key dim needs 2³⁰
bits = 128 MB, the point where Spark's own InSubqueryExec-style
semi-join or the native runtime bloom (which builds JVM-side) wins.
The build is one distinct + one small agg on the DIM side only; the
probe is a map-only filter on the fact side — no extra shuffle
anywhere. Like broadcast centroids in similarity.py, the bitmap rides
the plan as a literal: driver memory ∝ m, never ∝ fact rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shl(value: Column, bits: Column) -> Column:
    # PySpark's F.shiftleft only accepts a Python-int shift; the SQL
    # function takes a column — call it directly.
    return F.call_function("shiftleft", value, bits)


def bloom_build(dim: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 5) -> list[int]:
    """Aggregate the dim side's keys into an m-bit Bloom bitmap,
    returned as m/64 longs. One distinct-ish shuffle over (word) —
    the positions explode map-side; the agg is ≤ m/64 rows."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = F.explode(
        F.array(*[F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits)) for i in range(k)])
    ).alias("pos")
    words = (
        dim.select(pos)
        .select(
            (F.col("pos") / F.lit(64)).cast("long").alias("word"),
            _shl(F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[int(r["word"])] = int(r["bits"])
    return bitmap


def bloom_might_contain(bitmap_col: Column, m_bits: int, key: str | Column, k: int = 5) -> Column:
    """Codegen-friendly membership test: AND over k probed bits.
    ``bitmap_col`` must be a COLUMN holding the bitmap array (project
    the literal once — inlining a multi-thousand-element array literal
    into the predicate k times blows up analysis/codegen time)."""
    keyc = F.col(key) if isinstance(key, str) else key
    cond = F.lit(True)
    for i in range(k):
        p = F.pmod(F.xxhash64(keyc, F.lit(i)), F.lit(m_bits))
        word = F.get(bitmap_col, (p / F.lit(64)).cast("int"))
        bit = _shl(F.lit(1).cast("long"), (p % 64).cast("int"))
        cond = cond & (word.bitwiseAND(bit) != 0)
    return cond


def _auto_m_bits(n_keys: int) -> int:
    """Smallest power-of-two ≥ 16 bits/key (k=5 → ~0.1% FP), floor 4096."""
    m = 4096
    while m < 16 * max(1, n_keys):
        m *= 2
    return m


def bloom_prefilter(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int | None = None,
    k: int = 5,
) -> DataFrame:
    """Return ``fact`` filtered to rows whose key MIGHT be in ``dim``
    (superset semi-join: no false negatives, bounded false positives).
    Compose with the exact join for a bit-identical, cheaper plan.

    ``m_bits=None`` sizes the filter from the dim row count
    (16 bits/key, power of two) — one extra tiny action on the small
    side, the same trade every Bloom build makes."""
    if m_bits is None:
        m_bits = _auto_m_bits(dim.count())
    bitmap = bloom_build(dim, dim_key, m_bits=m_bits, k=k)
    arr = F.array(*[F.lit(w).cast("long") for w in bitmap])
    return (
        fact.withColumn("__bloom", arr)
        .filter(bloom_might_contain(F.col("__bloom"), m_bits, fact_key, k=k))
        .drop("__bloom")
    )
