"""Vector expressions over ``array<float>`` embedding columns.

Pure JVM (``zip_with`` + left-fold ``aggregate``) — no Python in the
hot path. Elements are cast float→double BEFORE any arithmetic, and the
fold is strictly left-to-right, so results are bit-identical to any
engine that evaluates ``((0 + t1) + t2) + ...`` in doubles (the oracle
generates exactly that — see plans/simops.py).

Scale notes: a 64-dim dot product is ~64 fused multiply-adds inside
codegen; brute-force top-k over N vectors × Q queries is O(N·Q·d) but
embarrassingly parallel (broadcast the queries). The LSH variant in
operators/similarity.py cuts the candidate set for big N.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def norm_sq(a: Column) -> Column:
    return _fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))


def norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_dist_sq(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        )
    )


# ---------------------------------------------------------------------------
# int8 max-abs quantization: the storage/bandwidth lever for ANN at
# scale (4× smaller than float32, 8× smaller than float64; dot products
# on int8 SIMD-accelerate on modern CPUs). Per-vector scale = max |x|,
# q_i = round(x_i / scale * 127). All expression-level — quantization
# is a map-only pass over the corpus.


def maxabs_scale(a: Column) -> Column:
    """Per-vector max-abs (guarded against all-zero vectors)."""
    return F.greatest(
        F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))),
        F.lit(1e-12),
    )


def quantize_int8(a: Column, scale: Column) -> Column:
    """array<int> of round(x / scale * 127) in [-127, 127]."""
    return F.transform(
        a, lambda x: F.round(x.cast("double") / scale * F.lit(127.0)).cast("int")
    )


def dequantize(q: Column, scale: Column) -> Column:
    """Reconstructed doubles: q * scale / 127."""
    return F.transform(
        q, lambda v: v.cast("double") * scale / F.lit(127.0)
    )
