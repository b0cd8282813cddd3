"""SemDeDup: semantic deduplication over embedding vectors —
cluster-then-dedup (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication", public paper).

The all-pairs cosine join over a 100 TB corpus is O(n²) and dead on
arrival; SemDeDup's observation is that semantic duplicates land in
the same *cluster* of any reasonable partitioning of embedding space,
so the pair join only needs to run WITHIN clusters: O(Σ c_i²) with
c_i ≪ n. Survivor selection is deterministic: within a cluster, a
vector is dropped iff a lower-id vector in the same cluster sits
within the cosine threshold (the paper keeps one representative per
ε-ball; min-id is the reproducible choice of representative).

Two cluster assignments are provided:

- :func:`signbit_cluster` — the sign pattern of the first ``bits``
  dimensions. Training-free, pure codegen, fully deterministic, and
  SQL-expressible (the differential oracle uses the identical
  arithmetic). Recall is *by construction of the semantics*: SemDeDup
  deduplicates within clusters only, so the cluster function is part
  of the operator's contract, not an approximation of it.
- at scale, pass a trained assignment (``kmeans_train`` +
  ``assign_cells`` from operators/similarity.py) via ``cluster_col`` —
  the paper's actual configuration. Same downstream machinery.

Scale shape: one map-only pass to stamp cluster ids, one hash shuffle
on the cluster key, and a per-cluster self-join whose cost is bounded
by the cluster-size distribution (pick ``bits`` / k so the largest
cluster fits a task — the same knob as IVF cell sizing). No driver
collects; cosine is the JVM fold from functions/vectors.py (no Python
in the hot path).

Reference parity: the reference engine (lakehouse-poc notebook ETL)
has no embedding operators; this extends the LLM-data-pipeline family
per SURVEY.md §7.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot, norm
from .partitioning import fan_out


def signbit_cluster(vec_col: Column, bits: int = 6) -> Column:
    """Deterministic training-free cluster id: bit i of the id is set
    iff dimension i of the vector is >= 0. 2**bits possible clusters."""
    return reduce(
        lambda acc, i: acc
        + F.when(F.element_at(vec_col, i + 1) >= 0, F.lit(1 << i)).otherwise(0),
        range(bits),
        F.lit(0),
    ).alias("cluster")


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    bits: int = 6,
    cluster_col: str | None = None,
) -> DataFrame:
    """(id, cluster, kept): ``kept`` is false iff a lower-id vector in
    the same cluster has cosine >= ``threshold``.

    ``cluster_col`` (optional) names a precomputed cluster-assignment
    column (e.g. trained k-means cells); default is the sign-bit
    cluster over the first ``bits`` dimensions.
    """
    base = fan_out(df)
    if cluster_col is None:
        base = base.select(
            F.col(id_col), F.col(vec_col).alias("v"), signbit_cluster(F.col(vec_col), bits)
        )
    else:
        base = base.select(
            F.col(id_col), F.col(vec_col).alias("v"), F.col(cluster_col).alias("cluster")
        )
    # per-row norm precomputed ONCE, not once per candidate pair —
    # cosine(a,b) = dot/(norm(a)·norm(b)) with identical operand order,
    # so the filter sees bit-identical doubles (r10 optimization round)
    withn = base.withColumn("__n", norm(F.col("v")))
    a, b = withn.alias("a"), withn.alias("b")
    dups = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .filter(
            dot(F.col("a.v"), F.col("b.v")) / (F.col("a.__n") * F.col("b.__n"))
            >= F.lit(threshold)
        )
        .select(F.col(f"b.{id_col}").alias("_dup_id"))
        .distinct()
    )
    return (
        base.join(dups, base[id_col] == dups["_dup_id"], "left")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.col("_dup_id").isNull().alias("kept"),
        )
    )
