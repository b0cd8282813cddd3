"""Bucketed-table lifecycle: spec registry, drift probe, re-bucket.

`write_bucketed_tables` (plans/etlops.py) demonstrates the
shuffle-free co-located join; this module adds the OPERATIONAL side a
production engine needs once bucketed tables live for months: a
persisted record of how each table was bucketed (`BucketSpec`), a
cheap drift probe that measures how the key distribution has moved
against the spec (`bucket_drift`), and a rewrite that re-buckets when
the probe says so (`rebucket`).

The probe computes per-bucket row counts with ``pmod(hash(key), n)`` —
``F.hash`` is the same Murmur3 family Spark's ``bucketBy`` hashes
with, so the histogram reflects the PHYSICAL bucket layout without
listing files. The collected histogram is bucket-count-sized (bounded
metadata, the repo's collect() convention), never data-sized.

Scale notes (100 TB): the probe is one map-side-combined aggregation
over the key column only (column-pruned scan); re-bucketing is the
unavoidable full shuffle, which is exactly why the drift decision —
skew ratio and bucket-size target, not a timer — gates it.
Recommended bucket counts are powers of two so successive re-buckets
split/merge buckets evenly.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class BucketSpec:
    """How a table is (supposed to be) bucketed, plus the sizing
    target the layout was designed for."""

    table: str
    key: str
    n_buckets: int
    target_rows_per_bucket: int

    def save(self, root: str | Path) -> Path:
        p = Path(root) / f"{self.table}.bucketspec.json"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(asdict(self), indent=2))
        return p

    @staticmethod
    def load(root: str | Path, table: str) -> "BucketSpec":
        p = Path(root) / f"{table}.bucketspec.json"
        return BucketSpec(**json.loads(p.read_text()))


def bucket_histogram(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    """(bucket, rows) under Spark's bucketing function
    ``pmod(hash(key), n)`` — empty buckets absent (count 0)."""
    return (
        df.select(F.pmod(F.hash(F.col(key)), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("rows"))
    )


def _pow2_at_least(x: int) -> int:
    n = 1
    while n < x:
        n *= 2
    return n


def bucket_drift(df: DataFrame, spec: BucketSpec) -> dict:
    """Measure the table's key distribution against its spec.

    Returns bounded metadata only:
      total_rows, n_buckets, max_bucket_rows, mean_bucket_rows,
      skew (max/mean, empty buckets counted in the mean),
      recommended_n (power of two sized to the spec's target),
      rebucket (True when the bucket count should change or skew > 2).
    """
    hist = bucket_histogram(df, spec.key, spec.n_buckets).collect()
    total = sum(r.rows for r in hist)
    max_rows = max((r.rows for r in hist), default=0)
    mean_rows = total / spec.n_buckets if spec.n_buckets else 0.0
    skew = (max_rows / mean_rows) if mean_rows else 0.0
    recommended = _pow2_at_least(
        max(1, -(-total // spec.target_rows_per_bucket))
    )
    return {
        "total_rows": total,
        "n_buckets": spec.n_buckets,
        "max_bucket_rows": max_rows,
        "mean_bucket_rows": mean_rows,
        "skew": skew,
        "recommended_n": recommended,
        "rebucket": recommended != spec.n_buckets or skew > 2.0,
    }


def rebucket(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    spec: BucketSpec,
    new_n: int,
    spec_root: str | Path,
) -> tuple[DataFrame, BucketSpec]:
    """Rewrite `df` bucketed+sorted on the spec key with `new_n`
    buckets into the session catalog as `table`, persist the updated
    spec, and return (bucketed table, new spec)."""
    import shutil

    warehouse = Path(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    )
    stale = warehouse / table.lower()
    if not spark.catalog.tableExists(table) and stale.exists():
        shutil.rmtree(stale)
    (
        df.write.bucketBy(new_n, spec.key)
        .sortBy(spec.key)
        .mode("overwrite")
        .saveAsTable(table)
    )
    new_spec = BucketSpec(
        table=table,
        key=spec.key,
        n_buckets=new_n,
        target_rows_per_bucket=spec.target_rows_per_bucket,
    )
    new_spec.save(spec_root)
    return spark.table(table), new_spec
