"""Warehouse: managed-table emulation over parquet directories.

The reference's sink surface is ``saveAsTable`` on Delta managed tables
(K1 append raw — reference notebooks/pipeline_core.py:62-68, K2
overwrite init — :147-153, K3 append versions — :245-252) plus the
catalog existence check (M3, :138 — done there via the JVM-internal
``spark._jsparkSession``; we use only the filesystem/public API).

This container has no delta-spark, so managed tables are emulated as
parquet directories under a warehouse root. The interface is the
Delta-shaped one (append / overwrite / merge-by-rewrite), so swapping
in real Delta or Iceberg is a one-class change:

    At 100 TB you would NOT rewrite a dimension on every merge — you'd
    run a Delta/Iceberg MERGE that rewrites only matched files. The
    SCD2 engine (operators/scd2.py) therefore computes an explicit
    change-set first; `apply` is the only format-specific step.

Scale notes: raw tables should be partitioned by ingest date
(``partition_by=["ingest_date"]``) so time-bounded reprocessing prunes;
dimension tables stay unpartitioned (small relative to facts) or
bucketed by business key when they grow.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Warehouse:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def path(self, table: str) -> Path:
        # "layer0100.kosten_raw" → <root>/layer0100/kosten_raw
        return self.root.joinpath(*table.split("."))

    def table_exists(self, table: str) -> bool:
        p = self.path(table)
        return p.exists() and any(p.glob("*.parquet")) or (p / "_SUCCESS").exists()

    def read(self, table: str, merge_schema: bool = False) -> DataFrame:
        """``merge_schema=True`` unions column sets across files —
        schema evolution on an append-only raw table (a batch landed
        with new columns reads back as the superset, old rows null)."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(str(self.path(table)))

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("append")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(self.path(table)))

    def overwrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(self.path(table)))

    def overwrite_from_plan(
        self, df: DataFrame, table: str, partition_by: list[str] | None = None
    ) -> None:
        """Overwrite a table with a plan that READS the same table.

        A plain overwrite would clobber its own input mid-read; stage to
        a sibling dir then atomically swap (rename). Delta/Iceberg make
        this a transaction; this is the parquet-dir equivalent.
        """
        target = self.path(table)
        staged = target.with_name(target.name + "__staging")
        if staged.exists():
            shutil.rmtree(staged)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(str(staged))
        old = target.with_name(target.name + "__old")
        if old.exists():
            shutil.rmtree(old)
        if target.exists():
            target.rename(old)
        staged.rename(target)
        if old.exists():
            shutil.rmtree(old)

    def drop(self, table: str) -> None:
        p = self.path(table)
        if p.exists():
            shutil.rmtree(p)

    def compact(
        self, table: str, target_files: int, partition_by: list[str] | None = None
    ) -> int:
        """Small-file compaction: rewrite the table into
        ``target_files`` files per partition (atomic staged swap). The
        lakehouse maintenance op every append-only raw table needs — at
        100 TB streaming/micro-batch ingest produces thousands of small
        files per day and scan cost is dominated by file-open overhead
        until compaction (Delta's OPTIMIZE; this is the parquet-dir
        form). Counts files recursively and carries ``partition_by``
        through the rewrite so a partitioned table keeps its layout
        (and its pruning) instead of being silently flattened (ADVICE
        r1). Returns the number of data files before compaction."""
        before = len(list(self.path(table).glob("**/*.parquet")))
        df = self.read(table, merge_schema=True)
        if partition_by:
            if target_files <= 1:
                # one task per partition value -> exactly one file per dir
                df = df.repartition(*partition_by)
            else:
                # Repartitioning on the partition columns ALONE sends every
                # row of a partition value to one task (1 giant file + one
                # skewed writer per value, ADVICE r2). Add a deterministic
                # row salt in [0, target_files) so each value spreads over
                # ~target_files writer tasks, each emitting one file into
                # the value's dir. The partition number must be explicit:
                # AQE would otherwise coalesce the small salted shuffle
                # back into one task, silently restoring the skew. Range
                # partitioning keeps (value, salt) combos in distinct
                # tasks instead of hash-colliding them.
                n_values = df.select(*partition_by).distinct().count()
                salt = F.pmod(
                    F.xxhash64(*[F.col(c) for c in df.columns]),
                    F.lit(target_files),
                )
                df = df.repartitionByRange(
                    max(1, n_values) * target_files,
                    *[F.col(c) for c in partition_by],
                    salt,
                )
        else:
            df = df.coalesce(target_files)
        self.overwrite_from_plan(df, table, partition_by=partition_by)
        return before
