"""Incremental directory ingestion with an exactly-once file registry.

The reference re-reads its full source on every run
(`/root/reference/notebooks/pipeline_core.py` fetches the whole CSV
each pipeline invocation); a 100 TB landing zone can't. This is the
batch twin of Spark's streaming file source: a registry table records
every file already ingested, and each run appends only files not yet
in the registry — so re-running with an overlapping (or wider) glob
is idempotent per file, and a crashed run simply re-processes the
files whose registry rows never committed.

Scale shape: the file list is `_metadata.file_path` on the
distributed scan (no driver-side listing); the seen-set is one
row per file, orders of magnitude smaller than the data, and the
anti-join on it broadcasts. The data path stays a map-only
read→append; nothing shuffles.

Prod note: for continuous ingestion, Structured Streaming's file
source (`spark.readStream.format("parquet")`) does the same tracking
in its checkpoint; this operator is the batch/backfill path that
interoperates with plain directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sinks.warehouse import Warehouse


def ingest_new_files(
    spark: SparkSession,
    wh: Warehouse,
    src_glob: str,
    target_table: str,
    registry_table: str,
    base_path: str | None = None,
    partition_by: list[str] | None = None,
    run_ts: str = "1970-01-01 00:00:00",
) -> dict[str, int]:
    """Append rows from files under ``src_glob`` that are not yet in
    ``registry_table``; record the newly processed files.

    Returns ``{"n_rows": ..., "n_files": ...}`` for the batch. The
    source snapshot is the scan's file listing at call time — files
    appearing mid-run are picked up by the next run.
    """
    reader = spark.read
    if base_path is not None:
        reader = reader.option("basePath", base_path)
    src = reader.parquet(src_glob)
    files = src.withColumn("__file", F.col("_metadata.file_path"))
    if wh.table_exists(registry_table):
        seen = wh.read(registry_table).select("file_path")
        files = files.join(
            F.broadcast(seen),
            files["__file"] == seen["file_path"],
            "left_anti",
        )
    new = files.localCheckpoint(eager=True)  # pin the batch: count, data
    #   append and registry append must all see the same file set
    stats_row = new.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("__file").alias("n_files"),
    ).first()
    wh.append(new.drop("__file"), target_table, partition_by=partition_by)
    processed = (
        new.select(F.col("__file").alias("file_path"))
        .distinct()
        .withColumn("ingested_at", F.lit(run_ts))
    )
    wh.append(processed, registry_table)
    return {"n_rows": int(stats_row["n_rows"]), "n_files": int(stats_row["n_files"])}
