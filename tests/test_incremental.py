"""Incremental file ingestion (sources/incremental.py): per-file
exactly-once via the registry — overlapping globs, idempotent
re-runs, and crash-shaped partial state."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_poc_spark.sources.incremental import ingest_new_files


def _landing(spark, tmp_path):
    src = str(tmp_path / "landing")
    spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).alias("part")
    ).write.partitionBy("part").parquet(src)
    return src


def test_overlapping_globs_ingest_each_file_once(spark, wh, tmp_path):
    src = _landing(spark, tmp_path)
    s1 = ingest_new_files(
        spark, wh, f"{src}/part=0", "t.data", "t.registry", base_path=src
    )
    assert s1["n_rows"] == 25
    # wider glob re-covers part=0; only parts 1-3 are new
    s2 = ingest_new_files(
        spark, wh, f"{src}/part=*", "t.data", "t.registry", base_path=src
    )
    assert s2["n_rows"] == 75
    out = wh.read("t.data")
    assert out.count() == 100
    assert out.select("id").distinct().count() == 100


def test_rerun_is_idempotent(spark, wh, tmp_path):
    src = _landing(spark, tmp_path)
    ingest_new_files(spark, wh, f"{src}/part=*", "t.data", "t.registry", base_path=src)
    s2 = ingest_new_files(
        spark, wh, f"{src}/part=*", "t.data", "t.registry", base_path=src
    )
    assert s2 == {"n_rows": 0, "n_files": 0}
    assert wh.read("t.data").count() == 100


def test_registry_records_files_not_rows(spark, wh, tmp_path):
    src = _landing(spark, tmp_path)
    stats = ingest_new_files(
        spark, wh, f"{src}/part=*", "t.data", "t.registry", base_path=src
    )
    reg = wh.read("t.registry")
    assert reg.count() == stats["n_files"]
    assert reg.select("file_path").distinct().count() == stats["n_files"]
