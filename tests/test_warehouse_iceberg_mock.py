"""Mock-verified Iceberg backend plan tests.

The container ships without the iceberg-spark-runtime JAR by design,
so every ``format == "iceberg"`` branch in sinks/warehouse.py is
unexecutable here. These tests stub the availability probe and drive
each branch through a recording SparkSession/DataFrame double,
asserting the catalog confs, writeTo chains, and MERGE/DELETE SQL a
real Iceberg deployment would receive. On a cluster with the JAR on
the classpath the same code paths run unmodified (the probe resolves
the real ``org.apache.iceberg.spark.SparkCatalog``).

The Iceberg surface exercised (all public Spark API):
- per-warehouse hadoop catalog registration (conf-only)
- DataFrameWriterV2 create/append/createOrReplace
- SQL MERGE INTO for SCD1 upsert and the SCD2 close-and-insert
- SQL DELETE FROM for delete_where / partition retention
- time travel via ``option("versionAsOf", snapshot_id)`` and
  ``CALL <cat>.system.rollback_to_snapshot``
"""

from __future__ import annotations

from unittest.mock import MagicMock

import pytest

import lakehouse_poc_spark.sinks.warehouse as wh_mod
from lakehouse_poc_spark.sinks.warehouse import Warehouse


@pytest.fixture
def ice_ok(monkeypatch):
    monkeypatch.setattr(wh_mod, "iceberg_available", lambda spark: True)


def _mock_spark():
    spark = MagicMock()
    spark.conf.set = MagicMock()
    return spark


def _wh(tmp_path):
    spark = _mock_spark()
    return Warehouse(spark, str(tmp_path / "wh"), format="iceberg"), spark


def test_constructor_rejects_iceberg_without_jar(spark, tmp_path):
    # the REAL probe runs against the real session here: no JAR → False
    with pytest.raises(ImportError, match="iceberg-spark-runtime"):
        Warehouse(spark, str(tmp_path), format="iceberg")


def test_constructor_registers_hadoop_catalog(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    confs = {c.args[0]: c.args[1] for c in spark.conf.set.call_args_list}
    cat = wh.catalog
    assert confs[f"spark.sql.catalog.{cat}"] == (
        "org.apache.iceberg.spark.SparkCatalog"
    )
    assert confs[f"spark.sql.catalog.{cat}.type"] == "hadoop"
    assert confs[f"spark.sql.catalog.{cat}.warehouse"] == str(wh.root)
    # catalog name is root-derived: same root → same name, different
    # root → different name (no cross-warehouse collisions)
    wh2 = Warehouse(_mock_spark(), str(tmp_path / "wh"), format="iceberg")
    wh3 = Warehouse(_mock_spark(), str(tmp_path / "other"), format="iceberg")
    assert wh2.catalog == cat and wh3.catalog != cat


def test_ice_id_quotes_parts(ice_ok, tmp_path):
    wh, _ = _wh(tmp_path)
    assert wh._ice_id("dim.kunden") == f"{wh.catalog}.`dim`.`kunden`"


def test_read_and_table_exists_use_catalog_identifier(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    wh.read("dim.t", merge_schema=True)  # merge_schema is a no-op
    spark.table.assert_called_once_with(wh._ice_id("dim.t"))
    wh.table_exists("dim.t")
    spark.catalog.tableExists.assert_called_once_with(wh._ice_id("dim.t"))


def test_append_creates_then_appends(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    df = MagicMock()
    spark.catalog.tableExists.return_value = False
    wh.append(df, "raw.t", partition_by=["ingest_date"])
    df.writeTo.assert_called_once_with(wh._ice_id("raw.t"))
    df.writeTo.return_value.partitionedBy.return_value.create.assert_called_once()

    df2 = MagicMock()
    spark.catalog.tableExists.return_value = True
    wh.append(df2, "raw.t")
    df2.writeTo.return_value.append.assert_called_once()


def test_overwrite_is_replace_table_transaction(ice_ok, tmp_path):
    wh, _ = _wh(tmp_path)
    df = MagicMock()
    wh.overwrite(df, "dim.t")
    df.writeTo.return_value.createOrReplace.assert_called_once()
    # snapshot isolation: overwrite_from_plan routes to plain overwrite,
    # no __staging dir is ever created
    df2 = MagicMock()
    wh.overwrite_from_plan(df2, "dim.t")
    df2.writeTo.return_value.createOrReplace.assert_called_once()
    assert not list(wh.root.glob("**/*__staging"))


def test_read_version_uses_versionAsOf_table(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    wh.read_version("dim.t", 123456789)
    spark.read.option.assert_called_once_with("versionAsOf", 123456789)
    spark.read.option.return_value.table.assert_called_once_with(
        wh._ice_id("dim.t")
    )


def test_upsert_issues_merge_into_update_insert_star(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    spark.catalog.tableExists.return_value = True
    batch = MagicMock()
    wh.upsert(batch, "dim.t", keys=["id", "src"])
    batch.createOrReplaceTempView.assert_called_once()
    (sql_stmt,) = spark.sql.call_args.args
    assert f"MERGE INTO {wh._ice_id('dim.t')} t USING" in sql_stmt
    assert "t.`id` = s.`id` AND t.`src` = s.`src`" in sql_stmt
    assert "WHEN MATCHED THEN UPDATE SET *" in sql_stmt
    assert "WHEN NOT MATCHED THEN INSERT *" in sql_stmt
    spark.catalog.dropTempView.assert_called_once()  # view cleaned up


def test_apply_scd2_changeset_merges_close_then_appends(
    ice_ok, tmp_path, monkeypatch
):
    """Iceberg SCD2 mirrors the reference MERGE INTO
    (pipeline_core.py:219-227): match business keys AND the open-row
    flag, close matched rows, append new versions — full_rewrite is
    never touched."""
    wh, spark = _wh(tmp_path)
    appended = []
    monkeypatch.setattr(
        wh, "append", lambda df, table, partition_by=None: appended.append(table)
    )
    changed = MagicMock()
    full_rewrite = MagicMock()
    wh.apply_scd2_changeset(
        "dim.t",
        keys=["id"],
        changed_keys=changed,
        inserts=MagicMock(),
        is_current_col="is_current",
        valid_to_col="valid_to",
        run_ts="2020-06-01 00:00:00",
        full_rewrite=full_rewrite,
    )
    (sql_stmt,) = spark.sql.call_args.args
    assert "t.`id` = s.`id` AND t.`is_current` = true" in sql_stmt
    assert "t.`is_current` = false" in sql_stmt
    assert "t.`valid_to` = timestamp'2020-06-01 00:00:00'" in sql_stmt
    assert appended == ["dim.t"]
    full_rewrite.assert_not_called()


def test_delete_where_is_sql_delete_and_requires_string(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    wh.delete_where("fact.t", "value < 0")
    spark.sql.assert_called_once_with(
        f"DELETE FROM {wh._ice_id('fact.t')} WHERE value < 0"
    )
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="SQL-string predicate"):
        wh.delete_where("fact.t", F.lit(True))


def test_drop_partitions_predicate_delete(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    n = wh.drop_partitions("agg.daily", "day", values=["2020-01-01"])
    assert n == 1
    (sql_stmt,) = spark.sql.call_args.args
    assert sql_stmt == (
        f"DELETE FROM {wh._ice_id('agg.daily')} WHERE day IN ('2020-01-01')"
    )
    wh.drop_partitions("agg.daily", "day", before="2020-02-01")
    (sql_stmt,) = spark.sql.call_args.args
    assert sql_stmt.endswith("WHERE day < '2020-02-01'")


def test_restore_calls_rollback_to_snapshot(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    spark.sql.return_value.collect.return_value = []
    wh.restore("dim.t", 42)
    calls = [c.args[0] for c in spark.sql.call_args_list]
    assert any(
        c == f"CALL {wh.catalog}.system.rollback_to_snapshot('`dim`.`t`', 42)"
        for c in calls
    )


def test_version_reads_history_metadata_table(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    row = MagicMock()
    row.__getitem__ = lambda self, i: 987654321
    spark.sql.return_value.collect.return_value = [row]
    assert wh.version("dim.t") == 987654321
    (sql_stmt,) = spark.sql.call_args.args
    assert f"FROM {wh._ice_id('dim.t')}.history" in sql_stmt


def test_parquet_backend_selection_unchanged(spark, tmp_path):
    """Sanity anchor: the executed parquet twin still round-trips, and
    unknown formats are rejected up front."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(spark.range(3).selectExpr("id"), "dim.t")
    assert wh.read("dim.t").count() == 3
    with pytest.raises(ValueError, match="format must be one of"):
        Warehouse(spark, str(tmp_path), format="orc")


def test_overwrite_partitions_uses_native_overwritePartitions(ice_ok, tmp_path):
    """Dynamic partition overwrite must go through the V2 writeTo API
    — the V1 path save would bypass the catalog and corrupt table
    metadata (ADVICE r6)."""
    wh, spark = _wh(tmp_path)
    spark.catalog.tableExists.return_value = True
    df = MagicMock()
    wh.overwrite_partitions(df, "agg.daily", partition_by=["day"])
    df.writeTo.assert_called_once_with(wh._ice_id("agg.daily"))
    df.writeTo.return_value.overwritePartitions.assert_called_once()
    df.write.format.assert_not_called()  # no V1 path save
    # first write: create partitioned, through the catalog
    spark.catalog.tableExists.return_value = False
    df2 = MagicMock()
    wh.overwrite_partitions(df2, "agg.daily", partition_by=["day"])
    df2.writeTo.return_value.partitionedBy.return_value.create.assert_called_once()


def test_wap_and_publish_fail_fast_on_iceberg(ice_ok, tmp_path):
    """Staging plain parquet and rename-swapping over an Iceberg table
    dir corrupts its metadata — both WAP entry points must fail fast
    instead of silently applying parquet-dir mechanics (ADVICE r6)."""
    wh, _ = _wh(tmp_path)
    with pytest.raises(NotImplementedError, match="write_audit_publish"):
        wh.write_audit_publish(MagicMock(), "pub.t", [])
    with pytest.raises(NotImplementedError, match="publish_tables"):
        wh.publish_tables({"pub.t": MagicMock()})


def test_drop_goes_through_catalog_not_rmtree(ice_ok, tmp_path):
    wh, spark = _wh(tmp_path)
    d = wh.path("dim.t")
    d.mkdir(parents=True)
    wh.drop("dim.t")
    spark.sql.assert_called_once_with(
        f"DROP TABLE IF EXISTS {wh._ice_id('dim.t')} PURGE"
    )
    assert d.exists()  # path mechanics bypassed; the catalog owns files


def test_compact_routes_to_rewrite_data_files(ice_ok, tmp_path):
    """Compaction is the native rewrite_data_files procedure; the
    before-count comes from the .files metadata table (a directory
    glob would count every snapshot's files)."""
    wh, spark = _wh(tmp_path)
    row = MagicMock()
    row.__getitem__ = lambda self, k: 37
    spark.sql.return_value.collect.return_value = [row]
    before = wh.compact("fact.t", target_file_bytes=128 * 1024 * 1024)
    assert before == 37
    calls = [c.args[0] for c in spark.sql.call_args_list]
    assert any(f"FROM {wh._ice_id('fact.t')}.files" in c for c in calls)
    assert any(
        c.startswith(f"CALL {wh.catalog}.system.rewrite_data_files")
        and "'134217728'" in c
        for c in calls
    )
    with pytest.raises(NotImplementedError, match="sort"):
        wh.compact("fact.t", target_files=4, cluster_by=["k"])


def test_merge_ops_issues_three_clause_conditional_merge(
    ice_ok, spark, tmp_path, monkeypatch
):
    """merge_ops on Iceberg must emit the conditional three-clause
    MERGE INTO (DELETE when _op='D', UPDATE of the data columns only,
    INSERT guarded against deletes) — the CDC-apply surface."""
    wh, mspark = _wh(tmp_path)
    monkeypatch.setattr(wh, "table_exists", lambda t: True)
    current = spark.createDataFrame([("K1", "a")], "k string, v string")
    monkeypatch.setattr(wh, "read", lambda t, merge_schema=False: current)
    batch = spark.createDataFrame(
        [("K1", "a2", "U"), ("K2", None, "D"), ("K3", "c", "U")],
        "k string, v string, _op string",
    )
    stats = wh.merge_ops(batch, "dim.t", keys=["k"])
    assert stats == {"deleted": 0, "updated": 1, "inserted": 1}
    (sql_stmt,) = mspark.sql.call_args.args
    assert f"MERGE INTO {wh._ice_id('dim.t')} t USING" in sql_stmt
    assert "WHEN MATCHED AND s.`_op` = 'D' THEN DELETE" in sql_stmt
    assert "WHEN MATCHED THEN UPDATE SET t.`k` = s.`k`, t.`v` = s.`v`" in sql_stmt
    assert (
        "WHEN NOT MATCHED AND s.`_op` <> 'D' "
        "THEN INSERT (`k`, `v`) VALUES (s.`k`, s.`v`)" in sql_stmt
    )
    assert "_op` = s.`_op" not in sql_stmt.split("UPDATE SET")[1].split("WHEN")[0]
