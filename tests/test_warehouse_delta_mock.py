"""Mock-verified Delta backend plan tests.

The container ships without delta-spark by design, so every
``format == "delta"`` branch in sinks/warehouse.py is unexecutable
here. These tests install a RECORDING fake of the ``delta.tables``
API (the exact public surface ``DeltaTable`` exposes) and drive each
delta branch end-to-end through the Warehouse methods, asserting the
calls a real Delta deployment would receive: merge conditions, update
sets, delete predicates, reader options. On a cluster with delta-spark
installed the same code paths run unmodified against the real library
(the guarded import resolves to the genuine module instead).
"""

from __future__ import annotations

import sys
import types
from unittest.mock import MagicMock

import pytest
from pyspark.sql import functions as F

from lakehouse_poc_spark.sinks.warehouse import Warehouse, delta_available


class FakeMergeBuilder:
    def __init__(self, log):
        self.log = log

    def whenMatchedUpdate(self, set=None, condition=None):
        self.log.append(("whenMatchedUpdate", set, condition))
        return self

    def whenMatchedUpdateAll(self):
        self.log.append(("whenMatchedUpdateAll",))
        return self

    def whenNotMatchedInsertAll(self):
        self.log.append(("whenNotMatchedInsertAll",))
        return self

    def whenMatchedDelete(self, condition=None):
        self.log.append(("whenMatchedDelete", condition))
        return self

    def whenNotMatchedInsert(self, condition=None, values=None):
        self.log.append(("whenNotMatchedInsert", values, condition))
        return self

    def execute(self):
        self.log.append(("execute",))


class FakeDeltaTable:
    instances: list["FakeDeltaTable"] = []

    def __init__(self, spark, path):
        self.spark = spark
        self.path = path
        self.log: list[tuple] = []
        FakeDeltaTable.instances.append(self)

    @classmethod
    def forPath(cls, spark, path):
        return cls(spark, path)

    def alias(self, name):
        self.log.append(("alias", name))
        return self

    def merge(self, source, condition):
        self.log.append(("merge", source, condition))
        return FakeMergeBuilder(self.log)

    def delete(self, predicate):
        self.log.append(("delete", predicate))


@pytest.fixture
def fake_delta(monkeypatch):
    """Install importable fake ``delta`` / ``delta.tables`` modules so
    delta_available() is True and the guarded imports resolve here."""
    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = FakeDeltaTable
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    FakeDeltaTable.instances = []
    yield FakeDeltaTable


def test_delta_available_flips_with_importability(fake_delta):
    assert delta_available() is True


def test_constructor_accepts_delta_when_bindings_present(fake_delta, spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path), format="delta")
    assert wh.format == "delta"


def test_constructor_rejects_delta_without_bindings(spark, tmp_path):
    assert not delta_available()
    with pytest.raises(ImportError, match="delta-spark"):
        Warehouse(spark, str(tmp_path), format="delta")


def test_table_exists_checks_delta_log(fake_delta, spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path), format="delta")
    assert not wh.table_exists("dim.t")
    (wh.path("dim.t") / "_delta_log").mkdir(parents=True)
    assert wh.table_exists("dim.t")


def test_read_version_uses_versionAsOf(fake_delta, tmp_path):
    mock_spark = MagicMock()
    wh = Warehouse(mock_spark, str(tmp_path), format="delta")
    wh.read_version("dim.t", 7)
    reader = mock_spark.read.format
    reader.assert_called_once_with("delta")
    reader.return_value.option.assert_called_once_with("versionAsOf", 7)
    reader.return_value.option.return_value.load.assert_called_once_with(
        str(wh.path("dim.t"))
    )


def test_table_changes_reads_change_feed(fake_delta, tmp_path):
    mock_spark = MagicMock()
    wh = Warehouse(mock_spark, str(tmp_path), format="delta")
    wh.table_changes("dim.t", 2, 5, keys=["id"])
    mock_spark.read.format.assert_called_once_with("delta")
    opts = {}
    chain = mock_spark.read.format.return_value
    # options chain: readChangeFeed -> startingVersion -> endingVersion
    for _ in range(3):
        (args, _kw) = chain.option.call_args
        opts[args[0]] = args[1]
        chain = chain.option.return_value
    assert opts == {
        "readChangeFeed": "true",
        "startingVersion": 2,
        "endingVersion": 5,
    }


def _fake_writer_df():
    """A stand-in DataFrame whose .write records the full writer chain."""
    df = MagicMock()
    writer = df.write
    for meth in ("format", "mode", "option", "partitionBy"):
        getattr(writer, meth).return_value = writer
    return df, writer


def test_overwrite_sets_overwriteSchema(fake_delta, spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path), format="delta")
    df, writer = _fake_writer_df()
    wh.overwrite(df, "dim.t")
    writer.format.assert_called_with("delta")
    writer.mode.assert_called_with("overwrite")
    writer.option.assert_called_with("overwriteSchema", "true")
    writer.save.assert_called_once_with(str(wh.path("dim.t")))


def test_overwrite_from_plan_is_plain_overwrite_on_delta(
    fake_delta, spark, tmp_path, monkeypatch
):
    """Delta overwrites are snapshot-isolated: no staging dir, just a
    straight overwrite of the same table."""
    wh = Warehouse(spark, str(tmp_path), format="delta")
    calls = []
    monkeypatch.setattr(
        wh, "overwrite", lambda df, table, partition_by=None: calls.append(table)
    )
    wh.overwrite_from_plan(MagicMock(), "dim.t")
    assert calls == ["dim.t"]
    assert not (wh.path("dim.t").parent / "t__staging").exists()


def test_drop_partitions_issues_predicate_delete(fake_delta, spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path), format="delta")
    wh.drop_partitions("agg.daily", "day", values=["2020-01-01", "2020-01-02"])
    (dt,) = FakeDeltaTable.instances
    assert dt.path == str(wh.path("agg.daily"))
    assert dt.log == [("delete", "day IN ('2020-01-01', '2020-01-02')")]

    FakeDeltaTable.instances = []
    wh.drop_partitions("agg.daily", "day", before="2020-02-01")
    (dt,) = FakeDeltaTable.instances
    assert dt.log == [("delete", "day < '2020-02-01'")]


def test_delete_where_routes_to_native_delete(fake_delta, spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path), format="delta")
    wh.delete_where("fact.t", "value < 0")
    (dt,) = FakeDeltaTable.instances
    ((op, pred),) = dt.log
    assert op == "delete"
    # string predicates arrive as parsed Column expressions
    assert "value" in str(pred) and "0" in str(pred)


def test_apply_scd2_changeset_builds_reference_merge(
    fake_delta, spark, tmp_path, monkeypatch
):
    """The delta SCD2 path must mirror the reference's MERGE INTO
    (pipeline_core.py:219-227): match on business keys AND the
    open-row flag, close matched rows (is_current=false, valid_to=run
    ts), then append the new versions."""
    wh = Warehouse(spark, str(tmp_path), format="delta")
    appended = []
    monkeypatch.setattr(
        wh,
        "append",
        lambda df, table, partition_by=None: appended.append(table),
    )
    changed = spark.createDataFrame([(1,), (2,)], "id long")
    inserts = spark.createDataFrame([(1, "v2")], "id long, val string")
    wh.apply_scd2_changeset(
        "dim.t",
        keys=["id"],
        changed_keys=changed,
        inserts=inserts,
        is_current_col="is_current",
        valid_to_col="valid_to",
        run_ts="2020-06-01 00:00:00",
        full_rewrite=MagicMock(),  # must NOT be used on the delta path
    )
    (dt,) = FakeDeltaTable.instances
    ops = [entry[0] for entry in dt.log]
    assert ops == ["alias", "merge", "whenMatchedUpdate", "execute"]
    _, merge_src, cond = dt.log[1]
    assert cond == "t.id = s.id AND t.is_current = true"
    _, update_set, _cond = dt.log[2]
    assert set(update_set) == {"is_current", "valid_to"}
    assert appended == ["dim.t"]


def test_parquet_and_delta_share_changeset_contract(spark, tmp_path):
    """Sanity anchor: the parquet path of apply_scd2_changeset (the
    executed twin of the mocked delta path) rewrites via
    overwrite_from_plan with the full_rewrite plan."""
    wh = Warehouse(spark, str(tmp_path))
    dim = spark.createDataFrame(
        [(1, "a", True)], "id long, val string, is_current boolean"
    )
    wh.overwrite(dim, "dim.t")
    full = dim.withColumn("val", F.lit("b"))
    wh.apply_scd2_changeset(
        "dim.t",
        keys=["id"],
        changed_keys=spark.createDataFrame([(1,)], "id long"),
        inserts=spark.createDataFrame([], "id long, val string, is_current boolean"),
        is_current_col="is_current",
        valid_to_col="valid_to",
        run_ts="2020-06-01 00:00:00",
        full_rewrite=full,
    )
    assert [r.val for r in wh.read("dim.t").collect()] == ["b"]


def test_upsert_delta_uses_merge_update_insert_all(
    fake_delta, spark, tmp_path, monkeypatch
):
    wh = Warehouse(spark, str(tmp_path), format="delta")
    monkeypatch.setattr(wh, "table_exists", lambda t: True)
    batch = spark.createDataFrame([(1, "a")], "id long, val string")
    wh.upsert(batch, "dim.t", keys=["id"])
    (dt,) = FakeDeltaTable.instances
    ops = [entry[0] for entry in dt.log]
    assert ops == ["alias", "merge", "whenMatchedUpdateAll",
                   "whenNotMatchedInsertAll", "execute"]
    assert dt.log[1][2] == "t.id = s.id"


def test_upsert_parquet_last_write_wins(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path))
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string")
    b2 = spark.createDataFrame([(2, "B"), (3, "c")], "id long, val string")
    wh.upsert(b1, "dim.t", keys=["id"])
    wh.upsert(b2, "dim.t", keys=["id"])
    got = {(r.id, r.val) for r in wh.read("dim.t").collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c")}


def test_delta_path_mechanics_fail_fast(fake_delta, spark, tmp_path):
    """The parquet-dir mechanics (WAP staging swaps, glob-based
    compaction) bypass Delta's transaction log — on format='delta'
    they must fail fast instead of silently corrupting the table
    (ADVICE r6, the delta twin of the iceberg guards)."""
    wh = Warehouse(spark, str(tmp_path / "wh"), format="delta")
    with pytest.raises(NotImplementedError, match="write_audit_publish"):
        wh.write_audit_publish(MagicMock(), "pub.t", [])
    with pytest.raises(NotImplementedError, match="publish_tables"):
        wh.publish_tables({"pub.t": MagicMock()})
    with pytest.raises(NotImplementedError, match="OPTIMIZE"):
        wh.compact("fact.t", target_files=4)


def test_delta_append_carries_mergeSchema_for_evolution(fake_delta):
    """Schema-evolved SCD2 batches reach Delta through append; the
    writer must carry mergeSchema=true (Delta's additive autoMerge on
    the append path) so a widened inserts schema widens the log
    schema instead of failing. Parquet appends reconcile at read time
    instead — no writer option."""
    from lakehouse_poc_spark.sinks.warehouse import _append_writer_options

    assert _append_writer_options("delta") == {"mergeSchema": "true"}
    assert _append_writer_options("parquet") == {}


def test_scd2_evolve_on_delta_widens_changeset(
    fake_delta, spark, tmp_path, monkeypatch
):
    """Drive scd2_merge(evolve=True) against the delta branch with the
    storage surface mocked: the change-set computation must null-
    backfill the dimension's missing column BEFORE the diff, flag only
    the keys whose new column arrived non-NULL, and hand
    apply_scd2_changeset inserts that carry the widened schema (which
    Delta then lands via the mergeSchema append asserted above)."""
    from lakehouse_poc_spark.config import PipelineConfig
    from lakehouse_poc_spark.operators.scd2 import scd2_merge

    wh = Warehouse(spark, str(tmp_path), format="delta")
    dim = spark.createDataFrame(
        [
            ("K1", "x", "2030-01-01 00:00:00", None, True),
            ("K2", "y", "2030-01-01 00:00:00", None, True),
        ],
        "k string, a string, valid_from string, valid_to string, "
        "is_current boolean",
    ).withColumns(
        {
            "valid_from": F.col("valid_from").cast("timestamp"),
            "valid_to": F.col("valid_to").cast("timestamp"),
        }
    )
    monkeypatch.setattr(wh, "table_exists", lambda t: True)
    monkeypatch.setattr(wh, "read", lambda t, merge_schema=False: dim)
    recorded = {}

    def record_changeset(table, keys, changed_keys, inserts, *a, **kw):
        recorded["changed"] = sorted(r.k for r in changed_keys.collect())
        recorded["inserts"] = inserts
    monkeypatch.setattr(wh, "apply_scd2_changeset", record_changeset)

    cfg = PipelineConfig(
        name="evo",
        raw_table="r",
        dim_table="dim.t",
        business_key=("k",),
        compare_columns=("a", "b"),
    )
    batch = spark.createDataFrame(
        [("K1", "x", "new"), ("K2", "y", None), ("K3", "z", "n3")],
        "k string, a string, b string",
    )
    stats = scd2_merge(wh, cfg, batch, "2030-01-02 00:00:00", evolve=True)
    assert stats.as_dict() == {
        "unchanged": 1, "new_keys": 1, "updated_keys": 1,
    }
    assert recorded["changed"] == ["K1"]
    ins = {r.k: r for r in recorded["inserts"].collect()}
    assert set(ins) == {"K1", "K3"} and "b" in recorded["inserts"].columns
    assert ins["K1"]["b"] == "new" and ins["K3"]["b"] == "n3"


def test_merge_ops_delta_builds_three_clause_merge(
    fake_delta, spark, tmp_path, monkeypatch
):
    """merge_ops on Delta must issue the conditional three-clause
    MERGE: delete-when-op-D, update the data columns (never the _op
    marker), insert-unless-delete."""
    wh = Warehouse(spark, str(tmp_path), format="delta")
    monkeypatch.setattr(wh, "table_exists", lambda t: True)
    current = spark.createDataFrame([("K1", "a")], "k string, v string")
    monkeypatch.setattr(wh, "read", lambda t, merge_schema=False: current)
    batch = spark.createDataFrame(
        [("K1", "a2", "U"), ("K2", None, "D")],
        "k string, v string, _op string",
    )
    stats = wh.merge_ops(batch, "dim.t", keys=["k"])
    assert stats == {"deleted": 0, "updated": 1, "inserted": 0}
    (dt,) = FakeDeltaTable.instances
    ops = [entry[0] for entry in dt.log]
    assert ops == [
        "alias", "merge", "whenMatchedDelete", "whenMatchedUpdate",
        "whenNotMatchedInsert", "execute",
    ]
    _, cond = dt.log[2]
    assert cond == "s._op = 'D'"
    _, update_set, ucond = dt.log[3]
    assert set(update_set) == {"k", "v"} and ucond is None
    _, values, icond = dt.log[4]
    assert set(values) == {"k", "v"} and icond == "s._op <> 'D'"
