"""Warehouse maintenance ops: schema evolution on append-only raw
tables and small-file compaction."""

from __future__ import annotations

from pathlib import Path

import pytest

from pyspark.sql import functions as F

from lakehouse_poc_spark.sinks.warehouse import Warehouse


def test_schema_evolution_on_append(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    batch1 = spark.createDataFrame([(1, "a")], "id long, name string")
    batch2 = spark.createDataFrame(
        [(2, "b", "extra")], "id long, name string, note string"
    )
    wh.append(batch1, "raw.t")
    wh.append(batch2, "raw.t")
    merged = wh.read("raw.t", merge_schema=True)
    assert set(merged.columns) == {"id", "name", "note"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].note is None and rows[2].note == "extra"


def test_compaction_reduces_files_preserves_rows(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i in range(6):  # six tiny appends → many small files
        wh.append(
            spark.range(i * 10, (i + 1) * 10).withColumn("v", F.col("id") * 2),
            "raw.many",
        )
    files_before = len(list(wh.path("raw.many").glob("*.parquet")))
    assert files_before >= 6
    reported = wh.compact("raw.many", target_files=2)
    assert reported == files_before
    files_after = len(list(wh.path("raw.many").glob("*.parquet")))
    assert files_after <= 2
    compacted = wh.read("raw.many")
    assert compacted.count() == 60
    assert compacted.agg(F.sum("v")).collect()[0][0] == sum(2 * i for i in range(60))


def test_partitioned_compaction_preserves_layout(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i in range(4):
        df = spark.range(i * 10, (i + 1) * 10).withColumn(
            "day", (F.col("id") % 2).cast("string")
        )
        wh.append(df, "raw.part", partition_by=["day"])
    before = wh.compact("raw.part", target_files=1, partition_by=["day"])
    assert before >= 8  # 4 appends × 2 partition dirs, counted recursively
    root = wh.path("raw.part")
    # partition dirs survive the rewrite
    assert (root / "day=0").exists() and (root / "day=1").exists()
    assert len(list(root.glob("day=*/*.parquet"))) <= 2
    back = wh.read("raw.part")
    assert back.count() == 40
    # pruning still works: reading one partition touches one dir
    one = spark.read.parquet(str(root)).filter(F.col("day") == "0")
    assert one.count() == 20


def test_partitioned_compaction_spreads_target_files(spark, tmp_path):
    """target_files>1 must yield MULTIPLE files per partition dir (salted
    writers), not one giant file per partition value (ADVICE r2)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i in range(6):
        df = spark.range(i * 100, (i + 1) * 100).withColumn(
            "day", (F.col("id") % 2).cast("string")
        )
        wh.append(df, "raw.part_multi", partition_by=["day"])
    wh.compact("raw.part_multi", target_files=4, partition_by=["day"])
    root = wh.path("raw.part_multi")
    for d in ("day=0", "day=1"):
        n = len(list((root / d).glob("*.parquet")))
        assert 2 <= n <= 4, f"{d}: {n} files (want ~target_files=4, got 1-file skew?)"
    back = wh.read("raw.part_multi")
    assert back.count() == 600
    assert back.agg(F.countDistinct("id")).collect()[0][0] == 600


def test_delta_backend_guarded(spark, tmp_path):
    import pytest

    from lakehouse_poc_spark.sinks.warehouse import delta_available

    with pytest.raises(ValueError):
        Warehouse(spark, str(tmp_path / "wh"), format="orc")
    if not delta_available():
        with pytest.raises(ImportError, match="delta-spark"):
            Warehouse(spark, str(tmp_path / "wh"), format="delta")


def test_delta_backend_scd2_roundtrip(spark, tmp_path):
    """Full SCD2 merge on the Delta backend — exercises DeltaTable.merge
    + append instead of the staged-swap rewrite. Skips in containers
    without delta-spark (this one, by design)."""
    import pytest

    pytest.importorskip("delta")
    from lakehouse_poc_spark.config import PipelineConfig
    from lakehouse_poc_spark.operators.scd2 import scd2_merge

    wh = Warehouse(spark, str(tmp_path / "wh"), format="delta")
    cfg = PipelineConfig(
        raw_table="raw.t", dim_table="dim.t",
        business_key=("k",), compare_columns=("v",),
    )
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    s1 = scd2_merge(wh, cfg, b1, "2024-01-01 00:00:00")
    assert s1.new_keys == 2
    b2 = spark.createDataFrame([(1, "a2"), (3, "c")], "k long, v string")
    s2 = scd2_merge(wh, cfg, b2, "2024-02-01 00:00:00")
    assert (s2.new_keys, s2.updated_keys) == (1, 1)
    dim = wh.read("dim.t")
    assert dim.count() == 4  # 2 open originals -> 1 closed + 3 open
    assert dim.filter(F.col(cfg.technical.is_current)).count() == 3


def test_drop_partitions_retention(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 4) + 1:02d}") for i in range(40)],
        "id long, day string",
    )
    wh.append(df, "raw.ev", partition_by=["day"])
    import pytest

    with pytest.raises(ValueError):
        wh.drop_partitions("raw.ev", "day")
    assert wh.drop_partitions("raw.ev", "day", before="2024-01-03") == 2
    left = wh.read("raw.ev")
    assert left.count() == 20
    assert sorted(str(r.day) for r in left.select("day").distinct().collect()) == [
        "2024-01-03",
        "2024-01-04",
    ]
    assert wh.drop_partitions("raw.ev", "day", values=["2024-01-04"]) == 1
    assert wh.read("raw.ev").count() == 10


def test_compaction_cluster_by_gives_disjoint_file_ranges(spark, tmp_path):
    """cluster_by rewrites into range-disjoint, sorted files so parquet
    min/max stats can skip whole files for selective filters."""
    import pyarrow.parquet as pq

    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(400).select(
        F.col("id"), F.pmod(F.col("id") * 37 + 11, 400).alias("v")
    )
    wh.append(df.repartition(8), "raw.clustered")
    with pytest.raises(ValueError):
        wh.compact("raw.clustered", 2, partition_by=["v"], cluster_by=["v"])
    wh.compact("raw.clustered", target_files=4, cluster_by=["v"])
    files = sorted(wh.path("raw.clustered").glob("*.parquet"))
    assert 2 <= len(files) <= 4
    ranges = []
    for f in files:
        md = pq.read_metadata(f)
        col_idx = [md.schema.column(i).name for i in range(md.num_columns)].index("v")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary value may touch)
    assert wh.read("raw.clustered").count() == 400


def test_compaction_zorder_shrinks_both_dimension_ranges(spark, tmp_path):
    """Z-order clustering: each output file covers a sub-range of BOTH
    columns (vs 1D clustering, which only bounds its own column), so
    min/max stats skip files for filters on either dimension."""
    import pyarrow.parquet as pq

    wh = Warehouse(spark, str(tmp_path / "wh"))
    n = 1024
    df = spark.range(n).select(
        F.pmod(F.col("id") * 73, n).alias("x"),
        F.pmod(F.col("id") * 151, n).alias("y"),
    )
    wh.append(df.repartition(8), "raw.z")
    wh.compact("raw.z", target_files=16, zorder_by=("x", "y"))
    files = sorted(wh.path("raw.z").glob("*.parquet"))
    assert len(files) >= 8
    spans = []
    for f in files:
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans.append(((max(xs) - min(xs)) / n, (max(ys) - min(ys)) / n))
    # average per-file span in EACH dimension well below the full range
    import statistics

    assert statistics.mean(s[0] for s in spans) < 0.55
    assert statistics.mean(s[1] for s in spans) < 0.55
    assert wh.read("raw.z").count() == n


def test_vacuum_removes_stranded_swap_dirs(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    wh.append(df, "raw.t")
    # simulate a crash between write and swap
    (wh.path("raw.t").parent / "t__staging").mkdir()
    (wh.path("raw.t").parent / "t__old").mkdir()
    assert wh.vacuum() == 2
    assert wh.vacuum() == 0
    assert wh.read("raw.t").count() == 10


def test_time_travel_versions_and_history(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"), track_versions=True)
    t = "dim.v"
    wh.overwrite(spark.range(3).selectExpr("id", "id AS v"), t)
    assert wh.version(t) == 0
    wh.overwrite_from_plan(wh.read(t).withColumn("v", F.col("v") + 10), t)
    wh.overwrite_from_plan(wh.read(t).withColumn("v", F.col("v") + 100), t)
    assert wh.version(t) == 2
    assert [r["id"] for r in wh.read_version(t, 0).orderBy("id").collect()] == [0, 1, 2]
    assert wh.read_version(t, 0).orderBy("id").collect()[1]["v"] == 1
    assert wh.read_version(t, 1).orderBy("id").collect()[1]["v"] == 11
    assert wh.read_version(t, 2).orderBy("id").collect()[1]["v"] == 111
    hist = wh.history(t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[-1]["current"] and not hist[0]["current"]


def test_vacuum_retention_never_reuses_version_numbers(spark, tmp_path):
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"), track_versions=True)
    t = "dim.v"
    wh.overwrite(spark.range(2).selectExpr("id", "0 AS gen"), t)
    for gen in (1, 2, 3):
        wh.overwrite(spark.range(2).selectExpr("id", f"{gen} AS gen"), t)
    assert wh.version(t) == 3
    assert wh.vacuum(retain_versions=1) == 2  # v0, v1 pruned
    with pytest.raises(ValueError):
        wh.read_version(t, 0)
    # the next rewrite must mint v3's archive slot, not recycle v0's
    wh.overwrite(spark.range(2).selectExpr("id", "4 AS gen"), t)
    assert wh.version(t) == 4
    assert wh.read_version(t, 3).first()["gen"] == 3


def test_table_changes_emits_all_four_change_types(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"), track_versions=True)
    t = "dim.cdc"
    wh.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None)], "k int, v string"
        ),
        t,
    )
    wh.overwrite_from_plan(
        spark.createDataFrame(
            # k=1 unchanged, k=2 updated, k=3 null→value, k=4 inserted
            [(1, "a"), (2, "B"), (3, "c"), (4, "d")], "k int, v string"
        ),
        t,
    )
    rows = {
        (r["k"], r["_change_type"]): r["v"]
        for r in wh.table_changes(t, 0, 1, keys=["k"]).collect()
    }
    assert rows == {
        (2, "update_preimage"): "b",
        (2, "update_postimage"): "B",
        (3, "update_preimage"): None,  # null-safe compare flags null→'c'
        (3, "update_postimage"): "c",
        (4, "insert"): "d",
    }
    # reverse direction: the insert reads back as a delete
    back = wh.table_changes(t, 1, 0, keys=["k"]).filter(
        "_change_type = 'delete'"
    ).collect()
    assert [(r["k"], r["v"]) for r in back] == [(4, "d")]


def test_drop_removes_version_archive(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"), track_versions=True)
    t = "dim.v"
    wh.overwrite(spark.range(2), t)
    wh.overwrite_from_plan(wh.read(t), t)
    assert wh._versions_dir(t).exists()
    wh.drop(t)
    assert not wh._versions_dir(t).exists()
    assert not wh.table_exists(t)


def test_delete_where_rewrites_complement_and_versions(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"), track_versions=True)
    t = "fact.t"
    wh.append(spark.range(10).selectExpr("id", "id % 3 AS g"), t)
    wh.delete_where(t, F.col("g") == 1)
    kept = sorted(r["id"] for r in wh.read(t).collect())
    assert kept == [0, 2, 3, 5, 6, 8, 9]
    # the pre-delete state is time-travelable
    assert wh.read_version(t, 0).count() == 10
    # string predicates work too
    wh.delete_where(t, "id >= 8")
    assert sorted(r["id"] for r in wh.read(t).collect()) == [0, 2, 3, 5, 6]


def test_write_audit_publish_gates_bad_batches(spark, tmp_path):
    from lakehouse_poc_spark.operators import quality as Q

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "pub.t"
    good = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    rules = [Q.in_range("v_range", "v", 0, 100)]
    r1 = wh.write_audit_publish(good, t, rules)
    assert r1 == {"published": True, "n_rows": 10, "n_invalid": 0}
    assert wh.read(t).count() == 10
    # a bad batch must NOT replace the live table
    bad = spark.range(5).selectExpr("id", "CAST(id * 1000 AS DOUBLE) AS v")
    r2 = wh.write_audit_publish(bad, t, rules)
    assert not r2["published"] and r2["n_invalid"] == 4
    assert wh.read(t).count() == 10  # live table untouched
    assert not (wh.path(t).parent / "t__staging").exists()  # branch dropped
    # tolerance: allow up to 4 invalid rows → publishes
    r3 = wh.write_audit_publish(bad, t, rules, max_invalid=4)
    assert r3["published"] and wh.read(t).count() == 5


def test_bucket_drift_metrics_and_rebucket(spark, tmp_path):
    """Drift probe: histogram sums to total, skewed keys trip the
    skew>2 gate, sizing recommends a power of two, and re-bucketing
    preserves content while updating the persisted spec."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.sinks.bucketing import (
        BucketSpec,
        bucket_drift,
        bucket_histogram,
        rebucket,
    )

    # uniform keys: 4 buckets of ~250 rows, skew ≈ 1, right-sized
    uniform = spark.range(1000).select(F.col("id").alias("k"))
    spec = BucketSpec(
        table="t_uniform", key="k", n_buckets=4, target_rows_per_bucket=250
    )
    hist = bucket_histogram(uniform, "k", 4).collect()
    assert sum(r.rows for r in hist) == 1000
    d = bucket_drift(uniform, spec)
    assert d["total_rows"] == 1000
    assert d["recommended_n"] == 4
    assert d["skew"] < 2.0 and not d["rebucket"]

    # one hot key (90% of rows) must trip the skew gate at the same n
    hot = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(7)).otherwise(F.col("id")).alias("k")
    )
    d_hot = bucket_drift(hot, spec)
    assert d_hot["skew"] > 2.0 and d_hot["rebucket"]

    # growth: 10x the rows at the same target → recommended_n is the
    # next power of two ≥ total/target, and rebucket fires
    grown = spark.range(10_000).select(F.col("id").alias("k"))
    d_grown = bucket_drift(grown, spec)
    assert d_grown["recommended_n"] == 64  # ceil(10000/250)=40 → 64
    assert d_grown["rebucket"]

    # rebucket: content invariant, spec persisted with the new n
    tbl, new_spec = rebucket(
        spark, grown, "blc_test_grown", spec, 64, tmp_path
    )
    assert tbl.count() == 10_000
    assert new_spec.n_buckets == 64
    reloaded = BucketSpec.load(tmp_path, "blc_test_grown")
    assert reloaded.n_buckets == 64 and reloaded.key == "k"
    spark.sql("DROP TABLE IF EXISTS blc_test_grown")


def test_publish_tables_all_or_nothing(spark, tmp_path):
    """Multi-table WAP: both tables flip together; one bad table
    blocks the WHOLE set and leaves every live table untouched."""
    from lakehouse_poc_spark.operators import quality as Q

    wh = Warehouse(spark, str(tmp_path / "wh"))
    facts = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    dims = spark.range(3).selectExpr("id AS k", "'x' AS name")
    rules = {"pub.facts": [Q.in_range("v_range", "v", 0, 100)]}
    r1 = wh.publish_tables({"pub.facts": facts, "pub.dims": dims}, rules)
    assert r1["published"]
    assert r1["tables"]["pub.facts"] == {"n_rows": 10, "n_invalid": 0}
    assert wh.read("pub.facts").count() == 10
    assert wh.read("pub.dims").count() == 3

    # second round: facts batch violates → NEITHER table changes
    bad_facts = spark.range(4).selectExpr("id", "CAST(id * 1000 AS DOUBLE) AS v")
    new_dims = spark.range(7).selectExpr("id AS k", "'y' AS name")
    r2 = wh.publish_tables({"pub.facts": bad_facts, "pub.dims": new_dims}, rules)
    assert not r2["published"]
    assert r2["tables"]["pub.facts"]["n_invalid"] == 3
    assert wh.read("pub.facts").count() == 10  # old facts
    assert wh.read("pub.dims").count() == 3    # old dims, though new ones were valid
    # no staging litter
    assert not list((tmp_path / "wh" / "pub").glob("*__staging"))

    # third round: both valid → both flip
    r3 = wh.publish_tables(
        {"pub.facts": facts.limit(6), "pub.dims": new_dims}, rules
    )
    assert r3["published"]
    assert wh.read("pub.facts").count() == 6
    assert wh.read("pub.dims").count() == 7


def test_publish_tables_mid_swap_restores_in_flight_table(
    spark, tmp_path, monkeypatch
):
    """A failure between archiving a table's live dir and renaming its
    staged replacement must restore THAT table too — not just the
    already-swapped ones — so readers never see it absent."""
    import shutil as _shutil

    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"), track_versions=True)
    facts = spark.range(10).selectExpr("id")
    dims = spark.range(3).selectExpr("id AS k")
    assert wh.publish_tables({"ms.facts": facts, "ms.dims": dims})["published"]

    # Fail the swap AFTER _archive_current has moved ms.dims's live dir
    # away: patch rmtree used on the target (which for the second table
    # doesn't exist post-archive) — instead fail branch.rename via a
    # poisoned Path.rename on the second staged branch. Simplest hook:
    # make shutil.rmtree raise when called on the dims target path.
    real_rename = Path.rename
    calls = {"n": 0}

    def flaky_rename(self, *a, **kw):
        if self.name.endswith("__staging") or "__staging" in str(self):
            calls["n"] += 1
            if calls["n"] == 2:  # second table's install step
                raise OSError("disk full mid-swap")
        return real_rename(self, *a, **kw)

    monkeypatch.setattr(Path, "rename", flaky_rename)
    with pytest.raises(OSError, match="disk full"):
        wh.publish_tables(
            {
                "ms.facts": spark.range(20).selectExpr("id"),
                "ms.dims": spark.range(5).selectExpr("id AS k"),
            }
        )
    monkeypatch.setattr(Path, "rename", real_rename)
    # BOTH tables readable with their pre-publish contents: facts rolled
    # back from archive, in-flight dims restored from its just-archived
    # snapshot (previously it was left absent).
    assert wh.read("ms.facts").count() == 10
    assert wh.read("ms.dims").count() == 3
    _shutil.rmtree(str(tmp_path / "wh"), ignore_errors=True)


def test_restore_to_archived_version_is_new_version(spark, tmp_path):
    """RESTORE rolls content back AND preserves history (the restore
    is itself a new version, so it can be undone)."""
    import pytest

    wh = Warehouse(spark, str(tmp_path / "wh"), track_versions=True)
    t = "fact.r"
    wh.overwrite(spark.range(10).selectExpr("id"), t)            # v0
    wh.overwrite(spark.range(100, 103).selectExpr("id"), t)      # v1 (v0 archived)
    assert wh.read(t).count() == 3
    new_v = wh.restore(t, 0)                                     # v2 = v0 content
    assert new_v == 2
    assert sorted(r.id for r in wh.read(t).collect()) == list(range(10))
    # the pre-restore state survives as v1 — restore is undoable
    assert wh.read_version(t, 1).count() == 3
    with pytest.raises(ValueError):
        wh.restore(t, 99)
    wh_nt = Warehouse(spark, str(tmp_path / "wh2"))
    wh_nt.append(spark.range(1), "x.t")
    with pytest.raises(ValueError):
        wh_nt.restore("x.t", 0)


def test_surrogate_keys_stable_and_inferred_members(spark):
    """Surrogate keys: re-running assignment is a no-op for existing
    members; new members extend from max(sk). Inferred members: one
    placeholder per missing key, defaults + flag set."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.operators.scd2 import (
        assign_surrogate_keys,
        inferred_members,
    )

    batch1 = spark.createDataFrame([("b",), ("a",), ("c",)], ["k"])
    dim = assign_surrogate_keys(None, batch1, ["k"])
    got = {r.k: r.sk for r in dim.collect()}
    assert got == {"a": 1, "b": 2, "c": 3}  # ordered by business key
    # re-run with overlap + new members: only d/e get keys, from 4
    batch2 = spark.createDataFrame([("c",), ("e",), ("d",), ("e",)], ["k"])
    new = assign_surrogate_keys(dim, batch2, ["k"])
    got2 = {r.k: r.sk for r in new.collect()}
    assert got2 == {"d": 4, "e": 5}
    # blocked variant agrees with the plain one
    blocked = assign_surrogate_keys(
        dim, batch2, ["k"], block=F.substring("k", 1, 1)
    )
    assert {r.k: r.sk for r in blocked.collect()} == got2

    facts = spark.createDataFrame([("a", 1), ("z", 2), ("z", 3)], ["k", "v"])
    ph = inferred_members(facts, dim, ["k"], {"name": "UNKNOWN"})
    rows = ph.collect()
    assert len(rows) == 1 and rows[0].k == "z"
    assert rows[0].name == "UNKNOWN" and rows[0].is_inferred


def test_upsert_file_pruned_rewrites_only_matched_files(spark, tmp_path):
    """The parquet twin of Delta's file-pruned MERGE: on a
    key-clustered layout a narrow batch rewrites only the files
    holding its keys; content equals the plain-upsert contract;
    untouched files stay physically identical (same path, same
    bytes)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "dim.c"
    # key-clustered layout: 10 files of 100 keys each (repartitionByRange)
    base = spark.range(1000).selectExpr("id AS k", "CAST(id AS STRING) AS v")
    base.repartitionByRange(10, "k").write.parquet(str(wh.path(t)))
    files_before = {
        p.name: p.stat().st_mtime_ns
        for p in wh.path(t).glob("*.parquet")
    }
    assert len(files_before) == 10

    # batch touches keys 0-49 (one range file) + inserts 2000-2004
    batch = spark.createDataFrame(
        [(k, f"new{k}") for k in range(50)] + [(2000 + i, "ins") for i in range(5)],
        "k long, v string",
    )
    stats = wh.upsert_file_pruned(batch, t, keys=["k"])
    assert stats["files_total"] == 10
    assert stats["files_rewritten"] == 1  # clustered: one file holds 0-49
    assert stats["rows_inserted_or_updated"] == 55

    got = {r.k: r.v for r in wh.read(t).collect()}
    assert len(got) == 1005
    assert got[0] == "new0" and got[49] == "new49" and got[50] == "50"
    assert got[2004] == "ins"
    # untouched files are bit-identical in place (same mtime):
    files_after = {
        p.name: p.stat().st_mtime_ns for p in wh.path(t).glob("*.parquet")
    }
    untouched = set(files_before) & set(files_after)
    assert len(untouched) == 9
    assert all(files_before[n] == files_after[n] for n in untouched)
    assert not list(wh.root.glob("**/*__staging"))  # staging cleaned

    # pure-insert batch rewrites nothing
    stats2 = wh.upsert_file_pruned(
        spark.createDataFrame([(3000, "x")], "k long, v string"), t, ["k"]
    )
    assert stats2["files_rewritten"] == 0
    assert wh.read(t).count() == 1006

    # partitioned layouts are rejected with guidance
    wh.append(
        spark.range(4).selectExpr("id", "CAST(id % 2 AS STRING) AS day"),
        "fact.p",
        partition_by=["day"],
    )
    with pytest.raises(ValueError, match="overwrite_partitions"):
        wh.upsert_file_pruned(
            spark.range(1).selectExpr("id", "'0' AS day"), "fact.p", ["id"]
        )


def test_delete_where_file_pruned_touches_only_matching_files(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "fact.d"
    spark.range(1000).selectExpr("id AS k", "id % 7 AS v").repartitionByRange(
        10, "k"
    ).write.parquet(str(wh.path(t)))
    before = {p.name: p.stat().st_mtime_ns for p in wh.path(t).glob("*.parquet")}
    stats = wh.delete_where_file_pruned(t, "k >= 100 AND k < 150")
    assert stats == {"files_total": 10, "files_rewritten": 1, "rows_deleted": 50}
    assert wh.read(t).count() == 950
    assert wh.read(t).filter("k >= 100 AND k < 150").count() == 0
    after = {p.name: p.stat().st_mtime_ns for p in wh.path(t).glob("*.parquet")}
    untouched = set(before) & set(after)
    assert len(untouched) == 9
    assert all(before[n] == after[n] for n in untouched)
    # no-match delete touches nothing
    stats2 = wh.delete_where_file_pruned(t, "k > 10000000")
    assert stats2["files_rewritten"] == 0 and stats2["rows_deleted"] == 0
    assert wh.read(t).count() == 950


def test_compaction_by_target_bytes(spark, tmp_path):
    """target_file_bytes sizes the rewrite from on-disk bytes: a table
    of N compressed bytes compacted at ~N/3 per file lands near 3
    files; the two sizing knobs are mutually exclusive."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    for i in range(8):
        wh.append(
            spark.range(i * 500, (i + 1) * 500).selectExpr(
                "id", "CAST(id AS STRING) AS s"
            ),
            "raw.b",
        )
    total = sum(f.stat().st_size for f in wh.path("raw.b").glob("**/*.parquet"))
    wh.compact("raw.b", target_file_bytes=total // 3)
    n = len(list(wh.path("raw.b").glob("*.parquet")))
    assert 2 <= n <= 4, n
    assert wh.read("raw.b").count() == 4000
    with pytest.raises(ValueError, match="exactly one"):
        wh.compact("raw.b", target_files=2, target_file_bytes=1)
    with pytest.raises(ValueError, match="exactly one"):
        wh.compact("raw.b")


def test_vacuum_sweeps_upsert_staging_leftovers(spark, tmp_path):
    """A crash between staging and publish in upsert_file_pruned leaves
    <table>__upsert__staging behind; vacuum() must sweep it like the
    other staging suffixes."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(spark.range(10).selectExpr("id"), "dim.v")
    leftover = wh.path("dim.v").with_name("v__upsert__staging")
    leftover.mkdir(parents=True)
    (leftover / "part-junk.parquet").write_bytes(b"x")
    removed = wh.vacuum()
    assert removed >= 1
    assert not leftover.exists()
    assert wh.read("dim.v").count() == 10  # live table untouched


def test_writer_lock_serializes_concurrent_file_pruned_upserts(spark, tmp_path):
    """Multi-writer file-pruned DML: two unsynchronized upserts racing
    on the same table could both rewrite a shared file from their own
    snapshot and the later move would drop the earlier writer's rows.
    The per-table advisory lock serializes them — after N concurrent
    upserts from T threads, every batch's rows must be present."""
    import threading

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "dim.race"
    spark.range(1000).selectExpr("id AS k", "'base' AS v").repartitionByRange(
        4, "k"
    ).write.parquet(str(wh.path(t)))

    errors: list[Exception] = []

    def writer(tid: int) -> None:
        try:
            for round_ in range(3):
                # each (thread, round) updates a distinct 20-key slice
                lo = tid * 300 + round_ * 100
                batch = spark.createDataFrame(
                    [(lo + i, f"w{tid}r{round_}") for i in range(20)],
                    "k long, v string",
                )
                wh.upsert_file_pruned(batch, t, keys=["k"])
        except Exception as exc:  # surfaced below — don't swallow
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(tid,)) for tid in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors

    got = {r.k: r.v for r in wh.read(t).collect()}
    assert len(got) == 1000  # no duplicates, no lost rows
    for tid in range(3):
        for round_ in range(3):
            lo = tid * 300 + round_ * 100
            for i in range(20):
                assert got[lo + i] == f"w{tid}r{round_}", (tid, round_, i)
    # lock released: dir gone
    assert not wh.path(t).with_name("race__lock").exists()


def test_writer_lock_timeout_and_stale_breaker(spark, tmp_path):
    import os as _os

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "dim.locked"
    wh.overwrite(spark.range(10).selectExpr("id AS k", "'a' AS v"), t)
    lock = wh.path(t).with_name("locked__lock")

    # live lock (fresh mtime) → contender times out
    lock.mkdir()
    with pytest.raises(TimeoutError, match="writer lock"):
        with wh._writer_lock(t, timeout=0.3):
            pass
    # stale lock (older than ttl) → broken and acquired
    old = 1_000_000.0
    _os.utime(lock, (old, old))
    with wh._writer_lock(t, timeout=0.3):
        assert lock.exists()  # re-created by the winner
    assert not lock.exists()


def test_vacuum_sweeps_stale_writer_locks_only(spark, tmp_path):
    import os as _os

    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(spark.range(5).selectExpr("id"), "dim.w")
    stale = wh.path("dim.w").with_name("w__lock")
    stale.mkdir()
    _os.utime(stale, (1_000_000.0, 1_000_000.0))
    fresh = wh.path("dim.w").parent / "other__lock"
    fresh.mkdir()
    wh.vacuum()
    assert not stale.exists()
    assert fresh.exists()  # young lock may be live — must survive


def test_file_bloom_prunes_without_false_negatives(spark, tmp_path):
    """On a date-clustered layout (min/max on the key is useless) the
    per-file bloom must skip most files for a point lookup while the
    surviving set still contains EVERY real match; and an absent key
    prunes everything (empty typed frame, no error)."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.operators.filestats import (
        bloom_probe_positions,
        bloom_pruned_read,
        build_file_bloom,
    )

    # 8 files clustered by ts; key appears in exactly 2 files
    df = spark.range(4000).select(
        F.col("id").alias("ts"),
        (F.pmod(F.col("id") * 37, 997)).alias("key"),
    )
    path = str(tmp_path / "t")
    df.repartitionByRange(8, "ts").write.parquet(path)
    blooms = build_file_bloom(spark, path, "key")
    assert blooms.count() == 8

    expect = {r.ts for r in df.filter("key = 5").collect()}
    got_df = bloom_pruned_read(spark, blooms, "key", 5)
    got = {r.ts for r in got_df.collect()}
    assert got == expect and expect  # no false negatives, non-trivial

    # pruning actually skipped files: survivors < total
    probes = bloom_probe_positions(spark, 5)
    lit_probes = F.array(*[F.lit(p) for p in probes])
    n_surv = blooms.filter(
        F.size(F.array_except(lit_probes, F.col("bits"))) == 0
    ).count()
    assert n_surv < 8, n_surv

    # absent key: empty but typed
    missing = bloom_pruned_read(spark, blooms, "key", 10_000_000)
    assert missing.count() == 0
    assert set(missing.columns) == {"ts", "key"}


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """SQL DELETE semantics: only pred==TRUE rows are removed;
    NULL-predicate rows survive, matching the Delta/Iceberg native
    DELETE branches (ADVICE r6 — a plain ~pred silently dropped them)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "fact.nulls"
    df = spark.createDataFrame(
        [(1, -5.0), (2, None), (3, 7.0), (4, None), (5, -1.0)],
        "id long, value double",
    )
    wh.overwrite(df, t)
    wh.delete_where(t, "value < 0")
    assert sorted(r["id"] for r in wh.read(t).collect()) == [2, 3, 4]


def test_delete_where_file_pruned_null_predicate_rows_survive(spark, tmp_path):
    """File-pruned DELETE twin of the null-safety contract: NULL rows
    in touched files must be rewritten as survivors, and rows_deleted
    counts pred==TRUE rows only."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "fact.nullsfp"
    df = spark.createDataFrame(
        [(1, -5.0), (2, None), (3, 7.0), (4, None), (5, -1.0)],
        "id long, value double",
    )
    df.coalesce(1).write.parquet(str(wh.path(t)))
    stats = wh.delete_where_file_pruned(t, "value < 0")
    assert stats["rows_deleted"] == 2  # TRUE matches only
    assert sorted(r["id"] for r in wh.read(t).collect()) == [2, 3, 4]


def test_writer_lock_release_verifies_ownership(spark, tmp_path):
    """A past-ttl-but-alive holder whose lock was broken by a
    contender must NOT delete the new holder's lock on its way out
    (ADVICE r6: release checks the owner token)."""
    import os as _os

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "dim.own"
    wh.overwrite(spark.range(3).selectExpr("id"), t)
    lock = wh.path(t).with_name("own__lock")

    slow = wh._writer_lock(t)
    slow.__enter__()
    _os.utime(lock, (1_000_000.0, 1_000_000.0))  # holder overran the ttl
    # contender is a DIFFERENT warehouse instance (same-instance
    # same-thread acquisition is reentrant by design)
    wh2 = Warehouse(spark, str(tmp_path / "wh"))
    fast = wh2._writer_lock(t, timeout=1.0)
    fast.__enter__()  # breaks the stale lock, acquires its own
    assert lock.exists()
    slow.__exit__(None, None, None)  # slow holder exits late
    assert lock.exists()  # fast holder's lock untouched
    fast.__exit__(None, None, None)
    assert not lock.exists()


def test_stale_lock_break_has_single_winner(spark, tmp_path):
    """N threads racing to break ONE stale lock: the tombstone-rename
    claim admits exactly one contender into the critical section at a
    time (the pre-fix rmtree→mkdir interleave let two break-and-hold)."""
    import os as _os
    import threading
    import time as _time

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "dim.stale"
    wh.overwrite(spark.range(3).selectExpr("id"), t)
    lock = wh.path(t).with_name("stale__lock")
    lock.mkdir()
    _os.utime(lock, (1_000_000.0, 1_000_000.0))

    inside: list[int] = []
    overlap: list[int] = []
    gate = threading.Lock()
    errors: list[Exception] = []

    def contender(i: int) -> None:
        try:
            with wh._writer_lock(t, timeout=15.0):
                with gate:
                    if inside:
                        overlap.append(i)
                    inside.append(i)
                _time.sleep(0.02)
                with gate:
                    inside.remove(i)
        except Exception as exc:
            errors.append(exc)

    threads = [
        threading.Thread(target=contender, args=(i,)) for i in range(6)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert not overlap, f"double-held by {overlap}"
    assert not lock.exists()


def test_persisted_bloom_index_maintained_through_dml(spark, tmp_path):
    """SCALE.md 6.3: the bloom index lives as a _bloom.<table> side
    table, refreshes INCREMENTALLY inside file-pruned DML (only
    rewritten files rebuild), and bloom_lookup through it equals the
    full-scan filter before and after every mutation."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "raw.k"
    spark.range(2000).selectExpr(
        "id AS k", "CAST(id % 7 AS STRING) AS v"
    ).repartitionByRange(8, "k").write.parquet(str(wh.path(t)))
    n_files = wh.build_bloom_index(t, "k")
    assert n_files == 8
    assert wh.table_exists("_bloom.raw.k")

    def full_scan(key):
        return sorted(
            (r.k, r.v) for r in wh.read(t).filter(F.col("k") == key).collect()
        )

    assert sorted(
        (r.k, r.v) for r in wh.bloom_lookup(t, "k", 42).collect()
    ) == full_scan(42)

    # upsert: changed keys + a brand-new key; auto-refresh keeps the
    # lookup exact and only the touched file rows rebuilt
    batch = spark.createDataFrame(
        [(42, "NEW"), (43, "NEW"), (5000, "INS")], "k long, v string"
    )
    stats = wh.upsert_file_pruned(batch, t, keys=["k"])
    assert 0 < stats["files_rewritten"] < 8
    assert [r.v for r in wh.bloom_lookup(t, "k", 42).collect()] == ["NEW"]
    assert [r.v for r in wh.bloom_lookup(t, "k", 5000).collect()] == ["INS"]
    # index row count == live file count (stale rows dropped)
    live = len(wh._data_files(t))
    assert wh.read("_bloom.raw.k").count() == live

    # delete: survivors rewritten, lookup of the deleted key is empty
    wh.delete_where_file_pruned(t, "k = 43")
    assert wh.bloom_lookup(t, "k", 43).count() == 0
    assert wh.read("_bloom.raw.k").count() == len(wh._data_files(t))

    # refresh stats on a clean index: no work
    assert wh.refresh_bloom_index(t)["files_added"] == 0


def test_bloom_lookup_survives_stale_index_without_false_negatives(
    spark, tmp_path
):
    """An append the index has not seen yet: its files count as
    'maybe contains' and are always read, so staleness can never drop
    a result row."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "raw.s"
    spark.range(100).selectExpr("id AS k", "'old' AS v").coalesce(
        2
    ).write.parquet(str(wh.path(t)))
    wh.build_bloom_index(t, "k")
    # append OUTSIDE the hooked DML paths: index is now stale
    wh.append(
        spark.createDataFrame([(999, "fresh")], "k long, v string"), t
    )
    assert [r.v for r in wh.bloom_lookup(t, "k", 999).collect()] == ["fresh"]
    # explicit refresh reconciles; lookup result unchanged
    st = wh.refresh_bloom_index(t)
    assert st["files_added"] >= 1
    assert [r.v for r in wh.bloom_lookup(t, "k", 999).collect()] == ["fresh"]


def test_vacuum_sweeps_stranded_lock_tombstones(spark, tmp_path):
    """A crash between the stale-break claim rename and its rmtree
    strands a <table>__lock.tomb.* dir; vacuum removes it at any age
    (claimed tombstones are never live locks)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(spark.range(3).selectExpr("id"), "dim.t")
    tomb = wh.path("dim.t").with_name("t__lock.tomb.deadbeef")
    tomb.mkdir()
    assert wh.vacuum() >= 1
    assert not tomb.exists()


def test_deletion_vector_delete_matches_cow(spark, tmp_path):
    """MOR delete via deletion vectors: read_mor equals the
    copy-on-write delete result; data files stay untouched until
    compaction purges them."""
    import hashlib

    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    t = "fact.dv"
    df = spark.range(100).selectExpr(
        "id", "CASE WHEN id % 10 = 0 THEN NULL ELSE id * 2 END AS v"
    ).repartition(4)
    wh.overwrite(df, t)
    before_files = {
        p.name: hashlib.md5(p.read_bytes()).hexdigest()
        for p in wh.path(t).glob("*.parquet")
    }

    # NULL-predicate rows (v IS NULL) must SURVIVE and not be counted
    stats = wh.delete_where_dv(t, "v < 40")
    assert stats["rows_deleted"] == 18  # ids 1..19 minus the 1 null (id 10)
    live = wh.read_mor(t)
    assert live.count() == 82
    assert live.filter("v IS NULL").count() == 10  # all nulls survive
    # data files untouched (pure MOR)
    after_files = {
        p.name: hashlib.md5(p.read_bytes()).hexdigest()
        for p in wh.path(t).glob("*.parquet")
    }
    assert after_files == before_files

    # double delete with the same predicate is a no-op
    stats2 = wh.delete_where_dv(t, "v < 40")
    assert stats2["rows_deleted"] == 0
    assert wh.read_mor(t).count() == 82

    # a second, overlapping delete composes
    stats3 = wh.delete_where_dv(t, "id < 30")
    assert stats3["rows_deleted"] == 30 - 18  # 18 of them already dead
    assert wh.read_mor(t).count() == 70

    expect = sorted(
        (r.id, r.v)
        for r in df.filter(
            "NOT coalesce(v < 40, false) AND NOT coalesce(id < 30, false)"
        ).collect()
    )
    assert sorted((r.id, r.v) for r in wh.read_mor(t).collect()) == expect

    # purge: only tombstoned files rewrite; result identical; DV gone
    purged = wh.compact_purge_dv(t)
    assert purged["rows_purged"] == 30
    assert not wh.table_exists(wh._dv_table(t))
    assert sorted((r.id, r.v) for r in wh.read(t).collect()) == expect
    assert sorted((r.id, r.v) for r in wh.read_mor(t).collect()) == expect


def test_dv_guards_partitioned_layout_and_cow_mixing(spark, tmp_path):
    """Deletion vectors refuse hive-partitioned layouts (basenames
    repeat across partition dirs) and CoW DML refuses to run over an
    active vector (rewrites would resurrect deleted rows)."""
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    part = "fact.pdv"
    spark.range(20).selectExpr("id", "id % 2 AS p").write.partitionBy(
        "p"
    ).parquet(str(wh.path(part)))
    with pytest.raises(ValueError, match="hive-partitioned"):
        wh.delete_where_dv(part, "id = 3")
    with pytest.raises(ValueError, match="hive-partitioned"):
        wh.read_mor(part)

    flat = "fact.fdv"
    wh.overwrite(spark.range(20).selectExpr("id", "id AS v"), flat)
    wh.delete_where_dv(flat, "id < 5")
    for op in (
        lambda: wh.upsert_file_pruned(
            spark.range(3).selectExpr("id", "id AS v"), flat, keys=["id"]
        ),
        lambda: wh.delete_where_file_pruned(flat, "id = 9"),
        lambda: wh.delete_where(flat, "id = 9"),
        lambda: wh.upsert(
            spark.range(3).selectExpr("id", "id AS v"), flat, keys=["id"]
        ),
        lambda: wh.compact(flat, target_files=1),
    ):
        with pytest.raises(ValueError, match="active deletion vector"):
            op()
    # purge clears the way for CoW again
    wh.compact_purge_dv(flat)
    wh.delete_where_file_pruned(flat, "id = 9")
    got = sorted(r.id for r in wh.read(flat).collect())
    assert got == [i for i in range(5, 20) if i != 9]

    # overwrite on a DV'd table drops the stale vector
    wh.delete_where_dv(flat, "id = 10")
    assert wh.table_exists(wh._dv_table(flat))
    wh.overwrite(spark.range(3).selectExpr("id", "id AS v"), flat)
    assert not wh.table_exists(wh._dv_table(flat))
    assert wh.read_mor(flat).count() == 3


def test_mv_incremental_scans_only_new_files(spark, tmp_path):
    """refresh() cost ∝ appended files: second batch scans only its
    own files, a no-op refresh scans zero, and incremental state
    equals a full rebuild exactly."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.sinks.matview import MaterializedAgg
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
        (F.col("id") * 1.5).alias("v"),
    )
    t = "src.events"
    wh.append(ev.filter(F.col("k") < 600).repartition(3), t)
    mv = MaterializedAgg(wh, "by_g", t, ["g"], "v")
    s0 = mv.rebuild()
    assert s0["files_scanned"] == s0["files_total"] == 3

    wh.append(ev.filter(F.col("k") >= 600).repartition(2), t)
    s1 = mv.refresh()
    assert s1["files_scanned"] == 2 and s1["files_total"] == 5
    s2 = mv.refresh()
    assert s2["files_scanned"] == 0

    got = {
        (r["g"], r["mv_n"], float(r["mv_sum"]))
        for r in mv.read().collect()
    }
    full = {
        (r["g"], r["n"], float(r["s"]))
        for r in ev.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("v").cast("decimal(30,6)")).alias("s"),
        )
        .collect()
    }
    assert got == full


def test_mv_stale_base_guard(spark, tmp_path):
    """A base rewrite (compaction) invalidates the seen-set: refresh
    refuses rather than double-counting; rebuild recovers."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.sinks.matview import MaterializedAgg
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = spark.range(100).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    t = "src.small"
    wh.append(ev.repartition(2), t)
    mv = MaterializedAgg(wh, "small_by_g", t, ["g"], "v")
    mv.rebuild()
    wh.compact(t, target_files=1)
    with _pytest.raises(ValueError, match="stale_base"):
        mv.refresh()
    s = mv.rebuild()
    assert s["files_total"] >= 1
    assert mv.read().count() == 3


def test_mv_crash_between_files_and_state_never_double_counts(
    spark, tmp_path
):
    """Two-phase commit: a crash AFTER the file-list append but
    BEFORE the state overwrite leaves orphan v+1 file rows; the next
    refresh ignores them (state still at v) and re-folds the files —
    final state equals the ground truth, no double count
    (code-review r7)."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.sinks.matview import MaterializedAgg
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    ev = spark.range(200).select(
        (F.col("id") % 5).cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    t = "src.crash"
    wh.append(ev.filter(F.col("id") < 100), t)
    mv = MaterializedAgg(wh, "crash_by_g", t, ["g"], "v")
    mv.rebuild()
    wh.append(ev.filter(F.col("id") >= 100), t)

    # simulate the crash: run ONLY phase 1 of refresh (file append at
    # v+1), never the state write
    v = mv._state_version()
    live = mv._live_files()
    seen = mv._seen_files(v)
    new = sorted(set(live) - seen)
    assert new, "fixture must add files"
    mv._record_files(new, version=v + 1, replace=False)

    # recovery: plain refresh must fold the same files exactly once
    s = mv.refresh()
    assert s["files_scanned"] == len(new)
    got = {
        (r["g"], r["mv_n"], float(r["mv_sum"]))
        for r in mv.read().collect()
    }
    want = {
        (r["g"], r["n"], float(r["s"]))
        for r in ev.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("v").cast("decimal(30,6)")).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_merge_ops_three_clauses_and_stats(spark, wh):
    b0 = spark.createDataFrame(
        [("K1", "a"), ("K2", "b"), ("K3", "c")], "k string, v string"
    )
    wh.overwrite(b0, "dim.mo")
    batch = spark.createDataFrame(
        [("K1", "a2", "U"),   # matched update
         ("K2", None, "D"),   # matched delete
         ("K4", "d", "U"),    # insert
         ("K9", None, "D")],  # no-op delete (absent key, CDC replay)
        "k string, v string, _op string",
    )
    stats = wh.merge_ops(batch, "dim.mo", keys=["k"])
    assert stats == {"deleted": 1, "updated": 1, "inserted": 1}
    rows = {r.k: r.v for r in wh.read("dim.mo").collect()}
    assert rows == {"K1": "a2", "K3": "c", "K4": "d"}


def test_merge_ops_bootstraps_missing_table_without_deletes(spark, wh):
    batch = spark.createDataFrame(
        [("K1", "a", "U"), ("K2", None, "D")],
        "k string, v string, _op string",
    )
    stats = wh.merge_ops(batch, "dim.mo2", keys=["k"])
    assert stats == {"deleted": 0, "updated": 0, "inserted": 1}
    assert [r.k for r in wh.read("dim.mo2").collect()] == ["K1"]
