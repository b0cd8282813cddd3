"""ManifestWarehouse: the versioned file-manifest commit protocol
(VERDICT r6 task 2). The headline property: file-pruned DML is atomic
to concurrent readers — the move→unlink duplicate window of the plain
parquet backend cannot be observed, because readers resolve the
committed manifest (either version N or N+1, never a mix) and commit
is a single atomic rename."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lakehouse_poc_spark.sinks.warehouse import ManifestWarehouse


def test_manifest_roundtrip_append_overwrite_versions(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.t"
    assert not wh.table_exists(t)
    wh.overwrite(spark.range(5).selectExpr("id"), t)
    assert wh.table_exists(t)
    assert wh.version(t) == 0
    assert wh.read(t).count() == 5
    wh.append(spark.range(5, 8).selectExpr("id"), t)
    assert wh.version(t) == 1
    assert sorted(r.id for r in wh.read(t).collect()) == list(range(8))
    # every version readable; history reflects ops
    assert wh.read_version(t, 0).count() == 5
    assert wh.read_version(t, 1).count() == 8
    ops = [h["op"] for h in wh.history(t)]
    assert ops == ["overwrite", "append"]
    assert [h["current"] for h in wh.history(t)] == [False, True]


def test_manifest_overwrite_from_plan_self_reference(spark, tmp_path):
    """A plan that reads the table it overwrites: the manifest pins
    the input file list at plan-build time and committed files never
    move, so no staged-swap dance is needed."""
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.self"
    wh.overwrite(spark.range(10).selectExpr("id"), t)
    wh.overwrite_from_plan(wh.read(t).filter(F.col("id") % 2 == 0), t)
    assert sorted(r.id for r in wh.read(t).collect()) == [0, 2, 4, 6, 8]
    assert wh.read_version(t, 0).count() == 10  # old version intact


def test_manifest_file_pruned_upsert_no_unlink_until_vacuum(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.k"
    wh.overwrite(
        spark.range(1000)
        .selectExpr("id AS k", "'base' AS v")
        .repartitionByRange(4, "k"),
        t,
    )
    n_files_v0 = len(wh._data_files(t))
    batch = spark.createDataFrame(
        [(i, "new") for i in range(100, 120)], "k long, v string"
    )
    stats = wh.upsert_file_pruned(batch, t, keys=["k"])
    assert stats["files_rewritten"] < n_files_v0  # pruned, not full
    got = {r.k: r.v for r in wh.read(t).collect()}
    assert len(got) == 1000
    assert all(got[i] == "new" for i in range(100, 120))
    # superseded files still on disk (old readers / time travel)...
    on_disk = len(list(wh.path(t).glob("*.parquet")))
    assert on_disk > len(wh._data_files(t))
    assert wh.read_version(t, 0).filter("v = 'new'").count() == 0
    # ...until vacuum retention sweeps them (min_age=0: test override
    # of the in-flight-stage age guard)
    removed = wh.vacuum(retain_versions=1, min_age=0)
    assert removed > 0
    assert len(list(wh.path(t).glob("*.parquet"))) == len(wh._data_files(t))
    with pytest.raises(ValueError, match="not found|vacuumed"):
        wh.read_version(t, 0)
    # live state unaffected by the sweep
    assert wh.read(t).count() == 1000


def test_manifest_restore_is_new_version(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.r"
    wh.overwrite(spark.range(4).selectExpr("id"), t)
    wh.overwrite(spark.range(9).selectExpr("id"), t)
    new_v = wh.restore(t, 0)
    assert new_v == 2  # history-preserving: restore commits forward
    assert wh.read(t).count() == 4
    assert wh.read_version(t, 1).count() == 9  # undo-able


def test_manifest_delete_where_file_pruned_null_safe(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "fact.n"
    wh.overwrite(
        spark.createDataFrame(
            [(1, -5.0), (2, None), (3, 7.0)], "id long, value double"
        ),
        t,
    )
    stats = wh.delete_where_file_pruned(t, "value < 0")
    assert stats["rows_deleted"] == 1
    assert sorted(r.id for r in wh.read(t).collect()) == [2, 3]


def test_manifest_wap_stages_invisibly(spark, tmp_path):
    from lakehouse_poc_spark.operators import quality as Q

    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "pub.t"
    rules = [Q.in_range("v_range", "v", 0, 100)]
    good = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    r1 = wh.write_audit_publish(good, t, rules)
    assert r1 == {"published": True, "n_rows": 10, "n_invalid": 0}
    # bad batch: audited files are unlinked, live manifest untouched
    bad = spark.range(5).selectExpr("id", "CAST(id * 1000 AS DOUBLE) AS v")
    r2 = wh.write_audit_publish(bad, t, rules)
    assert not r2["published"] and r2["n_invalid"] == 4
    assert wh.read(t).count() == 10
    assert wh.version(t) == 0  # no commit happened
    # on-disk: only the committed files remain (staged ones unlinked)
    assert len(list(wh.path(t).glob("*.parquet"))) == len(wh._data_files(t))


def test_manifest_publish_tables_all_or_nothing(spark, tmp_path):
    from lakehouse_poc_spark.operators import quality as Q

    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(spark.range(3).selectExpr("id AS k"), "s.a")
    wh.overwrite(spark.range(3).selectExpr("id AS k"), "s.b")
    frames = {
        "s.a": spark.range(5).selectExpr("id AS k"),
        "s.b": spark.range(9).selectExpr("id AS k", "id * 100 AS v"),
    }
    bad = wh.publish_tables(
        frames, expectations={"s.b": [Q.in_range("r", "v", 0, 10)]}
    )
    assert not bad["published"]
    assert wh.read("s.a").count() == 3 and wh.read("s.b").count() == 3
    ok = wh.publish_tables(frames)
    assert ok["published"]
    assert wh.read("s.a").count() == 5 and wh.read("s.b").count() == 9


def test_manifest_rejects_partitioned_writes(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    with pytest.raises(NotImplementedError, match="unpartitioned"):
        wh.append(spark.range(3), "raw.t", partition_by=["id"])
    with pytest.raises(NotImplementedError, match="unpartitioned"):
        wh.overwrite_partitions(spark.range(3), "raw.t", ["id"])
    with pytest.raises(NotImplementedError, match="unpartitioned"):
        wh.drop_partitions("raw.t", "id", before="5")


def test_manifest_concurrent_reader_never_sees_duplicates(spark, tmp_path):
    """THE property this backend exists for (VERDICT r6 task 2): while
    a writer loops file-pruned upserts over a fixed key set, a
    concurrent reader must NEVER observe duplicate keys or a wrong
    row count. On the plain parquet backend the move→unlink window
    makes that observable; here every read resolves one committed
    manifest — a consistent snapshot by construction."""
    import threading

    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.race"
    wh.overwrite(
        spark.range(1000)
        .selectExpr("id AS k", "'base' AS v")
        .repartitionByRange(4, "k"),
        t,
    )

    stop = threading.Event()
    errors: list[Exception] = []
    anomalies: list[tuple[int, int]] = []
    reads = [0]

    def writer() -> None:
        try:
            for i in range(8):
                lo = (i * 97) % 900
                batch = spark.createDataFrame(
                    [(lo + j, f"w{i}") for j in range(50)],
                    "k long, v string",
                )
                wh.upsert_file_pruned(batch, t, keys=["k"])
        except Exception as exc:
            errors.append(exc)
        finally:
            stop.set()

    def reader() -> None:
        try:
            while not stop.is_set():
                snap = wh.read(t)
                n, nd = (
                    snap.agg(
                        F.count(F.lit(1)), F.countDistinct("k")
                    ).collect()[0]
                )
                reads[0] += 1
                if n != 1000 or nd != 1000:
                    anomalies.append((n, nd))
        except Exception as exc:
            errors.append(exc)

    wt = threading.Thread(target=writer)
    rt = threading.Thread(target=reader)
    rt.start()
    wt.start()
    wt.join()
    rt.join()
    assert not errors, errors
    assert reads[0] > 0
    assert not anomalies, f"reader saw inconsistent snapshots: {anomalies}"
    # final state correct too
    got = {r.k: r.v for r in wh.read(t).collect()}
    assert len(got) == 1000


def test_manifest_drop_removes_log(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    wh.overwrite(spark.range(3), "dim.d")
    wh.drop("dim.d")
    assert not wh.table_exists("dim.d")
    assert not wh._manifest_dir("dim.d").exists()


def test_manifest_inherits_cdc_and_bloom(spark, tmp_path):
    """The inherited surfaces work over manifest resolution:
    table_changes diffs two manifest versions, and the persisted
    bloom index (built over live files, refreshed through DML)
    ignores superseded files still on disk."""
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.c"
    wh.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        t,
    )
    wh.upsert_file_pruned(
        spark.createDataFrame([(2, "B2"), (4, "d")], "k long, v string"),
        t,
        keys=["k"],
    )
    ch = {
        (r.k, r._change_type)
        for r in wh.table_changes(t, 0, 1, keys=["k"]).collect()
    }
    assert (4, "insert") in ch
    assert (2, "update_preimage") in ch and (2, "update_postimage") in ch
    assert not any(c == "delete" for _, c in ch)

    wh.build_bloom_index(t, "k")
    wh.upsert_file_pruned(
        spark.createDataFrame([(2, "B3")], "k long, v string"), t, keys=["k"]
    )
    assert [r.v for r in wh.bloom_lookup(t, "k", 2).collect()] == ["B3"]
    # index rows track LIVE manifest files, not the on-disk glob
    live = len(wh._data_files(t))
    on_disk = len(list(wh.path(t).glob("*.parquet")))
    assert on_disk > live
    assert wh.read(wh._bloom_table(t)).count() == live


def test_manifest_vacuum_spares_young_uncommitted_files(spark, tmp_path):
    """A staged-but-uncommitted file (in-flight WAP) is unreferenced
    by every manifest — default-retention vacuum must SPARE it (age
    guard) so the pending commit cannot publish a dangling manifest."""
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "pub.y"
    wh.overwrite(spark.range(4).selectExpr("id"), t)
    staged = wh._stage_in(spark.range(2).selectExpr("id"), t)  # no commit
    wh.vacuum(retain_versions=1)  # default min_age: young files spared
    for n in staged:
        assert (wh.path(t) / n).exists()
    # the pending commit still works
    wh._commit(t, staged, "late_wap")
    assert wh.read(t).count() == 2


def test_manifest_concurrent_staging_dirs_do_not_collide(spark, tmp_path):
    """publish_tables stages BEFORE taking per-table locks; unique
    staging dirs mean a concurrent locked append can never rmtree an
    in-flight stage (code-review r7 finding). Two interleaved stages
    for one table must both survive and commit their own files."""
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.s2"
    a = wh._stage_in(spark.range(3).selectExpr("id"), t)
    b = wh._stage_in(spark.range(5, 9).selectExpr("id"), t)
    assert not (set(a) & set(b))
    for n in a + b:
        assert (wh.path(t) / n).exists()
    wh._commit(t, a, "first")
    assert wh.read(t).count() == 3
    wh._commit(t, b, "second")
    assert wh.read(t).count() == 4


def test_optimistic_concurrency_conflicts(spark, tmp_path):
    """Delta-style OCC on manifest commits: a stale overwrite fails,
    append serializes after intervening appends (live list re-read
    under the lock), and append after an intervening overwrite fails."""
    import pytest

    from lakehouse_poc_spark.sinks.warehouse import ConcurrentWriteError

    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.occ"
    wh.overwrite(spark.range(3).selectExpr("id"), t)
    v0 = wh.current_version(t)

    # writer B advances the table underneath writer A's snapshot
    wh.overwrite(spark.range(10, 13).selectExpr("id"), t)
    with pytest.raises(ConcurrentWriteError, match="stale"):
        wh.overwrite(
            spark.range(20, 23).selectExpr("id"), t, expected_version=v0
        )
    # A re-reads (new snapshot) and retries successfully
    wh.overwrite(
        spark.range(20, 23).selectExpr("id"),
        t,
        expected_version=wh.current_version(t),
    )
    assert sorted(r.id for r in wh.read(t).collect()) == [20, 21, 22]

    # append || append: auto-rebase (the always-compatible cell)
    v = wh.current_version(t)
    wh.append(spark.range(30, 32).selectExpr("id"), t)  # intervening append
    wh.append(spark.range(40, 42).selectExpr("id"), t, expected_version=v)
    assert sorted(r.id for r in wh.read(t).collect()) == [
        20, 21, 22, 30, 31, 40, 41,
    ]

    # append after an intervening OVERWRITE cannot serialize
    v = wh.current_version(t)
    wh.overwrite(spark.range(5).selectExpr("id"), t)
    with pytest.raises(ConcurrentWriteError):
        wh.append(spark.range(50, 52).selectExpr("id"), t, expected_version=v)
    # failed commit left no visible rows
    assert sorted(r.id for r in wh.read(t).collect()) == [0, 1, 2, 3, 4]


def test_shallow_clone_and_timestamp_travel(spark, tmp_path):
    """Zero-copy clone: no data bytes copied (hardlinks), divergence
    is independent, and TIMESTAMP AS OF resolves the version live at
    a given wall clock."""
    import os
    import time as _time

    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    src, dst = "dim.src", "dim.dst"
    wh.overwrite(spark.range(5).selectExpr("id"), src)
    t_v0 = _time.time()
    _time.sleep(0.05)

    wh.clone(src, dst)
    # hardlinked, not copied: same inode
    n0 = wh._live_names(src)[0]
    assert os.stat(wh.path(src) / n0).st_ino == os.stat(
        wh.path(dst) / n0
    ).st_ino
    assert sorted(r.id for r in wh.read(dst).collect()) == [0, 1, 2, 3, 4]

    # divergence: writes to either side never affect the other
    wh.append(spark.range(10, 12).selectExpr("id"), dst)
    wh.overwrite(spark.range(100, 101).selectExpr("id"), src)
    assert sorted(r.id for r in wh.read(dst).collect()) == [0, 1, 2, 3, 4, 10, 11]
    assert [r.id for r in wh.read(src).collect()] == [100]

    # timestamp travel on src: before the overwrite -> v0 contents
    assert sorted(
        r.id for r in wh.read_asof_timestamp(src, t_v0).collect()
    ) == [0, 1, 2, 3, 4]
    with pytest.raises(ValueError, match="no version"):
        wh.read_asof_timestamp(src, 0.0)

    # clone keeps reading the shared bytes even after src vacuums them
    wh.vacuum(retain_versions=1, min_age=0)
    assert sorted(r.id for r in wh.read(dst).collect()) == [0, 1, 2, 3, 4, 10, 11]


# ---------------------------------------------------------------------------
# Vacuum-vs-reader race (VERDICT r7 task 5): the retention floor +
# tombstone-mtime clock make a dangling read provably impossible
# inside the retention window, and a fail-fast (never mid-scan)
# outside it. Contract documented in SCALE.md §6.1.2.


def _backdate(path, age=5000.0):
    import os
    import time

    old = time.time() - age
    os.utime(path, (old, old))


def test_vacuum_floor_protects_reader_of_young_superseded_version(
    spark, tmp_path
):
    """Rapid-fire commits push v0 past any retain count within
    seconds; a reader that resolved v0 moments ago must still scan.
    The floor spares every manifest younger than min_age, so the
    count knob alone can NEVER retire a young version's files."""
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.race"
    wh.overwrite(spark.range(10).selectExpr("id"), t)
    reader = wh.read_version(t, 0)  # resolves v0's file list
    for i in range(3):  # three overwrites: v0 is 3 versions stale
        wh.overwrite(spark.range(20 + i).selectExpr("id"), t)
    wh.vacuum(retain_versions=1)  # default min_age=900: all young
    assert reader.count() == 10  # deferred scan cannot dangle
    assert wh.read_version(t, 0).count() == 10  # still resolvable
    assert wh.read(t).count() == 22


def test_vacuum_outside_window_fails_fast_at_resolve_not_mid_scan(
    spark, tmp_path
):
    """Versions older than the window ARE retired — and a later
    time-travel to them fails at RESOLVE with a clear error (missing
    manifest), never with a dangling file mid-scan."""
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.old"
    wh.overwrite(spark.range(10).selectExpr("id"), t)
    wh.overwrite(spark.range(7).selectExpr("id"), t)
    md = wh._manifest_dir(t)
    _backdate(md / "m000000.json")
    for f in wh.path(t).glob("*.parquet"):
        if f.name not in wh._live_names(t):
            _backdate(f)
    n = wh.vacuum(retain_versions=1)
    assert n > 0
    with pytest.raises(ValueError, match="not found|vacuumed"):
        wh.read_version(t, 0)
    assert wh.read(t).count() == 7  # live table untouched


def test_tombstone_clock_spares_old_file_freshly_dropped(spark, tmp_path):
    """A file created LONG ago but carried live across manifests and
    only just dropped must age from its DROP (Delta's
    deletionTimestamp), not its creation: _commit freshens the mtime
    of files leaving the live set, so a reader that resolved the
    pre-drop version inside the window still scans it."""
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "dim.tomb"
    wh.overwrite(spark.range(10).selectExpr("id"), t)
    live0 = set(wh._live_names(t))
    # simulate age: the v0 files were written 5000s ago
    for n in live0:
        _backdate(wh.path(t) / n)
    _backdate(wh._manifest_dir(t) / "m000000.json")
    reader = wh.read_version(t, 0)
    # the drop commit: all-new files, v0's leave the live set NOW
    wh.overwrite(spark.range(3).selectExpr("id"), t)
    n = wh.vacuum(retain_versions=1)  # m0 old => retired
    assert not (wh._manifest_dir(t) / "m000000.json").exists()
    for name in live0:  # ...but its files aged from the DROP: spared
        assert (wh.path(t) / name).exists(), name
    assert reader.count() == 10  # the in-flight reader completes


def _pdf(spark, rows):
    return spark.createDataFrame(rows, ["id", "y", "ym", "v"])


def test_partitioned_append_records_values_and_prunes(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "fact.pev"
    b1 = _pdf(
        spark,
        [(1, "1995", "1995-01", 10), (2, "1995", "1995-02", 20),
         (3, "1994", "1994-07", 30)],
    )
    wh.append_partitioned(b1, t, spec=["y"])
    assert wh.partition_specs(t) == [["y"]]
    sel, total = wh.prune_plan(t, {"y": ["1995"]})
    assert total == 2 and len(sel) == 1  # one file per year value
    # data columns survive the shadow-partition staging intact
    assert set(wh.read(t).columns) == {"id", "y", "ym", "v"}
    assert wh.read(t).count() == 3


def test_partition_spec_evolution_is_unknown_safe(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "fact.pev2"
    wh.append_partitioned(
        _pdf(spark, [(1, "1995", "1995-01", 10), (2, "1995", "1995-02", 20)]),
        t,
        spec=["y"],
    )
    wh.append_partitioned(
        _pdf(spark, [(3, "1996", "1996-03", 30), (4, "1996", "1996-04", 40)]),
        t,
        spec=["ym"],
    )
    assert sorted(wh.partition_specs(t)) == [["y"], ["ym"]]
    # month filter: prunes the month-spec segment to one file but
    # KEEPS the year-spec files (no ym value recorded → unknown-safe)
    sel, total = wh.prune_plan(t, {"ym": ["1996-03"]})
    assert total == 3 and len(sel) == 2
    got = (
        wh.read_pruned(t, {"ym": ["1996-03"]})
        .filter(F.col("ym") == "1996-03")
        .collect()
    )
    assert [r["id"] for r in got] == [3]
    # filter on the OLD spec column still prunes the old segment
    sel2, _ = wh.prune_plan(t, {"y": ["1995"]})
    assert len(sel2) == 1 + 2  # 1995 file + both unknown-y month files


def test_partition_metadata_survives_restore_clone_and_dml(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "fact.pev3"
    wh.append_partitioned(
        _pdf(spark, [(1, "1995", "1995-01", 10), (2, "1996", "1996-01", 20)]),
        t,
        spec=["y"],
    )
    v0 = wh.version(t)
    # plain append: new file has no values and is never pruned out
    wh.append(_pdf(spark, [(9, "1997", "1997-09", 90)]), t)
    sel, total = wh.prune_plan(t, {"y": ["1995"]})
    assert len(sel) == total - 1  # only the 1996 file pruned
    # restore back to v0 keeps v0's partition entries
    wh.restore(t, v0)
    sel0, total0 = wh.prune_plan(t, {"y": ["1995"]})
    assert total0 == 2 and len(sel0) == 1
    # shallow clone carries the metadata to the new table
    wh.clone(t, "fact.pev3_clone")
    selc, totalc = wh.prune_plan("fact.pev3_clone", {"y": ["1995"]})
    assert totalc == 2 and len(selc) == 1
    # file-pruned DML: untouched files keep their entries (replace
    # writes unknown files; correctness preserved, pruning degrades
    # only on the rewritten slice)
    wh.delete_where_file_pruned(t, F.col("id") == 2)
    sel3, _ = wh.prune_plan(t, {"y": ["1995"]})
    assert any(n in sel3 for n in sel0)  # 1995 file entry survived
    assert wh.read(t).count() == 1


def test_manifest_optimize_commit_based(spark, tmp_path):
    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "fact.opt"
    for i in range(4):  # 4 small appends → ≥4 live files
        wh.append(spark.range(i * 10, i * 10 + 10).selectExpr("id"), t)
    names_before = wh._live_names(t)
    assert len(names_before) >= 4
    reader = wh.read(t)  # resolves the pre-OPTIMIZE manifest
    n_before = wh.compact(t, target_files=1)
    assert n_before == len(names_before)
    assert len(wh._live_names(t)) == 1
    assert wh.read(t).count() == 40
    # nothing unlinked at commit: the in-flight reader still completes
    assert reader.count() == 40
    for n in names_before:
        assert (wh.path(t) / n).exists()


def test_manifest_optimize_conflicts_with_interleaved_append(
    spark, tmp_path, monkeypatch
):
    from lakehouse_poc_spark.sinks.warehouse import (
        ConcurrentWriteError,
        ManifestWarehouse,
    )

    wh = ManifestWarehouse(spark, str(tmp_path / "wh"))
    t = "fact.optc"
    wh.append(spark.range(10).selectExpr("id"), t)
    # interleave: an append lands between OPTIMIZE's read and commit
    orig = ManifestWarehouse._stage_in
    raced = []

    def stage_then_append(self, df, table):
        names = orig(self, df, table)
        if not raced:
            raced.append(True)
            wh2 = ManifestWarehouse(spark, str(tmp_path / "wh"))
            wh2.append(spark.range(100, 105).selectExpr("id"), t)
        return names

    monkeypatch.setattr(ManifestWarehouse, "_stage_in", stage_then_append)
    with pytest.raises(ConcurrentWriteError):
        wh.compact(t, target_files=1)
    # the raced append survives — OPTIMIZE must not clobber it
    assert wh.read(t).count() == 15
