"""CHANGE DATA FEED materialization (VERDICT r10 task 3): cdc actions
+ _change_data parquet written by DV deletes on CDF-enabled tables,
O(changes) per-commit feed assembly, the snapshot-diff identity on
ranges where both are defined, event-feed semantics where they
differ, and the fallback ladder (overwrite in range, CDF disabled)."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq

from lakehouse_poc_spark.sources.deltalog import (
    DeltaLogWriter,
    _table_changes_cdc,
    table_changes,
    table_changes_snapshot_diff,
)


def _mk(spark, path, n=20):
    w = DeltaLogWriter(spark, path)
    w.create(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(0, n, 2)], "id long, v string"
        ).coalesce(2)
    )
    return w


def _feed(df):
    return sorted(
        (r.id, r.v, r._change_type) for r in df.collect()
    )


def test_dv_delete_materializes_cdc(spark, tmp_path):
    p = tmp_path / "t"
    w = _mk(spark, p)
    w.enable_cdf()
    w.delete_where_dv("id % 4 = 0")
    # _change_data parquet on disk, cdc action in the commit
    assert list((p / "_change_data").glob("cdc-*.parquet"))
    last = sorted((p / "_delta_log").glob("*.json"))[-1]
    cdcs = [
        json.loads(line)["cdc"]
        for line in last.read_text().splitlines()
        if line.startswith('{"cdc"')
    ]
    assert cdcs and all(c["dataChange"] is False for c in cdcs)
    # the feed is served by the per-commit path, not the diff
    fast = _table_changes_cdc(spark, p, 1, None)
    assert fast is not None
    assert _feed(fast) == [
        (i, f"v{i}", "delete") for i in range(0, 20, 4)
    ]


def test_identity_with_snapshot_diff(spark, tmp_path):
    """On a range with no intra-range insert-then-delete, the
    materialized feed and the exceptAll diff are the same multiset —
    the pinned identity the r10 verdict asked for."""
    p = tmp_path / "t"
    w = _mk(spark, p)          # v0: evens 0..18
    w.enable_cdf()             # v1
    w.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(1, 20, 2)], "id long, v string"
        )
    )                          # v2: odds
    w.delete_where_dv("id % 4 = 0")  # v3: deletes pre-range rows only
    fast = _table_changes_cdc(spark, p, 1, None)
    assert fast is not None
    assert _feed(fast) == _feed(table_changes_snapshot_diff(spark, p, 1))
    assert _feed(table_changes(spark, p, 1)) == _feed(fast)


def test_event_feed_beats_snapshot_diff_on_cancelled_rows(spark, tmp_path):
    """A row appended AND deleted inside the range is BOTH events in
    the materialized feed (real Delta CDF semantics); the snapshot
    diff nets it out — the information CDC consumers lose without
    change data."""
    p = tmp_path / "t"
    w = _mk(spark, p)
    w.enable_cdf()
    w.append(spark.createDataFrame([(101, "x")], "id long, v string"))
    w.delete_where_dv("id = 101")
    fast = _table_changes_cdc(spark, p, 1, None)
    assert _feed(fast) == [(101, "x", "delete"), (101, "x", "insert")]
    assert _feed(table_changes_snapshot_diff(spark, p, 1)) == []


def test_fallback_on_overwrite_and_when_cdf_disabled(spark, tmp_path):
    # CDF disabled: table_changes = snapshot diff, no _change_data
    p1 = tmp_path / "plain"
    w1 = _mk(spark, p1)
    w1.delete_where_dv("id = 2")
    assert not (p1 / "_change_data").exists()
    assert _feed(table_changes(spark, p1, 0)) == [(2, "v2", "delete")]
    # CDF enabled but an overwrite (mixed add+remove, no cdc) sits in
    # the range: per-commit assembly refuses, diff answers — and the
    # two entry points agree
    p2 = tmp_path / "ow"
    w2 = _mk(spark, p2)
    w2.enable_cdf()
    w2.overwrite(
        spark.createDataFrame([(7, "seven")], "id long, v string")
    )
    assert _table_changes_cdc(spark, p2, 0, None) is None
    assert _feed(table_changes(spark, p2, 0)) == _feed(
        table_changes_snapshot_diff(spark, p2, 0)
    )


def test_cdf_protocol_surface(spark, tmp_path):
    """enable_cdf on a legacy table raises the writer floor to 4; on
    a table-features (writer 7) table it LISTS changeDataFeed."""
    from lakehouse_poc_spark.sources.deltalog import _replay

    p = tmp_path / "legacy"
    w = _mk(spark, p)
    w.enable_cdf()
    st = _replay(p, None)
    assert st["min_writer"] == 4
    # DV delete later upgrades to 7 and must carry the implied
    # changeDataFeed in writerFeatures (legacy enumeration)
    w.delete_where_dv("id = 2")
    st = _replay(p, None)
    assert st["min_writer"] == 7
    assert "changeDataFeed" in st["writer_features"]
    # features-first table: enable_cdf lists rather than bumps
    p2 = tmp_path / "feat"
    w2 = _mk(spark, p2)
    w2.delete_where_dv("id = 2")  # -> writer 7
    w2.enable_cdf()
    st2 = _replay(p2, None)
    assert "changeDataFeed" in st2["writer_features"]


def test_foreign_cdc_action_conformance(spark, tmp_path):
    """A FOREIGN writer materialized change data: hand-authored cdc
    action + pyarrow-written _change_data parquet (update pre/post
    image types our own writer never emits). Our feed must serve it
    verbatim."""
    p = tmp_path / "f"
    w = _mk(spark, p, n=4)  # v0: ids 0,2
    w.enable_cdf()          # v1
    cdir = p / "_change_data"
    cdir.mkdir()
    pq.write_table(
        pa.table(
            {
                "id": pa.array([2, 2], pa.int64()),
                "v": pa.array(["v2", "V2-new"]),
                "_change_type": pa.array(
                    ["update_preimage", "update_postimage"]
                ),
            }
        ),
        str(cdir / "cdc-foreign.parquet"),
    )
    # the foreign commit: rewrite of the file holding id=2 plus the
    # cdc action describing the row-level update
    data_files = sorted(f.name for f in p.glob("*.parquet"))
    new_file = p / "part-foreign.parquet"
    pq.write_table(
        pa.table(
            {
                "id": pa.array([0, 2], pa.int64()),
                "v": pa.array(["v0", "V2-new"]),
            }
        ),
        str(new_file),
    )
    actions = [
        {"cdc": {
            "path": "_change_data/cdc-foreign.parquet",
            "partitionValues": {},
            "size": (cdir / "cdc-foreign.parquet").stat().st_size,
            "dataChange": False,
        }},
        {"add": {
            "path": "part-foreign.parquet",
            "partitionValues": {},
            "size": new_file.stat().st_size,
            "modificationTime": 1700000000000,
            "dataChange": True,
        }},
    ] + [
        {"remove": {
            "path": f,
            "deletionTimestamp": 1700000000000,
            "dataChange": True,
        }}
        for f in data_files
    ]
    (p / "_delta_log" / f"{2:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )
    got = _feed(table_changes(spark, p, 1))
    # spec rule: the commit HAS cdc actions, so its add/remove are
    # ignored for CDF — only the foreign update pair surfaces
    assert got == [
        (2, "V2-new", "update_postimage"),
        (2, "v2", "update_preimage"),
    ]
