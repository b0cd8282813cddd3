"""Golden-log conformance fixtures (VERDICT r8 task 3): no second
Delta implementation ships in this container (delta-spark / delta-rs /
DuckDB's delta extension all absent — re-probed at round start), so
cross-implementation validation is pinned the other way around: these
tests HAND-AUTHOR commit sequences the way a FOREIGN writer would per
the public delta-io PROTOCOL.md — pyarrow-written data files with
arbitrary names/layouts, URL-encoded paths, commitInfo-less commits,
unknown actions and fields, foreign checkpoints with tombstone rows —
and assert our reader replays them to the spec-prescribed state.
Every shape here is legal per PROTOCOL.md but is NOT what our own
writer emits, so passing means the reader implements the spec, not
just its own writer's dialect."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lakehouse_poc_spark.sources.deltalog import (
    DeltaLogError,
    files_skipped_by_stats,
    read_delta,
)


def _schema_string(fields: list[tuple[str, str]]) -> str:
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {"name": n, "type": t, "nullable": True, "metadata": {}}
                for n, t in fields
            ],
        }
    )


def _write_parquet(path, ids, vs):
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vs)}),
        str(path),
    )


def _commit(table, version, actions):
    d = table / "_delta_log"
    d.mkdir(parents=True, exist_ok=True)
    (d / f"{version:020d}.json").write_text(
        "\n".join(json.dumps(a) for a in actions) + "\n"
    )


_META = {
    "metaData": {
        "id": "11111111-2222-3333-4444-555555555555",
        "format": {"provider": "parquet", "options": {}},
        "schemaString": _schema_string([("id", "long"), ("v", "string")]),
        "partitionColumns": [],
        "configuration": {},
        "createdTime": 1700000000000,
    }
}
_PROTO = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def test_foreign_log_no_commitinfo_unknown_actions_and_fields(
    spark, tmp_path
):
    """A legal commit per PROTOCOL.md that our writer would never
    emit: no commitInfo at all, actions in add-before-metaData order,
    blank lines, an UNKNOWN action type (cdc, protocol v4's change
    files — readers without CDC support must skip it), and unknown
    extra fields on add/remove (forward compatibility: readers must
    ignore fields they don't understand)."""
    t = tmp_path / "t"
    _write_parquet(t / "data-0.parquet", [1, 2], ["a", "b"])
    _write_parquet(t / "data-1.parquet", [3], ["c"])
    d = t / "_delta_log"
    d.mkdir(parents=True)
    (d / f"{0:020d}.json").write_text(
        "\n".join(
            [
                json.dumps(
                    {
                        "add": {
                            "path": "data-0.parquet",
                            "partitionValues": {},
                            "size": 1,
                            "modificationTime": 1,
                            "dataChange": True,
                            "tags": {"foreign": "writer"},  # unknown
                            "baseRowId": 42,  # v7 field: ignored
                        }
                    }
                ),
                "",  # blank line: tolerated
                json.dumps(_PROTO),
                json.dumps(_META),  # metaData AFTER the add
                json.dumps(
                    {"cdc": {"path": "cdc-0.parquet", "size": 9}}
                ),  # unknown action type: skipped
            ]
        )
        + "\n"
    )
    _commit(
        t,
        1,
        [
            {
                "add": {
                    "path": "data-1.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 2,
                    "dataChange": True,
                }
            },
            {
                "remove": {
                    "path": "data-0.parquet",
                    "deletionTimestamp": 3,
                    "dataChange": True,
                    "extendedFileMetadata": True,  # optional field
                    "partitionValues": {},
                    "size": 1,
                }
            },
        ],
    )
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [3]
    assert sorted(r.id for r in read_delta(spark, t, 0).collect()) == [1, 2]


def test_foreign_url_encoded_paths_and_subdirectories(spark, tmp_path):
    """PROTOCOL.md: add.path is URL-encoded (RFC 2396). A foreign
    writer storing ``part 1.parquet`` under ``batch=a b/`` logs
    ``batch%3Da%20b/part%201.parquet`` — the reader must decode at
    file access while keeping add/remove matching on the raw encoded
    string."""
    t = tmp_path / "t"
    _write_parquet(t / "batch=a b" / "part 1.parquet", [1], ["x"])
    _write_parquet(t / "batch=a b" / "part 2.parquet", [2], ["y"])
    enc1 = "batch%3Da%20b/part%201.parquet"
    enc2 = "batch%3Da%20b/part%202.parquet"
    _commit(
        t,
        0,
        [
            _PROTO,
            _META,
            {
                "add": {
                    "path": enc1,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
            {
                "add": {
                    "path": enc2,
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
        ],
    )
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [1, 2]
    # remove matches on the RAW encoded string
    _commit(
        t,
        1,
        [{"remove": {"path": enc1, "deletionTimestamp": 2, "dataChange": True}}],
    )
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [2]


def test_readd_same_path_replaces_and_orphan_remove_tolerated(
    spark, tmp_path
):
    """Spec replay rules: a second add of the SAME path replaces the
    first (e.g. a stats-recomputation commit with dataChange=false) —
    the file is live ONCE; and a remove of a path that was never
    added is a harmless no-op (foreign engines emit these replaying
    partial VACUUM bookkeeping)."""
    t = tmp_path / "t"
    _write_parquet(t / "f.parquet", [7, 8], ["a", "b"])
    _commit(
        t,
        0,
        [
            _PROTO,
            _META,
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
        ],
    )
    _commit(
        t,
        1,
        [
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": False,
                    "stats": json.dumps(
                        {
                            "numRecords": 2,
                            "minValues": {"id": 7},
                            "maxValues": {"id": 8},
                            "nullCount": {"id": 0},
                        }
                    ),
                }
            },
            {
                "remove": {
                    "path": "never-added.parquet",
                    "deletionTimestamp": 2,
                    "dataChange": False,
                }
            },
        ],
    )
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [7, 8]
    # the replacement's stats are the live ones for skipping
    keep, total = files_skipped_by_stats(t, "id", 100, 200)
    assert total == 1 and keep == []
    keep, _ = files_skipped_by_stats(t, "id", 7, 7)
    assert keep == ["f.parquet"]


def test_foreign_partitioned_log_partition_values_authoritative(
    spark, tmp_path
):
    """The spec makes add.partitionValues the ONLY copy of partition
    column values — data files don't contain the columns, and the
    directory layout is a convention, not a contract. The fixture
    puts a file under a MISLEADING dir name (cell=99) whose
    partitionValues say cell=7, plus a NULL partition value (absent
    from the map per spec)."""
    t = tmp_path / "t"
    meta = {
        "metaData": {
            "id": "aaaa",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": _schema_string(
                [("id", "long"), ("v", "string"), ("cell", "integer")]
            ),
            "partitionColumns": ["cell"],
            "configuration": {},
        }
    }
    # data files carry ONLY the non-partition columns
    _write_parquet(t / "cell=99" / "a.parquet", [1], ["x"])
    _write_parquet(t / "flat-b.parquet", [2], ["y"])
    _write_parquet(t / "c.parquet", [3], ["z"])
    _commit(
        t,
        0,
        [
            _PROTO,
            meta,
            {
                "add": {
                    "path": "cell%3D99/a.parquet",
                    "partitionValues": {"cell": "7"},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
            {
                "add": {
                    "path": "flat-b.parquet",
                    "partitionValues": {"cell": "8"},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
            {
                "add": {
                    "path": "c.parquet",
                    "partitionValues": {"cell": None},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
        ],
    )
    rows = {r.id: r.cell for r in read_delta(spark, t).collect()}
    assert rows == {1: 7, 2: 8, 3: None}
    # partition pruning prunes on the LOG values, not the dir names
    pruned = read_delta(spark, t, partition_filters={"cell": ["7"]})
    assert [r.id for r in pruned.collect()] == [1]


def test_foreign_txn_markers_with_optional_fields(spark, tmp_path):
    """txn actions carry an optional lastUpdated field; the ledger
    keeps the HIGHEST version per appId across commits."""
    t = tmp_path / "t"
    _write_parquet(t / "f.parquet", [1], ["a"])
    _commit(
        t,
        0,
        [
            _PROTO,
            _META,
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
            {"txn": {"appId": "appA", "version": 3, "lastUpdated": 123}},
        ],
    )
    _commit(t, 1, [{"txn": {"appId": "appA", "version": 1}}])
    from lakehouse_poc_spark.sources.deltalog import _replay

    assert _replay(t, None)["txns"] == {"appA": 3}


def test_foreign_checkpoint_with_tombstones_and_extra_pointer_fields(
    spark, tmp_path
):
    """A checkpoint written by another engine: includes REMOVE
    tombstone rows (the spec requires checkpoints to retain recent
    tombstones for vacuum), a txn row, and a _last_checkpoint pointer
    with extra fields (parts/sizeInBytes/checksum — all legal).
    After the covered JSON commits are cleaned, the reader must
    reconstruct state from the checkpoint alone."""
    t = tmp_path / "t"
    _write_parquet(t / "live.parquet", [5], ["a"])
    _commit(
        t,
        0,
        [
            _PROTO,
            _META,
            {
                "add": {
                    "path": "gone.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
        ],
    )
    _commit(
        t,
        1,
        [
            {
                "add": {
                    "path": "live.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
            {
                "remove": {
                    "path": "gone.parquet",
                    "deletionTimestamp": 2,
                    "dataChange": True,
                }
            },
        ],
    )
    # hand-build the foreign checkpoint at version 1
    t_protocol = pa.struct(
        [("minReaderVersion", pa.int32()), ("minWriterVersion", pa.int32())]
    )
    t_meta = pa.struct(
        [
            ("id", pa.string()),
            ("format", pa.struct([("provider", pa.string())])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ]
    )
    t_add = pa.struct(
        [
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]
    )
    t_remove = pa.struct(
        [("path", pa.string()), ("deletionTimestamp", pa.int64())]
    )
    t_txn = pa.struct([("appId", pa.string()), ("version", pa.int64())])
    md = json.loads(json.dumps(_META["metaData"]))
    md["format"] = {"provider": "parquet"}
    md["configuration"] = []
    rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": md},
        {
            "add": {
                "path": "live.parquet",
                "partitionValues": [],
                "size": 1,
                "modificationTime": 1,
                "dataChange": True,
                "stats": None,
            }
        },
        {"remove": {"path": "gone.parquet", "deletionTimestamp": 2}},
        {"txn": {"appId": "appB", "version": 9}},
    ]
    cols = ("protocol", "metaData", "add", "remove", "txn")
    types = (t_protocol, t_meta, t_add, t_remove, t_txn)
    table = pa.table(
        {
            c: pa.array([r.get(c) for r in rows], type=ty)
            for c, ty in zip(cols, types)
        }
    )
    d = t / "_delta_log"
    pq.write_table(table, str(d / f"{1:020d}.checkpoint.parquet"))
    (d / "_last_checkpoint").write_text(
        json.dumps(
            {
                "version": 1,
                "size": len(rows),
                "sizeInBytes": 12345,
                "parts": None,
                "checksum": "deadbeef",
            }
        )
    )
    # clean the covered JSON commits: checkpoint is now the only source
    (d / f"{0:020d}.json").unlink()
    (d / f"{1:020d}.json").unlink()
    assert [r.id for r in read_delta(spark, t).collect()] == [5]
    from lakehouse_poc_spark.sources.deltalog import _replay

    st = _replay(t, None)
    assert st["txns"] == {"appB": 9}
    assert st["files"] == ["live.parquet"]  # tombstone row ignored


def test_unsupported_reader_version_fails_fast_supported_reads(
    spark, tmp_path
):
    """Protocol floor: reader-3 tables listing features this reader
    does NOT implement (v2Checkpoint here) must be REFUSED, not
    half-read — and the same table remains readable at pre-upgrade
    versions. (deletionVectors itself IS implemented — see
    test_deltalog_dv.py — so the fixture picks a genuinely
    unsupported feature.)"""
    t = tmp_path / "t"
    _write_parquet(t / "f.parquet", [1], ["a"])
    _commit(
        t,
        0,
        [
            _PROTO,
            _META,
            {
                "add": {
                    "path": "f.parquet",
                    "partitionValues": {},
                    "size": 1,
                    "modificationTime": 1,
                    "dataChange": True,
                }
            },
        ],
    )
    _commit(
        t,
        1,
        [
            {
                "protocol": {
                    "minReaderVersion": 3,
                    "minWriterVersion": 7,
                    "readerFeatures": ["v2Checkpoint"],
                    "writerFeatures": ["v2Checkpoint"],
                }
            }
        ],
    )
    with pytest.raises(DeltaLogError, match="minReaderVersion=3"):
        read_delta(spark, t)
    assert [r.id for r in read_delta(spark, t, 0).collect()] == [1]


def test_foreign_partitioned_add_with_deletion_vector(spark, tmp_path):
    """r10 (VERDICT task 4): a FOREIGN writer composes partitionValues
    and deletionVector on the same add — the spec allows it freely.
    Data files exclude the partition column; the sidecar is recorded
    by RELATIVE path; the reader must mask positions per file AND
    reconstitute the partition literal on the MOR path."""
    from lakehouse_poc_spark.sources.deltalog import _dv_encode

    t = tmp_path / "t"
    t.mkdir()
    _write_parquet(t / "px" / "f1.parquet", [0, 1, 2, 3], ["a", "b", "c", "d"])
    _write_parquet(t / "py" / "f2.parquet", [10, 11], ["x", "y"])
    sidecar = t / "deletionvector_foreign.bin"
    payload = _dv_encode([1, 3])  # b, d masked out of partition 'x'
    sidecar.write_bytes(payload)
    _commit(
        t,
        0,
        [
            {"protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": ["deletionVectors"],
                "writerFeatures": ["deletionVectors"],
            }},
            {"metaData": {
                "id": "pdv-1",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _schema_string(
                    [("id", "long"), ("v", "string"), ("c", "string")]
                ),
                "partitionColumns": ["c"],
                "configuration": {},
            }},
            {"add": {
                "path": "px/f1.parquet",
                "partitionValues": {"c": "x"},
                "size": (t / "px" / "f1.parquet").stat().st_size,
                "modificationTime": 1700000000000,
                "dataChange": True,
                "deletionVector": {
                    "storageType": "p",
                    "pathOrInlineDv": "deletionvector_foreign.bin",
                    "sizeInBytes": len(payload),
                    "cardinality": 2,
                },
            }},
            {"add": {
                "path": "py/f2.parquet",
                "partitionValues": {"c": "y"},
                "size": (t / "py" / "f2.parquet").stat().st_size,
                "modificationTime": 1700000000000,
                "dataChange": True,
            }},
        ],
    )
    got = {(r.id, r.v, r.c) for r in read_delta(spark, t).collect()}
    assert got == {
        (0, "a", "x"),
        (2, "c", "x"),
        (10, "x", "y"),
        (11, "y", "y"),
    }
