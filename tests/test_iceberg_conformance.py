"""Golden-metadata conformance fixtures for the Iceberg backend
(VERDICT r10 task 1, mirroring test_deltalog_conformance.py's
discipline): no second Iceberg implementation ships in this container
(pyiceberg / iceberg-spark JAR absent — re-probed at round start), so
cross-implementation validation is pinned the other way around: these
tests HAND-AUTHOR table metadata the way a FOREIGN writer would per
the public Iceberg table spec — v1-dialect manifest lists, file: URIs,
extra data_file fields (column_sizes, split_offsets), REVERSED union
branch orders, manifests written by the Apache Avro JAVA library —
and assert our reader plans and reads the spec-prescribed state.
Every shape is legal per the spec but is NOT what our own writer
emits, so passing means the reader implements the spec, not its own
dialect."""

from __future__ import annotations

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lakehouse_poc_spark.sources.avro import write_avro_file
from lakehouse_poc_spark.sources.iceberg_meta import (
    IcebergMetaError,
    live_entries,
    plan_files,
    read_iceberg,
)


def _write_parquet(path, ids, vs):
    path.parent.mkdir(parents=True, exist_ok=True)
    pq.write_table(
        pa.table({"id": pa.array(ids, pa.int64()), "v": pa.array(vs)}),
        str(path),
    )
    return path.stat().st_size


_SCHEMA = {
    "type": "struct",
    "schema-id": 0,
    "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"},
        {"id": 2, "name": "v", "required": False, "type": "string"},
    ],
}


def _metadata(table, snapshots, current, extra=None):
    md = {
        "format-version": 2,
        "table-uuid": "00000000-1111-2222-3333-444444444444",
        "location": f"file://{table}",  # URI form, foreign style
        "last-sequence-number": len(snapshots),
        "last-updated-ms": 1700000000000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [_SCHEMA],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"owner": "someone-else"},
        "current-snapshot-id": current,
        "snapshots": snapshots,
        "snapshot-log": [
            {"timestamp-ms": 1700000000000 + i, "snapshot-id": s["snapshot-id"]}
            for i, s in enumerate(snapshots)
        ],
        # a future-format key our reader must ignore
        "statistics": [],
        "unknown-future-key": {"x": 1},
    }
    if extra:
        md.update(extra)
    d = table / "metadata"
    d.mkdir(parents=True, exist_ok=True)
    (d / "v1.metadata.json").write_text(json.dumps(md))
    (d / "version-hint.text").write_text("1")
    return md


# A FOREIGN manifest-entry schema: v1 dialect (no sequence_number /
# file_sequence_number / content), EXTRA data_file fields our reader
# must skip by name, and the snapshot_id union in the REVERSED
# [long, null] branch order (spec-valid; exercises the r10 avro fix).
_FOREIGN_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["long", "null"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "r2",
                "fields": [
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {
                        "name": "partition",
                        "type": {
                            "type": "record",
                            "name": "r102",
                            "fields": [],
                        },
                    },
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    # v1-only / extra fields, skipped by name
                    {"name": "block_size_in_bytes", "type": "long"},
                    {
                        "name": "column_sizes",
                        "type": [
                            "null",
                            {
                                "type": "array",
                                "logicalType": "map",
                                "items": {
                                    "type": "record",
                                    "name": "k117_v118",
                                    "fields": [
                                        {"name": "key", "type": "int"},
                                        {"name": "value", "type": "long"},
                                    ],
                                },
                            },
                        ],
                    },
                    {
                        "name": "split_offsets",
                        "type": ["null", {"type": "array", "items": "long"}],
                    },
                ],
            },
        },
    ],
}

# v1-dialect manifest list: v1 field NAMES (added_data_files_count),
# no content / sequence-number columns at all.
_FOREIGN_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "added_snapshot_id", "type": ["long", "null"]},
        {"name": "added_data_files_count", "type": ["null", "int"]},
    ],
}


def _foreign_table(tmp_path):
    """Two data files; snapshot S1 adds f1, snapshot S2 adds f2 and
    marks f1 DELETED (a foreign overwrite). All paths are file: URIs
    or table-relative — both legal."""
    table = tmp_path / "ftable"
    sz1 = _write_parquet(table / "data" / "f1.parquet", [1, 2, 3], ["a", "b", "c"])
    sz2 = _write_parquet(table / "data" / "f2.parquet", [10, 20], ["x", "y"])
    mdir = table / "metadata"
    mdir.mkdir(parents=True, exist_ok=True)

    def entry(status, path, size, count):
        return {
            "status": status,
            "snapshot_id": 99,
            "data_file": {
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": count,
                "file_size_in_bytes": size,
                "block_size_in_bytes": 67108864,
                "column_sizes": [{"key": 1, "value": 100}],
                "split_offsets": [4],
            },
        }

    # manifest for S1: f1 added (file: URI path)
    write_avro_file(
        mdir / "m1.avro",
        [entry(1, f"file://{table}/data/f1.parquet", sz1, 3)],
        _FOREIGN_ENTRY_SCHEMA,
    )
    # manifest for S2: f2 added, f1 deleted (relative path dialect)
    write_avro_file(
        mdir / "m2.avro",
        [
            entry(1, "data/f2.parquet", sz2, 2),
            entry(2, f"file://{table}/data/f1.parquet", sz1, 3),
        ],
        _FOREIGN_ENTRY_SCHEMA,
    )

    def mlist(name, manifests):
        write_avro_file(
            mdir / name,
            [
                {
                    "manifest_path": p,
                    "manifest_length": (mdir / p.split("/")[-1]).stat().st_size,
                    "partition_spec_id": 0,
                    "added_snapshot_id": 99,
                    "added_data_files_count": 1,
                }
                for p in manifests
            ],
            _FOREIGN_LIST_SCHEMA,
        )

    mlist("snap-1.avro", [f"file://{mdir}/m1.avro"])
    # S2's foreign overwrite rewrote history into m2 alone
    # (f2 added + f1 deleted)
    mlist("snap-2.avro", ["metadata/m2.avro"])
    snapshots = [
        {
            "snapshot-id": 101,
            "sequence-number": 1,
            "timestamp-ms": 1700000000000,
            "manifest-list": f"file://{mdir}/snap-1.avro",
            "summary": {"operation": "append"},
        },
        {
            "snapshot-id": 102,
            "parent-snapshot-id": 101,
            "sequence-number": 2,
            "timestamp-ms": 1700000000001,
            "manifest-list": "metadata/snap-2.avro",
            "summary": {"operation": "overwrite"},
        },
    ]
    _metadata(table, snapshots, current=102)
    return table


def test_foreign_metadata_reads_current_and_time_travel(spark, tmp_path):
    t = _foreign_table(tmp_path)
    cur = read_iceberg(spark, t)
    assert sorted(r.id for r in cur.collect()) == [10, 20]
    old = read_iceberg(spark, t, snapshot_id=101)
    assert sorted(r.id for r in old.collect()) == [1, 2, 3]


def test_foreign_deleted_status_and_extra_fields_skipped(spark, tmp_path):
    t = _foreign_table(tmp_path)
    live = live_entries(t)
    assert len(live) == 1  # f1's DELETED entry dropped
    df = live[0]["data_file"]
    assert df["record_count"] == 2
    # extra foreign fields visible by name, never positional shift
    assert df["block_size_in_bytes"] == 67108864
    plan = plan_files(t)
    assert plan["scanned_rows"] == 2 and plan["skipped"] == 0


def test_foreign_manifest_without_bounds_never_prunes(spark, tmp_path):
    t = _foreign_table(tmp_path)
    # no lower/upper bounds in the foreign manifest: nothing prunable
    plan = plan_files(t, predicates=[("id", "=", -1)])
    assert plan["skipped"] == 0
    assert read_iceberg(spark, t, predicates=[("id", "=", -1)]).count() == 0


def test_equality_deletes_rejected_position_deletes_served(
    spark, tmp_path
):
    """A FOREIGN writer's POSITION-DELETE file (content=1, the spec's
    v2 row-level deletes) must mask exactly its positions under the
    delete_seq >= data_seq rule; an EQUALITY delete (content=2)
    WITHOUT equality_ids is a loud refusal — never a guess."""
    from lakehouse_poc_spark.sources.iceberg_meta import (
        MANIFEST_ENTRY_SCHEMA,
        MANIFEST_LIST_SCHEMA,
    )

    table = tmp_path / "dtable"
    _write_parquet(table / "data" / "f1.parquet", [1, 2, 3], ["a", "b", "c"])
    # foreign position-delete parquet: masks row positions 0 and 2
    pq.write_table(
        pa.table(
            {
                "file_path": pa.array(
                    ["data/f1.parquet", "data/f1.parquet"], pa.string()
                ),
                "pos": pa.array([0, 2], pa.int64()),
            }
        ),
        str(table / "data" / "del1.parquet"),
    )
    mdir = table / "metadata"
    mdir.mkdir(parents=True, exist_ok=True)

    def _entry(content, path, count, equality_ids=None):
        return {
            "status": 1,
            "snapshot_id": 7,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": content,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": count,
                "file_size_in_bytes": 1,
                "value_counts": None,
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "equality_ids": equality_ids,
            },
        }

    write_avro_file(
        mdir / "m-data.avro",
        [_entry(0, "data/f1.parquet", 3)],
        MANIFEST_ENTRY_SCHEMA,
    )
    write_avro_file(
        mdir / "m-del.avro",
        [_entry(1, "data/del1.parquet", 2)],
        MANIFEST_ENTRY_SCHEMA,
    )

    def _mrow(path, content, seq):
        return {
            "manifest_path": path,
            "manifest_length": 1,
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": 7,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 1,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    write_avro_file(
        mdir / "snap-1.avro",
        [
            _mrow("metadata/m-data.avro", 0, 1),
            _mrow("metadata/m-del.avro", 1, 2),
        ],
        MANIFEST_LIST_SCHEMA,
    )
    _metadata(
        table,
        [
            {
                "snapshot-id": 7,
                "sequence-number": 2,
                "timestamp-ms": 1700000000000,
                "manifest-list": "metadata/snap-1.avro",
                "summary": {"operation": "delete"},
            }
        ],
        current=7,
    )
    got = read_iceberg(spark, table)
    assert [(r.id, r.v) for r in got.collect()] == [(2, "b")]
    # equality delete (content=2) WITHOUT equality_ids: loud refusal
    write_avro_file(
        mdir / "m-eq.avro",
        [_entry(2, "data/del1.parquet", 2)],
        MANIFEST_ENTRY_SCHEMA,
    )
    write_avro_file(
        mdir / "snap-1.avro",
        [
            _mrow("metadata/m-data.avro", 0, 1),
            _mrow("metadata/m-eq.avro", 1, 2),
        ],
        MANIFEST_LIST_SCHEMA,
    )
    with pytest.raises(IcebergMetaError, match="equality-delete"):
        read_iceberg(spark, table)


def test_foreign_equality_delete_served_strictly_greater(spark, tmp_path):
    """A FOREIGN writer's EQUALITY-delete file (content=2 with
    equality_ids, r10): match tuples kill rows null-safely under the
    spec's STRICTLY-GREATER rule — delete at seq 2 masks seq-1 data
    but NOT a seq-2 data file carrying the same key."""
    from lakehouse_poc_spark.sources.iceberg_meta import (
        MANIFEST_ENTRY_SCHEMA,
        MANIFEST_LIST_SCHEMA,
    )

    table = tmp_path / "eqtable"
    _write_parquet(table / "data" / "f1.parquet", [1, 2, 3], ["a", "b", "c"])
    # re-append of key 1 committed AT the delete's sequence number
    _write_parquet(table / "data" / "f2.parquet", [1], ["a2"])
    # foreign equality-delete parquet: matches on column id (field 1)
    pq.write_table(
        pa.table({"id": pa.array([1, 3], pa.int64())}),
        str(table / "data" / "eqdel.parquet"),
    )
    mdir = table / "metadata"
    mdir.mkdir(parents=True, exist_ok=True)

    def _entry(content, path, count, equality_ids=None):
        return {
            "status": 1,
            "snapshot_id": 7,
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": {
                "content": content,
                "file_path": path,
                "file_format": "PARQUET",
                "partition": {},
                "record_count": count,
                "file_size_in_bytes": 1,
                "value_counts": None,
                "null_value_counts": None,
                "lower_bounds": None,
                "upper_bounds": None,
                "equality_ids": equality_ids,
            },
        }

    def _mrow(path, content, seq):
        return {
            "manifest_path": path,
            "manifest_length": 1,
            "partition_spec_id": 0,
            "content": content,
            "sequence_number": seq,
            "min_sequence_number": seq,
            "added_snapshot_id": 7,
            "added_files_count": 1,
            "existing_files_count": 0,
            "deleted_files_count": 0,
            "added_rows_count": 1,
            "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    write_avro_file(
        mdir / "m-data1.avro",
        [_entry(0, "data/f1.parquet", 3)],
        MANIFEST_ENTRY_SCHEMA,
    )
    write_avro_file(
        mdir / "m-data2.avro",
        [_entry(0, "data/f2.parquet", 1)],
        MANIFEST_ENTRY_SCHEMA,
    )
    write_avro_file(
        mdir / "m-eqdel.avro",
        [_entry(2, "data/eqdel.parquet", 2, equality_ids=[1])],
        MANIFEST_ENTRY_SCHEMA,
    )
    write_avro_file(
        mdir / "snap-1.avro",
        [
            _mrow("metadata/m-data1.avro", 0, 1),
            _mrow("metadata/m-data2.avro", 0, 2),
            _mrow("metadata/m-eqdel.avro", 1, 2),
        ],
        MANIFEST_LIST_SCHEMA,
    )
    _metadata(
        table,
        [
            {
                "snapshot-id": 7,
                "sequence-number": 2,
                "timestamp-ms": 1700000000000,
                "manifest-list": "metadata/snap-1.avro",
                "summary": {"operation": "delete"},
            }
        ],
        current=7,
    )
    got = read_iceberg(spark, table)
    # seq-1 rows with id 1 and 3 die; id 2 survives; the seq-2
    # re-append of id 1 survives (strictly-greater, not >=)
    assert sorted((r.id, r.v) for r in got.collect()) == [
        (1, "a2"),
        (2, "b"),
    ]


def test_java_written_manifest_read_and_planned(spark, tmp_path):
    """The Apache Avro JAVA library (on Spark's classpath) writes the
    manifest and manifest-list bytes; our reader must plan them —
    true second-implementation coverage for the metadata codec."""
    jvm = spark._jvm
    table = tmp_path / "jtable"
    sz = _write_parquet(table / "data" / "jf.parquet", [5, 6, 7], ["p", "q", "r"])
    mdir = table / "metadata"
    mdir.mkdir(parents=True, exist_ok=True)

    def java_write(path, schema_dict, json_rows):
        jschema = jvm.org.apache.avro.Schema.Parser().parse(
            json.dumps(schema_dict)
        )
        writer = jvm.org.apache.avro.file.DataFileWriter(
            jvm.org.apache.avro.generic.GenericDatumWriter()
        )
        writer.create(jschema, jvm.java.io.File(str(path)))
        reader = jvm.org.apache.avro.generic.GenericDatumReader(jschema)
        for line in json_rows:
            dec = jvm.org.apache.avro.io.DecoderFactory.get().jsonDecoder(
                jschema, line
            )
            writer.append(reader.read(None, dec))
        writer.close()

    entry = {
        "status": 1,
        "snapshot_id": {"long": 201},
        "data_file": {
            "file_path": "data/jf.parquet",
            "file_format": "PARQUET",
            "partition": {},
            "record_count": 3,
            "file_size_in_bytes": sz,
            "block_size_in_bytes": 1,
            "column_sizes": None,
            "split_offsets": None,
        },
    }
    java_write(mdir / "jm.avro", _FOREIGN_ENTRY_SCHEMA, [json.dumps(entry)])
    mrow = {
        "manifest_path": "metadata/jm.avro",
        "manifest_length": (mdir / "jm.avro").stat().st_size,
        "partition_spec_id": 0,
        "added_snapshot_id": {"long": 201},
        "added_data_files_count": {"int": 1},
    }
    java_write(mdir / "jsnap.avro", _FOREIGN_LIST_SCHEMA, [json.dumps(mrow)])
    _metadata(
        table,
        [
            {
                "snapshot-id": 201,
                "sequence-number": 1,
                "timestamp-ms": 1700000000000,
                "manifest-list": "metadata/jsnap.avro",
                "summary": {"operation": "append"},
            }
        ],
        current=201,
    )
    got = read_iceberg(spark, table)
    assert sorted(r.id for r in got.collect()) == [5, 6, 7]
    assert plan_files(table)["scanned_rows"] == 3


def test_our_manifests_readable_by_java(spark, tmp_path):
    """Direction 2: the Java Avro library opens OUR manifest list and
    manifest files and sees the spec field names/values."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.sources.iceberg_meta import (
        IcebergTable,
        load_metadata,
    )

    p = tmp_path / "ours"
    t = IcebergTable(spark, p)
    t.create(
        spark.range(3).select(
            F.col("id").alias("k"), F.lit("z").alias("s")
        ).coalesce(1)
    )
    md = load_metadata(p)
    mlist_path = p / md["snapshots"][0]["manifest-list"]
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(str(mlist_path)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    rows = []
    while rdr.hasNext():
        rows.append(rdr.next())
    rdr.close()
    assert len(rows) == 1
    mpath = str(rows[0].get("manifest_path"))
    assert int(rows[0].get("added_files_count")) == 1
    rdr2 = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(str(p / mpath)),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    # Iceberg manifest header keys ride the container metadata
    assert rdr2.getMetaString("format-version") == "2"
    assert rdr2.getMetaString("content") == "data"
    entries = []
    while rdr2.hasNext():
        entries.append(rdr2.next())
    rdr2.close()
    assert len(entries) == 1
    assert int(entries[0].get("status")) == 1
    dfv = entries[0].get("data_file")
    assert int(dfv.get("record_count")) == 3
    assert str(dfv.get("file_format")) == "PARQUET"
