"""Chunking (operators/chunking.py) and salted-join (operators/skew.py):
semantic invariants plus the plan shapes that matter at scale —
chunking must be a zero-shuffle map, salted join must equal the
plain join row-for-row."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_poc_spark.operators.chunking import chunk_text_windows
from lakehouse_poc_spark.operators.skew import salted_join
from lakehouse_poc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_chunk_windows_cover_text_exactly(spark):
    rows = [
        (1, "a" * 200),
        (2, "b" * 64),   # exactly one window
        (3, "c" * 65),   # just over → two windows
        (4, "d"),        # shorter than overlap → one window
        (5, ""),         # empty text still yields one (empty) chunk
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_text_windows(df, "text", chunk_chars=64, overlap=16).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in rows:
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        # chunk ids are dense from 0; starts advance by step
        assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
        assert all(c["chunk_start"] == i * 48 for i, c in enumerate(chunks))
        # reassembly: drop each chunk's leading overlap after the first
        rebuilt = chunks[0]["chunk_text"] + "".join(
            c["chunk_text"][16:] for c in chunks[1:]
        )
        assert rebuilt == text
        # last window reaches the end of the text
        last = chunks[-1]
        assert last["chunk_start"] + last["chunk_len"] >= len(text)
    assert len(by_doc[2]) == 1 and len(by_doc[3]) == 2
    assert by_doc[5][0]["chunk_text"] == ""


def test_chunk_windows_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_text_windows(df, "text", chunk_chars=32, overlap=32)


def test_chunking_plan_has_no_exchange(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _formatted(chunk_text_windows(docs, "text"))
    assert "Exchange" not in plan  # pure map: explode + project over the scan


def test_salted_join_equals_plain_join(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    for n_salts in (1, 3, 8):
        salted = salted_join(ev, cust, "user_id", "event_id", n_salts=n_salts)
        plain = ev.join(cust, "user_id")
        assert salted.columns == plain.columns
        assert salted.exceptAll(plain).isEmpty()
        assert plain.exceptAll(salted).isEmpty()


def test_group_split_is_leakage_safe(spark):
    # every source maps to exactly one split, and all three splits occur
    out = QUERIES["group_split_documents"](spark, SF).collect()
    sources = [r["source"] for r in out]
    assert len(sources) == len(set(sources))
    assert {r["split"] for r in out} <= {"train", "val", "test"}
