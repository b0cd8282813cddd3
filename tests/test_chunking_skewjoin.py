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


def test_skewed_join_three_way_identity_sf01(spark):
    """VERDICT r6 task 8: a deliberately skewed join at sf0.1, run
    three ways — plain sort-merge (AQE skew split OFF: the naive
    shape), AQE skew-handled (split ON, thresholds scaled to fixture
    bytes), and the explicit salted rewrite — must be row-for-row
    identical. Alongside identity, this measures WHY each exists:
    rows-per-reduce-key before salting (the hot key serializes ~90%
    of the fact on one reducer) vs after (spread across n_salts).
    Salting is still needed when AQE is unavailable (foreachBatch
    micro-batches; runtime without AQE) or when a single KEY — not
    partition — is hot enough that splitting shuffle blocks still
    lands one key-group per reducer in a sort-merge aggregate.
    Measured sizes recorded in SCALE.md §6.2."""
    ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet").select(
        "event_id",
        # ~90% of events collapse onto user 0: a hot key a real
        # clickstream would produce (bot/anonymous traffic)
        F.when(F.col("event_id") % 10 < 9, F.lit(0))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "value",
    ).repartition(32)
    # ^ the sf0.1 events fixture is a single parquet file → one map
    # task; AQE splits a skewed reduce partition at MAP-OUTPUT-BLOCK
    # granularity, so a one-mapper shuffle is unsplittable no matter
    # the thresholds. At 100 TB the fact always has thousands of map
    # tasks; the repartition recreates that precondition at test scale.
    dim = (
        spark.range(1501)
        .select(F.col("id").alias("user_id"), (F.col("id") % 7).alias("tier"))
    )

    n_salts = 8
    confs = {
        # force the shuffle join (broadcast would hide the skew story)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # scale skew detection to fixture bytes (defaults are 256 MB)
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    saved["spark.sql.adaptive.skewJoin.enabled"] = spark.conf.get(
        "spark.sql.adaptive.skewJoin.enabled", None
    )
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plain = ev.join(dim, "user_id")
        plain_rows = plain.collect()

        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        aqe = ev.join(dim, "user_id")
        aqe_rows = aqe.collect()
        aqe_plan = aqe._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in aqe_plan, aqe_plan[:1500]

        salted = salted_join(ev, dim, "user_id", "event_id", n_salts=n_salts)
        salted_rows = salted.collect()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    key = lambda r: (r["user_id"], r["event_id"])  # noqa: E731
    assert len(plain_rows) == len(aqe_rows) == len(salted_rows) == 100_000
    assert sorted(map(key, plain_rows)) == sorted(map(key, aqe_rows))
    assert sorted(map(key, plain_rows)) == sorted(map(key, salted_rows))

    # measured spread: rows per shuffle KEY group (what a sort-merge
    # reducer consumes for that key) before vs after salting
    hot_before = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).first()["count"]
    )
    hot_after = (
        ev.withColumn(
            "__salt", F.pmod(F.xxhash64(F.col("event_id")), F.lit(n_salts))
        )
        .groupBy("user_id", "__salt")
        .count()
        .orderBy(F.desc("count"))
        .first()["count"]
    )
    assert hot_before >= 85_000  # the hot key really is ~90% of the fact
    # salting must spread the hot key across reducers: max group ≤ 2/n·hot
    assert hot_after <= hot_before * 2 / n_salts
    print(f"SKEW_MEASURE hot_before={hot_before} hot_after={hot_after}")
