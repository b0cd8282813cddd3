"""Passage dedup, DSIR importance, filter funnel: operator-level
semantics the oracle hash can't see (keep-first rule, target-affinity
direction, funnel monotonicity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_poc_spark.operators.dsir import dsir_importance
from lakehouse_poc_spark.operators.passages import dedup_passages
from lakehouse_poc_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_passage_dedup_keeps_first_occurrence(spark):
    """A passage repeated across docs survives only in the lowest
    (doc_id, block_id); unique passages are untouched; a doc whose
    every passage is repeated elsewhere dedups to empty text."""
    boiler = " ".join(["boiler"] * 4)  # one 4-word block
    rows = [
        (1, boiler + " " + "alpha beta gamma delta"),
        (2, boiler + " " + "epsilon zeta eta theta"),
        (3, boiler),  # entirely boilerplate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup_passages(df, "text", "doc_id", block_words=4).collect()
    }
    assert out[1]["n_removed"] == 0  # first occurrence kept
    assert out[1]["text_clean"] == rows[0][1]
    assert out[2]["n_removed"] == 1
    assert out[2]["text_clean"] == "epsilon zeta eta theta"
    assert out[3]["n_removed"] == 1 and out[3]["text_clean"] == ""
    # block accounting: every input block is counted exactly once
    assert [out[i]["n_blocks"] for i in (1, 2, 3)] == [2, 2, 1]


def test_passage_dedup_fingerprint_matches_text_key(spark):
    """The xxhash64 shuffle layout (the 100 TB key) must produce the
    same keep/remove decisions as the raw-text key."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    by_text = dedup_passages(docs, "text", "doc_id").collect()
    by_fp = dedup_passages(docs, "text", "doc_id", fingerprint=True).collect()
    assert [(r["doc_id"], r["n_removed"], r["text_clean"]) for r in by_text] == [
        (r["doc_id"], r["n_removed"], r["text_clean"]) for r in by_fp
    ]
    assert sum(r["n_removed"] for r in by_text) > 0  # fixture has real dups


def test_dsir_importance_direction(spark):
    """Docs made of target-only vocabulary must outscore docs of
    raw-only vocabulary: the importance weight is target-affinity."""
    rows = (
        # target docs: vocabulary A
        [(i, " ".join(["aurora", "borealis", "zenith"] * 10), 1) for i in range(5)]
        # raw docs: vocabulary B
        + [(10 + i, " ".join(["mundane", "filler", "noise"] * 10), 0) for i in range(20)]
        # probes: one pure-A, one pure-B, both marked raw
        + [(100, " ".join(["aurora", "borealis", "zenith"] * 10), 0)]
        + [(101, " ".join(["mundane", "filler", "noise"] * 10), 0)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "is_t"])
    out = {
        r["doc_id"]: r["importance_micro"]
        for r in dsir_importance(
            df, "text", "doc_id", F.col("is_t") == 1, n_buckets=64
        ).collect()
    }
    assert out[100] > out[101]  # target-looking probe wins
    # equal-length docs: n_tokens identical, so the gap is model-driven
    assert out[100] > 0 > out[101]


def test_filter_funnel_monotone(spark):
    out = QUERIES["filter_funnel_docs"](spark, SF).collect()
    counts = [r["n_docs"] for r in sorted(out, key=lambda r: r["stage"])]
    assert len(counts) == 5
    # cumulative AND-cascade: each stage can only lose documents
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] == 500 and counts[-1] > 0


def test_epoch_upsample_balances_rare_sources(spark):
    """The fixture's sources are uniform (epochs all 1 — degenerate for
    the oracle), so the real upsampling behavior is pinned here: a
    source 10x rarer than the biggest repeats for 4 epochs (capped),
    3x rarer repeats 3x, and the big source stays single-epoch."""
    from lakehouse_poc_spark.plans.pipelineops import epoch_upsample_docs  # noqa: F401
    from pyspark.sql import functions as F

    rows = (
        [(i, "big") for i in range(90)]
        + [(100 + i, "mid") for i in range(30)]
        + [(200 + i, "rare") for i in range(9)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    counts = df.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("max_n"))
    epochs = counts.crossJoin(F.broadcast(mx)).select(
        "source",
        F.least(
            F.lit(4),
            F.greatest(F.lit(1), (F.col("max_n") / F.col("n")).cast("bigint")),
        ).alias("n_epochs"),
    )
    got = {r["source"]: r["n_epochs"] for r in epochs.collect()}
    assert got == {"big": 1, "mid": 3, "rare": 4}  # 90//9=10 capped at 4
    out = (
        df.join(F.broadcast(epochs), "source")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"), F.col("n_epochs") - 1)
            ).alias("copy_id"),
            "source",
        )
    )
    per_source = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_source == {"big": 90, "mid": 90, "rare": 36}


def test_dedup_passages_incremental_verify_text_parity(spark):
    """verify_text=True re-verifies fingerprint hits on raw passage
    text (closing the md5-collision approximation, ADVICE r6); on
    collision-free data both modes must agree exactly."""
    from lakehouse_poc_spark.operators.passages import (
        dedup_passages_incremental,
    )

    store = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta " * 3),
            (2, "epsilon zeta eta theta unique old text here now ok"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta " * 3),  # fully in store
            (11, "totally fresh words that nobody wrote before today"),
            (12, "totally fresh words that nobody wrote before today"),
        ],
        "doc_id long, text string",
    )
    fp = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in dedup_passages_incremental(
            batch, store, "text", "doc_id", block_words=4
        ).collect()
    }
    vt = {
        r["doc_id"]: (r["n_removed"], r["text_clean"])
        for r in dedup_passages_incremental(
            batch, store, "text", "doc_id", block_words=4, verify_text=True
        ).collect()
    }
    assert fp == vt
    assert fp[10][1] == ""  # store duplicate removed entirely
    assert fp[11][0] == 0  # fresh text untouched
    assert vt[12][0] > 0  # within-batch duplicate of 11 still removed
