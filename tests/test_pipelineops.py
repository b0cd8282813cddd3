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


def test_t_closeness_matches_pandas(spark):
    import pandas as pd

    from lakehouse_poc_spark import plans

    sf = "/root/testdata/sf0.001"
    out = plans.QUERIES["t_closeness_customers"](spark, sf).toPandas()
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    cust["band"] = (cust["c_acctbal"] / 2500.0).apply(
        lambda x: int(x // 1)
    )
    glob = cust["band"].value_counts()
    n = len(cust)
    for _, row in out.iterrows():
        g = cust[
            (cust["c_nationkey"] == row["c_nationkey"])
            & (cust["c_mktsegment"] == row["c_mktsegment"])
        ]
        ng = len(g)
        gc = g["band"].value_counts()
        tvd = 0.5 * sum(
            abs(gc.get(b, 0) / ng - glob[b] / n) for b in glob.index
        )
        assert row["group_n"] == ng
        assert row["tvd"] == __import__("pytest").approx(tvd, rel=1e-9)
        assert 0.0 <= row["tvd"] <= 1.0


def test_naive_bayes_confusion_complete_and_brute(spark):
    import math
    import re
    from collections import Counter

    import pandas as pd

    from lakehouse_poc_spark import plans

    sf = "/root/testdata/sf0.001"
    out = plans.QUERIES["naive_bayes_lang_docs"](spark, sf).toPandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    held = docs[docs["doc_id"] % 2 == 1]
    assert out["n"].sum() == len(held)
    # brute NB on the same split
    train = docs[docs["doc_id"] % 2 == 0]
    tcnt: Counter = Counter()
    for r in train.itertuples():
        for t in re.split(r"\s+", r.text):
            tcnt[(r.lang, t)] += 1
    ntok = Counter()
    for (lang, _), c in tcnt.items():
        ntok[lang] += c
    vocab = len({t for _, t in tcnt})
    prior = train["lang"].value_counts()
    langs = sorted(ntok)
    pred_counts: Counter = Counter()
    for r in held.itertuples():
        tf = Counter(re.split(r"\s+", r.text))
        best = None
        for lang in langs:
            s = round(math.log(prior[lang] / len(train)) * 1_000_000)
            for t, f in tf.items():
                p = (tcnt.get((lang, t), 0) + 1.0) / (ntok[lang] + vocab)
                s += f * round(math.log(p) * 1_000_000)
            if best is None or s > best[0]:
                best = (s, lang)
        pred_counts[(r.lang, best[1])] += 1
    got = {(r.actual, r.predicted): r.n for r in out.itertuples()}
    assert got == dict(pred_counts)


def test_budget_pack_greedy_prefix(spark):
    import pandas as pd

    from lakehouse_poc_spark import plans

    sf = "/root/testdata/sf0.001"
    out = plans.QUERIES["budget_pack_docs"](spark, sf).toPandas()
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    docs = docs[docs["text"].str.len() > 0].copy()
    docs["n_tok"] = docs["text"].str.split(r"\s+").str.len()
    alpha = docs["text"].str.count(r"[A-Za-z]")
    docs["score"] = alpha / docs["text"].str.len()
    docs = docs.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    budget = int(0.25 * docs["n_tok"].sum() // 1)
    cum = docs["n_tok"].cumsum()
    expected = docs[(cum - docs["n_tok"]) < budget]["doc_id"]
    assert sorted(out["doc_id"]) == sorted(expected)
    # selected docs are exactly a prefix of the quality ordering
    assert set(out["doc_id"]) == set(docs["doc_id"].iloc[: len(out)])


def test_degree_assortativity_matches_numpy(spark):
    import numpy as np
    import pandas as pd
    import pytest

    from lakehouse_poc_spark import plans

    sf = "/root/testdata/sf0.001"
    out = plans.QUERIES["degree_assortativity_coparts"](spark, sf).toPandas()
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    urgent = orders[orders["o_orderpriority"] == "1-URGENT"]["o_orderkey"]
    items = li[li["l_orderkey"].isin(urgent)][
        ["l_orderkey", "l_partkey"]
    ].drop_duplicates()
    m = items.merge(items, on="l_orderkey")
    e = m[m["l_partkey_x"] < m["l_partkey_y"]][
        ["l_partkey_x", "l_partkey_y"]
    ].drop_duplicates()
    deg = pd.concat([e["l_partkey_x"], e["l_partkey_y"]]).value_counts()
    x = np.concatenate(
        [deg[e["l_partkey_x"]].values, deg[e["l_partkey_y"]].values]
    ).astype(float)
    y = np.concatenate(
        [deg[e["l_partkey_y"]].values, deg[e["l_partkey_x"]].values]
    ).astype(float)
    r = np.corrcoef(x, y)[0, 1]
    row = out.iloc[0]
    assert row["m2"] == 2 * len(e)
    assert row["assortativity"] == pytest.approx(r, rel=1e-9)


def test_k_anonymize_ladder_monotone(spark):
    import numpy as np
    import pandas as pd

    from lakehouse_poc_spark import plans

    sf = "/root/testdata/sf0.001"
    out = plans.QUERIES["k_anonymize_ladder_customers"](spark, sf).toPandas()
    assert list(out["level"]) == [0, 1, 2, 3]
    # coarsening can only shrink the group count and (weakly) grow
    # the minimum class size
    assert (np.diff(out["n_groups"]) <= 0).all()
    assert (np.diff(out["min_group"]) >= 0).all()
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    g0 = cust.groupby(
        ["c_nationkey", "c_mktsegment", (cust["c_acctbal"] / 2500.0).apply(lambda x: int(x // 1))]
    ).size()
    assert out.iloc[0]["n_groups"] == len(g0)
    assert out.iloc[0]["min_group"] == g0.min()
    assert out.iloc[0]["groups_under_k5"] == int((g0 < 5).sum())


def test_embedding_covariance_matches_numpy(spark):
    import numpy as np
    import pandas as pd
    import pytest

    from lakehouse_poc_spark import plans

    sf = "/root/testdata/sf0.001"
    out = plans.QUERIES["embedding_covariance_block"](spark, sf).toPandas()
    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy())[:, :16].astype(np.float64)
    ref = np.cov(X, rowvar=False, bias=True)
    assert len(out) == 16 * 17 // 2
    for _, row in out.iterrows():
        # micro-rounding quantizes at 1e-12 per product; tolerance is
        # generous relative to that
        assert row["cov"] == pytest.approx(
            ref[int(row["i"]), int(row["j"])], abs=1e-6, rel=1e-6
        )
    # diagonal is a variance: non-negative
    assert (out[out["i"] == out["j"]]["cov"] >= 0).all()
