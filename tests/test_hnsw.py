"""HNSW graph-index invariants (operators/hnsw.py — Malkov & Yashunin
2016): deterministic construction, degree caps, level-0 connectivity
(the exhaustive-mode == brute identity rests on it), recall gate vs
the IVF baseline, and run-to-run determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_poc_spark.operators.hnsw import (
    build_shard_graph,
    hnsw_topk,
)

SF = "/root/testdata/sf0.001"


def _toy(n=120, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    return list(range(n)), rng.normal(size=(n, dim))


def test_every_node_in_level0_and_degree_caps():
    ids, vecs = _toy()
    m = 6
    g = build_shard_graph(ids, vecs, m=m, ef_construction=24)
    assert set(g.layers[0]) == set(ids)
    # repair may add one bridge edge past the cap; allow +1 slack
    for layer, adj in enumerate(g.layers):
        cap = (2 * m if layer == 0 else m) + 1
        for n, nbs in adj.items():
            assert len(nbs) <= cap, (layer, n, len(nbs))
    # upper layers are strict subsets
    for layer in range(1, len(g.layers)):
        assert set(g.layers[layer]) <= set(g.layers[0])


def test_level0_connected_after_repair():
    ids, vecs = _toy(n=200)
    g = build_shard_graph(ids, vecs, m=4, ef_construction=8)
    seen = {g.entry}
    stack = [g.entry]
    # entry may sit above level 0; walk level 0 from the min-id node
    start = min(g.layers[0])
    seen, stack = {start}, [start]
    while stack:
        n = stack.pop()
        for nb in g.layers[0].get(n, ()):
            if nb not in seen:
                seen.add(nb)
                stack.append(nb)
    assert seen == set(g.layers[0])


def test_construction_deterministic():
    ids, vecs = _toy()
    g1 = build_shard_graph(ids, vecs, m=8, ef_construction=32)
    g2 = build_shard_graph(ids, vecs, m=8, ef_construction=32)
    assert g1.entry == g2.entry and g1.max_level == g2.max_level
    assert [dict(l) for l in g1.layers] == [dict(l) for l in g2.layers]


@pytest.fixture(scope="module")
def emb(spark):
    from lakehouse_poc_spark.sources.readers import read_parquet_table

    return read_parquet_table(spark, SF, "embeddings")


def test_exhaustive_mode_equals_brute(spark, emb):
    from lakehouse_poc_spark.operators.similarity import brute_force_topk

    queries = emb.filter(F.col("vec_id") < 8)
    brute = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(
            emb, queries, vec_col="embedding", id_col="vec_id",
            query_id_col="vec_id", k=5,
        ).collect()
    }
    hnsw = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in hnsw_topk(
            emb, queries, vec_col="embedding", id_col="vec_id",
            query_id_col="vec_id", k=5, ef_search=None, n_shards=3,
        ).collect()
    }
    assert hnsw == brute


def test_recall_gate_vs_ivf_baseline(spark):
    """VERDICT r7 task 2 acceptance: HNSW recall@5 >= the IVF
    baseline's on the fixture (measured 0.975 vs 0.925 at sf0.001)."""
    from lakehouse_poc_spark import plans

    h = (
        plans.QUERIES["ann_recall_hnsw"](spark, SF)
        .agg(F.avg("recall_at_5"))
        .collect()[0][0]
    )
    i = (
        plans.QUERIES["ann_recall_ivf"](spark, SF)
        .agg(F.avg("recall_at_5"))
        .collect()[0][0]
    )
    assert h >= i, (h, i)


def test_search_deterministic_across_runs(spark, emb):
    queries = emb.filter(F.col("vec_id") < 8)

    def run():
        return sorted(
            map(
                tuple,
                hnsw_topk(
                    emb, queries, vec_col="embedding", id_col="vec_id",
                    query_id_col="vec_id", k=5, ef_search=16, n_shards=4,
                )
                .select("query_id", "rank", "neighbor_id")
                .collect(),
            )
        )

    assert run() == run()


def test_at_rest_matches_in_flight_approximate(spark, emb, tmp_path):
    """The persisted graph must be the SAME graph the in-flight
    operator builds: at realistic ef the at-rest search returns
    identical candidates (construction determinism + faithful
    persist/reload), not merely similar recall."""
    from lakehouse_poc_spark.operators.hnsw import (
        hnsw_build_index,
        hnsw_query_at_rest,
    )
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    hnsw_build_index(emb, wh, "ann.h", "embedding", "vec_id", n_shards=4)
    queries = emb.filter(F.col("vec_id") < 8)
    at_rest = sorted(
        map(
            tuple,
            hnsw_query_at_rest(
                wh, "ann.h", queries, "embedding", "vec_id", "vec_id",
                k=5, ef_search=16,
            ).select("query_id", "rank", "neighbor_id").collect(),
        )
    )
    in_flight = sorted(
        map(
            tuple,
            hnsw_topk(
                emb, queries, vec_col="embedding", id_col="vec_id",
                query_id_col="vec_id", k=5, ef_search=16, n_shards=4,
            ).select("query_id", "rank", "neighbor_id").collect(),
        )
    )
    assert at_rest == in_flight and len(at_rest) == 40
