"""HNSW approximate-nearest-neighbor index (Malkov & Yashunin 2016,
"Efficient and robust approximate nearest neighbor search using
Hierarchical Navigable Small World graphs" — public paper), completing
the at-rest/in-flight ANN family (IVF / IVF-PQ / PQ / SQ8 / LSH in
``operators/similarity.py``) with the industry-default graph index
(VERDICT r7 task 2).

Spark shape — the standard SHARD-AND-MERGE distributed HNSW:

- The corpus is hash-sharded (``id % n_shards``). Each shard builds
  its own layered navigable-small-world graph INDEPENDENTLY inside one
  ``applyInPandas`` task — graph construction is inherently
  sequential-per-graph (every insert greedily navigates the graph
  built so far), so the parallel unit is the shard, not the row.
  Memory bound: one shard's vectors + adjacency must fit a task
  (choose ``n_shards`` ≈ corpus_bytes / executor_task_memory; at
  100 TB that is thousands of shards, each a few GB — exactly how
  FAISS/Vespa/Milvus shard HNSW across nodes).
- A query fans out to every shard (broadcast — the query set is small
  by contract), runs the layered greedy/beam search per shard, and
  each shard emits only its ``ef_search`` candidate ids. The merge is
  a per-query top-k window over ``n_shards × ef_search`` candidate
  rows — independent of corpus size.
- Candidate RE-SCORING happens JVM-side with the same ``cosine``
  expression as ``brute_force_topk``: the Python side only proposes
  candidate ids, so the returned ``cos_sim`` doubles are bit-identical
  to the exact operator's (numpy's SIMD dot would differ in last bits)
  and the per-query ranking is engine-deterministic.

Determinism (what makes the exhaustive mode oracle-checkable):

- Node levels are drawn from the paper's geometric distribution but
  with a HASH of the node id as the uniform variate (no RNG): the
  graph depends only on (ids, vectors, m).
- Inserts happen in ascending id order; all ties (equal distances)
  break toward the smaller id.
- After construction each shard's level-0 graph gets a CONNECTIVITY
  REPAIR pass: bridge edges from each stray component's minimum-id
  node to the shard's minimum-id node. HNSW's neighbor pruning can in
  principle disconnect level 0; the repair guarantees that a beam
  search with ``ef >= shard size`` visits EVERY shard node, so
  ``ef_search=None`` (exhaustive mode) provably equals brute force —
  that identity is the differential-oracle pin for the whole
  build/search machinery (``similarity_topk_hnsw``), while
  ``ann_recall_hnsw`` gates the honest approximate setting.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, dot, norm

__all__ = [
    "build_shard_graph",
    "hnsw_build",
    "hnsw_build_index",
    "hnsw_query_at_rest",
    "hnsw_topk",
]

_LEVEL_CAP = 4


def _node_level(node_id: int, m: int) -> int:
    """Deterministic level: Knuth multiplicative hash of the id as the
    uniform variate u, level = floor(-ln(u) / ln(m)) (the paper's
    mL = 1/ln(m)), capped so a pathological hash can't build a
    skyscraper layer stack."""
    h = (int(node_id) * 2654435761) & 0xFFFFFFFF
    u = (h + 1) / 4294967297.0  # in (0, 1)
    return min(int(-math.log(u) / math.log(m)), _LEVEL_CAP)


def _search_layer(
    qv: np.ndarray,
    entry_points: list[int],
    ef: int,
    adj: dict[int, list[int]],
    vecs: dict[int, np.ndarray],
) -> list[tuple[float, int]]:
    """The paper's SEARCH-LAYER: greedy beam of width ef over one
    layer's adjacency. Distances are cosine distance (1 - cos) on
    L2-normalized vectors; ties break toward the smaller id via the
    (dist, id) heap tuples. Returns the ef closest (dist, id), sorted.
    """
    dist = {e: 1.0 - float(qv @ vecs[e]) for e in entry_points}
    visited = set(entry_points)
    cand = [(dist[e], e) for e in entry_points]
    heapq.heapify(cand)
    res = [(-d, e) for d, e in cand]
    heapq.heapify(res)
    while cand:
        d, c = heapq.heappop(cand)
        if res and d > -res[0][0] and len(res) >= ef:
            break
        for nb in adj.get(c, ()):
            if nb in visited:
                continue
            visited.add(nb)
            dn = 1.0 - float(qv @ vecs[nb])
            if len(res) < ef or dn < -res[0][0]:
                heapq.heappush(cand, (dn, nb))
                heapq.heappush(res, (-dn, nb))
                if len(res) > ef:
                    heapq.heappop(res)
    return sorted((-d, n) for d, n in res)


class _ShardGraph:
    """One shard's layered graph plus its entry point."""

    __slots__ = ("layers", "entry", "max_level", "vecs")

    def __init__(self) -> None:
        self.layers: list[dict[int, list[int]]] = [{}]
        self.entry: int | None = None
        self.max_level = -1
        self.vecs: dict[int, np.ndarray] = {}


def build_shard_graph(
    ids: list[int],
    vectors: np.ndarray,
    m: int = 8,
    ef_construction: int = 32,
) -> _ShardGraph:
    """Build one shard's HNSW graph (pure Python/numpy — runs inside
    an applyInPandas task; unit-testable without Spark). Inserts in
    ascending id order; neighbor selection = the m closest candidates
    (the paper's SELECT-NEIGHBORS-SIMPLE); reverse links pruned to
    m_max (m above level 0, 2m at level 0). Ends with the level-0
    connectivity repair documented in the module docstring."""
    g = _ShardGraph()
    order = np.argsort(np.asarray(ids, dtype=np.int64), kind="stable")
    norms = np.linalg.norm(vectors, axis=1)
    norms[norms == 0.0] = 1.0
    normed = vectors / norms[:, None]
    for row in order:
        nid = int(ids[row])
        qv = normed[row]
        g.vecs[nid] = qv
        lvl = _node_level(nid, m)
        while len(g.layers) <= lvl:
            g.layers.append({})
        if g.entry is None:
            for layer in range(lvl + 1):
                g.layers[layer][nid] = []
            g.entry = nid
            g.max_level = lvl
            continue
        eps = [g.entry]
        for layer in range(g.max_level, lvl, -1):
            eps = [_search_layer(qv, eps, 1, g.layers[layer], g.vecs)[0][1]]
        for layer in range(min(lvl, g.max_level), -1, -1):
            cands = _search_layer(
                qv, eps, ef_construction, g.layers[layer], g.vecs
            )
            sel = [n for _, n in cands[:m]]
            g.layers[layer][nid] = list(sel)
            m_max = 2 * m if layer == 0 else m
            for n in sel:
                lst = g.layers[layer].setdefault(n, [])
                lst.append(nid)
                if len(lst) > m_max:
                    lst.sort(
                        key=lambda x: (1.0 - float(g.vecs[n] @ g.vecs[x]), x)
                    )
                    del lst[m_max:]
            eps = [n for _, n in cands]
        if lvl > g.max_level:
            for layer in range(g.max_level + 1, lvl + 1):
                g.layers[layer].setdefault(nid, [])
            g.entry = nid
            g.max_level = lvl
    # connectivity repair (level 0): union-find over edges, bridge
    # stray components to the min-id node so exhaustive search is
    # provably total over the shard
    parent: dict[int, int] = {n: n for n in g.layers[0]}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for n, nbs in g.layers[0].items():
        for nb in nbs:
            ra, rb = find(n), find(nb)
            if ra != rb:
                parent[ra] = rb
    comps: dict[int, list[int]] = {}
    for n in g.layers[0]:
        comps.setdefault(find(n), []).append(n)
    if len(comps) > 1:
        anchor = min(min(ns) for ns in comps.values())
        for ns in comps.values():
            lead = min(ns)
            if lead != anchor:
                g.layers[0][anchor].append(lead)
                g.layers[0][lead].append(anchor)
    return g


def _graph_search(
    g: _ShardGraph, qv: np.ndarray, ef: int
) -> list[tuple[float, int]]:
    """Layered descent (greedy ef=1 above level 0, beam ef at level 0)."""
    if g.entry is None:
        return []
    nq = float(np.linalg.norm(qv))
    qn = qv / nq if nq else qv
    eps = [g.entry]
    for layer in range(g.max_level, 0, -1):
        eps = [_search_layer(qn, eps, 1, g.layers[layer], g.vecs)[0][1]]
    return _search_layer(qn, eps, ef, g.layers[0], g.vecs)


def hnsw_build(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = 8,
    ef_construction: int = 32,
    n_shards: int = 4,
) -> DataFrame:
    """Materialize the sharded HNSW adjacency as a DataFrame
    (shard, level, src, dst) — the at-rest form (persist it partitioned
    by shard to make the index durable; a query then reads only the
    graph+vector partitions, exactly like ``ivf_query_at_rest``)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].tolist()
        vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
        g = build_shard_graph(ids, vecs, m=m, ef_construction=ef_construction)
        shard = int(pdf["shard"].iloc[0])
        rows = [
            (shard, layer, src, dst)
            for layer, adj in enumerate(g.layers)
            for src, nbs in adj.items()
            for dst in nbs
        ]
        return pd.DataFrame(
            rows, columns=["shard", "level", "src", "dst"]
        ).astype({"shard": "int32", "level": "int32", "src": "int64", "dst": "int64"})

    prepared = corpus.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards)).cast("int").alias("shard"),
    )
    return prepared.groupBy("shard").applyInPandas(
        build, "shard int, level int, src long, dst long"
    )


def hnsw_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int,
    m: int = 8,
    ef_construction: int = 32,
    ef_search: int | None = 16,
    n_shards: int = 4,
) -> DataFrame:
    """Sharded HNSW top-k: (query_id, neighbor_id, cos_sim, rank).

    ``ef_search=None`` = exhaustive mode: the level-0 beam widens to
    the shard size, so (with the connectivity repair) every shard node
    is visited and the result equals ``brute_force_topk`` exactly —
    the oracle-checkable identity pinning the machinery. A realistic
    ``ef_search`` emits only that many candidates per shard; the
    global merge cost is n_shards × ef_search rows per query.

    The query set is collected to the driver (bounded by contract —
    same discipline as ``ivf_query_at_rest``'s probed-cell list) and
    shipped in the task closure; candidate scoring and ranking run
    JVM-side with ``brute_force_topk``'s exact cosine expression."""
    qrows = (
        queries.select(
            F.col(query_id_col).cast("long").alias("qid"),
            F.col(vec_col).alias("qv"),
        )
        .orderBy("qid")
        .collect()
    )
    qlist = [(int(r["qid"]), np.array(r["qv"], dtype=np.float64)) for r in qrows]

    def search(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["__id"].tolist()
        vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
        g = build_shard_graph(ids, vecs, m=m, ef_construction=ef_construction)
        ef = len(ids) if ef_search is None else ef_search
        out_q: list[int] = []
        out_n: list[int] = []
        for qid, qv in qlist:
            for _, nid in _graph_search(g, qv, ef):
                out_q.append(qid)
                out_n.append(nid)
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n}).astype(
            {"query_id": "int64", "neighbor_id": "int64"}
        )

    prepared = corpus.select(
        F.col(id_col).cast("long").alias("__id"),
        F.col(vec_col).alias("__vec"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards)).cast("int").alias("shard"),
    )
    cand = prepared.groupBy("shard").applyInPandas(
        search, "query_id long, neighbor_id long"
    )
    nbrs = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).alias("__nv"),
    )
    qdf = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        cand.join(nbrs.withColumn("__nn", norm(F.col("__nv"))), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("__qv"), F.col("__nv")) / (F.col("__qn") * F.col("__nn"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def hnsw_build_index(
    corpus: DataFrame,
    wh,
    table: str,
    vec_col: str,
    id_col: str,
    m: int = 8,
    ef_construction: int = 32,
    n_shards: int = 4,
) -> None:
    """Materialize the sharded HNSW index AT REST (the ivf_build_index
    twin): vectors land in ``table`` partitioned by shard, the layered
    adjacency in ``{table}_graph`` partitioned by shard. Build cost is
    paid once; a query then reads only shard-aligned partitions of
    both tables and never re-runs construction. At 100 TB each shard's
    build is one task over its partition (memory-bounded by shard
    sizing) and the index is storage, not session state — exactly how
    FAISS-on-object-store deployments persist HNSW shards."""
    prepared = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )
    wh.overwrite(prepared, table, partition_by=["shard"])
    adj = hnsw_build(
        corpus, vec_col=vec_col, id_col=id_col, m=m,
        ef_construction=ef_construction, n_shards=n_shards,
    )
    wh.overwrite(adj, f"{table}_graph", partition_by=["shard"])


def hnsw_query_at_rest(
    wh,
    table: str,
    queries: DataFrame,
    vec_col: str,
    id_col: str,
    query_id_col: str,
    k: int,
    ef_search: int | None = 16,
) -> DataFrame:
    """Query the at-rest HNSW index: COGROUP the persisted vectors and
    adjacency by shard (both tables are shard-partitioned, so the
    grouping reads aligned partitions), run the layered search per
    shard against the PERSISTED graph — construction never re-runs —
    and merge per-shard candidates with the exact JVM cosine ranking
    (same contract as ``hnsw_topk``; ``ef_search=None`` = exhaustive
    mode == brute force)."""
    qrows = (
        queries.select(
            F.col(query_id_col).cast("long").alias("qid"),
            F.col(vec_col).alias("qv"),
        )
        .orderBy("qid")
        .collect()
    )
    qlist = [(int(r["qid"]), np.array(r["qv"], dtype=np.float64)) for r in qrows]

    vecs_df = wh.read(table)
    adj_df = wh.read(f"{table}_graph")

    def search(key, vec_pdf: pd.DataFrame, adj_pdf: pd.DataFrame) -> pd.DataFrame:
        g = _ShardGraph()
        ids = vec_pdf["vec_id"].tolist()
        mat = np.array(vec_pdf["vec"].tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0.0] = 1.0
        mat = mat / norms[:, None]
        g.vecs = {int(i): mat[r] for r, i in enumerate(ids)}
        max_level = int(adj_pdf["level"].max()) if len(adj_pdf) else 0
        g.layers = [{} for _ in range(max_level + 1)]
        for lvl, src_, dst_ in zip(
            adj_pdf["level"], adj_pdf["src"], adj_pdf["dst"]
        ):
            g.layers[int(lvl)].setdefault(int(src_), []).append(int(dst_))
        # nodes with no out-edges at a level still live there
        for lvl in range(max_level + 1):
            for n in (set(adj_pdf[adj_pdf["level"] >= lvl]["src"])
                      | set(adj_pdf[adj_pdf["level"] >= lvl]["dst"])):
                g.layers[lvl].setdefault(int(n), [])
        for n in g.vecs:
            g.layers[0].setdefault(n, [])
        g.max_level = max_level
        top = g.layers[max_level]
        g.entry = min(top) if top else (min(g.vecs) if g.vecs else None)
        ef = len(ids) if ef_search is None else ef_search
        out_q: list[int] = []
        out_n: list[int] = []
        for qid, qv in qlist:
            for _, nid in _graph_search(g, qv, ef):
                out_q.append(qid)
                out_n.append(nid)
        return pd.DataFrame({"query_id": out_q, "neighbor_id": out_n}).astype(
            {"query_id": "int64", "neighbor_id": "int64"}
        )

    cand = (
        vecs_df.groupBy("shard")
        .cogroup(adj_df.groupBy("shard"))
        .applyInPandas(search, "query_id long, neighbor_id long")
    )
    nbrs = vecs_df.select(
        F.col("vec_id").alias("neighbor_id"), F.col("vec").alias("__nv")
    )
    qdf = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        cand.join(nbrs.withColumn("__nn", norm(F.col("__nv"))), "neighbor_id")
        .join(F.broadcast(qdf), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("__qv"), F.col("__nv")) / (F.col("__qn") * F.col("__nn"))).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
