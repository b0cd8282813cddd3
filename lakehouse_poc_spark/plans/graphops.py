"""Graph query surface: exact fixed-point PageRank over the event-type
transition graph.

The graph: nodes = event types, edge (u, v, w) = "users produced v
immediately after u, w times" (same sequence extraction as
event_transition_matrix, plans/analytics.py). PageRank over it ranks
event types by steady-state visit probability — the graph-derived
signal a curation pipeline would compute over, e.g., a domain link
graph to weight documents.

Determinism: ranks are fixed-point BIGINTs (operators/graph.py,
scale 1e12); every update is integer multiply / floor-div / exact sum.
The oracle UNROLLS the same ten integer iterations as chained CTEs —
recursive CTEs disallow aggregation in the recursive term, and
unrolling keeps both sides trivially identical.

Scale: see operators/graph.py — edges partitioned once on src and
reused every iteration; per-iteration shuffle is edge-group-sized;
lineage truncated via localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.graph import SCALE, pagerank_int
from ..sources.readers import read_parquet_table
from . import query

_ITERATIONS = 10
_DAMPING_PCT = 85


def _transition_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return seq.groupBy(
        F.col("prev_type").alias("src"), F.col("event_type").alias("dst")
    ).agg(F.count(F.lit(1)).alias("w"))


def _pagerank_oracle() -> str:
    base_expr = f"({(100 - _DAMPING_PCT) * SCALE} // 100)"
    header = f"""
    WITH seq AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    edges AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src),
    e AS (
        SELECT edges.src, edges.dst, edges.w, outw.out_w
        FROM edges JOIN outw USING (src)
    ),
    nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    params AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {base_expr} // CAST(COUNT(*) AS BIGINT) AS base,
               {SCALE} // CAST(COUNT(*) AS BIGINT) AS r_init
        FROM nodes
    ),
    r0 AS (
        SELECT node, (SELECT r_init FROM params) AS rs FROM nodes
    )"""
    iters = []
    for k in range(1, _ITERATIONS + 1):
        iters.append(f""",
    r{k} AS (
        SELECT nd.node,
               p.base + ({_DAMPING_PCT} * COALESCE(c.in_sum, 0)) // 100 AS rs
        FROM nodes nd CROSS JOIN params p
        LEFT JOIN (
            SELECT e.dst AS node, SUM((r.rs * e.w) // e.out_w) AS in_sum
            FROM e JOIN r{k - 1} r ON e.src = r.node
            GROUP BY e.dst
        ) c ON nd.node = c.node
    )""")
    footer = f"""
    SELECT node, CAST(rs AS BIGINT) AS rank_scaled,
           CAST(CAST(rs AS BIGINT) AS DOUBLE) / {float(SCALE)} AS rank
    FROM r{_ITERATIONS}
    ORDER BY node
    """
    return header + "".join(iters) + footer


# ---------------------------------------------------------------------------
@query("pagerank_event_types", oracle=_pagerank_oracle())
def pagerank_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _transition_edges(spark, sf_dir)
    return pagerank_int(
        edges,
        weight="w",
        damping_pct=_DAMPING_PCT,
        iterations=_ITERATIONS,
    ).orderBy("node")


# ---------------------------------------------------------------------------
# Exact triangle count over the co-purchase graph (parts sharing an
# urgent order — the market-basket edge set). Spark runs the
# degree-ordered orientation (operators/graph.py::triangle_count,
# wedge explosion capped at O(√E) out-degree); the oracle counts the
# same triangles with the textbook a<b<c three-way self-join. Both
# count every triangle exactly once, so the single output row must
# hash-match.
@query(
    "triangle_count_coparts",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    nodes AS (
        SELECT u AS node FROM e UNION SELECT v FROM e
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM nodes) AS n_nodes,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT)
            FROM e e1 JOIN e e2 ON e2.u = e1.v
                      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS n_triangles
    """,
)
def triangle_count_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import triangle_count

    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
    return triangle_count(edges)


# ---------------------------------------------------------------------------
# Community detection: deterministic synchronous label propagation on
# the weighted co-purchase graph (parts co-occurring in urgent
# orders). The oracle unrolls the 3 sync rounds as CTE chains with
# the identical (weight DESC, label ASC) argmax — no randomness, no
# convergence loop, hash-equal across engines.
@query(
    "label_propagation_coparts",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    p AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    ),
    e AS (
        SELECT u, v, w FROM p UNION ALL SELECT v AS u, u AS v, w FROM p
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS label FROM e),
    a1 AS (
        SELECT e.u AS node, lb.label, SUM(e.w) AS wt
        FROM e JOIN l0 lb ON lb.node = e.v GROUP BY 1, 2
    ),
    l1 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY wt DESC, label ASC) AS r
            FROM a1
        ) t WHERE r = 1
    ),
    a2 AS (
        SELECT e.u AS node, lb.label, SUM(e.w) AS wt
        FROM e JOIN l1 lb ON lb.node = e.v GROUP BY 1, 2
    ),
    l2 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY wt DESC, label ASC) AS r
            FROM a2
        ) t WHERE r = 1
    ),
    a3 AS (
        SELECT e.u AS node, lb.label, SUM(e.w) AS wt
        FROM e JOIN l2 lb ON lb.node = e.v GROUP BY 1, 2
    ),
    l3 AS (
        SELECT node, label FROM (
            SELECT node, label,
                   row_number() OVER (PARTITION BY node
                                      ORDER BY wt DESC, label ASC) AS r
            FROM a3
        ) t WHERE r = 1
    )
    SELECT node AS partkey, label AS community FROM l3 ORDER BY partkey
    """,
)
def label_propagation_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import label_propagation

    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    return (
        # checkpoint_every=3: a 3-iteration run needs no INTERMEDIATE
        # lineage cut (plan depth 3 is the contract bound itself);
        # each eager checkpoint is a ~2 s materialization job at sf0.1
        label_propagation(edges, iters=3, weight="w", checkpoint_every=3)
        .select(F.col("node").alias("partkey"), "community")
        .orderBy("partkey")
    )


# ---------------------------------------------------------------------------
# Connected components via large-star/small-star contraction (r7):
# the O(log^2 n)-round MapReduce-CC of Kiveris et al. 2014, on the
# urgent-order co-purchase graph. The oracle computes the identical
# min-id components by recursive-CTE reachability closure (finite:
# UNION dedups (node, label) pairs), so the hash pins every node's
# component id. The min-label-propagation twin lives in
# operators/dedup.py::connected_components; star contraction is the
# diameter-independent scale path (see the 120-node-path parity test).
@query(
    "star_components_coparts",
    oracle="""
    WITH RECURSIVE li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS (
        SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e
    ),
    nodes AS (SELECT DISTINCT u AS node FROM sym),
    reach AS (
        SELECT node, node AS lbl FROM nodes
        UNION
        SELECT s.v AS node, reach.lbl
        FROM reach JOIN sym s ON s.u = reach.node
    )
    SELECT node, CAST(MIN(lbl) AS BIGINT) AS component
    FROM reach
    GROUP BY node
    ORDER BY node
    """,
)
def star_components_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components_star

    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(
            orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return connected_components_star(edges).orderBy("node")


# ---------------------------------------------------------------------------
# k-core decomposition (Seidman 1983) on the co-purchase graph: peel
# nodes with fewer than K distinct-neighbor links until the maximal
# subgraph where everyone has degree >= K remains — the standard
# "dense backbone" extractor (spam/bot rings, strongly co-bought
# assortments). K=12 peels a non-trivial shell at every test SF and
# reaches the fixed point within 7 rounds at sf0.1; both engines run
# the identical 10-round bound (rounds past the fixed point are
# no-ops, so early stop and full unroll agree — operators/graph.py::
# k_core docstring). The oracle unrolls the peel as a CTE chain with
# the same full-graph first round.
_KCORE_K = 12
_KCORE_ROUNDS = 10


def _kcore_oracle() -> str:
    rounds = []
    prev = "a1"
    rounds.append(f"""
    a1 AS MATERIALIZED (
        SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym GROUP BY u HAVING COUNT(*) >= {_KCORE_K}
    )""")
    for i in range(2, _KCORE_ROUNDS + 1):
        rounds.append(f"""
    a{i} AS MATERIALIZED (
        SELECT s.u AS node, CAST(COUNT(*) AS BIGINT) AS deg
        FROM sym s
        JOIN {prev} x ON s.u = x.node
        JOIN {prev} y ON s.v = y.node
        GROUP BY s.u HAVING COUNT(*) >= {_KCORE_K}
    )""")
        prev = f"a{i}"
    return f"""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym AS MATERIALIZED (
        SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e
    ),{",".join(rounds)}
    SELECT node, deg FROM {prev} ORDER BY node
    """


@query("kcore_members_coparts", oracle=_kcore_oracle())
def kcore_members_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import k_core

    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(
            orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return k_core(edges, k=_KCORE_K, max_rounds=_KCORE_ROUNDS).orderBy("node")


# ---------------------------------------------------------------------------
# Weighted single-source shortest paths on the co-purchase graph:
# integer edge weight 10//cnt + 1 (rarely co-bought = farther), source
# = part 0, synchronous Bellman-Ford with an 8-round bound (measured
# fixed point: 6 rounds at sf0.1). The oracle unrolls the identical
# relaxation as a MATERIALIZED CTE chain (min over previous-round
# distances union one-hop offers). Integer distances: every min is
# exact on both engines.
_SSSP_SOURCE = 0
_SSSP_ROUNDS = 8


def _sssp_oracle() -> str:
    rounds = []
    prev = "d0"
    for i in range(1, _SSSP_ROUNDS):
        rounds.append(f"""
    d{i} AS MATERIALIZED (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT w.v AS node, p.dist + w.w AS dist
            FROM {prev} p JOIN wsym w ON w.u = p.node
        ) t GROUP BY node
    )""")
        prev = f"d{i}"
    return f"""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    e AS (
        SELECT a.l_partkey AS u, b.l_partkey AS v,
               CAST(10 // COUNT(*) + 1 AS BIGINT) AS w
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
    ),
    wsym AS MATERIALIZED (
        SELECT u, v, w FROM e UNION ALL SELECT v AS u, u AS v, w FROM e
    ),
    d0 AS (SELECT CAST({_SSSP_SOURCE} AS BIGINT) AS node,
                  CAST(0 AS BIGINT) AS dist),{",".join(rounds)}
    SELECT node, dist FROM {prev} ORDER BY node
    """


@query("sssp_coparts", oracle=_sssp_oracle())
def sssp_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import sssp

    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(
            orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(
            (F.floor(F.lit(10) / F.count(F.lit(1))) + 1)
            .cast("bigint")
            .alias("w")
        )
    )
    return sssp(edges, source=_SSSP_SOURCE, max_rounds=_SSSP_ROUNDS).orderBy(
        "node"
    )


# ---------------------------------------------------------------------------
# Degree assortativity (r7; Newman 2002, public): the Pearson
# correlation of endpoint degrees over all edge-END pairs of the
# co-purchase graph (each undirected edge contributes both (du,dv)
# and (dv,du), the standard convention — the symmetrized sums make
# Σx == Σy by construction). Negative r = hubs attach to leaves
# (disassortative), positive = hubs attach to hubs. Everything
# reduces to exact BIGINT sums over the edge relation (degrees are
# integers), then one mirrored double expression — the OLS/ACF
# determinism scheme. Scale: one distinct-edge shuffle, one degree
# agg, two node-keyed joins; sums are map-side combinable.
@query(
    "degree_assortativity_coparts",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    ),
    ends AS (
        SELECT du.d AS x, dv.d AS y
        FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
        UNION ALL
        SELECT dv.d, du.d
        FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m2,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(x * y) AS BIGINT) AS sxy
        FROM ends
    )
    SELECT m2, sx, sxy,
           (CAST(m2 AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           / (CAST(m2 AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS assortativity
    FROM s
    """,
)
def degree_assortativity_coparts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(
            orders.select("o_orderkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    du = deg.withColumnRenamed("node", "u").withColumnRenamed("d", "dx")
    dv = deg.withColumnRenamed("node", "v").withColumnRenamed("d", "dy")
    joined = e.join(du, "u").join(dv, "v")
    ends = joined.select(
        F.col("dx").alias("x"), F.col("dy").alias("y")
    ).unionAll(joined.select(F.col("dy").alias("x"), F.col("dx").alias("y")))
    s = ends.agg(
        F.count(F.lit(1)).cast("bigint").alias("m2"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    )
    m2d = F.col("m2").cast("double")
    sxd = F.col("sx").cast("double")
    return s.select(
        "m2",
        "sx",
        "sxy",
        (
            (m2d * F.col("sxy").cast("double") - sxd * sxd)
            / (m2d * F.col("sxx").cast("double") - sxd * sxd)
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# HITS hubs-and-authorities (r8 — operators/graph.py::hits_int,
# Kleinberg 1999) over the event-type transition graph: authorities =
# types users flow INTO from strong hubs, hubs = types that feed
# strong authorities. Same exact-integer discipline as PageRank
# (HSCALE=1e9 fixed point; integer L1 normalization by
# d = max(total//HSCALE, 1) — divide-by-quotient instead of
# multiply-then-divide keeps every product inside BIGINT). The oracle
# unrolls the identical 8 double-step iterations as CTE chains.
def _hits_oracle() -> str:
    from ..operators.graph import HSCALE

    iters_n = 8
    header = f"""
    WITH seq AS MATERIALIZED (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    edges AS MATERIALIZED (
        SELECT prev_type AS src, event_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    nodes AS MATERIALIZED (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    h0 AS (SELECT node, CAST({HSCALE} AS BIGINT) AS hs FROM nodes)"""
    steps = []
    for k in range(1, iters_n + 1):
        steps.append(f""",
    ar{k} AS MATERIALIZED (
        SELECT e.dst AS node, CAST(SUM(h.hs * e.w) AS BIGINT) AS raw
        FROM edges e JOIN h{k - 1} h ON e.src = h.node GROUP BY e.dst
    ),
    ad{k} AS MATERIALIZED (
        SELECT GREATEST(COALESCE(CAST(SUM(raw) AS BIGINT), 0) // {HSCALE},
                        1) AS d
        FROM ar{k}
    ),
    a{k} AS MATERIALIZED (
        SELECT nd.node,
               COALESCE(ar.raw, 0) // (SELECT d FROM ad{k}) AS as_
        FROM nodes nd LEFT JOIN ar{k} ar ON nd.node = ar.node
    ),
    hr{k} AS MATERIALIZED (
        SELECT e.src AS node, CAST(SUM(a.as_ * e.w) AS BIGINT) AS raw
        FROM edges e JOIN a{k} a ON e.dst = a.node GROUP BY e.src
    ),
    hd{k} AS MATERIALIZED (
        SELECT GREATEST(COALESCE(CAST(SUM(raw) AS BIGINT), 0) // {HSCALE},
                        1) AS d
        FROM hr{k}
    ),
    h{k} AS MATERIALIZED (
        SELECT nd.node,
               COALESCE(hr.raw, 0) // (SELECT d FROM hd{k}) AS hs
        FROM nodes nd LEFT JOIN hr{k} hr ON nd.node = hr.node
    )""")
    footer = f"""
    SELECT n.node,
           CAST(a.as_ AS BIGINT) AS auth_scaled,
           CAST(h.hs AS BIGINT) AS hub_scaled,
           CAST(a.as_ AS DOUBLE) / {float(HSCALE)} AS auth,
           CAST(h.hs AS DOUBLE) / {float(HSCALE)} AS hub
    FROM nodes n
    JOIN a{iters_n} a ON n.node = a.node
    JOIN h{iters_n} h ON n.node = h.node
    ORDER BY n.node
    """
    return header + "".join(steps) + footer


@query("hits_event_types", oracle=_hits_oracle())
def hits_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import hits_int

    edges = _transition_edges(spark, sf_dir)
    return hits_int(edges, weight="w", iterations=8).orderBy("node")


# ---------------------------------------------------------------------------
# Closeness + harmonic centrality (r8) on the directed event-type
# transition graph: all-pairs hop distances by 6 unrolled min-plus
# BFS rounds (the graph is the TYPE domain — bounded — so all-pairs
# is cells², never events²; the only event-scale pass derives the
# edges). closeness = (reached−1)/Σd (NULL for isolated sources),
# harmonic = Σ 1/d with each reciprocal micro-rounded to BIGINT
# before the exact integer sum (order-independent cross-engine).
_CLOSENESS_ROUNDS = 6


def _closeness_oracle() -> str:
    header = """
    WITH seq AS MATERIALIZED (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    edges AS MATERIALIZED (
        SELECT DISTINCT prev_type AS src, event_type AS dst
        FROM seq WHERE prev_type IS NOT NULL
    ),
    nodes AS MATERIALIZED (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    d0 AS MATERIALIZED (
        SELECT node AS s, node AS t, CAST(0 AS BIGINT) AS d FROM nodes
    )"""
    steps = []
    for k in range(1, _CLOSENESS_ROUNDS + 1):
        steps.append(f""",
    d{k} AS MATERIALIZED (
        SELECT s, t, CAST(MIN(d) AS BIGINT) AS d FROM (
            SELECT s, t, d FROM d{k - 1}
            UNION ALL
            SELECT p.s, e.dst AS t, p.d + 1 AS d
            FROM d{k - 1} p JOIN edges e ON p.t = e.src
        ) u GROUP BY s, t
    )""")
    footer = f"""
    SELECT s AS node,
           CAST(COUNT(*) AS BIGINT) AS n_reached,
           CAST(SUM(d) AS BIGINT) AS sum_dist,
           CASE WHEN SUM(d) > 0
                THEN (CAST(COUNT(*) AS DOUBLE) - 1.0)
                     / CAST(SUM(d) AS DOUBLE)
                ELSE NULL END AS closeness,
           CAST(SUM(CASE WHEN d > 0
                         THEN CAST(ROUND(1000000.0 / CAST(d AS DOUBLE))
                                   AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS harmonic_micro
    FROM d{_CLOSENESS_ROUNDS}
    GROUP BY s
    ORDER BY node
    """
    return header + "".join(steps) + footer


@query("closeness_event_types", oracle=_closeness_oracle())
def closeness_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _transition_edges(spark, sf_dir).select("src", "dst").distinct()
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dists = nodes.select(
        F.col("node").alias("s"),
        F.col("node").alias("t"),
        F.lit(0).cast("bigint").alias("d"),
    ).localCheckpoint(eager=True)
    for _ in range(_CLOSENESS_ROUNDS):
        step = (
            dists.join(edges, dists.t == edges.src)
            .select("s", F.col("dst").alias("t"), (F.col("d") + 1).alias("d"))
        )
        dists = (
            dists.unionByName(step)
            .groupBy("s", "t")
            .agg(F.min("d").cast("bigint").alias("d"))
            .localCheckpoint(eager=True)
        )
    edges.unpersist()
    return (
        dists.groupBy(F.col("s").alias("node"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.sum("d").cast("bigint").alias("sum_dist"),
            F.when(
                F.sum("d") > 0,
                (F.count(F.lit(1)).cast("double") - F.lit(1.0))
                / F.sum("d").cast("double"),
            ).alias("closeness"),
            F.sum(
                F.when(
                    F.col("d") > 0,
                    F.round(F.lit(1e6) / F.col("d").cast("double")).cast(
                        "bigint"
                    ),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("harmonic_micro"),
        )
        .orderBy("node")
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient (r8): per-node cohesion of the
# co-purchase graph — c(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), the
# node-level companion to the global triangle count
# (triangle_count_coparts shares the edge fixture). Triangles are
# enumerated ONCE on the u<v<w orientation (two edge-keyed joins —
# the standard enumeration, never adjacency-matrix powers) and each
# triangle credits its three corners; degree is one agg over the
# symmetrized edge list. Top-30 hubs by (degree, node) via
# TakeOrdered. Zero-division is definitional: deg < 2 ⇒ c = 0.
@query(
    "clustering_coefficient_coparts",
    oracle="""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    e AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e e1 JOIN e e2 ON e2.u = e1.v
                  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tri_per_node AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS tri FROM (
            SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri
        ) GROUP BY node
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
            SELECT u AS node, v FROM e
            UNION ALL SELECT v, u FROM e
        ) GROUP BY node
    )
    SELECT CAST(d.node AS BIGINT) AS node, d.deg,
           CAST(COALESCE(t.tri, 0) AS BIGINT) AS triangles,
           CASE WHEN d.deg < 2 THEN 0.0
                ELSE 2.0 * COALESCE(t.tri, 0)
                     / (CAST(d.deg AS DOUBLE) * (d.deg - 1.0))
           END AS coefficient
    FROM deg d LEFT JOIN tri_per_node t ON t.node = d.node
    ORDER BY d.deg DESC, d.node
    LIMIT 30
    """,
)
def clustering_coefficient_coparts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(
            orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .distinct()
        .localCheckpoint(eager=True)  # three self-joins reuse it
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u") == F.col("e1.v"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    tri_per_node = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tri"))
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    )
    return (
        deg.join(tri_per_node, "node", "left")
        .select(
            F.col("node").cast("bigint").alias("node"),
            "deg",
            F.coalesce(F.col("tri"), F.lit(0))
            .cast("bigint")
            .alias("triangles"),
            F.when(F.col("deg") < 2, F.lit(0.0))
            .otherwise(
                F.lit(2.0)
                * F.coalesce(F.col("tri"), F.lit(0))
                / (F.col("deg").cast("double") * (F.col("deg") - F.lit(1.0)))
            )
            .alias("coefficient"),
        )
        .orderBy(F.col("deg").desc(), "node")
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Newman modularity (Newman & Girvan 2004, public) of the BRAND
# partition on the urgent co-purchase graph: does p_brand explain
# the co-purchase structure? Q = Σ_c [e_c/m − (D_c/2m)²], computed
# EXACTLY as the integer numerator Σ_c (4·m·e_c − D_c²) over (4m²)
# — one double division at the very end, so community count never
# introduces an order-dependent double sum. Scale shape: edges are
# the bounded co-purchase relation, brand lookup broadcasts, and
# everything reduces through partial-combined integer aggs.
@query(
    "modularity_by_brand_coparts",
    oracle="""
    WITH items AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    edges AS (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    labeled AS (
        SELECT e.u, e.v, pu.p_brand AS bu, pv.p_brand AS bv
        FROM edges e
        JOIN part pu ON pu.p_partkey = e.u
        JOIN part pv ON pv.p_partkey = e.v
    ),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM labeled),
    intra AS (
        SELECT bu AS brand, CAST(COUNT(*) AS BIGINT) AS e_c
        FROM labeled WHERE bu = bv GROUP BY bu
    ),
    deg AS (
        SELECT brand, CAST(SUM(d) AS BIGINT) AS d_c FROM (
            SELECT bu AS brand, COUNT(*) AS d FROM labeled GROUP BY bu
            UNION ALL
            SELECT bv AS brand, COUNT(*) AS d FROM labeled GROUP BY bv
        ) GROUP BY brand
    ),
    num AS (
        SELECT CAST(SUM(4 * m.m * COALESCE(i.e_c, 0) - d.d_c * d.d_c)
                    AS BIGINT) AS numer
        FROM deg d
        LEFT JOIN intra i ON i.brand = d.brand
        CROSS JOIN m
    )
    SELECT m.m AS n_edges,
           CAST(COUNT(*) AS BIGINT) AS n_communities,
           CAST(n.numer AS DOUBLE)
             / (4.0 * CAST(m.m AS DOUBLE) * CAST(m.m AS DOUBLE))
               AS modularity
    FROM deg, m, num n
    GROUP BY m.m, n.numer
    """,
)
def modularity_by_brand_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    part = read_parquet_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    items = (
        li.join(orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
    )
    pu = part.select(F.col("p_partkey").alias("u"), F.col("p_brand").alias("bu"))
    pv = part.select(F.col("p_partkey").alias("v"), F.col("p_brand").alias("bv"))
    labeled = (
        edges.join(F.broadcast(pu), "u").join(F.broadcast(pv), "v").persist()
    )
    m = labeled.count()
    intra = (
        labeled.filter(F.col("bu") == F.col("bv"))
        .groupBy(F.col("bu").alias("brand"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_c"))
    )
    deg = (
        labeled.select(F.col("bu").alias("brand"))
        .unionByName(labeled.select(F.col("bv").alias("brand")))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d_c"))
    )
    num = (
        deg.join(intra, "brand", "left")
        .select(
            (
                4 * F.lit(m) * F.coalesce(F.col("e_c"), F.lit(0))
                - F.col("d_c") * F.col("d_c")
            ).alias("t"),
        )
        .agg(F.sum("t").cast("bigint").alias("numer"))
    )
    n_comm = deg.agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))
    md = float(m)
    return num.crossJoin(F.broadcast(n_comm)).select(
        F.lit(m).cast("bigint").alias("n_edges"),
        "n_communities",
        (F.col("numer").cast("double") / F.lit(4.0 * md * md)).alias(
            "modularity"
        ),
    )


# ---------------------------------------------------------------------------
# TextRank keyword extraction (Mihalcea & Tarau 2004, public):
# PageRank over the word co-occurrence graph — nodes are content
# tokens (length ≥ 4), undirected edges join ADJACENT tokens within
# a document, weighted by co-occurrence count. Runs the same integer
# fixed-point pagerank_int as pagerank_event_types (bit-identical
# driver/distributed paths), and the oracle replays the identical
# unrolled 10-iteration integer recurrence over the symmetrized edge
# list. Top 20 keywords by rank. Scale shape: one token-adjacency
# groupBy (shuffle ∝ distinct pairs, vocab-domain not corpus-domain),
# then the pagerank loop.
def _textrank_oracle() -> str:
    base_expr = f"({(100 - _DAMPING_PCT) * SCALE} // 100)"
    header = rf"""
    WITH tok AS (
        SELECT t.doc_id, u.i, u.tok
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS w
              FROM documents) t,
             LATERAL (SELECT unnest(w) AS tok,
                             generate_subscripts(w, 1) AS i) u
    ),
    pairs AS (
        SELECT LEAST(a.tok, b.tok) AS u, GREATEST(a.tok, b.tok) AS v,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.i = a.i + 1
        WHERE length(a.tok) >= 4 AND length(b.tok) >= 4 AND a.tok <> b.tok
        GROUP BY 1, 2
    ),
    edges AS (
        SELECT u AS src, v AS dst, w FROM pairs
        UNION ALL
        SELECT v AS src, u AS dst, w FROM pairs
    ),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w
             FROM edges GROUP BY src),
    e AS (
        SELECT edges.src, edges.dst, edges.w, outw.out_w
        FROM edges JOIN outw USING (src)
    ),
    nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    params AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               {base_expr} // CAST(COUNT(*) AS BIGINT) AS base,
               {SCALE} // CAST(COUNT(*) AS BIGINT) AS r_init
        FROM nodes
    ),
    r0 AS (
        SELECT node, (SELECT r_init FROM params) AS rs FROM nodes
    )"""
    iters = []
    for k in range(1, _ITERATIONS + 1):
        iters.append(f""",
    r{k} AS (
        SELECT nd.node,
               p.base + ({_DAMPING_PCT} * COALESCE(c.in_sum, 0)) // 100 AS rs
        FROM nodes nd CROSS JOIN params p
        LEFT JOIN (
            SELECT e.dst AS node, SUM((r.rs * e.w) // e.out_w) AS in_sum
            FROM e JOIN r{k - 1} r ON e.src = r.node
            GROUP BY e.dst
        ) c ON nd.node = c.node
    )""")
    footer = f"""
    SELECT node AS keyword, CAST(rs AS BIGINT) AS rank_scaled,
           CAST(CAST(rs AS BIGINT) AS DOUBLE) / {float(SCALE)} AS rank
    FROM r{_ITERATIONS}
    ORDER BY rank_scaled DESC, keyword
    LIMIT 20
    """
    return header + "".join(iters) + footer


@query("textrank_keywords_docs", oracle=_textrank_oracle())
def textrank_keywords_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), r"\s+")).alias("i", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("i")
    adj = tok.select(
        "doc_id",
        F.col("tok").alias("a"),
        F.lead("tok").over(w).alias("b"),
    ).filter(
        F.col("b").isNotNull()
        & (F.length("a") >= 4)
        & (F.length("b") >= 4)
        & (F.col("a") != F.col("b"))
    )
    pairs = adj.groupBy(
        F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    edges = pairs.select(
        F.col("u").alias("src"), F.col("v").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("v").alias("src"), F.col("u").alias("dst"), "w")
    )
    ranked = pagerank_int(
        edges, weight="w", damping_pct=_DAMPING_PCT, iterations=_ITERATIONS
    )
    return (
        ranked.select(
            F.col("node").alias("keyword"), "rank_scaled", "rank"
        )
        .orderBy(F.desc("rank_scaled"), "keyword")
        .limit(20)
    )


def _ppr_oracle(seed: str = "purchase") -> str:
    """Unrolled personalized-PageRank recurrence — the
    _pagerank_oracle chain with the teleport mass pinned to the seed
    (base and r_init are CASE WHEN node = seed expressions)."""
    base_total = (100 - _DAMPING_PCT) * SCALE // 100
    header = f"""
    WITH seq AS (
        SELECT event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    edges AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(COUNT(*) AS BIGINT) AS w
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM edges GROUP BY src),
    e AS (
        SELECT edges.src, edges.dst, edges.w, outw.out_w
        FROM edges JOIN outw USING (src)
    ),
    nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges
    ),
    r0 AS (
        SELECT node,
               CASE WHEN node = '{seed}' THEN {SCALE} ELSE 0 END AS rs
        FROM nodes
    )"""
    iters = []
    for k in range(1, _ITERATIONS + 1):
        iters.append(f""",
    r{k} AS (
        SELECT nd.node,
               CASE WHEN nd.node = '{seed}' THEN {base_total} ELSE 0 END
                 + ({_DAMPING_PCT} * COALESCE(c.in_sum, 0)) // 100 AS rs
        FROM nodes nd
        LEFT JOIN (
            SELECT e.dst AS node, SUM((r.rs * e.w) // e.out_w) AS in_sum
            FROM e JOIN r{k - 1} r ON e.src = r.node
            GROUP BY e.dst
        ) c ON nd.node = c.node
    )""")
    footer = f"""
    SELECT node, CAST(rs AS BIGINT) AS rank_scaled,
           CAST(CAST(rs AS BIGINT) AS DOUBLE) / {float(SCALE)} AS rank
    FROM r{_ITERATIONS}
    ORDER BY node
    """
    return header + "".join(iters) + footer


# ---------------------------------------------------------------------------
# Personalized PageRank seeded at the 'purchase' node: proximity of
# every event type to purchasing in the user transition graph — the
# "which behaviors funnel into purchases" ranking. Same exact
# fixed-point integer recurrence as pagerank_event_types with the
# teleport vector concentrated on the seed; oracle unrolls the 10
# rounds as a CTE chain.
@query("ppr_purchase_event_types", oracle=_ppr_oracle())
def ppr_purchase_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _transition_edges(spark, sf_dir)
    return pagerank_int(
        edges,
        weight="w",
        damping_pct=_DAMPING_PCT,
        iterations=_ITERATIONS,
        seed="purchase",
    ).orderBy("node")


# ---------------------------------------------------------------------------
# k-truss decomposition (Cohen 2008, public) on the co-purchase
# graph — the EDGE-peeling companion to kcore_members_coparts: keep
# edges with >= K-2 triangles of support within the surviving
# subgraph. K=5 peels ~25% of edges at every test SF and reaches the
# fixed point within 4 rounds (measured at sf0.01/sf0.1); both
# engines run the identical 6-round bound (rounds past the fixed
# point are no-ops — operators/graph.py::k_truss docstring). The
# oracle unrolls the peel as a MATERIALIZED CTE chain, re-deriving
# the symmetrized survivor relation per round.
_KTRUSS_K = 5
_KTRUSS_ROUNDS = 6


def _ktruss_oracle() -> str:
    rounds = []
    prev, prev_sym = "e", "sym0"
    for i in range(1, _KTRUSS_ROUNDS + 1):
        rounds.append(f"""
    t{i} AS MATERIALIZED (
        SELECT c.u, c.v, CAST(COUNT(*) AS BIGINT) AS support
        FROM {prev} c
        JOIN {prev_sym} s1 ON s1.u = c.u
        JOIN {prev_sym} s2 ON s2.u = c.v AND s2.v = s1.v
        GROUP BY c.u, c.v HAVING COUNT(*) >= {_KTRUSS_K - 2}
    )""")
        if i < _KTRUSS_ROUNDS:
            rounds.append(f"""
    sym{i} AS MATERIALIZED (
        SELECT u, v FROM t{i} UNION SELECT v AS u, u AS v FROM t{i}
    )""")
        prev, prev_sym = f"t{i}", f"sym{i}"
    return f"""
    WITH li AS (
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderpriority = '1-URGENT'
    ),
    e AS MATERIALIZED (
        SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    sym0 AS MATERIALIZED (
        SELECT u, v FROM e UNION SELECT v AS u, u AS v FROM e
    ),{",".join(rounds)}
    SELECT u AS src, v AS dst, support
    FROM {prev} ORDER BY src, dst
    """


@query("ktruss_edges_coparts", oracle=_ktruss_oracle())
def ktruss_edges_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import k_truss

    li = read_parquet_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    orders = read_parquet_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    items = (
        li.join(
            orders.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey")
        )
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    return k_truss(
        edges, k=_KTRUSS_K, max_rounds=_KTRUSS_ROUNDS
    ).orderBy("src", "dst")


# ---------------------------------------------------------------------------
# Articulation points of the (symmetrized) event-type transition
# graph — cut-vertex analysis: a type is an articulation point iff
# deleting it increases the number of connected components (the
# single-point-of-failure diagnosis for flow graphs). One candidate
# removal per fixture type (the markov-attribution hardcoded-domain
# contract); components via a hop-bounded min-label closure in a
# recursive CTE (UNION ALL + hops < 5 — Spark's recursive member
# rejects UNION; 5 hops closes any 5-node graph),
# executed IDENTICALLY on both engines (the eccentricity pattern —
# node domain is a handful of types, edges are evidence-sized).
_ARTIC_TYPES = ["click", "error", "purchase", "signup", "view"]


def _artic_sql(sym_view: str | None = None) -> str:
    variants = []
    for x in ["__none__"] + _ARTIC_TYPES:
        suffix = "full" if x == "__none__" else x
        cond = "" if x == "__none__" else f" WHERE u <> '{x}' AND v <> '{x}'"
        variants.append(f"""
    nodes_{suffix} AS (
        SELECT DISTINCT u AS node FROM (SELECT u, v FROM sym{cond})
    ),
    reach_{suffix} AS (
        SELECT node, node AS lbl, 0 AS hops FROM nodes_{suffix}
        UNION ALL
        SELECT s.v AS node, r.lbl, r.hops + 1
        FROM reach_{suffix} r
        JOIN (SELECT u, v FROM sym{cond}) s ON s.u = r.node
        WHERE r.hops < 5
    ),
    comp_{suffix} AS (
        SELECT CAST(COUNT(DISTINCT mn) AS BIGINT) AS n_comp,
               CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM (SELECT node, MIN(lbl) AS mn FROM reach_{suffix}
              GROUP BY node)
    )""")
    rows = " UNION ALL ".join(
        f"""SELECT '{x}' AS node,
               (SELECT n_comp FROM comp_full) AS n_components_full,
               (SELECT n_comp FROM comp_{x}) AS n_components_without,
               (SELECT n_comp FROM comp_{x})
                 > (SELECT n_comp FROM comp_full) AS is_articulation"""
        for x in _ARTIC_TYPES
    )
    # Spark inlines non-recursive CTEs, so the inline seq/edges/sym
    # header re-ran the event-scale lag window inside every one of the
    # six recursive closures; ``sym_view`` lets the Spark side feed a
    # MATERIALIZED (≤ 2·|types|²-row) symmetric edge relation to the
    # identical variant SQL instead (r10 optimization round). The
    # oracle keeps the self-contained inline form — same relation by
    # construction.
    if sym_view is not None:
        header = f"""
    WITH RECURSIVE sym AS (
        SELECT u, v FROM {sym_view}
    ),"""
    else:
        header = """
    WITH RECURSIVE seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    edges AS (
        SELECT DISTINCT prev_type AS src, event_type AS dst
        FROM seq WHERE prev_type IS NOT NULL AND prev_type <> event_type
    ),
    sym AS (
        SELECT src AS u, dst AS v FROM edges
        UNION SELECT dst AS u, src AS v FROM edges
    ),"""
    return f"""{header}{",".join(variants)}
    SELECT * FROM ({rows}) ORDER BY node
    """


@query("articulation_points_event_types", oracle=_artic_sql())
def articulation_points_event_types(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from .eventops import _transition_edges_view

    _transition_edges_view(spark, sf_dir, "artic_edges")
    spark.sql(
        """SELECT src AS u, dst AS v FROM artic_edges
           UNION SELECT dst AS u, src AS v FROM artic_edges"""
    ).localCheckpoint(eager=True).createOrReplaceTempView("artic_sym")
    return spark.sql(_artic_sql(sym_view="artic_sym"))
