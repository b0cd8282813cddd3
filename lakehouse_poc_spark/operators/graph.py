"""Iterative graph operators over edge DataFrames: integer-scaled
PageRank and BFS hop counts.

The reference has no graph surface; these are the declared extension
ops a training-data pipeline needs for link-graph-derived quality
signals (domain authority → document weighting) and for reachability
audits over lineage/transition graphs.

Determinism: PageRank is usually float-iterative — sums of doubles in
engine-dependent order, impossible to hash-compare exactly. Here ranks
are fixed-point BIGINTs (scale 1e12) and every update is integer
multiply / floor-divide / integer sum, so ten iterations produce
bit-identical results on any engine — the SQL oracle unrolls the same
ten exact integer steps.

Scale shape (billion-edge graph, 1000 executors):
- edges are hash-partitioned on src ONCE and the partitioning is
  reused across iterations (each step joins ranks—partitioned the same
  way—to edges: co-partitioned, no edge re-shuffle);
- per-iteration shuffle carries one (node, contribution) row per edge
  group — map-side combined;
- lineage is truncated with localCheckpoint every few iterations so
  the plan doesn't grow unboundedly (the classic iterative-Spark
  failure mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12 fixed-point


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping_pct: int = 85,
    iterations: int = 10,
    checkpoint_every: int = 4,
    driver_threshold: int = 50_000,
    seed=None,
) -> DataFrame:
    """Weighted PageRank with exact fixed-point arithmetic.

    rank'(v) = (100-d)%·SCALE/N  +  d%·Σ_{u→v} rank(u)·w(u,v) ÷ W(u)

    With ``seed`` set this becomes personalized PageRank (Page et al.
    1999 §6; Jeh & Widom 2003): ALL teleport mass lands on the seed
    node — base(v) = (100-d)%·SCALE for v == seed, else 0 — and the
    walk starts there (r_init = SCALE at the seed, 0 elsewhere), so
    ranks measure proximity to the seed instead of global centrality.
    Same exact integer recurrence, bit-identical on both paths.

    (all ·/÷ integer; Σ exact BIGINT). Dangling mass is dropped (the
    standard simplification; documents the leak rather than hiding it).
    Returns (node, rank_scaled BIGINT, rank DOUBLE).

    Below ``driver_threshold`` edges the iteration runs on the driver
    (the recurrence is pure integer arithmetic, so the result is
    BIT-IDENTICAL to the distributed loop — Python ``//`` and Spark
    ``div`` agree on non-negative ints): transition/metadata graphs
    with a handful of nodes shouldn't pay 10 rounds of job scheduling.
    Billion-edge graphs take the distributed loop unchanged;
    ``driver_threshold=0`` forces it.
    """
    w_col = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w")
    )
    # Pre-aggregate parallel edges, pre-compute out-weights, and pin the
    # partitioning on src so every iteration's join is co-partitioned.
    e = e.groupBy("src", "dst").agg(F.sum("w").alias("w")).repartition("src")
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    e = e.join(out_w, "src").persist()

    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # one small action; also materializes caches
    if n_nodes == 0:
        raise ValueError("pagerank_int: empty edge set (no nodes)")
    base_total = (100 - damping_pct) * SCALE // 100
    base = base_total // n_nodes

    n_edges = e.count()  # cached; metadata-sized action
    if n_edges <= driver_threshold:
        erows = [(r["src"], r["dst"], r["w"], r["out_w"]) for r in e.collect()]
        vlist = [r["node"] for r in nodes.collect()]
        e.unpersist()
        nodes.unpersist()
        if seed is not None and seed not in vlist:
            raise ValueError(f"pagerank_int: seed {seed!r} not in graph")
        if seed is None:
            rank = {v: SCALE // n_nodes for v in vlist}
            base_of = dict.fromkeys(vlist, base)
        else:
            rank = {v: SCALE if v == seed else 0 for v in vlist}
            base_of = {v: base_total if v == seed else 0 for v in vlist}
        for _ in range(iterations):
            in_sum = dict.fromkeys(vlist, 0)
            for s, d, w, ow in erows:
                in_sum[d] += rank[s] * w // ow
            rank = {
                v: base_of[v] + damping_pct * in_sum[v] // 100 for v in vlist
            }
        node_t = edges.schema[src].dataType
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        out_schema = StructType(
            [
                StructField("node", node_t),
                StructField("rank_scaled", LongType()),
                StructField("rank", DoubleType()),
            ]
        )
        return edges.sparkSession.createDataFrame(
            [(v, rank[v], rank[v] / SCALE) for v in vlist], out_schema
        )

    if seed is None:
        ranks = nodes.withColumn("rank_scaled", F.lit(SCALE // n_nodes))
        base_col = F.lit(base)
    else:
        if nodes.filter(F.col("node") == seed).count() == 0:
            raise ValueError(f"pagerank_int: seed {seed!r} not in graph")
        ranks = nodes.withColumn(
            "rank_scaled",
            F.when(F.col("node") == seed, F.lit(SCALE)).otherwise(F.lit(0)),
        )
        base_col = F.when(
            F.col("node") == seed, F.lit(base_total)
        ).otherwise(F.lit(0))
    for it in range(iterations):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                # integer contribution: rank·w ÷ out_w (floor). rank ≤
                # SCALE and w ≤ out_w keep the product well inside
                # BIGINT range for damping_pct < 100.
                F.expr("rank_scaled * w div out_w").alias("contrib"),
            )
            .groupBy("node")
            .agg(F.sum("contrib").alias("in_sum"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    base_col
                    + F.expr(
                        f"{damping_pct} * coalesce(in_sum, 0) div 100"
                    )
                ).alias("rank_scaled"),
            )
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            # lazy: no mid-loop job — the RDD boundary still bounds
            # plan depth, and the final action materializes the chain
            # (r10 optimization round: each eager cadence checkpoint
            # was a full extra job)
            ranks = ranks.localCheckpoint(eager=False)

    out = ranks.select(
        "node",
        "rank_scaled",
        (F.col("rank_scaled").cast("double") / F.lit(float(SCALE))).alias("rank"),
    )
    return out


HSCALE = 1_000_000_000  # 1e9 fixed-point for HITS (headroom: raw
# sums stay ≤ ~2·HSCALE·Σw, well inside BIGINT for billion-weight
# graphs; PageRank's 1e12 would overflow the normalization products)


def hits_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    iterations: int = 8,
    checkpoint_every: int = 2,
    driver_threshold: int = 50_000,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, public paper) with
    exact fixed-point integer arithmetic — the link-analysis twin of
    ``pagerank_int``. Per iteration:

        a_raw(v) = Σ_{u→v} h(u)·w(u,v);   a(v) = a_raw(v) // d_a
        h_raw(u) = Σ_{u→v} a(v)·w(u,v);   h(u) = h_raw(u) // d_h

    where d = max(Σ raw // HSCALE, 1) — an integer L1 normalization
    (divide-by-(total/HSCALE) instead of multiply-then-divide, so no
    product ever exceeds BIGINT range and both engines floor the SAME
    division). All updates are integer multiply / floor-div / exact
    BIGINT sums, so ``iterations`` rounds are bit-identical on any
    engine; the SQL oracle unrolls the same steps.

    Returns (node, auth_scaled BIGINT, hub_scaled BIGINT,
    auth DOUBLE, hub DOUBLE); scores sum to ≈ HSCALE each.

    Scale shape: TWO persisted copies of the (pre-aggregated) edge
    list, partitioned by src and by dst — the a-step joins hubs on
    src and aggregates by dst, the h-step joins authorities on dst
    and aggregates by src, so each step's join is co-partitioned
    against its copy and only the aggregation output shuffles. The
    per-step scalar total rides a broadcast crossJoin (no action);
    lineage is truncated every ``checkpoint_every`` rounds. Below
    ``driver_threshold`` edges the recurrence runs on the driver —
    bit-identical (Python ``//`` == Spark ``div`` on non-negatives),
    and a metadata-sized transition graph shouldn't pay 16 rounds of
    job scheduling."""
    w_col = F.col(weight).cast("bigint") if weight else F.lit(1).cast("bigint")
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), w_col.alias("w")
    )
    e = e.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    e_src = e.repartition("src").persist()
    n_edges = e_src.count()
    if n_edges == 0:
        raise ValueError("hits_int: empty edge set (no nodes)")

    if n_edges <= driver_threshold:
        erows = [(r["src"], r["dst"], r["w"]) for r in e_src.collect()]
        vlist = [r["node"] for r in nodes.collect()]
        e_src.unpersist()
        hub = dict.fromkeys(vlist, HSCALE)
        auth = dict.fromkeys(vlist, 0)
        for _ in range(iterations):
            a_raw = dict.fromkeys(vlist, 0)
            for s, d, w in erows:
                a_raw[d] += hub[s] * w
            da = max(sum(a_raw.values()) // HSCALE, 1)
            auth = {v: a_raw[v] // da for v in vlist}
            h_raw = dict.fromkeys(vlist, 0)
            for s, d, w in erows:
                h_raw[s] += auth[d] * w
            dh = max(sum(h_raw.values()) // HSCALE, 1)
            hub = {v: h_raw[v] // dh for v in vlist}
        node_t = edges.schema[src].dataType
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        out_schema = StructType(
            [
                StructField("node", node_t),
                StructField("auth_scaled", LongType()),
                StructField("hub_scaled", LongType()),
                StructField("auth", DoubleType()),
                StructField("hub", DoubleType()),
            ]
        )
        return edges.sparkSession.createDataFrame(
            [
                (v, auth[v], hub[v], auth[v] / HSCALE, hub[v] / HSCALE)
                for v in vlist
            ],
            out_schema,
        )

    e_dst = e.repartition("dst").persist()
    nodes = nodes.persist()
    nodes.count()
    try:
        hubs = nodes.withColumn("hs", F.lit(HSCALE).cast("bigint"))
        auths = None
        for it in range(iterations):
            a_raw = (
                e_src.join(hubs.withColumnRenamed("node", "src"), "src")
                .select(F.col("dst").alias("node"), (F.col("hs") * F.col("w")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("raw"))
            )
            da = a_raw.agg(
                F.expr(
                    f"greatest(coalesce(sum(raw), cast(0 as bigint)) "
                    f"div {HSCALE}, cast(1 as bigint))"
                ).alias("d")
            )
            auths = (
                nodes.join(a_raw, "node", "left")
                .crossJoin(F.broadcast(da))
                .select(
                    "node",
                    F.expr("coalesce(raw, 0) div d").alias("as_"),
                )
            )
            h_raw = (
                e_dst.join(auths.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), (F.col("as_") * F.col("w")).alias("c"))
                .groupBy("node")
                .agg(F.sum("c").alias("raw"))
            )
            dh = h_raw.agg(
                F.expr(
                    f"greatest(coalesce(sum(raw), cast(0 as bigint)) "
                    f"div {HSCALE}, cast(1 as bigint))"
                ).alias("d")
            )
            hubs = (
                nodes.join(h_raw, "node", "left")
                .crossJoin(F.broadcast(dh))
                .select(
                    "node",
                    F.expr("coalesce(raw, 0) div d").alias("hs"),
                )
            )
            if (it + 1) % checkpoint_every == 0 or it + 1 == iterations:
                # lazy (see pagerank): materialized by the final action
                auths = auths.localCheckpoint(eager=False)
                hubs = hubs.localCheckpoint(eager=False)
        return (
            nodes.join(auths.withColumnRenamed("as_", "auth_scaled"), "node")
            .join(hubs.withColumnRenamed("hs", "hub_scaled"), "node")
            .select(
                "node",
                "auth_scaled",
                "hub_scaled",
                (F.col("auth_scaled").cast("double") / F.lit(float(HSCALE))).alias("auth"),
                (F.col("hub_scaled").cast("double") / F.lit(float(HSCALE))).alias("hub"),
            )
        )
    finally:
        e_src.unpersist()
        e_dst.unpersist()
        nodes.unpersist()


def bfs_hops(
    edges: DataFrame,
    source_nodes: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_hops: int = 6,
) -> DataFrame:
    """Minimum-hop distance from any source node, by frontier
    expansion (≤ ``max_hops``). Returns (node, hops INT).

    Each round joins the frontier to the (src-partitioned) edge list
    and anti-joins already-visited nodes — state is the visited set,
    frontier shuffles are frontier-sized, not graph-sized.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.repartition("src").persist()
    visited = source_nodes.select(F.col(source_nodes.columns[0]).alias("node")).distinct().withColumn(
        "hops", F.lit(0)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hops", F.lit(hop))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited.select("node", F.col("hops").cast("int").alias("hops"))


def triangle_count(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Exact triangle count via degree-ordered orientation (the
    standard sub-quadratic formulation: Schank & Wagner 2005 /
    Suri–Vassilvitskii "Counting Triangles and the Curse of the Last
    Reducer", WWW 2011 — public papers).

    Orient each undirected edge from its (degree, node)-smaller end to
    the larger; every triangle then has exactly ONE node with two
    out-edges, so counting (wedge ∧ closing-edge) over the oriented
    list counts each triangle once. Orientation bounds the per-node
    out-degree by O(√|E|) on any graph, which is what caps the wedge
    explosion a hub node causes in the naive neighbor-pair join — the
    "curse of the last reducer" at 100 TB.

    Shuffles: degree agg, two joins keyed on node ids. Returns one row
    (n_nodes, n_edges, n_triangles).
    """
    # und/deg feed three actions (orientation, edge count, node count);
    # without caching, each action re-runs the upstream edge
    # construction — for a derived edge set (e.g. a co-purchase
    # self-join) that triples the most expensive stage of the query.
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # orient by (deg, node): u → v iff (deg_u, u) < (deg_v, v)
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    e = und.join(da, "a").join(db, "b")
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_v"),
    ).persist()
    try:
        w1 = oriented.select(F.col("u"), F.col("v").alias("v1"), F.col("deg_v").alias("dv1"))
        w2 = oriented.select(F.col("u"), F.col("v").alias("v2"), F.col("deg_v").alias("dv2"))
        wedges = w1.join(w2, "u").filter(
            (F.col("dv1") < F.col("dv2"))
            | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
        )
        closing = oriented.select(
            F.col("u").alias("v1"), F.col("v").alias("v2")
        )
        n_tri = wedges.join(closing, ["v1", "v2"], "left_semi").count()
        n_edges = und.count()
        n_nodes = deg.count()
    finally:
        oriented.unpersist()
        deg.unpersist()
        und.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri)], "n_nodes bigint, n_edges bigint, n_triangles bigint"
    )


def label_propagation(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    converge: bool = False,
    checkpoint_every: int = 2,
) -> DataFrame:
    """SYNCHRONOUS label propagation (Raghavan et al. 2007, public
    paper) made deterministic: every node starts labeled with its own
    id; each round every node simultaneously adopts the neighbor label
    with the largest total edge weight, ties broken toward the
    SMALLEST label (the paper's random tie-break is replaced so the
    result is engine-reproducible and oracle-checkable). ``iters``
    fixed sync rounds — communities usually stabilize in a handful;
    a fixed count keeps the operator a finite unrolled dataflow on
    BOTH engines rather than a convergence loop with float/ordering
    hazards.

    Edges are treated as undirected (symmetrized internally);
    ``weight`` defaults to 1 per edge row. Returns (node, community).

    Scale shape per round: one (dst-keyed) join label→neighbor, one
    (node, label) aggregation, then the per-node argmax as a SECOND
    partial-combinable aggregation — min over struct(−wt, label)
    picks the max-weight / smallest-label winner with no window sort
    (r9: the row_number window needed a hash partition + sort per
    round; the min-struct agg map-side combines instead — same
    winner, one sort removed per round). All node-id hash
    partitioned; labels are ids (longs), never collections. Skewed
    hubs salt like any hot groupBy key.

    Iteration hygiene (VERDICT r6 task 3, matching ``pagerank``'s
    cached-edge discipline): the symmetrized edge relation is
    PERSISTED once — without it every round re-derives it from the
    scan — and labels are ``localCheckpoint``-ed every
    ``checkpoint_every`` rounds (default 2), so plan depth is bounded
    at ``checkpoint_every`` join+agg+window layers instead of one per
    round (at iters=10+ on a big graph, nested lineage means
    quadratic planning cost and a full-history recompute on executor
    loss). Per-round checkpointing is correct but pays a fixed
    materialization job every round; the every-other-round cadence
    (VERDICT r7 task 4) halves that fixed cost while keeping the
    bounded-lineage guarantee. ``converge=True`` forces cadence 1:
    the changed-count job materializes each round anyway, so the
    checkpoint there is free lineage hygiene, not an extra job.

    ``converge=True`` adds a deterministic early stop: after each
    round, count the nodes whose label changed (an exact join on the
    checkpointed label sets — cheap, node-keyed) and stop when zero.
    ``iters`` then bounds the worst case. Synchronous LPA can
    oscillate on bipartite-ish structures, so the bound still matters.
    """
    w_col = F.col(weight) if weight else F.lit(1).cast("long")
    p = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v"), w_col.alias("w")
    )
    und = p.unionByName(
        p.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    ).persist()
    try:
        labels = (
            und.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
            .localCheckpoint(eager=False)  # materialized by round 1's action
        )
        cadence = 1 if converge else max(1, checkpoint_every)
        for it in range(iters):
            nb = und.join(
                labels.withColumnRenamed("node", "v"), "v"
            ).select(F.col("u").alias("node"), "label", "w")
            new_labels = (
                nb.groupBy("node", "label")
                .agg(F.sum("w").alias("wt"))
                .groupBy("node")
                .agg(
                    F.min(
                        F.struct(
                            (-F.col("wt")).alias("nwt"), F.col("label")
                        )
                    ).alias("__w")
                )
                .select("node", F.col("__w.label").alias("label"))
            )
            if (it + 1) % cadence == 0 or it + 1 == iters:
                # lazy: the converge count (a full inner-join scan) or
                # the caller's final action materializes it — one job
                # per round instead of two (r10 optimization round)
                new_labels = new_labels.localCheckpoint(eager=False)
            if converge:
                changed = (
                    new_labels.alias("n")
                    .join(labels.alias("o"), "node")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .count()
                )
                labels = new_labels
                if changed == 0:
                    break
            else:
                labels = new_labels
    finally:
        und.unpersist()
    return labels.withColumnRenamed("label", "community")


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_threshold: int = 500_000,
) -> DataFrame:
    """Connected components via LARGE-STAR / SMALL-STAR alternation
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond" — public paper): returns (node, component), component =
    the minimum node id of the node's component.

    The complement to ``operators/dedup.py::connected_components``
    (min-label propagation, O(component diameter) rounds — the right
    choice for dense, shallow near-dup clusters): star contraction
    converges in O(log^2 n) rounds REGARDLESS of diameter, so it is
    the scale path for adversarial chain/path-shaped graphs where
    label propagation would need O(n) rounds.

    Per round: Large-Star hangs every neighbor LARGER than u onto
    m(u) = min(N(u) ∪ {u}); Small-Star re-hangs the smaller neighbors
    and u itself onto m(u). Each is one node-keyed min-agg plus one
    join — two shuffles per round, edge-relation sized. Fixpoint is
    detected by an order-independent edge-set fingerprint (count +
    sum of pair hashes — one tiny action per round); lineage is cut
    per round with localCheckpoint (the iterative-plan discipline of
    label_propagation/pagerank).

    Below ``driver_threshold`` edges the components come from a
    driver-side union-find instead (pagerank_int's established
    fallback discipline): the output contract — component = minimum
    node id of the node's component — is algorithm-independent, so
    the result is IDENTICAL to the distributed fixpoint while
    skipping O(log² n) rounds of job scheduling on metadata-sized
    graphs. The 500k default is a ~10 MB two-long-column collect —
    far under any driver ceiling, and union-find is O(E·α(E)) ≈
    milliseconds at that size. Billion-edge graphs take the star
    loop unchanged; ``driver_threshold=0`` forces it.
    """
    e0 = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)  # materialized by the count below
    )
    nodes = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=False)  # materialized by its first full action
    )
    if e0.count() <= driver_threshold:
        try:  # Arrow batch transfer (PySpark 4+) — ~10× the pickle path
            ea, na = e0.toArrow(), nodes.toArrow()
            erows = list(
                zip(ea["u"].to_pylist(), ea["v"].to_pylist())
            )
            vlist = na["node"].to_pylist()
        except Exception:  # pragma: no cover - pre-Arrow fallback
            erows = [(r["u"], r["v"]) for r in e0.collect()]
            vlist = [r["node"] for r in nodes.collect()]
        parent = {v: v for v in vlist}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:  # path compression
                parent[x], x = root, parent[x]
            return root

        for u, v in erows:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[ru] = rv
        comp_min: dict = {}
        for v in vlist:
            r = find(v)
            m = comp_min.get(r)
            if m is None or v < m:
                comp_min[r] = v
        node_t = nodes.schema["node"].dataType
        from pyspark.sql.types import StructField, StructType

        out_schema = StructType(
            [StructField("node", node_t), StructField("component", node_t)]
        )
        return edges.sparkSession.createDataFrame(
            [(v, comp_min[find(v)]) for v in vlist], out_schema
        )

    def fingerprint(e: DataFrame) -> tuple:
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal accumulator: a sum of 64-bit hashes overflows
            # BIGINT under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    def star(e: DataFrame, large: bool) -> DataFrame:
        sym = e.select("u", "v").unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("__mv"))
            .select("u", F.least("__mv", "u").alias("m"))
        )
        joined = sym.join(mins, "u")
        if large:
            out = joined.filter(F.col("v") > F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            )
        else:
            out = joined.filter(F.col("v") < F.col("u")).select(
                F.col("v").alias("a"), F.col("m").alias("b")
            ).unionByName(
                mins.select(F.col("u").alias("a"), F.col("m").alias("b"))
            )
        return (
            out.select(
                F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    e = e0
    fp = fingerprint(e)
    for _ in range(max_iter):
        e = star(star(e, large=True), large=False).localCheckpoint(
            eager=True
        )
        nfp = fingerprint(e)
        if nfp == fp:
            break
        fp = nfp
    # converged star forest: every edge is (child, root); roots and
    # isolated nodes map to themselves
    mapping = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    return (
        nodes.join(mapping, "node", "left")
        .select(
            "node",
            F.coalesce("component", F.col("node")).alias("component"),
        )
    )


def k_core(
    edges: DataFrame,
    k: int,
    max_rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core decomposition membership (Seidman 1983, public): the
    maximal subgraph in which every node has degree ≥ k, computed by
    the textbook peel — repeatedly drop nodes whose degree within the
    surviving subgraph is < k until a fixed point. Returns
    (node, deg) for k-core members with their within-core degree.

    The peel is a MONOTONE fixed-point iteration, so a converged run
    and an ``max_rounds``-round unroll agree whenever the fixed point
    is reached within the bound — rounds past convergence are no-ops.
    The operator stops early (exact count of dropped nodes per round,
    node-keyed) but never runs more than ``max_rounds`` rounds, so the
    result is reproducible as a finite SQL unroll on any engine.

    Edges are undirected (symmetrized + deduped internally); degree
    counts DISTINCT neighbors.

    Scale shape per round: two node-keyed joins (alive-filter each
    endpoint) + one node-keyed count — no edge relation ever grows.
    Iteration hygiene matches pagerank/label_propagation: the
    symmetrized edge relation persists once, the alive set
    localCheckpoints per round so plan depth stays constant.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v")).filter(
                F.col(src) != F.col(dst)
            )
        )
        .distinct()
        .persist()
    )
    try:
        # DECREMENTAL peel (r11 optimization round, guide §1.2/§2.3):
        # the r10 shape recomputed every survivor's degree from the
        # full edge relation each round (two edge-sized joins + an
        # edge-sized aggregation per round). The peel is monotone, so
        # the within-subgraph degree can instead be DECREMENTED by the
        # edges into the (typically tiny) set of nodes dropped in the
        # previous round: deg_r(u) = deg_{r-1}(u) − |N(u) ∩ dropped|.
        # Per round the only edge-relation work is one probe of the
        # cached symmetric edges against the dropped set (AQE
        # broadcasts it while small); everything else is node-sized.
        # The fixed point, the termination condition (no node dropped)
        # and the returned within-core degrees are exactly the r10
        # values — tests/test_graph.py and the oracle pin that.
        deg0 = (
            und.groupBy("u")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
            .select(F.col("u").alias("node"), "deg")
            .localCheckpoint(eager=False)  # the count below materializes it
        )
        alive = deg0.filter(F.col("deg") >= k)
        dropped = deg0.filter(F.col("deg") < k).select("node")
        n_dropped = dropped.count()
        for _ in range(max_rounds - 1):
            if n_dropped == 0:
                break
            dec = (
                und.join(dropped.withColumnRenamed("node", "v"), "v")
                .groupBy("u")
                .agg(F.count(F.lit(1)).cast("bigint").alias("__d"))
            )
            nxt = (
                alive.join(dec, alive.node == dec.u, "left")
                .select(
                    "node",
                    (
                        F.col("deg") - F.coalesce(F.col("__d"), F.lit(0))
                    ).alias("deg"),
                )
                .localCheckpoint(eager=False)  # the count materializes it
            )
            alive = nxt.filter(F.col("deg") >= k)
            dropped = nxt.filter(F.col("deg") < k).select("node")
            n_dropped = dropped.count()
        return alive
    finally:
        und.unpersist()


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 6,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-truss decomposition (Cohen 2008, public): the maximal
    subgraph in which every EDGE participates in at least k-2
    triangles, computed by the textbook edge peel — per round,
    count each surviving edge's triangle support (common neighbors
    of its endpoints within the surviving edge set) and drop edges
    below k-2 until a fixed point. Returns canonical (src < dst)
    edges with their final within-truss support.

    Like k_core, the peel is a MONOTONE fixed-point iteration: a
    converged run and a ``max_rounds`` SQL unroll agree whenever the
    fixed point lands within the bound (rounds past convergence are
    no-ops) — which is what makes the DuckDB oracle possible.

    Scale shape per round: ORIENTED triangle enumeration — canonical
    edges (u < v) make every triangle a < b < c appear for exactly
    ONE middle vertex b, so the wedge relation is cur(a,b) ⋈ cur(b,c)
    (volume Σ_b d⁻(b)·d⁺(b), roughly 4× less than per-edge
    full-neighborhood probing) filtered by the closing edge (a,c);
    each triangle then credits its three edges and a left join
    restores 0-support survivors (k ≤ 2 keeps everything). Never
    all-pairs; the survivor set localCheckpoints per round so plan
    depth stays constant (the k_core/pagerank hygiene).
    """
    cur = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)  # the count materializes it
    )
    n_cur = cur.count()
    out = None
    # localCheckpoint erases size statistics (RDD-backed plans report
    # defaultSizeInBytes = Long.Max), so the optimizer NEVER
    # auto-broadcasts the survivor relation — hint it explicitly while
    # the exact count (already tracked for the fixed-point stop) says
    # it fits, and fall back to shuffle joins above the guard. The
    # count-guarded adaptive-selection pattern from connected
    # components' driver union-find fast path.
    bcast_max = 2_000_000
    for _ in range(max_rounds):
        e1 = cur.select(F.col("u").alias("a"), F.col("v").alias("b"))
        e2 = cur.select(F.col("u").alias("b2"), F.col("v").alias("c"))
        e3 = cur.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
        if n_cur <= bcast_max:
            e2, e3 = F.broadcast(e2), F.broadcast(e3)
        tri = e1.join(e2, F.col("b") == F.col("b2")).join(
            e3,
            (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")),
        )
        # one explode pass, NOT three unioned projections — a union
        # of selects re-executes the triangle joins once per branch
        credits = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("a").alias("u"), F.col("b").alias("v")
                        ),
                        F.struct(
                            F.col("b").alias("u"), F.col("c").alias("v")
                        ),
                        F.struct(
                            F.col("a").alias("u"), F.col("c").alias("v")
                        ),
                    )
                ).alias("e")
            )
            .select("e.u", "e.v")
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        )
        sup = (
            cur.join(credits, ["u", "v"], "left")
            .select(
                "u",
                "v",
                F.coalesce(F.col("support"), F.lit(0))
                .cast("bigint")
                .alias("support"),
            )
            .filter(F.col("support") >= k - 2)
            .localCheckpoint(eager=False)  # the count materializes it
        )
        n_nxt = sup.count()
        done = n_nxt == n_cur
        out = sup
        cur, n_cur = sup.select("u", "v"), n_nxt
        if done:
            break
    if out is None:  # max_rounds == 0: degenerate, no peel requested
        return cur.select(
            F.col("u").alias(src),
            F.col("v").alias(dst),
            F.lit(None).cast("bigint").alias("support"),
        )
    return out.select(
        F.col("u").alias(src), F.col("v").alias(dst), "support"
    )


def sssp(
    edges: DataFrame,
    source: int,
    max_rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
) -> DataFrame:
    """Single-source shortest paths by synchronous Bellman–Ford
    relaxation (Bellman 1958, public) over non-negative INTEGER edge
    weights — the distributed SSSP that needs no priority queue: each
    round every reached node offers dist+w to its neighbors and every
    node keeps the minimum. Returns (node, dist) for REACHED nodes
    only (the frontier relation stays sparse — unreached nodes never
    materialize, unlike a dense INF-initialized table).

    A fixed point is reached after at most diameter rounds; rounds
    past it are no-ops, so the early-stopped run equals the
    ``max_rounds`` unroll (same argument as k_core). Integer
    distances make every min exact on any engine.

    Scale shape per round: one dst-keyed join (distances → edges) and
    one node-keyed min — both on the node id key; the edge relation
    persists once; distances localCheckpoint per round. Early stop is
    an exact (count, sum(dist)) fingerprint — monotone non-increasing
    distances + non-decreasing reach make it a true fixed-point test.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"), F.col(weight).alias("w"))
        .unionByName(
            edges.select(
                F.col(dst).alias("u"), F.col(src).alias("v"), F.col(weight).alias("w")
            )
        )
        .persist()
    )
    try:
        spark = edges.sparkSession
        dist = spark.createDataFrame(
            [(source, 0)], "node long, dist long"
        ).localCheckpoint(eager=True)

        def fp(d: DataFrame) -> tuple:
            r = d.agg(
                F.count(F.lit(1)).alias("n"), F.sum("dist").alias("s")
            ).collect()[0]
            return (r["n"], r["s"])

        cur = fp(dist)
        for _ in range(max_rounds - 1):
            relaxed = (
                und.join(dist.withColumnRenamed("node", "u"), "u")
                .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
            )
            nxt = (
                dist.unionByName(relaxed)
                .groupBy("node")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=False)  # fp()'s agg materializes it
            )
            nfp = fp(nxt)
            done = nfp == cur
            dist, cur = nxt, nfp
            if done:
                break
        return dist
    finally:
        und.unpersist()
