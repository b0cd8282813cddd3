"""Scale ladder (VERDICT r8 task 1): measure the six shuffle-heaviest
families at three geometrically growing input sizes (1x / 3x / 10x of
the sf0.1 fixtures — the 10x point is sf1-equivalent for lineitem) and
report wall time, Exchange records where the executed plan is
reachable, and the fitted scaling exponent between the two LARGEST
points (alpha = ln(t_hi/t_mid) / ln(size_hi/size_mid) — the small
point is floor-dominated by fixed job cost, so the top segment is the
honest growth estimate).

Families (VERDICT r8 task 1 list):
  ppjoin    exact-Jaccard PPJoin prefix filtering  (operators/dedup.py)
  passages  cross-doc passage dedup (fingerprint)  (operators/passages.py)
  ann       IVF build+adds+query at rest; HNSW build+query (similarity/hnsw)
  graph     star-contraction CC + k-truss          (operators/graph.py)
  blocked   block-offset global rank + cumsum      (operators/linkage.py)
  deltalog  12-commit checkpointed protocol ingest (sources/deltalog.py)

Inputs are synthesized from the sf0.1 fixtures with the SAME
generators scale_probe.py uses (near-dup-preserving word mutations for
documents, near-neighbor vector perturbations for embeddings,
xxhash64-uniform graphs) — deterministic, no RNG state.

Usage: python tools/scale_ladder.py [family ...]   (default: all)
Each measurement prints one '@@LADDER {json}' line; a final
'@@SUMMARY' line carries the exponent table for SCALE.md.
"""

from __future__ import annotations

import json
import math
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from lakehouse_poc_spark.session import get_spark  # noqa: E402
from tools.scale_probe import (  # noqa: E402
    scaled_corpus,
    scaled_embeddings,
    synthetic_graph,
)
from tools.shuffle_audit import exchange_metrics  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
SCRATCH = Path("/root/repo/.scratch/ladder")
RESULTS: list[dict] = []


def measure(family: str, size: int, fn, reps: int = 2) -> None:
    """Best-of-reps wall for one (family, size) point; Exchange rows
    from the LAST rep's executed plan when fn returns a DataFrame
    (multi-job lifecycles return None — wall only)."""
    spark = get_spark("ladder")
    best, exch = None, None
    for _ in range(reps):
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        t0 = time.perf_counter()
        df = fn()
        if df is not None:
            df.collect()
        wall = time.perf_counter() - t0
        if best is None or wall < best:
            best = wall
        if df is not None:
            exch = exchange_metrics(df._jdf.queryExecution().executedPlan())
    row = {
        "family": family,
        "size": size,
        "sec": round(best, 2),
        "exchange_records": sum(e["records"] for e in exch) if exch else None,
        "n_exchanges": len(exch) if exch else None,
    }
    RESULTS.append(row)
    print("@@LADDER " + json.dumps(row), flush=True)


# -- family drivers ---------------------------------------------------------


def run_ppjoin(spark) -> None:
    from lakehouse_poc_spark.operators.dedup import jaccard_prefix_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for f in (1, 3, 10):
        corpus = scaled_corpus(docs, f).persist()
        n = corpus.count()
        measure(
            "ppjoin",
            n,
            lambda c=corpus: jaccard_prefix_pairs(
                c, "text", "doc_id", shingle_n=3, threshold=0.8
            ).groupBy().agg(
                F.count(F.lit(1)).alias("pairs")
            ),
        )
        corpus.unpersist()


def run_passages(spark) -> None:
    from lakehouse_poc_spark.operators.passages import dedup_passages

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    for f in (1, 3, 10):
        corpus = scaled_corpus(docs, f).persist()
        n = corpus.count()
        measure(
            "passages",
            n,
            lambda c=corpus: dedup_passages(
                c, "text", "doc_id", block_words=20, fingerprint=True
            ).groupBy().agg(
                F.sum("n_removed").alias("removed"),
                F.count(F.lit(1)).alias("docs"),
            ),
        )
        corpus.unpersist()


def run_ann(spark) -> None:
    from lakehouse_poc_spark.operators.hnsw import (
        hnsw_build_index,
        hnsw_query_at_rest,
    )
    from lakehouse_poc_spark.operators.similarity import (
        ivf_build_index,
        ivf_index_add,
        ivf_query_at_rest,
    )
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    for f in (1, 3, 10):
        corpus = scaled_embeddings(emb, f).persist()
        n = corpus.count()
        queries = corpus.filter(F.col("vec_id") < 8)

        def ivf_lifecycle(c=corpus, q=queries):
            root = SCRATCH / "ivf"
            if root.exists():
                shutil.rmtree(root)
            wh = Warehouse(spark, str(root))
            ivf_build_index(
                c.filter(F.col("vec_id") % 3 != 2),
                wh, "ann.t", "embedding", "vec_id", n_centroids=16,
            )
            ivf_index_add(
                c.filter(F.col("vec_id") % 3 == 2),
                wh, "ann.t", "embedding", "vec_id",
            )
            ivf_query_at_rest(
                wh, "ann.t", q, vec_col="embedding", id_col="vec_id",
                query_id_col="vec_id", k=5, nprobe=2,
            ).count()
            return None

        measure("ivf_lifecycle", n, ivf_lifecycle)

        def hnsw_lifecycle(c=corpus, q=queries):
            root = SCRATCH / "hnsw"
            if root.exists():
                shutil.rmtree(root)
            wh = Warehouse(spark, str(root))
            hnsw_build_index(
                c, wh, "ann.h", "embedding", "vec_id",
                m=8, ef_construction=32, n_shards=4,
            )
            hnsw_query_at_rest(
                wh, "ann.h", q, vec_col="embedding", id_col="vec_id",
                query_id_col="vec_id", k=5, ef_search=16,
            ).count()
            return None

        measure("hnsw_lifecycle", n, hnsw_lifecycle)
        corpus.unpersist()


def run_graph(spark) -> None:
    from lakehouse_poc_spark.operators.graph import (
        connected_components_star,
        k_truss,
    )

    for m in (60_000, 180_000, 600_000):
        edges = synthetic_graph(spark, m).persist()
        n = edges.count()
        # driver_threshold=0: force the DISTRIBUTED star loop at every
        # size — the default would route the small points through the
        # driver-side fallback and the ladder would compare two
        # different algorithms
        measure(
            "star_cc",
            n,
            lambda e=edges: connected_components_star(
                e, driver_threshold=0
            )
            .groupBy()
            .agg(F.countDistinct("component").alias("n_cc")),
        )
        edges.unpersist()
    for m in (20_000, 60_000, 200_000):
        # k-truss needs triangles to peel; uniform random graphs are
        # triangle-free in expectation at these sizes (d²/n ≪ 1) and
        # the peel ends in one floor-cost round. Generate the real
        # workload's shape instead: size-8 cliques (the co-purchase
        # structure — every clique edge has 6 triangles and survives
        # k=4) plus ~10% random cross edges that the first round
        # peels, so every round does representative work.
        n_cliques = max(1, m // 28)
        mem = spark.range(n_cliques).select(
            F.col("id").alias("c"),
            F.explode(F.sequence(F.lit(0), F.lit(7))).alias("i"),
        ).select(
            "c", "i", (F.col("c") * 8 + F.col("i")).alias("node")
        )
        clique_edges = (
            mem.alias("a")
            .join(
                mem.alias("b"),
                (F.col("a.c") == F.col("b.c"))
                & (F.col("a.i") < F.col("b.i")),
            )
            .select(
                F.col("a.node").alias("src"), F.col("b.node").alias("dst")
            )
        )
        nn = n_cliques * 8
        cross = (
            spark.range(m // 10)
            .select(
                F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(nn)).alias(
                    "src"
                ),
                F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(nn)).alias(
                    "dst"
                ),
            )
            .filter(F.col("src") != F.col("dst"))
        )
        edges = clique_edges.unionByName(cross).persist()
        n = edges.count()
        measure(
            "ktruss",
            n,
            lambda e=edges: k_truss(e, k=4)
            .groupBy()
            .agg(F.count(F.lit(1)).alias("edges_kept")),
        )
        edges.unpersist()


def _scaled_lineitem(spark, factor: int):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    parts = [li]
    for i in range(1, factor):
        parts.append(
            li.select(
                (F.col("l_orderkey") + 100_000_000 * i).alias("l_orderkey"),
                "l_linenumber",
                "l_extendedprice",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_blocked(spark) -> None:
    from lakehouse_poc_spark.operators.linkage import (
        global_cumsum,
        global_rank,
    )

    for f in (1, 3, 10):
        li = _scaled_lineitem(spark, f).persist()
        n = li.count()
        # block = price coarsened to ~110 buckets (price range is SF-
        # invariant, so block cardinality stays fixed as rows grow)
        blk = F.floor(F.col("l_extendedprice") / 1000).cast("long")
        measure(
            "global_rank",
            n,
            lambda d=li, b=blk: global_rank(
                d,
                ["l_extendedprice", "l_orderkey", "l_linenumber"],
                b,
            ).groupBy().agg(
                F.sum(F.col("rank").cast("decimal(28,0)")).alias("s"),
                F.max("rank").alias("mx"),
            ),
        )
        measure(
            "global_cumsum",
            n,
            lambda d=li, b=blk: global_cumsum(
                d.withColumn(
                    "p", F.col("l_extendedprice").cast("decimal(18,2)")
                ),
                ["l_extendedprice", "l_orderkey", "l_linenumber"],
                b,
                "p",
            ).groupBy().agg(F.max("cum").alias("mx")),
        )
        li.unpersist()


def run_deltalog(spark) -> None:
    from lakehouse_poc_spark.sources.deltalog import (
        DeltaLogWriter,
        read_delta,
    )

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for f in (1, 3, 10):
        base = orders
        parts = [base]
        for i in range(1, f):
            parts.append(
                base.select(
                    (F.col("o_orderkey") + 100_000_000 * i).alias(
                        "o_orderkey"
                    ),
                    "o_orderstatus",
                    "o_totalprice",
                )
            )
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big = big.persist()
        n = big.count()

        def ingest(d=big):
            # 12 commits crossing the checkpoint cadence (10), then a
            # full replay read — the delta_checkpointed_ingest shape
            root = SCRATCH / "dl"
            if root.exists():
                shutil.rmtree(root)
            w = DeltaLogWriter(spark, root / "t")
            for c in range(12):
                batch = d.filter(F.col("o_orderkey") % 12 == c)
                if c == 0:
                    w.create(batch)
                else:
                    w.append(batch)
            assert read_delta(spark, root / "t").count() == n
            return None

        measure("deltalog_ingest", n, ingest)
        big.unpersist()


FAMILIES = {
    "ppjoin": run_ppjoin,
    "passages": run_passages,
    "ann": run_ann,
    "graph": run_graph,
    "blocked": run_blocked,
    "deltalog": run_deltalog,
}


def summarize() -> None:
    by_fam: dict[str, list[dict]] = {}
    for r in RESULTS:
        by_fam.setdefault(r["family"], []).append(r)
    summary = {}
    for fam, rows in by_fam.items():
        rows = sorted(rows, key=lambda r: r["size"])
        if len(rows) >= 2:
            a, b = rows[-2], rows[-1]
            alpha = math.log(b["sec"] / a["sec"]) / math.log(
                b["size"] / a["size"]
            )
            ex = None
            if a.get("exchange_records") and b.get("exchange_records"):
                ex = math.log(
                    b["exchange_records"] / a["exchange_records"]
                ) / math.log(b["size"] / a["size"])
            summary[fam] = {
                "alpha_time": round(alpha, 2),
                "alpha_exchange": round(ex, 2) if ex is not None else None,
                "points": [
                    {"n": r["size"], "sec": r["sec"],
                     "exch": r.get("exchange_records")}
                    for r in rows
                ],
            }
    print("@@SUMMARY " + json.dumps(summary), flush=True)


def main() -> None:
    wanted = sys.argv[1:] or list(FAMILIES)
    spark = get_spark("ladder")
    spark.range(1).count()
    # warm the Arrow/pandas worker pool once (per-executor cost)
    cores = spark.sparkContext.defaultParallelism
    spark.range(cores).repartition(cores).mapInPandas(
        lambda it: it, "id long"
    ).count()
    for fam in wanted:
        FAMILIES[fam](spark)
    summarize()


if __name__ == "__main__":
    main()
