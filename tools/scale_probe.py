"""Scaling probe: measure the dedup/similarity scale paths against
their brute-force twins on geometrically growing corpora.

Builds 1×/2×/4× corpora by cloning the fixture documents with
deterministic word-level mutations (so near-dup structure is
preserved, not just exact dups), then times:
  - minhash_lsh_pairs  (sub-quadratic scale path)
  - simhash_near_pairs (sub-quadratic scale path)
  - ngram_jaccard_pairs (O(n²) oracle path, for contrast)

Usage: python tools/scale_probe.py [sf_dir] [--with-brute]
Prints one line per (operator, scale) with wall seconds; the expected
shape is ~linear-ish growth for the LSH paths and ~quadrupling for
brute force — recorded in SCALE.md.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from lakehouse_poc_spark.operators.dedup import (
    exact_substring_dedup,
    jaccard_containment_pairs,
    jaccard_prefix_pairs,
    jaccard_prefix_pairs_cross,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    prefix_candidates,
    simhash_near_pairs,
    tf_cosine_pairs,
    winnow_pairs,
)
from lakehouse_poc_spark.operators.semdedup import semdedup
from lakehouse_poc_spark.operators.search import bm25_topk, inverted_index
from lakehouse_poc_spark.session import get_spark
from lakehouse_poc_spark.sources.readers import read_parquet_table


def scaled_corpus(docs: DataFrame, factor: int) -> DataFrame:
    """factor× corpus: copy i rewrites every i-th word (deterministic)
    so copies are near-dups of their source, not exact dups."""
    parts = [docs.select("doc_id", "text")]
    for i in range(1, factor):
        words = F.split("text", r"\s+")
        mutated = F.array_join(
            F.transform(
                words,
                lambda w, j: F.when((j % (i + 2)) == 0, F.concat(w, F.lit(f"_m{i}"))).otherwise(w),
            ),
            " ",
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                mutated.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scaled_embeddings(emb: DataFrame, factor: int) -> DataFrame:
    """factor× embedding corpus: copy i perturbs every vector's first
    component by a small deterministic offset so copies are NEAR
    neighbors of their source (semantic-dup structure preserved)."""
    parts = [emb.select("vec_id", "embedding")]
    for i in range(1, factor):
        parts.append(
            emb.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda v, j: F.when(j == 0, v + F.lit(0.001 * i)).otherwise(v),
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _shingle_relation(corpus: DataFrame) -> DataFrame:
    from lakehouse_poc_spark.functions.text import word_shingles
    from lakehouse_poc_spark.operators.partitioning import fan_out

    return (
        fan_out(corpus)
        .select(
            F.col("doc_id").alias("did"),
            F.array_distinct(word_shingles("text", 3)).alias("sh"),
        )
        .withColumn("sz", F.size("sh"))
    )


def synthetic_graph(spark, m_edges: int) -> DataFrame:
    """Deterministic uniform-random graph: ~m edges over n = m/4 nodes
    (average degree ~8 after symmetrization); endpoints derived from
    xxhash64 so the probe is reproducible run-to-run with no RNG
    state. Self-loops dropped."""
    n = max(2, m_edges // 4)
    return (
        spark.range(m_edges)
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(n)).alias("src"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(2)), F.lit(n)).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def graph_probe(spark) -> None:
    """Iterative-graph scaling (VERDICT r6 task 3): 20k/80k/320k-edge
    synthetic graphs; wall time for LPA (3 fixed rounds and the
    converge-early variant), triangle counting, and distributed
    connected components, plus the MEASURED per-round LPA shuffle
    (Exchange records of one round's join+agg+window)."""
    from pyspark.sql import Window

    from lakehouse_poc_spark.operators.dedup import connected_components
    from lakehouse_poc_spark.operators.graph import (
        connected_components_star,
        k_core,
        label_propagation,
        sssp,
        triangle_count,
    )
    from tools.shuffle_audit import exchange_metrics

    for m in (20_000, 80_000, 320_000):
        edges = synthetic_graph(spark, m).persist()
        ne = edges.count()

        t0 = time.perf_counter()
        n_comm = (
            label_propagation(edges, iters=3)
            .select("community")
            .distinct()
            .count()
        )
        t_lpa = time.perf_counter() - t0

        t0 = time.perf_counter()
        label_propagation(edges, iters=10, converge=True).count()
        t_conv = time.perf_counter() - t0

        t0 = time.perf_counter()
        tri = triangle_count(edges).collect()[0]["n_triangles"]
        t_tri = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_cc = (
            connected_components(
                edges.selectExpr("src AS id_a", "dst AS id_b"),
                driver_threshold=0,  # force the distributed loop
            )
            .select("component")
            .distinct()
            .count()
        )
        t_cc = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_star = (
            connected_components_star(edges)
            .select("component")
            .distinct()
            .count()
        )
        t_star = time.perf_counter() - t0

        t0 = time.perf_counter()
        n_core = k_core(edges, k=8, max_rounds=30).count()
        t_core = time.perf_counter() - t0

        t0 = time.perf_counter()
        src0 = edges.select(F.least("src", "dst").alias("s")).agg(
            F.min("s").alias("m")
        ).collect()[0]["m"]
        n_reach = sssp(
            edges.withColumn("w", F.lit(1).cast("long")),
            source=src0,
            max_rounds=30,
        ).count()
        t_sssp = time.perf_counter() - t0

        # measured per-round LPA shuffle: one round's join+agg+window
        # at initial labels, Exchange records from the executed plan
        und = edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).select(F.col("src").alias("u"), F.col("dst").alias("v"))
        labels0 = (
            und.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("label", F.col("node"))
        )
        rk = Window.partitionBy("node").orderBy(
            F.desc("wt"), F.asc("label")
        )
        one_round = (
            und.join(labels0.withColumnRenamed("node", "v"), "v")
            .select(F.col("u").alias("node"), "label")
            .groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("wt"))
            .withColumn("__r", F.row_number().over(rk))
            .filter(F.col("__r") == 1)
            .select("node", "label")
        )
        # collect() executes THIS frame's queryExecution (a count()
        # would execute a different, aggregated plan with no metrics
        # on one_round's own exchanges); the result is node-sized
        one_round.collect()
        exes = exchange_metrics(
            one_round._jdf.queryExecution().executedPlan()
        )
        rec = sum(e["records"] for e in exes)
        print(
            f"{'graph':14s} edges={ne:7d} lpa3={t_lpa:6.2f}s "
            f"lpa_conv={t_conv:6.2f}s tri={t_tri:6.2f}s ({tri} tris) "
            f"cc={t_cc:6.2f}s star={t_star:6.2f}s "
            f"kcore8={t_core:6.2f}s ({n_core} in-core) "
            f"sssp={t_sssp:6.2f}s ({n_reach} reached) comms={n_comm} "
            f"comps={n_cc}/{n_star} round_shuffle_rows={rec}",
            flush=True,
        )
        edges.unpersist()


def assoc_probe(spark, sf_dir: str) -> None:
    """Association/linkage scaling (r7): synthetic basket corpora at
    4× growth (baskets ~n, catalog ~n/8, basket size ~6) for the
    A-Priori pair+triple passes, and part-table growth for the
    sorted-neighborhood + Fellegi-Sunter linkage pipeline; wall time
    plus MEASURED Exchange records of the pair pass."""
    from lakehouse_poc_spark.operators.itemsets import (
        frequent_pairs,
        frequent_triples,
    )

    for n in (20_000, 80_000, 320_000):
        cat = max(16, n // 8)
        baskets = (
            spark.range(n * 6)
            .select(
                (F.col("id") % n).alias("bk"),
                F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(cat)).alias(
                    "item"
                ),
            )
            .persist()
        )
        baskets.count()
        t0 = time.perf_counter()
        pairs = frequent_pairs(baskets, "bk", "item", minsup=2)
        np_ = pairs.count()
        t_p = time.perf_counter() - t0
        # NB: frequent_pairs returns a localCheckpoint'd frame, so its
        # executed plan carries no Exchange metrics — wall + output
        # cardinality are the probe signals here
        t0 = time.perf_counter()
        nt = frequent_triples(baskets, "bk", "item", minsup=2).count()
        t_t = time.perf_counter() - t0
        print(
            f"{'assoc':14s} rows={n * 6:8d} pairs={np_:7d} ({t_p:5.2f}s) "
            f"triples={nt:6d} ({t_t:5.2f}s)",
            flush=True,
        )
        baskets.unpersist()

    from lakehouse_poc_spark.operators.linkage import (
        linkage_score,
        sorted_neighborhood_pairs,
    )

    part = read_parquet_table(spark, sf_dir, "part")
    for factor in (1, 2, 4):
        p = part
        for i in range(1, factor):
            p = p.unionByName(
                part.withColumn(
                    "p_partkey", F.col("p_partkey") + F.lit(1_000_000 * i)
                )
            )
        p = p.persist()
        np_ = p.count()
        t0 = time.perf_counter()
        cand = sorted_neighborhood_pairs(
            p.select("p_partkey", "p_name"),
            sort_cols=["p_name", "p_partkey"],
            block=F.substring("p_name", 1, 2),
            id_col="p_partkey",
            window=3,
        )
        scored = linkage_score(
            cand,
            p,
            p,
            "p_partkey",
            [
                (
                    F.levenshtein(F.col("__a_p_name"), F.col("__b_p_name"))
                    <= 4,
                    6,
                    -2,
                ),
                (F.col("__a_p_brand") == F.col("__b_p_brand"), 4, -1),
            ],
            match_at=8,
            possible_at=4,
        )
        nm = scored.filter("decision = 'match'").count()
        t_l = time.perf_counter() - t0
        print(
            f"{'linkage':14s} parts={np_:7d} matches={nm:6d} ({t_l:5.2f}s)",
            flush=True,
        )
        p.unpersist()


def spatial_probe(spark) -> None:
    """Grid-bucketed radius self-join at growing point counts: the
    scale claim is that candidate pairs (cell-join rows reaching the
    distance filter) grow ~linearly with n at fixed density-per-cell
    sizing, while the brute pair space grows n². Synthetic points use
    the geoops coordinate formulas over 1..n."""
    from pyspark.sql import functions as F

    for n in (15_000, 60_000, 240_000):
        pts = (
            spark.range(1, n + 1)
            .select(
                F.col("id"),
                ((F.col("id") * 37 % 18000).cast("double") / 100.0 - 90.0).alias("lat"),
                ((F.col("id") * 91 % 36000).cast("double") / 100.0 - 180.0).alias("lon"),
            )
        )
        cell = 3.0
        cells = pts.select(
            "id", "lat", "lon",
            F.floor(F.col("lat") / cell).cast("bigint").alias("cx"),
            F.floor(F.col("lon") / cell).cast("bigint").alias("cy"),
        ).persist()
        d = F.array([F.lit(-1), F.lit(0), F.lit(1)])
        probe = (
            cells.withColumn("dx", F.explode(d))
            .withColumn("dy", F.explode(d))
            .select(
                F.col("id").alias("id_b"), F.col("lat").alias("lat_b"),
                F.col("lon").alias("lon_b"),
                (F.col("cx") + F.col("dx")).alias("cx"),
                (F.col("cy") + F.col("dy")).alias("cy"),
            )
        )
        joined = cells.join(probe, ["cx", "cy"]).filter(F.col("id") < F.col("id_b"))
        t0 = time.time()
        cand = joined.count()
        dlat = F.col("lat") - F.col("lat_b")
        dlon = F.col("lon") - F.col("lon_b")
        pairs = joined.filter(dlat * dlat + dlon * dlon <= F.lit(9.0)).count()
        dt = time.time() - t0
        brute = n * (n - 1) // 2
        print(
            f"spatial n={n:7d} candidates={cand:10d} pairs={pairs:9d} "
            f"cand_frac={cand / brute:.6f} wall={dt:5.1f}s"
        )
        cells.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    with_brute = "--with-brute" in sys.argv
    spark = get_spark("scale_probe")
    if "--graph" in sys.argv:
        spark.range(1).count()
        graph_probe(spark)
        return
    if "--assoc" in sys.argv:
        spark.range(1).count()
        assoc_probe(spark, sf_dir)
        return
    if "--spatial" in sys.argv:
        spark.range(1).count()
        spatial_probe(spark)
        return
    if "--ann-add" in sys.argv:
        spark.range(1).count()
        ann_add_probe(spark, sf_dir)
        return
    if "--lm" in sys.argv:
        spark.range(1).count()
        lm_probe(spark, sf_dir)
        return
    if "--hamming" in sys.argv:
        hamming_probe(spark, sf_dir)
        return
    if "--hnsw" in sys.argv:
        spark.range(1).count()
        hnsw_probe(spark, sf_dir)
        return
    docs = read_parquet_table(spark, sf_dir, "documents")
    emb = read_parquet_table(spark, sf_dir, "embeddings")
    spark.range(1).count()

    for factor in (1, 2, 4):
        corpus = scaled_corpus(docs, factor).persist()
        n = corpus.count()
        all_pairs = n * (n - 1) // 2
        ops = {
            "minhash_lsh": lambda c: minhash_lsh_pairs(
                c, "text", "doc_id", num_perm=32, bands=8
            ),
            "simhash": lambda c: simhash_near_pairs(c, "text", "doc_id", max_hamming=3),
            # index build + retrieval: should scale ~linearly with the
            # corpus (one (doc, token) shuffle; query terms filtered
            # under the agg)
            "bm25_topk": lambda c: bm25_topk(c, ["spark", "merge", "window"], k=10),
            "inverted_index": lambda c: inverted_index(c, min_df=100),
            # r6 (VERDICT task 5): the exact-at-scale paths
            "jaccard_prefix": lambda c: jaccard_prefix_pairs(
                c, "text", "doc_id", shingle_n=3, threshold=0.5
            ),
            "tf_cosine": lambda c: tf_cosine_pairs(
                c, "text", "doc_id", threshold=0.8, shingle_n=3
            ),
            "incr_neardup": lambda c: jaccard_prefix_pairs_cross(
                c.filter(F.col("doc_id") % 10 == 0),
                c.filter(F.col("doc_id") % 10 != 0),
                "text",
                "doc_id",
                shingle_n=3,
                threshold=0.5,
            ),
            "bigram_logprob": lambda c: _bigram_logprob(c),
            # r6 additions: asymmetric containment (A-prefix × full
            # flat relation) and winnowing fingerprint match
            "containment": lambda c: jaccard_containment_pairs(
                c, "text", "doc_id", shingle_n=3, threshold=0.8
            ),
            "winnow_pairs": lambda c: winnow_pairs(
                c, "text", "doc_id", k=3, w=4, min_shared=2
            ),
            # r7: ExactSubstr removal — wall should track corpus grams
            # (linear), the covered-expansion only the repeated subset
            "substr_dedup": lambda c: exact_substring_dedup(
                c, "text", "doc_id", min_len=12
            ),
        }
        if with_brute and factor <= 2:  # O(n²): 20k docs = 200M pairs, skip
            ops["brute_jaccard"] = lambda c: ngram_jaccard_pairs(c, "text", "doc_id")
        for name, fn in ops.items():
            t0 = time.perf_counter()
            pairs = fn(corpus).count()
            dt = time.perf_counter() - t0
            extra = ""
            if name == "jaccard_prefix":
                # candidate-space fraction: PPJoin candidates vs n·(n−1)/2
                cand = prefix_candidates(_shingle_relation(corpus), 0.5).count()
                extra = f" cand={cand:8d} frac={cand / all_pairs:8.5f}"
            print(
                f"{name:14s} docs={n:7d} pairs={pairs:7d} wall={dt:7.2f}s{extra}",
                flush=True,
            )
        corpus.unpersist()

        # semdedup scales on the embeddings table (dense-vector family)
        e = scaled_embeddings(emb, factor).persist()
        ne = e.count()
        t0 = time.perf_counter()
        kept = semdedup(e, "embedding", "vec_id", threshold=0.995).count()
        dt = time.perf_counter() - t0
        # candidate fraction: within-cluster pairs Σ c·(c−1)/2 over all pairs
        from lakehouse_poc_spark.operators.semdedup import signbit_cluster

        sizes = (
            e.select(signbit_cluster(F.col("embedding"), 6))
            .groupBy("cluster")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("wp"))
            .collect()[0]["wp"]
        )
        frac = float(sizes) / (ne * (ne - 1) / 2)
        print(
            f"{'semdedup':14s} vecs={ne:7d} rows={kept:7d} wall={dt:7.2f}s"
            f" cand={int(sizes):8d} frac={frac:8.5f}",
            flush=True,
        )

        # trained-cell SemDeDup (the paper's configuration: k-means
        # cells, not sign-bit slices) — same within-cell pair count
        # gives the candidate fraction the trained quantizer achieves.
        # k scales with the corpus so cells stay ~constant-occupancy.
        from pyspark.sql import Window
        from lakehouse_poc_spark.operators.similarity import cosine, kmeans_train

        k = 16 * factor
        t0 = time.perf_counter()
        cents = kmeans_train(e, "embedding", "vec_id", k=k, iters=2)
        cent_df = e.sparkSession.createDataFrame(
            cents, "cent_id int, cent_vec array<double>"
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("__csim"), F.asc("cent_id"))
        assigned = (
            e.crossJoin(F.broadcast(cent_df))
            .withColumn("__csim", cosine(F.col("embedding"), F.col("cent_vec")))
            .withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") == 1)
            .select("vec_id", "embedding", F.col("cent_id").alias("cluster"))
        ).persist()
        kept_t = semdedup(
            assigned, "embedding", "vec_id", threshold=0.995, cluster_col="cluster"
        ).count()
        dt = time.perf_counter() - t0
        sizes_t = (
            assigned.groupBy("cluster")
            .count()
            .agg(F.sum(F.expr("count * (count - 1) / 2")).alias("wp"))
            .collect()[0]["wp"]
        )
        frac_t = float(sizes_t) / (ne * (ne - 1) / 2)
        print(
            f"{'semdedup_km':14s} vecs={ne:7d} rows={kept_t:7d} wall={dt:7.2f}s"
            f" cand={int(sizes_t):8d} frac={frac_t:8.5f} k={k}",
            flush=True,
        )
        assigned.unpersist()
        e.unpersist()


def _bigram_logprob(corpus: DataFrame):
    """Inline twin of plans/searchops.bigram_logprob_docs over an
    arbitrary corpus frame (the registered query is sf_dir-bound)."""
    tok = corpus.select("doc_id", F.split(F.col("text"), r"\s+").alias("toks"))
    big = (
        tok.filter(F.size("toks") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(toks) - 1), "
                    "i -> struct(element_at(toks, i) AS w1, "
                    "element_at(toks, i + 1) AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", "bg.w1", "bg.w2")
    )
    cnt12 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    cnt1 = cnt12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = tok.select(F.explode("toks").alias("token")).agg(
        F.countDistinct("token").alias("v")
    )
    dbig = big.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    return (
        dbig.join(cnt12.join(cnt1, "w1").crossJoin(F.broadcast(vocab)), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.sum("tf").alias("n_bigrams"))
    )




def ann_add_probe(spark, sf_dir: str) -> None:
    """Maintained-ANN-index scaling: grow the AT-REST index 1x/4x/16x
    and time ivf_index_add of a FIXED-SIZE batch against each. The
    FAISS add contract predicts flat-to-mild growth — an add assigns
    only the batch (batch x 16-centroid broadcast) and appends to the
    touched cells' partitions; it never rewrites the existing index.
    The query side is also timed to show the read path scales with
    corpus (candidates), not with adds."""
    import shutil
    import tempfile
    import time

    from lakehouse_poc_spark.operators.similarity import (
        ivf_build_index,
        ivf_index_add,
        ivf_query_at_rest,
    )
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    batch = emb.select(
        (F.col("vec_id") + 50_000_000).alias("vec_id"), "embedding"
    ).persist()
    nb = batch.count()
    print(f"ann-add probe: fixed add batch = {nb} vectors")
    for factor in (1, 4, 16):
        corpus = scaled_embeddings(emb, factor).persist()
        n = corpus.count()
        root = tempfile.mkdtemp(prefix=f"annprobe{factor}_")
        wh = Warehouse(spark, root)
        t0 = time.monotonic()
        ivf_build_index(corpus, wh, "ann.p", "embedding", "vec_id", 16)
        t_build = time.monotonic() - t0
        t0 = time.monotonic()
        ivf_index_add(batch, wh, "ann.p", "embedding", "vec_id")
        t_add = time.monotonic() - t0
        queries = emb.filter(F.col("vec_id") < 8)
        t0 = time.monotonic()
        got = ivf_query_at_rest(
            wh, "ann.p", queries, "embedding", "vec_id", "vec_id",
            k=5, nprobe=2,
        ).count()
        t_query = time.monotonic() - t0
        print(
            f"  index={n:>7} vectors  build={t_build:6.2f}s  "
            f"add({nb})={t_add:6.2f}s  query(8,k=5)={t_query:6.2f}s  "
            f"result_rows={got}"
        )
        corpus.unpersist()
        shutil.rmtree(root, ignore_errors=True)
    batch.unpersist()


def lm_probe(spark, sf_dir: str) -> None:
    """LM-family scaling: grow the corpus 1x/2x/4x (near-dup mutated
    copies) and measure the Kneser-Ney model domains — the claim
    under test is that the SHUFFLED relation (bigram types / vocab)
    grows sub-linearly in corpus tokens because mutated near-dups
    mostly re-hit existing types, and that wall time tracks the
    corpus scan, not the model."""
    import time

    from lakehouse_poc_spark.plans import QUERIES  # noqa: F401

    docs = read_parquet_table(spark, sf_dir, "documents")
    for factor in (1, 2, 4):
        corpus = scaled_corpus(docs, factor).persist()
        n_docs = corpus.count()
        tok = corpus.select(
            F.explode(F.split("text", r"\s+")).alias("w")
        )
        n_tokens = tok.count()
        vocab = tok.distinct().count()
        # precompute toks once (the query side's exact construction —
        # splitting inside the expr risks regex-literal drift) and
        # guard 1-token docs: sequence(1, 0) DESCENDS in Spark
        big = (
            corpus.select(F.split("text", r"\s+").alias("toks"))
            .filter(F.size("toks") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(toks) - 1),"
                        " i -> struct(element_at(toks, i) AS w1,"
                        " element_at(toks, i + 1) AS w2))"
                    )
                ).alias("bg")
            )
        )
        t0 = time.perf_counter()
        n_bigram_types = big.select("bg.w1", "bg.w2").distinct().count()
        t_model = time.perf_counter() - t0
        print(
            f"  corpus x{factor}: docs={n_docs:>6} tokens={n_tokens:>9,}"
            f" vocab={vocab:>7,} bigram_types={n_bigram_types:>9,}"
            f" model_pass={t_model:5.2f}s"
        )
        corpus.unpersist()




def hamming_probe(spark, sf_dir: str) -> None:
    """Binary-embedding retrieval probe (r8): shortlist+rerank wall
    time as the corpus grows 1x/4x/16x. The scan is integer XOR +
    popcount over two BIGINT lanes per vector — time should track the
    corpus near-linearly with a flat per-query rerank tail (floats
    touched for shortlist rows only). Recall@5 vs brute printed at
    every factor: the sign sketch is scale-free, so recall should not
    decay with corpus growth (copies are near-dups of their source)."""
    import time as _t

    from lakehouse_poc_spark.operators.similarity import (
        brute_force_topk,
        hamming_rerank_topk,
    )

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).persist()
    queries.count()
    for factor in (1, 4, 16):
        corpus = scaled_embeddings(emb, factor).persist()
        n = corpus.count()
        t0 = _t.perf_counter()
        res = hamming_rerank_topk(
            corpus, queries, vec_col="embedding", id_col="vec_id",
            query_id_col="vec_id", k=5, shortlist=50, dim=64,
        ).persist()
        n_rows = res.count()
        dt = _t.perf_counter() - t0
        brute = brute_force_topk(
            corpus, queries, vec_col="embedding", id_col="vec_id",
            query_id_col="vec_id", k=5,
        ).select("query_id", "neighbor_id")
        hits = brute.join(
            res.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        ).count()
        print(
            json.dumps(
                {
                    "factor": factor,
                    "n_vectors": n,
                    "rows": n_rows,
                    "search_s": round(dt, 2),
                    "recall_at_5": round(hits / brute.count(), 4),
                }
            )
        )
        res.unpersist()
        corpus.unpersist()


def hnsw_probe(spark, sf_dir: str) -> None:
    """HNSW scale probe (r8): per-shard graph build + fan-out search
    wall time as the corpus grows 1x/4x/16x with shard count scaled to
    hold per-shard size ~constant — the knob a 100 TB deployment turns
    (shards ~ corpus_bytes / task_memory). Also prints recall@5 vs
    brute at 1x for the probed ef."""
    import time as _t

    from lakehouse_poc_spark.operators.hnsw import hnsw_topk
    from lakehouse_poc_spark.operators.similarity import brute_force_topk

    emb = read_parquet_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8).persist()
    queries.count()
    for factor, shards in ((1, 4), (4, 16), (16, 64)):
        corpus = scaled_embeddings(emb, factor).persist()
        n = corpus.count()
        t0 = _t.perf_counter()
        res = hnsw_topk(
            corpus, queries, vec_col="embedding", id_col="vec_id",
            query_id_col="vec_id", k=5, ef_search=16, n_shards=shards,
        )
        n_rows = res.count()
        dt = _t.perf_counter() - t0
        line = {
            "factor": factor, "n_vectors": n, "n_shards": shards,
            "rows": n_rows, "build_and_search_s": round(dt, 2),
        }
        if factor == 1:
            brute = brute_force_topk(
                corpus, queries, vec_col="embedding", id_col="vec_id",
                query_id_col="vec_id", k=5,
            ).select("query_id", "neighbor_id")
            hits = brute.join(
                res.select("query_id", "neighbor_id"),
                ["query_id", "neighbor_id"],
            ).count()
            line["recall_at_5"] = round(hits / brute.count(), 4)
        print(json.dumps(line))
        corpus.unpersist()


if __name__ == "__main__":
    main()
