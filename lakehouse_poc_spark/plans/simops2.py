"""Similarity wave 2 (r8): binary sign quantization + Hamming-space
retrieval — the remaining classic in the quantized-ANN family
(IVF/PQ/SQ8/LSH/HNSW live in simops). Sign bits pack into 32-bit
BIGINT lanes; distance is XOR + popcount, pure JVM integer work
inside whole-stage codegen, with a recall@5 gate against the exact
cosine brute force.

100 TB shape: a sign-packed 256-dim corpus is 8 BIGINTs per vector
(64× smaller than floats); the Hamming pass is the standard
first-stage shortlist with exact re-rank on the survivors only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    hamming_rerank_topk,
    hamming_topk,
)
from . import query
from .simops import _RECALL_BRUTE_CTE, EMB_DIM, _sql_cosine, _t

# sign-pack in DuckDB: a left fold over a literal index range, one
# 32-bit lane per word (mirrors operators/similarity.py::sign_pack)


def _sql_word(vec: str, j: int) -> str:
    lo, hi = 32 * j, min(32 * j + 31, EMB_DIM - 1)
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(generate_series({lo}, {hi}), "
        f"i -> CASE WHEN {vec}[i + 1] > 0 "
        f"THEN CAST(1 AS BIGINT) << (i - {lo}) "
        f"ELSE CAST(0 AS BIGINT) END)), (acc, x) -> acc + x)"
    )


_N_WORDS = (EMB_DIM + 31) // 32

_PACKED_CTE = f"""
    packed AS (
        SELECT vec_id,
               {", ".join(f"{_sql_word('embedding', j)} AS w{j}" for j in range(_N_WORDS))}
        FROM embeddings
    )"""

_HAMMING_EXPR = " + ".join(
    f"CAST(bit_count(xor(q.w{j}, c.w{j})) AS INTEGER)"
    for j in range(_N_WORDS)
)


@query(
    "similarity_topk_hamming",
    oracle=f"""
    WITH {_PACKED_CTE.strip()}
    SELECT query_id, neighbor_id, hamming, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_HAMMING_EXPR} AS hamming,
               CAST(row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {_HAMMING_EXPR} ASC, c.vec_id
               ) AS INTEGER) AS rank
        FROM packed q JOIN packed c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 8
    ) t
    WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def similarity_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return hamming_topk(
        emb,
        queries,
        vec_col="embedding",
        id_col="vec_id",
        query_id_col="vec_id",
        k=5,
        dim=EMB_DIM,
    ).orderBy("query_id", "rank")


# shortlist CTE shared by the rerank query and the recall gate:
# Hamming top-50 per query, then exact cosine over the survivors
_SHORTLIST_CTE = f"""
    shortlist AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   CAST(row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY {_HAMMING_EXPR} ASC, c.vec_id
                   ) AS INTEGER) AS rank
            FROM packed q JOIN packed c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 8
        ) t WHERE rank <= 50
    ),
    reranked AS (
        SELECT query_id, neighbor_id, cos_sim, rank FROM (
            SELECT s.query_id, s.neighbor_id,
                   {_sql_cosine('q.embedding', 'c.embedding')} AS cos_sim,
                   CAST(row_number() OVER (
                       PARTITION BY s.query_id
                       ORDER BY {_sql_cosine('q.embedding', 'c.embedding')}
                                DESC, s.neighbor_id
                   ) AS INTEGER) AS rank
            FROM shortlist s
            JOIN embeddings q ON q.vec_id = s.query_id
            JOIN embeddings c ON c.vec_id = s.neighbor_id
        ) t WHERE rank <= 5
    )"""


@query(
    "similarity_topk_hamming_rerank",
    oracle=f"""
    WITH {_PACKED_CTE.strip()},
    {_SHORTLIST_CTE.strip()}
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM reranked
    ORDER BY query_id, rank
    """,
)
def similarity_topk_hamming_rerank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    return hamming_rerank_topk(
        emb,
        queries,
        vec_col="embedding",
        id_col="vec_id",
        query_id_col="vec_id",
        k=5,
        shortlist=50,
        dim=EMB_DIM,
    ).orderBy("query_id", "rank")


@query(
    "ann_recall_hamming",
    oracle=f"""
    WITH {_RECALL_BRUTE_CTE.strip()},
    {_PACKED_CTE.strip()},
    {_SHORTLIST_CTE.strip()}
    SELECT b.query_id,
           CAST(COUNT(h.neighbor_id) AS BIGINT) AS n_hits,
           CAST(COUNT(h.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM brute b
    LEFT JOIN reranked h
      ON b.query_id = h.query_id AND b.neighbor_id = h.neighbor_id
    GROUP BY b.query_id
    ORDER BY b.query_id
    """,
)
def ann_recall_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the END-TO-END two-stage pipeline (Hamming
    shortlist-50 → exact cosine re-rank) against the cosine brute
    force. The raw 64-bit shortlist alone sits near 0.2 on this
    fixture (64 sign bits is a coarse sketch); the pipeline recovers
    ~0.6 — the number that matters, since re-rank is how binary
    embeddings are deployed."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    brute = brute_force_topk(
        emb, queries, vec_col="embedding", id_col="vec_id",
        query_id_col="vec_id", k=5,
    ).select("query_id", "neighbor_id")
    approx = hamming_rerank_topk(
        emb, queries, vec_col="embedding", id_col="vec_id",
        query_id_col="vec_id", k=5, shortlist=50, dim=EMB_DIM,
    ).select("query_id", "neighbor_id")
    hits = (
        brute.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        brute.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0))
            .cast("bigint")
            .alias("n_hits"),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(5.0)
            ).alias("recall_at_5"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# Jaro–Winkler blocked linkage over part names — the edit-distance
# family member levenshtein_blocked_parts doesn't cover (prefix
# boost + transposition tolerance, the name-matching standard).
# Candidates are blocked on (2-char prefix, |len diff| <= 2); the
# kernel (operators/linkage.py::jaro_winkler) is bit-exact with
# DuckDB's builtin, so raw doubles hash-match.
@query(
    "jaro_winkler_parts",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           jaro_winkler_similarity(a.p_name, b.p_name) AS jw
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND substr(a.p_name, 1, 2) = substr(b.p_name, 1, 2)
     AND abs(length(a.p_name) - length(b.p_name)) <= 2
    WHERE jaro_winkler_similarity(a.p_name, b.p_name) >= 0.85
    ORDER BY name_a, name_b
    """,
)
def jaro_winkler_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.linkage import jaro_winkler_pairs_blocked

    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    return (
        jaro_winkler_pairs_blocked(
            names, text_col="p_name", id_col="p_name", threshold=0.85
        )
        .select(
            F.col("id_a").alias("name_a"),
            F.col("id_b").alias("name_b"),
            "jw",
        )
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# Adjusted Rand Index (Hubert & Arabie 1985, public) between the
# ground-truth labels and the deterministic IVF cell assignment —
# external clustering evaluation, the ANN-index counterpart of the
# recall gates. Everything is pair-count arithmetic: the contingency
# table, its row/column sums, and the C(n,2) terms are exact
# BIGINT/DECIMAL; ARI combines four scalars in one fixed double
# expression. Scale shape: assignment is the broadcast-centroid
# map-only pass; the contingency is one (label, cell) groupBy.
@query(
    "ari_label_vs_cell_embeddings",
    oracle=f"""
    WITH cents AS (
        SELECT vec_id AS cid, embedding AS cv
        FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    assigned AS (
        SELECT vec_id, label, cid FROM (
            SELECT e.vec_id, e.label, c.cid,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY {_sql_cosine('e.embedding', 'c.cv')} DESC,
                                c.cid
                   ) AS crank
            FROM embeddings e CROSS JOIN cents c
        ) t WHERE crank <= 1
    ),
    cont AS (
        SELECT label, cid, CAST(COUNT(*) AS BIGINT) AS nij
        FROM assigned GROUP BY label, cid
    ),
    sums AS (
        SELECT
            CAST(SUM(nij) AS BIGINT) AS n,
            CAST(SUM(nij * (nij - 1) / 2) AS BIGINT) AS sij
        FROM cont
    ),
    rows_ AS (
        SELECT CAST(SUM(a * (a - 1) / 2) AS BIGINT) AS sa FROM (
            SELECT SUM(nij) AS a FROM cont GROUP BY label
        )
    ),
    cols_ AS (
        SELECT CAST(SUM(b * (b - 1) / 2) AS BIGINT) AS sb FROM (
            SELECT SUM(nij) AS b FROM cont GROUP BY cid
        )
    )
    SELECT s.n, s.sij, r.sa, c.sb,
           (CAST(s.sij AS DOUBLE)
              - CAST(r.sa AS DOUBLE) * CAST(c.sb AS DOUBLE)
                / (CAST(s.n AS DOUBLE) * CAST(s.n - 1 AS DOUBLE) / 2.0))
           / ((CAST(r.sa AS DOUBLE) + CAST(c.sb AS DOUBLE)) / 2.0
              - CAST(r.sa AS DOUBLE) * CAST(c.sb AS DOUBLE)
                / (CAST(s.n AS DOUBLE) * CAST(s.n - 1 AS DOUBLE) / 2.0))
               AS ari
    FROM sums s, rows_ r, cols_ c
    """,
)
def ari_label_vs_cell_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..functions.vectors import cosine

    emb = _t(spark, sf_dir, "embeddings")
    cents = (
        emb.orderBy("vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("__csim"), F.asc("cid"))
    from ..functions.vectors import dot, norm

    assigned = (
        emb.withColumn("__vn", norm(F.col("embedding")))
        .crossJoin(F.broadcast(cents.withColumn("__cn", norm(F.col("cv")))))
        .withColumn(
            "__csim",
            dot(F.col("embedding"), F.col("cv")) / (F.col("__vn") * F.col("__cn")),
        )
        .withColumn("__crank", F.row_number().over(w))
        .filter(F.col("__crank") <= 1)
        .select("vec_id", "label", "cid")
    )
    cont = assigned.groupBy("label", "cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("nij")
    )
    sums = cont.agg(
        F.sum("nij").cast("bigint").alias("n"),
        F.sum(F.col("nij") * (F.col("nij") - 1) / 2).cast("bigint").alias("sij"),
    )
    sa = (
        cont.groupBy("label")
        .agg(F.sum("nij").alias("a"))
        .agg(F.sum(F.col("a") * (F.col("a") - 1) / 2).cast("bigint").alias("sa"))
    )
    sb = (
        cont.groupBy("cid")
        .agg(F.sum("nij").alias("b"))
        .agg(F.sum(F.col("b") * (F.col("b") - 1) / 2).cast("bigint").alias("sb"))
    )
    j = sums.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    nd = F.col("n").cast("double")
    c2 = nd * (F.col("n") - 1).cast("double") / F.lit(2.0)
    exp = F.col("sa").cast("double") * F.col("sb").cast("double") / c2
    ari = (F.col("sij").cast("double") - exp) / (
        (F.col("sa").cast("double") + F.col("sb").cast("double")) / F.lit(2.0)
        - exp
    )
    return j.select("n", "sij", "sa", "sb", ari.alias("ari"))


# ---------------------------------------------------------------------------
# Blocking quality evaluation (r8): pairwise precision/recall/F1 of
# the sorted-neighborhood CANDIDATE GENERATOR against the exact
# levenshtein≤2 truth pairs — the dedup counterpart of the ANN
# recall gates (a blocking scheme that misses true matches silently
# poisons every downstream linkage). Truth and candidates are both
# deterministic, so the whole evaluation is oracle-replayable:
# integer pair counts, three final divisions. Scale shape: candidate
# pairs come from the O(n·w) bucketed rank join; the truth side here
# is the length-blocked exact join (an EVAL over the bounded
# distinct-name domain, not a production path).
@query(
    "blocking_pr_eval_parts",
    oracle="""
    WITH names AS (SELECT DISTINCT p_name FROM part),
    truth AS (
        SELECT a.p_name AS name_a, b.p_name AS name_b
        FROM names a JOIN names b
          ON a.p_name < b.p_name
         AND abs(length(a.p_name) - length(b.p_name)) <= 2
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    ),
    ranked AS (
        SELECT p_name,
               ROW_NUMBER() OVER (ORDER BY p_name) AS rank,
               CAST((ROW_NUMBER() OVER (ORDER BY p_name)) // 3 AS BIGINT)
                   AS bkt
        FROM names
    ),
    cand AS (
        SELECT LEAST(a.p_name, b.p_name) AS name_a,
               GREATEST(a.p_name, b.p_name) AS name_b
        FROM ranked a JOIN ranked b
          ON b.bkt IN (a.bkt, a.bkt + 1)
         AND b.rank > a.rank AND b.rank - a.rank <= 3
        GROUP BY 1, 2
    ),
    s AS (
        SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_truth,
            (SELECT CAST(COUNT(*) AS BIGINT)
             FROM cand JOIN truth USING (name_a, name_b)) AS n_hit
    )
    SELECT n_candidates, n_truth, n_hit,
           CAST(n_hit AS DOUBLE) / CAST(n_candidates AS DOUBLE)
               AS precision,
           CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall,
           2.0 * CAST(n_hit AS DOUBLE)
             / (CAST(n_candidates AS DOUBLE) + CAST(n_truth AS DOUBLE))
               AS f1
    FROM s
    """,
)
def blocking_pr_eval_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.linkage import sorted_neighborhood_pairs

    names = _t(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("na"), F.length("p_name").alias("la"))
    b = names.select(F.col("p_name").alias("nb"), F.length("p_name").alias("lb"))
    truth = (
        a.join(
            b,
            (F.col("na") < F.col("nb"))
            & (F.abs(F.col("la") - F.col("lb")) <= 2),
        )
        .filter(F.levenshtein("na", "nb") <= 2)
        .select(F.col("na").alias("name_a"), F.col("nb").alias("name_b"))
    )
    cand = sorted_neighborhood_pairs(
        names,
        sort_cols=["p_name"],
        block=F.lit(0),
        id_col="p_name",
        window=3,
    ).select(
        F.least("id_a", "id_b").alias("name_a"),
        F.greatest("id_a", "id_b").alias("name_b"),
    ).distinct()
    n_c = cand.count()
    n_t = truth.count()
    n_h = cand.join(truth, ["name_a", "name_b"]).count()
    return spark.createDataFrame(
        [(n_c, n_t, n_h)], "n_candidates long, n_truth long, n_hit long"
    ).select(
        "n_candidates",
        "n_truth",
        "n_hit",
        (F.col("n_hit").cast("double") / F.col("n_candidates").cast("double"))
        .alias("precision"),
        (F.col("n_hit").cast("double") / F.col("n_truth").cast("double"))
        .alias("recall"),
        (
            2.0
            * F.col("n_hit").cast("double")
            / (
                F.col("n_candidates").cast("double")
                + F.col("n_truth").cast("double")
            )
        ).alias("f1"),
    )
