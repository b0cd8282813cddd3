"""Cross-document passage-level deduplication (CCNet/RefinedWeb-style).

Web-scale training corpora repeat PASSAGES across documents —
boilerplate headers, licence blocks, syndicated paragraphs — far more
than they repeat whole documents, so corpus curation pipelines dedup
at passage granularity: every passage keeps its globally-first
occurrence and later occurrences are dropped from their documents
(CCNet does this with paragraph hashes; this is the exact,
order-deterministic form).

Passage boundary: newline-delimited paragraphs when the text has
newlines, else fixed ``block_words``-word blocks (the fixture corpus
is single-line, and fixed blocks are also what you use on
boilerplate-stripped text where paragraph marks are gone). The
first-occurrence rule orders instances by (doc_id, block_id), so the
result is reproducible on any partitioning — no RNG, no
driver-side state.

Scale shape: one shuffle keyed on the passage text to rank
occurrences (a window over the passage groups — the same cost class
as the exact-dedup groupBy), one per-doc re-aggregation to reassemble
the cleaned text. Nothing is quadratic; passages shuffle once each.
At 100 TB you'd hash the passage to a 128-bit fingerprint for the
shuffle key instead of shipping the text — ``fingerprint=True`` does
exactly that (xxhash64 pair), trading oracle-reproducibility for
shuffle bytes.

Extends the reference surface (SURVEY.md §7.1 stage 9 — the
reference has no text operators at all, pipeline_core.py:160,210).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def explode_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_words: int = 20,
) -> DataFrame:
    """(id, block_id, passage): fixed word-block passages, preserving
    block order. Map-only — explode + slice over the scan."""
    toks = F.split(F.col(text_col), " ")
    n_blocks = F.ceil(F.size(toks) / F.lit(block_words)).cast("int")
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_blocks - 1)).alias("block_id", "_i"),
        toks.alias("_toks"),
    ).select(
        id_col,
        F.col("block_id").cast("bigint").alias("block_id"),
        F.array_join(
            F.slice(
                "_toks",
                F.col("block_id").cast("int") * block_words + 1,
                block_words,
            ),
            " ",
        ).alias("passage"),
    )


def dedup_passages(
    df: DataFrame,
    text_col: str,
    id_col: str,
    block_words: int = 20,
    fingerprint: bool = False,
) -> DataFrame:
    """Per-document passage-dedup report: ``(id, n_blocks, n_removed,
    text_clean)`` where ``text_clean`` is the document with every
    passage that already occurred earlier in the corpus (lower
    (doc_id, block_id)) removed, remaining passages re-joined in
    order.

    ``fingerprint=True`` ranks occurrences by a 128-bit xxhash64 pair
    of the passage instead of the passage text — the 100 TB shuffle
    layout (8+8 bytes/key vs the passage bytes); collision odds at
    10^12 passages are ~10^-14 per pair. Default keeps the raw text
    key so the DuckDB oracle can reproduce the exact ranking.
    """
    passages = explode_passages(df, text_col, id_col, block_words)
    if fingerprint:
        key = [
            F.xxhash64(F.lit("pd1:"), F.col("passage")),
            F.xxhash64(F.lit("pd2:"), F.col("passage")),
        ]
    else:
        key = [F.col("passage")]
    w = Window.partitionBy(*key).orderBy(id_col, "block_id")
    ranked = passages.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((F.col("_rn") > 1).cast("bigint")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("_rn") == 1,
                                F.struct("block_id", "passage"),
                            )
                        )
                    ),
                    lambda s: s["passage"],
                ),
                " ",
            ).alias("text_clean"),
        )
        .orderBy(id_col)
    )


def dedup_passages_incremental(
    batch: DataFrame,
    store: DataFrame,
    text_col: str,
    id_col: str,
    block_words: int = 20,
    verify_text: bool = False,
) -> DataFrame:
    """Continuous-ingest passage dedup: clean a NEW batch against the
    historical corpus plus itself. A batch passage is removed iff its
    text appears anywhere in ``store`` (all historical passages rank
    earlier by definition) or earlier within the batch (lower
    (id, block_id)). Returns the per-batch-doc report of
    :func:`dedup_passages` — and because the ordering contract is
    "store precedes batch", cleaning batches in id order reproduces
    the one-shot corpus dedup exactly (the stream==batch argument of
    stream_semdedup).

    Scale shape: the store side reduces to DISTINCT passage
    fingerprints once (at 100 TB you PERSIST that fingerprint relation
    and append each admitted batch's new fingerprints — 16 bytes per
    passage, the dedup_incremental_docs store discipline); the join
    keys are fingerprints, batch-sized on the probe side.

    Fingerprint approximation (default): store membership is decided
    by md5(passage) equality, so the "reproduces the one-shot corpus
    dedup exactly" contract holds up to md5 collisions — a collision
    would remove a non-duplicate batch passage (same declared
    approximation as ``dedup_passages(fingerprint=True)``; the
    within-batch ``_rn`` ranking always compares raw text).
    ``verify_text=True`` removes the approximation: store hits are
    re-verified by joining on (fingerprint, raw passage text), at the
    cost of shipping store passage text through the join instead of
    16-byte fingerprints — use it when the store is small enough or
    collisions are contractually unacceptable.
    """
    b = explode_passages(batch, text_col, id_col, block_words)
    s_exploded = explode_passages(store, text_col, id_col, block_words)
    w = Window.partitionBy("passage").orderBy(id_col, "block_id")
    ranked = b.withColumn("_rn", F.row_number().over(w)).withColumn(
        "fp", F.md5("passage")
    )
    if verify_text:
        s_fp = (
            s_exploded.select(
                F.md5("passage").alias("fp"), F.col("passage").alias("_s_txt")
            )
            .distinct()
        )
        hit = ranked.join(
            s_fp,
            (ranked["fp"] == s_fp["fp"])
            & (ranked["passage"] == s_fp["_s_txt"]),
            "left_semi",
        ).select(id_col, "block_id").withColumn("_in_store", F.lit(True))
    else:
        s_fp = s_exploded.select(F.md5("passage").alias("fp")).distinct()
        hit = ranked.join(s_fp, "fp", "left_semi").select(
            id_col, "block_id"
        ).withColumn("_in_store", F.lit(True))
    flagged = ranked.join(hit, [id_col, "block_id"], "left").select(
        id_col,
        "block_id",
        "passage",
        ((F.col("_rn") > 1) | F.col("_in_store").isNotNull()).alias("_dup"),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum(F.col("_dup").cast("bigint")).alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                ~F.col("_dup"),
                                F.struct("block_id", "passage"),
                            )
                        )
                    ),
                    lambda st: st["passage"],
                ),
                " ",
            ).alias("text_clean"),
        )
        .orderBy(id_col)
    )
