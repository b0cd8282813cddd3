"""DSIR-style data selection: hashed-n-gram importance weights.

Data Selection with Importance Resampling (Xie et al. 2023, public
paper): score every raw document by how much more likely its content
is under a TARGET domain's bag-of-hashed-n-grams unigram model than
under the RAW corpus's model — ``log p_target(x) − log p_raw(x)``,
summed over the document's hashed features. Documents with the
highest weights are the ones that look most like the target domain;
sampling by these weights shifts a 100 TB web crawl toward a small
high-quality target (the published use: selecting Pile-like data for
LM pretraining).

Spark-first shape: one explode to (doc, bucket) feature instances,
ONE pass over the feature relation computing both models' bucket
counts simultaneously (conditional aggregation — not two scans), a
broadcast join of the B-bucket log-ratio table back onto the feature
instances, and a per-doc BIGINT sum. B is fixed (default 1024), so
the model table is always broadcastable no matter the corpus size —
the corpus shuffles exactly twice (bucket agg, doc agg), never by
pair.

Determinism: bucket assignment is md5-based (engine-portable); the
log-ratio is micro-rounded to BIGINT once per bucket (the repo's
bigram-LM idiom), so per-doc sums are exact integer arithmetic and
hash-match the DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DSIR_SALT = "dsir:"


def hashed_bucket(token: Column, n_buckets: int) -> Column:
    """Engine-portable feature hash: first 6 md5 nibbles mod B."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(DSIR_SALT), token)), 1, 6), 16, 10
        ).cast("bigint")
        % n_buckets
    )


def dsir_importance(
    df: DataFrame,
    text_col: str,
    id_col: str,
    is_target: Column,
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, n_tokens, importance_micro): per-document DSIR importance
    weight in micro-nats (BIGINT), higher = more target-like.

    ``is_target`` marks the target-domain rows inside ``df`` (the
    published recipe scores the raw pool against a curated target
    subset; both live in the same relation here). Add-1 smoothing
    over the B buckets on both models keeps every bucket finite.
    """
    feats = df.select(
        F.col(id_col),
        is_target.cast("int").alias("_t"),
        F.explode(F.split(F.col(text_col), " ")).alias("_tok"),
    ).select(
        id_col, "_t", hashed_bucket(F.col("_tok"), n_buckets).alias("bucket")
    )
    # one pass, both models: target counts and raw(=all) counts
    counts = feats.groupBy("bucket").agg(
        F.sum("_t").alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    ratio = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    F.log(
                        (F.col("ct").cast("double") + F.lit(1.0))
                        / (F.col("nt").cast("double") + F.lit(float(n_buckets)))
                    )
                    - F.log(
                        (F.col("cr").cast("double") + F.lit(1.0))
                        / (F.col("nr").cast("double") + F.lit(float(n_buckets)))
                    )
                )
                * F.lit(1_000_000.0)
            )
            .cast("bigint")
            .alias("logratio_micro"),
        )
    )
    return (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("logratio_micro").alias("importance_micro"),
        )
        .orderBy(id_col)
    )
