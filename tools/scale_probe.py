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

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from lakehouse_poc_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    with_brute = "--with-brute" in sys.argv
    spark = get_spark("scale_probe")
    docs = read_parquet_table(spark, sf_dir, "documents")
    spark.range(1).count()

    for factor in (1, 2, 4):
        corpus = scaled_corpus(docs, factor).persist()
        n = corpus.count()
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
        }
        if with_brute and factor <= 2:  # O(n²): 20k docs = 200M pairs, skip
            ops["brute_jaccard"] = lambda c: ngram_jaccard_pairs(c, "text", "doc_id")
        for name, fn in ops.items():
            t0 = time.perf_counter()
            pairs = fn(corpus).count()
            dt = time.perf_counter() - t0
            print(
                f"{name:14s} docs={n:7d} pairs={pairs:7d} wall={dt:7.2f}s",
                flush=True,
            )
        corpus.unpersist()


if __name__ == "__main__":
    main()
