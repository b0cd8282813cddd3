"""Market-basket frequent-pair mining: the A-Priori pair pass
(Agrawal & Srikant 1994, public) with confidence/lift scoring.

The full A-Priori lattice is rarely what a lakehouse needs; the
2-itemset pass — "which items co-occur in baskets more than minsup
times, and how surprising is that?" — is the workhorse
(recommendations, assortment planning, co-retrieval audits on
training corpora where a basket is a context window's sources).

Scale shape (billions of baskets, 1000 executors):
- the basket relation (basket_id, item) shuffles ONCE to dedupe;
- the A-Priori prune runs BEFORE the pair join: only items with
  support ≥ minsup survive (support is monotone — an infrequent item
  cannot appear in a frequent pair), so the self-join's input is the
  pruned relation;
- pair expansion is per-basket (equi-join on basket_id), bounded by
  basket size B → O(B²) rows per basket, never corpus-quadratic.
  A pathological mega-basket (one basket = half the catalog) is the
  skew hazard: ``max_basket`` drops baskets above the cap with the
  standard argument that a basket containing everything carries no
  association signal;
- supports are map-side-combined counts; confidence/lift are
  per-pair scalar arithmetic on the counts, divided in a fixed order
  so doubles are engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _basket_relation(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket: int | None,
) -> DataFrame:
    """Deduped (__bk, __it) basket relation with the optional
    mega-basket cap — the shared input prep of the pair and triple
    passes."""
    b = baskets.select(
        F.col(basket_col).alias("__bk"), F.col(item_col).alias("__it")
    ).distinct()
    if max_basket is not None:
        sizes = b.groupBy("__bk").agg(F.count(F.lit(1)).alias("__sz"))
        b = b.join(
            sizes.filter(F.col("__sz") <= max_basket).select("__bk"), "__bk"
        )
    return b


def frequent_pairs(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    minsup: int = 2,
    max_basket: int | None = None,
    _relation: DataFrame | None = None,
) -> DataFrame:
    """Frequent item pairs with support, confidence and lift.

    Returns (item_a, item_b, pair_cnt, supp_a, supp_b, confidence,
    lift) with item_a < item_b, pair_cnt ≥ ``minsup``:
    confidence = pair_cnt / supp_a (P(b | a)),
    lift = pair_cnt · n_baskets / (supp_a · supp_b).
    """
    # ``_relation``: a prebuilt (__bk, __it) relation — the triple pass
    # shares ONE deduped basket relation across both passes instead of
    # re-shuffling the corpus-sized distinct twice (r10 optimization)
    b = (
        _relation
        if _relation is not None
        else _basket_relation(baskets, basket_col, item_col, max_basket)
    ).persist()
    try:
        n_baskets = b.select("__bk").distinct().count()
        supp = (
            b.groupBy("__it")
            .agg(F.count(F.lit(1)).cast("bigint").alias("__supp"))
            .filter(F.col("__supp") >= minsup)
        )
        pruned = b.join(
            F.broadcast(supp.select("__it")), "__it"
        ).select("__bk", "__it")
        pa = pruned.select(F.col("__bk"), F.col("__it").alias("item_a"))
        pb = pruned.select(F.col("__bk"), F.col("__it").alias("item_b"))
        pairs = (
            pa.join(pb, "__bk")
            .filter(F.col("item_a") < F.col("item_b"))
            .groupBy("item_a", "item_b")
            .agg(F.count(F.lit(1)).cast("bigint").alias("pair_cnt"))
            .filter(F.col("pair_cnt") >= minsup)
        )
        sa = supp.select(
            F.col("__it").alias("item_a"), F.col("__supp").alias("supp_a")
        )
        sb = supp.select(
            F.col("__it").alias("item_b"), F.col("__supp").alias("supp_b")
        )
        out = (
            pairs.join(F.broadcast(sa), "item_a")
            .join(F.broadcast(sb), "item_b")
            .select(
                "item_a",
                "item_b",
                "pair_cnt",
                "supp_a",
                "supp_b",
                (
                    F.col("pair_cnt").cast("double")
                    / F.col("supp_a").cast("double")
                ).alias("confidence"),
                (
                    F.col("pair_cnt").cast("double")
                    * F.lit(float(n_baskets))
                    / (
                        F.col("supp_a").cast("double")
                        * F.col("supp_b").cast("double")
                    )
                ).alias("lift"),
            )
        )
        # materialize before unpersist: callers get a frame whose
        # lineage no longer depends on the cached basket relation
        return out.localCheckpoint(eager=True)
    finally:
        b.unpersist()


def frequent_triples(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    minsup: int = 2,
    max_basket: int | None = None,
) -> DataFrame:
    """The A-Priori 3-itemset pass: candidate triples are generated
    FROM the frequent pairs (every 2-subset of a frequent triple must
    be frequent — the downward-closure property that makes A-Priori
    A-Priori), then counted against the baskets. Returns
    (item_a, item_b, item_c, triple_cnt) with item_a < item_b <
    item_c and triple_cnt ≥ ``minsup``.

    Scale shape: the per-basket triple enumeration is L2-pruned AT
    EVERY JOIN STEP — the (basket, a, b) intermediate is semi-joined
    on the frequent-pair set before the third item joins, so the
    worst-case intermediate is (baskets × frequent-pairs-per-basket),
    never basket-size³. The frequent-pair relation is minsup-pruned
    and broadcast-eligible."""
    b = _basket_relation(
        baskets, basket_col, item_col, max_basket
    ).localCheckpoint(eager=False)  # materialized by the pair pass's count
    l2 = frequent_pairs(
        baskets, basket_col, item_col, minsup=minsup,
        max_basket=max_basket, _relation=b,
    ).select("item_a", "item_b")
    pa = b.select("__bk", F.col("__it").alias("item_a"))
    pb = b.select("__bk", F.col("__it").alias("item_b"))
    pc = b.select("__bk", F.col("__it").alias("item_c"))
    ab = (
        pa.join(pb, "__bk")
        .filter(F.col("item_a") < F.col("item_b"))
        .join(F.broadcast(l2), ["item_a", "item_b"], "left_semi")
    )
    abc = (
        ab.join(pc, "__bk")
        .filter(F.col("item_b") < F.col("item_c"))
        .join(
            F.broadcast(l2.select(F.col("item_a"), F.col("item_b").alias("item_c"))),
            ["item_a", "item_c"],
            "left_semi",
        )
        .join(
            F.broadcast(
                l2.select(
                    F.col("item_a").alias("item_b"),
                    F.col("item_b").alias("item_c"),
                )
            ),
            ["item_b", "item_c"],
            "left_semi",
        )
    )
    return (
        abc.groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).cast("bigint").alias("triple_cnt"))
        .filter(F.col("triple_cnt") >= minsup)
    )
