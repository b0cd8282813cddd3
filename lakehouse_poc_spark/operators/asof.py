"""As-of join (backward): for each left row, the latest right row at or
before (strictly before, with ``strict=True``) the left timestamp, per key.

Spark has no native as-of join. The naive formulations either explode
(inequality join → O(n·m) per key) or serialize (``merge_asof`` per
group in pandas). This implementation is the scalable union-scan
pattern used by streaming engines:

1. tag right rows, union with left rows on aligned columns;
2. one shuffle: partition by key, order by (time, right-first);
3. carry the right payload forward with ``last(..., ignorenulls=True)``
   over an unbounded-preceding frame;
4. keep only left rows.

Cost: ONE shuffle of |L|+|R| rows, no join explosion, no Python. At
100 TB this is shuffle-bound and skew-safe via AQE (a hot key still
serializes within its partition — salt upstream if a single key
exceeds one executor's partition budget).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by_left: Sequence[str],
    by_right: Sequence[str],
    right_payload: Sequence[str] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: left enriched with the most recent right row
    where ``right_on <= left_on`` (``<`` if ``strict``) and the ``by``
    keys match. Right payload columns come back NULL when no match.

    Right rows with duplicate (key, time) should be pre-deduplicated by
    the caller (e.g. :func:`...dedup_latest.dedup_latest`) — otherwise
    the carried row among ties is the last in an engine-chosen order.
    """
    payload = list(right_payload) if right_payload is not None else [
        c for c in right.columns if c not in set(by_right) | {right_on}
    ]
    key = [F.col(c).alias(f"__k{i}") for i, c in enumerate(by_left)]
    rkey = [F.col(c).alias(f"__k{i}") for i, c in enumerate(by_right)]

    # Right side at same timestamp sorts before/after left depending on
    # strictness: inclusive → right first (visible to left at equal t);
    # strict → right last (a right row at exactly t falls outside the
    # unbounded-preceding..current frame of every left row at t).
    r_side, l_side = (1, 0) if strict else (0, 1)
    r = right.select(
        *rkey,
        F.col(right_on).alias("__t"),
        F.lit(r_side).alias("__side"),
        F.struct(*[F.col(c) for c in payload]).alias("__payload"),
    )
    lft = left.select(
        "*",
        *key,
        F.col(left_on).alias("__t"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
    )
    r_aligned = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *[F.col(f"__k{i}") for i in range(len(by_left))],
        "__t",
        "__side",
        "__payload",
    )
    unioned = lft.unionByName(r_aligned)

    kcols = [f"__k{i}" for i in range(len(by_left))]
    order = [F.col("__t").asc(), F.col("__side").asc()]
    w = (
        Window.partitionBy(*kcols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == l_side).select(
        *left.columns, *[F.col(f"__match.{c}").alias(c) for c in payload]
    )
    return out
