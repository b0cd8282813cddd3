"""As-of join: for each left row, the right row at-or-before
(``backward``), at-or-after (``forward``), or closest in time
(``nearest``) per key; ``strict=True`` excludes equal timestamps.

Spark has no native as-of join. The naive formulations either explode
(inequality join → O(n·m) per key) or serialize (``merge_asof`` per
group in pandas). This implementation is the scalable union-scan
pattern used by streaming engines:

1. tag right rows, union with left rows on aligned columns;
2. one shuffle: partition by key, order by (time, tie-break side);
3. carry the right payload across with ``last/first(...,
   ignorenulls=True)`` over a one-sided frame;
4. keep only left rows.

``nearest`` unions the right side TWICE (a backward-visible and a
forward-visible copy with opposite tie-break markers), evaluates both
one-sided frames over the SAME sort (still one shuffle, one sort), and
picks the closer match (ties → backward, matching pandas
``merge_asof(direction='nearest')``).

Cost: ONE shuffle of |L|+|R| rows (|L|+2|R| for nearest), no join
explosion, no Python. At 100 TB this is shuffle-bound and skew-safe via
AQE (a hot key still serializes within its partition — salt upstream if
a single key exceeds one executor's partition budget).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DIRECTIONS = ("backward", "forward", "nearest")


def _epoch(col: Column, dtype: T.DataType) -> Column:
    """Numeric image of a time-ish column for distance comparison."""
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.unix_micros(col.cast("timestamp"))
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by_left: Sequence[str],
    by_right: Sequence[str],
    right_payload: Sequence[str] | None = None,
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """Left enriched with the as-of matching right row's payload columns
    (NULL when no match).

    - ``backward``: most recent right row with ``right_on <= left_on``
      (``<`` if ``strict``);
    - ``forward``: earliest right row with ``right_on >= left_on``
      (``>`` if ``strict``);
    - ``nearest``: whichever of the two is closer in time; equidistant
      ties resolve backward (pandas ``merge_asof`` semantics).

    Right rows with duplicate (key, time) should be pre-deduplicated by
    the caller (e.g. :func:`...dedup_latest.dedup_latest`) — otherwise
    the carried row among ties is the last in an engine-chosen order.
    """
    if direction not in DIRECTIONS:
        raise ValueError(f"direction must be one of {DIRECTIONS}, got {direction!r}")
    payload = list(right_payload) if right_payload is not None else [
        c for c in right.columns if c not in set(by_right) | {right_on}
    ]
    key = [F.col(c).alias(f"__k{i}") for i, c in enumerate(by_left)]
    rkey = [F.col(c).alias(f"__k{i}") for i, c in enumerate(by_right)]
    kcols = [f"__k{i}" for i in range(len(by_left))]

    # Tie-break side per (direction, strictness); left is always 0.
    # A right row at EXACTLY the left timestamp is visible iff it sorts
    # on the frame side of the left row: before it for the
    # unbounded-preceding (backward) frame, after it for the
    # unbounded-following (forward) frame. Strict flips the sign.
    back_side = 1 if strict else -1
    fwd_side = -1 if strict else 1

    def right_tagged(side: int, payload_col: str) -> DataFrame:
        return right.select(
            *rkey,
            F.col(right_on).alias("__t"),
            F.lit(side).alias("__side"),
            F.struct(
                *[F.col(c) for c in payload],
                F.col(right_on).alias("__rt"),
            ).alias(payload_col),
        )

    payload_cols = ["__pb", "__pf"] if direction == "nearest" else ["__pb"]
    copies = []
    if direction in ("backward", "nearest"):
        copies.append(right_tagged(back_side, "__pb"))
    if direction in ("forward", "nearest"):
        copies.append(right_tagged(fwd_side, "__pf" if direction == "nearest" else "__pb"))
    pay_t = copies[0].schema[copies[0].columns[-1]].dataType

    lft = left.select(
        "*",
        *key,
        F.col(left_on).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(pay_t).alias(pc) for pc in payload_cols],
    )
    aligned = []
    for cp in copies:
        have = cp.columns[-1]
        aligned.append(
            cp.select(
                *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
                *kcols,
                "__t",
                "__side",
                *[
                    (F.col(have) if pc == have else F.lit(None).cast(pay_t)).alias(pc)
                    for pc in payload_cols
                ],
            )
        )
    unioned = lft
    for a in aligned:
        unioned = unioned.unionByName(a)

    base = Window.partitionBy(*kcols).orderBy(F.col("__t").asc(), F.col("__side").asc())
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    if direction == "backward":
        match = F.last("__pb", ignorenulls=True).over(w_back)
    elif direction == "forward":
        match = F.first("__pb", ignorenulls=True).over(w_fwd)
    else:
        b = F.last("__pb", ignorenulls=True).over(w_back)
        f = F.first("__pf", ignorenulls=True).over(w_fwd)
        tnum = _epoch(F.col("__t"), left.schema[left_on].dataType)
        rt_t = right.schema[right_on].dataType
        closer_back = (tnum - _epoch(b["__rt"], rt_t)) <= (_epoch(f["__rt"], rt_t) - tnum)
        match = (
            F.when(f.isNull(), b)
            .when(b.isNull(), f)
            .when(closer_back, b)
            .otherwise(f)
        )

    carried = unioned.withColumn("__match", match)
    return carried.filter(F.col("__side") == 0).select(
        *left.columns, *[F.col(f"__match.{c}").alias(c) for c in payload]
    )
