"""Sessionization: assign gap-based session ids to an event stream.

Batch form of ``session_window``: a new session starts when the gap to
the previous event (per key) exceeds ``gap``. Implemented as the
classic lag→flag→cumulative-sum window pair — two passes over one
shuffle partition-by key, no Python.

Scale: one shuffle on the key; AQE handles skewed users. For the
streaming variant see streaming/windows.py (native session_window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Add a ``session_id`` column (1-based, per key, in time order).

    ``gap`` is in the units of ``ts_col`` cast to long — seconds for a
    timestamp column, or the native unit for an integer column (pass
    microseconds when exact threshold semantics matter). ``tiebreak``
    columns make the ordering total when timestamps can collide (pass
    a unique id).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev_ts = F.lag(ts_col).over(w)
    delta = F.col(ts_col).cast("long") - prev_ts.cast("long")
    new_session = F.when(prev_ts.isNull() | (delta > gap), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize_capped(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    gap: int,
    cap: int,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessions that ALSO split when they exceed ``cap``
    units from the session start — the "no infinite sessions" rule
    every analytics warehouse applies to bot/idle-refresh traffic.

    Split boundaries are anchored at the gap-session's start
    (segments ``[start + k·cap, start + (k+1)·cap)``), the
    deterministic window-expressible variant of the cap rule; the
    order-recursive "reset the clock at each split" variant needs a
    stateful fold (see streaming/stateful.py for that machinery).
    Adds ``session_id`` (the gap session) and ``capped_session_id``
    (1-based, dense per key). Cost: the sessionize windows plus one
    min-over-session and one dense_rank — all on the SAME key
    partitioning, so still one shuffle.
    """
    out = sessionize(df, keys, ts_col, gap, tiebreak)
    w_sess = Window.partitionBy(*keys, "session_id")
    start = F.min(F.col(ts_col).cast("long")).over(w_sess)
    sub = ((F.col(ts_col).cast("long") - start) / F.lit(cap)).cast("long")
    out = out.withColumn("__sub", sub)
    w_key = Window.partitionBy(*keys).orderBy("session_id", "__sub")
    return out.withColumn(
        "capped_session_id", F.dense_rank().over(w_key)
    ).drop("__sub")
