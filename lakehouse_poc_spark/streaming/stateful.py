"""Custom stateful streaming operator via ``applyInPandasWithState``:
running per-key statistics that survive across micro-batches.

This is the escape hatch for stateful semantics the built-in windowed
operators can't express (running counters, custom session logic,
model-ish accumulators). The state store keeps one row per key; each
micro-batch updates the key's state from its Arrow batches and emits
the refreshed snapshot.

Determinism note: the emitted aggregates are restricted to
order-independent ones (count / min / max) so results are identical
for any batch split and comparable to a SQL oracle; an
order-dependent float sum would depend on micro-batch boundaries.

Scale notes: state is hash-partitioned by key across the cluster (one
shuffle per micro-batch on the grouping key); per-key state is O(1)
here. For unbounded key spaces add a ``GroupStateTimeout`` so idle
keys are evicted — the fixture run uses NoTimeout because the run is
bounded.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("min_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, mn, mx = state.get
    else:
        n, mn, mx = 0, None, None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        bmn = float(pdf["value"].min())
        bmx = float(pdf["value"].max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, mn, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "min_value": [mn],
            "max_value": [mx],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, min, max) over the event stream; emits
    the refreshed per-key snapshot each micro-batch the key appears in."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
