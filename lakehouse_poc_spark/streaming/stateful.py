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
    BooleanType,
    DoubleType,
    LongType,
    StringType,
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


# ---------------------------------------------------------------------------
# Order-DEPENDENT stateful operator: streaming EWMA. The docstring
# above restricts the stats operator to order-independent aggregates;
# EWMA is the controlled exception — it is well-defined on a stream
# PRECISELY when micro-batch boundaries respect event-time order
# (batch k holds only events later than batch k-1) and rows fold in
# (ts, event_id) order within each batch. Under that contract the
# cross-batch fold is bit-identical to the batch operator
# (plans/eventops.py ewma_event_values), because Python floats and
# JVM doubles run the same IEEE ops on the same values.

EWMA_STATE = StructType(
    [
        StructField("first_value", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("n_events", LongType()),
    ]
)

EWMA_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("first_value", DoubleType()),
        StructField("ewma", DoubleType()),
    ]
)


def make_ewma_update(lam: float):
    """Build the per-key EWMA state-update function for λ=``lam``
    (the (1−λ) complement is computed once here, exactly as the batch
    operator's ``F.lit(1.0 - lam)``)."""
    one_m = 1.0 - lam

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            first, s, n = state.get
        else:
            first, s, n = None, None, 0
        batch = [pdf for pdf in pdfs if len(pdf)]
        if batch:
            rows = pd.concat(batch).sort_values(["ts", "event_id"])
            for x in rows["value"]:
                x = float(x)
                n += 1
                if s is None:
                    first = s = x
                else:
                    s = lam * s + one_m * x
            state.update((first, s, n))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "first_value": [first],
                "ewma": [s],
            }
        )

    return update


def running_ewma(events: DataFrame, lam: float = 0.9) -> DataFrame:
    """Per-user streaming EWMA; emits the refreshed snapshot each
    micro-batch the key appears in. Caller contract: micro-batches
    must arrive in event-time order (see module note)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_ewma_update(lam),
        outputStructType=EWMA_OUTPUT,
        stateStructType=EWMA_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


INACTIVITY_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)

INACTIVITY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def make_inactivity_update(gap_ms: int):
    """Event-time-timeout churn detector: a key emits exactly when the
    WATERMARK passes its last event time + ``gap_ms`` — the state-store
    timeout mechanic (GroupStateTimeout.EventTimeTimeout) that the
    NoTimeout operators above deliberately avoid. State is removed on
    emission, so an unbounded key space stays bounded by the active
    window — the 100 TB requirement for user-keyed state."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "last_ts_us": [last_us],
                }
            )
            return
        if state.exists:
            n, last_us = state.get
        else:
            n, last_us = 0, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            batch_last = int(pd.Timestamp(pdf["ts"].max()).value // 1_000)
            last_us = max(last_us, batch_last)
        state.update((n, last_us))
        state.setTimeoutTimestamp(last_us // 1_000 + gap_ms)
        yield pd.DataFrame(
            {"user_id": [], "n_events": [], "last_ts_us": []}
        ).astype({"user_id": "int64", "n_events": "int64", "last_ts_us": "int64"})

    return update


def inactive_users(events: DataFrame, gap: str = "1 hour") -> DataFrame:
    """(user_id, n_events, last_ts_us) rows emitted when a user has
    been silent for ``gap`` of EVENT time (watermark-driven). The
    stream must carry a watermark on ``ts``."""
    import re

    m = re.fullmatch(r"(\d+)\s*(second|minute|hour|day)s?", gap.strip())
    if not m:
        raise ValueError(f"unsupported gap spec: {gap!r}")
    unit_ms = {"second": 1_000, "minute": 60_000, "hour": 3_600_000, "day": 86_400_000}
    gap_ms = int(m.group(1)) * unit_ms[m.group(2)]
    return events.groupBy("user_id").applyInPandasWithState(
        make_inactivity_update(gap_ms),
        outputStructType=INACTIVITY_OUTPUT_SCHEMA,
        stateStructType=INACTIVITY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


CUSUM_STATE = StructType(
    [
        StructField("s", DoubleType()),
        StructField("mx", DoubleType()),
        StructField("n", LongType()),
    ]
)

CUSUM_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("cusum_final", DoubleType()),
        StructField("cusum_max", DoubleType()),
        StructField("alarm", BooleanType()),
    ]
)


def make_cusum_update(allow: float, h: float):
    """Per-key one-sided CUSUM (Page 1954, public) state update:
    s ← max(0, s + x − allow), mx ← max(mx, s), alarm when mx > h.
    The float ops replicate the batch operator's expression tree
    (greatest(0, s + x − allow)) literally — IEEE doubles in the same
    order, so stream == batch bit-for-bit."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            s, mx, n = state.get
        else:
            s, mx, n = 0.0, 0.0, 0
        batch = [pdf for pdf in pdfs if len(pdf)]
        if batch:
            rows = pd.concat(batch).sort_values(["ts", "event_id"])
            for x in rows["value"]:
                n += 1
                s = max(0.0, s + float(x) - allow)
                mx = max(mx, s)
            state.update((s, mx, n))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "cusum_final": [s],
                "cusum_max": [mx],
                "alarm": [mx > h],
            }
        )

    return update


def running_cusum(events: DataFrame, allow: float, h: float) -> DataFrame:
    """Per-user streaming CUSUM drift detector; emits the refreshed
    snapshot each micro-batch the key appears in. Caller contract:
    micro-batches arrive in event-time order (see module note)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_cusum_update(allow, h),
        outputStructType=CUSUM_OUTPUT,
        stateStructType=CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEQ_STATE = StructType([StructField("seq", StringType())])

SEQ_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_funnels", LongType()),
        StructField("converted", BooleanType()),
    ]
)


def make_sequence_update(pattern: str):
    """Per-key event-sequence accumulator (MATCH_RECOGNIZE-lite): the
    state is the user's chronological event-initial string; each
    micro-batch appends its (event-time-sorted) initials and the
    snapshot re-scans the sequence with the funnel regex. Python re
    and Spark's Java regex agree for this pattern class (greedy
    leftmost non-overlapping), so stream == batch by the shared
    oracle. Same bounded-per-key-history contract as the EWMA fold."""
    import re

    rx = re.compile(pattern)

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        seq = state.get[0] if state.exists else ""
        batch = [pdf for pdf in pdfs if len(pdf)]
        if batch:
            rows = pd.concat(batch).sort_values(["ts", "event_id"])
            seq += "".join(t[0] for t in rows["event_type"])
            state.update((seq,))
        hits = rx.findall(seq)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [len(seq)],
                "n_funnels": [len(hits)],
                "converted": [len(hits) > 0],
            }
        )

    return update


def running_sequence(events: DataFrame, pattern: str) -> DataFrame:
    """Streaming sequence-pattern matcher; emits the refreshed per-user
    snapshot each micro-batch the key appears in. Caller contract:
    micro-batches arrive in event-time order (see module note)."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_sequence_update(pattern),
        outputStructType=SEQ_OUTPUT,
        stateStructType=SEQ_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Holt-Winters (r7): the order-dependent seasonal fold of
# plans/eventops.holt_winters_event_values carried ACROSS
# micro-batches as per-user state — the "model-ish accumulator" case
# the module docstring anticipates. Contract: micro-batches must
# partition each user's sequence into time-ordered chunks (the
# fixture splits at a day cutoff); within a batch rows are sorted by
# (sec, event_id) before folding. Every update is the SAME IEEE
# double expression as the batch fold and the SQL recursive CTE, so
# the streamed snapshot is bit-identical to the one-shot batch run —
# the stream==batch identity the oracle checks.

_HW_A, _HW_B, _HW_G = 0.5, 0.3, 0.2

HW_STATE_SCHEMA = StructType(
    [
        StructField("t", LongType()),
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("s1", DoubleType()),
        StructField("s2", DoubleType()),
        StructField("s3", DoubleType()),
        StructField("s4", DoubleType()),
    ]
)

HW_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t", LongType()),
        StructField("l", DoubleType()),
        StructField("b", DoubleType()),
        StructField("s1", DoubleType()),
        StructField("s2", DoubleType()),
        StructField("s3", DoubleType()),
        StructField("s4", DoubleType()),
    ]
)


def _hw_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        t, l, b, s1, s2, s3, s4 = state.get
        s = [s1, s2, s3, s4]
    else:
        t, l, b, s = 0, 0.0, 0.0, [0.0, 0.0, 0.0, 0.0]
    # concatenate ALL Arrow chunks of the group BEFORE sorting: the
    # fold is order-dependent, and a user whose batch rows span
    # multiple chunks (> arrow.maxRecordsPerBatch) would otherwise
    # fold chunk-locally in arbitrary chunk order (code-review r7)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        whole = pd.concat(chunks).sort_values(["sec", "event_id"])
        for v in whole["value"]:
            v = float(v)
            k = t % 4
            sp = s[k]
            new_l = _HW_A * (v - sp) + (1.0 - _HW_A) * (l + b)
            new_b = _HW_B * (new_l - l) + (1.0 - _HW_B) * b
            s[k] = _HW_G * (v - new_l) + (1.0 - _HW_G) * sp
            l, b = new_l, new_b
            t += 1
    state.update((t, l, b, s[0], s[1], s[2], s[3]))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "t": [t],
            "l": [l],
            "b": [b],
            "s1": [s[0]],
            "s2": [s[1]],
            "s3": [s[2]],
            "s4": [s[3]],
        }
    )


def running_holt_winters(events: DataFrame) -> DataFrame:
    """Per-user Holt-Winters state surviving across micro-batches;
    emits the refreshed (t, level, trend, seasonals) snapshot each
    batch the user appears in. Input needs (user_id, sec, event_id,
    value) columns."""
    return events.groupBy("user_id").applyInPandasWithState(
        _hw_update,
        outputStructType=HW_OUTPUT_SCHEMA,
        stateStructType=HW_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4's arbitrary-state API — the
# successor surface to applyInPandasWithState): the same running
# per-user stats contract as running_user_stats, expressed as a
# StatefulProcessor with an explicit ValueState handle. Differences
# that matter at scale: typed state handles (Value/List/Map) with
# per-state TTL support, timers decoupled from input rows, and the
# RocksDB state store REQUIRED (state spills to disk instead of
# executor heap — the knob that makes 100 TB keyspaces survivable).
def make_user_stats_processor():
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg", "n long, s long, mn double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, s, mn, mx = 0, 0, None, None
            if self._agg.exists():
                n, s, mn, mx = self._agg.get()
            for pdf in rows:
                vals = pdf["value"]
                n += len(pdf)
                # exact cents: the fixture's values are 2-decimal
                s += int(vals.mul(100).round().astype("int64").sum())
                bmin, bmax = float(vals.min()), float(vals.max())
                mn = bmin if mn is None else min(mn, bmin)
                mx = bmax if mx is None else max(mx, bmax)
            self._agg.update((n, s, mn, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_cents": [s],
                    "min_value": [mn],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return UserStatsProcessor()


def running_user_stats_tws(events: DataFrame) -> DataFrame:
    """running_user_stats on the transformWithState surface. Caller
    must enable the RocksDB state store provider (the API requires
    it); see plans/streamops.py::stream_tws_user_stats."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_user_stats_processor(),
        outputStructType=(
            "user_id long, n_events long, total_cents long, "
            "min_value double, max_value double"
        ),
        outputMode="Update",
        timeMode="None",
    )
