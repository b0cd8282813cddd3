"""Property tests for the r8 closing-wave kernels: randomized inputs
pin the pure-Python/driver-side halves against independent ground
truths (the fixed-fixture parity tests cover the Spark plans; these
cover the kernels' full input space)."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lakehouse_poc_spark.operators.linkage import jaro_winkler

# ---------------------------------------------------------------------------
# Jaro–Winkler kernel ≡ DuckDB's builtin on arbitrary ASCII strings
# (the bit-exact identity the differential oracle relies on).

_text = st.text(
    alphabet=st.sampled_from("abcdefgh XYZ0189.-"), min_size=0, max_size=30
)


@settings(max_examples=300, deadline=None)
@given(a=_text, b=_text)
def test_jaro_winkler_kernel_equals_duckdb(a: str, b: str):
    con = duckdb.connect()
    d = con.execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]
    ).fetchone()[0]
    assert jaro_winkler(a, b) == d


@settings(max_examples=200, deadline=None)
@given(a=_text, b=_text)
def test_jaro_winkler_axioms(a: str, b: str):
    s = jaro_winkler(a, b)
    assert 0.0 <= s <= 1.0
    assert jaro_winkler(b, a) == s  # symmetry
    if a and a == b:
        assert s == 1.0


# ---------------------------------------------------------------------------
# Driver union-find (connected_components_star fast path) ≡ a naive
# reachability closure on random graphs — and ≡ the distributed star
# loop on a sampled subset (the loop costs seconds per example, so it
# runs on a handful, not all).

_edges_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)),
    min_size=1,
    max_size=60,
)


def _naive_components(edges):
    adj: dict = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    comp = {}
    for start in adj:
        if start in comp:
            continue
        seen = {start}
        stack = [start]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        m = min(seen)
        for x in seen:
            comp[x] = m
    return comp


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=_edges_strategy)
def test_union_find_cc_matches_naive_closure(spark, edges):
    from lakehouse_poc_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components_star(df).collect()
    }
    assert got == _naive_components(edges)


# ---------------------------------------------------------------------------
# Isotonic minimax identity ≡ sequential weighted PAVA on random bins
# (pure-Python twin of the query's formulation — the identity is the
# mathematical claim the oracle encodes).


def _minimax_fit(ys, ws):
    n = len(ys)
    pre_y = [0.0] * (n + 1)
    pre_w = [0] * (n + 1)
    for i, (y, w) in enumerate(zip(ys, ws)):
        pre_y[i + 1] = pre_y[i] + y * w
        pre_w[i + 1] = pre_w[i] + w
    out = []
    for i in range(n):
        best = -math.inf
        for j in range(i + 1):
            m = math.inf
            for k in range(i, n):
                avg = (pre_y[k + 1] - pre_y[j]) / (pre_w[k + 1] - pre_w[j])
                m = min(m, avg)
            best = max(best, m)
        out.append(best)
    return out


def _pava(ys, ws):
    stack = []  # [mean, pooled weight]
    for y, w in zip(ys, ws):
        stack.append([float(y), w])
        while len(stack) > 1 and stack[-2][0] >= stack[-1][0]:
            m2, w2 = stack.pop()
            m1, w1 = stack.pop()
            stack.append([(m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2])
    # expand pools back to one fitted value per ORIGINAL bin
    out = []
    idx = 0
    for m, w in stack:
        consumed = 0
        while consumed < w:
            consumed += ws[idx]
            idx += 1
            out.append(m)
    return out


@settings(max_examples=200, deadline=None)
@given(
    data=st.lists(
        st.tuples(st.integers(0, 20), st.integers(1, 5)),
        min_size=1,
        max_size=12,
    )
)
def test_isotonic_minimax_equals_pava(data):
    ys = [y for y, _ in data]
    ws = [w for _, w in data]
    mm = _minimax_fit(ys, ws)
    pv = _pava(ys, ws)
    assert len(mm) == len(pv)
    for a, b in zip(mm, pv):
        assert a == pytest.approx(b, abs=1e-9)
    # monotone non-decreasing
    assert all(a <= b + 1e-12 for a, b in zip(mm, mm[1:]))


def test_dtw_fold_matches_brute_dp(spark):
    """The nested-aggregate DTW expression equals the textbook O(n²)
    DP on random integer profiles (plans/seqops.py)."""
    import random

    from lakehouse_poc_spark.plans.seqops import _DTW_EXPR

    rng = random.Random(87)
    rows = [
        (
            i,
            [rng.randrange(0, 50) for _ in range(24)],
            [rng.randrange(0, 50) for _ in range(24)],
        )
        for i in range(20)
    ]

    def brute(x, y):
        inf = float("inf")
        d = [[inf] * 25 for _ in range(25)]
        d[0][0] = 0
        for i in range(1, 25):
            for j in range(1, 25):
                c = abs(x[i - 1] - y[j - 1])
                d[i][j] = c + min(d[i - 1][j], d[i][j - 1], d[i - 1][j - 1])
        return d[24][24]

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "id int, x array<bigint>, y array<bigint>"
    )
    got = {
        r["id"]: r["dtw"]
        for r in df.select(
            "id", F.expr(_DTW_EXPR).cast("bigint").alias("dtw")
        ).collect()
    }
    for i, x, y in rows:
        assert got[i] == brute(x, y), f"row {i}"


# ---------------------------------------------------------------------------
# r10 ADVICE fix: the recursive reachability/SCC closure must cover
# graphs of diameter > 5 (the old literal hop cap silently split
# SCCs). A 7-type directed ring has diameter 6 and is ONE scc.


def test_recursive_closure_covers_diameter_beyond_five(spark):
    from lakehouse_poc_spark.plans.eventops import _REACH_SQL, _SCC_SQL

    types = ["t0", "t1", "t2", "t3", "t4", "t5", "t6"]
    # one user walks the ring twice: edges t0→t1→…→t6→t0
    rows = [
        (1, i, f"2024-01-01 00:00:{i:02d}", types[i % 7], 1.0)
        for i in range(15)
    ]
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts string, "
        "event_type string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp")).createOrReplaceTempView(
        "events"
    )
    reach = {
        (r.src_type, r.dst_type): r.min_hops
        for r in spark.sql(_REACH_SQL).collect()
    }
    assert reach[("t0", "t6")] == 6  # needs depth 6 — old cap missed it
    assert reach[("t0", "t0")] == 7  # full-ring cycle
    assert len(reach) == 49  # every ordered pair incl. self
    scc = spark.sql(_SCC_SQL).collect()
    assert {r.scc_id for r in scc} == {"t0"} and all(
        r.scc_size == 7 for r in scc
    )
