"""Shuffle-budget regression canaries: each anchor query has a pinned
MAXIMUM number of Exchange operators in its executed plan and, where
the scale story depends on it, a pinned maximum shuffle row count. A
refactor that silently adds a shuffle (lost broadcast, lost partial
agg, an accidental distinct) fails here long before it shows up as a
wall-time regression at 100 TB. Budgets are upper bounds with slack 0
— they encode the plan shape SCALE.md §2 claims, measured by
tools/shuffle_audit.py."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from shuffle_audit import exchange_metrics  # noqa: E402

from lakehouse_poc_spark.plans import QUERIES  # noqa: E402

SF = "/root/testdata/sf0.001"

# (query, max exchanges, max shuffled rows at sf0.001 or None)
BUDGETS = [
    # partial-agg proof: 6 output groups, rows shuffled = groups
    ("q1_pricing_summary", 2, 50),
    # scan + single final agg
    ("q6_forecast_revenue", 1, 10),
    # banding shuffles candidates only
    ("minhash_lsh_pairs_docs", 1, 200),
    # expression-only text family: one final orderBy exchange
    ("text_quality_scores", 1, 1000),
    # map-only rule set + orderBy
    ("gopher_quality_flags", 1, 1000),
    # funnel is ONE conditional-agg row + free unpivot
    ("filter_funnel_docs", 1, 5),
    # zero-shuffle chunking (explode over the scan, then orderBy)
    ("chunk_documents_windows", 1, None),
    # passage dedup: window key shuffle + per-doc agg (+AQE reads)
    ("passage_dedup_docs", 3, None),
    # DSIR: bucket agg + doc agg; model table must stay broadcast
    ("dsir_importance_docs", 5, None),
]


@pytest.mark.parametrize("name,max_ex,max_rows", BUDGETS)
def test_shuffle_budget(spark, name, max_ex, max_rows):
    df = QUERIES[name](spark, SF)
    df.collect()
    exes = exchange_metrics(df._jdf.queryExecution().executedPlan())
    n = len(exes)
    rows = sum(e["records"] for e in exes)
    assert n <= max_ex, (
        f"{name}: {n} exchanges (budget {max_ex}) — a shuffle crept in"
    )
    if max_rows is not None:
        assert rows <= max_rows, (
            f"{name}: {rows} shuffled rows (budget {max_rows}) — "
            "partial aggregation or candidate pruning regressed"
        )
