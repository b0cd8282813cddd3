"""Null-safe change detection between two aliased row versions.

The reference detects change with null-unsafe ``!=`` plus a partial
null guard (reference notebooks/pipeline_core.py:167-172: ``(l.c !=
r.c) & (l.c.isNotNull() | r.c.isNotNull())`` OR-folded) — which misses
NULL↔value transitions whenever the ``!=`` evaluates to NULL. Per
SURVEY.md §7.0.2 the canonical semantics here is the null-safe
**not-equal**: ``NOT (l.c <=> r.c)`` — a strict superset of the
reference's behavior and deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def any_change(
    left_alias: str, right_alias: str, compare_columns: Sequence[str]
) -> Column:
    """OR-fold of null-safe inequality over the compare columns."""
    conds = [
        ~F.col(f"{left_alias}.{c}").eqNullSafe(F.col(f"{right_alias}.{c}"))
        for c in compare_columns
    ]
    out = conds[0]
    for c in conds[1:]:
        out = out | c
    return out
