"""Query plans: the engine's declared query surface.

Every query is registered with :func:`query` and gets
- a PySpark implementation ``(spark, sf_dir) -> DataFrame``, and
- (when SQL-expressible) an equivalent ANSI-SQL oracle string for the
  DuckDB differential harness (SURVEY.md §5).

Registration is import-driven: importing this package pulls in every
query module and fills ``QUERIES`` / ``ORACLES``.

Determinism conventions (so Spark and the oracle hash-match):
- Sums of doubles are order-dependent in IEEE float. Every SUM over a
  double expression is computed as ``SUM(CAST(expr AS DECIMAL(30,6)))``
  then cast back to DOUBLE — decimal addition is exact and
  order-independent, so both engines produce bit-identical doubles.
- Averages are ``CAST(SUM(dec) AS DOUBLE) / COUNT``, never decimal
  division (scale rules differ across engines).
- Timestamps in output are cast to dates or formatted strings.
- Every computed column is aliased identically on both sides.
- LIMIT/top-k queries order by a unique key (ties broken by id).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query implementation and (optionally) its SQL oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    from . import (  # noqa: F401
        analytics,
        corpus,
        curation,
        dqops,
        eventops,
        etlops,
        etlops2,
        geoops,
        graphops,
        mlops,
        mlops2,
        multimodal,
        pipelineops,
        searchops,
        seqops,
        simops,
        simops2,
        statops,
        statops2,
        statops3,
        statops4,
        streamops,
        textops,
        tpch,
        tpch2,
        valueops,
    )


_load_all()
