"""Driver-contract meta-tests: the __spark_entry__ surface the round
driver consumes must stay well-formed — every oracle must at least
PLAN on DuckDB against the fixture schema (a typo'd oracle otherwise
surfaces as a red driver row a day later), and the registries must
stay consistent."""

from __future__ import annotations

import re

import duckdb
import pytest

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


def test_every_oracle_plans_on_duckdb(con):
    from lakehouse_poc_spark import plans

    failures = []
    for name, sql in plans.ORACLES.items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as exc:  # noqa: BLE001 - report all at once
            failures.append((name, str(exc).splitlines()[0]))
    assert not failures, failures


def test_registries_consistent():
    from lakehouse_poc_spark import plans

    assert set(plans.ORACLES) <= set(plans.QUERIES)
    for name in plans.QUERIES:
        assert re.fullmatch(r"[a-z0-9_]+", name), name


def test_entry_module_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert callable(e.entry)
    assert set(os_) <= set(qs)
    assert len(qs) >= 150  # the declared surface doesn't silently shrink
