from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lakehouse_poc_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s


@pytest.fixture()
def wh(spark, tmp_path):
    from lakehouse_poc_spark.sinks.warehouse import Warehouse

    return Warehouse(spark, str(tmp_path / "wh"))
