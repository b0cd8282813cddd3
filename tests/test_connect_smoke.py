"""Spark Connect smoke: prove the engine runs through a real ``sc://``
session, not just that the code avoids JVM-internal APIs.

The reference's entire execution model is Databricks Connect
(reference notebooks/test.py:4, test_cluster.py:5 — a Connect client
against a remote cluster). This repo is written Connect-safe (no
``_jsparkSession``/``.rdd``; the one ``sparkContext`` touch is
try/except-guarded, session.py); this test EXECUTES that claim:
``SparkSession.builder.remote("local[4]")`` spins up an in-process
local Connect server (Spark 4) and the flagship query + SCD2 pipeline
run through the Connect client protocol end-to-end.

Skips when grpcio is absent — the Connect client's wire dependency,
not installable in this container (installs are prohibited; grpcio
ships in ``pyspark[connect]``). On any environment with it, the test
runs for real. The subprocess isolation is required either way: a
classic session (the shared test fixture) and a Connect session
cannot coexist in one driver process.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest


def _has_grpc() -> bool:
    try:  # pragma: no cover - absent in this container by design
        import grpc  # noqa: F401

        return True
    except ImportError:
        return False


_CONNECT_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.remote("local[4]")
    .appName("connect-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
# prove this is the Connect client, not a classic session
import pyspark.sql.connect.session as cs
assert isinstance(spark, cs.SparkSession), type(spark)

# 1. flagship query through Connect
from lakehouse_poc_spark.plans import QUERIES
rows = QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
assert len(rows) > 0, "q1 returned no rows over Connect"

# 2. SCD2 pipeline through Connect (merge + warehouse round-trip)
import tempfile
from lakehouse_poc_spark.config import PipelineConfig
from lakehouse_poc_spark.sinks.warehouse import Warehouse
from lakehouse_poc_spark.operators.scd2 import scd2_merge

cfg = PipelineConfig(
    name="t", raw_table="raw.t", dim_table="dim.t",
    business_key=("k",), compare_columns=("name", "ort"),
)
with tempfile.TemporaryDirectory() as wh_dir:
    wh = Warehouse(spark, wh_dir)
    batch1 = spark.createDataFrame(
        [(1, "Alpha", "Berlin"), (2, "Beta", "Kiel")], "k long, name string, ort string"
    )
    scd2_merge(wh, cfg, batch1, "2026-01-01 00:00:00")
    batch2 = spark.createDataFrame(
        [(1, "Alpha", "Hamburg"), (3, "Gamma", "Bonn")], "k long, name string, ort string"
    )
    stats = scd2_merge(wh, cfg, batch2, "2026-02-01 00:00:00")
    assert stats.updated_keys == 1 and stats.new_keys == 1, stats
    dim = wh.read("dim.t")
    assert dim.count() == 4  # 3 keys + 1 closed version
    assert dim.filter("is_current").count() == 3
print("CONNECT_SMOKE_OK")
"""


@pytest.mark.skipif(
    not _has_grpc(),
    reason="Spark Connect client requires grpcio (pyspark[connect])",
)
def test_connect_session_runs_q1_and_scd2():  # pragma: no cover - needs grpcio
    repo = str(Path(__file__).resolve().parent.parent)
    script = _CONNECT_SCRIPT.format(repo=repo)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "CONNECT_SMOKE_OK" in proc.stdout
