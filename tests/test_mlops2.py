"""Semantic tests for the exact-ML wave (plans/mlops2.py) on crafted
tables — the differential oracle proves Spark≡DuckDB; these prove
both equal the TEXTBOOK definitions on graphs/data with known
answers."""

from __future__ import annotations

import datetime as dt

from lakehouse_poc_spark.plans.mlops2 import (
    betweenness_event_types,
    kmeans_1d_acctbal,
    ridge_two_feature_events,
)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    ).write.parquet(str(path / "events.parquet"))


def test_betweenness_path_graph(spark, tmp_path):
    # one user walks a -> b -> c -> d: directed betweenness is
    # b: (a,c)+(a,d)=2, c: (a,d)+(b,d)=2, endpoints 0.
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(hours=i), 1, s)
        for i, s in enumerate(["a", "b", "c", "d"])
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["node"]: r["betweenness"]
        for r in betweenness_event_types(spark, str(tmp_path)).collect()
    }
    assert out == {"a": 0.0, "b": 2.0, "c": 2.0, "d": 0.0}


def test_betweenness_two_shortest_paths_split_credit(spark, tmp_path):
    # a->b->d and a->c->d (two users): sigma(a,d)=2, each middle node
    # carries 1/2.
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, "a"), (1, t0 + dt.timedelta(hours=1), 1, "b"),
        (2, t0 + dt.timedelta(hours=2), 1, "d"),
        (3, t0, 2, "a"), (4, t0 + dt.timedelta(hours=1), 2, "c"),
        (5, t0 + dt.timedelta(hours=2), 2, "d"),
    ]
    _write_events(spark, tmp_path, rows)
    out = {
        r["node"]: r["betweenness"]
        for r in betweenness_event_types(spark, str(tmp_path)).collect()
    }
    assert out["b"] == 0.5 and out["c"] == 0.5
    assert out["a"] == 0.0 and out["d"] == 0.0


def test_kmeans_1d_separates_two_tight_groups(spark, tmp_path):
    low, high = 10.0, 1000.0
    rows = [(i, f"c{i}", low) for i in range(5)] + [
        (i + 5, f"c{i+5}", high) for i in range(5)
    ]
    spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_acctbal double"
    ).write.parquet(str(tmp_path / "customer.parquet"))
    out = kmeans_1d_acctbal(spark, str(tmp_path)).collect()
    got = {r["cluster"]: r for r in out}
    # only the extreme clusters receive points; middles stay empty
    assert set(got) == {0, 3}
    assert got[0]["n"] == 5 and got[3]["n"] == 5
    assert abs(got[0]["centroid_balance"] - low) < 1e-6
    assert abs(got[3]["centroid_balance"] - high) < 1e-6
    assert got[0]["sum_abs_dev"] == 0.0 and got[3]["sum_abs_dev"] == 0.0


def test_ridge_recovers_planted_linear_signal(spark, tmp_path):
    # y = 2 + 3*x1 + 5*x2 exactly; with n=2000 rows the lambda=10
    # ridge shrinkage is O(lambda/n) — betas land within 2%.
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(2000):
        ts = t0 + dt.timedelta(hours=i)
        x1 = ts.hour
        day_idx = int(ts.timestamp()) // 86400
        x2 = 1 if day_idx % 7 < 2 else 0
        rows.append((i, ts, i % 7, "click", float(2 + 3 * x1 + 5 * x2)))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = ridge_two_feature_events(spark, str(tmp_path)).collect()[0]
    assert abs(r["beta1"] - 3.0) < 0.06
    assert abs(r["beta2"] - 5.0) < 0.5
    assert abs(r["beta0"] - 2.0) < 1.0
    assert r["det"] > 0
