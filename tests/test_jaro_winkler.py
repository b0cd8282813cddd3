"""Jaro–Winkler kernel and blocked-linkage tests: the Python kernel
is pinned BIT-EXACT against DuckDB's jaro_winkler_similarity (that
identity is what lets the differential oracle hash raw doubles)."""

from __future__ import annotations

import random

import duckdb

from lakehouse_poc_spark import plans
from lakehouse_poc_spark.operators.linkage import jaro_winkler

SF = "/root/testdata/sf0.001"


def test_kernel_bit_exact_vs_duckdb():
    con = duckdb.connect()
    cases = [
        ("martha", "marhta"),
        ("dixon", "dicksonx"),
        ("jellyfish", "smellyfish"),
        ("abc", "abc"),
        ("", "abc"),
        ("", ""),
        ("a", "b"),
        ("ab", "ba"),
        ("forest green", "forest grene"),
    ]
    rng = random.Random(7)
    for _ in range(200):
        a = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 24)))
        b = "".join(rng.choice("abcdef ") for _ in range(rng.randint(0, 24)))
        cases.append((a, b))
    for a, b in cases:
        d = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == d, (a, b)


def test_blocked_pairs_contract(spark):
    rows = plans.QUERIES["jaro_winkler_parts"](spark, SF).collect()
    assert rows, "fixture should produce at least one high-JW pair"
    for r in rows:
        assert r["name_a"] < r["name_b"]
        assert r["jw"] >= 0.85
        assert r["name_a"][:2] == r["name_b"][:2]
        assert abs(len(r["name_a"]) - len(r["name_b"])) <= 2
        # blocked score equals the direct kernel value
        assert r["jw"] == jaro_winkler(r["name_a"], r["name_b"])
