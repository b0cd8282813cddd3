"""Cost-based-optimizer surface: ANALYZE TABLE feeds catalog
statistics (row counts, column NDV/min/max) that the optimizer reads
for cardinality estimation — the stats pipeline a 100 TB deployment
runs after every large load. Executes against a real managed-table
warehouse dir (not temp views, which carry no catalog stats)."""

from __future__ import annotations

import pytest


@pytest.fixture()
def catalog_tables(spark, tmp_path):
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    spark.sql("CREATE DATABASE IF NOT EXISTS cbo_db")
    n.write.mode("overwrite").saveAsTable("cbo_db.nation_t")
    c.write.mode("overwrite").saveAsTable("cbo_db.customer_t")
    yield
    spark.sql("DROP TABLE IF EXISTS cbo_db.nation_t")
    spark.sql("DROP TABLE IF EXISTS cbo_db.customer_t")
    spark.sql("DROP DATABASE IF EXISTS cbo_db")
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")


def test_analyze_populates_catalog_and_plan_stats(spark, catalog_tables):
    spark.sql(
        "ANALYZE TABLE cbo_db.nation_t COMPUTE STATISTICS FOR COLUMNS "
        "n_nationkey, n_name"
    )
    spark.sql("ANALYZE TABLE cbo_db.customer_t COMPUTE STATISTICS")
    desc = spark.sql("DESCRIBE EXTENDED cbo_db.nation_t").collect()
    stats_row = [r for r in desc if r.col_name == "Statistics"]
    assert stats_row and "rows" in stats_row[0].data_type
    # the optimizer's cardinality estimate uses the analyzed rowCount
    n_rows = spark.table("cbo_db.nation_t").count()
    opt = (
        spark.table("cbo_db.nation_t")
        ._jdf.queryExecution()
        .optimizedPlan()
        .stats()
    )
    assert opt.rowCount().isDefined()
    assert opt.rowCount().get() == n_rows

    # column-level stats carry NDV for the analyzed columns
    cstats = spark.sql(
        "DESCRIBE EXTENDED cbo_db.nation_t n_nationkey"
    ).collect()
    kv = {r.info_name: r.info_value for r in cstats}
    assert int(kv["distinct_count"]) == n_rows


def test_cbo_estimates_filtered_join_cardinality(spark, catalog_tables):
    spark.sql(
        "ANALYZE TABLE cbo_db.nation_t COMPUTE STATISTICS FOR COLUMNS "
        "n_nationkey"
    )
    spark.sql(
        "ANALYZE TABLE cbo_db.customer_t COMPUTE STATISTICS FOR COLUMNS "
        "c_nationkey, c_custkey"
    )
    joined = spark.sql(
        """
        SELECT c.c_custkey FROM cbo_db.customer_t c
        JOIN cbo_db.nation_t n ON c.c_nationkey = n.n_nationkey
        WHERE n.n_nationkey = 3
        """
    )
    stats = joined._jdf.queryExecution().optimizedPlan().stats()
    # with column stats the estimate is FINITE and in a sane band —
    # without them Spark falls back to size-based guessing with no
    # row count at all
    assert stats.rowCount().isDefined()
    est = int(stats.rowCount().get())
    actual = joined.count()
    assert 0 < est <= 10 * max(actual, 1) + 50
