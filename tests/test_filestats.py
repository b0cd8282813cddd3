"""File-skipping statistics (operators/filestats.py): the manifest
must prune most files of a range-clustered table for a selective
predicate, and pruning must never change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_poc_spark.operators.filestats import (
    collect_file_stats,
    prune_files,
    pruned_read,
)
from lakehouse_poc_spark.sinks.warehouse import Warehouse


def _clustered_table(spark, tmp_path, n_files=10):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    df = spark.range(10_000).select(
        F.col("id"), F.pmod(F.col("id") * 7919, 10_000).alias("v")
    )
    wh.append(df.repartition(8), "raw.t")
    wh.compact("raw.t", target_files=n_files, cluster_by=["v"])
    return str(wh.path("raw.t"))


def test_stats_cover_every_file_and_row(spark, tmp_path):
    path = _clustered_table(spark, tmp_path)
    stats = collect_file_stats(spark, path, ["v"])
    rows = stats.collect()
    n_files = len(list((tmp_path / "wh/raw/t").glob("*.parquet")))
    assert len(rows) == n_files
    assert sum(r["n_rows"] for r in rows) == 10_000
    assert all(r["v_min"] <= r["v_max"] for r in rows)


def test_selective_range_prunes_most_files(spark, tmp_path):
    path = _clustered_table(spark, tmp_path)
    stats = collect_file_stats(spark, path, ["v"])
    total = stats.count()
    surviving = prune_files(stats, "v", 1000, 1500)
    # a ~5% range over a 10-file clustered table touches 1-2 files
    assert 1 <= len(surviving) <= max(2, total // 3)


def test_pruned_read_equals_plain_predicate(spark, tmp_path):
    path = _clustered_table(spark, tmp_path)
    stats = collect_file_stats(spark, path, ["v"])
    pruned = pruned_read(spark, stats, "v", 1000, 1500)
    plain = (
        spark.read.parquet(path)
        .filter((F.col("v") >= 1000) & (F.col("v") <= 1500))
    )
    assert sorted(r["id"] for r in pruned.collect()) == sorted(
        r["id"] for r in plain.collect()
    )


def test_empty_overlap_returns_typed_empty_frame(spark, tmp_path):
    path = _clustered_table(spark, tmp_path)
    stats = collect_file_stats(spark, path, ["v"])
    out = pruned_read(spark, stats, "v", 50_000, 60_000)
    assert out.count() == 0
    assert set(out.columns) == {"id", "v"}


def test_zorder_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order layout must let a 2-D box predicate skip files on BOTH
    columns — and the count of surviving files must be a strict subset
    of the clustered file set."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.operators.filestats import (
        collect_file_stats,
        pruned_read_multi,
    )
    from lakehouse_poc_spark.sinks.warehouse import Warehouse, zorder_value

    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    wh = Warehouse(spark, str(tmp_path))
    z = df.withColumn("__z", zorder_value(F.col("x"), F.col("y"), bits=8))
    wh.append(z.repartition(4), "t.z")
    wh.compact("t.z", target_files=16, cluster_by=["__z"])
    stats = collect_file_stats(spark, str(wh.path("t.z")), ["x", "y"])
    n_files = stats.count()
    assert n_files >= 8
    # box covering ~1/16 of the space
    surviving = stats.filter(
        (F.col("x_max") >= 0) & (F.col("x_min") <= 15)
        & (F.col("y_max") >= 0) & (F.col("y_min") <= 15)
    ).count()
    assert surviving < n_files / 2, (surviving, n_files)
    out = pruned_read_multi(spark, stats, [("x", 0, 15), ("y", 0, 15)])
    assert out.count() == 16 * 16


def test_sample_files_deterministic_file_level(spark, tmp_path):
    """File-level sampling: decisions are per-file (whole files in or
    out), deterministic across calls, roughly proportional, and
    append-stable (old files keep their decision as the table grows)."""
    from pyspark.sql import functions as F

    from lakehouse_poc_spark.operators.filestats import sample_files

    path = str(tmp_path / "t")
    spark.range(10_000).withColumn("part", F.col("id") % 50).repartition(
        50, "part"
    ).write.partitionBy("part").parquet(path)

    df = spark.read.parquet(path)
    s1 = sample_files(df, 0.3)
    s2 = sample_files(df, 0.3)
    rows1 = sorted(r.id for r in s1.select("id").collect())
    rows2 = sorted(r.id for r in s2.select("id").collect())
    assert rows1 == rows2  # deterministic
    assert 0 < len(rows1) < 10_000
    # whole-file granularity: every sampled file contributes ALL its rows
    picked = s1.select(F.col("_metadata.file_path").alias("f")).distinct()
    per_file = (
        df.select("id", F.col("_metadata.file_path").alias("f"))
        .join(picked, "f")
        .count()
    )
    assert per_file == len(rows1)
    # append-stability: adding files never flips an old file's decision
    spark.range(10_000, 12_000).withColumn("part", F.lit(99)).write.mode(
        "append"
    ).partitionBy("part").parquet(path)
    s3 = sample_files(spark.read.parquet(path), 0.3)
    rows3 = set(r.id for r in s3.select("id").collect())
    assert set(rows1) <= rows3 or set(rows1) == {
        i for i in rows3 if i < 10_000
    }
    # fraction sanity on 51 files: expect ~30%, allow wide tolerance
    n_files = s3.select(F.col("_metadata.file_path")).distinct().count()
    assert 3 <= n_files <= 30
    # tiny fractions must not silently sample ZERO files: the keep
    # threshold floors at 1 slot of the 32-bit space, so 1e-6 yields an
    # executable (possibly empty at 51 files, but non-degenerate) plan
    # — cut stays >= 1 rather than collapsing to "always false".
    tiny = sample_files(spark.read.parquet(path), 1e-6)
    assert tiny.count() >= 0  # plan executes; no validation trap
    # the keep threshold for 1e-6 of the 32-bit space is 4295 (not the
    # old 16-bit round(1e-6*65536)=0 degenerate always-false filter)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        tiny.explain(True)
    assert "4295" in buf.getvalue()


def test_empty_index_fails_fast_with_clear_error(spark):
    """An EMPTY stats/bloom index cannot yield a schema probe file —
    the pruned readers must raise a clear ValueError instead of the
    opaque spark.read.parquet() no-paths crash (ADVICE r6)."""
    import pytest

    from lakehouse_poc_spark.operators.filestats import (
        bloom_pruned_read,
        pruned_read_multi,
    )

    empty_stats = spark.createDataFrame(
        [], "file string, n_rows long, v_min long, v_max long"
    )
    with pytest.raises(ValueError, match="index is empty"):
        pruned_read(spark, empty_stats, "v", 0, 10)
    with pytest.raises(ValueError, match="index is empty"):
        pruned_read_multi(spark, empty_stats, [("v", 0, 10)])
    empty_blooms = spark.createDataFrame(
        [], "file string, bits array<int>"
    )
    with pytest.raises(ValueError, match="index is empty"):
        bloom_pruned_read(spark, empty_blooms, "k", 42)
