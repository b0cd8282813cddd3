"""Lakehouse table-maintenance wave (r8): OPTIMIZE bin-packing
compaction on the Delta-log backend and the clustering-depth metric
that tells a table owner WHEN to re-cluster (the decision input for
OPTIMIZE ZORDER cadence — Delta/Iceberg maintenance docs call this
interval-overlap depth; Iceberg's binpack/sort strategies use the
same signal).

Reference parity: the reference's pipeline runs on Delta tables
(notebooks/pipeline_core.py:219-227) whose operational story assumes
compaction; this wave makes the maintenance loop executable on the
plain-parquet Delta log (sources/deltalog.py) where delta-spark
itself is absent.

100 TB notes:
- OPTIMIZE reads only the files it bins and commits
  dataChange=false add/removes — incremental consumers skip the
  rewrite by contract; the bin planning is metadata-only (one log
  replay, no data scan).
- The overlap-depth sweep runs entirely on the FILE-STATS domain
  (one row per file, never per data row): depth(p) = #files whose
  [min,max] straddles p, maximized over the lo-boundaries — at
  100 TB that is ~10⁵ metadata rows, a broadcast-size relation.
  The query uses a deterministic key-derived file assignment so the
  DuckDB oracle can replay the exact same file boundaries; the
  real-stats twin (from _file_stats_json) is covered in
  tests/test_deltalog.py.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import read_parquet_table
from . import query
from .etlops import SCRATCH


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# OPTIMIZE compaction end-to-end inside the correctness gate: a
# 12-file create plus a 4-file append produce a fragmented table;
# optimize() bin-packs it and the post-OPTIMIZE read must still
# aggregate exactly like the plain orders oracle. File-count
# mechanics (before > after, dataChange=false actions, time travel
# to the fragmented version) are asserted in-query and unit-tested
# in tests/test_deltalog.py::test_optimize_*.
@query(
    "delta_optimize_orders",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def delta_optimize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.deltalog import DeltaLogWriter, read_delta

    o = _t(spark, sf_dir, "orders")
    root = SCRATCH / f"dlopt_{Path(sf_dir).name}"
    if root.exists():
        shutil.rmtree(root)
    table = root / "orders_fragmented"
    w = DeltaLogWriter(spark, table)
    half = o.agg(F.max("o_orderkey")).collect()[0][0] // 2
    w.create(o.filter(F.col("o_orderkey") <= half).repartition(12))
    v_frag = w.append(o.filter(F.col("o_orderkey") > half).repartition(4))
    res = w.optimize()  # default 128 MiB target swallows everything
    if not (res["version"] > v_frag and res["files_after"] < res["files_before"]):
        raise AssertionError(f"OPTIMIZE did not compact: {res}")
    live = read_delta(spark, table)
    frag_n = read_delta(spark, table, version=v_frag).count()
    live_n = live.count()
    if frag_n != live_n:  # compaction must be row-invariant AND the
        raise AssertionError(  # fragmented version must stay travelable
            f"OPTIMIZE changed rows: v{v_frag}={frag_n} live={live_n}"
        )
    return (
        live.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# Clustering-depth metric: files carry [min,max] o_totalprice ranges;
# depth(p) = #files whose range straddles p. A perfectly clustered
# (range-partitioned) layout has depth 1 everywhere; a layout written
# in key order has depth ≈ #files on an uncorrelated column — the
# signal that a Z-ORDER/sort rewrite would pay off. File assignment
# here is o_orderkey % 12 so the oracle replays identical boundaries;
# depth is evaluated at every file's lo boundary (the sweep's only
# candidate maxima). Output: per-file stats + straddle depth, plus
# the global max depth on every row (the table's clustering score).
@query(
    "file_overlap_depth_orders",
    oracle="""
    WITH f AS (
        SELECT o_orderkey % 12 AS fid,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(ROUND(min(o_totalprice) * 100) AS BIGINT) AS lo100,
               CAST(ROUND(max(o_totalprice) * 100) AS BIGINT) AS hi100
        FROM orders GROUP BY 1
    ),
    d AS (
        SELECT a.fid, a.n_rows, a.lo100, a.hi100,
               CAST(COUNT(*) AS BIGINT) AS depth_at_lo
        FROM f a JOIN f b
          ON b.lo100 <= a.lo100 AND b.hi100 >= a.lo100
        GROUP BY a.fid, a.n_rows, a.lo100, a.hi100
    )
    SELECT CAST(fid AS BIGINT) AS fid, n_rows,
           CAST(lo100 AS DOUBLE) / 100.0 AS min_price,
           CAST(hi100 AS DOUBLE) / 100.0 AS max_price,
           depth_at_lo,
           CAST(MAX(depth_at_lo) OVER () AS BIGINT) AS max_overlap_depth
    FROM d
    ORDER BY fid
    """,
)
def file_overlap_depth_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    f = o.groupBy((F.col("o_orderkey") % 12).alias("fid")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.round(F.min("o_totalprice") * 100).cast("bigint").alias("lo100"),
        F.round(F.max("o_totalprice") * 100).cast("bigint").alias("hi100"),
    )
    a = f.alias("a")
    b = f.select(
        F.col("lo100").alias("blo"), F.col("hi100").alias("bhi")
    ).alias("b")
    d = (
        a.join(
            F.broadcast(b),
            (F.col("blo") <= F.col("a.lo100"))
            & (F.col("bhi") >= F.col("a.lo100")),
        )
        .groupBy("a.fid", "a.n_rows", "a.lo100", "a.hi100")
        .agg(F.count(F.lit(1)).cast("bigint").alias("depth_at_lo"))
    )
    wall = Window.partitionBy()
    return d.select(
        F.col("fid").cast("bigint").alias("fid"),
        "n_rows",
        (F.col("lo100").cast("double") / 100.0).alias("min_price"),
        (F.col("hi100").cast("double") / 100.0).alias("max_price"),
        "depth_at_lo",
        F.max("depth_at_lo").over(wall).cast("bigint").alias(
            "max_overlap_depth"
        ),
    ).orderBy("fid")


# ---------------------------------------------------------------------------
# OPTIMIZE → VACUUM lifecycle: compaction leaves the fragmented
# originals on disk for time travel; VACUUM(force, retention=0)
# deletes exactly those unreferenced files, the live read is
# untouched, and time travel below the vacuum horizon fails loudly
# (asserted in-query via read_delta on the pre-OPTIMIZE version).
# The mechanics (retention check, dry run, restore guard) are
# unit-tested in tests/test_deltalog.py::test_vacuum_*.
@query(
    "delta_vacuum_orders",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def delta_vacuum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.deltalog import DeltaLogError, DeltaLogWriter, read_delta

    o = _t(spark, sf_dir, "orders")
    root = SCRATCH / f"dlvac_{Path(sf_dir).name}"
    if root.exists():
        shutil.rmtree(root)
    table = root / "orders_lifecycle"
    w = DeltaLogWriter(spark, table)
    v0 = w.create(o.repartition(6))
    res = w.optimize()
    if res["version"] <= v0:
        raise AssertionError(f"OPTIMIZE did not commit: {res}")
    dry = w.vacuum(retention_ms=0, force=True, dry_run=True)
    vac = w.vacuum(retention_ms=0, force=True)
    if not (vac["files_removed"] == dry["files_removed"] == 6):
        raise AssertionError(f"VACUUM removed {vac} (dry {dry}), wanted 6")
    traveled = True
    try:  # time travel below the vacuum horizon must fail loudly
        read_delta(spark, table, version=v0).count()
    except DeltaLogError:
        traveled = False
    except Exception:
        traveled = False  # Spark scan error on the missing file: also loud
    if traveled:
        raise AssertionError("time travel to vacuumed version succeeded")
    return (
        read_delta(spark, table)
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Optimistic concurrency on the Delta log, end-to-end inside the
# correctness gate (sources/deltalog.py::DeltaLogWriter.append —
# delta-io PROTOCOL.md WriteSerializable conflict rules, public): a
# blind append that LOSES the commit race to another blind append
# must retry and land at the next version (AddFile-only transactions
# commute); the final table carries BOTH writers' rows exactly once.
# The race is deterministic: writer 1's commit hook lets writer 2 win
# the contested version first. Conflict-ABORT paths (racing
# overwrite/metadata) are pinned in tests/test_deltalog.py.
@query(
    "delta_concurrent_appends_orders",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE)
             AS revenue,
           CAST(2 AS BIGINT) AS final_version
    FROM orders
    GROUP BY 1 ORDER BY 1
    """,
)
def delta_concurrent_appends_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import types

    from ..sources.deltalog import DeltaLogWriter, current_version, read_delta

    o = _t(spark, sf_dir, "orders")
    root = SCRATCH / f"dlrace_{Path(sf_dir).name}"
    if root.exists():
        shutil.rmtree(root)
    table = root / "orders_raced"
    w1 = DeltaLogWriter(spark, table)
    w1.create(o.filter(F.col("o_orderkey") % 2 == 0))  # v0: evens
    odd_lo = o.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 4 == 1)
    )
    odd_hi = o.filter(
        (F.col("o_orderkey") % 2 == 1) & (F.col("o_orderkey") % 4 == 3)
    )
    orig_commit = DeltaLogWriter._commit
    raced: list[bool] = []

    def racing_commit(self, actions, op, version=None):
        if not raced and op == "WRITE":
            raced.append(True)
            DeltaLogWriter(spark, table).append(odd_lo)  # wins the race
        return orig_commit(self, actions, op, version)

    w1._commit = types.MethodType(racing_commit, w1)  # instance-only
    v = w1.append(odd_hi)  # loses v1, must retry and land at v2
    if not (raced and v == 2 and current_version(table) == 2):
        raise AssertionError(
            f"append retry did not land at v2: raced={raced} v={v}"
        )
    return (
        read_delta(spark, table)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
            .cast("double")
            .alias("revenue"),
            F.lit(2).cast("bigint").alias("final_version"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# SHALLOW CLONE lifecycle (DeltaLogWriter.clone_shallow — the Delta
# CLONE command, public semantics): clone the 2-commit source, verify
# the clone is ZERO-COPY (its add actions reference the source's
# files by absolute path; no data bytes under the clone), then
# diverge the clone with an extra append and prove the source is
# untouched. Hashed contract per order status: source rows, clone
# rows at clone time (== source), clone rows after divergence
# (source + the re-appended even keys). The vacuum caveat (source
# vacuum can break clones; clone vacuum cannot touch source bytes)
# is pinned in tests/test_deltalog.py.
@query(
    "delta_shallow_clone_orders",
    oracle="""
    WITH src AS (
        SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n_src
        FROM orders GROUP BY 1
    ),
    extra AS (
        SELECT o_orderstatus AS status, CAST(COUNT(*) AS BIGINT) AS n_extra
        FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
    )
    SELECT s.status,
           s.n_src,
           s.n_src AS n_clone_v0,
           s.n_src + COALESCE(e.n_extra, 0) AS n_clone_now
    FROM src s LEFT JOIN extra e USING (status)
    ORDER BY s.status
    """,
)
def delta_shallow_clone_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.deltalog import DeltaLogWriter, read_delta

    o = _t(spark, sf_dir, "orders")
    root = SCRATCH / f"dlclone_{Path(sf_dir).name}"
    if root.exists():
        shutil.rmtree(root)
    src_path = root / "orders_src"
    clone_path = root / "orders_clone"
    ws = DeltaLogWriter(spark, src_path)
    ws.create(o.filter(F.col("o_orderkey") % 2 == 0))  # v0
    ws.append(o.filter(F.col("o_orderkey") % 2 == 1))  # v1
    wc = DeltaLogWriter(spark, clone_path)
    wc.clone_shallow(src_path)
    if list(clone_path.glob("*.parquet")):
        raise AssertionError("shallow clone copied data bytes")
    n_src_before = read_delta(spark, src_path).count()
    clone_v0 = read_delta(spark, clone_path, version=0).groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_clone_v0"))
    wc.append(o.filter(F.col("o_orderkey") % 2 == 0))  # diverge clone
    if read_delta(spark, src_path).count() != n_src_before:
        raise AssertionError("clone divergence mutated the source")
    src_agg = read_delta(spark, src_path).groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_src"))
    clone_now = read_delta(spark, clone_path).groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_clone_now"))
    return (
        src_agg.join(clone_v0, "status")
        .join(clone_now, "status")
        .select("status", "n_src", "n_clone_v0", "n_clone_now")
        .orderBy("status")
    )
