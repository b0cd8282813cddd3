"""Structured Streaming surface (SURVEY.md §2.11 / §7.1 stage 8).

The reference has NO streaming operators (verified: no readStream /
writeStream / withWatermark tokens anywhere in the tree) — this is the
declared extension: event-time windowed aggregation, session windows,
and watermark-scoped deduplication over a micro-batched file source.

All transformations here are pure functions ``streaming DF → streaming
DF`` so they compose and unit-test like the batch operators; running
them (triggers, sinks, checkpoints) lives in runner.py.

Scale notes (1000-executor / 100 TB view):
- the file source lists and splits files exactly like the batch reader
  — ingest parallelism is partition-, not driver-, bound;
- windowed aggs keep one state row per (window, keys) in the state
  store, bounded by the watermark horizon — state size is
  O(active windows × key cardinality), independent of stream length;
- dropDuplicatesWithinWatermark state is bounded the same way (one row
  per key within the horizon) — unbounded dropDuplicates is the
  anti-pattern at scale;
- shuffles: exactly one per stateful op, on the grouping keys — the
  same exchange a batch groupBy would plan.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from collections.abc import Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Consolidated streaming scratch (VERDICT r6 task 7): checkpoint dirs
# and staged micro-batch fixtures live under ONE root, on tmpfs when
# the host has one — checkpoint commits are fsync-heavy tiny-file
# traffic that dominates bounded-run wall time on spinning/virtio
# disks, and none of it needs durability (each run starts a fresh
# checkpoint by design).
_SCRATCH = Path(
    os.environ.get(
        "SPARK_GRAFT_STREAM_SCRATCH",
        "/dev/shm/lakehouse_stream"
        if Path("/dev/shm").is_dir()
        else tempfile.gettempdir() + "/lakehouse_stream",
    )
)


def stream_scratch(prefix: str, max_age: float = 7200.0) -> Path:
    """Fresh per-run work dir (checkpoints, sinks) under the
    consolidated scratch root. Never cached — a reused checkpoint
    would skip micro-batches and turn the query into a cache read.

    The root is tmpfs (RAM) where available, so each call also sweeps
    run dirs older than ``max_age`` seconds — without it, repeated
    bench/test runs would leak RAM-backed checkpoint state until
    reboot (code-review r7 finding). Live runs are hours younger than
    the threshold."""
    root = _SCRATCH / "runs"
    root.mkdir(parents=True, exist_ok=True)
    now = time.time()
    for d in root.iterdir():
        try:
            if d.is_dir() and now - d.stat().st_mtime > max_age:
                shutil.rmtree(d, ignore_errors=True)
        except OSError:
            pass  # racing another sweeper
    return Path(tempfile.mkdtemp(prefix=prefix, dir=str(root)))


def cached_fixture(key: str, build, token: object = None) -> Path:
    """Build-once staged SOURCE fixture, reused across bench attempts
    and queries (the federated-formats discipline of r5 task 6):
    ``build(dir)`` populates a temp dir which is published by atomic
    rename, so concurrent builders race harmlessly (one rename wins,
    losers discard). Only deterministic source-file stagings belong
    here — checkpoints and sinks go through :func:`stream_scratch`.
    File mtimes survive caching, so mtime-ordered micro-batch
    fixtures keep their ordering contract.

    ``token`` folds a cache-busting version into the key — pass the
    SOURCE file's mtime (or a builder-version string) so regenerated
    test data or changed staging logic invalidates the cache instead
    of silently serving stale batches (code-review r7 finding)."""
    if token is not None:
        import hashlib

        key = f"{key}.{hashlib.md5(str(token).encode()).hexdigest()[:10]}"
    d = _SCRATCH / "fixtures" / key
    if (d / "_done").exists():
        return d
    tmp = d.with_name(d.name + f".build{os.getpid()}")
    if tmp.exists():
        shutil.rmtree(tmp)
    tmp.mkdir(parents=True)
    build(tmp)
    (tmp / "_done").touch()
    try:
        tmp.rename(d)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another builder won
    return d


def stream_state_partitions(spark: SparkSession, *paths) -> int:
    """Scale-adaptive shuffle/state partition count for a BOUNDED
    file-source stream (guide §2: derive partitioning from input size,
    never from a constant tuned for one deployment).

    Stateful streaming operators pin their state-store partition count
    to ``spark.sql.shuffle.partitions`` at first trigger, and AQE
    cannot coalesce it (AQE is disabled in stateful workloads). With
    the session default sized for batch work, a megabytes-sized
    bounded replay pays (partitions × micro-batches) state-store
    commits and task launches per stateful operator — pure floor. One
    64 MB-sized partition per source chunk caps that floor while
    leaving cluster-scale inputs at the configured width: the clamp
    only ever LOWERS the count (ceil(bytes/64MB), min 1), so at
    100 TB the formula returns the configured partitioning unchanged.

    ``paths`` are files or directories (globs resolve via rglob); the
    result is intended for the ``shuffle_partitions`` argument of the
    streaming runners, scoped to one bounded run.
    """
    import math

    total = 0
    for p in paths:
        pp = Path(str(p).removeprefix("file://"))
        # strip a trailing glob component ("/*/part-*") if present
        while any(ch in pp.name for ch in "*?["):
            pp = pp.parent
        if pp.is_dir():
            total += sum(
                f.stat().st_size for f in pp.rglob("*") if f.is_file()
            )
        elif pp.is_file():
            total += pp.stat().st_size
    try:
        cur = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except (TypeError, ValueError):
        cur = 200
    return max(1, min(cur, math.ceil(total / (64 << 20))))


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events fixture (schema from a batch
    peek — file streams require an explicit schema; the ns→us cast
    mirrors sources/readers.py so batch and stream rows are identical).
    """
    from ..sources.readers import ensure_session_confs, normalize_event_ts

    ensure_session_confs(spark)
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    # The file source needs a directory (single-file paths fail batch
    # reconstruction: "Option 'basePath' must be a directory") — stage
    # the fixture once per scale factor and share it across runs and
    # queries (the copy itself is pure setup, not query cost).
    base = cached_fixture(
        f"events_{Path(sf_dir).name}",
        lambda d: shutil.copy(path, d / "events.parquet"),
        token=os.stat(path).st_mtime,
    )
    raw = spark.readStream.schema(schema).parquet(str(base))
    return normalize_event_ts(raw)


def stream_parquet(
    spark: SparkSession, path: str, schema, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Generic parquet file-source stream; ``max_files_per_trigger=1``
    turns a directory of snapshot files into ordered micro-batches."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def windowed_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling (or sliding, when ``slide`` is set) window
    aggregation: count + exact decimal-cast sum per (window, keys)."""
    win = (
        F.window("ts", window, slide) if slide is not None else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), *keys)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias(
                "total_value"
            ),
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: Sequence[str] = ("user_id",),
) -> DataFrame:
    """Native session windows: sessions merge while consecutive events
    are within ``gap`` (boundary semantics: a delta of exactly ``gap``
    still merges — matches the batch sessionize operator's ``> gap``
    new-session rule, verified empirically)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: Sequence[str] = ("event_id",),
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermark-scoped exact deduplication: keeps the first arrival of
    each key; duplicate arrivals within the watermark horizon are
    dropped from the stream (state is evicted past the horizon, so
    memory is bounded — the streaming twin of operators/dedup.py's
    exact_dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )


def stage_ordered_batches(d: Path, frames) -> None:
    """Write each frame as a single-file parquet dir ``b{i}`` under
    ``d``, bumping file mtimes by 10 s per index — the arrival-order
    contract every stream==batch identity in plans/streamops.py rides
    on (``maxFilesPerTrigger=1`` consumes files in mtime order). One
    shared implementation so a change to the ordering scheme (e.g.
    filesystems with coarse mtime granularity) lands everywhere at
    once (code-review r7)."""
    for i, df in enumerate(frames):
        df.coalesce(1).write.parquet(str(d / f"b{i}"))
        for p in (d / f"b{i}").glob("part-*"):
            st = os.stat(p)
            os.utime(p, (st.st_atime + i * 10, st.st_mtime + i * 10))
