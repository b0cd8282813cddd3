"""Partitioning helpers.

``fan_out`` fixes the small-file / big-CPU mismatch: a 2 MB parquet
file arrives as ONE input split (``spark.sql.files.maxPartitionBytes``
is 128 MB), so per-row-expensive operators (shingling, MinHash,
SimHash, mapInPandas codecs) run on a single core no matter how wide
the cluster is. Repartitioning UP to the session's shuffle parallelism
costs one small shuffle and buys full-core execution.

At 100 TB the input already has orders of magnitude more files than
cores, so the guard makes this a no-op — the helper only ever widens,
never shrinks (shrinking would be a scale regression).

Spark-Connect-safe by construction: no ``sparkContext`` / ``.rdd``
probes anywhere. The width target comes from
``spark.sql.shuffle.partitions`` and the already-wide guard uses the
public ``DataFrame.inputFiles()`` API (file count is a lower bound on
split count — a source with >= target files never re-shuffles; a
source with few-but-huge files re-shuffles once, which is exactly the
case where widening pays for itself before per-row-expensive work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _shuffle_parallelism(df: DataFrame) -> int:
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return max(1, int(raw))
    except (TypeError, ValueError):  # "auto" under some AQE configs
        return 200


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition a narrow FILE-BACKED plan UP to
    ``shuffle.partitions * multiplier``; pass through otherwise.

    Non-file-backed plans (createDataFrame, ranges, post-shuffle
    results) pass through untouched: their width is already governed
    by session parallelism, and the small-file pathology this helper
    exists for can't occur there. This also preserves the never-shrink
    invariant without any ``.rdd`` width probe.
    """
    target = _shuffle_parallelism(df) * multiplier
    try:
        n_files = len(df.inputFiles())
    except Exception:  # defensive: treat unknown providers as non-file
        n_files = 0
    if n_files == 0 or n_files >= target:
        return df
    return df.repartition(target)
