"""Partitioning helpers.

``fan_out`` fixes the small-file / big-CPU mismatch: a 2 MB parquet
file arrives as ONE input split (``spark.sql.files.maxPartitionBytes``
is 128 MB), so per-row-expensive operators (shingling, MinHash,
SimHash, mapInPandas codecs) run on a single core no matter how wide
the cluster is. Repartitioning UP to the session's default parallelism
costs one small shuffle and buys full-core execution.

At 100 TB the input already has orders of magnitude more splits than
cores, so the guard makes this a no-op — the helper only ever widens,
never shrinks (shrinking would be a scale regression).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition UP to ``defaultParallelism * multiplier`` when the
    input has fewer partitions; pass through unchanged otherwise."""
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
