"""Context-window document chunking for training/retrieval prep.

Splits each document's text into fixed-width character windows with
overlap — the standard preprocessing step before embedding long
documents or packing them into bounded model context windows. The
reference (lakehouse-poc, notebooks/pipeline_core.py) has no text
surface; this belongs to the SURVEY §7 training-data extension
family alongside packing (operators/packing.py) and the curation
screens (plans/curation.py).

Everything is JVM-side codegen: the window count is arithmetic on
``length(text)``, the windows come from ``explode(sequence(...))``
plus ``substr`` — no Python in the data path and **zero shuffle** (a
pure map over the scan, fused into WholeStageCodegen). At 100 TB
chunking therefore costs one read and one write; downstream
embedding jobs read only ``chunk_text`` via column pruning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_text_windows(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each row into overlapping character windows.

    Window ``i`` covers ``[i*step, i*step + chunk_chars)`` chars with
    ``step = chunk_chars - overlap``; the window count is
    ``max(1, ceil((len - overlap) / step))``, so every character is
    in at least one window and the last window reaches the end of
    the text.

    Adds ``chunk_id`` (0-based per document), ``chunk_start``
    (0-based char offset), ``chunk_text`` and ``chunk_len``; keeps
    every input column except ``text_col``.
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    step = chunk_chars - overlap
    text = F.col(text_col)
    n_win: Column = F.greatest(
        F.lit(1).cast("bigint"),
        F.ceil((F.length(text).cast("double") - F.lit(float(overlap))) / F.lit(float(step))),
    )
    keep = [c for c in df.columns if c != text_col]
    exploded = df.select(
        *keep,
        text.alias("__text"),
        F.explode(F.sequence(F.lit(0).cast("bigint"), n_win - F.lit(1).cast("bigint"))).alias(
            "chunk_id"
        ),
    )
    start = F.col("chunk_id") * F.lit(step).cast("bigint")
    chunk = F.col("__text").substr((start + F.lit(1)).cast("int"), F.lit(chunk_chars))
    return exploded.select(
        *keep,
        "chunk_id",
        start.alias("chunk_start"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("bigint").alias("chunk_len"),
    )
