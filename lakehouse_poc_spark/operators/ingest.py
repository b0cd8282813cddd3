"""Ingest metadata + cleanup projections.

Re-expresses the reference's raw-landing decorations
(``with_ingest_metadata``: IngestTimestamp/IngestSource, reference
notebooks/pipeline_core.py:29-37) and the trim-cleanup projection
(:87-93), with one deliberate semantics fix: the ingest stamp is a
deterministic per-run parameter, not per-task ``current_timestamp()``
(SURVEY.md §7.0.3 — the reference's stamp differs across tasks of the
same run, which breaks dedup-latest ties and reproducibility).
"""

from __future__ import annotations

from collections.abc import Sequence
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INGEST_TS = "IngestTimestamp"
INGEST_SOURCE = "IngestSource"


def with_ingest_metadata(
    df: DataFrame, source: str, run_ts: datetime | str
) -> DataFrame:
    """Stamp lineage columns on a raw batch (reference P2 idiom)."""
    return df.withColumns(
        {
            INGEST_TS: F.lit(run_ts).cast("timestamp"),
            INGEST_SOURCE: F.lit(source),
        }
    )


def trim_columns(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Trim whitespace on the given (or all) string columns — the
    reference's per-column cleanup loop (pipeline_core.py:92-93), done
    as ONE projection (one codegen stage), not N chained selects."""
    targets = set(cols) if cols is not None else {
        f.name for f in df.schema.fields if f.dataType.simpleString() == "string"
    }
    return df.select(
        *[
            F.trim(F.col(c)).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )
