"""Python UDTF surface (SURVEY.md §2.12): table functions that emit
multiple rows per input row.

The reference has no UDF/UDTF surface at all; this realizes the
declared extension slot with the one shape built-in expressions
genuinely cannot produce: regex *match spans* — one output row per
match with its exact character offsets (`regexp_extract_all` returns
matched text only, never positions). Offsets are what a PII audit
needs to prove a redaction pass caught everything, and what span-level
labeling pipelines consume.

Engine note: Python UDTFs evaluate row-at-a-time (Arrow-optimized
transfer, but per-row Python logic) — the slow path by this repo's
rules. This operator is the deliberate §2.12 demonstration, suitable
for audit-sized slices; a bulk span extraction over 100 TB would use
``mapInPandas`` with the same contract (the plumbing swap is
mechanical, as with the multimodal codecs).
"""

from __future__ import annotations

import itertools
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="kind string, match string, start int, end int")
class RegexSpans:
    """One row per regex match: (kind, matched text, 1-based inclusive
    character span). ``kind`` labels the pattern so multi-pattern scans
    union cleanly."""

    def eval(self, text: str, pattern: str, kind: str):  # noqa: D102
        if text is None or pattern is None:
            return
        for m in re.finditer(pattern, text):
            yield kind, m.group(0), m.start() + 1, m.end()


_VIEW_COUNTER = itertools.count()


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register the UDTF surface for SQL callers."""
    spark.udtf.register("regex_spans", RegexSpans)


def regex_spans(
    df: DataFrame,
    text_col: str,
    patterns: dict[str, str],
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply ``regex_spans`` laterally for each (kind → pattern):
    output one row per match across all patterns."""
    spark = df.sparkSession
    register_udtfs(spark)
    # Patterns ride as literal COLUMNS (F.lit), never through SQL text —
    # SQL string literals would re-interpret regex backslashes.
    # View names come from a monotonic counter: a content hash collides
    # across calls whose pattern BODIES differ (dict keys hash equal)
    # and str hashes are per-process randomized anyway.
    view = f"__regex_spans_{next(_VIEW_COUNTER)}"
    parts = []
    for i, (kind, pat) in enumerate(patterns.items()):
        vname = f"{view}_{i}"
        df.withColumn("__pat", F.lit(pat)).withColumn(
            "__kind", F.lit(kind)
        ).createOrReplaceTempView(vname)
        parts.append(
            f"""
            SELECT v.{id_col}, s.kind, s.match, s.start, s.end
            FROM {vname} v, LATERAL regex_spans(v.{text_col}, v.__pat, v.__kind) s
            """
        )
    out = spark.sql(" UNION ALL ".join(parts))
    return out.select(
        id_col,
        "kind",
        F.col("match"),
        F.col("start").cast("int").alias("start"),
        F.col("end").cast("int").alias("end"),
    )
