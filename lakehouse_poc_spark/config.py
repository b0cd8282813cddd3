"""Pipeline configuration-as-data.

Typed re-expression of the reference's config surface:
- per-table dicts with ``source_path`` / ``raw_table`` / ``dim_table`` /
  ``business_key`` / ``compare_columns`` / ``technical_columns``
  (reference notebooks/pipeline_core.py:11-22), and
- the Mini-ETL defaults-merge list pattern
  ``file_map = [{**defaults, **entry} for entry in raw_map]`` with
  composite ``key_columns`` (reference "Mini-ETL-Pipeline in
  Databricks.py":6-22,46-51).

Business keys are ALWAYS lists here (the reference mixes a scalar
``business_key`` and list ``key_columns`` — we normalize to composite).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from .sources.readers import CsvDialect


@dataclass(frozen=True)
class TechnicalColumns:
    """SCD2 technical column names, configurable per table (reference
    pipeline_core.py:17-21 uses GueltigVon/GueltigBis/IsCurrent; the SQL
    notebooks use EffectiveFrom/EffectiveTo/IsCurrent)."""

    valid_from: str = "valid_from"
    valid_to: str = "valid_to"
    is_current: str = "is_current"


@dataclass(frozen=True)
class PipelineConfig:
    name: str
    raw_table: str
    dim_table: str
    business_key: tuple[str, ...]
    compare_columns: tuple[str, ...]
    source_path: str | None = None
    source_pattern: str | None = None
    dialect: CsvDialect = field(default_factory=CsvDialect)
    technical: TechnicalColumns = field(default_factory=TechnicalColumns)
    ingest_source: str = "blob-import"

    @property
    def wanted_columns(self) -> tuple[str, ...]:
        return tuple(self.business_key) + tuple(self.compare_columns)


def merge_defaults(defaults: dict[str, Any], entries: list[dict[str, Any]]) -> list[dict[str, Any]]:
    """The Mini-ETL defaults-merge: ``[{**defaults, **entry}, ...]``."""
    return [{**defaults, **entry} for entry in entries]


def config_from_dict(d: dict[str, Any]) -> PipelineConfig:
    """Build a typed config from a reference-shaped dict (scalar or list
    business key both accepted)."""
    key = d.get("business_key") or d.get("key_columns")
    if isinstance(key, str):
        key = [key]
    dialect_d = d.get("dialect") or {}
    tech_d = d.get("technical_columns") or {}
    return PipelineConfig(
        name=d.get("name", d.get("dim_table", "pipeline")),
        raw_table=d["raw_table"],
        dim_table=d["dim_table"],
        business_key=tuple(key),
        compare_columns=tuple(d["compare_columns"]),
        source_path=d.get("source_path"),
        source_pattern=d.get("pattern"),
        dialect=CsvDialect(**dialect_d) if not isinstance(dialect_d, CsvDialect) else dialect_d,
        technical=TechnicalColumns(**tech_d) if not isinstance(tech_d, TechnicalColumns) else tech_d,
        ingest_source=d.get("ingest_source", "blob-import"),
    )
