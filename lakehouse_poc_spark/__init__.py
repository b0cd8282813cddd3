"""lakehouse_poc_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference `lakehouse-poc/lakehouse-poc` repo (an Azure/Databricks CSV →
Delta → SCD2 micro-ETL), extended with the relational query surface,
streaming surface, and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing) that a 100 TB training-data
pipeline needs.

Design principles (see SURVEY.md §7):
- DataFrame/SQL first; Catalyst + AQE pick physical strategies.
- No row-at-a-time Python UDFs in hot paths; Pandas UDFs only where
  built-ins genuinely cannot express the semantics.
- Every pipeline run is parameterized by a deterministic ``run_ts``
  (reference uses per-expression ``current_timestamp()`` — a
  reproducibility hazard, see reference notebooks/pipeline_core.py:35).
"""

__version__ = "0.1.0"
