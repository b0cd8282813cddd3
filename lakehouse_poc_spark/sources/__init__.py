from .readers import CsvDialect, load_star_schema, read_csv, read_parquet_table, register_views

__all__ = ["CsvDialect", "load_star_schema", "read_csv", "read_parquet_table", "register_views"]
