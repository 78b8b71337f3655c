from .io import load_table, write_csv, write_parquet  # noqa: F401
