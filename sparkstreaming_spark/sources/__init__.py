from .batch import load_tables, read_csv, read_parquet, read_table
from .streaming import stream_csv_dir, stream_parquet, stream_text_dir

__all__ = [
    "load_tables",
    "read_csv",
    "read_parquet",
    "read_table",
    "stream_csv_dir",
    "stream_parquet",
    "stream_text_dir",
]
