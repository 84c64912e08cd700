from .csv import read_csv, read_tsv, write_csv
from .json import read_json, write_json
from .parquet import read_parquet, write_parquet, write_parquet_bucketed

__all__ = [
    "read_csv",
    "read_tsv",
    "write_csv",
    "read_json",
    "write_json",
    "read_parquet",
    "write_parquet",
    "write_parquet_bucketed",
]
