from .csv import read_csv, read_tsv, scan_csv, write_csv
from .jdbc import read_jdbc, write_jdbc
from .json import read_json, write_json
from .orc import read_orc, read_text, write_orc, write_text
from .parquet import (
    read_parquet,
    read_parquet_files,
    write_parquet,
    write_parquet_bucketed,
    write_parquet_sorted,
    write_parquet_zordered,
)

__all__ = [
    "read_csv",
    "read_tsv",
    "scan_csv",
    "write_csv",
    "read_json",
    "write_json",
    "read_jdbc",
    "write_jdbc",
    "read_orc",
    "write_orc",
    "read_text",
    "write_text",
    "read_parquet",
    "read_parquet_files",
    "write_parquet",
    "write_parquet_bucketed",
    "write_parquet_sorted",
    "write_parquet_zordered",
]
