"""dataframe_spark — a PySpark-native analytics engine with the
query surface of DataHaskell/dataframe (reference at
/root/reference), extended with large-scale LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal).

Usage mirrors the reference's ``D.``/``F.`` convention::

    import dataframe_spark as D
    from dataframe_spark import expr as F

    spark = D.get_spark()
    df = D.read_parquet(spark, "lineitem.parquet")
    (df.filter_where(F.col("l_quantity") > 10)
       .group_by(["l_returnflag"])
       .aggregate(total=F.sum_("l_extendedprice"))
       .show())
"""

from . import expr, ml, operators, plans, streaming
from .constructors import (
    column_as_list,
    from_named_columns,
    from_rows,
    from_unnamed_columns,
    to_float_matrix,
    to_int_matrix,
    to_matrix,
)
from .core import Asc, DataFrame, Desc, GroupedDataFrame, row_value
from .interop import to_int_tensor, to_tensor
from .monad import FrameM
from .session import get_spark
from .typing import parse_defaults, parse_with_types
from .sources import (
    read_csv,
    read_jdbc,
    read_json,
    read_orc,
    read_parquet,
    read_text,
    read_tsv,
    scan_csv,
    write_csv,
    write_json,
    write_orc,
    write_parquet,
    write_jdbc,
    write_parquet_bucketed,
    write_parquet_sorted,
    write_parquet_zordered,
    write_text,
)

__version__ = "0.1.0"

__all__ = [
    "row_value",
    "DataFrame",
    "GroupedDataFrame",
    "FrameM",
    "Asc",
    "Desc",
    "expr",
    "ml",
    "operators",
    "plans",
    "streaming",
    "get_spark",
    "from_named_columns",
    "from_unnamed_columns",
    "from_rows",
    "column_as_list",
    "to_matrix",
    "to_tensor",
    "to_int_tensor",
    "parse_defaults",
    "parse_with_types",
    "to_int_matrix",
    "to_float_matrix",
    "read_csv",
    "read_tsv",
    "scan_csv",
    "read_jdbc",
    "read_json",
    "read_orc",
    "read_text",
    "read_parquet",
    "write_csv",
    "write_jdbc",
    "write_json",
    "write_orc",
    "write_text",
    "write_parquet",
    "write_parquet_bucketed",
    "write_parquet_sorted",
    "write_parquet_zordered",
]
