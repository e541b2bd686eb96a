"""woodwork_spark — a PySpark-native semantic typing + profiling engine.

Brand-new implementation of the capabilities of alteryx/woodwork 0.31.0
(reference at /root/reference, read-only) re-expressed Spark-first: typing
metadata in StructField.metadata, inference/statistics as Spark
aggregations, relational substrate from Spark SQL/Catalyst.
"""

from woodwork_spark.config import config
from woodwork_spark.accessor import (
    WWDataFrame,
    init,
    init_with_full_schema,
    get_invalid_schema_message,
)
from woodwork_spark.schema import ColumnSchema, TableSchema
from woodwork_spark.type_sys.type_system import type_system
from woodwork_spark import logical_types
from woodwork_spark.type_sys.utils import list_logical_types, list_semantic_tags
from woodwork_spark.table_utils import concat_columns, init_series

__version__ = "0.1.0"

__all__ = [
    "config",
    "init",
    "init_with_full_schema",
    "get_invalid_schema_message",
    "WWDataFrame",
    "ColumnSchema",
    "TableSchema",
    "type_system",
    "logical_types",
    "list_logical_types",
    "list_semantic_tags",
    "concat_columns",
    "init_series",
]
