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
    is_schema_valid,
)
from woodwork_spark.schema import ColumnSchema, TableSchema
from woodwork_spark.type_sys.type_system import type_system
from woodwork_spark import logical_types
from woodwork_spark.type_sys.utils import list_logical_types, list_semantic_tags
from woodwork_spark.table_utils import concat_columns, init_series
from woodwork_spark.lifecycle import persisted_frames, release

__version__ = "0.1.0"

# Entry-point plugin hook (reference __init__.py:28-36): other libraries
# can register an initializer under the "woodwork_spark_initialize" group
# (importlib.metadata, the maintained successor of pkg_resources) and get
# called with the package name at import — e.g. to register custom
# logical types on the type_system.
def _run_plugin_entry_points():  # pragma: no cover - depends on installed pkgs
    try:
        from importlib.metadata import entry_points

        eps = entry_points()
        group = (
            eps.select(group="woodwork_spark_initialize")
            if hasattr(eps, "select")
            else eps.get("woodwork_spark_initialize", [])
        )
        for entry_point in group:
            try:
                method = entry_point.load()
                if callable(method):
                    method("woodwork_spark")
            except Exception:
                pass
    except Exception:
        pass


_run_plugin_entry_points()

__all__ = [
    "config",
    "init",
    "init_with_full_schema",
    "get_invalid_schema_message",
    "is_schema_valid",
    "WWDataFrame",
    "ColumnSchema",
    "TableSchema",
    "type_system",
    "logical_types",
    "list_logical_types",
    "list_semantic_tags",
    "concat_columns",
    "init_series",
    "persisted_frames",
    "release",
]
