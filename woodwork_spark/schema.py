"""ColumnSchema / TableSchema + StructField.metadata codec.

The reference keeps typing info in a sidecar ``TableSchema`` object
(/root/reference/woodwork/table_schema.py:14-110,
column_schema.py:18-61).  Here the per-column typing info ALSO lives in
``StructField.metadata["ww"]`` so it travels with every
select/withColumn/join and serializes natively into parquet footers
(SURVEY §7.1).  ``TableSchema`` is a thin facade that reads/writes that
metadata plus table-level name/metadata.
"""

from __future__ import annotations

import copy

from pyspark.sql import types as T

from woodwork_spark.exceptions import ColumnNotPresentError
from woodwork_spark.logical_types import (
    LogicalType,
    str_to_logical_type,
)

METADATA_KEY = "ww"
SCHEMA_VERSION = "12.0.0"  # reference serializers/serializer_base.py:13

_STANDARD_TAGS = {"numeric", "category"}


class ColumnSchema:
    """Typing info for one column (reference column_schema.py:18-177)."""

    def __init__(
        self,
        logical_type=None,
        semantic_tags=None,
        use_standard_tags=False,
        description=None,
        origin=None,
        metadata=None,
        validate=True,
    ):
        if isinstance(logical_type, str) or (
            isinstance(logical_type, type) and issubclass(logical_type, LogicalType)
        ):
            logical_type = str_to_logical_type(logical_type)
        self.logical_type: LogicalType | None = logical_type
        self.use_standard_tags = bool(use_standard_tags)
        self.description = description
        self.origin = origin
        self.metadata = metadata or {}
        tags = _parse_tags(semantic_tags)
        if self.use_standard_tags and self.logical_type is not None:
            tags = tags | set(self.logical_type.standard_tags)
        self.semantic_tags = tags

    # -- tag algebra (reference column_schema.py:180-245) --------------------
    def _add_semantic_tags(self, new_tags, name=""):
        new_tags = _parse_tags(new_tags)
        for tag in ("index", "time_index"):
            if tag in new_tags:
                raise ValueError(
                    f"Cannot add '{tag}' tag directly for column {name}. To set a column as the {tag}, "
                    f"use DataFrame.ww.set_{tag}() instead.",
                )
        self.semantic_tags = self.semantic_tags | new_tags

    def _remove_semantic_tags(self, tags_to_remove, name=""):
        tags_to_remove = _parse_tags(tags_to_remove)
        invalid = tags_to_remove - self.semantic_tags
        if invalid:
            raise LookupError(
                f"Semantic tag(s) '{', '.join(sorted(invalid))}' not present on column '{name}'",
            )
        std = set(self.logical_type.standard_tags) if self.logical_type else set()
        if self.use_standard_tags and tags_to_remove & std:
            raise ValueError(
                f"Cannot remove standard semantic tag(s) '{', '.join(sorted(tags_to_remove & std))}' "
                f"from column '{name}'",
            )
        self.semantic_tags = self.semantic_tags - tags_to_remove

    def _reset_semantic_tags(self):
        self.semantic_tags = (
            set(self.logical_type.standard_tags)
            if (self.use_standard_tags and self.logical_type)
            else set()
        )

    @property
    def is_numeric(self):
        return "numeric" in self.semantic_tags

    @property
    def is_categorical(self):
        return "category" in self.semantic_tags

    @property
    def is_datetime(self):
        from woodwork_spark.logical_types import Datetime

        return isinstance(self.logical_type, Datetime)

    @property
    def is_boolean(self):
        from woodwork_spark.logical_types import BooleanNullable

        return isinstance(self.logical_type, BooleanNullable)

    def __eq__(self, other):
        return (
            isinstance(other, ColumnSchema)
            and self.logical_type == other.logical_type
            and self.semantic_tags == other.semantic_tags
            and self.use_standard_tags == other.use_standard_tags
            and self.description == other.description
            and self.origin == other.origin
            and self.metadata == other.metadata
        )

    def __repr__(self):
        pieces = []
        if self.logical_type is not None:
            pieces.append(f"Logical Type = {self.logical_type}")
        if self.semantic_tags:
            pieces.append(f"Semantic Tags = {sorted(self.semantic_tags)}")
        return f"<ColumnSchema ({', '.join(pieces)})>"

    # -- codec ---------------------------------------------------------------
    def to_metadata(self) -> dict:
        lt = self.logical_type
        return {
            "logical_type": (
                {"type": type(lt).__name__, "parameters": _json_safe(lt.params())}
                if lt is not None
                else None
            ),
            "semantic_tags": sorted(self.semantic_tags),
            "use_standard_tags": self.use_standard_tags,
            "description": self.description,
            "origin": self.origin,
            "metadata": _json_safe(self.metadata),
        }

    @classmethod
    def from_metadata(cls, meta: dict) -> "ColumnSchema":
        lt_info = meta.get("logical_type")
        lt = None
        if lt_info:
            lt = str_to_logical_type(lt_info["type"], params=lt_info.get("parameters") or {})
        obj = cls(
            logical_type=lt,
            semantic_tags=set(meta.get("semantic_tags") or []),
            use_standard_tags=meta.get("use_standard_tags", False),
            description=meta.get("description"),
            origin=meta.get("origin"),
            metadata=meta.get("metadata") or {},
        )
        # from_metadata must not re-add standard tags beyond what was stored
        obj.semantic_tags = set(meta.get("semantic_tags") or [])
        return obj


def _parse_tags(tags):
    if tags is None:
        return set()
    if isinstance(tags, str):
        return {tags}
    return set(tags)


def _json_safe(obj):
    if isinstance(obj, dict):
        return {str(k): _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple, set, frozenset)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, (str, int, float, bool)) or obj is None:
        return obj
    return str(obj)


class TableSchema:
    """Ordered column typing info + table-level name/index/metadata
    (reference table_schema.py:14-110)."""

    def __init__(
        self,
        column_names=None,
        logical_types=None,
        name=None,
        index=None,
        time_index=None,
        semantic_tags=None,
        table_metadata=None,
        use_standard_tags=None,
        column_descriptions=None,
        column_origins=None,
        column_metadata=None,
        columns=None,
    ):
        self.name = name
        self.metadata = table_metadata or {}
        if columns is not None:
            self.columns: dict[str, ColumnSchema] = dict(columns)
        else:
            self.columns = {}
            column_names = list(column_names or [])
            for col in column_names:
                ust = True
                if isinstance(use_standard_tags, dict):
                    ust = use_standard_tags.get(col, True)
                elif use_standard_tags is not None:
                    ust = bool(use_standard_tags)
                self.columns[col] = ColumnSchema(
                    logical_type=(logical_types or {}).get(col),
                    semantic_tags=(semantic_tags or {}).get(col),
                    use_standard_tags=ust,
                    description=(column_descriptions or {}).get(col),
                    origin=(column_origins or {}).get(col)
                    if isinstance(column_origins, dict)
                    else column_origins,
                    metadata=(column_metadata or {}).get(col),
                )
        if index is not None:
            self.set_index(index)
        if time_index is not None:
            self.set_time_index(time_index)

    # -- index management (reference table_schema.py:375-420) ---------------
    @property
    def index(self):
        for name, col in self.columns.items():
            if "index" in col.semantic_tags:
                return name
        return None

    @property
    def time_index(self):
        for name, col in self.columns.items():
            if "time_index" in col.semantic_tags:
                return name
        return None

    def set_index(self, new_index, validate=True):
        old = self.index
        if new_index is not None and new_index not in self.columns:
            raise ColumnNotPresentError(new_index)
        if old is not None:
            self.columns[old].semantic_tags.discard("index")
            if self.columns[old].use_standard_tags and self.columns[old].logical_type:
                self.columns[old].semantic_tags |= set(
                    self.columns[old].logical_type.standard_tags,
                )
        if new_index is not None:
            if new_index == self.time_index:
                raise ValueError(
                    f"{new_index} cannot be both the index and the time index",
                )
            # index columns drop standard tags (reference table_schema.py:783-799)
            self.columns[new_index].semantic_tags -= _STANDARD_TAGS
            self.columns[new_index].semantic_tags.add("index")

    def set_time_index(self, new_time_index, validate=True):
        old = self.time_index
        if new_time_index is not None and new_time_index not in self.columns:
            raise ColumnNotPresentError(new_time_index)
        if old is not None:
            self.columns[old].semantic_tags.discard("time_index")
        if new_time_index is not None:
            if new_time_index == self.index:
                raise ValueError(
                    f"{new_time_index} cannot be both the index and the time index",
                )
            col = self.columns[new_time_index]
            if validate and not (col.is_numeric or col.is_datetime):
                raise TypeError(
                    f"Time index column must be a Datetime or numeric column; "
                    f"{new_time_index} is {col.logical_type}",
                )
            col.semantic_tags.add("time_index")

    # -- accessors -----------------------------------------------------------
    @property
    def logical_types(self):
        return {name: col.logical_type for name, col in self.columns.items()}

    @property
    def semantic_tags(self):
        return {name: set(col.semantic_tags) for name, col in self.columns.items()}

    @property
    def types(self):
        import pandas as pd

        return pd.DataFrame(
            {
                "Column": list(self.columns),
                "Logical Type": [str(c.logical_type) for c in self.columns.values()],
                "Semantic Tag(s)": [sorted(c.semantic_tags) for c in self.columns.values()],
            },
        ).set_index("Column")

    def rename(self, columns: dict):
        new_cols = {}
        for name, col in self.columns.items():
            new_cols[columns.get(name, name)] = col
        out = TableSchema(name=self.name, table_metadata=copy.deepcopy(self.metadata), columns=new_cols)
        return out

    def get_subset_schema(self, subset):
        missing = [c for c in subset if c not in self.columns]
        if missing:
            raise ColumnNotPresentError(missing)
        return TableSchema(
            name=self.name,
            table_metadata=copy.deepcopy(self.metadata),
            columns={c: copy.deepcopy(self.columns[c]) for c in subset},
        )

    def __eq__(self, other):
        return (
            isinstance(other, TableSchema)
            and self.name == other.name
            and self.metadata == other.metadata
            and list(self.columns) == list(other.columns)
            and all(self.columns[c] == other.columns[c] for c in self.columns)
        )

    def __repr__(self):
        return repr(self.types)

    # -- codec: spark StructType <-> TableSchema -----------------------------
    def apply_to_struct(self, struct: T.StructType) -> T.StructType:
        """Return a copy of ``struct`` with ww metadata embedded per field."""
        fields = []
        for f in struct.fields:
            meta = dict(f.metadata or {})
            if f.name in self.columns:
                meta[METADATA_KEY] = self.columns[f.name].to_metadata()
            fields.append(T.StructField(f.name, f.dataType, f.nullable, meta))
        return T.StructType(fields)

    @classmethod
    def from_struct(cls, struct: T.StructType, name=None, table_metadata=None):
        cols = {}
        for f in struct.fields:
            meta = (f.metadata or {}).get(METADATA_KEY)
            if meta is not None:
                cols[f.name] = ColumnSchema.from_metadata(meta)
        if not cols:
            return None
        return cls(name=name, table_metadata=table_metadata or {}, columns=cols)

    # -- typing-info dict (reference serializers/serializer_base.py:137-186) -
    def to_dictionary(self, physical_types=None):
        cols = []
        for i, (name, col) in enumerate(self.columns.items()):
            lt = col.logical_type
            cols.append(
                {
                    "name": name,
                    "ordinal": i,
                    "use_standard_tags": col.use_standard_tags,
                    "logical_type": {
                        "parameters": _json_safe(lt.params()) if lt else {},
                        "type": type(lt).__name__ if lt else None,
                    },
                    "physical_type": {
                        "type": (physical_types or {}).get(name, ""),
                    },
                    "semantic_tags": sorted(col.semantic_tags),
                    "description": col.description,
                    "origin": col.origin,
                    "metadata": _json_safe(col.metadata),
                },
            )
        return {
            "schema_version": SCHEMA_VERSION,
            "name": self.name,
            "index": self.index,
            "time_index": self.time_index,
            "column_typing_info": cols,
            "loading_info": {"table_type": "spark"},
            "table_metadata": _json_safe(self.metadata),
        }

    @classmethod
    def from_dictionary(cls, d: dict):
        cols = {}
        for info in sorted(d.get("column_typing_info", []), key=lambda c: c["ordinal"]):
            lt_info = info.get("logical_type") or {}
            lt = (
                str_to_logical_type(lt_info["type"], params=lt_info.get("parameters") or {})
                if lt_info.get("type")
                else None
            )
            c = ColumnSchema(
                logical_type=lt,
                semantic_tags=set(info.get("semantic_tags") or []),
                use_standard_tags=info.get("use_standard_tags", False),
                description=info.get("description"),
                origin=info.get("origin"),
                metadata=info.get("metadata") or {},
            )
            c.semantic_tags = set(info.get("semantic_tags") or [])
            cols[info["name"]] = c
        return cls(
            name=d.get("name"),
            table_metadata=d.get("table_metadata") or {},
            columns=cols,
        )
