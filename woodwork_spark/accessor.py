"""WWDataFrame — the typed-table accessor over pyspark.sql.DataFrame.

Re-expresses the reference's ``df.ww`` accessor surface
(/root/reference/woodwork/table_accessor.py:39-1866) for Spark.  Key
differences, by design (SURVEY §1.1, §7.3):

- Spark DataFrames are immutable: every operation returns a NEW
  ``WWDataFrame`` (no in-place mutation, no weakref invalidation).
- Typing info lives in ``StructField.metadata["ww"]`` and travels through
  select/withColumn/join; the ``TableSchema`` facade mirrors it.
- Type coercion for the whole table is ONE ``select`` projection (built
  from each LogicalType's ``transform_expr``), fused by Catalyst — not a
  per-column loop of jobs.
- Validation (index uniqueness, non-null, type validators) runs as Spark
  aggregations, never ``collect()`` of data.
"""

from __future__ import annotations

import copy

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from woodwork_spark.exceptions import (
    ColumnNotPresentError,
    TypeConversionError,
    WoodworkNotInitError,
)
from woodwork_spark.logical_types import (
    Boolean,
    BooleanNullable,
    Datetime,
    LogicalType,
    Ordinal,
    str_to_logical_type,
)
from woodwork_spark.schema import ColumnSchema, TableSchema
from woodwork_spark.type_sys.type_system import type_system


def init(
    df: DataFrame,
    name=None,
    index=None,
    time_index=None,
    logical_types=None,
    semantic_tags=None,
    table_metadata=None,
    column_metadata=None,
    column_descriptions=None,
    column_origins=None,
    use_standard_tags=True,
    already_sorted=False,
    schema: TableSchema | None = None,
    validate=True,
    sample_size=None,
    null_invalid_values=False,
) -> "WWDataFrame":
    """Initialize a typed table (reference table_accessor.py:44-273).

    Priority: explicit ``logical_types`` > existing ``schema`` (full or
    partial) > inference — the reference's init_with_partial_schema
    semantics (table_accessor.py:126-273).

    ``null_invalid_values`` (reference table_accessor.py:143): when True,
    values violating their resolved logical type (negative ages,
    regex-failing emails/phones/urls/postal codes, non-integral integers)
    coerce to null during the transform instead of raising at validation.
    """
    if validate:
        _validate_unique_columns(df)
    forced = {
        col: str_to_logical_type(lt) for col, lt in (logical_types or {}).items()
    }
    if validate:
        missing = set(forced) - set(df.columns)
        if missing:
            raise ColumnNotPresentError(sorted(missing))
    existing = dict(schema.columns) if schema is not None else {}

    # a partial-schema column with no logical type still needs inference
    to_infer = [
        c
        for c in df.columns
        if c not in forced
        and (c not in existing or existing[c].logical_type is None)
    ]
    inferred = (
        type_system.infer_logical_types(df, columns=to_infer, sample_size=sample_size)
        if to_infer
        else {}
    )

    resolved: dict[str, LogicalType] = {}
    for col in df.columns:
        if col in forced:
            resolved[col] = forced[col]
        elif col in existing and existing[col].logical_type is not None:
            resolved[col] = existing[col].logical_type
        else:
            resolved[col] = inferred[col]

    # string columns resolving to Datetime without an explicit format:
    # infer the strftime format from a bounded sample and pin it (the
    # reference does the same inside Datetime.transform,
    # logical_types.py:326-369) — the pinned format makes the coercion a
    # single to_timestamp instead of a coalesce over fallback patterns
    src_types_pre = {f.name: f.dataType for f in df.schema.fields}
    for col, lt in resolved.items():
        if (
            isinstance(lt, Datetime)
            and lt.datetime_format is None
            and isinstance(src_types_pre[col], T.StringType)
        ):
            from woodwork_spark.table_utils import infer_datetime_format

            sample_vals = [
                r[0]
                for r in df.select(col).filter(F.col(col).isNotNull()).limit(100).collect()
            ]
            fmt = infer_datetime_format(sample_vals)
            if fmt:
                resolved[col] = Datetime(datetime_format=fmt, timezone=lt.timezone)

    # Single projection applying every transform — one Catalyst-fused pass.
    src_types = {f.name: f.dataType for f in df.schema.fields}
    exprs = []
    for col in df.columns:
        lt = resolved[col]
        expr = lt.transform_expr(F.col(col), src_types[col], null_invalid_values)
        exprs.append(expr.alias(col))
    out = df.select(*exprs)

    columns = {}
    for col in df.columns:
        if col in existing and col not in forced:
            cs = copy.deepcopy(existing[col])
            if cs.logical_type is None:
                cs = ColumnSchema(
                    logical_type=resolved[col],
                    semantic_tags=cs.semantic_tags,
                    use_standard_tags=use_standard_tags,
                    description=cs.description,
                    origin=cs.origin,
                    metadata=cs.metadata,
                )
        else:
            cs = ColumnSchema(
                logical_type=resolved[col],
                semantic_tags=(semantic_tags or {}).get(col),
                use_standard_tags=use_standard_tags,
                description=(column_descriptions or {}).get(col),
                origin=(column_origins or {}).get(col),
                metadata=(column_metadata or {}).get(col),
            )
        columns[col] = cs

    table_schema = TableSchema(
        name=name or (schema.name if schema else None),
        table_metadata=table_metadata or (schema.metadata if schema else {}),
        columns=columns,
    )
    if index is None and schema is not None:
        index = schema.index
    if time_index is None and schema is not None:
        time_index = schema.time_index
    if index is not None:
        table_schema.set_index(index)
    if time_index is not None:
        table_schema.set_time_index(time_index)

    ww_df = WWDataFrame(out, table_schema)
    if validate and index is not None:
        ww_df._validate_index(index)
    if validate:
        ww_df._validate_logical_type_constraints(resolved)
        _validate_ordinals(out, resolved)
    return ww_df


def _validate_ordinals(df: DataFrame, resolved: dict):
    """Ordinal membership check (reference Ordinal._validate_data
    logical_types.py:639-645): every non-null value must appear in the
    declared order.  One filtered distinct per ordinal column, bounded."""
    from woodwork_spark.exceptions import TypeValidationError

    for col, lt in resolved.items():
        if isinstance(lt, Ordinal):
            bad = (
                df.select(col)
                .filter(
                    F.col(col).isNotNull()
                    & ~F.col(col).cast("string").isin([str(v) for v in lt.order]),
                )
                .distinct()
                .limit(10)
                .collect()
            )
            if bad:
                raise TypeValidationError(
                    f"Ordinal column {col} contains values not present in the "
                    f"order values provided: {sorted(r[0] for r in bad)}",
                )


def init_with_full_schema(df: DataFrame, schema: TableSchema, validate=True) -> "WWDataFrame":
    """Attach a known schema without inference/coercion
    (reference table_accessor.py:98-124)."""
    if validate:
        message = get_invalid_schema_message(df, schema)
        if message:
            raise ValueError(f"Provided schema must be valid for the DataFrame: {message}")
    return WWDataFrame(df, copy.deepcopy(schema))


def get_invalid_schema_message(df: DataFrame, schema: TableSchema):
    """Structural compatibility check — pure metadata compare, no data scan
    (reference accessor_utils.py:84-128 needed a dtype scan; Spark doesn't)."""
    df_cols = set(df.columns)
    schema_cols = set(schema.columns)
    if df_cols != schema_cols:
        return (
            f"The following columns in the DataFrame were missing from the typing information: "
            f"{df_cols - schema_cols or schema_cols - df_cols}"
        )
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    for name, col in schema.columns.items():
        if col.logical_type is None:
            continue
        expected = col.logical_type.spark_dtype
        if not _dtype_compatible(dtypes[name], expected):
            return (
                f"dtype mismatch for column {name} between DataFrame dtype, "
                f"{dtypes[name].simpleString()}, and {col.logical_type} dtype, {expected.simpleString()}"
            )
    return None


def is_schema_valid(df: DataFrame, schema: TableSchema) -> bool:
    """Boolean wrapper over :func:`get_invalid_schema_message`
    (reference ``accessor_utils.py:131``, exported top-level)."""
    return get_invalid_schema_message(df, schema) is None


def _dtype_compatible(actual: T.DataType, expected: T.DataType) -> bool:
    numeric_long = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
    if isinstance(expected, T.LongType) and isinstance(actual, numeric_long):
        return True
    if isinstance(expected, T.DoubleType) and isinstance(actual, (T.DoubleType, T.FloatType)):
        return True
    if isinstance(expected, T.TimestampType) and isinstance(
        actual,
        (T.TimestampType, T.TimestampNTZType),
    ):
        return True
    if isinstance(expected, T.StructType) and isinstance(actual, T.StructType):
        return len(expected.fields) == len(actual.fields)
    return actual.simpleString() == expected.simpleString()


def _validate_unique_columns(df: DataFrame):
    seen = set()
    for c in df.columns:
        if c in seen:
            raise IndexError(f"Dataframe cannot contain duplicate columns names: {c}")
        seen.add(c)


class WWDataFrame:
    """A Spark DataFrame + TableSchema pair.  All reference accessor methods
    live here; underlying DataFrame ops pass through with schema carry."""

    def __init__(self, df: DataFrame, schema: TableSchema):
        self._df = df
        self._schema = schema

    def __eq__(self, other, deep=True):
        """Typed-table equality (reference table_accessor.py:275-282):
        schemas must match; with ``deep`` the data must too.  The deep
        compare is exact and distributed — symmetric ``exceptAll``
        emptiness (two jobs), the Spark analog of ``DataFrame.equals``
        minus row order, which a distributed table does not have."""
        if not isinstance(other, WWDataFrame):
            return NotImplemented
        if self._schema != other._schema:
            return False
        if not deep:
            return True
        if self._df is other._df:
            return True
        a, b = self._df, other._df
        if a.schema != b.schema:
            return False
        return (
            a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
        )

    __hash__ = object.__hash__  # defining __eq__ would otherwise drop it

    def _repr_html_(self):
        """Notebook display: the types table (reference _repr_html_)."""
        return self.types.to_html()

    # -- basic properties ----------------------------------------------------
    @property
    def df(self) -> DataFrame:
        """Underlying Spark DataFrame with ww metadata embedded per field."""
        out = self._df
        struct = self._schema.apply_to_struct(out.schema)
        for f in struct.fields:
            if f.metadata:
                out = out.withMetadata(f.name, f.metadata)
        return out

    @property
    def raw(self) -> DataFrame:
        return self._df

    @property
    def schema(self) -> TableSchema:
        return self._schema

    @property
    def name(self):
        return self._schema.name

    @property
    def index(self):
        return self._schema.index

    @property
    def time_index(self):
        return self._schema.time_index

    @property
    def columns(self):
        return list(self._df.columns)

    @property
    def logical_types(self):
        return self._schema.logical_types

    @property
    def physical_types(self):
        return {f.name: f.dataType for f in self._df.schema.fields}

    @property
    def semantic_tags(self):
        return self._schema.semantic_tags

    @property
    def types(self):
        import pandas as pd

        phys = self.physical_types
        return pd.DataFrame(
            {
                "Column": self.columns,
                "Physical Type": [phys[c].simpleString() for c in self.columns],
                "Logical Type": [str(self._schema.columns[c].logical_type) for c in self.columns],
                "Semantic Tag(s)": [
                    sorted(self._schema.columns[c].semantic_tags) for c in self.columns
                ],
            },
        ).set_index("Column")

    @property
    def metadata(self):
        return self._schema.metadata

    @property
    def shape(self):
        """(n_rows, n_columns) — row count is an action."""
        return (self._df.count(), len(self.columns))

    @property
    def nullable(self):
        """Per-column nullability by LOGICAL type (reference
        series.ww.nullable, column_accessor.py:138-141): Spark columns
        are physically always nullable; Integer/Boolean (non-nullable
        variants) declare the logical contract."""
        from woodwork_spark.logical_types import Boolean, Integer

        out = {}
        for c, cs in self._schema.columns.items():
            lt = cs.logical_type
            out[c] = not (type(lt) in (Integer, Boolean))
        return out

    def __repr__(self):
        return f"<WWDataFrame name={self.name!r} cols={len(self.columns)}>"

    # -- validation (aggregations, not collects) ------------------------------
    def _validate_index(self, index):
        c = F.col(index)
        row = self._df.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(c).alias("nn"),
            F.count_distinct(c).alias("nd"),
        ).collect()[0]
        if row["nn"] < row["n"]:
            raise IndexError("Index contains null values")
        if row["nd"] < row["nn"]:
            raise IndexError("Index column must be unique")

    def _validate_logical_type_constraints(self, resolved):
        """Boolean/Integer (non-nullable) init-time null assertion
        (SURVEY §1.3: Spark columns are always nullable, so the
        non-nullable contract becomes an aggregate check)."""
        checks = []
        for col, lt in resolved.items():
            if type(lt) in (Boolean, ) and lt.params().get("cast_nulls_as") is None:
                checks.append(col)
        if not checks:
            return
        aggs = [
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(c) for c in checks
        ]
        row = self._df.agg(*aggs).collect()[0].asDict()
        for c, nulls in row.items():
            if nulls:
                raise TypeConversionError(
                    f"Error converting datatype for {c}: Boolean column contains "
                    f"{nulls} null values; use BooleanNullable or cast_nulls_as.",
                )

    # -- schema ops (reference table_accessor.py:495-879) ---------------------
    def _with(self, df=None, schema=None) -> "WWDataFrame":
        return WWDataFrame(
            df if df is not None else self._df,
            schema if schema is not None else copy.deepcopy(self._schema),
        )

    def set_index(self, new_index, validate=True) -> "WWDataFrame":
        schema = copy.deepcopy(self._schema)
        schema.set_index(new_index)
        out = self._with(schema=schema)
        if validate and new_index is not None:
            out._validate_index(new_index)
        return out

    def set_time_index(self, new_time_index) -> "WWDataFrame":
        schema = copy.deepcopy(self._schema)
        schema.set_time_index(new_time_index)
        return self._with(schema=schema)

    def set_types(
        self,
        logical_types=None,
        semantic_tags=None,
        retain_index_tags=True,
        null_invalid_values=False,
    ) -> "WWDataFrame":
        """Recast columns (reference table_accessor.py:525-565): metadata
        update + one projection for the changed columns only.
        ``null_invalid_values`` coerces type-violating values to null
        instead of leaving them to fail validation (reference
        table_accessor.py:531-562)."""
        logical_types = {
            c: str_to_logical_type(lt) for c, lt in (logical_types or {}).items()
        }
        for c in list(logical_types) + list(semantic_tags or {}):
            if c not in self._schema.columns:
                raise ColumnNotPresentError(c)
        schema = copy.deepcopy(self._schema)
        src_types = self.physical_types
        old_index, old_time_index = schema.index, schema.time_index
        exprs = []
        for col in self.columns:
            if col in logical_types:
                lt = logical_types[col]
                exprs.append(
                    lt.transform_expr(
                        F.col(col), src_types[col], null_invalid_values,
                    ).alias(col),
                )
                old = schema.columns[col]
                schema.columns[col] = ColumnSchema(
                    logical_type=lt,
                    semantic_tags=(
                        old.semantic_tags
                        - (set(old.logical_type.standard_tags) if old.logical_type else set())
                        - {"index", "time_index"}
                    ),
                    use_standard_tags=old.use_standard_tags,
                    description=old.description,
                    origin=old.origin,
                    metadata=old.metadata,
                )
            else:
                exprs.append(F.col(col))
        for col, tags in (semantic_tags or {}).items():
            schema.columns[col]._add_semantic_tags(tags, col)
        if retain_index_tags:
            if old_index is not None:
                schema.set_index(old_index)
            if old_time_index is not None:
                schema.set_time_index(old_time_index)
        df = self._df.select(*exprs) if logical_types else self._df
        _validate_ordinals(df, logical_types)
        return self._with(df=df, schema=schema)

    def add_semantic_tags(self, semantic_tags: dict) -> "WWDataFrame":
        schema = copy.deepcopy(self._schema)
        for col, tags in semantic_tags.items():
            if col not in schema.columns:
                raise ColumnNotPresentError(col)
            schema.columns[col]._add_semantic_tags(tags, col)
        return self._with(schema=schema)

    def remove_semantic_tags(self, semantic_tags: dict) -> "WWDataFrame":
        schema = copy.deepcopy(self._schema)
        for col, tags in semantic_tags.items():
            if col not in schema.columns:
                raise ColumnNotPresentError(col)
            schema.columns[col]._remove_semantic_tags(tags, col)
        return self._with(schema=schema)

    def reset_semantic_tags(self, columns=None, retain_index_tags=False) -> "WWDataFrame":
        schema = copy.deepcopy(self._schema)
        columns = [columns] if isinstance(columns, str) else (columns or self.columns)
        old_index, old_time_index = schema.index, schema.time_index
        for col in columns:
            if col not in schema.columns:
                raise ColumnNotPresentError(col)
            schema.columns[col]._reset_semantic_tags()
        if retain_index_tags:
            if old_index in columns:
                schema.set_index(old_index)
            if old_time_index in columns:
                schema.set_time_index(old_time_index)
        return self._with(schema=schema)

    def rename(self, columns: dict) -> "WWDataFrame":
        for old in columns:
            if old not in self._schema.columns:
                raise ColumnNotPresentError(old)
        df = self._df.withColumnsRenamed(columns)
        return self._with(df=df, schema=self._schema.rename(columns))

    def drop(self, columns) -> "WWDataFrame":
        columns = [columns] if isinstance(columns, str) else list(columns)
        missing = [c for c in columns if c not in self._schema.columns]
        if missing:
            raise ColumnNotPresentError(missing)
        keep = [c for c in self.columns if c not in set(columns)]
        return self._getitem_list(keep)

    def pop(self, column):
        """Returns (single-column WWDataFrame, remainder WWDataFrame)."""
        popped = self._getitem_list([column])
        rest = self.drop(column)
        return popped, rest

    def _getitem_list(self, keys):
        missing = [c for c in keys if c not in self._schema.columns]
        if missing:
            raise ColumnNotPresentError(missing)
        return self._with(
            df=self._df.select(*keys),
            schema=self._schema.get_subset_schema(keys),
        )

    def __getitem__(self, key):
        if isinstance(key, list):
            return self._getitem_list(key)
        return self._getitem_list([key])

    def with_column(self, name, col, logical_type=None) -> "WWDataFrame":
        """Typed ``withColumn``: new/replaced columns get explicit type or
        inference (reference __setitem__ table_accessor.py:314-342)."""
        df = self._df.withColumn(name, col)
        schema = copy.deepcopy(self._schema)
        if logical_type is not None:
            lt = str_to_logical_type(logical_type)
            src = {f.name: f.dataType for f in df.schema.fields}[name]
            df = df.withColumn(name, lt.transform_expr(F.col(name), src))
            schema.columns[name] = ColumnSchema(logical_type=lt, use_standard_tags=True)
        else:
            inferred = type_system.infer_logical_types(df, columns=[name])[name]
            schema.columns[name] = ColumnSchema(logical_type=inferred, use_standard_tags=True)
        return WWDataFrame(df, schema)

    # -- typed selection (reference table_accessor.py:567-601) ----------------
    def select(self, include=None, exclude=None) -> "WWDataFrame":
        if include is not None and exclude is not None:
            raise ValueError("Cannot specify both include and exclude")
        selectors = include if include is not None else exclude
        if isinstance(selectors, (str, type, LogicalType)):
            selectors = [selectors]
        matched = self._filter_cols(selectors)
        if include is not None:
            keep = [c for c in self.columns if c in matched]
        else:
            keep = [c for c in self.columns if c not in matched]
        return self._getitem_list(keep)

    def _filter_cols(self, selectors):
        """Match columns by logical type (class, instance, or string), by
        semantic tag, or by name (reference table_schema.py:474-563)."""
        matched = set()
        for sel in selectors:
            for name, cs in self._schema.columns.items():
                lt = cs.logical_type
                if isinstance(sel, type) and issubclass(sel, LogicalType):
                    if type(lt) is sel:
                        matched.add(name)
                elif isinstance(sel, LogicalType):
                    if lt == sel:
                        matched.add(name)
                elif isinstance(sel, str):
                    if name == sel:
                        matched.add(name)
                    elif lt is not None and (
                        str(lt) == sel or type(lt).type_string() == sel
                    ):
                        matched.add(name)
                    elif sel in cs.semantic_tags:
                        matched.add(name)
        return matched

    # -- typed row/column indexers (reference indexers.py:9-49) ---------------
    @property
    def loc(self):
        """Label-based indexer: rows select on the schema's index column
        (predicate-pushed point lookups), cols subset the typed schema."""
        from woodwork_spark.indexers import LocIndexer

        return LocIndexer(self)

    @property
    def iloc(self):
        """Positional indexer — only ``iloc[:n]`` (limit) and column
        positions are well-defined on a distributed table."""
        from woodwork_spark.indexers import ILocIndexer

        return ILocIndexer(self)

    # -- pandas-style passthrough (reference table_accessor.py:284-294) -------
    def __getattr__(self, attr):
        if attr.startswith("_"):
            raise AttributeError(attr)
        target = getattr(self._df, attr, None)
        if target is None:
            raise AttributeError(
                f"Woodwork has no attribute '{attr}' and neither does the DataFrame",
            )
        if not callable(target):
            return target

        def wrapper(*args, **kwargs):
            # typed tables passed as arguments unwrap to their Spark
            # DataFrames (t.join(other_t, ...) just works)
            args = tuple(
                a.raw if isinstance(a, WWDataFrame) else a for a in args
            )
            kwargs = {
                k: (v.raw if isinstance(v, WWDataFrame) else v)
                for k, v in kwargs.items()
            }
            result = target(*args, **kwargs)
            if isinstance(result, DataFrame):
                if set(result.columns) == set(self.columns):
                    # schema still structurally valid -> carry it forward
                    sub = self._schema.get_subset_schema(list(result.columns))
                    return WWDataFrame(result, sub)
                common = [c for c in result.columns if c in self._schema.columns]
                if common:
                    partial = TableSchema(
                        name=self._schema.name,
                        table_metadata=copy.deepcopy(self._schema.metadata),
                        columns={
                            c: copy.deepcopy(self._schema.columns[c]) for c in common
                        },
                    )
                    return init_with_full_schema(result, partial, validate=False)
                return result
            return result

        return wrapper

    # -- validation suite ------------------------------------------------------
    def validate_logical_types(self, return_invalid_values=False):
        """Run per-type validators (reference table_accessor.py:1639-1662).

        Returns {column: invalid-row DataFrame} when requested, else
        {column: invalid-count} computed in ONE aggregation pass.
        """
        exprs = {}
        for name, cs in self._schema.columns.items():
            lt = cs.logical_type
            if lt is None:
                continue
            cond = lt.invalid_expr(F.col(name))
            if cond is not None:
                exprs[name] = cond & F.col(name).isNotNull()
        if return_invalid_values:
            return {
                name: self._df.filter(cond).select(name)
                for name, cond in exprs.items()
            }
        if not exprs:
            return {}
        aggs = [
            F.sum(F.when(cond, 1).otherwise(0)).alias(name)
            for name, cond in exprs.items()
        ]
        row = self._df.agg(*aggs).collect()[0].asDict()
        return {k: (v or 0) for k, v in row.items()}

    # -- statistics facade (implementations in woodwork_spark.statistics) -----
    def describe(self, include=None, callback=None, results_callback=None):
        from woodwork_spark.statistics.describe import describe

        return describe(
            self,
            include=include,
            callback=callback,
            results_callback=results_callback,
        )

    def describe_dict(self, include=None, callback=None, results_callback=None):
        from woodwork_spark.statistics.describe import describe_dict

        return describe_dict(
            self,
            include=include,
            callback=callback,
            results_callback=results_callback,
        )

    def value_counts(self, ascending=False, top_n=10, dropna=False):
        from woodwork_spark.statistics.value_counts import value_counts

        return value_counts(self, ascending=ascending, top_n=top_n, dropna=dropna)

    def dependence(
        self,
        measures="all",
        num_bins=10,
        nrows=None,
        min_shared=25,
        random_seed=0,
        target_col=None,
        callback=None,
    ):
        from woodwork_spark.statistics.dependence import dependence

        return dependence(
            self,
            measures=measures,
            num_bins=num_bins,
            nrows=nrows,
            min_shared=min_shared,
            random_seed=random_seed,
            target_col=target_col,
            callback=callback,
        )

    def dependence_dict(self, **kwargs):
        """List-of-dicts shape (reference dependence_dict)."""
        return self.dependence(**kwargs).to_dict(orient="records")

    def mutual_information(self, num_bins=10, nrows=None, min_shared=25, random_seed=0):
        return self.dependence(
            measures=["mutual_info"],
            num_bins=num_bins,
            nrows=nrows,
            min_shared=min_shared,
            random_seed=random_seed,
        )

    def mutual_information_dict(self, **kwargs):
        return self.mutual_information(**kwargs).to_dict(orient="records")

    def pearson_correlation(self, nrows=None, min_shared=25, random_seed=0):
        return self.dependence(
            measures=["pearson"], nrows=nrows, min_shared=min_shared, random_seed=random_seed,
        )

    def pearson_correlation_dict(self, **kwargs):
        return self.pearson_correlation(**kwargs).to_dict(orient="records")

    def spearman_correlation(self, nrows=None, min_shared=25, random_seed=0):
        return self.dependence(
            measures=["spearman"], nrows=nrows, min_shared=min_shared, random_seed=random_seed,
        )

    def spearman_correlation_dict(self, **kwargs):
        return self.spearman_correlation(**kwargs).to_dict(orient="records")

    def get_valid_mi_columns(self, include_index=False, include_time_index=False):
        """Columns whose logical types support mutual information
        (reference table_accessor.py:1435-1452)."""
        from woodwork_spark.statistics.dependence import _measure_columns

        return _measure_columns(
            self,
            ["mutual_info"],
            include_index=include_index,
            include_time_index=include_time_index,
        )["mutual_info"]

    def box_plot_dict(self, column, quantiles=None, max_values=None):
        from woodwork_spark.statistics.outliers import box_plot_dict

        return box_plot_dict(self, column, quantiles=quantiles, max_values=max_values)

    def medcouple_dict(self, column, sample_mode="random", max_values=None):
        from woodwork_spark.statistics.outliers import medcouple_dict

        return medcouple_dict(
            self, column, sample_mode=sample_mode, max_values=max_values,
        )

    def get_outliers(self, column, method="best", sample_mode="random", max_values=None):
        from woodwork_spark.statistics.outliers import get_outliers

        return get_outliers(
            self, column, method=method, sample_mode=sample_mode, max_values=max_values,
        )

    def infer_temporal_frequencies(self, temporal_columns=None, debug=False):
        from woodwork_spark.statistics.frequency import infer_temporal_frequencies

        return infer_temporal_frequencies(
            self, temporal_columns=temporal_columns, debug=debug,
        )

    # -- serialization ---------------------------------------------------------
    def to_dictionary(self):
        return self._schema.to_dictionary(
            physical_types={c: t.simpleString() for c, t in self.physical_types.items()},
        )

    def to_disk(self, path, format="parquet", **kwargs):
        from woodwork_spark.serializers import to_disk

        return to_disk(self, path, format=format, **kwargs)

    def to_archive(self, path, format="parquet", **kwargs):
        from woodwork_spark.serializers import to_archive

        return to_archive(self, path, format=format, **kwargs)
