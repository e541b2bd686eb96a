"""Table-level utilities: concat_columns, init_series, datetime-format
inference.

Reference: ww.concat_columns (utils.py:422-541), init_series
(accessor_utils.py:10-69), datetime format inference (utils.py:595-650).
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from woodwork_spark.accessor import WWDataFrame, init
from woodwork_spark.schema import TableSchema


def concat_columns(objs, validate_schema=True) -> WWDataFrame:
    """Width-wise concatenation of typed tables (reference
    utils.py:422-541): joins on the (single, shared) index column when
    every input has one, else zips by ``monotonically_increasing_id`` +
    row_number (positional concat — requires equal row counts and stable
    input ordering, like the pandas original).

    Rules preserved from the reference: at most one index and one
    time_index across inputs; duplicate column names rejected; table
    name/metadata taken from the first object carrying them.
    """
    if not objs:
        raise ValueError("No objects to concatenate")
    wws = list(objs)
    seen_cols = set()
    index_owner = None
    time_index_owner = None
    name = None
    metadata = {}
    for o in wws:
        if not isinstance(o, WWDataFrame):
            raise TypeError("concat_columns expects WWDataFrame inputs")
        dup = seen_cols & set(o.columns) - (
            {o.index} if o.index and index_owner is not None else set()
        )
        for c in o.columns:
            if o.index == c:
                continue
            if c in seen_cols:
                raise ValueError(
                    f"Duplicate column '{c}' has been found in more than one DataFrame",
                )
            seen_cols.add(c)
        if o.index is not None:
            if index_owner is not None and index_owner.index != o.index:
                raise IndexError(
                    "Cannot set the Woodwork index of multiple input objects",
                )
            index_owner = index_owner or o
        if o.time_index is not None:
            if time_index_owner is not None:
                raise IndexError(
                    "Cannot set the Woodwork time index of multiple input objects",
                )
            time_index_owner = o
        if name is None and o.name is not None:
            name = o.name
        if not metadata and o.metadata:
            metadata = dict(o.metadata)

    index = index_owner.index if index_owner is not None else None
    all_have_index = index is not None and all(
        index in o.columns for o in wws
    )
    if all_have_index:
        joined = wws[0].raw
        for o in wws[1:]:
            joined = joined.join(o.raw, on=index, how="outer")
    else:
        # positional zip: stable per-input row numbering
        from pyspark.sql import Window as W

        frames = []
        for o in wws:
            w = W.orderBy(F.monotonically_increasing_id())
            frames.append(
                o.raw.withColumn("__pos", F.row_number().over(w) - 1),
            )
        joined = frames[0]
        for f in frames[1:]:
            joined = joined.join(f, on="__pos", how="outer")
        joined = joined.drop("__pos")

    columns = {}
    for o in wws:
        for c, cs in o.schema.columns.items():
            if c not in columns:
                import copy

                columns[c] = copy.deepcopy(cs)
    schema = TableSchema(name=name, table_metadata=metadata, columns=columns)
    out = WWDataFrame(joined.select(*columns.keys()), schema)
    if validate_schema and index is not None:
        out._validate_index(index)
    return out


def init_series(df, column, logical_type=None, **kwargs) -> WWDataFrame:
    """Single-column init (reference init_series accessor_utils.py:10-69):
    returns a one-column typed table."""
    single = df.select(column)
    lts = {column: logical_type} if logical_type is not None else None
    return init(single, logical_types=lts, **kwargs)


# -- datetime format inference ------------------------------------------------

_CANDIDATE_FORMATS = [
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%m/%d/%Y %H:%M:%S",
    "%m/%d/%Y",
    "%m-%d-%Y",
    "%m-%d-%y",
    "%m/%d/%y",
    "%d/%m/%Y",
    "%d-%m-%Y",
    "%Y%m%d",
    "%b %d, %Y",
    "%Y~%m~%d",
]


def infer_datetime_format(values, n=100):
    """Infer a strftime format from a bounded sample of string values
    (reference utils.py:595-650: 100-row sample).  Tries the candidate
    formats plus separator-generalized variants; returns the first format
    that parses every sampled value, else None."""
    import pandas as pd

    sample = [str(v) for v in values[:n] if v is not None]
    if not sample:
        return None
    candidates = list(_CANDIDATE_FORMATS)
    # generalize separators seen in the data
    probe = sample[0]
    seps = set(re.findall(r"[^0-9A-Za-z]", probe))
    for sep in seps:
        if sep not in "-/~ :":
            candidates.extend(
                [f.replace("-", sep) for f in _CANDIDATE_FORMATS if "-" in f],
            )
    for fmt in candidates:
        try:
            parsed = pd.to_datetime(pd.Series(sample), format=fmt, errors="coerce")
        except (ValueError, TypeError):
            continue
        if not parsed.isna().any():
            return fmt
    return None


def schema_drift(old: WWDataFrame, new: WWDataFrame) -> "list[dict]":
    """Typed-schema diff between two table versions — the governance
    twin of the PSI data-drift report: a pipeline gate needs to know a
    column vanished, appeared, or changed logical type BEFORE value
    distributions are even comparable.

    Returns one dict per differing column:
    {column, status ('added'|'removed'|'type_changed'|'tags_changed'),
    old_type, new_type, old_tags, new_tags}.  Driver-side over the two
    schemas only — no data is read, so it is free at any scale.
    """
    rows = []
    old_lt = {c: type(t).__name__ for c, t in old.logical_types.items()}
    new_lt = {c: type(t).__name__ for c, t in new.logical_types.items()}
    old_tags = {c: sorted(v) for c, v in old.semantic_tags.items()}
    new_tags = {c: sorted(v) for c, v in new.semantic_tags.items()}
    for c in old.columns:
        if c not in new_lt:
            rows.append({
                "column": c, "status": "removed",
                "old_type": old_lt[c], "new_type": None,
                "old_tags": ",".join(old_tags[c]), "new_tags": None,
            })
        elif old_lt[c] != new_lt[c]:
            rows.append({
                "column": c, "status": "type_changed",
                "old_type": old_lt[c], "new_type": new_lt[c],
                "old_tags": ",".join(old_tags[c]),
                "new_tags": ",".join(new_tags[c]),
            })
        elif old_tags[c] != new_tags[c]:
            rows.append({
                "column": c, "status": "tags_changed",
                "old_type": old_lt[c], "new_type": new_lt[c],
                "old_tags": ",".join(old_tags[c]),
                "new_tags": ",".join(new_tags[c]),
            })
    for c in new.columns:
        if c not in old_lt:
            rows.append({
                "column": c, "status": "added",
                "old_type": None, "new_type": new_lt[c],
                "old_tags": None, "new_tags": ",".join(new_tags[c]),
            })
    return rows


def union_evolve(dfs, widen: bool = True):
    """Union DataFrames whose schemas drifted apart — the daily reality
    of long-lived ingest pipelines (new columns appear, int columns
    widen to long/double): missing columns fill with typed NULLs, and
    columns whose types differ across inputs widen to the least common
    numeric type (``widen=True``; int->long->double; anything else
    falls back to string only when genuinely mixed).  Column order
    follows first appearance across ``dfs``.

    Pure plan surgery — per-input projections + ``unionByName``; no
    shuffle, no data movement beyond the union itself.  Raises on an
    empty input list.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    dfs = list(dfs)
    if not dfs:
        raise ValueError("union_evolve needs at least one DataFrame")

    _rank = {
        "byte": 0, "short": 1, "integer": 2, "long": 3,
        "float": 4, "double": 5,
    }

    def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
        if a == b:
            return a

        def _name(d):
            # decimals widen like doubles (documented precision trade)
            if isinstance(d, T.DecimalType):
                return "double"
            n = d.simpleString()
            return {"tinyint": "byte", "smallint": "short",
                    "int": "integer", "bigint": "long"}.get(n, n)

        an, bn = _name(a), _name(b)
        if widen and an in _rank and bn in _rank:
            return (
                T.DoubleType() if max(_rank[an], _rank[bn]) >= 4
                else T.LongType() if max(_rank[an], _rank[bn]) >= 3
                else T.IntegerType()
            )
        return T.StringType()

    target: dict = {}
    order: list = []
    for df in dfs:
        for f in df.schema.fields:
            if f.name not in target:
                target[f.name] = f.dataType
                order.append(f.name)
            else:
                target[f.name] = _widen(target[f.name], f.dataType)

    out = None
    for df in dfs:
        have = {f.name: f.dataType for f in df.schema.fields}
        proj = df.select(
            *[
                (
                    F.col(c).cast(target[c])
                    if c in have
                    else F.lit(None).cast(target[c])
                ).alias(c)
                for c in order
            ],
        )
        out = proj if out is None else out.unionByName(proj)
    return out


def explain_report(df) -> dict:
    """Plan-health introspection: one dict summarizing what the
    physical plan will actually do — the numbers PLANS.md reasons
    about, extractable programmatically for CI gates ("this pipeline
    must stay broadcast-only", "no Python eval nodes allowed"):

    ``n_exchanges`` (shuffles), ``n_broadcasts``,
    ``n_single_partition`` (global single-reducer exchanges),
    ``n_sort_merge_joins``, ``n_broadcast_joins``, ``n_cartesian``,
    ``n_python_eval`` (BatchEvalPython/ArrowEvalPython nodes),
    ``whole_stage_codegen`` (bool — under AQE this reflects the plan's
    CURRENT state: call after an action for the final answer),
    ``pushed_filters`` (bool), ``scan_columns`` (ReadSchema column
    count of the first scan, or None).

    Driver-side string inspection of the executed plan — zero jobs.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    cg = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("codegen"),
    )
    formatted = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"),
    )
    scan_cols = None
    if "ReadSchema:" in formatted:
        schema_line = formatted.split("ReadSchema:")[1].splitlines()[0]
        # top-level fields only: commas at struct-nesting depth 1;
        # truncated schemas ("N more fields") are indeterminate
        if "more fields" in schema_line:
            scan_cols = None
        else:
            body = schema_line.strip()
            start = body.find("struct<")
            if start >= 0:
                depth, fields = 0, 0
                for ch in body[start + len("struct<"):]:
                    if ch == "<":
                        depth += 1
                    elif ch == ">":
                        if depth == 0:
                            fields += 1  # the final field
                            break
                        depth -= 1
                    elif ch == "," and depth == 0:
                        fields += 1
                scan_cols = fields
    import re as _re

    return {
        # shuffles only: BroadcastExchange contains the substring
        # "Exchange", so subtract it out
        "n_exchanges": plan.count("Exchange")
        - plan.count("BroadcastExchange"),
        "n_broadcasts": plan.count("BroadcastExchange"),
        "n_single_partition": plan.count("Exchange SinglePartition"),
        "n_sort_merge_joins": plan.count("SortMergeJoin"),
        "n_broadcast_joins": plan.count("BroadcastHashJoin"),
        "n_cartesian": plan.count("CartesianProduct"),
        "n_python_eval": plan.count("BatchEvalPython")
        + plan.count("ArrowEvalPython"),
        "whole_stage_codegen": (
            "WholeStageCodegen subtrees" in cg and "Found 0" not in cg
        ),
        # ANY scan with a non-empty pushed-filter list counts: a plan
        # can legitimately mix filtered and filterless scans
        "pushed_filters": bool(
            _re.search(r"PushedFilters: \[[^\]]", formatted),
        ),
        "scan_columns": scan_cols,
    }
