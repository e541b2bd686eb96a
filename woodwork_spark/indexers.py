"""Typed row/column indexers (reference indexers.py:9-49).

``t.loc[rows, cols]`` — label-based selection that carries typing info:

- rows: ``:`` (all), a scalar index value, or a list of index values.
  Row selection filters on the schema's **index column** (a Spark table
  has no implicit positional index; the declared index is the label
  axis).  The filter is a plain predicate, so it predicate-pushes into
  the scan — point lookups on a partitioned/bucketed index column prune
  at 100 TB.
- cols: a column name or list of names; the subset schema travels.

Divergence from the reference (documented): selecting a single row
returns a 1-row typed WWDataFrame, not an untyped pandas Series — Spark
results are DataFrames all the way down.

``t.iloc`` — positional selection is only well-defined on an ordered
collection; a distributed DataFrame has no stable row order.  Supported
forms are ``iloc[:n]`` / ``iloc[slice(0, n)]`` (maps to ``limit``, the
one positional op Spark expresses natively) and column selection
``iloc[:, positions]``.  Anything else raises with guidance to use
``loc`` on the index.
"""

from __future__ import annotations


class LocIndexer:
    def __init__(self, ww_df):
        self._t = ww_df

    def __getitem__(self, key):
        from pyspark.sql import functions as F

        rows, cols = key if isinstance(key, tuple) else (key, None)
        t = self._t
        if cols is not None:
            cols = [cols] if isinstance(cols, str) else list(cols)
            t = t._getitem_list(cols)
        if isinstance(rows, slice):
            if rows.start is None and rows.stop is None and rows.step is None:
                return t
            raise TypeError(
                "loc row slices are not supported on a distributed table; "
                "use a list of index values or filter()",
            )
        index = self._t.schema.index
        if index is None:
            raise TypeError(
                "loc row selection requires an index column (set_index)",
            )
        if cols is not None and index not in t.columns:
            # the filter references the index column even when it was not
            # selected — apply on the full table, then project
            filtered = self._filter_rows(self._t, index, rows)
            return filtered._getitem_list(cols)
        return self._filter_rows(t, index, rows)

    @staticmethod
    def _filter_rows(t, index, rows):
        from pyspark.sql import functions as F

        if isinstance(rows, (list, tuple, set)):
            return t._with(df=t.raw.filter(F.col(index).isin(list(rows))))
        return t._with(df=t.raw.filter(F.col(index) == rows))


class ILocIndexer:
    def __init__(self, ww_df):
        self._t = ww_df

    def __getitem__(self, key):
        rows, cols = key if isinstance(key, tuple) else (key, None)
        t = self._t
        if cols is not None:
            if isinstance(cols, int):
                cols = [cols]
            if isinstance(cols, slice):
                names = t.columns[cols]
            else:
                names = [t.columns[i] for i in cols]
            t = t._getitem_list(names)
        if isinstance(rows, slice):
            if rows.start is None and rows.stop is None and rows.step is None:
                return t
            if (rows.start in (None, 0)) and rows.step is None and rows.stop is not None:
                return t._with(df=t.raw.limit(rows.stop))
        raise TypeError(
            "iloc on a distributed table supports only iloc[:n] (limit) and "
            "column positions; use loc with index values for row lookups",
        )
