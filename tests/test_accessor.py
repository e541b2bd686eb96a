"""Schema lifecycle ops (reference test_table_accessor.py analog)."""

import pytest

import woodwork_spark as ww
from woodwork_spark.exceptions import ColumnNotPresentError
from woodwork_spark.logical_types import Categorical, Double


@pytest.fixture()
def typed(spark):
    df = spark.createDataFrame(
        [
            (0, "a@x.com", 25, 1.5, "red", True),
            (1, "b@y.com", 30, 2.5, "blue", False),
            (2, "c@z.com", 35, 3.5, "red", True),
            (3, "d@w.com", 40, 4.5, "blue", False),
        ],
        schema="id long, email string, age long, score double, color string, flag boolean",
    )
    return ww.init(
        df,
        name="t",
        index="id",
        logical_types={"email": "EmailAddress", "color": "Categorical"},
        semantic_tags={"score": "target"},
    )


def test_init_basic(typed):
    assert typed.name == "t"
    assert typed.index == "id"
    assert "index" in typed.semantic_tags["id"]
    assert type(typed.logical_types["email"]).__name__ == "EmailAddress"
    assert "target" in typed.semantic_tags["score"]
    assert "numeric" in typed.semantic_tags["score"]


def test_index_uniqueness_enforced(spark):
    df = spark.createDataFrame([(1,), (1,)], schema="id long")
    with pytest.raises(IndexError, match="unique"):
        ww.init(df, index="id")


def test_index_null_enforced(spark):
    df = spark.createDataFrame([(1,), (None,)], schema="id long")
    with pytest.raises(IndexError, match="null"):
        ww.init(df, index="id")


def test_select_by_tag_and_type(typed):
    numeric = typed.select("numeric")
    assert set(numeric.columns) == {"age", "score"}
    cats = typed.select(Categorical)
    assert cats.columns == ["color"]
    excluded = typed.select(exclude="numeric")
    assert set(excluded.columns) == {"id", "email", "color", "flag"}


def test_set_types_recasts(typed):
    out = typed.set_types(logical_types={"age": "Double"})
    assert type(out.logical_types["age"]) is Double
    assert out.physical_types["age"].simpleString() == "double"
    # original untouched (immutability)
    assert typed.physical_types["age"].simpleString() == "bigint"


def test_semantic_tag_algebra(typed):
    out = typed.add_semantic_tags({"age": {"years"}})
    assert "years" in out.semantic_tags["age"]
    out2 = out.remove_semantic_tags({"age": {"years"}})
    assert "years" not in out2.semantic_tags["age"]
    with pytest.raises(LookupError):
        out2.remove_semantic_tags({"age": {"notthere"}})
    with pytest.raises(ValueError, match="standard"):
        out2.remove_semantic_tags({"age": {"numeric"}})
    reset = out.reset_semantic_tags("score")
    assert reset.semantic_tags["score"] == {"numeric"}


def test_index_tag_protection(typed):
    with pytest.raises(ValueError, match="set_index"):
        typed.add_semantic_tags({"age": {"index"}})


def test_rename_drop_pop(typed):
    renamed = typed.rename({"score": "points"})
    assert "points" in renamed.columns
    assert "target" in renamed.semantic_tags["points"]
    dropped = typed.drop("flag")
    assert "flag" not in dropped.columns
    popped, rest = typed.pop("color")
    assert popped.columns == ["color"]
    assert "color" not in rest.columns
    with pytest.raises(ColumnNotPresentError):
        typed.drop("nope")


def test_getitem(typed):
    sub = typed[["id", "email"]]
    assert sub.columns == ["id", "email"]
    assert type(sub.logical_types["email"]).__name__ == "EmailAddress"


def test_passthrough_preserves_schema(typed):
    filtered = typed.filter("age > 26")
    assert isinstance(filtered, ww.WWDataFrame)
    assert type(filtered.logical_types["email"]).__name__ == "EmailAddress"
    assert filtered.raw.count() == 3
    limited = typed.limit(2)
    assert isinstance(limited, ww.WWDataFrame)


def test_passthrough_partial_schema(typed):
    # groupBy agg produces new columns: schema carries for surviving cols
    agged = typed.groupBy("color").count()
    assert "color" in agged.columns


def test_with_column_infers(typed):
    out = typed.with_column("age2", typed.raw["age"] * 2)
    assert type(out.logical_types["age2"]).__name__ == "Integer"


def test_set_time_index_type_check(spark):
    df = spark.createDataFrame([(1, "x")], schema="id long, s string")
    t = ww.init(df, validate=False)
    with pytest.raises(TypeError):
        t.set_time_index("s")


def test_metadata_travels_through_spark_df(typed):
    meta_df = typed.df
    field = {f.name: f for f in meta_df.schema.fields}["email"]
    assert field.metadata["ww"]["logical_type"]["type"] == "EmailAddress"
    # survives a select on the raw Spark DataFrame
    sel = meta_df.select("email")
    assert sel.schema.fields[0].metadata["ww"]["logical_type"]["type"] == "EmailAddress"


def test_to_dictionary_shape(typed):
    d = typed.to_dictionary()
    assert d["schema_version"] == "12.0.0"
    assert d["index"] == "id"
    names = [c["name"] for c in d["column_typing_info"]]
    assert names == typed.columns


def test_duplicate_columns_rejected(spark):
    df = spark.createDataFrame([(1, 2)], schema="a long, a long")
    with pytest.raises(IndexError, match="duplicate"):
        ww.init(df)


def test_nullable_property(typed):
    n = typed.nullable
    assert n["age"] is False  # Integer (non-nullable variant)
    assert n["email"] is True
    assert n["score"] is True


def test_ordinal_set_types_validates_membership(spark):
    import woodwork_spark as ww
    from woodwork_spark.exceptions import TypeValidationError
    from woodwork_spark.logical_types import Ordinal

    df = spark.createDataFrame([("low",), ("bogus",)], "lvl string")
    t = ww.init(df, validate=False)
    with pytest.raises(TypeValidationError, match="bogus"):
        t.set_types(logical_types={"lvl": Ordinal(order=["low", "high"])})
    ok = spark.createDataFrame([("low",), ("high",)], "lvl string")
    t2 = ww.init(ok, validate=False).set_types(
        logical_types={"lvl": Ordinal(order=["low", "high"])},
    )
    assert "category" in t2.semantic_tags["lvl"]


def test_partial_schema_priority(spark):
    """init priority: explicit logical_types > existing schema > inference
    (reference init_with_partial_schema, table_accessor.py:126-273)."""
    from woodwork_spark.schema import ColumnSchema, TableSchema

    df = spark.createDataFrame(
        [("1", "a", "x@y.com")], "num string, cat string, email string",
    )
    partial = TableSchema(
        columns={
            "num": ColumnSchema(logical_type="Double", use_standard_tags=True),
            "cat": ColumnSchema(),  # untyped: falls through to inference
        },
    )
    t = ww.init(
        df,
        schema=partial,
        logical_types={"email": "EmailAddress"},
        validate=False,
    )
    assert type(t.logical_types["num"]).__name__ == "Double"      # from schema
    assert type(t.logical_types["email"]).__name__ == "EmailAddress"  # forced
    assert t.logical_types["cat"] is not None                     # inferred
    assert t.physical_types["num"].simpleString() == "double"


def test_partial_schema_forced_overrides_schema(spark):
    from woodwork_spark.schema import ColumnSchema, TableSchema

    df = spark.createDataFrame([("5",)], "x string")
    partial = TableSchema(columns={"x": ColumnSchema(logical_type="Categorical")})
    t = ww.init(df, schema=partial, logical_types={"x": "Integer"}, validate=False)
    assert type(t.logical_types["x"]).__name__ == "Integer"


def test_select_include_and_exclude_raises(typed):
    with pytest.raises(ValueError, match="both"):
        typed.select(include="numeric", exclude="category")


def test_getitem_missing_raises(typed):
    with pytest.raises(ColumnNotPresentError):
        typed[["id", "nope"]]


def test_init_with_full_schema_rejects_mismatch(spark):
    from woodwork_spark.schema import ColumnSchema, TableSchema

    df = spark.createDataFrame([("abc",)], "x string")
    schema = TableSchema(columns={"x": ColumnSchema(logical_type="Integer")})
    with pytest.raises(ValueError, match="valid"):
        ww.init_with_full_schema(df, schema)


def test_loc_row_lookup(typed):
    """loc[scalar] filters on the index column, schema carried."""
    row = typed.loc[2]
    assert row.raw.count() == 1
    assert row.raw.collect()[0]["email"] == "c@z.com"
    assert str(row.logical_types["email"]) == "EmailAddress"


def test_loc_list_and_columns(typed):
    sub = typed.loc[[1, 3], ["email", "score"]]
    assert sub.columns == ["email", "score"]
    assert sub.raw.count() == 2
    assert "target" in sub.schema.columns["score"].semantic_tags
    # all-rows, column subset
    cols = typed.loc[:, ["color"]]
    assert cols.columns == ["color"]
    assert cols.raw.count() == 4


def test_loc_requires_index(spark):
    df = spark.createDataFrame([(1,)], "x long")
    t = ww.init(df, validate=False)
    with pytest.raises(TypeError, match="index"):
        t.loc[1]


def test_iloc_limit_and_columns(typed):
    head = typed.iloc[:2]
    assert head.raw.count() == 2
    assert head.columns == typed.columns
    two_cols = typed.iloc[:, [0, 1]]
    assert two_cols.columns == ["id", "email"]
    with pytest.raises(TypeError, match="iloc"):
        typed.iloc[5]


def test_demo_retail(spark):
    from woodwork_spark.demo import load_retail

    t = load_retail(nrows=200, spark=spark)
    assert t.raw.count() == 200
    assert t.schema.index == "order_product_id"
    assert t.schema.time_index == "order_date"
    assert str(t.logical_types["description"]) == "NaturalLanguage"
    assert str(t.logical_types["total"]) == "Double"
    # deterministic across calls
    a = load_retail(nrows=50, spark=spark).raw.collect()
    b = load_retail(nrows=50, spark=spark).raw.collect()
    assert a == b


def test_table_equality_and_mi_columns(spark):
    import woodwork_spark as ww

    df = spark.createDataFrame(
        [(1, 2.0, "a"), (2, 3.0, "b"), (3, 4.0, "a")],
        "id long, x double, c string",
    )
    t1 = ww.init(df, index="id", logical_types={"c": "Categorical"})
    t2 = ww.init(df, index="id", logical_types={"c": "Categorical"})
    assert t1 == t2
    assert t1.__eq__(t2, deep=False)
    t3 = t1.set_types(semantic_tags={"x": "custom"})
    assert t1 != t3  # schema differs
    # different data, same schema
    t4 = ww.init(
        spark.createDataFrame(
            [(1, 2.0, "a"), (2, 3.0, "b"), (3, 9.0, "a")],
            "id long, x double, c string",
        ),
        index="id",
        logical_types={"c": "Categorical"},
    )
    assert t1.__eq__(t4, deep=False)
    assert t1 != t4
    # MI columns: index dropped by default, includable via flag
    assert t1.get_valid_mi_columns() == ["x", "c"]
    assert "id" in t1.get_valid_mi_columns(include_index=True)
    # dict shapes
    assert isinstance(t1.pearson_correlation_dict(), list)
    assert "<table" in t1._repr_html_()
