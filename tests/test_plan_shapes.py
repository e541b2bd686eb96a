"""Physical-plan regression tests: the properties PLANS.md documents must
stay true — predicate pushdown into parquet scans, column pruning,
broadcast joins on dims, map-side partial aggregation, no Python in the
operator hot paths."""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df):
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted",
        ),
    )


def test_pricing_summary_pushdown_and_pruning(spark):
    df = entrymod.queries()["pricing_summary"](spark, SF)
    plan = _formatted(df)
    assert "PushedFilters" in plan
    assert "LessThanOrEqual(l_shipdate" in plan
    # pruning: the 11-column table scans only the 7 needed columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema
    assert "l_partkey" not in read_schema
    assert "l_quantity" in read_schema


def test_forecast_revenue_pushes_all_predicates(spark):
    df = entrymod.queries()["forecast_revenue"](spark, SF)
    plan = _formatted(df)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "l_shipdate" in pushed
    assert "l_discount" in pushed
    assert "l_quantity" in pushed


def test_nation_revenue_broadcasts_dims(spark):
    df = entrymod.queries()["nation_revenue"](spark, SF)
    plan = _executed_plan(df)
    assert "BroadcastHashJoin" in plan
    # the explicitly-hinted small dims must be broadcast even at scale
    assert plan.count("BroadcastExchange") >= 2


def test_aggregations_have_partial_final_pairs(spark):
    df = entrymod.queries()["pricing_summary"](spark, SF)
    plan = _executed_plan(df)
    assert "partial_sum" in plan or "partial" in plan.lower()


def test_no_python_udfs_in_operator_queries(spark):
    """Dedup/text/similarity queries must stay JVM-side: no
    BatchEvalPython / ArrowEvalPython nodes in their plans."""
    for name in [
        "minhash_dedup_pairs",
        "simhash_clusters",
        "text_quality",
        "lang_id",
        "ann_cosine_topk",
        "fingerprint_dedup",
        "vocabulary",
    ]:
        df = entrymod.queries()[name](spark, SF)
        plan = _executed_plan(df)
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_whole_stage_codegen_active(spark):
    df = entrymod.queries()["text_quality"](spark, SF)
    df.collect()  # under AQE codegen subtrees exist only in the final plan
    cg = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "codegen",
        ),
    )
    assert "WholeStageCodegen subtrees" in cg
    assert "Found 0" not in cg
