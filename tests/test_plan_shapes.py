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


def test_rank_scale_path_no_single_partition_exchange(spark):
    """The distributed rank/prefix-sum shape (the path taken when the
    distinct-value table exceeds the cardinality threshold) must not
    funnel through one reducer: no Exchange SinglePartition anywhere."""
    from pyspark.sql import functions as F

    from woodwork_spark.operators.rank import global_prefix_sum, global_row_number

    df = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_extendedprice").alias("__a"),
    )
    counts = df.groupBy("__a").agg(F.count(F.lit(1)).alias("__cnt"))
    ps = global_prefix_sum(
        counts, [F.asc("__a")], "__cnt", small_threshold=0,
    )
    plan = _executed_plan(ps)
    assert "SinglePartition" not in plan
    assert "Window" in plan  # per-bucket windows, not a sort-collect
    rn = global_row_number(counts, [F.asc("__a")], small_threshold=0)
    plan = _executed_plan(rn)
    assert "SinglePartition" not in plan


def test_rank_small_cardinality_takes_single_stage_path(spark):
    """Below the threshold the hybrid must NOT pay the range shuffle +
    offsets machinery: tiny distinct tables go through one cheap window
    partition (values identical either way)."""
    from pyspark.sql import functions as F

    from woodwork_spark.operators.rank import global_prefix_sum

    data = [(v,) for v in [5, 3, 9, 1, 7, 3, 8, 2, 6, 4] * 20]
    counts = (
        spark.createDataFrame(data, "v int")
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    small = global_prefix_sum(counts, [F.asc("v")], "c", out_col="p")
    big = global_prefix_sum(
        counts, [F.asc("v")], "c", out_col="p", small_threshold=0,
    )
    plan = _executed_plan(small)
    # one cheap global window stage: either an explicit SinglePartition
    # exchange, or — when AQE cached-plan re-planning already coalesced
    # the probed cache to one partition (canChangeCachedPlanOutput-
    # Partitioning=true, set by _prep) — no exchange at all.  Never the
    # distributed path's range shuffle + offsets machinery.
    assert "RangePartitioning" not in plan
    assert "SinglePartition" in plan or "InMemoryTableScan" in plan
    assert {(r["v"], r["p"]) for r in small.collect()} == {
        (r["v"], r["p"]) for r in big.collect()
    }


def test_global_row_number_and_prefix_sum_values(spark):
    from pyspark.sql import functions as F

    from woodwork_spark.operators.rank import global_prefix_sum, global_row_number

    data = [(v,) for v in [5, 3, 9, 1, 7, 3, 8, 2, 6, 4] * 50]
    df = spark.createDataFrame(data, "v int")
    rn = global_row_number(df, [F.asc("v")], out_col="rn", num_partitions=7)
    rows = rn.orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(500))
    vals = [r["v"] for r in rows]
    assert vals == sorted(vals)

    counts = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    ps = global_prefix_sum(counts, [F.asc("v")], "c", out_col="p", num_partitions=5)
    got = {r["v"]: r["p"] for r in ps.collect()}
    expect, acc = {}, 0
    for v in sorted(set(x[0] for x in data)):
        expect[v] = acc
        acc += sum(1 for x in data if x[0] == v)
    assert got == expect


def test_grouped_prefix_sum_scale_shape(spark):
    """pack_sequences' distributed path: no single-partition Exchange,
    offsets come back via a broadcast join (not a giant literal map)."""
    from pyspark.sql import functions as F

    from woodwork_spark.operators.rank import grouped_prefix_sum

    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", F.length("text").alias("n"),
    )
    ps = grouped_prefix_sum(
        df, ["lang"], [F.asc("doc_id")], "n", small_threshold=0,
    )
    plan = _executed_plan(ps)
    assert "SinglePartition" not in plan
    assert "BroadcastHashJoin" in plan  # offsets table joins broadcast
    assert "Window" in plan


def test_unigram_logprob_join_strategy_left_to_catalyst(spark):
    """The token->frequency join must carry NO join hint: Catalyst picks
    broadcast at small vocabulary sizes (as here) but must remain free
    to choose a shuffle join when stats say the vocabulary is huge —
    a forced broadcast would OOM executors at corpus scale."""
    from woodwork_spark.operators.text import unigram_logprob

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    scored = unigram_logprob(docs, "text", "doc_id")
    optimized = scored._jdf.queryExecution().optimizedPlan().toString()
    assert "JOIN_HINT" not in optimized and "broadcast" not in optimized
    plan = _executed_plan(scored)
    # map-side partial aggregation on both the freq build and the per-doc
    # scoring side, and no Python anywhere in the pipeline
    assert "partial_count" in plan
    assert "partial_avg" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_boilerplate_and_rolling_plans(spark):
    """Newest operators stay JVM-side: partial/final agg pairs, no
    Python eval nodes, and the boilerplate frequency shuffle carries the
    hashed line key (xxhash64), not raw text."""
    from pyspark.sql import functions as F

    from woodwork_spark.operators.cleaning import remove_boilerplate_lines
    from woodwork_spark.operators.timeseries import rolling_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    clean = remove_boilerplate_lines(docs, "text", "doc_id", min_docs=5)
    plan = _executed_plan(clean)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "xxhash64" in plan.lower()

    ev = spark.read.parquet(f"{SF}/events.parquet")
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    feats = rolling_features(ev, "ts", ["user_id"], "value")
    plan = _executed_plan(feats)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # all four features share ONE window sort
    assert plan.count("Sort ") <= 2


def test_curation_plan_shapes(spark):
    """Round-6 curation ops: BM25's query-term prune and the SCD dim
    must be BROADCAST (the corpus side never shuffles for the match);
    TF-IDF's top-k window partitions by document (no single-reducer
    window); all three stay JVM-side."""
    q = entrymod.queries()
    bm25 = q["bm25_rank"](spark, SF)
    plan = _executed_plan(bm25)
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan

    tfidf = q["tfidf_terms"](spark, SF)
    plan = _executed_plan(tfidf)
    assert "EvalPython" not in plan
    # the row_number window is keyed by doc id — its exchange must be a
    # hashpartitioning on id, never a SinglePartition gather
    assert "SinglePartition" not in plan

    sq = q["source_quality"](spark, SF)
    plan = _executed_plan(sq)
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "EvalPython" not in plan


def test_scd_dim_join_broadcasts(spark):
    """The SCD interval join must broadcast the dimension side — on a
    stream this is what keeps it stateless per micro-batch."""
    import datetime as dt

    from woodwork_spark.streaming import enrich_stream_with_scd

    t = lambda m: dt.datetime(2024, m, 1)
    dim = spark.createDataFrame(
        [(7, t(1), None, "gold")],
        "user_id long, valid_from timestamp, valid_to timestamp, tier string",
    )
    events = spark.createDataFrame(
        [(1, t(2), 7)], "event_id long, ts timestamp, user_id long",
    )
    out = enrich_stream_with_scd(events, dim, "user_id")
    plan = _executed_plan(out)
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


def test_bloom_prune_is_pre_shuffle_filter_no_udf(spark):
    """The bloom membership test must be a plain Filter over the scan
    (inside codegen, before any join Exchange) with no Python UDF."""
    from woodwork_spark.operators.scale import bloom_prune

    big = spark.range(0, 5000).selectExpr("id", "id % 97 AS k")
    small = spark.range(0, 30).selectExpr("id AS k")
    pruned = bloom_prune(big, small, "k", expected_items=30)
    plan = _formatted(pruned)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # prune alone shuffles nothing
    assert "Filter" in plan


def test_zorder_key_single_projection_no_udf(spark):
    """The z-key is one projection (stats were pre-aggregated); no
    Python evaluation, no shuffle."""
    from woodwork_spark.operators.scale import zorder_key

    df = spark.range(0, 1000).selectExpr("id AS a", "(id * 7) % 50 AS b")
    z = zorder_key(df, ["a", "b"], bits=8, out_col="z")
    plan = _formatted(z)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


def test_funnel_single_user_shuffle(spark):
    """The funnel fold runs in the user-key aggregation — exactly one
    Exchange (plus AQE wrappers), no join cascade.  Targets the REAL
    operator pipeline via funnel_depths, not a reimplementation."""
    import datetime as dt

    from woodwork_spark.operators.funnel import funnel_depths

    rows = [
        (f"u{i % 20}", dt.datetime(2024, 1, 1 + i % 5), ["a", "b"][i % 2])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, e string")
    staged = funnel_depths(df, "u", "ts", "e", ["a", "b"])
    plan = _executed_plan(staged)
    assert plan.count("Exchange") <= 2  # shuffle + possible AQE read
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_group_quantile_gate_broadcasts_thresholds(spark):
    """The per-group threshold table joins back as a broadcast — rows
    never shuffle for the gate."""
    from woodwork_spark.operators.curation import group_quantile_gate

    df = spark.range(0, 2000).selectExpr(
        "CAST(id % 7 AS STRING) AS g", "CAST(id AS DOUBLE) AS v",
    )
    kept = group_quantile_gate(df, "g", "v", 0.25)
    plan = _executed_plan(kept)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_new_round6_operator_plan_shapes(spark):
    """Round-6 session-3 operators: no cartesian products anywhere, no
    single-partition Exchange in the distributed paths, broadcasts
    where PLANS.md claims them."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.curation import (
        concentration_report,
        ks_drift,
    )
    from woodwork_spark.operators.dedup import similarity_join
    from woodwork_spark.operators.scale import skew_report

    ev = read_parquet(spark, f"{SF}/events.parquet")
    part = read_parquet(spark, f"{SF}/part.parquet")
    docs = read_parquet(spark, f"{SF}/documents.parquet")

    # ks_drift, distributed path: range shuffle for the shared ECDFs,
    # broadcast totals, never a single-partition Exchange on data
    ks = ks_drift(
        ev.select("value"), ev.select("value"), "value", small_threshold=0,
    )
    plan = _executed_plan(ks)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "rangepartitioning" in plan.lower()
    # the only single-partition exchange is the final one-row agg fed by
    # map-side partials (partial_max/min_by) — never raw data rows
    assert "partial_max" in plan
    from woodwork_spark.lifecycle import release

    release(ks)

    # skew_report: global top-k is TakeOrderedAndProject (partial top-k
    # + merge), not a full Sort; summary side broadcast
    sk = skew_report(ev, "user_id", top_k=5)
    plan = _executed_plan(sk)
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan

    # similarity_join: equi-join candidates, no cartesian anywhere
    a = part.where(F.col("p_partkey") % 2 == 0).select("p_partkey", "p_name")
    b = part.where(F.col("p_partkey") % 2 == 1).select(
        F.col("p_partkey").alias("pk_b"), "p_name",
    )
    sj = similarity_join(a, b, "p_partkey", "pk_b", "p_name", k=1,
                         threshold=0.6)
    plan = _executed_plan(sj)
    assert "CartesianProduct" not in plan
    assert "PythonUDF" not in plan
    release(sj)

    # concentration_report distributed path: rank via range partitioning
    cr = concentration_report(
        docs, "source", weight_col="n_chars", small_threshold=0,
    )
    plan = _executed_plan(cr)
    assert "rangepartitioning" in plan.lower()
    assert "CartesianProduct" not in plan
    release(cr)


def test_rolling_distinct_and_budget_plan_shapes(spark):
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.cardinality import rolling_distinct
    from woodwork_spark.operators.packing import select_to_budget

    ev = read_parquet(spark, f"{SF}/events.parquet")
    docs = read_parquet(spark, f"{SF}/documents.parquet")

    # rolling_distinct sketch path: partial/final HLL agg pairs, no
    # per-event explode (the fan-out is on bucket sketches)
    rd = rolling_distinct(ev, "ts", "user_id", exact=False)
    plan = _executed_plan(rd)
    assert "hll_union_agg" in plan or "HllUnionAgg" in plan or "hll" in plan.lower()
    assert "CartesianProduct" not in plan

    # select_to_budget distributed path: range shuffle on (group,
    # order), offsets broadcast back, no reducer-per-group window over
    # the raw rows
    docs2 = docs.select(
        "doc_id", "source", F.length("text").cast("long").alias("n_tokens"),
    )
    kept = select_to_budget(
        docs2, "source", "n_tokens", "n_tokens", budget=1000,
        id_col="doc_id", known_count=10**9,
    )
    plan = _executed_plan(kept)
    assert "rangepartitioning" in plan.lower()
    assert "BroadcastExchange" in plan
    release(kept)


def test_late_round6_operator_plan_shapes(spark):
    """Batches 10-14: broadcast-or-literal small sides, no cartesian
    products over data, no Python UDFs."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.features import (
        standardize_by_group,
        target_encode,
    )
    from woodwork_spark.operators.similarity import (
        assign_nearest_centroid,
        group_centroids,
    )

    ev = read_parquet(spark, f"{SF}/events.parquet")
    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    emb = read_parquet(spark, f"{SF}/embeddings.parquet")

    # per-group scaling: stats broadcast, corpus never shuffles
    s = standardize_by_group(li, "l_returnflag", ["l_quantity"])
    plan = _executed_plan(s)
    assert "BroadcastExchange" in plan
    assert "PythonUDF" not in plan

    # target encoding: category stats + prior broadcast
    t = target_encode(ev, "event_type", "value")
    plan = _executed_plan(t)
    assert plan.count("BroadcastExchange") >= 2
    assert "SortMergeJoin" not in plan  # nothing shuffles the fact side

    # nearest-centroid assignment: ONE projection — no join at all
    cents = group_centroids(emb, "label", "embedding")
    a = assign_nearest_centroid(emb, cents, "label", "embedding")
    plan = _executed_plan(a)
    assert "Join" not in plan and "Exchange" not in plan
    assert "PythonUDF" not in plan


def test_session4_operator_plan_shapes(spark):
    """Session-4 batch: hashed shuffle keys (never text), no cartesian
    products, stateless stream-static gate, WindowGroupLimit sampling."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.cleaning import repeated_spans
    from woodwork_spark.operators.dedup import edit_distance_join
    from woodwork_spark.operators.features import mad_bounds
    from woodwork_spark.operators.text import (
        hashed_term_vectors,
        ngram_novelty,
    )
    from woodwork_spark.operators.timeseries import decayed_agg, fill_gaps

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    ev = read_parquet(spark, f"{SF}/events.parquet")

    # repeated_spans: the gram TEXT never shuffles — only the two
    # 8-byte hashes reach the exchange; no cartesian product
    spans = repeated_spans(docs, "doc_id", "text", span_len=25, min_docs=3)
    plan = _executed_plan(spans)
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan
    release(spans)

    # edit_distance_join: candidates come from the gram-hash equi-join;
    # only the bounded-short side path may broadcast a nested loop
    cust = read_parquet(spark, f"{SF}/customer.parquet").select(
        "c_custkey", "c_name",
    )
    probes = cust.select(
        (F.col("c_custkey") + 10**6).alias("pid"), "c_name",
    ).limit(50)
    ed = edit_distance_join(probes, cust, "pid", "c_custkey", "c_name")
    plan = _executed_plan(ed)
    assert "CartesianProduct" not in plan

    # ngram_novelty / hashed_term_vectors: long-hash shuffles, UDF-free
    nov = ngram_novelty(docs, "doc_id", "text")
    plan = _executed_plan(nov)
    assert "PythonUDF" not in plan and "CartesianProduct" not in plan
    release(nov)
    vecs = hashed_term_vectors(docs, "doc_id", "text", dim=32)
    assert "PythonUDF" not in _executed_plan(vecs)

    # mad_bounds / decayed_agg: plain grouped aggregations — partial
    # (map-side) aggregation present, no window over raw rows
    mb = mad_bounds(ev, "value", group_cols=["event_type"])
    plan = _executed_plan(mb)
    assert "HashAggregate" in plan and "Window" not in plan
    da = decayed_agg(ev, "ts", "event_type", "value", 86400.0)
    plan = _executed_plan(da)
    assert "HashAggregate" in plan and "Window" not in plan

    # fill_gaps: one window per method call, no join, no shuffle beyond
    # the group partitioning
    grid = ev.select("event_type", F.col("value").alias("v"),
                     F.col("ts").cast("long").alias("t"))
    fg = fill_gaps(grid, "t", "v", ["event_type"], method="linear")
    plan = _executed_plan(fg)
    assert "Join" not in plan and "PythonUDF" not in plan


def test_forecasting_batch_plan_shapes(spark):
    """Session-4 forecasting/monitoring batch: window-only or bounded
    pair joins, applyInPandas only where the algorithm is sequential."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.timeseries import (
        decompose_series,
        forecast_baselines,
        holt_fit,
        nelson_aalen,
        trend_test,
    )

    ev = read_parquet(spark, f"{SF}/events.parquet")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d"),
    ).agg(F.sum("value").alias("v")).withColumn(
        "b", F.unix_date(F.col("d").cast("date")).cast("long"),
    )

    # decompose: windows + small joins, no UDF, no cartesian
    plan = _executed_plan(decompose_series(daily, "b", "v", 7,
                                           group_cols=["event_type"]))
    assert "PythonUDF" not in plan and "CartesianProduct" not in plan

    # trend_test: group-keyed pair join (NOT a cartesian product node)
    plan = _executed_plan(trend_test(daily, "b", "v", "event_type"))
    assert "CartesianProduct" not in plan

    # baselines / nelson_aalen: pure windows + aggs
    plan = _executed_plan(
        forecast_baselines(daily, "b", "v", "event_type", period=7),
    )
    assert "PythonUDF" not in plan and "Join" not in plan
    na_in = daily.select(
        "event_type", F.col("v").alias("dur"),
        (F.col("b") % 2 == 0).alias("evf"),
    )
    plan = _executed_plan(nelson_aalen(na_in, "dur", "evf", ["event_type"]))
    assert "PythonUDF" not in plan

    # holt: the ONE legitimate applyInPandas — grouped-map node present
    plan = _executed_plan(holt_fit(daily, "b", "v", "event_type"))
    assert "FlatMapGroupsInPandas" in plan


def test_session5_operator_plan_shapes(spark):
    """Session-5 batch: single-window ACF/attribution, agg-only tests,
    neighbor-keyed pair joins (never node x node), projection-only
    Gopher rules."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.basket import item_similarity
    from woodwork_spark.operators.cleaning import gopher_rules_exprs
    from woodwork_spark.operators.funnel import attribute_conversions
    from woodwork_spark.operators.graph import adamic_adar
    from woodwork_spark.operators.stats_tests import (
        anova_oneway,
        mann_whitney_u,
    )
    from woodwork_spark.operators.timeseries import acf

    ev = read_parquet(spark, f"{SF}/events.parquet")
    docs = read_parquet(spark, f"{SF}/documents.parquet")
    li = read_parquet(spark, f"{SF}/lineitem.parquet")

    # acf: ONE window partitioning (mean + all lags share the sort) —
    # a single Window node, no joins, no Python
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d"),
    ).agg(F.sum("value").alias("v")).withColumn(
        "b", F.unix_date(F.col("d").cast("date")).cast("long"),
    )
    plan = _executed_plan(acf(daily, "b", "v", "event_type", max_lag=4))
    assert plan.count("Window") == 1
    assert "Join" not in plan and "PythonUDF" not in plan

    # attribution: one window on the user key, no self-join
    plan = _executed_plan(attribute_conversions(
        ev, "user_id", "ts", "event_type", "purchase",
        lookback_seconds=86400, order_cols="event_id",
    ))
    assert plan.count("Window") == 1
    assert "Join" not in plan and "PythonUDF" not in plan

    # anova: aggregations only
    plan = _executed_plan(anova_oneway(docs, "n_chars", "source"))
    assert "Join" not in plan and "Window" not in plan
    assert "PythonUDF" not in plan

    # mann-whitney: no raw-row window — any Window sits above the
    # distinct-value Aggregate, and no Python
    mw = mann_whitney_u(docs, "n_chars", "lang", "en", "fr")
    plan = _executed_plan(mw)
    assert "PythonUDF" not in plan
    from woodwork_spark.lifecycle import release

    release(mw)

    # gopher rules: projection only — no shuffle at all
    flags = docs.select(
        *[v.alias(k) for k, v in gopher_rules_exprs("text").items()],
    )
    plan = _executed_plan(flags)
    assert "Exchange" not in plan and "PythonUDF" not in plan

    # adamic-adar / item-similarity: pair joins keyed on the shared
    # neighbor/basket — never a cartesian
    edges = li.select(
        F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"),
    )
    plan = _executed_plan(adamic_adar(edges, "s", "p", min_common=3))
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan
    plan = _executed_plan(item_similarity(li, "l_orderkey", "l_partkey"))
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan


def test_session5_batch2_plan_shapes(spark):
    """Batch 2: layout scoring runs its pair join on the zone table
    (post-aggregate), kcore's distributed loop checkpoints, twonn
    broadcasts anchors, median_ci shuffles once on the group key."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.embedding import twonn_dimension
    from woodwork_spark.operators.layout import clustering_effectiveness
    from woodwork_spark.operators.stats_tests import median_ci, welch_ttest
    from woodwork_spark.lifecycle import release

    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    emb = read_parquet(spark, f"{SF}/embeddings.parquet")

    # welch: aggregate-only, one scan
    plan = _executed_plan(welch_ttest(li, "l_quantity", "l_returnflag",
                                      "A", "R"))
    assert "Join" not in plan and "Window" not in plan
    assert "PythonUDF" not in plan

    # median_ci: exactly one row-level Window partitioning (both window
    # specs share the group-key sort)
    mc = median_ci(li, "l_extendedprice", "l_returnflag")
    plan = _executed_plan(mc)
    assert "PythonUDF" not in plan and "Join" not in plan

    # twonn: anchors broadcast against the corpus — no shuffled join of
    # corpus x corpus, no Python
    tw = twonn_dimension(emb, anchor_stride=7)
    plan = _executed_plan(tw)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "PythonUDF" not in plan

    # layout: effectiveness plan contains no cartesian on the ROW level
    # (the zone-pair join is a nested loop over the 32-row zone agg)
    eff = clustering_effectiveness(
        li, ["l_orderkey", "l_linenumber"], ["l_partkey"], n_zones=8,
    )
    plan = _executed_plan(eff)
    assert "PythonUDF" not in plan
    release(eff)


def test_session5_batch3_plan_shapes(spark):
    """Batch 3: geo join is an EQUI-join on grid cells (never a row
    cartesian), scd2 is window-only, k-anonymity is agg-only."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.geo import radius_join
    from woodwork_spark.operators.quality_checks import k_anonymity_report
    from woodwork_spark.operators.relational import build_scd2_history

    cust = read_parquet(spark, f"{SF}/customer.parquet").select(
        "c_custkey",
        ((F.col("c_custkey") * 7) % 120 - 60 + 0.5).alias("lat"),
        ((F.col("c_custkey") * 13) % 340 - 170 + 0.5).alias("lon"),
    )
    supp = read_parquet(spark, f"{SF}/supplier.parquet").select(
        "s_suppkey",
        ((F.col("s_suppkey") * 11) % 120 - 60 + 0.5).alias("lat"),
        ((F.col("s_suppkey") * 17) % 340 - 170 + 0.5).alias("lon"),
    )
    plan = _executed_plan(radius_join(cust, supp, 300.0))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PythonUDF" not in plan

    ev = read_parquet(spark, f"{SF}/events.parquet")
    plan = _executed_plan(build_scd2_history(
        ev, "user_id", "ts", "event_type", order_cols="event_id",
    ))
    assert "Join" not in plan and "PythonUDF" not in plan

    plan = _executed_plan(k_anonymity_report(
        ev, ["event_type"], k=3, sensitive_col="user_id",
    ))
    assert "Join" not in plan and "Window" not in plan


def test_session5_batch4_plan_shapes(spark):
    """Batch 4: weighted quantile collapses to distinct values before
    its window, ccf keeps one window partitioning, subsequences join
    events x types (no position-pair self-join blowup), theils_u is
    one melted shuffle."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.features import weighted_quantile
    from woodwork_spark.operators.funnel import frequent_subsequences
    from woodwork_spark.operators.stats_tests import theils_u
    from woodwork_spark.operators.timeseries import ccf

    li = read_parquet(spark, f"{SF}/lineitem.parquet")
    ev = read_parquet(spark, f"{SF}/events.parquet")
    docs = read_parquet(spark, f"{SF}/documents.parquet")

    plan = _executed_plan(weighted_quantile(
        li, "l_extendedprice", "l_quantity", qs=(0.5,),
        group_cols="l_returnflag",
    ))
    assert "PythonUDF" not in plan and "Join" not in plan

    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d"),
    ).agg(F.sum("value").alias("v"), F.count(F.lit(1)).alias("c"))
    plan = _executed_plan(ccf(
        daily.withColumn("b", F.unix_date(F.col("d").cast("date"))),
        "v", "c", "b", "event_type", max_lag=2,
    ))
    assert plan.count("Window") == 1
    assert "Join" not in plan and "PythonUDF" not in plan

    fs = frequent_subsequences(
        ev, "user_id", "ts", "event_type", min_users=5,
        order_cols="event_id",
    )
    plan = _executed_plan(fs)
    assert "CartesianProduct" not in plan and "PythonUDF" not in plan

    tu = theils_u(docs, ["lang", "source"])
    plan = _executed_plan(tu)
    assert "Generate" in plan  # the melt explode — one pass, one shuffle
    assert "PythonUDF" not in plan
    release(tu)


def test_session5_batch5_plan_shapes(spark):
    """Batch 5/6: bootstrap streams all replicates in one aggregate
    (no per-replicate jobs, no Python), calendar features are a pure
    projection, neyman sample joins its tiny plan by broadcast."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.sampling import neyman_sample
    from woodwork_spark.operators.stats_tests import bootstrap_mean_ci
    from woodwork_spark.operators.timeseries import calendar_features

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    ev = read_parquet(spark, f"{SF}/events.parquet")

    plan = _executed_plan(bootstrap_mean_ci(
        docs, "n_chars", "doc_id", group_cols="lang", n_replicates=10,
    ))
    assert "PythonUDF" not in plan and "Join" not in plan

    plan = _executed_plan(calendar_features(ev, "ts"))
    assert "Exchange" not in plan and "PythonUDF" not in plan

    plan = _executed_plan(neyman_sample(
        docs, "lang", "n_chars", 50, "doc_id",
    ))
    assert "BroadcastHashJoin" in plan
    assert "PythonUDF" not in plan


def test_round9_operator_plan_shapes(spark):
    """Round 9: robots parsing never exchanges more than the domain-
    keyed explode, span dedup's sweep windows partition by the doc id
    (never a single reducer), PSL resolution is broadcast-only on the
    corpus side, OR-blocked candidates shuffle hashed fixed-width keys,
    and none of them evaluate Python."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.cleaning import dedup_spans_global
    from woodwork_spark.operators.dedup import blocked_candidates
    from woodwork_spark.operators.web import (
        parse_robots_rules,
        with_registered_domain,
    )

    docs = read_parquet(spark, f"{SF}/documents.parquet")

    # PSL-as-data: corpus side broadcast-joins only
    sfx = spark.createDataFrame(
        [("co.uk",), ("github.io",)], "suffix string",
    )
    plan = _executed_plan(with_registered_domain(
        docs.select(F.concat("source", F.lit(".example.co.uk"))
                    .alias("host")),
        "host", suffixes=sfx, from_host=True,
    ))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "PythonUDF" not in plan

    # robots parsing: windows keyed on domain, no lit partition
    robots = docs.select(
        F.col("source").alias("domain"),
        F.concat(F.lit("User-agent: *\nDisallow: /"), "source")
        .alias("robots"),
    )
    plan = _executed_plan(parse_robots_rules(
        robots, "domain", "robots", agent="bot",
    ))
    assert "partitionBy(1" not in plan.lower()
    assert "PythonUDF" not in plan

    # span dedup: the sweep window partitions by the doc id
    out = dedup_spans_global(docs.limit(50), "text", "doc_id", k=8)
    plan = _executed_plan(out)
    assert "doc_id" in plan
    assert "PythonUDF" not in plan
    from woodwork_spark.lifecycle import release

    release(out)

    # OR-blocked exact candidates: the join keys are xxhash64 pairs
    left = docs.select(F.col("doc_id").alias("lid"), "source")
    right = docs.select((F.col("doc_id") + 1).alias("rid"), "source")
    cand = blocked_candidates(
        left, right, "lid", "rid", [("exact", "source")],
    )
    plan = _executed_plan(cand)
    assert "xxhash64" in plan
    assert "PythonUDF" not in plan


def test_round9_projection_ops_never_shuffle(spark):
    """The late round-9 signal operators are documented as ONE
    projection: no Exchange, no Python, for bitext/instruction/chat/
    preference QA, FIM, span corruption, code QA, HTML strip."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet
    from woodwork_spark.operators.chat import (
        chat_turn_checks,
        instruction_qa_exprs,
        preference_pair_qa_exprs,
    )
    from woodwork_spark.operators.cleaning import (
        bitext_filter,
        code_qa_exprs,
    )
    from woodwork_spark.operators.text import fim_transform, span_corruption
    from woodwork_spark.operators.web import html_qa_exprs, html_strip_expr

    docs = read_parquet(spark, f"{SF}/documents.parquet")
    two = docs.select(
        "doc_id",
        F.substring("text", 1, 60).alias("a"),
        F.substring("text", 61, 60).alias("b"),
    )
    frames = [
        bitext_filter(two, "a", "b"),
        two.withColumns(instruction_qa_exprs("a", "b")),
        two.withColumns(preference_pair_qa_exprs("a", "b")),
        docs.withColumns(code_qa_exprs("text")),
        fim_transform(docs, "text", "doc_id"),
        span_corruption(docs, "text", "doc_id"),
        docs.select(html_strip_expr("text")),
        docs.withColumns(html_qa_exprs("text")),
        chat_turn_checks(
            docs.select(
                F.array(
                    F.struct(F.lit("user").alias("role"),
                             F.col("text").alias("content")),
                    F.struct(F.lit("assistant").alias("role"),
                             F.col("source").alias("content")),
                ).alias("messages"),
            ),
            "messages",
        ),
    ]
    for fr in frames:
        plan = _executed_plan(fr)
        assert "Exchange" not in plan, plan[:300]
        assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
