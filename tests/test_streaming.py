"""Structured Streaming operators driven end-to-end with
Trigger.AvailableNow over the driver's events.parquet."""

import pytest

from pyspark.sql import functions as F

from woodwork_spark.streaming import (
    hourly_rollup_stream,
    read_event_stream,
    sessionize_stream,
)

EVENTS = "/root/testdata/sf0.001/events.parquet"


def _run(df, name, mode):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return df.sparkSession.sql(f"SELECT * FROM {name}")


def test_hourly_rollup_stream_matches_batch(spark):
    stream = read_event_stream(spark, EVENTS)
    assert stream.isStreaming
    out = _run(hourly_rollup_stream(stream), "rollup_t", "complete")
    got = out.agg(F.sum("n_events")).collect()[0][0]
    from woodwork_spark.io import read_parquet

    batch_total = read_parquet(spark, EVENTS).count()
    # complete-mode rollup over a finite stream must count every event
    assert got == batch_total
    # and per-window totals must equal the batch computation
    batch = (
        read_parquet(spark, EVENTS)
        .groupBy("event_type", F.window("ts", "1 hour").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    assert out.count() == batch.count()


def test_sessionize_stream_runs(spark):
    stream = read_event_stream(spark, EVENTS)
    out = _run(sessionize_stream(stream), "sessions_t", "complete").collect()
    assert len(out) > 0
    for r in out:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_custom_stateful_sessionizer(spark):
    from woodwork_spark.streaming.events import sessionize_stream_custom

    stream = read_event_stream(spark, EVENTS)
    try:
        out = _run(
            sessionize_stream_custom(stream), "custom_sessions_t", "append",
        ).collect()
    except Exception as e:
        pytest.skip(f"applyInPandasWithState unavailable in this build: {e}")
    # gap-closed sessions must be present for a month of 15-user events
    assert any(r["closed_by"] == "gap" for r in out)
    for r in out:
        assert r["n_events"] >= 1


def test_stream_stream_interval_join_matches_batch(spark):
    from woodwork_spark.io import read_parquet
    from woodwork_spark.streaming.events import purchase_attribution_stream

    stream = read_event_stream(spark, EVENTS, max_files_per_trigger=10)
    out = _run(
        purchase_attribution_stream(stream, attribution_window="48 hours",
                                    watermark="96 hours"),
        "attribution_t", "append",
    )
    got = out.count()
    # batch equivalent on the same data
    ev = read_parquet(spark, EVENTS)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("pid"),
    )
    l = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("lu"), F.col("ts").alias("l_ts"),
    )
    expected = p.join(
        l,
        (F.col("pu") == F.col("lu"))
        & (F.col("l_ts") <= F.col("p_ts"))
        & (F.col("l_ts") >= F.col("p_ts") - F.expr("INTERVAL 48 HOURS")),
    ).count()
    assert got == expected
    assert got > 0


def test_dedup_event_stream_exactly_once(spark):
    """A doubled (at-least-once) stream deduped by event_id must equal
    the batch table exactly."""
    from woodwork_spark.io import read_parquet
    from woodwork_spark.streaming import dedup_event_stream

    doubled = read_event_stream(spark, EVENTS).unionByName(
        read_event_stream(spark, EVENTS),
    )
    out = _run(
        dedup_event_stream(doubled, keys=("event_id",)), "dedup_t", "append",
    )
    batch = read_parquet(spark, EVENTS)
    assert out.count() == batch.count()
    assert out.select("event_id").distinct().count() == batch.count()


def test_exactly_once_parquet_sink_idempotent_replay(spark, tmp_path):
    """The idempotent foreachBatch sink: (1) all input rows land exactly
    once across batch_id subdirs with commit markers; (2) replaying a
    committed batch id (the at-least-once failure mode) does NOT
    duplicate output."""
    import os

    from woodwork_spark.io import read_parquet
    from woodwork_spark.streaming.events import exactly_once_parquet_sink
    from woodwork_spark.streaming import read_event_stream

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, EVENTS).select(
        "event_id", "user_id", "value",
    )
    q = exactly_once_parquet_sink(stream, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    n_batch = read_parquet(spark, EVENTS).count()
    assert got.count() == n_batch
    assert got.select("event_id").distinct().count() == n_batch
    commits = os.listdir(os.path.join(out, "_batch_commits"))
    assert commits, "commit markers missing"
    # simulate the at-least-once failure replay: a FRESH checkpoint
    # makes the source re-deliver every batch id from scratch against
    # the same output directory — every id is already committed, so the
    # sink must no-op instead of duplicating
    q2 = exactly_once_parquet_sink(
        read_event_stream(spark, EVENTS).select("event_id", "user_id", "value"),
        out, str(tmp_path / "ckpt2"),
    )
    q2.processAllAvailable()
    q2.stop()
    assert spark.read.parquet(out).count() == n_batch


def test_windowed_distinct_stream_exact_with_doubled_input(spark):
    from woodwork_spark.io import read_parquet
    from woodwork_spark.streaming import windowed_distinct_stream

    # at-least-once source: every event delivered twice — exactness of
    # the (window, key) dedup stage is load-bearing
    replayed = read_event_stream(spark, EVENTS).unionByName(
        read_event_stream(spark, EVENTS),
    )
    out = _run(
        windowed_distinct_stream(
            replayed, "user_id", watermark="2 hours", window="1 day",
        ),
        "windist_t",
        "append",
    )
    got = {r["window_start"]: r["n_distinct"] for r in out.collect()}
    batch = read_parquet(spark, EVENTS)
    wm = batch.agg(
        F.max("ts") - F.expr("INTERVAL 2 HOURS"),
    ).collect()[0][0]
    want = {
        r["win"]["start"]: r["nd"]
        for r in (
            batch.groupBy(F.window("ts", "1 day").alias("win"))
            .agg(F.count_distinct("user_id").alias("nd"))
            .collect()
        )
        if r["win"]["end"] <= wm
    }
    # append mode finalizes exactly the windows the watermark passed
    assert got == want and len(got) > 0


def test_skew_report_numbers(spark):
    from woodwork_spark.operators.scale import skew_report

    rows = [("hot", i) for i in range(90)] + [
        (f"k{i}", i) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "k string, x long")
    out = skew_report(df, "k", top_k=3).collect()
    assert [r["k"] for r in out] == ["hot", "k0", "k1"]
    top = out[0]
    assert (top["n"], top["n_keys"], top["n_rows"], top["max_n"]) == (
        90, 11, 100, 90,
    )
    assert top["share"] == pytest.approx(0.9)
    # avg = 100/11; skew_ratio = 90/avg
    assert top["skew_ratio"] == pytest.approx(90 / (100 / 11))
    assert top["salt_factor"] >= 1


def test_score_stream_against_bounds_flags_and_unseen_keys(spark, tmp_path):
    from pyspark.sql import functions as F

    from woodwork_spark.streaming.events import (
        run_stream_to_memory,
        score_stream_against_bounds,
    )

    src = str(tmp_path / "ev")
    spark.createDataFrame(
        [
            ("a", 5.0), ("a", 50.0), ("a", None),
            ("b", 1.0), ("unseen", 9.9),
        ],
        "k string, v double",
    ).write.parquet(src)
    bounds = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 0.0, 10.0)],
        "k string, low double, high double",
    )
    stream = spark.readStream.schema("k string, v double").parquet(src)
    scored = score_stream_against_bounds(stream, bounds, "k", "v")
    agg = scored.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_anomaly").cast("long")).alias("n_anom"),
    )
    rows = {
        r["k"]: r
        for r in run_stream_to_memory(agg, "score_bounds_t").collect()
    }
    assert rows["a"]["n"] == 3 and rows["a"]["n_anom"] == 1  # only 50.0
    assert rows["b"]["n_anom"] == 0
    assert rows["unseen"]["n_anom"] == 0  # no bounds -> never flagged


def test_match_stream_against_corpus_planted_dups(spark, tmp_path):
    from pyspark.sql import functions as F

    from woodwork_spark.streaming.events import (
        match_stream_against_corpus,
        run_stream_to_memory,
    )

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten eleven"),
            (3, "totally different words in this corpus document here now"),
        ],
        "doc_id long, text string",
    )
    src = str(tmp_path / "stream_docs")
    spark.createDataFrame(
        [
            # near-copy of corpus doc 1 (one word appended)
            (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa x"),
            # exact copy of doc 2
            (102, "one two three four five six seven eight nine ten eleven"),
            # novel doc: must NOT match
            (103, "completely unrelated brand new content streaming in here"),
        ],
        "sid long, text string",
    ).write.parquet(src)
    stream = spark.readStream.schema("sid long, text string").parquet(src)
    matches = match_stream_against_corpus(
        stream, corpus, "sid", "doc_id", "text", threshold=0.6,
    )
    agg = matches.groupBy("sid", "doc_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
    )
    rows = run_stream_to_memory(agg, "stream_match_t").collect()
    got = {(r["sid"], r["doc_id"]): r["n_rows"] for r in rows}
    assert (101, 1) in got and (102, 2) in got
    assert all(k[0] != 103 for k in got)
    # the min-colliding-band filter makes each pair exactly ONE row
    assert all(v == 1 for v in got.values()), got
