"""Structured Streaming operators over the event stream.

The reference has no streaming surface (SURVEY §2.B); these are the
Spark-first stream analogs of the batch operators the engine exposes on
the ``events`` table: tumbling/sliding windowed rollups with watermarked
late-data handling, and session windows (both the built-in
``session_window`` and a custom stateful sessionizer via
``applyInPandasWithState`` for semantics the built-in can't express).

All transformations are source-agnostic: they take any streaming (or
batch — the plans are identical) DataFrame with the events schema
(event_id long, ts timestamp, user_id long, event_type string,
value double).  Tests drive them with a file source + Trigger.AvailableNow
over the driver's events.parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ],
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-source event stream (parquet directory).  For the driver's
    nano-timestamp events.parquet, ts arrives as long nanos and is
    converted — the streaming twin of io.read_parquet."""
    from woodwork_spark.io import _nano_timestamp_columns

    nano_cols = _nano_timestamp_columns(path)
    schema = EVENT_SCHEMA
    if nano_cols:
        fields = [
            T.StructField(f.name, T.LongType() if f.name in nano_cols else f.dataType)
            for f in EVENT_SCHEMA.fields
        ]
        schema = T.StructType(fields)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    reader = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", max_files_per_trigger,
    )
    if os.path.isfile(path):
        # file sources stream DIRECTORIES; target a single file via glob
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        df = reader.parquet(os.path.dirname(path))
    else:
        df = reader.parquet(path)
    for c in nano_cols:
        df = df.withColumn(c, F.timestamp_micros((F.col(c) / 1000).cast("long")))
    return df


def hourly_rollup_stream(
    events: DataFrame,
    watermark: str = "2 hours",
    window: str = "1 hour",
    slide: str = None,
) -> DataFrame:
    """Watermarked tumbling (or sliding) window rollup per event type.

    Late rows beyond the watermark are dropped by the engine; state is
    bounded by (watermark + window) per key — the standard scalable
    shape for continuous rollups."""
    w = (
        F.window("ts", window, slide)
        if slide
        else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("event_type"), w.alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            "event_type",
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def sessionize_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows per user via the built-in ``session_window``
    (gap-based, watermark-bounded state)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("s"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


SESSION_STATE_SCHEMA = "last_ts timestamp, n_events long, sum_value double"
SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, sum_value double, closed_by string"
)


def sessionize_stream_custom(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful sessionizer via ``applyInPandasWithState`` — the
    escape hatch for session semantics the built-in can't express (here:
    emitting whether a session closed by gap or by state timeout).

    State per user: (last_ts, n_events, sum_value); a new event beyond
    the gap emits the closed session and restarts state; processing-time
    timeout flushes idle sessions.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdf_iter, state: GroupState):
        user_id = key[0]
        out = []
        if state.hasTimedOut:
            if state.exists:
                last_ts, n, sv, start = state.get
                out.append((user_id, start, last_ts, n, sv, "timeout"))
                state.remove()
        else:
            rows = pd.concat(list(pdf_iter)).sort_values("ts")
            if state.exists:
                last_ts, n, sv, start = state.get
            else:
                last_ts, n, sv, start = None, 0, 0.0, None
            gap = pd.Timedelta(minutes=gap_minutes)
            for r in rows.itertuples():
                ts = r.ts
                if last_ts is not None and (ts - last_ts) > gap:
                    out.append((user_id, start, last_ts, n, sv, "gap"))
                    n, sv, start = 0, 0.0, None
                if start is None:
                    start = ts
                last_ts = ts
                n += 1
                sv += float(r.value or 0.0)
            state.update((last_ts, n, sv, start))
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "user_id",
                    "session_start",
                    "session_end",
                    "n_events",
                    "sum_value",
                    "closed_by",
                ],
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType="last_ts timestamp, n_events long, sum_value double, session_start timestamp",
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def purchase_attribution_stream(
    events: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
    touch_type: str = "click",
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's ``touch_type`` events (clicks by default) within the
    preceding ``attribution_window``.

    Both sides carry watermarks and the join condition bounds event-time
    distance, so state is bounded by (watermark + window) per side — the
    canonical streaming-join shape."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    logins = (
        events.filter(F.col("event_type") == touch_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("touch_id"),
            F.col("ts").alias("l_ts"),
        )
        .withWatermark("l_ts", watermark)
    )
    return purchases.join(
        logins,
        F.expr(
            f"p_user = l_user AND l_ts <= p_ts "
            f"AND l_ts >= p_ts - INTERVAL {attribution_window}",
        ),
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "touch_id",
        F.unix_micros("p_ts").alias("purchase_us"),
        F.unix_micros("l_ts").alias("touch_us"),
        "purchase_value",
    )


def late_data_counts_stream(
    events: DataFrame,
    watermark: str = "1 hour",
) -> DataFrame:
    """Windowed counts in UPDATE mode with a tight watermark — the
    canonical late-data demonstration: rows later than the watermark are
    dropped, on-time stragglers update their window row."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "n_events")
    )


def _ephemeral_checkpoint_dir(name: str):
    """tmpfs checkpoint directory for a FINITE availableNow replay, or
    None to keep Spark's default temp checkpoint.

    The memory-sink harness queries run Trigger.AvailableNow with a
    throwaway checkpoint; its only I/O is the offset/commit WAL plus
    one state-store delta per stateful-operator partition per
    micro-batch — dozens of tiny files whose create+rename+CRC dance
    lands on the journaling root filesystem by default.  Measured on
    the bench host (4-rep interleaved A/B): per-task state commit of
    300-600 ms under ambient disk pressure, stream_distinct median
    8.4 s -> 4.6 s and dedup 5.4 -> 3.5 with the checkpoint on tmpfs,
    best-case times unchanged (guide §6: I/O layout; the win is the
    heavy tail, which min-of-2 benching otherwise eats ~half the
    time).  PRODUCTION streams need durable checkpoints and must NOT
    use this — it only replaces checkpoints that were already
    temporary.  Env: ``WW_STREAM_EPHEMERAL_CKPT=auto|off|<base dir>``
    (default auto = /dev/shm when present and writable)."""
    import os
    import uuid

    mode = os.environ.get("WW_STREAM_EPHEMERAL_CKPT", "auto")
    if mode == "off":
        return None
    base = "/dev/shm" if mode == "auto" else mode
    if not os.path.isdir(base) or not os.access(base, os.W_OK):
        return None
    return os.path.join(base, f"ww_ckpt_{name}_{uuid.uuid4().hex[:8]}")


def run_available_now(
    stream_df: DataFrame,
    name: str,
    output_mode: str,
    timeout_sec: int = 180,
    strict: bool = False,
):
    """Start ``stream_df`` as an availableNow memory-sink query with an
    ephemeral tmpfs checkpoint (see :func:`_ephemeral_checkpoint_dir`),
    await termination, clean the checkpoint up, and return the
    terminated query.  ``strict=True`` raises on timeout instead of
    returning (the :func:`run_stream_to_memory` contract)."""
    import shutil

    w = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    ckpt = _ephemeral_checkpoint_dir(name)
    if ckpt:
        w = w.option("checkpointLocation", ckpt)
    q = w.start()
    try:
        done = q.awaitTermination(timeout_sec)
        if strict and not done:
            q.stop()
            raise RuntimeError(
                f"run_available_now({name!r}): availableNow batch still "
                f"running after {timeout_sec}s — refusing to return a "
                "partial result",
            )
    finally:
        # never delete a live query's checkpoint out from under it
        if ckpt and not q.isActive:
            shutil.rmtree(ckpt, ignore_errors=True)
    return q


def run_stream_to_memory(stream_df: DataFrame, name: str, timeout_sec: int = 600):
    """Run a streaming query to completion with Trigger.AvailableNow into
    an in-memory sink; returns the result rows (test/bench harness).

    Raises instead of returning a PARTIAL/empty table when the query
    has not terminated by ``timeout_sec`` — a silently-empty result on
    a slow batch is a correctness bug, not a timeout policy (the old
    120 s soft return produced exactly that on a 10x corpus)."""
    run_available_now(
        stream_df,
        name,
        "append" if "session" in name else "complete",
        timeout_sec=timeout_sec,
        strict=True,
    )
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def dedup_event_stream(
    events: DataFrame,
    keys=("event_id",),
    watermark: str = "24 hours",
) -> DataFrame:
    """Exactly-once event delivery over an at-least-once stream:
    ``dropDuplicatesWithinWatermark`` on ``keys``.  State holds one entry
    per key seen within the watermark horizon and is evicted as event
    time advances — bounded regardless of stream length, the property a
    plain ``dropDuplicates`` on an unbounded stream lacks (its state
    grows forever).  Duplicates with slightly different event times
    (retries, at-least-once sources) still collapse as long as they
    land within the watermark delay of each other.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys),
    )


def enrich_stream_with_scd(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    event_key=None,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "left",
) -> DataFrame:
    """Enrich a stream against a slowly-changing (SCD type 2) dimension:
    each event joins the dimension version whose validity interval
    contains the EVENT TIME — not the wall-clock time of processing, so
    replaying yesterday's stream attributes to yesterday's dimension
    state.

    ``dim`` carries (key, valid_from, valid_to, attrs...); an open-ended
    current version uses NULL ``valid_to``.  ``event_key`` defaults to
    ``key`` and may be a Column expression (e.g. a foreign-key
    derivation).  Intervals are half-open [valid_from, valid_to).

    Scale shape: a stream-STATIC join — Spark broadcasts/re-reads the
    dimension per micro-batch with no streaming state at all (the
    stateful alternative, a stream-stream join, would hold the dim in
    state forever).  Dimensions are small by definition; the event side
    never shuffles for a broadcast hash join.  Works identically on a
    batch frame (same plan), which is how the oracle checks it.
    """
    ek = F.col(event_key) if isinstance(event_key, str) else (
        event_key if event_key is not None else F.col(key)
    )
    # rename ALL dim-side join machinery to reserved names so an event
    # stream that itself carries valid_from/valid_to columns (CDC feeds
    # do) neither makes the condition ambiguous nor loses its own
    # columns to the final drop
    renamed = (
        dim.withColumnRenamed(key, "__dim_key")
        .withColumnRenamed(valid_from, "__dim_from")
        .withColumnRenamed(valid_to, "__dim_to")
    )
    d = F.broadcast(renamed)
    cond = (
        (ek == F.col("__dim_key"))
        & (F.col(ts_col) >= F.col("__dim_from"))
        & (F.col("__dim_to").isNull() | (F.col(ts_col) < F.col("__dim_to")))
    )
    return events.join(d, cond, how).drop("__dim_key", "__dim_from", "__dim_to")


def exactly_once_parquet_sink(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    commit_dirname: str = "_batch_commits",
):
    """Idempotent ``foreachBatch`` parquet sink: exactly-once output
    under at-least-once batch delivery.

    Structured Streaming guarantees each micro-batch id is REPLAYED with
    the same data after a failure, but ``foreachBatch`` itself is
    at-least-once — a crash between the write and the checkpoint commit
    re-runs the batch.  The standard fix is an idempotent writer keyed
    on ``batch_id``: each batch writes to its own subdirectory and then
    records the batch id in a commit marker; a replayed batch sees its
    marker and skips.  The marker write is a single atomic-rename-able
    file through the Hadoop FS API, so the pattern holds on HDFS/S3A
    exactly as it does locally.

    Returns the started ``StreamingQuery``.  Readers consume
    ``out_dir/batch_id=*/`` as a plain partitioned parquet tree,
    filtered to committed ids if they need strictness mid-failure.
    """

    def write_batch(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        jvm = spark.sparkContext._jvm
        jsc = spark.sparkContext._jsc
        conf = jsc.hadoopConfiguration()
        path_cls = jvm.org.apache.hadoop.fs.Path
        commit_dir = path_cls(out_dir, commit_dirname)
        fs = commit_dir.getFileSystem(conf)
        marker = path_cls(commit_dir, f"batch-{batch_id}")
        if fs.exists(marker):
            return  # replayed batch: output already committed
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}",
        )
        fs.mkdirs(commit_dir)
        out = fs.create(marker, True)
        out.close()

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def windowed_distinct_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window: str = "1 hour",
) -> DataFrame:
    """EXACT distinct-key counts per event-time window on a stream —
    the metric ``approx_count_distinct`` only estimates.  Two chained
    stateful stages: (1) ``dropDuplicates`` on (window, key) — state
    holds one entry per distinct pair and the watermark expires closed
    windows, so state is bounded by distinct keys per open window, the
    same bound any exact answer needs; (2) a windowed count of the
    surviving pairs (map-side combinable).  Emits one final row per
    window once the watermark passes its end (append mode).

    At 100 TB the same plan holds: stage-1 state shards by (window,
    key) across executors; if per-window distinct keys outgrow state
    stores, fall back to ``hourly_rollup_stream``'s HLL estimate —
    exactness is the thing you are paying state for here.
    """
    w = F.window(ts_col, window)
    pairs = (
        events.withWatermark(ts_col, watermark)
        .select(w.alias("win"), F.col(key_col).alias("__k"))
        .dropDuplicates(["win", "__k"])
    )
    return (
        pairs.groupBy("win")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_distinct",
        )
    )


def score_stream_against_bounds(
    events: DataFrame,
    bounds: DataFrame,
    key_cols,
    value_col: str,
    low_col: str = "low",
    high_col: str = "high",
    flag_col: str = "is_anomaly",
) -> DataFrame:
    """Stateless streaming anomaly gate: every event joins (stream-static
    broadcast — ZERO streaming state) to a batch-computed bounds table
    (e.g. :func:`~woodwork_spark.operators.features.mad_bounds` per
    entity class) and is flagged when ``value_col`` leaves [low, high].

    This is the production shape for robust stream scoring: the
    expensive, corpus-wide robust statistics run in batch on yesterday's
    data; the stream pays one broadcast hash join per micro-batch and
    nothing else — no watermark, no state store, latency stays at
    micro-batch floor and a 1000-executor stream scales linearly.
    Events with no bounds row (unseen key) or NULL value are NOT
    flagged (``flag_col = false``) — route them to a quarantine sink
    from the caller if unseen keys matter.

    The projected bounds table (a few doubles per key class) is
    persisted here: stream-static joins re-execute the static side's
    plan EVERY micro-batch, so a lazily-passed ``mad_bounds(...)``
    would otherwise re-run its multi-pass percentile pipeline per
    trigger — the cache pins only the tiny (key, low, high) result,
    not the corpus.
    """
    key_cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    b = F.broadcast(
        bounds.select(
            *key_cols,
            F.col(low_col).alias("__low"),
            F.col(high_col).alias("__high"),
        ).persist(),
    )
    v = F.col(value_col)
    flag = (v < F.col("__low")) | (v > F.col("__high"))
    return (
        events.join(b, key_cols, "left")
        .withColumn(flag_col, F.coalesce(flag, F.lit(False)))
        .drop("__low", "__high")
    )


def match_stream_against_corpus(
    stream: DataFrame,
    corpus: DataFrame,
    stream_id: str,
    corpus_id: str,
    text_col: str,
    corpus_text_col: str = None,
    threshold: float = 0.8,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    use_words: bool = True,
) -> DataFrame:
    """STATELESS streaming near-duplicate detection against a standing
    corpus: every incoming document is MinHash-banded (pure
    expressions), candidate-joined to the corpus's precomputed band
    buckets (stream-static equi-join — no streaming state, no
    watermark), and verified with the exact Jaccard over shingle sets.
    The streaming face of :func:`~woodwork_spark.operators.dedup.
    dedup_against_corpus` — ingest-time contamination / plagiarism /
    re-crawl filtering at micro-batch latency.

    Exactly ONE output row per matching (stream doc, corpus doc) pair
    with zero streaming state: a pair colliding in several bands would
    surface once per band, so each candidate row recomputes both band
    hash arrays from the joined signatures and survives only when its
    band is the MINIMUM colliding band — pure column expressions where
    a batch pipeline would just call distinct() (a stateful op a
    stream cannot afford).

    The corpus-side bucket and shingle tables are persisted here
    (static sides of stream-static joins re-execute per micro-batch
    otherwise).  Returns ``(stream_id, corpus_id, jaccard)``.
    """
    from woodwork_spark.operators.dedup import (
        minhash_signature_expr,
        shingles_expr,
    )

    corpus_text_col = corpus_text_col or text_col
    rows_per_band = num_perm // bands
    if rows_per_band < 1:
        raise ValueError("bands must be <= num_perm")

    def band_hashes(sig_col):
        return F.array(
            *[
                F.hash(F.slice(sig_col, b * rows_per_band + 1, rows_per_band))
                for b in range(bands)
            ],
        )

    from woodwork_spark.operators.scale import fan_out_scan

    # the corpus signature pass (shingles + num_perm minhashes per doc)
    # is per-row-heavy; fan the narrow scan out so it parallelizes and
    # the persisted signature/bucket caches carry >1 partition.
    # The 16-entry band-hash ARRAY is computed once per document here
    # (__cbh/__sbh) and the num_perm-long signature never leaves this
    # projection: the min-colliding-band filter used to re-derive BOTH
    # band arrays from the joined signatures per CANDIDATE row — 2 x
    # bands x (slice + hash of a 64-long array) of interpreted
    # expression work per pair, measured as the dominant cost of the
    # whole query (guide §1/§4: per-task work; §2.3: the join now
    # carries 16 ints instead of 64 longs per side).
    c_sh = (
        fan_out_scan(corpus).select(
            F.col(corpus_id).alias("__cid"),
            shingles_expr(corpus_text_col, shingle_k, use_words).alias("__csh"),
        )
        .filter(F.size("__csh") > 0)
        # bind the signature to a NAME before slicing it into bands —
        # passing the expression to band_hashes directly would inline
        # the whole num_perm-hash tree once per band
        .withColumn("__csig", minhash_signature_expr("__csh", num_perm))
        .withColumn("__cbh", band_hashes(F.col("__csig")))
        .drop("__csig")
        .persist()
    )
    c_bands = (
        c_sh.select(
            "__cid",
            F.posexplode(F.col("__cbh")).alias("band", "bh"),
        )
        .persist()
    )
    s = (
        stream.select(
            F.col(stream_id).alias("__sid"),
            shingles_expr(text_col, shingle_k, use_words).alias("__ssh"),
        )
        .filter(F.size("__ssh") > 0)
        .withColumn("__ssig", minhash_signature_expr("__ssh", num_perm))
        .withColumn("__sbh", band_hashes(F.col("__ssig")))
        .drop("__ssig")
    )
    s_bands = s.select(
        "__sid", "__ssh", "__sbh",
        F.posexplode(F.col("__sbh")).alias("band", "bh"),
    )
    cand = s_bands.join(F.broadcast(c_bands), ["band", "bh"]).join(
        F.broadcast(c_sh.select("__cid", "__csh", "__cbh")), "__cid",
    )
    sbh = F.col("__sbh")
    cbh = F.col("__cbh")
    colliding = F.filter(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.element_at(sbh, b + 1) == F.element_at(cbh, b + 1),
    )
    inter = F.size(F.array_intersect("__ssh", "__csh"))
    union = F.size("__ssh") + F.size("__csh") - inter
    jac = inter.cast("double") / union
    from woodwork_spark.lifecycle import attach_persisted

    out = (
        cand.filter(F.col("band") == F.array_min(colliding))
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__sid").alias(stream_id),
            F.col("__cid").alias(corpus_id),
            "jaccard",
        )
    )
    # the two corpus-scale caches ride on the result; call
    # lifecycle.release(result) after the streaming query stops
    return attach_persisted(out, c_sh, c_bands)


def srm_monitor_stream(
    events: DataFrame,
    arm_col: str,
    expected: dict,
    watermark: str = "2 hours",
    window: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Continuous sample-ratio-mismatch monitoring: per event-time
    window, the chi-square of the observed arm counts against the
    designed ratios — the streaming twin of ``causal.srm_check``, so a
    broken randomizer pages within a window instead of poisoning a
    week of data before the batch audit runs.

    ONE watermarked windowed aggregation (conditional counts per
    designed arm — the arm list is a query parameter, so this stays a
    single streaming agg; chained aggs are unsupported in streaming);
    the statistic is a pure projection on top.  Arms NOT in the design
    can't raise mid-stream — they are counted and reported as
    ``n_unknown`` (any value > 0 is itself an SRM page).  State is
    bounded by (watermark + window) per window key.

    ``ts_col`` names the event-time column for watermark/window —
    the same convention as the sibling helpers in this module.

    Returns a streaming frame: ``(window_start, window_end, n,
    n_unknown, chi2)``; ``chi2`` null for windows with no known-arm
    rows.
    """
    if not expected:
        raise ValueError("srm_monitor_stream: expected ratios required")
    if any(float(r) <= 0 for r in expected.values()):
        raise ValueError(
            "srm_monitor_stream: every expected ratio must be > 0",
        )
    total_ratio = float(sum(expected.values()))
    arms = list(expected.keys())
    aggs = [
        F.sum(
            F.when(F.col(arm_col) == F.lit(a), 1).otherwise(0),
        ).alias(f"__n_{i}")
        for i, a in enumerate(arms)
    ]
    aggs.append(
        F.sum(
            F.when(
                ~F.col(arm_col).isin(arms) | F.col(arm_col).isNull(), 1,
            ).otherwise(0),
        ).alias("__unknown"),
    )
    counted = (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"))
        .agg(*aggs)
    )
    n_known = sum(F.col(f"__n_{i}") for i in range(len(arms)))
    chi2 = None
    for i, a in enumerate(arms):
        ratio = float(expected[a]) / total_ratio
        e = n_known * F.lit(ratio)
        term = (F.col(f"__n_{i}") - e) * (F.col(f"__n_{i}") - e) / e
        chi2 = term if chi2 is None else chi2 + term
    return counted.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        n_known.cast("long").alias("n"),
        F.col("__unknown").cast("long").alias("n_unknown"),
        F.when(n_known > 0, chi2).alias("chi2"),
    )


def domain_rate_stream(
    stream: DataFrame,
    url_col: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    window: str = "1 hour",
    extra_suffixes=(),
) -> DataFrame:
    """Windowed crawl-rate monitor per REGISTERED domain — the
    politeness/abuse gate a live crawler reads: URL volume per eTLD+1
    per tumbling window, with late fetch logs dropped past the
    watermark.  Composes ``operators.web.registered_domain_expr`` (pure
    column expression, evaluated in the stream's projection) with the
    standard watermarked window aggregation; state is bounded by
    (watermark + window) x active-domain cardinality."""
    from woodwork_spark.operators.web import registered_domain_expr

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window).alias("win"),
            registered_domain_expr(url_col, extra_suffixes).alias("domain"),
        )
        .agg(F.count(F.lit(1)).alias("n_urls"))
        .select(
            "domain",
            F.col("win.start").alias("window_start"),
            "n_urls",
        )
    )
