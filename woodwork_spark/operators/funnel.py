"""Event-sequence analytics: ordered funnels and cohort retention.

Classic product-analytics queries that engines ship as primitives
(funnel/windowFunnel, retention), built Spark-native:

- ``funnel`` computes, per user, the LONGEST PREFIX of an ordered step
  list completed in timestamp order, via one groupBy(user) that
  collect-sorts the user's matching events and folds them with a pure
  higher-order ``aggregate`` expression — one shuffle on the user key,
  no self-joins, no window cascade (a k-step funnel as k chained
  windows/joins costs k shuffles and re-sorts).  Per-user state is the
  user's OWN matching events (bounded in practice; pre-filter to the
  funnel's event types keeps it minimal even for hot users).
- ``cohort_retention`` assigns each user to the period of their first
  event and counts distinct active users per (cohort, period offset) —
  two shuffles total (first-event agg, then the joined activity agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps,
    within_seconds: float = None,
) -> DataFrame:
    """Ordered funnel: for each prefix of ``steps``, how many users
    completed it in timestamp order (a later step must occur strictly
    after the matched earlier step), optionally within
    ``within_seconds`` of the user's first step-1 event (windowFunnel
    semantics, anchored at the first step-1 occurrence).

    Returns ``(step_idx, step, n_users)`` where n_users counts users
    whose longest in-order prefix reaches at least that step.
    Ties in timestamps: an event at the exact same timestamp as the
    previously matched step does NOT advance the funnel (strict >).
    """
    per_user = funnel_depths(
        df, user_col, ts_col, type_col, steps, within_seconds=within_seconds,
    )
    depth_counts = (
        per_user.groupBy("__depth")
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    by_depth = {r["__depth"]: r["__n"] for r in depth_counts}
    spark = df.sparkSession
    steps = list(steps)
    rows = []
    for i, s in enumerate(steps):
        n = sum(v for k, v in by_depth.items() if k >= i + 1)
        rows.append((i + 1, s, n))
    return local_rows_df(spark, 
        rows, "step_idx long, step string, n_users long",
    )


def funnel_depths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps,
    within_seconds: float = None,
) -> DataFrame:
    """Per-user funnel depth frame ``(__u, __depth)`` — the distributed
    core of :func:`funnel`, exposed so callers (and the plan-shape
    tests) can target the actual one-shuffle pipeline.

    ``within_seconds`` adds the windowFunnel-style completion
    constraint: the funnel is anchored at the user's FIRST step-1
    event and later steps only count while they fall within
    ``within_seconds`` of that anchor (timestamp or numeric time
    columns; numeric columns interpret the window in their own
    units)."""
    steps = list(steps)
    if not steps:
        raise ValueError("steps must be non-empty")
    evs = df.filter(F.col(type_col).isin(steps)).select(
        F.col(user_col).alias("__u"),
        F.struct(
            F.col(ts_col).alias("t"), F.col(type_col).alias("e"),
        ).alias("__ev"),
    )
    steps_lit = F.array(*[F.lit(s) for s in steps])
    # the fold accumulator's time field must match ts_col's actual type
    # (date, timestamp, epoch long all work) or the two when() branches
    # build mismatched structs
    ts_type = df.schema[ts_col].dataType
    from pyspark.sql import types as T

    if within_seconds is not None:
        if isinstance(ts_type, (T.TimestampType, T.TimestampNTZType)):
            def _num(c):
                return F.unix_micros(c)

            win = float(within_seconds) * 1_000_000
        elif isinstance(ts_type, T.NumericType):
            def _num(c):
                return c.cast("double")

            win = float(within_seconds)
        else:
            raise ValueError(
                "within_seconds needs a timestamp or numeric time column",
            )

    def _advance(acc, ev):
        cond = (
            (acc["k"] < F.lit(len(steps)))
            & (ev["e"] == F.element_at(steps_lit, acc["k"] + 1))
            & (acc["t"].isNull() | (ev["t"] > acc["t"]))
        )
        if within_seconds is not None:
            cond = cond & (
                acc["t0"].isNull()
                | (_num(ev["t"]) - _num(acc["t0"]) <= win)
            )
        fields = [(acc["k"] + 1).alias("k"), ev["t"].alias("t")]
        if within_seconds is not None:
            fields.append(
                F.coalesce(acc["t0"], ev["t"]).alias("t0"),
            )
        return F.when(cond, F.struct(*fields)).otherwise(acc)

    init_fields = [
        F.lit(0).alias("k"),
        F.lit(None).cast(ts_type).alias("t"),
    ]
    if within_seconds is not None:
        init_fields.append(F.lit(None).cast(ts_type).alias("t0"))
    per_user = (
        evs.groupBy("__u")
        .agg(F.sort_array(F.collect_list("__ev")).alias("__evs"))
        .select(
            "__u",
            # fold: acc = (stage reached, ts of last matched step,
            # [anchor = first matched step-1 ts]).  advance when the
            # event matches the next step, is strictly later than the
            # previous match, and (windowed mode) stays within the
            # window of the anchor.
            F.aggregate(
                "__evs",
                F.struct(*init_fields),
                _advance,
            )["k"].alias("__depth"),
        )
    )
    return per_user


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort retention: users are cohorted by the ``period_days``-sized
    bucket of their FIRST event (bucket 0 = the earliest event date in
    the data); for each (cohort, offset) the count of distinct users
    from that cohort active ``offset`` periods later.

    Returns ``(cohort, offset, n_users)``.  Day arithmetic on
    ``to_date`` boundaries — engine-portable (no timezone-dependent
    truncation).
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    d0 = df.agg(F.min(F.to_date(ts_col))).collect()[0][0]
    day = F.datediff(F.to_date(ts_col), F.lit(d0))
    per_event = df.select(
        F.col(user_col).alias("__u"),
        (day / period_days).cast("long").alias("__p"),
    )
    firsts = per_event.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    return (
        per_event.join(firsts, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort"),
            (F.col("__p") - F.col("__cohort")).alias("offset"),
        )
        .agg(F.count_distinct("__u").alias("n_users"))
    )


def transition_matrix(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    tie_cols=(),
) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every ordered pair of consecutive events within a user,
    the transition count and the conditional probability
    P(next = b | current = a).

    Execution shape: ONE partitioned window per user computes the
    next-event lead (single sort/exchange, keyed on the user — the same
    bounded-per-entity assumption as ``rolling_features``), then a
    groupBy on the (event, next_event) pair.  The matrix itself is
    |event types|² rows — tiny — so the per-source normalizing window
    runs on the aggregated result, not the events.  Deterministic under
    repeated timestamps when ``tie_cols`` includes a unique event id.

    Returns ``(event, next_event, n, prob)``.
    """
    w = W.partitionBy(user_col).orderBy(
        F.col(ts_col), *[F.col(c) for c in tie_cols],
    )
    pairs = df.select(
        F.col(type_col).alias("event"),
        F.lead(type_col).over(w).alias("next_event"),
    ).where(F.col("next_event").isNotNull())
    counts = pairs.groupBy("event", "next_event").agg(
        F.count(F.lit(1)).alias("n"),
    )
    w_src = W.partitionBy("event")
    return counts.select(
        "event",
        "next_event",
        "n",
        (F.col("n") / F.sum("n").over(w_src)).alias("prob"),
    )


def top_paths(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    k: int = 3,
    sep: str = ">",
    tie_cols=(),
) -> DataFrame:
    """Most common k-event opening paths: each user's first ``k`` events
    in timestamp order joined into one ``sep``-delimited path string,
    counted across users.

    One groupBy(user) collect-sorts each user's first-k candidate
    events (the per-user state is capped at the full event list of one
    user pre-aggregation, then sliced to k — pre-filtering with a
    window row_number would add a second sort for no shuffle savings),
    then one groupBy(path) counts.  Two shuffles total, both map-side
    combinable on the second.  Returns ``(path, path_len, n_users)``.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(ts_col).alias("t"),
                *[F.col(c).alias(f"b{i}") for i, c in enumerate(tie_cols)],
                F.col(type_col).alias("e"),
            ),
        ),
    )
    per_user = df.groupBy(user_col).agg(
        F.slice(ordered, 1, k).alias("__head"),
    )
    return (
        per_user.select(
            F.array_join(F.transform("__head", lambda s: s["e"]), sep).alias(
                "path",
            ),
            F.size("__head").alias("path_len"),
        )
        .groupBy("path", "path_len")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 4,
    asof_ts=None,
) -> DataFrame:
    """RFM segmentation — the classic customer-value triage: per user,
    Recency (days since last event, as of ``asof_ts`` or the data's
    max), Frequency (event count), Monetary (value sum), each scored
    into ``n_tiles`` equi-depth tiles (1 = worst, n = best; recency
    inverts so recent = high score).

    One user aggregation, then three DISTRIBUTED ntiles over the
    AGGREGATED user table (``rank.global_ntile`` — a plain global
    NTILE window would single-reduce hundreds of millions of users).
    Deterministic ties via the user id.  Returns ``(user, recency_days,
    frequency, monetary, r_score, f_score, m_score, rfm)`` with ``rfm``
    the concatenated segment label.  Persisted intermediates ride the
    result (``lifecycle.release`` after consumption).
    """
    from woodwork_spark.lifecycle import attach_persisted, persisted_frames
    from woodwork_spark.operators.rank import global_ntile

    if asof_ts is None:
        asof_ts = df.agg(F.max(ts_col)).collect()[0][0]
    per_user = df.groupBy(F.col(user_col).alias("user")).agg(
        F.datediff(
            F.lit(asof_ts).cast("timestamp").cast("date"),
            F.max(F.col(ts_col)).cast("date"),
        ).alias("recency_days"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(value_col).alias("monetary"),
    )
    scored = per_user
    frames = []
    for out_c, order in (
        ("r_score", [F.desc("recency_days"), F.asc("user")]),
        ("f_score", [F.asc("frequency"), F.asc("user")]),
        ("m_score", [F.asc("monetary"), F.asc("user")]),
    ):
        scored = global_ntile(scored, order, n_tiles, out_col=out_c)
        frames += list(persisted_frames(scored))
    out = scored.withColumn(
        "rfm",
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score"),
        ),
    )
    return attach_persisted(out, *frames)


def cohort_ltv(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    period_days: int = 7,
) -> DataFrame:
    """Cohort lifetime-value curve — ``cohort_retention``'s revenue
    cousin: users cohort by first-event period; for each (cohort,
    offset) the period value, cumulative value, and cumulative value
    PER COHORT USER (the LTV curve product teams plot).

    Same two-shuffle shape as retention (first-event agg + joined
    activity agg) plus one cumulative window over the tiny
    (cohort, offset) table.
    """
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    d0 = df.agg(F.min(F.to_date(ts_col))).collect()[0][0]
    day = F.datediff(F.to_date(ts_col), F.lit(d0))
    per_event = df.select(
        F.col(user_col).alias("__u"),
        (day / period_days).cast("long").alias("__p"),
        F.col(value_col).alias("__v"),
    )
    firsts = per_event.groupBy("__u").agg(F.min("__p").alias("__cohort"))
    sizes = firsts.groupBy("__cohort").agg(
        F.count(F.lit(1)).alias("__cohort_users"),
    )
    per = (
        per_event.join(firsts, "__u")
        .groupBy(
            F.col("__cohort").alias("cohort"),
            (F.col("__p") - F.col("__cohort")).alias("offset"),
        )
        .agg(
            F.sum("__v").alias("period_value"),
            F.count_distinct("__u").alias("active_users"),
        )
    )
    w = (
        W.partitionBy("cohort")
        .orderBy("offset")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        per.join(
            F.broadcast(sizes.withColumnRenamed("__cohort", "cohort")),
            "cohort",
        )
        .select(
            "cohort", "offset", "period_value", "active_users",
            F.sum("period_value").over(w).alias("cum_value"),
            (
                F.sum("period_value").over(w) / F.col("__cohort_users")
            ).alias("ltv_per_user"),
            F.col("__cohort_users").alias("cohort_users"),
        )
    )


def attribute_conversions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type,
    lookback_seconds: int = None,
    order_cols=(),
) -> DataFrame:
    """Last-touch attribution: each conversion event is credited to the
    channel (``type_col``) of the user's most recent PRECEDING
    non-conversion event — or ``"direct"`` when there is none (or none
    within ``lookback_seconds``).  The standard marketing-analytics
    read of an event stream; first-touch and multi-touch are variants
    of the same window.

    Scale shape: ONE window per user ordered by time carries the whole
    computation — ``last(struct(ts, type)) ignorenulls`` over the
    strictly-preceding frame picks the touch, so there is exactly one
    shuffle (on the user key) and no self-join against the event
    history.  ``order_cols`` breaks timestamp ties deterministically
    (pass the event id).

    Returns the conversion rows with ALL their original columns (the
    payload — revenue, ids — is what attribution reports aggregate)
    plus ``channel`` ("direct" for organic conversions) and
    ``seconds_since_touch`` (NULL for direct).
    """
    tie = [F.col(c).asc() for c in (
        [order_cols] if isinstance(order_cols, str) else list(order_cols)
    )]
    w = (
        W.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), *tie)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_conv = F.col(type_col) == F.lit(conversion_type)
    touch = F.last(
        F.when(
            ~is_conv,
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("ch")),
        ),
        ignorenulls=True,
    ).over(w)
    scored = df.withColumn("__touch", touch).where(is_conv)
    age = (
        F.unix_micros(F.col(ts_col))
        - F.unix_micros(F.col("__touch.ts"))
    ) / 1_000_000.0
    in_window = (
        F.lit(True) if lookback_seconds is None
        else age <= F.lit(float(lookback_seconds))
    )
    channel = F.when(
        F.col("__touch").isNotNull() & in_window, F.col("__touch.ch"),
    ).otherwise(F.lit("direct"))
    return scored.select(
        *[c for c in df.columns],
        channel.alias("channel"),
        F.when(
            F.col("__touch").isNotNull() & in_window, age,
        ).alias("seconds_since_touch"),
    )


def frequent_subsequences(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    min_users: int = 2,
    max_len: int = 3,
    order_cols=(),
) -> DataFrame:
    """Gap-allowed frequent event-type subsequences (the sequence-
    mining view: "view ... then purchase", ANY events between) with
    per-user set semantics — a user supports a pattern once no matter
    how often it recurs.  Complements :func:`transition_matrix`
    (adjacent steps only) and :func:`top_paths` (contiguous openings).

    Scale shape — NO position-pair self-join (that is O(events²) per
    user; a 100-event user costs 5k pair rows, 160k triple rows).
    Existence of t1 < t2 < t3 collapses to order statistics:

    * pair (t1, t2) exists iff some t2 occurs AFTER the FIRST t1;
    * the earliest such position m2 makes triple (t1, t2, t3) exist
      iff the LAST t3 occurs after m2

    so the whole computation is one window (positions), one groupBy
    (per-user first/last per type — rows = users x types), one
    events x types join for m2, and one tiny types-cube join — all
    keyed on the user, work LINEAR in events per user.  The harness
    oracle is the brute-force positional definition, proving the
    order-statistics construction equivalent on every run.

    Returns ``(pattern, length, n_users)`` with pattern like
    "view>click>purchase", filtered to support >= ``min_users``.
    """
    if max_len not in (2, 3):
        raise ValueError(f"max_len must be 2 or 3, got {max_len}")
    if min_users < 1:
        raise ValueError(f"min_users must be >= 1, got {min_users}")
    tie = [F.col(c).asc() for c in (
        [order_cols] if isinstance(order_cols, str) else list(order_cols)
    )]
    w = W.partitionBy(user_col).orderBy(F.col(ts_col).asc(), *tie)
    # NULL types are not event labels: concat_ws would silently drop
    # them and render (NULL, x) as a fake length-2 pattern "x"
    ev = df.where(
        F.col(type_col).isNotNull() & F.col(user_col).isNotNull(),
    ).select(
        F.col(user_col).alias("__u"),
        F.col(type_col).alias("__t"),
        F.row_number().over(w).alias("__p"),
    )
    # per (user, type): first and last occurrence positions
    span = ev.groupBy("__u", "__t").agg(
        F.min("__p").alias("__f"), F.max("__p").alias("__l"),
    )
    firsts = span.select(
        F.col("__u").alias("__u1"), F.col("__t").alias("t1"),
        F.col("__f").alias("__f1"),
    )
    # earliest t2 occurrence strictly after the first t1:
    # events x types join, keyed on the user
    m2 = (
        ev.join(firsts, (ev.__u == firsts.__u1) & (F.col("__p") > F.col("__f1")))
        .groupBy("__u", "t1", F.col("__t").alias("t2"))
        .agg(F.min("__p").alias("__m2"))
    )
    len2 = (
        m2.groupBy("t1", "t2")
        .agg(F.countDistinct("__u").alias("n_users"))
        .where(F.col("n_users") >= min_users)
    )
    out2 = len2.select(
        F.concat_ws(">", "t1", "t2").alias("pattern"),
        F.lit(2).alias("length"),
        F.col("n_users").cast("long").alias("n_users"),
    )
    if max_len == 2:
        return out2
    lasts = span.select(
        F.col("__u").alias("__u3"), F.col("__t").alias("t3"),
        F.col("__l").alias("__l3"),
    )
    triples_u = m2.join(
        lasts, (m2.__u == lasts.__u3) & (F.col("__l3") > F.col("__m2")),
    ).select("__u", "t1", "t2", "t3")
    out3 = (
        triples_u.groupBy("t1", "t2", "t3")
        .agg(F.countDistinct("__u").alias("n_users"))
        .where(F.col("n_users") >= min_users)
        .select(
            F.concat_ws(">", "t1", "t2", "t3").alias("pattern"),
            F.lit(3).alias("length"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )
    return out2.unionAll(out3)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
    session_col: str = "session_idx",
) -> DataFrame:
    """BATCH sessionization by inactivity gap — the offline twin of
    ``streaming.sessionize_stream``: an event starts a new session when
    it follows the user's previous event by more than ``gap_seconds``
    (or is the user's first).  Adds ``session_col`` (0-based per-user
    session index) next to the input columns; compose with
    :func:`session_stats` for the per-session rollup.

    Shape: ONE window partitioned by user (lag + running sum share the
    same sort) — one shuffle on the user key, per-reducer state bounded
    by a single user's history, never global.  Rows with a null user or
    timestamp are passed through with a null session index (they belong
    to no session; dropping them silently would hide logging defects).
    """
    w = W.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    # null-ts rows contribute 0 to the running sum (they get a null
    # session index below); without the gate each null-ts row would
    # shift the user's REAL session indices off their documented 0 base
    new_sess = F.when(F.col(ts_col).isNull(), F.lit(0)).when(
        prev.isNull()
        | (
            F.col(ts_col).cast("double") - prev.cast("double")
            > F.lit(float(gap_seconds))
        ),
        F.lit(1),
    ).otherwise(F.lit(0))
    idx = F.sum(new_sess).over(w) - 1
    return df.withColumn(
        session_col,
        F.when(
            F.col(user_col).isNotNull() & F.col(ts_col).isNotNull(),
            idx,
        ).cast("long"),
    )


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Per-session rollup over :func:`sessionize`: start, end, duration
    (seconds) and event count per (user, session index) — one grouped
    aggregation on top of the sessionizing window, so the whole operator
    is two stages that share the user-key partitioning (the groupBy can
    reuse the window's shuffle).  Null-user/timestamp rows are excluded
    (they have no session)."""
    s = sessionize(df, user_col, ts_col, gap_seconds)
    return (
        s.filter(F.col("session_idx").isNotNull())
        .groupBy(F.col(user_col), F.col("session_idx"))
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            (
                F.max(F.col(ts_col).cast("double"))
                - F.min(F.col(ts_col).cast("double"))
            ).alias("duration_sec"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
