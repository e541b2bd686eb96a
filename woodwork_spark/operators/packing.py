"""Sequence packing and corpus-mix operators for training-data prep.

These are LLM-pipeline primitives beyond the reference's scope (the
reference is a typing layer; see SURVEY.md §2 addendum): given a corpus
of token-counted documents, assign each document its position in the
concatenated fixed-length training-sequence stream (GPT-style
concat-then-chunk packing), cap per-source document counts, and report /
rebalance the source mix.

All operators are pure DataFrame compositions — no UDFs, no driver-side
row loops; the only collects are bounded per-partition subtotal tables
inside the distributed prefix-sum primitives (operators/rank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from woodwork_spark.lifecycle import attach_persisted, persisted_frames
from woodwork_spark.operators.rank import global_prefix_sum, grouped_prefix_sum


def pack_sequences(
    df: DataFrame,
    count_col: str,
    seq_len: int,
    order,
    group_cols=None,
    out_prefix: str = "seq",
    small_threshold: int = 100_000,
) -> DataFrame:
    """Concat-then-chunk packing: documents are laid end-to-end in
    deterministic ``order`` (per group when ``group_cols`` given, e.g.
    one stream per language) and the stream is cut into fixed
    ``seq_len``-token training sequences.  Each document gets:

    - ``{out_prefix}_id``:  index of the sequence its first token lands in,
    - ``{out_prefix}_off``: token offset within that sequence,

    i.e. exactly where a tokenizer writer would place it.  Documents may
    straddle sequence boundaries — that IS the standard pretraining
    packing semantics (no padding, no loss of tokens).

    Scale: one range shuffle + per-partition windows via the distributed
    prefix-sum primitives; a dominant group ('en' at 90% of a 100 TB
    corpus) spans many partitions instead of one reducer.
    """
    if group_cols:
        out = grouped_prefix_sum(
            df,
            group_cols,
            order,
            count_col,
            out_col="__prefix",
            small_threshold=small_threshold,
        )
    else:
        out = global_prefix_sum(
            df, order, count_col, out_col="__prefix",
            small_threshold=small_threshold,
        )
    final = (
        # integer DIV, not '/': Spark '/' is double division, exact only
        # while the cumulative token prefix stays below 2^53 — a 100 TB
        # corpus at ~500 tokens/KB crosses that around 50 PB-tokens, but
        # the long path is exact at any scale and costs the same
        out.withColumn(
            f"{out_prefix}_id", F.expr(f"__prefix DIV CAST({int(seq_len)} AS BIGINT)"),
        )
        .withColumn(
            f"{out_prefix}_off", (F.col("__prefix") % seq_len).cast("long"),
        )
        .drop("__prefix")
    )
    return attach_persisted(final, *persisted_frames(out))


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order,
) -> DataFrame:
    """Keep at most ``k`` documents per group (source/domain/host), chosen
    deterministically by ``order`` — the per-domain cap every web-scale
    corpus applies so no single crawl host dominates.

    One partitioned window (reducer per group): group sizes are bounded
    by crawl reality, and the filter drops rows beyond rank k inside the
    same stage — no second shuffle.  For pathological single-group skew,
    pre-filter with a per-partition ``limit`` before the window.
    """
    w = W.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mix_report(
    df: DataFrame,
    group_col: str,
    weight_col: str = None,
    target: dict = None,
) -> DataFrame:
    """Corpus-mix report per group: document count, token share (by
    ``weight_col`` when given, else rows), achieved fraction, and — when
    a ``target`` mix {group: fraction} is supplied — the sampling
    fraction that would rebalance this corpus to the target (>=1 means
    the group is under-represented and cannot be upsampled by filtering).

    One aggregation job; the target map joins as a broadcast literal.
    """
    wexpr = F.sum(weight_col) if weight_col else F.count(F.lit(1))
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        wexpr.cast("double").alias("weight"),
    )
    total = F.sum("weight").over(W.partitionBy())
    agg = agg.withColumn("achieved_frac", F.col("weight") / total)
    if target:
        items = []
        for kk, vv in target.items():
            items += [F.lit(kk), F.lit(float(vv))]
        tmap = F.create_map(*items)
        agg = agg.withColumn("target_frac", tmap[F.col(group_col)])
        agg = agg.withColumn(
            "sample_frac",
            F.when(
                F.col("target_frac").isNotNull() & (F.col("achieved_frac") > 0),
                F.col("target_frac") / F.col("achieved_frac"),
            ),
        )
    return agg


def rebalance_mix(
    df: DataFrame,
    key_col: str,
    group_col: str,
    target: dict,
    weight_col: str = None,
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample groups to a ``target`` mix
    {group: fraction}: after filtering, group weights satisfy
    ``w_g' = c * target_g`` for the largest feasible ``c`` (filtering can
    only downsample, so ``c = min_g(w_g / target_g)`` — the scarcest
    group is kept whole and everything else shrinks to match).  Groups
    absent from ``target`` are dropped: the target defines the full mix.

    One agg for the weights, then the same stable-hash filter as
    ``hash_split`` — reproducible across runs, engines, partitionings.
    """
    from woodwork_spark.operators.sampling import stratified_hash_sample

    wexpr = F.sum(weight_col) if weight_col else F.count(F.lit(1))
    rows = (
        df.groupBy(group_col).agg(wexpr.cast("double").alias("w")).collect()
    )
    weights = {r[group_col]: r["w"] for r in rows}
    missing = [g for g, t in target.items() if t > 0 and not weights.get(g)]
    if missing:
        # c would be 0 and the whole corpus would silently filter away
        raise ValueError(
            f"rebalance_mix: target groups absent from the data: {missing}",
        )
    c = min(
        (weights[g] / t for g, t in target.items() if t > 0),
        default=0.0,
    )
    fractions = {}
    for g, w in weights.items():
        t = target.get(g)
        if t is None or w <= 0:
            fractions[g] = 0.0  # outside the target mix: drop
        else:
            fractions[g] = min(c * t / w, 1.0)
    return stratified_hash_sample(
        df, key_col, fractions, group_col, salt=salt,
    )


def select_to_budget(
    df: DataFrame,
    group_col: str,
    score_col: str,
    token_col: str,
    budget: int,
    id_col: str,
    out_col: str = "cum_tokens",
    known_count: int = None,
) -> DataFrame:
    """Quality-ranked token-budget selection per group: within each
    group (source/language/domain), keep documents in DESCENDING
    ``score_col`` order while the inclusive running ``token_col`` sum
    stays within ``budget`` — "the best N-billion tokens per source",
    the selection step between quality scoring and sequence packing in
    a training-data pipeline.

    Rides ``grouped_prefix_sum``'s range shuffle on (group, -score,
    id): a group holding 90% of the corpus spans many partitions —
    no reducer-per-group window, no single-reducer stage.  Truncation
    semantics: a document is kept iff its inclusive cumulative tokens
    <= budget (the first over-budget doc and everything ranked below
    it are dropped).  Ties on score break by ascending ``id_col``, so
    the kept set is deterministic.  Returns the kept rows with
    ``{out_col}`` = inclusive cumulative tokens.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    from woodwork_spark.operators.rank import grouped_prefix_sum

    out = grouped_prefix_sum(
        df,
        group_col,
        [F.col(score_col).desc(), F.col(id_col).asc()],
        token_col,
        out_col="__prefix",
        known_count=known_count,
    )
    final = (
        out.withColumn(out_col, F.col("__prefix") + F.col(token_col))
        .where(F.col(out_col) <= budget)
        .drop("__prefix")
    )
    return attach_persisted(final, *persisted_frames(out))


def packing_efficiency_report(
    df: DataFrame,
    count_col: str,
    seq_len: int,
    group_cols=None,
) -> DataFrame:
    """Padding-waste accounting for a packing run: per group (or one
    global row), compare the two standard batching strategies at
    ``seq_len``:

    - concat-and-chunk (:func:`pack_sequences`): zero padding, docs
      straddle boundaries — ``packed_seqs = ceil(total_tokens /
      seq_len)`` and the only waste is the tail of the last sequence;
    - one-doc-per-sequence with truncation: every doc occupies
      ``ceil(min(tokens, seq_len) / seq_len)`` = 1 sequence, tokens
      beyond ``seq_len`` are LOST and the remainder is padded.

    Columns: ``n_docs, total_tokens, packed_seqs, packed_pad (tail
    padding of the final chunk), padded_seqs, truncated_tokens (lost to
    the cut), pad_tokens (padding burned), pad_fraction`` (padding share
    of the padded strategy's token grid).  ONE aggregation — the report
    is arithmetic over sums, so it costs a scan regardless of corpus
    size, and makes the case for packing with numbers instead of folklore.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    group_cols = (
        [group_cols] if isinstance(group_cols, str) else list(group_cols or [])
    )
    t = F.col(count_col).cast("long")
    kept = F.least(t, F.lit(int(seq_len)).cast("long"))
    grouped = df.groupBy(*group_cols) if group_cols else df.groupBy()
    agg = grouped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(t).alias("total_tokens"),
        F.sum(t - kept).alias("truncated_tokens"),
        F.sum(F.lit(int(seq_len)).cast("long") - kept).alias("pad_tokens"),
    )
    packed_seqs = F.expr(
        f"(total_tokens + {int(seq_len)} - 1) DIV {int(seq_len)}",
    )
    return agg.select(
        *group_cols,
        "n_docs", "total_tokens",
        packed_seqs.alias("packed_seqs"),
        (packed_seqs * seq_len - F.col("total_tokens")).alias("packed_pad"),
        F.col("n_docs").alias("padded_seqs"),
        "truncated_tokens",
        "pad_tokens",
        (
            F.col("pad_tokens").cast("double")
            / (F.col("n_docs") * F.lit(int(seq_len))).cast("double")
        ).alias("pad_fraction"),
    )


def waterfill_cap(
    df: DataFrame,
    group_col: str,
    count_col: str,
    budget: int,
) -> DataFrame:
    """Water-filling allocation: the single integer cap ``tau`` such
    that capping EVERY group's count at ``tau`` brings the grand total
    within ``budget``, wasting as little headroom as possible — the
    "no crawl host dominates, but spend the whole token budget" mix
    planner (cap_per_group answers "apply a cap"; this answers "WHICH
    cap").

    With group counts sorted ascending and ``prefix_i`` the exclusive
    running sum, a cap of ``c_i`` keeps ``prefix_i + (G - i) * c_i``
    tokens; that expression is non-decreasing in i, so the optimal tau
    lives in the first sorted position where it exceeds the budget:
    ``tau = floor((budget - prefix_i) / (G - i))``.  All positions are
    scored in ONE range-partitioned prefix-sum pass (no single-reducer
    window, works at millions-of-hosts cardinality) and the boundary
    is a struct-min fold.  If even the full total fits, tau = the max
    count (nothing capped); a budget below the group count yields
    tau = 0 (every group capped away — the mathematically consistent
    answer, left to the caller to interpret).

    Returns one row per group: ``(group_col, count, alloc)`` with
    ``alloc = least(count, tau)`` plus the constant ``tau`` column.
    NULL counts are treated as 0; NULL groups are kept (their own
    group).
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    counts = df.groupBy(group_col).agg(
        F.coalesce(F.sum(F.col(count_col)), F.lit(0))
        .cast("long").alias("count"),
    )
    order = [F.asc("count"), F.asc(group_col)]
    ranked = global_prefix_sum(
        counts, order, "count", out_col="__prefix",
    ).persist()
    totals = ranked.agg(
        F.count(F.lit(1)).alias("__g"),
        F.max("count").alias("__max"),
    )
    # (G - i) for the 0-based sorted position i comes from one more
    # exclusive prefix sum over ones — same range shuffle, no global
    # rank window
    ones = global_prefix_sum(
        ranked.withColumn("__one", F.lit(1)), order, "__one", out_col="__i",
    )
    scored = ones.crossJoin(F.broadcast(totals)).withColumn(
        "__kept_at_cap",
        F.col("__prefix") + (F.col("__g") - F.col("__i")) * F.col("count"),
    )
    # first sorted position whose own-count cap meets the budget; empty
    # (the full total fits) -> null struct -> tau falls back to max
    boundary = scored.filter(
        F.col("__kept_at_cap") >= budget,
    ).agg(
        F.min(
            F.struct(
                F.col("__i").alias("i"),
                F.col("__prefix").alias("prefix"),
                (F.col("__g") - F.col("__i")).alias("remaining"),
            ),
        ).alias("b"),
    ).select(
        (F.lit(int(budget)) - F.col("b.prefix")).alias("__num"),
        F.col("b.remaining").alias("__rem"),
    ).select(
        # integer DIV, not floor(double /): exact past 2^53 token budgets
        F.expr("__num DIV __rem").cast("long").alias("__tau_raw"),
    )
    final_tau = boundary.crossJoin(F.broadcast(totals)).select(
        F.coalesce(F.col("__tau_raw"), F.col("__max")).alias("tau"),
    )
    out = ranked.crossJoin(F.broadcast(final_tau)).select(
        group_col,
        "count",
        F.least(F.col("count"), F.col("tau")).alias("alloc"),
        "tau",
    )
    return attach_persisted(
        out, ranked,
        *persisted_frames(ranked), *persisted_frames(ones),
    )
