"""Corpus-curation operators: per-source quality governance, TF-IDF
term weighting, and BM25 retrieval scoring.

Training-data curation acts on SOURCES (domains, crawls, dumps) as much
as on documents: a handful of low-quality domains can dominate a corpus,
and per-source aggregate signals are the cheapest lever for catching
them.  TF-IDF/BM25 provide the standard lexical-relevance machinery for
contamination search, topic filtering, and retrieval-based curation.

Scale shapes:

- ``source_quality_report``: document-level quality columns reduce with
  ONE map-side-partial aggregation keyed on the (low-cardinality) source
  column; dup-fraction reuses the fingerprint groupBy.  Output is
  per-source — tiny at any corpus size.
- ``filter_by_source_quality``: the per-source verdict table is
  broadcast-joined back (sources are thousands, documents billions — the
  canonical small-dim big-fact join).
- ``tfidf_top_terms``: one token explode -> (doc, term) tf agg ->
  term-level df agg -> join -> per-document top-k window.  The window
  partitions by doc_id (massively parallel, no global sort); shuffles
  carry hashed-term longs plus counts, never document text.
- ``bm25_search``: query terms are a literal handful — broadcast against
  the (term -> posting) aggregates; scores reduce per (query, doc) with
  map-side combine.  No full-corpus collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df

from woodwork_spark.operators.text import quality_score_exprs, tokens_expr


def _doc_tokens(df: DataFrame, id_col: str, text_col: str,
                lowercase: bool = True) -> DataFrame:
    """(id, token) rows: whitespace split, empties dropped."""
    toks = tokens_expr(text_col)
    if lowercase:
        toks = F.transform(toks, lambda t: F.lower(t))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
    )


def source_quality_report(
    df: DataFrame,
    group_col: str,
    text_col: str,
) -> DataFrame:
    """Per-source quality aggregates: document count, token/char means,
    mean composite quality score, and the exact-duplicate fraction
    (1 - distinct_fingerprints/docs) within each source.

    One pass computes the quality signals per document (pure Column
    exprs, codegen'd); one aggregation keyed on ``group_col`` reduces
    them with map-side partials.  The dup fraction rides the same agg via
    count_distinct on the md5 fingerprint — no second shuffle of text.
    Output cardinality = number of sources: safe to collect, broadcast,
    or join at any corpus scale.
    """
    q = quality_score_exprs(text_col)
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    per_doc = df.select(
        F.col(group_col).alias("source"),
        q["n_tokens"].alias("__tokens"),
        q["n_chars"].alias("__chars"),
        q["quality_score"].alias("__score"),
        q["stopword_ratio"].alias("__stop"),
        F.md5(norm).alias("__fp"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("__tokens").alias("avg_tokens"),
        F.avg("__chars").alias("avg_chars"),
        F.avg("__score").alias("avg_quality"),
        F.avg("__stop").alias("avg_stopword_ratio"),
        (
            1.0
            - F.count_distinct("__fp") / F.count(F.lit(1)).cast("double")
        ).alias("dup_fraction"),
    )


def filter_by_source_quality(
    df: DataFrame,
    group_col: str,
    text_col: str,
    min_avg_quality: float = 0.0,
    max_dup_fraction: float = 1.0,
    min_docs: int = 1,
) -> DataFrame:
    """Drop every document whose SOURCE fails the aggregate bar — the
    domain-blocklist step of a curation pipeline, derived from data
    instead of a hand list.

    The per-source report is tiny, so the verdict side is explicitly
    ``broadcast()``: the corpus never shuffles, each task filters its
    partition against the in-memory verdict map.
    """
    report = source_quality_report(df, group_col, text_col)
    good = report.filter(
        (F.col("avg_quality") >= min_avg_quality)
        & (F.col("dup_fraction") <= max_dup_fraction)
        & (F.col("n_docs") >= min_docs),
    ).select(F.col("source").alias("__good_source"))
    return (
        df.join(
            F.broadcast(good),
            # null-safe: a NULL source is a legitimate group (missing
            # provenance) and must pass/fail on its aggregate stats like
            # any other — a plain == would silently drop every such doc
            df[group_col].eqNullSafe(F.col("__good_source")),
            "inner",
        )
        .drop("__good_source")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_df: int = 1,
    lowercase: bool = True,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    idf uses the smoothed form ln((1 + N) / (1 + df)) + 1 (no
    division-by-zero, never negative), tfidf = tf * idf.  Ties order by
    term ascending so ranks are deterministic across engines.

    Returns (id_col, term, tf, df, tfidf, rank), rank in [1, k].

    Shape: explode -> (doc, term) count -> term df agg -> join on term ->
    row_number window PARTITIONED BY document.  Every stage has map-side
    partials; the window never sees more than one document's terms per
    partition slice, so parallelism scales with document count.  The
    doc-count N is one cheap count() on the input (count-distinct of ids
    at corpus scale would be a second shuffle; documents are one row each
    here, so count(*) is exact).
    """
    from pyspark.sql import Window

    n_docs = df.count()
    tok = _doc_tokens(df, id_col, text_col, lowercase=lowercase)
    tf = tok.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("df") >= min_df)
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("df"))) + 1.0
    scored = (
        tf.join(dfreq, "token")
        .withColumn("tfidf", F.col("tf") * idf)
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("tfidf"), F.asc("token"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("id").alias(id_col),
            F.col("token").alias("term"),
            "tf",
            "df",
            "tfidf",
            "rank",
        )
    )


def bm25_search(
    df: DataFrame,
    id_col: str,
    text_col: str,
    queries: dict[str, str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    lowercase: bool = True,
) -> DataFrame:
    """BM25 retrieval over the corpus for a small set of named queries —
    the scoring backbone of contamination search ("find training docs
    that look like this benchmark item") and topic-targeted curation.

    ``queries`` maps query_id -> query text.  Scores use the standard
    Robertson/Sparck-Jones form: idf(t) = ln(1 + (N - df + 0.5) /
    (df + 0.5)); per-term contribution tf*(k1+1) / (tf + k1*(1 - b +
    b*dl/avgdl)).  Returns (query_id, id_col, score, rank) with rank in
    [1, top_k], ties broken by document id ascending.

    Shape: the query-term table is a literal handful of rows — built
    driver-side and BROADCAST-semi-joined against the token explode
    BEFORE any aggregation, so the corpus-wide (doc, term) tf shuffle
    never happens: only tokens matching a query term reach a groupBy.
    df(t) computed from the filtered explode is still exact (it retains
    every document containing t).  Doc lengths reduce with map-side
    partial counts (the shuffle carries per-partition partials, not
    tokens).  Final per-query top-k is a window over query_id (constant
    cardinality) after scores have reduced to matching docs only.
    """
    from pyspark.sql import Window

    if not queries:
        raise ValueError("bm25_search: queries must be non-empty")
    spark = df.sparkSession
    tok = _doc_tokens(df, id_col, text_col, lowercase=lowercase)

    qrows = []
    for qid, qtext in queries.items():
        terms = [t for t in qtext.split() if t]
        if lowercase:
            terms = [t.lower() for t in terms]
        for t in sorted(set(terms)):
            qrows.append((qid, t))
    qterms = local_rows_df(spark, qrows, "query_id string, token string")
    qtokens = qterms.select("token").distinct()

    # prune the explode to query terms FIRST — everything downstream is
    # |matching tokens|, not |corpus tokens|
    tokq = tok.join(F.broadcast(qtokens), "token")
    tf = tokq.groupBy("id", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # doc length needs no explode at all: count non-empty tokens in place
    toks_inplace = tokens_expr(text_col)
    dl = df.select(
        F.col(id_col).alias("id"),
        F.size(F.filter(toks_inplace, lambda t: t != "")).alias("dl"),
    )
    # N and avgdl in ONE driver action (two separate scans would double
    # the corpus passes for two scalars)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl"),
    ).first()
    n_docs, avgdl = stats["n"], stats["avgdl"] or 1.0

    idf = F.log(
        1.0
        + (float(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5),
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1.0)
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / float(avgdl)))
    )
    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(dfreq), "token")
        .join(dl, "id")
        .withColumn("__contrib", contrib)
        .groupBy("query_id", "id")
        .agg(F.sum("__contrib").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", F.col("id").alias(id_col), "score", "rank")
    )


def _psi_bucket_expr(col: str, edges: list[float]):
    """CASE-chain bucket label for fixed numeric edges: '__null', then
    'b0' (< edges[0]) .. 'b<k>' (>= edges[-1]).  Fixed edges keep the
    bucketing engine-independent and reproducible run-to-run (quantile
    edges would drift with the data and differ across engines in the
    last ulp)."""
    c = F.col(col)
    expr = F.when(c.isNull(), "__null")
    for i, e in enumerate(edges):
        expr = expr.when(c < F.lit(e), f"b{i}")
    return expr.otherwise(f"b{len(edges)}")


def psi_drift_report(
    df_a: DataFrame,
    df_b: DataFrame,
    numeric_bins: dict[str, list[float]] = None,
    categorical_cols: list[str] = None,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between two corpus/table snapshots —
    the standard drift gate between a reference window (``df_a``) and a
    new batch (``df_b``) before it joins a training mix.  PSI(col) =
    Σ_buckets (p_a - p_b) · ln(p_a / p_b), proportions clamped to
    ``eps`` so empty buckets contribute finitely.  Rule of thumb:
    < 0.1 stable, 0.1-0.25 moderate shift, > 0.25 investigate.

    ``numeric_bins`` maps column -> sorted inner bin edges (fixed, not
    quantiles — see ``_psi_bucket_expr``); ``categorical_cols`` bucket
    by value (NULL -> '__null').  Returns one row per column:
    (column, psi, n_a, n_b).

    Shape: each side is ONE projection building an array of
    (column, bucket) structs, exploded and counted with map-side
    partials — all configured columns share a single shuffle per side,
    keyed on (column, bucket) whose cardinality is columns × buckets
    (tiny).  The union of the two count frames pivots by side and
    reduces to per-column PSI; nothing driver-side touches row counts.
    """
    numeric_bins = numeric_bins or {}
    categorical_cols = categorical_cols or []
    if not numeric_bins and not categorical_cols:
        raise ValueError("psi_drift_report: no columns configured")

    def melted(df: DataFrame, side: str) -> DataFrame:
        structs = [
            F.struct(
                F.lit(c).alias("column"),
                _psi_bucket_expr(c, edges).alias("bucket"),
            )
            for c, edges in numeric_bins.items()
        ] + [
            F.struct(
                F.lit(c).alias("column"),
                F.coalesce(F.col(c).cast("string"), F.lit("__null")).alias(
                    "bucket",
                ),
            )
            for c in categorical_cols
        ]
        return (
            df.select(F.explode(F.array(*structs)).alias("cb"))
            .select("cb.column", "cb.bucket")
            .groupBy("column", "bucket")
            .agg(F.count(F.lit(1)).alias(f"n_{side}"))
        )

    counts = melted(df_a, "a").join(
        melted(df_b, "b"), ["column", "bucket"], "full_outer",
    ).fillna(0, subset=["n_a", "n_b"])
    totals = counts.groupBy("column").agg(
        F.sum("n_a").alias("tot_a"), F.sum("n_b").alias("tot_b"),
    )
    pa = F.greatest(F.col("n_a") / F.col("tot_a"), F.lit(eps))
    pb = F.greatest(F.col("n_b") / F.col("tot_b"), F.lit(eps))
    term = (pa - pb) * F.log(pa / pb)
    return (
        counts.join(totals, "column")
        .withColumn("__term", term)
        .groupBy("column")
        .agg(
            F.sum("__term").alias("psi"),
            F.sum("n_a").alias("n_a"),
            F.sum("n_b").alias("n_b"),
        )
    )


def group_quantile_gate(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantile: float = 0.25,
    keep: str = "above",
    out_col: str = None,
) -> DataFrame:
    """Group-RELATIVE quantile filtering: each row is compared against
    ITS OWN group's exact ``quantile`` of ``value_col`` (e.g. drop
    documents below their source's p25 quality — an absolute threshold
    over-prunes clean sources and under-prunes noisy ones).

    One exact-percentile aggregation on the (low-cardinality) group key,
    broadcast-joined back, one filter — shuffle carries only the group
    aggregates, never the rows.  ``keep`` is "above" (>= threshold) or
    "below" (< threshold); rows with NULL value or an unseen/NULL group
    are dropped either way.  With ``out_col`` set, tags instead of
    filtering and keeps every row (NULLs tag False).
    """
    if not 0.0 <= quantile <= 1.0:
        raise ValueError(f"quantile must be in [0, 1], got {quantile}")
    if keep not in ("above", "below"):
        raise ValueError(f"keep must be 'above' or 'below', got {keep!r}")
    thresholds = df.groupBy(group_col).agg(
        F.percentile(F.col(value_col), F.lit(float(quantile))).alias("__thr"),
    )
    joined = df.join(F.broadcast(thresholds), on=group_col, how="left")
    cond = (
        F.col(value_col) >= F.col("__thr")
        if keep == "above"
        else F.col(value_col) < F.col("__thr")
    )
    if out_col is not None:
        return joined.withColumn(
            out_col, F.coalesce(cond, F.lit(False)),
        ).drop("__thr")
    return joined.filter(cond).drop("__thr")


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    small_threshold: int = 100_000,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance between the ``col``
    distributions of two corpora — the non-parametric complement to
    :func:`psi_drift_report`: no binning choices, sensitive to ANY
    distributional shift (location, scale, shape).

    Distributed shape: each side collapses to per-distinct-value counts
    (map-side combinable), the sides full-outer-join on the value, and
    BOTH empirical CDFs come from ONE shared range-partitioned prefix
    sum (``global_prefix_sums`` — no single-reducer cumulative window
    even when distinct values ~ rows).  The statistic itself is one
    max() agg.  Nulls are excluded (KS is defined over observed
    values).

    Returns one row: ``(ks_stat, at_value, n_a, n_b)`` where
    ``at_value`` is the location where the CDF gap peaks (smallest such
    value on ties).
    """
    from woodwork_spark.lifecycle import attach_persisted, persisted_frames
    from woodwork_spark.operators.rank import global_prefix_sums

    ca = (
        df_a.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
        .groupBy("v").agg(F.count(F.lit(1)).alias("__na"))
    )
    cb = (
        df_b.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
        .groupBy("v").agg(F.count(F.lit(1)).alias("__nb"))
    )
    m = (
        ca.join(cb, "v", "full_outer")
        .select(
            "v",
            F.coalesce("__na", F.lit(0)).alias("__na"),
            F.coalesce("__nb", F.lit(0)).alias("__nb"),
        )
    )
    cum = global_prefix_sums(
        m, [F.asc("v")], ["__na", "__nb"], ["__ca", "__cb"],
        inclusive=True, small_threshold=small_threshold,
    )
    # totals = the last inclusive cum values: ONE tiny agg (reuses the
    # persisted range-partitioned frame), broadcast back — no global
    # single-partition window over the distinct-value table
    tot = cum.agg(
        F.max("__ca").alias("__ta"), F.max("__cb").alias("__tb"),
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        "v", "__ca", "__cb",
        F.abs(
            F.col("__ca") / F.col("__ta") - F.col("__cb") / F.col("__tb"),
        ).alias("__gap"),
    )
    out = gap.agg(
        F.max("__gap").alias("ks_stat"),
        F.min_by(
            F.col("v"),
            F.struct((-F.col("__gap")).alias("g"), F.col("v").alias("v")),
        ).alias("at_value"),
        F.max("__ca").alias("n_a"),
        F.max("__cb").alias("n_b"),
    )
    return attach_persisted(out, *persisted_frames(cum))


def concentration_report(
    df: DataFrame,
    group_col: str,
    weight_col: str = None,
    small_threshold: int = 100_000,
) -> DataFrame:
    """Corpus concentration diagnostics over a grouping (source, domain,
    language): Herfindahl–Hirschman index, Gini coefficient, and
    top-1/top-5 share of the total weight — the governance numbers that
    say "is this corpus three crawl hosts in a trenchcoat".

    One groupBy collapses the corpus to per-group weights (bounded by
    group cardinality); ranking for Gini/top-k runs on the AGGREGATED
    table through the cardinality-aware distributed rank (no
    single-reducer window when groups number in the millions, e.g.
    web domains).  Returns one row:
    ``(n_groups, total_weight, hhi, gini, top_share, top5_share)``.

    Gini uses the standard rank formulation
    ``G = 2*sum(i*w_i)/(n*sum(w)) - (n+1)/n`` over weights sorted
    ascending (1-based rank i).
    """
    from woodwork_spark.lifecycle import attach_persisted, persisted_frames
    from woodwork_spark.operators.rank import global_row_number

    wexpr = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    ).cast("double")
    agg = df.groupBy(group_col).agg(wexpr.alias("__w"))
    ranked = global_row_number(
        agg, [F.asc("__w"), F.asc_nulls_last(group_col)], out_col="__i",
        small_threshold=small_threshold,
    )
    # totals via ONE tiny agg broadcast back (reuses the rank frame's
    # persisted shuffle) — a global window here would single-reduce a
    # table as big as the group cardinality
    tots = ranked.agg(
        F.sum("__w").alias("__tw"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    scored = ranked.crossJoin(F.broadcast(tots)).select(
        "__w",
        ((F.col("__i") + 1) * F.col("__w")).alias("__iw"),
        (F.col("__w") / F.col("__tw")).alias("__share"),
        "__n",
        (F.col("__i") >= F.col("__n") - 1).alias("__top1"),
        (F.col("__i") >= F.col("__n") - 5).alias("__top5"),
    )
    out = scored.agg(
        F.max("__n").cast("long").alias("n_groups"),
        F.sum("__w").alias("total_weight"),
        F.sum(F.col("__share") * F.col("__share")).alias("hhi"),
        (
            F.lit(2.0) * F.sum("__iw") / (F.max("__n") * F.sum("__w"))
            - (F.max("__n") + 1) / F.max("__n")
        ).alias("gini"),
        F.sum(F.when(F.col("__top1"), F.col("__share"))).alias("top_share"),
        F.sum(F.when(F.col("__top5"), F.col("__share"))).alias("top5_share"),
    )
    return attach_persisted(out, *persisted_frames(ranked))


def vocab_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    text_col: str,
) -> DataFrame:
    """Jensen–Shannon divergence between the unigram distributions of
    two corpora (plus both directed KL terms and vocabulary overlap) —
    the standard "how different is this source really" number for mix
    planning, dedup triage, and drift tracking on TEXT rather than on
    scalar features.

    One token-count agg per side (map-side combinable), one full-outer
    join on the token, totals broadcast from one tiny agg, then ONE
    divergence aggregation — all JVM expressions, token tables never
    leave the executors.  JS = 0.5*KL(p||m) + 0.5*KL(q||m), m=(p+q)/2;
    zero-probability terms contribute 0 by definition.  Natural-log
    units (nats); JS is bounded by ln 2.

    Returns one row: ``(js_div, kl_a, kl_b, vocab_a, vocab_b,
    vocab_shared)``.
    """
    def _counts(d, side):
        return (
            d.select(F.explode(tokens_expr(text_col)).alias("__t"))
            .where(F.col("__t") != "")
            .groupBy("__t")
            .agg(F.count(F.lit(1)).alias(f"__c{side}"))
        )

    m = (
        _counts(df_a, "a").join(_counts(df_b, "b"), "__t", "full_outer")
        .select(
            "__t",
            F.coalesce("__ca", F.lit(0)).alias("__ca"),
            F.coalesce("__cb", F.lit(0)).alias("__cb"),
        )
    )
    tots = m.agg(
        F.sum("__ca").alias("__ta"), F.sum("__cb").alias("__tb"),
    )
    probs = m.crossJoin(F.broadcast(tots)).select(
        "__ca", "__cb",
        (F.col("__ca") / F.col("__ta")).alias("__p"),
        (F.col("__cb") / F.col("__tb")).alias("__q"),
    )
    mid = (F.col("__p") + F.col("__q")) / 2
    kl_a_term = F.when(
        F.col("__p") > 0, F.col("__p") * F.log(F.col("__p") / mid),
    ).otherwise(F.lit(0.0))
    kl_b_term = F.when(
        F.col("__q") > 0, F.col("__q") * F.log(F.col("__q") / mid),
    ).otherwise(F.lit(0.0))
    return probs.agg(
        (F.sum(kl_a_term) / 2 + F.sum(kl_b_term) / 2).alias("js_div"),
        F.sum(kl_a_term).alias("kl_a"),
        F.sum(kl_b_term).alias("kl_b"),
        F.sum((F.col("__ca") > 0).cast("long")).alias("vocab_a"),
        F.sum((F.col("__cb") > 0).cast("long")).alias("vocab_b"),
        F.sum(
            ((F.col("__ca") > 0) & (F.col("__cb") > 0)).cast("long"),
        ).alias("vocab_shared"),
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    alpha: float,
    weight_col: str = None,
) -> DataFrame:
    """Temperature-scaled sampling plan per group (the multilingual-mix
    recipe: share_g ∝ natural_share_g^alpha).  ``alpha`` < 1 flattens
    the mix toward uniform (upweights tail languages), 1 keeps it
    natural, > 1 sharpens.  Because filtering can only DOWN-sample,
    target shares are scaled by the largest feasible global factor c
    (= min over groups of natural/target), so the keep fraction is
    exactly 1 for the binding group and < 1 elsewhere — the same
    largest-feasible-c discipline as ``rebalance_mix``.

    One corpus aggregation to per-group weights; the share/temperature
    algebra runs on the aggregated table (window over group rows —
    bounded by mix cardinality, which is small by construction for a
    sampling plan).  Returns ``(group, weight, natural_frac,
    target_frac, keep_frac)``.
    """
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    from pyspark.sql import Window as W

    wexpr = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    ).cast("double")
    agg = df.groupBy(group_col).agg(wexpr.alias("weight"))
    w_all = W.partitionBy()
    shared = agg.select(
        group_col, "weight",
        (F.col("weight") / F.sum("weight").over(w_all)).alias("natural_frac"),
    )
    pw = F.pow(F.col("natural_frac"), F.lit(float(alpha)))
    shared = shared.withColumn(
        "target_frac", pw / F.sum(pw).over(w_all),
    )
    c = F.min(F.col("natural_frac") / F.col("target_frac")).over(w_all)
    return shared.withColumn(
        "keep_frac", c * F.col("target_frac") / F.col("natural_frac"),
    )


def psi_timeseries(
    df: DataFrame,
    ts_col: str,
    col: str,
    edges: list,
    baseline_days: int = 7,
    bucket_seconds: int = 86_400,
    eps: float = 1e-6,
) -> DataFrame:
    """WHEN did the distribution shift: per-time-bucket PSI of ``col``
    against the baseline formed by the first ``baseline_days`` buckets
    — ``psi_drift_report`` answers "did these two snapshots differ";
    this walks the whole history and localizes the break.

    One (bucket, bin) count aggregation over the data (map-side
    partials — cardinality is days x bins), the baseline reduces from
    THOSE COUNTS (never rescans), joins back broadcast, and PSI per
    day is one more tiny agg.  Fixed ``edges`` keep the binning
    engine-independent (see ``_psi_bucket_expr``).  Buckets inside the
    baseline window report their PSI against it too (near 0 unless
    the baseline window itself is unstable).

    Returns ``(bucket_s, n_rows, psi)`` per observed time bucket.
    """
    from woodwork_spark.operators.timeseries import bucket_expr

    b = bucket_expr(ts_col, bucket_seconds)
    binned = df.select(
        b.alias("__b"), _psi_bucket_expr(col, list(edges)).alias("__bin"),
    )
    counts = (
        binned.groupBy("__b", "__bin")
        .agg(F.count(F.lit(1)).alias("__n"))
        .persist()
    )
    start = counts.agg(F.min("__b").alias("__b0"))
    cutoff = F.col("__b0") + (baseline_days * bucket_seconds)
    base = (
        counts.crossJoin(F.broadcast(start))
        .where(F.col("__b") < cutoff)
        .groupBy("__bin")
        .agg(F.sum("__n").alias("__bn"))
    )
    base_tot = base.agg(F.sum("__bn").alias("__bt"))
    day_tot = counts.groupBy("__b").agg(F.sum("__n").alias("__dt"))
    # densify the (day x bin) grid (bins are bounded: len(edges)+2 at
    # most) — a bucket ABSENT on some day must still contribute its
    # pa*ln(pa/eps) term; joining only observed (day, bin) pairs would
    # silently miss exactly the collapsed-bucket signal PSI exists for
    bins = counts.select("__bin").distinct()
    grid = day_tot.crossJoin(F.broadcast(bins))
    j = (
        grid.join(counts, ["__b", "__bin"], "left")
        .join(F.broadcast(base), "__bin", "left")
        .crossJoin(F.broadcast(base_tot))
    )
    pa = F.greatest(
        F.coalesce("__bn", F.lit(0)) / F.col("__bt"), F.lit(float(eps)),
    )
    pb = F.greatest(
        F.coalesce("__n", F.lit(0)) / F.col("__dt"), F.lit(float(eps)),
    )
    out = (
        j.groupBy(F.col("__b").alias("bucket_s"))
        .agg(
            F.sum(F.coalesce("__n", F.lit(0))).alias("n_rows"),
            F.sum((pa - pb) * F.log(pa / pb)).alias("psi"),
        )
    )
    from woodwork_spark.lifecycle import attach_persisted

    return attach_persisted(out, counts)


def group_trend(
    df: DataFrame,
    group_cols,
    ts_col: str,
    value_col: str,
    min_points: int = 3,
    t0_us: int = 0,
    t_unit_seconds: float = 86_400.0,
) -> DataFrame:
    """Per-group linear trend of ``value_col`` over time — slope (in
    value-units per ``t_unit_seconds``), intercept, R², point count —
    ONE grouped ``regr_*`` aggregation: the cheapest possible "which
    sources/users/segments are drifting and how fast" sweep (a window
    or per-group fit loop would cost a sort or a job per group; this
    is a single map-side-combinable agg).

    ``t0_us`` anchors the time axis (pass a fixed epoch-micros literal
    so runs are comparable); x = (epoch_us - t0) / unit.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    x = (
        (F.unix_micros(F.col(ts_col)) - F.lit(int(t0_us)))
        / F.lit(float(t_unit_seconds) * 1e6)
    )
    y = F.col(value_col).cast("double")
    agg = df.groupBy(*group_cols).agg(
        # regr_* uses rows where BOTH x and y are non-null; the gate
        # must count the same population or it passes underfit groups
        F.count(
            F.when(y.isNotNull() & F.col(ts_col).isNotNull(), 1),
        ).cast("long").alias("n_points"),
        F.expr(
            f"regr_slope({value_col}, "
            f"(unix_micros({ts_col}) - {int(t0_us)}) / {float(t_unit_seconds) * 1e6})",
        ).alias("slope"),
        F.expr(
            f"regr_intercept({value_col}, "
            f"(unix_micros({ts_col}) - {int(t0_us)}) / {float(t_unit_seconds) * 1e6})",
        ).alias("intercept"),
        F.expr(
            f"regr_r2({value_col}, "
            f"(unix_micros({ts_col}) - {int(t0_us)}) / {float(t_unit_seconds) * 1e6})",
        ).alias("r2"),
    )
    return agg.where(F.col("n_points") >= min_points)


def corpus_report(
    df: DataFrame,
    text_col: str,
    group_col: str = None,
) -> DataFrame:
    """One-row executive summary of a text corpus — the dataset-card
    numbers: document/token/char totals, exact-duplicate rate (via the
    canonical fingerprint), mean quality score, mean tokens per doc,
    and (when ``group_col`` is given) the source-mix Shannon entropy in
    bits plus the dominant group's share.

    TWO aggregations total: one over documents computing every
    per-doc expression (map-side combinable; the fingerprint distinct
    rides the same pass via count_distinct), one tiny agg over the
    group-mix table for entropy.  No joins over the corpus.
    """
    from woodwork_spark.operators.text import (
        fingerprint_expr,
        quality_score_exprs,
    )

    q = quality_score_exprs(text_col)
    base = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(q["n_tokens"]).cast("long").alias("total_tokens"),
        F.sum(q["n_chars"]).cast("long").alias("total_chars"),
        F.avg(q["n_tokens"]).alias("avg_tokens"),
        F.avg(q["quality_score"]).alias("avg_quality"),
        (
            1.0
            - F.count_distinct(fingerprint_expr(text_col))
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_rate"),
    )
    if not group_col:
        return base
    mix = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = mix.agg(F.sum("__n").alias("__t"))
    ent = (
        mix.crossJoin(F.broadcast(tot))
        .select(
            (F.col("__n") / F.col("__t")).alias("__p"),
        )
        .agg(
            (-F.sum(F.col("__p") * F.log2("__p"))).alias("mix_entropy_bits"),
            F.max("__p").alias("top_group_share"),
        )
    )
    return base.crossJoin(ent)


def lorenz_curve(
    df: DataFrame,
    group_col: str,
    weight_col: str = None,
    small_threshold: int = 100_000,
) -> DataFrame:
    """Lorenz curve of the corpus weight distribution over groups —
    the plotted curve behind :func:`concentration_report`'s Gini: with
    groups sorted by ascending weight, each point is (cumulative group
    fraction, cumulative weight fraction); the diagonal is perfect
    equality, the sag below it is concentration.

    One group aggregation, then BOTH cumulative series from a single
    ``global_prefix_sums`` range shuffle (inclusive row count + weight
    share one sort); totals broadcast from one tiny agg.  Returns one
    row per group, ascending: ``(group, weight, cum_group_frac,
    cum_weight_frac)``.
    """
    from woodwork_spark.lifecycle import attach_persisted, persisted_frames
    from woodwork_spark.operators.rank import global_prefix_sums

    wexpr = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    ).cast("double")
    agg = df.groupBy(group_col).agg(wexpr.alias("weight")).withColumn(
        "__one", F.lit(1),
    )
    cum = global_prefix_sums(
        agg,
        [F.asc("weight"), F.asc_nulls_last(group_col)],
        ["__one", "weight"],
        ["__cn", "__cw"],
        inclusive=True,
        small_threshold=small_threshold,
    )
    # totals assumption-free: count the rows and sum the RAW weights
    # (max of the cumulative sum is wrong if any weight is negative)
    tot = cum.agg(
        F.count(F.lit(1)).alias("__tn"), F.sum("weight").alias("__tw"),
    )
    out = cum.crossJoin(F.broadcast(tot)).select(
        group_col,
        "weight",
        (F.col("__cn") / F.col("__tn")).alias("cum_group_frac"),
        (F.col("__cw") / F.col("__tw")).alias("cum_weight_frac"),
    )
    return attach_persisted(out, *persisted_frames(cum))


RAKE_STOPWORDS = (
    "a", "an", "the", "and", "or", "of", "to", "in", "on", "for",
    "with", "as", "at", "by", "it", "is", "are", "was", "were", "be",
    "this", "that", "from", "but", "not", "so", "if", "then",
)


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords=RAKE_STOPWORDS,
    top_k: int = 5,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) per document: candidate
    phrases are maximal stopword-free token runs; each word scores
    degree/frequency over the document's phrases (degree = summed length
    of the phrases it appears in, i.e. the co-occurrence-matrix row sum
    including self); a phrase scores the sum of its word scores.

    Determinism across engines: the ranking key is INTEGER micro-units —
    ``score_micro = sum(floor(1e6 * degree / freq))`` — because a float
    sum of ratios is summation-order-dependent at 1 ulp, which is enough
    to flip a top-k rank between near-tied phrases on different engines.
    floor of an identical double division is bit-stable, and integer
    sums are order-free.  ``score`` is the micro value scaled back.

    Phrase splitting is pure column algebra: lowercase -> strip
    non-letters -> token array -> stopwords mapped to a '~' sentinel ->
    re-join -> split on '~' (no per-row Python).  Returns ``(id_col,
    phrase, n_words, n_occ, score, rank)``, rank in [1, top_k], ties by
    phrase ascending.

    Scale: two aggregates keyed (doc, word) / (doc, phrase) and one
    per-document window — every stage partitions by document, so
    parallelism scales with the corpus; nothing is global.
    """
    from pyspark.sql import Window

    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    norm = F.lower(F.regexp_replace(F.col(text_col), r"[^A-Za-z]+", " "))
    toks = F.split(F.trim(norm), r"\s+")
    marked = F.transform(
        toks,
        lambda t: F.when(F.array_contains(stop_arr, t), F.lit("~"))
        .otherwise(t),
    )
    phrases = F.split(F.array_join(marked, " "), "~")
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("id"), F.explode(phrases).alias("praw"))
        .select("id", F.trim("praw").alias("phrase"))
        .filter(F.col("phrase") != "")
    )
    pw = base.withColumn("wlen", F.size(F.split("phrase", " ")))
    # word stats WITH phrase-occurrence multiplicity
    words_all = pw.select(
        "id", "wlen", F.explode(F.split("phrase", " ")).alias("word"),
    )
    wstats = words_all.groupBy("id", "word").agg(
        F.count(F.lit(1)).alias("freq"),
        F.sum("wlen").alias("degree"),
    ).withColumn(
        "wscore_micro",
        F.floor(
            F.lit(1000000.0) * F.col("degree").cast("double")
            / F.col("freq").cast("double"),
        ).cast("long"),
    )
    # distinct phrases (keep occurrence count), scored once each
    phrase_occ = pw.groupBy("id", "phrase", "wlen").agg(
        F.count(F.lit(1)).alias("n_occ"),
    )
    pwords = phrase_occ.select(
        "id", "phrase", "wlen", "n_occ",
        F.explode(F.split("phrase", " ")).alias("word"),
    )
    scored = (
        pwords.join(wstats.select("id", "word", "wscore_micro"),
                    ["id", "word"])
        .groupBy("id", "phrase", "wlen", "n_occ")
        .agg(F.sum("wscore_micro").alias("score_micro"))
    )
    w = Window.partitionBy("id").orderBy(
        F.desc("score_micro"), F.asc("phrase"),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("id").alias(id_col),
            "phrase",
            F.col("wlen").cast("long").alias("n_words"),
            F.col("n_occ").cast("long").alias("n_occ"),
            (F.col("score_micro").cast("double") / 1e6).alias("score"),
            "rank",
        )
    )
