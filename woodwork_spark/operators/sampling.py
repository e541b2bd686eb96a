"""Deterministic sampling / splitting primitives for training pipelines.

At 100 TB you cannot randomly sample with state (a seeded RNG per row is
non-reproducible across retries/partitionings); the standard primitive is
a STABLE content hash of a key column compared against a threshold —
every engine, every rerun, every partitioning produces the same split,
and adding data never reshuffles old rows between splits.

The hash is the first 8 hex chars of md5(salt || key).  Lowercase hex
compares lexicographically in value order ('0'-'9' < 'a'-'f' in ASCII),
so `hex_prefix < hex_cutoff(fraction)` selects a uniform ~fraction of
keys with a plain string comparison — no bigint conversion needed, and
the exact same expression runs in any SQL engine (oracle-checkable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def hash_bucket_expr(key, salt: str = ""):
    """First 8 hex chars of md5(salt || key) — the stable sampling key."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def hex_cutoff(fraction: float) -> str:
    """8-char lowercase hex threshold selecting ~``fraction`` of uniform
    hashes via string comparison."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return "g" * 8  # sorts above every hex char: selects everything
    return format(int(fraction * 0x100000000), "08x")


def hash_split(
    df: DataFrame,
    key_col: str,
    fraction: float = 0.8,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Tag every row 'train' / 'held' by stable hash of ``key_col``.

    Reproducible across engines, reruns, and repartitioning; rows with
    the same key always land in the same split (group-safe: split on a
    document/user id, never on a row number).  One projection, no
    shuffle, no RNG state."""
    cut = hex_cutoff(fraction)
    return df.withColumn(
        split_col,
        F.when(hash_bucket_expr(F.col(key_col), salt) < cut, "train").otherwise(
            "held",
        ),
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    fractions: dict,
    stratum_col: str,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample common
    languages, keep all rare ones): ``fractions`` maps stratum value ->
    keep fraction; missing strata keep everything.  Same stable-hash
    mechanics as ``hash_split`` — one filter projection, no shuffle."""
    bucket = hash_bucket_expr(F.col(key_col), salt)
    expr = None
    for value, frac in fractions.items():
        cond = (F.col(stratum_col) == value) & (bucket >= hex_cutoff(frac))
        expr = cond if expr is None else (expr | cond)
    if expr is None:
        return df
    return df.filter(~expr)


def hash_uniform_expr(key, salt: str = ""):
    """Deterministic uniform double in [0, 1) from the stable hash: the
    8-hex-char prefix as an integer over 2^32.  Both steps are exact in
    double arithmetic, so any engine computing the same md5 reproduces
    the value bit-for-bit (DuckDB:
    ``('0x' || substr(md5(salt || key), 1, 8))::BIGINT / 4294967296.0``).
    """
    return (
        F.conv(hash_bucket_expr(key, salt), 16, 10).cast("long")
        / F.lit(4294967296.0)
    )


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight,
    salt: str = "wsample",
    keep_col: str = None,
) -> DataFrame:
    """Importance sampling with per-row keep probability ``weight`` (a
    Column, e.g. a quality score): keep a row iff its deterministic
    uniform draw is below ``weight`` clamped to [0, 1].

    This is the scale-correct form of weighted corpus downsampling
    (upweight high-quality documents by KEEPING them with higher
    probability): stateless, reproducible across reruns/retries/
    partitionings, one filter projection — no shuffle, no RNG state, and
    adding data never changes the decision for existing keys.  NULL
    weights drop the row (no silent keep-all), and so do NULL keys
    (no hash, no draw — key your sampling on a non-null id).

    With ``keep_col`` set, tags rows instead of filtering (for audit
    counts of kept vs dropped).
    """
    u = hash_uniform_expr(F.col(key_col), salt)
    w = weight.cast("double")
    # least/greatest SKIP nulls in Spark, so a NULL weight would clamp to
    # 1.0 and silently keep the row; route NULL to p = -1 (never kept)
    p = F.when(
        w.isNull(), F.lit(-1.0),
    ).otherwise(F.greatest(F.lit(0.0), F.least(F.lit(1.0), w)))
    keep = u < p
    if keep_col is not None:
        return df.withColumn(keep_col, F.coalesce(keep, F.lit(False)))
    return df.filter(keep)


def shuffle_shards(
    df: DataFrame,
    key_col: str,
    num_shards: int,
    salt: str = "shard",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training-data
    export: every row gets a shard id and a stable position within its
    shard, both pure functions of ``md5(salt || key)`` — the
    training-order equivalent of a seeded shuffle, reproducible across
    engines and reruns, with no RNG state and no single global sort.

    Shards are hash-balanced (uniform to ~sqrt(n/num_shards)); position
    within a shard orders by the hash (then key as tie-break), so
    concatenating shard files in position order IS the shuffled corpus.
    One shuffle on ``shard`` (num_shards reducers — size num_shards to
    the cluster's parallelism, e.g. thousands at 100 TB, and pair with
    ``scale.write_partitioned(out, path, [shard_col])`` for the export).
    """
    if num_shards < 1:
        raise ValueError(f"num_shards must be >= 1, got {num_shards}")
    from pyspark.sql import Window as W

    h = hash_bucket_expr(F.col(key_col), salt)
    shard = F.pmod(
        F.conv(h, 16, 10).cast("long"), F.lit(num_shards),
    ).cast("long")
    tagged = df.withColumn(shard_col, shard).withColumn("__h", h)
    w = W.partitionBy(shard_col).orderBy(F.col("__h"), F.col(key_col))
    return (
        tagged.withColumn(
            pos_col, F.row_number().over(w).cast("long") - 1,
        )
        .drop("__h")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    text_col: str,
    fraction: float = 0.8,
    threshold: float = 0.8,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = None,
    use_words: bool = True,
    salt: str = "split",
    split_col: str = "split",
    group_col: str = None,
) -> DataFrame:
    """Train/held split where NEAR-DUPLICATE documents always land in
    the same split — the standard defense against test-set leakage: a
    plain per-document :func:`hash_split` puts two 0.9-Jaccard copies
    of the same page on opposite sides of the split, and the held-out
    loss silently measures memorization.

    Mechanics: verified near-dup pairs (:func:`~woodwork_spark.
    operators.dedup.minhash_dedup_pairs`, exact-Jaccard precision) ->
    connected components -> every doc's split key is its component
    label (its own id when it has no near-dup), hashed with the same
    stable md5 bucketing as ``hash_split``.  Adding new data never
    moves an existing singleton between splits; merging two clusters
    re-keys only that cluster (unavoidable: the split must follow the
    duplicate structure).

    Scale shape: the pair + component work is the dedup pipeline the
    corpus already runs (banded LSH, no all-pairs); the split itself is
    one broadcast-size-agnostic left join of the (tiny) component map
    plus a projection.  Pass ``group_col`` to also keep the component
    label for auditing (count cross-split pairs == 0).
    """
    from woodwork_spark.operators.dedup import (
        connected_components,
        minhash_dedup_pairs,
    )
    from woodwork_spark.lifecycle import release

    pairs = minhash_dedup_pairs(
        df, id_col, text_col, threshold=threshold, shingle_k=shingle_k,
        num_perm=num_perm, bands=bands, use_words=use_words,
    )
    comp = connected_components(pairs.select("id_a", "id_b"))
    # connected_components fully materializes the edge list before
    # returning (driver union-find or eager localCheckpoint), so the
    # corpus-scale shingle cache behind `pairs` is already dead — free
    # it now instead of pinning it on the returned split
    release(pairs)
    keyed = df.join(
        comp.select(
            F.col("id").alias("__cc_id"), F.col("component").alias("__cc"),
        ),
        F.col(id_col) == F.col("__cc_id"),
        "left",
    ).drop("__cc_id")
    key = F.coalesce(F.col("__cc"), F.col(id_col))
    cut = hex_cutoff(fraction)
    out = keyed.withColumn(
        split_col,
        F.when(hash_bucket_expr(key, salt) < cut, "train").otherwise("held"),
    )
    if group_col:
        # singletons audit under their own id, mirroring the split key
        out = out.withColumn(group_col, key).drop("__cc")
    else:
        out = out.drop("__cc")
    return out


def sample_k_per_group(
    df: DataFrame,
    group_cols,
    k: int,
    key_col: str,
    salt: str = "sample",
    keep_rank: str = None,
) -> DataFrame:
    """EXACTLY min(k, group size) rows per group, chosen by stable hash
    — the deterministic replacement for per-group reservoir sampling
    (an RNG reservoir gives different rows on every retry/partition
    layout; this gives the same rows on any engine, forever).  The rows
    kept are those with the k smallest ``md5(salt || key)`` values, so
    membership is uniform over keys and ADDING rows only ever evicts
    the highest hash — a stable priority sample.

    Scale shape: one window ``row_number`` ordered by (hash, key).
    Spark compiles the ``rn <= k`` filter to WindowGroupLimit: each map
    task keeps only its local top-k per group BEFORE the shuffle, so
    the exchange carries ~k rows per (group, task), not the corpus —
    the skewed-group killer that makes naive windows fall over does
    not apply.  Set ``keep_rank`` to also output the 1-based rank.
    """
    from pyspark.sql import Window as W

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    h = hash_bucket_expr(F.col(key_col), salt)
    w = W.partitionBy(*group_cols).orderBy(h.asc(), F.col(key_col).asc())
    rank_col = keep_rank or "__rn"
    out = (
        # NULL keys hash to NULL and would sort into every group's top-k
        df.where(F.col(key_col).isNotNull())
        .withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
    return out if keep_rank else out.drop(rank_col)


def kfold_assign(
    df: DataFrame,
    key_col: str,
    k: int,
    salt: str = "fold",
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment: ``fold = md5(salt || key) mod
    k`` — the cross-validation companion to :func:`hash_split`, with
    the same guarantees (group-safe on the key, reproducible on any
    engine/rerun/partitioning, folds stay stable as data grows).  One
    projection, no shuffle, no RNG state.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = hash_bucket_expr(F.col(key_col), salt)
    return df.withColumn(
        fold_col,
        F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(int(k))).cast("long"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
) -> DataFrame:
    """Neyman-optimal allocation of a ``total_n``-row sample across
    strata: n_h ∝ N_h · S_h (stratum size × stratum sample stddev) —
    minimum-variance stratified estimation of the mean of
    ``value_col``, the survey-sampling answer to "my strata differ
    wildly in spread; proportional allocation wastes budget on the
    quiet ones".

    One grouped aggregate (N_h, exact stddev), then largest-remainder
    rounding computed with windows over the STRATA frame (tiny by
    construction): floor everything, hand the leftover units to the
    largest fractional parts (stratum name breaks ties).  Allocations
    are capped at N_h and the shortfall is NOT redistributed (it is
    reported — redistribution loops are not worth the determinism
    cost; documented).  Single-value strata get S_h = 0 and draw no
    allocation beyond rounding.

    Returns ``(stratum, n_rows, stddev, weight, alloc)``.
    """
    if total_n < 1:
        raise ValueError(f"total_n must be >= 1, got {total_n}")
    stats = (
        df.where(F.col(stratum_col).isNotNull())
        .groupBy(F.col(stratum_col).alias("stratum"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.coalesce(
                F.stddev(F.col(value_col)), F.lit(0.0),
            ).alias("stddev"),
        )
    )
    w_tot = W.partitionBy(F.lit(1))
    weighted = stats.withColumn(
        "weight", F.col("n_rows") * F.col("stddev"),
    ).withColumn(
        "__share",
        F.when(
            F.sum("weight").over(w_tot) > 0,
            F.col("weight") / F.sum("weight").over(w_tot),
        ).otherwise(
            F.col("n_rows") / F.sum("n_rows").over(w_tot),
        ),
    )
    raw = F.col("__share") * F.lit(float(total_n))
    floored = weighted.withColumn(
        "__fl", F.least(F.floor(raw).cast("long"), F.col("n_rows")),
    ).withColumn("__frac", raw - F.floor(raw))
    rem = floored.withColumn(
        "__left",
        F.lit(total_n) - F.sum("__fl").over(w_tot),
    ).withColumn(
        "__pos",
        F.row_number().over(
            w_tot.orderBy(F.col("__frac").desc(), F.col("stratum").asc()),
        ),
    )
    alloc = F.least(
        F.col("__fl")
        + F.when(F.col("__pos") <= F.col("__left"), 1).otherwise(0),
        F.col("n_rows"),
    )
    return rem.select(
        "stratum",
        F.col("n_rows").cast("long").alias("n_rows"),
        "stddev", "weight",
        alloc.cast("long").alias("alloc"),
    )


def neyman_sample(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    total_n: int,
    key_col: str,
    salt: str = "neyman",
) -> DataFrame:
    """Draw the :func:`neyman_allocation` sample deterministically:
    within each stratum, the rows with the ``alloc_h`` smallest
    ``md5(salt || key)`` hashes (the :func:`sample_k_per_group`
    priority order, with the per-stratum k joined in by broadcast).
    Same stable-hash membership guarantees; same WindowGroupLimit-
    friendly shape.  Returns the sampled rows with their stratum's
    ``alloc``.
    """
    plan = neyman_allocation(df, stratum_col, value_col, total_n)
    h = hash_bucket_expr(F.col(key_col), salt)
    w = W.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    # a NULL key hashes to NULL, which Spark orders FIRST ascending —
    # NULL-key rows would deterministically crowd every stratum's draw
    ranked = df.where(F.col(key_col).isNotNull()).withColumn(
        "__rn", F.row_number().over(w),
    )
    return (
        ranked.join(
            F.broadcast(plan.select(
                F.col("stratum").alias(stratum_col), "alloc",
            )),
            stratum_col,
        )
        .where(F.col("__rn") <= F.col("alloc"))
        .drop("__rn")
    )


def negative_sample(
    positives: DataFrame,
    universe: DataFrame,
    query_col: str,
    item_col: str,
    k: int = 4,
    oversample: int = None,
    salt: str = "",
) -> DataFrame:
    """Deterministic negative sampling for contrastive / retrieval
    training: for every query in ``positives`` (pairs the model should
    score high), draw ``k`` pseudo-random negatives from the item
    ``universe``, excluding that query's own positives.  Deterministic
    — same inputs + salt reproduce the same negatives on ANY engine
    (the draw is md5 arithmetic, no RNG state), so shards can be
    regenerated independently and an oracle can replay the draw.

    Construction (all relational, no collect):

    1. items get a dense 0-based index ordered by ``item_col`` (the
       range-partitioned ``global_row_number`` — no single reducer);
    2. each (query, draw j) for j in [0, oversample) — ``oversample``
       is the TOTAL draw count, defaulting to ``k + 8`` — picks index
       ``int(md5(salt || query || '#' || j)[:8], 16) % n_items``;
    3. collisions (same item drawn twice for one query) keep the
       earliest j; the query's positives are anti-joined out;
    4. survivors are re-ranked by j per query (partitioned window) and
       the first ``k`` kept.

    The ``oversample - k`` slack absorbs collision + positive-hit
    losses; queries with pathologically many
    positives relative to the universe may return fewer than ``k``
    negatives (documented over a resample loop, which would break
    single-pass determinism).  Returns ``(query_col, item_col,
    draw_order)`` with ``draw_order`` 0-based in draw sequence.
    """
    from .rank import global_row_number

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    m = int(oversample) if oversample is not None else k + 8
    if m < k:
        raise ValueError(f"oversample must be >= k, got {m} < {k}")
    items = universe.select(F.col(item_col).alias("__item")).where(
        F.col("__item").isNotNull(),
    ).distinct()
    indexed = global_row_number(items, [F.asc("__item")], out_col="__idx")
    # cheap exact count for the modulus: the indexed frame is persisted
    # by the rank primitive (or tiny), so this does not rescan the scan
    n_items = indexed.count()
    if n_items == 0:
        raise ValueError("negative_sample: item universe is empty")
    pos = positives.select(
        F.col(query_col).alias("__q"), F.col(item_col).alias("__pos"),
    ).where(F.col("__q").isNotNull())
    draws = (
        pos.select("__q").distinct()
        .select("__q", F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("__j"))
        .withColumn(
            "__idx",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(salt),
                                F.col("__q").cast("string"),
                                F.lit("#"),
                                F.col("__j").cast("string"),
                            ),
                        ),
                        1, 8,
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(n_items),
            ),
        )
    )
    cand = (
        draws.join(indexed, "__idx")
        # earliest draw wins a per-query duplicate item
        .groupBy("__q", "__item")
        .agg(F.min("__j").alias("__j"))
        .join(
            pos.withColumnRenamed("__pos", "__item").distinct(),
            ["__q", "__item"],
            "left_anti",
        )
    )
    w = W.partitionBy("__q").orderBy("__j")
    out = (
        cand.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= k)
        .select(
            F.col("__q").alias(query_col),
            F.col("__item").alias(item_col),
            (F.col("__r") - 1).cast("int").alias("draw_order"),
        )
    )
    from ..lifecycle import attach_persisted, persisted_frames

    return attach_persisted(out, *persisted_frames(indexed))


def dsir_log_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 10_000,
    ngrams=(1, 2),
    smoothing: float = 1.0,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023): score every RAW document by how much more likely its hashed
    n-gram bag is under the TARGET distribution than under the raw
    distribution, ``log w(doc) = sum_grams (ln p_target[b(g)] - ln
    p_raw[b(g)])`` — the standard cheap proxy for "select pretraining
    data that looks like the high-quality target corpus".  Buckets are
    the portable 60-bit md5 hash mod ``k`` (the simhash convention, so
    a SQL oracle replays placement verbatim); both bag-of-grams models
    are Laplace-smoothed (``(count + a) / (total + a k)``).

    Scale shape: two explode + bucket-count aggregations build the
    k-row models (map-side combinable; k is thousands — model-sized);
    the scoring pass explodes raw grams ONCE and broadcast-joins the
    k-row log-ratio table, then one regroup folds the per-document
    sum — no token strings shuffle (grams travel as hashed longs), no
    driver collect.  Returns ``(id, n_grams, log_weight)``; documents
    with no grams score 0.

    Pair with :func:`dsir_sample` for the Gumbel-top-n resampling
    step.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    orders = sorted(set(int(n) for n in ngrams))
    if not orders or orders[0] < 1:
        raise ValueError(f"ngrams must be positive ints, got {ngrams}")

    def gram_buckets(col_name):
        toks = (
            f"filter(split(trim(lower({col_name})), '\\\\s+'), "
            "t -> t != '')"
        )
        parts = []
        for n in orders:
            gram = f"concat_ws(' ', slice(ts, i, {n}))"
            ghash = (
                f"cast(conv(substring(md5({gram}), 1, 15), 16, 10) "
                "as bigint)"
            )
            parts.append(
                f"IF(size(ts) >= {n}, "
                f"transform(sequence(1, size(ts) - {n} + 1), "
                f"i -> pmod({ghash}, {int(k)})), "
                "cast(array() as array<bigint>))",
            )
        body = f"concat({', '.join(parts)})" if len(parts) > 1 else parts[0]
        return F.expr(f"transform(array({toks}), ts -> {body})[0]")

    def bucket_counts(df):
        return (
            df.select(F.explode(gram_buckets(text_col)).alias("__b"))
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("__c"))
        )

    a = float(smoothing)
    raw_counts = bucket_counts(raw_df)
    tgt_counts = bucket_counts(target_df)
    # full outer on the k-row model frames: buckets unseen in one
    # corpus still get their smoothed mass
    models = raw_counts.withColumnRenamed("__c", "__cr").join(
        tgt_counts.withColumnRenamed("__c", "__ct"), "__b", "full",
    ).select(
        "__b",
        F.coalesce(F.col("__cr"), F.lit(0)).alias("__cr"),
        F.coalesce(F.col("__ct"), F.lit(0)).alias("__ct"),
    )
    totals = models.agg(
        F.sum("__cr").alias("__tr"), F.sum("__ct").alias("__tt"),
    )
    ratio = models.crossJoin(F.broadcast(totals)).select(
        "__b",
        (
            F.log(
                (F.col("__ct") + F.lit(a))
                / (F.col("__tt") + F.lit(a * k)),
            )
            - F.log(
                (F.col("__cr") + F.lit(a))
                / (F.col("__tr") + F.lit(a * k)),
            )
        ).alias("__lr"),
    )
    doc_grams = raw_df.select(
        F.col(id_col).alias("id"),
        F.explode_outer(gram_buckets(text_col)).alias("__b"),
    )
    scored = doc_grams.join(F.broadcast(ratio), "__b", "left")
    return scored.groupBy("id").agg(
        F.count("__b").cast("long").alias("n_grams"),
        F.coalesce(F.sum("__lr"), F.lit(0.0)).alias("log_weight"),
    )


def dsir_sample(
    weights: DataFrame,
    n: int,
    salt: str = "dsir",
    temperature: float = 1.0,
) -> DataFrame:
    """The resampling half of DSIR: draw ``n`` documents WITHOUT
    replacement with probability proportional to ``exp(log_weight /
    temperature)`` via the Gumbel-top-n trick — ``key = log_weight/T +
    Gumbel(0,1)``, take the n largest keys.  The Gumbel noise comes
    from the module's deterministic content hash (``-ln(-ln(u))``,
    u = hash-uniform of the id), so the sample is REPRODUCIBLE across
    reruns and partitionings and replayable by a SQL oracle — no RNG
    state anywhere.  One projection + ``orderBy().limit(n)``
    (per-partition top-n heaps, no global sort materialization).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    u = hash_uniform_expr(F.col("id"), salt=salt)
    # clamp away exact 0/1 so the double log stays finite
    u = F.least(F.greatest(u, F.lit(1e-12)), F.lit(1.0 - 1e-12))
    gumbel = -F.log(-F.log(u))
    key = F.col("log_weight") / F.lit(float(temperature)) + gumbel
    return (
        weights.withColumn("__key", key)
        .orderBy(F.desc("__key"), F.asc("id"))
        .limit(int(n))
        .drop("__key")
    )
