"""Declarative data-quality constraint checking, single-pass.

The pattern every production pipeline needs before a table is published:
a suite of declarative constraints (completeness, uniqueness, ranges,
patterns, set membership, row-level predicates) evaluated in ONE
aggregation over the data, returning a per-check report of pass/fail
plus the measured metric.  One scan, partial aggregation does the work
map-side, no check-by-check jobs — the cost of the suite is the cost of
one pass regardless of how many checks it holds.

Check vocabulary (each produces a metric in [0, 1] or a count, compared
against a threshold):

- ``not_null(col)`` — fraction of non-null rows == 1 (or >= threshold)
- ``unique(col)`` — no value occurs twice (count_distinct == count)
- ``in_range(col, lo, hi)`` — all non-null values within [lo, hi]
- ``matches(col, regex)`` — all non-null values match
- ``isin(col, values)`` — all non-null values in the allowed set
- ``satisfies(name, predicate_col)`` — arbitrary row predicate holds
- ``min_rows(n)`` — table has at least n rows

``unique`` uses ``count_distinct``; on an extremely wide suite with many
uniqueness checks prefer ``approx=True`` (HLL ``approx_count_distinct``,
mergeable and fixed-size at any scale, ~2% error) — exactness vs memory
is the caller's call, the default is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df


class Check:
    """One declarative constraint: a label, the aggregate expressions it
    needs, and a verdict computed from the aggregated row."""

    def __init__(self, name, exprs, verdict, metric):
        self.name = name
        self.exprs = exprs          # dict alias -> aggregate Column
        self.verdict = verdict      # row-dict -> bool
        self.metric = metric        # row-dict -> float


def _alias(kind: str, *params) -> str:
    """Aggregate alias derived from the check's FULL parameter tuple
    (crc32 — python string hashing is process-salted).  run_checks merges
    duplicate aliases into one expression, so two different checks must
    never share an alias: in_range(c,0,10) and in_range(c,-5,5) each get
    their own violation count, while two literally identical checks
    still collapse to one aggregate."""
    import zlib

    key = "|".join(str(x) for x in params)
    return f"__{kind}_{zlib.crc32(key.encode())}"


def not_null(col: str, min_fraction: float = 1.0) -> Check:
    a = _alias("nn", col)
    t = _alias("tot", col)
    return Check(
        f"not_null({col})",
        {a: F.count(F.col(col)), t: F.count(F.lit(1))},
        lambda r: (r[a] / r[t] if r[t] else 1.0) >= min_fraction,
        lambda r: (r[a] / r[t]) if r[t] else 1.0,
    )


def unique(col: str, approx: bool = False) -> Check:
    d = _alias("du", col, approx)
    n = _alias("nu", col)
    cd = (
        F.approx_count_distinct(col) if approx else F.count_distinct(F.col(col))
    )
    return Check(
        f"unique({col})",
        {d: cd, n: F.count(F.col(col))},
        # approx sketches can under/over-shoot slightly; allow 2% slack
        lambda r: r[d] >= r[n] * (0.98 if approx else 1),
        lambda r: (r[d] / r[n]) if r[n] else 1.0,
    )


def in_range(col: str, lo, hi) -> Check:
    a = _alias("ir", col, lo, hi)
    return Check(
        f"in_range({col},{lo},{hi})",
        {a: F.sum(
            F.when(
                F.col(col).isNotNull()
                & ((F.col(col) < lo) | (F.col(col) > hi)),
                1,
            ).otherwise(0),
        )},
        lambda r: (r[a] or 0) == 0,
        lambda r: float(r[a] or 0),
    )


def matches(col: str, regex: str) -> Check:
    a = _alias("rx", col, regex)
    return Check(
        f"matches({col},{regex})",
        {a: F.sum(
            F.when(
                F.col(col).isNotNull()
                & ~F.col(col).cast("string").rlike(regex),
                1,
            ).otherwise(0),
        )},
        lambda r: (r[a] or 0) == 0,
        lambda r: float(r[a] or 0),
    )


def isin(col: str, values) -> Check:
    values = list(values)
    a = _alias("in", col, *sorted(str(v) for v in values))
    return Check(
        f"isin({col},{{{','.join(str(v) for v in values)}}})",
        {a: F.sum(
            F.when(
                F.col(col).isNotNull() & ~F.col(col).isin(list(values)),
                1,
            ).otherwise(0),
        )},
        lambda r: (r[a] or 0) == 0,
        lambda r: float(r[a] or 0),
    )


def satisfies(name: str, predicate) -> Check:
    # a NULL predicate result is a violation (the row did NOT satisfy),
    # so count rows where the predicate is anything but TRUE.
    # ``name`` is the check's identity: two satisfies() with the same
    # name are merged as one — give distinct predicates distinct names
    a = _alias("p", name)
    return Check(
        f"satisfies({name})",
        {a: F.sum(F.when(predicate, 0).otherwise(1))},
        lambda r: (r[a] or 0) == 0,
        lambda r: float(r[a] or 0),
    )


def min_rows(n: int) -> Check:
    a = "__rowcount"
    return Check(
        f"min_rows({n})",
        {a: F.count(F.lit(1))},
        lambda r: r[a] >= n,
        lambda r: float(r[a]),
    )


def run_checks(df: DataFrame, checks) -> DataFrame:
    """Evaluate every check in ONE aggregation pass; returns a small
    report DataFrame ``(check, passed, metric)`` (one row per check,
    ordered as given).

    All aggregate expressions across all checks are merged into a single
    ``agg`` (duplicate aliases collapse, so ten checks on one column
    still count it once); the scan parallelizes and partially aggregates
    map-side like any other Spark agg — suite size does not add passes.
    """
    checks = list(checks)
    if not checks:
        raise ValueError("no checks given")
    merged = {}
    for c in checks:
        for alias, expr in c.exprs.items():
            merged.setdefault(alias, expr)
    row = df.agg(
        *[e.alias(a) for a, e in merged.items()],
    ).collect()[0].asDict()
    spark = df.sparkSession
    out_rows = [
        (c.name, bool(c.verdict(row)), float(c.metric(row)))
        for c in checks
    ]
    return local_rows_df(spark, 
        out_rows, "check string, passed boolean, metric double",
    )


def benford_report(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law audit of a positive numeric column: observed vs
    expected first-significant-digit frequencies plus each digit's
    chi-square contribution — the classic fabricated-data / broken-ETL
    smell test for financial-style measures (organically-grown
    magnitudes follow ``P(d) = log10(1 + 1/d)``; uniform or templated
    generators do not).

    One projection computes the first digit in codegen
    (``floor(|x| / 10^floor(log10|x|))``), one 9-row aggregation
    finishes; the total joins back as a 1-row broadcast.  Zero/null
    values are excluded (no first significant digit); digits absent
    from the data still emit a row with n=0.  Returns 9 rows:
    ``(digit, n, observed_p, expected_p, chi2_term)``.
    """
    x = F.abs(F.col(col))
    digit = F.floor(x / F.pow(F.lit(10.0), F.floor(F.log10(x)))).cast("long")
    digits = df.where(x > 0).select(digit.alias("digit"))
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    # densify to all 9 digits: an ABSENT digit is the strongest Benford
    # violation (its n=0 chi-square term t*expected is the largest
    # possible) and must not silently drop out of the sum
    all_digits = df.sparkSession.range(1, 10).select(
        F.col("id").alias("digit"),
    )
    counts = all_digits.join(counts, "digit", "left").select(
        "digit", F.coalesce("n", F.lit(0)).alias("n"),
    )
    tot = counts.agg(F.sum("n").alias("__t"))
    expected = F.log10(F.lit(1.0) + 1.0 / F.col("digit"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            (F.col("n") / F.col("__t")).alias("observed_p"),
            expected.alias("expected_p"),
            (
                F.pow(F.col("n") - F.col("__t") * expected, 2)
                / (F.col("__t") * expected)
            ).alias("chi2_term"),
        )
    )


def missingness_report(df: DataFrame, cols) -> DataFrame:
    """Missing-data PATTERN analysis: for every column pair, the joint
    null counts and the phi coefficient between their null indicators —
    the diagnostic that separates "random gaps" from "these fields go
    missing TOGETHER" (one broken upstream join, one optional payload
    section).  |phi| near 1 means one ETL defect, not two.

    ONE aggregation computes all pairwise indicator products (p*(p+1)/2
    expressions over p columns, map-side combinable) — no joins, no
    second pass.  Returns one row per (col_a < col_b) pair:
    ``(col_a, col_b, n, null_a, null_b, null_both, phi)``.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("missingness_report needs >= 2 columns")
    ind = {c: F.col(c).isNull().cast("long") for c in cols}
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(ind[c]).alias(f"__m_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            aggs.append(F.sum(ind[a] * ind[b]).alias(f"__mm_{a}_{b}"))
    row = df.agg(*aggs)
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            pairs.append(
                F.struct(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.col("__n").alias("n"),
                    F.col(f"__m_{a}").alias("null_a"),
                    F.col(f"__m_{b}").alias("null_b"),
                    F.col(f"__mm_{a}_{b}").alias("null_both"),
                ),
            )
    melted = row.select(F.explode(F.array(*pairs)).alias("__p")).select("__p.*")
    n = F.col("n").cast("double")
    pa, pb, pab = (
        F.col("null_a") / n, F.col("null_b") / n, F.col("null_both") / n,
    )
    denom = F.sqrt(
        pa * (1 - pa) * pb * (1 - pb),
    )
    return melted.withColumn(
        "phi",
        F.when(denom > 0, (pab - pa * pb) / denom),
    )


def k_anonymity_report(
    df: DataFrame,
    qi_cols,
    k: int = 10,
    sensitive_col: str = None,
) -> DataFrame:
    """Privacy-readiness audit before a dataset leaves the boundary:
    group rows by the quasi-identifier combination and report how
    re-identifiable they are.  A dataset is k-anonymous when every QI
    group holds >= k rows; with ``sensitive_col``, also reports
    l-diversity (min distinct sensitive values per group — k-anonymity
    alone fails when a group's sensitive value is uniform).

    Shape: one grouped aggregate over the QI key (map-side
    combinable), one tiny fold; NULL QI values form their own group
    (they are identifying too).  Returns one row: ``(n_rows,
    n_groups, min_group_size, frac_rows_below_k, n_groups_below_k,
    is_k_anonymous, l_diversity)``; ``l_diversity`` NULL without a
    sensitive column.
    """
    qi_cols = [qi_cols] if isinstance(qi_cols, str) else list(qi_cols)
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    aggs = [F.count(F.lit(1)).alias("__sz")]
    if sensitive_col:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("__ldiv"),
        )
    groups = df.groupBy(*qi_cols).agg(*aggs)
    folded = [
        F.sum("__sz").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__sz").cast("long").alias("min_group_size"),
        (
            F.sum(F.when(F.col("__sz") < k, F.col("__sz")).otherwise(0))
            / F.sum("__sz")
        ).alias("frac_rows_below_k"),
        F.sum(
            F.when(F.col("__sz") < k, 1).otherwise(0),
        ).cast("long").alias("n_groups_below_k"),
        (F.min("__sz") >= k).alias("is_k_anonymous"),
    ]
    folded.append(
        F.min("__ldiv").cast("long").alias("l_diversity")
        if sensitive_col
        else F.lit(None).cast("long").alias("l_diversity"),
    )
    return groups.agg(*folded)


def t_closeness_report(
    df: DataFrame,
    qi_cols,
    sensitive_col: str,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (the step past k-anonymity/l-diversity): for
    every quasi-identifier group, the Earth Mover's Distance between
    the group's sensitive-attribute distribution and the GLOBAL one —
    l-diversity still leaks when a group's values are diverse but
    skewed (e.g. 90% "cancer").  A table is t-close when every group's
    EMD <= t.

    EMD uses the ordered-distance form from the original paper (Li,
    Venkatasubramanian & Machanavajjhala, ICDE 2007): with the m
    global distinct values sorted, ``EMD = (1/(m-1)) * sum_i
    |cumsum_{j<=i}(p_group(v_j) - p_global(v_j))|`` — exact for
    numeric/ordinal attributes, and the variational distance (m=2+
    unordered attrs still get a meaningful upper-bound style score).

    Scale shape: one grouped agg for the global value distribution
    (cardinality = m, assumed SMALL — it's a sensitive attribute, not
    a free-text column), one for per-(group, value) counts, one for
    group sizes; the m-row global table broadcast-crossJoins the group
    list to build the dense grid, so the only windows are per-group
    cumulative sums (partitioned — never a single reducer).  Rows with
    a NULL sensitive value are excluded (no distribution mass); NULL
    QI values form their own group.

    Returns one row per QI group: ``(qi..., n, emd, t_close)``,
    ``emd = 0.0`` when the attribute has a single global value.
    """
    from pyspark.sql import Window as W

    qi_cols = [qi_cols] if isinstance(qi_cols, str) else list(qi_cols)
    base = df.filter(F.col(sensitive_col).isNotNull()).select(
        *qi_cols, F.col(sensitive_col).alias("__v"),
    )
    gv = base.groupBy("__v").agg(F.count(F.lit(1)).alias("__gc"))
    gtot = gv.agg(
        F.sum("__gc").alias("__gn"), F.count(F.lit(1)).alias("__m"),
    )
    global_dist = gv.crossJoin(F.broadcast(gtot)).select(
        "__v", (F.col("__gc") / F.col("__gn")).alias("__pg"), "__m",
    )
    # null-SAFE join keys: NULL quasi-identifier values form their own
    # group (documented), so a plain equi-join would drop every count
    # of such a group and report a near-maximal phantom EMD
    grp_counts = base.groupBy(
        *[F.col(c).alias(f"__k{i}") for i, c in enumerate(qi_cols)],
        F.col("__v").alias("__kv"),
    ).agg(F.count(F.lit(1)).alias("__c"))
    grp_sizes = base.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("__n"))
    grid = grp_sizes.crossJoin(F.broadcast(global_dist))
    cond = F.col("__v").eqNullSafe(F.col("__kv"))
    for i, c in enumerate(qi_cols):
        cond = cond & F.col(c).eqNullSafe(F.col(f"__k{i}"))
    joined = grid.join(grp_counts, cond, "left").drop(
        "__kv", *[f"__k{i}" for i in range(len(qi_cols))],
    )
    diff = F.coalesce(F.col("__c"), F.lit(0)) / F.col("__n") - F.col("__pg")
    w = (
        W.partitionBy(*[F.col(c) for c in qi_cols])
        .orderBy("__v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = joined.withColumn("__cum", F.sum(diff).over(w))
    emd = F.when(
        F.max("__m") > 1,
        F.sum(F.abs(F.col("__cum"))) / (F.max("__m") - 1),
    ).otherwise(F.lit(0.0))
    return cum.groupBy(*qi_cols).agg(
        F.first("__n").cast("long").alias("n"),
        emd.alias("emd"),
        (emd <= t).alias("t_close"),
    )


def join_health_report(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str = None,
) -> DataFrame:
    """Foreign-key health between a fact table and a dimension — the
    numbers to read BEFORE running the join that silently drops or
    multiplies rows: null-key rate on the fact side, orphan fact rows
    (key absent from the dimension), duplicate keys in the dimension
    (each one multiplies matching fact rows), the worst fan-out, and
    the exact row count the inner join would produce.

    Scale shape: both sides collapse to per-key counts first (two
    map-side-combinable groupBys; shuffle bytes scale with key
    cardinality, not row count), then ONE keyed join of those two
    key-cardinality frames and one fold.  Nothing driver-side.

    Returns one row: ``(n_fact, n_fact_null_key, n_fact_orphan,
    n_dim, n_dim_keys, n_dim_dup_keys, max_fanout, inner_join_rows)``.
    """
    dim_key = dim_key or fact_key
    fk = fact.groupBy(
        F.col(fact_key).alias("__k"),
    ).agg(F.count(F.lit(1)).alias("__nf"))
    dk = dim.groupBy(
        F.col(dim_key).alias("__k"),
    ).agg(F.count(F.lit(1)).alias("__nd"))
    j = fk.join(dk, "__k", "full_outer").select(
        "__k",
        F.coalesce("__nf", F.lit(0)).alias("__nf"),
        F.col("__nd"),
    )
    null_key = F.col("__k").isNull()
    matched = F.col("__nd").isNotNull() & ~null_key
    return j.agg(
        F.sum("__nf").cast("long").alias("n_fact"),
        F.sum(F.when(null_key, F.col("__nf")).otherwise(F.lit(0)))
        .cast("long").alias("n_fact_null_key"),
        F.sum(
            F.when(
                F.col("__nd").isNull() & ~null_key, F.col("__nf"),
            ).otherwise(F.lit(0)),
        ).cast("long").alias("n_fact_orphan"),
        F.sum(F.coalesce("__nd", F.lit(0))).cast("long").alias("n_dim"),
        F.sum((F.col("__nd").isNotNull()).cast("long"))
        .cast("long").alias("n_dim_keys"),
        F.sum((F.coalesce("__nd", F.lit(0)) > 1).cast("long"))
        .cast("long").alias("n_dim_dup_keys"),
        # worst fan-out only over keys the join would actually multiply:
        # a duplicate dim key with ZERO matching fact rows (or the dim's
        # null-key group) multiplies nothing and must not win the max.
        F.max(F.when(matched & (F.col("__nf") > 0), F.col("__nd")))
        .cast("long").alias("max_fanout"),
        F.sum(
            F.when(matched, F.col("__nf") * F.col("__nd"))
            .otherwise(F.lit(0)),
        ).cast("long").alias("inner_join_rows"),
    )


def snapshot_drift_report(
    before: DataFrame,
    after: DataFrame,
) -> DataFrame:
    """Schema + per-column statistical drift between two snapshots of
    the same logical table — the pre-flight diff before swapping a
    pipeline onto a new data drop: added/dropped/type-changed columns
    (from schema METADATA, zero jobs), and for columns present in both,
    the null-rate on each side plus, for numerics, the mean on each
    side and the shift.

    Scale shape: ONE aggregation per snapshot (every column's null
    count and mean folds map-side into a single 1-row frame), the two
    1-row frames broadcast-crossJoin, and a pure ``inline`` unpivots to
    one row per column — no per-column jobs, no collect, fully lazy.

    Returns rows ``(column, status, dtype_before, dtype_after,
    null_rate_before, null_rate_after, mean_before, mean_after,
    mean_shift)`` where status is 'added' | 'dropped' | 'type_changed'
    | 'common'; stats are NULL on the side a column is absent from and
    means are NULL for non-numerics.
    """
    numeric = (
        "int", "bigint", "smallint", "tinyint", "double", "float",
    )

    def _types(d):
        return {f.name: f.dataType.simpleString() for f in d.schema.fields}

    tb, ta = _types(before), _types(after)
    cols = sorted(set(tb) | set(ta))

    def _aggs(d, types, side):
        out = []
        n = F.count(F.lit(1))
        for c in cols:
            if c in types:
                out.append(
                    (
                        F.sum(F.col(c).isNull().cast("long"))
                        / F.greatest(n, F.lit(1))
                    ).alias(f"__nr_{side}_{c}"),
                )
                if types[c] in numeric or types[c].startswith("decimal"):
                    out.append(
                        F.avg(F.col(c).cast("double")).alias(
                            f"__mu_{side}_{c}",
                        ),
                    )
        return d.agg(*out) if out else d.sparkSession.range(1).select(
            F.lit(1).alias(f"__dummy_{side}"),
        )

    joined = _aggs(before, tb, "b").crossJoin(
        F.broadcast(_aggs(after, ta, "a")),
    )

    def _stat(side, kind, c, types):
        name = f"__{kind}_{side}_{c}"
        if c in types and (
            kind == "nr"
            or types[c] in numeric
            or types[c].startswith("decimal")
        ):
            return F.col(name)
        return F.lit(None).cast("double")

    rows = []
    for c in cols:
        if c not in ta:
            status = "dropped"
        elif c not in tb:
            status = "added"
        elif tb[c] != ta[c]:
            status = "type_changed"
        else:
            status = "common"
        mu_b = _stat("b", "mu", c, tb)
        mu_a = _stat("a", "mu", c, ta)
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(status).alias("status"),
                F.lit(tb.get(c)).cast("string").alias("dtype_before"),
                F.lit(ta.get(c)).cast("string").alias("dtype_after"),
                _stat("b", "nr", c, tb).alias("null_rate_before"),
                _stat("a", "nr", c, ta).alias("null_rate_after"),
                mu_b.alias("mean_before"),
                mu_a.alias("mean_after"),
                (mu_a - mu_b).alias("mean_shift"),
            ),
        )
    return joined.select(F.inline(F.array(*rows)))


def shard_manifest(
    df: DataFrame,
    id_col: str,
    content_col: str,
    n_shards: int = 16,
    salt: str = "",
) -> DataFrame:
    """Deterministic shard assignment plus a per-shard provenance
    manifest — the bookkeeping a 100 TB corpus needs to prove that two
    pipelines (or two runs, or export vs re-import) saw the same bytes.

    Sharding is the salted-md5-prefix convention shared by
    :func:`~woodwork_spark.operators.sampling.hash_split` (same key ->
    same shard on any engine, rerun, or partitioning).  Each shard row
    carries content CHECKSUMS that are mergeable and order-free: the
    per-doc md5 folds to an integer and is summed under two coprime
    moduli (1_000_003 and 999_983) — addition commutes, so the result
    is independent of row order and partitioning, and two moduli push
    the silent-collision probability to ~1e-12 per shard.  Per-doc
    residues are < 1e6, so the running sum stays within long range up
    to ~9e12 docs per shard.  These are drift TRIPWIRES (like rsync's
    rolling checks), not cryptographic commitments — the manifest also
    carries doc counts, char mass and id bounds for cheap triage.

    Returns one row per shard: ``(shard, n_docs, n_chars, min_id,
    max_id, checksum_a, checksum_b)``.  ONE aggregate; nothing global.
    """
    hid = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    doc_h = F.conv(
        F.substring(F.md5(F.col(content_col)), 1, 15), 16, 10,
    ).cast("long")
    return (
        df.filter(F.col(content_col).isNotNull())
        .groupBy(F.pmod(hid, F.lit(n_shards)).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length(content_col)).cast("long").alias("n_chars"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
            F.pmod(F.sum(doc_h % 1000003), F.lit(1000003))
            .cast("long").alias("checksum_a"),
            F.pmod(F.sum(doc_h % 999983), F.lit(999983))
            .cast("long").alias("checksum_b"),
        )
    )
