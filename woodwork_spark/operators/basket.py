"""Market-basket analysis: frequent item pairs and association rules.

The apriori-pruned two-stage shape that scales:

1. **Item support** — one groupBy(item) over (basket, item) pairs; items
   below ``min_support`` are pruned HERE, before any pair is formed
   (the apriori property: a pair can only be frequent if both items
   are).  At 100 TB this is the difference between pairing a bounded
   frequent-item set and exploding every basket quadratically.
2. **Pair support** — self-join of the pruned (basket, item) table on
   the basket key with ``a < b`` (each unordered pair once), then one
   groupBy(a, b).  The join input carries only frequent items, so the
   quadratic blow-up is bounded by (frequent items per basket)², not
   (basket size)².

Rules are derived from pair supports driver-free: confidence(a→b) =
support(ab)/support(a), lift = confidence/P(b) — all column arithmetic
on the joined aggregate tables.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
) -> DataFrame:
    """Unordered item pairs co-occurring in at least ``min_support`` of
    baskets.  Returns ``(item_a, item_b, pair_count, pair_support)``
    with item_a < item_b.

    Duplicate (basket, item) rows count once (set semantics); NULL
    baskets/items are ignored.
    """
    if not 0.0 < min_support <= 1.0:
        raise ValueError(f"min_support must be in (0, 1], got {min_support}")
    bi = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"),
        )
        .where(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
    )
    n_baskets = bi.select("__b").distinct().count()
    min_count = max(1, math.ceil(min_support * n_baskets))
    # apriori prune: only items frequent on their own can form a
    # frequent pair
    freq_items = (
        bi.groupBy("__i")
        .agg(F.count(F.lit(1)).alias("__ic"))
        .where(F.col("__ic") >= min_count)
    )
    pruned = bi.join(
        F.broadcast(freq_items.select("__i")), on="__i", how="left_semi",
    )
    a = pruned.select(F.col("__b"), F.col("__i").alias("item_a"))
    b = pruned.select(F.col("__b").alias("__b2"), F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, (a.__b == b.__b2) & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= min_count)
        .withColumn(
            "pair_support", F.col("pair_count") / F.lit(float(n_baskets)),
        )
    )
    return pairs


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: float = 0.01,
    min_confidence: float = 0.2,
) -> DataFrame:
    """Directed association rules a -> b from frequent pairs:
    ``(antecedent, consequent, pair_count, support, confidence, lift)``.

    confidence = support(ab)/support(a); lift = confidence / P(b).
    Both directions of every frequent pair are emitted, filtered by
    ``min_confidence``.  Pure aggregate-table joins — nothing beyond the
    (bounded) frequent-pair table ever re-shuffles.
    """
    bi = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"),
        )
        .where(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
    )
    n_baskets = bi.select("__b").distinct().count()
    pairs = frequent_pairs(df, basket_col, item_col, min_support)
    item_counts = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__ic"))
    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "pair_count", F.col("pair_support").alias("support"),
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "pair_count", F.col("pair_support").alias("support"),
        ),
    )
    ante = item_counts.select(
        F.col("__i").alias("antecedent"), F.col("__ic").alias("__na"),
    )
    cons = item_counts.select(
        F.col("__i").alias("consequent"), F.col("__ic").alias("__nc"),
    )
    return (
        both.join(F.broadcast(ante), "antecedent")
        .join(F.broadcast(cons), "consequent")
        .withColumn("confidence", F.col("pair_count") / F.col("__na"))
        .withColumn(
            "lift",
            F.col("confidence") / (F.col("__nc") / F.lit(float(n_baskets))),
        )
        .where(F.col("confidence") >= min_confidence)
        .select(
            "antecedent", "consequent", "pair_count",
            "support", "confidence", "lift",
        )
    )


def cooccurrence_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_cooc: int = 1,
) -> DataFrame:
    """Unordered item pairs co-occurring in >= ``min_cooc`` baskets
    (set semantics; NULLs ignored): the shared pair generator behind
    :func:`item_similarity` and graph constructions (q:kcore builds
    its co-purchase edges from exactly this) — self-join on the
    basket, so work is sum over baskets of (items-per-basket)², never
    catalog².  Returns ``(item_a, item_b, cooc)`` with item_a <
    item_b."""
    if min_cooc < 1:
        raise ValueError(f"min_cooc must be >= 1, got {min_cooc}")
    bi = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"),
        )
        .where(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
    )
    a = bi.select("__b", F.col("__i").alias("item_a"))
    b = bi.select(F.col("__b").alias("__b2"), F.col("__i").alias("item_b"))
    return (
        a.join(b, (a.__b == b.__b2) & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("cooc"))
        .where(F.col("cooc") >= min_cooc)
    )


def item_similarity(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_cooc: int = 2,
    top_k: int = None,
) -> DataFrame:
    """Item-item cosine similarity from co-occurrence in baskets — the
    classical neighborhood collaborative-filtering precompute:
    cos(i, j) = |baskets with both| / sqrt(|baskets with i| *
    |baskets with j|), over set semantics (duplicate (basket, item)
    rows count once).

    Scale shape: the pair space comes from a self-join on the BASKET,
    so work is sum over baskets of (items-per-basket)² — bounded by
    basket width, not catalog size (an order with 7 lineitems yields
    21 pairs).  ``min_cooc`` prunes the long noise tail before the
    degree joins; ``top_k`` (per item_a, by cosine) caps the output
    via a window AFTER the aggregate, when rows are already
    per-pair-small.  Item counts broadcast back (AQE).

    Returns ``(item_a, item_b, cooc, cos_sim)`` with item_a < item_b.
    """
    if top_k is not None and top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    cooc = cooccurrence_pairs(df, basket_col, item_col, min_cooc)
    bi = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"),
        )
        .where(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
    )
    icnt = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__ic"))
    ca = icnt.select(F.col("__i").alias("item_a"), F.col("__ic").alias("__ca"))
    cb = icnt.select(F.col("__i").alias("item_b"), F.col("__ic").alias("__cb"))
    scored = cooc.join(ca, "item_a").join(cb, "item_b").select(
        "item_a", "item_b", "cooc",
        (
            F.col("cooc")
            / F.sqrt(F.col("__ca").cast("double") * F.col("__cb"))
        ).alias("cos_sim"),
    )
    if top_k is not None:
        from pyspark.sql import Window as W

        w = W.partitionBy("item_a").orderBy(
            F.col("cos_sim").desc(), F.col("item_b").asc(),
        )
        scored = (
            scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= top_k)
            .drop("__r")
        )
    return scored


def association_rules3(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_basket_support: int = 3,
) -> DataFrame:
    """Size-3 frequent itemsets mined apriori-style and emitted as
    {a, b} -> c rules with confidence and lift — the step beyond
    :func:`association_rules`' pairs that catches "diapers AND wipes
    imply cream" effects a pair scan cannot see.

    Scale shape: only pairs passing ``min_basket_support`` extend to
    triples (apriori: a triple's support is bounded by every child
    pair's), and the extension joins surviving pairs back to baskets
    ON THE BASKET KEY with an item > b inequality — work is surviving
    pairs x basket width, never items³.  Item/pair/triple counts are
    three aggregates over the same deduped (basket, item) frame
    (persisted once, released via the lifecycle attachment).

    Returns ``(item_a, item_b, item_c, triple_count, confidence,
    lift)`` with item_a < item_b < item_c: confidence =
    sup(abc)/sup(ab); lift = confidence / P(c).
    """
    if min_basket_support < 1:
        raise ValueError(
            f"min_basket_support must be >= 1, got {min_basket_support}",
        )
    from ..lifecycle import attach_persisted

    bi = (
        df.select(
            F.col(basket_col).alias("__b"), F.col(item_col).alias("__i"),
        )
        .where(F.col("__b").isNotNull() & F.col("__i").isNotNull())
        .distinct()
        .persist()
    )
    n_baskets = bi.select("__b").distinct().count()
    icnt = bi.groupBy("__i").agg(F.count(F.lit(1)).alias("__ic"))
    a = bi.select("__b", F.col("__i").alias("item_a"))
    b = bi.select(F.col("__b").alias("__b2"), F.col("__i").alias("item_b"))
    pair_occ = a.join(
        b, (a.__b == b.__b2) & (F.col("item_a") < F.col("item_b")),
    ).select("__b", "item_a", "item_b")
    pairs = (
        pair_occ.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("__pc"))
        .where(F.col("__pc") >= min_basket_support)
    )
    surv = pair_occ.join(
        F.broadcast(pairs), ["item_a", "item_b"], "left_semi",
    )
    c = bi.select(F.col("__b").alias("__b3"), F.col("__i").alias("item_c"))
    triples = (
        surv.join(
            c,
            (surv.__b == c.__b3) & (F.col("item_c") > F.col("item_b")),
        )
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count(F.lit(1)).alias("triple_count"))
        .where(F.col("triple_count") >= min_basket_support)
    )
    out = (
        triples.join(F.broadcast(pairs), ["item_a", "item_b"])
        .join(
            F.broadcast(icnt.select(
                F.col("__i").alias("item_c"), F.col("__ic").alias("__cc"),
            )),
            "item_c",
        )
        .select(
            "item_a", "item_b", "item_c",
            F.col("triple_count").cast("long").alias("triple_count"),
            (F.col("triple_count") / F.col("__pc")).alias("confidence"),
            (
                F.col("triple_count") * F.lit(float(n_baskets))
                / (F.col("__pc") * F.col("__cc"))
            ).alias("lift"),
        )
    )
    return attach_persisted(out, bi)
