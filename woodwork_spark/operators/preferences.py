"""Pairwise-preference analytics for RLHF / ranking training data.

Preference datasets (chosen/rejected response pairs, A/B judgments,
match outcomes) need the same governance as documents: aggregate win
matrices, a strength ranking (Bradley–Terry), and consistency QA
(majority-cycle rate — raters whose aggregate preferences are cyclic
cannot be fit by ANY total order).

Scale shapes:

- Everything aggregates raw judgments to the PAIR level first (one
  map-side-combinable groupBy; shuffle scales with distinct pair count,
  not judgment count).
- Bradley–Terry runs the classic MM update (Hunter 2004) for a fixed
  iteration count: each iteration is one broadcast join of the
  item-strength frame (item-cardinality-sized) onto the pair table plus
  one grouped agg — the pagerank pattern, k small rounds, no driver
  math on data.
- The transitivity report reduces pairs to majority-direction edges and
  counts directed 3-cycles with one wedge join — degree-bounded like
  the graph module's triangle count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from woodwork_spark.operators.scale import local_rows_df


def pairwise_win_matrix(
    df: DataFrame,
    winner_col: str,
    loser_col: str,
) -> DataFrame:
    """Aggregate raw judgments to the canonical pair level: one row per
    unordered pair (a < b by value) with ``wins_a`` (a beat b),
    ``wins_b``, ``n``, and a's empirical win rate.  Self-pairs and
    null-sided judgments are dropped.  ONE grouped aggregation."""
    w, l = F.col(winner_col).cast("string"), F.col(loser_col).cast("string")
    base = df.filter(w.isNotNull() & l.isNotNull() & (w != l)).select(
        F.least(w, l).alias("item_a"),
        F.greatest(w, l).alias("item_b"),
        (w < l).cast("long").alias("__a_won"),
    )
    return base.groupBy("item_a", "item_b").agg(
        F.sum("__a_won").alias("wins_a"),
        (F.count(F.lit(1)) - F.sum("__a_won")).alias("wins_b"),
        F.count(F.lit(1)).alias("n"),
        (F.sum("__a_won") / F.count(F.lit(1))).alias("win_rate_a"),
    )


def bradley_terry(
    df: DataFrame,
    winner_col: str,
    loser_col: str,
    iters: int = 8,
) -> DataFrame:
    """Bradley–Terry strength ranking from pairwise judgments via the
    MM algorithm (Hunter 2004): iterate
    ``w_i <- W_i / sum_j n_ij / (w_i + w_j)`` from ``w = 1``, then
    normalize so the strengths sum to the item count (scale is
    arbitrary in BT; this keeps the all-equal fixpoint at 1.0).
    ``P(i beats j) = w_i / (w_i + w_j)``.

    Fixed ``iters`` rounds (MM converges monotonically; 8 rounds is
    plenty for ranking stability — pass more for tight tail strengths).
    Each round: broadcast the item-strength frame onto the symmetric
    pair table, one grouped agg — shuffle scales with pair cardinality;
    the strength frame is item-cardinality-sized.  Items that only ever
    win (or only lose) have no finite MLE; the fixed-iteration MM
    returns the correspondingly extreme finite value, documented BT
    behavior.

    Returns ``(item, strength, n_wins, n_games)``.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    pairs = pairwise_win_matrix(df, winner_col, loser_col)
    # symmetric (i, j, n_ij, wins_i) — each unordered pair twice
    sym = pairs.select(
        F.col("item_a").alias("i"), F.col("item_b").alias("j"),
        F.col("n").alias("n_ij"), F.col("wins_a").alias("wins_i"),
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("i"), F.col("item_a").alias("j"),
            F.col("n").alias("n_ij"), F.col("wins_b").alias("wins_i"),
        ),
    ).persist()
    totals = sym.groupBy("i").agg(
        F.sum("wins_i").alias("__w"),
        F.sum("n_ij").alias("__g"),
    )
    w = totals.select("i", F.lit(1.0).alias("__s"))
    for _ in range(int(iters)):
        wi = w.select(F.col("i"), F.col("__s").alias("__si"))
        wj = w.select(F.col("i").alias("j"), F.col("__s").alias("__sj"))
        denom = (
            sym.join(F.broadcast(wi), "i")
            .join(F.broadcast(wj), "j")
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("n_ij").cast("double")
                    / (F.col("__si") + F.col("__sj")),
                ).alias("__d"),
            )
        )
        w = denom.join(totals, "i").select(
            "i",
            F.when(
                F.col("__d") > 0,
                F.col("__w").cast("double") / F.col("__d"),
            ).otherwise(F.lit(0.0)).alias("__s"),
        )
        # eager checkpoint of the ITEM-sized strength frame per round —
        # the graph-module convention: without it each iteration's plan
        # embeds the previous one and analysis time grows exponentially
        w = w.localCheckpoint(eager=True)
    norm = w.agg(
        F.sum("__s").alias("__t"), F.count(F.lit(1)).alias("__k"),
    )
    out = (
        w.crossJoin(F.broadcast(norm))
        .join(totals, "i")
        .select(
            F.col("i").alias("item"),
            F.when(
                F.col("__t") > 0,
                F.col("__s") * F.col("__k") / F.col("__t"),
            ).otherwise(F.lit(0.0)).alias("strength"),
            F.col("__w").cast("long").alias("n_wins"),
            F.col("__g").cast("long").alias("n_games"),
        )
    )
    from ..lifecycle import attach_persisted

    return attach_persisted(out, sym)


def transitivity_report(
    df: DataFrame,
    winner_col: str,
    loser_col: str,
    min_n: int = 1,
) -> DataFrame:
    """Preference-consistency QA: reduce pairs to their MAJORITY
    direction (ties dropped, pairs with < ``min_n`` judgments dropped),
    then count directed 3-cycles (a -> b -> c -> a) among the majority
    edges — a nonzero cycle rate means the aggregate preferences admit
    NO consistent ranking, the first thing to check before fitting BT.

    One wedge join on the majority-edge table (edge count is pair
    cardinality, degree-bounded like the graph module's triangles).
    Returns one row ``(n_pairs, n_edges, n_triangles, n_cycles,
    cycle_rate)`` where ``n_triangles`` counts ordered triples forming
    any directed triangle over majority edges and ``cycle_rate`` is
    cycles / triangles (0 when no triangles).
    """
    # persisted: four bounded actions below (two triangle counts, two
    # cardinality counts) must not re-run the judgment aggregation
    pairs = pairwise_win_matrix(df, winner_col, loser_col).filter(
        F.col("n") >= int(min_n),
    ).persist()
    edges = pairs.filter(F.col("wins_a") != F.col("wins_b")).select(
        F.when(F.col("wins_a") > F.col("wins_b"), F.col("item_a"))
        .otherwise(F.col("item_b")).alias("src"),
        F.when(F.col("wins_a") > F.col("wins_b"), F.col("item_b"))
        .otherwise(F.col("item_a")).alias("dst"),
    ).persist()
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("c2"), F.col("dst").alias("a2"))
    # a->b->c closed by EITHER c->a (cycle) or a->c (transitive)
    wedges = e1.join(e2, "b")
    cycles = wedges.join(
        e3, (F.col("c") == F.col("c2")) & (F.col("a") == F.col("a2")),
    ).count()
    e3t = edges.select(F.col("src").alias("a2"), F.col("dst").alias("c2"))
    closed = wedges.join(
        e3t, (F.col("c") == F.col("c2")) & (F.col("a") == F.col("a2")),
    ).count()
    n_pairs = pairs.count()
    n_edges = edges.count()
    edges.unpersist()
    pairs.unpersist()
    spark = df.sparkSession
    # each directed 3-cycle is counted once per rotation (3 wedges close
    # cyclically); each transitive triangle closes exactly one wedge
    n_cycles = cycles // 3
    n_tri = n_cycles + closed
    return local_rows_df(spark, 
        [(
            n_pairs, n_edges, n_tri, n_cycles,
            (float(n_cycles) / n_tri) if n_tri else 0.0,
        )],
        "n_pairs long, n_edges long, n_triangles long, n_cycles long, "
        "cycle_rate double",
    )
