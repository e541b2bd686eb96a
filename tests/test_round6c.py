"""Round-6 batch 3: waterfill cap, MMR selection, distributed Lloyd
k-means, personalized PageRank."""

import pytest
from pyspark.sql import functions as F

from woodwork_spark.operators.graph import pagerank
from woodwork_spark.operators.packing import waterfill_cap
from woodwork_spark.operators.similarity import kmeans_lloyd, mmr_select


# ------------------------------------------------------------------ waterfill


def _counts_df(spark, counts):
    return spark.createDataFrame(
        [(g, c) for g, c in counts.items()], "g string, c long",
    )


def test_waterfill_golden(spark):
    # counts 10, 20, 100; budget 60 -> cap c where 10 + 20 + c... sorted
    # [10, 20, 100]: at pos2 kept = 30 + 1*100 >= 60 -> tau = 60-30 = 30
    df = _counts_df(spark, {"a": 10, "b": 20, "c": 100})
    out = {r["g"]: r for r in waterfill_cap(df, "g", "c", 60).collect()}
    assert out["a"]["tau"] == 30
    assert (out["a"]["alloc"], out["b"]["alloc"], out["c"]["alloc"]) == (
        10, 20, 30,
    )
    assert sum(r["alloc"] for r in out.values()) == 60


def test_waterfill_budget_fits_everything(spark):
    df = _counts_df(spark, {"a": 5, "b": 7})
    out = waterfill_cap(df, "g", "c", 1000).collect()
    assert all(r["alloc"] == r["count"] for r in out)
    assert out[0]["tau"] == 7  # max count, nothing capped


def test_waterfill_boundary_inside_sorted_prefix(spark):
    # [1, 2, 3, 4], budget 8: pos2 kept = 3 + 2*3 = 9 >= 8 ->
    # tau = (8-3)//2 = 2 -> allocs 1,2,2,2 = 7 (integer cap wastes 1)
    df = _counts_df(spark, {"a": 1, "b": 2, "c": 3, "d": 4})
    out = {r["g"]: r for r in waterfill_cap(df, "g", "c", 8).collect()}
    assert out["a"]["tau"] == 2
    assert [out[k]["alloc"] for k in "abcd"] == [1, 2, 2, 2]


def test_waterfill_aggregates_row_counts(spark):
    rows = [("a", 3), ("a", 4), ("b", 10)]
    df = spark.createDataFrame(rows, "g string, c long")
    out = {r["g"]: r for r in waterfill_cap(df, "g", "c", 100).collect()}
    assert out["a"]["count"] == 7 and out["b"]["count"] == 10


def test_waterfill_validation(spark):
    df = _counts_df(spark, {"a": 1})
    with pytest.raises(ValueError, match="budget"):
        waterfill_cap(df, "g", "c", -1)


# ------------------------------------------------------------------------ MMR


def _mmr_fixture(spark):
    # two near-duplicate high-relevance vectors + one orthogonal
    rows = [
        (1, [1.0, 0.0, 0.0], 1.0),
        (2, [0.999, 0.01, 0.0], 0.99),   # near-copy of 1
        (3, [0.0, 1.0, 0.0], 0.5),
        (4, [0.0, 0.0, 1.0], 0.1),
    ]
    return spark.createDataFrame(rows, "id long, v array<double>, rel double")


def test_mmr_skips_near_duplicate(spark):
    df = _mmr_fixture(spark)
    out = mmr_select(df, "id", "v", "rel", k=2, lam=0.5).collect()
    ids = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
    # pure relevance would pick (1, 2); MMR must pick 1 then the
    # orthogonal 3 (sim(1,2) ~ 1 kills 2's marginal score)
    assert ids == [1, 3]


def test_mmr_lam_one_is_pure_relevance(spark):
    df = _mmr_fixture(spark)
    out = mmr_select(df, "id", "v", "rel", k=2, lam=1.0).collect()
    ids = [r["id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ids == [1, 2]


def test_mmr_exhausts_candidates_gracefully(spark):
    df = _mmr_fixture(spark).filter("id <= 2")
    out = mmr_select(df, "id", "v", "rel", k=10, lam=0.7).collect()
    assert len(out) == 2


def test_mmr_validation(spark):
    df = _mmr_fixture(spark)
    with pytest.raises(ValueError, match="k must"):
        mmr_select(df, "id", "v", "rel", k=0)
    with pytest.raises(ValueError, match="lam"):
        mmr_select(df, "id", "v", "rel", k=1, lam=1.5)


# --------------------------------------------------------------------- kmeans


def test_kmeans_recovers_planted_clusters(spark):
    import random

    rnd = random.Random(11)
    centers = [[0.0, 0.0], [10.0, 10.0], [0.0, 10.0]]
    rows = []
    for i in range(300):
        c = centers[i % 3]
        rows.append(
            (i, [c[0] + rnd.gauss(0, 0.3), c[1] + rnd.gauss(0, 0.3)]),
        )
    df = spark.createDataFrame(rows, "id long, v array<double>")
    init = [(0, centers[0]), (1, centers[1]), (2, centers[2])]
    out = kmeans_lloyd(df, "id", "v", init, iterations=2).collect()
    for r in out:
        assert r["cluster"] == r["id"] % 3
        assert r["dist_sq"] < 5.0


def test_kmeans_zero_iterations_is_pure_assignment(spark):
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [9.0])], "id long, v array<double>",
    )
    init = [(0, [1.0]), (1, [8.0])]
    out = {r["id"]: r for r in
           kmeans_lloyd(df, "id", "v", init, iterations=0).collect()}
    assert out[1]["cluster"] == 0 and out[2]["cluster"] == 1
    assert out[1]["dist_sq"] == pytest.approx(1.0)


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # centroid 1 attracts nothing -> stays at its init position
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [0.2])], "id long, v array<double>",
    )
    init = [(0, [0.1]), (1, [100.0])]
    out = kmeans_lloyd(df, "id", "v", init, iterations=3).collect()
    assert all(r["cluster"] == 0 for r in out)


def test_kmeans_validation(spark):
    df = spark.createDataFrame([(1, [0.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match="empty"):
        kmeans_lloyd(df, "id", "v", [], iterations=1)
    with pytest.raises(ValueError, match="iterations"):
        kmeans_lloyd(df, "id", "v", [(0, [0.0])], iterations=-1)


# ------------------------------------------------------- personalized pagerank


def test_ppr_mass_concentrates_near_seed(spark):
    # chain a -> b -> c -> d plus far component e <-> f
    edges = [("a", "b"), ("b", "c"), ("c", "d"),
             ("e", "f"), ("f", "e")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r["pagerank"] for r in
           pagerank(df, iterations=6, seeds=["a"]).collect()}
    # the disconnected component gets no seeded mass at all
    assert out["e"] == pytest.approx(0.0, abs=1e-12)
    assert out["f"] == pytest.approx(0.0, abs=1e-12)
    assert out["a"] > out["b"] > out["c"] > 0.0


def test_ppr_strategies_agree(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d")]
    df = spark.createDataFrame(edges, "src string, dst string")
    bc = {r["node"]: r["pagerank"] for r in pagerank(
        df, iterations=4, seeds=["a", "d"], broadcast_ranks=True).collect()}
    smj = {r["node"]: r["pagerank"] for r in pagerank(
        df, iterations=4, seeds=["a", "d"], broadcast_ranks=False).collect()}
    for n in bc:
        assert bc[n] == pytest.approx(smj[n], abs=1e-12)


def test_ppr_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="seeds"):
        pagerank(df, iterations=1, seeds=[])
    with pytest.raises(ValueError, match="redistribute_dangling"):
        pagerank(df, iterations=1, seeds=["a"], redistribute_dangling=True)


# ----------------------------------------------------- review-pass regressions


def test_target_encode_null_fold_is_its_own_fold(spark):
    from woodwork_spark.operators.features import target_encode

    # null-fold rows must be encoded EXCLUDING their own (null) fold
    rows = [("x", 0.0, None), ("x", 0.0, None), ("x", 1.0, 1), ("x", 1.0, 1)]
    df = spark.createDataFrame(rows, "c string, y double, f int")
    out = target_encode(df, "c", "y", smoothing=0.0, fold_col="f",
                        out_col="enc").collect()
    by_fold = {r["f"]: r["enc"] for r in out}
    assert by_fold[None] == pytest.approx(1.0)  # other fold's mean
    assert by_fold[1] == pytest.approx(0.0)


def test_target_encode_null_category_is_its_own_level(spark):
    from woodwork_spark.operators.features import target_encode

    rows = [(None, 1.0), (None, 1.0), ("a", 0.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {r["c"]: r["enc"] for r in
           target_encode(df, "c", "y", smoothing=0.0, out_col="enc").collect()}
    assert out[None] == pytest.approx(1.0)   # NULL level's own mean
    assert out["a"] == pytest.approx(0.0)


def test_t_closeness_null_qi_group_counts(spark):
    from woodwork_spark.operators.quality_checks import t_closeness_report

    # the NULL-QI group mirrors the global distribution -> EMD 0, not
    # the phantom near-maximal value a null-dropping join would produce
    rows = [(None, 1), (None, 2), ("g", 1), ("g", 2)]
    df = spark.createDataFrame(rows, "q string, v int")
    out = {r["q"]: r for r in t_closeness_report(df, "q", "v").collect()}
    assert out[None]["emd"] == pytest.approx(0.0)
    assert out[None]["t_close"]


def test_threshold_sweep_all_negative_prefers_sentinel(spark):
    from woodwork_spark.operators.evaluation import threshold_sweep

    rows = [(0.1, False), (0.9, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = threshold_sweep(df, "s", "y", fp_cost=1.0, fn_cost=1.0).first()
    assert r["threshold"] == float("inf")
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (0, 0, 0, 2)
    assert r["cost"] == 0.0


def test_pagerank_missing_seed_raises(spark):
    from woodwork_spark.operators.graph import pagerank

    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="do not appear"):
        pagerank(df, iterations=1, seeds=["zzz"])


def test_graph_empty_edges_raise(spark):
    from woodwork_spark.operators.graph import hits, pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty, iterations=1)
    with pytest.raises(ValueError, match="empty"):
        hits(empty, iterations=1)
