"""Round-6 operators: calibration / agreement / conformal intervals /
t-closeness / HITS / out-of-fold encoding / negative sampling.

Each operator's harness query is oracle-checked in test_oracle_parity;
these tests pin the EDGE CASES the star-schema data can't exercise —
degenerate inputs, validation errors, hand-computed goldens.
"""

import math

import pytest
from pyspark.sql import functions as F

from woodwork_spark.operators.evaluation import (
    calibration_report,
    calibration_summary,
    cohens_kappa,
    conformal_intervals,
    mcnemar_test,
)
from woodwork_spark.operators.features import target_encode
from woodwork_spark.operators.graph import hits
from woodwork_spark.operators.quality_checks import t_closeness_report
from woodwork_spark.operators.sampling import negative_sample


# ---------------------------------------------------------------- calibration


def test_calibration_perfectly_calibrated(spark):
    # bin [0.2, 0.3): score 0.25, 1 of 4 positive -> gap = 0.0
    rows = [(0.25, i == 0) for i in range(4)] + [(0.75, i < 3) for i in range(4)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    rep = {r["bin"]: r for r in calibration_report(df, "score", "y").collect()}
    assert set(rep) == {2, 7}
    assert rep[2]["accuracy"] == pytest.approx(0.25)
    assert rep[2]["gap"] == pytest.approx(0.0)
    assert rep[7]["gap"] == pytest.approx(0.0)
    s = calibration_summary(df, "score", "y").first()
    assert s["ece"] == pytest.approx(0.0)
    assert s["mce"] == pytest.approx(0.0)
    # brier = mean((p - y)^2) = (0.25^2*3 + 0.75^2 + 0.25^2*3 + 0.75^2)/8
    assert s["brier"] == pytest.approx(
        (0.25**2 * 3 + 0.75**2 + 0.25**2 * 3 + 0.75**2) / 8,
    )


def test_calibration_clamps_and_excludes_nulls(spark):
    df = spark.createDataFrame(
        [(1.5, True), (-0.2, False), (None, True), (0.5, None)],
        "score double, y boolean",
    )
    rep = calibration_report(df, "score", "y", bins=10).collect()
    assert {r["bin"] for r in rep} == {0, 9}  # clamped, nulls dropped
    assert sum(r["n"] for r in rep) == 2


def test_calibration_bins_validation(spark):
    df = spark.createDataFrame([(0.5, True)], "score double, y boolean")
    with pytest.raises(ValueError, match="bins"):
        calibration_report(df, "score", "y", bins=0)


# ------------------------------------------------------------------ agreement


def test_cohens_kappa_golden(spark):
    # classic 2x2: a/b agree on 20 yes + 15 no, disagree 5 + 10
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15
        + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").first()
    po = 35 / 50
    pe = (25 / 50) * (30 / 50) + (25 / 50) * (20 / 50)
    assert r["n"] == 50
    assert r["po"] == pytest.approx(po)
    assert r["pe"] == pytest.approx(pe)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe))


def test_cohens_kappa_degenerate_single_category(spark):
    df = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    r = cohens_kappa(df, "a", "b").first()
    assert r["po"] == 1.0 and r["pe"] == 1.0 and r["kappa"] is None


def test_mcnemar_golden(spark):
    rows = (
        [(True, True)] * 30 + [(False, False)] * 10
        + [(True, False)] * 8 + [(False, True)] * 2
    )
    df = spark.createDataFrame(rows, "a boolean, b boolean")
    r = mcnemar_test(df, "a", "b").first()
    assert (r["a_only"], r["b_only"]) == (8, 2)
    assert r["chi2"] == pytest.approx(36 / 10)
    assert r["chi2_cc"] == pytest.approx(25 / 10)


def test_mcnemar_no_discordance_is_null(spark):
    df = spark.createDataFrame([(True, True)] * 4, "a boolean, b boolean")
    r = mcnemar_test(df, "a", "b").first()
    assert r["chi2"] is None and r["chi2_cc"] is None


# ------------------------------------------------------------------ conformal


def test_conformal_known_order_statistic(spark):
    # 9 calibration residuals 1..9; alpha=0.1 -> k = ceil(0.9*10) = 9
    rows = [(0.0, float(i), True) for i in range(1, 10)]
    rows += [(0.0, 5.5, False), (0.0, 12.0, False)]
    df = spark.createDataFrame(rows, "pred double, actual double, cal boolean")
    r = conformal_intervals(df, "pred", "actual", "cal", alpha=0.1).first()
    assert r["n_calib"] == 9
    assert r["qhat"] == pytest.approx(9.0)
    assert r["n_test"] == 2 and r["covered"] == 1
    assert r["coverage"] == pytest.approx(0.5)


def test_conformal_rank_clamps_to_max(spark):
    # alpha tiny -> k > n, clamps to max residual
    rows = [(0.0, float(i), True) for i in range(1, 4)] + [(0.0, 2.0, False)]
    df = spark.createDataFrame(rows, "pred double, actual double, cal boolean")
    r = conformal_intervals(df, "pred", "actual", "cal", alpha=0.01).first()
    assert r["qhat"] == pytest.approx(3.0)
    assert r["coverage"] == pytest.approx(1.0)


def test_conformal_validation(spark):
    df = spark.createDataFrame(
        [(0.0, 1.0, False)], "pred double, actual double, cal boolean",
    )
    with pytest.raises(ValueError, match="alpha"):
        conformal_intervals(df, "pred", "actual", "cal", alpha=1.5)
    with pytest.raises(ValueError, match="empty"):
        conformal_intervals(df, "pred", "actual", "cal", alpha=0.1)


# ---------------------------------------------------------------- t-closeness


def test_t_closeness_uniform_group_is_zero(spark):
    # both groups mirror the global distribution exactly -> EMD 0
    rows = [("g1", v) for v in (1, 2)] * 3 + [("g2", v) for v in (1, 2)] * 6
    df = spark.createDataFrame(rows, "q string, v int")
    out = {r["q"]: r for r in t_closeness_report(df, "q", "v").collect()}
    assert out["g1"]["emd"] == pytest.approx(0.0)
    assert out["g2"]["emd"] == pytest.approx(0.0)
    assert out["g1"]["t_close"] and out["g2"]["t_close"]


def test_t_closeness_skewed_group(spark):
    # global: v=1 p=0.5, v=2 p=0.5 over 8 rows; g1 all v=1, g2 all v=2
    rows = [("g1", 1)] * 4 + [("g2", 2)] * 4
    df = spark.createDataFrame(rows, "q string, v int")
    out = {r["q"]: r for r in t_closeness_report(df, "q", "v", t=0.2).collect()}
    # m=2: emd = |p_g(1) - 0.5| = 0.5 for both
    assert out["g1"]["emd"] == pytest.approx(0.5)
    assert out["g2"]["emd"] == pytest.approx(0.5)
    assert not out["g1"]["t_close"]


def test_t_closeness_single_value_attribute(spark):
    df = spark.createDataFrame([("a", 7), ("b", 7)], "q string, v int")
    for r in t_closeness_report(df, "q", "v").collect():
        assert r["emd"] == 0.0 and r["t_close"]


# ----------------------------------------------------------------------- HITS


def test_hits_matches_power_iteration(spark):
    import numpy as np

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = {r["node"]: r for r in hits(df, iterations=3).collect()}

    nodes = sorted({x for e in edges for x in e})
    ix = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for s, d in edges:
        A[ix[s], ix[d]] = 1.0
    h = np.full(len(nodes), 1.0 / len(nodes))
    for _ in range(3):
        a = A.T @ h
        a = a / a.sum()
        h = A @ a
        h = h / h.sum()
    for n in nodes:
        assert out[n]["hub"] == pytest.approx(h[ix[n]], abs=1e-12)
        assert out[n]["authority"] == pytest.approx(a[ix[n]], abs=1e-12)


def test_hits_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iterations"):
        hits(df, iterations=0)


# ------------------------------------------------------------- OOF encoding


def test_target_encode_fold_excludes_own_fold(spark):
    # cat 'x': fold 0 rows y=[0,0], fold 1 rows y=[1,1]; m=0 smoothing
    rows = [("x", 0.0, 0), ("x", 0.0, 0), ("x", 1.0, 1), ("x", 1.0, 1)]
    df = spark.createDataFrame(rows, "c string, y double, f int")
    out = target_encode(df, "c", "y", smoothing=0.0, fold_col="f",
                        out_col="enc").collect()
    by_fold = {r["f"]: r["enc"] for r in out}
    assert by_fold[0] == pytest.approx(1.0)  # other fold's mean
    assert by_fold[1] == pytest.approx(0.0)


def test_target_encode_fold_unseen_in_other_folds_uses_prior(spark):
    # cat 'z' appears only in fold 0 -> n_eff = 0 -> prior
    rows = [("z", 1.0, 0), ("w", 0.0, 0), ("w", 0.0, 1)]
    df = spark.createDataFrame(rows, "c string, y double, f int")
    out = target_encode(df, "c", "y", smoothing=0.0, fold_col="f",
                        out_col="enc").collect()
    z = [r for r in out if r["c"] == "z"][0]
    assert z["enc"] == pytest.approx(1.0 / 3)  # global prior


def test_target_encode_loo_and_fold_exclusive(spark):
    df = spark.createDataFrame([("a", 1.0, 0)], "c string, y double, f int")
    with pytest.raises(ValueError, match="mutually"):
        target_encode(df, "c", "y", leave_one_out=True, fold_col="f")


# ------------------------------------------------------------- neg sampling


def _neg_fixture(spark):
    pos = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 12)], "q long, item long",
    )
    universe = spark.createDataFrame(
        [(i,) for i in range(10, 30)], "item long",
    )
    return pos, universe


def test_negative_sample_excludes_positives_and_caps_k(spark):
    pos, universe = _neg_fixture(spark)
    out = negative_sample(pos, universe, "q", "item", k=3, salt="t").collect()
    positives = {(1, 10), (1, 11), (2, 12)}
    for r in out:
        assert (r["q"], r["item"]) not in positives
    per_q = {}
    for r in out:
        per_q.setdefault(r["q"], []).append(r["draw_order"])
    for q, orders in per_q.items():
        assert sorted(orders) == list(range(len(orders)))
        assert len(orders) <= 3


def test_negative_sample_deterministic(spark):
    pos, universe = _neg_fixture(spark)
    a = sorted(map(tuple, negative_sample(
        pos, universe, "q", "item", k=3, salt="t").collect()))
    b = sorted(map(tuple, negative_sample(
        pos, universe, "q", "item", k=3, salt="t").collect()))
    assert a == b
    c = sorted(map(tuple, negative_sample(
        pos, universe, "q", "item", k=3, salt="other").collect()))
    assert a != c  # salt actually changes the draw


def test_negative_sample_validation(spark):
    pos, universe = _neg_fixture(spark)
    with pytest.raises(ValueError, match="k must"):
        negative_sample(pos, universe, "q", "item", k=0)
    with pytest.raises(ValueError, match="oversample"):
        negative_sample(pos, universe, "q", "item", k=5, oversample=2)
    empty = universe.where("item < 0")
    with pytest.raises(ValueError, match="empty"):
        negative_sample(pos, empty, "q", "item", k=1)


def test_graph_strategies_agree(spark):
    """The broadcast-vector and co-partitioned strategies are physical
    variants of the same algorithm — identical results required."""
    from woodwork_spark.operators.graph import pagerank

    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("d", "c"), ("c", "a"),
             ("b", "d"), ("d", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    for op, cols in ((hits, ("hub", "authority")), (pagerank, ("pagerank",))):
        bc = {r["node"]: r for r in
              op(df, iterations=3, broadcast_ranks=True).collect()}
        smj = {r["node"]: r for r in
               op(df, iterations=3, broadcast_ranks=False).collect()}
        assert set(bc) == set(smj)
        for node in bc:
            for c in cols:
                assert bc[node][c] == pytest.approx(smj[node][c], abs=1e-12)
