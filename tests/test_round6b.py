"""Round-6 batch 2: Fleiss' kappa, isotonic calibration, Brier
decomposition, threshold sweep, grouped AUC, classification report."""

import pytest
from pyspark.sql import functions as F

from woodwork_spark.operators.evaluation import (
    brier_decomposition,
    classification_report,
    fleiss_kappa,
    grouped_auc,
    isotonic_calibrate,
    roc_auc,
    threshold_sweep,
)


# -------------------------------------------------------------- fleiss kappa


def test_fleiss_kappa_perfect_agreement(spark):
    # every item rated twice, identically -> P_bar = 1
    rows = [(i, "a") for i in range(4) for _ in range(2)]
    df = spark.createDataFrame(rows, "item int, cat string")
    r = fleiss_kappa(df, "item", "cat").first()
    assert r["p_bar"] == pytest.approx(1.0)
    assert r["p_e"] == pytest.approx(1.0)
    assert r["kappa"] is None  # degenerate single category


def test_fleiss_kappa_golden_two_categories(spark):
    # 2 items x 2 raters: item 1 agrees (a,a), item 2 splits (a,b)
    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "item int, cat string")
    r = fleiss_kappa(df, "item", "cat").first()
    # P_1 = 1, P_2 = 0 -> p_bar = 0.5 ; p_a = 3/4, p_b = 1/4
    pe = (3 / 4) ** 2 + (1 / 4) ** 2
    assert r["n_items"] == 2 and r["n_ratings"] == 4
    assert r["p_bar"] == pytest.approx(0.5)
    assert r["p_e"] == pytest.approx(pe)
    assert r["kappa"] == pytest.approx((0.5 - pe) / (1 - pe))


def test_fleiss_kappa_single_rating_items_excluded_from_pbar(spark):
    rows = [(1, "a"), (1, "a"), (2, "b")]  # item 2 has one rating
    df = spark.createDataFrame(rows, "item int, cat string")
    r = fleiss_kappa(df, "item", "cat").first()
    assert r["n_items"] == 1          # only item 1 counts toward P_bar
    assert r["n_ratings"] == 3        # but all ratings count toward p_j


# ----------------------------------------------------------------- isotonic


def test_isotonic_pools_violators(spark):
    # bins 0,1,2 with rates 0.8, 0.2, 0.9 and n = 5 each:
    # PAV pools (0.8, 0.2) -> 0.5, then 0.5 <= 0.9 stands
    rows = (
        [(0.05, i < 4) for i in range(5)]
        + [(0.15, i < 1) for i in range(5)]
        + [(0.25, i < 4) for i in range(5)]
        + [(0.25, False)] * 0
    )
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = {r["bin"]: r for r in isotonic_calibrate(df, "score", "y").collect()}
    assert out[0]["raw_rate"] == pytest.approx(0.8)
    assert out[0]["iso_rate"] == pytest.approx(0.5)
    assert out[1]["iso_rate"] == pytest.approx(0.5)
    assert out[2]["iso_rate"] == pytest.approx(0.8)


def test_isotonic_monotone_and_preserves_counts(spark):
    import random

    rnd = random.Random(7)
    rows = [(rnd.random(), rnd.random() < 0.4) for _ in range(500)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    out = sorted(
        isotonic_calibrate(df, "score", "y").collect(), key=lambda r: r["bin"],
    )
    rates = [r["iso_rate"] for r in out]
    assert rates == sorted(rates)
    assert sum(r["n"] for r in out) == 500


def test_isotonic_empty_input(spark):
    df = spark.createDataFrame([], "score double, y boolean")
    assert isotonic_calibrate(df, "score", "y").count() == 0


# ------------------------------------------------------- brier decomposition


def test_brier_decomposition_identity_on_exact_bins(spark):
    # scores exactly at bin centers -> binning == exact conditioning,
    # so brier = rel - res + unc holds exactly
    rows = [(0.25, i < 1) for i in range(4)] + [(0.75, i < 3) for i in range(4)]
    df = spark.createDataFrame(rows, "score double, y boolean")
    r = brier_decomposition(df, "score", "y").first()
    assert r["brier"] == pytest.approx(
        r["reliability"] - r["resolution"] + r["uncertainty"],
    )
    # perfectly calibrated -> reliability 0
    assert r["reliability"] == pytest.approx(0.0)


# ------------------------------------------------------------ threshold sweep


def test_threshold_sweep_golden(spark):
    # scores: pos at 3, 4; neg at 1, 2.  fp=1, fn=1:
    # t=3 -> fp 0, fn 0, cost 0 (perfect separation)
    rows = [(1.0, False), (2.0, False), (3.0, True), (4.0, True)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = threshold_sweep(df, "s", "y").first()
    assert r["threshold"] == pytest.approx(3.0)
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (2, 0, 0, 2)
    assert r["cost"] == 0.0


def test_threshold_sweep_asymmetric_costs_shift_threshold(spark):
    # overlapping classes; huge fn cost drives threshold to the minimum
    rows = [(1.0, True), (2.0, False), (3.0, True), (4.0, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = threshold_sweep(df, "s", "y", fp_cost=1.0, fn_cost=100.0).first()
    assert r["threshold"] == pytest.approx(1.0)
    assert r["fn"] == 0


def test_threshold_sweep_tie_breaks_low(spark):
    # all negatives: every threshold has cost = fp_cost * fp; the
    # cheapest is the highest threshold (fp smallest)... but equal
    # costs happen with fp_cost=0 -> lowest threshold wins the tie
    rows = [(1.0, False), (2.0, False)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    r = threshold_sweep(df, "s", "y", fp_cost=0.0, fn_cost=1.0).first()
    assert r["threshold"] == pytest.approx(1.0)


# ---------------------------------------------------------------- grouped auc


def test_grouped_auc_matches_global_on_single_group(spark):
    import random

    rnd = random.Random(3)
    rows = [(1, rnd.random(), rnd.random() < 0.3) for _ in range(300)]
    df = spark.createDataFrame(rows, "g int, s double, y boolean")
    g = grouped_auc(df, "g", "s", "y").first()
    ref = roc_auc(df, "s", "y").first()
    assert g["auc"] == pytest.approx(ref["auc"], abs=1e-12)
    assert (g["n_pos"], g["n_neg"]) == (ref["n_pos"], ref["n_neg"])


def test_grouped_auc_single_class_group_is_null(spark):
    rows = [(1, 0.5, True), (1, 0.7, True), (2, 0.9, True), (2, 0.2, False)]
    df = spark.createDataFrame(rows, "g int, s double, y boolean")
    out = {r["g"]: r for r in grouped_auc(df, "g", "s", "y").collect()}
    assert out[1]["auc"] is None
    assert out[2]["auc"] == pytest.approx(1.0)


def test_grouped_auc_ties_handled(spark):
    # all scores equal -> AUC = 0.5 exactly
    rows = [(1, 1.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(rows, "g int, s double, y boolean")
    assert grouped_auc(df, "g", "s", "y").first()["auc"] == pytest.approx(0.5)


# ------------------------------------------------------ classification report


def test_classification_report_golden(spark):
    rows = (
        [("a", "a")] * 3 + [("a", "b")] * 1
        + [("b", "b")] * 2 + [("b", "c")] * 2
    )
    df = spark.createDataFrame(rows, "actual string, pred string")
    out = {r["label"]: r for r in
           classification_report(df, "actual", "pred").collect()}
    assert out["a"]["support"] == 4 and out["a"]["tp"] == 3
    assert out["a"]["precision"] == pytest.approx(1.0)
    assert out["a"]["recall"] == pytest.approx(0.75)
    assert out["b"]["precision"] == pytest.approx(2 / 3)
    # class 'c' never true: support 0, recall null, precision 0
    assert out["c"]["support"] == 0
    assert out["c"]["recall"] is None
    assert out["c"]["precision"] == pytest.approx(0.0)
    assert out["c"]["f1"] is None
