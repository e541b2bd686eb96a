"""Round-6 batch 5: CUPED, SRM check, MDE, cluster agreement,
simplified silhouette."""

import math

import pytest
from pyspark.sql import functions as F

from woodwork_spark.operators.causal import (
    cuped_adjusted_effect,
    mde,
    srm_check,
)
from woodwork_spark.operators.similarity import (
    cluster_agreement,
    silhouette_simplified,
)


# ---------------------------------------------------------------------- CUPED


def test_cuped_perfect_covariate_kills_variance(spark):
    # y = x exactly -> theta = 1, adjusted variance 0, effect preserved
    import random

    rnd = random.Random(5)
    rows = [(i % 2 == 0, v, v) for i, v in
            ((i, rnd.gauss(10, 3)) for i in range(200))]
    df = spark.createDataFrame(rows, "t boolean, y double, x double")
    r = cuped_adjusted_effect(df, "t", "y", "x").first()
    assert r["theta"] == pytest.approx(1.0)
    assert r["se_cuped"] == pytest.approx(0.0, abs=1e-9)
    assert r["var_reduction"] == pytest.approx(1.0, abs=1e-9)
    assert r["effect_cuped"] == pytest.approx(0.0, abs=1e-9)


def test_cuped_useless_covariate_changes_nothing(spark):
    rows = [
        (True, 10.0, 1.0), (True, 12.0, 1.0),
        (False, 5.0, 1.0), (False, 7.0, 1.0),
    ]
    df = spark.createDataFrame(rows, "t boolean, y double, x double")
    r = cuped_adjusted_effect(df, "t", "y", "x").first()
    assert r["theta"] is None  # zero covariate variance
    # raw effect still reported
    assert r["effect_raw"] == pytest.approx(5.0)


# ------------------------------------------------------------------------ SRM


def test_srm_balanced_is_small(spark):
    rows = [(chr(ord("a") + i % 2),) for i in range(100)]
    df = spark.createDataFrame(rows, "arm string")
    r = srm_check(df, "arm", {"a": 1, "b": 1}).first()
    assert r["chi2"] == pytest.approx(0.0)
    assert (r["n"], r["n_arms"], r["dof"]) == (100, 2, 1)


def test_srm_golden_chi2(spark):
    rows = [("a",)] * 60 + [("b",)] * 40
    df = spark.createDataFrame(rows, "arm string")
    r = srm_check(df, "arm", {"a": 1, "b": 1}).first()
    assert r["chi2"] == pytest.approx((60 - 50) ** 2 / 50 + (40 - 50) ** 2 / 50)


def test_srm_unexpected_arm_surfaces_as_count(spark):
    """Arms outside the design no longer raise at BUILD time (the
    operator stays lazy); they surface as n_unknown > 0 at action time,
    excluded from n/chi2 — same convention as srm_monitor_stream."""
    df = spark.createDataFrame([("a",), ("zzz",)], "arm string")
    r = srm_check(df, "arm", {"a": 1, "b": 1}).first()
    assert r["n_unknown"] == 1
    assert r["n"] == 1  # designed arms only
    # balanced design, one 'a' observed, none 'b': chi2 = .5 + .5
    assert r["chi2"] == pytest.approx((1 - 0.5) ** 2 / 0.5 + 0.5)


def test_srm_unobserved_arm_contributes_expectation(spark):
    df = spark.createDataFrame([("a",)] * 30, "arm string")
    r = srm_check(df, "arm", {"a": 1, "b": 1}).first()
    # expected 15/15, observed 30/0 -> chi2 = 225/15 + 225/15 = 30
    assert r["chi2"] == pytest.approx(30.0)
    assert r["n_arms"] == 2


def test_srm_validation(spark):
    df = spark.createDataFrame([("a",)], "arm string")
    with pytest.raises(ValueError, match="required"):
        srm_check(df, "arm", {})


# ------------------------------------------------------------------------ MDE


def test_mde_golden(spark):
    # two arms with known variance
    rows = [(True, v) for v in (8.0, 12.0)] + [(False, v) for v in (4.0, 6.0)]
    df = spark.createDataFrame(rows, "t boolean, y double")
    r = mde(df, "t", "y").first()
    var_t, var_c = 8.0, 2.0
    expected = (1.959964 + 0.841621) * math.sqrt(var_t / 2 + var_c / 2)
    assert r["mde_abs"] == pytest.approx(expected)
    assert r["mean_ctrl"] == pytest.approx(5.0)
    assert r["mde_rel"] == pytest.approx(expected / 5.0)


# ---------------------------------------------------------- cluster agreement


def test_cluster_agreement_perfect(spark):
    rows = [(i % 3, f"L{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "cluster int, label string")
    r = cluster_agreement(df, "cluster", "label").first()
    assert r["purity"] == pytest.approx(1.0)
    assert r["nmi"] == pytest.approx(1.0)
    assert r["ari"] == pytest.approx(1.0)


def test_cluster_agreement_matches_sklearn_formulas(spark):
    # contingency [[5, 1], [2, 4]]
    rows = (
        [(0, "x")] * 5 + [(0, "y")] * 1 + [(1, "x")] * 2 + [(1, "y")] * 4
    )
    df = spark.createDataFrame(rows, "cluster int, label string")
    r = cluster_agreement(df, "cluster", "label").first()
    n = 12.0
    # purity: dominant labels 5 + 4
    assert r["purity"] == pytest.approx(9 / 12)
    # hand ARI
    comb = lambda x: x * (x - 1) / 2.0  # noqa: E731
    sp = comb(5) + comb(1) + comb(2) + comb(4)
    ap = comb(6) + comb(6)
    bp = comb(7) + comb(5)
    tp = comb(12)
    exp = ap * bp / tp
    assert r["ari"] == pytest.approx((sp - exp) / ((ap + bp) / 2 - exp))
    # hand NMI (natural log, 2I/(Hc+Hl))
    cells = {(0, "x"): 5, (0, "y"): 1, (1, "x"): 2, (1, "y"): 4}
    a = {0: 6, 1: 6}
    b = {"x": 7, "y": 5}
    mi = sum(
        (v / n) * math.log(v * n / (a[c] * b[l]))
        for (c, l), v in cells.items()
    )
    hc = -sum((v / n) * math.log(v / n) for v in a.values())
    hl = -sum((v / n) * math.log(v / n) for v in b.values())
    assert r["nmi"] == pytest.approx(2 * mi / (hc + hl))


def test_cluster_agreement_single_cluster_degenerate(spark):
    rows = [(1, "x")] * 3 + [(1, "y")] * 3
    df = spark.createDataFrame(rows, "cluster int, label string")
    r = cluster_agreement(df, "cluster", "label").first()
    assert r["purity"] == pytest.approx(0.5)
    assert r["nmi"] == pytest.approx(0.0)  # MI = 0, entropies > 0


# ----------------------------------------------------------------- silhouette


def test_silhouette_well_separated(spark):
    rows = (
        [(i, [0.0 + i * 0.01, 0.0]) for i in range(5)]
        + [(10 + i, [10.0 + i * 0.01, 0.0]) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "id long, v array<double>")
    cents = [(0, [0.0, 0.0]), (1, [10.0, 0.0])]
    out = {r["cluster"]: r for r in
           silhouette_simplified(df, "id", "v", cents).collect()}
    assert out[0]["n"] == 5 and out[1]["n"] == 5
    assert out[0]["mean_silhouette"] > 0.99
    assert out[1]["mean_silhouette"] > 0.99


def test_silhouette_point_on_centroid_boundary(spark):
    df = spark.createDataFrame([(1, [5.0])], "id long, v array<double>")
    cents = [(0, [0.0]), (1, [10.0])]
    r = silhouette_simplified(df, "id", "v", cents).first()
    assert r["mean_silhouette"] == pytest.approx(0.0)  # equidistant
    assert r["cluster"] == 0  # tie -> lowest centroid id


def test_silhouette_validation(spark):
    df = spark.createDataFrame([(1, [0.0])], "id long, v array<double>")
    with pytest.raises(ValueError, match=">= 2 centroids"):
        silhouette_simplified(df, "id", "v", [(0, [0.0])])


# ------------------------------------------------------------- batch 6: causal


def test_oaxaca_identity_sums_to_mean_change(spark):
    from woodwork_spark.operators.causal import oaxaca_decomposition

    rows = (
        [(False, "a", 10.0)] * 6 + [(False, "b", 20.0)] * 4
        + [(True, "a", 12.0)] * 3 + [(True, "b", 22.0)] * 7
    )
    df = spark.createDataFrame(rows, "p boolean, seg string, y double")
    out = oaxaca_decomposition(df, "p", "seg", "y").collect()
    total = sum(
        r["rate_effect"] + r["mix_effect"] + r["interaction"] for r in out
    )
    mean0 = (6 * 10 + 4 * 20) / 10
    mean1 = (3 * 12 + 7 * 22) / 10
    assert total == pytest.approx(mean1 - mean0)


def test_oaxaca_segment_missing_in_one_period(spark):
    from woodwork_spark.operators.causal import oaxaca_decomposition

    rows = [(False, "a", 10.0)] * 5 + [(True, "a", 10.0)] * 5 \
        + [(True, "new", 30.0)] * 5
    df = spark.createDataFrame(rows, "p boolean, seg string, y double")
    out = {r["segment"]: r for r in
           oaxaca_decomposition(df, "p", "seg", "y").collect()}
    new = out["new"]
    assert new["w0"] == 0.0 and new["rate_effect"] == pytest.approx(0.0)
    # the whole contribution of the new segment lands in the mix term
    assert new["mix_effect"] == pytest.approx(30.0 * 0.5)
    total = sum(
        r["rate_effect"] + r["mix_effect"] + r["interaction"]
        for r in out.values()
    )
    assert total == pytest.approx(20.0 - 10.0)


def test_ipw_ate_equals_stratified_effect(spark):
    from woodwork_spark.operators.causal import ipw_ate

    # stratum A (4 rows): effect 2; stratum B (8 rows): effect 5
    rows = (
        [("A", True, 12.0), ("A", True, 12.0), ("A", False, 10.0),
         ("A", False, 10.0)]
        + [("B", True, 15.0)] * 4 + [("B", False, 10.0)] * 4
    )
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    r = ipw_ate(df, "t", "y", "s").first()
    assert r["ate"] == pytest.approx((4 * 2.0 + 8 * 5.0) / 12)
    assert r["excluded_fraction"] == pytest.approx(0.0)


def test_ipw_ate_excludes_single_arm_strata(spark):
    from woodwork_spark.operators.causal import ipw_ate

    rows = [("A", True, 5.0), ("A", False, 3.0), ("C", True, 99.0)]
    df = spark.createDataFrame(rows, "s string, t boolean, y double")
    r = ipw_ate(df, "t", "y", "s").first()
    assert r["ate"] == pytest.approx(2.0)
    assert r["n_used"] == 2
    assert r["excluded_fraction"] == pytest.approx(1 / 3)


def test_rdd_recovers_planted_jump(spark):
    from woodwork_spark.operators.causal import regression_discontinuity

    # y = 2 + 0.1 x below 0; y = 7 + 0.3 x at or above 0 (jump = 5)
    rows = [(float(x), 2.0 + 0.1 * x) for x in range(-50, 0)]
    rows += [(float(x), 7.0 + 0.3 * x) for x in range(0, 50)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = regression_discontinuity(df, "x", "y", cutoff=0.0,
                                 bandwidth=100.0).first()
    assert r["effect"] == pytest.approx(5.0, abs=1e-9)
    assert r["slope_left"] == pytest.approx(0.1, abs=1e-9)
    assert r["slope_right"] == pytest.approx(0.3, abs=1e-9)


def test_rdd_bandwidth_filters_and_validates(spark):
    from woodwork_spark.operators.causal import regression_discontinuity

    rows = [(float(x), float(x)) for x in (-500, -1, 1, 500)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = regression_discontinuity(df, "x", "y", cutoff=0.0,
                                 bandwidth=10.0).first()
    assert (r["n_left"], r["n_right"]) == (1, 1)
    assert r["slope_left"] is None  # < 2 points on a side
    with pytest.raises(ValueError, match="bandwidth"):
        regression_discontinuity(df, "x", "y", cutoff=0.0, bandwidth=0.0)


# ------------------------------------------------- second review-pass fixes


def test_att_all_controls_no_crash(spark):
    from woodwork_spark.operators.causal import exact_match_att

    df = spark.createDataFrame(
        [("A", False, 1.0), ("B", False, 2.0)],
        "cell string, t boolean, y double",
    )
    r = exact_match_att(df, "t", "y", "cell").first()
    assert r["n_treated"] == 0
    assert r["matched_fraction"] is None and r["att"] is None


def test_oaxaca_one_empty_period_no_crash(spark):
    from woodwork_spark.operators.causal import oaxaca_decomposition

    df = spark.createDataFrame(
        [(True, "a", 1.0), (True, "b", 2.0)],
        "p boolean, seg string, y double",
    )
    out = {r["segment"]: r for r in
           oaxaca_decomposition(df, "p", "seg", "y").collect()}
    assert out["a"]["w0"] == 0.0 and out["a"]["w1"] == pytest.approx(0.5)


def test_srm_zero_ratio_arm_rejected(spark):
    from woodwork_spark.operators.causal import srm_check

    df = spark.createDataFrame([("a",), ("b",)], "arm string")
    with pytest.raises(ValueError, match="must be > 0"):
        srm_check(df, "arm", {"a": 1.0, "b": 0.0})


def test_heaps_empty_docs_contribute_no_tokens(spark):
    from woodwork_spark.operators.text import heaps_fit

    rows = [(1, "a b"), (2, "   "), (3, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_fit(df, "doc_id", "text").first()
    assert r["n_docs"] == 3          # empty docs still advance the axis
    assert r["total_tokens"] == 2    # no phantom '' tokens
    assert r["vocab"] == 2


# ------------------------------------------------------------------ batch 7


def test_qte_detects_tail_only_shift(spark):
    from woodwork_spark.operators.causal import quantile_treatment_effects

    # control: 1..100; treated: same but top decile doubled
    rows = [(False, float(i)) for i in range(1, 101)]
    rows += [(True, float(i) if i <= 90 else float(i) * 2)
             for i in range(1, 101)]
    df = spark.createDataFrame(rows, "t boolean, y double")
    out = {r["q"]: r for r in quantile_treatment_effects(
        df, "t", "y", quantiles=(0.5, 0.95)).collect()}
    assert out[0.5]["qte"] == pytest.approx(0.0)     # median untouched
    assert out[0.95]["qte"] == pytest.approx(95.0)   # 95th: 190 vs 95
    assert out[0.5]["n_treat"] == 100


def test_srm_monitor_stream_matches_batch(spark):
    import os
    import uuid

    from woodwork_spark.streaming import read_event_stream
    from woodwork_spark.streaming.events import srm_monitor_stream

    sf = "/root/testdata/sf0.001"
    stream = read_event_stream(
        spark, os.path.join(sf, "events.parquet"),
    ).withColumn(
        "arm",
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b"),
    )
    mon = srm_monitor_stream(stream, "arm", {"a": 1, "b": 1},
                             window="1 day")
    name = f"t_srm_{uuid.uuid4().hex[:8]}"
    q = (mon.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["window_start"]: r for r in spark.sql(
        f"SELECT * FROM {name}").collect()}

    from woodwork_spark.io import read_parquet

    ev = read_parquet(spark, os.path.join(sf, "events.parquet"))
    batch = ev.groupBy(F.window("ts", "1 day").alias("w")).agg(
        F.sum(F.when(F.col("user_id") % 2 == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("user_id") % 2 != 0, 1).otherwise(0)).alias("nb"),
    ).collect()
    assert got
    for r in batch:
        g = got[r["w"]["start"]]
        assert g["n"] == r["na"] + r["nb"]
        e = (r["na"] + r["nb"]) / 2.0
        expect = (r["na"] - e) ** 2 / e + (r["nb"] - e) ** 2 / e
        assert g["chi2"] == pytest.approx(expect)
        assert g["n_unknown"] == 0


def test_srm_monitor_stream_counts_unknown_arms(spark):
    from woodwork_spark.streaming.events import srm_monitor_stream

    with pytest.raises(ValueError, match="must be > 0"):
        srm_monitor_stream(None, "arm", {"a": 0.0})
    with pytest.raises(ValueError, match="required"):
        srm_monitor_stream(None, "arm", {})
