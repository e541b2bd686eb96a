"""Round-6 batch 4: diff-in-diff, exact-matching ATT, Qini uplift,
RMST, Heaps-law fit."""

import math

import pytest
from pyspark.sql import functions as F

from woodwork_spark.operators.causal import diff_in_diff, exact_match_att
from woodwork_spark.operators.evaluation import qini_uplift
from woodwork_spark.operators.text import heaps_fit
from woodwork_spark.operators.timeseries import rmst


# --------------------------------------------------------------- diff in diff


def test_did_golden(spark):
    # treat: pre mean 10, post mean 15 (+5); ctrl: pre 1, post 2 (+1)
    rows = (
        [(True, False, 10.0 + d) for d in (-1.0, 1.0)]
        + [(True, True, 15.0 + d) for d in (-1.0, 1.0)]
        + [(False, False, 1.0 + d) for d in (-1.0, 1.0)]
        + [(False, True, 2.0 + d) for d in (-1.0, 1.0)]
    )
    df = spark.createDataFrame(rows, "t boolean, p boolean, y double")
    r = diff_in_diff(df, "t", "p", "y").first()
    assert r["n"] == 8
    assert r["did"] == pytest.approx(4.0)
    # each cell: var = 2, n = 2 -> se = sqrt(4 * 1) = 2
    assert r["se"] == pytest.approx(2.0)
    assert r["ci_lo"] == pytest.approx(4.0 - 1.96 * 2.0)


def test_did_empty_cell_is_null(spark):
    rows = [(True, True, 1.0), (False, True, 2.0), (False, False, 3.0)]
    df = spark.createDataFrame(rows, "t boolean, p boolean, y double")
    r = diff_in_diff(df, "t", "p", "y").first()
    assert r["did"] is None  # no treat/pre cell


# ----------------------------------------------------------------- exact ATT


def test_att_golden(spark):
    # cell A: treated mean 10, control mean 7 (effect 3, 2 treated)
    # cell B: treated mean 5, control mean 5 (effect 0, 1 treated)
    # cell C: treated only (unmatched)
    rows = [
        ("A", True, 9.0), ("A", True, 11.0), ("A", False, 7.0),
        ("B", True, 5.0), ("B", False, 4.0), ("B", False, 6.0),
        ("C", True, 100.0),
    ]
    df = spark.createDataFrame(rows, "cell string, t boolean, y double")
    r = exact_match_att(df, "t", "y", "cell").first()
    assert r["n_treated"] == 4
    assert r["n_matched_treated"] == 3
    assert r["matched_fraction"] == pytest.approx(0.75)
    assert r["att"] == pytest.approx((2 * 3.0 + 1 * 0.0) / 3)
    assert (r["n_cells"], r["n_matched_cells"]) == (3, 2)


def test_att_nothing_matched_is_null(spark):
    rows = [("A", True, 1.0), ("B", False, 2.0)]
    df = spark.createDataFrame(rows, "cell string, t boolean, y double")
    r = exact_match_att(df, "t", "y", "cell").first()
    assert r["att"] is None and r["n_matched_treated"] == 0


def test_att_null_covariate_is_a_stratum(spark):
    rows = [(None, True, 10.0), (None, False, 4.0)]
    df = spark.createDataFrame(rows, "cell string, t boolean, y double")
    r = exact_match_att(df, "t", "y", "cell").first()
    assert r["att"] == pytest.approx(6.0)
    assert r["matched_fraction"] == pytest.approx(1.0)


# ----------------------------------------------------------------------- qini


def test_qini_perfect_targeting(spark):
    # top bucket: treated all respond, control never; bottom: nobody
    rows = []
    for i in range(10):
        rows.append((1.0, True, True, i))        # high score treated resp
        rows.append((1.0, False, False, 100 + i))
        rows.append((0.0, True, False, 200 + i))
        rows.append((0.0, False, False, 300 + i))
    df = spark.createDataFrame(rows, "s double, t boolean, y boolean, id long")
    out = sorted(
        qini_uplift(df, "s", "t", "y", n_buckets=2, tiebreak="id").collect(),
        key=lambda r: r["bucket"],
    )
    assert out[0]["uplift"] == pytest.approx(1.0)
    assert out[0]["qini"] == pytest.approx(10.0)   # 10 incremental responders
    assert out[1]["uplift"] == pytest.approx(0.0)
    assert out[1]["qini"] == pytest.approx(10.0)   # flat tail


def test_qini_missing_arm_is_null(spark):
    rows = [(1.0, True, True, 1), (0.0, True, False, 2)]
    df = spark.createDataFrame(rows, "s double, t boolean, y boolean, id long")
    out = qini_uplift(df, "s", "t", "y", n_buckets=2, tiebreak="id").collect()
    assert all(r["uplift"] is None and r["qini"] is None for r in out)


# ----------------------------------------------------------------------- rmst


def test_rmst_golden_no_censoring(spark):
    # events at t=2 (1 of 4) and t=6 (1 of 3 remaining), horizon 10:
    # S=1 on [0,2) -> 2; S=0.75 on [2,6) -> 3; S=0.75*2/3=0.5 on [6,10) -> 2
    rows = [(2.0, 1), (6.0, 1), (12.0, 0), (15.0, 0)]
    df = spark.createDataFrame(rows, "d double, e int")
    r = rmst(df, "d", "e", horizon=10.0).first()
    assert r["rmst"] == pytest.approx(2.0 + 0.75 * 4 + 0.5 * 4)
    assert r["n_times"] == 2


def test_rmst_horizon_before_first_event(spark):
    rows = [(5.0, 1), (9.0, 1)]
    df = spark.createDataFrame(rows, "d double, e int")
    r = rmst(df, "d", "e", horizon=3.0).first()
    assert r["rmst"] == pytest.approx(3.0)  # S=1 for the whole window


def test_rmst_validation(spark):
    df = spark.createDataFrame([(1.0, 1)], "d double, e int")
    with pytest.raises(ValueError, match="horizon"):
        rmst(df, "d", "e", horizon=0.0)


# ---------------------------------------------------------------------- heaps


def test_heaps_counts_exact(spark):
    rows = [
        (1, "a b c"),       # N=3, V=3
        (2, "a b d"),       # N=6, V=4
        (3, "a a a"),       # N=9, V=4
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = heaps_fit(df, "doc_id", "text").first()
    assert r["n_docs"] == 3
    assert r["total_tokens"] == 9
    assert r["vocab"] == 4
    # closed-form check of the log-log OLS on the 3 points
    pts = [(3, 3), (6, 4), (9, 4)]
    xs = [math.log(n) for n, _ in pts]
    ys = [math.log(v) for _, v in pts]
    m = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta = (sxy - sx * sy / m) / (sxx - sx * sx / m)
    assert r["beta"] == pytest.approx(beta)
    assert r["k"] == pytest.approx(math.exp(sy / m - beta * sx / m))


def test_heaps_single_doc_null_fit(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    r = heaps_fit(df, "doc_id", "text").first()
    assert r["beta"] is None
    assert r["vocab"] == 2
