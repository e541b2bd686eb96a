"""Round-9 (continuation): classical-test battery — goldens against
independent numpy/math reference implementations (no scipy in the
container; these reimplement the textbook formulas from scratch, NOT the
operator's column algebra, so a shared bug can't self-confirm)."""

import math

import numpy as np
import pytest
import pyspark.sql.functions as F

from woodwork_spark.operators.stats_tests import (
    breusch_pagan,
    cochran_armitage,
    durbin_watson,
    fisher_exact_2x2,
    jarque_bera,
    ljung_box,
)


def _hypergeom_pmf(k, n, r1, c1):
    lg = math.lgamma
    return math.exp(
        lg(r1 + 1) + lg(n - r1 + 1) + lg(c1 + 1) + lg(n - c1 + 1)
        - lg(n + 1) - lg(k + 1) - lg(r1 - k + 1) - lg(c1 - k + 1)
        - lg(n - r1 - c1 + k + 1)
    )


class TestFisherExact:
    def test_matches_enumeration(self, spark):
        rows = [(i % 3 == 0, i % 5 == 0) for i in range(200)]
        df = spark.createDataFrame(rows, ["r", "c"])
        out = fisher_exact_2x2(df, F.col("r"), F.col("c")).collect()[0]
        a = sum(1 for r, c in rows if r and c)
        b = sum(1 for r, c in rows if r and not c)
        cc = sum(1 for r, c in rows if not r and c)
        d = sum(1 for r, c in rows if not r and not c)
        n, r1, c1 = a + b + cc + d, a + b, a + cc
        assert (out["a"], out["b"], out["c"], out["d"]) == (a, b, cc, d)
        pmf_obs = _hypergeom_pmf(a, n, r1, c1)
        p1 = sum(
            _hypergeom_pmf(k, n, r1, c1)
            for k in range(a, min(r1, c1) + 1)
        )
        p2 = sum(
            _hypergeom_pmf(k, n, r1, c1)
            for k in range(max(0, r1 + c1 - n), min(r1, c1) + 1)
            if _hypergeom_pmf(k, n, r1, c1) <= pmf_obs * (1 + 1e-7)
        )
        assert out["p_one_sided"] == pytest.approx(p1, abs=1e-6)
        assert out["p_two_sided"] == pytest.approx(p2, abs=1e-6)

    def test_independent_table_p_near_one(self, spark):
        # perfectly proportional table -> observed k is the mode
        rows = (
            [(True, True)] * 20 + [(True, False)] * 40
            + [(False, True)] * 10 + [(False, False)] * 20
        )
        df = spark.createDataFrame(rows, ["r", "c"])
        out = fisher_exact_2x2(df, F.col("r"), F.col("c")).collect()[0]
        assert out["p_two_sided"] > 0.8
        assert out["odds_ratio"] == pytest.approx(1.0, abs=1e-9)


class TestJarqueBera:
    def test_matches_numpy(self, spark):
        rng = np.random.RandomState(7)
        vals = rng.exponential(1000.0, 500) + 50000.0  # skewed, big offset
        df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
        out = jarque_bera(df, "x").collect()[0]
        mu = vals.mean()
        m2 = ((vals - mu) ** 2).mean()
        m3 = ((vals - mu) ** 3).mean()
        m4 = ((vals - mu) ** 4).mean()
        g1, g2 = m3 / m2 ** 1.5, m4 / m2 ** 2 - 3
        jb = 500 / 6 * (g1 ** 2 + g2 ** 2 / 4)
        assert out["skewness"] == pytest.approx(g1, rel=1e-9)
        assert out["kurtosis_excess"] == pytest.approx(g2, rel=1e-9)
        assert out["jb_stat"] == pytest.approx(jb, rel=1e-9)
        assert out["p_value"] == pytest.approx(math.exp(-jb / 2), abs=1e-12)

    def test_normalish_data_not_rejected(self, spark):
        rng = np.random.RandomState(3)
        vals = rng.normal(0, 1, 400)
        df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
        out = jarque_bera(df, "x").collect()[0]
        assert out["p_value"] > 0.01

    def test_small_group_nulls(self, spark):
        df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], ["x"])
        out = jarque_bera(df, "x").collect()[0]
        assert out["jb_stat"] is None and out["p_value"] is None


class TestLjungBox:
    @staticmethod
    def _reference(y, h):
        y = np.asarray(y, dtype=float)
        n = len(y)
        mu = y.mean()
        den = ((y - mu) ** 2).sum()
        lb = 0.0
        for k in range(1, h + 1):
            r = ((y[k:] - mu) * (y[:-k] - mu)).sum() / den
            lb += r * r / (n - k)
        lb *= n * (n + 2)
        half = lb / 2
        surv = math.exp(-half) * sum(
            half ** j / math.factorial(j) for j in range(h // 2)
        )
        return lb, surv

    def test_matches_reference(self, spark):
        rng = np.random.RandomState(11)
        # AR(1)-ish series: strong autocorrelation -> tiny p
        y = [0.0]
        for _ in range(199):
            y.append(0.8 * y[-1] + rng.normal())
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(y)], ["t", "y"])
        out = ljung_box(df, "t", "y", max_lag=4).collect()[0]
        lb, p = self._reference(y, 4)
        assert out["lb_stat"] == pytest.approx(lb, rel=1e-9)
        assert out["p_value"] == pytest.approx(p, abs=1e-12)
        assert out["p_value"] < 1e-6

    def test_white_noise_large_p(self, spark):
        rng = np.random.RandomState(5)
        y = rng.normal(size=300)
        df = spark.createDataFrame(
            [(i, float(v)) for i, v in enumerate(y)], ["t", "y"])
        out = ljung_box(df, "t", "y", max_lag=6).collect()[0]
        assert out["p_value"] > 0.05

    def test_odd_lag_rejected(self, spark):
        df = spark.createDataFrame([(1, 1.0)], ["t", "y"])
        with pytest.raises(ValueError, match="even"):
            ljung_box(df, "t", "y", max_lag=5)


class TestDurbinWatson:
    def test_matches_reference(self, spark):
        rng = np.random.RandomState(13)
        x = np.arange(150.0)
        e = np.zeros(150)
        for i in range(1, 150):
            e[i] = 0.7 * e[i - 1] + rng.normal()
        y = 3.0 + 0.5 * x + e
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = durbin_watson(df, "y", "x", "x").collect()[0]
        sl = np.cov(x, y, bias=True)[0, 1] / x.var()
        ic = y.mean() - sl * x.mean()
        r = y - ic - sl * x
        dw = ((r[1:] - r[:-1]) ** 2).sum() / (r ** 2).sum()
        assert out["slope"] == pytest.approx(sl, rel=1e-9)
        assert out["intercept"] == pytest.approx(ic, rel=1e-9)
        assert out["dw_stat"] == pytest.approx(dw, rel=1e-9)
        assert out["dw_stat"] < 1.5  # positive autocorrelation

    def test_independent_residuals_near_two(self, spark):
        rng = np.random.RandomState(17)
        x = np.arange(400.0)
        y = 1.0 + 2.0 * x + rng.normal(size=400)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = durbin_watson(df, "y", "x", "x").collect()[0]
        assert 1.7 < out["dw_stat"] < 2.3


class TestCochranArmitage:
    def test_matches_reference(self, spark):
        rng = np.random.RandomState(19)
        rows = []
        for s in range(5):
            p = 0.1 + 0.12 * s  # strong positive trend
            for _ in range(200):
                rows.append((float(s), bool(rng.rand() < p)))
        df = spark.createDataFrame(rows, ["s", "y"])
        out = cochran_armitage(
            df, "s", F.col("y").cast("double")).collect()[0]
        s = np.array([r[0] for r in rows])
        y = np.array([1.0 if r[1] else 0.0 for r in rows])
        n = len(s)
        p = y.mean()
        t = (s * y).sum()
        var = p * (1 - p) * ((s * s).sum() - s.sum() ** 2 / n)
        z = (t - p * s.sum()) / math.sqrt(var)
        assert out["z_stat"] == pytest.approx(z, rel=1e-9)
        assert out["p_approx"] < 1e-6
        assert out["n_success"] == int(y.sum())

    def test_no_trend_large_p(self, spark):
        rng = np.random.RandomState(23)
        rows = [
            (float(s), bool(rng.rand() < 0.3))
            for s in range(5) for _ in range(300)
        ]
        df = spark.createDataFrame(rows, ["s", "y"])
        out = cochran_armitage(
            df, "s", F.col("y").cast("double")).collect()[0]
        assert out["p_approx"] > 0.01


class TestBreuschPagan:
    @staticmethod
    def _reference(x, y):
        n = len(x)
        sl = np.cov(x, y, bias=True)[0, 1] / x.var()
        ic = y.mean() - sl * x.mean()
        u = (y - ic - sl * x) ** 2
        sxu = ((x - x.mean()) * u).sum()
        suu = ((u - u.mean()) ** 2).sum()
        sxx = ((x - x.mean()) ** 2).sum()
        return n * (sxu ** 2 / (sxx * suu))

    def test_heteroscedastic_detected(self, spark):
        rng = np.random.RandomState(29)
        x = np.linspace(1, 10, 500)
        y = 2.0 + 3.0 * x + rng.normal(size=500) * x  # sd grows with x
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = breusch_pagan(df, "y", "x").collect()[0]
        bp = self._reference(x, y)
        assert out["bp_stat"] == pytest.approx(bp, rel=1e-6)
        assert out["p_approx"] < 0.01

    def test_homoscedastic_not_detected(self, spark):
        rng = np.random.RandomState(31)
        x = np.linspace(1, 10, 500)
        y = 2.0 + 3.0 * x + rng.normal(size=500)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = breusch_pagan(df, "y", "x").collect()[0]
        assert out["p_approx"] > 0.01


def test_log_factorial_accuracy():
    # the engine-portable helper vs math.lgamma on both branches
    from pyspark.sql import SparkSession

    from woodwork_spark.operators.stats_tests import _log_factorial
    spark = SparkSession.getActiveSession()
    df = spark.range(0, 2000).select(
        F.col("id"), _log_factorial(F.col("id")).alias("lf"))
    got = {r["id"]: r["lf"] for r in df.collect()}
    for n in list(range(0, 25)) + [50, 100, 500, 1999]:
        ref = math.lgamma(n + 1)
        assert got[n] == pytest.approx(ref, abs=5e-10), n
