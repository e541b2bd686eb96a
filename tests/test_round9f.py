"""Round-9 (continuation): one-covariate GLMs (logistic / Poisson) via
unrolled distributed Newton — goldens against an independent numpy
Newton and planted-coefficient recovery."""

import math

import numpy as np
import pytest

from woodwork_spark.operators.regression import logistic_fit, poisson_fit


def _newton_ref(x, y, family, iters=25):
    b0 = b1 = 0.0
    for _ in range(iters):
        eta = b0 + b1 * x
        if family == "logistic":
            eta = np.clip(eta, -30, 30)
            mu = 1 / (1 + np.exp(-eta))
            w = mu * (1 - mu)
        else:
            mu = np.exp(eta)
            w = mu
        u0, u1 = (y - mu).sum(), (x * (y - mu)).sum()
        i00, i01, i11 = w.sum(), (x * w).sum(), (x * x * w).sum()
        det = i00 * i11 - i01 * i01
        b0 += (i11 * u0 - i01 * u1) / det
        b1 += (i00 * u1 - i01 * u0) / det
    return b0, b1, math.sqrt(i00 / det)


class TestLogistic:
    def test_recovers_planted_coefficients(self, spark):
        rng = np.random.RandomState(1)
        n = 800
        x = rng.normal(size=n)
        p = 1 / (1 + np.exp(-(-0.5 + 1.2 * x)))
        y = (rng.rand(n) < p).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, x)], ["y", "x"])
        out = logistic_fit(df, "y", "x", iters=8).collect()[0]
        b0, b1, se = _newton_ref(x, y, "logistic")
        assert out["intercept"] == pytest.approx(b0, abs=1e-8)
        assert out["slope"] == pytest.approx(b1, abs=1e-8)
        assert out["se_slope"] == pytest.approx(se, rel=1e-6)
        assert 0.9 < out["slope"] < 1.5  # planted 1.2
        assert out["p_approx"] < 1e-6

    def test_null_slope_not_significant(self, spark):
        rng = np.random.RandomState(2)
        n = 600
        x = rng.normal(size=n)
        y = (rng.rand(n) < 0.4).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, x)], ["y", "x"])
        out = logistic_fit(df, "y", "x").collect()[0]
        assert out["p_approx"] > 0.01

    def test_separation_stays_finite(self, spark):
        # perfectly separable data: the eta clamp must keep everything
        # finite instead of NaN
        rows = [(1.0, float(v)) for v in range(1, 20)] + [
            (0.0, float(-v)) for v in range(1, 20)]
        df = spark.createDataFrame(rows, ["y", "x"])
        out = logistic_fit(df, "y", "x", iters=6).collect()[0]
        assert out["slope"] is not None
        assert not math.isnan(out["slope"])
        assert out["slope"] > 0

    def test_loglik_matches(self, spark):
        rng = np.random.RandomState(4)
        n = 300
        x = rng.normal(size=n)
        y = (rng.rand(n) < 1 / (1 + np.exp(-x))).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, x)], ["y", "x"])
        out = logistic_fit(df, "y", "x", iters=8).collect()[0]
        b0, b1, _ = _newton_ref(x, y, "logistic")
        mu = 1 / (1 + np.exp(-np.clip(b0 + b1 * x, -30, 30)))
        ll = (y * np.log(mu) + (1 - y) * np.log(1 - mu)).sum()
        assert out["loglik"] == pytest.approx(ll, rel=1e-8)


class TestPoisson:
    def test_recovers_planted_coefficients(self, spark):
        rng = np.random.RandomState(5)
        n = 700
        x = rng.normal(size=n) * 0.8
        lam = np.exp(0.3 + 0.9 * x)
        y = rng.poisson(lam).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, x)], ["y", "x"])
        out = poisson_fit(df, "y", "x", iters=8).collect()[0]
        b0, b1, se = _newton_ref(x, y, "poisson")
        assert out["intercept"] == pytest.approx(b0, abs=1e-8)
        assert out["slope"] == pytest.approx(b1, abs=1e-8)
        assert out["se_slope"] == pytest.approx(se, rel=1e-6)
        assert 0.7 < out["slope"] < 1.1  # planted 0.9

    def test_grouped_fits_independent(self, spark):
        rng = np.random.RandomState(6)
        rows = []
        for g, b in (("a", 0.8), ("b", -0.8)):
            x = rng.normal(size=400) * 0.5
            y = rng.poisson(np.exp(0.2 + b * x)).astype(float)
            rows += [(g, float(a), float(c)) for a, c in zip(y, x)]
        df = spark.createDataFrame(rows, ["g", "y", "x"])
        out = {r["g"]: r for r in
               poisson_fit(df, "y", "x", "g", iters=8).collect()}
        assert out["a"]["slope"] > 0.5
        assert out["b"]["slope"] < -0.5

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1.0, 1.0)], ["y", "x"])
        with pytest.raises(ValueError):
            poisson_fit(df, "y", "x", iters=0)


class TestDispersion:
    def test_poisson_dispersion_near_one(self, spark):
        rng = np.random.RandomState(41)
        x = rng.normal(size=600) * 0.5
        y = rng.poisson(np.exp(0.2 + 0.7 * x)).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, x)], ["y", "x"])
        out = poisson_fit(df, "y", "x", iters=8).collect()[0]
        assert 0.8 < out["dispersion"] < 1.25  # equidispersed by design

    def test_overdispersion_detected(self, spark):
        rng = np.random.RandomState(43)
        x = rng.normal(size=600) * 0.5
        lam = np.exp(0.2 + 0.7 * x)
        # negative-binomial-ish: gamma-mixed Poisson, var >> mean
        y = rng.poisson(lam * rng.gamma(0.3, 1 / 0.3, 600)).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(y, x)], ["y", "x"])
        out = poisson_fit(df, "y", "x", iters=8).collect()[0]
        assert out["dispersion"] > 1.8  # flags the broken assumption
