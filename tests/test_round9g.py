"""Round-9 (continuation): Theil-Sen robust regression and 1-D
two-component GMM EM — goldens against independent implementations."""

import numpy as np
import pytest

from woodwork_spark.operators.regression import gmm1d_em, theil_sen_fit


class TestTheilSen:
    def test_matches_brute_force(self, spark):
        rng = np.random.RandomState(8)
        x = np.arange(40.0)
        y = 5.0 + 1.5 * x + rng.normal(size=40)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = theil_sen_fit(df, "x", "y").collect()[0]
        slopes = sorted(
            (y[j] - y[i]) / (x[j] - x[i])
            for i in range(40) for j in range(i + 1, 40)
            if x[i] != x[j]
        )
        med = float(np.median(slopes))
        assert out["n_pairs"] == len(slopes)
        assert out["slope"] == pytest.approx(med, rel=1e-9)
        resid_med = float(np.median(y - med * x))
        assert out["intercept"] == pytest.approx(resid_med, rel=1e-6)

    def test_outlier_resistance(self, spark):
        # 20% wild outliers: OLS slope is destroyed, Theil-Sen is not
        x = np.arange(50.0)
        y = 2.0 * x + 1.0
        y[::5] += 500.0
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = theil_sen_fit(df, "x", "y").collect()[0]
        assert out["slope"] == pytest.approx(2.0, abs=0.2)
        ols = np.polyfit(x, y, 1)[0]
        assert abs(ols - 2.0) > abs(out["slope"] - 2.0)

    def test_max_points_guard(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i)) for i in range(100)], ["x", "y"])
        with pytest.raises(ValueError, match="pairs"):
            theil_sen_fit(df, "x", "y", max_points=50)

    def test_grouped(self, spark):
        rows = []
        for g, s in (("a", 1.0), ("b", -3.0)):
            rows += [(g, float(t), s * t + 10.0) for t in range(30)]
        df = spark.createDataFrame(rows, ["g", "x", "y"])
        out = {r["g"]: r for r in
               theil_sen_fit(df, "x", "y", "g").collect()}
        assert out["a"]["slope"] == pytest.approx(1.0, abs=1e-9)
        assert out["b"]["slope"] == pytest.approx(-3.0, abs=1e-9)


def _em_reference(v, iters=5):
    v = np.asarray(v, dtype=float)
    n = len(v)
    pi1 = 0.5
    mu1, mu2 = np.percentile(v, 25), np.percentile(v, 75)
    s1 = s2 = v.var() / 2 + 1e-12

    def pdf(x, m, s):
        return np.exp(-0.5 * (x - m) ** 2 / s) / np.sqrt(2 * np.pi * s)

    for _ in range(iters):
        p1 = pi1 * pdf(v, mu1, s1)
        p2 = (1 - pi1) * pdf(v, mu2, s2)
        r = p1 / (p1 + p2)
        r1 = r.sum()
        mu1, mu2 = (r * v).sum() / r1, ((1 - r) * v).sum() / (n - r1)
        s1 = max((r * v * v).sum() / r1 - mu1 ** 2, 1e-12)
        s2 = max(((1 - r) * v * v).sum() / (n - r1) - mu2 ** 2, 1e-12)
        pi1 = r1 / n
    ll = np.log(pi1 * pdf(v, mu1, s1) + (1 - pi1) * pdf(v, mu2, s2)).sum()
    if mu1 > mu2:
        pi1, mu1, mu2, s1, s2 = 1 - pi1, mu2, mu1, s2, s1
    return pi1, mu1, np.sqrt(s1), mu2, np.sqrt(s2), ll


class TestGMM:
    def test_separates_planted_mixture(self, spark):
        rng = np.random.RandomState(10)
        v = np.concatenate([
            rng.normal(-3.0, 0.5, 700), rng.normal(3.0, 1.0, 300)])
        rng.shuffle(v)
        df = spark.createDataFrame([(float(x),) for x in v], ["v"])
        out = gmm1d_em(df, "v", iters=5).collect()[0]
        pi1, mu1, sg1, mu2, sg2, ll = _em_reference(v)
        assert out["pi1"] == pytest.approx(pi1, abs=1e-9)
        assert out["mu1"] == pytest.approx(mu1, abs=1e-9)
        assert out["sigma1"] == pytest.approx(sg1, abs=1e-9)
        assert out["mu2"] == pytest.approx(mu2, abs=1e-9)
        assert out["loglik"] == pytest.approx(ll, rel=1e-9)
        # the planted structure is actually recovered
        assert out["mu1"] == pytest.approx(-3.0, abs=0.3)
        assert out["mu2"] == pytest.approx(3.0, abs=0.5)
        assert out["pi1"] == pytest.approx(0.7, abs=0.05)

    def test_label_order_deterministic(self, spark):
        rng = np.random.RandomState(12)
        v = np.concatenate([
            rng.normal(10.0, 1.0, 200), rng.normal(-10.0, 1.0, 200)])
        df = spark.createDataFrame([(float(x),) for x in v], ["v"])
        out = gmm1d_em(df, "v").collect()[0]
        assert out["mu1"] <= out["mu2"]
