"""Round-9 (continuation): Holt-Winters seasonal smoothing and Cox
proportional hazards — goldens against independent reference
implementations (hand-rolled numpy; no statsmodels/lifelines in the
container, which is the point: the formulas are reimplemented from the
textbook definitions, not from the operator)."""

import math

import numpy as np
import pytest
import pyspark.sql.functions as F

from woodwork_spark.operators.timeseries import cox_ph_fit, holt_winters_fit


def _hw_reference(y, m, a, b, g):
    level = sum(y[:m]) / m
    trend = (sum(y[m:2 * m]) / m - level) / m
    season = [y[i] - level for i in range(m)]
    abs_sum, n_err = 0.0, 0
    for t in range(m, len(y)):
        s_old = season[t - m]
        abs_sum += abs(y[t] - (level + trend + s_old))
        n_err += 1
        prev = level
        level = a * (y[t] - s_old) + (1 - a) * (level + trend)
        trend = b * (level - prev) + (1 - b) * trend
        season.append(g * (y[t] - level) + (1 - g) * s_old)
    s_next = season[len(y) - m]
    return level, trend, s_next, abs_sum / n_err


class TestHoltWinters:
    def test_matches_reference(self, spark):
        rng = np.random.RandomState(7)
        m = 4
        y = [
            100 + 2 * t + [10, -5, 3, -8][t % m] + rng.normal()
            for t in range(60)
        ]
        df = spark.createDataFrame(
            [("g", t, float(v)) for t, v in enumerate(y)],
            ["g", "t", "y"],
        )
        out = holt_winters_fit(df, "t", "y", "g", period=m).collect()[0]
        lv, tr, sn, mae = _hw_reference(y, m, 0.5, 0.3, 0.2)
        assert out["level"] == pytest.approx(lv, rel=1e-12)
        assert out["trend"] == pytest.approx(tr, rel=1e-12)
        assert out["s_next"] == pytest.approx(sn, rel=1e-9)
        assert out["mae"] == pytest.approx(mae, rel=1e-12)
        assert out["forecast_1"] == pytest.approx(lv + tr + sn, rel=1e-12)
        # the trend estimate should be near the true slope 2
        assert 1.5 < out["trend"] < 2.5

    def test_seasonal_signal_recovered(self, spark):
        # pure seasonal series: forecast_1 must re-apply the phase offset
        m = 4
        y = [float(50 + [20, -20, 10, -10][t % m]) for t in range(40)]
        df = spark.createDataFrame(
            [("g", t, v) for t, v in enumerate(y)], ["g", "t", "y"])
        out = holt_winters_fit(
            df, "t", "y", "g", period=m, alpha=0.2, beta=0.1, gamma=0.4,
        ).collect()[0]
        # t=40 has phase 0 -> expected ~70
        assert out["forecast_1"] == pytest.approx(70.0, abs=2.0)
        assert out["mae"] < 1.0

    def test_short_group_dropped(self, spark):
        df = spark.createDataFrame(
            [("g", t, float(t)) for t in range(8)], ["g", "t", "y"])
        assert holt_winters_fit(df, "t", "y", "g", period=4).count() == 0

    def test_param_validation(self, spark):
        df = spark.createDataFrame([("g", 1, 1.0)], ["g", "t", "y"])
        with pytest.raises(ValueError):
            holt_winters_fit(df, "t", "y", "g", period=1)
        with pytest.raises(ValueError):
            holt_winters_fit(df, "t", "y", "g", period=4, alpha=0.0)


def _cox_reference(t, d, x, iters=8):
    order = np.argsort(-t, kind="mergesort")
    ts, ds, xs = t[order], d[order], x[order]
    last = {}
    for i, tv in enumerate(ts):
        last[tv] = i
    idx = np.array([last[tv] for tv in ts])
    beta = 0.0
    info = None
    for _ in range(iters):
        w = np.exp(beta * xs)
        s0 = np.cumsum(w)[idx]
        s1 = np.cumsum(xs * w)[idx]
        s2 = np.cumsum(xs * xs * w)[idx]
        r1 = s1 / s0
        u = float((ds * (xs - r1)).sum())
        info = float((ds * (s2 / s0 - r1 * r1)).sum())
        beta += u / info
    return beta, info


class TestCoxPH:
    def test_recovers_planted_hazard(self, spark):
        rng = np.random.RandomState(0)
        n = 500
        x = rng.normal(size=n)
        t_ev = rng.exponential(1.0 / np.exp(0.8 * x))
        c = rng.exponential(2.0, n)
        obs = np.minimum(t_ev, c)
        d = (t_ev <= c).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b), float(e)) for a, b, e in zip(obs, d, x)],
            ["t", "d", "x"],
        )
        out = cox_ph_fit(df, "t", "d", "x", iters=4).collect()[0]
        bref, info = _cox_reference(obs, d, x)
        assert out["beta"] == pytest.approx(bref, abs=1e-6)
        assert out["se"] == pytest.approx(1 / math.sqrt(info), rel=1e-4)
        assert 0.6 < out["beta"] < 1.0  # planted 0.8
        assert out["p_approx"] < 1e-6

    def test_tied_times_share_risk_set(self, spark):
        # integer times force heavy ties; the RANGE frame must give tied
        # subjects identical risk sets (a ROWS frame would not)
        rng = np.random.RandomState(3)
        n = 300
        x = rng.normal(size=n)
        t_ev = np.ceil(rng.exponential(1.0 / np.exp(0.5 * x)) * 4)
        d = np.ones(n)
        df = spark.createDataFrame(
            [(float(a), 1.0, float(e)) for a, e in zip(t_ev, x)],
            ["t", "d", "x"],
        )
        out = cox_ph_fit(df, "t", "d", "x", iters=4).collect()[0]
        bref, _ = _cox_reference(t_ev, d, x)
        assert out["beta"] == pytest.approx(bref, abs=1e-6)

    def test_null_covariate_when_no_events(self, spark):
        df = spark.createDataFrame(
            [(1.0, 0.0, 0.5), (2.0, 0.0, -0.5)], ["t", "d", "x"])
        out = cox_ph_fit(df, "t", "d", "x").collect()[0]
        assert out["beta"] is None and out["p_approx"] is None

    def test_grouped_betas_independent(self, spark):
        rng = np.random.RandomState(9)
        rows = []
        for g, b in (("a", 1.0), ("b", -1.0)):
            x = rng.normal(size=250)
            t = rng.exponential(1.0 / np.exp(b * x))
            rows += [(g, float(tv), 1.0, float(xv))
                     for tv, xv in zip(t, x)]
        df = spark.createDataFrame(rows, ["g", "t", "d", "x"])
        out = {r["g"]: r for r in
               cox_ph_fit(df, "t", "d", "x", "g", iters=4).collect()}
        assert out["a"]["beta"] > 0.6
        assert out["b"]["beta"] < -0.6
