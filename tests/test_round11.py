"""Round-11 suites: the three round-10 ADVICE fixes (ridge-penalized
Wald readout, Poisson underflow dispersion guard, distributed ungrouped
cumulative_incidence) plus the round-11 additions.
"""

import numpy as np
import pytest


def _single_partition_consumers(plan):
    """Parent plan line of every Exchange SinglePartition node."""
    def indent(s):
        i = 0
        while i < len(s) and s[i] in " +-:*(0123456789)":
            i += 1
        return i

    lines = plan.split("\n")
    out = []
    for idx, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            dep = indent(ln)
            for j in range(idx - 1, -1, -1):
                if lines[j].strip() and indent(lines[j]) < dep:
                    out.append(lines[j])
                    break
    return out


class TestRidgePenalizedReadout:
    def test_se_matches_penalized_information(self, spark):
        """ADVICE r10 #1: with ridge_lambda > 0 the Wald SEs must come
        from (A + lam I)^-1 at the converged beta — the penalized
        covariance — not the raw near-singular information."""
        from woodwork_spark.operators.regression import logistic_fit

        rng = np.random.RandomState(7)
        n = 200
        x = rng.normal(size=n)
        # complete separation: y = 1 exactly when x > 0 — unpenalized
        # information at the diverged beta is near-singular
        y = (x > 0).astype(float)
        lam = 5.0
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = logistic_fit(
            df, "y", ["x"], iters=8, ridge_lambda=lam).collect()[0]

        # numpy replica of the engine's penalized IRLS (eta clamp ±30)
        X = np.column_stack([np.ones(n), x])
        beta = np.zeros(2)
        for _ in range(8):
            eta = np.clip(X @ beta, -30, 30)
            mu = 1.0 / (1.0 + np.exp(-eta))
            w = mu * (1.0 - mu)
            U = X.T @ (y - mu)
            A = X.T @ (w[:, None] * X)
            U[1] -= lam * beta[1]
            A[1, 1] += lam
            beta = beta + np.linalg.solve(A, U)
        eta = np.clip(X @ beta, -30, 30)
        mu = 1.0 / (1.0 + np.exp(-eta))
        w = mu * (1.0 - mu)
        A = X.T @ (w[:, None] * X)
        A[1, 1] += lam
        se = np.sqrt(np.diag(np.linalg.inv(A)))

        assert out["coef_x"] == pytest.approx(beta[1], rel=1e-6)
        assert out["se_intercept"] == pytest.approx(se[0], rel=1e-6)
        assert out["se_x"] == pytest.approx(se[1], rel=1e-6)


class TestPoissonUnderflowGuard:
    def test_dispersion_survives_zero_weight_rows(self, spark):
        """ADVICE r10 #2: a row whose Poisson eta underflows (mu = w =
        0.0 exactly) must not poison the group dispersion with NaN —
        the readout skips w == 0 rows."""
        from woodwork_spark.operators.regression import poisson_fit

        rng = np.random.RandomState(3)
        rows = []
        for _ in range(120):
            x = float(rng.uniform(0, 1))
            rows.append((x, float(rng.poisson(np.exp(0.5 + 2.0 * x)))))
        # eta at the converged (b0≈0.5, b1≈2) for x = -400 is ≈ -800:
        # exp underflows to exactly 0.0, so mu = w = 0 on these rows
        rows += [(-400.0, 0.0)] * 3
        df = spark.createDataFrame(rows, ["x", "y"])
        for xc in ("x", ["x"]):
            out = poisson_fit(df, "y", xc, iters=6).collect()[0]
            slope = out["slope"] if xc == "x" else out["coef_x"]
            assert slope == pytest.approx(2.0, abs=0.5)
            assert out["dispersion"] is not None
            assert np.isfinite(out["dispersion"])


class TestCumulativeIncidencePlanShape:
    def test_ungrouped_no_window_or_sort_over_single_partition(self, spark):
        """ADVICE r10 #3: ungrouped cumulative_incidence must not run
        its at-risk / survival sums in one partition — Exchange
        SinglePartition may only feed global one-row folds."""
        from woodwork_spark.operators.timeseries import cumulative_incidence

        rng = np.random.RandomState(5)
        rows = [(float(np.ceil(t * 4)), int(c)) for t, c in zip(
            rng.exponential(1, 400), rng.choice([0, 1, 2], 400))]
        df = spark.createDataFrame(rows, ["dur", "cause"])
        res = cumulative_incidence(df, "dur", "cause")
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        for c in _single_partition_consumers(plan):
            assert "Window" not in c and "Sort" not in c, c

    def test_ungrouped_matches_grouped_single_group(self, spark):
        """The distributed ungrouped path must produce exactly the
        per-group windowed values (one constant group)."""
        from woodwork_spark.operators.timeseries import cumulative_incidence
        import pyspark.sql.functions as F

        rng = np.random.RandomState(11)
        rows = [(float(np.ceil(t * 3)), int(c)) for t, c in zip(
            rng.exponential(1, 300), rng.choice([0, 1, 2, 3], 300))]
        df = spark.createDataFrame(rows, ["dur", "cause"])
        ung = {(r["cause"], r["duration"]):
               (r["n_events"], r["at_risk"], r["surv_before"], r["cif"])
               for r in cumulative_incidence(df, "dur", "cause").collect()}
        grp = {(r["cause"], r["duration"]):
               (r["n_events"], r["at_risk"], r["surv_before"], r["cif"])
               for r in cumulative_incidence(
                   df.withColumn("g", F.lit(1)), "dur", "cause",
                   group_cols="g").collect()}
        assert set(ung) == set(grp)
        for k, (ne, ar, sb, cif) in ung.items():
            ne2, ar2, sb2, cif2 = grp[k]
            assert (ne, ar) == (ne2, ar2)
            assert sb == pytest.approx(sb2, rel=1e-12)
            assert cif == pytest.approx(cif2, rel=1e-12)


class TestChi2Sf:
    def test_matches_exact_formulas(self, spark):
        """_chi2_sf unrolls the exact integer-df survival recurrence;
        check dof 1..6 against math.erfc / exact series references."""
        import math

        import pyspark.sql.functions as F
        from woodwork_spark.operators.stats_tests import _chi2_sf

        def ref(x, k):
            # same recurrence evaluated in python floats
            if k % 2:
                q = math.erfc(math.sqrt(x / 2.0))
                j = 1
            else:
                q = math.exp(-x / 2.0)
                j = 2
            while j + 2 <= k:
                q += (x / 2.0) ** (j / 2.0) * math.exp(-x / 2.0) \
                    / math.gamma(j / 2.0 + 1.0)
                j += 2
            return min(1.0, max(0.0, q))

        xs = [0.1, 0.5, 1.0, 2.5, 3.84, 7.0, 15.0]
        df = spark.createDataFrame([(float(v),) for v in xs], ["x"])
        for k in range(1, 7):
            got = {r["x"]: r["p"] for r in df.select(
                "x", _chi2_sf(F.col("x"), k).alias("p")).collect()}
            for v in xs:
                # A&S erf polynomial is 1.5e-7 absolute; even dfs exact
                assert got[v] == pytest.approx(ref(v, k), abs=2e-7)


class TestGlmLrt:
    def test_nested_logistic_against_numpy(self, spark):
        from woodwork_spark.operators.regression import glm_lrt, logistic_fit

        rng = np.random.RandomState(19)
        n = 400
        x1 = rng.normal(size=n)
        x2 = rng.normal(size=n)
        eta = -0.3 + 0.8 * x1 + 0.5 * x2
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for a, b, c in zip(x1, x2, y)], ["x1", "x2", "y"])
        full = logistic_fit(df, "y", ["x1", "x2"], iters=8)
        red = logistic_fit(df, "y", ["x1"], iters=8)
        out = glm_lrt(full, red, df_diff=1).collect()[0]

        def irls_ll(X):
            beta = np.zeros(X.shape[1])
            for _ in range(8):
                e = np.clip(X @ beta, -30, 30)
                mu = 1 / (1 + np.exp(-e))
                w = mu * (1 - mu)
                beta = beta + np.linalg.solve(
                    X.T @ (w[:, None] * X), X.T @ (y - mu))
            e = np.clip(X @ beta, -30, 30)
            mu = 1 / (1 + np.exp(-e))
            return float(np.sum(y * np.log(mu) + (1 - y) * np.log(1 - mu)))

        X_full = np.column_stack([np.ones(n), x1, x2])
        X_red = np.column_stack([np.ones(n), x1])
        llf, llr = irls_ll(X_full), irls_ll(X_red)
        stat = 2 * (llf - llr)
        import math
        p = math.erfc(math.sqrt(stat / 2.0))
        assert out["loglik_full"] == pytest.approx(llf, abs=1e-6)
        assert out["loglik_reduced"] == pytest.approx(llr, abs=1e-6)
        assert out["lrt_stat"] == pytest.approx(stat, abs=1e-5)
        assert out["p_value"] == pytest.approx(p, abs=2e-7)
        assert out["df_diff"] == 1

    def test_degenerate_and_nonnested_guard(self, spark):
        import pyspark.sql.functions as F
        from woodwork_spark.operators.regression import glm_lrt

        a = spark.createDataFrame([(1, 10, -5.0)], ["g", "n", "loglik"])
        b = spark.createDataFrame([(1, -4.0)], ["g", "loglik"]) \
            .select("g", F.col("loglik"))
        # full fits WORSE than reduced by more than noise -> NULL
        out = glm_lrt(a, b.withColumnRenamed("loglik", "loglik"),
                      df_diff=1, group_cols="g").collect()[0]
        assert out["lrt_stat"] is None and out["p_value"] is None


class TestGlmResiduals:
    def test_poisson_deviance_and_pearson(self, spark):
        from woodwork_spark.operators.regression import (
            glm_residuals,
            poisson_fit,
        )

        rng = np.random.RandomState(23)
        n = 300
        x = rng.uniform(0, 2, size=n)
        y = rng.poisson(np.exp(0.3 + 0.9 * x)).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        model = poisson_fit(df, "y", "x", iters=8)
        rd = glm_residuals(df, model, "y", "x", family="poisson",
                           kind="deviance", out_col="r").collect()
        rp = glm_residuals(df, model, "y", "x", family="poisson",
                           kind="pearson", out_col="r").collect()

        X = np.column_stack([np.ones(n), x])
        beta = np.zeros(2)
        for _ in range(8):
            mu = np.exp(np.minimum(X @ beta, 700))
            beta = beta + np.linalg.solve(
                X.T @ (mu[:, None] * X), X.T @ (y - mu))
        mu = np.exp(np.minimum(X @ beta, 700))
        by_x = {}
        for a, m in zip(x, mu):
            by_x[round(float(a), 9)] = m
        for row in rd:
            m = by_x[round(row["x"], 9)]
            yy = row["y"]
            t = yy * np.log(yy / m) if yy > 0 else 0.0
            ref = np.sign(yy - m) * np.sqrt(max(0.0, 2 * (t - (yy - m))))
            assert row["r"] == pytest.approx(ref, abs=1e-7)
        for row in rp:
            m = by_x[round(row["x"], 9)]
            ref = (row["y"] - m) / np.sqrt(m)
            assert row["r"] == pytest.approx(ref, abs=1e-7)

    def test_logistic_deviance_sums_to_model_deviance(self, spark):
        import pyspark.sql.functions as F
        from woodwork_spark.operators.regression import (
            glm_residuals,
            logistic_fit,
        )

        rng = np.random.RandomState(29)
        n = 250
        x = rng.normal(size=n)
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-x))).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        model = logistic_fit(df, "y", ["x"], iters=8)
        r = glm_residuals(df, model, "y", ["x"], family="logistic",
                          kind="deviance", out_col="r")
        got = r.agg(F.sum(F.col("r") * F.col("r"))).collect()[0][0]
        ll = model.collect()[0]["loglik"]
        # sum of squared deviance residuals == -2 loglik for y in {0,1}
        assert got == pytest.approx(-2.0 * ll, rel=1e-9)
