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
