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


class TestQualityClassifier:
    def test_recovers_planted_separation(self, spark):
        """Golden: docs whose tokens decide the label — the hashed-
        feature logistic fit must rank held-out docs correctly."""
        import pyspark.sql.functions as F
        from woodwork_spark.operators.text import (
            quality_classifier_fit,
            quality_classifier_predict,
        )

        rng = np.random.RandomState(31)
        good_w = ["fine", "great", "solid", "clear", "useful"]
        bad_w = ["spam", "junk", "noise", "clickbait", "garbage"]
        rows = []
        for i in range(400):
            y = i % 2
            pool = good_w if y else bad_w
            toks = [pool[rng.randint(5)] for _ in range(12)]
            # 15% label noise so the data is not perfectly separable
            if rng.uniform() < 0.15:
                y = 1 - y
            rows.append((i, " ".join(toks), float(y)))
        df = spark.createDataFrame(rows, ["id", "text", "y"])
        # near-separable hashed features diverge under raw Newton (the
        # numpy fit does too) — ridge is the documented fix
        m = quality_classifier_fit(
            df, "text", "y", k=8, iters=8, ridge_lambda=0.3)
        p = quality_classifier_predict(df, m, "text", k=8)
        agg = {
            r["y"]: r["mp"] for r in p.groupBy("y").agg(
                F.avg("quality_prob").alias("mp")).collect()
        }
        assert agg[1.0] > 0.7 and agg[0.0] < 0.3

    def test_features_sum_to_one(self, spark):
        import pyspark.sql.functions as F
        from woodwork_spark.operators.text import hashed_token_features

        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "one token"), (3, "x")],
            ["id", "text"])
        f = hashed_token_features(df, "text", k=5)
        tot = f.select(
            sum([F.col(f"f{j}") for j in range(5)]).alias("s")).collect()
        for r in tot:
            assert r["s"] == pytest.approx(1.0, abs=1e-12)


class TestBlockingSkipReportThreaded:
    def test_entry_fixture_cap_skips_nothing_and_caps_degenerate(
            self, spark):
        """Verdict #4: the flagship linkage queries now pass an
        explicit max_bucket; assert the skip report is empty on the
        healthy fixture and nonzero once a degenerate key is planted."""
        import pyspark.sql.functions as F
        from woodwork_spark.operators.dedup import blocking_skip_report

        left = spark.createDataFrame(
            [(i, i % 25) for i in range(500)], ["lid", "nk"])
        right = spark.createDataFrame(
            [(1000 + i, i % 25) for i in range(100)], ["rid", "nk"])
        rep = blocking_skip_report(
            left, right, "lid", "rid", [("exact", "nk")],
            max_bucket=1_000_000).collect()
        assert len(rep) == 1
        assert rep[0]["n_buckets_skipped"] == 0
        # plant a degenerate key: every left row shares nk = -1
        bad_l = left.withColumn("nk", F.lit(-1))
        rep2 = blocking_skip_report(
            bad_l, right.withColumn("nk", F.lit(-1)),
            "lid", "rid", [("exact", "nk")], max_bucket=1000).collect()
        assert rep2[0]["n_buckets_skipped"] == 1
        assert rep2[0]["n_pairs_skipped"] == 500 * 100


class TestIvfPqRerank:
    def _data(self, spark, rng, n=160, d=16):
        vecs = rng.normal(size=(n, d)).round(3)
        df = spark.createDataFrame(
            [(i, [float(x) for x in vecs[i]]) for i in range(n)],
            ["vec_id", "embedding"])
        return df, vecs

    def test_rerank_recall_at_least_non_reranked(self, spark):
        """Verdict #3: exact re-ranking must not lose recall vs the
        plain LUT ranking (same probed cells, exact re-scoring)."""
        from woodwork_spark.operators.embedding import ivf_pq_search

        rng = np.random.RandomState(37)
        df, vecs = self._data(spark, rng)
        queries = {f"q{i}": [float(x) for x in vecs[i]] for i in range(6)}
        kw = dict(nlist=4, n_probe=2, n_subspaces=4, k=8,
                  coarse_iterations=1, pq_iterations=1, top_k=5)
        plain = ivf_pq_search(
            df, "vec_id", "embedding", queries, **kw).collect()
        rr = ivf_pq_search(
            df, "vec_id", "embedding", queries, rerank_k=20, **kw
        ).collect()
        # brute-force ground truth
        recalls = {}
        for which, got in (("plain", plain), ("rerank", rr)):
            hits = tot = 0
            for qid, qv in queries.items():
                dists = ((vecs - np.array(qv)) ** 2).sum(axis=1)
                truth = set(np.argsort(dists, kind="stable")[:5])
                mine = {r["vec_id"] for r in got if r["query_id"] == qid}
                hits += len(truth & mine)
                tot += 5
            recalls[which] = hits / tot
        assert recalls["rerank"] >= recalls["plain"]
        # identity queries: the query vector itself must be rank 1
        for qid in queries:
            top = [r for r in rr if r["query_id"] == qid and r["rank"] == 1]
            assert top and top[0]["vec_id"] == int(qid[1:])
            assert top[0]["exact_dist"] == pytest.approx(0.0, abs=1e-6)

    def test_rerank_exact_dist_matches_numpy(self, spark):
        from woodwork_spark.operators.embedding import ivf_pq_search

        rng = np.random.RandomState(41)
        df, vecs = self._data(spark, rng, n=120)
        queries = {"q0": [float(x) for x in vecs[3]]}
        out = ivf_pq_search(
            df, "vec_id", "embedding", queries, nlist=4, n_probe=2,
            n_subspaces=4, k=8, coarse_iterations=1, pq_iterations=1,
            top_k=5, rerank_k=15).collect()
        for r in out:
            ref = float(((vecs[r["vec_id"]] - vecs[3]) ** 2).sum())
            assert r["exact_dist"] == pytest.approx(ref, abs=1e-5)


class TestCoxLoglikAndLrt:
    @staticmethod
    def _cox_np(t, d, X, iters):
        """Breslow Newton replica returning (beta, partial loglik)."""
        n, k = X.shape
        beta = np.zeros(k)
        order = np.argsort(-t, kind="stable")
        ts, ds, Xs = t[order], d[order], X[order]

        def risk_sums(b):
            ew = np.exp(np.minimum(Xs @ b, 700))
            s0 = np.cumsum(ew)
            s1 = np.cumsum(Xs * ew[:, None], axis=0)
            s2 = np.cumsum(
                np.einsum("ni,nj->nij", Xs, Xs) * ew[:, None, None], axis=0)
            # map each row to the LAST index sharing its time (ties
            # share the full risk set)
            idx = np.zeros(n, dtype=int)
            last = 0
            for i in range(n):
                j = i
                while j + 1 < n and ts[j + 1] == ts[i]:
                    j += 1
                idx[i] = j
                last = j
            _ = last
            return ew, s0[idx], s1[idx], s2[idx]

        for _ in range(iters):
            ew, s0, s1, s2 = risk_sums(beta)
            r1 = s1 / s0[:, None]
            U = (ds[:, None] * (Xs - r1)).sum(axis=0)
            A = (
                ds[:, None, None]
                * (s2 / s0[:, None, None]
                   - np.einsum("ni,nj->nij", r1, r1))
            ).sum(axis=0)
            beta = beta + np.linalg.solve(A, U)
        ew, s0, s1, s2 = risk_sums(beta)
        ll = float((ds * (Xs @ beta - np.log(s0))).sum())
        return beta, ll

    def test_loglik_matches_numpy(self, spark):
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(43)
        n = 250
        x1 = rng.normal(size=n)
        x2 = rng.normal(size=n)
        t = np.ceil(rng.exponential(1.0 / np.exp(0.6 * x1)) * 5)
        d = (rng.uniform(size=n) < 0.8).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c), float(e))
             for a, b, c, e in zip(t, d, x1, x2)], ["t", "d", "x1", "x2"])
        out = cox_ph_fit(df, "t", "d", ["x1", "x2"], iters=4).collect()[0]
        _, ll = self._cox_np(t, d, np.column_stack([x1, x2]), 4)
        assert out["loglik"] == pytest.approx(ll, abs=1e-6)
        # single-covariate path surfaces loglik too
        out1 = cox_ph_fit(df, "t", "d", "x1", iters=4).collect()[0]
        _, ll1 = self._cox_np(t, d, x1[:, None], 4)
        assert out1["loglik"] == pytest.approx(ll1, abs=1e-6)

    def test_cox_lrt_null_covariate_large_p(self, spark):
        """x2 is pure noise: the LRT must not reject (p not tiny), and
        stat must equal 2 * (llf - llr) exactly."""
        from woodwork_spark.operators.regression import glm_lrt
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(47)
        n = 300
        x1 = rng.normal(size=n)
        x2 = rng.normal(size=n)
        t = np.ceil(rng.exponential(1.0 / np.exp(0.5 * x1)) * 4)
        d = np.ones(n)
        df = spark.createDataFrame(
            [(float(a), 1.0, float(b), float(c))
             for a, b, c in zip(t, x1, x2)], ["t", "d", "x1", "x2"])
        full = cox_ph_fit(df, "t", "d", ["x1", "x2"], iters=4)
        red = cox_ph_fit(df, "t", "d", ["x1"], iters=4)
        out = glm_lrt(full, red, df_diff=1).collect()[0]
        assert out["lrt_stat"] == pytest.approx(
            2.0 * (out["loglik_full"] - out["loglik_reduced"]), abs=1e-9)
        assert out["p_value"] > 0.01


class TestKaplanMeierCi:
    def test_greenwood_loglog_matches_numpy(self, spark):
        from woodwork_spark.operators.timeseries import kaplan_meier

        rng = np.random.RandomState(53)
        n = 200
        t = np.ceil(rng.exponential(5, n))
        d = (rng.uniform(size=n) < 0.7).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(t, d)], ["t", "d"])
        out = {r["duration"]: r for r in kaplan_meier(
            df, "t", "d", ci=True).collect()}

        times = np.unique(t[d == 1])
        s, g = 1.0, 0.0
        ls = 0.0
        for tt in sorted(np.unique(t)):
            r = int((t >= tt).sum())
            de = int(((t == tt) & (d == 1)).sum())
            if de == 0:
                continue
            frac = 1.0 - de / r
            ls += np.log(frac) if frac > 0 else -745.0
            s = np.exp(ls)
            g += de / (r * (r - de)) if r > de else np.inf
            if tt in times:
                row = out[tt]
                assert row["survival"] == pytest.approx(s, rel=1e-10)
                if np.isfinite(g) and ls < 0 and s > 0:
                    se = s * np.sqrt(g)
                    sll = np.sqrt(g) / abs(ls)
                    lo = s ** np.exp(1.959964 * sll)
                    hi = s ** np.exp(-1.959964 * sll)
                    assert row["se_surv"] == pytest.approx(se, rel=1e-9)
                    assert row["ci_low"] == pytest.approx(lo, rel=1e-9)
                    assert row["ci_high"] == pytest.approx(hi, rel=1e-9)
                    assert row["ci_low"] <= row["survival"] <= row["ci_high"]
                else:
                    assert row["ci_low"] is None and row["ci_high"] is None

    def test_ungrouped_km_no_single_partition_window(self, spark):
        from woodwork_spark.operators.timeseries import kaplan_meier

        rng = np.random.RandomState(59)
        rows = [(float(np.ceil(v * 3)), int(e)) for v, e in zip(
            rng.exponential(1, 300), rng.uniform(size=300) < 0.8)]
        df = spark.createDataFrame(rows, ["t", "d"])
        res = kaplan_meier(df, "t", "d", ci=True)
        plan = res._jdf.queryExecution().executedPlan().toString()
        assert "Window" in plan
        for c in _single_partition_consumers(plan):
            assert "Window" not in c and "Sort" not in c, c


class TestCoxResiduals:
    def test_martingale_identity_and_deviance(self, spark):
        import pyspark.sql.functions as F
        from woodwork_spark.operators.timeseries import (
            cox_baseline_hazard,
            cox_ph_fit,
            cox_residuals,
        )

        rng = np.random.RandomState(61)
        n = 200
        x = rng.normal(size=n)
        t = np.ceil(rng.exponential(1.0 / np.exp(0.5 * x)) * 4)
        d = (rng.uniform(size=n) < 0.75).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b), float(c)) for a, b, c in zip(t, d, x)],
            ["t", "d", "x"])
        model = cox_ph_fit(df, "t", "d", "x", iters=3)
        base = cox_baseline_hazard(df, "t", "d", "x", model)
        mart = cox_residuals(df, "t", "d", "x", model, base,
                             kind="martingale", out_col="m")
        s = mart.agg(F.sum("m")).collect()[0][0]
        # Breslow identity: martingale residuals sum to exactly zero
        assert s == pytest.approx(0.0, abs=1e-9)
        dev = cox_residuals(df, "t", "d", "x", model, base,
                            kind="deviance", out_col="r")
        rows = dev.select("d", "m", "r").collect() if "m" in dev.columns \
            else None
        # deviance sign matches martingale sign; censored-before-first-
        # event rows (m == 0) give r == 0
        got = cox_residuals(mart, "t", "d", "x", model, base,
                            kind="deviance", out_col="r").collect()
        _ = rows
        for row in got:
            ref = -2.0 * (row["m"] + (
                row["d"] * np.log(row["d"] - row["m"])
                if row["d"] > 0 and row["d"] - row["m"] > 0 else 0.0))
            refr = np.sign(row["m"]) * np.sqrt(max(0.0, ref))
            assert row["r"] == pytest.approx(refr, abs=1e-9)


class TestCramersVP:
    def test_wilson_hilferty_p(self, spark):
        import math

        from woodwork_spark.statistics.dependence import cramers_v

        rows = [("A", "X")] * 50 + [("A", "Y")] * 10 + \
               [("B", "X")] * 15 + [("B", "Y")] * 45
        df = spark.createDataFrame(rows, ["a", "b"])
        out = cramers_v(df, "a", "b").collect()[0]
        k = out["dof"]
        x = out["chi2"]
        zwh = ((x / k) ** (1 / 3) - (1 - 2 / (9 * k))) \
            * math.sqrt(9 * k / 2)
        ref = 0.5 * math.erfc(zwh / math.sqrt(2))
        assert out["p_approx"] == pytest.approx(ref, abs=2e-7)
        # strong association on this table: p should be tiny
        assert out["p_approx"] < 1e-6


class TestHashedNgramFeatures:
    def test_bigram_shares_and_short_docs(self, spark):
        import hashlib

        import pyspark.sql.functions as F
        from woodwork_spark.operators.text import hashed_token_features

        df = spark.createDataFrame(
            [(1, "a b c d"), (2, "solo"), (3, "x y")],
            ["id", "text"])
        f = hashed_token_features(df, "text", k=5, ngram=2)
        rows = {r["id"]: r for r in f.collect()}
        # 3 bigrams in doc 1 -> shares sum to 1
        assert sum(rows[1][f"f{j}"] for j in range(5)) \
            == pytest.approx(1.0, abs=1e-12)
        # fewer tokens than n -> all-zero features
        assert all(rows[2][f"f{j}"] == 0.0 for j in range(5))

        # bucket placement matches the portable md5 convention
        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 5

        expected = {}
        for g in ["x y"]:
            expected[bucket(g)] = expected.get(bucket(g), 0) + 1
        for j in range(5):
            assert rows[3][f"f{j}"] == pytest.approx(
                expected.get(j, 0) / 1.0, abs=1e-12)


class TestStreamingQualityScore:
    def test_classifier_scores_a_stream(self, spark):
        """The trained quality model is a batch frame; scoring a
        document STREAM is the same broadcast projection — stream-
        static composition with zero streaming state."""
        import shutil
        import uuid

        import pyspark.sql.functions as F
        from woodwork_spark.operators.text import (
            quality_classifier_fit,
            quality_classifier_predict,
        )
        from woodwork_spark.streaming.events import run_stream_to_memory

        rng = np.random.RandomState(67)
        good_w = ["fine", "great", "solid", "clear", "useful"]
        bad_w = ["spam", "junk", "noise", "clickbait", "garbage"]
        rows = []
        for i in range(200):
            y = i % 2
            pool = good_w if y else bad_w
            rows.append((i, " ".join(
                pool[rng.randint(5)] for _ in range(10)), float(y)))
        train = spark.createDataFrame(rows, ["id", "text", "y"])
        model = quality_classifier_fit(
            train, "text", "y", k=8, iters=8, ridge_lambda=0.3)

        path = f"/tmp/ww_qstream_{uuid.uuid4().hex[:8]}"
        try:
            train.select("id", "text", "y").write.mode(
                "overwrite").parquet(path)
            stream = spark.readStream.schema(
                "id long, text string, y double").parquet(path)
            scored = quality_classifier_predict(stream, model, "text", k=8)
            agg = scored.groupBy("y").agg(
                F.avg("quality_prob").alias("mp"))
            res = {r["y"]: r["mp"] for r in run_stream_to_memory(
                agg, f"qscore_{uuid.uuid4().hex[:8]}").collect()}
            assert res[1.0] > 0.7 and res[0.0] < 0.3
        finally:
            shutil.rmtree(path, ignore_errors=True)


class TestRmstCiAndDiff:
    @staticmethod
    def _rmst_np(t, d, tau):
        """KM step-area RMST + Greenwood-type variance reference."""
        s, ls = 1.0, 0.0
        area, prev_t, prev_s = 0.0, 0.0, 1.0
        cells = []
        for tt in sorted(np.unique(t)):
            r = int((t >= tt).sum())
            de = int(((t == tt) & (d == 1)).sum())
            if de == 0:
                continue
            seg = prev_s * (min(tt, tau) - min(prev_t, tau))
            area += seg
            frac = 1.0 - de / r
            ls += np.log(frac) if frac > 0 else -745.0
            s = np.exp(ls)
            cells.append((tt, de, r, seg))
            prev_t, prev_s = tt, s
        total = area + s * (tau - min(prev_t, tau))
        # A_i = remaining area after t_i
        cum = 0.0
        var = 0.0
        for tt, de, r, seg in cells:
            cum += seg
            a_i = total - cum
            if tt >= tau:
                continue
            var += a_i * a_i * de / (r * (r - de))
        return total, np.sqrt(var)

    def test_rmst_ci_matches_numpy(self, spark):
        from woodwork_spark.operators.timeseries import rmst

        rng = np.random.RandomState(71)
        n = 250
        t = np.ceil(rng.exponential(8, n))
        d = (rng.uniform(size=n) < 0.75).astype(int)
        tau = 12.0
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(t, d)], ["t", "d"])
        out = rmst(df, "t", "d", tau, ci=True).collect()[0]
        ref_rmst, ref_se = self._rmst_np(t, d, tau)
        assert out["rmst"] == pytest.approx(ref_rmst, rel=1e-10)
        assert out["se_rmst"] == pytest.approx(ref_se, rel=1e-9)

    def test_rmst_diff_two_groups(self, spark):
        from woodwork_spark.operators.timeseries import rmst_diff

        rng = np.random.RandomState(73)
        n = 300
        rows = []
        parts = {0: [], 1: []}
        for i in range(n):
            g = i % 2
            # group 0 survives longer
            tt = float(np.ceil(rng.exponential(10 if g == 0 else 5)))
            dd = int(rng.uniform() < 0.8)
            rows.append((g, tt, dd))
            parts[g].append((tt, dd))
        df = spark.createDataFrame(rows, ["g", "t", "d"])
        out = rmst_diff(df, "t", "d", 15.0, "g", 0, 1).collect()[0]
        refs = {}
        for g, pr in parts.items():
            ta = np.array([x for x, _ in pr])
            da = np.array([y for _, y in pr])
            refs[g] = self._rmst_np(ta, da, 15.0)
        assert out["rmst_a"] == pytest.approx(refs[0][0], rel=1e-10)
        assert out["rmst_b"] == pytest.approx(refs[1][0], rel=1e-10)
        assert out["diff"] == pytest.approx(
            refs[0][0] - refs[1][0], rel=1e-10)
        se = np.sqrt(refs[0][1] ** 2 + refs[1][1] ** 2)
        assert out["se_diff"] == pytest.approx(se, rel=1e-9)
        # longer-surviving group should test significantly higher here
        assert out["diff"] > 0 and out["p_approx"] < 0.05


class TestWeightedLogrank:
    def test_wilcoxon_matches_hand_computation(self, spark):
        from woodwork_spark.operators.timeseries import logrank_test

        rng = np.random.RandomState(79)
        rows = []
        data = []
        for i in range(160):
            g = i % 2
            t = float(np.ceil(rng.exponential(6 if g == 0 else 4)))
            e = int(rng.uniform() < 0.8)
            rows.append((g, t, e))
            data.append((g, t, e))
        df = spark.createDataFrame(rows, ["g", "t", "e"])
        out = logrank_test(
            df, "t", "e", "g", 0, 1, weights="wilcoxon").collect()[0]

        import math
        ts = sorted({t for _, t, _ in data})
        ome = var = 0.0
        for tt in ts:
            n1 = sum(1 for g, t, _ in data if g == 0 and t >= tt)
            n2 = sum(1 for g, t, _ in data if g == 1 and t >= tt)
            d1 = sum(e for g, t, e in data if g == 0 and t == tt)
            d2 = sum(e for g, t, e in data if g == 1 and t == tt)
            d, nt = d1 + d2, n1 + n2
            if d == 0:
                continue
            ome += nt * (d1 - d * n1 / nt)
            if nt > 1:
                var += nt * nt * d * (n1 / nt) * (n2 / nt) \
                    * (nt - d) / (nt - 1)
        chi2 = ome * ome / var
        assert out["o_minus_e"] == pytest.approx(ome, rel=1e-9)
        assert out["variance"] == pytest.approx(var, rel=1e-9)
        assert out["chi2"] == pytest.approx(chi2, rel=1e-9)
        assert out["p_approx"] == pytest.approx(
            math.erfc(math.sqrt(chi2 / 2.0)), abs=2e-7)
