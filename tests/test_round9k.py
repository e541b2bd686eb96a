"""Round-9 (continuation): Kendall tau-b and Harrell's C-index —
goldens against brute-force pair enumeration."""

import itertools

import numpy as np
import pytest

from woodwork_spark.operators.evaluation import concordance_index
from woodwork_spark.operators.stats_tests import kendall_tau_b


def _tau_b_ref(x, y):
    n = len(x)
    cmd = c = d = 0
    for i, j in itertools.combinations(range(n), 2):
        sx = int(x[i] > x[j]) - int(x[i] < x[j])
        sy = int(y[i] > y[j]) - int(y[i] < y[j])
        cmd += sx * sy
        if sx * sy > 0:
            c += 1
        elif sx * sy < 0:
            d += 1
    from collections import Counter
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) / 2 for t in Counter(x).values())
    n2 = sum(t * (t - 1) / 2 for t in Counter(y).values())
    return cmd, c, d, cmd / ((n0 - n1) * (n0 - n2)) ** 0.5


class TestKendall:
    def test_matches_bruteforce_with_ties(self, spark):
        rng = np.random.RandomState(11)
        x = rng.randint(0, 6, 120).astype(float)
        y = (x + rng.randint(0, 4, 120)).astype(float)  # positive dep
        df = spark.createDataFrame(
            [(float(a), float(b)) for a, b in zip(x, y)], ["x", "y"])
        out = kendall_tau_b(df, "x", "y").collect()[0]
        cmd, c, d, tau = _tau_b_ref(list(x), list(y))
        assert out["concordant"] == c
        assert out["discordant"] == d
        assert out["tau_b"] == pytest.approx(tau, rel=1e-12)
        assert out["tau_b"] > 0.3
        assert out["p_approx"] < 0.01

    def test_perfect_monotone_is_one(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i * i)) for i in range(30)], ["x", "y"])
        out = kendall_tau_b(df, "x", "y").collect()[0]
        assert out["tau_b"] == pytest.approx(1.0)

    def test_independent_near_zero(self, spark):
        rng = np.random.RandomState(13)
        df = spark.createDataFrame(
            [(float(rng.randint(0, 10)), float(rng.randint(0, 10)))
             for _ in range(400)], ["x", "y"])
        out = kendall_tau_b(df, "x", "y").collect()[0]
        assert abs(out["tau_b"]) < 0.12
        assert out["p_approx"] > 0.01

    def test_cells_guard(self, spark):
        df = spark.createDataFrame(
            [(float(i), float(i)) for i in range(50)], ["x", "y"])
        with pytest.raises(ValueError, match="cells"):
            kendall_tau_b(df, "x", "y", max_cells=10)


def _cindex_ref(t, d, s):
    num = den = 0
    for i in range(len(t)):
        if not d[i]:
            continue
        for j in range(len(t)):
            if t[i] < t[j]:
                den += 1
                if s[i] > s[j]:
                    num += 2
                elif s[i] == s[j]:
                    num += 1
    return num, den, num / (2 * den)


class TestCIndex:
    def test_matches_bruteforce(self, spark):
        rng = np.random.RandomState(17)
        n = 150
        s = np.round(rng.normal(size=n), 1)
        t = np.ceil(rng.exponential(1.0 / np.exp(0.8 * s)) * 3)
        d = (rng.rand(n) < 0.8).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b), float(c)) for a, b, c in zip(t, d, s)],
            ["t", "d", "s"])
        out = concordance_index(df, "t", "d", "s").collect()[0]
        num, den, ci = _cindex_ref(list(t), list(d), list(s))
        assert out["n_pairs"] == den
        assert out["n_concordant_x2"] == num
        assert out["c_index"] == pytest.approx(ci, rel=1e-12)
        # the planted hazard direction discriminates
        assert out["c_index"] > 0.6

    def test_random_scores_near_half(self, spark):
        rng = np.random.RandomState(19)
        n = 300
        df = spark.createDataFrame(
            [(float(np.ceil(rng.exponential() * 5)), 1,
              float(rng.randint(0, 20)))
             for _ in range(n)], ["t", "d", "s"])
        out = concordance_index(df, "t", "d", "s").collect()[0]
        assert 0.42 < out["c_index"] < 0.58

    def test_censored_rows_never_anchor_pairs(self, spark):
        # all censored -> zero comparable pairs, NULL index
        df = spark.createDataFrame(
            [(1.0, 0, 0.5), (2.0, 0, 0.7)], ["t", "d", "s"])
        out = concordance_index(df, "t", "d", "s").collect()[0]
        assert out["n_pairs"] in (0, None) or out["n_pairs"] == 0
        assert out["c_index"] is None


class TestPosthocReliability:
    def test_pairwise_welch_matches_single(self, spark):
        import pyspark.sql.functions as F

        from woodwork_spark.operators.stats_tests import (
            pairwise_welch,
            welch_ttest,
        )
        rng = np.random.RandomState(23)
        rows = (
            [("a", float(v)) for v in rng.normal(0, 1, 80)]
            + [("b", float(v)) for v in rng.normal(1, 2, 60)]
            + [("c", float(v)) for v in rng.normal(0.2, 1, 70)]
        )
        df = spark.createDataFrame(rows, ["g", "v"])
        out = {(r["group_a"], r["group_b"]): r for r in
               pairwise_welch(df, "v", "g").collect()}
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        # the a-vs-b pair must agree with the standalone welch_ttest
        ab = welch_ttest(df, "v", "g", "a", "b").collect()[0]
        pw = out[("a", "b")]
        assert pw["t_stat"] == pytest.approx(ab["t_stat"], rel=1e-9)
        # bonferroni: adjusted = 3x raw, capped
        assert pw["p_adj"] == pytest.approx(
            min(1.0, pw["p_approx"] * 3), abs=1e-12)
        # planted separation detected (1-sigma mean gap, n=80/60)
        assert out[("a", "b")]["p_adj"] < 0.05

    def test_cronbach_known_value(self, spark):
        rng = np.random.RandomState(29)
        base = rng.normal(size=200)
        i1 = base + rng.normal(0, 0.3, 200)
        i2 = base + rng.normal(0, 0.3, 200)
        i3 = base + rng.normal(0, 0.3, 200)
        from woodwork_spark.operators.stats_tests import cronbach_alpha
        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for a, b, c in zip(i1, i2, i3)], ["i1", "i2", "i3"])
        out = cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]
        vs = [np.var(x, ddof=1) for x in (i1, i2, i3)]
        tv = np.var(i1 + i2 + i3, ddof=1)
        ref = 1.5 * (1 - sum(vs) / tv)
        assert out["alpha"] == pytest.approx(ref, rel=1e-9)
        assert out["alpha"] > 0.8  # strongly correlated items

    def test_cronbach_independent_items_near_zero(self, spark):
        rng = np.random.RandomState(31)
        from woodwork_spark.operators.stats_tests import cronbach_alpha
        df = spark.createDataFrame(
            [tuple(float(x) for x in rng.normal(size=3))
             for _ in range(300)], ["i1", "i2", "i3"])
        out = cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]
        assert abs(out["alpha"]) < 0.25

    def test_icc_high_within_group_consistency(self, spark):
        rng = np.random.RandomState(37)
        from woodwork_spark.operators.stats_tests import icc_oneway
        rows = []
        for g in range(40):
            mu = rng.normal(0, 5)
            for _ in range(rng.randint(3, 8)):
                rows.append((g, float(mu + rng.normal(0, 0.5))))
        df = spark.createDataFrame(rows, ["g", "v"])
        out = icc_oneway(df, "v", "g").collect()[0]
        assert out["icc"] > 0.9  # group effect dominates noise
        # shuffled groups destroy it
        shuffled = [(rows[i][0], rows[(i * 17 + 5) % len(rows)][1])
                    for i in range(len(rows))]
        df2 = spark.createDataFrame(shuffled, ["g", "v"])
        out2 = icc_oneway(df2, "v", "g").collect()[0]
        assert out2["icc"] < 0.3


class TestBYFDR:
    def test_by_equals_bh_times_harmonic(self, spark):
        from woodwork_spark.operators.stats_tests import bh_fdr
        rng = np.random.RandomState(47)
        rows = [(i, float(p)) for i, p in enumerate(rng.rand(40))]
        df = spark.createDataFrame(rows, ["id", "p"])
        bh = {r["id"]: r["q_value"] for r in
              bh_fdr(df, "p", tiebreak=["id"]).collect()}
        by = {r["id"]: r["q_value"] for r in
              bh_fdr(df, "p", tiebreak=["id"], method="by").collect()}
        c = sum(1.0 / i for i in range(40, 0, -1))
        checked = 0
        for i in bh:
            if bh[i] * c < 1.0:  # uncapped: exact scaling identity
                assert by[i] == pytest.approx(bh[i] * c, rel=1e-12)
                checked += 1
            else:
                assert by[i] == pytest.approx(1.0, abs=1e-12)
        assert checked > 0  # the identity was actually exercised
        # BY is uniformly at least as conservative
        assert all(by[i] >= bh[i] - 1e-12 for i in bh)

    def test_bad_method_rejected(self, spark):
        from woodwork_spark.operators.stats_tests import bh_fdr
        df = spark.createDataFrame([(0.5,)], ["p"])
        with pytest.raises(ValueError, match="method"):
            bh_fdr(df, "p", method="holm")
