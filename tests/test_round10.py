"""Round-10 regressions for the round-9 ADVICE findings: the
degenerate-group row-set contract of jarque_bera / ljung_box (oracle
and operator must agree on ANY data, not just fixtures where every
group is large), durbin_watson tie determinism, the Poisson eta
overflow guard, and the vectorized-but-bitwise-identical BY harmonic
constant."""

import math
import struct

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from woodwork_spark.operators.stats_tests import (
    _harmonic_number,
    durbin_watson,
    jarque_bera,
    ljung_box,
)


class TestHarmonicNumber:
    def test_bitwise_matches_scalar_loop(self):
        """The chunked np.cumsum keeps the exact smallest-terms-first
        sequential add order of the naive loop, at every m and chunk
        size (including boundaries mid-sum)."""
        for m in (1, 2, 7, 100, 12345, 100003):
            c = 0.0
            for i in range(m, 0, -1):
                c += 1.0 / i
            want = struct.pack("<d", c)
            assert struct.pack("<d", _harmonic_number(m)) == want
            # a tiny chunk forces many seed-carry boundaries
            assert struct.pack("<d", _harmonic_number(m, chunk=97)) == want

    def test_known_values(self):
        assert _harmonic_number(1) == 1.0
        assert _harmonic_number(2) == 1.5
        assert _harmonic_number(4) == pytest.approx(25.0 / 12.0, rel=1e-15)


def _degenerate_orders():
    """An orders-shaped frame with one healthy group, one tiny group
    (n < 8) and one zero-variance group — exactly the shapes the old
    oracle WHERE-filtered away while the operator emitted NULL rows."""
    rng = np.random.RandomState(42)
    rows = []
    base = pd.Timestamp("1995-01-01")
    for i in range(60):  # healthy group
        rows.append(("1-URGENT", float(rng.exponential(1000.0) + 50.0),
                     base + pd.Timedelta(days=i)))
    for i in range(3):   # tiny group
        rows.append(("2-HIGH", float(i + 1),
                     base + pd.Timedelta(days=i)))
    for i in range(20):  # zero variance
        rows.append(("3-MEDIUM", 7.0, base + pd.Timedelta(days=i)))
    return pd.DataFrame(
        rows, columns=["o_orderpriority", "o_totalprice", "o_orderdate"],
    )


class TestDegenerateGroupRowSetContract:
    """Operator output and ORACLE SQL must produce the SAME row set on
    data with degenerate groups — the driver hash gate compares row
    counts before values."""

    def _oracle_rows(self, name, pdf):
        con = duckdb.connect()
        con.register("orders", pdf)
        return con.sql(entrymod.oracle_sql()[name]).df()

    def test_jarque_bera(self, spark):
        pdf = _degenerate_orders()
        sdf = jarque_bera(
            spark.createDataFrame(pdf), "o_totalprice", "o_orderpriority",
        ).toPandas().set_index("o_orderpriority").sort_index()
        odf = self._oracle_rows("jarque_bera", pdf)
        odf = odf.set_index("o_orderpriority").sort_index()
        # identical row set: all three groups present on both sides
        assert list(sdf.index) == list(odf.index) == [
            "1-URGENT", "2-HIGH", "3-MEDIUM",
        ]
        assert sdf["n"].tolist() == odf["n"].tolist()
        for g in ("2-HIGH", "3-MEDIUM"):
            assert pd.isna(sdf.loc[g, "jb_stat"])
            assert pd.isna(odf.loc[g, "jb_stat"])
            assert pd.isna(odf.loc[g, "p_value"])
        # and the healthy group still agrees to oracle rounding
        assert round(float(sdf.loc["1-URGENT", "jb_stat"]) + 1e-7, 4) == (
            pytest.approx(float(odf.loc["1-URGENT", "jb_stat"]), abs=1e-9)
        )

    def test_ljung_box(self, spark):
        pdf = _degenerate_orders()
        weekly = (
            spark.createDataFrame(pdf)
            .groupBy(
                "o_orderpriority",
                F.floor(
                    F.unix_date(F.col("o_orderdate").cast("date")) / 7,
                ).cast("long").alias("wk"),
            )
            .agg(F.sum("o_totalprice").alias("rev"))
        )
        sdf = ljung_box(
            weekly, "wk", "rev", "o_orderpriority", max_lag=4,
        ).toPandas().set_index("o_orderpriority").sort_index()
        odf = self._oracle_rows("ljung_box", pdf)
        odf = odf.set_index("o_orderpriority").sort_index()
        assert list(sdf.index) == list(odf.index)
        assert sdf["n"].tolist() == odf["n"].tolist()
        # tiny group: 3 daily rows -> <= 1 weekly row in 1995 weeks is
        # not guaranteed, but n <= 5 certainly holds -> NULL stats;
        # zero-variance group: den == 0 -> NULL stats on both sides
        for g in ("2-HIGH", "3-MEDIUM"):
            assert pd.isna(sdf.loc[g, "lb_stat"]), g
            assert pd.isna(odf.loc[g, "lb_stat"]), g
            assert pd.isna(sdf.loc[g, "p_value"]), g
            assert pd.isna(odf.loc[g, "p_value"]), g
        assert not pd.isna(sdf.loc["1-URGENT", "lb_stat"])
        assert not pd.isna(odf.loc["1-URGENT", "lb_stat"])


class TestDurbinWatsonTies:
    def test_tie_cols_make_dw_deterministic(self, spark):
        """Duplicate order values: without a tiebreak the lag pairing is
        partitioning-dependent; with the documented (t, y, x, tie_cols)
        ordering the statistic is stable across shuffles and matches a
        numpy replay of the same ordering."""
        rng = np.random.RandomState(7)
        rows = []
        for i in range(120):
            t = i // 3  # every timestamp appears 3x
            x = float(rng.normal())
            y = 0.8 * x + float(rng.normal() * 0.3)
            rows.append((i, t, x, y))
        pdf = pd.DataFrame(rows, columns=["rid", "t", "x", "y"])
        df = spark.createDataFrame(pdf)
        a = durbin_watson(
            df.repartition(16), "y", "x", "t", tie_cols=["rid"],
        ).collect()[0]
        b = durbin_watson(
            df.orderBy(F.desc("rid")).coalesce(1), "y", "x", "t",
            tie_cols=["rid"],
        ).collect()[0]
        assert a["dw_stat"] == pytest.approx(b["dw_stat"], rel=1e-12)
        # numpy replay in the documented order
        o = pdf.sort_values(["t", "y", "x", "rid"]).reset_index(drop=True)
        mx, my = o["x"].mean(), o["y"].mean()
        slope = ((o["x"] - mx) * (o["y"] - my)).sum() / (
            (o["x"] - mx) ** 2
        ).sum()
        e = (o["y"] - my - slope * (o["x"] - mx)).to_numpy()
        dw = float((np.diff(e) ** 2).sum() / (e ** 2).sum())
        assert a["dw_stat"] == pytest.approx(dw, rel=1e-9)


class TestPoissonOverflowGuard:
    def test_ill_scaled_covariate_stays_finite(self, spark):
        """An un-normalized covariate in the thousands makes the first
        Newton overshoot push eta*x past exp-overflow without the
        clamp; with it the fit must end finite or NULL — never NaN."""
        from woodwork_spark.operators.regression import poisson_fit

        rng = np.random.RandomState(3)
        rows = []
        for _ in range(200):
            x = float(rng.uniform(1000.0, 5000.0))
            y = float(rng.poisson(math.exp(0.1 + 0.0004 * x)))
            rows.append((y, x))
        df = spark.createDataFrame(rows, ["y", "x"])
        out = poisson_fit(df, "y", "x", iters=8).collect()[0]
        for c in ("intercept", "slope", "se_slope", "loglik"):
            v = out[c]
            assert v is None or math.isfinite(v), (c, v)
        # the true slope is recoverable despite the wild first steps
        if out["slope"] is not None:
            assert out["slope"] == pytest.approx(4e-4, rel=0.5)


def _np_irls(X, y, family, iters):
    """Hand-rolled numpy IRLS — a third algorithm (LAPACK solve) next
    to the operator's unrolled Cholesky and the oracle's Cramer."""
    d = X.shape[1]
    b = np.zeros(d)
    for _ in range(iters):
        eta = X @ b
        if family == "logistic":
            eta = np.clip(eta, -30, 30)
            mu = 1 / (1 + np.exp(-eta))
            w = mu * (1 - mu)
        else:
            eta = np.minimum(eta, 700)
            mu = np.exp(eta)
            w = mu
        A = (X * w[:, None]).T @ X
        try:
            np.linalg.cholesky(A)
        except np.linalg.LinAlgError:
            continue
        b = b + np.linalg.solve(A, X.T @ (y - mu))
    return b


class TestGlmIrlsMulti:
    def test_logistic_k2_recovers_planted(self, spark):
        rng = np.random.RandomState(5)
        n = 3000
        x1 = rng.normal(size=n)
        x2 = rng.uniform(-2, 2, size=n)
        X = np.column_stack([np.ones(n), x1, x2])
        eta = 0.5 - 1.2 * x1 + 0.7 * x2
        y = (rng.uniform(size=n) < 1 / (1 + np.exp(-eta))).astype(float)
        from woodwork_spark.operators.regression import logistic_fit

        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for a, b, c in zip(y, x1, x2)], ["y", "x1", "x2"])
        out = logistic_fit(df, "y", ["x1", "x2"], iters=8).collect()[0]
        bb = _np_irls(X, y, "logistic", 8)
        assert out["intercept"] == pytest.approx(bb[0], abs=1e-8)
        assert out["coef_x1"] == pytest.approx(bb[1], abs=1e-8)
        assert out["coef_x2"] == pytest.approx(bb[2], abs=1e-8)
        # Wald se from the inverse information at the optimum
        etaf = np.clip(X @ bb, -30, 30)
        muf = 1 / (1 + np.exp(-etaf))
        wf = muf * (1 - muf)
        Ainv = np.linalg.inv((X * wf[:, None]).T @ X)
        for j, c in enumerate(("se_intercept", "se_x1", "se_x2")):
            assert out[c] == pytest.approx(
                math.sqrt(Ainv[j, j]), rel=1e-8), c
        assert 0.3 < out["intercept"] < 0.7          # planted 0.5
        assert -1.4 < out["coef_x1"] < -1.0          # planted -1.2
        assert 0.5 < out["coef_x2"] < 0.9            # planted 0.7
        assert out["p_x1"] < 1e-6

    def test_poisson_k2_recovers_planted(self, spark):
        rng = np.random.RandomState(7)
        n = 3000
        x1 = rng.normal(size=n)
        x2 = rng.uniform(-1, 1, size=n)
        X = np.column_stack([np.ones(n), x1, x2])
        lam = np.exp(0.3 + 0.8 * x1 - 0.5 * x2)
        y = rng.poisson(lam).astype(float)
        from woodwork_spark.operators.regression import poisson_fit

        df = spark.createDataFrame(
            [(float(a), float(b), float(c))
             for a, b, c in zip(y, x1, x2)], ["y", "x1", "x2"])
        out = poisson_fit(df, "y", ["x1", "x2"], iters=8).collect()[0]
        bb = _np_irls(X, y, "poisson", 8)
        assert out["intercept"] == pytest.approx(bb[0], abs=1e-8)
        assert out["coef_x1"] == pytest.approx(bb[1], abs=1e-8)
        assert out["coef_x2"] == pytest.approx(bb[2], abs=1e-8)
        assert 0.7 < out["coef_x1"] < 0.9            # planted 0.8

    def test_collinear_group_nulls_healthy_groups_fit(self, spark):
        """x2 == x1 in one group -> singular information -> NULL stats
        for that group only; the PD guard never poisons the others."""
        from woodwork_spark.operators.regression import logistic_fit

        rng = np.random.RandomState(3)
        rows = []
        for i in range(400):
            a, b = rng.normal(), rng.normal()
            e = 0.4 * a - 0.3 * b
            yv = 1.0 if rng.uniform() < 1 / (1 + math.exp(-e)) else 0.0
            rows.append(("ok", yv, float(a), float(b)))
        for i in range(60):
            a = float(rng.normal())
            rows.append(("bad", float(i % 2), a, a))
        df = spark.createDataFrame(rows, ["g", "y", "x1", "x2"])
        out = {r["g"]: r for r in
               logistic_fit(df, "y", ["x1", "x2"], "g", iters=6).collect()}
        assert out["bad"]["coef_x1"] is None
        assert out["bad"]["se_x2"] is None
        assert out["ok"]["coef_x1"] is not None
        assert out["ok"]["n"] == 400

    def test_k1_list_matches_wide_schema(self, spark):
        """A 1-element list takes the IRLS path and must agree with the
        closed-form single-covariate engine."""
        from woodwork_spark.operators.regression import logistic_fit

        rng = np.random.RandomState(9)
        rows = [(float((rng.uniform() < 0.5)), float(rng.normal()))
                for _ in range(500)]
        df = spark.createDataFrame(rows, ["y", "x"])
        wide = logistic_fit(df, "y", ["x"], iters=6).collect()[0]
        slim = logistic_fit(df, "y", "x", iters=6).collect()[0]
        assert wide["intercept"] == pytest.approx(
            slim["intercept"], abs=1e-10)
        assert wide["coef_x"] == pytest.approx(slim["slope"], abs=1e-10)
        assert wide["se_x"] == pytest.approx(slim["se_slope"], abs=1e-10)


def _cox_np(t, d, X, iters):
    """Breslow Newton from 0 with tie-collapsed risk sets — the
    operator's math, LAPACK solve."""
    n, k = X.shape
    b = np.zeros(k)
    order = np.argsort(-t)
    ts, ds, Xs = t[order], d[order], X[order]
    info = None
    for r in range(iters + 1):
        ew = np.exp(Xs @ b)
        S0 = np.cumsum(ew)
        S1 = np.cumsum(Xs * ew[:, None], axis=0)
        S2 = np.cumsum(
            np.einsum("ni,nj->nij", Xs, Xs) * ew[:, None, None], axis=0)
        U = np.zeros(k)
        I = np.zeros((k, k))
        i = 0
        while i < n:
            j = i
            while j + 1 < n and ts[j + 1] == ts[i]:
                j += 1
            s0, s1, s2 = S0[j], S1[j], S2[j]
            dt = ds[i:j + 1].sum()
            dx = (ds[i:j + 1, None] * Xs[i:j + 1]).sum(axis=0)
            r1 = s1 / s0
            U += dx - dt * r1
            I += dt * (s2 / s0 - np.outer(r1, r1))
            i = j + 1
        info = I
        if r < iters:
            b = b + np.linalg.solve(I, U)
    return b, info


class TestCoxMulti:
    def test_k2_recovers_planted_hazard(self, spark):
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(11)
        n = 600
        x1 = rng.normal(size=n)
        x2 = rng.uniform(-1, 1, size=n)
        X = np.column_stack([x1, x2])
        t_ev = rng.exponential(1.0 / np.exp(0.7 * x1 - 0.4 * x2))
        c = rng.exponential(2.0, n)
        obs = np.minimum(t_ev, c)
        d = (t_ev <= c).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b), float(e), float(f))
             for a, b, e, f in zip(obs, d, x1, x2)],
            ["t", "d", "x1", "x2"])
        out = cox_ph_fit(df, "t", "d", ["x1", "x2"], iters=4).collect()[0]
        bref, info = _cox_np(obs, d, X, 4)
        Iinv = np.linalg.inv(info)
        assert out["beta_x1"] == pytest.approx(bref[0], abs=1e-7)
        assert out["beta_x2"] == pytest.approx(bref[1], abs=1e-7)
        assert out["se_x1"] == pytest.approx(
            math.sqrt(Iinv[0, 0]), rel=1e-6)
        assert out["se_x2"] == pytest.approx(
            math.sqrt(Iinv[1, 1]), rel=1e-6)
        assert 0.5 < out["beta_x1"] < 0.9            # planted 0.7
        assert -0.7 < out["beta_x2"] < -0.1          # planted -0.4

    def test_tied_times_share_cell_risk_set(self, spark):
        """Heavy integer-time ties: the per-time CELL collapse must give
        tied subjects identical risk sets (what the RANGE frame did)."""
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(3)
        n = 300
        x1 = rng.normal(size=n)
        x2 = rng.normal(size=n)
        t_ev = np.ceil(rng.exponential(1.0 / np.exp(0.5 * x1)) * 4)
        d = np.ones(n)
        df = spark.createDataFrame(
            [(float(a), 1.0, float(e), float(f))
             for a, e, f in zip(t_ev, x1, x2)], ["t", "d", "x1", "x2"])
        out = cox_ph_fit(df, "t", "d", ["x1", "x2"], iters=4).collect()[0]
        bref, _ = _cox_np(t_ev, d, np.column_stack([x1, x2]), 4)
        assert out["beta_x1"] == pytest.approx(bref[0], abs=1e-7)
        assert out["beta_x2"] == pytest.approx(bref[1], abs=1e-7)


class TestCoxPlanShape:
    def test_ungrouped_no_window_or_sort_over_single_partition(self, spark):
        """Item #3 of the round-9 verdict: the ungrouped fit must not
        sort all rows in one partition.  Exchange SinglePartition may
        appear ONLY as input to a global HashAggregate (the one-row
        score/information folds) — never under a Window or Sort."""
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(1)
        rows = [(float(t), float(dd), float(x)) for t, dd, x in zip(
            rng.exponential(1, 300),
            (rng.uniform(size=300) < 0.7).astype(float),
            rng.normal(size=300))]
        df = spark.createDataFrame(rows, ["t", "d", "x"])

        def _consumers(plan):
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

        for xc in ("x", ["x"]):
            res = cox_ph_fit(df, "t", "d", xc, iters=2)
            plan = res._jdf.queryExecution().executedPlan().toString()
            assert "Window" in plan  # per-bucket suffix-sum windows
            for c in _consumers(plan):
                assert "Window" not in c and "Sort" not in c, c


class TestBlockingBucketCap:
    def _frames(self, spark):
        # 'x' is a degenerate blocking key (everyone shares it);
        # 'p<i>' phones are unique-ish
        left = spark.createDataFrame(
            [(i, "x", f"p{i}") for i in range(40)],
            ["lid", "name", "phone"])
        right = spark.createDataFrame(
            [(100 + i, "x", f"p{i}" if i < 5 else f"q{i}")
             for i in range(40)],
            ["rid", "name", "phone"])
        return left, right

    def test_oversized_bucket_skipped_small_kept(self, spark):
        from woodwork_spark.operators.dedup import blocked_candidates

        left, right = self._frames(spark)
        strategies = [("exact", "name"), ("exact", "phone")]
        capped = blocked_candidates(
            left, right, "lid", "rid", strategies, max_bucket=100,
        ).collect()
        # name bucket (40*40 = 1600 > 100) skipped; 5 phone pairs kept
        assert sorted((r["lid"], r["rid"]) for r in capped) == [
            (i, 100 + i) for i in range(5)
        ]
        full = blocked_candidates(
            left, right, "lid", "rid", strategies,
        ).count()
        assert full == 40 * 40  # phone pairs are inside the cross set

    def test_under_cap_identical_to_uncapped(self, spark):
        from woodwork_spark.operators.dedup import blocked_candidates

        left, right = self._frames(spark)
        strategies = [("exact", "name"), ("prefix", "phone", 2)]
        a = {(r["lid"], r["rid"]) for r in blocked_candidates(
            left, right, "lid", "rid", strategies).collect()}
        b = {(r["lid"], r["rid"]) for r in blocked_candidates(
            left, right, "lid", "rid", strategies,
            max_bucket=10_000).collect()}
        assert a == b

    def test_skip_report(self, spark):
        from woodwork_spark.operators.dedup import blocking_skip_report

        left, right = self._frames(spark)
        rep = {r["strategy"]: r for r in blocking_skip_report(
            left, right, "lid", "rid",
            [("exact", "name"), ("exact", "phone"),
             ("edit", "name", 1)],
            max_bucket=100,
        ).collect()}
        assert rep[0]["n_buckets_skipped"] == 1
        assert rep[0]["n_pairs_skipped"] == 1600
        assert rep[1]["n_buckets_skipped"] == 0
        assert rep[1]["n_pairs_skipped"] == 0
        # edit strategies are not bucket blockers: NULL counts
        assert rep[2]["kind"] == "edit"
        assert rep[2]["n_buckets_skipped"] is None

    def test_record_linkage_passes_cap_through(self, spark):
        from woodwork_spark.operators.dedup import record_linkage

        left, right = self._frames(spark)
        out = record_linkage(
            left, right, "lid", "rid", "name",
            {"phone": (0.9, 0.05)},
            blockers=[("exact", "name"), ("exact", "phone")],
            max_bucket=100,
        ).collect()
        assert len(out) == 5  # only the phone-blocked pairs survive
        # one agreeing field: positive FS evidence on every kept pair
        assert all(r["fs_weight"] > 0 for r in out)


class TestIvfPq:
    def test_recall_vs_bruteforce_l2(self, spark):
        """Probing all cells must contain the exact-L2 top-1 for most
        queries (PQ is lossy, so rank-1 identity is not guaranteed —
        top-5 containment at full probe is the right contract); at
        n_probe < nlist the query's own vector still ranks first."""
        from woodwork_spark.io import read_parquet
        from woodwork_spark.operators.embedding import ivf_pq_search

        emb = read_parquet(
            spark, "/root/testdata/sf0.001/embeddings.parquet")
        qrows = emb.filter("vec_id < 4").select(
            "vec_id", "embedding").collect()
        queries = {f"q{r['vec_id']}": [float(x) for x in r["embedding"]]
                   for r in qrows}
        out = ivf_pq_search(
            emb, "vec_id", "embedding", queries,
            nlist=4, n_probe=4, n_subspaces=4, k=8,
            coarse_iterations=1, pq_iterations=1, top_k=5)
        byq = {}
        for r in out.collect():
            byq.setdefault(r["query_id"], []).append(
                (r["rank"], r["vec_id"]))
        # exact L2 top-1 of each query is itself (distance 0)
        hits = sum(
            1 for qid, got in byq.items()
            if int(qid[1:]) in [v for _, v in got]
        )
        assert hits >= 3, byq  # >= 3 of 4 queries self-recover in top-5

    def test_partial_probe_subsets_full_probe_cells(self, spark):
        """n_probe=1 results must be exactly the full-probe results
        restricted to each query's nearest cell (same codes, same
        LUTs — the probe only prunes)."""
        from woodwork_spark.io import read_parquet
        from woodwork_spark.operators.embedding import ivf_pq_search

        emb = read_parquet(
            spark, "/root/testdata/sf0.001/embeddings.parquet")
        qrows = emb.filter("vec_id < 2").select(
            "vec_id", "embedding").collect()
        queries = {f"q{r['vec_id']}": [float(x) for x in r["embedding"]]
                   for r in qrows}
        kw = dict(nlist=4, n_subspaces=4, k=8, coarse_iterations=1,
                  pq_iterations=1, top_k=50)
        one = ivf_pq_search(emb, "vec_id", "embedding", queries,
                            n_probe=1, **kw).collect()
        four = ivf_pq_search(emb, "vec_id", "embedding", queries,
                             n_probe=4, **kw).collect()
        cells1 = {r["query_id"]: r["cluster"] for r in one}
        f_scores = {(r["query_id"], r["vec_id"]): r["approx_dist"]
                    for r in four}
        for r in one:
            key = (r["query_id"], r["vec_id"])
            # every 1-probe hit in the full-probe map has the same dist
            if key in f_scores:
                assert f_scores[key] == pytest.approx(
                    r["approx_dist"], abs=1e-9)
            assert r["cluster"] == cells1[r["query_id"]]

    def test_bad_probe_params_raise(self, spark):
        from woodwork_spark.io import read_parquet
        from woodwork_spark.operators.embedding import ivf_pq_search

        emb = read_parquet(
            spark, "/root/testdata/sf0.001/embeddings.parquet")
        with pytest.raises(ValueError, match="n_probe"):
            ivf_pq_search(emb, "vec_id", "embedding",
                          {"q": [0.0] * 64}, nlist=4, n_probe=5)


class TestUnigramLmTrain:
    def test_recovers_planted_vocabulary(self, spark):
        """Words composed of the pieces {ab, cde, fg}: after 2 hard-EM
        rounds the trained vocab must carry all three with dominant
        counts, and segmentation under it must use them."""
        import random

        from woodwork_spark.operators.bpe import (
            unigram_lm_train,
            unigram_viterbi_tokenize,
        )

        random.seed(0)
        units = ["ab", "cde", "fg"]
        rows = [
            ("".join(random.choice(units)
                     for _ in range(random.randint(2, 4))),
             random.randint(1, 5))
            for _ in range(200)
        ]
        df = spark.createDataFrame(rows, ["word", "cnt"])
        out = unigram_lm_train(
            df, "word", "cnt", seed_size=50, rounds=2,
            max_piece_len=4, min_count=1)
        res = {r["piece"]: (r["count"], r["logp"]) for r in out.collect()}
        for p in units:
            assert p in res and res[p][0] > 50, (p, res.get(p))
        # every piece's logp is a proper log-probability
        assert all(lp <= 0 for _, lp in res.values())
        # segmentation under the trained vocab covers a fresh composite
        vocab = {p: lp for p, (_, lp) in res.items()}
        seg = unigram_viterbi_tokenize(
            spark.createDataFrame([("abcdefg",)], ["w"]), "w", vocab,
            max_piece_len=4,
        ).collect()[0]
        assert set(seg["piece_str"].split("|")) <= set(vocab)

    def test_single_chars_always_survive(self, spark):
        from woodwork_spark.operators.bpe import unigram_lm_train

        df = spark.createDataFrame(
            [("aaaa", 10), ("bbbb", 10), ("zq", 1)], ["word", "cnt"])
        out = unigram_lm_train(
            df, "word", "cnt", seed_size=3, rounds=2,
            max_piece_len=4, min_count=5)
        res = {r["piece"]: r for r in out.collect()}
        # every corpus character survives even under aggressive pruning
        for ch in "abzq":
            assert ch in res, ch
        # an unused single char sits at the unk floor
        floor = [r for r in res.values() if r["count"] == 0]
        assert all(r["logp"] == -20.0 for r in floor)

    def test_rounds_validation(self, spark):
        from woodwork_spark.operators.bpe import unigram_lm_train

        df = spark.createDataFrame([("ab", 1)], ["word", "cnt"])
        with pytest.raises(ValueError, match="rounds"):
            unigram_lm_train(df, "word", "cnt", rounds=0)


class TestCoxBaselineHazard:
    def test_matches_numpy_breslow(self, spark):
        from woodwork_spark.operators.timeseries import (
            cox_baseline_hazard,
            cox_ph_fit,
            cox_risk_score,
        )

        rng = np.random.RandomState(21)
        n = 300
        x = rng.normal(size=n)
        t_ev = np.ceil(rng.exponential(1.0 / np.exp(0.6 * x)) * 3)
        c = np.ceil(rng.exponential(2.0, n) * 3)
        obs = np.minimum(t_ev, c)
        d = (t_ev <= c).astype(float)
        df = spark.createDataFrame(
            [(float(a), float(b), float(e))
             for a, b, e in zip(obs, d, x)], ["t", "d", "x"])
        model = cox_ph_fit(df, "t", "d", "x", iters=4)
        out = {r["t"]: r for r in cox_baseline_hazard(
            df, "t", "d", "x", model).collect()}
        beta = model.collect()[0]["beta"]
        # numpy Breslow at the same beta
        ew = np.exp(beta * x)
        times = sorted({float(tv) for tv, dv in zip(obs, d) if dv > 0})
        H = 0.0
        for tv in times:
            s0 = ew[obs >= tv].sum()
            dt = d[(obs == tv)].sum()
            H += dt / s0
            r = out[tv]
            assert r["n_events"] == int(dt)
            assert r["s0"] == pytest.approx(s0, rel=1e-9)
            assert r["cum_hazard"] == pytest.approx(H, rel=1e-9)
            assert r["baseline_surv"] == pytest.approx(
                math.exp(-H), rel=1e-9)
        # h_step is the per-time increment, NOT the cumulative (the
        # __h/__H case-collision regression)
        ts = sorted(out)
        if len(ts) > 1:
            assert out[ts[1]]["cum_hazard"] == pytest.approx(
                out[ts[0]]["h_step"] + out[ts[1]]["h_step"], rel=1e-9)
        # risk scoring: exp(beta x) per row
        scored = cox_risk_score(df, model, "x").collect()
        for r in scored[:20]:
            assert r["risk"] == pytest.approx(
                math.exp(beta * r["x"]), rel=1e-9)

    def test_grouped_and_degenerate(self, spark):
        from woodwork_spark.operators.timeseries import (
            cox_baseline_hazard,
            cox_ph_fit,
        )

        rng = np.random.RandomState(5)
        rows = []
        for i in range(100):
            x = float(rng.normal())
            rows.append(("ok", float(np.ceil(
                rng.exponential(1.0 / math.exp(0.5 * x)) * 2)), 1.0, x))
        # degenerate group: no events at all -> NULL beta
        for i in range(10):
            rows.append(("bad", float(i + 1), 0.0, float(rng.normal())))
        df = spark.createDataFrame(rows, ["g", "t", "d", "x"])
        model = cox_ph_fit(df, "t", "d", "x", "g", iters=3)
        out = cox_baseline_hazard(df, "t", "d", "x", model, "g")
        rowsb = out.collect()
        ok_rows = [r for r in rowsb if r["g"] == "ok"]
        bad_rows = [r for r in rowsb if r["g"] == "bad"]
        assert ok_rows and all(r["cum_hazard"] is not None
                               for r in ok_rows)
        # no events in 'bad' -> no event rows at all (row set is event
        # times; a group with zero events contributes none)
        assert bad_rows == []
        # monotone cumulative hazard within the healthy group
        hs = [r["cum_hazard"] for r in sorted(ok_rows,
                                              key=lambda r: r["t"])]
        assert all(b >= a for a, b in zip(hs, hs[1:]))


class TestCoxStrata:
    def test_matches_numpy_stratified_newton(self, spark):
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(17)
        n = 400
        x = rng.normal(size=n)
        strat = rng.randint(0, 3, n)
        scale = np.array([0.5, 1.5, 4.0])[strat]
        t = np.ceil(rng.exponential(scale / np.exp(0.6 * x)) * 8)
        d = np.ones(n)
        df = spark.createDataFrame(
            [(int(s), float(tv), float(dv), float(xv))
             for s, tv, dv, xv in zip(strat, t, d, x)],
            ["seg", "t", "d", "x"])
        out = cox_ph_fit(df, "t", "d", "x", iters=4,
                         strata_cols="seg").collect()[0]

        def ref(iters):
            b = 0.0
            info = None
            for r in range(iters + 1):
                U = I = 0.0
                for sv in set(strat):
                    m = strat == sv
                    ts, ds, xs_ = t[m], d[m], x[m]
                    o = np.argsort(-ts)
                    ts, ds, xs_ = ts[o], ds[o], xs_[o]
                    ew = np.exp(b * xs_)
                    S0, S1 = np.cumsum(ew), np.cumsum(xs_ * ew)
                    S2 = np.cumsum(xs_ * xs_ * ew)
                    i = 0
                    while i < len(ts):
                        j = i
                        while j + 1 < len(ts) and ts[j + 1] == ts[i]:
                            j += 1
                        s0, s1, s2 = S0[j], S1[j], S2[j]
                        dt = ds[i:j + 1].sum()
                        dx = (ds[i:j + 1] * xs_[i:j + 1]).sum()
                        U += dx - dt * s1 / s0
                        I += dt * (s2 / s0 - (s1 / s0) ** 2)
                        i = j + 1
                info = I
                if r < iters and I > 0:
                    b += U / I
            return b, info

        bref, info = ref(4)
        assert out["beta"] == pytest.approx(bref, abs=1e-8)
        assert out["se"] == pytest.approx(1 / math.sqrt(info), rel=1e-8)
        # unattenuated fixture: planted 0.6 recoverable
        assert 0.4 < out["beta"] < 0.8

    def test_single_stratum_equals_plain_fit(self, spark):
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(3)
        rows = [(0, float(tv), 1.0, float(xv)) for tv, xv in zip(
            np.ceil(rng.exponential(1, 200) * 4), rng.normal(size=200))]
        df = spark.createDataFrame(rows, ["one", "t", "d", "x"])
        a = cox_ph_fit(df, "t", "d", "x", iters=3).collect()[0]
        b = cox_ph_fit(df, "t", "d", "x", iters=3,
                       strata_cols="one").collect()[0]
        assert a["beta"] == pytest.approx(b["beta"], abs=1e-10)
        assert a["se"] == pytest.approx(b["se"], abs=1e-10)

    def test_strata_group_overlap_rejected(self, spark):
        from woodwork_spark.operators.timeseries import cox_ph_fit

        df = spark.createDataFrame([(0, 1.0, 1.0, 0.1)],
                                   ["g", "t", "d", "x"])
        with pytest.raises(ValueError, match="disjoint"):
            cox_ph_fit(df, "t", "d", "x", "g", strata_cols="g")


class TestCumulativeIncidence:
    def test_matches_numpy_aalen_johansen(self, spark):
        from woodwork_spark.operators.timeseries import (
            cumulative_incidence,
        )

        rng = np.random.RandomState(9)
        n = 500
        t1 = rng.exponential(2.0, n)
        t2 = rng.exponential(3.0, n)
        c = rng.exponential(4.0, n)
        t = np.ceil(np.minimum.reduce([t1, t2, c]) * 2)
        cause = np.where(t1 <= np.minimum(t2, c), 1,
                         np.where(t2 <= c, 2, 0))
        df = spark.createDataFrame(
            [(float(tv), int(cv)) for tv, cv in zip(t, cause)],
            ["dur", "cause"])
        out = cumulative_incidence(df, "dur", "cause").collect()
        times = np.sort(np.unique(t))
        S = 1.0
        cif = {1: 0.0, 2: 0.0}
        ref = {}
        for tv in times:
            r = (t >= tv).sum()
            d_all = ((t == tv) & (cause != 0)).sum()
            for kk in (1, 2):
                dk = ((t == tv) & (cause == kk)).sum()
                if dk > 0:
                    cif[kk] += S * dk / r
                    ref[(kk, tv)] = cif[kk]
            if d_all > 0:
                S *= 1 - d_all / r
        assert len(out) == len(ref)
        for row in out:
            key = (row["cause"], row["duration"])
            assert row["cif"] == pytest.approx(ref[key], abs=1e-9)
        # partition of unity: sum_k CIF_k(inf) + S(inf) = 1
        total = cif[1] + cif[2] + S
        assert total == pytest.approx(1.0, abs=1e-9)

    def test_single_cause_equals_one_minus_km(self, spark):
        """With ONE cause and no competition, CIF = 1 - KM exactly."""
        from woodwork_spark.operators.timeseries import (
            cumulative_incidence,
            kaplan_meier,
        )

        rng = np.random.RandomState(4)
        t = np.ceil(rng.exponential(2.0, 300) * 3)
        d = (rng.uniform(size=300) < 0.7).astype(int)
        df = spark.createDataFrame(
            [(float(tv), int(dv)) for tv, dv in zip(t, d)],
            ["dur", "cause"])
        cif = {r["duration"]: r["cif"] for r in
               cumulative_incidence(df, "dur", "cause").collect()}
        km = {r["duration"]: r["survival"] for r in
              kaplan_meier(df, "dur", "cause").collect()}
        assert set(cif) == set(km)
        for tv in cif:
            assert cif[tv] == pytest.approx(1.0 - km[tv], abs=1e-9)

    def test_grouped(self, spark):
        from woodwork_spark.operators.timeseries import (
            cumulative_incidence,
        )

        rows = [("a", 1.0, 1), ("a", 2.0, 2), ("a", 3.0, 0),
                ("b", 1.0, 2), ("b", 2.0, 0)]
        df = spark.createDataFrame(rows, ["g", "dur", "cause"])
        out = {(r["g"], r["cause"], r["duration"]): r["cif"]
               for r in cumulative_incidence(
                   df, "dur", "cause", "g").collect()}
        assert out[("a", 1, 1.0)] == pytest.approx(1 / 3)
        # S(2-) = 2/3, d=1, r=2 -> CIF2(2) = 2/3 * 1/2 = 1/3
        assert out[("a", 2, 2.0)] == pytest.approx(1 / 3)
        assert out[("b", 2, 1.0)] == pytest.approx(1 / 2)


class TestIsotonicCalibration:
    def test_minimax_equals_classic_pav(self, spark):
        from woodwork_spark.operators.evaluation import (
            isotonic_calibration,
        )

        rng = np.random.RandomState(0)
        n = 5000
        s = rng.uniform(size=n)
        y = (rng.uniform(size=n) < s ** 2).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(s, y)], ["score", "y"])
        out = sorted(
            isotonic_calibration(df, "score", "y", bins=20).collect(),
            key=lambda r: r["bin"])
        cal = [r["calibrated"] for r in out]
        assert all(b >= a - 1e-12 for a, b in zip(cal, cal[1:]))
        # classic pool-adjacent-violators on the same binned means
        bins = np.minimum((s * 20).astype(int), 19)
        wts = np.array([(bins == b).sum() for b in range(20)], float)
        ys = np.array([y[bins == b].sum() for b in range(20)], float)
        means = ys / wts
        stack = []
        for b in range(20):
            stack.append([means[b], wts[b], 1])
            while len(stack) > 1 and stack[-2][0] >= stack[-1][0]:
                m2, w2, c2 = stack.pop()
                m1, w1, c1 = stack.pop()
                stack.append(
                    [(m1 * w1 + m2 * w2) / (w1 + w2), w1 + w2, c1 + c2])
        pav = []
        for m, w, c in stack:
            pav.extend([m] * c)
        for a, b in zip(cal, pav):
            assert a == pytest.approx(b, abs=1e-9)
        # the recalibrated curve tracks the true s^2 relationship
        mids = [(r["bin"] + 0.5) / 20 for r in out]
        err = float(np.mean([abs(c - m ** 2)
                             for c, m in zip(cal, mids)]))
        assert err < 0.05

    def test_already_isotonic_is_identity(self, spark):
        """Perfectly calibrated data: the fit equals the raw bin rates
        (the case where parallel-PAV block merging degenerates to an
        unbounded driver collect — here it is just bins rows)."""
        from woodwork_spark.operators.evaluation import (
            isotonic_calibration,
        )

        rng = np.random.RandomState(7)
        s = rng.uniform(size=8000)
        y = (rng.uniform(size=8000) < s).astype(int)
        out = isotonic_calibration(
            spark.createDataFrame(
                [(float(a), int(b)) for a, b in zip(s, y)],
                ["score", "y"]),
            "score", "y", bins=10).collect()
        # isotonic projection never moves a monotone sequence much:
        # each calibrated value stays within sampling noise of its rate
        for r in out:
            assert abs(r["calibrated"] - r["raw_rate"]) < 0.05


class TestCoxPhDiagnostic:
    def test_matches_numpy_and_detects_violation(self, spark):
        from woodwork_spark.operators.timeseries import (
            cox_ph_diagnostic,
            cox_ph_fit,
        )

        rng = np.random.RandomState(13)
        n = 600
        x = rng.normal(size=n)
        t = np.ceil(rng.exponential(1.0 / np.exp(0.6 * x)) * 5)
        df = spark.createDataFrame(
            [(float(a), 1.0, float(b)) for a, b in zip(t, x)],
            ["t", "d", "x"])
        m = cox_ph_fit(df, "t", "d", "x", iters=4)
        out = cox_ph_diagnostic(df, "t", "d", "x", m).collect()[0]
        assert out["p_approx"] > 0.01  # PH holds -> quiet
        beta = m.collect()[0]["beta"]
        ew = np.exp(beta * x)
        rs = np.array([
            xi - (x[t >= ti] * ew[t >= ti]).sum() / ew[t >= ti].sum()
            for ti, xi in zip(t, x)
        ])
        cref = np.corrcoef(t, rs)[0, 1]
        assert out["corr"] == pytest.approx(cref, abs=1e-9)
        # planted violation: effect vanishes after t = 1
        t3 = []
        for xi in x:
            tv = rng.exponential(1.0 / math.exp(1.2 * xi))
            if tv > 1.0:
                tv = 1.0 + rng.exponential(1.0)
            t3.append(math.ceil(tv * 5))
        df2 = spark.createDataFrame(
            [(float(a), 1.0, float(b)) for a, b in zip(t3, x)],
            ["t", "d", "x"])
        m2 = cox_ph_fit(df2, "t", "d", "x", iters=4)
        out2 = cox_ph_diagnostic(df2, "t", "d", "x", m2).collect()[0]
        assert out2["p_approx"] < 0.01  # violation flagged


class TestMantelHaenszel:
    def test_matches_hand_computation(self, spark):
        from woodwork_spark.operators.stats_tests import mantel_haenszel

        # classic two-stratum example with a planted common OR ~ 2.5
        rows = []
        tables = {
            "s1": (25, 10, 15, 20),  # a, b, c, d
            "s2": (30, 12, 18, 28),
        }
        for s, (a, b, c, d) in tables.items():
            rows += [(s, 1, 1)] * a + [(s, 1, 0)] * b
            rows += [(s, 0, 1)] * c + [(s, 0, 0)] * d
        df = spark.createDataFrame(rows, ["s", "e", "o"])
        out = mantel_haenszel(
            df, F.col("e") == 1, F.col("o") == 1, "s").collect()[0]
        num = den = sa = se = sv = 0.0
        for a, b, c, d in tables.values():
            n = a + b + c + d
            num += a * d / n
            den += b * c / n
            sa += a
            r1, r0, c1, c0 = a + b, c + d, a + c, b + d
            se += r1 * c1 / n
            sv += r1 * r0 * c1 * c0 / (n * n * (n - 1))
        assert out["or_mh"] == pytest.approx(num / den, rel=1e-12)
        assert out["chi2"] == pytest.approx(
            (sa - se) ** 2 / sv, rel=1e-12)
        assert out["or_mh"] > 1.5  # planted positive association
        assert out["n_strata"] == 2

    def test_no_discordance_nulls(self, spark):
        from woodwork_spark.operators.stats_tests import mantel_haenszel

        # b = c = 0 in every stratum -> OR undefined
        rows = [("s", 1, 1)] * 5 + [("s", 0, 0)] * 5
        df = spark.createDataFrame(rows, ["s", "e", "o"])
        out = mantel_haenszel(
            df, F.col("e") == 1, F.col("o") == 1, "s").collect()[0]
        assert out["or_mh"] is None


class TestMcNemar:
    def test_matches_hand_computation(self, spark):
        from woodwork_spark.operators.stats_tests import mcnemar_test

        rows = (
            [(1, 1)] * 40 + [(0, 0)] * 30 + [(1, 0)] * 25 + [(0, 1)] * 10
        )
        df = spark.createDataFrame(rows, ["before", "after"])
        out = mcnemar_test(
            df, F.col("before") == 1, F.col("after") == 1).collect()[0]
        assert out["b"] == 25 and out["c"] == 10
        assert out["chi2"] == pytest.approx((25 - 10) ** 2 / 35,
                                            rel=1e-12)
        assert out["p_approx"] < 0.05  # real shift
        assert out["n_discordant"] == 35

    def test_no_discordance_nulls(self, spark):
        from woodwork_spark.operators.stats_tests import mcnemar_test

        df = spark.createDataFrame([(1, 1)] * 5 + [(0, 0)] * 5,
                                   ["before", "after"])
        out = mcnemar_test(
            df, F.col("before") == 1, F.col("after") == 1).collect()[0]
        assert out["chi2"] is None and out["p_approx"] is None


class TestWeibullFitKm:
    def test_recovers_planted_parameters(self, spark):
        from woodwork_spark.operators.timeseries import weibull_fit_km

        rng = np.random.RandomState(3)
        n = 4000
        t = 5 * rng.weibull(1.8, n)
        c = rng.exponential(20.0, n)
        obs = np.round(np.minimum(t, c), 1)
        d = (t <= c).astype(int)
        df = spark.createDataFrame(
            [(float(a), int(b)) for a, b in zip(obs, d)], ["t", "d"])
        out = weibull_fit_km(df, "t", "d").collect()[0]
        assert 1.6 < out["shape"] < 2.0   # planted 1.8
        assert 4.5 < out["scale"] < 5.5   # planted 5.0
        assert out["r2"] > 0.98

    def test_exponential_has_unit_shape(self, spark):
        from woodwork_spark.operators.timeseries import weibull_fit_km

        rng = np.random.RandomState(8)
        obs = np.round(rng.exponential(3.0, 3000), 1)
        df = spark.createDataFrame(
            [(float(a) + 0.1, 1) for a in obs], ["t", "d"])
        out = weibull_fit_km(df, "t", "d").collect()[0]
        assert 0.85 < out["shape"] < 1.15  # exponential = Weibull k=1

    def test_degenerate_groups_null(self, spark):
        from woodwork_spark.operators.timeseries import weibull_fit_km

        df = spark.createDataFrame(
            [("a", 1.0, 1), ("b", 2.0, 1), ("b", 2.0, 1)],
            ["g", "t", "d"])
        out = {r["g"]: r for r in
               weibull_fit_km(df, "t", "d", "g").collect()}
        # group a: single event time -> S = 0 at it -> zero usable
        # points; group b: one distinct time -> < 2 points
        for g in out:
            assert out[g]["shape"] is None


class TestOlsFitBy:
    def test_per_group_matches_numpy_lstsq(self, spark):
        from woodwork_spark.operators.regression import ols_fit_by

        rng = np.random.RandomState(2)
        rows = []
        planted = {"a": (1.0, 2.0, -1.0), "b": (-0.5, 0.3, 0.8)}
        for g, (b0, b1, b2) in planted.items():
            for _ in range(800):
                x1, x2 = rng.normal(), rng.uniform(-1, 1)
                y = b0 + b1 * x1 + b2 * x2 + rng.normal(0, 0.4)
                rows.append((g, float(y), float(x1), float(x2)))
        for i in range(30):  # collinear group
            v = float(rng.normal())
            rows.append(("bad", float(i), v, v))
        df = spark.createDataFrame(rows, ["g", "y", "x1", "x2"])
        out = {r["g"]: r for r in
               ols_fit_by(df, "y", ["x1", "x2"], "g").collect()}
        for g in planted:
            sub = [(y, x1, x2) for gg, y, x1, x2 in rows if gg == g]
            Y = np.array([a for a, _, _ in sub])
            X = np.column_stack([
                np.ones(len(sub)),
                [b for _, b, _ in sub], [c for _, _, c in sub]])
            bh, *_ = np.linalg.lstsq(X, Y, rcond=None)
            e = Y - X @ bh
            cov = float(e @ e) / (len(sub) - 3) * np.linalg.inv(X.T @ X)
            r = out[g]
            assert r["intercept"] == pytest.approx(bh[0], abs=1e-8)
            assert r["coef_x1"] == pytest.approx(bh[1], abs=1e-8)
            assert r["coef_x2"] == pytest.approx(bh[2], abs=1e-8)
            assert r["se_intercept"] == pytest.approx(
                math.sqrt(cov[0, 0]), abs=1e-8)
            assert r["se_x1"] == pytest.approx(
                math.sqrt(cov[1, 1]), abs=1e-8)
        assert out["bad"]["coef_x1"] is None
        assert out["bad"]["intercept"] is None

    def test_requires_groups(self, spark):
        from woodwork_spark.operators.regression import ols_fit_by

        df = spark.createDataFrame([(1.0, 1.0)], ["y", "x"])
        with pytest.raises(ValueError, match="group_cols"):
            ols_fit_by(df, "y", ["x"], [])


class TestCoxStrataMulti:
    def test_stratified_two_covariates_matches_numpy(self, spark):
        """strata_cols and the multi-covariate path compose: risk sets
        per stratum, one shared 2x2 Newton system."""
        from woodwork_spark.operators.timeseries import cox_ph_fit

        rng = np.random.RandomState(23)
        n = 400
        x1 = rng.normal(size=n)
        x2 = rng.uniform(-1, 1, size=n)
        strat = rng.randint(0, 2, n)
        scale = np.array([0.8, 3.0])[strat]
        t = np.ceil(rng.exponential(
            scale / np.exp(0.5 * x1 - 0.4 * x2)) * 6)
        df = spark.createDataFrame(
            [(int(s), float(tv), 1.0, float(a), float(b))
             for s, tv, a, b in zip(strat, t, x1, x2)],
            ["seg", "t", "d", "x1", "x2"])
        out = cox_ph_fit(df, "t", "d", ["x1", "x2"], iters=4,
                         strata_cols="seg").collect()[0]

        def ref(iters):
            b = np.zeros(2)
            X = np.column_stack([x1, x2])
            for r in range(iters):
                U = np.zeros(2)
                I = np.zeros((2, 2))
                for sv in (0, 1):
                    m = strat == sv
                    ts, Xs = t[m], X[m]
                    o = np.argsort(-ts)
                    ts, Xs = ts[o], Xs[o]
                    ew = np.exp(Xs @ b)
                    S0 = np.cumsum(ew)
                    S1 = np.cumsum(Xs * ew[:, None], axis=0)
                    S2 = np.cumsum(np.einsum(
                        "ni,nj->nij", Xs, Xs) * ew[:, None, None], axis=0)
                    i = 0
                    while i < len(ts):
                        j = i
                        while j + 1 < len(ts) and ts[j + 1] == ts[i]:
                            j += 1
                        s0, s1, s2 = S0[j], S1[j], S2[j]
                        dt = j - i + 1
                        dx = Xs[i:j + 1].sum(axis=0)
                        r1 = s1 / s0
                        U += dx - dt * r1
                        I += dt * (s2 / s0 - np.outer(r1, r1))
                        i = j + 1
                b = b + np.linalg.solve(I, U)
            return b

        bref = ref(4)
        assert out["beta_x1"] == pytest.approx(bref[0], abs=1e-7)
        assert out["beta_x2"] == pytest.approx(bref[1], abs=1e-7)

    def test_per_stratum_baseline_via_group_cols(self, spark):
        """The documented recipe: per-stratum baseline curves =
        cox_baseline_hazard with the stratum in group_cols, using the
        stratified fit's shared beta broadcast to both strata."""
        from woodwork_spark.operators.timeseries import (
            cox_baseline_hazard,
            cox_ph_fit,
        )

        rng = np.random.RandomState(2)
        rows = []
        for s, scale in ((0, 1.0), (1, 4.0)):
            for _ in range(150):
                x = float(rng.normal())
                rows.append((s, float(np.ceil(
                    rng.exponential(scale / math.exp(0.5 * x)) * 3)),
                    1.0, x))
        df = spark.createDataFrame(rows, ["seg", "t", "d", "x"])
        fit = cox_ph_fit(df, "t", "d", "x", iters=3, strata_cols="seg")
        beta = fit.collect()[0]["beta"]
        # one-row model -> broadcast the shared beta to every stratum
        model = df.select("seg").distinct().crossJoin(
            fit.select("beta"))
        out = cox_baseline_hazard(df, "t", "d", "x", model, "seg")
        rowsb = out.collect()
        by_seg = {}
        for r in rowsb:
            by_seg.setdefault(r["seg"], []).append(r)
        assert set(by_seg) == {0, 1}
        # each stratum's curve is monotone and the slower stratum (4x
        # scale) accumulates hazard more slowly at matched times
        for s in (0, 1):
            hs = [r["cum_hazard"] for r in
                  sorted(by_seg[s], key=lambda r: r["t"])]
            assert all(b >= a for a, b in zip(hs, hs[1:]))
        h0 = {r["t"]: r["cum_hazard"] for r in by_seg[0]}
        h1 = {r["t"]: r["cum_hazard"] for r in by_seg[1]}
        common = sorted(set(h0) & set(h1))[2:]  # past the noisy head
        assert common
        assert np.median([h0[t] - h1[t] for t in common]) > 0


def test_no_duplicate_query_registrations():
    """A second QUERIES[key] assignment silently REPLACES the first in
    the registry (dict semantics) — exactly how the round-10 minimax
    query shadowed the driver-kernel isotonic_calibration until a
    count mismatch surfaced it.  Scan the source for duplicate
    registrations of either form (subscript or dict literal)."""
    import collections
    import re

    src = open("/root/repo/__spark_entry__.py").read()
    keys = re.findall(r'QUERIES\["([a-z0-9_]+)"\]\s*=', src)
    keys += re.findall(r'^\s+"([a-z0-9_]+)": q_', src, re.M)
    dups = [k for k, c in collections.Counter(keys).items() if c > 1]
    assert not dups, f"duplicate QUERIES registrations: {dups}"
    okeys = re.findall(r'ORACLE\["([a-z0-9_]+)"\]\s*=', src)
    odups = [k for k, c in collections.Counter(okeys).items() if c > 1]
    # ORACLE self-reassignment (build-then-patch) is allowed only when
    # it patches its OWN key immediately (the weibull_fit replace);
    # flag anything registered from two distinct sites
    assert all(k == "weibull_fit" for k in odups), (
        f"duplicate ORACLE registrations: {odups}"
    )
