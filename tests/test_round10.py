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
