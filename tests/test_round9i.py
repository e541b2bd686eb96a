"""Round-9 (continuation): depth-2 greedy decision tree goldens."""

import numpy as np
import pytest

from woodwork_spark.operators.tree import greedy_tree_fit


def _plant(rng, n=2000):
    rows = []
    for _ in range(n):
        x1, x2 = rng.rand(), rng.rand()
        y = (x1 <= 0.5 and x2 <= 0.3) or (x1 > 0.5 and x2 > 0.7)
        if rng.rand() < 0.05:
            y = not y
        rows.append((float(round(x1, 2)), float(round(x2, 2)), bool(y)))
    return rows


class TestGreedyTree:
    def test_recovers_planted_structure(self, spark):
        rng = np.random.RandomState(0)
        df = spark.createDataFrame(_plant(rng), ["x1", "x2", "y"])
        t = {r["node"]: r for r in
             greedy_tree_fit(df, ["x1", "x2"], "y", max_depth=2).collect()}
        assert t[""]["kind"] == "split"
        assert t["L"]["kind"] == "split" and t["R"]["kind"] == "split"
        leaves = [t[k] for k in ("LL", "LR", "RL", "RR")]
        assert all(v["kind"] == "leaf" for v in leaves)
        assert sum(v["n"] for v in leaves) == 2000
        # the three split features must cover both x1 and x2 (the
        # planted interaction is not expressible by one variable)
        feats = {t[k]["feature"] for k in ("", "L", "R")}
        assert feats == {"x1", "x2"}
        # greedy depth-2 can't purify every leaf of an XOR-like target
        # (one branch would need both features); it still must purify
        # most leaves and beat the base rate overall by a wide margin
        purities = sorted(
            max(v["n_pos"], v["n"] - v["n_pos"]) / v["n"] for v in leaves
        )
        assert purities[1] > 0.85  # at least 3 of 4 leaves one-sided
        correct = sum(max(v["n_pos"], v["n"] - v["n_pos"]) for v in leaves)
        assert correct / 2000 > 0.75

    def test_pure_node_becomes_leaf(self, spark):
        # perfectly separable by x1: depth 2 must stop after one split
        rows = [(float(i), bool(i >= 50)) for i in range(100)]
        df = spark.createDataFrame(rows, ["x1", "y"])
        t = {r["node"]: r for r in
             greedy_tree_fit(df, ["x1"], "y", max_depth=2).collect()}
        assert t[""]["kind"] == "split"
        assert t[""]["threshold"] == pytest.approx(49.0)
        assert t["L"]["kind"] == "leaf" and t["L"]["n_pos"] == 0
        assert t["R"]["kind"] == "leaf" and t["R"]["n_pos"] == 50

    def test_no_signal_yields_single_leaf(self, spark):
        rows = [(1.0, bool(i % 2)) for i in range(100)]
        df = spark.createDataFrame(rows, ["x1", "y"])
        t = greedy_tree_fit(df, ["x1"], "y", max_depth=2).collect()
        assert len(t) == 1
        assert t[0]["node"] == "" and t[0]["kind"] == "leaf"
        assert t[0]["n"] == 100 and t[0]["n_pos"] == 50

    def test_depth_validation(self, spark):
        df = spark.createDataFrame([(1.0, True)], ["x1", "y"])
        with pytest.raises(ValueError):
            greedy_tree_fit(df, ["x1"], "y", max_depth=0)
        with pytest.raises(ValueError):
            greedy_tree_fit(df, ["x1"], "y", max_depth=5)

    def test_gain_matches_brute_force(self, spark):
        rng = np.random.RandomState(5)
        rows = [(float(rng.randint(0, 10)), bool(rng.rand() < 0.4))
                for _ in range(500)]
        df = spark.createDataFrame(rows, ["x1", "y"])
        t = {r["node"]: r for r in
             greedy_tree_fit(df, ["x1"], "y", max_depth=1).collect()}
        xs = np.array([r[0] for r in rows])
        ys = np.array([1.0 if r[1] else 0.0 for r in rows])
        n = len(ys)
        parent = 2 * ys.sum() * (n - ys.sum()) / n ** 2
        best_gain, best_thr = -1.0, None
        for thr in sorted(set(xs))[:-1]:
            m = xs <= thr
            pl, nl = ys[m].sum(), m.sum() - ys[m].sum()
            pr, nr = ys[~m].sum(), (~m).sum() - ys[~m].sum()
            cost = 2 * (pl * nl / (pl + nl) + pr * nr / (pr + nr)) / n
            g = parent - cost
            if g > best_gain:
                best_gain, best_thr = g, thr
        assert t[""]["threshold"] == pytest.approx(best_thr)
        assert t[""]["gain"] == pytest.approx(best_gain, rel=1e-9)
