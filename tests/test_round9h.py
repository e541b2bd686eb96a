"""Round-9 (continuation): unigram Viterbi tokenizer and product
quantization — goldens against independent reference implementations."""

import numpy as np
import pytest

from woodwork_spark.operators.bpe import unigram_viterbi_tokenize
from woodwork_spark.operators.embedding import pq_codes


def _viterbi_ref(word, vocab, unk=-20.0, mpl=8):
    n = len(word)
    best = [0.0] + [None] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        bs, bl = None, 0
        for ln in range(1, min(mpl, i) + 1):
            lp = vocab.get(word[i - ln:i])
            if lp is None:
                if ln == 1:
                    lp = unk
                else:
                    continue
            sc = best[i - ln] + lp
            if bs is None or sc > bs or (sc == bs and ln > bl):
                bs, bl = sc, ln
        best[i], back[i] = bs, bl
    pieces, pos = [], n
    while pos > 0:
        pieces.append(word[pos - back[pos]:pos])
        pos -= back[pos]
    return "|".join(reversed(pieces)), best[n]


VOCAB = {
    "t": -3.0, "a": -2.0, "b": -3.5, "l": -2.9, "e": -2.2,
    "ta": -3.0, "ble": -4.0, "table": -5.5, "ab": -3.4,
}


class TestUnigramViterbi:
    def test_whole_word_beats_pieces(self, spark):
        df = spark.createDataFrame([("table",)], ["w"])
        out = unigram_viterbi_tokenize(df, "w", VOCAB).collect()[0]
        # 'table' = -5.5 vs 'ta|ble' = -7.0 vs chars = -13.1ish
        assert out["piece_str"] == "table"
        assert out["logp"] == pytest.approx(-5.5)

    def test_matches_reference_on_random_words(self, spark):
        import random
        rng = random.Random(99)
        words = [
            "".join(rng.choice("table") for _ in range(rng.randint(1, 12)))
            for _ in range(60)
        ]
        df = spark.createDataFrame([(w,) for w in set(words)], ["w"])
        got = {r["w"]: (r["piece_str"], r["logp"]) for r in
               unigram_viterbi_tokenize(df, "w", VOCAB).collect()}
        for w in set(words):
            ps, lp = _viterbi_ref(w, VOCAB)
            assert got[w][0] == ps, w
            assert got[w][1] == pytest.approx(lp, abs=1e-12), w

    def test_unk_fallback_single_chars(self, spark):
        df = spark.createDataFrame([("xyz",)], ["w"])
        out = unigram_viterbi_tokenize(df, "w", VOCAB).collect()[0]
        assert out["piece_str"] == "x|y|z"
        assert out["logp"] == pytest.approx(-60.0)

    def test_longest_piece_wins_ties(self, spark):
        # 'ab' (-3.4) vs 'a'+'b' (-5.5): not a tie; construct one:
        vocab = {"a": -1.0, "b": -1.0, "ab": -2.0}
        df = spark.createDataFrame([("ab",)], ["w"])
        out = unigram_viterbi_tokenize(df, "w", vocab).collect()[0]
        assert out["piece_str"] == "ab"  # equal score, longer piece wins

    def test_null_and_empty(self, spark):
        df = spark.createDataFrame([(None,), ("",)], "w string")
        rows = unigram_viterbi_tokenize(df, "w", VOCAB).collect()
        assert all(r["piece_str"] is None and r["logp"] is None
                   for r in rows)

    def test_segmentation_reconstructs_word(self, spark):
        import random
        rng = random.Random(7)
        words = list({
            "".join(rng.choice("ablet") for _ in range(rng.randint(1, 10)))
            for _ in range(40)
        })
        df = spark.createDataFrame([(w,) for w in words], ["w"])
        for r in unigram_viterbi_tokenize(df, "w", VOCAB).collect():
            assert r["piece_str"].replace("|", "") == r["w"]


class TestPQ:
    def test_codes_and_reconstruction(self, spark):
        rng = np.random.RandomState(21)
        # 3 planted clusters in each half-space
        rows = []
        for i in range(90):
            v = np.concatenate([
                rng.normal(5.0 * (i % 3), 0.1, 8),
                rng.normal(-4.0 * (i % 3), 0.1, 8),
            ])
            rows.append((i, [float(x) for x in v]))
        df = spark.createDataFrame(rows, ["id", "v"])
        # k = number of planted clusters: seeds 0/1/2 land one per
        # cluster, so every member must code with its cluster's centroid
        out = pq_codes(df, "id", "v", n_subspaces=2, k=3,
                       iterations=3).collect()
        assert len(out) == 90
        codes = {r["id"]: r["code_str"] for r in out}
        for i in range(3, 90):
            assert codes[i] == codes[i % 3], i
        # reconstruction error is small for tight clusters
        errs = [r["recon_err"] for r in out]
        assert float(np.median(errs)) < 5.0

    def test_code_cardinality_bounded(self, spark):
        rng = np.random.RandomState(22)
        rows = [(i, [float(x) for x in rng.normal(size=16)])
                for i in range(60)]
        df = spark.createDataFrame(rows, ["id", "v"])
        out = pq_codes(df, "id", "v", n_subspaces=4, k=4,
                       iterations=2).collect()
        for r in out:
            parts = r["code_str"].split("|")
            assert len(parts) == 4
            assert all(0 <= int(c) < 4 for c in parts)

    def test_indivisible_length_raises(self, spark):
        df = spark.createDataFrame([(0, [1.0, 2.0, 3.0])], ["id", "v"])
        with pytest.raises(ValueError, match="divisible"):
            pq_codes(df, "id", "v", n_subspaces=2, k=2)


class TestPQSearch:
    def test_self_query_ranks_first(self, spark):
        import numpy as np

        from woodwork_spark.operators.embedding import pq_search
        rng = np.random.RandomState(33)
        rows = [(i, [float(x) for x in rng.normal(size=16)])
                for i in range(80)]
        df = spark.createDataFrame(rows, ["id", "v"])
        queries = {"q7": rows[7][1], "q40": rows[40][1]}
        out = pq_search(df, "id", "v", queries, n_subspaces=2, k=8,
                        iterations=2, top_k=5).collect()
        byq = {}
        for r in out:
            byq.setdefault(r["query_id"], []).append(r)
        for qid, target in (("q7", 7), ("q40", 40)):
            got = sorted(byq[qid], key=lambda r: r["rank"])
            assert len(got) == 5
            # lossy code, but the query's own vector must land in the
            # top-5 bucket (it shares its own code exactly)
            assert target in [r["id"] for r in got], qid

    def test_adc_equals_bruteforce_on_codes(self, spark):
        # ADC score must equal the exact distance between the query and
        # the RECONSTRUCTION (centroid concatenation) of each item
        import numpy as np

        from woodwork_spark.operators.embedding import (
            _pq_train,
            pq_codes,
            pq_search,
        )
        rng = np.random.RandomState(34)
        rows = [(i, [float(x) for x in rng.normal(size=8)])
                for i in range(40)]
        df = spark.createDataFrame(rows, ["id", "v"])
        q = {"q0": rows[0][1]}
        out = {r["id"]: r["approx_dist"] for r in pq_search(
            df, "id", "v", q, n_subspaces=2, k=4, iterations=2,
            top_k=40).collect()}
        cents, pts = _pq_train(df, "id", "v", 2, 4, 2, 6)
        pts.unpersist()
        codes = {r["id"]: [int(c) for c in r["code_str"].split("|")]
                 for r in pq_codes(df, "id", "v", n_subspaces=2, k=4,
                                   iterations=2).collect()}
        qv = rows[0][1]
        for i, dist in out.items():
            recon = cents[(0, codes[i][0])] + cents[(1, codes[i][1])]
            exact = sum((a - b) ** 2 for a, b in zip(qv, recon))
            assert dist == pytest.approx(exact, abs=2e-5), i
