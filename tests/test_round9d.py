"""Round-9 (continuation): RAKE, shard manifest, ROUGE-L goldens."""

import hashlib

import pytest
import pyspark.sql.functions as F

from woodwork_spark.operators.curation import rake_keywords
from woodwork_spark.operators.evaluation import rouge_l_scores
from woodwork_spark.operators.quality_checks import shard_manifest


class TestRake:
    def test_classic_example(self, spark):
        # degree/freq hand-check on a tiny document
        df = spark.createDataFrame(
            [(1, "deep learning is the fast deep model of deep learning")],
            ["id", "text"],
        )
        out = rake_keywords(df, "id", "text", top_k=10).collect()
        rows = {r["phrase"]: r for r in out}
        # phrases: "deep learning" (x2), "fast deep model"
        assert set(rows) == {"deep learning", "fast deep model"}
        # word stats: deep f=3 d=2+2+3=7; learning f=2 d=4; fast f=1 d=3;
        # model f=1 d=3
        dl = rows["deep learning"]
        assert dl["n_occ"] == 2 and dl["n_words"] == 2
        # score = floor(1e6*7/3)/1e6 + floor(1e6*4/2)/1e6
        assert dl["score"] == pytest.approx(2333333 / 1e6 + 2.0, abs=1e-9)
        fdm = rows["fast deep model"]
        assert fdm["score"] == pytest.approx(
            3.0 + 2333333 / 1e6 + 3.0, abs=1e-9)
        # 3-word phrase outranks the repeated 2-word one
        assert fdm["rank"] == 1 and dl["rank"] == 2

    def test_stopword_only_doc_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "the of and a"), (2, "spark shuffle")], ["id", "text"])
        out = rake_keywords(df, "id", "text").collect()
        assert {r["id"] for r in out} == {2}

    def test_rank_tiebreak_is_phrase_order(self, spark):
        # two distinct single-word phrases with identical scores
        df = spark.createDataFrame(
            [(1, "alpha the beta")], ["id", "text"])
        out = sorted(
            rake_keywords(df, "id", "text").collect(),
            key=lambda r: r["rank"],
        )
        assert [r["phrase"] for r in out] == ["alpha", "beta"]
        assert all(r["score"] == 1.0 for r in out)


class TestShardManifest:
    def test_checksums_are_order_and_partition_free(self, spark):
        rows = [(i, f"doc body {i}") for i in range(200)]
        df1 = spark.createDataFrame(rows, ["id", "text"]).repartition(7)
        df2 = spark.createDataFrame(rows[::-1], ["id", "text"]).coalesce(1)
        m1 = {r["shard"]: r for r in
              shard_manifest(df1, "id", "text", 4, "s").collect()}
        m2 = {r["shard"]: r for r in
              shard_manifest(df2, "id", "text", 4, "s").collect()}
        assert m1.keys() == m2.keys()
        for s in m1:
            for c in ("n_docs", "n_chars", "checksum_a", "checksum_b",
                      "min_id", "max_id"):
                assert m1[s][c] == m2[s][c], (s, c)

    def test_single_char_change_trips_checksum(self, spark):
        rows = [(i, f"doc body {i}") for i in range(50)]
        changed = list(rows)
        changed[17] = (17, "doc bodY 17")
        a = {r["shard"]: (r["checksum_a"], r["checksum_b"]) for r in
             shard_manifest(spark.createDataFrame(rows, ["id", "text"]),
                            "id", "text", 4, "s").collect()}
        b = {r["shard"]: (r["checksum_a"], r["checksum_b"]) for r in
             shard_manifest(spark.createDataFrame(changed, ["id", "text"]),
                            "id", "text", 4, "s").collect()}
        assert a != b

    def test_shard_assignment_matches_md5_convention(self, spark):
        rows = [(i, "x") for i in range(40)]
        out = shard_manifest(
            spark.createDataFrame(rows, ["id", "text"]), "id", "text",
            8, "prov",
        ).collect()
        # recompute one doc's shard in pure python
        def shard_of(i):
            h = hashlib.md5(f"prov{i}".encode()).hexdigest()[:8]
            return int(h, 16) % 8
        seen = {r["shard"] for r in out}
        assert shard_of(0) in seen
        total = sum(r["n_docs"] for r in out)
        assert total == 40


def _py_lcs(a, b):
    m = len(b)
    prev = [0] * (m + 1)
    for x in a:
        cur = [0] * (m + 1)
        for j in range(1, m + 1):
            cur[j] = prev[j - 1] + 1 if x == b[j - 1] else max(
                prev[j], cur[j - 1])
        prev = cur
    return prev[m]


class TestRougeL:
    def test_known_values(self, spark):
        cases = [
            (1, ["a", "b", "c", "d"], ["a", "x", "c", "y"]),       # lcs 2
            (2, ["a", "b"], ["a", "b"]),                           # lcs 2
            (3, ["a", "b"], ["c", "d"]),                           # lcs 0
            (4, ["the", "cat", "sat"], ["cat", "the", "sat"]),     # lcs 2
            (5, [], ["a"]),                                        # empty
        ]
        df = spark.createDataFrame(cases, ["id", "ref", "cand"])
        out = {r["id"]: r for r in
               rouge_l_scores(df, "ref", "cand").collect()}
        for i, ref, cand in cases:
            assert out[i]["lcs"] == _py_lcs(ref, cand), i
        assert out[2]["rouge_l_f"] == 1.0
        assert out[3]["rouge_l_f"] == 0.0
        assert out[5]["rouge_l_f"] == 0.0  # empty scores 0, not null
        r4 = out[4]
        assert r4["rouge_l_p"] == pytest.approx(2 / 3)
        assert r4["rouge_l_r"] == pytest.approx(2 / 3)

    def test_prefix_max_recurrence_equals_classic(self, spark):
        # the oracle's dp'[j] = max(dp[j], max_{k<=j}(dp[k-1]+m_k)) form
        # must equal the classic recurrence on random token streams
        import random
        rng = random.Random(42)
        for _ in range(50):
            a = [rng.choice("abcde") for _ in range(rng.randint(0, 12))]
            b = [rng.choice("abcde") for _ in range(rng.randint(0, 12))]
            prev = [0] * (len(b) + 1)
            for i in range(len(a)):
                new = [0] * (len(b) + 1)
                for j in range(1, len(b) + 1):
                    c = max(
                        (prev[k - 1] + (1 if a[i] == b[k - 1] else 0))
                        for k in range(1, j + 1)
                    )
                    new[j] = max(prev[j], c)
                prev = new
            assert prev[len(b)] == _py_lcs(a, b), (a, b)

    def test_batch_udf_not_row_python(self, spark):
        df = spark.createDataFrame(
            [(["a"], ["a"])], ["ref", "cand"])
        plan = rouge_l_scores(
            df, "ref", "cand",
        )._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in plan  # vectorized, Arrow-batched
        assert "BatchEvalPython" not in plan  # never row-at-a-time
