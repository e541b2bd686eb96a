"""Curation operators: source-level quality governance, TF-IDF, BM25,
global line dedup, and SCD stream enrichment."""

import math

from pyspark.sql import functions as F

from woodwork_spark.operators.curation import (
    bm25_search,
    filter_by_source_quality,
    source_quality_report,
    tfidf_top_terms,
)


def test_source_quality_report_counts_and_dup_fraction(spark):
    rows = [
        # good: 4 docs, all distinct
        (1, "good", "the cat sat on the mat and it was fine today."),
        (2, "good", "this is a perfectly normal sentence with many words."),
        (3, "good", "it was the best of times, it was the worst of times."),
        (4, "good", "not all those who wander are lost in the woods."),
        # spammy: 4 docs, 2 exact dups (after normalization)
        (5, "spam", "BUY  NOW!!! buy now"),
        (6, "spam", "buy now!!! BUY NOW"),
        (7, "spam", "zzz"),
        (8, "spam", "click here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    rep = {r["source"]: r for r in source_quality_report(df, "source", "text").collect()}
    assert rep["good"]["n_docs"] == 4 and rep["spam"]["n_docs"] == 4
    # 'buy now!!! buy now' normalizes identically for docs 5 and 6
    assert abs(rep["spam"]["dup_fraction"] - 0.25) < 1e-9
    assert rep["good"]["dup_fraction"] == 0.0
    assert rep["good"]["avg_quality"] > rep["spam"]["avg_quality"]


def test_filter_by_source_quality_broadcast_drop(spark):
    rows = [
        (1, "good", "the cat sat on the mat and it was fine today."),
        (2, "good", "it was the best of times and the worst of times."),
        (3, "junk", "z z"),
        (4, "junk", "q q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    kept = filter_by_source_quality(df, "source", "text", min_avg_quality=0.3)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [1, 2]
    # the verdict side must be broadcast — no shuffle of the corpus
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_tfidf_top_terms(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry date"),
        (3, "apple date date date"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=2)
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"]) for r in out.collect()}
    n = 3
    idf = {t: math.log((1 + n) / (1 + d)) + 1 for t, d in
           {"apple": 2, "banana": 2, "cherry": 2, "date": 2}.items()}
    # doc 1: apple tf=2 -> 2*idf beats banana/cherry tf=1
    assert got[(1, 1)][0] == "apple" and got[(1, 1)][1] == 2
    # doc 1 rank 2: banana vs cherry tie on tfidf -> term asc
    assert got[(1, 2)][0] == "banana"
    # doc 2: cherry tf=2 wins
    assert got[(2, 1)][0] == "cherry"
    # doc 3: date tf=3 wins
    assert got[(3, 1)][0] == "date" and got[(3, 1)][1] == 3
    # every doc has exactly k rows
    assert len(got) == 6
    # spot-check a value
    row = [r for r in out.collect() if r["doc_id"] == 3 and r["rank"] == 1][0]
    assert abs(row["tfidf"] - 3 * idf["date"]) < 1e-9


def test_bm25_search_ranks_and_score(spark):
    rows = [
        (1, "spark query engine"),
        (2, "spark spark spark tuning"),
        (3, "cooking pasta recipe"),
        (4, "query planner internals"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_search(
        df, "doc_id", "text", {"q1": "spark query"}, top_k=3,
    ).collect()
    assert all(r["query_id"] == "q1" for r in out)
    ranked = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # doc 3 shares no term -> absent; doc 1 matches both terms -> first
    assert 3 not in ranked
    assert ranked[0] == 1
    assert set(ranked) == {1, 2, 4}
    # hand-compute doc 1's score: N=4, dl=3, avgdl=3.25
    n, k1, b = 4, 1.2, 0.75
    avgdl = (3 + 4 + 3 + 3) / 4.0
    def idf(dfreq):
        return math.log(1 + (n - dfreq + 0.5) / (dfreq + 0.5))
    def term(tf, dfreq, dl):
        return idf(dfreq) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    expected = term(1, 2, 3) + term(1, 2, 3)  # spark df=2, query df=2
    got = [r["score"] for r in out if r["doc_id"] == 1][0]
    assert abs(got - expected) < 1e-9


def test_bm25_empty_queries_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_search(df, "doc_id", "text", {})


def test_dedup_lines_global_first_occurrence(spark):
    from woodwork_spark.operators.cleaning import dedup_lines_global

    rows = [
        (1, "alpha\nshared line\nbeta"),
        (2, "shared line\ngamma\nshared line"),
        (3, "delta\n\nepsilon"),   # blank line must survive
        (4, None),                  # NULL stays NULL
        (5, "shared line"),         # whole doc was a dup -> empty text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text"] for r in
           dedup_lines_global(df, "text", "doc_id").collect()}
    assert out[1] == "alpha\nshared line\nbeta"   # first occurrence kept
    assert out[2] == "gamma"                       # both copies dropped
    assert out[3] == "delta\n\nepsilon"
    assert out[4] is None
    assert out[5] == ""


def test_dedup_lines_global_intra_doc_repeat(spark):
    from woodwork_spark.operators.cleaning import dedup_lines_global

    df = spark.createDataFrame(
        [(1, "x\ny\nx\nx")], "doc_id long, text string",
    )
    out = dedup_lines_global(df, "text", "doc_id").collect()[0]["text"]
    assert out == "x\ny"


def test_enrich_stream_with_scd_batch_semantics(spark):
    """Same plan batch/stream: verify as-of attribution on a batch frame
    — an event picks the dim version valid at its EVENT time."""
    import datetime as dt

    from woodwork_spark.streaming import enrich_stream_with_scd

    t = lambda d: dt.datetime(2024, d, 1)
    dim = spark.createDataFrame(
        [
            (7, t(1), t(6), "bronze"),
            (7, t(6), None, "gold"),     # current version, open-ended
            (8, t(1), None, "silver"),
        ],
        "user_id long, valid_from timestamp, valid_to timestamp, tier string",
    )
    events = spark.createDataFrame(
        [
            (100, t(3), 7),   # before the change -> bronze
            (101, t(6), 7),   # boundary: half-open [from, to) -> gold
            (102, t(9), 7),   # after -> gold
            (103, t(2), 8),   # silver
            (104, t(2), 9),   # no dim row -> left join NULL
        ],
        "event_id long, ts timestamp, user_id long",
    )
    out = {r["event_id"]: r["tier"] for r in
           enrich_stream_with_scd(events, dim, "user_id").collect()}
    assert out == {100: "bronze", 101: "gold", 102: "gold",
                   103: "silver", 104: None}


def test_enrich_stream_with_scd_streaming_run(spark, tmp_path):
    """Actually run it as a stream: file source -> SCD join -> memory
    sink; results equal the batch run (stream-static join, no state)."""
    import datetime as dt
    import uuid

    from woodwork_spark.streaming import enrich_stream_with_scd

    t = lambda d: dt.datetime(2024, d, 1)
    events = spark.createDataFrame(
        [(i, t(1 + i % 11), 7 if i % 2 == 0 else 8) for i in range(40)],
        "event_id long, ts timestamp, user_id long",
    )
    path = str(tmp_path / "ev")
    events.write.parquet(path)
    dim = spark.createDataFrame(
        [
            (7, t(1), t(6), "bronze"),
            (7, t(6), None, "gold"),
            (8, t(1), None, "silver"),
        ],
        "user_id long, valid_from timestamp, valid_to timestamp, tier string",
    )
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .parquet(path)
    )
    enriched = enrich_stream_with_scd(stream, dim, "user_id")
    name = f"scd_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.format("memory").queryName(name)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {r["event_id"]: r["tier"] for r in spark.sql(f"SELECT * FROM {name}").collect()}
    want = {r["event_id"]: r["tier"] for r in
            enrich_stream_with_scd(events, dim, "user_id").collect()}
    assert got == want and len(got) == 40


def test_dedup_against_corpus_exact(spark):
    from woodwork_spark.operators.dedup import dedup_against_corpus

    corpus = spark.createDataFrame(
        [(100, "the quick brown fox"), (101, "hello world")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, "Hello   WORLD"),          # dup of corpus 101 (normalized)
            (2, "something entirely new"),
            (3, "something  ENTIRELY new"),  # dup of 2 within batch
            (4, "another fresh document"),
        ],
        "doc_id long, text string",
    )
    out = dedup_against_corpus(batch, corpus, "text", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [2, 4]


def test_dedup_against_corpus_near(spark):
    from woodwork_spark.operators.dedup import dedup_against_corpus

    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    corpus = spark.createDataFrame(
        [(100, base), (101, "completely unrelated corpus text about cooking pasta dishes")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (1, base.replace("today", "tonight")),  # near-dup of corpus 100
            (2, "fresh topic discussing spark query optimization techniques in depth"),
        ],
        "doc_id long, text string",
    )
    out = dedup_against_corpus(
        batch, corpus, "text", "doc_id", near=True, threshold=0.5,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == [2]


def test_psi_drift_report_values(spark):
    import math

    from woodwork_spark.operators.curation import psi_drift_report

    a = spark.createDataFrame(
        [(float(i % 10), "x" if i % 2 == 0 else "y") for i in range(100)],
        "v double, c string",
    )
    # b: v shifted up, c distribution changed to 80/20
    b = spark.createDataFrame(
        [(float(i % 10) + 3.0, "x" if i % 5 != 0 else "y") for i in range(100)],
        "v double, c string",
    )
    rep = {r["column"]: r for r in psi_drift_report(
        a, b, numeric_bins={"v": [4.0, 8.0]}, categorical_cols=["c"],
    ).collect()}
    assert rep["v"]["n_a"] == 100 and rep["v"]["n_b"] == 100
    # hand-compute v: A buckets (<4)=40,(4-8)=40,(>=8)=20 ; B shifted
    # values 3..12 -> (<4)=10,(4-8)=40,(>=8)=50
    pa, pb = [0.4, 0.4, 0.2], [0.1, 0.4, 0.5]
    want = sum((x - y) * math.log(x / y) for x, y in zip(pa, pb))
    assert abs(rep["v"]["psi"] - want) < 1e-9
    # c: A 50/50, B 80/20
    want_c = (0.5 - 0.8) * math.log(0.5 / 0.8) + (0.5 - 0.2) * math.log(0.5 / 0.2)
    assert abs(rep["c"]["psi"] - want_c) < 1e-9


def test_psi_drift_identical_is_zero_and_nulls_bucket(spark):
    from woodwork_spark.operators.curation import psi_drift_report

    a = spark.createDataFrame(
        [(1.0, "x"), (None, None), (5.0, "y")], "v double, c string",
    )
    rep = {r["column"]: r for r in psi_drift_report(
        a, a, numeric_bins={"v": [3.0]}, categorical_cols=["c"],
    ).collect()}
    assert abs(rep["v"]["psi"]) < 1e-12
    assert abs(rep["c"]["psi"]) < 1e-12


def test_psi_drift_no_columns_raises(spark):
    import pytest

    from woodwork_spark.operators.curation import psi_drift_report

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError, match="no columns"):
        psi_drift_report(df, df)


def test_standardize_features_zscore_and_robust(spark):
    import numpy as np

    from woodwork_spark.operators.features import (
        fit_scaler,
        standardize_features,
    )

    vals = [float(v) for v in (2, 4, 4, 4, 5, 5, 7, 9)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, x double")
    out = standardize_features(df, ["x"], method="zscore")
    got = np.array([r["x_scaled"] for r in out.orderBy("id").collect()])
    a = np.array(vals)
    want = (a - a.mean()) / a.std(ddof=1)
    assert np.allclose(got, want)
    # robust: center=median, spread=IQR (exact percentiles)
    p = fit_scaler(df, ["x"], method="robust")["x"]
    assert p[0] == np.percentile(a, 50)
    assert abs(p[1] - (np.percentile(a, 75) - np.percentile(a, 25))) < 1e-9
    # minmax on a constant column: spread guard -> all zeros, no NaN
    cdf = spark.createDataFrame([(1, 5.0), (2, 5.0)], "id long, x double")
    sc = standardize_features(cdf, ["x"], method="minmax")
    assert all(r["x_scaled"] == 0.0 for r in sc.collect())


def test_standardize_features_bad_args(spark):
    import pytest

    from woodwork_spark.operators.features import fit_scaler

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="method"):
        fit_scaler(df, ["x"], method="nope")
    with pytest.raises(ValueError, match="no columns"):
        fit_scaler(df, [])


def test_bigram_logprob_manual(spark):
    import math

    from woodwork_spark.operators.text import bigram_logprob

    df = spark.createDataFrame(
        [
            (1, "a b a b"),      # bigrams: (a,b) (b,a) (a,b)
            (2, "a b c"),        # (a,b) (b,c)
            (3, "solo"),         # < 2 tokens -> NULL score
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_logprob(df, "text", "doc_id").collect()}
    # corpus bigram counts: (a,b)=3 (b,a)=1 (b,c)=1 ; prefix counts a=3, b=2
    p_ab, p_ba, p_bc = 3 / 3, 1 / 2, 1 / 2
    want1 = (math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    want2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["avg_logprob"] - want1) < 1e-12
    assert abs(out[2]["avg_logprob"] - want2) < 1e-12
    assert out[3]["avg_logprob"] is None


def test_normalize_unicode_expr(spark):
    from woodwork_spark.operators.cleaning import normalize_unicode_expr

    decomposed = "café"          # 'cafe' + combining acute
    composed = "café"             # precomposed é
    df = spark.createDataFrame(
        [(1, decomposed), (2, composed), (3, None)], "id long, t string",
    )
    nfc = {r["id"]: r["n"] for r in df.select(
        "id", normalize_unicode_expr("t").alias("n"),
    ).collect()}
    assert nfc[1] == composed and nfc[2] == composed and nfc[3] is None
    stripped = {r["id"]: r["n"] for r in df.select(
        "id", normalize_unicode_expr("t", strip_accents=True).alias("n"),
    ).collect()}
    assert stripped[1] == "cafe" and stripped[2] == "cafe"


def test_review_regressions_round6(spark):
    """Self-review fixes: (a) strip_accents must still apply the
    requested form (NFKC folding after stripping); (b) near-mode
    incremental dedup refuses non-integral ids instead of silently
    deduping nothing; (c) a NULL source is a real group for the
    broadcast quality filter; (d) collect_moments validates fanin."""
    import pytest

    from woodwork_spark.operators.cleaning import normalize_unicode_expr
    from woodwork_spark.operators.curation import filter_by_source_quality
    from woodwork_spark.operators.dedup import dedup_against_corpus
    from woodwork_spark.operators.embedding import collect_moments

    # (a) ligature fi + decomposed é: NFKC must fold the ligature AND
    # recompose nothing stripped
    df = spark.createDataFrame([(1, "ﬁ café")], "id long, t string")
    out = df.select(
        normalize_unicode_expr("t", form="NFKC", strip_accents=True).alias("n"),
    ).collect()[0]["n"]
    assert out == "fi cafe"

    # (b) string ids + near=True -> loud error, not silent no-op
    sdf = spark.createDataFrame([("a", "x y z")], "doc_id string, text string")
    with pytest.raises(ValueError, match="integral id"):
        dedup_against_corpus(sdf, sdf, "text", "doc_id", near=True)

    # (c) docs with NULL source survive when their group passes the bar
    ndf = spark.createDataFrame(
        [(1, None, "the cat sat on the mat and it was fine today."),
         (2, None, "it was the best of times and the worst of times.")],
        "doc_id long, source string, text string",
    )
    kept = filter_by_source_quality(ndf, "source", "text", min_avg_quality=0.3)
    assert kept.count() == 2

    # (d) degenerate fanin is rejected up front
    vdf = spark.createDataFrame([(1, [1.0, 2.0])], "id long, v array<double>")
    for bad in (0, 1):
        with pytest.raises(ValueError, match="fanin"):
            collect_moments(vdf, "v", fanin=bad)


def test_group_quantile_gate_modes(spark):
    """Each group is gated on its OWN quantile; keep directions, tag
    mode, and NULL handling all behave."""
    import pytest as _pytest

    from pyspark.sql import functions as F

    from woodwork_spark.operators.curation import group_quantile_gate

    rows = (
        [("a", float(v)) for v in [1, 2, 3, 4]]
        + [("b", float(v)) for v in [100, 200, 300, 400]]
        + [("a", None)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    kept = group_quantile_gate(df, "g", "v", 0.5, keep="above")
    got = sorted((r["g"], r["v"]) for r in kept.collect())
    # p50 of a = 2.5, of b = 250 (linear interpolation)
    assert got == [("a", 3.0), ("a", 4.0), ("b", 300.0), ("b", 400.0)]
    below = group_quantile_gate(df, "g", "v", 0.5, keep="below")
    assert sorted((r["g"], r["v"]) for r in below.collect()) == [
        ("a", 1.0), ("a", 2.0), ("b", 100.0), ("b", 200.0),
    ]
    tagged = group_quantile_gate(df, "g", "v", 0.5, out_col="ok")
    trows = {(r["g"], r["v"]): r["ok"] for r in tagged.collect()}
    assert len(trows) == 9 and trows[("a", None)] is False
    with _pytest.raises(ValueError):
        group_quantile_gate(df, "g", "v", 1.5)
