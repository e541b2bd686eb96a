"""Property-based tests (hypothesis) — beyond the reference's test
strategy: randomized inputs against invariants of the coercion layer and
the dedup estimators."""

import math

import pytest
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from woodwork_spark.logical_types import (
    BooleanNullable,
    Double,
    IntegerNullable,
    LatLong,
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


def _transform(spark, values, ltype, dtype="string"):
    df = spark.createDataFrame([(v,) for v in values], schema=f"v {dtype}")
    src = df.schema.fields[0].dataType
    return [
        r["v"]
        for r in df.select(ltype.transform_expr(F.col("v"), src).alias("v")).collect()
    ]


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**40), max_value=2**40).map(str),
            st.sampled_from(["nan", "NULL", "", "  ", "x", "1.5"]),
            st.none(),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_integer_nullable_transform_total(sp, values):
    """IntegerNullable.transform never throws and yields int-or-None."""
    out = _transform(sp, values, IntegerNullable())
    for v in out:
        assert v is None or isinstance(v, int)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.floats(allow_nan=False, allow_infinity=False, width=32).map(
            lambda f: f"{f!r}",
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_double_transform_parses_all_float_reprs(sp, values):
    out = _transform(sp, values, Double())
    for raw, v in zip(values, out):
        assert v is not None
        assert math.isclose(v, float(raw), rel_tol=1e-6, abs_tol=1e-12)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["yes", "no", "Y", "N", "TRUE", "False", "t", "f", "1", "0", None],
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_boolean_transform_total_and_stable(sp, values):
    out = _transform(sp, values, BooleanNullable())
    expected = {
        "yes": True, "y": True, "true": True, "t": True, "1": True,
        "no": False, "n": False, "false": False, "f": False, "0": False,
    }
    for raw, v in zip(values, out):
        if raw is None:
            assert v is None
        else:
            assert v == expected[raw.lower()]


@settings(max_examples=10, deadline=None)
@given(
    st.tuples(
        st.floats(min_value=-90, max_value=90, allow_nan=False),
        st.floats(min_value=-180, max_value=180, allow_nan=False),
    ),
)
def test_latlong_roundtrip(sp, coords):
    lat, lon = round(coords[0], 6), round(coords[1], 6)
    out = _transform(sp, [f"({lat}, {lon})"], LatLong())
    assert out[0]["latitude"] == pytest.approx(lat)
    assert out[0]["longitude"] == pytest.approx(lon)


def test_minhash_estimates_jaccard(spark):
    """MinHash collision rate over many permutations approximates the
    true Jaccard of the shingle sets."""
    from woodwork_spark.operators.dedup import (
        minhash_signature_expr,
        word_shingles_expr,
    )

    a = "the quick brown fox jumps over the lazy dog near the river bank today"
    b = "the quick brown fox jumps over the lazy cat near the river bank today"
    df = spark.createDataFrame([(0, a), (1, b)], "id long, text string")
    sh = df.select("id", word_shingles_expr("text", 3).alias("__sh"))
    sig = sh.select("id", minhash_signature_expr("__sh", 128).alias("sig")).collect()
    sigs = {r["id"]: r["sig"] for r in sig}
    est = sum(1 for x, y in zip(sigs[0], sigs[1]) if x == y) / 128
    rows = sh.collect()
    sa, sb = (set(r["__sh"]) for r in rows)
    true_j = len(sa & sb) / len(sa | sb)
    assert abs(est - true_j) < 0.2  # 128 perms -> s.e. ~0.04


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),  # doc id
            st.integers(min_value=0, max_value=300),     # token count
            st.sampled_from(["en", "zh", "es"]),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=512),  # seq_len
)
def test_pack_sequences_invariants(sp, rows, seq_len):
    """For any corpus and sequence length: offsets stay inside the
    sequence, the packing is dense (prefix positions are exactly the
    running token sum), and per-group streams are independent."""
    from woodwork_spark.operators.packing import pack_sequences

    df = sp.createDataFrame(rows, "id long, n long, g string")
    out = pack_sequences(
        df, "n", seq_len, [F.asc("id")], group_cols=["g"],
    ).collect()
    assert len(out) == len(rows)
    by_group = {}
    for r in sorted(out, key=lambda r: (r["g"], r["id"])):
        assert 0 <= r["seq_off"] < seq_len
        pos = r["seq_id"] * seq_len + r["seq_off"]
        expected = by_group.get(r["g"], 0)
        assert pos == expected  # dense: no token lost, none duplicated
        by_group[r["g"]] = expected + r["n"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=0,
        max_size=60,
    ),
)
def test_connected_components_is_valid_partition(sp, edges):
    """Union-find labels form a valid component partition: every vertex
    labeled, endpoints of every edge share a label, and each label is
    the minimum id of its component."""
    from woodwork_spark.operators.dedup import connected_components

    pairs = sp.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    verts = {v for e in edges for v in e}
    assert set(got) == verts
    for a, b in edges:
        assert got[a] == got[b]
    from collections import defaultdict

    members = defaultdict(set)
    for v, c in got.items():
        members[c].add(v)
    for c, vs in members.items():
        assert c == min(vs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 5)),
        min_size=1, max_size=60,
    ),
    st.integers(min_value=1, max_value=9),
)
def test_global_ntile_property(sp, rows, n):
    """For any data and bucket count: buckets are 1..min(n, total),
    sizes differ by at most 1, and bucket order follows sort order."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.rank import global_ntile

    df = sp.createDataFrame(
        [(i, v, t) for i, (v, t) in enumerate(rows)], "id long, v long, t long",
    )
    out = global_ntile(df, [F.asc("v"), F.asc("t"), F.asc("id")], n, out_col="b")
    got = sorted(
        ((r["v"], r["t"], r["id"]), r["b"]) for r in out.collect()
    )
    release(out)
    total = len(rows)
    sizes = {}
    prev_b = 0
    for _, b in got:
        assert prev_b <= b  # non-decreasing along the sort order
        prev_b = b
        sizes[b] = sizes.get(b, 0) + 1
    assert set(sizes) == set(range(1, min(n, total) + 1))
    if total >= n:
        assert max(sizes.values()) - min(sizes.values()) <= 1


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.sampled_from(["a", "b", "c", None]), min_size=1, max_size=40),
)
def test_global_rank_property(sp, keys):
    """Distributed rank equals the native window for any key multiset
    (including NULL groups), both plain and dense."""
    from pyspark.sql import Window as W

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.rank import global_rank

    df = sp.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id long, k string",
    )
    for dense in (False, True):
        out = global_rank(df, [("k", "asc")], out_col="r", dense=dense)
        got = {r["id"]: r["r"] for r in out.collect()}
        release(out)
        fn = F.dense_rank() if dense else F.rank()
        exp = {
            r["id"]: r["r"]
            for r in df.withColumn(
                "r", fn.over(W.orderBy("k")).cast("long"),
            ).collect()
        }
        assert got == exp


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 1000), st.text("ab", min_size=0, max_size=3)),
             min_size=1, max_size=40, unique_by=lambda t: t[0]),
)
def test_merge_upsert_idempotent_and_total(sp, rows):
    """Applying the same update batch twice equals applying it once, and
    the merged key set is exactly target-keys ∪ update-keys."""
    from woodwork_spark.operators.relational import merge_upsert

    half = len(rows) // 2
    target = sp.createDataFrame(rows, "k long, v string")
    updates = sp.createDataFrame(
        [(k, v + "!") for k, v in rows[:half]] or [(10**9, "x")],
        "k long, v string",
    )
    once = merge_upsert(target, updates, "k")
    twice = merge_upsert(once, updates, "k")
    a = sorted((r["k"], r["v"]) for r in once.collect())
    b = sorted((r["k"], r["v"]) for r in twice.collect())
    assert a == b
    exp_keys = {k for k, _ in rows} | {k for k, _ in [
        (k, v) for k, v in rows[:half]] or [(10**9, "x")]}
    assert {k for k, _ in a} == exp_keys


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),   # order key
            st.integers(min_value=-20, max_value=20),  # value a
            st.integers(min_value=0, max_value=9),     # value b
        ),
        min_size=1,
        max_size=30,
    ),
)
def test_global_prefix_sums_matches_single_window(sp, rows):
    """Multi-column prefix sums == per-column window results, in both
    the small and the forced-distributed path, inclusive and not."""
    from pyspark.sql import Window as W

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.rank import global_prefix_sums

    rows = [(i, k, a, b) for i, (k, a, b) in enumerate(rows)]
    df = sp.createDataFrame(rows, "i long, k long, a long, b long")
    order = [F.asc("k"), F.asc("i")]
    for inclusive in (False, True):
        hi = 0 if inclusive else -1
        w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, hi)
        want = {
            r["i"]: (r["ca"], r["cb"])
            for r in df.select(
                "i",
                F.coalesce(F.sum("a").over(w), F.lit(0)).alias("ca"),
                F.coalesce(F.sum("b").over(w), F.lit(0)).alias("cb"),
            ).collect()
        }
        for thresh in (100_000, 0):
            out = global_prefix_sums(
                df, order, ["a", "b"], ["ca", "cb"],
                inclusive=inclusive, small_threshold=thresh,
            )
            got = {r["i"]: (r["ca"], r["cb"]) for r in out.collect()}
            release(out)
            assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=100),
        ),
        min_size=2,
        max_size=25,
    ),
)
def test_quantile_normalize_invariants(sp, rows):
    """Output is a permutation-of-global-values per row count, the map
    is monotone within each group, and every group's normalized range
    spans [global_min, global_max] when the group has >= 2 rows."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.features import quantile_normalize

    data = [(g, i, float(s)) for i, (g, s) in enumerate(rows)]
    df = sp.createDataFrame(data, "g string, i long, s double")
    out = quantile_normalize(df, "g", "s", "i")
    got = out.collect()
    release(out)
    assert len(got) == len(data)
    all_scores = sorted(s for _, _, s in data)
    by_group = {}
    for r in got:
        assert r["normalized"] in all_scores  # values come from the globe
        by_group.setdefault(r["g"], []).append((r["s"], r["i"], r["normalized"]))
    for g, triples in by_group.items():
        triples.sort()
        norms = [n for _, _, n in triples]
        assert norms == sorted(norms)  # monotone in (score, id)
        if len(triples) >= 2:
            assert norms[0] == all_scores[0]
            assert norms[-1] == all_scores[-1]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # day
            st.integers(min_value=0, max_value=8),    # user
        ),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_rolling_distinct_matches_bruteforce(sp, pairs, win):
    import datetime

    from woodwork_spark.operators.cardinality import rolling_distinct

    day = 86_400
    rows = [
        (datetime.datetime.utcfromtimestamp(d * day + 7), u)
        for d, u in pairs
    ]
    df = sp.createDataFrame(rows, "ts timestamp, u long")
    got = {
        r["bucket_s"]: r["n_distinct"]
        for r in rolling_distinct(
            df, "ts", "u", window_buckets=win, bucket_seconds=day,
        ).collect()
    }
    days = sorted({d for d, _ in pairs})
    want = {
        d * day: len({
            u for dd, u in pairs if d - win < dd <= d
        })
        for d in days
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["x", "y"]),
            st.integers(min_value=0, max_value=30),   # score
            st.integers(min_value=1, max_value=40),   # tokens
        ),
        min_size=1,
        max_size=25,
    ),
    st.integers(min_value=1, max_value=120),
)
def test_select_to_budget_is_maximal_prefix(sp, rows, budget):
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.packing import select_to_budget

    data = [(g, i, float(s), t) for i, (g, s, t) in enumerate(rows)]
    df = sp.createDataFrame(data, "g string, i long, s double, t long")
    out = select_to_budget(df, "g", "s", "t", budget=budget, id_col="i")
    kept = out.collect()
    release(out)
    kept_ids = {r["i"] for r in kept}
    for g in {g for g, *_ in data}:
        ordered = sorted(
            (r for r in data if r[0] == g),
            key=lambda r: (-r[2], r[1]),
        )
        cum, want = 0, set()
        for _, i, _, t in ordered:
            if cum + t > budget:
                break  # truncation: first over-budget doc stops the group
            cum += t
            want.add(i)
        assert {i for i in kept_ids
                if any(r[1] == i and r[0] == g for r in data)} == want


def test_global_prefix_sums_distributed_doubles(sp):
    """The forced-distributed path must handle DOUBLE value columns:
    per-bucket offsets accumulate as floats and the broadcast map must
    coerce cleanly (longs were property-tested; this pins doubles)."""
    from pyspark.sql import Window as W

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.rank import global_prefix_sums

    rows = [(i, float(i % 7) + 0.25, i % 3) for i in range(200)]
    df = sp.createDataFrame(rows, "i long, w double, c long")
    order = [F.asc("w"), F.asc("i")]
    w = W.orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    want = {
        r["i"]: (r["cw"], r["cc"])
        for r in df.select(
            "i",
            F.sum("w").over(w).alias("cw"),
            F.sum("c").over(w).alias("cc"),
        ).collect()
    }
    out = global_prefix_sums(
        df, order, ["w", "c"], ["cw", "cc"],
        inclusive=True, small_threshold=0,
    )
    got = {r["i"]: (r["cw"], r["cc"]) for r in out.collect()}
    release(out)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0])
        assert got[k][1] == want[k][1]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=25),
    st.lists(st.integers(min_value=0, max_value=30), min_size=2, max_size=25),
)
def test_ks_drift_bounds_and_extremes(sp, xs, ys):
    """KS in [0,1]; identical samples -> 0; disjoint ranges -> 1."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.curation import ks_drift

    a = sp.createDataFrame([(float(v),) for v in xs], "v double")
    b = sp.createDataFrame([(float(v),) for v in ys], "v double")
    out = ks_drift(a, b, "v")
    r = out.collect()[0]
    release(out)
    assert 0.0 <= r["ks_stat"] <= 1.0 + 1e-12
    same = ks_drift(a, a, "v").collect()[0]
    assert same["ks_stat"] == pytest.approx(0.0)
    d = sp.createDataFrame([(float(v) + 1000.0,) for v in ys], "v double")
    far = ks_drift(a, d, "v").collect()[0]
    assert far["ks_stat"] == pytest.approx(1.0)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c", "d"]),
            st.integers(min_value=1, max_value=500),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.floats(min_value=0.1, max_value=2.0),
)
def test_temperature_mix_always_feasible(sp, weights, alpha):
    """keep_frac in (0, 1]; exactly one binding group at 1; target
    fractions sum to 1."""
    from woodwork_spark.operators.curation import temperature_mix

    df = sp.createDataFrame(
        [(g, w) for g, w in weights], "g string, w long",
    )
    rows = temperature_mix(df, "g", alpha, weight_col="w").collect()
    assert sum(r["target_frac"] for r in rows) == pytest.approx(1.0)
    fracs = [r["keep_frac"] for r in rows]
    assert all(0 < f <= 1.0 + 1e-9 for f in fracs)
    assert any(abs(f - 1.0) < 1e-9 for f in fracs)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # user
            st.integers(min_value=0, max_value=50),  # ts
            st.sampled_from(["x", "y", "z"]),
        ),
        min_size=2,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
def test_transition_matrix_rows_are_distributions(sp, rows):
    """Per source event, outgoing probabilities sum to 1 and counts
    equal the per-user consecutive-pair count."""
    from woodwork_spark.operators.funnel import transition_matrix

    df = sp.createDataFrame(rows, "u long, t long, e string")
    got = transition_matrix(df, "u", "t", "e").collect()
    if not got:
        return  # every user had a single event
    by_src = {}
    for r in got:
        by_src.setdefault(r["event"], []).append(r)
    for src, rs in by_src.items():
        assert sum(r["prob"] for r in rs) == pytest.approx(1.0)
    # total transition count = sum over users of (n_events - 1)
    from collections import Counter

    per_user = Counter(u for u, _, _ in rows)
    want_pairs = sum(n - 1 for n in per_user.values())
    assert sum(r["n"] for r in got) == want_pairs


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcx", min_size=0, max_size=10),
        min_size=1, max_size=12,
    ),
    st.integers(min_value=1, max_value=2),
)
def test_edit_distance_join_matches_bruteforce(sp, words, k):
    """Blocking (rarest-first prefixes + short path) is lossless vs the
    quadratic Levenshtein ground truth on adversarial tiny alphabets
    (maximally-colliding grams, lengths straddling the short bound)."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.dedup import edit_distance_join

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    la = [(i, w) for i, w in enumerate(words)]
    lb = [(100 + i, w) for i, w in enumerate(reversed(words))]
    A = sp.createDataFrame(la, "ida long, s string")
    B = sp.createDataFrame(lb, "idb long, s string")
    expect = sorted(
        (i, j, lev(wa, wb))
        for i, wa in la for j, wb in lb if lev(wa, wb) <= k
    )
    out = edit_distance_join(A, B, "ida", "idb", "s", max_dist=k)
    got = sorted((r["ida"], r["idb"], r["distance"]) for r in out.collect())
    release(out)
    assert got == expect


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.one_of(st.none(), st.floats(min_value=-100, max_value=100,
                                           allow_nan=False)),
        ),
        min_size=1, max_size=15, unique_by=lambda t: t[0],
    ),
)
def test_fill_gaps_linear_matches_pandas(sp, rows):
    """fill_gaps(linear) reproduces pandas interpolate(method='index',
    limit_direction='both') on arbitrary sparse series."""
    import pandas as pd

    from woodwork_spark.operators.timeseries import fill_gaps

    df = sp.createDataFrame(rows, "t long, v double")
    got = {
        r["t"]: r["f"]
        for r in fill_gaps(df, "t", "v", method="linear",
                           out_col="f").collect()
    }
    pdf = pd.DataFrame(sorted(rows), columns=["t", "v"]).set_index("t")
    want = pdf["v"].astype(float).interpolate(
        method="index", limit_direction="both",
    )
    for t, w in want.items():
        g = got[t]
        if pd.isna(w):
            assert g is None
        else:
            assert g is not None and abs(g - w) < 1e-9


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # cluster
            st.integers(min_value=0, max_value=50),     # rid
            st.floats(min_value=0, max_value=10, allow_nan=False),
            st.one_of(st.none(), st.text(alphabet="pq", max_size=3)),
        ),
        min_size=1, max_size=20, unique_by=lambda t: t[1],
    ),
)
def test_golden_records_matches_pandas(sp, rows):
    """Field-level survivorship == pandas sort-and-first-non-null."""
    import pandas as pd

    from woodwork_spark.operators.dedup import golden_records

    df = sp.createDataFrame(rows, "c long, rid long, p double, f string")
    got = {
        r["c"]: (r["n_members"], r["f"])
        for r in golden_records(df, "c", ["f"], "p", "rid").collect()
    }
    pdf = pd.DataFrame(rows, columns=["c", "rid", "p", "f"])
    for c, grp in pdf.groupby("c"):
        nn = grp[grp["f"].notna()].sort_values(
            ["p", "rid"], ascending=False,
        )
        want = None if nn.empty else nn.iloc[0]["f"]
        assert got[c] == (len(grp), want)


# ---------------------------------------------------------------------------
# Round-9 continuation: properties of the classical-test battery, the
# provenance manifest, and the tokenizer/LCS kernels
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.booleans()),
        min_size=4, max_size=60,
    ).filter(
        lambda rs: any(r for r, _ in rs) and any(not r for r, _ in rs),
    ),
)
def test_fisher_exact_p_values_are_probabilities(sp, rows):
    from woodwork_spark.operators.stats_tests import fisher_exact_2x2

    df = sp.createDataFrame(rows, ["r", "c"])
    out = fisher_exact_2x2(df, F.col("r"), F.col("c")).collect()[0]
    assert 0.0 <= out["p_one_sided"] <= 1.0 + 1e-9
    assert 0.0 <= out["p_two_sided"] <= 1.0 + 1e-9
    assert out["n"] == len(rows)
    # two-sided includes at least the observed table's pmf mass of the
    # one-sided tail's first term, so it can't be 0
    assert out["p_two_sided"] > 0.0


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3,
                  allow_nan=False, allow_infinity=False),
        min_size=8, max_size=40,
    ).filter(lambda v: len(set(v)) > 1),
)
def test_jarque_bera_shift_scale_invariant(sp, values):
    """JB is invariant under x -> a*x + b (skew/kurtosis are
    standardized moments)."""
    from woodwork_spark.operators.stats_tests import jarque_bera

    df1 = sp.createDataFrame([(float(v),) for v in values], ["x"])
    df2 = sp.createDataFrame(
        [(3.5 * float(v) - 11.0,) for v in values], ["x"])
    a = jarque_bera(df1, "x").collect()[0]
    b = jarque_bera(df2, "x").collect()[0]
    assert a["jb_stat"] == pytest.approx(b["jb_stat"], rel=1e-6, abs=1e-9)


@settings(max_examples=6, deadline=None)
@given(st.integers(min_value=2, max_value=6), st.data())
def test_shard_manifest_is_a_disjoint_partition(sp, nsh, data):
    from woodwork_spark.operators.quality_checks import shard_manifest

    n = data.draw(st.integers(min_value=1, max_value=40))
    rows = [(i, f"t{i}") for i in range(n)]
    out = shard_manifest(
        sp.createDataFrame(rows, ["id", "t"]), "id", "t", nsh, "s",
    ).collect()
    assert sum(r["n_docs"] for r in out) == n
    assert len({r["shard"] for r in out}) == len(out)
    assert all(0 <= r["shard"] < nsh for r in out)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="tablecsor", min_size=0, max_size=10),
        min_size=1, max_size=12, unique=True,
    ),
)
def test_unigram_tokenize_reconstructs_and_scores(sp, words):
    from woodwork_spark.operators.bpe import unigram_viterbi_tokenize

    vocab = {"t": -3.0, "a": -2.0, "table": -5.5, "ta": -3.0,
             "ble": -4.0, "so": -3.1, "rt": -3.3}
    df = sp.createDataFrame([(w,) for w in words], "w string")
    for r in unigram_viterbi_tokenize(df, "w", vocab).collect():
        if not r["w"]:
            assert r["piece_str"] is None
            continue
        # concatenation invariant
        assert r["piece_str"].replace("|", "") == r["w"]
        # score equals the sum of piece scores (unk = -20 fallback)
        total = sum(
            vocab.get(p, -20.0) for p in r["piece_str"].split("|")
        )
        assert r["logp"] == pytest.approx(total, abs=1e-9)
        # optimality spot-check: no single merge of adjacent singles
        # into a known piece may improve the score (local optimality)
        pieces = r["piece_str"].split("|")
        for i in range(len(pieces) - 1):
            merged = pieces[i] + pieces[i + 1]
            if merged in vocab:
                alt = total - vocab.get(pieces[i], -20.0) - vocab.get(
                    pieces[i + 1], -20.0) + vocab[merged]
                assert alt <= total + 1e-9


@settings(max_examples=6, deadline=None)
@given(
    st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
             min_size=3, max_size=25),
    st.lists(st.floats(min_value=-50, max_value=50, allow_nan=False),
             min_size=3, max_size=25),
)
def test_rouge_l_bounds_and_symmetric_f(sp, a, b):
    """LCS <= min(len); F1 is symmetric under ref<->cand swap."""
    from woodwork_spark.operators.evaluation import rouge_l_scores

    ta = [str(round(x, 0)) for x in a]
    tb = [str(round(x, 0)) for x in b]
    df = sp.createDataFrame([(ta, tb), (tb, ta)], ["ref", "cand"])
    rows = rouge_l_scores(df, "ref", "cand").collect()
    r0, r1 = rows[0], rows[1]
    assert r0["lcs"] == r1["lcs"] <= min(len(ta), len(tb))
    assert r0["rouge_l_f"] == pytest.approx(r1["rouge_l_f"], abs=1e-12)
    assert r0["rouge_l_p"] == pytest.approx(r1["rouge_l_r"], abs=1e-12)
