"""Round 9: advisor-fix regressions (fragment/query extraction,
null-safe canonical dedup winners, 128-bit governance counts, null-ts
sessionization) plus the new operators — Fellegi–Sunter EM parameter
estimation, public-suffix-list-as-data registered domains, robots.txt
parsing, cross-doc k-gram span dedup, OR-blocking candidates."""

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Advice fixes
# ---------------------------------------------------------------------------


def test_fragment_only_url_has_no_query(spark):
    """A '?' INSIDE the fragment must not survive canonicalization —
    the fragment is dropped before the query is extracted (r8 advice:
    the unanchored query regex used to resurrect it)."""
    from woodwork_spark.operators.web import canonicalize_url_expr

    df = spark.createDataFrame(
        [
            ("https://a.example.com/p#sec?tab=2",),
            ("https://a.example.com/p?real=1#sec?tab=2",),
            ("https://a.example.com/p?b=2&a=1",),
        ],
        "url string",
    )
    out = [
        r[0]
        for r in df.select(canonicalize_url_expr("url")).collect()
    ]
    assert out[0] == "https://a.example.com/p"
    assert out[1] == "https://a.example.com/p?real=1"
    assert out[2] == "https://a.example.com/p?a=1&b=2"


def test_canonical_dedup_null_order_column_keeps_group(spark):
    """A NULL order column must not silently drop its canonical group
    (plain = made the winner filter NULL; eqNullSafe keeps it)."""
    from woodwork_spark.operators.web import canonical_url_dedup

    df = spark.createDataFrame(
        [
            ("https://x.example.com/a", None),
            ("https://x.example.com/a/", None),
            ("https://y.example.com/b", 5),
        ],
        "url string, rank int",
    )
    out = canonical_url_dedup(df, "url", ["rank", "url"])
    got = {r["canonical_url"] for r in out.collect()}
    assert got == {
        "https://x.example.com/a",
        "https://y.example.com/b",
    }, "the all-null-rank group vanished"


def test_governance_counts_use_composite_hash(spark):
    """n_canonical must come from the two-hash composite (same 128-bit
    collision bound the module docstring claims)."""
    from woodwork_spark.operators.web import domain_governance_report

    df = spark.createDataFrame(
        [
            ("https://a.example.com/p1",),
            ("https://a.example.com/p1/",),
            ("https://a.example.com/p2",),
            ("nonsense",),
        ],
        "url string",
    )
    row = domain_governance_report(df, "url").filter(
        F.col("domain") == "example.com",
    ).collect()[0]
    assert row["n_urls"] == 3
    assert row["n_canonical"] == 2
    assert row["n_dup"] == 1


def test_sessionize_null_ts_does_not_shift_indices(spark):
    """Rows with a null timestamp get a null session index AND leave
    the user's real sessions 0-based (r8 advice: each null row used to
    add one to the running sum)."""
    from woodwork_spark.operators.funnel import sessionize

    df = spark.createDataFrame(
        [
            ("u1", None),
            ("u1", None),
            ("u1", "2024-01-01 00:00:00"),
            ("u1", "2024-01-01 00:10:00"),
            ("u1", "2024-01-01 02:00:00"),
        ],
        "user string, ts_s string",
    ).withColumn("ts", F.col("ts_s").cast("timestamp"))
    out = {
        (r["ts_s"], r["session_idx"])
        for r in sessionize(df, "user", "ts").collect()
    }
    assert (None, None) in out
    assert ("2024-01-01 00:00:00", 0) in out
    assert ("2024-01-01 00:10:00", 0) in out
    assert ("2024-01-01 02:00:00", 1) in out


# ---------------------------------------------------------------------------
# Fellegi–Sunter EM (estimate_m_u)
# ---------------------------------------------------------------------------


def _planted_pairs(spark, n=60000, lam=0.2):
    """Deterministic 3-field agreement mixture with planted m/u —
    hash-based pseudo-randomness, no RNG state."""
    plant = {"a": (0.92, 0.15), "b": (0.80, 0.30), "c": (0.95, 0.05)}
    df = spark.range(n)

    def r(s):
        return F.pmod(F.xxhash64("id", F.lit(s)), 100000) / 100000.0

    is_m = r("m") < lam
    cols = []
    for f, (m, u) in plant.items():
        agree = F.when(is_m, r(f) < m).otherwise(r(f) < u)
        cols += [
            F.lit(1).alias(f),
            F.when(agree, 1).otherwise(0).alias(f"{f}_r"),
        ]
    return df.select(*cols), plant, lam


def test_estimate_m_u_recovers_planted_parameters(spark):
    """Three binary fields make the FS mixture exactly identified
    (2^3 - 1 = 7 dof = 7 params); EM from the default init must land
    within 0.03 of the planted m/u and lambda."""
    from woodwork_spark.operators.dedup import estimate_m_u

    pairs, plant, lam = _planted_pairs(spark)
    rows = {
        r["field"]: r
        for r in estimate_m_u(pairs, list(plant), iters=30).collect()
    }
    for f, (m, u) in plant.items():
        assert abs(rows[f]["m"] - m) < 0.03, (f, rows[f]["m"], m)
        assert abs(rows[f]["u"] - u) < 0.03, (f, rows[f]["u"], u)
    assert abs(rows["a"]["lam"] - lam) < 0.03


def test_estimate_m_u_missing_is_no_evidence(spark):
    """A field with either side NULL must not move its m/u expectation
    (posterior factor 1) — estimates on a frame where field b is null
    on half the rows match estimates on the observed half only."""
    from woodwork_spark.operators.dedup import estimate_m_u

    pairs, plant, _ = _planted_pairs(spark, n=20000)
    half = pairs.withColumn(
        "b_r",
        F.when(
            F.pmod(F.xxhash64("a_r", "b_r", "c_r"), 2) == 0,
            F.col("b_r"),
        ),
    )
    # estimates still finite, clamped, and ordered m > u for real fields
    rows = {
        r["field"]: r
        for r in estimate_m_u(half, list(plant), iters=15).collect()
    }
    for f in plant:
        assert 0.0 < rows[f]["u"] < rows[f]["m"] < 1.0


def test_estimate_m_u_feeds_fellegi_sunter(spark):
    """End-to-end: learned parameters plug straight into
    fellegi_sunter_score and separate the planted matches."""
    from woodwork_spark.operators.dedup import (
        estimate_m_u,
        fellegi_sunter_score,
    )

    pairs, plant, _ = _planted_pairs(spark, n=20000)
    est = {
        r["field"]: (r["m"], r["u"], r["lam"])
        for r in estimate_m_u(pairs, list(plant), iters=20).collect()
    }
    lam = next(iter(est.values()))[2]
    scored = fellegi_sunter_score(
        pairs,
        [((f, f"{f}_r"), m, u) for f, (m, u, _) in est.items()],
        prior=lam,
    )
    agg = scored.agg(
        F.avg(F.when(F.col("fs_class") == "match", 1.0).otherwise(0.0)),
    ).collect()[0][0]
    # all-agree pattern is ~lam-heavy: some matches must be found, and
    # nowhere near everything
    assert 0.01 < agg < 0.5


def test_estimate_m_u_validates(spark):
    import pytest

    from woodwork_spark.operators.dedup import estimate_m_u

    df = spark.createDataFrame([(1, 1)], "a int, a_r int")
    with pytest.raises(ValueError):
        estimate_m_u(df, [])
    with pytest.raises(ValueError):
        estimate_m_u(df, ["a"], iters=0)
    with pytest.raises(ValueError):
        estimate_m_u(df.filter(F.lit(False)), ["a"])


# ---------------------------------------------------------------------------
# Public-suffix list as data (with_registered_domain)
# ---------------------------------------------------------------------------


def _psl_frame(spark, extra=()):
    from woodwork_spark.operators.web import MULTIPART_SUFFIXES

    rows = list(MULTIPART_SUFFIXES) + list(extra)
    return spark.createDataFrame([(s,) for s in rows], "suffix string")


def test_with_registered_domain_matches_expr_on_builtin_subset(spark):
    """Feeding the built-in suffix subset as a DATA frame must
    reproduce the literal-expression path exactly."""
    from woodwork_spark.operators.web import with_registered_domain

    hosts = [
        "shop.example.co.uk", "a.b.deep.example.com", "example.com",
        "co.uk", "localhost", "10.1.2.3", "www.example.com",
        "x.org.uk", "a.b.com.au", None,
    ]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    via_data = with_registered_domain(
        df, "host", suffixes=_psl_frame(spark), from_host=True,
    ).select("host", "domain")
    via_expr = with_registered_domain(
        df, "host", suffixes=None, from_host=True,
    ).select("host", "domain")
    assert via_data.exceptAll(via_expr).count() == 0
    assert via_expr.exceptAll(via_data).count() == 0


def test_with_registered_domain_real_psl_rows(spark):
    """Longest listed suffix wins: github.io (2-label) and k12.va.us
    (3-label) resolve the registered domain one label deeper; 1-label
    rows are ignored by the joins (the implicit rule covers them)."""
    from woodwork_spark.operators.web import with_registered_domain

    df = spark.createDataFrame(
        [
            ("myblog.github.io",),
            ("deep.sub.myblog.github.io",),
            ("x.y.k12.va.us",),
            ("github.io",),          # host IS a suffix: passthrough
            ("plain.example.org",),  # implicit rule
        ],
        "host string",
    )
    got = {
        r["host"]: r["domain"]
        for r in with_registered_domain(
            df, "host",
            suffixes=_psl_frame(
                spark, ("github.io", "k12.va.us", "com", "io"),
            ),
            from_host=True,
        ).collect()
    }
    assert got["myblog.github.io"] == "myblog.github.io"
    assert got["deep.sub.myblog.github.io"] == "myblog.github.io"
    assert got["x.y.k12.va.us"] == "y.k12.va.us"
    assert got["github.io"] == "github.io"
    assert got["plain.example.org"] == "example.org"


def test_with_registered_domain_plan_is_broadcast_only(spark):
    """The corpus side must not shuffle: every suffix join is a
    BroadcastHashJoin, no Exchange on the corpus plan side."""
    from woodwork_spark.operators.web import with_registered_domain

    df = spark.range(1000).select(
        F.concat(
            F.lit("s"), (F.col("id") % 50).cast("string"),
            F.lit(".example.co.uk"),
        ).alias("host"),
    )
    out = with_registered_domain(
        df, "host", suffixes=_psl_frame(spark), from_host=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# robots.txt parsing (parse_robots_rules)
# ---------------------------------------------------------------------------


_ROBOTS = """# corp crawl policy
Disallow: /pre-group-ignored
Crawl-delay: 10
User-agent: *
Disallow: /private
Allow: /private/ok

User-agent: OtherBot
User-agent: MyBot
Disallow: /shared
Allow:

User-agent: OtherBot
Disallow: /other
"""


def test_robots_specific_agent_beats_star(spark):
    """MyBot (prefix of the target agent) outscores '*'; only groups
    containing the winning token contribute; empty Allow and pre-group
    rules carry nothing."""
    from woodwork_spark.operators.web import parse_robots_rules

    df = spark.createDataFrame([("d1", _ROBOTS)], "domain string, robots string")
    got = {
        (r["path_prefix"], r["allow"])
        for r in parse_robots_rules(
            df, "domain", "robots", agent="MyBot-News/1.0",
        ).collect()
    }
    assert got == {("/shared", False)}


def test_robots_star_fallback_and_no_match(spark):
    from woodwork_spark.operators.web import parse_robots_rules

    df = spark.createDataFrame([("d1", _ROBOTS)], "domain string, robots string")
    # unknown agent falls back to the '*' group
    got = {
        (r["path_prefix"], r["allow"])
        for r in parse_robots_rules(
            df, "domain", "robots", agent="SomeSpider",
        ).collect()
    }
    assert got == {("/private", False), ("/private/ok", True)}
    # a robots file with no '*' group and no matching token yields
    # NO rules for that domain (default_allow decides downstream)
    only = "User-agent: GoogleBot\nDisallow: /g\n"
    df2 = spark.createDataFrame([("d2", only)], "domain string, robots string")
    assert parse_robots_rules(df2, "domain", "robots", agent="SomeSpider").count() == 0


def test_robots_feeds_policy_gate(spark):
    """End-to-end: parsed rules drive apply_url_policies with the
    longest-match / allow-wins-ties convention."""
    from woodwork_spark.operators.web import (
        apply_url_policies,
        parse_robots_rules,
    )

    robots = spark.createDataFrame(
        [("example.com", _ROBOTS)], "domain string, robots string",
    )
    rules = parse_robots_rules(robots, "domain", "robots", agent="SomeSpider")
    urls = spark.createDataFrame(
        [
            (1, "https://www.example.com/private/x"),
            (2, "https://sub.example.com/private/ok/y"),
            (3, "https://example.com/public"),
        ],
        "id long, url string",
    )
    got = {
        r["id"]: r["crawl_allowed"]
        for r in apply_url_policies(urls, "url", "id", rules).collect()
    }
    assert got == {1: False, 2: True, 3: True}


# ---------------------------------------------------------------------------
# Cross-doc substring dedup (dedup_spans_global)
# ---------------------------------------------------------------------------


def test_dedup_spans_global_semantics(spark):
    """First occurrence survives; later cross-doc AND same-doc
    occurrences of any k-token window vanish; overlapping duplicate
    windows erase their union; short/null docs untouched."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.cleaning import dedup_spans_global

    rows = [
        (1, "alpha beta THE QUICK BROWN FOX JUMPS gamma delta"),
        (2, "prefix words THE QUICK BROWN FOX JUMPS suffix words here"),
        (3, "totally unrelated text with no duplicate content at all"),
        (4, "THE QUICK BROWN FOX JUMPS"),
        (5, None),
        (6, "short doc"),
        (7, "x THE QUICK BROWN FOX JUMPS y THE QUICK BROWN FOX JUMPS z"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = dedup_spans_global(df, "text", "id", k=5, out_col="clean")
    got = {r["id"]: r["clean"] for r in out.collect()}
    release(out)
    assert got[1] == "alpha beta THE QUICK BROWN FOX JUMPS gamma delta"
    assert got[2] == "prefix words suffix words here"
    assert got[3] == rows[2][1]
    assert got[4] == ""
    assert got[5] is None
    assert got[6] == "short doc"
    # non-first occurrences removed even inside one doc
    assert got[7] == "x y z"


def test_dedup_spans_global_long_repeat_removed_in_full(spark):
    """A shared span LONGER than k is covered by its sliding windows
    and removed in full from the non-first doc."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.cleaning import dedup_spans_global

    span = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, f"keep {span} keep2"), (2, f"pre {span} post")],
        "id long, text string",
    )
    out = dedup_spans_global(df, "text", "id", k=3, out_col="clean")
    got = {r["id"]: r["clean"] for r in out.collect()}
    release(out)
    assert got[1] == f"keep {span} keep2"
    assert got[2] == "pre post"


def test_dedup_spans_global_properties(spark):
    """Reassembly invariants on generated corpora (hypothesis):
    (1) every output token sequence is an in-order subsequence of its
    input; (2) a doc sharing no token with any other doc and with no
    internal repeat is a fixpoint modulo whitespace normalization.
    (Idempotence is deliberately NOT asserted — removal can create new
    adjacencies that match a window elsewhere, so a second pass may
    legitimately remove more.)"""
    from hypothesis import given, settings, strategies as st

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.cleaning import dedup_spans_global

    @settings(max_examples=6, deadline=None)
    @given(
        docs=st.lists(
            st.lists(
                st.integers(min_value=0, max_value=30),
                min_size=0, max_size=12,
            ),
            min_size=1, max_size=6,
        ),
        k=st.integers(min_value=2, max_value=4),
    )
    def run(docs, k):
        rows = [
            (i, " ".join(f"t{v}" for v in toks))
            for i, toks in enumerate(docs)
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        once = dedup_spans_global(df, "text", "id", k=k, out_col="clean")
        got = {r["id"]: r["clean"] for r in once.collect()}
        release(once)
        # token mass: every output token multiset is a sub-multiset of
        # the input's, in input order
        for i, toks in enumerate(docs):
            src = [f"t{v}" for v in toks]
            out_toks = got[i].split() if got[i] else []
            it = iter(src)
            assert all(t in it for t in out_toks), (src, out_toks)
            if len(set(toks)) == len(toks) and all(
                set(toks).isdisjoint(set(o))
                for j, o in enumerate(docs) if j != i
            ):
                # fully unique doc is untouched (modulo whitespace)
                assert out_toks == src

    run()


# ---------------------------------------------------------------------------
# OR-blocking (blocked_candidates / record_linkage blockers)
# ---------------------------------------------------------------------------


def _linkage_frames(spark):
    left = spark.createDataFrame(
        [
            (1, "alice anderson", "555-0101", 10.0),
            (2, "bob brown", "555-0202", 20.0),
            (3, "carol clark", "555-0303", 30.0),
        ],
        "lid long, name string, phone string, bal double",
    )
    right = spark.createDataFrame(
        [
            # name off by one char: ED blocker finds it
            (101, "alice andersen", "555-9999", 11.0),
            # name wrecked (distance >> 1) but phone intact: ONLY the
            # exact-phone blocker can find it
            (102, "XXX mangled XXX", "555-0202", 21.0),
            # nothing matches
            (103, "dave dunn", "555-0404", 40.0),
        ],
        "rid long, name string, phone string, bal double",
    )
    return left, right


def test_blocked_candidates_union_of_blockers(spark):
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.dedup import blocked_candidates

    left, right = _linkage_frames(spark)
    ed_only = blocked_candidates(
        left, right, "lid", "rid", [("edit", "name", 1)],
    )
    got_ed = {(r["lid"], r["rid"]) for r in ed_only.collect()}
    release(ed_only)
    assert (1, 101) in got_ed
    assert (2, 102) not in got_ed, "distance-1 ED-Join cannot see this pair"

    both = blocked_candidates(
        left, right, "lid", "rid",
        [("edit", "name", 1), ("exact", "phone")],
    )
    got = {(r["lid"], r["rid"]) for r in both.collect()}
    release(both)
    assert {(1, 101), (2, 102)} <= got
    assert (3, 103) not in got
    # dedup: a pair found by BOTH blockers appears once
    dup_side = blocked_candidates(
        left, right, "lid", "rid",
        [("exact", "phone"), ("prefix", "name", 4)],
    )
    rows = dup_side.collect()
    release(dup_side)
    assert len(rows) == len({(r["lid"], r["rid"]) for r in rows})


def test_blocked_candidates_callable_and_validation(spark):
    import pytest

    from woodwork_spark.operators.dedup import blocked_candidates

    left, right = _linkage_frames(spark)

    def manual(l, r):
        return l.crossJoin(r).select("lid", "rid").limit(1)

    out = blocked_candidates(left, right, "lid", "rid", [manual])
    assert out.count() == 1
    with pytest.raises(ValueError):
        blocked_candidates(left, right, "lid", "rid", [])
    with pytest.raises(ValueError):
        blocked_candidates(left, right, "lid", "rid", [("nope", "x")])


def test_record_linkage_with_blockers_finds_cross_field_match(spark):
    """End-to-end: the corrupted-name/intact-phone record scores as a
    match only when the second blocker is in play."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.dedup import record_linkage

    left, right = _linkage_frames(spark)
    fields = {"phone": (0.95, 0.001)}
    solo = record_linkage(
        left, right, "lid", "rid", "name", fields, max_dist=1,
        prior=0.1,
    )
    got_solo = {(r["lid"], r["rid"]) for r in solo.collect()}
    release(solo)
    assert (2, 102) not in got_solo

    ored = record_linkage(
        left, right, "lid", "rid", "name", fields, prior=0.1,
        blockers=[("edit", "name", 1), ("exact", "phone")],
    )
    rows = {(r["lid"], r["rid"]): r for r in ored.collect()}
    release(ored)
    assert (2, 102) in rows
    assert rows[(2, 102)]["fs_class"] == "match"
    assert rows[(2, 102)]["distance"] is None


# ---------------------------------------------------------------------------
# Two-sample battery property tests (hypothesis)
# ---------------------------------------------------------------------------


def _two_sample_df(spark, xs, ys):
    rows = [(float(v), True) for v in xs] + [(float(v), False) for v in ys]
    return spark.createDataFrame(rows, "v double, a boolean")


def test_two_sample_battery_properties(spark):
    """Invariants over generated samples (the URL idempotence property
    found a real bug in round 8 — same technique):
    - KS D in [0,1], CvM/AD/energy >= 0, W1 >= 0;
    - all of them == 0 on IDENTICAL samples;
    - KS D invariant under a strictly monotone transform;
    - W1 translation-invariant and positively scale-equivariant."""
    from hypothesis import given, settings, strategies as st

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.stats_tests import (
        cvm_test_2samp,
        energy_distance_1d,
        ks_test_2samp,
        wasserstein_1d,
    )

    def one(fn, df, *cols):
        out = fn(df, "v", F.col("a"))
        row = out.collect()[0]
        release(out)
        return [row[c] for c in cols]

    @settings(max_examples=5, deadline=None)
    @given(
        xs=st.lists(st.integers(-20, 20), min_size=1, max_size=10),
        ys=st.lists(st.integers(-20, 20), min_size=1, max_size=10),
    )
    def run(xs, ys):
        df = _two_sample_df(spark, xs, ys)
        (d,) = one(ks_test_2samp, df, "d_stat")
        assert 0.0 <= d <= 1.0
        (t,) = one(cvm_test_2samp, df, "t_stat")
        assert t >= -1e-12
        (w1,) = one(wasserstein_1d, df, "w1")
        assert w1 >= 0.0
        e2, ed = one(energy_distance_1d, df, "e2", "e_dist")
        assert ed >= 0.0 and e2 >= -1e-9

        # monotone-transform invariance of KS (2v+1 is exact in floats)
        df_m = _two_sample_df(
            spark, [2 * v + 1 for v in xs], [2 * v + 1 for v in ys],
        )
        (d_m,) = one(ks_test_2samp, df_m, "d_stat")
        assert abs(d_m - d) < 1e-12

        # W1 translation invariance + scale equivariance (exact consts)
        df_t = _two_sample_df(
            spark, [v + 7 for v in xs], [v + 7 for v in ys],
        )
        (w1_t,) = one(wasserstein_1d, df_t, "w1")
        assert abs(w1_t - w1) < 1e-9
        df_s = _two_sample_df(
            spark, [2 * v for v in xs], [2 * v for v in ys],
        )
        (w1_s,) = one(wasserstein_1d, df_s, "w1")
        assert abs(w1_s - 2 * w1) < 1e-9

    run()


def test_two_sample_battery_zero_on_identical(spark):
    from hypothesis import given, settings, strategies as st

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.stats_tests import (
        ad_test_2samp,
        cvm_test_2samp,
        energy_distance_1d,
        ks_test_2samp,
        wasserstein_1d,
    )

    @settings(max_examples=5, deadline=None)
    @given(xs=st.lists(st.integers(-15, 15), min_size=2, max_size=10))
    def run(xs):
        df = _two_sample_df(spark, xs, xs)
        for fn, col in (
            (ks_test_2samp, "d_stat"),
            (cvm_test_2samp, "t_stat"),
            (wasserstein_1d, "w1"),
            (energy_distance_1d, "e_dist"),
            (ad_test_2samp, "a2_stat"),
        ):
            out = fn(df, "v", F.col("a"))
            val = out.collect()[0][col]
            release(out)
            assert abs(val) < 1e-9, (fn.__name__, val)

    run()


# ---------------------------------------------------------------------------
# Krippendorff's alpha
# ---------------------------------------------------------------------------


def _alpha_reference(ratings, level):
    """Independent pairwise-coincidence implementation (the textbook
    construction, NOT the moments identity the operator uses)."""
    from collections import defaultdict

    by_unit = defaultdict(list)
    for u, v in ratings:
        if u is not None and v is not None:
            by_unit[u].append(v)
    o = defaultdict(float)
    for vals in by_unit.values():
        m = len(vals)
        if m < 2:
            continue
        for i in range(m):
            for j in range(m):
                if i != j:
                    o[(vals[i], vals[j])] += 1.0 / (m - 1)
    n_c = defaultdict(float)
    for (c, k), w in o.items():
        n_c[c] += w
    n = sum(n_c.values())
    if n <= 1:
        return None

    def delta(c, k):
        if level == "nominal":
            return 0.0 if c == k else 1.0
        return (float(c) - float(k)) ** 2

    d_o = sum(w * delta(c, k) for (c, k), w in o.items()) / n
    d_e = sum(
        n_c[c] * n_c[k] * delta(c, k)
        for c in n_c for k in n_c
    ) / (n * (n - 1))
    if d_e == 0:
        return None
    return 1.0 - d_o / d_e


def test_krippendorff_alpha_matches_reference(spark):
    from woodwork_spark.operators.evaluation import krippendorff_alpha

    # partial rater overlap, missing values, a singleton unit (dropped)
    ratings = [
        (1, 1), (1, 1), (1, 2),
        (2, 2), (2, 2), (2, 2),
        (3, 3), (3, 3),
        (4, 1), (4, 3), (4, 3), (4, 3),
        (5, 2),            # unpairable
        (6, 1), (6, 1),
        (None, 1), (7, None),
    ]
    df = spark.createDataFrame(ratings, "unit int, value int")
    for level in ("nominal", "interval"):
        row = krippendorff_alpha(df, "unit", "value", level).collect()[0]
        expect = _alpha_reference(ratings, level)
        assert abs(row["alpha"] - expect) < 1e-12, (level, row["alpha"], expect)
    # pairable mass: units 1,2,3,4,6 -> 14 ratings
    row = krippendorff_alpha(df, "unit", "value", "nominal").collect()[0]
    assert row["n_units"] == 5 and row["n_ratings"] == 14


def test_krippendorff_alpha_edges(spark):
    import pytest

    from woodwork_spark.operators.evaluation import krippendorff_alpha

    # perfect agreement within every unit, >1 distinct value overall
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "b")], "unit int, value string",
    )
    row = krippendorff_alpha(df, "unit", "value").collect()[0]
    assert abs(row["alpha"] - 1.0) < 1e-12
    # all pairable values identical -> D_e = 0 -> alpha NULL
    df2 = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "a"), (2, "a")], "unit int, value string",
    )
    assert krippendorff_alpha(df2, "unit", "value").collect()[0]["alpha"] is None
    with pytest.raises(ValueError):
        krippendorff_alpha(df, "unit", "value", level="ordinal")


# ---------------------------------------------------------------------------
# T5-style span corruption
# ---------------------------------------------------------------------------


def test_span_corruption_layout(spark):
    """Sentinel ordinals count per doc in order; unmasked blocks pass
    through; target concatenates sentinel + masked tokens; null/empty
    docs behave."""
    from woodwork_spark.operators.text import span_corruption

    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j k l"), (2, "one two"), (3, None)],
        "id long, text string",
    )

    def rule(idc, b):
        return (idc == 1) & b.isin(1, 3)

    got = {
        r["id"]: (r["input_text"], r["target_text"])
        for r in span_corruption(
            df, "text", "id", block_len=3, mask_expr=rule,
        ).collect()
    }
    assert got[1] == (
        "a b c <extra_id_0> g h i <extra_id_1>",
        "<extra_id_0> d e f <extra_id_1> j k l",
    )
    assert got[2] == ("one two", "")
    assert got[3] == (None, None)


def test_span_corruption_default_mask_is_deterministic(spark):
    """The default xxhash mask re-derives identically across runs and
    masks roughly mask_rate of blocks."""
    from woodwork_spark.operators.text import span_corruption

    df = spark.range(200).select(
        F.col("id"),
        F.concat_ws(" ", *[F.lit(f"w{i}") for i in range(24)]).alias("text"),
    )
    a = span_corruption(df, "text", "id", block_len=4, mask_rate=0.25)
    b = span_corruption(df, "text", "id", block_len=4, mask_rate=0.25)
    assert a.exceptAll(b).count() == 0
    # 200 docs x 6 blocks, expect ~25% masked: count sentinels
    n_sent = a.select(
        F.sum(
            F.size(F.split("target_text", "<extra_id_")) - 1,
        ).alias("s"),
    ).collect()[0]["s"]
    assert 200 < n_sent < 400, n_sent
    # every token of the original reappears exactly once across the pair
    row = a.filter(F.col("id") == 7).collect()[0]
    merged = sorted(
        t for t in (row["input_text"] + " " + row["target_text"]).split()
        if not t.startswith("<extra_id_")
    )
    assert merged == sorted(f"w{i}" for i in range(24))


def test_span_corruption_validates(spark):
    import pytest

    from woodwork_spark.operators.text import span_corruption

    df = spark.createDataFrame([(1, "a")], "id long, text string")
    with pytest.raises(ValueError):
        span_corruption(df, "text", "id", block_len=0)
    with pytest.raises(ValueError):
        span_corruption(df, "text", "id", mask_rate=1.5)


# ---------------------------------------------------------------------------
# Generation eval: corpus BLEU + token F1
# ---------------------------------------------------------------------------


def _ref_bleu(pairs, max_n=4):
    """Independent corpus-BLEU (clipped counts pooled before ratios)."""
    import math
    from collections import Counter

    def grams(toks, n):
        return Counter(
            " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)
        )

    c_len = r_len = 0
    clip = [0] * max_n
    tot = [0] * max_n
    for p, r in pairs:
        pt, rt = p.split(), r.split()
        c_len += len(pt)
        r_len += len(rt)
        for n in range(1, max_n + 1):
            cg, rg = grams(pt, n), grams(rt, n)
            tot[n - 1] += sum(cg.values())
            clip[n - 1] += sum(min(v, rg[g]) for g, v in cg.items())
    ps = [c / t if t else 0.0 for c, t in zip(clip, tot)]
    if any(p <= 0 for p in ps) or c_len == 0:
        return 0.0
    bp = math.exp(1 - r_len / c_len) if c_len < r_len else 1.0
    return bp * math.exp(sum(math.log(p) for p in ps) / max_n)


def test_bleu_corpus_matches_reference(spark):
    from woodwork_spark.operators.evaluation import bleu_corpus

    pairs = [
        ("the cat sat on the mat", "the cat sat on the mat"),
        ("the the the cat on a mat", "the cat sat on the mat"),
        ("a quick brown fox jumps over things", "the quick brown fox jumps"),
        ("short one", "a much longer reference than that"),
    ]
    df = spark.createDataFrame(pairs, "pred string, ref string")
    row = bleu_corpus(df, "pred", "ref").collect()[0]
    assert abs(row["bleu"] - _ref_bleu(pairs)) < 1e-12
    # clipping: "the" capped at its reference count
    clip_df = spark.createDataFrame(
        [("the the the the", "the cat")], "pred string, ref string",
    )
    r2 = bleu_corpus(clip_df, "pred", "ref").collect()[0]
    assert abs(r2["p1"] - 1 / 4) < 1e-12
    # zero 4-gram level -> BLEU exactly 0
    assert r2["bleu"] == 0.0
    # identical corpus -> 1.0
    ident = spark.createDataFrame(
        [("a b c d e", "a b c d e")], "pred string, ref string",
    )
    assert bleu_corpus(ident, "pred", "ref").collect()[0]["bleu"] == 1.0


def test_generation_token_f1_conventions(spark):
    from woodwork_spark.operators.evaluation import generation_token_f1

    df = spark.createDataFrame(
        [
            ("a b c", "a b c"),     # EM 1, F1 1
            ("a b x", "a b c"),     # F1 = 2/3... overlap 2, p=r=2/3
            ("", ""),               # both empty -> 1, 1
            ("a", ""),              # one empty -> 0, 0
            (None, "a"),            # dropped
        ],
        "pred string, ref string",
    )
    row = generation_token_f1(df, "pred", "ref").collect()[0]
    assert row["n"] == 4
    assert abs(row["exact_match"] - 0.5) < 1e-12
    assert abs(row["token_f1"] - (1.0 + 2 / 3 + 1.0 + 0.0) / 4) < 1e-12


def test_token_budget_report(spark):
    from woodwork_spark.operators.text import token_budget_report

    df = spark.createDataFrame(
        [
            ("en", "one two three"),
            ("en", None),
            ("de", "eins zwei"),
        ],
        "lang string, text string",
    )
    got = {
        r["group"]: r
        for r in token_budget_report(df, "text", "lang").collect()
    }
    assert got["en"]["n_docs"] == 2 and got["en"]["n_null"] == 1
    assert got["en"]["ws_tokens"] == 3
    assert abs(got["en"]["token_share"] - 3 / 5) < 1e-12
    assert abs(got["de"]["tokens_per_doc"] - 2.0) < 1e-12
    # corpus-level single row when group_col omitted
    row = token_budget_report(df, "text").collect()
    assert len(row) == 1 and row[0]["ws_tokens"] == 5


def test_remove_boilerplate_lines_per_group(spark):
    """A line ubiquitous within ONE group but rare corpus-wide is
    removed with group_col and survives without it."""
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.cleaning import remove_boilerplate_lines

    rows = [
        (1, "a", "NAV A\nbody one"),
        (2, "a", "NAV A\nbody two"),
        (3, "b", "NAV A\nbody three"),   # same line, different group
        (4, "b", "other\nbody four"),
    ]
    df = spark.createDataFrame(rows, "id long, grp string, text string")
    grouped = remove_boilerplate_lines(
        df, "text", "id", min_docs=2, group_col="grp",
    )
    got = {r["id"]: r["text"] for r in grouped.collect()}
    release(grouped)
    assert got[1] == "body one" and got[2] == "body two"
    # only one doc in group b carries the line -> kept there
    assert got[3] == "NAV A\nbody three"
    # global counting would have removed it from doc 3 as well
    global_ = remove_boilerplate_lines(df, "text", "id", min_docs=2)
    got_g = {r["id"]: r["text"] for r in global_.collect()}
    release(global_)
    assert got_g[3] == "body three"


# ---------------------------------------------------------------------------
# Sitemap parsing
# ---------------------------------------------------------------------------


def test_parse_sitemap_urls(spark):
    import pytest

    from woodwork_spark.operators.web import parse_sitemap_urls

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.com/p?x=1&amp;y=2 </loc>"
        "<lastmod>2024-01-02</lastmod></url>"
        "<url>\n<loc>https://a.com/q</loc>\n</url>"
        "<url><lastmod>2024-01-01</lastmod></url>"  # loc-less: dropped
        "</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.com", xml), ("b.com", idx)], "domain string, xml string",
    )
    rows = {
        (r["domain"], r["pos"]): (r["url"], r["lastmod"])
        for r in parse_sitemap_urls(df, "domain", "xml").collect()
    }
    assert rows == {
        ("a.com", 0): ("https://a.com/p?x=1&y=2", "2024-01-02"),
        ("a.com", 1): ("https://a.com/q", None),
    }
    got_idx = parse_sitemap_urls(df, "domain", "xml", tag="sitemap").collect()
    assert [(r["domain"], r["url"]) for r in got_idx] == [
        ("b.com", "https://a.com/s1.xml"),
    ]
    with pytest.raises(ValueError):
        parse_sitemap_urls(df, "domain", "xml", tag="loc")


# ---------------------------------------------------------------------------
# Bitext QA
# ---------------------------------------------------------------------------


def test_bitext_filter_reasons(spark):
    from woodwork_spark.operators.cleaning import bitext_filter

    rows = [
        (1, "the cat sat.", "le chat est assis."),            # keep
        (2, "the cat sat.", "the cat sat."),                  # copy
        (3, "the cat sat on the mat today fine.", "chat."),   # ratio
        (4, "price is 42 dollars.", "le prix est 43 dollars."),  # digits
        (5, "the cat sat here.", "the cat sat la."),          # overlap
        (6, None, "x"),                                       # null side
    ]
    df = spark.createDataFrame(rows, "id long, src string, tgt string")
    got = {
        r["id"]: r for r in bitext_filter(df, "src", "tgt").collect()
    }
    assert [got[i]["bitext_keep"] for i in range(1, 7)] == [
        True, False, False, False, False, False,
    ]
    assert got[2]["is_copy"] and not got[3]["ratio_ok"]
    assert got[4]["digit_mismatch"]
    assert got[5]["token_overlap"] == 0.75
    import pytest

    with pytest.raises(ValueError):
        bitext_filter(df, "src", "tgt", max_len_ratio=1.0)


# ---------------------------------------------------------------------------
# Instruction / chat QA
# ---------------------------------------------------------------------------


def test_instruction_qa_signals(spark):
    from woodwork_spark.operators.chat import instruction_qa_exprs

    df = spark.createDataFrame(
        [
            (1, "Explain AQE.", "AQE replans at runtime."),
            (2, "Do a thing.", "I'm sorry, I can't help with that."),
            (3, "Write code.", "Sure: ```py\nx=1\n``` done"),
            (4, "Echo me.", "you said: echo me. here it is"),
            (5, "Q", "as an AI language model I cannot say"),
            (6, "Q", "broken ``` fence"),
        ],
        "id long, prompt string, response string",
    )
    got = {
        r["id"]: r
        for r in df.withColumns(
            instruction_qa_exprs("prompt", "response"),
        ).collect()
    }
    assert not got[1]["is_refusal"] and not got[1]["template_leak"]
    assert got[2]["is_refusal"]
    assert got[3]["code_fences_balanced"] and not got[6]["code_fences_balanced"]
    assert got[4]["prompt_echo"] and not got[1]["prompt_echo"]
    assert got[5]["template_leak"] and got[5]["is_refusal"]
    import pytest

    with pytest.raises(ValueError):
        instruction_qa_exprs("prompt", "response", head_chars=0)


def test_chat_turn_checks_protocol(spark):
    from woodwork_spark.operators.chat import chat_turn_checks

    def mk(*rc):
        return [{"role": a, "content": b} for a, b in rc]

    chats = [
        (1, mk(("user", "hi"), ("assistant", "hello"))),
        # leading system message is legal and excluded from the checks
        (2, mk(("system", "be nice"), ("user", "hi"), ("assistant", "yo"))),
        (3, mk(("assistant", "hi first"), ("user", "?"))),
        (4, mk(("user", "a"), ("user", "b"), ("assistant", "c"))),
        (5, mk(("user", "a"), ("assistant", "  "))),
        (6, None),
        (7, mk(("user", "a"), ("robot", "b"))),
    ]
    df = spark.createDataFrame(
        chats, "id long, messages array<struct<role string, content string>>",
    )
    got = {r["id"]: r for r in chat_turn_checks(df, "messages").collect()}
    assert got[1]["chat_valid"] and got[2]["chat_valid"]
    assert got[2]["n_turns"] == 2, "system message must not count"
    assert not got[3]["chat_valid"] and not got[3]["starts_with_user"]
    assert not got[4]["roles_alternate"]
    assert got[5]["has_empty_content"]
    assert not got[6]["chat_valid"] and got[6]["n_turns"] is None
    assert not got[7]["roles_known"] and not got[7]["chat_valid"]


# ---------------------------------------------------------------------------
# FIM + code QA
# ---------------------------------------------------------------------------


def test_fim_transform_layouts(spark):
    import pytest

    from woodwork_spark.operators.text import fim_transform

    df = spark.createDataFrame(
        [(1, "0123456789"), (2, None), (3, "")], "id long, text string",
    )

    def ca(idc, ln):
        return (idc * 3) % (ln + 1)

    def cb(idc, ln):
        return (idc * 7) % (ln + 1)

    got = {
        r["id"]: r["fim_text"]
        for r in fim_transform(df, "text", "id", cut_exprs=(ca, cb)).collect()
    }
    assert got[1] == "<fim_prefix>012<fim_suffix>789<fim_middle>3456"
    assert got[2] is None
    assert got[3] == "<fim_prefix><fim_suffix><fim_middle>"
    # every char survives exactly once, any cut points
    parts = got[1].replace("<fim_prefix>", "|").replace(
        "<fim_suffix>", "|").replace("<fim_middle>", "|").split("|")
    assert sorted("".join(parts)) == sorted("0123456789")
    # default hash cuts are deterministic
    a = fim_transform(df, "text", "id").collect()
    b = fim_transform(df, "text", "id").collect()
    assert a == b
    spm = fim_transform(
        df, "text", "id", mode="spm", cut_exprs=(ca, cb),
    ).collect()[0]["fim_text"]
    assert spm.startswith("<fim_suffix>")
    with pytest.raises(ValueError):
        fim_transform(df, "text", "id", mode="pms")


def test_code_qa_exprs(spark):
    from woodwork_spark.operators.cleaning import code_qa_exprs

    code = (
        "#!/usr/bin/env python\n# auto-generated - do not edit\n"
        "def f():\n\treturn 1\n   x = 2\n// c-style\n"
    )
    df = spark.createDataFrame(
        [(1, code), (2, "x" * 200), (3, None)], "id long, text string",
    )
    got = {r["id"]: r for r in df.withColumns(code_qa_exprs("text")).collect()}
    assert got[1]["n_lines"] == 6
    assert got[1]["is_autogenerated"] and got[1]["mixed_indentation"]
    assert abs(got[1]["comment_line_frac"] - 0.5) < 1e-12
    assert got[2]["max_line_len"] == 200 and not got[2]["is_autogenerated"]
    assert got[2]["alnum_frac"] == 1.0
    assert got[3]["n_lines"] is None


# ---------------------------------------------------------------------------
# Embedding health + matryoshka
# ---------------------------------------------------------------------------


def test_embedding_health_report(spark):
    from woodwork_spark.operators.embedding import embedding_health_report

    rows = [
        (1, [1.0, 2.0]),
        (2, None),
        (3, []),
        (4, [float("nan"), 1.0]),
        (5, [0.0, 0.0]),
        (6, [3.0, 4.0]),
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    r = embedding_health_report(df, "v").collect()[0]
    assert r["n"] == 6 and r["n_null"] == 1 and r["n_empty"] == 1
    assert r["n_nonfinite"] == 1 and r["n_zero_norm"] == 1
    assert r["n_dims"] == 2  # lengths 0 and 2
    assert r["modal_dim"] == 2
    assert abs(r["norm_max"] - 5.0) < 1e-12


def test_matryoshka_report_full_prefix_is_exact(spark):
    import pytest

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.embedding import matryoshka_report

    df = spark.range(40).select(
        F.col("id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (F.pmod(F.xxhash64(F.col("id"), i), 100) / 50.0 - 1.0),
        ).alias("v"),
    )
    out = matryoshka_report(
        df, "id", "v", dims=[2, 8], sample_expr=lambda c: c % 2 == 0,
    )
    rows = {r["dim"]: r for r in out.collect()}
    release(out)
    assert rows[8]["mae"] == 0.0 and rows[8]["max_err"] == 0.0
    assert rows[2]["mae"] > 0.0
    assert rows[2]["n_pairs"] == 19
    with pytest.raises(ValueError):
        matryoshka_report(df, "id", "v", dims=[])


# ---------------------------------------------------------------------------
# HTML strip + QA
# ---------------------------------------------------------------------------


def test_html_strip_and_qa(spark):
    from woodwork_spark.operators.web import html_qa_exprs, html_strip_expr

    html = (
        '<html><head><style>p{color:red}</style>'
        '<script>var x="<p>decoy</p>";</script></head>'
        "<body><!-- note --><h1>Title &amp; More</h1>"
        "<p>Hello&nbsp;world.</p><p>Second   para</p>"
        '<a href="/x">link</a></body></html>'
    )
    df = spark.createDataFrame(
        [(1, html), (2, None), (3, "plain text")], "id long, h string",
    )
    got = {
        r["id"]: r["t"]
        for r in df.select("id", html_strip_expr("h").alias("t")).collect()
    }
    assert got[1] == "Title & More Hello world. Second para link"
    assert got[2] is None
    assert got[3] == "plain text"
    r = df.withColumns(html_qa_exprs("h")).filter("id=1").collect()[0]
    # the <p> inside the script string is code, not structure
    assert r["n_paragraphs"] == 2
    assert r["n_links"] == 1
    assert r["has_script"] and r["has_style"]
    assert 0 < r["text_ratio"] < 1


def test_preference_pair_qa(spark):
    import pytest

    from woodwork_spark.operators.chat import preference_pair_qa_exprs

    rows = [
        (1, "Good long answer here.", "A different bad answer."),
        (2, "same text", "same text"),
        (3, "a longer text that contains it", "contains it"),
        (4, "word " * 40, "w"),
        (5, "I'm sorry, I can't help.", "Here is how to do it."),
        (6, None, "x"),
    ]
    df = spark.createDataFrame(rows, "id long, chosen string, rejected string")
    got = {
        r["id"]: r
        for r in df.withColumns(
            preference_pair_qa_exprs("chosen", "rejected"),
        ).collect()
    }
    assert got[1]["pair_valid"]
    assert got[2]["identical_pair"] and not got[2]["pair_valid"]
    assert got[3]["one_contains_other"] and not got[3]["pair_valid"]
    assert not got[4]["len_gap_ok"] and not got[4]["pair_valid"]
    assert got[5]["chosen_refusal"] and not got[5]["rejected_refusal"]
    assert got[5]["pair_valid"], "refusal flags, does not invalidate"
    assert not got[6]["pair_valid"]
    with pytest.raises(ValueError):
        preference_pair_qa_exprs("chosen", "rejected", max_len_gap=1.0)


def test_with_registered_domain_property_parity(spark):
    """Property: on ANY host built from random labels, resolving with
    the built-in suffix subset AS DATA equals the literal-expression
    path (the technique that caught round 8's www-strip bug)."""
    from hypothesis import given, settings, strategies as st

    from woodwork_spark.operators.web import (
        MULTIPART_SUFFIXES,
        with_registered_domain,
    )

    sfx = spark.createDataFrame(
        [(s,) for s in MULTIPART_SUFFIXES], "suffix string",
    )
    label = st.sampled_from(
        ["www", "a", "shop", "co", "uk", "com", "example", "x0", "jp"],
    )

    @settings(max_examples=8, deadline=None)
    @given(hosts=st.lists(
        st.lists(label, min_size=1, max_size=5).map(".".join),
        min_size=1, max_size=8,
    ))
    def run(hosts):
        df = spark.createDataFrame([(h,) for h in hosts], "host string")
        via_data = with_registered_domain(
            df, "host", suffixes=sfx, from_host=True,
        ).select("host", "domain")
        via_expr = with_registered_domain(
            df, "host", suffixes=None, from_host=True,
        ).select("host", "domain")
        d1 = sorted(map(tuple, via_data.collect()))
        d2 = sorted(map(tuple, via_expr.collect()))
        assert d1 == d2, (d1, d2)

    run()
