"""Round 8: advisor-fix regressions (two-sample lifecycle, srm_check
plan shape, join-health fan-out semantics, rotation freshness) plus the
new URL-governance and paragraph-dedup operators."""

import pytest


def _executed_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# Advice fixes
# ---------------------------------------------------------------------------


def test_two_sample_cells_release_lifecycle(spark):
    """ks/cvm/wasserstein results must carry the persisted frames their
    shared cells scaffold created, so callers can release() them —
    the crossJoin used to strip the lifecycle attrs (r7 advice)."""
    from woodwork_spark.lifecycle import persisted_frames, release
    from woodwork_spark.operators.stats_tests import (
        cvm_test_2samp,
        ks_test_2samp,
        wasserstein_1d,
    )

    df = spark.createDataFrame(
        [(float(i % 17), i % 3 == 0) for i in range(300)],
        "v double, a boolean",
    )
    for fn in (ks_test_2samp, cvm_test_2samp, wasserstein_1d):
        out = fn(df, "v", "a")
        frames = persisted_frames(out)
        assert frames, f"{fn.__name__} lost its persisted frames"
        out.collect()
        assert release(out) >= 1
    # distributed path (range-partitioned prefix sums) too
    out = ks_test_2samp(df, "v", "a", small_threshold=4)
    assert persisted_frames(out)
    out.collect()
    assert release(out) >= 1


def test_srm_check_no_window_in_plan(spark):
    """The designed-arm total is a one-row broadcast fold, not a
    partitionBy(lit(1)) window — a corrupted high-cardinality arm_col
    must not funnel every distinct arm through one reducer."""
    from woodwork_spark.operators.causal import srm_check

    df = spark.createDataFrame(
        [(f"arm{i % 4}",) for i in range(100)], "arm string",
    )
    out = srm_check(df, "arm", {"arm0": 1, "arm1": 1, "arm2": 1, "arm3": 1})
    plan = _executed_plan(out)
    assert "Window" not in plan
    r = out.first()
    assert r["n"] == 100 and r["n_arms"] == 4 and r["n_unknown"] == 0
    assert r["dof"] == 3 and abs(r["chi2"]) < 1e-9


def test_srm_check_unknown_arm_still_counted(spark):
    from woodwork_spark.operators.causal import srm_check

    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 50 + [("zz",)] * 7, "arm string",
    )
    r = srm_check(df, "arm", {"a": 1, "b": 1}).first()
    assert r["n"] == 100 and r["n_unknown"] == 7
    assert abs(r["chi2"]) < 1e-9


def test_join_health_fanout_only_counts_matched_keys(spark):
    """A duplicated dim key with zero matching fact rows multiplies
    nothing, so it must not win max_fanout (r7 advice)."""
    from woodwork_spark.operators.quality_checks import join_health_report

    fact = spark.createDataFrame([(1,), (1,), (2,)], "k long")
    # key 9 is triplicated in the dim but absent from the fact;
    # key 1 is duplicated and matched -> the real worst fan-out is 2
    dim = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (9,)], "k long",
    )
    r = join_health_report(fact, dim, "k").first()
    assert r["max_fanout"] == 2
    assert r["inner_join_rows"] == 2 * 2 + 1
    assert r["n_dim_dup_keys"] == 2


def test_rotation_prepends_never_verified_queries():
    """Queries with no CORRECTNESS_r* row ever must come FIRST (newest
    registration first), so work added this round or last round lands
    inside the driver's 50-query window instead of shipping unverified."""
    import glob
    import json
    import os

    import __spark_entry__ as e

    here = os.path.dirname(os.path.abspath(e.__file__))
    verified = set()
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        with open(p) as f:
            verified |= set(json.load(f))
    if not (verified & set(e.QUERIES)) or verified >= set(e.QUERIES):
        pytest.skip("no recorded rounds, or every query already verified")
    keys = list(e.queries())
    n_fresh = sum(1 for k in keys if k not in verified)
    assert all(k not in verified for k in keys[:n_fresh])
    assert all(k in verified for k in keys[n_fresh:])
    # oracle ordering must mirror queries() so the driver pairs them
    o = list(e.oracle_sql())
    assert o == [k for k in keys if k in e.ORACLE]


# ---------------------------------------------------------------------------
# URL / domain governance
# ---------------------------------------------------------------------------


def test_canonicalize_url_golden(spark):
    from woodwork_spark.operators.web import canonicalize_url_expr

    cases = [
        # tracking params stripped, params sorted, www/case/default port
        # /duplicate slash/trailing slash/fragment all normalized
        ("https://WWW.Example.com:443//a//b/?utm_source=x&b=2&a=1#f",
         "https://example.com/a/b?a=1&b=2"),
        ("https://example.com/a/b?a=1&b=2",
         "https://example.com/a/b?a=1&b=2"),
        # non-default port kept; default http port dropped
        ("http://shop.example.co.uk:8080/p/",
         "http://shop.example.co.uk:8080/p"),
        ("http://Example.co.uk:80/p", "http://example.co.uk/p"),
        # userinfo dropped
        ("https://user:pw@example.com/a?gclid=z&b=2&a=1",
         "https://example.com/a?a=1&b=2"),
        # empty path -> /
        ("https://sub.example.com", "https://sub.example.com/"),
        # only tracking params -> query dropped entirely
        ("https://example.com/x?utm_campaign=a&fbclid=b",
         "https://example.com/x"),
        # schemeless -> NULL
        ("not a url", None),
        ("/relative/only", None),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    got = df.select("want", canonicalize_url_expr("url").alias("got"))
    for r in got.collect():
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_registered_domain_golden(spark):
    from woodwork_spark.operators.web import registered_domain_expr

    cases = [
        ("https://www.example.com/x", "example.com"),
        ("https://a.b.deep.example.com/x", "example.com"),
        ("http://shop.example.co.uk/x", "example.co.uk"),
        ("http://example.co.uk/x", "example.co.uk"),
        ("http://192.168.0.1/x", "192.168.0.1"),
        ("http://localhost/x", "localhost"),
        ("nota url", None),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    got = df.select("want", registered_domain_expr("url").alias("got"))
    for r in got.collect():
        assert r["got"] == r["want"], (r["got"], r["want"])


def test_canonical_url_dedup_and_report(spark):
    from woodwork_spark.operators.web import (
        canonical_url_dedup,
        domain_governance_report,
    )

    df = spark.createDataFrame(
        [
            (1, "https://WWW.Example.com/a?utm_source=x&b=2&a=1"),
            (2, "https://example.com/a?a=1&b=2"),  # dup of 1
            (3, "https://example.com/other"),
            (4, "garbage"),  # unparsed: kept as its own row
        ],
        "id long, url string",
    )
    kept = canonical_url_dedup(df, "url", ["id"])
    assert sorted(r["id"] for r in kept.collect()) == [1, 3, 4]
    rep = {
        r["domain"]: r
        for r in domain_governance_report(df, "url").collect()
    }
    ex = rep["example.com"]
    assert ex["n_urls"] == 3 and ex["n_canonical"] == 2
    assert ex["n_dup"] == 1 and abs(ex["dup_rate"] - 1 / 3) < 1e-9
    assert rep[None]["n_unparsed"] == 1


def test_cap_per_domain_subdomains_share_cap(spark):
    from woodwork_spark.operators.web import cap_per_domain

    rows = [
        (i, f"https://sub{i % 7}.example.com/p/{i}") for i in range(40)
    ] + [(100 + i, f"https://other.org/q/{i}") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, url string")
    out = cap_per_domain(df, "url", 10, ["id"])
    got = sorted(r["id"] for r in out.collect())
    # 7 subdomains can't evade the example.com cap of 10
    assert got == list(range(10)) + [100, 101, 102]


# ---------------------------------------------------------------------------
# Paragraph-level cross-doc dedup
# ---------------------------------------------------------------------------


def test_dedup_paragraphs_global(spark):
    from woodwork_spark.lifecycle import persisted_frames, release
    from woodwork_spark.operators.cleaning import dedup_paragraphs_global

    rows = [
        (1, "alpha one\n\nshared plate\n\nbeta two"),
        # extra blank lines / horizontal whitespace between paragraphs
        (2, "gamma three\n  \n\t\nshared plate\n\ndelta four"),
        (3, "shared plate"),
        (4, None),
        (5, "unique only"),
        # intra-document repetition dedups too
        (6, "solo para\n\nsolo para"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    out = dedup_paragraphs_global(df, "t", "id")
    got = {r["id"]: r["t"] for r in out.collect()}
    assert got[1] == "alpha one\n\nshared plate\n\nbeta two"
    assert got[2] == "gamma three\n\ndelta four"
    assert got[3] == ""
    assert got[4] is None
    assert got[5] == "unique only"
    assert got[6] == "solo para"
    assert persisted_frames(out)
    assert release(out) >= 1


def test_dedup_paragraphs_plan_no_python_udf(spark):
    from woodwork_spark.operators.cleaning import dedup_paragraphs_global

    df = spark.createDataFrame([(1, "a\n\nb")], "id long, t string")
    plan = _executed_plan(dedup_paragraphs_global(df, "t", "id"))
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Opportunistic real media decode (r7 verdict #4)
# ---------------------------------------------------------------------------


def _stdlib_wav(rate=8000, n=400, channels=1, bits=16, freq=440.0):
    """A REAL wav file written by stdlib wave, not a hand-packed header."""
    import io
    import math
    import struct as st
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(bits // 8)
        w.setframerate(rate)
        amp = 2 ** (bits - 1) - 1
        frames = b"".join(
            st.pack(
                "<" + "h" * channels,
                *([int(amp * 0.5 * math.sin(2 * math.pi * freq * i / rate))]
                  * channels),
            )
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_try_pil_dispatch_with_fake_module(monkeypatch):
    """_try_pil resolves the codec at call time: absent -> None (stub
    path), present -> the module (real path) — proven by planting a
    fake PIL into sys.modules."""
    import sys
    import types

    from woodwork_spark.operators import multimodal as mm

    # this container has no Pillow: the stub path is live
    assert mm._try_pil() is None

    class _FakeImg:
        def __init__(self, px):
            self._px = px

        def convert(self, mode):
            return self

        def resize(self, wh):
            return self

        def getdata(self):
            return self._px

    fake_image_mod = types.SimpleNamespace(
        open=lambda fp: _FakeImg([0, 51, 102, 153]),
    )
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image", fake_image_mod,
    )
    got = mm._try_pil()
    assert got is fake_image_mod
    feats = mm._real_image_features(b"anything", 4, got)
    assert feats == [0.0, 51 / 255.0, 102 / 255.0, 153 / 255.0]
    # corrupt-safe: a decoder that raises yields None, never an error
    bad = types.SimpleNamespace(
        open=lambda fp: (_ for _ in ()).throw(OSError("bad")),
    )
    assert mm._real_image_features(b"x", 4, bad) is None


def test_image_real_decode_still_stubbed_without_pil(spark):
    from woodwork_spark.operators.multimodal import image_features

    df = spark.createDataFrame([(1, b"\x89PNG")], "id long, img binary")
    out = image_features(df, "img", "id", decoder="real")
    with pytest.raises(Exception, match="(?i)not.*implemented"):
        out.collect()


def test_audio_real_decode_is_real_for_wav(spark):
    """decoder='real' genuinely decodes WAV PCM with stdlib wave —
    per-segment RMS cross-checked against numpy on the same samples."""
    import numpy as np

    from woodwork_spark.operators.multimodal import (
        _real_audio_features,
        audio_features,
    )

    wav = _stdlib_wav(rate=8000, n=400)
    # driver-side kernel vs numpy reference
    feats = _real_audio_features(wav, 8)
    import io
    import wave as wv

    with wv.open(io.BytesIO(wav)) as w:
        x = np.frombuffer(
            w.readframes(w.getnframes()), dtype=np.int16,
        ).astype(np.float64) / 32768.0
    want = [float(np.sqrt(np.mean(s * s))) for s in np.array_split(x, 8)]
    assert feats == pytest.approx(want)
    assert max(feats) > 0.1  # a real sine has real energy

    # end-to-end through mapInPandas, with a corrupt row alongside
    df = spark.createDataFrame(
        [(1, wav), (2, b"not audio"), (3, None)], "id long, snd binary",
    )
    got = {
        r["id"]: r["features"]
        for r in audio_features(df, "snd", "id", 8, decoder="real").collect()
    }
    assert got[1] == pytest.approx(want)
    assert got[2] is None and got[3] is None


def test_audio_real_decode_stereo_downmix():
    from woodwork_spark.operators.multimodal import _real_audio_features

    wav = _stdlib_wav(rate=8000, n=200, channels=2)
    feats = _real_audio_features(wav, 4)
    assert feats is not None and len(feats) == 4 and max(feats) > 0.1


# ---------------------------------------------------------------------------
# Two-sample battery completion: Mann-Whitney / AD / energy / QQ shift
# ---------------------------------------------------------------------------


def _two_samples():
    import numpy as np

    rng = np.random.RandomState(7)
    a = np.round(rng.gamma(2.0, 2.0, 120), 1)  # rounding forces ties
    b = np.round(rng.gamma(2.0, 2.4, 90) + 0.3, 1)
    return a, b


def _spark_two_sample_df(spark, a, b):
    rows = [(float(v), True) for v in a] + [(float(v), False) for v in b]
    return spark.createDataFrame(rows, "v double, a boolean")


def test_mannwhitney_matches_brute_force(spark):
    import math

    import numpy as np

    from woodwork_spark.operators.stats_tests import mannwhitney_u

    a, b = _two_samples()
    pooled = np.concatenate([a, b])
    # midranks with average ties, numpy-only
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sorted_v = pooled[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j < len(sorted_v) and sorted_v[j] == sorted_v[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    ra = ranks[: len(a)].sum()
    na, nb = len(a), len(b)
    ua = ra - na * (na + 1) / 2.0
    n = na + nb
    _, counts = np.unique(pooled, return_counts=True)
    ties = (counts.astype(float) ** 3 - counts).sum()
    sig2 = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (ua - na * nb / 2.0) / math.sqrt(sig2)
    p = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(z) / math.sqrt(2.0))))

    r = mannwhitney_u(
        _spark_two_sample_df(spark, a, b), "v", "a",
    ).first()
    assert r["n_a"] == na and r["n_b"] == nb
    assert r["u_a"] == pytest.approx(ua)
    assert r["u_b"] == pytest.approx(na * nb - ua)
    assert r["z"] == pytest.approx(z, abs=1e-9)
    # p folds through the A&S erf polynomial (max abs err 1.5e-7)
    assert r["p_approx"] == pytest.approx(p, abs=1e-6)


def test_mannwhitney_all_tied_is_null(spark):
    from woodwork_spark.operators.stats_tests import mannwhitney_u

    df = spark.createDataFrame(
        [(1.0, True)] * 5 + [(1.0, False)] * 5, "v double, a boolean",
    )
    r = mannwhitney_u(df, "v", "a").first()
    assert r["u_a"] == pytest.approx(12.5)  # all midranks 5.5
    assert r["z"] is None and r["p_approx"] is None


def test_ad_2samp_matches_brute_force(spark):
    import numpy as np

    from woodwork_spark.operators.stats_tests import ad_test_2samp

    a, b = _two_samples()
    # Scholz-Stephens eq. 3, k=2, computed independently from sorted
    # pooled distinct values
    pooled = np.concatenate([a, b])
    vals = np.unique(pooled)
    N, na, nb = len(pooled), len(a), len(b)
    a2 = 0.0
    for arr, ni in ((a, na), (b, nb)):
        s = 0.0
        for v in vals:
            bj = (pooled <= v).sum()
            if bj >= N:
                continue
            lj = (pooled == v).sum()
            mij = (arr <= v).sum()
            s += lj * (N * mij - ni * bj) ** 2 / (bj * (N - bj) * N)
        a2 += s / ni
    r = ad_test_2samp(_spark_two_sample_df(spark, a, b), "v", "a").first()
    assert r["a2_stat"] == pytest.approx(a2, rel=1e-9)


def test_ad_2samp_identical_samples_is_zero(spark):
    from woodwork_spark.operators.stats_tests import ad_test_2samp

    rows = [(float(v), s) for v in (1.0, 2.0, 3.0) for s in (True, False)]
    df = spark.createDataFrame(rows, "v double, a boolean")
    assert ad_test_2samp(df, "v", "a").first()["a2_stat"] == pytest.approx(0.0)


def test_energy_distance_matches_pairwise_brute_force(spark):
    import numpy as np

    from woodwork_spark.operators.stats_tests import energy_distance_1d

    a, b = _two_samples()
    exy = np.abs(a[:, None] - b[None, :]).mean()
    exx = np.abs(a[:, None] - a[None, :]).mean()
    eyy = np.abs(b[:, None] - b[None, :]).mean()
    e2 = 2 * exy - exx - eyy
    r = energy_distance_1d(
        _spark_two_sample_df(spark, a, b), "v", "a",
    ).first()
    assert r["e2"] == pytest.approx(e2, rel=1e-9)
    assert r["e_dist"] == pytest.approx(e2 ** 0.5, rel=1e-9)


def test_energy_distance_single_value_zero(spark):
    from woodwork_spark.operators.stats_tests import energy_distance_1d

    df = spark.createDataFrame(
        [(2.0, True), (2.0, False)], "v double, a boolean",
    )
    r = energy_distance_1d(df, "v", "a").first()
    assert r["n_a"] == 1 and r["n_b"] == 1
    assert r["e2"] == 0.0 and r["e_dist"] == 0.0


def test_qq_shift_matches_lower_quantiles(spark):
    import math

    import numpy as np

    from woodwork_spark.operators.stats_tests import qq_shift_2samp

    a, b = _two_samples()
    ps = (0.1, 0.5, 0.9)
    out = qq_shift_2samp(
        _spark_two_sample_df(spark, a, b), "v", "a", ps=ps,
    )
    got = {round(r["p"], 6): r for r in out.collect()}
    assert len(got) == len(ps)
    for p in ps:
        qa = float(np.sort(a)[math.ceil(p * len(a)) - 1])
        qb = float(np.sort(b)[math.ceil(p * len(b)) - 1])
        r = got[p]
        assert r["q_a"] == qa and r["q_b"] == qb
        assert r["shift"] == pytest.approx(qb - qa)


def test_new_two_sample_ops_release_lifecycle(spark):
    from woodwork_spark.lifecycle import persisted_frames, release
    from woodwork_spark.operators.stats_tests import (
        ad_test_2samp,
        energy_distance_1d,
        mannwhitney_u,
        qq_shift_2samp,
    )

    a, b = _two_samples()
    df = _spark_two_sample_df(spark, a, b)
    for fn in (mannwhitney_u, ad_test_2samp, energy_distance_1d,
               qq_shift_2samp):
        out = fn(df, "v", "a")
        assert persisted_frames(out), fn.__name__
        out.collect()
        assert release(out) >= 1


# ---------------------------------------------------------------------------
# Batch sessionize / snapshot drift / mSPRT / vocabulary coverage
# ---------------------------------------------------------------------------


def test_sessionize_and_stats(spark):
    from datetime import datetime, timedelta

    from woodwork_spark.operators.funnel import session_stats, sessionize

    t = lambda s: datetime(2024, 1, 1) + timedelta(seconds=s)  # noqa: E731
    rows = [
        (1, t(0)), (1, t(10)), (1, t(20)),       # session 0
        (1, t(2000)), (1, t(2005)),              # session 1 (gap > 30)
        (2, t(0)),                                # lone event
        (None, t(5)), (3, None),                  # null user / ts
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    s = sessionize(df, "user_id", "ts", gap_seconds=30.0)
    got = [
        (r["user_id"], r["session_idx"])
        for r in s.orderBy("user_id", "ts").collect()
    ]
    assert got == [
        (None, None), (1, 0), (1, 0), (1, 0), (1, 1), (1, 1),
        (2, 0), (3, None),
    ]
    st = {
        (r["user_id"], r["session_idx"]): r
        for r in session_stats(df, "user_id", "ts", 30.0).collect()
    }
    assert st[(1, 0)]["n_events"] == 3
    assert st[(1, 0)]["duration_sec"] == pytest.approx(20.0)
    assert st[(1, 1)]["n_events"] == 2
    assert st[(2, 0)]["n_events"] == 1
    assert st[(2, 0)]["duration_sec"] == 0.0
    assert len(st) == 3  # null rows form no session


def test_snapshot_drift_report(spark):
    from woodwork_spark.operators.quality_checks import snapshot_drift_report

    before = spark.createDataFrame(
        [(1, 10.0, "x"), (2, 20.0, None), (3, None, "z")],
        "id long, v double, s string",
    )
    after = spark.createDataFrame(
        [(1, 13.0, True), (2, 23.0, False)],
        "id long, v double, b boolean",
    )
    rep = {r["column"]: r for r in snapshot_drift_report(before, after).collect()}
    assert rep["s"]["status"] == "dropped"
    assert rep["s"]["null_rate_before"] == pytest.approx(1 / 3)
    assert rep["s"]["null_rate_after"] is None
    assert rep["b"]["status"] == "added"
    assert rep["v"]["status"] == "common"
    assert rep["v"]["mean_before"] == pytest.approx(15.0)
    assert rep["v"]["mean_after"] == pytest.approx(18.0)
    assert rep["v"]["mean_shift"] == pytest.approx(3.0)
    assert rep["v"]["null_rate_before"] == pytest.approx(1 / 3)
    assert rep["id"]["status"] == "common"
    # type change
    after2 = after.withColumn("id", (F_col("id")).cast("string"))
    rep2 = {
        r["column"]: r for r in snapshot_drift_report(before, after2).collect()
    }
    assert rep2["id"]["status"] == "type_changed"
    assert rep2["id"]["mean_before"] == pytest.approx(2.0)
    assert rep2["id"]["mean_after"] is None


def F_col(name):
    from pyspark.sql import functions as F

    return F.col(name)


def test_msprt_known_values(spark):
    import math

    from woodwork_spark.operators.causal import msprt_always_valid

    rows = [(True, float(v)) for v in (10, 12, 14, 16)] + [
        (False, float(v)) for v in (9, 11, 13)
    ]
    df = spark.createDataFrame(rows, "t boolean, y double")
    r = msprt_always_valid(df, "t", "y", tau=2.0).first()
    nt, nc = 4, 3
    mt, mc = 13.0, 11.0
    vt = sum((v - mt) ** 2 for v in (10, 12, 14, 16)) / (nt - 1)
    vc = sum((v - mc) ** 2 for v in (9, 11, 13)) / (nc - 1)
    vn = vt / nt + vc / nc
    tau2 = 4.0
    lam = math.sqrt(vn / (vn + tau2)) * math.exp(
        (mt - mc) ** 2 * tau2 / (2 * vn * (vn + tau2)),
    )
    assert r["n_t"] == nt and r["n_c"] == nc
    assert r["effect"] == pytest.approx(2.0)
    assert r["v_n"] == pytest.approx(vn)
    assert r["lambda_n"] == pytest.approx(lam)
    assert r["p_always_valid"] == pytest.approx(min(1.0, 1.0 / lam))
    # null effect -> lambda ~ sqrt(vn/(vn+tau2)) < 1 -> p clamps to 1
    null_rows = [(i % 2 == 0, float(i % 5)) for i in range(40)]
    df0 = spark.createDataFrame(null_rows, "t boolean, y double")
    assert msprt_always_valid(df0, "t", "y", 2.0).first()[
        "p_always_valid"
    ] == 1.0
    with pytest.raises(ValueError):
        msprt_always_valid(df, "t", "y", tau=0.0)


def test_vocabulary_coverage_golden(spark):
    from woodwork_spark.operators.text import vocabulary_coverage

    # tokens: a a a b b c d  -> N=7 V=4 n1=2 (c,d) n2=1 (b)
    df = spark.createDataFrame(
        [(1, "a A a b"), (2, "B c d")], "id long, t string",
    )
    r = vocabulary_coverage(df, "t").first()
    assert r["n_tokens"] == 7 and r["n_types"] == 4
    assert r["n1"] == 2 and r["n2"] == 1
    assert r["gt_unseen_mass"] == pytest.approx(2 / 7)
    assert r["coverage"] == pytest.approx(5 / 7)
    assert r["chao1_types"] == pytest.approx(4 + 2 * 1 / (2 * 2))


def test_fellegi_sunter_score(spark):
    import math

    from woodwork_spark.operators.dedup import fellegi_sunter_score

    pairs = spark.createDataFrame(
        [
            (1, 2, "p1", "p1", 7, 7),     # both agree -> match
            (3, 4, "p2", "zz", 7, 8),     # both disagree -> non_match
            (5, 6, None, "p3", 7, 7),     # phone missing -> weight 0
        ],
        "a long, b long, ph_a string, ph_b string, nat_a long, nat_b long",
    )
    out = fellegi_sunter_score(
        pairs,
        [(("ph_a", "ph_b"), 0.9, 0.001), (("nat_a", "nat_b"), 0.95, 0.04)],
        prior=0.01, upper=0.9, lower=0.1,
    )
    got = {r["a"]: r for r in out.collect()}
    w1 = math.log2(0.9 / 0.001) + math.log2(0.95 / 0.04)
    assert got[1]["fs_weight"] == pytest.approx(w1)
    odds = 0.01 / 0.99 * 2 ** w1
    assert got[1]["match_prob"] == pytest.approx(odds / (1 + odds))
    assert got[1]["fs_class"] == "match"
    assert got[3]["fs_class"] == "non_match"
    # missing field contributes zero evidence
    assert got[5]["fs_weight"] == pytest.approx(math.log2(0.95 / 0.04))
    with pytest.raises(ValueError):
        fellegi_sunter_score(pairs, [(("ph_a", "ph_b"), 0.5, 0.9)])


def test_record_linkage_end_to_end(spark):
    from woodwork_spark.operators.dedup import record_linkage

    left = spark.createDataFrame(
        [(1, "alice smith", "111", 5), (2, "bob jones", "222", 6),
         (3, "carol zhu", "333", 7)],
        "lid long, name string, phone string, nat long",
    )
    right = spark.createDataFrame(
        [(10, "alice smitx", "111", 5),   # 1-typo name, fields agree
         (20, "bob jonse", "999", 1),     # typo name, fields disagree
         (30, "zzzzzz yyyy", "333", 7)],  # name unblockable
        "rid long, name string, phone string, nat long",
    )
    out = record_linkage(
        left, right, "lid", "rid", "name",
        {"phone": (0.9, 0.001), "nat": (0.95, 0.04)},
        max_dist=2,
    )
    got = {(r["lid"], r["rid"]): r for r in out.collect()}
    assert got[(1, 10)]["fs_class"] == "match"
    assert got[(2, 20)]["fs_class"] == "non_match"
    assert (3, 30) not in got  # blocking never pairs them


def test_apply_url_policies_longest_match(spark):
    from woodwork_spark.operators.web import apply_url_policies

    df = spark.createDataFrame(
        [
            (1, "https://www.example.com/a/2/x"),    # /a deny
            (2, "https://sub.example.com/a/1/x"),    # /a/1 allow (longer)
            (3, "https://example.com/c"),            # no rule -> default
            (4, "https://other.org/a/2"),            # no domain rules
            (5, "not a url"),                        # unparseable -> deny
        ],
        "id long, url string",
    )
    rules = spark.createDataFrame(
        [("example.com", "/a", False), ("example.com", "/a/1", True)],
        "domain string, path_prefix string, allow boolean",
    )
    got = {
        r["id"]: (r["crawl_allowed"], r["matched_prefix"])
        for r in apply_url_policies(df, "url", "id", rules).collect()
    }
    assert got[1] == (False, "/a")
    assert got[2] == (True, "/a/1")
    assert got[3] == (True, None)
    assert got[4] == (True, None)
    assert got[5] == (False, None)
    # default_allow=False flips only the unmatched parseable rows
    got2 = {
        r["id"]: r["crawl_allowed"]
        for r in apply_url_policies(
            df, "url", "id", rules, default_allow=False,
        ).collect()
    }
    assert got2[3] is False and got2[4] is False
    assert got2[2] is True and got2[1] is False


def test_worst_slices_finds_planted_slice(spark):
    from woodwork_spark.operators.evaluation import worst_slices

    rows = []
    for i in range(400):
        seg = "bad" if i % 4 == 0 else f"ok{i % 3}"
        dev = f"d{i % 2}"
        # the 'bad' segment scores systematically lower
        y = (0.2 if seg == "bad" else 0.8) + (i % 7) * 0.01
        rows.append((seg, dev, y))
    df = spark.createDataFrame(rows, "seg string, dev string, y double")
    out = worst_slices(df, ["seg", "dev"], "y", min_n=30)
    worst = out.orderBy("z").first()
    assert worst["dim"] == "seg" and worst["value"] == "bad"
    assert worst["z"] < -10
    assert worst["mean"] < worst["mean_rest"]
    # null dimension values form their own slice
    df2 = df.withColumn(
        "seg", F_col("seg"),
    ).replace("bad", None, subset=["seg"])
    vals = {r["value"] for r in worst_slices(df2, ["seg"], "y", 30).collect()}
    assert "NULL" in vals


def test_off_policy_value_golden(spark):
    from woodwork_spark.operators.evaluation import off_policy_value

    # logged uniform over 2 actions (p=0.5); target always 'a'
    rows = [
        ("a", 1.0, 0.5), ("a", 0.0, 0.5), ("b", 1.0, 0.5), ("b", 1.0, 0.5),
        ("a", 1.0, 0.0),   # broken propensity -> excluded + counted
        ("a", 1.0, None),  # broken propensity -> excluded + counted
    ]
    df = spark.createDataFrame(rows, "a string, r double, p double")
    out = off_policy_value(df, "a", "r", "p", F_lit("a")).first()
    assert out["n"] == 4 and out["n_matched"] == 2
    assert out["n_bad_prop"] == 2
    assert out["value_logged"] == pytest.approx(3 / 4)
    # IPS: (2*1 + 2*0)/4 = 0.5 ; SNIPS: (2*1+2*0)/(2+2) = 0.5
    assert out["value_ips"] == pytest.approx(0.5)
    assert out["value_snips"] == pytest.approx(0.5)
    assert out["ess"] == pytest.approx((2 + 2) ** 2 / (4 + 4))
    # clipping caps the weight
    clipped = off_policy_value(df, "a", "r", "p", F_lit("a"), clip=1.0)
    assert clipped.first()["value_ips"] == pytest.approx(
        (1.0 * 1 + 1.0 * 0) / 4,
    )


def F_lit(v):
    from pyspark.sql import functions as F

    return F.lit(v)


def test_yuen_trimmed_matches_brute_force(spark):
    import math

    import numpy as np

    from woodwork_spark.operators.stats_tests import yuen_trimmed_test

    a, b = _two_samples()

    def side(x, g=0.2):
        x = np.sort(x)
        n = len(x)
        k = int(math.floor(g * n))
        h = n - 2 * k
        trimmed = x[k:n - k]
        tmean = trimmed.mean()
        wins = np.concatenate([[x[k]] * k, trimmed, [x[n - k - 1]] * k])
        s2w = wins.var(ddof=1)
        d = s2w * (n - 1) / (h * (h - 1))
        return n, h, tmean, d

    na, ha, ma, da = side(a)
    nb, hb, mb, db = side(b)
    t = (ma - mb) / math.sqrt(da + db)
    dfree = (da + db) ** 2 / (da ** 2 / (ha - 1) + db ** 2 / (hb - 1))
    r = yuen_trimmed_test(
        _spark_two_sample_df(spark, a, b), "v", "a", trim=0.2,
    ).first()
    assert (r["n_a"], r["n_b"], r["h_a"], r["h_b"]) == (na, nb, ha, hb)
    assert r["tmean_a"] == pytest.approx(ma, rel=1e-9)
    assert r["tmean_b"] == pytest.approx(mb, rel=1e-9)
    assert r["t_stat"] == pytest.approx(t, rel=1e-9)
    assert r["df"] == pytest.approx(dfree, rel=1e-9)
    p = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(t) / math.sqrt(2.0))))
    assert r["p_approx"] == pytest.approx(p, abs=1e-6)
    with pytest.raises(ValueError):
        yuen_trimmed_test(_spark_two_sample_df(spark, a, b), "v", "a", 0.5)


def test_grouped_prefix_sums_both_paths(spark):
    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.rank import grouped_prefix_sums

    rows = [(g, i, 1, i % 3) for g in ("x", "y") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, o long, one long, w long")
    for thr in (100_000, 5):  # small-input window path + distributed path
        out = grouped_prefix_sums(
            df, "g", [F_col("o").asc()], ["one", "w"], ["c1", "cw"],
            inclusive=True, small_threshold=thr,
        )
        got = {
            (r["g"], r["o"]): (r["c1"], r["cw"])
            for r in out.collect()
        }
        for g in ("x", "y"):
            for i in range(40):
                want1 = i + 1
                wantw = sum(j % 3 for j in range(i + 1))
                assert got[(g, i)] == (want1, wantw), (thr, g, i)
        release(out)


def test_ks_by_group_matches_global(spark):
    """Each group's (d, p) must equal ks_test_2samp run on that group
    alone."""
    from woodwork_spark.operators.stats_tests import (
        ks_test_2samp,
        ks_test_2samp_by,
    )

    a, b = _two_samples()
    rows = [
        (f"g{i % 3}", float(v), True) for i, v in enumerate(a)
    ] + [(f"g{i % 3}", float(v), False) for i, v in enumerate(b)]
    df = spark.createDataFrame(rows, "g string, v double, a boolean")
    by = {
        r["g"]: r
        for r in ks_test_2samp_by(df, "g", "v", "a").collect()
    }
    assert len(by) == 3
    for gname in ("g0", "g1", "g2"):
        solo = ks_test_2samp(
            df.filter(F_col("g") == gname), "v", "a",
        ).first()
        assert by[gname]["n_a"] == solo["n_a"]
        assert by[gname]["n_b"] == solo["n_b"]
        assert by[gname]["d_stat"] == pytest.approx(solo["d_stat"])
        assert by[gname]["p_approx"] == pytest.approx(solo["p_approx"])


def test_ks_by_group_one_sided_group_is_null(spark):
    from woodwork_spark.operators.stats_tests import ks_test_2samp_by

    rows = [("g", 1.0, True), ("g", 2.0, True), ("h", 1.0, True),
            ("g", 1.5, False)]
    df = spark.createDataFrame(rows, "g string, v double, a boolean")
    got = {r["g"]: r for r in ks_test_2samp_by(df, "g", "v", "a").collect()}
    assert got["h"]["d_stat"] is None and got["h"]["p_approx"] is None
    assert got["g"]["d_stat"] is not None


def test_kruskal_wallis_matches_brute_force(spark):
    import numpy as np

    from woodwork_spark.operators.stats_tests import kruskal_wallis

    rng = np.random.RandomState(3)
    groups = {
        "a": np.round(rng.gamma(2, 2, 80), 1),
        "b": np.round(rng.gamma(2, 2.5, 60) + 0.2, 1),
        "c": np.round(rng.gamma(2, 1.8, 70), 1),
    }
    pooled = np.concatenate(list(groups.values()))
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sv = pooled[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n = len(pooled)
    h = 0.0
    off = 0
    for arr in groups.values():
        rg = ranks[off:off + len(arr)].sum()
        h += rg * rg / len(arr)
        off += len(arr)
    h = 12.0 / (n * (n + 1)) * h - 3 * (n + 1)
    _, counts = np.unique(pooled, return_counts=True)
    c = 1.0 - ((counts.astype(float) ** 3 - counts).sum()) / (n ** 3 - n)
    want = h / c

    rows = [
        (g, float(v)) for g, arr in groups.items() for v in arr
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    r = kruskal_wallis(df, "v", "g").first()
    assert r["k_groups"] == 3 and r["n_total"] == n
    assert r["h_corrected"] == pytest.approx(want, rel=1e-9)


def test_kruskal_all_tied_is_null(spark):
    from woodwork_spark.operators.stats_tests import kruskal_wallis

    df = spark.createDataFrame(
        [("a", 1.0)] * 4 + [("b", 1.0)] * 4, "g string, v double",
    )
    assert kruskal_wallis(df, "v", "g").first()["h_corrected"] is None


def test_round8_queries_no_python_udf(spark):
    """Every round-8 query stays JVM-side (Arrow pandas UDFs allowed,
    row-at-a-time BatchEvalPython never)."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    for name in (
        "url_governance", "paragraph_dedup", "mannwhitney", "energy_dist",
        "session_stats", "snapshot_drift", "record_linkage", "url_policy",
        "worst_slices", "off_policy", "yuen_trimmed", "ks_by_group",
        "kruskal_wallis",
    ):
        plan = _executed_plan(e.QUERIES[name](spark, sf))
        assert "BatchEvalPython" not in plan, name


def test_grouped_prefix_sums_distributed_plan_no_single_reducer(spark):
    """Above the small threshold the grouped prefix sums must range-
    partition on (group, order) — no partitionBy(group)-only window
    that would single-reduce a dominant group."""
    from woodwork_spark.operators.rank import grouped_prefix_sums

    rows = [("g", i, 1) for i in range(50)] + [("h", i, 1) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    out = grouped_prefix_sums(
        df, "g", [F_col("o").asc()], ["v"], ["cv"],
        inclusive=True, small_threshold=5,
    )
    plan = _executed_plan(out)
    assert "rangepartitioning" in plan.lower()


def test_try_pyav_dispatch_with_fake_module(monkeypatch):
    """frame_sample's real path resolves PyAV at call time, mirroring
    the PIL dispatch — absent here (stub raises), present -> module."""
    import sys
    import types

    from woodwork_spark.operators import multimodal as mm

    assert mm._try_pyav() is None
    fake_av = types.ModuleType("av")
    monkeypatch.setitem(sys.modules, "av", fake_av)
    assert mm._try_pyav() is fake_av


# ---------------------------------------------------------------------------
# Preference analytics (Bradley-Terry, transitivity)
# ---------------------------------------------------------------------------


def test_bradley_terry_matches_mm_reference(spark):
    import numpy as np

    from woodwork_spark.operators.preferences import bradley_terry

    wins = {("a", "b"): (8, 2), ("b", "c"): (7, 3), ("a", "c"): (9, 1)}
    rows = []
    for (x, y), (wx, wy) in wins.items():
        rows += [(x, y)] * wx + [(y, x)] * wy
    df = spark.createDataFrame(rows, "w string, l string")
    items = ["a", "b", "c"]
    idx = {it: i for i, it in enumerate(items)}
    n = np.zeros((3, 3))
    wtot = np.zeros(3)
    for (x, y), (wx, wy) in wins.items():
        n[idx[x], idx[y]] = n[idx[y], idx[x]] = wx + wy
        wtot[idx[x]] += wx
        wtot[idx[y]] += wy
    s = np.ones(3)
    for _ in range(12):
        denom = np.array([
            sum(n[i, j] / (s[i] + s[j]) for j in range(3) if j != i)
            for i in range(3)
        ])
        s = wtot / denom
    s = s * 3 / s.sum()
    got = {
        r["item"]: r
        for r in bradley_terry(df, "w", "l", iters=12).collect()
    }
    for it in items:
        assert got[it]["strength"] == pytest.approx(s[idx[it]], rel=1e-9)
    assert got["a"]["n_wins"] == 17 and got["a"]["n_games"] == 20
    # ranking follows dominance
    assert got["a"]["strength"] > got["b"]["strength"] > got["c"]["strength"]


def test_transitivity_report_cycle_detection(spark):
    from woodwork_spark.operators.preferences import transitivity_report

    consistent = [("a", "b")] * 3 + [("b", "c")] * 3 + [("a", "c")] * 3
    r = transitivity_report(
        spark.createDataFrame(consistent, "w string, l string"), "w", "l",
    ).first()
    assert r["n_triangles"] == 1 and r["n_cycles"] == 0
    assert r["cycle_rate"] == 0.0

    cyclic = [("a", "b")] * 3 + [("b", "c")] * 3 + [("c", "a")] * 3
    r = transitivity_report(
        spark.createDataFrame(cyclic, "w string, l string"), "w", "l",
    ).first()
    assert r["n_cycles"] == 1 and r["cycle_rate"] == 1.0
    # ties drop out of the majority-edge set
    tied = cyclic + [("b", "a")] * 3
    r = transitivity_report(
        spark.createDataFrame(tied, "w string, l string"), "w", "l",
    ).first()
    assert r["n_edges"] == 2 and r["n_triangles"] == 0


def test_grouped_prefix_sums_null_group_distributed(spark):
    """A NULL group key is a real group: its offsets must survive the
    null-safe broadcast join on the distributed path (eqNullSafe), and
    the exclusive mode must restart per group."""
    from woodwork_spark.operators.rank import grouped_prefix_sums

    rows = [(None, i, 1) for i in range(20)] + [
        ("g", i, 1) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "g string, o long, v long")
    for thr in (100_000, 4):
        out = grouped_prefix_sums(
            df, "g", [F_col("o").asc()], ["v"], ["cv"],
            inclusive=False, small_threshold=thr,
        )
        got = {(r["g"], r["o"]): r["cv"] for r in out.collect()}
        for g in (None, "g"):
            for i in range(20):
                assert got[(g, i)] == i, (thr, g, i)


def test_record_linkage_carries_persisted_frames(spark):
    from woodwork_spark.lifecycle import persisted_frames, release
    from woodwork_spark.operators.dedup import record_linkage

    left = spark.createDataFrame(
        [(1, "alice smith", "111")], "lid long, name string, ph string",
    )
    right = spark.createDataFrame(
        [(10, "alice smitx", "111")], "rid long, name string, ph string",
    )
    out = record_linkage(
        left, right, "lid", "rid", "name", {"ph": (0.9, 0.01)},
    )
    assert persisted_frames(out), "blocking-join caches lost"
    out.collect()
    assert release(out) >= 1


# ---------------------------------------------------------------------------
# Property: URL canonicalization is idempotent and domain-stable
# ---------------------------------------------------------------------------


def _url_strategy():
    from hypothesis import strategies as st

    label = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-",
        min_size=1, max_size=8,
    ).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
    host = st.lists(label, min_size=1, max_size=4).map(".".join)
    seg = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789._-", max_size=6,
    )
    path = st.lists(seg, max_size=4).map(
        lambda parts: "/" + "/".join(parts) if parts else "",
    )
    key = st.one_of(
        st.sampled_from(["a", "b", "q", "utm_source", "gclid", "ref"]),
        st.text(alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1,
                max_size=6),
    )
    param = st.tuples(key, seg).map(lambda kv: f"{kv[0]}={kv[1]}")
    query = st.lists(param, max_size=4).map("&".join)
    return st.builds(
        lambda scheme, www, h, port, p, slashes, q, frag: (
            scheme + "://" + ("WWW." if www else "") + h
            + (f":{port}" if port else "")
            + p + ("/" * slashes)
            + (f"?{q}" if q else "")
            + (f"#{frag}" if frag else "")
        ),
        st.sampled_from(["http", "https", "HTTP", "HttpS"]),
        st.booleans(),
        host,
        st.one_of(st.none(), st.sampled_from([80, 443, 8080])),
        path,
        st.integers(min_value=0, max_value=2),
        query,
        st.sampled_from(["", "frag", "x=1"]),
    )


def test_canonicalize_url_idempotent_property(spark):
    from hypothesis import given, settings

    from woodwork_spark.operators.web import (
        canonicalize_url_expr,
        registered_domain_expr,
    )

    @settings(max_examples=15, deadline=None)
    @given(_url_strategy())
    def check(url):
        df = spark.createDataFrame([(url,)], "url string")
        once = df.select(
            canonicalize_url_expr("url").alias("c1"),
            registered_domain_expr("url").alias("d0"),
        )
        r = once.select(
            "c1", "d0",
            canonicalize_url_expr("c1").alias("c2"),
            registered_domain_expr("c1").alias("d1"),
        ).first()
        # canonicalization is idempotent
        assert r["c2"] == r["c1"], (url, r["c1"], r["c2"])
        # the registered domain survives canonicalization (modulo the
        # canonical form's www-strip, which never changes eTLD+1)
        assert r["d1"] == r["d0"], (url, r["d0"], r["d1"])

    check()
