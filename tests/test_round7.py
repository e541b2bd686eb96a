"""Round 7: real stdlib multimodal header codecs, is_schema_valid,
known_count calling conventions (zero probe jobs / no persist),
rotation of the driver correctness window."""

import struct

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Hand-built media fixtures (every byte written by struct.pack here)
# ---------------------------------------------------------------------------

def make_png(w, h):
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x02\x00\x00\x00"
    )


def make_gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def make_bmp(w, h):
    return b"BM" + b"\x00" * 16 + struct.pack("<ii", w, h) + b"\x00" * 8


def make_jpeg(w, h):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    # a DHT (0xC4) segment first — the scanner must skip it, not read it
    # as a frame header
    dht = b"\xff\xc4" + struct.pack(">H", 4) + b"\x00\x00"
    sof2 = (
        b"\xff\xc2"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dht + sof2 + b"\xff\xd9"


def make_wav(rate, n_samples, channels=1, bits=16):
    block_align = channels * bits // 8
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block_align, block_align, bits,
    )
    payload = n_samples * block_align
    # LIST chunk before data — the walker must skip unknown chunks
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size pad
    data = b"data" + struct.pack("<I", payload) + b"\x00" * payload
    body = b"WAVE" + fmt + lst + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sniff_image_meta_formats():
    from woodwork_spark.operators.multimodal import sniff_image_meta

    assert sniff_image_meta(make_png(640, 480)) == (640, 480, "png")
    assert sniff_image_meta(make_gif(320, 200)) == (320, 200, "gif")
    # top-down BMP stores negative height; sniffer reports magnitude
    assert sniff_image_meta(make_bmp(100, -50)) == (100, 50, "bmp")
    assert sniff_image_meta(make_jpeg(360, 240)) == (360, 240, "jpeg")
    # corruption never raises
    assert sniff_image_meta(None) == (None, None, None)
    assert sniff_image_meta(b"") == (None, None, None)
    assert sniff_image_meta(b"notanimageatall") == (None, None, None)
    assert sniff_image_meta(b"\x89PNG\r\n\x1a\nshort") == (None, None, None)
    # JPEG with no SOF marker: format detected, dims unknown
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    assert sniff_image_meta(b"\xff\xd8" + app0) == (None, None, "jpeg")


def test_sniff_wav_meta():
    from woodwork_spark.operators.multimodal import sniff_wav_meta

    assert sniff_wav_meta(make_wav(8000, 1000)) == (8000, 1000, "wav")
    # stereo 16-bit: 4 bytes per sample frame
    assert sniff_wav_meta(make_wav(44100, 777, channels=2)) == (
        44100, 777, "wav",
    )
    assert sniff_wav_meta(None) == (None, None, None)
    assert sniff_wav_meta(b"RIFFxxxxJUNK") == (None, None, None)
    assert sniff_wav_meta(make_png(2, 2)) == (None, None, None)


def test_attach_image_metadata_header_spark(spark):
    from woodwork_spark.operators.multimodal import attach_image_metadata

    rows = [
        (1, make_png(11, 7)),
        (2, make_gif(3, 4)),
        (3, make_jpeg(640, 360)),
        (4, make_bmp(9, 9)),
        (5, b"garbage-bytes"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, img binary")
    out = attach_image_metadata(df, "img", decoder="header")
    got = {
        r["id"]: (r["img_meta"]["width"], r["img_meta"]["height"], r["img_meta"]["format"])
        for r in out.collect()
    }
    assert got[1] == (11, 7, "png")
    assert got[2] == (3, 4, "gif")
    assert got[3] == (640, 360, "jpeg")
    assert got[4] == (9, 9, "bmp")
    assert got[5] == (None, None, None)
    assert got[6] == (None, None, None)
    # literal mode unchanged (back-compat default)
    lit = attach_image_metadata(df, "img", width=1, height=2, fmt="raw")
    r0 = lit.select("img_meta").first()["img_meta"]
    assert (r0["width"], r0["height"], r0["format"]) == (1, 2, "raw")
    with pytest.raises(ValueError):
        attach_image_metadata(df, "img", decoder="bogus")


def test_attach_audio_metadata_spark(spark):
    from woodwork_spark.operators.multimodal import attach_audio_metadata

    rows = [
        (1, make_wav(16000, 512)),
        (2, make_wav(48000, 10, channels=2)),
        (3, b"not audio"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id long, aud binary")
    out = attach_audio_metadata(df, "aud")
    got = {
        r["id"]: (
            r["aud_meta"]["sample_rate"],
            r["aud_meta"]["n_samples"],
            r["aud_meta"]["codec"],
        )
        for r in out.collect()
    }
    assert got[1] == (16000, 512, "wav")
    assert got[2] == (48000, 10, "wav")
    assert got[3] == (None, None, None)
    assert got[4] == (None, None, None)


def test_pixel_decode_still_stubbed(spark):
    """decoder='real' remains the documented NotImplementedError boundary
    for genuinely codec-bound work (pixels/samples need PIL/ffmpeg)."""
    from woodwork_spark.operators.multimodal import image_features

    df = spark.createDataFrame([(1, make_png(2, 2))], "doc_id long, img binary")
    out = image_features(df, "img", "doc_id", decoder="real")
    with pytest.raises(Exception, match="(?i)not.*implemented|NotImplemented"):
        out.collect()


# ---------------------------------------------------------------------------
# is_schema_valid (reference accessor_utils.py:131)
# ---------------------------------------------------------------------------

def test_is_schema_valid(spark):
    import woodwork_spark as ww

    df = spark.createDataFrame([(1, "a")], "id long, name string")
    t = ww.init(df, index="id", validate=False)
    schema = t.schema
    assert ww.is_schema_valid(df, schema) is True
    assert ww.is_schema_valid(df.withColumnRenamed("name", "x"), schema) is False
    assert ww.is_schema_valid(
        df.withColumn("name", F.col("name").cast("binary")), schema,
    ) is False
    assert "is_schema_valid" in ww.__all__


# ---------------------------------------------------------------------------
# known_count calling conventions: zero probe jobs, zero persists
# ---------------------------------------------------------------------------

def test_probe_small_known_count_zero_jobs(spark):
    """With known_count supplied, _probe_small must issue NO Spark job
    and persist NOTHING — the 100 TB calling convention every
    rank-primitive consumer (vocabulary, packing, lift/qini, conformal)
    relies on: plan construction stays free until the single action."""
    from woodwork_spark.lifecycle import persisted_frames
    from woodwork_spark.operators.rank import _probe_small, global_row_number

    df = spark.range(1000).withColumn("v", F.col("id") % 97)
    sc = spark.sparkContext
    sc.setJobGroup("probe_known_count", "must stay empty")
    try:
        small, src, persisted = _probe_small(df, 100_000, known_count=1000)
        assert small is True and src is df and persisted is False
        big, src2, persisted2 = _probe_small(df, 100, known_count=1000)
        assert big is False and persisted2 is False
        # a full consumer: building the plan fires no job either
        out = global_row_number(
            df, [F.asc("v"), F.asc("id")], known_count=1000,
        )
        assert not persisted_frames(out)
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("probe_known_count")
    assert len(jobs) == 0, f"known_count path ran {len(jobs)} probe jobs"
    # and the plan is still correct when finally executed
    assert out.agg(F.max("row_number")).first()[0] == 999


def test_ivf_index_known_count_skips_count_job(spark):
    from woodwork_spark.operators.similarity import ivf_index

    df = spark.createDataFrame(
        [(i, [float(i % 7), float(i % 3)]) for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    sc = spark.sparkContext
    sc.setJobGroup("ivf_known_count", "count must be skipped")
    try:
        assigned, cents = ivf_index(
            df, nlist=4, train_sample=50, known_count=300,
        )
    finally:
        sc.setJobGroup(None, None)
    with_hint = len(sc.statusTracker().getJobIdsForGroup("ivf_known_count"))
    sc.setJobGroup("ivf_unknown_count", "count runs here")
    try:
        ivf_index(df, nlist=4, train_sample=50)
    finally:
        sc.setJobGroup(None, None)
    without_hint = len(sc.statusTracker().getJobIdsForGroup("ivf_unknown_count"))
    # the bounded limit().collect() is an incremental take (1-3 jobs
    # regardless of table size); the hint must drop the count scan job.
    assert with_hint < without_hint, (
        f"known_count saved no jobs ({with_hint} vs {without_hint})"
    )
    assert len(cents) == 4
    n_assigned = assigned.filter(F.col("__cluster").isNotNull()).count()
    assert n_assigned == 300


# ---------------------------------------------------------------------------
# Driver-correctness window rotation
# ---------------------------------------------------------------------------

def test_query_rotation_covers_fresh_window():
    import __spark_entry__ as e

    q, o = e.queries(), e.oracle_sql()
    # same key SETS as the underlying registries, just reordered
    assert set(q) == set(e.QUERIES)
    assert set(o) == set(e.ORACLE)
    # rotation must be consistent: every rotated query keeps its oracle
    for k in list(q)[:50]:
        if k in e.ORACLE:
            assert o[k] == e.ORACLE[k]
    # with >=5 recorded rounds the window must NOT start at the round-1
    # head (those 50 are the only ones the driver ever verified)
    first = next(iter(q))
    assert first != next(iter(e.QUERIES))


# ---------------------------------------------------------------------------
# Advice fixes: srm_check laziness, conformal null-flag exclusion,
# srm_monitor_stream ts_col
# ---------------------------------------------------------------------------

def test_srm_check_is_lazy(spark):
    """srm_check must not run a Spark job at construction — same
    lazy-DataFrame contract as every other operator in causal.py."""
    from woodwork_spark.operators.causal import srm_check

    df = spark.createDataFrame([("a",)] * 10 + [("b",)] * 10, "arm string")
    sc = spark.sparkContext
    sc.setJobGroup("srm_lazy", "must stay empty")
    try:
        out = srm_check(df, "arm", {"a": 1, "b": 1})
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("srm_lazy")
    assert len(jobs) == 0, f"srm_check ran {len(jobs)} jobs at build time"
    r = out.first()
    assert r["chi2"] == pytest.approx(0.0)
    assert r["n_unknown"] == 0


def test_conformal_null_flag_rows_excluded(spark):
    """Rows with a NULL calibration flag belong to NEITHER split: they
    must not inflate the test-coverage denominator."""
    from woodwork_spark.operators.evaluation import conformal_intervals
    from woodwork_spark.lifecycle import release

    rows = (
        [(float(i), 0.0, True) for i in range(1, 20)]   # calib resid 1..19
        + [(5.0, 0.0, False)] * 4                        # test, covered
        + [(100.0, 0.0, False)]                          # test, not covered
        + [(0.5, 0.0, None)] * 7                         # unknown split
    )
    df = spark.createDataFrame(rows, "pred double, actual double, cal boolean")
    out = conformal_intervals(df, "pred", "actual", "cal", alpha=0.1)
    r = out.first()
    release(out)
    assert r["n_calib"] == 19
    assert r["n_test"] == 5  # the 7 NULL-flag rows are excluded
    assert r["covered"] == 4
    assert r["coverage"] == pytest.approx(0.8)


def test_srm_monitor_stream_custom_ts_col(spark):
    """The streaming SRM monitor accepts a non-'ts' event-time column,
    matching the module's ts_col convention."""
    from woodwork_spark.streaming.events import srm_monitor_stream

    df = (
        spark.readStream.format("rate").option("rowsPerSecond", "10").load()
        .withColumnRenamed("timestamp", "event_time")
        .withColumn(
            "arm", F.when(F.col("value") % 2 == 0, "a").otherwise("b"),
        )
    )
    out = srm_monitor_stream(
        df, "arm", {"a": 1, "b": 1},
        watermark="10 seconds", window="5 seconds", ts_col="event_time",
    )
    assert out.isStreaming
    assert set(out.columns) == {
        "window_start", "window_end", "n", "n_unknown", "chi2",
    }


# ---------------------------------------------------------------------------
# Two-sample ECDF battery: KS w/ p, Cramér–von Mises, Wasserstein-1
# ---------------------------------------------------------------------------

def _ecdf_expected(va, vb):
    import numpy as np

    allv = np.sort(np.unique(np.concatenate([va, vb])))
    fa = np.searchsorted(np.sort(va), allv, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), allv, side="right") / len(vb)
    d = float(np.max(np.abs(fa - fb)))
    w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(allv)))
    cnt = np.array([(va == x).sum() + (vb == x).sum() for x in allv])
    t = float(
        len(va) * len(vb) / (len(va) + len(vb)) ** 2
        * np.sum(cnt * (fa - fb) ** 2)
    )
    return d, t, w1


def test_two_sample_battery_matches_numpy(spark):
    import numpy as np

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.stats_tests import (
        cvm_test_2samp,
        ks_test_2samp,
        wasserstein_1d,
    )

    va = np.array([i % 37 for i in range(300)], float)
    vb = np.array([(i % 41) * 1.5 + 2 for i in range(200)], float)
    rows = [(float(v), True) for v in va] + [(float(v), False) for v in vb]
    # null value and null flag rows must be ignored
    rows += [(None, True), (1.0, None)]
    df = spark.createDataFrame(rows, "v double, a boolean")
    d_exp, t_exp, w_exp = _ecdf_expected(va, vb)

    ks = ks_test_2samp(df, "v", "a").first()
    assert (ks["n_a"], ks["n_b"]) == (300, 200)
    assert ks["d_stat"] == pytest.approx(d_exp)
    # Stephens-corrected asymptotic p
    ne = 300 * 200 / 500
    lam = (ne**0.5 + 0.12 + 0.11 / ne**0.5) * d_exp
    import math

    p_exp = 2 * sum(
        (-1) ** (j - 1) * math.exp(-2 * j * j * lam * lam)
        for j in range(1, 26)
    )
    assert ks["p_approx"] == pytest.approx(min(1.0, max(0.0, p_exp)))

    cvm = cvm_test_2samp(df, "v", "a").first()
    assert cvm["t_stat"] == pytest.approx(t_exp)

    w = wasserstein_1d(df, "v", "a")
    r = w.first()
    release(w)
    assert r["w1"] == pytest.approx(w_exp)


def test_wasserstein_known_shift(spark):
    """Pure location shift by c => W1 == c exactly."""
    from woodwork_spark.operators.stats_tests import wasserstein_1d

    rows = [(float(i), True) for i in range(100)] + [
        (float(i) + 7.25, False) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "v double, a boolean")
    assert wasserstein_1d(df, "v", "a").first()["w1"] == pytest.approx(7.25)


def test_wasserstein_single_value_is_zero(spark):
    from woodwork_spark.operators.stats_tests import wasserstein_1d

    df = spark.createDataFrame(
        [(3.0, True), (3.0, False), (3.0, False)], "v double, a boolean",
    )
    r = wasserstein_1d(df, "v", "a").first()
    assert r["w1"] == 0.0
    # the (n_a, n_b, w1) contract must hold even though the
    # consecutive-pair join is empty: counts come from the cells frame
    assert r["n_a"] == 1 and r["n_b"] == 2


def test_ks_identical_samples(spark):
    from woodwork_spark.operators.stats_tests import ks_test_2samp

    rows = [(float(i % 10), (i // 10) % 2 == 0) for i in range(200)]
    df = spark.createDataFrame(rows, "v double, a boolean")
    r = ks_test_2samp(df, "v", "a").first()
    assert r["d_stat"] == pytest.approx(0.0)
    assert r["p_approx"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# Retrieval metrics, RRF fusion, join health, int8 quantization
# ---------------------------------------------------------------------------

def test_ranking_metrics_golden(spark):
    from woodwork_spark.operators.evaluation import ranking_metrics

    # q1: rel docs at system ranks 2 and 4 (of 4); q2: none relevant
    rows = [
        ("q1", 4.0, 0.0, 1), ("q1", 3.0, 2.0, 2),
        ("q1", 2.0, 0.0, 3), ("q1", 1.0, 1.0, 4),
        ("q2", 9.0, 0.0, 1), ("q2", 8.0, 0.0, 2),
    ]
    df = spark.createDataFrame(rows, "q string, s double, r double, tb int")
    m = ranking_metrics(df, "q", "s", "r", k=2, tiebreak="tb").first()
    assert (m["n_queries"], m["n_queries_no_rel"]) == (2, 1)
    assert m["mrr"] == pytest.approx(0.5)          # first rel at rank 2
    # P@2: q1 has 1 hit in top2 -> 0.5; q2 0 -> avg 0.25
    assert m["precision_at_k"] == pytest.approx(0.25)
    assert m["recall_at_k"] == pytest.approx(0.5)  # q1: 1 of 2 rel in top2
    # q1 DCG@2 = (2^0-1)/log2(2) + (2^2-1)/log2(3); IDCG@2 = 3/1 + 1/log2(3)
    import math

    dcg = 3 / math.log2(3)
    idcg = 3.0 + 1 / math.log2(3)
    assert m["ndcg_at_k"] == pytest.approx(dcg / idcg)


def test_rrf_fuse_golden(spark):
    from woodwork_spark.operators.evaluation import rrf_fuse

    rows = [
        ("q", "a", 1), ("q", "b", 2),   # system 1
        ("q", "b", 1), ("q", "a", 3),   # system 2
    ]
    df = spark.createDataFrame(rows, "q string, item string, rank int")
    got = {r["item"]: r for r in rrf_fuse(df, "q", "item", "rank", k=60).collect()}
    assert got["a"]["rrf_score"] == pytest.approx(1 / 61 + 1 / 63)
    assert got["b"]["rrf_score"] == pytest.approx(1 / 62 + 1 / 61)
    assert got["a"]["n_systems"] == 2
    # b outranks a under RRF (1/62+1/61 > 1/61+1/63)
    assert got["b"]["rrf_score"] > got["a"]["rrf_score"]


def test_join_health_golden(spark):
    from woodwork_spark.operators.quality_checks import join_health_report

    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k long",
    )
    dim = spark.createDataFrame([(1,), (2,), (2,), (9,)], "k long")
    r = join_health_report(fact, dim, "k").first()
    assert r["n_fact"] == 5
    assert r["n_fact_null_key"] == 1
    assert r["n_fact_orphan"] == 1          # key 3
    assert r["n_dim"] == 4
    assert r["n_dim_keys"] == 3
    assert r["n_dim_dup_keys"] == 1         # key 2
    assert r["max_fanout"] == 2
    assert r["inner_join_rows"] == 2 * 1 + 1 * 2  # k=1 (2x1) + k=2 (1x2)


def test_quantize_embeddings_roundtrip(spark):
    from woodwork_spark.operators.embedding import quantize_embeddings

    rows = [
        (1, [1.0, -0.5, 0.25]),
        (2, [0.0, 0.0, 0.0]),      # all-zero -> null scale/codes
        (3, [127.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in quantize_embeddings(
        df, "embedding", "vec_id",
    ).collect()}
    r1 = got[1]
    assert r1["scale"] == pytest.approx(1.0 / 127)
    assert r1["q"] == [127, -64, 32]  # round(-63.5)=-64 HALF_UP away from 0
    assert r1["max_abs_err"] <= r1["scale"] / 2 + 1e-12
    assert got[2]["scale"] is None and got[2]["q"] is None
    assert got[3]["q"] == [127] and got[3]["max_abs_err"] == pytest.approx(0.0)
