"""Scale utilities: salted join / two-phase agg correctness, partitioned
writes (pruning), bucketed tables (Exchange elimination), typed init on
every driver table."""

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from woodwork_spark.operators.scale import (
    salted_join,
    two_phase_agg,
    write_bucketed_table,
    write_partitioned,
)


def test_salted_join_matches_plain_join(spark):
    fact = spark.range(0, 10000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("v"),
    )
    dim = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(5)], "k long, name string",
    )
    plain = fact.join(dim, "k").agg(F.count(F.lit(1)), F.sum("v")).collect()[0]
    salted = salted_join(fact, dim, "k", salt=4).agg(
        F.count(F.lit(1)), F.sum("v"),
    ).collect()[0]
    assert tuple(plain) == tuple(salted)


def test_two_phase_agg_matches_plain(spark):
    df = spark.range(0, 10000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v"),
    )
    plain = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("mx"))
        .collect()
    }
    twop = {
        r["k"]: (r["n"], r["s"], r["mx"])
        for r in two_phase_agg(
            df, ["k"], {"n": ("v", "count"), "s": ("v", "sum"), "mx": ("v", "max")},
        ).collect()
    }
    assert plain == twop


def test_write_partitioned_prunes(spark):
    from woodwork_spark.io import read_parquet

    orders = read_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
    path = tempfile.mkdtemp(prefix="ww_part_")
    try:
        write_partitioned(orders, path, ["o_orderstatus"])
        back = spark.read.parquet(path)
        filtered = back.filter(F.col("o_orderstatus") == "O")
        plan = filtered._jdf.queryExecution().executedPlan().toString()
        # partition pruning: the scan must carry a PartitionFilter
        assert "PartitionFilters: [" in plan
        assert "o_orderstatus" in plan.split("PartitionFilters")[1][:200]
        assert filtered.count() == orders.filter(F.col("o_orderstatus") == "O").count()
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_bucketed_join_skips_exchange(spark):
    from woodwork_spark.io import read_parquet

    cust = read_parquet(spark, "/root/testdata/sf0.001/customer.parquet")
    orders = read_parquet(spark, "/root/testdata/sf0.001/orders.parquet")
    write_bucketed_table(cust, "b_cust", "c_custkey", num_buckets=4)
    write_bucketed_table(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        "b_orders",
        "c_custkey",
        num_buckets=4,
    )
    try:
        a = spark.table("b_cust")
        b = spark.table("b_orders")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        joined = a.join(b, "c_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides bucketed on the join key: no shuffle Exchange
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
        spark.sql("DROP TABLE IF EXISTS b_cust")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_init_on_every_driver_table(spark):
    import woodwork_spark as ww
    from woodwork_spark.io import load_tables

    tables = load_tables(spark, "/root/testdata/sf0.001")
    assert len(tables) == 10
    expectations = {
        "lineitem": ("l_quantity", "Double"),
        "orders": ("o_orderdate", "Datetime"),
        "customer": ("c_mktsegment", "Categorical"),
        "events": ("ts", "Datetime"),
        "documents": ("lang", "Categorical"),
        "embeddings": ("embedding", "Unknown"),  # array<float> has no ltype
    }
    for name, df in tables.items():
        t = ww.init(df, name=name, validate=False)
        assert len(t.columns) == len(df.columns)
        if name in expectations:
            col, expected = expectations[name]
            assert type(t.logical_types[col]).__name__ == expected, (name, col)


def test_salted_join_rejects_outer_modes(spark):
    import pytest

    fact = spark.createDataFrame([(1, "a")], "k int, v string")
    dim = spark.createDataFrame([(1, "x")], "k int, d string")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", salt=4, how="full")
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(fact, dim, "k", salt=4, how="right")


def test_read_parquet_never_surfaces_timestamp_ntz(spark):
    """events.parquet is written with isAdjustedToUTC=false; Spark 4's
    NTZ inference would surface TIMESTAMP_NTZ, which unix_micros rejects
    and whose epoch shifts with session timezone.  read_parquet must pin
    plain TIMESTAMP regardless of the session's NTZ-inference conf."""
    from pyspark.sql import functions as F

    from woodwork_spark.io import read_parquet

    ev = read_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"
    # epoch math must analyze (this is what broke on TIMESTAMP_NTZ)
    n = ev.select(F.unix_micros("ts")).limit(1).count()
    assert n == 1
    # the conf is restored after the read, whatever it was
    assert spark.conf.get(
        "spark.sql.parquet.inferTimestampNTZ.enabled", "true",
    ) == "true"


def test_nano_probe_all_files_recovers_heterogeneous_dir(tmp_path, spark):
    """A directory whose FIRST file has no nano columns but a later file
    does: the fast path fails with PARQUET_TYPE_ILLEGAL and the recovery
    probe must find the nano column across all files (the cached
    first-file answer would leave raw bigint nanoseconds)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from woodwork_spark.io import _NANO_COLS_CACHE, _nano_timestamp_columns

    d = tmp_path / "mixed"
    d.mkdir()
    t_plain = pa.table({"ts": pa.array([1, 2], type=pa.timestamp("us"))})
    t_nano = pa.table({"ts": pa.array([3, 4], type=pa.timestamp("ns"))})
    pq.write_table(t_plain, d / "a_first.parquet", use_deprecated_int96_timestamps=False)
    pq.write_table(
        t_nano, d / "b_second.parquet",
        coerce_timestamps=None, store_schema=False,
    )
    path = str(d)
    assert _nano_timestamp_columns(path) == []  # first-file probe misses
    assert _nano_timestamp_columns(path, all_files=True) == ["ts"]
    assert _NANO_COLS_CACHE[path] == ["ts"]  # cache refreshed, not stale


def test_persist_lifecycle_release(spark):
    """Operators that return lazy frames over persisted intermediates
    attach those frames; release() frees the cached blocks after the
    result is consumed (the round-5 leak class)."""
    from woodwork_spark.lifecycle import persisted_frames, release
    from woodwork_spark.operators.text import unigram_logprob

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma doc{i}") for i in range(50)],
        "doc_id long, text string",
    )
    out = unigram_logprob(df, "text", "doc_id")
    frames = persisted_frames(out)
    assert frames, "unigram_logprob should expose its persisted explode"
    out.count()  # consume
    assert any(f.storageLevel.useMemory or f.storageLevel.useDisk for f in frames)
    assert release(out) == len(frames)
    assert all(
        not (f.storageLevel.useMemory or f.storageLevel.useDisk)
        for f in frames
    )
    assert persisted_frames(out) == ()


def test_rank_known_count_skips_probe_and_persist(spark):
    """A caller-supplied cardinality hint takes the windowed fast path
    with zero probe jobs and zero persisted intermediates."""
    from woodwork_spark.lifecycle import persisted_frames
    from woodwork_spark.operators.rank import global_row_number

    df = spark.createDataFrame(
        [(c, n) for c, n in [("b", 5), ("a", 9), ("c", 1)]],
        "token string, count long",
    )
    out = global_row_number(
        df, [F.desc("count"), F.asc("token")],
        out_col="token_id", known_count=3,
    )
    assert persisted_frames(out) == ()
    got = {r["token"]: r["token_id"] for r in out.collect()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_rank_distributed_path_attaches_and_releases(spark):
    """Forced-distributed rank exposes its range-partitioned cache for
    release, and the released result still recomputes correctly."""
    from woodwork_spark.lifecycle import persisted_frames, release
    from woodwork_spark.operators.rank import global_prefix_sum

    df = spark.createDataFrame(
        [(i % 97, 1) for i in range(500)], "k long, v long",
    )
    out = global_prefix_sum(df, [F.asc("k")], "v", small_threshold=0)
    frames = persisted_frames(out)
    assert frames
    total = out.agg(F.max("prefix_sum")).collect()[0][0]
    assert total == 499  # exclusive prefix of the last row
    release(out)
    assert all(
        not (f.storageLevel.useMemory or f.storageLevel.useDisk)
        for f in frames
    )


def test_spearman_slow_path_batches_count_jobs(spark):
    """A wide all-nullable frame must issue O(1) count jobs for the
    slow-path shared/union counts, not one per pair."""
    import woodwork_spark as ww
    from woodwork_spark.statistics.dependence import dependence

    ncols = 12
    rows = []
    for r in range(ncols * 10):
        owner = r // 10
        rows.append(
            tuple(float(r) if c == owner else None for c in range(ncols)),
        )
    schema = ", ".join(f"c{i} double" for i in range(ncols))
    df = spark.createDataFrame(rows, schema)
    t = ww.init(df, validate=False)
    sc = spark.sparkContext
    sc.setJobGroup("spearman_batch_test", "job-count probe")
    try:
        # every pair shares 0 rows, so the SparseDataWarning is the
        # EXPECTED signal here — assert it so real warnings stay visible
        # in an otherwise warning-free suite.
        from woodwork_spark.exceptions import SparseDataWarning

        with pytest.warns(SparseDataWarning):
            out = dependence(t, measures=["spearman"])
    finally:
        sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup("spearman_batch_test")
    # disjoint supports: every pair is slow with shared=0 < min_shared,
    # so no per-pair rank jobs run; the count jobs must be batched.
    # Before batching this was ~1 job per pair (66) + overheads.
    assert len(jobs) <= 10, f"expected O(1) jobs, got {len(jobs)}"
    assert len(out) == ncols * (ncols - 1) // 2
    import numpy as np

    assert all(np.isnan(v) for v in out["spearman"])


def test_global_ntile_matches_native_window(spark):
    """Distributed ntile (forced past the small-cardinality fast path)
    reproduces SQL NTILE exactly, including the uneven r-bucket split."""
    from pyspark.sql import Window as W

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.rank import global_ntile

    df = spark.createDataFrame(
        [(i, (i * 37) % 103) for i in range(257)], "id long, v long",
    )
    for st in (100_000, 0):
        out = global_ntile(
            df, [F.asc("v"), F.asc("id")], 7, out_col="b", small_threshold=st,
        )
        got = {r["id"]: r["b"] for r in out.collect()}
        release(out)
        exp = {
            r["id"]: r["b"]
            for r in df.withColumn(
                "b", F.ntile(7).over(W.orderBy("v", "id")).cast("long"),
            ).collect()
        }
        assert got == exp


def test_global_rank_ties_and_dense(spark):
    """Tie-aware distributed rank matches RANK()/DENSE_RANK() on a keyed
    frame with heavy ties and a NULL key group."""
    from pyspark.sql import Window as W

    from woodwork_spark.lifecycle import release
    from woodwork_spark.operators.rank import global_rank

    rows = [(i, ["x", "y", "y", None][i % 4]) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, k string")
    for dense in (False, True):
        for st in (100_000, 0):
            out = global_rank(
                df, [("k", "asc")], out_col="rk", dense=dense,
                small_threshold=st,
            )
            got = {r["id"]: r["rk"] for r in out.collect()}
            release(out)
            fn = F.dense_rank() if dense else F.rank()
            exp = {
                r["id"]: r["rk"]
                for r in df.withColumn(
                    "rk", fn.over(W.orderBy("k")).cast("long"),
                ).collect()
            }
            assert got == exp


def test_weighted_sample_deterministic_and_clamped(spark):
    """Importance sampling is pure hash arithmetic: rerun-identical,
    weight>=1 keeps everything, weight<=0 and NULL weights keep nothing."""
    from woodwork_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, i / 100.0) for i in range(200)], "id long, w double",
    )
    a = sorted(r["id"] for r in weighted_sample(df, "id", F.col("w")).collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", F.col("w")).collect())
    assert a == b and 0 < len(a) < 200
    assert weighted_sample(df, "id", F.lit(1.0)).count() == 200
    assert weighted_sample(df, "id", F.lit(0.0)).count() == 0
    null_w = df.withColumn("w", F.lit(None).cast("double"))
    assert weighted_sample(null_w, "id", F.col("w")).count() == 0
    # tag mode preserves every row and agrees with filter mode
    tagged = weighted_sample(df, "id", F.col("w"), keep_col="keep")
    assert tagged.count() == 200
    kept = sorted(r["id"] for r in tagged.filter("keep").collect())
    assert kept == a


def test_bloom_prune_no_false_negatives_and_exact_join(spark):
    """Bloom pre-shuffle pruning: every true match survives the prune
    (no false negatives), the fp rate respects the target, NULL keys are
    dropped, and prune+join == plain join exactly."""
    from woodwork_spark.operators.scale import bloom_prune

    big = spark.createDataFrame(
        [(i, i % 1000) for i in range(20_000)] + [(99_999, None)],
        "id long, k long",
    )
    small = spark.createDataFrame(
        [(k,) for k in range(0, 1000, 7)], "k long",
    )
    pruned = bloom_prune(big, small, "k", expected_items=150, fpp=0.01)
    true_keys = {r["k"] for r in small.collect()}
    pruned_rows = pruned.collect()
    kept = [r["k"] for r in pruned_rows]
    assert None not in kept
    true_n = big.join(small, "k", "left_semi").count()
    assert sum(1 for k in kept if k in true_keys) == true_n
    fp = (len(kept) - true_n) / max(20_001 - true_n, 1)
    assert fp < 0.05
    # exact-join equivalence
    a = sorted(
        (r["id"], r["k"])
        for r in pruned.join(small, "k", "inner").select("id", "k").collect()
    )
    b = sorted(
        (r["id"], r["k"])
        for r in big.join(small, "k", "inner").select("id", "k").collect()
    )
    assert a == b


def test_zorder_layout_clusters_all_dimensions(spark):
    """Range-partitioning on the z-key makes EVERY keyed column's
    per-partition min/max range much narrower than its global range —
    the property parquet row-group skipping needs — and NULLs/constant
    columns are handled."""
    import statistics

    from woodwork_spark.operators.scale import zorder_key, zorder_layout

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    lay = zorder_layout(li, ["l_partkey", "l_suppkey"], bits=8,
                        num_partitions=8, out_col="z")
    per = (
        lay.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(
            (F.max("l_partkey") - F.min("l_partkey")).alias("pr"),
            (F.max("l_suppkey") - F.min("l_suppkey")).alias("sr"),
        )
        .collect()
    )
    g = li.agg(
        (F.max("l_partkey") - F.min("l_partkey")).alias("pr"),
        (F.max("l_suppkey") - F.min("l_suppkey")).alias("sr"),
    ).collect()[0]
    avg_pr = statistics.mean(r["pr"] for r in per)
    avg_sr = statistics.mean(r["sr"] for r in per)
    assert avg_pr < g["pr"] * 0.7
    assert avg_sr < g["sr"] * 0.7
    # NULL and constant columns quantize to 0 instead of erroring
    df = spark.createDataFrame(
        [(None, 5), (3, 5), (9, 5)], "a int, b int",
    )
    z = {r["a"]: r["z"] for r in zorder_key(df, ["a", "b"], bits=4, out_col="z").collect()}
    assert z[None] == 0 and z[3] == 0  # a=3 is the min -> quantizes to 0
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b"], bits=40)


def test_zorder_key_matches_reference_interleave(spark):
    """The z key equals a plain-Python Morton interleave of the same
    min-max quantization."""
    import math

    from woodwork_spark.operators.scale import zorder_key

    rows = [(i, (i * 13) % 50, (i * 7) % 20) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    got = {
        r["id"]: r["z"]
        for r in zorder_key(df, ["x", "y"], bits=6, out_col="z").collect()
    }
    top = 63
    xs = [r[1] for r in rows]
    ys = [r[2] for r in rows]

    def quant(v, mn, mx):
        return max(0, min(top, math.floor((v - mn) / (mx - mn) * top)))

    for i, x, y in rows:
        q0 = quant(x, min(xs), max(xs))
        q1 = quant(y, min(ys), max(ys))
        z = 0
        for bi in range(6):
            z |= ((q0 >> bi) & 1) << (bi * 2)
            z |= ((q1 >> bi) & 1) << (bi * 2 + 1)
        assert got[i] == z, (i, x, y)
