"""sf1 soak of the heavy query family (round-7 verdict #3).

No sf1 parquet ships with the container (only sf0.001/0.01/0.1), so
this script first materializes an sf1-scale dataset by replicating the
sf0.1 tables 10x with key-consistent id shifts (foreign keys stay
joinable inside each copy; graphs become 10 disconnected copies;
documents get a per-copy suffix token so text is distinct but keeps the
same shingle/token distribution).  Then it times each heavy query at
sf0.1 and at the synthetic sf1 (min of N reps, query isolated with a
cache clear) and records the ratio — the point is whether any query's
cost grows materially FASTER than the 10x data ratio.

Usage: python scripts/soak_sf1.py [--reps 2] [--out SOAK_r8.json]
Writes the JSON next to the repo root.  Data lands in .soak_sf1/
(gitignored) and is reused if present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".soak_sf1")
COPIES = 10

# (table, [key columns to shift by copy_index * (max_key + 1)])
TABLES = [
    ("region", []),
    ("nation", []),
    ("customer", ["c_custkey"]),
    ("supplier", ["s_suppkey"]),
    ("part", ["p_partkey"]),
    ("orders", ["o_orderkey", "o_custkey"]),
    ("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"]),
    ("events", ["event_id", "user_id"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
]

HEAVY = [
    "pagerank", "ppr", "hits", "adamic_adar", "bfs_hops",
    "stream_match",
    "minhash_dedup_pairs", "dedup_best", "semdedup", "ngram_jaccard",
    "bh_fdr", "kll_quantiles",
    "vocabulary", "unigram_logprob", "bm25_rank", "pack_sequences",
    "ks_2samp", "wasserstein",
]


def build_sf1():
    import duckdb

    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, keys in TABLES:
        out = os.path.join(DST, f"{table}.parquet")
        if os.path.exists(out):
            continue
        src = os.path.join(SRC, f"{table}.parquet")
        if not keys:  # tiny dims pass through unchanged
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{out}' (FORMAT PARQUET)",
            )
            continue
        offsets = {
            k: int(
                con.execute(f"SELECT max({k}) + 1 FROM '{src}'").fetchone()[0]
            )
            for k in keys
        }
        parts = []
        for i in range(COPIES):
            cols = []
            desc = con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
            for name, *_ in desc:
                if name in offsets:
                    cols.append(f"{name} + {i * offsets[name]} AS {name}")
                elif table == "documents" and name == "text" and i > 0:
                    # distinct text, same token distribution
                    cols.append(f"text || ' copyword{i}' AS text")
                else:
                    cols.append(name)
            parts.append(f"SELECT {', '.join(cols)} FROM '{src}'")
        q = " UNION ALL ".join(parts)
        con.execute(f"COPY ({q}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"# built {table}: {n} rows", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(REPO, "SOAK_r8.json"))
    ap.add_argument("--queries", default=None, help="comma list override")
    args = ap.parse_args()

    build_sf1()

    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("woodwork_spark_soak_sf1")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    names = (args.queries.split(",") if args.queries else HEAVY)
    result = {}
    for name in names:
        fn = qs[name]
        row = {}
        for label, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            best = None
            for _ in range(max(args.reps, 1)):
                try:
                    t0 = time.perf_counter()
                    out = fn(spark, sf_dir)
                    out.collect()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                except Exception as e:
                    print(f"# {name}@{label} error: {e}", file=sys.stderr)
                    best = None
                    break
                finally:
                    try:
                        from woodwork_spark.lifecycle import release

                        release(out)
                        spark.catalog.clearCache()
                    except Exception:
                        pass
            row[label] = round(best, 3) if best is not None else None
        if row.get("sf0.1") and row.get("sf1"):
            row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        result[name] = row
        print(f"# {name}: {row}", file=sys.stderr)
    payload = {
        "metric": "sf1_soak",
        "copies": COPIES,
        "reps": args.reps,
        "data_ratio": COPIES,
        "queries": result,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
