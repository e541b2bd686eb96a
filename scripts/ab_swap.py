"""Tightly interleaved A/B of one module across two git revisions.

Swaps a single module file between two commits INSIDE one Spark session
(git checkout -- file + importlib.reload), timing the given queries
alternately A,B,A,B,...  This removes session-startup variance and makes
host-noise land evenly on both variants — the round-13 host shows 2-4x
transient swings that poison process-per-variant A/Bs.

Only valid for modules the queries import LOCALLY (inside the query
function body), which is the __spark_entry__ convention.

Usage:
    python scripts/ab_swap.py --file woodwork_spark/operators/regression.py \
        --a HEAD --b e7d56d0 --rounds 3 q1 q2 ...

Prints per-query min/median per variant and the verdict.  Restores the
file to HEAD afterwards.
"""

from __future__ import annotations

import argparse
import importlib
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


_WORKTREE: dict = {}


def checkout(commit: str, path: str):
    """Swap `path` to `commit`.  The special name WORKTREE means the
    file's content as it was when this script started (uncommitted
    changes included) — saved on first use, restored byte-for-byte."""
    abspath = os.path.join(REPO, path)
    if commit == "WORKTREE":
        with open(abspath, "w") as f:
            f.write(_WORKTREE[path])
        return
    subprocess.run(
        ["git", "checkout", commit, "--", path],
        cwd=REPO, check=True, capture_output=True,
    )


def module_name(path: str) -> str:
    rel = os.path.relpath(path, REPO)
    return rel[:-3].replace(os.sep, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--file", required=True, action="append", dest="files")
    ap.add_argument("--a", default="HEAD")
    ap.add_argument("--b", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("woodwork_spark_ab_swap")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "32g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    try:
        qs["forecast_revenue"](spark, args.sf).collect()
    except Exception:
        pass

    mods = [module_name(f) for f in args.files]
    for f in args.files:
        with open(os.path.join(REPO, f)) as fh:
            _WORKTREE[f] = fh.read()

    def swap(commit: str):
        for f in args.files:
            checkout(commit, f)
        importlib.invalidate_caches()
        for m in mods:
            if m in sys.modules:
                importlib.reload(sys.modules[m])

    results: dict = {}
    try:
        for rnd in range(args.rounds):
            for variant, commit in (("A", args.a), ("B", args.b)):
                swap(commit)
                for name in args.names:
                    t0 = time.perf_counter()
                    out = qs[name](spark, args.sf)
                    out.collect()
                    dt = time.perf_counter() - t0
                    results.setdefault(name, {}).setdefault(
                        variant, []).append(dt)
                    try:
                        from woodwork_spark.lifecycle import release

                        release(out)
                        spark.catalog.clearCache()
                    except Exception:
                        pass
            print(f"# round {rnd + 1}/{args.rounds} done", file=sys.stderr)
    finally:
        for f in args.files:
            checkout("WORKTREE", f)
        importlib.invalidate_caches()

    for name in args.names:
        a = results[name].get("A", [])
        b = results[name].get("B", [])
        fmt = lambda xs: "/".join(f"{x:.2f}" for x in xs)  # noqa: E731
        print(
            f"{name}: A(min={min(a):.2f}, med={statistics.median(a):.2f}"
            f", all={fmt(a)})  B(min={min(b):.2f}, "
            f"med={statistics.median(b):.2f}, all={fmt(b)})  "
            f"min-ratio A/B={min(a) / min(b):.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
