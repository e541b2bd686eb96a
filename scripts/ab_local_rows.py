"""In-session alternating A/B for local_rows_df (WW_LOCAL_ROWS_FAST is
read per call, so both arms share one Spark session — no session-to-
session host variance).  Pattern ABBA ABBA per query; prints min/median
per arm."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    names = sys.argv[1:] or ["cox_timevarying", "outlier_methods", "srm"]
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("ab_local_rows")
        .config("spark.sql.shuffle.partitions",
                os.environ.get("SPARK_GRAFT_CPUS", "32"))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_MEM", "32g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = entry.queries()

    def run(name, fast):
        os.environ["WW_LOCAL_ROWS_FAST"] = fast
        t0 = time.monotonic()
        df = qs[name](spark, sf)
        df.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    for name in names:
        run(name, "1")  # warm both arms' first-use costs out of band
        run(name, "0")
        on, off = [], []
        for _ in range(rounds):
            on.append(run(name, "1"))
            off.append(run(name, "0"))
            off.append(run(name, "0"))
            on.append(run(name, "1"))
        print(
            f"{name}: fast_on min={min(on):.2f} med={statistics.median(on):.2f}"
            f" | fast_off min={min(off):.2f} med={statistics.median(off):.2f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
