"""Product-analytics walkthrough over the events table — run with:
python examples/event_analytics.py

The standard behavioral-analytics stack, every stage a Catalyst-planned
DataFrame job: data-quality gate -> funnel -> weekly retention ->
rolling anomaly flags -> distinct-audience set algebra (theta sketches)
-> market-basket rules -> PageRank over the interaction graph.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("event_analytics")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from woodwork_spark.io import read_parquet

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
ev = read_parquet(spark, f"{SF}/events.parquet")

# ---- 0. publication gate: is this events table fit to analyze? -------------
from woodwork_spark.operators import quality_checks as qc

gate = qc.run_checks(ev, [
    qc.not_null("event_id"),
    qc.unique("event_id"),
    qc.not_null("user_id"),
    qc.isin("event_type", ["view", "click", "signup", "purchase", "error"]),
    qc.min_rows(100),
])
gate.show(truncate=False)
assert gate.filter("NOT passed").count() == 0, "events table failed its gate"

# ---- 1. conversion funnel ---------------------------------------------------
from woodwork_spark.operators.funnel import cohort_retention, funnel

print("signup -> view -> purchase funnel (first 3 days):")
funnel(
    ev.filter(F.col("ts") < F.lit("2024-01-04").cast("timestamp")),
    "user_id", "ts", "event_type", ["signup", "view", "purchase"],
).show()

# ---- 2. weekly cohort retention --------------------------------------------
print("weekly retention:")
cohort_retention(ev, "user_id", "ts", period_days=7).orderBy(
    "cohort", "offset",
).show()

# ---- 3. per-user rolling anomaly flags -------------------------------------
from woodwork_spark.operators.timeseries import detect_anomalies

scored = detect_anomalies(
    ev, "ts", "user_id", "value", window_events=20, z_threshold=2.5,
    tie_cols=["event_id"],
)
print("anomalies by event type:")
scored.groupBy("event_type").agg(
    F.sum(F.col("is_anomaly").cast("long")).alias("n_anomalies"),
).show()

# ---- 4. audience overlap without rescans (theta sketches) ------------------
from woodwork_spark.operators.cardinality import distinct_set_report

print("viewers vs purchasers (distinct users, sketch-validated):")
distinct_set_report(
    ev.filter(F.col("ts") < F.lit("2024-01-03").cast("timestamp")),
    "user_id", "event_type", "view", "purchase",
).show()

# ---- 5. which actions co-occur in a user-day? ------------------------------
from woodwork_spark.operators.basket import association_rules

baskets = ev.select(
    F.concat_ws("|", "user_id", F.to_date("ts").cast("string")).alias("basket"),
    F.col("event_type").alias("item"),
)
print("association rules (support >= 5%, confidence >= 30%):")
association_rules(baskets, "basket", "item", 0.05, 0.3).orderBy(
    F.desc("lift"),
).show(5)

# ---- 6. PageRank over the user -> event-type interaction graph -------------
from woodwork_spark.lifecycle import release
from woodwork_spark.operators.graph import pagerank

edges = ev.select(
    F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("src"),
    F.concat(F.lit("e"), F.col("event_type")).alias("dst"),
)
pr = pagerank(
    edges.unionByName(edges.select(F.col("dst").alias("src"),
                                   F.col("src").alias("dst"))),
    iterations=3,
)
print("most central event types:")
pr.filter(F.col("node").startswith("e")).orderBy(F.desc("pagerank")).show(5)
release(pr)

spark.stop()
print("analytics walkthrough complete")
