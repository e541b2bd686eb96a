"""A/B-style statistical analysis walkthrough — run with:
python examples/ab_analysis.py

The hypothesis-testing battery over sources/cohorts, each as a
Catalyst-planned aggregate: Welch's t (mean shift between two
sources) -> Mann-Whitney U (distribution shift without normality) ->
one-way ANOVA (mean shift across all twenty sources at once) ->
distribution-free median CIs -> Theil's U (which categorical predicts
which) -> last-touch attribution and gap-allowed sequence mining on
the event stream.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("ab_analysis")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from woodwork_spark.io import read_parquet
from woodwork_spark.lifecycle import release

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
docs = read_parquet(spark, f"{SF}/documents.parquet")
events = read_parquet(spark, f"{SF}/events.parquet")

from woodwork_spark.operators.stats_tests import (
    anova_oneway,
    mann_whitney_u,
    median_ci,
    theils_u,
    welch_ttest,
)

# ---- 1. two-sample tests: src0 vs src1 document length --------------------
print("Welch's t (mean shift, unequal variances):")
welch_ttest(docs, "n_chars", "source", "src0", "src1").show()

print("Mann-Whitney U (rank test — no normality assumption):")
mw = mann_whitney_u(docs, "n_chars", "source", "src0", "src1")
mw.show()
release(mw)

# ---- 2. k-sample screen: do the twenty sources differ at all? -------------
print("one-way ANOVA across all sources:")
anova_oneway(docs, "n_chars", "source").show()

# ---- 3. robust effect sizes: median CIs per language ----------------------
print("95% median CIs (order-statistic, distribution-free):")
median_ci(docs, "n_chars", "lang").orderBy("lang").show()

# ---- 4. which categorical predicts which ----------------------------------
print("Theil's U (asymmetric): rows = predicted, via = predictor")
tu = theils_u(docs, ["lang", "source"])
tu.orderBy("col_x", "col_y").show()
release(tu)

# ---- 5. behavioural reads on the event stream -----------------------------
from woodwork_spark.operators.funnel import (
    attribute_conversions,
    frequent_subsequences,
)

print("last-touch attribution of purchases (7-day lookback):")
attribute_conversions(
    events, "user_id", "ts", "event_type", "purchase",
    lookback_seconds=7 * 86400, order_cols="event_id",
).groupBy("channel").agg(
    F.count(F.lit(1)).alias("conversions"),
    F.round(F.sum("value"), 2).alias("attributed_value"),
).orderBy(F.desc("conversions")).show()

print("frequent gap-allowed sequences (support = distinct users):")
frequent_subsequences(
    events, "user_id", "ts", "event_type",
    min_users=20, order_cols="event_id",
).orderBy(F.desc("n_users")).show(12, truncate=False)

print("ab_analysis walkthrough complete")
spark.stop()
