"""Model-evaluation + experiment-readout walkthrough — run with:
python examples/model_evaluation.py

The full score-quality story for a classifier a curation pipeline might
train ("does value predict purchases?"), then the experiment-analysis
story for shipping it — every step one or two Catalyst-planned jobs:

  discrimination (AUC / per-cohort AUC)  ->  calibration (reliability,
  ECE/Brier, isotonic repair)  ->  operating point (cost-optimal
  threshold, confusion)  ->  targeting value (lift, Qini uplift)  ->
  experiment health (SRM)  ->  readout (MDE, CUPED, diff-in-diff)  ->
  rater QA (Cohen's kappa, McNemar)  ->  prediction intervals
  (split conformal).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("model_evaluation")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from woodwork_spark.io import read_parquet
from woodwork_spark.lifecycle import release

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
ev = read_parquet(spark, f"{SF}/events.parquet")
label = F.col("event_type") == "purchase"

# ---- 1. discrimination: is the score ordering right at all? ----------------
from woodwork_spark.operators.evaluation import grouped_auc, roc_auc

print("global AUC / Gini / KS of value as a purchase predictor:")
auc = roc_auc(ev, "value", label)
auc.show(truncate=False)
release(auc)

print("the fairness view — the same AUC per user cohort:")
g = grouped_auc(
    ev.withColumn("cohort", F.col("user_id") % 4), "cohort", "value", label,
)
g.orderBy("cohort").show(truncate=False)
release(g)

# ---- 2. calibration: do the probabilities MEAN anything? -------------------
from woodwork_spark.operators.evaluation import (
    brier_decomposition,
    calibration_report,
    calibration_summary,
    isotonic_calibrate,
)

scored = ev.withColumn("p", F.least(F.col("value") / 500.0, F.lit(1.0)))
print("reliability table (gap = observed - predicted per bin):")
calibration_report(scored, "p", label).orderBy("bin").show()

print("ECE / MCE / Brier, then the Murphy decomposition:")
calibration_summary(scored, "p", label).show()
brier_decomposition(scored, "p", label).show()

print("isotonic (PAV) repair — iso_rate is the calibrated replacement:")
isotonic_calibrate(scored, "p", label).orderBy("bin").show()

# ---- 3. operating point: where do we actually cut? -------------------------
from woodwork_spark.operators.evaluation import threshold_sweep

print("cost-optimal threshold when a miss costs 5x a false alarm:")
ts = threshold_sweep(ev, "value", label, fp_cost=1.0, fn_cost=5.0)
ts.show(truncate=False)
release(ts)

# ---- 4. targeting value: lift and uplift ----------------------------------
from woodwork_spark.operators.evaluation import qini_uplift

print("uplift deciles + Qini (synthetic even-user 'treatment'):")
q = qini_uplift(
    ev, "value", (F.col("user_id") % 2 == 0), label,
    n_buckets=5, tiebreak="event_id",
)
q.orderBy("bucket").show(truncate=False)
release(q)

# ---- 5. experiment health before any readout -------------------------------
from woodwork_spark.operators.causal import cuped_adjusted_effect, mde, srm_check

print("SRM gate (designed 50/50 on user parity):")
srm_check(
    ev.withColumn("arm", F.when(F.col("user_id") % 2 == 0, "t").otherwise("c")),
    "arm", {"t": 1, "c": 1},
).show()

print("is the experiment even powered?  MDE at the current sample:")
mde(ev, (F.col("user_id") % 2 == 0), "value").show(truncate=False)

print("CUPED readout (covariate = value + id hash — watch the SE shrink):")
cuped_adjusted_effect(
    ev.withColumn("pre", F.col("value") + F.col("event_id") % 7),
    (F.col("user_id") % 2 == 0), "value", "pre",
).show(truncate=False)

# ---- 6. rater QA for the labels feeding all of the above -------------------
from woodwork_spark.operators.evaluation import cohens_kappa, mcnemar_test

raters = ev.select(
    (F.col("value") >= 100).cast("string").alias("rater_a"),
    (F.col("event_id") % 3 == 0).cast("string").alias("rater_b"),
    label.cast("string").alias("truth"),
)
print("inter-rater agreement (Cohen's kappa):")
cohens_kappa(raters, "rater_a", "rater_b").show()

print("which rater is better?  McNemar on paired correctness:")
mcnemar_test(
    raters,
    F.col("rater_a") == F.col("truth"),
    F.col("rater_b") == F.col("truth"),
).show()

# ---- 7. distribution-free prediction intervals -----------------------------
from woodwork_spark.operators.evaluation import conformal_intervals

li = read_parquet(spark, f"{SF}/lineitem.parquet").withColumn(
    "pred", F.col("l_quantity") * 2000.0,
)
print("split conformal: qhat covers 90% of held-out residuals:")
ci = conformal_intervals(
    li, "pred", "l_extendedprice",
    calib_col=(F.col("l_orderkey") % 2 == 0), alpha=0.1,
)
ci.show(truncate=False)
release(ci)

# ---- 8. slice debugging (round 8) -------------------------------------------
# The sweep you run when the aggregate metric dips: which segment is
# failing?  One melt + one grouped agg; rest-of-data stats derive from
# broadcast global sums.
from woodwork_spark.operators.evaluation import worst_slices

print("worst event segments by value (z vs rest, one pass):")
worst_slices(ev, ["event_type"], "value", min_n=50).orderBy("z").show(
    5, truncate=False,
)

# ---- 9. peeking-safe sequential test (round 8) ------------------------------
from woodwork_spark.operators.causal import msprt_always_valid

print("mSPRT always-valid p (safe to read every day of the experiment):")
msprt_always_valid(
    ev, F.col("user_id") % 2 == 0, "value", tau=20.0,
).show(truncate=False)

# ---- 10. off-policy evaluation (round 8) ------------------------------------
from woodwork_spark.operators.evaluation import off_policy_value

logged = ev.select(
    "event_type",
    (F.least(F.col("value"), F.lit(500.0)) / 500.0).alias("reward"),
    (0.1 + (F.col("event_id") % 5).cast("double") / 10.0).alias("prop"),
)
print("IPS/SNIPS value of an always-'purchase' policy from logged data:")
off_policy_value(
    logged, "event_type", "reward", "prop", F.lit("purchase"), clip=8.0,
).show(truncate=False)

print("done.")
spark.stop()
