"""Survival-analysis walkthrough — run with:
python examples/survival_analysis.py

The complete time-to-event story over the demo events table (time to
first purchase, right-censored at last activity), every estimator a
fixed number of Catalyst-planned aggregates and windows over DISTINCT
EVENT TIMES (never raw rows past the first groupBy):

  curve estimation (Kaplan-Meier + Greenwood/log-log CI)  ->  group
  comparison (log-rank; RMST difference with Wald CI)  ->  regression
  (Cox PH, multi-covariate)  ->  model questions (partial-likelihood
  ratio test: does the extra covariate matter?)  ->  prediction
  (Breslow baseline + relative risk)  ->  diagnostics (Schoenfeld PH
  screen; martingale/deviance residuals)  ->  competing risks
  (Aalen-Johansen) -> parametric summary (Weibull fit) ->
  time-varying covariates (Andersen-Gill counting-process episodes).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("survival_analysis")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    # the diagnostics sections chain un-checkpointed model + baseline
    # frames, so the executed plans are deep; Spark renders every
    # executed plan to a string for the SQL-start event, and at the
    # default (unbounded) spark.sql.maxPlanStringLength that rendering
    # alone overflows a default-sized driver heap — cap it (truncates
    # the DESCRIPTION only, never changes the plan or results)
    .config("spark.sql.maxPlanStringLength", "1000000")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from woodwork_spark.io import read_parquet  # noqa: E402
from woodwork_spark.operators.regression import glm_lrt  # noqa: E402
from woodwork_spark.operators.timeseries import (  # noqa: E402
    cox_baseline_hazard,
    cox_ph_diagnostic,
    cox_ph_fit,
    cox_ph_fit_tv,
    cox_residuals,
    cox_risk_score,
    cumulative_incidence,
    kaplan_meier,
    logrank_test,
    rmst_diff,
    weibull_fit_km,
)

events = read_parquet(spark, f"{SF}/events.parquet").filter(
    F.col("user_id").isNotNull(),
)

# subject table: one row per user — duration to first purchase (hours),
# censored at last activity; activity covariates
per_user = events.groupBy("user_id").agg(
    F.min("ts").alias("t0"),
    F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("p"),
    F.max("ts").alias("last"),
    F.count(F.lit(1)).alias("n_ev"),
)
subjects = per_user.select(
    (F.col("user_id") % 2).alias("cohort"),
    F.floor(
        (F.unix_micros(F.coalesce("p", "last")) - F.unix_micros("t0"))
        / 3.6e9,
    ).cast("double").alias("dur"),
    F.col("p").isNotNull().cast("double").alias("ev"),
    F.log(F.lit(1.0) + F.col("n_ev")).alias("x1"),
    F.log(
        F.lit(1.0)
        + (F.unix_micros("last") - F.unix_micros("t0")).cast("double")
        / 3.6e9,
    ).alias("x2"),
).filter(F.col("dur") >= 0).persist()

print("=== 1. Kaplan-Meier with Greenwood / log-log 95% CI ===")
kaplan_meier(subjects, "dur", "ev", ["cohort"], ci=True).orderBy(
    "cohort", "duration",
).show(6)

print("=== 2. Log-rank test between cohorts ===")
logrank_test(subjects, "dur", "ev", "cohort", 0, 1).show()

print("=== 3. RMST difference at a 48 h horizon (censoring-safe A/B) ===")
rmst_diff(subjects, "dur", "ev", 48.0, "cohort", 0, 1).show()

print("=== 4. Cox PH: duration ~ activity volume + active span ===")
full = cox_ph_fit(subjects, "dur", "ev", ["x1", "x2"], iters=4)
full.show()

print("=== 5. Does x2 matter?  Partial-likelihood ratio test ===")
reduced = cox_ph_fit(subjects, "dur", "ev", ["x1"], iters=4)
glm_lrt(full, reduced, df_diff=1).show()

print("=== 6. Prediction: baseline hazard + per-subject risk ===")
model1 = cox_ph_fit(subjects, "dur", "ev", "x1", iters=3)
base = cox_baseline_hazard(subjects, "dur", "ev", "x1", model1)
base.orderBy("t").show(4)
cox_risk_score(subjects, model1, "x1").select(
    "dur", "ev", "x1", F.round("risk", 4).alias("risk"),
).show(4)

print("=== 7. Diagnostics: PH screen + martingale/deviance residuals ===")
cox_ph_diagnostic(subjects, "dur", "ev", "x1", model1).show()
res = cox_residuals(
    subjects, "dur", "ev", "x1", model1, base, kind="both",
)
res.agg(
    F.round(F.sum("martingale"), 9).alias("sum_martingale_is_zero"),
    F.round(F.sum(F.col("deviance") * F.col("deviance")), 4)
    .alias("model_deviance"),
).show()

print("=== 8. Competing risks: purchase vs account-drop (synthetic) ===")
competing = subjects.select(
    "dur",
    F.when(F.col("ev") > 0, F.lit(1))
    .when(F.col("x1") > 2.0, F.lit(2))
    .otherwise(F.lit(0)).alias("cause"),
)
cumulative_incidence(competing, "dur", "cause").orderBy(
    "cause", "duration",
).show(6)

print("=== 9. Parametric summary: Weibull fit from the KM curve ===")
weibull_fit_km(subjects, "dur", "ev").show()

print("=== 10. Time-varying covariates (Andersen-Gill counting process) ===")
# The covariate CHANGES mid-follow-up: split each subject at the
# midpoint of their span into two (start, stop] episodes whose
# covariate is that half's activity count — "does the hazard follow
# CURRENT activity?", which sections 4-7's time-fixed model cannot ask.
spans = per_user.select(
    "user_id", "t0",
    (
        (F.unix_micros(F.coalesce("p", "last")) - F.unix_micros("t0"))
        / 3.6e9
    ).alias("T"),
    F.col("p").isNotNull().cast("double").alias("d"),
).filter(F.col("T") > 0)
halves = events.join(spans, "user_id").groupBy("user_id").agg(
    F.first("T").alias("T"),
    F.first("d").alias("d"),
    F.sum(
        F.when(
            (F.unix_micros("ts") - F.unix_micros("t0")) / 3.6e9
            <= F.col("T") / 2, 1,
        ).otherwise(0),
    ).alias("n1"),
    F.sum(
        F.when(
            ((F.unix_micros("ts") - F.unix_micros("t0")) / 3.6e9
             > F.col("T") / 2)
            & ((F.unix_micros("ts") - F.unix_micros("t0")) / 3.6e9
               <= F.col("T")), 1,
        ).otherwise(0),
    ).alias("n2"),
)
episodes = halves.select(
    F.lit(0.0).alias("tstart"), (F.col("T") / 2).alias("tstop"),
    F.lit(0.0).alias("d"), F.log1p("n1").alias("x"),
).unionByName(halves.select(
    (F.col("T") / 2).alias("tstart"), F.col("T").alias("tstop"),
    F.col("d"), F.log1p("n2").alias("x"),
))
cox_ph_fit_tv(episodes, "tstart", "tstop", "d", "x", iters=4).show()

spark.stop()
print("survival_analysis: OK")
