"""Statistical-inference walkthrough — run with:
python examples/statistical_inference.py

The classical-testing and regression story over the demo star schema,
every estimator a fixed number of Catalyst-planned aggregates (no scipy,
no driver math, no collects beyond bounded 1-row reads):

  association (Fisher exact, Cochran-Armitage trend)  ->  distribution
  shape (Jarque-Bera)  ->  series diagnostics (Ljung-Box, Durbin-Watson,
  Breusch-Pagan)  ->  robust + parametric fits (Theil-Sen, logistic,
  Poisson)  ->  survival regression (Cox PH)  ->  structure discovery
  (2-component GMM)  ->  seasonal forecasting (Holt-Winters).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("statistical_inference")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

from woodwork_spark.io import read_parquet  # noqa: E402
from woodwork_spark.operators.regression import (  # noqa: E402
    gmm1d_em,
    logistic_fit,
    poisson_fit,
    theil_sen_fit,
)
from woodwork_spark.operators.stats_tests import (  # noqa: E402
    breusch_pagan,
    cochran_armitage,
    durbin_watson,
    fisher_exact_2x2,
    jarque_bera,
    ljung_box,
)
from woodwork_spark.operators.timeseries import (  # noqa: E402
    cox_ph_fit,
    holt_winters_fit,
)

li = read_parquet(spark, f"{SF}/lineitem.parquet")
orders = read_parquet(spark, f"{SF}/orders.parquet")
events = read_parquet(spark, f"{SF}/events.parquet")

print("=== 1. Association: Fisher exact on heavy lineitems ===")
fisher_exact_2x2(
    li.filter(F.col("l_quantity") >= 48),
    F.col("l_returnflag") == "R",
    F.col("l_discount") > 0.05,
).show(truncate=False)

print("=== 2. Trend: Cochran-Armitage, return rate vs quantity bucket ===")
cochran_armitage(
    li.withColumn("qb", F.floor(F.col("l_quantity") / 5).cast("double")),
    "qb",
    (F.col("l_returnflag") == "R").cast("double"),
).show()

print("=== 3. Shape: Jarque-Bera of order totals per priority ===")
jarque_bera(orders, "o_totalprice", "o_orderpriority").show()

weekly = orders.groupBy(
    F.col("o_orderpriority").alias("g"),
    F.floor(F.unix_date(F.col("o_orderdate").cast("date")) / 7)
    .cast("long").alias("wk"),
).agg(F.sum("o_totalprice").alias("rev"))

print("=== 4. Series: Ljung-Box (serial corr.) on weekly revenue ===")
ljung_box(weekly, "wk", "rev", "g", max_lag=4).show()

print("=== 5. Series: Durbin-Watson of revenue ~ week residuals ===")
durbin_watson(weekly, "rev", "wk", "wk", "g").show()

print("=== 6. Heteroscedasticity: Breusch-Pagan, daily rev ~ volume ===")
daily = orders.groupBy(
    F.unix_date(F.col("o_orderdate").cast("date")).cast("long").alias("day"),
).agg(
    F.sum("o_totalprice").alias("rev"),
    F.count(F.lit(1)).cast("double").alias("n_orders"),
)
breusch_pagan(daily, "rev", "n_orders").show()

print("=== 7. Robust trend: Theil-Sen on weekly revenue ===")
theil_sen_fit(weekly, "wk", "rev", "g").show()

per_user = events.filter(F.col("user_id").isNotNull()).groupBy(
    "user_id",
).agg(
    F.max((F.col("event_type") == "purchase").cast("double"))
    .alias("converted"),
    F.sum((F.col("event_type") == "purchase").cast("double"))
    .alias("n_purch"),
    F.count(F.lit(1)).alias("ne"),
    F.min("ts").alias("t0"),
    F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    .alias("p"),
    F.max("ts").alias("lastts"),
)

print("=== 8. Logistic: conversion ~ log activity ===")
logistic_fit(
    per_user.select(
        "converted", F.log(F.lit(1.0) + F.col("ne")).alias("x")),
    "converted", "x",
).show()

print("=== 9. Poisson: purchase count ~ log activity ===")
poisson_fit(
    per_user.select(
        "n_purch", F.log(F.lit(1.0) + F.col("ne")).alias("x")),
    "n_purch", "x",
).show()

print("=== 10. Survival regression: Cox PH, time-to-purchase ===")
surv = per_user.select(
    F.floor(
        (F.unix_micros(F.coalesce("p", "lastts")) - F.unix_micros("t0"))
        / 3.6e9,
    ).cast("double").alias("dur"),
    F.col("p").isNotNull().cast("double").alias("ev"),
    F.log(F.lit(1.0) + F.col("ne")).alias("x"),
).filter(F.col("dur") >= 0)
cox_ph_fit(surv, "dur", "ev", "x").show()

print("=== 11. Structure: 2-component GMM of log order totals ===")
gmm1d_em(
    orders.select(F.log("o_totalprice").alias("v")), "v",
).show()

print("=== 12. Seasonal forecast: Holt-Winters on weekly revenue ===")
holt_winters_fit(weekly, "wk", "rev", "g", period=4).show()

print("statistical_inference example complete.")
spark.stop()
