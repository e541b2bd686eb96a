"""Record-linkage / entity-resolution walkthrough — run with:
python examples/record_linkage.py

The classic MDM pipeline over a corrupted customer registry: two
blocking strategies generate candidates (rarest-first ED-Join q-grams
for typo-shaped errors, sorted-neighborhood for errors that destroy
grams but not sort position), exact verification keeps precision,
connected components build entity clusters, and a golden record per
cluster merges the survivors field-by-field.  Every stage is a
DataFrame transformation; nothing here is quadratic in the registry.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("record_linkage")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from woodwork_spark.io import read_parquet
from woodwork_spark.lifecycle import release
from woodwork_spark.operators.dedup import (
    connected_components,
    edit_distance_join,
    golden_records,
    sorted_neighborhood_pairs,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
cust = read_parquet(spark, f"{SF}/customer.parquet").select(
    "c_custkey", "c_name", "c_acctbal",
)

# ---- 0. a dirty feed: one-char typos, re-keyed ------------------------------
dirty = cust.filter(F.col("c_custkey") % 5 == 0).select(
    (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
    F.concat(
        F.expr("substring(c_name, 1, length(c_name) - 1)"), F.lit("X"),
    ).alias("c_name"),
    (F.col("c_acctbal") - 0.5).alias("c_acctbal"),
)
print(f"registry: {cust.count()} records, dirty feed: {dirty.count()}")

# ---- 1. blocking strategy A: rarest-first ED-Join q-grams -------------------
pairs_ed = edit_distance_join(
    dirty.select(F.col("c_custkey").alias("did"), "c_name"),
    cust, "did", "c_custkey", "c_name", max_dist=1,
)
print(f"ED-join matches (distance <= 1): {pairs_ed.count()}")

# ---- 2. blocking strategy B: sorted neighborhood over the union -------------
# catches truncation/suffix damage that destroys grams; candidates only,
# verify with a bounded levenshtein downstream
union = cust.unionByName(dirty)
snm = sorted_neighborhood_pairs(union, "c_custkey", "c_name", window=2)
snm_pairs = snm.count()
release(snm)
print(f"sorted-neighborhood candidates (window 2): {snm_pairs}")

# ---- 3. clusters via connected components -----------------------------------
comp = connected_components(
    pairs_ed.select(F.col("did").alias("id_a"), F.col("c_custkey").alias("id_b")),
)
clustered = union.join(
    comp.select(F.col("id").alias("c_custkey"), "component"),
    "c_custkey", "left",
).withColumn("entity", F.coalesce("component", F.col("c_custkey")))
n_entities = clustered.select("entity").distinct().count()
print(f"{union.count()} records -> {n_entities} entities")

# ---- 4. golden records ------------------------------------------------------
golden = golden_records(
    clustered, "entity", ["c_name", "c_acctbal"], "c_acctbal",
    tiebreak_col="c_custkey",
)
merged = golden.filter(F.col("n_members") > 1)
print("sample merged entities (survivor name = highest-balance member):")
merged.orderBy("entity").show(5, truncate=False)
assert merged.count() > 0

# ---- 5. Fellegi-Sunter with EM-learned parameters (round 9) ------------------
from woodwork_spark.operators.dedup import (
    blocked_candidates,
    estimate_m_u,
    fellegi_sunter_score,
)

# a second dirty feed: every 9th name is wrecked PAST the ED radius,
# but the balance survives — only the exact-balance blocker sees those
full = read_parquet(spark, f"{SF}/customer.parquet").select(
    "c_custkey", "c_name", "c_acctbal", "c_mktsegment",
)
feed = full.filter(F.col("c_custkey") % 4 == 0).select(
    (F.col("c_custkey") + 20_000_000).alias("did"),
    F.when(
        F.col("c_custkey") % 9 == 0,
        F.concat(F.lit("##"), F.col("c_name"), F.lit("##")),
    ).otherwise(
        F.concat(
            F.expr("substring(c_name, 1, length(c_name) - 1)"), F.lit("X"),
        ),
    ).alias("c_name"),
    F.col("c_acctbal"),
    F.col("c_mktsegment"),
)
cand = blocked_candidates(
    full, feed, "c_custkey", "did",
    [("edit", "c_name", 1), ("exact", "c_acctbal")],
)
lf = full.select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
rf = feed.select(
    "did",
    F.col("c_name").alias("c_name_r"),
    F.col("c_acctbal").alias("c_acctbal_r"),
    F.col("c_mktsegment").alias("c_mktsegment_r"),
)
pairs = cand.join(lf, "c_custkey").join(rf, "did")
print(f"OR-blocked candidate pairs: {pairs.count()}")

# learn m/u + the match prior from the UNLABELED pairs, then score
params = estimate_m_u(
    pairs, ["c_name", "c_acctbal", "c_mktsegment"], iters=5,
)
print("EM-estimated Fellegi-Sunter parameters:")
params.show(truncate=False)
learned = {r["field"]: (r["m"], r["u"], r["lam"]) for r in params.collect()}
lam = max(1e-4, min(1 - 1e-4, next(iter(learned.values()))[2]))
scored = fellegi_sunter_score(
    pairs,
    [
        ((f, f + "_r"), max(u + 1e-6, min(m, 1 - 1e-6)), max(u, 1e-6))
        for f, (m, u, _) in learned.items()
    ],
    prior=lam,
)
print("decision classes from learned parameters:")
scored.groupBy("fs_class").count().orderBy("fs_class").show(truncate=False)
release(cand)

spark.stop()
print("linkage complete")
