"""Corpus-governance walkthrough over the documents table — run with:
python examples/corpus_governance.py

The curation decisions a training-data owner makes BEFORE spending GPU
hours, each as a Catalyst-planned job: concentration audit (is the
corpus three hosts in a trenchcoat?) -> Zipf smell test -> cross-source
drift (KS + vocabulary JS-divergence) -> score calibration (quantile
normalization) -> mix planning (temperature sampling) -> token-budget
selection -> packing-ready output.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("corpus_governance")
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

# ---- 0. dataset card -------------------------------------------------------
from woodwork_spark.operators.curation import corpus_report

print("corpus executive summary:")
corpus_report(docs, "text", "source").show(truncate=False)

# ---- 1. concentration audit ------------------------------------------------
from woodwork_spark.operators.curation import concentration_report, lorenz_curve

print("source concentration (weight = chars):")
conc = concentration_report(docs, "source", weight_col="n_chars")
conc.show(truncate=False)
release(conc)

print("Lorenz curve (first points — the sag below the diagonal is the Gini):")
lz = lorenz_curve(docs, "source", "n_chars")
lz.orderBy("cum_group_frac").show(5)
release(lz)

# ---- 2. Zipf smell test ----------------------------------------------------
from woodwork_spark.operators.text import zipf_fit

print("Zipf fit of the token frequency spectrum (natural text ~ -1):")
z = zipf_fit(docs, "text", max_rank=1000)
z.show(truncate=False)
release(z)

# ---- 3. cross-source drift -------------------------------------------------
from woodwork_spark.operators.curation import ks_drift, vocab_divergence

en = docs.where(F.col("lang") == "en")
es = docs.where(F.col("lang") == "es")
print("KS drift of doc lengths, en vs es:")
ks = ks_drift(en.select("n_chars"), es.select("n_chars"), "n_chars")
ks.show()
release(ks)

print("vocabulary JS-divergence, en vs es:")
vocab_divergence(en, es, "text").show()

# ---- 4. score calibration --------------------------------------------------
# n_chars stands in for a per-source quality score with incomparable
# scales; after normalization a single global threshold is meaningful.
from woodwork_spark.operators.features import quantile_normalize

qn = quantile_normalize(docs, "source", "n_chars", "doc_id")
print("per-source score distributions after quantile normalization:")
qn.groupBy("source").agg(
    F.round(F.avg("normalized"), 1).alias("avg_norm"),
    F.min("normalized").alias("min"),
    F.max("normalized").alias("max"),
).orderBy("source").show(5)
release(qn)

# ---- 5. mix planning -------------------------------------------------------
from woodwork_spark.operators.curation import temperature_mix

print("temperature-scaled language mix (alpha=0.7):")
temperature_mix(docs, "lang", 0.7, weight_col="n_chars").orderBy(
    "lang",
).show()

# ---- 6. token-budget selection --------------------------------------------
from woodwork_spark.operators.packing import select_to_budget
from woodwork_spark.operators.text import token_count_expr

scored = docs.select(
    "doc_id", "source", "lang",
    token_count_expr("text").cast("long").alias("n_tokens"),
)
kept = select_to_budget(
    scored, "source", "n_tokens", "n_tokens", budget=50_000, id_col="doc_id",
)
print("kept tokens per source under a 50k/source budget:")
kept.groupBy("source").agg(
    F.count("*").alias("n_docs"),
    F.sum("n_tokens").alias("kept_tokens"),
).orderBy("source").show(5)
release(kept)

# ---- 7. URL / domain governance (round 8) ----------------------------------
# Crawl URLs synthesized from doc ids: canonicalization collapses
# tracking-param/case/slash variants; caps apply per REGISTERED domain.
from woodwork_spark.operators.web import (
    cap_per_domain,
    domain_governance_report,
)

crawl = docs.select(
    "doc_id",
    F.concat(
        F.lit("https://WWW.src"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".Example.COM/p/"), (F.col("doc_id") % 40).cast("string"),
        F.lit("/?utm_source=feed&q="), (F.col("doc_id") % 10).cast("string"),
    ).alias("url"),
)
print("per-domain crawl governance (dup_rate = canonicalization noise):")
domain_governance_report(crawl, "url").orderBy("domain").show(truncate=False)

capped = cap_per_domain(crawl, "url", 100, ["doc_id"])
print(f"rows kept under a 100/registered-domain cap: {capped.count()}")

# ---- 8. paragraph-level cross-doc dedup (round 8) ---------------------------
from woodwork_spark.operators.cleaning import dedup_paragraphs_global

with_boiler = docs.select(
    "doc_id",
    F.concat(
        F.substring("text", 1, 80),
        F.lit("\n\nSubscribe to our newsletter for updates."),
    ).alias("text"),
)
deduped = dedup_paragraphs_global(with_boiler, "text", "doc_id")
shrunk = deduped.select(
    F.avg(F.length("text")).alias("avg_chars_after"),
).first()
print(
    "avg chars after paragraph dedup (boilerplate kept once corpus-wide): "
    f"{shrunk['avg_chars_after']:.1f}",
)
release(deduped)

# ---- 9. robots.txt -> crawl-policy gate (round 9) ---------------------------
from woodwork_spark.operators.web import apply_url_policies, parse_robots_rules

# the crawl URLs all resolve to the REGISTERED domain example.com —
# robots rules key on the owner, exactly like the cap and the report
robots = spark.createDataFrame(
    [(
        "example.com",
        "User-agent: *\nDisallow: /p/1\n\n"
        "User-agent: MyBot\nDisallow: /p/2\nAllow: /p/2/ok\n",
    )],
    "domain string, robots string",
)
rules = parse_robots_rules(robots, "domain", "robots", agent="MyBot/2.0")
print("parsed robots rules (MyBot group wins over *):")
rules.orderBy("domain", "path_prefix").show(5, truncate=False)
gated = apply_url_policies(crawl, "url", "doc_id", rules)
n_denied = gated.filter(~F.col("crawl_allowed")).count()
print(f"URLs denied by robots-derived policy: {n_denied}")

# ---- 10. exact eTLD+1 from a public-suffix table (round 9) ------------------
from woodwork_spark.operators.web import with_registered_domain

psl = spark.createDataFrame(
    [("co.uk",), ("github.io",), ("com.au",)], "suffix string",
)
hosts = docs.select(
    F.concat(F.lit("u"), (F.col("doc_id") % 9).cast("string"),
             F.lit(".pages.github.io")).alias("host"),
)
resolved = with_registered_domain(hosts, "host", suffixes=psl, from_host=True)
print("registered domains under the github.io PUBLIC suffix:")
resolved.groupBy("domain").count().orderBy("domain").show(3, truncate=False)

# ---- 11. cross-doc substring dedup (round 9) --------------------------------
from woodwork_spark.operators.cleaning import dedup_spans_global

with_license = docs.select(
    "doc_id",
    F.concat(
        F.substring("text", 1, 60),
        F.lit(" This content is provided AS IS without warranty of any kind "),
        F.substring("text", 61, 60),
    ).alias("text"),
)
despanned = dedup_spans_global(with_license, "text", "doc_id", k=6)
shrunk2 = despanned.select(F.avg(F.length("text")).alias("c")).first()
print(
    "avg chars after cross-doc 6-token span dedup (license kept once): "
    f"{shrunk2['c']:.1f}",
)
release(despanned)

print("governance walkthrough complete.")
spark.stop()
