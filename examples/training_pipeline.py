"""End-to-end LLM training-data prep — run with:
python examples/training_pipeline.py

The full corpus path a pretraining pipeline walks, on the synthetic
documents/embeddings tables: quality filter -> PII redaction -> exact +
near dedup -> semantic dedup -> decontamination -> mix rebalancing ->
train/held split -> chunk + pack into fixed-length sequences.  Every
stage is a DataFrame transformation (Catalyst-planned, no driver loops);
the same code runs unchanged on a real cluster.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("training_pipeline")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from woodwork_spark.io import read_parquet
from woodwork_spark.operators.cleaning import pii_redact_expr
from woodwork_spark.operators.dedup import exact_dedup, minhash_dedup, semdedup
from woodwork_spark.operators.packing import mix_report, pack_sequences, rebalance_mix
from woodwork_spark.operators.text import (
    chunk_documents,
    filter_by_quality,
    token_count_expr,
    unigram_logprob,
)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
docs = read_parquet(spark, f"{SF}/documents.parquet")
emb = read_parquet(spark, f"{SF}/embeddings.parquet")
n0 = docs.count()

# ---- 1. quality filter + perplexity-proxy scoring --------------------------
docs = filter_by_quality(docs, "text", min_tokens=5)
scored = unigram_logprob(docs, "text", "doc_id")
keep_ids = scored.filter(F.col("avg_logprob") > -12.0).select("doc_id")
docs = docs.join(keep_ids, "doc_id", "left_semi")
print(f"quality+logprob filter: {n0} -> {docs.count()} docs")

# ---- 2. canonicalization + PII redaction -----------------------------------
from woodwork_spark.operators.cleaning import normalize_unicode_expr

docs = docs.withColumn("text", normalize_unicode_expr("text"))  # NFC first:
# exact-dedup keys split on byte representation without it
docs = docs.withColumn("text", pii_redact_expr("text"))

# ---- 2b. source-level governance: drop domains that fail the quality bar ---
from woodwork_spark.operators.curation import (
    filter_by_source_quality,
    source_quality_report,
)

source_quality_report(docs, "source", "text").orderBy("source").show()
docs = filter_by_source_quality(
    docs, "source", "text", min_avg_quality=0.1, max_dup_fraction=0.9,
)
print(f"after source governance: {docs.count()} docs")

# ---- 3. dedup ladder: exact -> near (MinHash) ------------------------------
docs = exact_dedup(docs, columns=["text"], id_col="doc_id")
docs = minhash_dedup(docs, "doc_id", "text", threshold=0.8)
print(f"after exact+near dedup: {docs.count()} docs")

# ---- 3b. char-level repeated-substring masking (sub-line boilerplate) ------
from woodwork_spark.operators.cleaning import mask_repeated_spans

masked = mask_repeated_spans(
    docs, "doc_id", "text", span_len=40, min_docs=5,
)
n_shrunk = (
    masked.join(docs.select("doc_id", F.col("text").alias("__orig")), "doc_id")
    .filter(F.length("text") < F.length("__orig"))
    .count()
)
print(f"repeated-span masking rewrote {n_shrunk} docs")
docs = masked.select(*docs.columns)

# ---- 4. semantic dedup on embeddings (separate table, same pattern) --------
emb = emb.select(
    "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
)
sem = semdedup(emb, "vec_id", "embedding", threshold=0.95)
print(f"semantic dedup keeps {sem.filter('keep').count()} / {emb.count()} vectors")

# ---- 4b. embedding compression for the index: PCA + JL ---------------------
from woodwork_spark.operators.embedding import pca_fit, pca_project, random_project

comps, mean, ratio = pca_fit(emb, "embedding", 8)
compact = pca_project(emb, "embedding", comps, mean)
print(f"PCA 64->8 keeps {ratio.sum():.1%} of variance")
jl = random_project(emb, "embedding", 8)  # engine-reproducible alternative
print(f"JL 64->8 rows: {jl.count()}")

# ---- 4c. incremental ingestion: dedup a new crawl against the corpus -------
from woodwork_spark.operators.dedup import dedup_against_corpus

new_batch = docs.filter(F.col("doc_id") % 10 == 0).select(
    (F.col("doc_id") + 1_000_000).alias("doc_id"), "text",
)  # a replayed slice: every doc already exists -> nothing should survive
survivors = dedup_against_corpus(new_batch, docs, "text", "doc_id")
print(f"incremental dedup: {new_batch.count()} batch docs -> {survivors.count()} new")

# ---- 5. mix rebalancing to a target language distribution ------------------
print("mix before:")
mix_report(docs, "lang").orderBy("lang").show()
docs = rebalance_mix(
    docs, "doc_id", "lang",
    target={"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15},
)
print("mix after rebalance:")
mix_report(docs, "lang").orderBy("lang").show()

# ---- 5b. drift gate: PSI between the raw and rebalanced corpus -------------
from woodwork_spark.operators.curation import psi_drift_report

psi_drift_report(
    read_parquet(spark, f"{SF}/documents.parquet"), docs,
    numeric_bins={"n_chars": [100.0, 200.0, 400.0]},
    categorical_cols=["lang"],
).orderBy("column").show()

# ---- 6. reproducible LEAKAGE-SAFE train/held split -------------------------
# plain hash_split(docs, "doc_id") would let two 0.9-Jaccard copies of
# the same page straddle the boundary; splitting on the near-dup
# component keeps every duplicate cluster on one side
from woodwork_spark.operators.sampling import leakage_safe_split

split = leakage_safe_split(
    docs, "doc_id", "text", fraction=0.9, threshold=0.8, salt="v1",
    group_col="dup_group",
)
train = split.filter(F.col("split") == "train")
print(f"leakage-safe split: {train.count()} train docs")

# ---- 7. chunk + pack into fixed-length training sequences ------------------
from woodwork_spark.operators.packing import packing_efficiency_report

chunks = chunk_documents(train, "text", "doc_id", chunk_tokens=64, stride=64)
counted = chunks.withColumn("n_tokens", F.col("n_tokens").cast("long"))
print("padding-waste case for packing (global):")
packing_efficiency_report(counted, "n_tokens", 512).show(truncate=False)
packed = pack_sequences(
    counted, "n_tokens", 512, [F.asc("doc_id"), F.asc("chunk_id")],
)
n_seq = packed.agg(F.max("seq_id")).collect()[0][0]
print(f"packed {counted.count()} chunks into {int(n_seq) + 1} sequences of 512 tokens")

# ---- 8. corpus understanding: topic signatures for the final train set -----
from woodwork_spark.operators.curation import tfidf_top_terms

tfidf_top_terms(train, "doc_id", "text", k=2).orderBy("doc_id", "rank").show(6)

# ---- 8b. deterministic eval subset: exactly 3 held docs per language -------
from woodwork_spark.operators.sampling import sample_k_per_group

held = split.filter(F.col("split") == "held")
eval_set = sample_k_per_group(held, "lang", 3, "doc_id")
print(f"eval subset: {eval_set.count()} docs "
      f"({held.select('lang').distinct().count()} languages x <=3)")

# ---- 9. quality-weighted downsampling + group-relative gating --------------
from woodwork_spark.operators.curation import group_quantile_gate
from woodwork_spark.operators.sampling import shuffle_shards, weighted_sample

gated = group_quantile_gate(train, "source", "n_chars", 0.1, keep="above")
weighted = weighted_sample(
    gated, "doc_id", F.least(F.lit(1.0), F.col("n_chars") / 1500.0),
)
print(f"gate+weighted sample: {train.count()} -> {weighted.count()} docs")

# ---- 10. publication gate: declarative constraint suite --------------------
from woodwork_spark.operators import quality_checks as qc

report = qc.run_checks(weighted, [
    qc.not_null("doc_id"),
    qc.unique("doc_id"),
    qc.min_rows(10),
    qc.satisfies("has_text", F.length("text") > 0),
])
report.show(truncate=False)
assert report.filter("NOT passed").count() == 0, "quality gate failed"

# ---- 11. deterministic shuffled shard export -------------------------------
sharded = shuffle_shards(weighted, "doc_id", num_shards=4)
sharded.groupBy("shard").count().orderBy("shard").show()

# ---- 12. objective-specific data prep (round 9) -----------------------------
from woodwork_spark.operators.text import (
    fim_transform,
    span_corruption,
    token_budget_report,
)

budget = token_budget_report(weighted, "text", "lang")
print("token budget by language (share of corpus tokens):")
budget.orderBy(F.desc("token_share")).show(5, truncate=False)

denoise = span_corruption(weighted, "text", "doc_id", block_len=4)
pair = denoise.filter(F.col("target_text") != "").first()
print("span-corruption sample target:", pair["target_text"][:70], "...")

infill = fim_transform(weighted, "text", "doc_id")
print(
    "FIM rows with a non-empty middle:",
    infill.filter(~F.col("fim_text").endswith("<fim_middle>")).count(),
)

# ---- 13. embedding pre-flight before ANN/semantic dedup ---------------------
from woodwork_spark.operators.embedding import embedding_health_report

health = embedding_health_report(emb, "embedding").first()
assert health["n_null"] == 0 and health["n_nonfinite"] == 0
print(
    f"embeddings healthy: {health['n']} rows, dim={health['modal_dim']}, "
    f"norm avg {health['norm_avg']:.3f}",
)

spark.stop()
print("pipeline complete")
