"""woodwork_spark quickstart — run with: python examples/quickstart.py

Walks the typed-table lifecycle on the driver's synthetic data: init with
inference, selection by semantic type, profiling, dependence, outliers,
serialization, and the training-data operators.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("woodwork_spark_quickstart")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import woodwork_spark as ww
from woodwork_spark.io import read_parquet

SF = "/root/testdata/sf0.001"

# ---- 1. init: inference + coercion + index validation ----------------------
orders = ww.init(
    read_parquet(spark, f"{SF}/orders.parquet"),
    name="orders",
    index="o_orderkey",
    time_index="o_orderdate",
)
print(orders.types, "\n")

# ---- 2. typed selection ----------------------------------------------------
print("numeric columns:", orders.select("numeric").columns)
print("categorical columns:", orders.select("category").columns, "\n")

# ---- 3. statistics ---------------------------------------------------------
print(orders.describe().to_string(), "\n")
print("value counts:", orders.value_counts(top_n=3), "\n")
print("dependence:")
li = ww.init(read_parquet(spark, f"{SF}/lineitem.parquet"), name="lineitem")
print(li[["l_quantity", "l_extendedprice", "l_discount"]].dependence(
    measures=["pearson", "spearman"],
).to_string(), "\n")
print("box plot:", {k: v for k, v in ww.init(
    read_parquet(spark, f"{SF}/customer.parquet"), validate=False,
).box_plot_dict("c_acctbal").items() if k != "quantiles"}, "\n")

# ---- 4. serialization round-trip -------------------------------------------
import tempfile, shutil

from woodwork_spark.serializers import from_disk

path = tempfile.mkdtemp(prefix="ww_quickstart_")
orders.to_disk(path, format="parquet")
back = from_disk(spark, path)
print("roundtrip:", back.name, back.index, back.time_index)
shutil.rmtree(path, ignore_errors=True)

# ---- 5. training-data operators --------------------------------------------
from woodwork_spark.operators import dedup, similarity, text

docs = read_parquet(spark, f"{SF}/documents.parquet")
print("\ntext profile sample:")
text.text_profile(docs, "text", "doc_id").show(3, truncate=60)

pairs = dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
print("near-dup pairs found:", pairs.count())

emb = read_parquet(spark, f"{SF}/embeddings.parquet")
nn = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3)
print("nearest neighbors of vec 0:")
nn.show()

spark.stop()
