"""Structured-Streaming walkthrough over the events table — run with:
python examples/streaming_pipeline.py

A finite file stream driven to completion with Trigger.AvailableNow,
exercising the streaming surface end-to-end: at-least-once replay ->
exactly-once dedup -> watermarked hourly rollup -> EXACT windowed
distinct users -> idempotent exactly-once parquet sink.
"""

import os
import shutil
import sys
import tempfile
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .appName("streaming_pipeline")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from woodwork_spark.io import read_parquet
from woodwork_spark.streaming import (
    dedup_event_stream,
    hourly_rollup_stream,
    read_event_stream,
    windowed_distinct_stream,
)
from woodwork_spark.streaming.events import exactly_once_parquet_sink

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
EVENTS = f"{SF}/events.parquet"


def run(df, name, mode="append"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), f"{name} did not finish in 180s"
    return spark.sql(f"SELECT * FROM {name}")


# ---- 1. at-least-once source + exactly-once dedup --------------------------
# the same file read as TWO streams and unioned = a source that replays
# every event twice; dropDuplicatesWithinWatermark must collapse it
replayed = read_event_stream(spark, EVENTS).unionByName(
    read_event_stream(spark, EVENTS),
)
deduped = dedup_event_stream(replayed, keys=("event_id",))
name = f"dedup_{uuid.uuid4().hex[:6]}"
got = run(deduped, name).count()
truth = read_parquet(spark, EVENTS).count()
print(f"replayed-twice stream deduped to {got} events (batch truth {truth})")
assert got == truth

# ---- 2. watermarked hourly rollup ------------------------------------------
rolled = run(
    hourly_rollup_stream(read_event_stream(spark, EVENTS)),
    f"roll_{uuid.uuid4().hex[:6]}",
    mode="complete",
)
print("hourly rollup (3 busiest type-hours):")
rolled.orderBy(F.desc("n_events")).show(3)

# ---- 3. EXACT windowed distinct users --------------------------------------
wd = run(
    windowed_distinct_stream(
        read_event_stream(spark, EVENTS), "user_id", window="1 day",
    ),
    f"wd_{uuid.uuid4().hex[:6]}",
)
print("exact daily distinct users (append mode, watermark-finalized):")
wd.orderBy("window_start").show(3)

# ---- 4. exactly-once parquet sink ------------------------------------------
out_dir = tempfile.mkdtemp(prefix="stream_sink_")
try:
    q = exactly_once_parquet_sink(
        read_event_stream(spark, EVENTS).select("event_id", "ts", "value"),
        out_dir,
        checkpoint_dir=os.path.join(out_dir, "_ckpt"),
    )
    # the sink runs continuously (real deployments never stop it):
    # drain the finite input, then stop
    q.processAllAvailable()
    q.stop()
    # batch_id=*/ partition tree; the _batch_commits marker dir is
    # underscore-hidden from parquet discovery
    written = spark.read.parquet(out_dir).count()
    print(f"exactly-once sink wrote {written} rows (truth {truth})")
    assert written == truth
finally:
    shutil.rmtree(out_dir, ignore_errors=True)

print("streaming walkthrough complete.")
spark.stop()
