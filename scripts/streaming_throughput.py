"""Streaming throughput vs the reference's ceiling.

The reference's only quantitative performance fact is its own
throttle: `Thread.sleep(1000)` per processed record per stage
(Streamer.java:470) caps it at 1 record/s per stage x partition, so
the shipped 3-stage x 2-partition example drains its 100,000-record
workload (Producer.java:14) in >= 100000 s per stage even with the
sleep as the only cost. This script measures the engine pushing the
SAME topology semantics (3 chained `adder` stages, END value = i + 3,
SURVEY.md §5) through the real Structured Streaming machinery —
checkpointed streaming queries, not a batch shortcut — and reports
records/s in both deployment modes:

* single  — the whole topology compiled into ONE streaming query
  (plans/pipeline.compile_pipeline), file source -> parquet sink;
* chained — the reference's stage-per-query deployment: three
  checkpointed streaming queries handing records through parquet
  directory channels (plans/topology_mode.DirChannels), i.e. one
  full source->sink hop per stage like the reference's per-stage
  Kafka topics.

Output: one JSON line
  {"records": N, "single_sec": s, "single_rps": r,
   "chained_sec": s, "chained_rps": r, "reference_rps": 1.0,
   "verified": true}
`verified` asserts every END value equals i + 3 in both modes.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafkastreamer_spark.plans.pipeline import compile_pipeline, from_dict  # noqa: E402
from kafkastreamer_spark.plans.topology_mode import (  # noqa: E402
    RECORD_SCHEMA,
    DirChannels,
    run_topology_available_now,
)
from kafkastreamer_spark.session import get_spark  # noqa: E402
from kafkastreamer_spark.streaming.sources import file_source, keyed_int_batch  # noqa: E402


def _verify(df, n: int) -> bool:
    """Every record i must arrive exactly once with value i + 3."""
    bad = df.select(
        F.col("key"),
        F.col("value").cast("long").alias("v"),
    )
    total = bad.count()
    distinct_ok = bad.distinct().count() == n
    # source emits value=i for i in [0, n); three adders => i + 3
    rng = bad.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).collect()[0]
    return total == n and distinct_ok and rng.lo == 3 and rng.hi == n + 2


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spec = from_dict(
        {
            "stream_id": "tput",
            "partitions": 2,
            "replica": 1,
            "stages": [
                {"stage": 0, "operation": "adder"},
                {"stage": 1, "operation": "adder"},
                {"stage": 2, "operation": "adder"},
            ],
        }
    )
    spark = get_spark(app_name="kafkastreamer-spark-throughput")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="tput_")
    results: dict[str, object] = {"records": n, "reference_rps": 1.0}
    verified = True

    # --- single-query mode -------------------------------------------------
    src_dir = os.path.join(work, "src")
    out_dir = os.path.join(work, "single_out")
    ckpt = os.path.join(work, "single_ckpt")
    keyed_int_batch(spark, n, spec.partitions).write.mode("overwrite").parquet(src_dir)
    stream = file_source(spark, src_dir, RECORD_SCHEMA)
    compiled = compile_pipeline(spec)(stream)
    t0 = time.perf_counter()
    q = (
        compiled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    single = time.perf_counter() - t0
    results["single_sec"] = round(single, 3)
    results["single_rps"] = round(n / single, 1)
    verified &= _verify(spark.read.parquet(out_dir), n)

    # --- chained (stage-per-query, reference deployment shape) -------------
    chan_root = os.path.join(work, "chan")
    channels = DirChannels(root=chan_root, stream_id=spec.stream_id)
    keyed_int_batch(spark, n, spec.partitions).write.mode("overwrite").parquet(
        channels.path(0)
    )
    t0 = time.perf_counter()
    run_topology_available_now(
        spark, spec, channels, os.path.join(work, "chain_ckpt")
    )
    chained = time.perf_counter() - t0
    results["chained_sec"] = round(chained, 3)
    results["chained_rps"] = round(n / chained, 1)
    verified &= _verify(
        spark.read.parquet(channels.path(len(spec.stages))), n
    )

    # --- paced micro-batches (sustained per-batch overhead) ----------------
    # Source split into 16 files, one file per trigger: 16 real
    # micro-batches with a checkpoint commit each — the closest shape
    # to continuous operation (the reference commits per RECORD).
    paced_src = os.path.join(work, "paced_src")
    paced_out = os.path.join(work, "paced_out")
    paced_ckpt = os.path.join(work, "paced_ckpt")
    keyed_int_batch(spark, n, spec.partitions).repartition(16).write.mode(
        "overwrite"
    ).parquet(paced_src)
    paced_stream = file_source(
        spark, paced_src, RECORD_SCHEMA, max_files_per_trigger=1
    )
    t0 = time.perf_counter()
    q = (
        compile_pipeline(spec)(paced_stream)
        .writeStream.format("parquet")
        .option("path", paced_out)
        .option("checkpointLocation", paced_ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    paced = time.perf_counter() - t0
    n_batches = len(
        [f for f in os.listdir(os.path.join(paced_ckpt, "commits")) if f.isdigit()]
    )
    results["paced_sec"] = round(paced, 3)
    results["paced_rps"] = round(n / paced, 1)
    results["paced_batches"] = n_batches
    verified &= _verify(spark.read.parquet(paced_out), n)

    results["verified"] = bool(verified)
    print(json.dumps(results))
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
