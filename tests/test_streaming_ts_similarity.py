"""Streaming twin of ts_similarity_search_seed: the (user, day, count)
base maintained incrementally (update-mode aggregation -> keyed upsert
sink) across micro-batches AND a checkpoint restart must feed the
shared final computation to the exact batch result."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational17 import (
    _daily,
    seed_topk_from_daily,
)
from kafkastreamer_spark.registry import REGISTRY
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.streaming.ts_similarity import (
    maintain_daily_counts,
    read_daily_base,
)
from kafkastreamer_spark.tables import load_table


def test_streaming_base_reproduces_batch_seed_search(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    inp = str(tmp_path / "in")
    table = str(tmp_path / "daily_base")
    ckpt = str(tmp_path / "ckpt")

    # Run 1: first half of the event stream (3 micro-batches).
    ids = ev.approxQuantile("event_id", [1 / 6, 2 / 6, 3 / 6, 4 / 6, 5 / 6], 0.0)
    bounds = [float("-inf")] + ids + [float("inf")]
    chunks = [
        ev.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi))
        for lo, hi in zip(bounds, bounds[1:])
    ]
    for c in chunks[:3]:
        c.coalesce(1).write.mode("append").parquet(inp)
    q = maintain_daily_counts(
        file_source(spark, inp, ev.schema, max_files_per_trigger=1), table, ckpt
    )
    q.awaitTermination(180)

    # Mid-stream sanity: the base holds exactly the first half's counts.
    half = spark.read.parquet(inp)
    want_half = {
        (r.user_id, r.d): r.c
        for r in half.groupBy(
            "user_id",
            F.floor(
                F.unix_micros(F.to_date("ts").cast("timestamp")) / 86400000000.0
            ).cast("long").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    got_half = {
        (r.user_id, r.d): r.c for r in read_daily_base(spark, table).collect()
    }
    assert got_half == want_half

    # Run 2: restart from the same checkpoint, rest of the stream.
    for c in chunks[3:]:
        c.coalesce(1).write.mode("append").parquet(inp)
    q = maintain_daily_counts(
        file_source(spark, inp, ev.schema, max_files_per_trigger=1), table, ckpt
    )
    q.awaitTermination(180)

    # The shared final computation over the maintained base must equal
    # the registered batch entry bit-for-bit.
    want = [
        tuple(r)
        for r in REGISTRY["ts_similarity_search_seed"].fn(spark, sf_dir).collect()
    ]
    got = [
        tuple(r)
        for r in seed_topk_from_daily(read_daily_base(spark, table)).collect()
    ]
    assert got == want
    # And the base itself matches the batch _daily exactly.
    want_base = {(r.user_id, r.d): r.c for r in _daily(spark, sf_dir).collect()}
    got_base = {
        (r.user_id, r.d): r.c for r in read_daily_base(spark, table).collect()
    }
    assert got_base == want_base
