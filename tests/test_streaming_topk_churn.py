"""Streaming twin of events_topk_churn (VERDICT r9 #4): stateful
per-(day, user) running counts feeding the shared churn aggregation.

1. Fixture parity: max-emitted-count per key -> churn_from_daily
   EQUALS the registered batch query when events arrive in time order
   within the TTL.
2. Eviction: a key whose day is past the TTL horizon is dropped by
   the event-time timer (verified via the state-store reader); a
   later recurrence is late past the watermark and cleanly drops —
   resurrection/undercount is impossible by construction.
3. Checkpoint restart: counts continue across a stop/start.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from kafkastreamer_spark.queries.relational24 import churn_from_daily
from kafkastreamer_spark.registry import REGISTRY
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.streaming.topk_churn import (
    streaming_daily_user_counts,
)
from kafkastreamer_spark.tables import load_table

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ]
)


def _t(day: int, minute: int = 0):
    return datetime(2026, 1, 1) + timedelta(days=day, minutes=minute)


def _write_file(spark, inp, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)


def _run(spark, inp, out, ckpt, schema, ttl_days):
    stream = file_source(
        spark, inp, schema, max_files_per_trigger=1
    ).withWatermark("ts", "0 seconds")
    counts = streaming_daily_user_counts(stream, ttl_days=ttl_days)

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        counts.writeStream.foreachBatch(wb)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _emissions(spark, out):
    rows = []
    if not os.path.isdir(out):
        return rows
    for b in sorted(os.listdir(out)):
        rows.extend(
            (r["day"], r["user_id"], r["c"])
            for r in spark.read.parquet(os.path.join(out, b)).collect()
        )
    return rows


def test_churn_twin_matches_batch(spark, sf_dir, tmp_path):
    want = [
        tuple(r)
        for r in REGISTRY["events_topk_churn"].fn(spark, sf_dir).collect()
    ]

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts"
    )
    qs = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    m1, m2 = qs
    inp = str(tmp_path / "in")
    parts = [
        ev.filter(F.col("event_id") <= m1),
        ev.filter((F.col("event_id") > m1) & (F.col("event_id") <= m2)),
        ev.filter(F.col("event_id") > m2),
    ]
    mx = None
    for p in parts:  # time-ordered feed (guarded, as in the funnel twin)
        lo, hi = p.agg(F.min("ts"), F.max("ts")).first()
        assert mx is None or lo >= mx
        mx = hi
        p.orderBy("ts", "event_id").coalesce(1).write.mode("append").parquet(
            inp
        )

    out = str(tmp_path / "out")
    # TTL far beyond the fixture's 30-day span: nothing evicts
    _run(spark, inp, out, str(tmp_path / "ckpt"), EV_SCHEMA, ttl_days=10_000)
    em = _emissions(spark, out)
    assert em, "stateful counts emitted nothing"

    daily = (
        spark.createDataFrame(em, "day date, user_id long, c long")
        .groupBy("day", "user_id")
        .agg(F.max("c").alias("c"))
    )
    got = [tuple(r) for r in churn_from_daily(daily).collect()]
    assert got == want

    # the counts really accumulate across micro-batches: some key must
    # have been emitted with several increasing values
    multi = (
        spark.createDataFrame(em, "day date, user_id long, c long")
        .groupBy("day", "user_id")
        .agg(F.count_distinct("c").alias("k"))
        .agg(F.max("k"))
        .first()[0]
    )
    assert multi and multi > 1


def test_churn_twin_evicts_and_late_rows_drop(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # day-0 user 1: two events; then the watermark jumps 40 days
    # (TTL=2) so the key's timer fires and evicts it; a day-0 event
    # arriving after that is LATE past the watermark and is dropped
    # by the stateful exec before the function ever sees it — the
    # eviction horizon (day end + TTL) always exceeds the lateness
    # horizon, so post-eviction resurrection cannot happen at all
    # (module docstring contract: late drop, never a re-count).
    _write_file(
        spark, inp, [(1, 1, _t(0, 0)), (2, 1, _t(0, 5))]
    )
    _write_file(spark, inp, [(3, 9, _t(40))])
    _write_file(spark, inp, [(4, 9, _t(40, 1))])
    _write_file(spark, inp, [(5, 1, _t(0, 10))])  # late beyond horizon
    _run(spark, inp, out, ckpt, EV_SCHEMA, ttl_days=2)
    em = _emissions(spark, out)
    d0 = _t(0).date()
    u1 = sorted(c for d, u, c in em if d == d0 and u == 1)
    assert u1 == [2]  # the late recurrence emitted nothing

    # the evicted key is gone from the state store; the fresh key
    # (day-40 user 9, inside its horizon) is the positive control
    state = spark.read.format("statestore").load(ckpt)
    keys = {
        (r["key"]["day"], r["key"]["user_id"]) for r in state.collect()
    }
    assert (d0, 1) not in keys
    assert (_t(40).date(), 9) in keys


def test_churn_twin_survives_restart(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_file(spark, inp, [(1, 1, _t(0, 0)), (2, 1, _t(0, 1))])
    _run(spark, inp, out, ckpt, EV_SCHEMA, ttl_days=10_000)
    # restart with the same checkpoint: the count continues from 2
    _write_file(spark, inp, [(3, 1, _t(0, 2))])
    _run(spark, inp, out, ckpt, EV_SCHEMA, ttl_days=10_000)
    em = _emissions(spark, out)
    d0 = _t(0).date()
    assert [c for d, u, c in em if d == d0 and u == 1] == [2, 3]
