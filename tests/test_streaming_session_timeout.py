"""session_finalize_on_timeout (streaming/sketches.py): gap sessions
closed by EventTimeTimeout must equal the built-in session_window
aggregation — emitted sessions plus still-open state together cover
the batch truth exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkastreamer_spark.streaming.sketches import session_finalize_on_timeout
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table

GAP_MIN = 30


def _batch_truth(spark, sf_dir):
    """Built-in session_window truth: (user, start_us, end_us, n) where
    start/end are the first/last EVENT times (the stateful op reports
    event extents; the built-in window's end = last event + gap)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    s = (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{GAP_MIN} minutes").alias("w")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.unix_micros(F.min("ts"))).alias("start_us"),
            (F.unix_micros(F.max("ts"))).alias("end_us"),
        )
    )
    return {
        (r["user_id"], r["start_us"], r["end_us"], r["n"])
        for r in s.collect()
    }


def test_timeout_sessions_match_builtin_session_window(spark, sf_dir, tmp_path):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts")
        .orderBy("ts")
    )
    rows = ev.count()
    # 3 chronological micro-batch files so the watermark advances
    # between triggers and event-time timeouts actually fire
    cuts = ev.select(
        F.percentile_approx("ts", [1 / 3, 2 / 3], 10000).alias("c")
    ).collect()[0]["c"]
    inp = str(tmp_path / "sin")
    ev.filter(F.col("ts") < cuts[0]).coalesce(1).write.mode("append").parquet(inp)
    ev.filter((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])).coalesce(
        1
    ).write.mode("append").parquet(inp)
    ev.filter(F.col("ts") >= cuts[1]).coalesce(1).write.mode("append").parquet(inp)

    stream = file_source(
        spark, inp, ev.schema, max_files_per_trigger=1
    ).withWatermark("ts", "0 seconds")
    sessions = session_finalize_on_timeout(stream, gap_minutes=GAP_MIN)
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        sessions.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    emitted = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.read.parquet(os.path.join(out, "*")).collect()
    }
    # sessions still open at end-of-stream live in the state store
    state = spark.read.format("statestore").load(ckpt)
    open_sessions = {
        (
            r["key"]["user_id"],
            r["value"]["groupState"]["start_us"],
            r["value"]["groupState"]["end_us"],
            r["value"]["groupState"]["n"],
        )
        for r in state.collect()
    }

    want = _batch_truth(spark, sf_dir)
    assert emitted | open_sessions == want
    assert emitted.isdisjoint(open_sessions)
    # the timeout path actually closed sessions (not everything open),
    # and state holds each user's LAST session only
    assert len(emitted) > 0
    assert sum(n for _, _, _, n in emitted | open_sessions) == rows


def test_timeout_sessions_survive_stream_restart(spark, sf_dir, tmp_path):
    """Checkpoint recovery across separate RUNS: process the first
    two-thirds of events with one availableNow run, stop, append the
    rest, run AGAIN with the same checkpoint — emitted plus remaining
    open state must still equal the batch session_window truth, with
    no session double-emitted and every event accounted for."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts")
        .orderBy("ts")
    )
    rows = ev.count()
    cuts = ev.select(
        F.percentile_approx("ts", [1 / 3, 2 / 3], 10000).alias("c")
    ).collect()[0]["c"]
    inp = str(tmp_path / "rin")
    out = str(tmp_path / "rout")
    ckpt = str(tmp_path / "rckpt")

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    def run_once():
        stream = file_source(
            spark, inp, ev.schema, max_files_per_trigger=1
        ).withWatermark("ts", "0 seconds")
        q = (
            session_finalize_on_timeout(stream, gap_minutes=GAP_MIN)
            .writeStream.foreachBatch(wb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    # run 1: first two chronological slices
    ev.filter(F.col("ts") < cuts[0]).coalesce(1).write.mode("append").parquet(inp)
    ev.filter(
        (F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])
    ).coalesce(1).write.mode("append").parquet(inp)
    run_once()
    emitted_run1 = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.read.parquet(os.path.join(out, "*")).collect()
    }
    assert len(emitted_run1) > 0  # run 1 closed some sessions already

    # run 2: append the final slice, SAME checkpoint — state carries
    ev.filter(F.col("ts") >= cuts[1]).coalesce(1).write.mode("append").parquet(inp)
    run_once()

    emitted = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.read.parquet(os.path.join(out, "*")).collect()
    }
    state = spark.read.format("statestore").load(ckpt)
    open_sessions = {
        (
            r["key"]["user_id"],
            r["value"]["groupState"]["start_us"],
            r["value"]["groupState"]["end_us"],
            r["value"]["groupState"]["n"],
        )
        for r in state.collect()
    }
    want = _batch_truth(spark, sf_dir)
    assert emitted | open_sessions == want
    assert emitted.isdisjoint(open_sessions)
    assert sum(n for _, _, _, n in emitted | open_sessions) == rows
