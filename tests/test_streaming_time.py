"""Event-time streaming semantics (SURVEY.md §2-B "Streaming time",
"Dedup"): watermarked windowed aggregation with late-data drop,
streaming dropDuplicates (unbounded state) and
dropDuplicatesWithinWatermark (bounded state with eviction), and a
watermarked stream-stream join."""

from __future__ import annotations

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafkastreamer_spark.streaming.sources import file_source

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("key", StringType()),
    ]
)


def _ts(minute: int, second: int = 0) -> datetime:
    return datetime(2024, 1, 1, 10, minute, second)


def _append(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def _run_windowed(spark, inp, ckpt, out):
    stream = file_source(spark, inp, SCHEMA)
    agg = (
        stream.withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "key", "n")
    )

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        agg.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg: a record older than the watermark
    must not resurrect its (already finalized) window."""
    inp, ckpt, out = (str(tmp_path / x) for x in ("in", "ckpt", "out"))

    # batch 1: window [10:00,10:10) gets 2 events; max ts 10:20 →
    # watermark after batch = 10:15 → the 10:00 window finalizes.
    _append(
        spark,
        inp,
        [
            (1, _ts(1), "a"),
            (2, _ts(2), "a"),
            (3, _ts(20), "a"),
        ],
    )
    _run_windowed(spark, inp, ckpt, out)

    # batch 2: one late event at 10:03 (behind watermark 10:15) and
    # one fresh event at 10:21.
    _append(spark, inp, [(4, _ts(3), "a"), (5, _ts(21), "a")])
    _run_windowed(spark, inp, ckpt, out)

    results = {}
    for b in sorted(os.listdir(out)):
        for r in spark.read.parquet(os.path.join(out, b)).collect():
            results[(r["ws"].strftime("%H:%M"), r["key"])] = (
                results.get((r["ws"].strftime("%H:%M"), r["key"]), 0) + r["n"]
            )
    # the 10:00 window emitted exactly 2 — the late event never counted
    assert results.get(("10:00", "a")) == 2


def test_streaming_drop_duplicates(spark, tmp_path):
    """Streaming exact dedup on event_id within the watermark horizon
    (the unbounded-stream form of dedup_exact)."""
    inp, ckpt, out = (str(tmp_path / x) for x in ("in", "ckpt", "out"))
    _append(
        spark,
        inp,
        [
            (1, _ts(1), "a"),
            (1, _ts(1), "a"),  # duplicate in same batch
            (2, _ts(2), "b"),
        ],
    )

    def run():
        stream = file_source(spark, inp, SCHEMA)
        deduped = stream.withWatermark("ts", "10 minutes").dropDuplicates(
            ["event_id"]
        )

        def wb(bdf, bid):
            bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

        q = (
            deduped.writeStream.foreachBatch(wb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # cross-batch duplicate (state remembers event_id 2)
    _append(spark, inp, [(2, _ts(3), "b"), (3, _ts(4), "c")])
    run()

    rows = []
    for b in sorted(os.listdir(out)):
        rows += spark.read.parquet(os.path.join(out, b)).collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3]


def test_streaming_drop_duplicates_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: same dedup guarantee for records
    whose event times fall inside the watermark delay, but state for a
    key is EVICTED once the watermark passes it — the bounded-state
    form required for unbounded streams (plain dropDuplicates keys
    grow forever; SURVEY.md §4.3 scale posture).

    Replays a duplicate within the horizon (suppressed) and a
    duplicate of an evicted key far past the horizon (re-admitted —
    the documented semantics of eviction)."""
    inp, ckpt, out = (str(tmp_path / x) for x in ("in", "ckpt", "out"))

    def run():
        stream = file_source(spark, inp, SCHEMA)
        deduped = stream.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["event_id"]
        )

        def wb(bdf, bid):
            bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

        q = (
            deduped.writeStream.foreachBatch(wb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _append(spark, inp, [(1, _ts(1), "a"), (1, _ts(2), "a"), (2, _ts(2), "b")])
    run()
    # within horizon: watermark is 10:02 - 10m; event_id 2 replayed at
    # 10:03 is still suppressed
    _append(spark, inp, [(2, _ts(3), "b"), (3, _ts(4), "c")])
    run()
    # far past horizon: watermark advances beyond 10:04+10m, evicting
    # all earlier keys; a new occurrence of event_id 1 is re-admitted
    _append(spark, inp, [(9, _ts(59), "z")])
    run()
    _append(spark, inp, [(1, _ts(58), "a2")])
    run()

    rows = []
    for b in sorted(os.listdir(out)):
        rows += spark.read.parquet(os.path.join(out, b)).collect()
    ids = sorted((r["event_id"], r["key"]) for r in rows)
    assert ids == [(1, "a"), (1, "a2"), (2, "b"), (3, "c"), (9, "z")]


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream inner join with a time-bound
    condition (the stream-stream row of SURVEY.md §2-B)."""
    left_in, right_in, ckpt, out = (
        str(tmp_path / x) for x in ("lin", "rin", "ckpt", "out")
    )
    _append(spark, left_in, [(1, _ts(1), "a"), (2, _ts(2), "b")])
    _append(spark, right_in, [(1, _ts(3), "x"), (3, _ts(4), "y")])

    left = (
        file_source(spark, left_in, SCHEMA)
        .withColumnRenamed("key", "lkey")
        .withColumnRenamed("ts", "lts")
        .withWatermark("lts", "10 minutes")
    )
    right = (
        file_source(spark, right_in, SCHEMA)
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("rts"),
            F.col("key").alias("rkey"),
        )
        .withWatermark("rts", "10 minutes")
    )
    joined = left.join(
        right,
        (F.col("event_id") == F.col("r_event_id"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        joined.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = []
    for b in sorted(os.listdir(out)):
        rows += spark.read.parquet(os.path.join(out, b)).collect()
    assert len(rows) == 1 and rows[0]["event_id"] == 1
    assert rows[0]["lkey"] == "a" and rows[0]["rkey"] == "x"


def test_streaming_session_window_matches_batch(spark, sf_dir, tmp_path):
    """Native session_window on a watermarked stream (availableNow,
    append mode) must finalize exactly the batch session_window
    sessions once the watermark passes all data — sessions that span
    micro-batch boundaries merge in state, not per-batch."""
    from kafkastreamer_spark.registry import REGISTRY, _ensure_loaded
    from kafkastreamer_spark.tables import load_table

    _ensure_loaded()
    want = {
        (r.user_id, r.session_start, r.n_events)
        for r in REGISTRY["events_session_window_native"].fn(spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    mid = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    inp = str(tmp_path / "sin")
    for half in (
        ev.filter(F.col("event_id") <= mid),
        ev.filter(F.col("event_id") > mid),
    ):
        half.orderBy("ts", "event_id").coalesce(1).write.mode("append").parquet(inp)
    # Sentinel a day past the data: in append mode a session only
    # finalizes once the watermark passes its close, so the stream's
    # LAST sessions need a later event to flush them (in production,
    # the next day's data plays this role).
    flush = ev.agg(
        F.lit(-1).cast("long").alias("event_id"),
        F.date_add(F.max("ts"), 1).cast("timestamp").alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
    )
    flush.coalesce(1).write.mode("append").parquet(inp)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
        ]
    )
    stream = file_source(spark, inp, schema, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "1 minute")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )
    out = str(tmp_path / "sout")

    def wb(bdf, bid):
        bdf.write.mode("append").parquet(out)

    q = (
        agg.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start, r.n_events)
        for r in spark.read.parquet(out).collect()
        if r.user_id >= 0  # drop the watermark-flush sentinel
    }
    assert got == want


def test_stream_stream_left_outer_join_emits_nulls_after_watermark(spark, tmp_path):
    """Left-outer stream-stream join: the unmatched left row must be
    held in state while it could still match, then emitted WITH NULL
    right columns once the watermark passes its join window — the
    late-null-emission corner that distinguishes outer from inner
    stream-stream joins."""
    left_in, right_in, ckpt, out = (
        str(tmp_path / x) for x in ("lin", "rin", "ckpt", "out")
    )
    _append(spark, left_in, [(1, _ts(1), "a"), (2, _ts(2), "b")])
    _append(spark, right_in, [(1, _ts(3), "x")])

    def build_join():
        left = (
            file_source(spark, left_in, SCHEMA)
            .withColumnRenamed("key", "lkey")
            .withColumnRenamed("ts", "lts")
            .withWatermark("lts", "5 minutes")
        )
        right = (
            file_source(spark, right_in, SCHEMA)
            .select(
                F.col("event_id").alias("r_event_id"),
                F.col("ts").alias("rts"),
                F.col("key").alias("rkey"),
            )
            .withWatermark("rts", "5 minutes")
        )
        return left.join(
            right,
            (F.col("event_id") == F.col("r_event_id"))
            & (F.col("rts") >= F.col("lts"))
            & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 10 MINUTES")),
            "left_outer",
        )

    def run_once():
        def wb(bdf, bid):
            bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

        q = (
            build_join()
            .writeStream.foreachBatch(wb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # Advance both watermarks far past event 2's join window, then
    # restart from the checkpoint: the state-expired left row must now
    # surface with NULL right columns.
    _append(spark, left_in, [(90, _ts(50), "zz")])
    _append(spark, right_in, [(91, _ts(50), "zz")])
    run_once()

    rows = []
    for b in sorted(os.listdir(out)):
        rows += spark.read.parquet(os.path.join(out, b)).collect()
    by_id = {r["event_id"]: r for r in rows}
    assert by_id[1]["rkey"] == "x"  # matched pair keeps its right side
    assert 2 in by_id, f"unmatched left row never emitted: {sorted(by_id)}"
    assert by_id[2]["rkey"] is None and by_id[2]["r_event_id"] is None


def test_stream_stream_left_semi_join(spark, tmp_path):
    """Left-semi stream-stream join (Spark 3.4+): emit the left rows
    that HAVE a time-bounded right match, left columns only, each
    matched left row exactly once even with several right matches —
    the streaming EXISTS filter."""
    left_in, right_in, ckpt, out = (
        str(tmp_path / x) for x in ("slin", "srin", "sckpt", "sout")
    )
    _append(
        spark, left_in,
        [(1, _ts(1), "a"), (2, _ts(2), "b"), (3, _ts(3), "c")],
    )
    # event 1 matches twice (dedup to one emit), 2 matches once inside
    # the window, 3 has a too-late right row (> 30 min) -> no emit
    _append(
        spark, right_in,
        [
            (1, _ts(5), "x"),
            (1, _ts(6), "x2"),
            (2, _ts(20), "y"),
            (3, _ts(50), "z"),
        ],
    )

    left = (
        file_source(spark, left_in, SCHEMA)
        .withColumnRenamed("key", "lkey")
        .withColumnRenamed("ts", "lts")
        .withWatermark("lts", "10 minutes")
    )
    right = (
        file_source(spark, right_in, SCHEMA)
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("rts"),
        )
        .withWatermark("rts", "10 minutes")
    )
    joined = left.join(
        right,
        (F.col("event_id") == F.col("r_event_id"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 30 MINUTES")),
        "left_semi",
    )
    assert joined.columns == ["event_id", "lts", "lkey"]  # left side only

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        joined.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = []
    for b in sorted(os.listdir(out)):
        rows += spark.read.parquet(os.path.join(out, b)).collect()
    got = sorted((r["event_id"], r["lkey"]) for r in rows)
    assert got == [(1, "a"), (2, "b")]


def test_stream_stream_full_outer_join(spark, tmp_path):
    """Full-outer watermarked stream-stream join: matched rows emit
    joined, unmatched rows from EACH side emit with NULLs for the
    other side once the watermark closes their window — completing
    the inner/left-outer/left-semi family."""
    left_in, right_in, ckpt, out = (
        str(tmp_path / x) for x in ("flin", "frin", "fckpt", "fout")
    )
    # event 1 matches; 2 exists only left; 9 exists only right.
    # Late rows at minute 59 push the watermark past everything.
    _append(spark, left_in, [(1, _ts(1), "a"), (2, _ts(2), "b"),
                             (100, _ts(59), "wm")])
    _append(spark, right_in, [(1, _ts(5), "x"), (9, _ts(6), "y"),
                              (101, _ts(59), "wm")])

    left = (
        file_source(spark, left_in, SCHEMA)
        .withColumnRenamed("key", "lkey")
        .withColumnRenamed("ts", "lts")
        .withWatermark("lts", "5 minutes")
    )
    right = (
        file_source(spark, right_in, SCHEMA)
        .select(
            F.col("event_id").alias("r_event_id"),
            F.col("ts").alias("rts"),
            F.col("key").alias("rkey"),
        )
        .withWatermark("rts", "5 minutes")
    )
    joined = left.join(
        right,
        (F.col("event_id") == F.col("r_event_id"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 10 MINUTES")),
        "full_outer",
    )

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        joined.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = []
    for b in sorted(os.listdir(out)):
        rows += spark.read.parquet(os.path.join(out, b)).collect()

    matched = [r for r in rows if r["event_id"] == 1 and r["r_event_id"] == 1]
    assert len(matched) == 1 and matched[0]["rkey"] == "x"
    left_only = [r for r in rows if r["event_id"] == 2]
    assert len(left_only) == 1 and left_only[0]["r_event_id"] is None
    right_only = [r for r in rows if r["r_event_id"] == 9]
    assert len(right_only) == 1 and right_only[0]["event_id"] is None
