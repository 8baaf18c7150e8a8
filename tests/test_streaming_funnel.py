"""Streaming twin of events_funnel_window_ladder (VERDICT r9 #4):
finalize-on-watermark per-entry next-conversion latencies feeding the
shared ladder aggregation.

1. Fixture parity: streamed latencies -> funnel_ladder_from_latencies
   EQUALS the registered batch query when events arrive in time order
   and a sentinel pushes the watermark past every entry's horizon.
2. Semantics on a synthetic set: min-over-later-conversions wins
   across batch boundaries; beyond-max-window conversions and
   never-converted entries finalize as NULL via the event-time timer.
3. Checkpoint restart: open entries survive a stop/start and still
   attribute a post-restart conversion.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from kafkastreamer_spark.queries.relational24 import (
    funnel_ladder_from_latencies,
)
from kafkastreamer_spark.registry import REGISTRY
from kafkastreamer_spark.streaming.funnel import streaming_funnel_latencies
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table

EV_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ]
)


def _t(minute: float):
    return datetime(2026, 1, 1) + timedelta(minutes=minute)


def _write_file(spark, inp, rows):
    spark.createDataFrame(rows, EV_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(inp)


def _run(spark, inp, out, ckpt, max_window_s):
    stream = file_source(
        spark, inp, EV_SCHEMA, max_files_per_trigger=1
    ).withWatermark("ts", "0 seconds")
    lat = streaming_funnel_latencies(stream, max_window_s=max_window_s)

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        lat.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _emitted(spark, out):
    rows = {}
    if not os.path.isdir(out):
        return rows
    for b in sorted(os.listdir(out)):
        for r in spark.read.parquet(os.path.join(out, b)).collect():
            assert r["event_id"] not in rows  # each entry finalizes once
            rows[r["event_id"]] = r["lat_us"]
    return rows


def test_funnel_twin_matches_batch(spark, sf_dir, tmp_path):
    want = [
        tuple(r)
        for r in REGISTRY["events_funnel_window_ladder"].fn(
            spark, sf_dir
        ).collect()
    ]

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    qs = ev.approxQuantile("event_id", [0.33, 0.66], 0.0)
    m1, m2 = qs
    inp = str(tmp_path / "in")
    parts = [
        ev.filter(F.col("event_id") <= m1),
        ev.filter((F.col("event_id") > m1) & (F.col("event_id") <= m2)),
        ev.filter(F.col("event_id") > m2),
    ]
    # time-ordered feed: event_id order IS ts order for the fixture;
    # guard that here so a fixture change can't silently weaken the test
    mx = None
    for p in parts:
        lo, hi = p.agg(F.min("ts"), F.max("ts")).first()
        assert mx is None or lo >= mx
        mx = hi
        p.orderBy("ts", "event_id").coalesce(1).write.mode("append").parquet(
            inp
        )
    # sentinels far beyond every entry's 24h horizon (twice: the timer
    # sweep lags the watermark update by one batch). They MUST be of a
    # type the operator keeps ("purchase"): predicate pushdown moves
    # the event-type filter below the watermark node, so a foreign-type
    # row never advances the watermark (module docstring contract).
    # User -1 keeps them out of every fixture user's funnel.
    flush_ts = mx + timedelta(days=3)
    _write_file(spark, inp, [(10**9, -1, "purchase", flush_ts)])
    _write_file(
        spark,
        inp,
        [(10**9 + 1, -1, "purchase", flush_ts + timedelta(minutes=1))],
    )

    out = str(tmp_path / "out")
    _run(spark, inp, out, str(tmp_path / "ckpt"), max_window_s=86400)
    got_lat = _emitted(spark, out)

    n_entries = ev.filter(F.col("event_type") == "view").count()
    assert len(got_lat) == n_entries  # every entry finalized exactly once

    lat_df = spark.createDataFrame(
        [(eid, lat) for eid, lat in got_lat.items()],
        "event_id long, lat_us long",
    )
    got = [tuple(r) for r in funnel_ladder_from_latencies(lat_df).collect()]
    assert got == want


def test_funnel_twin_min_conversion_and_null_paths(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    # u1: entry at t0; conversions at +50min and (next batch) +55min
    #     -> min wins even though both arrive after the entry's batch
    # u2: entry at t0; conversion at +120min > 1h window -> NULL
    # u3: entry at t0; no conversion ever -> NULL via timer
    _write_file(spark, inp, [(1, 1, "view", _t(0)), (2, 2, "view", _t(0)), (3, 3, "view", _t(0))])
    _write_file(spark, inp, [(4, 1, "purchase", _t(50))])
    _write_file(
        spark, inp, [(5, 1, "purchase", _t(55)), (6, 2, "purchase", _t(120))]
    )
    _write_file(spark, inp, [(7, -1, "purchase", _t(60 * 24 * 2))])
    _write_file(spark, inp, [(8, -1, "purchase", _t(60 * 24 * 2 + 1))])
    _run(spark, inp, out, str(tmp_path / "ckpt"), max_window_s=3600)
    got = _emitted(spark, out)
    assert got == {1: 50 * 60 * 1_000_000, 2: None, 3: None}


def test_funnel_twin_boundary_conversion_at_exact_horizon(spark, tmp_path):
    """Round-11 ADVICE closure pin, with the semantics established
    empirically en route (see streaming/funnel.py's finalize comment):
    Spark keeps TWO watermarks per micro-batch — the late-event filter
    uses the PREVIOUS batch's watermark (keeping ts > wm strictly),
    while getCurrentWatermarkMs()/event-time timers use the current
    eviction watermark. Consequences for a conversion at EXACTLY
    entry + horizon (lat == max window, which counts):

    1. Arriving in the same batch that advances the watermark to the
       horizon, it IS attributed (delivered under the previous
       watermark; bts updates before the finalize check runs).
    2. Arriving any batch later, the late filter has already dropped
       it (late wm >= its timestamp) — a clean drop, never a
       mis-finalized entry, because delivery dies strictly before the
       strict-< finalization can close the entry without it.
    """
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    # Case 1: boundary conversion rides the wm-advancing batch
    _write_file(spark, inp, [(1, 1, "view", _t(0))])
    _write_file(spark, inp, [(2, 1, "purchase", _t(60))])
    # Case 2: u2's boundary conversion arrives after the LATE
    # watermark (which lags the eviction watermark by one batch, i.e.
    # reflects data through batch N-2) has reached its timestamp ->
    # dropped by the late filter, entry finalizes NULL
    _write_file(spark, inp, [(3, 2, "view", _t(60))])
    _write_file(spark, inp, [(4, -1, "purchase", _t(120))])
    _write_file(spark, inp, [(5, -1, "purchase", _t(120))])  # late-wm spacer
    _write_file(spark, inp, [(6, 2, "purchase", _t(120))])  # late: dropped
    # flush sentinels
    _write_file(spark, inp, [(7, -1, "purchase", _t(60 * 24 * 2))])
    _write_file(spark, inp, [(8, -1, "purchase", _t(60 * 24 * 2 + 1))])
    _run(spark, inp, out, str(tmp_path / "ckpt"), max_window_s=3600)
    # keys are ENTRY event ids
    assert _emitted(spark, out) == {1: 3600 * 1_000_000, 3: None}


def test_funnel_twin_survives_restart(spark, tmp_path):
    inp, out = str(tmp_path / "in"), str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_file(spark, inp, [(1, 1, "view", _t(0))])
    _run(spark, inp, out, ckpt, max_window_s=3600)
    assert _emitted(spark, out) == {}  # still open, nothing emitted

    # restart: the open entry must still be in state to catch this
    _write_file(spark, inp, [(2, 1, "purchase", _t(10))])
    _write_file(spark, inp, [(3, -1, "purchase", _t(60 * 24))])
    _write_file(spark, inp, [(4, -1, "purchase", _t(60 * 24 + 1))])
    _run(spark, inp, out, ckpt, max_window_s=3600)
    assert _emitted(spark, out) == {1: 10 * 60 * 1_000_000}
