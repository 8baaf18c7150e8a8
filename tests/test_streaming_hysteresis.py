"""alarm_hysteresis_stateful (streaming/sketches.py): stream==batch
parity of the latch sequence across micro-batch boundaries."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkastreamer_spark.streaming.sketches import alarm_hysteresis_stateful
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table

def _thresholds(rows):
    """Fixture-scale-proof thresholds: 120% / 80% of the global mean
    daily count (same hysteresis band as the batch query, but fixed
    up front like a real alerting config)."""
    mean = sum(r["x"] for r in rows) // len(rows)
    return max(2, mean * 120 // 100), max(1, mean * 80 // 100)


def _reference_latch(rows, hi, lo):
    state: dict = {}
    out = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        latch = state.get(r["event_type"], 0)
        if r["x"] > hi:
            latch = 1
        elif r["x"] < lo:
            latch = 0
        state[r["event_type"]] = latch
        out[(r["event_type"], r["day"])] = latch
    return out


def test_latch_matches_reference_across_batches(spark, sf_dir, tmp_path):
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    rows = [r.asDict() for r in daily.collect()]
    hi, lo = _thresholds(rows)
    want = _reference_latch(rows, hi, lo)
    assert len(set(want.values())) == 2, "need both latch states"

    # split day range into 3 time-ordered micro-batch files
    days = sorted({r["day"] for r in rows})
    cuts = [days[len(days) // 3], days[2 * len(days) // 3]]
    inp = str(tmp_path / "hin")
    daily.filter(F.col("day") < cuts[0]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    daily.filter(
        (F.col("day") >= cuts[0]) & (F.col("day") < cuts[1])
    ).coalesce(1).write.mode("append").parquet(inp)
    daily.filter(F.col("day") >= cuts[1]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    stream = file_source(
        spark, inp, daily.schema, max_files_per_trigger=1
    )
    latched = alarm_hysteresis_stateful(stream, hi=hi, lo=lo)
    out = str(tmp_path / "hout")

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        latched.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "hckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {}
    for b in sorted(os.listdir(out)):
        for r in spark.read.parquet(os.path.join(out, b)).collect():
            got[(r["event_type"], r["day"])] = r["alarm_on"]
    assert got == want
