"""running_zscore_stateful (streaming/sketches.py): stream==batch
parity of the integer-exact anomaly flags across micro-batch
boundaries, plus a synthetic spike check."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafkastreamer_spark.streaming.sketches import running_zscore_stateful
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


def _reference_flags(rows, z100=300, min_history=5):
    """Pure-python replay of the contract: per key in (ts, id) order,
    flag each value against prior history, then update sums. The
    condition is derived INDEPENDENTLY of the implementation's
    cross-multiplied integers: exact Fractions straight from the
    definition |v - mean| > z * sigma (population sigma), so a
    re-derivation bug in the engine's algebra cannot hide here."""
    from fractions import Fraction

    state: dict = {}
    flags = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        n, s1, s2 = state.get(r["user_id"], (0, 0, 0))
        v4 = int(r["value"] * 10000 // 1)
        flagged = False
        if n >= min_history:
            mean = Fraction(s1, n * 10**4)
            sigma2 = Fraction(s2, n * 10**8) - mean * mean
            dev = Fraction(v4, 10**4) - mean
            z = Fraction(z100, 100)
            flagged = dev * dev > z * z * sigma2
        flags[r["event_id"]] = flagged
        state[r["user_id"]] = (n + 1, s1 + v4, s2 + v4 * v4)
    return flags


def test_stream_matches_reference_across_batches(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    rows = [r.asDict() for r in ev.collect()]
    want = _reference_flags(rows)

    # 3 micro-batches, time-ordered per key within and across files
    inp = str(tmp_path / "zin")
    ids = ev.approxQuantile("event_id", [1 / 3, 2 / 3], 0.0)
    bounds = [float("-inf")] + ids + [float("inf")]
    for lo, hi in zip(bounds, bounds[1:]):
        ev.filter((F.col("event_id") > lo) & (F.col("event_id") <= hi)).orderBy(
            "ts", "event_id"
        ).coalesce(1).write.mode("append").parquet(inp)

    stream = file_source(spark, inp, ev.schema, max_files_per_trigger=1)
    out = str(tmp_path / "zout")
    q = (
        running_zscore_stateful(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "zckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        r["event_id"]: r["is_anomaly"] for r in spark.read.parquet(out).collect()
    }
    assert len(got) == len(want)
    assert got == want
    assert any(got.values()), "no anomaly flagged on the fixture at z=3"


def test_synthetic_spike_flagged(spark, tmp_path):
    import datetime as dt

    base = dt.datetime(2025, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), 1, 10.0) for i in range(10)]
    rows.append((10, base + dt.timedelta(minutes=10), 1, 500.0))  # spike
    rows.append((11, base + dt.timedelta(minutes=11), 1, 10.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    inp = str(tmp_path / "sin")
    ev.orderBy("ts").coalesce(1).write.mode("append").parquet(inp)
    stream = file_source(spark, inp, ev.schema)
    out = str(tmp_path / "sout")
    q = (
        running_zscore_stateful(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_id"]: r["is_anomaly"] for r in spark.read.parquet(out).collect()
    }
    assert got[10] is True  # the spike
    assert sum(got.values()) == 1  # and only the spike
