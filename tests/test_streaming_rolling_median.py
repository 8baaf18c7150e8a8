"""rolling_median_stateful (streaming/sketches.py): stream==batch
parity of the per-key rolling 7-day exact median across micro-batch
boundaries (the stateful twin of events_rolling_median_7d's
collect_list construction)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafkastreamer_spark.streaming.sketches import rolling_median_stateful
from kafkastreamer_spark.streaming.sources import file_source
from kafkastreamer_spark.tables import load_table


def _reference(rows, horizon=7):
    """Pure-python replay: per key, day-ordered, window of the last
    `horizon` days, LOWER median (sorted[(n+1)//2 - 1])."""
    state: dict[str, list] = {}
    out = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["day"])):
        win = state.setdefault(r["event_type"], [])
        win.append((r["day"], r["x"]))
        win.sort()
        del win[:-horizon]
        counts = sorted(x for _, x in win)
        out[(r["event_type"], r["day"])] = (
            len(counts),
            counts[(len(counts) + 1) // 2 - 1],
        )
    return out


def test_rolling_median_matches_reference_across_batches(spark, sf_dir, tmp_path):
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    rows = [r.asDict() for r in daily.collect()]
    want = _reference(rows)
    # the fixture spans > 7 days, so the window must actually slide
    assert max(n for n, _ in want.values()) == 7

    days = sorted({r["day"] for r in rows})
    cuts = [days[len(days) // 3], days[2 * len(days) // 3]]
    inp = str(tmp_path / "rmin")
    daily.filter(F.col("day") < cuts[0]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)
    daily.filter(
        (F.col("day") >= cuts[0]) & (F.col("day") < cuts[1])
    ).coalesce(1).write.mode("append").parquet(inp)
    daily.filter(F.col("day") >= cuts[1]).coalesce(1).write.mode(
        "append"
    ).parquet(inp)

    stream = file_source(spark, inp, daily.schema, max_files_per_trigger=1)
    rolled = rolling_median_stateful(stream)
    out = str(tmp_path / "rmout")

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        rolled.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "rmckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got_df = spark.read.parquet(os.path.join(out, "*"))
    got = {
        (r["event_type"], r["day"]): (r["window_days"], r["rolling_median"])
        for r in got_df.collect()
    }
    assert got == want
    # ≥2 micro-batches actually ran (the split exercised state carry)
    n_batches = len(
        [d for d in os.listdir(out) if d.startswith("b")]
    )
    assert n_batches >= 2
