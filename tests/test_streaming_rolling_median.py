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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=40),  # day offset
            st.integers(min_value=1, max_value=1000),  # count
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: (t[0], t[1]),
    ),
    n_batches=st.integers(min_value=1, max_value=3),
)
def test_rolling_median_property_random_series(
    spark, tmp_path_factory, data, n_batches
):
    """Random (key, day, count) series under random micro-batch splits
    (split by day order, so arrival stays day-ordered per key — the
    operator's documented contract): streamed rolling medians must
    equal the pure-python replay. Hardens the fixture-based parity
    test against shapes the fixture doesn't produce (gaps longer than
    the horizon, single-day series, duplicate counts)."""
    rows = [
        (k, f"2024-01-{d + 1:02d}", c) for k, d, c in data
    ]
    want = _reference([{"event_type": k, "day": day, "x": c} for k, day, c in rows])

    tmp_path = tmp_path_factory.mktemp("rmprop")
    daily = spark.createDataFrame(rows, "event_type string, day string, x long")
    days = sorted({r[1] for r in rows})
    # n_batches chronological slices (some possibly empty are skipped)
    cuts = [
        days[(i * len(days)) // n_batches] for i in range(1, n_batches)
    ]
    inp = str(tmp_path / "in")
    bounds = [None, *cuts, None]
    wrote = 0
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        part = daily
        if lo is not None:
            part = part.filter(F.col("day") >= lo)
        if hi is not None:
            part = part.filter(F.col("day") < hi)
        if part.count() > 0:
            part.coalesce(1).write.mode("append").parquet(inp)
            wrote += 1
    assert wrote >= 1

    stream = file_source(spark, inp, daily.schema, max_files_per_trigger=1)
    rolled = rolling_median_stateful(stream)
    out = str(tmp_path / "out")

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    q = (
        rolled.writeStream.foreachBatch(wb)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_type"], r["day"]): (r["window_days"], r["rolling_median"])
        for r in spark.read.parquet(os.path.join(out, "*")).collect()
    }
    assert got == want


def test_rolling_median_survives_stream_restart(spark, sf_dir, tmp_path):
    """Checkpoint recovery across separate RUNS: first two-thirds of
    the day range in run 1, the rest appended for run 2 with the same
    checkpoint — the union of emitted rows must equal the full-series
    reference with no day double-emitted."""
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
    days = sorted({r["day"] for r in rows})
    cut = days[2 * len(days) // 3]
    inp = str(tmp_path / "rrin")
    out = str(tmp_path / "rrout")
    ckpt = str(tmp_path / "rrckpt")

    def wb(bdf, bid):
        bdf.write.mode("overwrite").parquet(os.path.join(out, f"b{bid}"))

    def run_once():
        stream = file_source(
            spark, inp, daily.schema, max_files_per_trigger=1
        )
        q = (
            rolling_median_stateful(stream)
            .writeStream.foreachBatch(wb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    daily.filter(F.col("day") < cut).coalesce(1).write.mode("append").parquet(inp)
    run_once()
    n_run1 = spark.read.parquet(os.path.join(out, "*")).count()
    assert 0 < n_run1 < len(rows)

    daily.filter(F.col("day") >= cut).coalesce(1).write.mode("append").parquet(inp)
    run_once()
    got_rows = spark.read.parquet(os.path.join(out, "*")).collect()
    got = {
        (r["event_type"], r["day"]): (r["window_days"], r["rolling_median"])
        for r in got_rows
    }
    assert len(got_rows) == len(rows)  # nothing double-emitted
    assert got == want
