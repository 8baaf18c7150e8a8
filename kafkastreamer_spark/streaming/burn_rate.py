"""Streaming twin of the hopping SRE burn-rate alert
(``events_burn_rate_hopping``, queries/relational31.py) — round-10
VERDICT item #6 introduced it; round-12 VERDICT item #2 lifted the
volume stage from applyInPandasWithState to the BUILT-IN windowed
streaming aggregation, removing Python from the hot path entirely.

Batch semantics being twinned: events aggregate into 5-minute
buckets (bucket, n_events, n_errors); each rule's long and short
windows — exact whole numbers of buckets — are evaluated at the
close of the latest bucket; a rule fires when BOTH windows' burn
rates are at or over its threshold.

Streaming form: the volume-carrying stage — the per-bucket running
(n, e) counts — needs NO arbitrary state: it is a pure additive
count per tumbling event-time window, which Spark runs JVM-side as
``groupBy(window(ts, '5 minutes'))`` + conditional sum in update
mode, with map-side partial aggregation and zero per-group Python
dispatch (the previous applyInPandasWithState form paid a pandas
group-dispatch tax per touched bucket — measured 9.5k ev/s vs the
funnel/churn twins' ~19k on the same feed, docs/THROUGHPUT.md
round-11 row — for generality this operator never used). The alert
evaluation is CALENDAR-BOUNDED (one row per bucket in the horizon),
so it stays the shared batch tail ``burn_alerts_from_buckets`` over
the emitted counts — twin parity with the registered batch query is
structural: both run the exact same tail over the exact same
(bucket, n, e) contract (``bucket_error_counts``).

Downstream contract: take the MAX emitted (n, e) per bucket —
counts are monotone, so max = latest — then apply
``burn_alerts_from_buckets``. Within-watermark parity is exact
(tested).

Late data / eviction: both are the ONE watermark horizon of the
built-in aggregation — a bucket's state is evicted once the
watermark passes its window end, and a row below the watermark is
dropped by the same exec, atomically. The applyInPandasWithState
form needed a separate event-time timer TTL and an argued invariant
(eviction horizon > lateness horizon ⇒ no resurrection); the
built-in operator makes resurrection impossible by construction —
the failure mode for too-late data is a clean drop, the churn
twin's contract verbatim. Live state is bounded by
(watermark delay + longest in-flight window) / bucket_s keys of two
longs each, regardless of event volume.

Crash/replay: state lives in the streaming state store under the
query checkpoint (restart-parity tested; RocksDB provider compatible
like the other stateful twins).

Reference parity note: the per-key running count IS the reference's
core operator (v1/src/main/java/Stream/Streamer.java keyed counts)
lifted to an event-time bucket key; the alert table on top is
SURVEY §2 Part-B ops-analytics closure with no reference analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafkastreamer_spark.queries.relational31 import _BURN_BUCKET_S


def streaming_bucket_error_counts(
    events: DataFrame,
    ts_col: str = "ts",
    bucket_s: int = _BURN_BUCKET_S,
) -> DataFrame:
    """Cumulative per-bucket ``(bucket, n, e)`` counts, update mode
    (module docstring has the max-per-key downstream contract and the
    watermark-governed eviction trade). The input must carry
    ``withWatermark(ts_col, ...)`` and columns ``event_type, ts_col``.

    Tumbling windows align to the epoch (Spark's default window
    origin), so ``unix_micros(window.start) div (bucket_s * 1e6)``
    reproduces the batch stage's absolute bucket ids exactly
    (``bucket_error_counts``, queries/relational31.py)."""
    bucket_us = bucket_s * 1_000_000
    return (
        events.groupBy(F.window(F.col(ts_col), f"{bucket_s} seconds"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("e"),
        )
        .select(
            F.expr(f"unix_micros(window.start) div {bucket_us}").alias("bucket"),
            "n",
            "e",
        )
    )
